package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named query over the driver's parquet tables, with an optional ANSI-SQL
  * oracle (runnable by DuckDB over the same tables). Queries without an
  * oracle get the driver's weaker rows-only check.
  */
final case class GraftQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object GraftQuery {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, fn, Some(oracle))
  def noOracle(name: String)(
      fn: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, fn, None)
}

/** Loaders for the driver-provided parquet tables (TESTDATA.md). */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** Normalize the events `ts` column to a UTC TimestampType (µs) across
    * Spark's two readings of parquet TIMESTAMP(NANOS): builds that honor
    * `spark.sql.legacy.parquet.nanosAsLong=true` surface raw nano longs
    * (→ `timestamp_micros(ts div 1000)`, the same ns→µs floor DuckDB
    * applies), while Spark 4.1.2 ignores that conf and reads NANOS as
    * TIMESTAMP_NTZ already floor-truncated to µs (verified value-equal to
    * DuckDB's `epoch_ns // 1000` on the fixture), which in a UTC session
    * casts 1:1 to TimestampType. Dispatching on the OBSERVED type keeps
    * both engine generations correct with one code path.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case t => throw new IllegalStateException(
        s"unexpected events.ts type from parquet reader: $t")
    }
  }

  /** events.parquet stores `ts` as TIMESTAMP(NANOS); see
    * [[normalizeEventTs]] for the reader-version dispatch. The legacy
    * conf is still set first so older builds take the long-nanos path.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(table(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
