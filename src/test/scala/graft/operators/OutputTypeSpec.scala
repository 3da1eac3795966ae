package graft.operators

import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, MapType, StructType}

import graft.SparkSuite

/** Output-type contract for the driver's strict hash gate: the driver
  * stringifies every cell before hashing, so a Spark `DecimalType`
  * column renders `1088.00` where the DuckDB oracle's DOUBLE renders
  * `1088.0` — numerically identical, hash-distinct. Spark types the SQL
  * literal `100.0` as DECIMAL, so any `round(bigint / 100.0, 2)` output
  * silently becomes DECIMAL and passes only until a value happens to
  * render with a trailing zero (nine round-11 queries did exactly
  * that, four failing and five latent). This spec bans DecimalType from
  * every registered batch query's output schema — final money/share
  * columns must be `CAST(... AS DOUBLE)` (or kept integral).
  *
  * Schema-only (plan analysis, no execution), so the whole 240+-query
  * census costs seconds.
  */
class OutputTypeSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def decimalPaths(path: String, dt: DataType): Seq[String] =
    dt match {
      case _: DecimalType => Seq(path)
      case s: StructType =>
        s.fields.toSeq.flatMap(f => decimalPaths(s"$path.${f.name}", f.dataType))
      case a: ArrayType => decimalPaths(s"$path[]", a.elementType)
      case m: MapType =>
        decimalPaths(s"$path.key", m.keyType) ++
          decimalPaths(s"$path.value", m.valueType)
      case _ => Nil
    }

  test("no registered batch query emits a DecimalType column") {
    val streaming = graft.streaming.StreamingQueries.queries.map(_.name).toSet
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    for (q <- graft.SparkEntry.all if !streaming(q.name)) {
      val hits =
        try q.fn(spark, dir).schema.fields.toSeq
          .flatMap(f => decimalPaths(f.name, f.dataType))
        catch { case e: Throwable =>
          failures += s"${q.name}: schema build failed: ${e.getMessage}"
          Nil
        }
      if (hits.nonEmpty)
        failures += s"${q.name}: DecimalType output column(s) ${hits.mkString(", ")}"
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
