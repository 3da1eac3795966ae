package graft.decode

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.{EntitySpec, FieldKind, FieldSpec}

/** Typed decode with reject routing — the reference's core semantic
  * (`FINporter.decode`, reference/Sources/Core/FINporter.swift:39-49, driven
  * at reference/Sources/Handlers/TransformHandler.swift:118-124): raw
  * string rows become typed rows, and rows that fail any field decode are
  * routed to a reject channel instead of failing the batch.
  *
  * Spark-first shape: ONE narrow pass — the raw DataFrame gains a `__reason`
  * column (a coalesce of per-field checks in declared field order, so the
  * first failing field wins, mirroring the reference's first-error-per-row
  * behavior), then splits by `__reason IS NULL`. Both sides stay inside the
  * same WholeStageCodegen scan; nothing is collected, nothing is thrown.
  * Date-only sources are enriched with a default time-of-day and zone into
  * UTC timestamps (defTimeOfDay/timeZone decode params,
  * reference/Sources/Core/FINporter.swift:45-47).
  *
  * The same [[EntitySpec]] also generates the DuckDB oracle SQL (see
  * [[Decoder.oracleSelect]]) so engine and oracle share one source of truth.
  */
object Decoder {

  final case class DecodeResult(good: DataFrame, rejects: DataFrame)

  /** PERMISSIVE all-string CSV/TSV read under the entity's raw schema
    * (A2: reference tokenizes via SwiftCSV, Package.swift:28).
    */
  def readRaw(spark: SparkSession, path: String, spec: EntitySpec,
      delimiter: String = ","): DataFrame =
    spark.read
      .option("header", "true")
      .option("sep", delimiter)
      .option("mode", "PERMISSIVE")
      .schema(spec.rawSchema)
      .csv(path)

  private def splitTod(defTimeOfDay: String): (Int, Int) =
    defTimeOfDay.split(":", -1) match {
      case Array(h, m) if h.nonEmpty && m.nonEmpty &&
          h.length <= 2 && m.length <= 2 &&
          h.forall(_.isDigit) && m.forall(_.isDigit) &&
          h.toInt <= 23 && m.toInt <= 59 =>
        (h.toInt, m.toInt)
      case _ => throw graft.detect.FinError.DecodingError(
        s"invalid defTimeOfDay '$defTimeOfDay' (expected HH:mm)")
    }

  /** First-failing-field reject reason, null for clean rows. */
  def reasonCol(spec: EntitySpec): Column = {
    val checks: Seq[Column] = spec.fields.flatMap { f =>
      val raw = col(f.name)
      val missing =
        if (f.required) Some(when(raw.isNull, lit(s"missing:${f.name}")))
        else None
      val bad = f.kind match {
        case FieldKind.Str => None
        case k =>
          val (castSql, label) = k match {
            case FieldKind.Dbl => (s"try_cast(${f.name} AS double)", "bad_double")
            case FieldKind.Bool => (s"try_cast(${f.name} AS boolean)", "bad_boolean")
            case FieldKind.DateCol => (s"try_cast(${f.name} AS date)", "bad_date")
            case FieldKind.Str => throw new IllegalStateException
          }
          Some(when(raw.isNotNull && expr(castSql).isNull, lit(s"$label:${f.name}")))
      }
      missing.toSeq ++ bad.toSeq
    }
    coalesce(checks :+ lit(null).cast("string"): _*)
  }

  /** Decoded (typed) projection of a raw row; DateCol fields become UTC
    * TimestampType via defTimeOfDay + zone enrichment.
    */
  def decodedCols(spec: EntitySpec, defTimeOfDay: String, zone: String): Seq[Column] = {
    val (h, m) = splitTod(defTimeOfDay)
    spec.fields.map { f =>
      (f.kind match {
        case FieldKind.Str => col(f.name)
        case FieldKind.Dbl => expr(s"try_cast(${f.name} AS double)")
        case FieldKind.Bool => expr(s"try_cast(${f.name} AS boolean)")
        case FieldKind.DateCol =>
          to_utc_timestamp(
            expr(s"try_cast(${f.name} AS date)").cast("timestamp") +
              expr(s"INTERVAL $h HOURS $m MINUTES"),
            zone)
      }).as(f.name)
    }
  }

  /** Split a raw DataFrame into (typed good rows, raw rejects + reason). */
  def decode(raw: DataFrame, spec: EntitySpec,
      defTimeOfDay: String = "13:00",
      zone: String = "America/New_York"): DecodeResult = {
    val tagged = raw.withColumn("__reason", reasonCol(spec))
    val good = tagged.where(col("__reason").isNull)
      .select(decodedCols(spec, defTimeOfDay, zone): _*)
    val rejects = tagged.where(col("__reason").isNotNull)
      .select(spec.fields.map(f => col(f.name)) :+ col("__reason").as("reason"): _*)
    DecodeResult(good, rejects)
  }

  // ---- DuckDB oracle generation (same spec, same semantics) ----

  def oracleReasonSql(spec: EntitySpec): String = {
    val checks: Seq[String] = spec.fields.flatMap { f =>
      val missing =
        if (f.required) Some(s"CASE WHEN ${f.name} IS NULL THEN 'missing:${f.name}' END")
        else None
      val bad = f.kind match {
        case FieldKind.Str => None
        case FieldKind.Dbl => Some(
          s"CASE WHEN ${f.name} IS NOT NULL AND try_cast(${f.name} AS DOUBLE) IS NULL THEN 'bad_double:${f.name}' END")
        case FieldKind.Bool => Some(
          s"CASE WHEN ${f.name} IS NOT NULL AND try_cast(${f.name} AS BOOLEAN) IS NULL THEN 'bad_boolean:${f.name}' END")
        case FieldKind.DateCol => Some(
          s"CASE WHEN ${f.name} IS NOT NULL AND try_cast(${f.name} AS DATE) IS NULL THEN 'bad_date:${f.name}' END")
      }
      missing.toSeq ++ bad.toSeq
    }
    checks.mkString("coalesce(", ",\n    ", ")")
  }

  /** DuckDB decoded projection; DateCol emitted as `<name>_ms` epoch millis
    * (the representation the registered queries use for oracle stability).
    */
  def oracleDecodedSql(spec: EntitySpec, defTimeOfDay: String, zone: String): Seq[String] = {
    val (h, m) = splitTod(defTimeOfDay)
    spec.fields.map { f =>
      f.kind match {
        case FieldKind.Str => f.name
        case FieldKind.Dbl => s"try_cast(${f.name} AS DOUBLE) AS ${f.name}"
        case FieldKind.Bool => s"try_cast(${f.name} AS BOOLEAN) AS ${f.name}"
        case FieldKind.DateCol =>
          s"epoch_ms((CAST(try_cast(${f.name} AS DATE) AS TIMESTAMP) " +
            s"+ INTERVAL $h HOURS + INTERVAL $m MINUTES) AT TIME ZONE '$zone') " +
            s"AS ${f.name}_ms"
      }
    }
  }

  def oracleRawCsv(spec: EntitySpec, csvPath: String): String =
    s"read_csv('$csvPath', header=true, all_varchar=true, " +
      s"columns={${spec.fields.map(f => s"'${f.name}': 'VARCHAR'").mkString(", ")}})"
}
