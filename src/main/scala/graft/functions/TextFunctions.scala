package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.regexp_replace

/** Text normalization kernels (A13,
  * reference/Sources/Core/FINporter+Utils.swift:22-32): CRLF/CR → LF,
  * applied before any multiline-regex importer logic. Spark's CSV reader
  * already handles mixed line endings, so this matters only for raw-text
  * transform paths.
  */
object TextFunctions {
  def normalizeLineSeparators(c: Column): Column =
    regexp_replace(c, "\r\n|\r", "\n")
}
