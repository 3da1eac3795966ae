package graft.functions

import scala.util.Try

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** All-capture-groups regex extraction with the reference's semantics
  * (A12, reference/Sources/Helpers/String+CaptureGroups.swift:23-37, pinned
  * by reference/Tests/Helpers/StringCaptureGroupTests.swift:23-66):
  *
  *  - first match only; ALL capture groups (incl. nested) as an array
  *  - no match / empty pattern / invalid pattern → null (not empty array)
  *  - optional case-insensitive matching
  *
  * Spark-first: the group count is known at plan time (the pattern is a
  * literal), so the array is built from N codegen'd `regexp_extract` calls
  * guarded by one `rlike` — pure built-ins, no UDF, stays in
  * whole-stage codegen. (`regexp_extract` compiles the pattern once per
  * task and caches it, so N groups cost N matcher runs on a pre-compiled
  * pattern — acceptable; a single-pass custom Expression is the upgrade
  * path if profiling ever demands it.)
  */
object RegexFunctions {

  def captureGroups(c: Column, pattern: String,
      caseInsensitive: Boolean = false): Column = {
    val pat = if (caseInsensitive) "(?i)" + pattern else pattern
    Try(java.util.regex.Pattern.compile(pat)).toOption match {
      case None => lit(null).cast(ArrayType(StringType))
      case Some(compiled) =>
        val n = compiled.matcher("").groupCount()
        if (n == 0 || pattern.isEmpty) lit(null).cast(ArrayType(StringType))
        else {
          val groups = (1 to n).map(i => regexp_extract(c, pat, i))
          when(c.rlike(pat), array(groups: _*))
            .otherwise(lit(null).cast(ArrayType(StringType)))
        }
    }
  }
}
