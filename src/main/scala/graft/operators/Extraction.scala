package graft.operators

import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.decode.Decoder
import graft.functions.RegexFunctions.captureGroups
import graft.schema.{AllocRegistry, StandardAssetID}

/** Reference helper surfaces registered as oracle-checked queries:
  * all-capture-groups regex extraction (A12) and the StandardID
  * asset-class vocabulary lookup (A16).
  */
object Extraction {

  private val NamePat = "^(\\w+) (\\w+)"
  private val TypePat = "(PROMO|ECONOMY) (\\w+)"
  private val BrandPat = "brand#(\\d)(\\d)"

  /** q34: all-groups extraction over `part` — nested/nil-on-no-match
    * semantics plus the case-insensitive option
    * (reference/Tests/Helpers/StringCaptureGroupTests.swift:23-66).
    */
  private val q34 = GraftQuery(
    "q34_regex_groups",
    s"""SELECT p_partkey,
       |  CASE WHEN regexp_matches(p_name, '$NamePat') THEN regexp_extract(p_name, '$NamePat', 1) END AS n1,
       |  CASE WHEN regexp_matches(p_name, '$NamePat') THEN regexp_extract(p_name, '$NamePat', 2) END AS n2,
       |  CASE WHEN regexp_matches(p_name, '$NamePat')
       |       THEN regexp_extract(p_name, '$NamePat', 1) || '|' || regexp_extract(p_name, '$NamePat', 2) END AS name_joined,
       |  CASE WHEN regexp_matches(p_type, '$TypePat')
       |       THEN regexp_extract(p_type, '$TypePat', 1) || '|' || regexp_extract(p_type, '$TypePat', 2) END AS promo_joined,
       |  CASE WHEN regexp_matches(p_brand, '(?i)$BrandPat')
       |       THEN regexp_extract(p_brand, '(?i)$BrandPat', 1) || '|' || regexp_extract(p_brand, '(?i)$BrandPat', 2) END AS brand_ci
       |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
    val p = Tables.part(s, d)
    val nameGroups = captureGroups(col("p_name"), NamePat)
    val typeGroups = captureGroups(col("p_type"), TypePat)
    val brandGroups = captureGroups(col("p_brand"), BrandPat, caseInsensitive = true)
    p.select(col("p_partkey"),
        element_at(nameGroups, 1).as("n1"),
        element_at(nameGroups, 2).as("n2"),
        array_join(nameGroups, "|").as("name_joined"),
        array_join(typeGroups, "|").as("promo_joined"),
        array_join(brandGroups, "|").as("brand_ci"))
      .orderBy("p_partkey")
  }

  private val spec = AllocRegistry.asset
  private val FixturePath = "/root/repo/fixtures/masset.csv"

  /** q35: StandardID vocabulary validation (A16,
    * reference/Sources/Model/MAsset+StandardID.swift:23-59) over the
    * `asset` entity decode — registry dispatch on a second entity plus a
    * broadcast-sized canonical lookup via `isin`.
    */
  private val q35 = GraftQuery(
    "q35_standard_id",
    s"""WITH raw AS (SELECT * FROM ${Decoder.oracleRawCsv(spec, FixturePath)}),
       |tagged AS (SELECT *, ${Decoder.oracleReasonSql(spec)} AS reason FROM raw)
       |SELECT assetID, title, parentAssetID,
       |  assetID IN (${StandardAssetID.values.map(v => s"'$v'").mkString(", ")}) AS is_standard
       |FROM tagged WHERE reason IS NULL
       |ORDER BY assetID""".stripMargin) { (s, _) =>
    Decoder.decode(Decoder.readRaw(s, FixturePath, spec), spec).good
      .withColumn("is_standard", col("assetID").isin(StandardAssetID.values: _*))
      .orderBy("assetID")
  }

  val queries: Seq[GraftQuery] = Seq(q34, q35)
}
