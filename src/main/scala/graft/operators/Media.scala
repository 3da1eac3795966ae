package graft.operators

import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.multimodal.Multimodal

/** Multimodal feature extraction (q38): documents ride as stand-in binary
  * payloads (see [[graft.multimodal.Multimodal]]) and the stubbed decoder
  * derives deterministic features — payload size, content digest, and
  * stride-sampled byte values (the frame-sampling access pattern). All
  * pure codegen'd expressions over one scan.
  */
object Media {

  private val K = 4 // sampled positions per payload

  private val q38 = GraftQuery(
    "q38_media_features",
    s"""SELECT doc_id,
       |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       |  md5(text) AS content_md5,
       |${(0 until K).map(i =>
          s"  ascii(text[CAST(1 + ((length(text)-1)*$i)//$K AS INTEGER)]) AS sample_$i")
          .mkString(",\n")}
       |FROM documents
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id") +: Multimodal.decodeStub("text", K): _*)
      .orderBy("doc_id")
  }

  /** q53: the resize/downsample step of the multimodal pipeline — each
    * payload average-pooled into 4 equal windows of micro-unit mean code
    * points via the codegen [[graft.functions.BytePool]] kernel (one pass
    * per row; the SQL HOF form materializes an L-element list per row and
    * runs interpreted). A real image resize swaps the kernel body; the
    * plan — scan → narrow map → fixed-width vector — is the deployed
    * shape.
    */
  private val Pools = 4
  private val q53 = GraftQuery(
    "q53_media_resize",
    s"""SELECT doc_id,
       |${(0 until Pools).map(w =>
          // coalesce: an empty window (payload shorter than Pools chars)
          // is NULL in DuckDB (list_sum of [] and x//0) but 0 in the
          // kernel — pin both to 0
          s"  coalesce(CAST(CAST(list_sum(list_transform(list_filter(range(1, length(text)+1), " +
          s"i -> ((i-1)*$Pools)//length(text) = $w), i -> ascii(text[i]))) AS BIGINT) " +
          s"* 1000000 // len(list_filter(range(1, length(text)+1), " +
          s"i -> ((i-1)*$Pools)//length(text) = $w)) AS BIGINT), 0) AS pool_$w")
          .mkString(",\n")}
       |FROM documents
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.functions.BytePool.register(s)
    // pool computed ONCE per row; the 4 extractions reference the shared
    // alias (multi-referenced non-cheap producer, so CollapseProject keeps
    // the projections separate — same shape PlanSpec pins for q26/q27)
    Tables.documents(s, d)
      .select(col("doc_id"),
        graft.functions.BytePool.pool(col("text"), Pools).as("pool"))
      .select(col("doc_id") +: (0 until Pools).map(w =>
        element_at(col("pool"), w + 1).as(s"pool_$w")): _*)
      .orderBy("doc_id")
  }

  val queries: Seq[GraftQuery] = Seq(q38, q53)
}
