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

  val queries: Seq[GraftQuery] = Seq(q38)
}
