package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Library entry point for `spark.sql.extensions` — registers the whole
  * graft codegen-function surface on every session of the cluster:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions()(_))
  * }}}
  *
  * This is the deployment-grade alternative to the per-module
  * `register(spark)` calls the query registry uses internally (those
  * remain so each query is self-contained against a vanilla session):
  * extension-injected functions live in the session's catalog from
  * construction, so SQL users get `cosine_sim` & co. without any Scala.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, ""), builder))
    }
}

object GraftExtensions {
  /** (name, usage doc, builder) for every custom Catalyst expression. */
  private[graft] val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float vectors",
      graft.functions.VectorFunctions.cosineBuilder),
    ("l2_dist_sq", "l2_dist_sq(v, c) - squared L2 distance of a float vector to a double centroid",
      graft.functions.VectorFunctions.l2Builder),
    ("poly_hash", "poly_hash(s) - order-sensitive polynomial rolling hash mod 1e9+7",
      graft.functions.PolyHash.builder),
    ("simhash64", "simhash64(tokens) - 64-bit simhash of a token array",
      graft.functions.SimHash64.builder),
    ("double_plain", "double_plain(x) - reference-parity plain (non-scientific) double rendering",
      graft.functions.DoublePlainString.builder),
    ("byte_pool", "byte_pool(payload, n) - average-pool a string payload's bytes into n windows",
      graft.functions.BytePool.builder),
    ("int8_quant_stats",
      "int8_quant_stats(v) - [qscale, rmse, max_abs_err, rel_err] of symmetric int8 quantization",
      graft.functions.VectorFunctions.int8QuantBuilder),
    ("int8_quant_cosine",
      "int8_quant_cosine(a, b) - cosine similarity on the vectors' symmetric int8 codes",
      graft.functions.VectorFunctions.int8CosineBuilder),
    ("int8_encode",
      "int8_encode(v) - materialized symmetric int8 codes of a float vector (array<tinyint>)",
      graft.functions.VectorFunctions.int8EncodeBuilder),
    ("int8_code_dot",
      "int8_code_dot(a, b) - exact integer dot product of two stored int8 code arrays",
      graft.functions.VectorFunctions.int8CodeDotBuilder),
    ("pack_codes",
      "pack_codes(codes) - pack an array of [0,255] subspace codes into one byte each (binary)",
      graft.functions.VectorFunctions.packCodesBuilder),
    ("unpack_codes",
      "unpack_codes(b) - unsigned unpack of a pack_codes byte string back to array<int>",
      graft.functions.VectorFunctions.unpackCodesBuilder),
    ("graft_bloom_might_contain",
      "graft_bloom_might_contain(filter, key) - probe a long key against a serialized bloom filter literal",
      graft.functions.BloomFilterFunctions.builder),
  )
}
