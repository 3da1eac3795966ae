package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Prof40 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    graft.functions.PolyHash.register(spark)
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = Tables.documents(spark, d)
    println("n_docs = " + docs.count())
    val P = 1000000007L
    val NumHashes = 12
    val A = (0 until NumHashes).map(i => ((i + 1) * 2654435761L) % P)
    val B = (0 until NumHashes).map(i => ((i + 1) * 2246822519L) % P)
    val sh0 = docs
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("ts"))
      .withColumn("shingles",
        when(size(col("ts")) >= 3, array_distinct(expr(
          "transform(sequence(1, size(ts) - 2), i -> concat_ws(' ', element_at(ts, i), element_at(ts, i+1), element_at(ts, i+2)))")))
          .otherwise(expr("CAST(array() AS array<string>)")))
    time("warm-scan")(docs.select("doc_id"))
    time("tokenize")(docs.select(col("doc_id"), split(lower(col("text")), "\\s+").as("ts")))
    time("shingles")(sh0.select("doc_id", "shingles"))
    val hv = sh0.withColumn("hv", expr("transform(shingles, sh2 -> poly_hash(sh2))"))
    time("shingles+hv")(hv.select("doc_id", "hv"))
    val sigCols = (0 until NumHashes).map(i =>
      expr(s"array_min(transform(hv, h -> (${A(i)} * h + ${B(i)}) % $P))"))
    val sigs = hv.select(col("doc_id"), array(sigCols: _*).as("sig"))
    time("sigs")(sigs)
    time("sigs-again")(sigs)
  }
}
