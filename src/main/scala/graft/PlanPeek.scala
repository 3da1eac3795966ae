package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print a registered query's executed-plan join/exchange
  * nodes — the manual step behind every PlanHygieneSpec census entry
  * (audit the build sides BEFORE adding a name to `bnljAudited`).
  *
  * Usage: `java -cp ... graft.PlanPeek q261_temperature_mixture [sfDir]`
  */
object PlanPeek {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (a.length > 1) a(1) else "/root/testdata/sf0.001"
    val df = SparkEntry.queries(a(0))(spark, dir)
    df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange"))
      .foreach(l => println(l.trim.take(200)))
    spark.stop()
  }
}
