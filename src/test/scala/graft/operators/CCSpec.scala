package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins [[Similarity.connectedComponents]]' path-halving convergence
  * contract (VERDICT r15 item 7): the scaladoc argues chains of length
  * 2^r converge in ~r rounds, and q353's sf1 run exercised it
  * implicitly — this makes the claim a failing test. A 10⁴-vertex
  * duplicate CHAIN (diameter 9999 — the worst shape per edge count, and
  * the one replica-heavy corpora actually produce) must converge within
  * ~log₂(10⁴) + 2 rounds, where naive label propagation would need
  * 9999; and the fixpoint must equal naive min-label propagation's on a
  * multi-component graph (per-component min id).
  */
class CCSpec extends SparkSuite {

  test("a 10^4-vertex chain converges in <= 16 path-halving rounds") {
    import spark.implicits._
    val n = 10000
    val edges = spark.sparkContext
      .parallelize(0 until n - 1, 4)
      .map(i => (i.toLong, (i + 1).toLong))
      .toDF("doc_a", "doc_b")
    val verts = spark.sparkContext.parallelize(0 until n, 4)
      .map(_.toLong).toDF("doc_id")
    // maxIter IS the assertion: connectedComponents require()s
    // convergence, so a regression to one-hop-per-round (10⁴ rounds
    // needed) throws here instead of silently passing at the default 64
    val cc = Similarity.connectedComponents(verts, edges, maxIter = 16)
    val clusters = cc.select("cluster_id").distinct().collect()
    assert(clusters.length == 1 && clusters.head.getLong(0) == 0L,
      "a single chain must collapse to one component labeled by its min id")
    assert(cc.count() == n)
  }

  test("fixpoint equals naive min-label propagation on a multi-component graph") {
    import spark.implicits._
    // three chains, a star, and edge-free singletons; naive propagation's
    // fixpoint is per-component min vertex id
    val chainEdges =
      (100L until 130L).map(i => (i, i + 1)) ++
        (200L until 205L).map(i => (i, i + 1)) ++
        (500L until 503L).map(i => (i + 1, i)) // reversed orientation
    val starEdges = (301L to 310L).map(l => (300L, l))
    val edges = (chainEdges ++ starEdges).toDF("doc_a", "doc_b")
    val vertIds = (100L to 130L) ++ (200L to 205L) ++ (500L to 503L) ++
      (300L to 310L) ++ Seq(400L, 401L)
    val verts = vertIds.toDF("doc_id")
    val expected = vertIds.map { v =>
      v -> (v match {
        case x if x >= 100 && x <= 130 => 100L
        case x if x >= 200 && x <= 205 => 200L
        case x if x >= 500 && x <= 503 => 500L
        case x if x >= 300 && x <= 310 => 300L
        case x => x // singleton
      })
    }.toMap
    val got = Similarity.connectedComponents(verts, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected,
      s"fixpoint diverged from naive propagation: ${got.toSet -- expected.toSet}")
  }
}
