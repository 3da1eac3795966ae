package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins q374's generated Hilbert-index SQL against the reference
  * recursion: the chain of [[Pipeline.hilbertStep]] projection layers
  * must reproduce the classic xy2d loop cell-for-cell over the whole
  * bucket grid, and be a bijection onto [0, buckets²) — the properties
  * the layout comparison's locality claim stands on.
  */
class HilbertSpec extends SparkSuite {

  /** The textbook xy2d loop (flip with n−1, then swap), evaluated in
    * plain Scala as the independent reference.
    */
  private def xy2d(n: Long, x0: Long, y0: Long): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  test("generated Hilbert SQL matches the reference recursion and is bijective") {
    import spark.implicits._
    val n = 16L // ZSkipBuckets — q374's grid
    val grid = (for (x <- 0L until n; y <- 0L until n) yield (x, y))
      .toDF("x", "y")
    var h = grid.select(col("x"), col("y"),
      col("x").as("hx"), col("y").as("hy"), lit(0L).as("hd"))
    Pipeline.hilbertHalves.foreach { sv =>
      val (xE, yE, dE) = Pipeline.hilbertStep(sv, n)
      h = h.select(col("x"), col("y"),
        expr(xE).as("hx"), expr(yE).as("hy"), expr(dE).as("hd"))
    }
    val got = h.select("x", "y", "hd").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.size == (n * n).toInt)
    for (((x, y), d) <- got)
      assert(d == xy2d(n, x, y), s"cell ($x, $y): got $d, ref ${xy2d(n, x, y)}")
    assert(got.values.toSeq.sorted == (0L until n * n),
      "Hilbert index must be a bijection onto the grid")
  }
}
