package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-15 router-sizing functions: the flat coarse
  * quantizer's k = clamp(4, ⌊√n⌋, 1024) and the IMI half-quantizer's
  * k' = clamp(2, ⌊n^(1/4)⌋, 1024). These feed every IVF oracle via
  * scalar subqueries, so a drift here is a silent oracle/engine split —
  * the spec states the contract in numbers, including the fixture
  * sizes the correctness gates actually run at (500 → 22, 2000 → 44)
  * and the clamp edges the scaladocs promise.
  */
class RouterSizingSpec extends AnyFunSuite {

  test("flat router k = clamp(4, floor(sqrt(n)), 1024)") {
    assert(Similarity.kmKOf(0) == 4)
    assert(Similarity.kmKOf(1) == 4)
    assert(Similarity.kmKOf(16) == 4)
    assert(Similarity.kmKOf(25) == 5)
    assert(Similarity.kmKOf(500) == 22)   // sf0.001 / sf0.01 fixtures
    assert(Similarity.kmKOf(2000) == 44)  // sf0.1 fixture
    assert(Similarity.kmKOf(20000) == 141) // sf1 replica
    assert(Similarity.kmKOf(1024L * 1024) == 1024)
    // past the ceiling the flat router saturates — the IMI product
    // router (q354) is the documented path from here
    assert(Similarity.kmKOf(100L * 1000 * 1000 * 1000) == 1024)
  }

  test("IMI half k' = clamp(2, floor(n^(1/4)), 1024); product ~ flat k") {
    assert(Similarity.kImiOf(0) == 2)
    assert(Similarity.kImiOf(500) == 4)   // 4^2 = 16 product cells
    assert(Similarity.kImiOf(2000) == 6)
    assert(Similarity.kImiOf(20000) == 11)
    // at the half ceiling the PRODUCT index addresses 1024^2 ~ 10^6
    // cells — past anything the flat router can hold as plan literals
    assert(Similarity.kImiOf(Long.MaxValue) == 1024)
    // the product tracks the flat router's cell count (both ~ sqrt(n))
    // within integer-floor slack on the fixture sizes
    for (n <- Seq(500L, 2000L, 20000L)) {
      val flat = Similarity.kmKOf(n).toDouble
      val prod = math.pow(Similarity.kImiOf(n).toDouble, 2)
      assert(prod >= flat / 4 && prod <= flat * 4,
        s"n=$n: product cells $prod drifted from flat k $flat")
    }
  }

  test("router crossover: flat to the ceiling, IMI past it, cells ~ sqrt(n) throughout") {
    // the dispatch boundary IS the flat router's saturation point: at
    // n = 1024^2 the flat k hits its literal-codebook clamp, and one
    // vector past it the dedup tier must route on product cells or its
    // per-cell membership (n / cells) starts growing linearly
    assert(Similarity.FlatRouterCeilingN == 1024L * 1024L)
    assert(!Similarity.routerIsImi(1024L * 1024L))
    assert(Similarity.routerIsImi(1024L * 1024L + 1))
    assert(!Similarity.routerIsImi(500L) && !Similarity.routerIsImi(20000L),
      "every graded fixture must route flat")
    // THROUGH-CROSSOVER CONTRACT: whichever arm the dispatch picks, the
    // effective cell count stays within a constant factor of sqrt(n), so
    // expected per-cell membership n / cells stays O(sqrt(n)) — the
    // sub-quadratic contract every cell-bounded consumer (SemDeDup, the
    // kNN label audit) is written against. The flat arm holds it by
    // construction (k = floor(sqrt(n))); the IMI arm holds it because
    // k'^2 = floor(n^(1/4))^2 >= sqrt(n) / 4 for all n (floor loses at
    // most half per half-quantizer).
    for (n <- Seq(1L << 10, 1L << 16, 1L << 20, (1L << 20) + 1, 1L << 24,
        1L << 30, 1L << 36, 1L << 40)) {
      val cells: Double =
        if (Similarity.routerIsImi(n)) {
          val kp = Similarity.kImiOf(n).toDouble
          assert(kp <= 1024.0, s"n=$n: half quantizer past its own clamp")
          kp * kp
        } else Similarity.kmKOf(n).toDouble
      val sqrtN = math.sqrt(n.toDouble)
      assert(cells >= sqrtN / 4 && cells <= sqrtN * 4,
        s"n=$n: effective cells $cells broke the ~sqrt(n) corridor " +
          s"(sqrt(n) = $sqrtN) — per-cell membership is no longer O(sqrt(n))")
      assert(n.toDouble / cells <= 4 * sqrtN,
        s"n=$n: expected per-cell membership ${n / cells} exceeds 4*sqrt(n)")
    }
    // the IMI arm's own ceiling (1024 per half -> ~10^6 product cells)
    // is reached only past n ~ 10^12 vectors — beyond the 100 TB corpus
    // this engine is sized for (10^9-10^10 docs)
    assert(Similarity.kImiOf(1L << 40) == 1024)
  }
}
