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
}
