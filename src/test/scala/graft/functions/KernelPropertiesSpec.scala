package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Model-based randomized properties for the codegen kernels: each kernel
  * is checked against an independent straight-Scala reference model over
  * seeded random inputs (deterministic, so failures reproduce). These
  * guard the hand-rolled UTF-8/bit-twiddling paths the golden tests can't
  * cover exhaustively.
  */
class KernelPropertiesSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(0xC0FFEE)

  /** Random well-formed string mixing 1-4 byte UTF-8 code points. */
  private def randomString(maxLen: Int): String = {
    val n = rng.nextInt(maxLen + 1)
    val sb = new java.lang.StringBuilder
    (0 until n).foreach { _ =>
      val cp = rng.nextInt(4) match {
        case 0 => 1 + rng.nextInt(0x7F)                 // ASCII
        case 1 => 0x80 + rng.nextInt(0x800 - 0x80)      // 2-byte
        case 2 =>                                        // 3-byte, no surrogates
          val c = 0x800 + rng.nextInt(0x10000 - 0x800)
          if (c >= 0xD800 && c <= 0xDFFF) 0xE000 + (c - 0xD800) else c
        case _ => 0x10000 + rng.nextInt(0x10FFFF - 0x10000) // 4-byte
      }
      sb.appendCodePoint(cp)
    }
    sb.toString
  }

  private def codePoints(s: String): Array[Int] =
    s.codePoints().toArray

  test("poly_hash equals the code-point fold model on random unicode strings") {
    (1 to 300).foreach { _ =>
      val s = randomString(64)
      val expected = codePoints(s).foldLeft(0L)((acc, cp) =>
        (acc * 31 + cp) % PolyHashKernel.Mod)
      assert(PolyHashKernel.hash(UTF8String.fromString(s)) == expected, s"for: $s")
    }
  }

  test("simhash64 equals the bit-majority model, permutation-invariant") {
    def model(xs: Array[Long]): Long =
      (0 until 64).foldLeft(0L) { (acc, b) =>
        val ones = xs.count(h => ((h >>> b) & 1L) == 1L)
        // strict majority: a tie (even n, ones == n/2) leaves the bit 0
        if (2 * ones > xs.length) acc | (1L << b) else acc
      }
    (1 to 200).foreach { _ =>
      val xs = Array.fill(1 + rng.nextInt(20))(rng.nextLong())
      val a = SimHashKernel.hash64(new GenericArrayData(xs))
      assert(a == model(xs), s"model mismatch for ${xs.toSeq}")
      val shuffled = rng.shuffle(xs.toSeq).toArray
      assert(a == SimHashKernel.hash64(new GenericArrayData(shuffled)),
        s"permutation changed simhash for ${xs.toSeq}")
      val h = rng.nextLong()
      assert(SimHashKernel.hash64(new GenericArrayData(Array(h))) == h)
    }
  }

  test("byte_pool equals the window-partition model on random strings") {
    (1 to 200).foreach { _ =>
      val s = randomString(48)
      val n = 1 + rng.nextInt(8)
      val cps = codePoints(s)
      val total = cps.length
      val model = Array.tabulate(n) { w =>
        val member = cps.zipWithIndex.collect {
          case (cp, k) if total > 0 && (k.toLong * n) / total == w => cp.toLong
        }
        if (member.nonEmpty) member.sum * 1000000L / member.length else 0L
      }
      val got = BytePoolKernel.pool(UTF8String.fromString(s), n)
      assert(got.toSeq == model.toSeq, s"for: '$s' n=$n")
    }
  }

  private def floats(n: Int): Array[Float] =
    Array.fill(n)(rng.nextFloat() * 2 - 1)

  test("l2_dist_sq equals the left-to-right fold model") {
    (1 to 200).foreach { _ =>
      val n = 1 + rng.nextInt(16)
      val v = floats(n)
      val c = Array.fill(n)(rng.nextDouble() * 2 - 1)
      val expected = v.zip(c).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + (x.toDouble - y) * (x.toDouble - y)
      }
      val got = L2DistanceSq(
        Literal.create(v, ArrayType(FloatType)),
        Literal.create(c, ArrayType(DoubleType))).eval(null)
      // bit-exact: both sides accumulate in the same dimension order
      assert(got == expected, s"for ${v.toSeq} vs ${c.toSeq}")
    }
  }

  test("int8 quant stats: bounds hold on random vectors; model agreement") {
    (1 to 200).foreach { _ =>
      val n = 1 + rng.nextInt(64)
      val v = floats(n)
      val got = Int8QuantKernel.stats(
        new GenericArrayData(v.map(x => x: Any))).toDoubleArray()
      val Array(scale, rmse, maxae, rel) = got
      // straight-Scala model, same definition
      val mx = v.map(x => math.abs(x.toDouble)).foldLeft(0.0)(math.max)
      assert(scale == mx / 127.0, "scale")
      val ss = if (scale == 0.0) 1.0 else scale
      // every value is within the representable range (|x| <= 127*ss up
      // to fp error), so per-dim error is bounded by half a step
      assert(maxae <= ss / 2 + 1e-12, s"max_abs_err $maxae > s/2 ${ss / 2}")
      // rmse can never exceed the worst single dim; relative error is a
      // fraction of the vector norm
      assert(rmse <= maxae + 1e-15, "rmse exceeds max abs err")
      assert(rel >= 0.0 && (rel <= 1.0 || mx == 0.0), s"rel_err $rel")
      assert(!got.exists(d => d.isNaN || d.isInfinite), "non-finite stat")
    }
  }

  test("int8 quant cosine: symmetric, self≈1, tracks float cosine, null sentinel") {
    def wrap(v: Array[Float]) = new GenericArrayData(v.map(x => x: Any))
    (1 to 200).foreach { _ =>
      val n = 1 + rng.nextInt(16)
      val a = floats(n)
      val b = floats(n)
      val ab = Int8QuantCosineKernel.cosine(wrap(a), wrap(b))
      // integer accumulation: symmetry is exact, not approximate
      assert(ab == Int8QuantCosineKernel.cosine(wrap(b), wrap(a)), "asymmetric")
      val self = Int8QuantCosineKernel.cosine(wrap(a), wrap(a))
      if (!self.isNaN) assert(math.abs(self - 1.0) < 1e-12, s"self $self")
      // quantized cosine stays near the float cosine (codes carry ~7.99
      // bits per dim; the bound here is deliberately loose — tiny vectors
      // with near-cancelling components can amplify the step error)
      val fc = CosineSimilarity(
        Literal.create(a, ArrayType(FloatType)),
        Literal.create(b, ArrayType(FloatType))).eval(null)
      if (fc != null && !ab.isNaN)
        assert(math.abs(ab - fc.asInstanceOf[Double]) < 0.2,
          s"quantized cosine drifted: $ab vs $fc")
    }
    // dimension mismatch → NaN sentinel → expression null
    assert(Int8QuantCosineKernel.cosine(
      wrap(Array(1.0f, 2.0f)), wrap(Array(1.0f))).isNaN)
    // a non-finite component must surface as the sentinel, never as a
    // fabricated code (NaN.toLong is 0 — the silent-garbage trap)
    assert(Int8QuantCosineKernel.cosine(
      wrap(Array(Float.NaN, 1.0f)), wrap(Array(1.0f, 1.0f))).isNaN)
    assert(Int8QuantCosineKernel.cosine(
      wrap(Array(1.0f, 1.0f)), wrap(Array(Float.PositiveInfinity, 1.0f))).isNaN)
    assert(Int8QuantCosine(
      Literal.create(Array(1.0f, 2.0f), ArrayType(FloatType)),
      Literal.create(Array(1.0f), ArrayType(FloatType))).eval(null) == null)
  }

  test("int8 quant stats: non-finite components surface as null, never stats") {
    def wrap(v: Array[Float]) = new GenericArrayData(v.map(x => x: Any))
    // the audit must reject corrupt vectors the same way the cosine kernel
    // does — NaN.toLong = 0 would otherwise fabricate code 0 and NaN err2
    assert(Int8QuantKernel.stats(wrap(Array(Float.NaN, 1.0f))) == null)
    assert(Int8QuantKernel.stats(wrap(Array(1.0f, Float.PositiveInfinity))) == null)
    assert(Int8QuantKernel.stats(wrap(Array(Float.NegativeInfinity))) == null)
    assert(Int8QuantStats(
      Literal.create(Array(Float.NaN), ArrayType(FloatType))).eval(null) == null)
  }

  test("int8_encode codes match the pairwise kernel's quantizer; null cases") {
    def wrap(v: Array[Float]) = new GenericArrayData(v.map(x => x: Any))
    (1 to 200).foreach { _ =>
      val n = 1 + rng.nextInt(32)
      val v = floats(n)
      val codes = Int8EncodeKernel.encode(wrap(v))
      assert(codes != null && codes.numElements() == n)
      // independent model: same scale definition as the serving kernel
      val mx = v.map(x => math.abs(x.toDouble)).foldLeft(0.0)(math.max)
      val ss = if (mx == 0.0) 1.0 else mx / 127.0
      (0 until n).foreach { i =>
        val expected = Int8QuantCosineKernel.quant(v(i).toDouble, ss)
        assert(codes.getByte(i).toLong == expected,
          s"code $i: ${codes.getByte(i)} != $expected for ${v.toSeq}")
      }
    }
    assert(Int8EncodeKernel.encode(wrap(Array(Float.NaN, 1.0f))) == null)
    assert(Int8EncodeKernel.encode(wrap(Array(Float.NegativeInfinity))) == null)
  }

  test("stored-code cosine identity: dot/(√na·√nb) equals the per-pair kernel") {
    def wrap(v: Array[Float]) = new GenericArrayData(v.map(x => x: Any))
    (1 to 200).foreach { _ =>
      val n = 1 + rng.nextInt(32)
      val a = floats(n)
      val b = floats(n)
      val ca = Int8EncodeKernel.encode(wrap(a))
      val cb = Int8EncodeKernel.encode(wrap(b))
      val dot = Int8CodeDotKernel.dot(ca, cb)
      val na = Int8CodeDotKernel.dot(ca, ca)
      val nb = Int8CodeDotKernel.dot(cb, cb)
      assert(dot != Int8CodeDotKernel.NullSentinel)
      val pairKernel = Int8QuantCosineKernel.cosine(wrap(a), wrap(b))
      if (na > 0 && nb > 0) {
        // the materialized-index serving expression must rank IDENTICALLY
        // to the in-kernel simulation q82 certified: same codes, same
        // integer sums, same one double division — bit-exact equality
        val stored = dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
        assert(stored == pairKernel,
          s"stored-code cosine diverged: $stored vs $pairKernel")
      } else assert(pairKernel.isNaN, "pair kernel should reject zero codes")
    }
    // dimension mismatch → sentinel → expression null
    assert(Int8CodeDotKernel.dot(
      Int8EncodeKernel.encode(wrap(Array(1.0f, 2.0f))),
      Int8EncodeKernel.encode(wrap(Array(1.0f)))) == Int8CodeDotKernel.NullSentinel)
  }

  test("cosine_sim is symmetric and 1.0 on any vector paired with itself") {
    (1 to 200).foreach { _ =>
      val n = 1 + rng.nextInt(16)
      val a = floats(n)
      val b = floats(n)
      def cos(x: Array[Float], y: Array[Float]): Any = CosineSimilarity(
        Literal.create(x, ArrayType(FloatType)),
        Literal.create(y, ArrayType(FloatType))).eval(null)
      assert(cos(a, b) == cos(b, a), "asymmetric")
      val self = cos(a, a)
      if (self != null) // null for the zero vector
        assert(math.abs(self.asInstanceOf[Double] - 1.0) < 1e-6)
    }
  }
}
