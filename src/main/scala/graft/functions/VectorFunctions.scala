package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity between two ArrayType(FloatType) columns, computed in
  * double precision with a deterministic left-to-right accumulation (so the
  * value is reproducible and oracle-comparable, unlike a shuffle-order
  * dependent SQL sum).
  *
  * A native Catalyst expression (with codegen) rather than a Scala UDF:
  * no boxing of the float arrays per row, stays inside whole-stage codegen —
  * this is the hot kernel of the ANN/near-dup operators at 100 TB.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires array<float> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  /** Dimension mismatch → null; any null element → null (explicit policy,
    * consistent with the dimension-mismatch case — never silently read a
    * null slot as 0.0).
    */
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val denom = ctx.freshName("denom")
      s"""
         |if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $x = (double) $a.getFloat($i);
         |    double $y = (double) $b.getFloat($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |    if ($denom == 0.0) { ${ev.isNull} = true; }
         |    else { ${ev.value} = $dot / $denom; }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance between an ArrayType(FloatType) vector and an
  * ArrayType(DoubleType) centroid, accumulated left-to-right in dimension
  * order — bit-identical to the oracle's list_reduce fold, codegen'd like
  * [[CosineSimilarity]] (the k-means assignment path evaluates this N·k
  * times per Lloyd iteration; a HOF form would run interpreted).
  */
case class L2DistanceSq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"l2_dist_sq requires (array<float>, array<double>), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var acc = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val dxy = a.getFloat(i).toDouble - b.getDouble(i)
      acc += dxy * dxy; i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val dxy = ctx.freshName("dxy")
      s"""
         |if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $dxy = (double) $a.getFloat($i) - $b.getDouble($i);
         |    $acc += $dxy * $dxy;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Shared kernel for [[Int8QuantStats]] — eval and codegen call the same
  * two-pass loop so the value is defined once. Pass 1 finds the max
  * absolute component; pass 2 accumulates reconstruction error of the
  * symmetric int8 quantization (q = clamp(floor(x/s + 0.5), ±127),
  * s = max|x|/127) plus the vector's own norm, all left-to-right in
  * dimension order — bit-identical to the oracle's list_reduce folds.
  */
object Int8QuantKernel {
  def stats(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val f = a.getFloat(i)
      // mirror Int8QuantCosineKernel: a non-finite component surfaces as
      // null, never quantizes — NaN leaves max|x| unchanged and then
      // floor(NaN).toLong = 0 would fabricate code 0 with NaN err stats
      if (java.lang.Float.isNaN(f) || java.lang.Float.isInfinite(f)) return null
      val x = math.abs(f.toDouble)
      if (x > mx) mx = x
      i += 1
    }
    val scale = mx / 127.0
    val ss = if (scale == 0.0) 1.0 else scale
    var err2 = 0.0; var maxae = 0.0; var vn2 = 0.0
    i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      // ONE quantizer definition: the audit must certify exactly the
      // codes the serving kernel (Int8QuantCosineKernel) produces
      val e = x - Int8QuantCosineKernel.quant(x, ss).toDouble * ss
      err2 += e * e
      val ae = math.abs(e)
      if (ae > maxae) maxae = ae
      vn2 += x * x
      i += 1
    }
    val rmse = if (n == 0) 0.0 else math.sqrt(err2 / n)
    val rel = if (vn2 == 0.0) 0.0 else math.sqrt(err2) / math.sqrt(vn2)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array(scale, rmse, maxae, rel))
  }
}

/** Kernel for [[Int8QuantCosine]] — cosine similarity computed on the
  * symmetric-int8 codes of both vectors. The per-vector scales CANCEL in
  * the cosine ratio (cos(qa·ssa, qb·ssb) = Σqa·qb / (√Σqa²·√Σqb²)), so
  * the whole accumulation is EXACT 64-bit integer arithmetic on the
  * codes (|q| ≤ 127 → every sum fits a long at any realistic dimension)
  * with one double division at the end — which is both why int8 ANN
  * serving is fast in production and why cross-engine parity is trivial
  * here: there is no float accumulation order to match, just integers.
  * Returns NaN as the null sentinel (dim mismatch, null element, zero
  * code vector) so codegen stays box-free.
  */
object Int8QuantCosineKernel {
  def quant(x: Double, ss: Double): Long = {
    var q = math.floor(x / ss + 0.5)
    if (q < -127.0) q = -127.0
    if (q > 127.0) q = 127.0
    q.toLong
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    if (a.numElements() != b.numElements()) return Double.NaN
    val n = a.numElements()
    var mxa = 0.0; var mxb = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return Double.NaN
      val fa = a.getFloat(i); val fb = b.getFloat(i)
      // a non-finite component must surface as null, never quantize —
      // NaN.toLong is 0, which would fabricate a confident similarity
      if (java.lang.Float.isNaN(fa) || java.lang.Float.isInfinite(fa) ||
          java.lang.Float.isNaN(fb) || java.lang.Float.isInfinite(fb))
        return Double.NaN
      val xa = math.abs(fa.toDouble); if (xa > mxa) mxa = xa
      val xb = math.abs(fb.toDouble); if (xb > mxb) mxb = xb
      i += 1
    }
    val ssa = if (mxa == 0.0) 1.0 else mxa / 127.0
    val ssb = if (mxb == 0.0) 1.0 else mxb / 127.0
    var dot = 0L; var na = 0L; var nb = 0L
    i = 0
    while (i < n) {
      val qa = quant(a.getFloat(i).toDouble, ssa)
      val qb = quant(b.getFloat(i).toDouble, ssb)
      dot += qa * qb; na += qa * qa; nb += qb * qb
      i += 1
    }
    if (na == 0L || nb == 0L) Double.NaN
    else dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }
}

/** `int8_quant_cosine(a, b)` — cosine on int8 codes (see
  * [[Int8QuantCosineKernel]]); the quantized-serving twin of
  * [[CosineSimilarity]], used by q82 to rank neighbors the way an int8
  * index would, with the float kernel alongside exposing the
  * approximation error per returned neighbor.
  */
case class Int8QuantCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"int8_quant_cosine requires array<float> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val v = Int8QuantCosineKernel.cosine(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    if (v.isNaN) null else java.lang.Double.valueOf(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |${ev.value} = graft.functions.Int8QuantCosineKernel.cosine($a, $b);
         |if (java.lang.Double.isNaN(${ev.value})) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Kernel for [[Int8Encode]] — the MATERIALIZATION half of int8 serving:
  * one pass computes the per-vector scale (s = max|x|/127, the same
  * definition [[Int8QuantCosineKernel]] uses per pair), a second emits the
  * codes. Storing the codes once per vector (instead of re-deriving both
  * sides' codes inside every pair evaluation) is what actually realizes
  * the 4× storage/shuffle reduction: the candidate join carries
  * `array<tinyint>` + one long norm, never the float embedding.
  * Null/non-finite components → null (the quantizer never fabricates a
  * code from garbage).
  */
object Int8EncodeKernel {
  def encode(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val f = a.getFloat(i)
      if (java.lang.Float.isNaN(f) || java.lang.Float.isInfinite(f)) return null
      val x = math.abs(f.toDouble)
      if (x > mx) mx = x
      i += 1
    }
    val ss = if (mx == 0.0) 1.0 else mx / 127.0
    val out = new Array[Byte](n)
    i = 0
    while (i < n) {
      out(i) = Int8QuantCosineKernel.quant(a.getFloat(i).toDouble, ss).toByte
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Kernel for [[Int8CodeDot]] — exact integer dot product over stored int8
  * codes. |q| ≤ 127, so the accumulator fits a long at any realistic
  * dimension (overflow needs n > 2^49). Long.MinValue is the null sentinel
  * (dim mismatch / null slot) so codegen stays box-free; it is unreachable
  * as a real dot value at any dimension below 2^49.
  */
object Int8CodeDotKernel {
  final val NullSentinel: Long = Long.MinValue

  def dot(a: ArrayData, b: ArrayData): Long = {
    if (a.numElements() != b.numElements()) return NullSentinel
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return NullSentinel
      acc += a.getByte(i).toLong * b.getByte(i).toLong
      i += 1
    }
    acc
  }
}

/** `int8_encode(v)` → array<tinyint> — symmetric per-vector int8 codes
  * (q = clamp(floor(x/s + 0.5), ±127), s = max|x|/127). The stored-index
  * twin of [[Int8QuantCosine]]'s in-kernel quantization: [[graft.operators.Similarity]]
  * materializes this column once per vector and every quantized k-NN join
  * reads codes, not float arrays.
  */
case class Int8Encode(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.ByteType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"int8_encode requires array<float>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    Int8EncodeKernel.encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.Int8EncodeKernel.encode($a);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `int8_code_dot(a, b)` → bigint — exact integer dot product of two stored
  * int8 code arrays (see [[Int8CodeDotKernel]]). With the code norms also
  * stored, quantized cosine is `dot / (sqrt(na) * sqrt(nb))` in plain
  * codegen'd SQL — no float arrays anywhere in the serving join.
  */
case class Int8CodeDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(org.apache.spark.sql.types.ByteType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"int8_code_dot requires array<tinyint> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val v = Int8CodeDotKernel.dot(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    if (v == Int8CodeDotKernel.NullSentinel) null else java.lang.Long.valueOf(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |${ev.value} = graft.functions.Int8CodeDotKernel.dot($a, $b);
         |if (${ev.value} == java.lang.Long.MIN_VALUE) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `int8_quant_stats(v)` → [qscale, rmse, max_abs_err, rel_err] — the
  * reconstruction-error audit of symmetric per-vector int8 quantization.
  *
  * The 100 TB role: embeddings dominate an LLM corpus's ANN storage and
  * shuffle volume; int8 cuts both 4× (float32 → one byte per dim plus one
  * scale per vector), which is the difference between an index that fits
  * executor memory and one that spills. Serving quantized vectors is only
  * safe if the reconstruction error is measured and gated — this kernel
  * is that gate, one codegen pass per row, no boxing, no HOF interpreter
  * (Spark's higher-order `aggregate`/`transform` are CodegenFallback).
  */
case class Int8QuantStats(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"int8_quant_stats requires array<float>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    Int8QuantKernel.stats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.Int8QuantKernel.stats($a);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Kernels for [[PackCodes]]/[[UnpackCodes]] — the production PQ code
  * layout. At k=256 a subspace code is exactly one unsigned byte, so an
  * M-subspace code is an M-byte `binary` — the row-width floor (no array
  * header, no per-element null bits, 8 B for M=8 against 256 B of
  * float32: the 32× compression PQ promises). Pack rejects codes outside
  * [0, 255] (they cannot be a k≤256 codebook id) with null rather than
  * truncating; unpack widens back to the int form every (m, cell) join
  * uses, so the stored byte and the join key are provably the same value.
  */
object PackCodesKernel {
  def pack(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val v = a.getInt(i)
      if (v < 0 || v > 255) return null
      out(i) = v.toByte
      i += 1
    }
    out
  }

  def unpack(b: Array[Byte]): ArrayData = {
    val out = new Array[Int](b.length)
    var i = 0
    while (i < b.length) {
      out(i) = b(i) & 0xff
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `pack_codes(array<int>) → binary` — one unsigned byte per subspace
  * code (see [[PackCodesKernel]]). The storage form of a k≤256 PQ code.
  */
case class PackCodes(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.IntegerType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pack_codes requires array<int>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    PackCodesKernel.pack(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.PackCodesKernel.pack($a);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `unpack_codes(binary) → array<int>` — the join-key form of a stored
  * [[PackCodes]] byte string (values 0..255, the unsigned reading).
  */
case class UnpackCodes(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unpack_codes requires binary, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    PackCodesKernel.unpack(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.PackCodesKernel.unpack($a);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Kernel for [[PrefixCosines]] — ALL nested-prefix cosines of a vector
  * pair in ONE left-to-right traversal. The matryoshka (MRL) audit needs
  * cos(a[1..m], b[1..m]) at several nested cut points m₁ < m₂ < … ≤ dim;
  * because the prefixes are nested, the running (dot, ‖a‖², ‖b‖²)
  * accumulators at cut mᵢ are exactly the first-mᵢ partial sums of the
  * full-dimension fold — so one pass emits every tier, replacing (per
  * pair) |cuts| interpreted `aggregate(sequence(1,m), …)` higher-order
  * folds × 3 accumulators with a single codegen loop, and letting the
  * caller keep ONE pair table instead of cuts.length copies.
  *
  * Accumulation is per-term `dot += x·y` in dimension order and the
  * emitted value is `dot / (sqrt(na) · sqrt(nb))` — the identical IEEE
  * operation sequence as the HOF form it replaces and as the oracle's
  * `list_reduce` folds, so results are bit-stable across the rewrite
  * (q294's hash is pinned on this). Null policy is PER SLOT, exactly the
  * per-tier HOF semantics (review r17 finding 1): a tier's fold touches
  * only indices 1..m, so a null element or an out-of-range index at
  * position i nulls ONLY the cuts whose prefix includes i (the HOF's
  * `element_at` returns null there and the fold absorbs it) — tiers
  * that complete before the first null/short index stay valid, never
  * dropped wholesale. A zero-norm prefix divides through like the HOF
  * form did (NaN/Inf, not null) — fidelity over prettiness.
  */
object PrefixCosinesKernel {
  def eval(a: ArrayData, b: ArrayData, cuts: Array[Int]): ArrayData = {
    val n = math.min(a.numElements(), b.numElements())
    val out = new Array[Any](cuts.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0; var c = 0
    var dead = false // first null/short index reached: later cuts are null
    while (c < cuts.length) {
      val cut = cuts(c)
      if (!dead && cut <= n) {
        while (i < cut && !dead) {
          if (a.isNullAt(i) || b.isNullAt(i)) dead = true
          else {
            val x = a.getFloat(i).toDouble
            val y = b.getFloat(i).toDouble
            dot += x * y; na += x * x; nb += y * y; i += 1
          }
        }
        if (!dead)
          out(c) = java.lang.Double.valueOf(
            dot / (math.sqrt(na) * math.sqrt(nb)))
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Kernel for [[CosineSimilarityD]] — cosine over two `array<double>`
  * columns, accumulated left-to-right in dimension order with the final
  * `dot / (sqrt(na) · sqrt(nb))` division: the identical IEEE operation
  * sequence as the three interpreted `aggregate(sequence(...))` HOF
  * folds it replaces (Spark HOFs are CodegenFallback), so swapping it
  * into a hash-pinned query is bit-neutral. Divide-through semantics on
  * a zero-norm input (NaN/Inf, not null) — the HOF form's behavior,
  * fidelity over prettiness; null only on dimension mismatch or a null
  * element ([[CosineSimilarity]]'s explicit policy). The double-input
  * sibling of [[CosineSimilarity]] for derived vectors (whitened,
  * projected) that are already `array<double>`.
  */
object CosineSimDKernel {
  final val NullSentinel: Double = Double.MaxValue

  def cosine(a: ArrayData, b: ArrayData): Double = {
    if (a.numElements() != b.numElements()) return NullSentinel
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return NullSentinel
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** `cosine_sim_d(a, b)` — cosine over `array<double>` inputs (see
  * [[CosineSimDKernel]]). Double.MaxValue is the kernel's null sentinel
  * (unreachable as a real cosine, |cos| ≤ 1 and divide-through NaN/Inf
  * compare unequal to it), keeping codegen box-free.
  */
case class CosineSimilarityD(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim_d requires array<double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val v = CosineSimDKernel.cosine(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    if (v == CosineSimDKernel.NullSentinel) null else java.lang.Double.valueOf(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |${ev.value} = graft.functions.CosineSimDKernel.cosine($a, $b);
         |if (${ev.value} == java.lang.Double.MAX_VALUE) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `prefix_cosines(a, b, m₁, m₂, …)` → array<double> — cosine of the
  * nested prefixes a[1..mᵢ], b[1..mᵢ] in one codegen pass (see
  * [[PrefixCosinesKernel]]; per-slot null semantics — the whole array
  * is null only when an INPUT is null, the BinaryExpression default).
  * Cut points are literal ints, strictly ascending and positive
  * (enforced at registration), carried on the expression rather than as
  * children so codegen embeds them as one reference `int[]`.
  */
case class PrefixCosines(left: Expression, right: Expression, cuts: Seq[Int])
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (!(ok(left.dataType) && ok(right.dataType)))
      TypeCheckResult.TypeCheckFailure(
        s"prefix_cosines requires array<float> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    else if (cuts.isEmpty || cuts.head <= 0 ||
        cuts.sliding(2).exists(w => w.length == 2 && w(0) >= w(1)))
      TypeCheckResult.TypeCheckFailure(
        s"prefix_cosines cut points must be positive and strictly " +
          s"ascending, got ${cuts.mkString(",")}")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val cutsArr: Array[Int] = cuts.toArray

  override def nullSafeEval(l: Any, r: Any): Any =
    PrefixCosinesKernel.eval(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], cutsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cutsRef = ctx.addReferenceObj("cuts", cutsArr, "int[]")
      s"""
         |${ev.value} = graft.functions.PrefixCosinesKernel.eval($a, $b, $cutsRef);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Register `cosine_sim(a, b)` for SQL/expr use on a session. Idempotent;
    * queries that need the expression call this first, then refer to it via
    * `expr("cosine_sim(...)")` (Spark 4's Column API no longer exposes a
    * public Expression→Column constructor).
    */
  private[graft] val cosineBuilder: Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == 2, "cosine_sim(a, b) takes exactly 2 arguments")
      CosineSimilarity(exprs(0), exprs(1))
    }
  private[graft] val l2Builder: Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == 2, "l2_dist_sq(v, c) takes exactly 2 arguments")
      L2DistanceSq(exprs(0), exprs(1))
    }
  private[graft] val int8QuantBuilder: Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == 1, "int8_quant_stats(v) takes exactly 1 argument")
      Int8QuantStats(exprs.head)
    }
  private[graft] val int8CosineBuilder: Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == 2, "int8_quant_cosine(a, b) takes exactly 2 arguments")
      Int8QuantCosine(exprs(0), exprs(1))
    }
  private[graft] val int8EncodeBuilder: Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == 1, "int8_encode(v) takes exactly 1 argument")
      Int8Encode(exprs.head)
    }
  private[graft] val int8CodeDotBuilder: Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == 2, "int8_code_dot(a, b) takes exactly 2 arguments")
      Int8CodeDot(exprs(0), exprs(1))
    }
  private[graft] val packCodesBuilder: Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == 1, "pack_codes(codes) takes exactly 1 argument")
      PackCodes(exprs.head)
    }
  private[graft] val unpackCodesBuilder: Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == 1, "unpack_codes(b) takes exactly 1 argument")
      UnpackCodes(exprs.head)
    }
  private[graft] val cosineDBuilder: Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == 2, "cosine_sim_d(a, b) takes exactly 2 arguments")
      CosineSimilarityD(exprs(0), exprs(1))
    }
  private[graft] val prefixCosinesBuilder: Seq[Expression] => Expression =
    exprs => {
      require(exprs.length >= 3,
        "prefix_cosines(a, b, m1, ...) takes 2 arrays + >=1 cut literal")
      val cuts = exprs.drop(2).map { e =>
        require(e.foldable,
          "prefix_cosines cut points must be literal integers")
        e.eval() match {
          case i: Int => i
          case l: Long =>
            require(l == l.toInt.toLong,
              s"prefix_cosines cut point out of int range: $l")
            l.toInt
          case o => throw new IllegalArgumentException(
            s"prefix_cosines cut point must be an integer literal, got $o")
        }
      }
      PrefixCosines(exprs(0), exprs(1), cuts)
    }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", cosineBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "l2_dist_sq", l2Builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "int8_quant_stats", int8QuantBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "int8_quant_cosine", int8CosineBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "int8_encode", int8EncodeBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "int8_code_dot", int8CodeDotBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pack_codes", packCodesBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "unpack_codes", unpackCodesBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "prefix_cosines", prefixCosinesBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim_d", cosineDBuilder, "built-in")
  }

  /** Column-API form, valid on any session where [[register]] has run. */
  def cosineSim(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.{call_function}
    call_function("cosine_sim", a, b)
  }

  /** Squared L2 (float vector vs double centroid), post-[[register]]. */
  def l2DistSq(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.{call_function}
    call_function("l2_dist_sq", a, b)
  }

  /** Int8 quantization audit vector, post-[[register]]. */
  def int8QuantStats(v: Column): Column = {
    import org.apache.spark.sql.functions.{call_function}
    call_function("int8_quant_stats", v)
  }

  /** Cosine on int8 codes, post-[[register]]. */
  def int8QuantCosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.{call_function}
    call_function("int8_quant_cosine", a, b)
  }

  /** Materialized int8 codes for an embedding column, post-[[register]]. */
  def int8Encode(v: Column): Column = {
    import org.apache.spark.sql.functions.{call_function}
    call_function("int8_encode", v)
  }

  /** Exact integer dot over stored code arrays, post-[[register]]. */
  def int8CodeDot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.{call_function}
    call_function("int8_code_dot", a, b)
  }

  /** One-byte-per-subspace PQ code packing (k ≤ 256), post-[[register]]. */
  def packCodes(codes: Column): Column = {
    import org.apache.spark.sql.functions.{call_function}
    call_function("pack_codes", codes)
  }

  /** Unsigned unpack of a [[packCodes]] byte string, post-[[register]]. */
  def unpackCodes(b: Column): Column = {
    import org.apache.spark.sql.functions.{call_function}
    call_function("unpack_codes", b)
  }

  /** Cosine over array<double> inputs, post-[[register]]. */
  def cosineSimD(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.{call_function}
    call_function("cosine_sim_d", a, b)
  }

  /** All nested-prefix cosines in one codegen pass, post-[[register]]. */
  def prefixCosines(a: Column, b: Column, cuts: Seq[Int]): Column = {
    import org.apache.spark.sql.functions.{call_function, lit}
    call_function("prefix_cosines", (Seq(a, b) ++ cuts.map(lit(_))): _*)
  }
}
