package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, ShortType}

/** Product-quantization kernels (Jégou, Douze & Schmid 2011, "Product
  * Quantization for Nearest Neighbor Search", IEEE TPAMI): the vector is
  * split into `m` contiguous subspaces of `dim/m` components; each
  * subspace is quantized independently against its own `ks`-codeword
  * codebook; a vector becomes `m` small integers (2 bytes each here vs
  * 4·dim bytes of floats — 128× compression at dim 64, m 4), and a query
  * scores a code by `m` lookups into a per-query table of
  * query-slice·codeword dots (ADC — asymmetric distance computation).
  *
  * All three kernels are native codegen'd Expressions (the
  * [[DotProductFloat]] / [[PlaneSignBits]] tier): the declarative
  * spelling would dispatch m·ks interpreted lambda chains per row.
  * Codebooks ride the expression as a constructor field (flattened
  * row-major to a primitive array referenced via `addReferenceObj`, the
  * [[PlaneSignBits]] pattern), so they are plan constants — broadcast to
  * every task with the serialized plan, never shuffled.
  *
  * Arithmetic contract (what the DuckDB oracle reproduces): all
  * accumulation is sequential left-to-right in double; float→double
  * widening is exact; encode argmin breaks ties to the SMALLEST codeword
  * index (strict `<` while scanning ascending).
  */
object PqCodes {

  /** Column API: PQ-encode a float vector → `array<smallint>` of length m
    * (null for a null / wrong-length / null-element vector).
    */
  def pqEncode(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    GraftBridge.toColumn(
      PqEncode(GraftBridge.toExpression(vec), canon(codebooks)))

  /** Column API: per-query ADC lookup table → `array<double>` of length
    * m·ks with `lut[s·ks + c] = query_slice(s) · codeword(s)(c)`.
    */
  def pqLut(queryVec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    GraftBridge.toColumn(
      PqLut(GraftBridge.toExpression(queryVec), canon(codebooks)))

  /** Column API: residual PQ encode — `pq_encode(vec − center)` with the
    * subtraction fused into the argmin loop (no residual array
    * materialized). The IVFADC flavor: codes quantize the offset from the
    * row's coarse centroid instead of the raw vector.
    */
  def pqEncodeResidual(
      vec: Column,
      center: Column,
      codebooks: Seq[Seq[Seq[Double]]]): Column =
    GraftBridge.toColumn(
      PqEncodeResidual(
        GraftBridge.toExpression(vec),
        GraftBridge.toExpression(center),
        canon(codebooks)))

  /** Column API: ADC score = Σ_s lut[s·ks + codes[s]] — the approximate
    * query·vector dot product, m array lookups per row.
    */
  def pqAdc(codes: Column, lut: Column): Column =
    GraftBridge.toColumn(
      PqAdc(GraftBridge.toExpression(codes), GraftBridge.toExpression(lut)))

  /** Deep-Vector the nested seq so expression equality (Catalyst
    * canonicalization / subexpression elimination) compares contents.
    */
  private def canon(cb: Seq[Seq[Seq[Double]]]): Seq[Seq[Seq[Double]]] =
    cb.map(_.map(_.toVector).toVector).toVector

  private[functions] def checkCodebooks(cb: Seq[Seq[Seq[Double]]]): Unit = {
    require(cb.nonEmpty, "need at least one subspace codebook")
    require(cb.forall(_.nonEmpty), "every subspace needs at least one codeword")
    val ks = cb.head.size
    require(cb.forall(_.size == ks), "subspaces must share one codeword count")
    require(ks <= 256, s"at most 256 codewords per subspace, got $ks")
    val sub = cb.head.head.length
    require(sub > 0 && cb.forall(_.forall(_.length == sub)),
      "codewords must share one (positive) subspace dimension")
  }

  private[functions] def flatten(cb: Seq[Seq[Seq[Double]]]): Array[Double] = {
    val m = cb.size; val ks = cb.head.size; val sub = cb.head.head.length
    val a = new Array[Double](m * ks * sub)
    var i = 0
    cb.foreach(_.foreach(_.foreach { v => a(i) = v; i += 1 }))
    a
  }
}

/** PQ encode: float vector → m smallint codes (argmin squared-L2 per
  * subspace, ties to the smallest codeword index). Null for a null,
  * wrong-length, or null-element input — loud enough downstream (codes
  * joins/key lookups drop nulls) without a per-row exception path.
  */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  PqCodes.checkCodebooks(codebooks)

  private def m: Int = codebooks.size
  private def ks: Int = codebooks.head.size
  private def sub: Int = codebooks.head.head.length
  private def dim: Int = m * sub

  @transient private lazy val flat: Array[Double] = PqCodes.flatten(codebooks)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"pq_encode expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(ShortType, containsNull = false)
  // null also for a non-null but wrong-length / null-element vector
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  private def compute(arr: ArrayData): Any = {
    if (arr.numElements() != dim) return null
    var j = 0
    while (j < dim) {
      if (arr.isNullAt(j)) return null
      j += 1
    }
    val codes = new Array[Short](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < ks) {
        val base = (s * ks + c) * sub
        var acc = 0.0
        var k = 0
        while (k < sub) {
          val d = arr.getFloat(s * sub + k).toDouble - flat(base + k)
          acc += d * d
          k += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      codes(s) = best.toShort
      s += 1
    }
    new GenericArrayData(codes)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", flat, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val ok = ctx.freshName("ok")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val codes = ctx.freshName("codes")
      val d = ctx.freshName("d")
      s"""
         |boolean $ok = $a.numElements() == $dim;
         |for (int $j = 0; $ok && $j < $dim; $j++) {
         |  if ($a.isNullAt($j)) $ok = false;
         |}
         |if (!$ok) {
         |  ${ev.isNull} = true;
         |} else {
         |  short[] $codes = new short[$m];
         |  for (int $s = 0; $s < $m; $s++) {
         |    int $best = 0;
         |    double $bestD = Double.POSITIVE_INFINITY;
         |    for (int $c = 0; $c < $ks; $c++) {
         |      int $base = ($s * $ks + $c) * $sub;
         |      double $acc = 0.0;
         |      for (int $k = 0; $k < $sub; $k++) {
         |        double $d = ((double) $a.getFloat($s * $sub + $k)) - $cbRef[$base + $k];
         |        $acc += $d * $d;
         |      }
         |      if ($acc < $bestD) { $bestD = $acc; $best = $c; }
         |    }
         |    $codes[$s] = (short) $best;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Residual PQ encode (the IVFADC flavor — Jégou 2011 §IV encodes the
  * offset from the coarse centroid, which concentrates the quantized
  * distribution and buys recall at the same (m, ks)): argmin squared-L2
  * of `vec − center` per subspace, with the subtraction fused into the
  * scoring loop — no residual array is ever materialized. `center` is a
  * per-row `array<float>` column (the row's coarse centroid, float-cast —
  * PQ error dwarfs the cast). Null for a null / wrong-length /
  * null-element vector OR center.
  */
case class PqEncodeResidual(
    left: Expression,
    right: Expression,
    codebooks: Seq[Seq[Seq[Double]]])
    extends BinaryExpression {

  PqCodes.checkCodebooks(codebooks)

  private def m: Int = codebooks.size
  private def ks: Int = codebooks.head.size
  private def sub: Int = codebooks.head.head.length
  private def dim: Int = m * sub

  @transient private lazy val flat: Array[Double] = PqCodes.flatten(codebooks)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"pq_encode_residual expects two array<float> arguments, got " +
            s"${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = ArrayType(ShortType, containsNull = false)
  // null also for non-null but wrong-length / null-element inputs
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode_residual"

  override def nullSafeEval(v: Any, c: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val cen = c.asInstanceOf[ArrayData]
    if (arr.numElements() != dim || cen.numElements() != dim) return null
    var j = 0
    while (j < dim) {
      if (arr.isNullAt(j) || cen.isNullAt(j)) return null
      j += 1
    }
    val codes = new Array[Short](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var cc = 0
      while (cc < ks) {
        val base = (s * ks + cc) * sub
        var acc = 0.0
        var k = 0
        while (k < sub) {
          val i = s * sub + k
          val d = (arr.getFloat(i).toDouble - cen.getFloat(i).toDouble) - flat(base + k)
          acc += d * d
          k += 1
        }
        if (acc < bestD) { bestD = acc; best = cc }
        cc += 1
      }
      codes(s) = best.toShort
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", flat, "double[]")
    nullSafeCodeGen(ctx, ev, (a, cen) => {
      val ok = ctx.freshName("ok")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val codes = ctx.freshName("codes")
      val d = ctx.freshName("d")
      s"""
         |boolean $ok = $a.numElements() == $dim && $cen.numElements() == $dim;
         |for (int $j = 0; $ok && $j < $dim; $j++) {
         |  if ($a.isNullAt($j) || $cen.isNullAt($j)) $ok = false;
         |}
         |if (!$ok) {
         |  ${ev.isNull} = true;
         |} else {
         |  short[] $codes = new short[$m];
         |  for (int $s = 0; $s < $m; $s++) {
         |    int $best = 0;
         |    double $bestD = Double.POSITIVE_INFINITY;
         |    for (int $c = 0; $c < $ks; $c++) {
         |      int $base = ($s * $ks + $c) * $sub;
         |      double $acc = 0.0;
         |      for (int $k = 0; $k < $sub; $k++) {
         |        int $i = $s * $sub + $k;
         |        double $d = (((double) $a.getFloat($i)) - ((double) $cen.getFloat($i))) - $cbRef[$base + $k];
         |        $acc += $d * $d;
         |      }
         |      if ($acc < $bestD) { $bestD = $acc; $best = $c; }
         |    }
         |    $codes[$s] = (short) $best;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): PqEncodeResidual =
    copy(left = newLeft, right = newRight)
}

/** Per-query ADC lookup table: `array<double>` of length m·ks,
  * `lut[s·ks + c] = Σ_j query(s·sub + j) · codeword(s)(c)(j)` — the
  * query-side half of the asymmetric distance computation, built once per
  * query row and broadcast with it. Null for a null / wrong-length /
  * null-element query vector.
  */
case class PqLut(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  PqCodes.checkCodebooks(codebooks)

  private def m: Int = codebooks.size
  private def ks: Int = codebooks.head.size
  private def sub: Int = codebooks.head.head.length
  private def dim: Int = m * sub

  @transient private lazy val flat: Array[Double] = PqCodes.flatten(codebooks)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"pq_lut expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  // null also for a non-null but wrong-length / null-element vector
  override def nullable: Boolean = true
  override def prettyName: String = "pq_lut"

  private def compute(arr: ArrayData): Any = {
    if (arr.numElements() != dim) return null
    var j = 0
    while (j < dim) {
      if (arr.isNullAt(j)) return null
      j += 1
    }
    val lut = new Array[Double](m * ks)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ks) {
        val base = (s * ks + c) * sub
        var acc = 0.0
        var k = 0
        while (k < sub) {
          acc += arr.getFloat(s * sub + k).toDouble * flat(base + k)
          k += 1
        }
        lut(s * ks + c) = acc
        c += 1
      }
      s += 1
    }
    new GenericArrayData(lut)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", flat, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val ok = ctx.freshName("ok")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      val lut = ctx.freshName("lut")
      s"""
         |boolean $ok = $a.numElements() == $dim;
         |for (int $j = 0; $ok && $j < $dim; $j++) {
         |  if ($a.isNullAt($j)) $ok = false;
         |}
         |if (!$ok) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $lut = new double[${m * ks}];
         |  for (int $s = 0; $s < $m; $s++) {
         |    for (int $c = 0; $c < $ks; $c++) {
         |      int $base = ($s * $ks + $c) * $sub;
         |      double $acc = 0.0;
         |      for (int $k = 0; $k < $sub; $k++) {
         |        $acc += ((double) $a.getFloat($s * $sub + $k)) * $cbRef[$base + $k];
         |      }
         |      $lut[$s * $ks + $c] = $acc;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($lut);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** ADC score: `Σ_s lut[s·ks + codes[s]]` with `ks = lut.length / codes
  * .length` — m array lookups + m-term sequential double sum per scored
  * row (the hot inner loop of every PQ scan; ~sub× fewer flops and
  * ~2·sub× fewer bytes than the exact slice dots). Null if either input
  * is null, the lut length is not a multiple of the code length, or a
  * code is out of range.
  */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ShortType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"pq_adc expects (array<smallint>, array<double>), got " +
            s"${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = DoubleType
  // null also for shape-mismatched or out-of-range non-null inputs
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(codesAny: Any, lutAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val lut = lutAny.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m == 0 || lut.numElements() % m != 0) return null
    val ks = lut.numElements() / m
    var acc = 0.0
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val c = codes.getShort(s).toInt
      if (c < 0 || c >= ks) return null
      if (lut.isNullAt(s * ks + c)) return null
      acc += lut.getDouble(s * ks + c)
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val m = ctx.freshName("m")
      val ks = ctx.freshName("ks")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $m = $codes.numElements();
         |if ($m == 0 || $lut.numElements() % $m != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $ks = $lut.numElements() / $m;
         |  double $acc = 0.0;
         |  boolean $bad = false;
         |  for (int $s = 0; $s < $m; $s++) {
         |    if ($codes.isNullAt($s)) { $bad = true; break; }
         |    int $c = (int) $codes.getShort($s);
         |    if ($c < 0 || $c >= $ks || $lut.isNullAt($s * $ks + $c)) { $bad = true; break; }
         |    $acc += $lut.getDouble($s * $ks + $c);
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): PqAdc = copy(left = newLeft, right = newRight)
}
