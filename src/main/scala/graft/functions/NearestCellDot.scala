package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native per-row nearest-cell assignment by dot product: the argmin over
  * a FIXED centroid set rides the expression as a plan constant (the
  * [[PlaneSignBits]]/[[PqEncode]] pattern), so assigning a corpus row to
  * its cell is ONE projection — no crossJoin blowup, no aggregate, no
  * shuffle, no join-back.
  *
  * This replaces the broadcast-argmin kernel on its hottest call sites
  * (corpus→cell assignment, Lloyd refinement, IMI half assignment). The
  * kernel's `min(struct(neg, cid))` aggregate LOOKS like a map-side
  * combine but structs are not hash-aggregable: Spark plans a
  * SortAggregate that sorts — and at n·k volume, SPILLS — every scored
  * row (measured 70-100 s for a 50k×2000 assignment whose dot products
  * cost ~2 s; stack-sampled to `sort_addToSorter` and spill merges).
  * Scoring inside one codegen'd loop does the same flops with none of
  * the row machinery.
  *
  * Bit-compatibility with the kernel it replaces: `neg` accumulates
  * `vec(j)·cell(j)` left-to-right in double over `min(vecLen, cellLen)`
  * elements with null elements contributing 0 — exactly
  * [[DotProductFloat]] against the float-cast centroid — and ties break
  * to the smallest cell id (cells scan in ascending-cid order with a
  * strict `<`, ≡ `min(struct(neg, cid))`). Per-row semantics equal the
  * ≤256-literal path's: duplicate ids assign per row (the keyed kernel
  * had to RAISE on duplicates because its groupBy would silently merge
  * them — a per-row expression has no such failure mode).
  *
  * Returns struct(cid BIGINT, neg DOUBLE); null for a null vector.
  */
case class NearestCellDot(child: Expression, cells: Seq[(Long, Seq[Float])])
    extends UnaryExpression {

  require(cells.nonEmpty, "need at least one cell")

  private def n: Int = cells.size

  // flattened ragged layout: offsets(i) is cell i's start, cids(i) its id
  @transient private lazy val (cids, offsets, flat): (Array[Long], Array[Int], Array[Float]) = {
    val ids = new Array[Long](n)
    val off = new Array[Int](n + 1)
    cells.zipWithIndex.foreach { case ((cid, v), i) =>
      ids(i) = cid; off(i + 1) = off(i) + v.length
    }
    val f = new Array[Float](off(n))
    var i = 0
    cells.foreach(_._2.foreach { x => f(i) = x; i += 1 })
    (ids, off, f)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"nearest_cell_dot expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cid", LongType, nullable = false),
    StructField("neg", DoubleType, nullable = false)))
  override def prettyName: String = "nearest_cell_dot"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val nv = arr.numElements()
    var bestCid = 0L
    var bestNeg = Double.PositiveInfinity
    var i = 0
    while (i < n) {
      val from = offsets(i)
      val len = math.min(nv, offsets(i + 1) - from)
      var acc = 0.0
      var j = 0
      while (j < len) {
        if (!arr.isNullAt(j)) acc += arr.getFloat(j).toDouble * flat(from + j)
        j += 1
      }
      val neg = -acc
      if (neg < bestNeg) { bestNeg = neg; bestCid = cids(i) }
      i += 1
    }
    new GenericInternalRow(Array[Any](bestCid, bestNeg))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cidsRef = ctx.addReferenceObj("cellIds", cids, "long[]")
    val offRef = ctx.addReferenceObj("cellOffsets", offsets, "int[]")
    val flatRef = ctx.addReferenceObj("cellValues", flat, "float[]")
    nullSafeCodeGen(ctx, ev, a => {
      val nv = ctx.freshName("nv")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val from = ctx.freshName("from")
      val len = ctx.freshName("len")
      val acc = ctx.freshName("acc")
      val neg = ctx.freshName("neg")
      val bestCid = ctx.freshName("bestCid")
      val bestNeg = ctx.freshName("bestNeg")
      s"""
         |int $nv = $a.numElements();
         |long $bestCid = 0L;
         |double $bestNeg = Double.POSITIVE_INFINITY;
         |for (int $i = 0; $i < $n; $i++) {
         |  int $from = $offRef[$i];
         |  int $len = java.lang.Math.min($nv, $offRef[$i + 1] - $from);
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $len; $j++) {
         |    if (!$a.isNullAt($j)) {
         |      $acc += ((double) $a.getFloat($j)) * $flatRef[$from + $j];
         |    }
         |  }
         |  double $neg = -$acc;
         |  if ($neg < $bestNeg) { $bestNeg = $neg; $bestCid = $cidsRef[$i]; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$bestCid, $bestNeg});
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellDot =
    copy(child = newChild)
}

object NearestCellDot {

  /** Column API: struct(cid, neg) of the dot-nearest cell. Cells are
    * sorted by ascending id here so the strict-< scan realizes the
    * ties-to-smallest-cid contract regardless of caller order.
    */
  def nearestCellDot(vec: Column, cells: Seq[(Long, Seq[Float])]): Column =
    GraftBridge.toColumn(
      NearestCellDot(
        GraftBridge.toExpression(vec),
        cells.sortBy(_._1).map { case (cid, v) => (cid, v.toVector) }.toVector))
}
