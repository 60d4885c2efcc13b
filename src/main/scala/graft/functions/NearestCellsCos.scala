package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native per-row top-p nearest cells by (optionally normalized, optionally
  * 6-dp-rounded) cosine — the cosine-flavor sibling of [[NearestCellDot]],
  * replacing the broadcast-argmin kernel on its remaining corpus-sized
  * sites (SemDeDup assignment, IVF-rerank prefilter assignment), where the
  * kernel's `min(struct)`/window both devolve into a sort over the n·k
  * scored rows.
  *
  * Scoring (reproducing the column spellings it replaces, bit for bit):
  *   - `dot` — left-to-right double accumulation of `vec(j)·cell(j)` over
  *     `min(len)` elements. Cell values are DOUBLES: the SemDeDup spelling
  *     scores against the raw double centroids, the rerank spelling
  *     against float-cast ones — a float widens to double exactly, so the
  *     rerank caller passes `v.map(_.toFloat.toDouble)` and stays
  *     bit-identical to its old `dotF`-vs-float form. One deliberate
  *     deviation from the interpreted HOF `dot`: a NULL ELEMENT
  *     contributes 0 here (the `dotF` semantics) where the HOF fold
  *     null-poisons the whole dot — only malformed vectors differ;
  *   - `divideByRowNorm = true` → `cos = dot / (‖vec‖ · cellNorm)` (the
  *     SemDeDup spelling — ‖vec‖ = sqrt of the self-dot); `false` →
  *     `score = dot / cellNorm` (the rerank spelling, which drops the
  *     row-constant factor);
  *   - `round6 = true` → the score is rounded exactly like Spark's
  *     `round(x, 6)` (BigDecimal.valueOf → setScale HALF_UP) BEFORE
  *     ranking — the rounding creates the ties the cid order then breaks,
  *     so it must happen per cell, not per winner.
  *
  * Ranking: ascending (−score, cid) — ties to the smallest cell id — and
  * the result is the first `howMany` cell ids IN RANK ORDER
  * (`array<bigint>`), so `posexplode` gives (rank−1, cid) exactly like
  * the ≤256-literal `slice(sortedCids, 1, p)` spelling.
  *
  * Per-row semantics: duplicate ids assign independently per row — the
  * keyed kernel had to RAISE on duplicates because its groupBy/window
  * would silently merge them; a per-row expression removes that failure
  * mode (and the ≤256-switch discontinuity) outright.
  */
case class NearestCellsCos(
    child: Expression,
    cells: Seq[(Long, Seq[Double])],
    cellNorms: Seq[Double],
    howMany: Int,
    divideByRowNorm: Boolean,
    round6: Boolean)
    extends UnaryExpression {

  require(cells.nonEmpty, "need at least one cell")
  require(cellNorms.length == cells.length, "one norm per cell")
  require(howMany >= 1, s"howMany must be positive: $howMany")

  private def n: Int = cells.size
  private def p: Int = math.min(howMany, n)

  @transient private lazy val (cids, offsets, flat): (Array[Long], Array[Int], Array[Double]) = {
    val ids = new Array[Long](n)
    val off = new Array[Int](n + 1)
    cells.zipWithIndex.foreach { case ((cid, v), i) =>
      ids(i) = cid; off(i + 1) = off(i) + v.length
    }
    val f = new Array[Double](off(n))
    var i = 0
    cells.foreach(_._2.foreach { x => f(i) = x; i += 1 })
    (ids, off, f)
  }

  @transient private lazy val norms: Array[Double] = cellNorms.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"nearest_cells_cos expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_cells_cos"

  // the hot loop lives here and eval/codegen both call it — the BigDecimal
  // rounding and the insertion ranking are identical on both paths by
  // construction (codegen calls this compiled method via a reference)
  private[functions] def compute(arr: ArrayData): GenericArrayData = {
    val nv = arr.numElements()
    var rowNorm = 1.0
    if (divideByRowNorm) {
      var acc = 0.0
      var j = 0
      while (j < nv) {
        if (!arr.isNullAt(j)) {
          val x = arr.getFloat(j).toDouble
          acc += x * x
        }
        j += 1
      }
      rowNorm = math.sqrt(acc)
    }
    val bestNeg = new Array[Double](p)
    val bestCid = new Array[Long](p)
    var size = 0
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
      var score =
        if (divideByRowNorm) acc / (rowNorm * norms(i)) else acc / norms(i)
      if (round6 && !score.isNaN && !score.isInfinite) {
        // exactly Spark's round(x, 6) on doubles — decimal (shortest-repr)
        // representation, HALF_UP; Spark's RoundBase passes NaN/Infinity
        // through unchanged (BigDecimal.valueOf(NaN) would throw).
        score = java.math.BigDecimal.valueOf(score)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      }
      // NaN (zero-norm row or centroid) ranks last, matching Spark's double
      // ordering where NaN > any value — the min(struct)/window spelling
      // this kernel replaced ranked NaN last too.
      val neg = if (score.isNaN) Double.PositiveInfinity else -score
      // ascending-cid scan + strict < insertion ≡ rank by (neg, cid)
      if (size < p || neg < bestNeg(size - 1)) {
        var pos = if (size < p) size else p - 1
        while (pos > 0 && neg < bestNeg(pos - 1)) {
          bestNeg(pos) = bestNeg(pos - 1)
          bestCid(pos) = bestCid(pos - 1)
          pos -= 1
        }
        bestNeg(pos) = neg
        bestCid(pos) = cids(i)
        if (size < p) size += 1
      }
      i += 1
    }
    val out = new Array[Long](size)
    System.arraycopy(bestCid, 0, out, 0, size)
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nearestCellsCos", this,
      classOf[NearestCellsCos].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellsCos =
    copy(child = newChild)
}

object NearestCellsCos {

  /** Column API: the `howMany` best cell ids by cosine, rank order. Cells
    * sort by ascending id here so the strict-< scan realizes the
    * ties-to-smallest-cid contract regardless of caller order; norms stay
    * paired with their cells through the sort.
    */
  def nearestCellsCos(
      vec: Column,
      cells: Seq[(Long, Seq[Double])],
      cellNorms: Seq[Double],
      howMany: Int,
      divideByRowNorm: Boolean,
      round6: Boolean): Column = {
    val paired = cells.zip(cellNorms).sortBy(_._1._1)
    GraftBridge.toColumn(
      NearestCellsCos(
        GraftBridge.toExpression(vec),
        paired.map { case ((cid, v), _) => (cid, v.toVector) }.toVector,
        paired.map(_._2).toVector,
        howMany, divideByRowNorm, round6))
  }
}
