package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.NearestCellsCos.nearestCellsCos

/** NaN discipline in the per-row cosine kernel: a zero-norm row vector
  * (divideByRowNorm: 0/0 → NaN) or a zero-norm centroid must rank LAST —
  * matching Spark's double ordering where NaN > any value, the semantics of
  * the min(struct)/window spelling the kernel replaced — and must not crash
  * the round6 path (Spark's round() passes NaN/Infinity through unchanged;
  * BigDecimal.valueOf(NaN) throws).
  */
class NearestCellsNaNSpec extends AnyFunSuite {
  import TestSpark._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = true), nullable = true)))

  private def frame(vecs: Seq[Seq[Float]]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        vecs.zipWithIndex.map { case (v, i) => Row(i.toLong, v) }, 1),
      schema)

  test("zero-norm row vector survives round6 (NaN skips BigDecimal rounding)") {
    val cells = Seq(1L -> Seq(1.0, 0.0), 2L -> Seq(0.0, 1.0))
    val norms = Seq(1.0, 1.0)
    val out = frame(Seq(Seq(0.0f, 0.0f)))
      .select(nearestCellsCos(col("embedding"), cells, norms,
        howMany = 1, divideByRowNorm = true, round6 = true).as("cells"))
      .collect()
    // every score is NaN: the row still gets an assignment (ascending-cid
    // first fill), it just can't crash
    assert(out.length == 1 && out.head.getSeq[Long](0).nonEmpty)
  }

  test("zero-norm centroid ranks last, not first (NaN = +inf neg)") {
    // cell 1 is degenerate (zero norm → NaN score for every row); cell 2 is
    // a real match. NaN-ranked-first would return cell 1 for every row.
    val cells = Seq(1L -> Seq(0.0, 0.0), 2L -> Seq(0.0, 1.0))
    val norms = Seq(0.0, 1.0)
    val out = frame(Seq(Seq(0.0f, 1.0f), Seq(0.5f, 0.5f)))
      .select(nearestCellsCos(col("embedding"), cells, norms,
        howMany = 1, divideByRowNorm = true, round6 = false).as("cells"))
      .collect()
    out.foreach(r => assert(r.getSeq[Long](0) == Seq(2L)))
  }

  test("NaN entry inserted while filling is displaced by any real score") {
    // degenerate cell scans FIRST (cid 1, ascending) and fills the single
    // top-p slot with neg=+inf; the later real cell must displace it
    val cells = Seq(1L -> Seq(0.0, 0.0), 5L -> Seq(1.0, 0.0))
    val norms = Seq(0.0, 1.0)
    val out = frame(Seq(Seq(1.0f, 0.0f)))
      .select(nearestCellsCos(col("embedding"), cells, norms,
        howMany = 2, divideByRowNorm = true, round6 = true).as("cells"))
      .collect()
    // real cell first, degenerate cell still reported at rank 2
    assert(out.head.getSeq[Long](0) == Seq(5L, 1L))
  }
}
