package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Multi-probe SemDeDup pairing (`semanticNearDups(probes = p)`):
  * containment, recall monotonicity, and literal/broadcast path agreement.
  */
class SemanticProbeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Thr = 0.3495

  private def pairsOf(probes: Int, maxLiteralCentroids: Int = 512): Set[(Long, Long)] =
    Similarity
      .semanticNearDups(
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"),
        "vec_id", "embedding", Thr,
        nClusters = 64, lloydIters = 0, corpusSize = Some(1),
        maxLiteralCentroids = maxLiteralCentroids, probes = probes)
      .select(col("id1").cast("long"), col("id2").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet

  test("probes=1 output is a subset of probes=2 output, which finds more") {
    val p1 = pairsOf(1)
    val p2 = pairsOf(2)
    assert(p1.nonEmpty)
    assert(p1.subsetOf(p2), s"missing: ${(p1 -- p2).take(5)}")
    // on the sf0.001 embeddings, cell-boundary pairs exist — the second
    // probe must recover at least one of them
    assert(p2.size > p1.size)
  }

  test("multi-probe recall vs brute force improves and pairs stay exact") {
    val v = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = v.select(col("vec_id").as("id1"), col("embedding").as("e1"))
    val b = v.select(col("vec_id").as("id2"), col("embedding").as("e2"))
    val truth = a.join(b, col("id1") < col("id2"))
      .where(Similarity.cosineF(col("e1"), col("e2")) >= Thr)
      .select(col("id1").cast("long"), col("id2").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val p1 = pairsOf(1)
    val p2 = pairsOf(2)
    // every reported pair is a true pair (verification is exact cosine)
    assert(p2.subsetOf(truth))
    val r1 = p1.size.toDouble / truth.size
    val r2 = p2.size.toDouble / truth.size
    assert(r2 >= r1)
  }

  test("broadcast-join assignment path agrees with the literal path") {
    // maxLiteralCentroids = 0 forces the broadcast top-p path; identical
    // operands in identical order → identical pairs
    assert(pairsOf(2) === pairsOf(2, maxLiteralCentroids = 0))
  }
}
