package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Corpus-aware ANN auto-sizing (`lshAutoParams` / `ivfAutoParams` /
  * `semanticProbesAuto`): formula pins at the sizes that matter, plus a
  * measured recall floor on the UNREPLICATED sf0.001 embeddings — the
  * honest near-random hard case where the old fixed defaults recalled
  * 0.125 (r8 verdict item 2).
  */
class AnnAutoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("lshAutoParams: small corpora examine ~everything, big corpora bound cost") {
    // n=2000, k=10 (the bench's honest leg): bits 2, 3 tables — examined
    // fraction bound 1.0, measured recall 0.997 (AnnSweep)
    assert(Similarity.lshAutoParams(2000, 10) === ((2, 3)))
    // 100× corpus: buckets stay ~256 expected members, tables cap at 8 —
    // the cost stays bounded and the FRACTION (not the bill) degrades
    val (bits200k, tables200k) = Similarity.lshAutoParams(200000, 10)
    assert(bits200k === 9)
    assert(tables200k === 8)
    // 20M vectors: bits keep tracking log2(n/256) under the 20-bit clamp
    val (bitsBig, tablesBig) = Similarity.lshAutoParams(20000000L, 10)
    assert(bitsBig === 16 && tablesBig === 8)
    // degenerate corpora never produce invalid geometry
    val (b0, t0) = Similarity.lshAutoParams(0, 10)
    assert(b0 >= 2 && t0 >= 1)
  }

  test("ivfAutoParams: cells track corpus/200, probe fraction 0.75 -> 0.1") {
    // honest leg: 16 cells, probe 12 (recall 0.932 measured)
    assert(Similarity.ivfAutoParams(2000, 10) === ((16, 12)))
    // big corpus: cells grow linearly, probed FRACTION decays to the floor
    val (cents, probe) = Similarity.ivfAutoParams(200000, 10)
    assert(cents === 1000)
    assert(probe === 100) // 0.1 floor of 1000 cells
    assert(probe.toDouble / cents <= 0.11)
  }

  test("semanticProbesAuto: quarter of the cells, capped at 8") {
    assert(Similarity.semanticProbesAuto(16) === 4)
    assert(Similarity.semanticProbesAuto(1000) === 8)
    assert(Similarity.semanticProbesAuto(1) === 1)
  }

  test("auto paths clear a 0.9 recall floor on unreplicated embeddings") {
    val v = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n = v.count()
    val k = 10
    val queries = v.where(pmod(col("vec_id"), lit(5)) === 0)
    val truth = Similarity
      .bruteForceTopK(v, queries, "vec_id", "embedding", k)
      .select(col("query_id"), col("neighbor_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (truth intersect got).size.toDouble / truth.size
    }
    val lsh = recallOf(
      Similarity.lshTopKAuto(v, queries, "vec_id", "embedding", k, corpusSize = n))
    val ivf = recallOf(
      Similarity.ivfTopKAuto(v, queries, "vec_id", "embedding", k, corpusSize = n))
    assert(lsh >= 0.9, s"auto LSH recall $lsh")
    assert(ivf >= 0.9, s"auto IVF recall $ivf")
  }
}
