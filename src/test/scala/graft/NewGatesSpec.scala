package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-12 gates: q_compacted_dedup must equal the batch cross
  * recompute (the compaction-invisibility contract, here against the live
  * batch op — the driver's DuckDB oracle re-checks it independently), and
  * q_indexed_auto must emit the all-green row its constant oracle expects.
  */
class NewGatesSpec extends AnyFunSuite {
  import TestSpark._

  test("q_compacted_dedup == batch crossNearDups on the thirds split (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val gate = rows(SparkEntry.queries("q_compacted_dedup")(spark, dir))
    val batch = rows(
      graft.ops.Dedup.crossNearDups(
        docs.where(col("doc_id") % 3 === 0),
        docs.where(col("doc_id") % 3 =!= 0),
        "text", "doc_id", threshold = 0.6)
        .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard")))
    graft.core.Blocks.releaseAll()
    assert(batch.nonEmpty, "fixture should produce at least one cross pair")
    assert(gate === batch)
  }

  test("q_indexed_auto emits the all-green row (sf0.001 and sf0.01)") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val row = SparkEntry.queries("q_indexed_auto")(spark, dir).collect()
      graft.core.Blocks.releaseAll()
      assert(row.length == 1)
      assert(row.head.toSeq.forall(_ == "true"),
        s"$dir: ${row.head.toSeq.mkString(",")}")
    }
  }

  test("every query has an oracle or is deliberately rows-only") {
    // the new lifecycle gates must be present in BOTH maps
    Seq("q_compacted_dedup", "q_indexed_auto",
      "q_rebanded_dedup", "q_rebuilt_ann").foreach { q =>
      assert(SparkEntry.queries.contains(q), s"$q missing from queries")
      assert(SparkEntry.oracleSql.contains(q), s"$q missing from oracleSql")
    }
  }

  // ---- round-13 gates ----

  test("q_rebanded_dedup == batch crossNearDups (re-banding is result-invisible at lifted cap)") {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val gate = rows(SparkEntry.queries("q_rebanded_dedup")(spark, dir))
    val batch = rows(
      graft.ops.Dedup.crossNearDups(
        docs.where(col("doc_id") % 3 === 0),
        docs.where(col("doc_id") % 3 =!= 0),
        "text", "doc_id", threshold = 0.6)
        .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard")))
    graft.core.Blocks.releaseAll()
    assert(batch.nonEmpty, "fixture should produce at least one cross pair")
    assert(gate === batch)
  }

  test("q_rebuilt_ann == brute force at exhaustive probes (refit is result-invisible)") {
    val dir = "/root/testdata/sf0.001"
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gate = rows(SparkEntry.queries("q_rebuilt_ann")(spark, dir))
    val brute = rows(
      graft.ops.Similarity.bruteForceTopK(
        vecs, vecs.where(col("vec_id") < 5), "vec_id", "embedding", 3))
    graft.core.Blocks.releaseAll()
    assert(gate === brute)
  }
}
