package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Blocks
import graft.ops.{Dedup, Skew}

/** Checkpoint-lifetime discipline: the round-4 bench showed dead
  * localCheckpoint blocks from earlier pipelines starving later queries'
  * execution memory over a long session. These tests pin the three layers
  * of the fix: within-call release of dead intermediates, scope-release for
  * scalar constraint evaluations, and harness-level `releaseAll`.
  */
class BlocksSpec extends AnyFunSuite {
  import TestSpark._

  /** localCheckpoint'd RDDs register in the context's persistentRdds — the
    * honest, engine-level measure of what is still pinned in the block
    * manager. Caches register there too, so tests clear both first.
    */
  private def pinnedRdds: Int = {
    spark.sparkContext.getPersistentRDDs.size
  }

  private def resetStorage(): Unit = {
    spark.catalog.clearCache()
    Blocks.releaseAll()
    // release is async on the block manager but the persistentRdds map is
    // driver-side and synchronous — no wait needed for the COUNT
  }

  private def docs = {
    import spark.implicits._
    (1 to 40).map { i =>
      val body =
        if (i % 10 == 0) s"the quick brown fox jumps over the lazy dog ${i - 1}"
        else s"the quick brown fox jumps over the lazy dog $i"
      (i.toLong, body)
    }.toDF("doc_id", "text")
  }

  test("releaseAll drops every checkpoint a pipeline materialized") {
    resetStorage()
    val before = pinnedRdds
    val pairs = Dedup.minhashNearDups(docs, "text", "doc_id", threshold = 0.5)
    pairs.count()
    assert(
      pinnedRdds > before,
      "construction should have pinned checkpointed intermediates")
    Blocks.releaseAll()
    assert(
      pinnedRdds == before,
      s"releaseAll must unpin every tracked checkpoint (still $pinnedRdds)")
    assert(Blocks.trackedCount == 0)
  }

  test("minhashNearDups releases the banded-bucket checkpoint within the call") {
    resetStorage()
    val before = pinnedRdds
    Dedup.minhashNearDups(docs, "text", "doc_id", threshold = 0.5)
    // live after construction: the candidate pairs + the candidate-subset
    // verification payloads — the corpus-wide signature checkpoint and the
    // (id, band, bucket) explode, both strictly corpus-sized, must be gone
    // already (released as soon as the candidates materialized)
    assert(
      pinnedRdds - before == 2,
      s"expected exactly {candidates, candidate sides} pinned, got ${pinnedRdds - before}")
    Blocks.releaseAll()
  }

  test("heavyHitters keeps only the tiny hot-key result pinned") {
    import spark.implicits._
    resetStorage()
    val before = pinnedRdds
    val df = ((1 to 90).map(_ => "hot") ++ (1 to 30).map(i => s"k$i")).toDF("k")
    val hot = Skew.heavyHitters(df, Seq("k"), threshold = 0.5)
    assert(hot.collect().map(_.getString(0)).toSeq == Seq("hot"))
    // the key-cardinality counts checkpoint is released inside the call;
    // only the (≤ 1/threshold rows) result remains
    assert(
      pinnedRdds - before == 1,
      s"expected only the hot-key result pinned, got ${pinnedRdds - before}")
    Blocks.releaseAll()
  }

  test("a constraint evaluation leaves no checkpoint behind (scoped release)") {
    resetStorage()
    val before = pinnedRdds
    val r = graft.core.DataRef(graft.core.FrameSource(docs, "docs"))
    val res = graft.constraints
      .MaxNearDupFraction(r, "text", refValue = Some(1.0), jaccardThreshold = 0.5)
      .test(spark)
    assert(res.outcome, res.message)
    assert(
      pinnedRdds == before,
      s"constraint evaluation must release its checkpoints on return " +
        s"(still ${pinnedRdds - before} pinned)")
  }

  test("released frames are invalid, derived-frame release is a safe no-op") {
    resetStorage()
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b")).toDF("id", "t")
    val ck = Blocks.checkpoint(base)
    val derived = ck.select(col("id"))
    Blocks.release(derived) // root-only match: must NOT touch ck's blocks
    assert(ck.count() == 2L)
    Blocks.release(ck)
    assert(Blocks.trackedCount == 0)
  }
}
