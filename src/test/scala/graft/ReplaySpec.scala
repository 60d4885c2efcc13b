package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Replay

/** Shared streaming replay: one concurrent replay pass serves all five
  * streaming gates; a repeat ensure() in the same (session, dir) reuses the
  * finished memory-sink views instead of replaying.
  */
class ReplaySpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"

  test("one ensure() produces all five views, nonempty where data exists") {
    Replay.ensure(spark, dir)
    Seq(
      Replay.SessionsView, Replay.CmsView, Replay.HistogramView,
      Replay.HllView, Replay.DedupView).foreach { v =>
      assert(spark.table(v).count() > 0, s"view $v is empty")
    }
  }

  test("second ensure() reuses the views (no streams restarted)") {
    Replay.ensure(spark, dir)
    val t0 = System.nanoTime()
    Replay.ensure(spark, dir)
    val t = (System.nanoTime() - t0) / 1e9
    assert(spark.streams.active.isEmpty)
    assert(t < 1.0, s"repeat ensure took ${t}s — it replayed instead of reusing")
  }

  test("streaming gates still answer through the shared replay") {
    val sessions = SparkEntry.queries("q_streaming_sessions")(spark, dir)
    val row = sessions.collect()
    assert(row.length == 1)
    assert(row.head.toSeq.forall(_ == "true"), row.head.toSeq.mkString(","))
    assert(SparkEntry.queries("q_streaming_dedup")(spark, dir).count() > 0)
    assert(SparkEntry.queries("q_streaming_cms")(spark, dir).count() > 0)
    assert(SparkEntry.queries("q_streaming_hll")(spark, dir).count() > 0)
    assert(SparkEntry.queries("q_streaming_histogram")(spark, dir).count() > 0)
  }
}
