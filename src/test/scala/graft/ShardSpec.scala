package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Corpus

/** Weight-balanced serpentine shard assignment: exact parity with a local
  * reference implementation, balance quality on heavy-tailed weights, and
  * edge handling (NULL ids/weights).
  */
class ShardSpec extends AnyFunSuite {
  import TestSpark._

  private def localSerpentine(
      rows: Seq[(Long, Long)], nShards: Int): Map[Long, (Long, Long)] =
    rows.sortBy { case (id, w) => (-w, id) }.zipWithIndex.map {
      case ((id, _), i) =>
        val pass = i / nShards
        val pos = i % nShards
        val shard = if (pass % 2 == 0) pos else nShards - 1 - pos
        id -> ((i + 1).toLong, shard.toLong)
    }.toMap

  test("serpentine assignment matches the local reference exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // heavy-tailed weights with deliberate ties
    val rows = (0L until 500L).map(i =>
      (i, math.max(1, (1000 * math.pow(rnd.nextDouble(), 4)).toLong / 10 * 10)))
    val got = Corpus
      .assignShardsBalanced(rows.toDF("id", "w"), "id", "w", nShards = 7,
        numBuckets = 16)
      .select("id", "shard_rank", "shard")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == localSerpentine(rows, 7))
  }

  test("per-shard weight totals balance heavy-tailed inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0L until 2000L).map(i =>
      (i, math.max(1L, (10000 * math.pow(rnd.nextDouble(), 6)).toLong)))
    val totals = Corpus
      .assignShardsBalanced(rows.toDF("id", "w"), "id", "w", nShards = 16)
      .groupBy("shard").agg(sum("w").as("tw"))
      .collect().map(_.getLong(1))
    assert(totals.length == 16)
    val spread = totals.max.toDouble / totals.min
    // hash sharding on this corpus spreads >1.5x; serpentine stays tight
    assert(spread < 1.05, s"shard totals spread $spread: ${totals.toSeq}")
  }

  test("NULL ids are excluded; NULL weights rank as zero") {
    import spark.implicits._
    val df = Seq(
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(100L)),
      (java.lang.Long.valueOf(2L), null.asInstanceOf[java.lang.Long]),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(50L)))
      .toDF("id", "w")
    val out = Corpus.assignShardsBalanced(df, "id", "w", nShards = 2)
      .select("id", "shard_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L))
  }
}
