package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skew

/** Salted-join and heavy-hitter diagnosis tests. */
class SkewSpec extends AnyFunSuite {
  import TestSpark._

  test("salted join preserves inner-join semantics") {
    import spark.implicits._
    // skewed: key 1 carries 90% of rows
    val skewed = ((1 to 90).map(i => (1, s"v$i")) ++ (1 to 10).map(i => (i + 1, "x")))
      .toDF("k", "payload")
    val small = Seq((1, "one"), (2, "two"), (99, "none")).toDF("k", "name")
    val plain  = skewed.join(small, "k").select("k", "payload", "name")
      .collect().map(_.toString).sorted.toSeq
    val salted = Skew.saltedJoin(skewed, small, Seq("k"), saltBuckets = 8)
      .select("k", "payload", "name")
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("salted join spreads byte-identical duplicate rows of a hot key") {
    import spark.implicits._
    // the pre-dedup corpus state: the hot key's rows are IDENTICAL — a
    // full-row-hash salt would put them all in one bucket
    val skewed = (1 to 200).map(_ => (1, "same")).toDF("k", "payload")
    val small = Seq((1, "one")).toDF("k", "name")
    val spread = skewed
      .withColumn("dj_salt",
        pmod(monotonically_increasing_id(), lit(8L)).cast("int"))
      .select(countDistinct(col("dj_salt")))
      .head().getLong(0)
    assert(spread > 1, s"identical rows must land in multiple salt buckets, got $spread")
    // and the join result is still exactly the plain inner join
    val plain = skewed.join(small, "k").count()
    assert(Skew.saltedJoin(skewed, small, Seq("k"), 8).count() == plain)
  }

  test("minhash verification join tolerates a planted 10x skewed bucket") {
    import spark.implicits._
    // one boilerplate template shared by 40 docs -> every LSH band buckets
    // them together, so doc ids in that cluster carry ~10x the candidate
    // pairs of the 4 unrelated docs: the classic hot verification key.
    // The pipeline must neither error nor lose pairs — banded buckets stay
    // under the cap and the exact-Jaccard verify filters precisely.
    val template = "the quick brown fox jumps over the lazy dog while the band plays on"
    val hot = (1 to 40).map(i => (i.toLong, s"$template edition $i"))
    val cold = Seq(
      (101L, "completely unrelated text about spark physical planning"),
      (102L, "another separate document mentioning adaptive execution"),
      (103L, "grocery list apples oranges bananas pears plums"),
      (104L, "weather report heavy rain expected tomorrow evening"))
    val df = (hot ++ cold).toDF("doc_id", "text")
    val pairs = graft.ops.Dedup
      .minhashNearDups(df, "text", "doc_id", threshold = 0.5)
      .collect()
    val hotIds = (1L to 40L).toSet
    // every hot pair is near-identical (shared 5-gram mass >> threshold):
    // all C(40,2) pairs must survive, none involving a cold doc
    assert(pairs.forall(r => hotIds.contains(r.getLong(0)) && hotIds.contains(r.getLong(1))))
    assert(pairs.length == 40 * 39 / 2,
      s"expected every hot pair to survive the skewed bucket, got ${pairs.length}")
    assert(pairs.forall(_.getDouble(2) >= 0.5))
    spark.catalog.clearCache()
  }

  test("salted join with idCol: deterministic salt, same join semantics") {
    import spark.implicits._
    val skewed = ((1 to 90).map(i => (1, i.toLong, s"v$i")) ++
      (1 to 10).map(i => (i + 1, (100 + i).toLong, "x"))).toDF("k", "rid", "payload")
    val small = Seq((1, "one"), (2, "two")).toDF("k", "name")
    val plain = skewed.join(small, "k").select("k", "rid", "name")
      .collect().map(_.toString).sorted.toSeq
    val salted = Skew.saltedJoin(skewed, small, Seq("k"), 8, idCol = Some("rid"))
      .select("k", "rid", "name")
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
    // the deterministic salt really spreads the hot key across buckets
    val spread = skewed
      .withColumn("dj_salt", pmod(xxhash64(col("rid")), lit(8L)).cast("int"))
      .where(col("k") === 1)
      .select(countDistinct(col("dj_salt"))).head().getLong(0)
    assert(spread > 1, s"hot key must span multiple salt buckets, got $spread")
  }

  test("heavyHitters flags the hot key only") {
    import spark.implicits._
    val df = ((1 to 90).map(_ => 1) ++ (2 to 11)).toDF("k")
    val hot = Skew.heavyHitters(df, Seq("k"), threshold = 0.5)
      .collect().map(_.getInt(0)).toSeq
    assert(hot == Seq(1))
  }

  test("heavyHitters threshold is exact: a small frame is not all-hot") {
    import spark.implicits._
    // 50 distinct keys (2% share each) at a 5% threshold: none are hot —
    // the old max(1, floor(total*threshold)) clamp turned the cutoff into
    // 1 row and reported every key as a heavy hitter
    val df = (1 to 50).toDF("k")
    assert(Skew.heavyHitters(df, Seq("k"), threshold = 0.05).count() == 0)
    // strictly-more-than: a key at exactly the threshold share is not hot
    val df2 = ((1 to 5).map(_ => 1) ++ (2 to 6)).toDF("k") // key 1 at 50%
    assert(Skew.heavyHitters(df2, Seq("k"), threshold = 0.5).count() == 0)
    assert(Skew.heavyHitters(df2, Seq("k"), threshold = 0.49)
      .collect().map(_.getInt(0)).toSeq == Seq(1))
  }
}
