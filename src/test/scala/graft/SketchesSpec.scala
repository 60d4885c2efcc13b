package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sketches

/** Count-Min sketch invariants: the one-sided error guarantee, exactness at
  * generous width, and the union+re-agg merge being identical to sketching
  * the concatenated stream (the property that makes daily→monthly rollups
  * sound).
  */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val words =
    Seq.fill(40)("alpha") ++ Seq.fill(25)("beta") ++ Seq.fill(9)("gamma") ++
      (1 to 30).map(i => s"tail$i")

  test("estimates never underestimate; generous width is exact") {
    val df = words.toDF("w")
    val truth = words.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val probes = (truth.keys.toSeq.sorted.take(5) :+ "alpha" :+ "absent")
      .distinct.toDF("w")
    // narrow sketch: >= truth always
    val narrow = Sketches.cmsEstimate(
      Sketches.cmsSketch(df, "w", depth = 3, width = 8), probes, "w", 3, 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.filter(kv => narrow.contains(kv._1)).foreach { case (k, n) =>
      assert(narrow(k) >= n, s"CMS underestimated $k")
    }
    assert(narrow("absent") >= 0L)
    // wide sketch: collisions vanish, estimates exact
    val wide = Sketches.cmsEstimate(
      Sketches.cmsSketch(df, "w", depth = 4, width = 4096), probes, "w", 4, 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.filter(kv => wide.contains(kv._1)).foreach { case (k, n) =>
      assert(wide(k) === n, s"wide CMS should be exact for $k")
    }
    assert(wide("absent") === 0L)
  }

  test("merge of two sketches equals the sketch of the union") {
    val (a, b) = words.splitAt(37)
    val merged = Sketches.cmsMerge(
      Sketches.cmsSketch(a.toDF("w"), "w", 4, 32),
      Sketches.cmsSketch(b.toDF("w"), "w", 4, 32))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = Sketches.cmsSketch(words.toDF("w"), "w", 4, 32)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged === whole)
  }

  test("sketch size is bounded by geometry, not data volume") {
    val big = (1 to 5000).map(i => s"v$i").toDF("w")
    val n = Sketches.cmsSketch(big, "w", depth = 4, width = 64).count()
    assert(n <= 4L * 64)
  }

  test("bloom: no false negatives; merge equals sketch of the union") {
    val members = (1 to 200).map(i => s"m$i")
    val sketch = Sketches.bloomSketch(members.toDF("v"), "v", 4, 8192)
    val verdicts = Sketches
      .bloomContains(sketch, members.toDF("v"), "v", 4, 8192)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(members.forall(verdicts(_)), "a member must never read absent")
    // absent probes: mostly false at this generous geometry
    val absent = Sketches
      .bloomContains(sketch, (1 to 200).map(i => s"a$i").toDF("v"), "v", 4, 8192)
      .collect().count(_.getBoolean(1))
    assert(absent < 20, s"false-positive burst: $absent/200")
    val (x, y) = members.splitAt(77)
    val merged = Sketches.bloomMerge(
      Sketches.bloomSketch(x.toDF("v"), "v", 4, 8192),
      Sketches.bloomSketch(y.toDF("v"), "v", 4, 8192))
      .as[Long].collect().toSet
    assert(merged === sketch.as[Long].collect().toSet)
  }

  test("hll: estimate within expected error on both branches; merge = union") {
    // raw branch: 5000 uniques at m=256 (b=8) — typical error ~1.04/√m ≈ 6.5%
    val big = (1 to 5000).map(i => s"u$i").toDF("v")
    val bigEst = Sketches.hllEstimate(Sketches.hllSketch(big, "v", 8), 8)
      .head().getDouble(2)
    assert(math.abs(bigEst - 5000) / 5000 < 0.2, s"raw-branch estimate $bigEst")
    // linear-counting branch: 30 uniques at m=256
    val small = (1 to 30).map(i => s"s$i").toDF("v")
    val smallEst = Sketches.hllEstimate(Sketches.hllSketch(small, "v", 8), 8)
      .head().getDouble(2)
    assert(math.abs(smallEst - 30) / 30 < 0.2, s"linear-counting estimate $smallEst")
    // duplicates don't move the registers
    val dup = Sketches.hllEstimate(
      Sketches.hllSketch(big.unionAll(big), "v", 8), 8).head().getDouble(2)
    assert(dup === bigEst)
    // merge: per-bucket max equals the union's sketch
    val (p, q) = (1 to 5000).map(i => s"u$i").splitAt(2222)
    val merged = Sketches.hllMerge(
      Sketches.hllSketch(p.toDF("v"), "v", 8),
      Sketches.hllSketch(q.toDF("v"), "v", 8))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val whole = Sketches.hllSketch(big, "v", 8)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(merged === whole)
  }
}
