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

  test("kmv: sketch is the exact bottom-k by hash; dups never consume slots") {
    val vals = (1 to 500).map(i => s"v$i")
    val df = (vals ++ vals ++ vals).toDF("v") // triplicated
    val sk = Sketches.kmvSketch(df, "v", k = 32).collect()
    assert(sk.length === 32)
    // brute force: hash every distinct value, take the 32 smallest
    val brute = vals.toDF("v")
      .select(Sketches.kmvHash(col("v")).as("h"), col("v"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).take(32)
    assert(sk.map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      === brute.toSeq)
  }

  test("kmv: merge of two sketches equals the sketch of the union") {
    val (p, q) = (1 to 400).map(i => s"m$i").splitAt(170)
    val k = 48
    val merged = Sketches.kmvMerge(
      Sketches.kmvSketch(p.toDF("v"), "v", k),
      Sketches.kmvSketch(q.toDF("v"), "v", k), k)
      .collect().map(_.getString(1)).toSet
    val whole = Sketches.kmvSketch((p ++ q).toDF("v"), "v", k)
      .collect().map(_.getString(1)).toSet
    assert(merged === whole)
  }

  test("kmv: under-full estimate is exact, full estimate lands near truth") {
    val few = (1 to 20).map(i => s"f$i").toDF("v")
    val exact = Sketches.kmvDistinctEstimate(
      Sketches.kmvSketch(few, "v", 64), 64).head()
    assert(exact.getLong(0) === 20L && exact.getDouble(1) === 20.0)
    val many = (1 to 20000).map(i => s"g$i").toDF("v")
    val est = Sketches.kmvDistinctEstimate(
      Sketches.kmvSketch(many, "v", 256), 256).head().getDouble(1)
    // k=256 -> relative error ~1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert(math.abs(est - 20000) / 20000 < 0.25, s"kmv estimate $est")
  }

  test("hll grouped: per-key estimates equal the per-key global pipeline") {
    val rows = (1 to 3000).map(i => (s"g${i % 3}", s"v${i % (100 * (1 + i % 3))}"))
    val df = rows.toDF("k", "v")
    val grouped = Sketches.hllGroupedEstimate(df, "k", "v", b = 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val single = Sketches.hllEstimate(
        Sketches.hllSketch(df.where(col("k") === g), "v", 8), 8).head()
      assert(grouped(g)._1 === single.getLong(0), s"$g n_hit")
      assert(grouped(g)._2 === single.getDouble(2), s"$g estimate")
    }
    // sanity: estimates land near the true per-key distinct counts
    val truth = rows.groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2).toSet.size }
    truth.foreach { case (g, n) =>
      assert(math.abs(grouped(g)._2 - n) / n < 0.25, s"$g: ${grouped(g)._2} vs $n")
    }
  }

  test("kmv: quantiles with k >= n distinct are the exact distinct quantiles") {
    val df = (1 to 100).map(i => i.toString).toDF("v")
    val sk = Sketches.kmvSketch(df, "v", k = 200) // under-full: all values
    val qs = Sketches.kmvQuantiles(sk, Seq(0.25, 0.5, 1.0))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(qs(0.25) === 25.0 && qs(0.5) === 50.0 && qs(1.0) === 100.0)
  }

  test("kmv set estimates: under-full union is exact jaccard/union/intersection") {
    val a = (1 to 30).map(i => s"s$i").toDF("v")   // {1..30}
    val b = (20 to 50).map(i => s"s$i").toDF("v")  // {20..50}
    val r = Sketches.kmvSetEstimates(
      Sketches.kmvSketch(a, "v", 256), Sketches.kmvSketch(b, "v", 256), 256)
      .head()
    assert(r.getLong(0) == 50L, "union has 50 distincts, sketch under-full")
    assert(r.getLong(1) == 11L, "common = {20..30}")
    assert(r.getDouble(2) == 11.0 / 50)
    assert(r.getDouble(3) == 50.0)
    assert(math.abs(r.getDouble(4) - 11.0) < 1e-9)
  }

  test("kmv set estimates: full sketches land near the true overlap") {
    val a = (1 to 3000).map(i => s"e$i").toDF("v")
    val b = (2001 to 5000).map(i => s"e$i").toDF("v") // true ∩ = 1000, ∪ = 5000
    val r = Sketches.kmvSetEstimates(
      Sketches.kmvSketch(a, "v", 256), Sketches.kmvSketch(b, "v", 256), 256)
      .head()
    assert(r.getLong(0) == 256L)
    assert(math.abs(r.getDouble(2) - 0.2) < 0.1, s"jaccard ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3) - 5000) / 5000 < 0.25, s"union ${r.getDouble(3)}")
    assert(math.abs(r.getDouble(4) - 1000) / 1000 < 0.5, s"intersect ${r.getDouble(4)}")
  }
}
