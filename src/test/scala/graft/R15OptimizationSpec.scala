package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Equality pins for the r15 optimization-round internals. */
class R15OptimizationSpec extends AnyFunSuite {
  import TestSpark._

  test("matchingFraction agrees across long/int/smallint element types") {
    import spark.implicits._
    import graft.functions.LongArraySim.matchingFraction
    val df = Seq(
      (Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 7L)),  // 2/4 match
      (Seq(5L, 5L), Seq(5L, 5L)),                  // 4/4
      (Seq.empty[Long], Seq.empty[Long])           // empty → 0.0
    ).toDF("a", "b")
    def asType(c: String, t: String) =
      transform(col(c), x => x.cast(t)).as(c)
    val out = df.select(
      matchingFraction(col("a"), col("b")).as("fl"),
      matchingFraction(asType("a", "int"), asType("b", "int")).as("fi"),
      matchingFraction(asType("a", "smallint"), asType("b", "smallint")).as("fs")
    ).collect()
    out.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1))
      assert(r.getDouble(0) == r.getDouble(2))
    }
    assert(out.map(_.getDouble(0)).toSeq == Seq(0.5, 1.0, 0.0))
  }

  test("low-16-bit narrowed prefilter keeps every full-width survivor") {
    import spark.implicits._
    import graft.functions.LongArraySim.matchingFraction
    // adversarial values: identical low 16 bits with different high bits
    // (a narrowed FALSE match — must only ever ADD survivors), plus true
    // matches and true mismatches
    val base = 0x123456789ABCL
    val df = Seq(
      (Seq(base, base + 0x10000L), Seq(base, base)),          // pos0 true, pos1 low-16 collision
      (Seq(base, base + 1L), Seq(base + 2L, base + 3L))       // no matches at all
    ).toDF("a", "b")
    def narrow(c: String) = transform(col(c),
      x => (x.bitwiseAND(lit(0xFFFFL)) - lit(32768L)).cast("smallint"))
    val rows = df.select(
      matchingFraction(col("a"), col("b")).as("full"),
      matchingFraction(narrow("a"), narrow("b")).as("narrowed")
    ).collect()
    rows.foreach(r => assert(r.getDouble(1) >= r.getDouble(0),
      "narrowing must never LOSE a positionwise match"))
    assert(rows(0).getDouble(0) == 0.5 && rows(0).getDouble(1) == 1.0)
    assert(rows(1).getDouble(0) == 0.0 && rows(1).getDouble(1) == 0.0)
  }

  test("md5PrefixLong ≡ conv(substring(md5(...)),16,10) SQL chain") {
    import spark.implicits._
    import graft.functions.Md5Lattice.md5PrefixLong
    // ids spanning ascii, unicode, empty, long strings, and the gate's
    // "id:seed:b" shapes
    val df = (Seq("", "0", "42:gate:7", "abc:dsir", "日本語:seed:3",
      "x" * 500) ++ (0 until 200).map(i => s"$i:gate:${i % 20}"))
      .toDF("s")
    for (k <- Seq(13, 15)) {
      val rows = df.select(
        md5PrefixLong(col("s"), k).as("fused"),
        conv(substring(md5(col("s").cast("binary")), 1, k), 16, 10)
          .cast("long").as("chain")).collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
        s"k=$k mismatch: ${r.getLong(0)} vs ${r.getLong(1)}"))
    }
    // NULL propagates
    val nullRow = Seq[Option[String]](None).toDF("s")
      .select(md5PrefixLong(col("s"), 13)).collect().head
    assert(nullRow.isNullAt(0))
  }

  test("connectedComponents: small-graph union-find ≡ distributed loop") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // chains, a clique, self-contained pairs, duplicate edges, and a
    // reversed-order edge — the shapes near-dup graphs produce
    val edges = Seq(
      Row(2L, 1L), Row(2L, 3L), Row(3L, 4L),       // chain → cluster 1
      Row(10L, 11L), Row(11L, 12L), Row(10L, 12L), // triangle → cluster 10
      Row(20L, 21L), Row(20L, 21L),                // dup edge
      Row(31L, 30L)                                // reversed order
    ) ++ (100L until 164L).map(i => Row(i, i + 1)) // 64-hop chain → 100
    val pairs = spark.createDataFrame(
      spark.sparkContext.parallelize(edges, 4),
      StructType(Seq(StructField("id1", LongType), StructField("id2", LongType))))
    def run(cap: Int) = graft.ops.Dedup
      .connectedComponents(pairs, smallGraphEdgeCap = cap)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val small = run(1 << 20)  // driver union-find
    graft.core.Blocks.releaseAll()
    val loop = run(0)         // distributed min-label loop
    graft.core.Blocks.releaseAll()
    assert(small == loop)
    assert(small.contains(4L -> 1L) && small.contains(12L -> 10L) &&
      small.contains(30L -> 30L) && small.contains(164L -> 100L))
  }
}
