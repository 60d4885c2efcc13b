package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MinHashSignature.minhashSignature
import graft.ops.{Dedup, TextAnalysis}

/** Native codegen'd MinHash signature: bit-identical to the declarative
  * HOF spelling (`xxhash64(s)` per shingle, `xxhash64(i, h)` per function),
  * and present inside a codegen'd projection.
  */
class MinHashSignatureSpec extends AnyFunSuite {
  import TestSpark._

  private def shingled = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .limit(100)
    .select(
      col("doc_id"),
      Dedup.charShingles(TextAnalysis.normalize(col("text")), 5).as("shingles"))
    .where(size(col("shingles")) > 0)

  test("native signature equals the HOF spelling bit-for-bit") {
    val rows = shingled
      .withColumn("hashes", transform(col("shingles"), s => xxhash64(s)))
      .select(
        minhashSignature(col("shingles"), 64).as("native"),
        Dedup.minhashSignatureHof(col("hashes"), 64).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("sorted-hash-array input equals string input (order-invariant min)") {
    val rows = shingled
      .select(
        minhashSignature(col("shingles"), 64).as("fromStrings"),
        minhashSignature(
          sort_array(transform(col("shingles"), s => xxhash64(s))), 64)
          .as("fromHashes"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("type check rejects non-string, non-long arrays") {
    val df = spark.range(1).select(array(lit(1.5), lit(2.5)).as("a"))
    val e = intercept[Exception](df.select(minhashSignature(col("a"), 8)).head())
    assert(e.getMessage.toLowerCase.contains("minhash_signature") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("jaccardSorted equals array_intersect/array_union jaccard") {
    import graft.functions.LongArraySim.jaccardSorted
    val hashed = shingled
      .select(col("doc_id"),
        sort_array(transform(col("shingles"), s => xxhash64(s))).as("h"))
    val pairs = hashed.as("a").join(hashed.as("b"),
        col("a.doc_id") < col("b.doc_id")).limit(300)
      .select(
        jaccardSorted(col("a.h"), col("b.h")).as("native"),
        (size(array_intersect(col("a.h"), col("b.h"))).cast("double") /
          size(array_union(col("a.h"), col("b.h")))).as("declarative"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("fused shingle-hash kernel equals the declarative chain") {
    import graft.functions.ShingleHashes.shingleHashes
    val rows = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(200)
      .select(
        shingleHashes(TextAnalysis.normalize(col("text")), 5).as("native"),
        sort_array(transform(
          Dedup.charShingles(TextAnalysis.normalize(col("text")), 5),
          s => xxhash64(s))).as("declarative"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
    // short-input edge: fewer than k chars → empty set on both spellings
    import spark.implicits._
    val short = Seq("ab", "", "a b!").toDF("text")
      .select(
        shingleHashes(TextAnalysis.normalize(col("text")), 5).as("native"),
        sort_array(transform(
          Dedup.charShingles(TextAnalysis.normalize(col("text")), 5),
          s => xxhash64(s))).as("declarative"))
      .collect()
    short.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("strided-hash kernel equals the declarative substr+xxhash64 chain") {
    import graft.functions.StridedHashes.stridedHashes
    def declarative(t: org.apache.spark.sql.Column, n: Int, stride: Int) =
      sort_array(array_distinct(transform(
        filter(
          transform(
            sequence(lit(0), greatest(length(t) - n, lit(0)), lit(stride)),
            i => t.substr(i + 1, lit(n))),
          s => length(s) === n),
        s => xxhash64(s))))
    val norm = TextAnalysis.normalize(col("text"))
    val rows = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(200)
      .select(
        sort_array(stridedHashes(norm, 24, 4)).as("native"),
        declarative(norm, 24, 4).as("declarative"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
    // edges: shorter than the window, exactly the window, stride overshoot
    import spark.implicits._
    val edge = Seq("", "shorty", "exactly-24-chars-string!", "x" * 25, "y" * 29)
      .toDF("text")
      .select(
        sort_array(stridedHashes(col("text"), 24, 4)).as("native"),
        declarative(col("text"), 24, 4).as("declarative"))
      .collect()
    edge.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("native simhash64 equals the HOF fold bit-for-bit (all three flavors)") {
    import graft.functions.SimHash64.simhash64
    val rows = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(200)
      .where(size(TextAnalysis.tokens(col("text"))) > 0)
      .select(
        simhash64(TextAnalysis.tokens(col("text"))).as("native"),
        Dedup.simhash64(TextAnalysis.tokens(col("text"))).as("hof"),
        simhash64(TextAnalysis.normalize(col("text"))).as("fusedText"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1))
      assert(r.getLong(2) == r.getLong(1), "fused text flavor diverged")
    }
    // split-parity edges: empty string and interior empty segments
    import spark.implicits._
    val edges = Seq("", "a", "a b", "ab").toDF("t")
      .select(
        simhash64(col("t")).as("fused"),
        Dedup.simhash64(split(col("t"), " ")).as("hof"))
      .collect()
    edges.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("matchingFraction equals the zip_with agreement fraction") {
    import graft.functions.LongArraySim.matchingFraction
    val sigs = shingled.select(minhashSignature(col("shingles"), 64).as("sig"))
    val pairs = sigs.as("a").crossJoin(sigs.as("b")).limit(300)
      .select(
        matchingFraction(col("a.sig"), col("b.sig")).as("native"),
        (size(filter(zip_with(col("a.sig"), col("b.sig"), (x, y) => x === y),
          v => v)).cast("double") / 64).as("declarative"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("expression participates in whole-stage codegen") {
    val plan = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(
        Dedup.charShingles(TextAnalysis.normalize(col("text")), 5).as("shingles"))
      .select(minhashSignature(col("shingles"), 64).as("sig"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("minhash_signature"), plan)
    assert(plan.contains("*"), s"no WholeStageCodegen span:\n$plan")
  }
}
