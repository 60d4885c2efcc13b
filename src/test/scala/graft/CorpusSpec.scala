package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Corpus

/** Corpus-preparation operator truth tables: repetition signals,
  * decontamination, vocabulary top-k, deterministic splits, stratified
  * sampling (exactness of the salted two-phase plan vs the naive single
  * window), and weighted mixing (determinism + rate monotonicity).
  */
class CorpusSpec extends AnyFunSuite {
  import TestSpark._

  private def docs(rows: (Long, String)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, t) => Row(i, t) }, 3),
      StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType))))

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("repetitionSignals: top-2-gram and dup-5-gram character fractions") {
    val df = docs(
      1L -> "a b a b a b",   // 2-grams: "a b"x3, "b a"x2 → top2 = 3*3/11
      2L -> "x",             // shorter than every gram width → 0, 0
      3L -> "p q r s t p q r s t p q r s t", // the 5-gram "p q r s t" repeats
      4L -> null)            // NULL text excluded entirely
    val got = Corpus.repetitionSignals(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L)._1 == math.rint(3.0 * 3 / 11 * 1e6) / 1e6)
    assert(got(1L)._2 == 0.0) // both 5-grams of doc 1 occur once
    assert(got(2L) == ((0.0, 0.0)))
    // doc 3: 15 tokens, 11 5-grams, len 29; "p q r s t" occurs 3 times (9
    // chars); dup-covered grams: those with cnt > 1
    assert(got(3L)._2 > 0.0)
  }

  test("decontaminate: flags corpus docs sharing a word n-gram with the eval set") {
    val corpus = docs(
      10L -> "the quick brown fox jumps over the lazy dog",
      11L -> "completely unrelated text with no overlap at all")
    val eval = docs(
      90L -> "quick brown fox jumps zebra")
    // n=4: corpus doc 10 shares "quick brown fox jumps"
    val got = Corpus.decontaminate(corpus, eval, "text", "doc_id", n = 4, hashKeys = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 1L))
    // hashed keys flag the identical docs
    val hashed = Corpus.decontaminate(corpus, eval, "text", "doc_id", n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashed == got)
  }

  test("vocabularyTopK: frequency order with deterministic tie-break") {
    val df = docs(1L -> "b a b c a b", 2L -> "c a")
    val got = Corpus.vocabularyTopK(df, "text", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // counts: a=3, b=3, c=2 → ties break token-ascending
    assert(got.toSeq == Seq(("a", 3L), ("b", 3L), ("c", 2L)))
  }

  test("splitColumn: hex boundaries, determinism, full coverage") {
    assert(Corpus.splitBoundsHex(Seq(("a", 0.5), ("b", 0.5))) ==
      Seq("8" + "0" * 31))
    val ids = spark.range(0, 1000).select(col("id").as("doc_id"))
    val w = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val split1 = Corpus.assignSplits(ids, "doc_id", w)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val split2 = Corpus.assignSplits(ids, "doc_id", w)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(split1 == split2) // pure function of (id, seed)
    val counts = split1.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts.values.sum == 1000)
    // uniform hash: 80/10/10 within generous tolerance
    assert(counts("train") > 700 && counts("train") < 900, counts)
    assert(counts("val") > 40 && counts("val") < 180, counts)
    assert(counts("test") > 40 && counts("test") < 180, counts)
    // membership matches a reference MD5 computation
    val u0 = md5Hex("0:graft")
    val expected0 =
      if (u0 < Corpus.splitBoundsHex(w)(0)) "train"
      else if (u0 < Corpus.splitBoundsHex(w)(1)) "val" else "test"
    assert(split1(0L) == expected0)
    intercept[IllegalArgumentException] {
      Corpus.splitColumn(col("doc_id"), Seq(("a", 0.5), ("b", 0.4)), "s")
    }
  }

  test("stratifiedSample: salted two-phase equals the naive single window") {
    val df = spark.range(0, 500, 1, 8)
      .select(col("id").as("doc_id"), (col("id") % 5).as("stratum"))
    val k = 4
    val got = Corpus.stratifiedSample(df, "stratum", "doc_id", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // naive spelling: one global window per stratum
    val u = md5(concat(col("doc_id").cast("string"), lit(":graft:sample")).cast("binary"))
    val naive = df
      .withColumn("sample_rank",
        row_number().over(Window.partitionBy(col("stratum")).orderBy(u, col("doc_id"))))
      .where(col("sample_rank") <= k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == naive)
    assert(got.size == 5 * k)
    assert(got.groupBy(_._2).forall { case (_, rows) =>
      rows.map(_._3).toSeq.sorted == (1 to k) })

    // null ids have no hash identity: excluded, never hogging the sample
    // (null dj_u would otherwise sort NULLS FIRST into every slot)
    val withNulls = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0L until 50L).map(i => Row(java.lang.Long.valueOf(i), 1L)) ++
          Seq.fill(10)(Row(null, 1L)), 4),
      StructType(Seq(
        StructField("doc_id", LongType),
        StructField("stratum", LongType))))
    val sampled = Corpus.stratifiedSample(withNulls, "stratum", "doc_id", 3)
      .collect().map(_.getLong(0))
    assert(sampled.length == 3 && sampled.forall(_ >= 0))
  }

  test("packSequences: concat-and-chunk pack assignment per hash bucket") {
    val df = spark.range(0, 200, 1, 4)
      .select(col("id").as("doc_id"), (col("id") % 17 + 1).as("n_tokens"))
    val capacity = 40
    val got = Corpus.packSequences(df, "doc_id", "n_tokens", capacity, nBuckets = 4)
      .collect()
      .map(r => (
        r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("pack_bucket"), r.getAs[Long]("pack_id"),
        r.getAs[Long]("pack_offset")))
    assert(got.length == 200)
    // reference computation: same md5 order, same running sums
    val expected = got.toSeq
      .groupBy(_._3)
      .toSeq
      .flatMap { case (bucket, rows) =>
        val ordered = rows.sortBy(r => (md5Hex(s"${r._1}:graft:pack"), r._1))
        ordered.scanLeft(0L)((off, r) => off + r._2).zip(ordered).map {
          case (off, r) => (r._1, bucket, off / capacity, off)
        }
      }
      .toSet
    assert(got.map(r => (r._1, r._3, r._4, r._5)).toSet == expected)
    // every doc's window index is its start offset over capacity; offsets
    // within a bucket are strictly increasing in hash order (n_tokens >= 1)
    assert(got.forall(r => r._4 == r._5 / capacity))
    // bucket is the md5-prefix lattice value mod nBuckets
    got.take(5).foreach { r =>
      assert(r._3 ==
        (BigInt(md5Hex(s"${r._1}:graft:pack").substring(0, 8), 16) % 4).toLong)
    }
    // deterministic across recomputation
    val again = Corpus.packSequences(df, "doc_id", "n_tokens", capacity, nBuckets = 4)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pack_id"))).toMap
    assert(got.map(r => (r._1, r._4)).toMap == again)

    // a NULL token count packs as width 0 at its position — it must not
    // teleport the doc to offset 0; offsets stay non-decreasing per bucket
    val nullCnt = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0L until 30L).map(i =>
          Row(java.lang.Long.valueOf(i),
            if (i % 7 == 3) null else java.lang.Long.valueOf(10L))), 2),
      StructType(Seq(
        StructField("doc_id", LongType),
        StructField("n_tokens", LongType))))
    val packedN = Corpus.packSequences(nullCnt, "doc_id", "n_tokens", 25, nBuckets = 2)
      .collect()
      .map(r => (r.getAs[Long]("pack_bucket"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("pack_offset")))
    packedN.groupBy(_._1).foreach { case (_, rows) =>
      val offsets = rows.sortBy(r => (md5Hex(s"${r._2}:graft:pack"), r._2)).map(_._3)
      assert(offsets.toSeq == offsets.toSeq.sorted, offsets.toSeq)
    }
  }

  test("bigramCrossEntropy: add-one smoothed self-LM, hand-computed") {
    import graft.ops.Corpus
    // vocab {a,b,c,z} (the bigram-less doc still contributes to V);
    // C(a,b)=2 C(b,a)=1 C(a,c)=1; contexts C(a)=3 C(b)=1
    val d = docs(1L -> "a b a b", 2L -> "a c", 3L -> "z")
    val out = Corpus.bigramCrossEntropy(d, "text", "doc_id")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(r.fieldIndex("n_bigrams")),
          r.getDecimal(r.fieldIndex("cross_entropy")).doubleValue())))
      .toMap
    val ce1 = -(2 * math.log(3.0 / 7) + math.log(2.0 / 5)) / 3
    val ce2 = -math.log(2.0 / 7)
    assert(out(1L)._1 == 3L)
    assert(math.abs(out(1L)._2 - ce1) < 1e-9, s"${out(1L)._2} vs $ce1")
    assert(math.abs(out(2L)._2 - ce2) < 1e-9)
    assert(!out.contains(3L)) // no bigrams → absent
  }

  test("tfidfTopK: rare terms outrank common ones, ties break by token") {
    import graft.ops.Corpus
    val d = docs(
      1L -> "common rare common unique",
      2L -> "common common shared",
      3L -> "common shared")
    val out = Corpus.tfidfTopK(d, "text", "doc_id", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(r.fieldIndex("rank"))) ->
        (r.getString(r.fieldIndex("token")),
          r.getLong(r.fieldIndex("tf")), r.getLong(r.fieldIndex("df"))))
      .toMap
    // doc 1: 'common' appears in all 3 docs (idf = ln(4/4) = 0); the df=1
    // terms 'rare'/'unique' share tf=1,df=1 → exact tie → token ascending
    assert(out((1L, 1)) == (("rare", 1L, 1L)))
    assert(out((1L, 2)) == (("unique", 1L, 1L)))
    // doc 2: tf=2 ln(4/4)=0 for common; 'shared' df=2 idf=ln(4/3)>0 wins
    assert(out((2L, 1))._1 == "shared")
    // smoothed idf of an everywhere-term is exactly 0 → it can still rank
    // (k exceeds the doc's vocabulary) but with score 0
    assert(out((3L, 2))._1 == "common")
    // empty corpus → empty result, no crash
    assert(Corpus.tfidfTopK(docs(), "text", "doc_id", 3).count() == 0)
  }

  test("bm25TopK: hand-computed Okapi scores, deterministic ranking") {
    import graft.ops.Corpus
    val d = docs(
      1L -> "apple banana apple",
      2L -> "apple cherry",
      3L -> "banana banana cherry cherry")
    val q = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("q1", "apple banana")), 1),
      StructType(Seq(
        StructField("query_id", StringType),
        StructField("query_text", StringType))))
    val out = Corpus
      .bm25TopK(d, "text", "doc_id", q, "query_id", "query_text", k = 3)
      .collect()
      .map(r => r.getLong(r.fieldIndex("rank")) ->
        (r.getLong(r.fieldIndex("doc_id")), r.getDouble(r.fieldIndex("score"))))
      .toMap
    // N=3, avgdl=3, df(apple)=df(banana)=2 -> idf = ln(1.6) for both.
    // d1 (dl=3): apple tf=2 -> 4.4/3.2, banana tf=1 -> 2.2/2.2
    // d2 (dl=2): apple tf=1 -> 2.2/1.9
    // d3 (dl=4): banana tf=2 -> 4.4/3.5
    val idf = math.log(1.6)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L)._1 === 1L)
    assert(math.abs(out(1L)._2 - r6((4.4 / 3.2 + 2.2 / 2.2) * idf)) < 2e-6)
    assert(out(2L)._1 === 3L)
    assert(math.abs(out(2L)._2 - r6(4.4 / 3.5 * idf)) < 2e-6)
    assert(out(3L)._1 === 2L)
    assert(math.abs(out(3L)._2 - r6(2.2 / 1.9 * idf)) < 2e-6)
    graft.core.Blocks.releaseAll()
  }

  test("bm25TopK: k bounds results; queries with no matching term vanish") {
    import graft.ops.Corpus
    val d = docs(1L -> "alpha beta", 2L -> "alpha gamma", 3L -> "alpha delta")
    val q = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("qa", "alpha"), Row("qz", "zeta")), 1),
      StructType(Seq(
        StructField("query_id", StringType),
        StructField("query_text", StringType))))
    val rows = Corpus
      .bm25TopK(d, "text", "doc_id", q, "query_id", "query_text", k = 2)
      .collect()
    assert(rows.forall(_.getString(0) == "qa"), "no-match query must emit nothing")
    assert(rows.length === 2, s"k=2 must cap the per-query list: ${rows.length}")
    // equal scores everywhere -> ties break by doc_id ascending
    assert(rows.map(r => r.getLong(r.fieldIndex("doc_id"))).toSeq === Seq(1L, 2L))
    graft.core.Blocks.releaseAll()
  }

  test("chunkDocuments: sliding token windows with overlap") {
    import graft.ops.Corpus
    val words = (1 to 10).map(i => s"w$i").mkString(" ") // 10 tokens
    val d = docs(
      1L -> words,
      2L -> "a  b", // double space → 2 tokens after empty-fragment filter
      3L -> "   ",  // whitespace-only → no chunks
      4L -> null)   // null → no chunks
    val out = Corpus.chunkDocuments(d, "text", chunkTokens = 4, overlapTokens = 1)
      .orderBy("doc_id", "chunk_idx")
      .collect()
      .map(r => (r.getLong(0), r.getInt(r.fieldIndex("chunk_idx")),
        r.getString(r.fieldIndex("chunk_text")),
        r.getInt(r.fieldIndex("chunk_tokens"))))
    // stride 3: windows at 0,3,6,9 — the last is a 1-token tail
    assert(out.filter(_._1 == 1L).toSeq == Seq(
      (1L, 0, "w1 w2 w3 w4", 4),
      (1L, 1, "w4 w5 w6 w7", 4), // w4 carried: 1-token overlap
      (1L, 2, "w7 w8 w9 w10", 4),
      (1L, 3, "w10", 1)))
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0, "a b", 2)))
    assert(!out.exists(r => r._1 == 3L || r._1 == 4L))
    // zero overlap partitions exactly
    val flat = Corpus.chunkDocuments(docs(1L -> words), "text", 5)
      .select(col("chunk_text")).collect().map(_.getString(0))
    assert(flat.toSeq == Seq("w1 w2 w3 w4 w5", "w6 w7 w8 w9 w10"))
  }

  test("MaxNearDupFraction: a near-duplication budget as a declarable constraint") {
    import graft.requirements.WithinRequirement
    val longA = "the quick brown fox jumps over the lazy dog near the warm " +
      "windowsill every single morning without fail"
    val df = docs(
      1L -> longA,
      2L -> longA.replace("morning", "evening"),
      3L -> "completely different text about spark catalyst optimizer rules and codegen",
      4L -> "yet another unrelated document mentioning parquet footers and column pruning")
    val req = WithinRequirement.fromDataFrame(df, "corpus")
    req.addMaxNearDupFractionConstraint("text", maxFraction = 0.6, jaccardThreshold = 0.6)
    req.addMaxNearDupFractionConstraint("text", maxFraction = 0.4, jaccardThreshold = 0.6)
    val results = req.test(spark)
    assert(results.head.outcome, results.head.message) // 2 of 4 docs = 0.5 <= 0.6
    assert(!results(1).outcome)                        // 0.5 > 0.4
    assert(results(1).failureMessage.exists(_.contains("near-duplicate")))
    // an empty corpus has zero near-dup fraction, not a crash
    val empty = WithinRequirement.fromDataFrame(docs(), "empty")
    empty.addMaxNearDupFractionConstraint("text", maxFraction = 0.0)
    assert(empty.test(spark).head.outcome)
  }

  test("MaxDupSpanFraction: token-level duplication budget as a declarable constraint") {
    import graft.requirements.WithinRequirement
    val passage = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa"
    val df = docs(
      1L -> passage, // 16 tokens, all first-occurrence
      2L -> passage, // exact copy: all 16 tokens in duplicated spans
      3L -> "quebec romeo sierra tango uniform victor whiskey xray yankee zulu")
    // totals: 16 dup / 42 tokens ≈ 0.381
    val req = WithinRequirement.fromDataFrame(df, "corpus")
    req.addMaxDupSpanFractionConstraint("text", maxFraction = 0.5)
    req.addMaxDupSpanFractionConstraint("text", maxFraction = 0.25)
    val results = req.test(spark)
    assert(results.head.outcome, results.head.message)
    assert(!results(1).outcome)
    assert(results(1).failureMessage.exists(_.contains("duplicated")))
    // an empty corpus has zero duplication, not a crash
    val empty = WithinRequirement.fromDataFrame(docs(), "empty")
    empty.addMaxDupSpanFractionConstraint("text", maxFraction = 0.0)
    assert(empty.test(spark).head.outcome)
  }

  test("MinGopherKeepFraction: quality budget as a declarable constraint") {
    import graft.requirements.WithinRequirement
    val good =
      Seq.fill(10)("the quick brown foxes and jumps of to in a is lazy dogs")
        .mkString(" ")
    val df = docs(1L -> good, 2L -> good, 3L -> good, 4L -> "way too short")
    val req = WithinRequirement.fromDataFrame(df, "corpus")
    req.addMinGopherKeepFractionConstraint("text", minFraction = 0.75, minWords = 50)
    req.addMinGopherKeepFractionConstraint("text", minFraction = 0.76, minWords = 50)
    val results = req.test(spark)
    assert(results.head.outcome, results.head.message) // 3 of 4 pass
    assert(!results(1).outcome)
    assert(results(1).failureMessage.exists(_.contains("Gopher")))
    val empty = WithinRequirement.fromDataFrame(docs(), "empty")
    empty.addMinGopherKeepFractionConstraint("text", minFraction = 1.0)
    assert(empty.test(spark).head.outcome)
  }

  test("MaxEncodingArtifactFraction: encoding budget as a declarable constraint") {
    import graft.requirements.WithinRequirement
    def corrupt(s: String): String = new String(s.getBytes("UTF-8"), "ISO-8859-1")
    val df = docs(
      1L -> "perfectly clean ascii",
      2L -> "also clean",
      3L -> "still clean",
      4L -> corrupt("café déjà vu"))
    val req = WithinRequirement.fromDataFrame(df, "corpus")
    req.addMaxEncodingArtifactFractionConstraint("text", maxFraction = 0.25)
    req.addMaxEncodingArtifactFractionConstraint("text", maxFraction = 0.2)
    val results = req.test(spark)
    assert(results.head.outcome, results.head.message) // exactly 1 of 4 dirty
    assert(!results(1).outcome)
    assert(results(1).failureMessage.exists(_.contains("encoding artifacts")))
    val empty = WithinRequirement.fromDataFrame(docs(), "empty")
    empty.addMaxEncodingArtifactFractionConstraint("text", maxFraction = 0.0)
    assert(empty.test(spark).head.outcome)
  }

  test("MaxBoilerplateFraction: boilerplate budget as a declarable constraint") {
    import graft.requirements.WithinRequirement
    val df = docs(
      1L -> "nav\nalpha\nbeta",
      2L -> "nav\ngamma",
      3L -> "nav\ndelta",
      4L -> "epsilon")
    // "nav" in 3/4 docs ≥ ceil(0.5·4)=2 → 3 of 8 units removed = 0.375
    val req = WithinRequirement.fromDataFrame(df, "corpus")
    req.addMaxBoilerplateFractionConstraint("text", maxFraction = 0.375)
    req.addMaxBoilerplateFractionConstraint("text", maxFraction = 0.3)
    val results = req.test(spark)
    assert(results.head.outcome, results.head.message)
    assert(!results(1).outcome)
    assert(results(1).failureMessage.exists(_.contains("boilerplate")))
    val empty = WithinRequirement.fromDataFrame(docs(), "empty")
    empty.addMaxBoilerplateFractionConstraint("text", maxFraction = 0.0)
    assert(empty.test(spark).head.outcome)
  }

  test("MaxCrossSemanticDupFraction: semantic contamination across corpora") {
    import graft.requirements.BetweenRequirement
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    def vecs(rows: Seq[Seq[Float]]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row(_)), 2),
      StructType(Seq(StructField("vec", ArrayType(FloatType)))))
    val train = vecs(Seq(
      Seq(1.0f, 0.0f),   // contaminated: eval holds a near-identical vector
      Seq(0.0f, 1.0f),
      Seq(-1.0f, 0.0f),
      Seq(0.7f, -0.7f)))
    val eval_ = vecs(Seq(Seq(0.999f, 0.01f), Seq(0.1f, -0.9f)))
    // 1 of 4 train vectors has a >= 0.99-cosine eval neighbor → 0.25
    val ok = BetweenRequirement.fromDataFrames(train, eval_, "train", "eval")
    ok.addMaxCrossSemanticDupFractionConstraint("vec", "vec",
      maxFraction = 0.25, cosineThreshold = 0.99)
    assert(ok.test(spark).head.outcome, ok.test(spark).head.message)
    val bad = BetweenRequirement.fromDataFrames(train, eval_, "train", "eval")
    bad.addMaxCrossSemanticDupFractionConstraint("vec", "vec",
      maxFraction = 0.1, cosineThreshold = 0.99)
    val res = bad.test(spark).head
    assert(!res.outcome)
    assert(res.failureMessage.exists(_.contains("semantic near-duplicate")))
    // empty train side: zero contamination, not a crash
    val empty = BetweenRequirement.fromDataFrames(
      vecs(Nil), eval_, "train", "eval")
    empty.addMaxCrossSemanticDupFractionConstraint("vec", "vec", 0.0)
    assert(empty.test(spark).head.outcome)
  }

  test("MaxSemanticDupFraction: embedding-space duplication budget constraint") {
    import graft.requirements.WithinRequirement
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(Seq(1.0f, 0.01f)),  // near-dup pair ...
        Row(Seq(0.99f, 0.0f)),  // ... with the row above
        Row(Seq(0.0f, 1.0f)),
        Row(Seq(-1.0f, 0.3f))), 2),
      StructType(Seq(StructField("vec", ArrayType(FloatType)))))
    // 2 of 4 vectors participate → 0.5
    val req = WithinRequirement.fromDataFrame(df, "vectors")
    req.addMaxSemanticDupFractionConstraint("vec", maxFraction = 0.5,
      cosineThreshold = 0.99, nClusters = 2, lloydIters = 1)
    req.addMaxSemanticDupFractionConstraint("vec", maxFraction = 0.25,
      cosineThreshold = 0.99, nClusters = 2, lloydIters = 1)
    val results = req.test(spark)
    assert(results.head.outcome, results.head.message)
    assert(!results(1).outcome)
    assert(results(1).failureMessage.exists(_.contains("semantic")))

    // auto sizing (nClusters = 0, probes = 0): cells/probes derived from
    // the corpus — the near-dup pair must still be found (fraction 0.5)
    val auto = WithinRequirement.fromDataFrame(df, "vectors_auto")
    auto.addMaxSemanticDupFractionConstraint(
      "vec", maxFraction = 0.5, cosineThreshold = 0.99)
    auto.addMaxSemanticDupFractionConstraint(
      "vec", maxFraction = 0.25, cosineThreshold = 0.99)
    val autoResults = auto.test(spark)
    assert(autoResults.head.outcome, autoResults.head.message)
    assert(!autoResults(1).outcome)
  }

  test("crossNearDups: pairs cross the tables only; contamination budget constraint") {
    import graft.requirements.BetweenRequirement
    val longA = "the quick brown fox jumps over the lazy dog near the warm " +
      "windowsill every single morning without fail"
    val longB = "an entirely different benchmark passage about distributed " +
      "query planning and adaptive shuffle partitioning at petabyte scale"
    // train: one doc near-identical to an eval doc, one clean, plus a pair
    // of near-identical TRAIN docs (must NOT appear: within-table pair)
    val train = docs(
      1L -> longA.replace("morning", "evening"),
      2L -> "clean text about parquet footers and column pruning strategies",
      3L -> longB.replace("petabyte", "exabyte"),
      4L -> longB.replace("petabyte", "zettabyte"))
    val eval_ = docs(10L -> longA, 11L -> "totally unrelated evaluation prompt")
    val pairs = graft.ops.Dedup
      .crossNearDups(train, eval_, "text", "doc_id", threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 10L)),
      s"only the planted cross pair may surface (no within-table pairs): $pairs")

    val req = BetweenRequirement.fromDataFrames(train, eval_, "train", "eval")
    req.addMaxCrossNearDupFractionConstraint("text", "text",
      maxFraction = 0.25, jaccardThreshold = 0.6)
    req.addMaxCrossNearDupFractionConstraint("text", "text",
      maxFraction = 0.1, jaccardThreshold = 0.6)
    val results = req.test(spark)
    assert(results.head.outcome, results.head.message) // 1 of 4 docs = 0.25
    assert(!results(1).outcome)
    assert(results(1).failureMessage.exists(_.contains("near-duplicate")))
  }

  test("weightedMix: deterministic hash-rate membership, monotone in the rate") {
    val a = spark.range(0, 400).select(col("id").as("doc_id"))
    val b = spark.range(400, 800).select(col("id").as("doc_id"))
    def mix(ra: Double, rb: Double): Map[String, Set[Long]] =
      Corpus.weightedMix(Seq(("a", a, ra), ("b", b, rb)), "doc_id")
        .collect().map(r => (r.getString(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val m1 = mix(0.5, 0.25)
    assert(mix(0.5, 0.25) == m1) // pure row function
    // roughly proportional at n=400
    assert(m1("a").size > 140 && m1("a").size < 260, m1("a").size)
    assert(m1("b").size > 50 && m1("b").size < 150, m1("b").size)
    // higher rate ⇒ superset (same hash, larger boundary)
    val m2 = mix(0.9, 1.0)
    assert(m1("a").subsetOf(m2("a")))
    assert(m2("b") == (400L until 800L).toSet) // rate 1 keeps the whole source
    // membership matches a reference MD5 computation
    assert(m1("a").contains(7L) ==
      (md5Hex("7:graft:a") < Corpus.rateBoundHex(0.5)))
  }

  test("stupidBackoffScore: matches an in-memory backoff reference, OOV counted") {
    val train = docs(
      1L -> "the cat sat on the mat",
      2L -> "the cat ate the fish",
      3L -> "a dog sat on a log")
    val scoreDocs = docs(
      10L -> "the cat sat on the mat", // trigram hits throughout
      11L -> "the dog ate a fish",     // mixed backoff levels
      12L -> "zebra quux zebra",       // all OOV
      13L -> null,                     // no tokens → absent
      14L -> "  ,,  ")                 // normalizes to empty → absent
    val alpha = 0.4

    // direct reference: same tokenization, counts as Maps
    def toks(s: String): Seq[String] =
      s.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ")
        .trim.split(" ").filter(_.nonEmpty).toSeq
    val tt = Seq("the cat sat on the mat", "the cat ate the fish",
      "a dog sat on a log").map(toks)
    val t = tt.map(_.size).sum.toDouble
    val v = tt.flatten.distinct.size
    def cnt[K](ks: Seq[K]): Map[K, Int] =
      ks.groupBy(identity).view.mapValues(_.size).toMap
    val c1 = cnt(tt.flatten)
    val c2 = cnt(tt.flatMap(ws => ws.sliding(2).filter(_.size == 2).map(x => (x(0), x(1))).toSeq))
    val c3 = cnt(tt.flatMap(ws => ws.sliding(3).filter(_.size == 3).map(x => (x(0), x(1), x(2))).toSeq))
    def refDoc(text: String): (Long, Long, Double) = {
      val ws = toks(text)
      val lps = ws.zipWithIndex.map { case (w, i0) =>
        val i = i0 + 1
        val b = if (i >= 2) Some(ws(i0 - 1)) else None
        val a = if (i >= 3) Some(ws(i0 - 2)) else None
        val start = if (a.isDefined) 3 else if (b.isDefined) 2 else 1
        val lp: Double =
          if (a.isDefined && c3.contains((a.get, b.get, w)))
            math.log(c3((a.get, b.get, w)).toDouble / c2((a.get, b.get)))
          else if (b.isDefined && c2.contains((b.get, w)))
            (start - 2) * math.log(alpha) +
              math.log(c2((b.get, w)).toDouble / c1(b.get))
          else if (c1.contains(w))
            (start - 1) * math.log(alpha) + math.log(c1(w) / t)
          else start * math.log(alpha) + math.log(1.0 / (t + v + 1))
        BigDecimal(lp).setScale(12, BigDecimal.RoundingMode.HALF_UP)
          .doubleValue
      }
      (ws.size.toLong, ws.count(w => !c1.contains(w)).toLong,
        -lps.sum / ws.size)
    }

    val got = Corpus.stupidBackoffScore(train, scoreDocs, "text", "doc_id")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          BigDecimal(r.getDecimal(3)).doubleValue)))
      .toMap
    assert(got.keySet == Set(10L, 11L, 12L))
    for ((id, text) <- Seq(10L -> "the cat sat on the mat",
        11L -> "the dog ate a fish", 12L -> "zebra quux zebra")) {
      val (n, oov, xent) = refDoc(text)
      assert(got(id)._1 == n, s"doc $id n_tokens")
      assert(got(id)._2 == oov, s"doc $id n_oov")
      assert(math.abs(got(id)._3 - xent) < 1e-9,
        s"doc $id xent ${got(id)._3} vs $xent")
    }
    // a trained token scores strictly better than the OOV floor
    assert(got(10L)._3 < got(12L)._3)
  }

  test("corpusDiversity: hand-computed entropy and distinct-ngram ratio") {
    // corpus: "a b a b" + "a b c" → tokens a:3 b:3 c:1 (N=7);
    // trigrams: "a b a","b a b" + "a b c" → 3 total, 3 distinct
    val df = docs(1L -> "a b a b", 2L -> "a b c")
    val r = Corpus.corpusDiversity(df, "text", n = 3).head()
    assert(r.getLong(0) === 7L && r.getLong(1) === 3L)
    val expEnt = -(3.0 / 7) * math.log(3.0 / 7) * 2 +
      -(1.0 / 7) * math.log(1.0 / 7)
    assert(math.abs(r.getDouble(2) - expEnt) < 1e-12)
    assert(r.getLong(3) === 3L && r.getLong(4) === 3L)
    assert(r.getDouble(5) === 1.0)
    // a template-spam corpus collapses the ratio
    val spam = docs((1L to 20L).map(i => i -> "the same exact phrase"): _*)
    val rs = Corpus.corpusDiversity(spam, "text", n = 3).head()
    assert(rs.getLong(4) === 2L && rs.getDouble(5) === 2.0 / 40.0)
    // constraint: diverse passes, spam fails
    import graft.requirements.WithinRequirement
    val ok = WithinRequirement.fromDataFrame(df, "t")
    ok.addMinDistinctNgramRatioConstraint("text", minRatio = 0.9)
    assert(ok.test(TestSpark.spark).head.outcome)
    val bad = WithinRequirement.fromDataFrame(spam, "t")
    bad.addMinDistinctNgramRatioConstraint("text", minRatio = 0.5)
    val res = bad.test(TestSpark.spark).head
    assert(!res.outcome)
    assert(res.failureMessage.exists(_.contains("diversity")))
  }

  test("blocklistHits: token-exact whole-word matching and the fraction budget") {
    import org.apache.spark.sql.functions.col
    val df = docs(
      1L -> "the spam word appears here",
      2L -> "clean text with no flagged tokens",
      3L -> "spamming is not spam-free but SPAM is caught normalized",
      4L -> "assess does not contain the three-letter word")
    val hits = df
      .select(col("doc_id"),
        graft.ops.TextAnalysis.blocklistHits(col("text"), Seq("spam", "ass"))
          .as("h"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // doc 3: "spamming" is NOT a hit; "spam-free" normalizes to
    // "spam free" → hit; "SPAM" lowercases → hit
    assert(hits === Map(1L -> 1, 2L -> 0, 3L -> 2, 4L -> 0))
    import graft.requirements.WithinRequirement
    val ok = WithinRequirement.fromDataFrame(df, "t")
    ok.addMaxBlocklistFractionConstraint("text", Seq("spam", "ass"), 0.5)
    assert(ok.test(TestSpark.spark).head.outcome)
    val bad = WithinRequirement.fromDataFrame(df, "t")
    bad.addMaxBlocklistFractionConstraint("text", Seq("spam", "ass"), 0.25)
    val res = bad.test(TestSpark.spark).head
    assert(!res.outcome)
    assert(res.failureMessage.exists(_.contains("blocklisted")))
  }

  test("sourceMixWeights: temperature flattens the head, α=1 is proportional") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = (Seq.fill(90)("big") ++ Seq.fill(10)("small")).toDF("source")
    def weights(alpha: Double) = Corpus.sourceMixWeights(df, "source", alpha)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(4)))
      .toMap
    val w1 = weights(1.0)
    assert(w1("big")._1 === 90L && w1("small")._1 === 10L)
    // α = 1: weight == share, boost == 1
    assert(math.abs(w1("big")._2 - 0.9) < 1e-12)
    assert(math.abs(w1("big")._3 - 1.0) < 1e-12)
    // α = 0.5: small gets upsampled (boost > 1), big down (< 1);
    // weights still sum to 1
    val w5 = weights(0.5)
    assert(w5("small")._3 > 1.0 && w5("big")._3 < 1.0)
    val total = w5.values.map(_._2).sum
    assert(math.abs(total - 1.0) < 1e-12)
    // hand value: w_small = sqrt(10)/(sqrt(90)+sqrt(10))
    val exp = math.sqrt(10.0) / (math.sqrt(90.0) + math.sqrt(10.0))
    assert(math.abs(w5("small")._2 - exp) < 1e-12)
    // NULL source is a real source
    val withNull = (Seq("a", null, null): Seq[String]).toDF("source")
    val wn = Corpus.sourceMixWeights(withNull, "source", 0.7)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wn("<null>") === 2L)
  }

  test("corpusDiversityByGroup: per-group signals match single-group runs") {
    import org.apache.spark.sql.functions.col
    // group A diverse, group B template spam
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "a b a b", "A"), Row(2L, "a b c", "A"),
        Row(3L, "the same exact phrase", "B"),
        Row(4L, "the same exact phrase", "B")), 2),
      StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType),
        StructField("src", StringType))))
    val got = Corpus.corpusDiversityByGroup(df, "text", "src", n = 3)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4),
          r.getLong(5), r.getDouble(6)))
      .toMap
    // each group equals the whole-corpus operator on its slice
    for (g <- Seq("A", "B")) {
      val solo = Corpus
        .corpusDiversity(df.where(col("src") === g), "text", n = 3).head()
      assert(got(g) === ((solo.getLong(0), solo.getLong(1), solo.getDouble(2),
        solo.getLong(3), solo.getLong(4), solo.getDouble(5))), s"group $g")
    }
    assert(got("A")._6 === 1.0)
    assert(got("B")._6 === 0.5)
    graft.core.Blocks.releaseAll()
  }

  test("zipfSlope: exact -1 on a perfect Zipf vocabulary; topK caps terms") {
    // counts 6, 3, 2 = 6/rank exactly → ln(freq) = ln 6 − ln(rank),
    // a perfect OLS fit with slope −1
    val df = docs(1L -> "a a a a a a b b b c c")
    val r = Corpus.zipfSlope(df, "text").head()
    assert(r.getLong(0) === 3L)
    assert(math.abs(r.getDouble(1) + 1.0) < 1e-9)
    // topK bounds the regression support
    val capped = Corpus.zipfSlope(df, "text", topK = 2).head()
    assert(capped.getLong(0) === 2L)
    // single-term vocabulary → NULL slope
    val one = Corpus.zipfSlope(docs(1L -> "x x x"), "text").head()
    assert(one.getLong(0) === 1L && one.isNullAt(1))
  }

  test("epochShuffle: reproducible permutation, epoch-distinct, md5-derived order") {
    import spark.implicits._
    val ids = (1L to 40L).toDF("doc_id")
    val r1 = Corpus.epochShuffle(ids, "doc_id", "run7", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a permutation of 1..n
    assert(r1.values.toSeq.sorted === (1L to 40L))
    // identical across partitionings and reruns (the whole point)
    val r2 = Corpus.epochShuffle(ids.repartition(7), "doc_id", "run7", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 === r2)
    // a different epoch is a different permutation
    val r3 = Corpus.epochShuffle(ids, "doc_id", "run7", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r3 !== r1)
    assert(r3.values.toSeq.sorted === (1L to 40L))
    // order matches the driver-side md5-lattice reference exactly
    val expected = (1L to 40L)
      .sortBy { id =>
        val h = md5Hex(s"$id:run7:2").take(13)
        (java.lang.Long.parseLong(h, 16), id)
      }
      .zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    assert(r1 === expected)
    // NULL ids are excluded
    val withNull = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(1L), Row(null), Row(2L)), 2),
      StructType(Seq(StructField("doc_id", LongType))))
    assert(Corpus.epochShuffle(withNull, "doc_id", "s", 1).count() === 2L)
  }

  test("splitLeakage: non-train members of train-touching clusters only") {
    import spark.implicits._
    // cluster 10: train + val + test (both non-train rows leak)
    // cluster 20: val + test only (no train — clean, nothing reported)
    // cluster 30: train only (nothing to leak)
    val clusters = Seq(
      (1L, 10L), (2L, 10L), (3L, 10L),
      (4L, 20L), (5L, 20L),
      (6L, 30L)).toDF("doc_id", "cluster_id")
    val splits = Seq(
      (1L, "train"), (2L, "val"), (3L, "test"),
      (4L, "val"), (5L, "test"),
      (6L, "train")).toDF("doc_id", "split")
    val out = Corpus
      .splitLeakage(clusters, "doc_id", "cluster_id", splits, "split")
      .collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getString(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(out === Set(
      (10L, 2L, "val", 1L, 3L),
      (10L, 3L, "test", 1L, 3L)))
  }

  test("split-leakage, novelty, and Wilson floor constraints") {
    import spark.implicits._
    import graft.requirements.WithinRequirement
    // docs 1/2 near-identical across train/val -> doc 2 leaks; doc 3 clean
    val body = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq(
      (1L, body + " one", "train"),
      (2L, body + " two", "val"),
      (3L, "completely different content about distributed query engines", "val"))
      .toDF("doc_id", "text", "split")
    val ok = WithinRequirement.fromDataFrame(df, "t")
    ok.addMaxSplitLeakageFractionConstraint("text", "doc_id", "split", maxFraction = 0.6)
    assert(ok.test(TestSpark.spark).head.outcome)
    val bad = WithinRequirement.fromDataFrame(df, "t")
    bad.addMaxSplitLeakageFractionConstraint("text", "doc_id", "split", maxFraction = 0.4)
    val res = bad.test(TestSpark.spark).head
    assert(!res.outcome && res.failureMessage.exists(_.contains("leakage")))

    // novelty: docs 1/2 share most windows -> low novelty; constraint
    // passes at a floor below the factual mean, fails above it
    val nOk = WithinRequirement.fromDataFrame(df, "t")
    nOk.addMinMeanNoveltyConstraint("text", "doc_id", minMean = 0.1, windowTokens = 4)
    assert(nOk.test(TestSpark.spark).head.outcome)
    val nBad = WithinRequirement.fromDataFrame(df, "t")
    nBad.addMinMeanNoveltyConstraint("text", "doc_id", minMean = 0.99, windowTokens = 4)
    assert(!nBad.test(TestSpark.spark).head.outcome)

    // Wilson floor: k=2, n=3 -> ci_lo ~ 0.2077
    val wdf = Seq(("a", true), ("a", true), ("a", false)).toDF("g", "keep")
    val wOk = WithinRequirement.fromDataFrame(wdf, "t")
    wOk.addMinProportionLowerBoundConstraint("keep", 0.2, Seq("g"))
    assert(wOk.test(TestSpark.spark).head.outcome)
    val wBad = WithinRequirement.fromDataFrame(wdf, "t")
    wBad.addMinProportionLowerBoundConstraint("keep", 0.3, Seq("g"))
    val wres = wBad.test(TestSpark.spark).head
    assert(!wres.outcome && wres.failureMessage.exists(_.contains("Wilson")))
  }

  test("capPerGroup: exact vs single-window reference, ties deterministic") {
    import spark.implicits._
    import graft.ops.Corpus
    // 3 groups, one hot (60 rows incl. score ties), caps below/at/above size
    val rows = (1 to 60).map(i => (i.toLong, "hot", (i % 7).toLong)) ++
      Seq((100L, "small", 5L), (101L, "small", 5L), (102L, "tiny", 1L))
    val df = rows.toDF("id", "grp", "score")
    for (cap <- Seq(1, 5, 80); salts <- Seq(1, 4)) {
      val got = Corpus.capPerGroup(df, "grp", "score", "id", cap, nSalts = salts)
        .select("id", "grp", "score", "keep_rank").as[(Long, String, Long, Long)]
        .collect().toSet
      val want = df
        .withColumn("keep_rank",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("grp"))
            .orderBy(col("score").desc, col("id").asc)).cast("bigint"))
        .where(col("keep_rank") <= cap)
        .as[(Long, String, Long, Long)].collect().toSet
      assert(got === want, s"cap=$cap salts=$salts")
      assert(got.groupBy(_._2).forall(_._2.size <= cap))
    }
    // deterministic across reruns (ties broken by id, not arrival order)
    val a = Corpus.capPerGroup(df.repartition(7), "grp", "score", "id", 3)
      .select("id").as[Long].collect().sorted
    val b = Corpus.capPerGroup(df.repartition(3), "grp", "score", "id", 3)
      .select("id").as[Long].collect().sorted
    assert(a.toSeq === b.toSeq)
  }

  test("ngramNovelty: shared windows are not novel; short docs get NULL") {
    import spark.implicits._
    val shared = "alpha beta gamma delta" // one 4-token window, in both docs
    val df = Seq(
      (1L, s"$shared unique one two three"),
      (2L, s"$shared other words here now"),
      (3L, "tiny")).toDF("doc_id", "text")
    val r = graft.ops.Dedup.ngramNovelty(df, "text", "doc_id", windowTokens = 4)
      .collect().map(x => x.getLong(0) -> x).toMap
    // doc 1: 5 windows (8 tokens, w=4), only the first is shared
    assert(r(1L).getLong(1) === 5L)
    assert(r(1L).getLong(2) === 4L)
    assert(r(1L).getDouble(3) === 0.8)
    assert(r(2L).getLong(2) === 4L)
    // doc 3 is shorter than one window: no fingerprints, NULL novelty
    assert(r(3L).getLong(1) === 0L)
    assert(r(3L).isNullAt(3))
  }
}
