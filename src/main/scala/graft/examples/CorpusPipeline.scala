package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Classifier, Corpus, Dedup, Dsir, Pipeline, TextAnalysis}

/** End-to-end training-data curation example over the driver's `documents`
  * table — the full pipeline a pretraining-data team runs, composed from
  * this engine's operators, each stage a declarative plan:
  *
  *   1. gate on language + quality + repetition signals
  *   2. exact dedup, then near-dup clustering (MinHash LSH pairs →
  *      connected components, keep the min-id doc per cluster), then
  *      exact-substring span removal (excise cloned 8-token runs that
  *      survive document-level dedup)
  *   3. decontaminate against an eval set (word-n-gram overlap)
  *   3b. model-based selection: a hashed linear quality classifier
  *      (trained in-pipeline on the Gopher verdict as a weak label)
  *      defines the target slice, and DSIR importance-resamples the
  *      corpus toward its n-gram distribution
  *   4. PII redaction
  *   5. deterministic train/val/test split, weighted mixing, GPT-style
  *      sequence packing for the train split, and weight-balanced
  *      serpentine output sharding
  *
  * Run: `sbt "runMain graft.examples.CorpusPipeline [sfDir]"`
  */
object CorpusPipeline {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n0 = docs.count()

    // 1. quality gates: language, composite quality score, Gopher rules,
    // repetition — each gate a codegen'd projection joined on doc_id
    val gated = Pipeline
      .curateCorpus(docs, "text", "doc_id", minQuality = 0.5)
      .join(
        TextAnalysis.gopherRules(docs, "text", minWords = 10)
          .where(col("gopher_keep")).select("doc_id"),
        "doc_id")
      .join(
        Corpus.repetitionSignals(docs, "text", "doc_id")
          .where(col("top2_frac") < 0.2 && col("dup5_frac") < 0.2)
          .select("doc_id"),
        "doc_id")
    val n1 = gated.count()

    // 2. near-dup clustering: LSH pairs -> connected components -> keep the
    // cluster representative (min doc_id)
    val pairs = Dedup.minhashNearDups(gated, "text", "doc_id", threshold = 0.8)
    val clusters = Dedup.connectedComponents(pairs)
    val deduped = gated.join(
      clusters.where(col("id") =!= col("cluster_id"))
        .select(col("id").as("doc_id")),
      Seq("doc_id"), "left_anti")
    val n2 = deduped.count()

    // 2b. substring-level trim: document-level dedup keeps one copy per
    // near-dup CLUSTER, but cloned passages inside otherwise-unique docs
    // survive it — excise them (docs that were nothing but clones drop)
    val trimmed = deduped.drop("text")
      .join(Dedup.removeDuplicatedSpans(deduped, "text", "doc_id"), "doc_id")
    val n2b = trimmed.count()

    // 3. eval-set decontamination (here: a held-out slice stands in for the
    // benchmark suite)
    val evalSet = docs.where(col("doc_id") % 97 === 0)
    val contaminated = Corpus
      .decontaminate(trimmed, evalSet, "text", "doc_id", n = 8)
      .select(col("doc_id"))
    val clean = trimmed.join(contaminated, Seq("doc_id"), "left_anti")
    val n3 = clean.count()

    // 3b. model-based selection: a quality classifier trained on the
    // Gopher verdict as a weak label scores every remaining doc, and DSIR
    // importance-resamples the survivors toward the high-scoring slice's
    // n-gram distribution (keep 3/4 — selection, not a hard gate)
    val labeled = clean.join(
      TextAnalysis.gopherRules(docs, "text", minWords = 10)
        .select(col("doc_id"), col("gopher_keep").cast("int").as("ql")),
      "doc_id")
    val model = Classifier.train(
      labeled, "text", "doc_id", "ql", nBuckets = 2048, nIters = 5)
    val scored = Classifier.score(model, clean, "text", "doc_id")
    val target = clean.join(
      scored.where(col("score") >= 0.5).select("doc_id"), "doc_id")
    val kTake = math.max(1, (n3 * 3 / 4).toInt)
    val selected = clean.join(
      Dsir.resample(clean, target, "text", "doc_id", k = kTake,
        nBuckets = 2048).select("doc_id"),
      "doc_id")
    val n4 = selected.count()

    // 4. PII redaction + 5. split / mix / pack / balanced shards
    val redacted = selected.withColumn("text", TextAnalysis.redactPii(col("text")))
    val split = Corpus.assignSplits(
      redacted, "doc_id", Seq(("train", 0.98), ("val", 0.01), ("test", 0.01)))
    val packed = Corpus.packSequences(
      split.where(col("split") === "train")
        .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")).cast("long")),
      "doc_id", "n_tokens", capacity = 2048)
    val nPacks = packed.agg(countDistinct(col("pack_bucket"), col("pack_id"))).head().getLong(0)
    // balanced output sharding: near-equal token mass per output file
    val shardTotals = Corpus
      .assignShardsBalanced(
        packed.select(col("doc_id"), col("n_tokens")), "doc_id", "n_tokens",
        nShards = 8)
      .groupBy("shard").agg(sum("n_tokens").as("tok"))
      .collect().map(_.getLong(1))
    val shardSpread =
      if (shardTotals.isEmpty || shardTotals.min == 0L) 0.0
      else shardTotals.max.toDouble / shardTotals.min

    // 6. sign-off health report — the numbers a team reads before
    // training on the output: lexical diversity + Zipf slope (mode
    // collapse), the classifier's AUC against its weak label (did the
    // model actually rank quality), and a deterministic epoch order
    // (same permutation on every rerun)
    val div = Corpus.corpusDiversity(redacted, "text", n = 3).head()
    val zipf = Corpus.zipfSlope(redacted, "text").head()
    // AUC on the FULL corpus (the post-gate slice is one-class by
    // construction — the gate already removed most negatives)
    val auc = graft.ops.Stats
      .aucExact(
        Classifier.score(model, docs, "text", "doc_id")
          .join(
            TextAnalysis.gopherRules(docs, "text", minWords = 10)
              .select(col("doc_id"), col("gopher_keep")),
            "doc_id"),
        "score", col("gopher_keep"), scale = 1000000L)
      .head()
    val epoch1 = Corpus.epochShuffle(redacted, "doc_id", "run0", epoch = 1)
    val maxRank = epoch1.agg(max(col("shuffle_rank"))).head().getLong(0)
    // source balance (no domain may dominate the kept mix) and an
    // evidence-honest error bar on the kept documents' length
    val conc = graft.ops.Stats
      .concentrationProfile(
        redacted.withColumn("dj_len", length(col("text")).cast("long")),
        "source", "dj_len")
      .head()
    val lenCi = graft.ops.Stats
      .bootstrapMeanCI(
        redacted.withColumn("dj_len", length(col("text")).cast("double")),
        "doc_id", "dj_len", nResamples = 100, seed = "signoff")
      .head()

    println(s"[corpus] raw=$n0 gated=$n1 deduped=$n2 span-trimmed=$n2b " +
      s"decontaminated=$n3 dsir-selected=$n4 train packs=$nPacks " +
      f"shard spread=$shardSpread%.3f")
    println(f"[health] distinct-trigram ratio=${div.getDouble(5)}%.3f " +
      f"token entropy=${div.getDouble(2)}%.2f nats " +
      f"zipf slope=${zipf.getDouble(1)}%.2f " +
      f"classifier AUC=${auc.getDouble(2)}%.3f " +
      s"epoch-1 permutation covers $maxRank/$n4 docs")
    println(f"[health] source gini=${conc.getDouble(2)}%.3f " +
      f"top-source share=${conc.getDouble(4)}%.3f " +
      f"mean doc chars=${lenCi.getDouble(2)}%.1f " +
      f"95%% CI [${lenCi.getDouble(3)}%.1f, ${lenCi.getDouble(4)}%.1f]")
    require(n3 > 0, "pipeline must keep documents")
    require(n4 > 0, "selection must keep documents")
    require(maxRank == n4, "epoch shuffle must be a full permutation")
    spark.stop()
  }
}
