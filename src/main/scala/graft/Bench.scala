package graft
import org.apache.spark.sql.SparkSession

object Bench {

  private def jsonEscape(s: String): String =
    // every JSON-breaking character: backslash, quote, and ALL control
    // chars (not just \n\r\t — a stray \b or a raw NUL in an exception message
    // must not invalidate the bench line)
    s.replaceAll("[\\\\\"\\p{Cntrl}]", " ").take(200)

  /** One timed execution: build, count, clear operator-internal caches (a
    * failing query must surface as an `err`, never masquerade as a fast
    * success; caches must not skew or memory-starve the queries after it).
    */
  private def runOnce(
      spark: SparkSession,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
      dir: String): (Double, Option[String]) = {
    val t0 = System.nanoTime()
    val err =
      try { fn(spark, dir).count(); None }
      catch { case e: Throwable => Some(jsonEscape(String.valueOf(e))) }
    val t = (System.nanoTime() - t0) / 1e9
    spark.catalog.clearCache()
    // drop every checkpoint the query's pipelines materialized: block-
    // manager storage must not accumulate across a 66-query session (the
    // round-4 bench showed later queries — q_percentile, q_min_max —
    // degrading monotonically as dead blocks from earlier dedup/ANN
    // queries starved execution memory)
    graft.core.Blocks.releaseAll()
    (t, err)
  }

  private val SlowCutoffSec = 5.0

  /** Per-query timing discipline: one JVM warm-up run, then median-of-3 —
    * sub-second queries at sf0.1 are otherwise indistinguishable from
    * JIT/GC noise (round-2 showed 8× swings on unchanged code). Queries
    * whose warm-up already ran ≥ 5 s get a single post-JIT run instead:
    * they sit far above the noise floor and repetition would triple the
    * driver's bench budget for no signal.
    */
  /** (gate time, all raw run times incl. warm-up, first error). The gate
    * time stays min/median (suppresses GC-noise false regressions) but the
    * raw times are reported alongside so a PERSISTENT second-run slowdown —
    * e.g. genuine memory pressure — remains visible in the artifact rather
    * than being optimized away.
    */
  private def timeQuery(
      spark: SparkSession,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
      dir: String): (Double, Seq[Double], Option[String]) = {
    val (tWarm, errWarm) = runOnce(spark, fn, dir)
    if (errWarm.isDefined) (tWarm, Seq(tWarm), errWarm)
    else if (tWarm >= SlowCutoffSec) {
      // min of the two full runs: slow queries get no median, and a single
      // GC pause late in the JVM otherwise masquerades as a 6x regression
      // (observed: q_numeric_gaps 1.6 s in three runs, 12.9 s in one)
      val (t2, err2) = runOnce(spark, fn, dir)
      (math.min(tWarm, t2), Seq(tWarm, t2), err2)
    } else {
      val runs = Seq.fill(3)(runOnce(spark, fn, dir))
      (runs.map(_._1).sorted.apply(1), tWarm +: runs.map(_._1), runs.flatMap(_._2).headOption)
    }
  }

  /** Scale-critical subset for the secondary (10×) leg: the queries whose
    * plans shuffle, bucket-join, or prefix-sum — where a superlinear
    * constant would hide at 600k rows. Timed with the same warm-up +
    * median-of-3 discipline as the primary leg — single runs at sf1 showed
    * the same 2-3× machine-load swings that motivated medians at sf0.1.
    */
  private val Sf1Subset = Seq(
    "q_percentile", "q_ks_2sample", "q_cross_cdf", "q_minhash_dedup",
    "q_ngram_jaccard", "q_dedup_exact", "q_embedding_lsh", "q_embedding_topk",
    "q_groupby_range", "q_duplicates", "q_unique_count_union",
    "q_numeric_gaps", "q_simhash_md5", "q_text_stats", "q_date_gaps",
    "q_functional_dependency",
    // corpus-prep family: n-gram explode shuffles, the salted stratified
    // top-k, and the bucketed packing window are exactly the plans whose
    // constants hide at sf0.1
    "q_repetition", "q_decontaminate", "q_stratified_sample",
    "q_pack_sequences",
    // rounds scale with component diameter, not corpus size — prove it
    "q_dedup_clusters",
    // (q_dedup_clusters also anchors the 100× spot leg below)
    // banded capped buckets replaced the full-key self-join — prove the
    // candidate volume no longer tracks n²
    "q_embedding_neardup",
    // paragraph explode + fingerprint shuffle + reassembly shuffle
    "q_paragraph_dedup",
    // cross-table bucket join + candidate-sized verification
    "q_cross_neardup",
    // window-fingerprint explode + skew-safe first-occurrence agg + per-doc
    // sweep — the token-level dedup whose explode volume scales with corpus
    // token count
    "q_span_dedup",
    // the rewrite flavor: adds the token-stream explode + reassembly
    "q_span_removal",
    // broadcast centroid argmax + capped within-cluster pairs
    "q_semantic_neardup")

  /** 100× spot-check subset: the heaviest shuffle/bucket-join/prefix-sum
    * pipelines only — enough to expose a superlinear constant that even the
    * 10× leg hides, cheap enough to run as an optional tail leg.
    */
  private val Sf10Subset = Seq(
    "q_minhash_dedup", "q_dedup_clusters", "q_percentile", "q_span_dedup",
    "q_embedding_neardup", "q_ngram_jaccard")

  private def queriesJson(
      results: Iterable[(String, Double, Seq[Double], Option[String])])
      : (String, String, String) = {
    val qs = results.map { case (k, v, _, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val raw = results.map { case (k, _, rs, _) =>
      s"\"" + k + "\":" + rs.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, Some(e)) => s"\"" + k + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    (qs, raw, errs)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // AQE starts shuffles WIDE and coalesces down to the target size:
      // at sf0.1 this lands back at ~cpus partitions (identical plans),
      // while the 10×/100× legs keep per-reducer state spill-free instead
      // of funneling 100× data through `cpus` reducers (the sf10 leg
      // measured minhash/ngram going superlinear exactly this way)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "512")
      // ContextCleaner only reclaims shuffle files/broadcasts when their
      // driver-side handles get GC'd; a 16 GiB driver heap can go the whole
      // ~300-execution bench session without a full GC, so dead shuffle
      // state accumulates and the TAIL of the session slows (r5 artifact:
      // q_date_gaps sf1 raws 3.2→21.5 s, flat in a fresh session). Spark's
      // own remedy, tightened from its 30 min default to within-session —
      // but not lower: at 1min the forced GCs land mid-query and taxed the
      // checkpoint-loop queries 3× (CC fresh-session A/B 23.7 s vs 7.8 s)
      .config("spark.cleaner.periodicGC.interval", "5min")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = SparkEntry.queries.map { case (name, fn) =>
      val (t, raw, err) = timeQuery(spark, fn, sfDir)
      (name, t, raw, err)
    }
    val (qs, raw, errs) = queriesJson(results)
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0

    // scale legs (repo-local ScaleData output, or explicit dirs), skipped
    // when the directory is absent: sf1 = 10× on the scale-critical
    // subset; sf10 = 100× spot-check on the heaviest pipelines —
    // median-timed like the primary, reported as sibling fields so the
    // primary contract (one JSON line, "queries" at sf) is unchanged
    def leg(dir: String, names: Seq[String], single: Boolean = false)
        : Option[Iterable[(String, Double, Seq[Double], Option[String])]] =
      if (!new java.io.File(dir).isDirectory) None
      else Some(
        SparkEntry.queries
          .filter { case (name, _) => names.contains(name) }
          .map { case (name, fn) =>
            // `single`: the 100× spot leg runs each query once — they sit
            // 1-2 orders of magnitude above the noise floor, and repeats
            // would multiply the leg into the whole bench budget
            if (single) {
              val (t, err) = runOnce(spark, fn, dir)
              (name, t, Seq(t), err)
            } else {
              val (t, raw1, err) = timeQuery(spark, fn, dir)
              (name, t, raw1, err)
            }
          })
    val sf1Dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/root/repo/benchdata/sf1")
    val sf1Results = leg(sf1Dir, Sf1Subset)
    val sf1 = sf1Results.map { sub =>
      val (q1, r1, e1) = queriesJson(sub)
      s""","sf1_dir":"${jsonEscape(sf1Dir)}","sf1_queries":$q1,"sf1_raw":$r1,"sf1_errors":$e1"""
    }.getOrElse("")
    val sf10Dir = sys.env.getOrElse("SPARK_GRAFT_SF10_DIR", "/root/repo/benchdata/sf10")
    val sf10Results = leg(sf10Dir, Sf10Subset, single = true)
    val sf10 = sf10Results.map { sub =>
      val (q10, r10, e10) = queriesJson(sub)
      s""","sf10_dir":"${jsonEscape(sf10Dir)}","sf10_queries":$q10,"sf10_raw":$r10,"sf10_errors":$e10"""
    }.getOrElse("")

    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"raw":$raw,"errors":$errs$sf1$sf10,"sf":"$sfDir"}"""
    // stdout competes with sbt/log4j noise, and the consumer keeps only a
    // bounded TAIL of it — the full line (raw per-run arrays) overflowed
    // that window two rounds running ("parsed": null), decapitating the
    // JSON. So the FILE gets the full artifact, and stdout gets one
    // deliberately COMPACT line (3-decimal times, no raw arrays) printed
    // LAST so it always lands intact inside the tail window.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outPath),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch {
      case e: Exception => System.err.println(s"bench: could not write $outPath: $e")
    }
    def compactTimes(rs: Iterable[(String, Double, Seq[Double], Option[String])]) =
      rs.map { case (k, v, _, _) => s"\"" + k + "\":" + (math.round(v * 1000) / 1000.0) }
        .mkString("{", ",", "}")
    val sf1C =
      sf1Results.map(s => s""","sf1_queries":${compactTimes(s)}""").getOrElse("")
    val sf10C =
      sf10Results.map(s => s""","sf10_queries":${compactTimes(s)}""").getOrElse("")
    val compact =
      s"""{"metric":"total","value":${math.round(total * 1000) / 1000.0},"unit":"sec","queries":${compactTimes(results)},"errors":$errs$sf1C$sf10C,"sf":"$sfDir","full":"$outPath"}"""
    println(compact)
    spark.stop()
  }
}
