package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Persisted, incremental MinHash-LSH dedup index — the operate-at-100 TB
  * contract the one-shot pipelines lack: every [[graft.ops.Dedup.crossNearDups]]
  * call re-fingerprints BOTH corpora from raw text, but a production
  * pipeline ingests shards incrementally against a corpus that was already
  * fingerprinted yesterday. [[build]] pays the corpus pass once and
  * persists the three frames every later shard needs; [[incrementalNearDups]]
  * then answers "which new-shard docs near-duplicate the corpus" touching
  * the corpus ONLY through the index — bit-identical to the batch
  * `crossNearDups(shard, corpus)` recompute (spec-pinned), with the corpus
  * shingling, banding, and bucket-size passes all amortized away.
  *
  * On-disk layout under `path` (a plain directory — portable, no metastore
  * dependency):
  *
  *   - `meta.json` — build parameters (shingleK/numHashes/bands), bucket
  *     count, id column name/type, format version;
  *   - `buckets/` — (idCol, band, bucket) parquet, CLUSTERED BY
  *     (band, bucket) INTO nBuckets — the LSH cells. Bucketed layout means
  *     the shard-vs-corpus candidate join plans WITHOUT an exchange on the
  *     corpus side: only the (small) shard's cells shuffle, the
  *     corpus-sized frame streams straight off disk pre-partitioned;
  *   - `sizes/` — (band, bucket, dj_bn) parquet, same bucket spec — the
  *     per-cell membership counts, precomputed so the hot-cell cap filter
  *     (`dj_bn <= maxBucketSize`) costs a co-bucketed join instead of a
  *     corpus-wide count aggregate per shard;
  *   - `payload/` — (idCol, shingle_hashes, signature) parquet, CLUSTERED
  *     BY (idCol) — the exact-verification payload (sorted distinct
  *     shingle hashes, 8 B per distinct shingle, parquet-compressed). This
  *     is what "no re-fingerprinting" costs: candidate verification reads
  *     only the candidate ids' rows (column-pruned, semi-join-reduced),
  *     never the corpus text.
  *
  * Each table name above is its GENERATION-0 directory; [[compact]],
  * [[rebuild]], and [[append]]'s sizes merge write `<table>_g<N+1>` and
  * flip the per-table pointer in `meta.json` with one atomic rename — a
  * reader holding an already-open plan keeps its file-set (retired
  * generations survive one further lifecycle step, or until [[vacuum]]),
  * and a crash mid-maintenance leaves the old generation fully readable.
  *
  * Tables register in the session catalog as EXTERNAL (location-pinned)
  * bucketed tables on [[open]] — re-registration is idempotent DDL, so the
  * index outlives the session that built it (the in-memory catalog does
  * not persist, the files and meta.json do).
  *
  * Reference behavior context: the reference caches retrieved results
  * per-engine run (`base.py:160-171`); at Spark scale the analogue worth
  * persisting is the INDEX, not the result — repeated validation runs and
  * rolling ingestion reuse signatures/buckets across sessions.
  */
object DedupIndex {

  /** Format version — bump on any layout/semantics change. (The
    * generation fields below are additive with a 0 default, so gen-0
    * indexes written before them remain readable at version 1.)
    */
  private val Version = 1

  /** `gen*`: per-table GENERATION numbers — which file-set the meta
    * pointer currently designates. Generation 0 lives at `<path>/<table>`
    * (the legacy layout); generation N > 0 at `<path>/<table>_gN`.
    * [[compact]]/[[rebuild]] write a NEW generation and flip the pointer
    * atomically instead of swapping directories in place, so a reader
    * holding an already-open plan on the old file-set survives a
    * concurrent compact (the old generation is deferred-deleted — kept
    * until the generation after next, or an explicit [[vacuum]]).
    */
  final case class Meta(
      shingleK: Int,
      numHashes: Int,
      bands: Int,
      nBuckets: Int,
      idCol: String,
      idType: String,
      version: Int = Version,
      genBuckets: Int = 0,
      genSizes: Int = 0,
      genPayload: Int = 0) {
    def gen(which: String): Int = which match {
      case "buckets" => genBuckets
      case "sizes" => genSizes
      case "payload" => genPayload
      case other => throw new IllegalArgumentException(s"unknown table: $other")
    }
  }

  private def metaPath(path: String) = s"$path/meta.json"

  /** The directory a table's generation lives in — gen 0 keeps the legacy
    * un-suffixed name, so pre-generation indexes open unchanged.
    */
  private[sources] def dataDir(path: String, which: String, gen: Int): java.io.File =
    new java.io.File(if (gen == 0) s"$path/$which" else s"$path/${which}_g$gen")

  /** All meta writes go through tmp-and-atomic-rename: a crash can leave a
    * stale tmp file, never a torn meta.json under the real name — that is
    * what makes the [[compact]]/[[rebuild]] generation-pointer flip atomic.
    */
  private[sources] def atomicWrite(target: java.nio.file.Path, text: String): Unit = {
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    java.nio.file.Files.write(
      tmp, text.getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
    try java.nio.file.Files.move(
      tmp, target,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
    catch {
      case _: java.nio.file.AtomicMoveNotSupportedException =>
        java.nio.file.Files.move(
          tmp, target, java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
    }
  }

  private def writeMeta(path: String, m: Meta): Unit = {
    val json =
      s"""{"shingle_k":${m.shingleK},"num_hashes":${m.numHashes},""" +
        s""""bands":${m.bands},"n_buckets":${m.nBuckets},""" +
        s""""id_col":"${m.idCol}","id_type":"${m.idType}",""" +
        s""""gen_buckets":${m.genBuckets},"gen_sizes":${m.genSizes},""" +
        s""""gen_payload":${m.genPayload},""" +
        s""""version":${m.version}}"""
    atomicWrite(java.nio.file.Paths.get(metaPath(path)), json + "\n")
  }

  /** Minimal flat-JSON field reader — the meta file is machine-written by
    * [[writeMeta]] (one flat object, no nesting/escapes), so a regex field
    * grab is exact here.
    */
  private def metaField(json: String, key: String): String = {
    val m = java.util.regex.Pattern
      .compile("\"" + key + "\":(\"([^\"]*)\"|[^,}]*)")
      .matcher(json)
    require(m.find(), s"dedup index meta is missing field '$key'")
    Option(m.group(2)).getOrElse(m.group(1))
  }

  /** Optional field with a default — for fields added after version-1
    * indexes were already on disk (the generation pointers).
    */
  private def metaFieldOr(json: String, key: String, default: String): String = {
    val m = java.util.regex.Pattern
      .compile("\"" + key + "\":(\"([^\"]*)\"|[^,}]*)")
      .matcher(json)
    if (m.find()) Option(m.group(2)).getOrElse(m.group(1)) else default
  }

  def readMeta(path: String): Meta = {
    val p = java.nio.file.Paths.get(metaPath(path))
    require(java.nio.file.Files.exists(p),
      s"no dedup index at $path (missing meta.json) — build(...) it first")
    val json = new String(
      java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
    val m = Meta(
      shingleK = metaField(json, "shingle_k").toInt,
      numHashes = metaField(json, "num_hashes").toInt,
      bands = metaField(json, "bands").toInt,
      nBuckets = metaField(json, "n_buckets").toInt,
      idCol = metaField(json, "id_col"),
      idType = metaField(json, "id_type"),
      version = metaField(json, "version").toInt,
      genBuckets = metaFieldOr(json, "gen_buckets", "0").toInt,
      genSizes = metaFieldOr(json, "gen_sizes", "0").toInt,
      genPayload = metaFieldOr(json, "gen_payload", "0").toInt)
    require(m.version == Version,
      s"dedup index at $path has format version ${m.version}; " +
        s"this build reads $Version — rebuild the index")
    m
  }

  /** Deterministic catalog name for an index table: the path keys it, so
    * re-opening the same index in any session lands on one name.
    */
  private def tableName(path: String, which: String): String = {
    val h = java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(
        new java.io.File(path).getAbsolutePath).toLong & 0xffffffffL)
    s"graft_dedup_idx_${which}_$h"
  }

  private def registerBucketed(
      spark: SparkSession,
      path: String,
      which: String,
      schemaDdl: String,
      clusterCols: Seq[String],
      nBuckets: Int,
      gen: Int): String = {
    val name = tableName(path, which)
    val loc = dataDir(path, which, gen).getAbsolutePath
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(
      s"""CREATE TABLE $name ($schemaDdl)
         |USING parquet
         |CLUSTERED BY (${clusterCols.mkString(", ")})
         |SORTED BY (${clusterCols.mkString(", ")})
         |INTO $nBuckets BUCKETS
         |LOCATION '$loc'""".stripMargin)
    name
  }

  private[sources] def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val k = f.listFiles(); if (k != null) k.foreach(rmTree)
    }
    f.delete(): Unit
  }

  /** Delete every generation of `which` under `path` whose number is not
    * in `keep` — the deferred-GC half of the generation scheme. Callers
    * keep the current generation plus (except [[vacuum]]) the immediately
    * previous one, so a reader that opened before the flip keeps its
    * file-set through one full compact cycle.
    */
  private[sources] def gcGenerations(
      path: String, which: String, keep: Set[Int]): Unit = {
    val kids = new java.io.File(path).listFiles()
    if (kids == null) return
    val re = ("^" + java.util.regex.Pattern.quote(which) + "_g(\\d+)$").r
    kids.foreach { f =>
      val genOpt = f.getName match {
        case re(g) => Some(g.toInt)
        case n if n == which => Some(0)
        case _ => None
      }
      genOpt.foreach(g => if (!keep.contains(g) && f.isDirectory) rmTree(f))
    }
  }

  /** Build the index for `df` under `path` (overwriting any previous
    * build): one shingling pass over the corpus text, one banding pass,
    * one cell-count aggregate — the exact passes `crossNearDups` runs on
    * its corpus side per call, paid once here. `nBuckets` is the storage
    * bucket count (the unit of read parallelism for every later join —
    * size it ~2-4× the executor-core count).
    */
  def build(
      df: DataFrame,
      textCol: String,
      idCol: String,
      path: String,
      shingleK: Int = 5,
      numHashes: Int = 64,
      bands: Int = 16,
      nBuckets: Int = 32): Meta = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    // meta.json is written by naive interpolation and the postings DDL
    // single-quotes the LOCATION path — quotes would corrupt both
    require(!idCol.contains("\"") && !textCol.contains("\""),
      s"column names must not contain double quotes: '$idCol', '$textCol'")
    require(!path.contains("'"),
      s"index path must not contain single quotes: $path")
    val spark = df.sparkSession
    new java.io.File(path).mkdirs()
    // meta.json is the COMMIT MARKER and is written LAST: deleting it first
    // makes a crashed rebuild unreadable (readMeta raises) instead of a
    // silently-readable mix of stale parameters over half-overwritten
    // frames — a 64-hash meta over a 128-hash payload would verify pairs
    // against mismatched signatures with no error
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(metaPath(path))): Unit
    graft.core.Blocks.scoped {
      val idType = df.schema(idCol).dataType.sql
      val meta = Meta(shingleK, numHashes, bands, nBuckets, idCol, idType)
      // payload: (id, shingle_hashes, signature) — minhashed() is the
      // same computation crossNearDups' verification side re-derives, so
      // persisted values match the live recompute bit for bit
      val payload = Dedup
        .minhashed(df, textCol, idCol, shingleK, numHashes)
        .select(col(idCol), col("shingle_hashes"), col("signature"))
      // repartition to the BUCKET HASH before every bucketed write (r14,
      // guide §6): Spark's bucketed writer emits one file per (task,
      // bucket), so a corpus-parallel input wrote tasks×nBuckets shards —
      // the sf0.1 reband index carried 5,431 files for 50 MB, and every
      // query paid the footer merge. repartition(nBuckets, bucketCols)
      // uses the SAME murmur3-pmod placement as the writer, so each task
      // holds exactly one bucket → one file per bucket. (Write parallelism
      // collapses to nBuckets — at larger corpora size nBuckets up, which
      // the bucket-count parameter exists for.)
      payload.repartition(nBuckets, col(idCol)).write
        .mode("overwrite")
        .bucketBy(nBuckets, idCol)
        .sortBy(idCol)
        .option("path", new java.io.File(s"$path/payload").getAbsolutePath)
        .saveAsTable(tableName(path, "payload"))
      // buckets: exactly crossNearDups' corpus-side cells (null ids can
      // never pair — dropped before the size count, same boundary).
      // Read back from the JUST-WRITTEN payload table, not the in-memory
      // plan: minhashed() checkpoints only the shingled frame, so deriving
      // from `payload` would re-run the numHashes-per-shingle signature
      // kernel over the whole corpus a second time
      val signed = spark.table(tableName(path, "payload"))
        .select(col(idCol), col("signature"))
      val buckets = Dedup.lshBuckets(signed, idCol, bands)
        .where(col(idCol).isNotNull)
      buckets.repartition(nBuckets, col("band"), col("bucket")).write
        .mode("overwrite")
        .bucketBy(nBuckets, "band", "bucket")
        .sortBy("band", "bucket")
        .option("path", new java.io.File(s"$path/buckets").getAbsolutePath)
        .saveAsTable(tableName(path, "buckets"))
      // sizes: per-cell membership counts off the just-written bucket
      // table (bucketed scan → exchange-free aggregate), co-bucketed so
      // the query-time cap filter joins without any exchange
      val bucketsDf = spark.table(tableName(path, "buckets"))
      bucketsDf
        .groupBy("band", "bucket")
        .agg(count(lit(1)).as("dj_bn"))
        .write
        .mode("overwrite")
        .bucketBy(nBuckets, "band", "bucket")
        .sortBy("band", "bucket")
        .option("path", new java.io.File(s"$path/sizes").getAbsolutePath)
        .saveAsTable(tableName(path, "sizes"))
      writeMeta(path, meta)
      // a full (destructive — see the marker discipline above) rebuild
      // resets every table to generation 0: stale higher generations from
      // a previous compact lifecycle are garbage now
      Seq("buckets", "sizes", "payload")
        .foreach(gcGenerations(path, _, keep = Set(0)))
      meta
    }
  }

  /** Fold a NEW shard into an existing index — the rolling-ingestion
    * write path: a pipeline dedups each arriving shard against the index
    * ([[incrementalNearDups]]), keeps the survivors, and appends them here
    * so the NEXT shard dedups against corpus ∪ shard. Afterward
    * `incrementalNearDups(next, path)` equals
    * `crossNearDups(next, corpus ∪ shard)` bit for bit (spec-pinned).
    *
    * Cost per append: ONE shingling pass over the shard (checkpointed —
    * payload write and bucket derivation share it), bucketed appends to
    * the payload/bucket tables, and a sizes merge (old counts ∪ the
    * shard's cell counts, one co-bucketed aggregate) swapped in place.
    * The corpus is never re-read beyond the old sizes table.
    *
    * Unlike [[build]], `meta.json` is never taken down: readers (including
    * every concurrent streaming micro-batch) stay live through the append,
    * and the sizes generation pointer flips atomically at commit. A
    * crashed append leaves orphan shard rows, not a torn index — see the
    * design note at the write sequence below.
    *
    * Shard ids must be DISJOINT from the index's (payload ids are unique
    * by contract — verification joins key on them); overlap raises before
    * anything is written.
    */
  def append(shard: DataFrame, textCol: String, path: String): Meta = {
    val spark = shard.sparkSession
    val idx = open(spark, path)
    val m = idx.meta
    graft.core.Blocks.scoped {
      // one shingling/signature pass, shared by both writes below
      val payloadNew = graft.core.Blocks.checkpoint(
        Dedup.minhashed(shard, textCol, m.idCol, m.shingleK, m.numHashes)
          .select(col(m.idCol), col("shingle_hashes"), col("signature")))
      val clash = payloadNew
        .join(idx.payload.select(m.idCol), Seq(m.idCol), "left_semi")
        .select(m.idCol).head(1)
      require(clash.isEmpty,
        s"DedupIndex.append: shard id '${clash.headOption.map(_.get(0)).getOrElse("")}' " +
          s"already exists in the index at $path — ids must be disjoint " +
          "(dedup the shard against the index first, append the survivors)")
      // meta stays IN PLACE through the whole append (r13 advice): earlier
      // rounds deleted it here as a commit marker, which opened a window
      // where every concurrent readMeta/open failed outright on each
      // streaming micro-batch — defeating the generation scheme's
      // concurrent-reader story for exactly the ingestion workload that
      // appends most. Appends are ADDITIVE to the current generation:
      // payload lands before buckets (a bucket row always finds its
      // verification payload), the sizes pointer flips atomically last,
      // and readers stay consistent throughout — they see the old corpus
      // plus at most a partially-visible uncommitted shard. A crashed
      // append therefore leaves ORPHAN SHARD ROWS (partially discoverable,
      // undercounted in sizes — the hot-cell cap errs toward examining
      // more candidates, never toward wrong pairs) instead of an unreadable
      // index; the id-clash check above turns a blind retry into a loud
      // error, and compact()/rebuild() restore canonical state.
      payloadNew.repartition(m.nBuckets, col(m.idCol)).write
        .mode("append")
        .bucketBy(m.nBuckets, m.idCol)
        .sortBy(m.idCol)
        .saveAsTable(tableName(path, "payload"))
      val bucketsNew = graft.core.Blocks.checkpoint(
        Dedup.lshBuckets(
          payloadNew.select(col(m.idCol), col("signature")), m.idCol, m.bands)
          .where(col(m.idCol).isNotNull))
      bucketsNew.repartition(m.nBuckets, col("band"), col("bucket")).write
        .mode("append")
        .bucketBy(m.nBuckets, "band", "bucket")
        .sortBy("band", "bucket")
        .saveAsTable(tableName(path, "buckets"))
      // sizes merge: old counts ∪ shard cell counts → one aggregate,
      // written as a NEW GENERATION of the sizes table (the old files are
      // being read by the merge, so never an in-place overwrite; the old
      // generation survives the flip for concurrent readers)
      val merged = idx.sizes
        .union(bucketsNew.groupBy("band", "bucket").agg(count(lit(1)).as("dj_bn")))
        .groupBy("band", "bucket")
        .agg(sum(col("dj_bn")).as("dj_bn"))
      val newMeta = m.copy(genSizes = m.genSizes + 1)
      writeGenBucketed(
        spark, path, "sizes", merged, Seq("band", "bucket"), m.nBuckets,
        newMeta.genSizes, maxRowsPerFile = None, repartitionFirst = true)
      writeMeta(path, newMeta) // atomic commit: sizes pointer flips here
      gcGenerations(path, "sizes", keep = Set(newMeta.genSizes, m.genSizes))
      newMeta
    }
  }

  /** Per-table small-file accounting: every [[append]] adds one file-set
    * per bucketed table (one file per bucket per writer task), so rolling
    * ingestion accumulates files until scan parallelism and parquet footer
    * overhead degrade. `filesPerBucket` ≈ how many appends' worth of
    * layers a bucketed scan must merge — [[compact]] when it grows past a
    * handful.
    */
  final case class TableStats(
      table: String,
      nFiles: Long,
      bytes: Long,
      filesPerBucket: Double,
      maxFileBytes: Long = 0L)

  private[sources] def dirStats(
      dir: java.io.File, table: String, nBuckets: Int): TableStats = {
    var files = 0L
    var bytes = 0L
    var maxBytes = 0L
    def walk(f: java.io.File): Unit =
      if (f.isDirectory) {
        val kids = f.listFiles(); if (kids != null) kids.foreach(walk)
      } else if (f.getName.endsWith(".parquet")) {
        files += 1; bytes += f.length()
        maxBytes = math.max(maxBytes, f.length())
      }
    walk(dir)
    TableStats(
      table, files, bytes, files.toDouble / math.max(1, nBuckets), maxBytes)
  }

  /** Small-file stats for the index's three bucketed tables (CURRENT
    * generations only — retired generations awaiting GC are not scan
    * cost) — the operator-facing "is it time to [[compact]]" number;
    * `maxFileBytes` is the "is a bucket's file unboundedly large" number
    * the compaction row cap addresses.
    */
  def fileStats(path: String): Seq[TableStats] = {
    val m = readMeta(path)
    Seq("buckets", "sizes", "payload").map(w =>
      dirStats(dataDir(path, w, m.gen(w)), w, m.nBuckets))
  }

  /** True when any table's per-bucket file layering passes `threshold` —
    * the default says "more than ~4 appends' worth of layers": past that
    * the bucketed scans pay footer-and-merge overhead that compaction
    * recovers (the freshly-built scan shape).
    */
  def compactionAdvised(path: String, threshold: Double = 4.0): Boolean =
    fileStats(path).exists(_.filesPerBucket > threshold)

  /** Rewrite every bucketed table to a fresh file-set (same bucket spec,
    * same rows — query/pair results are unchanged by construction,
    * spec-pinned across append→append→compact) so a rolling-ingested
    * index recovers the freshly-built scan shape. One file per bucket by
    * default; `maxRowsPerFile` bounds rows per output file WITHIN a
    * bucket (rolled sequentially, so each file is still a contiguous
    * sorted run and row-group pruning keeps working) — the cap that stops
    * a skewed hot bucket from becoming one unbounded file and one
    * unbounded task's write.
    *
    * Concurrent-reader-safe via GENERATIONS: the rewrite lands in fresh
    * `<table>_g<N+1>` directories and `meta.json` flips to them in one
    * atomic rename — never deleted, so a crash at ANY point leaves the
    * old index fully readable, and a reader holding an already-open plan
    * keeps its (previous-generation) file-set, which survives until the
    * NEXT compact or an explicit [[vacuum]].
    */
  def compact(
      spark: SparkSession,
      path: String,
      maxRowsPerFile: Option[Long] = None): Meta = {
    val idx = open(spark, path)
    val m = idx.meta
    val newMeta = m.copy(
      genBuckets = m.genBuckets + 1,
      genSizes = m.genSizes + 1,
      genPayload = m.genPayload + 1)
    // SHUFFLE-FREE by construction: forcing the bucketed scan reads each
    // bucket's layered files as ONE partition, and the writer then emits
    // one file-set per bucket — no exchange anywhere, which is the
    // shape a 100 TB compaction must have. (Left to its own devices the
    // planner first elides a repartition-by-bucket-cols as satisfied-by-
    // bucketing, then auto-DISABLES the bucketed scan as benefiting no
    // operator, and the write re-layers one file per input split.)
    withForcedBucketedScan(spark) {
      writeGenBucketed(spark, path, "payload", idx.payload,
        Seq(m.idCol), m.nBuckets, newMeta.genPayload, maxRowsPerFile)
      writeGenBucketed(spark, path, "buckets", idx.buckets,
        Seq("band", "bucket"), m.nBuckets, newMeta.genBuckets, maxRowsPerFile)
      writeGenBucketed(spark, path, "sizes", idx.sizes,
        Seq("band", "bucket"), m.nBuckets, newMeta.genSizes, maxRowsPerFile)
    }
    writeMeta(path, newMeta) // atomic pointer flip
    // deferred GC: keep the generation readers may still hold open;
    // everything older goes now
    gcGenerations(path, "payload", Set(newMeta.genPayload, m.genPayload))
    gcGenerations(path, "buckets", Set(newMeta.genBuckets, m.genBuckets))
    gcGenerations(path, "sizes", Set(newMeta.genSizes, m.genSizes))
    newMeta
  }

  /** Drop every non-current generation NOW — the operator-invoked GC for
    * when no long-running readers hold old file-sets (deferred deletion
    * otherwise keeps exactly one previous generation per table).
    */
  def vacuum(path: String): Unit = {
    val m = readMeta(path)
    Seq("buckets", "sizes", "payload")
      .foreach(w => gcGenerations(path, w, keep = Set(m.gen(w))))
  }

  /** Byte accounting for RETIRED generations — the deferred-GC file-sets
    * [[compact]]/[[rebuild]] keep around for concurrent readers, i.e.
    * exactly what [[vacuum]] would reclaim. [[fileStats]]' storage twin:
    * fileStats prices the CURRENT generation's scans, retiredStats prices
    * the generation scheme's storage debt (a rolling-ingested index
    * otherwise carries up to ~2× bytes between compactions forever).
    */
  def retiredStats(path: String): Seq[TableStats] = {
    val m = readMeta(path)
    val kids = Option(new java.io.File(path).listFiles())
      .getOrElse(Array.empty[java.io.File])
    Seq("buckets", "sizes", "payload").map { w =>
      val cur = m.gen(w)
      val re = ("^" + java.util.regex.Pattern.quote(w) + "_g(\\d+)$").r
      val retired = kids.filter(f => f.isDirectory && (f.getName match {
        case re(g) => g.toInt != cur
        case n => n == w && cur != 0 // pre-generation layout dir, retired
      }))
      retired.map(dirStats(_, w, m.nBuckets))
        .foldLeft(TableStats(w, 0L, 0L, 0.0)) { (a, b) =>
          TableStats(w, a.nFiles + b.nFiles, a.bytes + b.bytes,
            (a.nFiles + b.nFiles).toDouble / math.max(1, m.nBuckets),
            math.max(a.maxFileBytes, b.maxFileBytes))
        }
    }
  }

  private[sources] def withForcedBucketedScan[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try body
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Write `df` as generation `gen` of `which` (a fresh directory — the
    * old generation's files, which `df` may be reading, are never
    * touched). A leftover partial directory from a crashed earlier
    * attempt at the same generation is cleared by the overwrite. The
    * throwaway catalog name is dropped after the write (the table is
    * external — files stay); [[open]] re-registers the canonical name at
    * whatever generation the meta points to.
    */
  private def writeGenBucketed(
      spark: SparkSession,
      path: String,
      which: String,
      df: DataFrame,
      clusterCols: Seq[String],
      nBuckets: Int,
      gen: Int,
      maxRowsPerFile: Option[Long],
      // align write tasks with the bucket hash (one file per bucket — see
      // the build() comment; r14): true for rebuild/append-sizes whose
      // inputs arrive shuffled arbitrarily; FALSE for compact, whose
      // forced-bucketed-scan input already holds one bucket per task and
      // must stay exchange-free
      repartitionFirst: Boolean = false): Unit = {
    val tmpName = tableName(path, s"${which}_gw")
    val loc = dataDir(path, which, gen)
    spark.sql(s"DROP TABLE IF EXISTS $tmpName")
    val writer = (if (repartitionFirst)
      df.repartition(nBuckets, clusterCols.map(col): _*)
    else df)
      // under [[withForcedBucketedScan]] each task holds exactly one
      // bucket's rows (all its layered files in one partition), so the
      // rewrite emits one file-set per bucket with no exchange
      .write
      .mode("overwrite")
      .bucketBy(nBuckets, clusterCols.head, clusterCols.tail: _*)
      .sortBy(clusterCols.head, clusterCols.tail: _*)
      .option("path", loc.getAbsolutePath)
    maxRowsPerFile
      .fold(writer)(n => writer.option("maxRecordsPerFile", n))
      .saveAsTable(tmpName)
    spark.sql(s"DROP TABLE IF EXISTS $tmpName")
  }

  /** Index health snapshot (the rebuild-advisor twin of
    * [[AnnIndex.healthReport]]). The dedup index has no quantizer to go
    * stale; what degrades it is HOT-CELL MASS: query time drops every LSH
    * cell above `maxBucketSize`, so the fraction of cell membership living
    * in over-cap cells is exactly the candidate mass the index can no
    * longer see (documents reachable only through hot cells stop matching).
    * Growing hot mass means the banding geometry no longer discriminates
    * on this corpus — the fix is a REBUILD with more bands/hashes (or
    * boilerplate removal upstream), not a compact.
    */
  final case class Health(
      nDocs: Long,
      nCells: Long,
      maxCellSize: Long,
      cappedMassFrac: Double,
      filesPerBucket: Double,
      recommendation: String)

  def healthReport(
      spark: SparkSession,
      path: String,
      maxBucketSize: Int = 1000,
      cappedMassLimit: Double = 0.1,
      maxFilesPerBucket: Double = 4.0): Health = {
    val idx = open(spark, path)
    val row = idx.sizes.agg(
      count(lit(1)).as("cells"),
      max(col("dj_bn")).as("mx"),
      sum(col("dj_bn")).as("total"),
      sum(when(col("dj_bn") > maxBucketSize, col("dj_bn"))
        .otherwise(lit(0L))).as("capped"))
      .head()
    val (cells, maxCell, total, capped) =
      if (row.isNullAt(2)) (0L, 0L, 0L, 0L)
      else (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    val nDocs = idx.payload.count()
    val cappedMassFrac = if (total == 0) 0.0 else capped.toDouble / total
    val layering = fileStats(path).map(_.filesPerBucket).max
    val recommendation =
      if (cappedMassFrac > cappedMassLimit) "rebuild"
      else if (layering > maxFilesPerBucket) "compact"
      else "ok"
    Health(nDocs, cells, maxCell, cappedMassFrac, layering, recommendation)
  }

  /** Re-derive the LSH cells at a NEW banding from the persisted payload —
    * the action [[healthReport]]'s "rebuild" verdict calls for when
    * hot-cell mass grew: FEWER bands mean more signature rows per band
    * key, i.e. stricter collisions and smaller cells (at a recall cost the
    * banding formula `1-(1-s^r)^b` prices). The corpus text is NEVER
    * re-read — the persisted signatures regroup into any `bands` that
    * divides `numHashes`, so a 100 TB index re-bands for the cost of one
    * payload scan. Buckets and sizes rewrite through the tmp-and-swap
    * discipline; meta (with the new bands) recommits last.
    */
  def rebuild(spark: SparkSession, path: String, bands: Int): Meta = {
    val idx = open(spark, path)
    val m = idx.meta
    require(bands > 0 && m.numHashes % bands == 0,
      s"bands must divide numHashes=${m.numHashes}: $bands")
    val meta = m.copy(
      bands = bands,
      genBuckets = m.genBuckets + 1,
      genSizes = m.genSizes + 1)
    val buckets = Dedup.lshBuckets(
      idx.payload.select(col(m.idCol), col("signature")), m.idCol, bands)
      .where(col(m.idCol).isNotNull)
    writeGenBucketed(spark, path, "buckets", buckets,
      Seq("band", "bucket"), m.nBuckets, meta.genBuckets, None,
      repartitionFirst = true)
    val sizes = openGenBuckets(spark, path, meta, meta.genBuckets)
      .groupBy("band", "bucket")
      .agg(count(lit(1)).as("dj_bn"))
    writeGenBucketed(spark, path, "sizes", sizes,
      Seq("band", "bucket"), m.nBuckets, meta.genSizes, None,
      repartitionFirst = true)
    // atomic pointer flip: bands and the buckets/sizes generations change
    // together or not at all — a crash anywhere above leaves the OLD
    // banding fully intact and readable
    writeMeta(path, meta)
    gcGenerations(path, "buckets", Set(meta.genBuckets, m.genBuckets))
    gcGenerations(path, "sizes", Set(meta.genSizes, m.genSizes))
    meta
  }

  /** The buckets frame alone, registered at an explicit generation — used
    * mid-[[rebuild]] where the meta pointer still designates the OLD
    * generation (a full [[open]] would read the wrong banding).
    */
  private def openGenBuckets(
      spark: SparkSession, path: String, m: Meta, gen: Int): DataFrame = {
    val name = registerBucketed(
      spark, path, "buckets",
      s"${m.idCol} ${m.idType}, band INT, bucket BIGINT",
      Seq("band", "bucket"), m.nBuckets, gen)
    spark.table(name)
  }

  /** An opened index: catalog-registered bucketed frames + build meta. */
  final case class Index(
      meta: Meta,
      buckets: DataFrame,
      sizes: DataFrame,
      payload: DataFrame)

  /** Open (re-registering the external bucketed tables in this session's
    * catalog — idempotent) an index previously written by [[build]], in
    * this session or any earlier one.
    */
  def open(spark: SparkSession, path: String): Index = {
    val m = readMeta(path)
    val id = s"${m.idCol} ${m.idType}"
    val bucketsName = registerBucketed(
      spark, path, "buckets",
      s"$id, band INT, bucket BIGINT",
      Seq("band", "bucket"), m.nBuckets, m.genBuckets)
    val sizesName = registerBucketed(
      spark, path, "sizes",
      "band INT, bucket BIGINT, dj_bn BIGINT",
      Seq("band", "bucket"), m.nBuckets, m.genSizes)
    val payloadName = registerBucketed(
      spark, path, "payload",
      s"$id, shingle_hashes ARRAY<BIGINT>, signature ARRAY<BIGINT>",
      Seq(m.idCol), m.nBuckets, m.genPayload)
    Index(m,
      spark.table(bucketsName),
      spark.table(sizesName),
      spark.table(payloadName))
  }

  /** Near-duplicate pairs between a NEW shard and the indexed corpus —
    * `crossNearDups(newShard, corpus)` with the corpus side served
    * entirely by the index: (id1 ∈ shard, id2 ∈ corpus, jaccard ≥
    * threshold), bit-identical to the batch recompute (spec-pinned).
    *
    * What the index amortizes per shard: the corpus shingling/signature
    * pass (read from `payload/` for candidate ids only), the corpus
    * banding pass (read from `buckets/`), and the corpus cell-count
    * aggregate (read from `sizes/`). Plan shape: the corpus-side cap
    * filter is a co-bucketed join (no exchange on either side), the
    * candidate join shuffles ONLY the shard's cells to the corpus'
    * bucketing, and verification is the same candidate-volume-sized
    * strategy switch as the batch op.
    *
    * EAGER materialization contract: as [[graft.ops.Dedup.crossNearDups]]
    * — construction runs the shard's shingling and the candidate join;
    * only the exact-Jaccard verification is lazy in the returned frame.
    * Release tracked intermediates with `Blocks.releaseAll()` after
    * consuming.
    */
  def incrementalNearDups(
      newShard: DataFrame,
      textCol: String,
      path: String,
      threshold: Double = 0.6,
      maxBucketSize: Int = 1000): DataFrame = {
    val spark = newShard.sparkSession
    val idx = open(spark, path)
    val m = idx.meta
    val idCol = m.idCol
    // shard side: live, exactly crossNearDups' dfA machinery
    val signedA = Dedup.minhashSignatures(
      newShard, textCol, idCol, m.shingleK, m.numHashes)
    val bucketsA = graft.core.Blocks.checkpoint(
      Dedup.lshBuckets(signedA, idCol, m.bands).where(col(idCol).isNotNull))
    val cappedA = bucketsA.join(
      bucketsA.groupBy("band", "bucket").agg(count(lit(1)).as("dj_bn"))
        .where(col("dj_bn") <= maxBucketSize)
        .select("band", "bucket"),
      Seq("band", "bucket"))
    // corpus side: the persisted cells, cap filter from the persisted
    // counts — both co-bucketed, no corpus-side exchange, no count job
    val cappedB = idx.buckets.join(
      idx.sizes.where(col("dj_bn") <= maxBucketSize)
        .select("band", "bucket"),
      Seq("band", "bucket"))
    val candidates = graft.core.Blocks.checkpoint(
      cappedA
        .select(col("band"), col("bucket"), col(idCol).as("id1"))
        .join(
          cappedB.select(col("band"), col("bucket"), col(idCol).as("id2")),
          Seq("band", "bucket"))
        .select("id1", "id2")
        .distinct())
    val nCand = candidates.count()
    graft.core.Blocks.release(bucketsA)
    graft.core.Blocks.release(signedA)
    // same candidate-volume-sized strategy switch as crossNearDups: the
    // shard side recomputes candidate payloads from text, the corpus side
    // reads them from the index (values identical by determinism)
    val small = nCand <= Dedup.pairBroadcastCap(spark)
    val sidesA =
      if (small)
        Dedup.candidateSides(newShard, textCol, idCol, m.shingleK, m.numHashes,
          candidates.select(col("id1").as(idCol)).distinct(),
          broadcastIds = true)
      else
        Dedup.minhashed(newShard, textCol, idCol, m.shingleK, m.numHashes)
          .select(col(idCol), col("shingle_hashes"), col("signature"))
    val sidesB =
      if (small)
        idx.payload.join(
          broadcast(candidates.select(col("id2").as(idCol)).distinct()),
          Seq(idCol), "left_semi")
      else idx.payload
    val estCutoff = math.max(0.0, threshold - 0.25)
    Dedup.verifyMinhashPairs(candidates, nCand, sidesA, sidesB, idCol,
      threshold, estCutoff)
  }

  /** Persist a fitted coarse quantizer (the [[graft.ops.Similarity]]
    * centroid list) under `path/centroids` — IVF/SemDeDup geometry is the
    * third thing a rolling pipeline should not re-fit per shard.
    */
  def saveCentroids(
      spark: SparkSession,
      path: String,
      centroids: Seq[(Long, Seq[Double])],
      dirName: String = "centroids"): Unit = {
    import spark.implicits._
    new java.io.File(path).mkdirs()
    centroids.toDF("centroid_id", "centroid_vec")
      .repartition(1)
      .write.mode("overwrite")
      .parquet(new java.io.File(s"$path/$dirName").getAbsolutePath)
  }

  /** Load a centroid list saved by [[saveCentroids]] — ascending id, the
    * order [[graft.ops.Similarity.fitCentroids]] semantics expect.
    */
  def loadCentroids(
      spark: SparkSession,
      path: String,
      dirName: String = "centroids"): Seq[(Long, Seq[Double])] =
    spark.read
      .parquet(new java.io.File(s"$path/$dirName").getAbsolutePath)
      .sort(col("centroid_id"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq)
      .toSeq
}
