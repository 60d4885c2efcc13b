package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic 10× scale-up of a driver testdata directory, for the sf1
  * leg of the bench (see `Bench.scala`): correctness still runs exclusively
  * on the driver's own parquet; this exists only to surface constants and
  * superlinear behavior that hide at 600k rows.
  *
  * Replication recipe (seeded, reproducible — no RNG):
  *  - every surrogate/foreign key is shifted by `replica * 1e9`, so
  *    customer↔orders↔lineitem joins stay consistent within a replica and
  *    replicas never collide;
  *  - `documents.text` REPLACES ~⅔ of tokens per replica with unrelated
  *    hash-derived words (`xxhash64(word, pos, replica) % 3 != 0` →
  *    `w<hash>`), dropping cross-replica CHARACTER-shingle Jaccard to ~0.2
  *    — far enough below the 0.6 dedup threshold that LSH band collisions
  *    (P ≈ 16·j⁴ at 16 bands / 64 hashes) stay rare and candidate pairs
  *    grow LINEARLY with the corpus, the realistic shape (near-dup density
  *    per doc is constant as a corpus scales). Two rejected designs, both
  *    measured as data artifacts rather than engine behavior: a ⅓ tag
  *    mutation left char-level j ≈ 0.5 (band collisions ~60%, every replica
  *    family an all-pairs candidate clique), and APPENDING a tag instead of
  *    replacing the token barely moves char shingles at all. SimHash is
  *    token-order-invariant, so a mere word shuffle would not work either;
  *  - `embeddings.embedding` gets ±0.01 deterministic per-component noise —
  *    replicas stay in nearby LSH buckets (realistic occupancy growth)
  *    without being bit-equal. With `freshEmbeddings = true` the replicas
  *    are instead fully FRESH hash-derived unit vectors (independent
  *    directions): the replicated flavor measures bucket-occupancy growth,
  *    but it makes every replica an exact near-duplicate of its source —
  *    near-dup pair volume and ANN recall measured on it are replication
  *    artifacts (the r8 sf10 leg emitted 10.4M verified pairs and recall
  *    1.0 this way). The fresh flavor is the honest leg for both;
  *  - tiny dims (`region`, `nation`) are copied, keeping FK values valid.
  *
  * Run: `sbt "runMain graft.tools.ScaleData [src] [dst] [replicas] [fresh]"`.
  */
object ScaleData {

  private val Stride = 1000000000L // > every key at sf0.1

  def main(args: Array[String]): Unit = {
    val src  = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst  = args.lift(1).getOrElse("/root/repo/benchdata/sf1")
    val reps = args.lift(2).map(_.toInt).getOrElse(10)
    val fresh = args.lift(3).contains("fresh")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("graft-scaledata")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scale(spark, src, dst, reps, freshEmbeddings = fresh)
    spark.stop()
  }

  /** Session-reusing entry point: Bench regenerates absent scale legs with
    * its own session (a nested getOrCreate would hijack — and then stop —
    * the caller's). `events.ts` replicates dtype-agnostically: only ids are
    * shifted, so both the int64-nanos and native-timestamp generations of
    * the driver testdata pass through unchanged.
    */
  def scale(
      spark: SparkSession,
      src: String,
      dst: String,
      reps: Int,
      freshEmbeddings: Boolean = false): Unit = {

    def shift(df: DataFrame, r: Int, keys: String*): DataFrame =
      keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(r * Stride)))

    def replicate(name: String)(perReplica: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val out  = (0 until reps).map(r => perReplica(base, r)).reduce(_ unionAll _)
      out.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"scaled $name -> $dst/$name.parquet")
    }

    // tiny dims: copy once, FK values stay valid across replicas
    Seq("region", "nation").foreach { name =>
      spark.read.parquet(s"$src/$name.parquet")
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"copied $name")
    }

    replicate("customer")((df, r) => shift(df, r, "c_custkey"))
    replicate("supplier")((df, r) => shift(df, r, "s_suppkey"))
    replicate("part")((df, r) => shift(df, r, "p_partkey"))
    replicate("orders")((df, r) => shift(df, r, "o_orderkey", "o_custkey"))
    replicate("lineitem")((df, r) =>
      shift(df, r, "l_orderkey", "l_partkey", "l_suppkey"))
    replicate("events")((df, r) => shift(df, r, "event_id", "user_id"))

    replicate("documents") { (df, r) =>
      val shifted = shift(df, r, "doc_id")
      if (r == 0) shifted
      else {
        val mutated = when(col("text").isNull, lit(null).cast("string"))
          .otherwise(array_join(
            transform(
              split(col("text"), " "),
              (w, p) =>
                when(pmod(xxhash64(w, p, lit(r)), lit(3)) =!= 0,
                  concat(lit("w"),
                    pmod(xxhash64(w, p, lit(r)), lit(999983)).cast("string")))
                  .otherwise(w)),
            " "))
        shifted
          .withColumn("text", mutated)
          .withColumn("n_chars", coalesce(length(col("text")).cast("long"), lit(0L)))
      }
    }

    replicateInto(spark, src, dst, reps, "embeddings")(
      embeddingsReplica(freshEmbeddings))
  }

  /** Scale ONLY the embeddings table — the cheap generator behind the
    * bench's fresh-recall mini leg (r12 verdict stretch 8): the honest
    * 100×-fresh ANN recall number needs 100× unreplicated VECTORS, not the
    * whole TPC-H-ish directory, so a budget-squeezed driver run can still
    * afford the evidence.
    */
  def scaleEmbeddingsOnly(
      spark: SparkSession,
      src: String,
      dst: String,
      reps: Int,
      freshEmbeddings: Boolean): Unit =
    replicateInto(spark, src, dst, reps, "embeddings")(
      embeddingsReplica(freshEmbeddings))

  private def replicateInto(
      spark: SparkSession, src: String, dst: String, reps: Int, name: String)(
      perReplica: (DataFrame, Int) => DataFrame): Unit = {
    val base = spark.read.parquet(s"$src/$name.parquet")
    val out = (0 until reps).map(r => perReplica(base, r)).reduce(_ unionAll _)
    out.write.mode("overwrite").parquet(s"$dst/$name.parquet")
    println(s"scaled $name -> $dst/$name.parquet")
  }

  private def embeddingsReplica(freshEmbeddings: Boolean)
      : (DataFrame, Int) => DataFrame = { (df, r) =>
    val shifted = df.withColumn("vec_id", col("vec_id") + lit(r * Stride))
    if (r == 0) shifted
    else if (freshEmbeddings) {
        // FRESH unit vectors per replica (the r3 token-replacement trick,
        // embedding flavor): every component is hash-derived, so a replica
        // row is an independent random direction — replicas are NOT
        // near-duplicates of their source rows, and an sf10 near-dup or
        // recall number measured on this leg reflects the plan, not
        // replication artifacts. Components uniform in [-1, 1] then
        // normalized — isotropic enough at 64-dim for bucket-occupancy and
        // recall purposes (the source is unit-norm gaussian-ish).
        val rawArr = transform(
          col("embedding"),
          (_, j) =>
            (pmod(xxhash64(col("vec_id"), j, lit(r)), lit(2001)).cast("double")
              - 1000.0) / 1000.0)
        shifted
          .withColumn("dj_raw", rawArr)
          .withColumn(
            "dj_nrm",
            sqrt(aggregate(
              col("dj_raw"), lit(0.0), (acc, x) => acc + x * x)))
          .withColumn(
            "embedding",
            when(col("dj_nrm") > 0.0,
              transform(col("dj_raw"), x => (x / col("dj_nrm")).cast("float")))
              .otherwise(col("embedding")))
          .drop("dj_raw", "dj_nrm")
      } else
        shifted.withColumn(
          "embedding",
          transform(
            col("embedding"),
            (x, j) =>
              (x.cast("double") +
                (pmod(xxhash64(col("vec_id"), j, lit(r)), lit(1000)).cast("double") - 500.0)
                  / 50000.0).cast("float")))
  }
}
