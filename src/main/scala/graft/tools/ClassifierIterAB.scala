package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r15: same-JVM A/B of one training round — r14 spelling (err checkpoint
  * + 2 aggregate jobs) vs r15 fused single-job round — over the real gate
  * features. Also asserts the two rounds produce identical gradients.
  * Usage: runMain graft.tools.ClassifierIterAB <dir> [reps]
  */
object ClassifierIterAB {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        graft.core.Tuning.wideStart(dir, cpus))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"),
        (col("doc_id") % 7 === 0).cast("int").as("dj_label"))
    val nBuckets = 256
    val feats = graft.core.Blocks.checkpoint(
      graft.ops.Dsir.gramRows(docs, "text", "doc_id")
        .select(col("doc_id"),
          graft.ops.Dsir.bucketOf(col("dj_gram"), nBuckets, md5Flavor = true)
            .as("dj_bucket"))
        .groupBy(col("doc_id"), col("dj_bucket"))
        .agg(count(lit(1)).as("dj_cnt")))
    val labels = docs.select(col("doc_id"), col("dj_label").as("dj_y"))
    val idCol = "doc_id"
    def wTable(w: Array[Double]): DataFrame = {
      import scala.jdk.CollectionConverters._
      val rows = w.zipWithIndex.map { case (x, b) =>
        org.apache.spark.sql.Row(b.toLong,
          new java.math.BigDecimal(x).setScale(12, java.math.RoundingMode.HALF_UP))
      }.toSeq.asJava
      spark.createDataFrame(rows,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("dj_bucket",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("dj_w",
            org.apache.spark.sql.types.DecimalType(20, 12)))))
    }
    val w0 = new Array[Double](nBuckets)
    val bias = 0.0
    def marginExpr = (sum(col("dj_cnt").cast("decimal(17,0)") * col("dj_w"))
      .cast("decimal(30,12)") +
      lit(new java.math.BigDecimal(bias).setScale(12, java.math.RoundingMode.HALF_UP))
        .cast("decimal(20,12)")).cast("decimal(38,12)")
    def oldRound(): (Map[Int, Double], Double) = {
      val err = graft.core.Blocks.checkpoint(
        feats.join(broadcast(wTable(w0)), Seq("dj_bucket"))
          .groupBy(col(idCol)).agg(marginExpr.as("dj_margin"))
          .join(labels, Seq(idCol))
          .select(col(idCol),
            (lit(1.0) / (lit(1.0) + exp(-col("dj_margin").cast("double"))) -
              col("dj_y")).cast("decimal(20,12)").as("dj_err")))
      try {
        val g = feats.join(err, Seq(idCol)).groupBy(col("dj_bucket"))
          .agg(sum(col("dj_cnt").cast("decimal(17,0)") * col("dj_err"))
            .cast("decimal(38,12)").as("dj_g"))
          .collect().map(r => r.getLong(0).toInt -> r.getDecimal(1).doubleValue()).toMap
        val bg = err.agg(sum(col("dj_err")).cast("decimal(38,12)"))
          .head().getDecimal(0).doubleValue()
        (g, bg)
      } finally graft.core.Blocks.release(err)
    }
    def newRound(): (Map[Int, Double], Double) = {
      val err = feats.join(broadcast(wTable(w0)), Seq("dj_bucket"))
        .groupBy(col(idCol))
        .agg(marginExpr.as("dj_margin"), min(col("dj_bucket")).as("dj_mb"))
        .join(labels, Seq(idCol))
        .select(col(idCol), col("dj_mb"),
          (lit(1.0) / (lit(1.0) + exp(-col("dj_margin").cast("double"))) -
            col("dj_y")).cast("decimal(20,12)").as("dj_err"))
      val rows = feats.join(err, Seq(idCol)).groupBy(col("dj_bucket"))
        .agg(
          sum(col("dj_cnt").cast("decimal(17,0)") * col("dj_err"))
            .cast("decimal(38,12)").as("dj_g"),
          sum(when(col("dj_bucket") === col("dj_mb"), col("dj_err")))
            .cast("decimal(38,12)").as("dj_bg"))
        .collect()
      val g = rows.map(r => r.getLong(0).toInt -> r.getDecimal(1).doubleValue()).toMap
      val bg = rows.flatMap(r => Option(r.getDecimal(2)))
        .foldLeft(java.math.BigDecimal.ZERO)(_.add(_)).doubleValue()
      (g, bg)
    }
    val (go, bo) = oldRound()
    val (gn, bn) = newRound()
    println(s"[cab] grad equal=${go == gn} bias equal=${bo == bn} ($bo vs $bn)")
    for (r <- 1 to reps) {
      var t0 = System.nanoTime()
      oldRound()
      println(f"[cab] old rep$r: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      t0 = System.nanoTime()
      newRound()
      println(f"[cab] new rep$r: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
