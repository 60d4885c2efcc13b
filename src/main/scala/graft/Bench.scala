package graft
import org.apache.spark.sql.SparkSession
object Bench {

  private def jsonEscape(s: String): String =
    s.replaceAll("[\\\\\"\\n\\r\\t]", " ").take(200)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a failing query must surface as an `err`, never masquerade as a
      // fast success in the bench JSON
      val err =
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable => Some(jsonEscape(String.valueOf(e))) }
      // per-query isolation: operator-internal caches must not skew (or
      // memory-starve) the queries that follow
      spark.catalog.clearCache()
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"\"" + k + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
