package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL registration surface (`GraftExtensions`): every registered
  * kernel must be callable from `spark.sql` and produce bit-identical
  * results to its Column-API spelling (same Expression underneath).
  */
class ExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  test("registered kernels run from spark.sql and match the Column API") {
    GraftExtensions.register(spark)
    spark.createDataFrame(
      Seq((1L, "The QUICK brown fox!!"), (2L, "pack my box with five dozen jugs")))
      .toDF("id", "text")
      .createOrReplaceTempView("ext_docs")

    val viaSql = spark.sql(
      """SELECT id,
               normalize_text(text) AS norm,
               shingle_hashes(normalize_text(text), 5) AS sh,
               minhash_signature(shingle_hashes(normalize_text(text), 5), 16) AS sig,
               simhash64(split(normalize_text(text), ' ')) AS sim
        FROM ext_docs""").collect().map(_.toString).sorted.toSeq

    val viaColumns = spark.table("ext_docs")
      .select(
        col("id"),
        graft.functions.NormalizeText.normalizeText(col("text")).as("norm"),
        graft.functions.ShingleHashes
          .shingleHashes(graft.functions.NormalizeText.normalizeText(col("text")), 5).as("sh"),
        graft.functions.MinHashSignature.minhashSignature(
          graft.functions.ShingleHashes
            .shingleHashes(graft.functions.NormalizeText.normalizeText(col("text")), 5),
          16).as("sig"),
        graft.functions.SimHash64
          .simhash64(split(graft.functions.NormalizeText.normalizeText(col("text")), " "))
          .as("sim"))
      .collect().map(_.toString).sorted.toSeq
    assert(viaSql == viaColumns)

    // binary kernels
    val sims = spark.sql(
      """SELECT jaccard_sorted_long(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j,
               matching_fraction_long(array(1L, 2L), array(1L, 9L)) AS m,
               dot_product_float(
                 array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
                 array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d""").head()
    assert(sims.getDouble(0) == 2.0 / 4.0)
    assert(sims.getDouble(1) == 0.5)
    assert(sims.getDouble(2) == 4.0)

    // non-literal width argument is rejected with a clear message
    val err = intercept[Exception] {
      spark.sql("SELECT shingle_hashes(text, id + 1) FROM ext_docs").collect()
    }
    assert(err.getMessage.contains("integer literal") ||
      String.valueOf(err.getCause).contains("integer literal"))
  }

  test("the SparkSessionExtensions class injects the same function set") {
    // the shared session predates the extension, so exercise the injection
    // path on a throwaway builder-applied instance: apply() must register
    // every function name without throwing
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // names covered by the register() path above; here we pin the count so
    // a function added to one path can't be forgotten in the other
    assert(GraftExtensions.functions.map(_._1).toSet == Set(
      "normalize_text", "shingle_hashes", "strided_hashes", "winnow_hashes",
      "minhash_signature", "jaccard_sorted_long", "matching_fraction_long",
      "dot_product_float", "simhash64"))
  }
}
