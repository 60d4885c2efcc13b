package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Classifier

/** Hashed linear classifier: convergence on separable text, bit-exact
  * training determinism, and scoring edge cases.
  */
class ClassifierSpec extends AnyFunSuite {
  import TestSpark._

  private def corpus = {
    import spark.implicits._
    (0 until 60).map { i =>
      val good = i % 2 == 0
      val text =
        if (good) s"excellent insightful thorough prose sample $i"
        else s"spam junk click here now buy $i"
      (i.toLong, text, if (good) 1 else 0)
    }.toDF("doc_id", "text", "label")
  }

  test("training converges on linearly separable text") {
    val df = corpus
    val model = Classifier.train(
      df, "text", "doc_id", "label", nBuckets = 512, nIters = 30,
      learningRate = 1.0)
    val scored = Classifier.score(model, df, "text", "doc_id")
      .join(df.select(col("doc_id"), col("label")), Seq("doc_id"))
      .select(col("doc_id"), col("score"), col("label"))
      .collect()
    assert(scored.length == 60)
    val correct = scored.count { r =>
      val pred = if (r.getDouble(1) >= 0.5) 1 else 0
      pred == r.getInt(2)
    }
    assert(correct >= 57, s"expected >=57/60 correct, got $correct")
  }

  test("training is bit-deterministic across runs") {
    val df = corpus
    def go() = Classifier.train(
      df, "text", "doc_id", "label", nBuckets = 256, nIters = 5)
    val a = go(); val b = go()
    assert(a.bias == b.bias)
    assert(a.weights.toSeq == b.weights.toSeq)
  }

  test("NULL labels drop from training; token-free docs drop from scoring") {
    import spark.implicits._
    val df = corpus.union(
      Seq((1000L, "unlabeled text")).toDF("doc_id", "text")
        .select(col("doc_id"), col("text"), lit(null).cast("int").as("label")))
    val model = Classifier.train(
      df, "text", "doc_id", "label", nBuckets = 128, nIters = 3)
    import org.apache.spark.sql.Row
    val scoreInput = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(java.lang.Long.valueOf(1L), "some words"),
        Row(java.lang.Long.valueOf(2L), null),
        Row(java.lang.Long.valueOf(3L), "   ")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField(
          "text", org.apache.spark.sql.types.StringType))))
    val out = Classifier.score(model, scoreInput, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L))
  }

  test("classifier score fraction constraint passes and fails as declared") {
    import graft.requirements.WithinRequirement
    val df = corpus
    val model = Classifier.train(
      df, "text", "doc_id", "label", nBuckets = 512, nIters = 30,
      learningRate = 1.0)
    // half the corpus is high-quality: >= 0.45 above 0.5 passes, 0.9 fails
    val ok = WithinRequirement.fromDataFrame(df, "corpus")
    ok.addMinClassifierScoreFractionConstraint(
      "text", "doc_id", model, scoreThreshold = 0.5, minFraction = 0.45)
    assert(ok.test(spark).head.outcome)
    val bad = WithinRequirement.fromDataFrame(df, "corpus")
    bad.addMinClassifierScoreFractionConstraint(
      "text", "doc_id", model, scoreThreshold = 0.5, minFraction = 0.9)
    val res = bad.test(spark).head
    assert(!res.outcome)
    assert(res.failureMessage.exists(_.contains("classifier")))
  }
}
