package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DotProductFloat.dotF
import graft.ops.Similarity

/** Native codegen'd dot product: correctness vs the HOF fold (bit-identical
  * accumulation) and presence in a codegen'd projection.
  */
class DotProductSpec extends AnyFunSuite {
  import TestSpark._

  test("native dot equals HOF dot bit-for-bit on real embeddings") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val both = df.as("a").join(df.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .limit(500)
      .select(
        dotF(col("a.embedding"), col("b.embedding")).as("native"),
        Similarity.dot(col("a.embedding"), col("b.embedding")).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("type check rejects non-float arrays") {
    val df = spark.range(1).select(array(lit(1.0), lit(2.0)).as("d"))
    val e = intercept[Exception](df.select(dotF(col("d"), col("d"))).head())
    assert(e.getMessage.toLowerCase.contains("dot_product_float") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("expression participates in whole-stage codegen") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = df.select(dotF(col("embedding"), col("embedding")).as("d"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("dot_product_float"), plan)
    assert(plan.contains("*"), s"no WholeStageCodegen span:\n$plan") // codegen'd stages are starred
  }
}
