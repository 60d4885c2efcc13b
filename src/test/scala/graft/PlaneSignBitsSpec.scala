package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PlaneSignBits.planeSignBits
import graft.ops.Similarity

/** Native multi-plane sign-bit kernel: bit-identical to the declarative HOF
  * spelling (per-plane `when(dot > 0, 1L << i).otherwise(0L)` sum), including
  * the degenerate inputs the HOF null-poisons to 0.
  */
class PlaneSignBitsSpec extends AnyFunSuite {
  import TestSpark._

  private val planes = Similarity.hyperplanes(bits = 8, dim = 64)

  test("native key equals HOF key bit-for-bit on real embeddings") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val both = df
      .select(
        planeSignBits(col("embedding"), planes).as("native"),
        Similarity.lshKeyHof(col("embedding"), planes).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("degenerate inputs match the HOF null-poison semantics (all → 0)") {
    val schema = StructType(Seq(
      StructField("embedding", ArrayType(FloatType, containsNull = true), nullable = true)))
    val rows = Seq(
      Row(null),                                       // NULL vector
      Row(Seq.fill(10)(1.0f)),                         // wrong dimension
      Row(Seq.fill(64)(1.0f).updated(7, null)),        // NULL element
      Row(Seq.empty[Float]))                           // empty vector
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map {
        case Row(null)            => Row(null)
        case Row(s: Seq[_])       => Row(s)
      }), schema)
    val got = df
      .select(
        planeSignBits(col("embedding"), planes).as("native"),
        coalesce(Similarity.lshKeyHof(col("embedding"), planes), lit(0L)).as("hof"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(0) == 0L, s"native: expected 0 for degenerate input, got ${r.getLong(0)}")
      assert(r.getLong(0) == r.getLong(1))
    }
  }

  test("type check rejects non-float arrays") {
    val df = spark.range(1).select(array(lit(1.0), lit(2.0)).as("d"))
    val e = intercept[Exception](df.select(planeSignBits(col("d"), planes)).head())
    assert(e.getMessage.toLowerCase.contains("plane_sign_bits") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("expression participates in whole-stage codegen") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = df.select(planeSignBits(col("embedding"), planes).as("b"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("plane_sign_bits"), plan)
    assert(plan.contains("*"), s"no WholeStageCodegen span:\n$plan")
  }

  test("semantically equal keys canonicalize equal (Seq planes, CSE-friendly)") {
    // share the child: Column origins carry stack traces, which is the
    // resolver's concern — this pins that the PLANES field compares by
    // content across Seq implementations
    val child = org.apache.spark.sql.GraftBridge.toExpression(col("embedding"))
    val a = graft.functions.PlaneSignBits(child, planes.map(_.toVector).toVector)
    val b = graft.functions.PlaneSignBits(child, planes.map(_.toList).toList)
    assert(a == b && a.hashCode == b.hashCode)
  }
}
