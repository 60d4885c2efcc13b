package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._

/** SQL-surface registration for the engine's codegen'd Catalyst kernels:
  * inject via `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) so `spark.sql` users can call
  * them directly — `SELECT minhash_signature(shingle_hashes(text, 5), 64)
  * FROM docs` — with the exact expressions the DataFrame operators compile
  * to (same codegen, same semantics, pinned by `ExtensionsSpec`).
  * `GraftExtensions.register(spark)` adds the same functions to an
  * already-built session (test/notebook convenience).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft.functions", null, name, usage, "")

  /** (name, info, builder) for every SQL-registrable kernel. Kernels whose
    * parameters are whole literal matrices (`plane_sign_bits`,
    * `bucket_index`) stay DataFrame-only — their parameter shape has no SQL
    * literal spelling.
    */
  private[graft] val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      ("normalize_text",
        info("normalize_text",
          "_FUNC_(str) - lowercase, strip non-alphanumerics, collapse blanks (single byte scan)"),
        (args: Seq[Expression]) => NormalizeText(args.head)),
      ("shingle_hashes",
        info("shingle_hashes",
          "_FUNC_(str, k) - sorted distinct xxhash64 values of all k-char shingles"),
        (args: Seq[Expression]) =>
          ShingleHashes(args.head, intLit(args(1), "shingle_hashes", "k"))),
      ("strided_hashes",
        info("strided_hashes",
          "_FUNC_(str, n, stride) - distinct xxhash64 values of n-char windows every stride chars"),
        (args: Seq[Expression]) =>
          StridedHashes(
            args.head,
            intLit(args(1), "strided_hashes", "n"),
            intLit(args(2), "strided_hashes", "stride"))),
      ("winnow_hashes",
        info("winnow_hashes",
          "_FUNC_(str, k, w) - sorted distinct winnowing fingerprints (window-min of k-char shingle hashes over windows of w)"),
        (args: Seq[Expression]) =>
          WinnowHashes(
            args.head,
            intLit(args(1), "winnow_hashes", "k"),
            intLit(args(2), "winnow_hashes", "w"))),
      ("minhash_signature",
        info("minhash_signature",
          "_FUNC_(hashes, n) - n-hash MinHash signature of a sorted shingle-hash array"),
        (args: Seq[Expression]) =>
          MinHashSignature(args.head, intLit(args(1), "minhash_signature", "n"))),
      ("jaccard_sorted_long",
        info("jaccard_sorted_long",
          "_FUNC_(a, b) - exact Jaccard of two SORTED bigint arrays (two-pointer merge)"),
        (args: Seq[Expression]) => JaccardSortedLong(args.head, args(1))),
      ("matching_fraction_long",
        info("matching_fraction_long",
          "_FUNC_(a, b) - fraction of equal positions in two equal-length bigint arrays"),
        (args: Seq[Expression]) => MatchingFractionLong(args.head, args(1))),
      ("dot_product_float",
        info("dot_product_float",
          "_FUNC_(a, b) - double-accumulated dot product of two float arrays"),
        (args: Seq[Expression]) => DotProductFloat(args.head, args(1))),
      ("simhash64",
        info("simhash64",
          "_FUNC_(tokens) - 64-bit SimHash of a token array (per-bit vote)"),
        (args: Seq[Expression]) => SimHash64(args.head)))

  /** Register the same functions into an existing session (the extension
    * path requires them at session build time).
    */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
}
