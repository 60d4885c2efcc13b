package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sorted distinct `xxhash64` values of a string's character k-shingles in
  * one pass — the document representation `Dedup.minhashed` /
  * `ngramJaccardPairs` verify Jaccard on.
  *
  * Equivalent to
  * `sort_array(transform(array_distinct(charShingles(s, k)), x => xxhash64(x)))`
  * up to vanishing hash-collision probability (dedup on the 64-bit hash
  * instead of the string; min/Jaccard consumers are set-based, so order of
  * dedup vs hash is immaterial). Each window is hashed directly from the
  * input's byte range — zero per-shingle allocation, versus one substring
  * string + one hash-set entry per position on the HOF path. Intended for
  * the output of `NormalizeText` (pure ASCII, byte == character); for
  * multi-byte inputs windows are byte-based rather than character-based.
  */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0, s"shingle size must be positive, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      ShingleHashes.sortedDistinctHashes(input.asInstanceOf[UTF8String], k))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.ShingleHashes.sortedDistinctHashes($s, $k));""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  /** The scan kernel; public static so generated code calls it directly. */
  def sortedDistinctHashes(s: UTF8String, k: Int): Array[Long] = {
    val base   = s.getBaseObject
    val offset = s.getBaseOffset
    val n      = s.numBytes()
    val count  = n - k + 1
    if (count <= 0) return Array.emptyLongArray
    val hashes = new Array[Long](count)
    var i = 0
    while (i < count) {
      hashes(i) = XXH64.hashUnsafeBytes(base, offset + i, k, 42L)
      i += 1
    }
    java.util.Arrays.sort(hashes)
    // in-place unique over the sorted run
    var w = 1
    i = 1
    while (i < count) {
      if (hashes(i) != hashes(w - 1)) { hashes(w) = hashes(i); w += 1 }
      i += 1
    }
    if (w == count) hashes else java.util.Arrays.copyOf(hashes, w)
  }

  /** Column API: sorted distinct shingle hashes of a string column. */
  def shingleHashes(text: Column, k: Int): Column =
    GraftBridge.toColumn(ShingleHashes(GraftBridge.toExpression(text), k))
}
