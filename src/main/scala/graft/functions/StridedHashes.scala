package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct `xxhash64` values of a string's STRIDED n-char windows in one
  * pass — the coarse candidate keys `Dedup.ngramJaccardPairs` explodes
  * (one window every `stride` characters, versus [[ShingleHashes]]'s
  * every-position fine shingles).
  *
  * Bit-identical to the declarative chain it replaces —
  * `array_distinct(transform(filter(transform(sequence(0, len-n, stride),
  * i => substr(i+1, n)), len == n), xxhash64))` — because
  * `XXH64.hashUnsafeBytes(base, offset+i, n, 42L)` over the input's byte
  * range equals `xxhash64` of the materialized substring (same bytes,
  * same seed). The win is constant-factor but large: no per-window
  * substring copy, no per-element Catalyst eval — one scan of the bytes.
  * Intended for `NormalizeText` output (pure ASCII, byte == character).
  */
case class StridedHashes(child: Expression, n: Int, stride: Int)
    extends UnaryExpression {

  require(n > 0, s"window size must be positive, got $n")
  require(stride > 0, s"stride must be positive, got $stride")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"strided_hashes expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "strided_hashes"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      StridedHashes.distinctHashes(input.asInstanceOf[UTF8String], n, stride))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.StridedHashes.distinctHashes($s, $n, $stride));""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): StridedHashes =
    copy(child = newChild)
}

object StridedHashes {

  /** The scan kernel; public static so generated code calls it directly. */
  def distinctHashes(s: UTF8String, n: Int, stride: Int): Array[Long] = {
    val base   = s.getBaseObject
    val offset = s.getBaseOffset
    val len    = s.numBytes()
    val last   = len - n // last valid window start
    if (last < 0) return Array.emptyLongArray
    val count  = last / stride + 1
    val hashes = new Array[Long](count)
    var i = 0
    var w = 0
    while (i <= last) {
      hashes(w) = XXH64.hashUnsafeBytes(base, offset + i, n, 42L)
      w += 1
      i += stride
    }
    java.util.Arrays.sort(hashes)
    // in-place unique over the sorted run (dedup on the 64-bit hash — the
    // consumer explodes into an equi-join key, so order is immaterial and
    // a collision can only ADD a candidate, never drop one)
    var r = 1
    w = 1
    while (r < count) {
      if (hashes(r) != hashes(w - 1)) { hashes(w) = hashes(r); w += 1 }
      r += 1
    }
    if (w == count) hashes else java.util.Arrays.copyOf(hashes, w)
  }

  /** Column API: distinct strided window hashes of a string column. */
  def stridedHashes(text: Column, n: Int, stride: Int): Column =
    GraftBridge.toColumn(StridedHashes(GraftBridge.toExpression(text), n, stride))
}
