package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints (Schleimer, Wilkerson, Aiken — "Winnowing: Local
  * Algorithms for Document Fingerprinting", SIGMOD 2003): the sorted
  * distinct set of window-minimum `xxhash64` values over the string's
  * k-char shingles, one minimum per window of `w` consecutive shingle
  * hashes. The winnowing guarantee: two documents sharing any substring of
  * at least `k + w - 1` characters share at least one fingerprint — the
  * position-robust exact-substring-contamination signal that whole-document
  * MinHash Jaccard cannot see (a paragraph lifted into an otherwise
  * unrelated document moves Jaccard barely, but always leaves a common
  * fingerprint here).
  *
  * Selection is VALUE-set semantics: because every window's minimum VALUE
  * is unique regardless of which tied position a selector picks, the
  * fingerprint set is independent of the paper's rightmost-tie rule, so a
  * declarative re-derivation (window-min over per-shingle hashes) is
  * bit-identical — that is what the DuckDB oracle and the HOF parity spec
  * pin. Documents with fewer than `w` shingles degrade to their single
  * global minimum (the [[graft.ops.TextAnalysis.minShingleHash]] value).
  *
  * One O(n) byte scan: shingle hashes are computed in place
  * (`XXH64.hashUnsafeBytes` over the input's byte range, seed 42 — equal to
  * `xxhash64` of the materialized substring) and the sliding minimum uses
  * the classic monotonically-increasing index deque, so each position is
  * pushed and popped at most once. Intended for [[NormalizeText]] output
  * (pure ASCII, byte == character).
  */
case class WinnowHashes(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k > 0, s"shingle size must be positive, got $k")
  require(w > 0, s"winnow window must be positive, got $w")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"winnow_hashes expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_hashes"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      WinnowHashes.fingerprints(input.asInstanceOf[UTF8String], k, w))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.WinnowHashes.fingerprints($s, $k, $w));""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowHashes =
    copy(child = newChild)
}

object WinnowHashes {

  /** The scan kernel; public static so generated code calls it directly. */
  def fingerprints(s: UTF8String, k: Int, w: Int): Array[Long] = {
    val base   = s.getBaseObject
    val offset = s.getBaseOffset
    val n      = s.numBytes()
    val m      = n - k + 1 // number of shingles
    if (m <= 0) return Array.emptyLongArray
    val hashes = new Array[Long](m)
    var i = 0
    while (i < m) {
      hashes(i) = XXH64.hashUnsafeBytes(base, offset + i, k, 42L)
      i += 1
    }
    if (m <= w) {
      // short document: one window covering everything -> global minimum
      var min = hashes(0)
      i = 1
      while (i < m) { if (hashes(i) < min) min = hashes(i); i += 1 }
      return Array(min)
    }
    // sliding-window minimum over windows [i, i+w-1], i in [0, m-w]:
    // deque of indices with strictly increasing hash values; the front is
    // the current window's minimum. Consecutive windows usually share their
    // minimum, so selections are appended only when the front value changes.
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0 // exclusive
    val selected = new Array[Long](m - w + 1)
    var nSel = 0
    i = 0
    while (i < m) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val min = hashes(deque(head))
        if (nSel == 0 || selected(nSel - 1) != min) {
          selected(nSel) = min
          nSel += 1
        }
      }
      i += 1
    }
    val run = java.util.Arrays.copyOf(selected, nSel)
    java.util.Arrays.sort(run)
    // in-place unique over the sorted run (a value can repeat in
    // non-adjacent windows; the fingerprint is a set)
    var wr = 1
    i = 1
    while (i < nSel) {
      if (run(i) != run(wr - 1)) { run(wr) = run(i); wr += 1 }
      i += 1
    }
    if (wr == nSel) run else java.util.Arrays.copyOf(run, wr)
  }

  /** Column API: sorted distinct winnowing fingerprints of a string column. */
  def winnowHashes(text: Column, k: Int, w: Int): Column =
    GraftBridge.toColumn(WinnowHashes(GraftBridge.toExpression(text), k, w))
}
