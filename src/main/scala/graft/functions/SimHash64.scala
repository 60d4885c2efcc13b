package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native codegen'd 64-bit SimHash of a token array: per bit, sum +1/−1
  * votes over `xxhash64(token)` values (seed 42, matching Spark's builtin),
  * take the sign.
  *
  * Bit-identical to both declarative spellings in `Dedup` — the interpreted
  * HOF fold and the explode → 64-column HashAggregate plan — but with NO
  * shuffle at all: the sketch is one projection over the corpus scan. The
  * round-1 plan exploded every token and shuffled them back on doc id just
  * to sum votes the row already had locally. NULL elements are skipped
  * (unreachable from the token builders, which emit null-free arrays; the
  * declarative spellings disagree with each other on that shape).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | ArrayType(StringType, _) | ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"simhash64 expects string (normalized text — tokens split in the " +
          s"scan), array<string> (tokens) or array<bigint> (precomputed " +
          s"token hashes), got ${other.simpleString}")
  }

  /** Three flavors: bare string input tokenizes on spaces INSIDE the scan
    * and hashes each token's byte range (the fused fast path — equivalent to
    * `simhash64(split(s, " "))` because Spark's split yields `[""]` for an
    * empty string, mirrored by the empty-token vote); array<string> hashes
    * each token with `xxhash64`; array<bigint> votes over the given hashes
    * directly (backing hash-agnostic variants, e.g. the md5 oracle).
    */
  private def fromText: Boolean = child.dataType == StringType

  private def fromStrings: Boolean = child.dataType match {
    case ArrayType(StringType, _) => true
    case _                        => false
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    if (fromText) SimHash64.sketchText(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    else {
      val arr     = input.asInstanceOf[ArrayData]
      val n       = arr.numElements()
      val strings = fromStrings
      val votes   = new Array[Int](64)
      var j = 0
      while (j < n) {
        if (!arr.isNullAt(j)) {
          val h =
            if (strings) XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
            else arr.getLong(j)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        j += 1
      }
      SimHash64.signBits(votes)
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (fromText)
      return nullSafeCodeGen(ctx, ev, s => {
        s"${ev.value} = graft.functions.SimHash64.sketchText($s);"
      })
    val xxh = classOf[XXH64].getName
    nullSafeCodeGen(ctx, ev, a => {
      val n      = ctx.freshName("n")
      val votes  = ctx.freshName("votes")
      val j      = ctx.freshName("j")
      val b      = ctx.freshName("b")
      val h      = ctx.freshName("h")
      val sketch = ctx.freshName("sketch")
      val hExpr =
        if (fromStrings) s"$xxh.hashUTF8String($a.getUTF8String($j), 42L)"
        else s"$a.getLong($j)"
      s"""
         |int $n = $a.numElements();
         |int[] $votes = new int[64];
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$a.isNullAt($j)) {
         |    long $h = $hExpr;
         |    for (int $b = 0; $b < 64; $b++) {
         |      if ((($h >>> $b) & 1L) == 1L) { $votes[$b]++; } else { $votes[$b]--; }
         |    }
         |  }
         |}
         |long $sketch = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $sketch |= (1L << $b);
         |}
         |${ev.value} = $sketch;
       """.stripMargin
    })
  }

  // sketch/h/votes freshnames above stay scoped to the array flavor

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  private[functions] def signBits(votes: Array[Int]): Long = {
    var sketch = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sketch |= (1L << b)
      b += 1
    }
    sketch
  }

  /** Fused text flavor: tokenize on spaces inside the scan, hashing each
    * token's byte range — no token string allocation. Public static so
    * generated code calls it directly. Exact `split(s, " ")` parity: every
    * delimiter-separated segment votes, empty segments included (split
    * yields `[""]` for the empty string and keeps interior/trailing empties)
    * — on `NormalizeText` output the only possible empty segment is the
    * all-empty case.
    */
  def sketchText(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val base   = s.getBaseObject
    val offset = s.getBaseOffset
    val n      = s.numBytes()
    val votes  = new Array[Int](64)
    var start  = 0
    var i      = 0
    while (i <= n) {
      if (i == n ||
        org.apache.spark.unsafe.Platform.getByte(base, offset + i) == ' ') {
        val h = XXH64.hashUnsafeBytes(base, offset + start, i - start, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        start = i + 1
      }
      i += 1
    }
    signBits(votes)
  }

  /** Column API: 64-bit SimHash of a normalized text column (fused
    * tokenize+sketch), an `array<string>` token column, or an
    * `array<bigint>` of precomputed token hashes.
    */
  def simhash64(tokens: Column): Column =
    GraftBridge.toColumn(SimHash64(GraftBridge.toExpression(tokens)))
}
