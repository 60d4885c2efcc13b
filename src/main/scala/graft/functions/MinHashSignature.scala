package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native codegen'd MinHash signature over a shingle (string) array.
  *
  * Bit-identical to the declarative form
  * `array(i -> array_min(transform(transform(shingles, s -> xxhash64(s)),
  * h -> xxhash64(i, h))))`: per shingle one `XXH64.hashUTF8String(s, 42)`
  * (what Spark's `xxhash64(s)` computes), then per hash function the
  * two-input chain `xxhash64(lit(i), h)` = `hashLong(h, hashInt(i, 42))`
  * with the per-`i` inner seeds precomputed once.
  *
  * The declarative form dispatches `numHashes` interpreted lambda
  * evaluations per ELEMENT (the dominant cost of MinHash+LSH dedup in the
  * round-1 bench); this compiles to a two-level primitive loop inside
  * WholeStageCodegen — the same treatment `DotProductFloat` gives the
  * embedding dot product.
  *
  * Empty input arrays yield `Long.MaxValue` sentinels, and NULL elements
  * are skipped (the declarative spelling instead folds a NULL through the
  * hash chain, yielding the seed) — neither shape is producible by the
  * shingle/token builders, which emit null-free arrays; the bit-identical
  * claim is for those arrays.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"minhash_signature expects array<string> (raw shingles) or " +
          s"array<bigint> (precomputed xxhash64 base hashes), got ${other.simpleString}")
  }

  /** String input hashes each element with `xxhash64(s)` first; long input is
    * taken as those base hashes directly (the two spellings agree:
    * `minhash_signature(shingles) == minhash_signature(transform(shingles,
    * xxhash64))`, in any element order — min is order-invariant).
    */
  private def fromStrings: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == StringType

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  // xxhash64(lit(i), h) == hashLong(h, hashInt(i, seed=42)); the per-i inner
  // seed is row-constant, so precompute it once for the whole query
  private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  override def nullSafeEval(input: Any): Any = {
    val arr  = input.asInstanceOf[ArrayData]
    val n    = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val strings = fromStrings
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val base =
          if (strings) XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
          else arr.getLong(j)
        var i = 0
        while (i < numHashes) {
          val v = XXH64.hashLong(base, seeds(i))
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("seeds", seeds, "long[]")
    val xxh      = classOf[XXH64].getName
    nullSafeCodeGen(ctx, ev, a => {
      val n    = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val j    = ctx.freshName("j")
      val i    = ctx.freshName("i")
      val base = ctx.freshName("base")
      val v    = ctx.freshName("v")
      val baseExpr =
        if (fromStrings) s"$xxh.hashUTF8String($a.getUTF8String($j), 42L)"
        else s"$a.getLong($j)"
      s"""
         |int $n = $a.numElements();
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$a.isNullAt($j)) {
         |    long $base = $baseExpr;
         |    for (int $i = 0; $i < $numHashes; $i++) {
         |      long $v = $xxh.hashLong($base, $seedsRef[$i]);
         |      if ($v < $mins[$i]) $mins[$i] = $v;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {

  /** Column API: MinHash signature (`numHashes` longs) of a shingle array. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    GraftBridge.toColumn(
      MinHashSignature(GraftBridge.toExpression(shingles), numHashes))
}
