package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-value histogram of a string in ONE O(n) scan: the sorted array of
  * (byte value, count) pairs over the string's UTF-8 bytes — the primitive
  * behind entropy/compressibility quality signals ([[graft.ops
  * .TextAnalysis.charEntropy]]). A declarative spelling needs a per-row
  * character explode + regroup (corpus-character-count shuffle rows); this
  * kernel keeps the whole histogram in a 256-slot stack array per row.
  * Intended for [[NormalizeText]] output (ASCII: byte == character), but
  * total for any input — multi-byte code points count as their UTF-8
  * bytes, deterministically.
  */
case class CharHistogram(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"char_histogram expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("c", IntegerType, nullable = false),
      StructField("n", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "char_histogram"

  override def nullSafeEval(input: Any): Any =
    CharHistogram.histogram(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""${ev.value} = graft.functions.CharHistogram.histogram($s);""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharHistogram =
    copy(child = newChild)
}

object CharHistogram {

  /** The scan kernel; public static so generated code calls it directly. */
  def histogram(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val counts = new Array[Long](256)
    var i = 0
    while (i < bytes.length) {
      counts(bytes(i) & 0xFF) += 1
      i += 1
    }
    var nonZero = 0
    i = 0
    while (i < 256) { if (counts(i) != 0) nonZero += 1; i += 1 }
    val rows = new Array[Any](nonZero)
    var w = 0
    i = 0
    while (i < 256) {
      if (counts(i) != 0) {
        rows(w) = org.apache.spark.sql.catalyst.InternalRow(i, counts(i))
        w += 1
      }
      i += 1
    }
    new GenericArrayData(rows)
  }

  /** Column API: sorted (byte, count) histogram of a string column. */
  def charHistogram(text: Column): Column =
    GraftBridge.toColumn(CharHistogram(GraftBridge.toExpression(text)))
}
