package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `conv(substring(md5(s cast binary), 1, hexDigits), 16, 10) cast long`
  * as ONE codegen'd expression — the md5-lattice convention every
  * oracle-recomputable uniform/bucket in this repo spells (Dsir
  * hashUniform / bucketOf, bootstrapMeanCI replicate weights). The SQL
  * chain renders a 32-char hex string, substrings it, converts through a
  * decimal STRING and parses that back to a long — four allocations and
  * two parses per row that exist only to extract the digest's first
  * `hexDigits·4` bits. This expression digests the UTF-8 bytes and reads
  * the prefix directly off the digest array: bit-identical values
  * (md5 hex is the big-endian nibble rendering of the digest, so the
  * first k hex digits ARE the first ⌈k/2⌉ bytes, high nibble first).
  *
  * `hexDigits` ≤ 15 so the value fits a signed long (≤ 60 bits).
  */
object Md5Lattice {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First `hexDigits` hex digits of md5(bytes of `s`) as a long. */
  def compute(s: UTF8String, hexDigits: Int): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < hexDigits) {
      val b = d(i >> 1) & 0xFF
      val nibble = if ((i & 1) == 0) b >>> 4 else b & 0xF
      v = (v << 4) | nibble
      i += 1
    }
    v
  }

  def md5PrefixLong(c: Column, hexDigits: Int): Column =
    GraftBridge.toColumn(Md5PrefixLong(GraftBridge.toExpression(c), hexDigits))
}

case class Md5PrefixLong(child: Expression, hexDigits: Int)
    extends UnaryExpression {

  require(hexDigits >= 1 && hexDigits <= 15,
    s"hexDigits must be in [1, 15] to fit a signed long: $hexDigits")

  override def prettyName: String = "md5_prefix_long"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    Md5Lattice.compute(input.asInstanceOf[UTF8String], hexDigits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5Lattice.compute($c, $hexDigits)")

  override protected def withNewChildInternal(
      newChild: Expression): Md5PrefixLong = copy(child = newChild)
}
