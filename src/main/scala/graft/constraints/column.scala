package graft.constraints

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.DataType

import graft.core.{DataRef, TestResult}
import graft.ops.Ops

/** Column-name constraints (reference `constraints/column.py:11-66`):
  * retrieval = reflected column-name list of the source.
  */
sealed abstract class ColumnNames extends ValueConstraint[Seq[String]] {
  override protected def retrieve(spark: SparkSession, r: DataRef): Seq[String] =
    Ops.getColumnNames(spark, r)
}

/** All given columns exist on the source (reference `column.py:24-42`). */
final case class ColumnExistence(
    ref: DataRef,
    requiredColumns: Seq[String],
    override val nameOverride: Option[String] = None)
    extends ColumnNames {
  override def ref2: Option[DataRef] = None
  override def refValue: Option[Seq[String]] = Some(requiredColumns)
  override protected def compare(
      factual: Seq[String],
      target: Seq[String]): (Boolean, Option[String]) = {
    val excluded = target.filterNot(factual.contains)
    (excluded.isEmpty,
      Some(s"${ref.describe} doesn't have column(s) ${excluded.mkString(", ")}."))
  }
}

/** ref's columns ⊆ ref2's columns (reference `column.py:45-54`). */
final case class ColumnSubset(
    ref: DataRef,
    ref2Required: DataRef,
    override val nameOverride: Option[String] = None)
    extends ColumnNames {
  override def ref2: Option[DataRef] = Some(ref2Required)
  override def refValue: Option[Seq[String]] = None
  override protected def compare(
      factual: Seq[String],
      target: Seq[String]): (Boolean, Option[String]) = {
    val missing = factual.filterNot(target.contains)
    (missing.isEmpty,
      Some(s"${ref2Required.describe} doesn't have column(s) ${missing.mkString(", ")}."))
  }
}

/** ref's columns ⊇ ref2's columns (reference `column.py:57-66`). */
final case class ColumnSuperset(
    ref: DataRef,
    ref2Required: DataRef,
    override val nameOverride: Option[String] = None)
    extends ColumnNames {
  override def ref2: Option[DataRef] = Some(ref2Required)
  override def refValue: Option[Seq[String]] = None
  override protected def compare(
      factual: Seq[String],
      target: Seq[String]): (Boolean, Option[String]) = {
    val missing = target.filterNot(factual.contains)
    (missing.isEmpty,
      Some(s"${ref.describe} doesn't have column(s) ${missing.mkString(", ")}."))
  }
}

/** Reflected type vs string prefix or a Spark DataType
  * (reference `column.py:69-116`). String matching runs over
  * `DataType.simpleString` (e.g. "bigint", "decimal(38,0)"); giving a
  * `DataType` compares class equality (the Spark analogue of the
  * reference's generic-type `isinstance`).
  */
final case class ColumnType(
    ref: DataRef,
    ref2: Option[DataRef] = None,
    expectedTypeString: Option[String] = None,
    expectedType: Option[DataType] = None,
    override val nameOverride: Option[String] = None)
    extends Constraint {
  require(
    Seq(ref2.isDefined, expectedTypeString.isDefined, expectedType.isDefined).count(identity) == 1,
    "Exactly one of ref2, expectedTypeString, expectedType must be given.")

  override def test(spark: SparkSession): TestResult = withPlans {
    val factual = Ops.getColumnType(spark, ref)
    val (ok, targetDescription) = (ref2, expectedTypeString, expectedType) match {
      case (Some(r2), _, _) =>
        val t = Ops.getColumnType(spark, r2)
        (factual == t, t.simpleString)
      case (_, Some(s), _) =>
        (factual.simpleString.toLowerCase.startsWith(s.toLowerCase), s)
      case (_, _, Some(t)) =>
        (factual.getClass == t.getClass, t.simpleString)
      case _ => throw new IllegalStateException
    }
    if (ok) TestResult.success(description)
    else
      TestResult.failure(
        description,
        s"${ref.describe} is ${factual.simpleString} instead of $targetDescription.")
  }
}
