package graft.constraints

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

import graft.core.{DataRef, TestResult}

/** A tolerance that may be derived at test time (e.g. from date-range growth
  * between two sources) — reference `_ToleranceGetter`
  * (`constraints/base.py`, used by `requirements.py:1368-1394`).
  */
object types {
  type ToleranceGetter = SparkSession => Double
}

/** Base for all constraints (reference `constraints/base.py:104-299`).
  *
  * A constraint compares a *factual* value retrieved from `ref` against a
  * *target*: either a literal (`refValue`, "within" constraints) or the same
  * retrieval run on `ref2` ("between" constraints). Retrieval results are
  * memoized per SparkSession (the reference's per-instance `lru_cache`,
  * `base.py:160-171`) so repeated `test` calls don't re-trigger Spark jobs.
  */
abstract class Constraint {
  def ref: DataRef
  def nameOverride: Option[String] = None

  def name: String = nameOverride.getOrElse(getClass.getSimpleName.stripSuffix("$"))

  /** Test id, mirroring the reference's `ClassName::datasource` convention
    * (`base.py:204-217`).
    */
  def description: String = s"$name::${ref.name}"

  protected def conditionString: String =
    ref.condition.map(c => s"Condition: ${c.render}. ").getOrElse("")

  def test(spark: SparkSession): TestResult
}

/** Common case: factual and target share a type; target is a literal or the
  * same retrieval against `ref2`. Exactly one of `ref2` / `refValue` must be
  * given (reference `base.py:174-190`).
  */
abstract class ValueConstraint[A] extends Constraint {
  def ref2: Option[DataRef]
  def refValue: Option[A]

  require(
    ref2.isDefined != refValue.isDefined,
    s"Exactly one of ref2 and refValue must be given for $name (ref2=$ref2, refValue=$refValue)")

  private val memo = TrieMap.empty[(Int, Boolean), A]

  protected def retrieve(spark: SparkSession, r: DataRef): A

  protected final def factual(spark: SparkSession): A =
    memo.getOrElseUpdate((System.identityHashCode(spark), true), retrieve(spark, ref))

  protected final def target(spark: SparkSession): A =
    refValue.getOrElse(
      memo.getOrElseUpdate((System.identityHashCode(spark), false), retrieve(spark, ref2.get)))

  protected final def targetPrefix: String =
    ref2.map(r => s"${r.describe}'s ").getOrElse("")

  /** (holds, assertionText) — the text is used only on failure. */
  protected def compare(factual: A, target: A): (Boolean, Option[String])

  override def test(spark: SparkSession): TestResult = {
    val (ok, msg) = compare(factual(spark), target(spark))
    if (ok) TestResult.success(description)
    else TestResult.failure(description, msg.getOrElse("(no details)"))
  }
}

object formatting {

  /** Bound a displayed collection (reference `output_processor_limit`,
    * `utils.py:98-122`, default 100).
    */
  def limited[A](values: Iterable[A], limit: Int = 100): String = {
    val list = values.toList
    val head = list.take(limit).mkString(", ")
    if (list.sizeIs > limit)
      s"$head, <SHORTENED OUTPUT, displaying the first $limit / ${list.size} elements above>"
    else head
  }

  /** Sort values by descending count, ties by value string — the reference's
    * `output_processor_sort` (`utils.py:output_processor_sort`).
    */
  def sortedByCount[A](values: Seq[A], counts: Seq[Long]): (Seq[A], Seq[Long]) = {
    val sorted = values.zip(counts).sortBy { case (v, c) => (-c, String.valueOf(v)) }
    (sorted.map(_._1), sorted.map(_._2))
  }

  /** Render a sample row (reference `_format_sample`, `base.py`). */
  def formatSample(sample: Option[org.apache.spark.sql.Row]): String =
    sample.map(_.toString).getOrElse("<no sample>")
}
