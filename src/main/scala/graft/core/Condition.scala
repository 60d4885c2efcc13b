package graft.core

/** Immutable filter tree over raw Spark-SQL predicate strings.
  *
  * Mirrors the reference's `Condition` (datajudge `src/datajudge/condition.py:7-73`):
  * an atomic node wraps a raw predicate string (e.g. `"col_int > 10"`); a
  * composite node AND/OR-joins children with parenthesised rendering. The
  * rendered string is parsed by Spark's `expr()`, giving Catalyst a fully
  * declarative predicate it can push down to the parquet scan.
  */
sealed trait Condition {
  def render: String

  def and(other: Condition): Condition = Condition.and(this, other)
  def or(other: Condition): Condition = Condition.or(this, other)

  override def toString: String = render
}

object Condition {

  final case class Raw(rawString: String) extends Condition {
    require(rawString.trim.nonEmpty, "Raw condition must be non-empty")
    override def render: String = rawString
  }

  final case class Composite(reductionOperator: String, conditions: Seq[Condition])
      extends Condition {
    require(
      reductionOperator == "AND" || reductionOperator == "OR",
      s"Reduction operator must be AND or OR, got $reductionOperator")
    require(conditions.nonEmpty, "Composite condition needs children")
    override def render: String =
      conditions.map(c => s"(${c.render})").mkString(s" $reductionOperator ")
  }

  def raw(s: String): Condition = Raw(s)

  def and(cs: Condition*): Condition =
    if (cs.lengthCompare(1) == 0) cs.head else Composite("AND", cs)

  def or(cs: Condition*): Condition =
    if (cs.lengthCompare(1) == 0) cs.head else Composite("OR", cs)

  /** AND-merge two optional conditions (reference `db_access.py:212-221`). */
  def merge(a: Option[Condition], b: Option[Condition]): Option[Condition] =
    (a, b) match {
      case (Some(x), Some(y)) => Some(and(x, y))
      case _                  => a.orElse(b)
    }
}
