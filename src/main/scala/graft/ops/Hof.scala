package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Helpers for higher-order column functions. */
object Hof {

  /** Evaluate `c` ONCE per row and expose the result to `f` as a bound
    * lambda variable.
    *
    * Inside an HOF lambda, a reference to an outer column expression is
    * re-evaluated on EVERY element (the interpreted HOF path has no common
    * subexpression elimination), so e.g. shingling a regex-normalized text
    * re-runs the regexes once per shingle position — a 100× slowdown on
    * long documents. Wrapping the expensive expression as the single
    * element of an array and lambda-binding it forces one evaluation per
    * row.
    */
  def bound(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), v => f(v)), 1)
}
