package graft.core

import scala.collection.mutable

import org.apache.spark.sql.DataFrame

/** Thread-local recorder wiring retrieval plans into failing TestResults —
  * the Spark analogue of the reference attaching each retrieval's compiled
  * SQL to its TestResult (datajudge `constraints/base.py:256-293`, where
  * `_retrieve` returns the selections and `test` compiles them on failure).
  *
  * Every retrieval flows through `DataRef.selection`, which reports its
  * DataFrame here; a constraint's `test` runs inside `capturing { ... }` and
  * receives the optimized-plan strings of every selection it touched. When
  * no capture is active (Verify/Bench call operators directly), `record` is
  * a no-op — plans are only rendered for constraint failures.
  */
object PlanCapture {

  private val active =
    new ThreadLocal[List[mutable.Buffer[org.apache.spark.sql.execution.QueryExecution]]] {
      override def initialValue(): List[mutable.Buffer[org.apache.spark.sql.execution.QueryExecution]] =
        Nil
    }

  /** Called by `DataRef.selection` for every retrieval plan it builds.
    * Records into EVERY active capture (captures nest: a memoizing retrieval
    * captures for its cache entry while the surrounding `test` captures for
    * the failure message). Only the lazy `QueryExecution` handle is stored —
    * optimization and stringification happen on the failure path alone
    * (`render`), so passing tests pay nothing.
    */
  def record(df: DataFrame): Unit = {
    val buffers = active.get()
    if (buffers.nonEmpty) {
      val qe = df.queryExecution
      buffers.foreach(_ += qe)
    }
  }

  /** Run `body`, returning its result plus the query executions of every
    * selection it retrieved (including selections inside nested captures).
    */
  def capturing[T](body: => T): (T, Seq[org.apache.spark.sql.execution.QueryExecution]) = {
    val buf = mutable.Buffer.empty[org.apache.spark.sql.execution.QueryExecution]
    active.set(buf :: active.get())
    try {
      val result = body
      (result, buf.toSeq)
    } finally active.set(active.get().filterNot(_ eq buf))
  }

  /** Optimized-plan strings for a failure message (deduplicated). */
  def render(qes: Seq[org.apache.spark.sql.execution.QueryExecution]): Seq[String] =
    qes.map(_.optimizedPlan.toString.trim).distinct
}
