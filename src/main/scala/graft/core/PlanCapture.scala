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
    new ThreadLocal[List[mutable.Buffer[String]]] {
      override def initialValue(): List[mutable.Buffer[String]] = Nil
    }

  /** Called by `DataRef.selection` for every retrieval plan it builds.
    * Records into EVERY active capture (captures nest: a memoizing retrieval
    * captures for its cache entry while the surrounding `test` captures for
    * the failure message).
    */
  def record(df: DataFrame): Unit = {
    val buffers = active.get()
    if (buffers.nonEmpty) {
      val plan = df.queryExecution.optimizedPlan.toString.trim
      buffers.foreach(_ += plan)
    }
  }

  /** Run `body`, returning its result plus the plans of every selection it
    * retrieved (including selections inside nested captures).
    */
  def capturing[T](body: => T): (T, Seq[String]) = {
    val buf = mutable.Buffer.empty[String]
    active.set(buf :: active.get())
    try {
      val result = body
      (result, buf.toSeq.distinct)
    } finally active.set(active.get().filterNot(_ eq buf))
  }
}
