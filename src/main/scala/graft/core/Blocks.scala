package graft.core

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Session-scoped accounting for eagerly-materialized intermediate frames.
  *
  * The multi-pass pipelines (MinHash/LSH dedup, embedding near-dups,
  * connected components, span dedup, distributed prefix sums) materialize
  * intermediates with EAGER `localCheckpoint()` — the only Spark primitive
  * that (a) pins a frame read from several plan branches to one computation,
  * (b) truncates lineage so iterative plans stay constant-size, and (c) is
  * releasable without clearing the whole session cache. The catch: a
  * checkpoint's blocks survive until the driver GCs the last reference and
  * the ContextCleaner notices — in a long-lived session evaluating many
  * checks back-to-back (a bench loop, a production constraint suite), dead
  * blocks pile up in the block manager until execution memory starves and
  * every query pays for it in spills.
  *
  * This registry makes the blocks' lifetime explicit instead of GC-driven:
  *
  *   - every library-internal checkpoint registers here ([[checkpoint]]);
  *     entries are weakly held, so frames the GC already reclaimed drop out
  *     on their own;
  *   - operators release intermediates that die WITHIN the call as soon as
  *     the next stage is materialized ([[release]]);
  *   - batch entry points that fully consume their frames — a constraint
  *     computing a scalar, a bench/verify harness that has counted or
  *     written the result — free everything the evaluation materialized
  *     with [[scoped]] or [[releaseAll]].
  *
  * CONTRACT: [[release]]/[[releaseAll]]/[[scoped]] invalidate the released
  * frames — a localCheckpoint cannot be recomputed once its blocks are
  * dropped, so only call them when the frames (and every frame derived from
  * them) are no longer needed. `releaseAll` is harness-level cleanup between
  * independent queries; inside library code prefer `scoped`/`release`,
  * which cannot touch a caller's live frames.
  */
object Blocks {

  // weakly keyed: a checkpoint whose frame was GC'd (and thus reclaimed by
  // the ContextCleaner) must not keep an entry alive here
  private val tracked =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[RDD[_], java.lang.Boolean]())

  // innermost-first stack of active `scoped` sections (driver-side,
  // single-threaded per evaluation — thread-local keeps concurrent
  // sessions/threads from releasing each other's frames)
  private val scopes =
    new ThreadLocal[List[java.util.ArrayList[RDD[_]]]] {
      override def initialValue(): List[java.util.ArrayList[RDD[_]]] = Nil
    }

  /** The checkpoint RDD behind `df`, if `df` IS a checkpoint result — the
    * match is deliberately root-only (no deep plan walk), so passing a
    * derived frame is a safe no-op and can never unpersist an upstream
    * checkpoint that is still live.
    */
  private def rootRdd(df: DataFrame): Option[RDD[_]] =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => Some(lr.rdd)
      case _              => None
    }

  /** Eagerly `localCheckpoint` `df` and register the blocks for explicit
    * release. Every library-internal eager materialization goes through
    * here.
    */
  private[graft] def checkpoint(df: DataFrame): DataFrame =
    track(df.localCheckpoint())

  /** LAZY `localCheckpoint` — same pinning/lineage-truncation/release
    * semantics, but materialization rides the FIRST job that touches the
    * frame instead of a dedicated job here (r15, guide §1.2: the eager
    * form costs one extra action per intermediate; use this when no
    * driver decision needs the materialized result before the next
    * action reads it anyway).
    */
  private[graft] def checkpointLazy(df: DataFrame): DataFrame =
    track(df.localCheckpoint(eager = false))

  /** Register an already-checkpointed frame. Returns `df` for chaining. */
  private[graft] def track(df: DataFrame): DataFrame = {
    rootRdd(df).foreach { r =>
      tracked.put(r, java.lang.Boolean.TRUE)
      scopes.get() match {
        case head :: _ => head.add(r)
        case Nil       => ()
      }
    }
    df
  }

  /** Drop the checkpoint blocks behind `df` NOW (blocking=false — the
    * removal itself is async on the executors). No-op for frames that are
    * not a checkpoint root. The frame — and anything derived from it —
    * must not be executed afterwards.
    */
  def release(df: DataFrame): Unit =
    rootRdd(df).foreach { r =>
      r.unpersist(false)
      tracked.remove(r)
    }

  /** Run `body` and release every checkpoint it registers on the way out
    * (normal return or throw). For evaluations that fully consume their
    * frames — e.g. a constraint reducing to a scalar verdict. Nested scopes
    * release only their own registrations.
    */
  private[graft] def scoped[T](body: => T): T = {
    val own = new java.util.ArrayList[RDD[_]]()
    scopes.set(own :: scopes.get())
    try body
    finally {
      scopes.set(scopes.get().tail)
      own.forEach { r =>
        r.unpersist(false)
        tracked.remove(r)
      }
    }
  }

  /** Release EVERY live tracked checkpoint — harness-level cleanup between
    * independent queries (bench loops, verification sweeps, suite
    * teardown). Invalidates any still-held frame returned by a pipeline
    * entry point; see the object contract above.
    */
  def releaseAll(): Unit = {
    val live = tracked.synchronized {
      val copy = new java.util.ArrayList[RDD[_]](tracked.keySet())
      tracked.clear()
      copy
    }
    live.forEach(_.unpersist(false))
  }

  /** Number of live tracked checkpoints (test/diagnostic surface). */
  def trackedCount: Int = tracked.synchronized {
    // WeakHashMap expunges stale entries on access; size() after keySet
    // iteration is the honest live count
    tracked.size()
  }
}
