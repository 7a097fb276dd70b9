package graft.operators

import org.apache.spark.sql.DataFrame

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Concurrent materialization of INDEPENDENT DataFrames.
  *
  * Spark parallelizes the independent branches of ONE action automatically
  * (stages with no parent dependency schedule together), but SEPARATE eager
  * checkpoints are separate actions and run back-to-back — a pipeline that
  * materializes a doc-facts frame, a shingle-intersection frame, and an
  * embedding-pair frame as three sequential `localCheckpoint(true)` calls
  * pays the SUM of the three jobs even though they share nothing. Submitting
  * the actions from separate threads lets the scheduler interleave their
  * tasks, so the wall-clock cost is the max, not the sum — on a cluster this
  * is the difference between utilizing the executors and draining them
  * between jobs.
  *
  * Beyond the flat barrier ([[checkpointAll]]), [[ckpt]]/[[await]] expose the
  * futures directly so a caller can express a DATAFLOW: a stage that needs
  * only one of the base frames (`fut.map(...)`) starts the moment that frame
  * lands, overlapping with the still-running siblings — e.g. the decision
  * table's hash-canonical windows run while the shingle join and the
  * iterative connected-components rounds are still in flight.
  *
  * `SparkSession` job submission is thread-safe; results are unchanged (the
  * frames are independent by contract). Exceptions propagate from whichever
  * materialization failed.
  */
object Par {

  /** `GRAFT_PAR_SERIAL=1` degrades the whole future graph to strict
    * program-order execution (every `Future`/`map`/`for` body runs inline on
    * the calling thread) — the measurement baseline for pricing the overlap.
    * Measured on `Explain q_dedup_decision <sf0.1> time2` (warm run 2,
    * local[32], r9): serial 7.13 s vs overlapped 5.20 s — the dataflow buys
    * **1.37×** at sf0.1, i.e. the side signals (hash-canonical windows,
    * containment aggregation) and the slower base materializations really do
    * hide under the CC rounds rather than adding to them. Re-price after any
    * scheduler/AQE behavior change; if the two numbers converge, the
    * machinery has silently stopped helping and should be removed.
    *
    * Captured ONCE at class-load: toggling the env var inside a long-lived
    * session (e.g. between two Explain runs in one JVM) has no effect — set
    * it before the JVM starts.
    */
  private[graft] val serial: Boolean =
    sys.env.get("GRAFT_PAR_SERIAL").contains("1")

  /** Shared pool for materialization threads — the threads only BLOCK on
    * Spark actions (the work happens on Spark's scheduler), so the global
    * pool's cores-sized default is plenty.
    */
  implicit val ec: ExecutionContext =
    if (serial) new ExecutionContext {
      def execute(r: Runnable): Unit = r.run()
      def reportFailure(t: Throwable): Unit = throw t
    } else ExecutionContext.global

  /** Submit an eager localCheckpoint on a pool thread (a [[Lineage]] cut,
    * so plan audits see through it).
    */
  def ckpt(df: DataFrame): Future[DataFrame] = Future(Lineage.cut(df))

  def await[A](f: Future[A]): A = Await.result(f, Duration.Inf)

  /** Eagerly localCheckpoint every frame, submitting the materialization jobs
    * concurrently; returns the checkpointed frames in input order.
    */
  def checkpointAll(dfs: Seq[DataFrame]): Seq[DataFrame] = {
    val futs = dfs.map(ckpt)
    futs.map(await)
  }
}
