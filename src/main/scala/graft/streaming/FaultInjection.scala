package graft.streaming

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, udf}

/** The marker exception for deliberately injected task failures — a
  * dedicated top-level class so the bench's task-failure ledger can
  * separate EXPECTED (injected) retries from real recompute hazards by
  * exception class name alone. */
final class InjectedTaskFault(msg: String) extends RuntimeException(msg)

/** Deterministic one-shot task-fault injection — the test harness for
  * the exactly-once-under-failure claim (w24). The reference's epoch
  * protocol claims recovery from MID-epoch failure via buffered-message
  * replay (`/root/reference/arcon/src/stream/node/mod.rs:406-453`);
  * Spark's equivalent is task retry within a micro-batch: a task that
  * dies after writing (uncommitted) state-store updates is re-run from
  * the shuffle input, and the aborted store never commits. Every
  * restore row (w18/w20-w23) kills at a CLEAN post-commit point; this
  * injector kills INSIDE a batch, mid-task.
  *
  * Mechanics: [[passOrThrowOnce]] throws [[InjectedTaskFault]] for
  * exactly the FIRST row evaluated on a first-attempt task per `tag`
  * (a process-wide armed-set — local-mode executors share the JVM, so
  * one tag arms once per query run); the failed task's retry has
  * `attemptNumber > 0` and passes, as does every other task. The
  * session must allow one retry (master `local[n,2]` — production
  * clusters run `spark.task.maxFailures=4`; local mode defaults to 1,
  * which fails the whole query on first failure). */
object FaultInjection {
  private val armed =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val seq = new java.util.concurrent.atomic.AtomicLong()

  /** A fresh injection tag — one per query invocation, so a benched
    * query re-injects on every run, not only the first. */
  def freshTag(prefix: String): String =
    s"$prefix#${seq.incrementAndGet()}"

  /** True iff `tag`'s one-shot fault has been thrown (the post-drain
    * proof that the injection actually fired — a plan rewrite that
    * optimized the probe away must fail the run loudly, not pass it
    * silently). */
  def fired(tag: String): Boolean = armed.contains(tag)

  /** Executor-side probe: throw once per tag on a first-attempt task,
    * pass everywhere else (see object scaladoc). */
  def passOrThrowOnce(tag: String): Boolean = {
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null && tc.attemptNumber == 0 && armed.add(tag))
      throw new InjectedTaskFault(
        s"injected task fault '$tag' (stage ${tc.stageId}, partition " +
          s"${tc.partitionId}, attempt 0) — the retry must make the " +
          "batch exactly-once")
    true
  }

  /** The probe as a filter predicate over a real column: the column
    * dependency (ignored at runtime) keeps Catalyst from constant-
    * folding the probe on the DRIVER, and referencing a post-
    * aggregation column keeps the filter ABOVE the stateful exec — the
    * failing task is the one holding the uncommitted state store. */
  def failOnce(tag: String, anchor: Column): Column =
    udf((t: String, _: Long) => passOrThrowOnce(t))
      .apply(lit(tag), anchor.cast("long"))
}
