package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A fetch request on the continuous-ingest path: `t` is the request's
  * event time in ms (the virtual clock — same unit F3's batch
  * politeness uses).
  */
case class FetchReq(host: String, url: String, t: Long)

/** [[FetchReq]] plus the politeness-admissible dispatch time. */
case class ScheduledFetch(host: String, url: String, t: Long, scheduled: Long)

/** Structured Streaming operators for the CONTINUOUS deployment mode.
  *
  * The crawl engine itself is BSP-by-design — bit-for-bit parity with
  * the reference's serial loop needs a barrier per round (SURVEY.md
  * §2.11), and that stays a declared non-goal for streaming. What DOES
  * stream in a production crawl/training-data pipeline is the ingest
  * side: documents arriving continuously that need exact dedup against
  * a bounded recency window, and fetch requests that need per-host
  * politeness spacing without waiting for a round barrier. Both are
  * incremental-state problems — `dropDuplicates` dedup state with
  * watermark eviction, and `flatMapGroupsWithState` per-host deadline
  * state — i.e. exactly the two Structured Streaming state mechanisms,
  * over the same columns/semantics their batch twins use (D1 exact
  * dedup, F3 crawl-delay recurrence).
  */
object StreamOps {

  /** Streaming exact dedup over `keyCols`: first occurrence is emitted
    * (append mode emits immediately — a dedup row can never be
    * retracted), later occurrences are suppressed as long as the first
    * one's event time is inside the watermark window. The watermark
    * bounds the dedup state — the honest 10^10-scale semantics: an
    * unbounded exact seen-set is the batch engine's job (D1's
    * compacted bucketed state), a stream keeps a recency window whose
    * size is a memory/recall knob. `dropDuplicatesWithinWatermark`
    * (not plain `dropDuplicates`) is what makes that true: the plain
    * operator only evicts state when a KEY column carries the
    * watermark, so with keys like `text` its state grew without bound
    * in a continuous deployment — the within-watermark variant evicts
    * every key once the watermark passes its first-seen time plus the
    * delay.
    */
  def dedupStream(docs: DataFrame, keyCols: Seq[String], tsCol: String,
      watermark: String): DataFrame =
    docs.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(keyCols)

  /** Per-host politeness throttle over a fetch-request stream: the F3
    * recurrence s_i = max(t_i, s_{i-1} + delayMs) (first request
    * dispatches at its own t) as incremental per-host state — the
    * state is ONE long (the host's last scheduled deadline), updated
    * per micro-batch by `flatMapGroupsWithState`, so a host backlogged
    * in batch k keeps pushing batch k+1's requests back without any
    * global barrier. Requests inside a batch are processed in
    * (t, url) order; across batches the operator is honest (never
    * schedules before the request's own t, never violates the host
    * gap) and reproduces the serial recurrence exactly when batches
    * respect per-host event order — the batch engine's closed-form
    * politeness (CrawlRound F3) is the same recurrence evaluated
    * per round.
    */
  def hostThrottle(reqs: Dataset[FetchReq], delayMs: Long): Dataset[ScheduledFetch] = {
    import reqs.sparkSession.implicits._
    reqs.groupByKey(_.host)
      .flatMapGroupsWithState[Long, ScheduledFetch](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (host: String, it: Iterator[FetchReq], state: GroupState[Long]) =>
          val batch = it.toArray.sortBy(r => (r.t, r.url))
          var last = state.getOption.getOrElse(Long.MinValue)
          val out = batch.map { r =>
            val sched =
              if (last == Long.MinValue) r.t else math.max(r.t, last + delayMs)
            last = sched
            ScheduledFetch(r.host, r.url, r.t, sched)
          }
          if (batch.nonEmpty) state.update(last)
          out.iterator
      }
  }
}
