package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming operator library (SURVEY.md §2.1 s4–s6): the event-time
  * transforms the reference's consumers run downstream of the transport.
  * Each transform works on both a streaming and a batch DataFrame (the
  * batch twins in graft.queries.Events are verified against DuckDB; the
  * streaming behavior — incremental state, watermark discipline — is
  * covered by StreamingSpec).
  */
object StreamOps {

  /** s4: at-least-once → effectively-once. Watermarked key dedup: a
    * redelivery within the watermark horizon is dropped; state is bounded
    * by the horizon (unlike plain dropDuplicates, whose state grows
    * forever). */
  def dedupWithinWatermark(df: DataFrame, tsCol: String, horizon: String,
                           keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, horizon).dropDuplicatesWithinWatermark(keys)

  /** s5: tumbling event-time window aggregate (streaming twin of e1).
    * Window key derives per-row, aggregation is partial map-side; the
    * watermark bounds state for append-mode sinks. Groups on the
    * window's START TIMESTAMP (`wstart`) — a cast-to-date key would
    * silently collapse every sub-day window of a calendar day into one
    * bucket, ignoring `width`. */
  def tumblingCounts(df: DataFrame, tsCol: String, width: String,
                     horizon: String): DataFrame =
    df.withWatermark(tsCol, horizon)
      .groupBy(window(col(tsCol), width).getField("start").as("wstart"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(30,6)")).cast("double").as("total_value"))

  // ---- s6: gap-based sessionization with explicit per-key state ----

  final case class SessEvent(user_id: Long, event_id: Long, ts: Timestamp)

  /** Full-precision epoch micros (Timestamp.getTime alone floors to ms). */
  private def micros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
  /** Open session carried across micro-batches. */
  final case class SessState(startUs: Long, lastUs: Long, n: Long)
  final case class SessionOut(user_id: Long, session_start_us: Long, n_events: Long)

  /** Split time-sorted events into gap-separated sessions. Returns the
    * closed sessions and the still-open tail. New session iff
    * gap >= gapMs — the same open interval [start, start+gap) as
    * Spark's session_window and the e3 oracle. */
  private def foldSessions(state: Option[SessState], events: Seq[SessEvent],
                           gapMs: Long): (Seq[SessState], Option[SessState]) = {
    val closed = Seq.newBuilder[SessState]
    var open = state
    events.foreach { e =>
      val us = micros(e.ts)
      open match {
        case Some(s) if us - s.lastUs < gapMs * 1000L =>
          open = Some(s.copy(lastUs = math.max(s.lastUs, us), n = s.n + 1))
        case Some(s) =>
          closed += s
          open = Some(SessState(us, us, 1))
        case None =>
          open = Some(SessState(us, us, 1))
      }
    }
    (closed.result(), open)
  }

  /** Batch sessionization through the same flatMapGroupsWithState
    * operator (state starts empty, all events arrive at once, every
    * session emits). Matches the e3/session_window oracle exactly. */
  def sessionizeBatch(events: Dataset[SessEvent], gapMinutes: Int): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[SessEvent], _: GroupState[SessState]) =>
          val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          val (closed, open) = foldSessions(None, sorted, gapMinutes * 60000L)
          (closed ++ open).map(s => SessionOut(user, s.startUs, s.n)).iterator
      }
  }

  // ---- s12: per-source admission quota ----

  final case class QuotaDoc(doc_id: Long, source: String)
  final case class QuotaOut(doc_id: Long, source: String,
                            admit_rank: Long, admitted: Boolean)

  /** s12: stateful per-source admission quota — the ingest-side
    * "frequency cap" (the streaming twin of d32's batch sampler, and the
    * per-tenant quota every multi-source ingest front door needs): each
    * source admits its first `cap` documents and rejects the rest, with
    * the running count carried in GroupState across micro-batches.
    * Emits every document with its 1-based per-source arrival rank and
    * the admit/reject decision, so the drain is exact and auditable
    * (rejected docs are visible, not silently dropped).
    *
    * Determinism: per-source arrival order = (micro-batch order, then
    * doc_id within the batch) — the iterator is sorted per batch, so a
    * driver feeding batches in doc_id order gets exactly "first cap by
    * doc_id" (the s12 oracle). State is one long per source. */
  def quotaGate(docs: Dataset[QuotaDoc], cap: Long): Dataset[QuotaOut] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[Long, QuotaOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, it: Iterator[QuotaDoc], state: GroupState[Long]) =>
          var n = state.getOption.getOrElse(0L)
          val out = it.toSeq.sortBy(_.doc_id).map { d =>
            n += 1
            QuotaOut(d.doc_id, src, n, n <= cap)
          }
          state.update(n)
          out.iterator
      }
  }

  // ---- s19: per-source token-budget quota ----

  final case class TokDoc(doc_id: Long, source: String, n_tok: Long)
  final case class TokQuotaOut(doc_id: Long, source: String, n_tok: Long,
                               run_tok: Long, admitted: Boolean)

  /** s19: stateful per-source TOKEN budget — s12 weighted by content:
    * a training-mix builder caps each source by tokens contributed, not
    * documents, because doc sizes vary 100x. Truncation semantics: docs
    * stream in curation order and the source closes once its cumulative
    * token count crosses the budget (a doc is admitted iff the running
    * total INCLUDING it is <= budget) — the decision is a pure function
    * of the prefix sum, so the batch oracle is one window. Every doc is
    * emitted with its running total and the decision (auditable drain).
    * State is one long per source, constant regardless of stream length.
    *
    * Determinism: as quotaGate — per-batch iterator sorted by doc_id, so
    * a driver feeding batches in doc_id order reproduces the oracle's
    * per-source prefix order exactly. */
  def tokenQuotaGate(docs: Dataset[TokDoc], budget: Long): Dataset[TokQuotaOut] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[Long, TokQuotaOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, it: Iterator[TokDoc], state: GroupState[Long]) =>
          var used = state.getOption.getOrElse(0L)
          val out = it.toSeq.sortBy(_.doc_id).map { d =>
            used += d.n_tok
            TokQuotaOut(d.doc_id, src, d.n_tok, used, used <= budget)
          }
          state.update(used)
          out.iterator
      }
  }

  // ---- s21: per-source streaming heavy hitters ----

  final case class HHDoc(doc_id: Long, source: String, toks: Seq[String])
  /** Misra-Gries counters + items-seen, per source. Bounded: at most
    * `capacity` map entries regardless of stream length. */
  final case class HHState(n: Long, counters: Map[String, Long])
  final case class HHOut(source: String, n: Long, counters: Map[String, Long])

  /** s21: frequent-token candidates ON THE INGEST STREAM — the
    * Misra-Gries summary (operators.HeavyHitters.add, the same update
    * the batch d55 Aggregator runs) held in GroupState per source: at
    * most `capacity` counters + one long, constant forever, folded
    * across micro-batches. Each invocation emits the source's current
    * (n, counters) snapshot; the LAST snapshot per source carries the
    * full-stream guarantee (every token with count > n/(capacity+1)
    * survives), which a cheap exact recount then turns into the exact
    * per-source frequency filter — sketch on the stream, verify in
    * batch. */
  def heavyHitterGate(docs: Dataset[HHDoc], capacity: Int): Dataset[HHOut] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[HHState, HHOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, it: Iterator[HHDoc], state: GroupState[HHState]) =>
          var st = state.getOption.getOrElse(HHState(0L, Map.empty))
          it.toSeq.sortBy(_.doc_id).foreach { d =>
            d.toks.foreach { t =>
              st = HHState(st.n + 1L,
                graft.operators.HeavyHitters.add(st.counters, t, capacity))
            }
          }
          state.update(st)
          Iterator.single(HHOut(src, st.n, st.counters))
      }
  }

  // ---- s20: truncated-kernel EWMA smoothing ----

  /** Ring of the ≤7 most recent cents values, most-recent-first. */
  final case class EwmaState(prev: Seq[Long])
  final case class EwmaOut(user_id: Long, event_id: Long, ewma_x256: Long)

  /** s20: per-user EWMA smoothing (α = 1/2, kernel truncated at 8
    * taps) as a stateful stream op — e22's batch window online. The
    * truncation is the point: the textbook recursion y_n = αx_n +
    * (1−α)y_{n−1} needs unbounded history and float state, while the
    * 8-tap kernel is EXACT integer algebra (weights 128…1 over cents,
    * denominator 2⁸ carried in the column name) with state = at most
    * seven longs per user, so the stream is bit-identical to e22's
    * batch LAG formulation whenever batches respect per-user
    * event-time order (dropped taps are below 1/256 ≈ 0.4% weight). */
  def ewmaGate(events: Dataset[StatEvent]): Dataset[EwmaOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[EwmaState, EwmaOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[StatEvent], state: GroupState[EwmaState]) =>
          var prev = state.getOption.map(_.prev.toList).getOrElse(Nil)
          val out = Seq.newBuilder[EwmaOut]
          it.toSeq.sortBy(e => (e.tsUs, e.event_id)).foreach { e =>
            var acc = e.vi * 128L
            var w = 64L
            prev.foreach { v => acc += v * w; w >>= 1 }
            out += EwmaOut(user, e.event_id, acc)
            prev = (e.vi :: prev).take(7)
          }
          state.update(EwmaState(prev))
          out.result().iterator
      }
  }

  // ---- s14: online 3-sigma anomaly gate ----

  final case class StatEvent(user_id: Long, event_id: Long, tsUs: Long,
                             vi: Long, value: Double)
  /** Exact per-user prefix statistics: count, Σv, Σv² in integer cents. */
  final case class RunStats(n: Long, s: Long, q: Long)
  final case class OutlierOut(user_id: Long, event_id: Long, value: Double,
                              n_prior: Long)

  /** s14: streaming anomaly detection — each event is flagged against
    * the user's history SO FAR, exactly (e18's prefix test online):
    * (n·v − S)² > 9(nQ − S²) over integer cents, state = one (n, S, Q)
    * triple per user folded across micro-batches. No sqrt, no float
    * compare, so the stream is bit-identical to the batch window
    * formulation whenever batches respect per-user event-time order
    * (the parity spec's harness feeds time-split batches).
    *
    * Long-math bound: with |v| ≤ ~1e6 cents the test stays below 2^63
    * for per-user histories up to ~1e5 events; promote RunStats to
    * BigDecimal fields past that regime. minPrior suppresses the
    * small-sample noise floor (flags only after a real history). */
  def runningOutlierGate(events: Dataset[StatEvent],
                         minPrior: Long): Dataset[OutlierOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[RunStats, OutlierOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[StatEvent], state: GroupState[RunStats]) =>
          var st = state.getOption.getOrElse(RunStats(0L, 0L, 0L))
          val out = Seq.newBuilder[OutlierOut]
          it.toSeq.sortBy(e => (e.tsUs, e.event_id)).foreach { e =>
            val d = st.n * e.vi - st.s
            if (st.n >= minPrior && d * d > 9 * (st.n * st.q - st.s * st.s))
              out += OutlierOut(user, e.event_id, e.value, st.n)
            st = RunStats(st.n + 1, st.s + e.vi, st.q + e.vi * e.vi)
          }
          state.update(st)
          out.result().iterator
      }
  }

  final case class TypedEvent(user_id: Long, event_id: Long, tsUs: Long,
                              event_type: String)
  final case class TransState(lastType: String)
  final case class TransOut(user_id: Long, event_id: Long,
                            prev_type: String, next_type: String)

  /** s24: streaming first-order transition extraction — each user's
    * LAST event type is the ENTIRE state (one short string per user,
    * constant forever); every arriving event emits its (prev → next)
    * edge against that state and replaces it. The batch twin (e27's
    * lag window) re-sorts each user's history; the online form holds
    * one value and never rescans — the Markov-model feature extractor
    * that runs on an unbounded stream. Bit-parity with the batch lag
    * holds whenever micro-batches respect per-user event-time order
    * (the transport's per-shard resume guarantee; the parity spec
    * feeds time-split batches). */
  def transitionGate(events: Dataset[TypedEvent]): Dataset[TransOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, TransOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[TypedEvent], state: GroupState[TransState]) =>
          var last = state.getOption.map(_.lastType).orNull
          val out = Seq.newBuilder[TransOut]
          it.toSeq.sortBy(e => (e.tsUs, e.event_id)).foreach { e =>
            if (last != null) out += TransOut(user, e.event_id, last, e.event_type)
            last = e.event_type
          }
          if (last != null) state.update(TransState(last))
          out.result().iterator
      }
  }

  /** Streaming sessionization: open sessions live in GroupState and emit
    * when the event-time timeout fires (watermark passed start+gap) — the
    * incremental twin of sessionizeBatch. Events later than the open
    * session's tail extend it; a gap closes it. */
  def sessionizeStream(events: Dataset[SessEvent], gapMinutes: Int,
                       horizon: String): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events.withWatermark("ts", horizon)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[SessEvent], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, s.startUs, s.n))
          } else {
            val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            val (closed, open) = foldSessions(state.getOption, sorted, gapMs)
            open match {
              case Some(s) =>
                state.update(s)
                state.setTimeoutTimestamp(s.lastUs / 1000L + gapMs)
              case None => state.remove()
            }
            closed.iterator.map(s => SessionOut(user, s.startUs, s.n))
          }
      }
  }
}
