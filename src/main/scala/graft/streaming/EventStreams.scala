package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Streaming twin of the batch event-analytics family (q105–q112): the
  * `events` table is naturally an append-only clickstream, and the
  * family's core primitive — per-user consecutive event pairs in
  * event-time order (the q108 transition matrix, and the edge list
  * funnels/paths derive from) — maps onto a watermarked
  * `flatMapGroupsWithState` keyed by user.
  *
  * State per user is ONE record (the last event seen), evicted by
  * event-time timeout after `idleMs` of user inactivity — memory is
  * bounded by (active users within the idle horizon), not stream
  * length. Late events inside the watermark still chain correctly when
  * delivery is per-user ordered across batches (the micro-batch is
  * sorted by (ts, event_id) before chaining, matching the batch
  * window's ordering); an event older than the stored last event chains
  * FORWARD from it rather than splicing into history — the documented
  * divergence (same contract as [[TraceStreams.dedupStream]]): the
  * batch q108 over the at-rest table is the exact backstop.
  */
object EventStreams {

  /** JSONL wire schema for an event stream: µs epoch `ts_us` plus the
    * analytic columns (the parquet `events` projection). `value` is
    * optional on the wire — twins that don't read it ignore the null. */
  val eventStreamSchema: StructType = StructType(Seq(
    StructField("user_id", LongType),
    StructField("event_id", LongType),
    StructField("event_type", StringType),
    StructField("ts_us", LongType),
    StructField("value", org.apache.spark.sql.types.DoubleType)))

  /** JSONL event file stream with the watermark clock attached. */
  def eventFileStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventStreamSchema).json(dir)
      .withColumn("eventTime", timestamp_micros(col("ts_us")))

  private[streaming] case class EventRec(user_id: Long, event_id: Long,
      event_type: String, ts_us: Long,
      eventTime: java.sql.Timestamp)

  /** The whole per-user state: the last event seen. */
  case class UserLast(tsUs: Long, eventId: Long, eventType: String)

  /** One emitted transition edge. */
  case class Transition(user_id: Long, prev_type: String,
      next_type: String, ts_us: Long)

  /** Per-user funnel progress; −1 = stage not reached yet. Monotone:
    * each field is set once (the FIRST qualifying event, matching the
    * batch query's min-ts semantics under per-user-ordered delivery). */
  case class FunnelState(seenAny: Boolean, tv: Long, tc: Long, tp: Long)

  /** One stage-advance emission (at most 4 per user, ever). */
  case class StageAdvance(user_id: Long, stage: String, ts_us: Long)

  /** Streaming funnel (q105 shape): emits one [[StageAdvance]] record
    * the moment a user first reaches each stage — any event → first
    * view → first click strictly after that view → first purchase
    * strictly after that click. The live conversion counter: counting
    * distinct users per emitted stage at rest reproduces the batch
    * funnel exactly under per-user-ordered delivery (parity spec), and
    * the advance events are exactly what a real-time funnel dashboard
    * increments on. State per user is one 4-field record, evicted after
    * `idleMs` of event-time inactivity. */
  def funnelStages(events: DataFrame, watermark: String = "10 minutes",
      idleMs: Long = 3600000L): Dataset[StageAdvance] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timed = events
      .withWatermark("eventTime", watermark)
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("event_type"), col("ts_us").cast("long"), col("eventTime"))
      .as[EventRec]
    timed.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StageAdvance](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[EventRec],
            state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
            var st = state.getOption
              .getOrElse(FunnelState(seenAny = false, -1L, -1L, -1L))
            val out = Seq.newBuilder[StageAdvance]
            var lastTs = -1L
            sorted.foreach { e =>
              lastTs = e.ts_us
              if (!st.seenAny) {
                st = st.copy(seenAny = true)
                out += StageAdvance(user, "1_any_event", e.ts_us)
              }
              e.event_type match {
                case "view" if st.tv < 0 =>
                  st = st.copy(tv = e.ts_us)
                  out += StageAdvance(user, "2_view", e.ts_us)
                case "click" if st.tc < 0 && st.tv >= 0 &&
                    e.ts_us > st.tv =>
                  st = st.copy(tc = e.ts_us)
                  out += StageAdvance(user, "3_click_after_view", e.ts_us)
                case "purchase" if st.tp < 0 && st.tc >= 0 &&
                    e.ts_us > st.tc =>
                  st = st.copy(tp = e.ts_us)
                  out += StageAdvance(user, "4_purchase_after_click",
                    e.ts_us)
                case _ => ()
              }
            }
            if (lastTs >= 0) {
              state.update(st)
              state.setTimeoutTimestamp(math.max(lastTs / 1000L + idleMs,
                state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }

  /** Per-user retention state: UTC epoch-day of the user's FIRST event
    * (the cohort assignment) plus the three emitted-once flags. */
  case class CohortState(cohortDay: Long, s1: Boolean, s7: Boolean,
      s14: Boolean)

  /** One retention emission: `mark` ∈ new_user | d1 | d7 | d14. */
  case class CohortMark(cohort_day: Long, mark: String, user_id: Long,
      ts_us: Long)

  /** Streaming retention cohorts (q106 shape): each user's first event
    * emits `new_user` for its UTC cohort day; the first activity
    * exactly 1/7/14 days later emits `d1`/`d7`/`d14` once. Counting
    * marks per (cohort_day, mark) at rest reproduces the batch cohort
    * table exactly under per-user-ordered delivery (parity spec) — and
    * the marks are the increments a live retention dashboard applies.
    * State per user is one 4-field record; event-time idle eviction
    * must outlive the retention horizon (default 15 days of DATA time —
    * the state is 17 bytes, so even 10⁹ users fit an executor fleet). */
  def retentionMarks(events: DataFrame, watermark: String = "10 minutes",
      idleMs: Long = 15L * 86400000L): Dataset[CohortMark] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timed = events
      .withWatermark("eventTime", watermark)
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("event_type"), col("ts_us").cast("long"), col("eventTime"))
      .as[EventRec]
    timed.groupByKey(_.user_id)
      .flatMapGroupsWithState[CohortState, CohortMark](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[EventRec],
            state: GroupState[CohortState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
            val out = Seq.newBuilder[CohortMark]
            var st = state.getOption.orNull
            var lastTs = -1L
            sorted.foreach { e =>
              lastTs = e.ts_us
              val day = Math.floorDiv(e.ts_us, 86400000000L)
              if (st == null) {
                st = CohortState(day, s1 = false, s7 = false, s14 = false)
                out += CohortMark(day, "new_user", user, e.ts_us)
              } else {
                val k = day - st.cohortDay
                if (k == 1 && !st.s1) {
                  st = st.copy(s1 = true)
                  out += CohortMark(st.cohortDay, "d1", user, e.ts_us)
                } else if (k == 7 && !st.s7) {
                  st = st.copy(s7 = true)
                  out += CohortMark(st.cohortDay, "d7", user, e.ts_us)
                } else if (k == 14 && !st.s14) {
                  st = st.copy(s14 = true)
                  out += CohortMark(st.cohortDay, "d14", user, e.ts_us)
                }
              }
            }
            if (lastTs >= 0) {
              state.update(st)
              state.setTimeoutTimestamp(math.max(lastTs / 1000L + idleMs,
                state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }

  /** Per-user last non-purchase touch ("" = none seen yet). */
  case class TouchState(lastTouch: String)

  /** One attributed purchase. */
  case class Attribution(user_id: Long, touch: String, ts_us: Long)

  /** Streaming last-touch attribution (q112 shape): each purchase emits
    * one record crediting the user's most recent preceding non-purchase
    * event type ("none" when the purchase is the user's first touch).
    * State per user is ONE string; counting emissions per touch at rest
    * reproduces the batch attribution exactly under per-user-ordered
    * delivery (parity spec) — and the emissions are the per-purchase
    * credit rows a live revenue dashboard consumes. */
  def attributionStream(events: DataFrame,
      watermark: String = "10 minutes",
      idleMs: Long = 3600000L): Dataset[Attribution] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timed = events
      .withWatermark("eventTime", watermark)
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("event_type"), col("ts_us").cast("long"), col("eventTime"))
      .as[EventRec]
    timed.groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchState, Attribution](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[EventRec],
            state: GroupState[TouchState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
            val out = Seq.newBuilder[Attribution]
            var st = state.getOption.getOrElse(TouchState(""))
            var lastTs = -1L
            sorted.foreach { e =>
              lastTs = e.ts_us
              if (e.event_type == "purchase") {
                val touch = if (st.lastTouch.isEmpty) "none"
                  else st.lastTouch
                out += Attribution(user, touch, e.ts_us)
              } else st = TouchState(e.event_type)
            }
            if (lastTs >= 0) {
              state.update(st)
              state.setTimeoutTimestamp(math.max(lastTs / 1000L + idleMs,
                state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }

  /** One emitted same-type inter-arrival gap (exact integer µs). */
  case class Gap(user_id: Long, event_type: String, gap_us: Long,
      ts_us: Long)

  /** Streaming same-type inter-arrival gaps — the stateful half of
    * q119's cadence profile (and t47's bounded-percentile twin): for
    * each (user, event_type), the µs gap between consecutive events,
    * emitted exactly once when the later event arrives. State per
    * (user, type) is ONE [[UserLast]] record, evicted after `idleMs`
    * of event-time inactivity — memory is bounded by (active user ×
    * type pairs within the idle horizon), not stream length. The
    * per-type med/p90 summary is corpus-relative, so it runs at rest
    * over the emitted gaps (the parity spec reproduces the batch q119
    * table exactly); a live cadence monitor feeds the gaps into a
    * per-type quantile sketch instead. Cross-batch contract:
    * micro-batches sort by (ts, event_id); an in-watermark straggler
    * OLDER than the stored last event is SKIPPED (a duration cannot
    * chain forward the way [[transitionPairs]]' edges do — it would
    * emit a negative gap and regress state, double-counting the next
    * interval); batch q119 over the at-rest table is the exact
    * backstop. */
  def interEventGaps(events: DataFrame, watermark: String = "10 minutes",
      idleMs: Long = 3600000L): Dataset[Gap] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timed = events
      .withWatermark("eventTime", watermark)
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("event_type"), col("ts_us").cast("long"), col("eventTime"))
      .as[EventRec]
    timed.groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[UserLast, Gap](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Long, String), it: Iterator[EventRec],
            state: GroupState[UserLast]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
            val out = Seq.newBuilder[Gap]
            var last = state.getOption
            sorted.foreach { e =>
              if (last.forall(e.ts_us >= _.tsUs)) {
                last.foreach(l =>
                  out += Gap(key._1, key._2, e.ts_us - l.tsUs, e.ts_us))
                last = Some(UserLast(e.ts_us, e.event_id, e.event_type))
              }
              // else: in-watermark straggler OLDER than the stored last.
              // The transition twins chain forward here, but a DURATION
              // cannot — it would emit a negative gap and regress state,
              // double-counting the next interval. Skip it; the batch
              // q119 over the at-rest table is the exact backstop.
            }
            last.foreach { l =>
              state.update(l)
              state.setTimeoutTimestamp(math.max(
                l.tsUs / 1000L + idleMs,
                state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }

  /** One cohort-value emission: the event's cohort day (UTC epoch-day
    * of its user's FIRST event), days-since-cohort, and value. */
  case class CohortValue(cohort_day: Long, k: Long, user_id: Long,
      value: Double, ts_us: Long)

  /** Streaming cohort-value attribution — the stateful half of q126's
    * LTV curve: every event emits exactly once, labeled with its user's
    * cohort day and day offset k. State per user is ONE long (the
    * cohort day), set by the first event to ARRIVE and never changed;
    * eviction must outlive the analysis horizon like [[retentionMarks]].
    *
    * Disorder contract: under per-user-ordered delivery the
    * first-arrived event IS the min-ts event and batch q126's cohort
    * assignment matches exactly (parity spec). An in-watermark
    * straggler EARLIER than the stored cohort day cannot re-label
    * already-emitted rows (append mode), so its emission clamps k at 0
    * (it counts into the cohort's day-0 value rather than emitting a
    * negative offset) — the batch q126 over the at-rest table is the
    * exact backstop. A null wire `value` (the schema permits it)
    * contributes 0.0 — the additive identity batch `sum(value)`
    * assigns it. The cumulative-LTV table is corpus-relative
    * (per-cohort sizes + running sums): aggregate at rest over the
    * emitted stream, or feed a follow-on streaming agg keyed
    * (cohort_day, k) whose state is #cohorts×#days-bounded. */
  def cohortValues(events: DataFrame, watermark: String = "10 minutes",
      idleMs: Long = 15L * 86400000L): Dataset[CohortValue] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timed = events
      .withWatermark("eventTime", watermark)
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("event_type"), col("ts_us").cast("long"),
        // null-safe: .as[ValuedEventRec] would throw on a null landing
        // in the primitive Double field and kill the whole query
        coalesce(col("value").cast("double"), lit(0.0)).as("value"),
        col("eventTime"))
      .as[ValuedEventRec]
    timed.groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, CohortValue](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[ValuedEventRec],
            state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
            val out = Seq.newBuilder[CohortValue]
            var cohort = state.getOption.getOrElse(-1L)
            var lastTs = -1L
            sorted.foreach { e =>
              lastTs = e.ts_us
              val day = Math.floorDiv(e.ts_us, 86400000000L)
              if (cohort < 0) cohort = day
              out += CohortValue(cohort, math.max(0L, day - cohort),
                user, e.value, e.ts_us)
            }
            if (lastTs >= 0) {
              state.update(cohort)
              state.setTimeoutTimestamp(math.max(lastTs / 1000L + idleMs,
                state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }

  private[streaming] case class ValuedEventRec(user_id: Long,
      event_id: Long, event_type: String, ts_us: Long, value: Double,
      eventTime: java.sql.Timestamp)

  /** Per-user conversion state: µs of the FIRST view (−1 until seen)
    * and whether the one qualifying purchase already emitted. */
  case class ConvState(tv: Long, emitted: Boolean)

  /** One conversion emission: the user's first-view → first-qualifying-
    * purchase delay (exact integer µs). */
  case class Conversion(user_id: Long, conv_us: Long, ts_us: Long)

  /** Streaming first-view → first-purchase conversion delays — the
    * stateful half of q127 (and t49's live path): each user emits AT
    * MOST ONE [[Conversion]], the moment their first purchase strictly
    * after their first view arrives. State per user is one 2-field
    * record.
    *
    * At-most-once is preserved across idle eviction: a timed-out state
    * that already EMITTED is kept as a tombstone (re-armed, 2 fields —
    * state is #converters-bounded, the same class as
    * [[retentionMarks]]' horizon state), while non-emitted idle users
    * are evicted and may start a fresh funnel later (the funnelStages
    * contract). Disorder contract: `tv` is the first view to ARRIVE —
    * under per-user-ordered delivery that IS the first view and the
    * batch min-ts semantics match exactly (parity spec); an
    * in-watermark straggler view EARLIER than the stored tv is not
    * spliced in (append mode cannot retract), so conversions around
    * such disorder can diverge from batch — the batch q127 over the
    * at-rest table is the exact backstop. The med/p90 summary is
    * corpus-relative: run it at rest over the emitted delays, or feed a
    * live quantile sketch. */
  def conversionDelays(events: DataFrame,
      watermark: String = "10 minutes",
      idleMs: Long = 3600000L): Dataset[Conversion] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timed = events
      .withWatermark("eventTime", watermark)
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("event_type"), col("ts_us").cast("long"), col("eventTime"))
      .as[EventRec]
    timed.groupByKey(_.user_id)
      .flatMapGroupsWithState[ConvState, Conversion](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[EventRec],
            state: GroupState[ConvState]) =>
          if (state.hasTimedOut) {
            // emitted users keep a tombstone, or a post-idle purchase
            // would re-emit and double-count the converter
            if (state.getOption.exists(_.emitted))
              state.setTimeoutTimestamp(
                state.getCurrentWatermarkMs() + 10L * idleMs)
            else state.remove()
            Iterator.empty
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
            val out = Seq.newBuilder[Conversion]
            var st = state.getOption.getOrElse(ConvState(-1L, false))
            var lastTs = -1L
            sorted.foreach { e =>
              lastTs = e.ts_us
              e.event_type match {
                case "view" if st.tv < 0 => st = st.copy(tv = e.ts_us)
                case "purchase" if !st.emitted && st.tv >= 0 &&
                    e.ts_us > st.tv =>
                  st = st.copy(emitted = true)
                  out += Conversion(user, e.ts_us - st.tv, e.ts_us)
                case _ => ()
              }
            }
            if (lastTs >= 0) {
              state.update(st)
              state.setTimeoutTimestamp(math.max(lastTs / 1000L + idleMs,
                state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }

  /** Streaming hourly event-rate counts — the stateful half of q109's
    * rate-anomaly monitor: a watermarked windowed count per event-time
    * hour, Append mode, so each hour emits EXACTLY once when the
    * watermark passes its end. State is the set of open hour windows
    * inside the watermark horizon — bounded by (horizon / 1 h), never by
    * stream length; late events inside the watermark still land in
    * their true hour.
    *
    * The z-scoring half (each hour against the global hourly mean/σ) is
    * inherently corpus-relative, so it runs over the emitted
    * #hours-bounded counts table: the batch q109 expression applied at
    * rest reproduces the batch answer exactly (parity spec), and a live
    * monitor keeps a running (h, Σn, Σn²) — three numbers — to score
    * each finalized hour as it lands. */
  def hourlyRates(events: DataFrame,
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark("eventTime", watermark)
      .groupBy(window(col("eventTime"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour"), col("n"))

  /** Per-user consecutive (prev_type → next_type) transition pairs —
    * the streaming form of q108's lag-window edge extraction. Append
    * mode: each edge emits exactly once, in the micro-batch its later
    * event arrives. Downstream, count edges per (prev, next) — windowed
    * in a follow-on streaming agg, or at rest (the parity spec does the
    * latter and matches the batch matrix exactly). */
  def transitionPairs(events: DataFrame, watermark: String = "10 minutes",
      idleMs: Long = 3600000L): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timed = events
      .withWatermark("eventTime", watermark)
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("event_type"), col("ts_us").cast("long"), col("eventTime"))
      .as[EventRec]
    timed.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserLast, Transition](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[EventRec],
            state: GroupState[UserLast]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // batch-window ordering inside the micro-batch
            val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
            val out = Seq.newBuilder[Transition]
            var last = state.getOption
            sorted.foreach { e =>
              last.foreach(l =>
                out += Transition(user, l.eventType, e.event_type, e.ts_us))
              last = Some(UserLast(e.ts_us, e.event_id, e.event_type))
            }
            last.foreach { l =>
              state.update(l)
              // evict after `idleMs` of inactivity on the DATA clock;
              // never set a timeout at-or-before the current watermark
              state.setTimeoutTimestamp(math.max(
                l.tsUs / 1000L + idleMs,
                state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }
}
