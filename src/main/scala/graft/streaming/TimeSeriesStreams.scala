package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twins of the temporal batch operators (§2.61/§2.62) — the
  * form they take when the observations arrive as a CDC-ordered stream
  * instead of a table: per-key state carries exactly the trailing
  * window the batch frame declares, so the streaming flags equal the
  * batch gate's on the same data (StreamingAnomalySpec asserts it).
  *
  * Ordering contract: batches must deliver each key's observations in
  * non-decreasing event time ACROSS batches (within a batch any order
  * — each batch sorts per key). The engine's CDC sources satisfy this
  * by construction: commit-SCN-ordered emission (T3) is the property
  * that makes every downstream temporal operator well-defined.
  */
object TimeSeriesStreams {

  /** One observation: event id, key, event-time micros, cent-scaled
    * value (the §2.62 integer-exact domain).
    */
  case class Obs(eventId: Long, userId: Long, tsMicros: Long, x: Long)

  /** The flag row the batch gate emits: trailing count + 3σ verdict. */
  case class AnomalyFlag(eventId: Long, userId: Long, n: Long,
      anomaly: Boolean)

  /** Per-key trailing window (≤ `window` most recent observations). */
  case class TrailState(obs: Seq[(Long, Long, Long)]) // (ts, eventId, x)

  /** Rolling 3σ anomaly flags over a stream — the `q_ts_anomaly`
    * semantics ((nx−S)² > 9(nΣx²−S²) on the trailing `window`
    * observations, integer-exact) with the trailing window held in the
    * state store per key: O(window) state per key forever, flags
    * emitted exactly once per observation (append mode).
    */
  /** One raw observation for gap-fill: key, event-time micros, event
    * id (the within-day tiebreak), carried value. `tsMicros ==
    * Long.MaxValue` is the FLUSH sentinel: it closes the key's open
    * day (emitting it) and tombstones the state — the signal a source
    * sends at shutdown, or a watermark-driven wrapper sends when a key
    * goes quiet. A key may keep observing after a flush: later days
    * continue the grid off the tombstone's carrier (matching what the
    * batch gate computes over the union of the data), the flushed day
    * is never re-emitted, and same-or-earlier days throw.
    */
  case class GapObs(userId: Long, tsMicros: Long, eventId: Long,
      value: Double)

  /** One resampled grid day (`q_ts_gapfill`'s row): epoch day, the
    * day's last observation (or the forward-filled carrier), and
    * whether the day was empty and filled.
    */
  case class DayFill(userId: Long, day: Long, value: Double,
      filled: Boolean)

  /** The open day per key: the best (max (ts, eventId)) observation of
    * the most recent day seen — emitted only when a LATER day's
    * observation (or a flush) proves the day complete. After a flush
    * the state stays as a TOMBSTONE (`emitted = true`) carrying the
    * forward-fill value: a key that wakes up later continues its grid
    * (gap days filled from the carrier, the flushed day never
    * re-emitted) instead of silently restarting it, and late data for
    * an already-emitted day still trips the loud ordering guard.
    */
  case class GapState(day: Long, ts: Long, eventId: Long, value: Double,
      emitted: Boolean)

  private val DayMicros = 86400L * 1000000L

  /** Sanity ceiling on epoch day (~year 275 000 — the timestamp type's
    * own ceiling): a corrupt tsMicros below the flush sentinel would
    * otherwise open a day the forward-fill loop then bridges with up to
    * ~10^11 rows. Beyond this is data corruption, not data.
    */
  private val MaxSaneDay = 100000000L

  private def saneDay(variant: String, user: Long, tsMicros: Long): Long = {
    val d = Math.floorDiv(tsMicros, DayMicros)
    if (d > MaxSaneDay) throw new IllegalStateException(
      s"$variant: key $user observation at tsMicros=$tsMicros (epoch day " +
        s"$d, past year ~275000) — corrupt event time; forward-filling " +
        "to it would emit a grid row per intervening day")
    d
  }

  /** End-of-key flush marker for [[gapFillStream]]. */
  def gapFlush(userId: Long): GapObs =
    GapObs(userId, Long.MaxValue, 0L, 0.0)

  /** Gap-fill + forward-fill resampling over a stream — the
    * `q_ts_gapfill` semantics (per key, the LAST observation of each
    * day lands on a contiguous daily grid; empty days carry the
    * previous value, marked `filled`) with O(1) state per key: just
    * the open day's best observation. A day is emitted exactly once,
    * the moment an observation of a later day closes it — the hard
    * half is the batch boundary: a day whose observations SPAN
    * micro-batches must keep absorbing updates until genuinely closed,
    * and the forward-fill carrier must survive restarts, both of which
    * the state store provides. Late data (an observation for a day
    * already closed) violates the ordering contract and throws rather
    * than silently rewriting emitted history.
    *
    * State bound: one row per ever-flushed key (the tombstone carrier)
    * — exact grid continuity costs that. With NoTimeout there is no
    * expiry hook; a long-lived stream with unbounded one-shot key churn
    * should use [[gapFillStreamWatermarked]] with `tombstoneTtlDays`,
    * which expires quiet carriers off the event-time clock.
    */
  def gapFillStream(events: Dataset[GapObs]): Dataset[DayFill] = {
    implicit val outEnc = Encoders.product[DayFill]
    implicit val stateEnc = Encoders.product[GapState]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[GapObs], state: GroupState[GapState]) =>
          var open = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[DayFill]
          it.toSeq.sortBy(o => (o.tsMicros, o.eventId)).foreach { o =>
            if (o.tsMicros == Long.MaxValue) {
              // flush: close and emit the open day; keep a tombstone so
              // a post-flush wake-up continues the grid rather than
              // silently restarting it (a second flush is a no-op)
              open = open.map { p =>
                if (!p.emitted)
                  out += DayFill(user, p.day, p.value, filled = false)
                p.copy(emitted = true)
              }
            } else {
              val d = saneDay("gapFillStream", user, o.tsMicros)
              open match {
                case None =>
                  open = Some(GapState(d, o.tsMicros, o.eventId, o.value,
                    emitted = false))
                case Some(p) if d == p.day && !p.emitted =>
                  // same day still open: keep the LAST observation
                  // (max (ts, eventId) — the batch gate's max_by)
                  if (o.tsMicros > p.ts ||
                    (o.tsMicros == p.ts && o.eventId > p.eventId))
                    open = Some(GapState(d, o.tsMicros, o.eventId, o.value,
                      emitted = false))
                case Some(p) if d > p.day =>
                  // later day arrived: close the open day (already done
                  // if a flush tombstoned it), forward-fill up to d
                  if (!p.emitted)
                    out += DayFill(user, p.day, p.value, filled = false)
                  var g = p.day + 1
                  while (g < d) {
                    out += DayFill(user, g, p.value, filled = true)
                    g += 1
                  }
                  open = Some(GapState(d, o.tsMicros, o.eventId, o.value,
                    emitted = false))
                case Some(p) =>
                  throw new IllegalStateException(
                    s"gapFillStream: key $user received day $d at or after " +
                      s"emitted/closed day ${p.day} — sources must deliver " +
                      "each key in non-decreasing event time across batches " +
                      "(T3), and a flushed day cannot reopen")
              }
            }
          }
          open.foreach(state.update)
          out.iterator
      }
  }

  /** [[gapFillStream]] with WATERMARK-driven day closure — the fully
    * production shape: no explicit flush sentinel; a key's open day
    * closes (emits) when the stream's event-time watermark passes the
    * end of that day, via an event-time timeout on the key's state.
    * The caller declares lateness tolerance once with
    * `withWatermark(eventTimeCol, delay)` on the input; this wrapper
    * derives the column from `tsMicros` and applies the given delay.
    *
    * Two semantic differences from the sentinel variant, both inherent
    * to watermarking: (a) a day can close BEFORE the key's next
    * observation arrives, so the forward-fill of the gap days up to
    * that next observation happens when it arrives (output content is
    * identical — only emission time differs); (b) an observation older
    * than an already-closed day is LATE DATA past the declared
    * tolerance — it throws, same as the sentinel variant's guard.
    *
    * The flush sentinel (`tsMicros == Long.MaxValue`, [[gapFlush]]) is
    * the SENTINEL variant's protocol and is REJECTED here loudly: the
    * watermark owns day closure, and a sentinel flowing through the
    * day math would compute day ≈ 1.07e11 and forward-fill ~10^11 grid
    * rows — a hang, not an error. A caller switching variants on the
    * same input stream must strip its flush markers.
    *
    * `tombstoneTtlDays` bounds state for quiet keys: a closed key's
    * tombstone (the forward-fill carrier) is dropped `tombstoneTtlDays`
    * event-time days after its last closed day, after which the key's
    * grid RESTARTS at its next observation (gap days between the
    * dropped tombstone and the new observation are not filled). 0 (the
    * default) keeps tombstones forever — exact grid continuity at the
    * cost of one small state row per ever-seen key; set a horizon on
    * long-lived streams with unbounded key churn.
    */
  def gapFillStreamWatermarked(events: Dataset[GapObs],
      delay: String = "0 seconds",
      tombstoneTtlDays: Long = 0L): Dataset[DayFill] = {
    // bounded so (day + ttl) · 86400000 cannot overflow the timer's
    // epoch-ms domain (an overflowed negative instant would expire the
    // carrier immediately — the opposite of asking for a long TTL)
    require(tombstoneTtlDays >= 0 && tombstoneTtlDays <= 100_000_000L,
      s"tombstoneTtlDays out of range: $tombstoneTtlDays")
    val spark = events.sparkSession
    import spark.implicits._
    implicit val outEnc = Encoders.product[DayFill]
    implicit val stateEnc = Encoders.product[GapState]
    val withWm = events
      .withColumn("eventTime",
        (col("tsMicros") / lit(1000000L)).cast("timestamp"))
      .withWatermark("eventTime", delay)
      .as[GapObs]
    withWm.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[GapObs], state: GroupState[GapState]) =>
          if (state.hasTimedOut) {
            val p = state.get
            if (p.emitted) {
              // the tombstone's TTL timer fired: the key stayed quiet
              // for the whole horizon — drop the carrier (bounded state
              // per quiet key). Without a configured TTL this branch is
              // unreachable (no timer is armed on a tombstone); keep
              // the carrier in that case rather than guess.
              if (tombstoneTtlDays > 0) state.remove()
              Iterator.empty
            } else {
              // the watermark passed the open day's end: close + emit,
              // keep the tombstone (the carrier for later forward-fill)
              state.update(p.copy(emitted = true))
              if (tombstoneTtlDays > 0)
                state.setTimeoutTimestamp(math.max(
                  (p.day + 1 + tombstoneTtlDays) * 86400000L,
                  state.getCurrentWatermarkMs() + 1))
              Iterator.single(DayFill(user, p.day, p.value,
                filled = false))
            }
          } else {
            var open = state.getOption
            val out = scala.collection.mutable.ArrayBuffer.empty[DayFill]
            it.toSeq.sortBy(o => (o.tsMicros, o.eventId)).foreach { o =>
              if (o.tsMicros == Long.MaxValue)
                throw new IllegalStateException(
                  s"gapFillStreamWatermarked: key $user received the flush " +
                    "sentinel (tsMicros = Long.MaxValue) — that is the " +
                    "sentinel variant's protocol; here the watermark closes " +
                    "days, and the sentinel would forward-fill ~10^11 grid " +
                    "days. Strip gapFlush() markers before this operator.")
              val d = saneDay("gapFillStreamWatermarked", user, o.tsMicros)
              open match {
                case None =>
                  open = Some(GapState(d, o.tsMicros, o.eventId, o.value,
                    emitted = false))
                case Some(p) if d == p.day && !p.emitted =>
                  if (o.tsMicros > p.ts ||
                    (o.tsMicros == p.ts && o.eventId > p.eventId))
                    open = Some(GapState(d, o.tsMicros, o.eventId, o.value,
                      emitted = false))
                case Some(p) if d > p.day =>
                  if (!p.emitted)
                    out += DayFill(user, p.day, p.value, filled = false)
                  var g = p.day + 1
                  while (g < d) {
                    out += DayFill(user, g, p.value, filled = true)
                    g += 1
                  }
                  open = Some(GapState(d, o.tsMicros, o.eventId, o.value,
                    emitted = false))
                case Some(p) =>
                  throw new IllegalStateException(
                    s"gapFillStreamWatermarked: key $user received day $d " +
                      s"at or after closed day ${p.day} — late data past " +
                      "the declared watermark tolerance")
              }
            }
            open.foreach { p =>
              state.update(p)
              // close the open day when the watermark passes its end;
              // an already-late day (recovery over old data) arms at
              // watermark+1 so the registration is always valid
              val dayEndMs = (p.day + 1) * 86400000L
              state.setTimeoutTimestamp(
                math.max(dayEndMs, state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }

  def anomalyStream(events: Dataset[Obs], window: Int = 5)
      : Dataset[AnomalyFlag] = {
    implicit val flagEnc = Encoders.product[AnomalyFlag]
    implicit val stateEnc = Encoders.product[TrailState]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[Obs], state: GroupState[TrailState]) =>
          var hist = state.getOption.map(_.obs).getOrElse(Seq.empty)
          val out = it.toSeq.sortBy(o => (o.tsMicros, o.eventId)).map { o =>
            val n = hist.size.toLong
            val s = hist.iterator.map(_._3).sum
            val q = hist.iterator.map(h => h._3 * h._3).sum
            val d = n * o.x - s
            val anom = n >= 3 && d * d > 9L * (n * q - s * s)
            hist = (hist :+ ((o.tsMicros, o.eventId, o.x))).takeRight(window)
            AnomalyFlag(o.eventId, user, n, anom)
          }
          state.update(TrailState(hist))
          out.iterator
      }
  }
}
