package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
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
