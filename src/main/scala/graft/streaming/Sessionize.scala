package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** [EXT §2.9] Custom-state streaming: gap-based sessionization with
  * `flatMapGroupsWithState` — the KeyValueGroupedDataset custom-state
  * tier of the streaming surface (the declarative `session_window` form
  * is the `sessionization` query; this is the hand-rolled state machine
  * for semantics session_window can't express, e.g. emitting per-session
  * running metadata).
  *
  * State per user: the open session. Events are folded in event-time
  * order; a gap >= `gapMinutes` closes the session and emits it.
  * Sessions still open when the state times out (watermark passes
  * last-event + gap) are emitted then — Append-mode semantics identical
  * to session_window's. The trailing open session of a run-once
  * (AvailableNow) stream stays unemitted by design: the stream doesn't
  * know it's over.
  */
object Sessionize {

  final case class SessionOut(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      cnt: Long,
      sum_value: Double)

  // Public: the state Encoder's generated (Janino) code invokes the field
  // accessors reflectively-by-name; a private nested class makes them
  // unresolvable ("no applicable method for zero parameters").
  final case class OpenSession(
      start: Long, last: Long, cnt: Long, total: Double) // micros

  /** Fold ONE event into a sorted list of disjoint session intervals —
    * merging is ORDER-INDEPENDENT (an event extends the interval it lands
    * within gap of, bridging at most one neighbor; property-tested in
    * GraftProperties), so the per-batch group iterator needs no buffering
    * or sorting. Memory per (key, batch) is O(#disjoint sessions in the
    * batch's event-time span) <= span/gap + 1 — bounded by TIME, not by
    * event count; a hot key with millions of events per batch folds in
    * O(1) state per event. (The previous implementation collected and
    * sorted the whole group per batch: unbounded per-group memory.)
    */
  private[graft] def mergeEvent(gapMicros: Long)(
      ivs: List[OpenSession], t: Long, v: Double): List[OpenSession] = {
    val (before, rest) = ivs.span(s => s.last + gapMicros <= t)
    rest match {
      case s :: tail if t + gapMicros > s.start =>
        val ext = OpenSession(
          math.min(s.start, t), math.max(s.last, t), s.cnt + 1, s.total + v)
        tail match {
          // extending the right edge can bridge into (at most) the next
          // interval; the >= gap separation invariant blocks cascades
          case n :: rest2 if n.start - ext.last < gapMicros =>
            before ::: OpenSession(ext.start, math.max(ext.last, n.last),
              ext.cnt + n.cnt, ext.total + n.total) :: rest2
          case _ => before ::: ext :: tail
        }
      case _ => before ::: OpenSession(t, t, 1, v) :: rest
    }
  }

  def apply(
      spark: SparkSession,
      events: DataFrame, // streaming DF with ts TIMESTAMP (LTZ), user_id, value
      gapMinutes: Int): Dataset[SessionOut] = {
    import spark.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L

    def micros(t: Timestamp): Long = t.getTime * 1000L + t.getNanos / 1000 % 1000
    def ts(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000)
      t.setNanos((us % 1000000L).toInt * 1000)
      t
    }
    def emit(s: OpenSession, uid: Long): SessionOut =
      SessionOut(uid, ts(s.start), ts(s.last + gapMicros), s.cnt, s.total)

    // select BEFORE the watermark: a projection that rewrites `ts` (even a
    // no-op cast) strips the watermark tag and EventTimeTimeout rejects
    // the plan.
    events
      .select(col("user_id"), col("ts"), col("value"))
      .withWatermark("ts", s"$gapMinutes minutes")
      .as[(Long, Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, rows: Iterator[(Long, Timestamp, Double)],
            state: GroupState[OpenSession]) => {
          if (state.hasTimedOut) {
            val out = state.getOption.map(emit(_, uid))
            state.remove()
            out.iterator
          } else {
            val merge = mergeEvent(gapMicros) _
            var ivs: List[OpenSession] = state.getOption.toList
            rows.foreach { case (_, t, v) => ivs = merge(ivs, micros(t), v) }
            if (ivs.isEmpty) Iterator.empty
            else {
              // every interval but the latest is followed by an OBSERVED
              // gap >= gapMinutes — closed; the latest stays open in state
              val open = ivs.last
              state.update(open)
              state.setTimeoutTimestamp(open.last / 1000 + gapMinutes * 60L * 1000)
              ivs.init.map(emit(_, uid)).iterator
            }
          }
        })
  }
}
