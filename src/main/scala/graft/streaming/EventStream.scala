package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the events stream.
  *
  * The reference has no streaming surface (SURVEY §2.4); these provide the
  * stream-processing shape a training-data ingest pipeline needs:
  * watermarked event-time windows (late data bounded, state pruned) and
  * custom session state via flatMapGroupsWithState. Both run identically
  * on a 1000-executor cluster — state is partitioned by group key, and
  * watermarks bound the state store size.
  *
  * The batch twin of [[windowedStats]] is
  * graft.queries.AnalyticsQueries.eventsWindow (oracle-checked); the
  * streaming form is verified with MemoryStream in EventStreamSpec.
  */
object EventStream {

  /** Watermarked hourly window aggregation. Append-mode compatible:
    * results finalize once the watermark passes the window end. */
  def windowedStats(events: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        approx_count_distinct("user_id").as("approx_users"),
        sum(round(col("value") * 100).cast("long")).as("sum_value_cents"))
      .select(
        unix_timestamp(col("window.start")).cast("long").as("hour_epoch"),
        col("event_type"), col("n_events"), col("approx_users"),
        col("sum_value_cents"))

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)
  final case class Session(user_id: Long, n_events: Long,
      start_epoch: Long, end_epoch: Long, closed: Boolean)
  final case class SessionState(n: Long, startMs: Long, lastMs: Long)

  final case class DedupedEvent(event_id: Long, user_id: Long,
      event_type: String, first_seen: Boolean)

  /** Streaming exact dedup: emit each (user_id, event_type) content key
    * once; later arrivals are marked duplicates. State = one boolean per
    * key via mapGroupsWithState — the streaming counterpart of
    * [[graft.pipeline.Dedup.exact]] for continuous ingest (at scale,
    * state is partitioned by key and bounded by a TTL timeout). */
  def streamingDedup(events: Dataset[Event]): Dataset[DedupedEvent] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[Boolean, DedupedEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: (Long, String), rows: Iterator[Event], state: GroupState[Boolean]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var seen = state.getOption.getOrElse(false)
          val out = sorted.map { e =>
            val first = !seen
            seen = true
            DedupedEvent(e.event_id, e.user_id, e.event_type, first)
          }
          state.update(seen)
          out.iterator
      }
  }

  /** Streaming dedup on Spark's NATIVE watermark-bounded operator
    * (`dropDuplicatesWithinWatermark`): emits the first arrival per
    * (user_id, event_type) and drops later ones arriving within the
    * watermark horizon; the state store evicts keys once the watermark
    * passes — bounded state, vs the custom-state twin above whose
    * NoTimeout entries live forever (kept as the explicit-primitive
    * demo). The production shape for continuous ingest dedup. */
  def streamingDedupNative(events: DataFrame,
      watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Watermarked stream-stream interval join: every purchase joined to
    * the same user's click events within `windowMs` BEFORE it. Both
    * sides carry watermarks and the join condition bounds the time
    * range, so Spark can prune both state stores — the unbounded-state
    * trap of stream-stream joins is avoided by construction. State is
    * partitioned by the equi-key (user_id); at 1000 executors each task
    * holds only its key range's recent window. */
  def purchaseAttribution(
      clicks: DataFrame,    // (event_id, ts, user_id, ...)
      purchases: DataFrame, // (event_id, ts, user_id, ...)
      windowMs: Long = 60L * 60 * 1000,
      watermarkDelay: String = "1 hour"
  ): DataFrame = {
    val c = clicks
      .select(col("event_id").as("click_id"), col("ts").as("click_ts"),
        col("user_id"))
      .withWatermark("click_ts", watermarkDelay)
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
        col("user_id").as("p_user_id"))
      .withWatermark("purchase_ts", watermarkDelay)
    p.join(c,
      col("user_id") === col("p_user_id") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $windowMs MILLISECONDS"))
      .select(col("purchase_id"), col("click_id"), col("p_user_id").as("user_id"),
        unix_timestamp(col("purchase_ts")).cast("long").as("purchase_epoch"),
        unix_timestamp(col("click_ts")).cast("long").as("click_epoch"))
  }

  /** Sessionization on Spark's NATIVE session windows — the production
    * streaming shape: the session-window state store merges overlapping
    * [t, t+gap) event windows per key and the WATERMARK evicts closed
    * sessions, so state is bounded by the lateness horizon instead of
    * growing per key forever (the custom-state twin below keeps one
    * entry per user with NoTimeout — fine for demos, not for a 100 TB
    * ingest). Append mode: a session emits once the watermark passes
    * its close. Batch twin: graft.queries.JoinQueries.sessionizeNative
    * (oracle-checked, same expression). */
  def sessionizeWindow(events: DataFrame,
      gap: String = "30 minutes", watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("n_events"),
        unix_timestamp(col("session_window.start")).cast("long").as("start_epoch"),
        unix_timestamp(col("session_window.end")).cast("long").as("end_epoch"))

  /** Session assembly with a 30-minute inactivity gap via
    * flatMapGroupsWithState: one state entry per user, pruned by
    * processing-time timeout — the custom-state streaming primitive. */
  def sessionize(events: Dataset[Event],
      gapMs: Long = 30L * 60 * 1000): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var cur = state.getOption
          val out = Seq.newBuilder[Session]
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.lastMs <= gapMs =>
                cur = Some(s.copy(n = s.n + 1, lastMs = t))
              case Some(s) =>
                out += Session(userId, s.n, s.startMs / 1000, s.lastMs / 1000, closed = true)
                cur = Some(SessionState(1, t, t))
              case None =>
                cur = Some(SessionState(1, t, t))
            }
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }
}
