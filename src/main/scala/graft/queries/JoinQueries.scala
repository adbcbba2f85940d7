package graft.queries

import graft.operators.{AsOfJoin, RangeJoin}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of and range-join queries over the events stream. Events timestamps
  * are TIMESTAMP(NANOS) parquet — Spark reads them as nanosecond longs
  * (`nanosAsLong`), DuckDB as timestamps; comparisons stay integral on
  * the Spark side and native on the DuckDB side.
  */
object JoinQueries {

  private def events(spark: SparkSession, dir: String): DataFrame =
    graft.sources.NanosParquet.readEvents(spark, dir)

  /** For every event: the id of the user's most recent purchase event at
    * or before it (-1 when none). The right side is deduped to one row
    * per (user_id, ts) — AsOfJoin's uniqueness precondition; without it
    * tied timestamps would resolve engine-dependently. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val left = ev.select("event_id", "user_id", "ts")
    val right = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts")
      .agg(max(col("event_id")).as("purchase_id"))
    AsOfJoin.asofJoin(left, right,
        keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        rightPayload = Seq("purchase_id"))
      .select(col("event_id"), col("user_id"),
        coalesce(col("asof_purchase_id"), lit(-1L)).as("asof_purchase_id"))
      .orderBy("event_id")
  }

  /** Same-user event pairs within 60 seconds (a != b, unordered once). */
  def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).select("event_id", "user_id", "ts")
    RangeJoin.rangeJoin(ev, ev,
        keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        delta = 60L * 1000 * 1000 * 1000)
      .filter(col("a_event_id") < col("b_event_id"))
      .select(col("a_event_id"), col("b_event_id"), col("user_id"))
      .orderBy("a_event_id", "b_event_id")
  }

  /** Batch twin of the streaming purchase-attribution join
    * (graft.streaming.EventStream.purchaseAttribution): every purchase
    * joined to the same user's clicks within the hour BEFORE it. Scale
    * shape: one shuffle on user_id with a residual time predicate — the
    * same state partitioning the watermarked stream-stream join uses. */
  def purchaseAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("click_ts"),
        col("user_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
        col("user_id").as("p_user_id"))
    purchases.join(clicks,
        col("user_id") === col("p_user_id") &&
          col("click_ts") <= col("purchase_ts") &&
          col("click_ts") >= col("purchase_ts") - lit(3600L * 1000 * 1000 * 1000))
      .select(col("purchase_id"), col("click_id"), col("user_id"))
      .orderBy("purchase_id", "click_id")
  }

  /** Batch twin of the streaming sessionizer
    * (graft.streaming.EventStream.sessionize): classic gaps-and-islands —
    * a session breaks where the gap to the previous same-user event
    * exceeds 30 minutes; session id = running count of breaks. One
    * shuffle on user_id; both windows share its partitioning. The
    * streaming form maintains the same state incrementally per key. */
  def sessionizeBatch(spark: SparkSession, dir: String): DataFrame = {
    // all time math in MICROSECONDS: DuckDB reads the nanos parquet
    // timestamp at microsecond precision, so nanosecond gaps/bounds would
    // differ in the last three digits (and could flip an exact-boundary
    // gap decision); (tus, event_id) orders identically on both engines
    val gapUs = 30L * 60 * 1000 * 1000
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(spark, dir)
      .select(col("user_id"), col("event_id"),
        // integer div: epoch-ns exceeds 2^53, double division loses ulps
        expr("ts div 1000").as("tus"))
      .withColumn("brk",
        when(lag(col("tus"), 1).over(w).isNull ||
          col("tus") - lag(col("tus"), 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("brk")).over(cum))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("tus")).as("start_us"),
        max(col("tus")).as("end_us"))
      .orderBy("user_id", "session_id")
  }

  /** Sessionization via Spark's NATIVE `session_window` — the
    * production shape: in streaming it runs on the session-window state
    * store with watermark-based state eviction (vs the custom
    * flatMapGroupsWithState twin whose NoTimeout state grows per key),
    * and in batch it is a plain codegen'd aggregation. Semantics note:
    * session_window merges events whose windows [t, t+gap) overlap, so
    * a gap of EXACTLY `gap` breaks the session (>=), while the lag-based
    * twin breaks strictly greater — the oracle mirrors >=. */
  def sessionizeNative(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("user_id"), expr("ts div 1000").as("tus"))
      .withColumn("tts", timestamp_micros(col("tus")))
      .groupBy(session_window(col("tts"), "30 minutes"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("tus")).as("start_us"),
        max(col("tus")).as("end_us"))
      .select("user_id", "n_events", "start_us", "end_us")
      .orderBy("user_id", "start_us")

  /** Strict-order funnel view -> click -> purchase
    * ([[graft.operators.Funnel.conversion]]): users who viewed, then
    * clicked strictly after their first view, then purchased strictly
    * after that first qualifying click. Timestamps compare in
    * MICROSECONDS on both sides (the sessionize convention — nanos
    * strict-compare would order sub-microsecond pairs the oracle's
    * epoch_us cannot see). */
  def eventsFunnel(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.conversion(
      events(spark, dir).select(col("user_id"), col("event_type"),
        expr("ts div 1000").as("tus")),
      "user_id", "event_type", "tus",
      Seq("view", "click", "purchase"))
      .orderBy("step")

  /** WINDOWED funnel ([[graft.operators.Funnel.windowedConversion]]):
    * same view -> click -> purchase chain, but each step must land
    * within ONE HOUR of the previous step's anchor (the ClickHouse
    * `windowFunnel(T)` bound, anchored at the first qualifying
    * occurrence), and converting steps report the median step-to-step
    * latency (doubled to stay integer-exact across engines — the
    * even-count interpolated midpoint (a+b)/2 doubles back to a+b). */
  def eventsFunnelWindow(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.windowedConversion(
      events(spark, dir).select(col("user_id"), col("event_type"),
        expr("ts div 1000").as("tus")),
      "user_id", "event_type", "tus",
      Seq("view", "click", "purchase"),
      windowGap = 3600000000L)
      .orderBy("step")

  val oracles: Map[String, String] = Map(
    "events_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
        |s1 AS (
        |  SELECT user_id, min(tus) AS t FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(e.tus) AS t
        |  FROM e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.tus > s1.t GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(e.tus) AS t
        |  FROM e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.tus > s2.t GROUP BY 1)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
        |    count(*) AS n_users FROM s1
        |  UNION ALL SELECT 2, 'click', count(*) FROM s2
        |  UNION ALL SELECT 3, 'purchase', count(*) FROM s3)
        |ORDER BY step""".stripMargin,
    "events_funnel_window" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
        |s1 AS (
        |  SELECT user_id, min(tus) AS t FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(e.tus) AS t, s1.t AS tp
        |  FROM e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.tus > s1.t
        |    AND e.tus <= s1.t + 3600000000 GROUP BY e.user_id, s1.t),
        |s3 AS (
        |  SELECT e.user_id, min(e.tus) AS t, s2.t AS tp
        |  FROM e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.tus > s2.t
        |    AND e.tus <= s2.t + 3600000000 GROUP BY e.user_id, s2.t)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
        |    count(*) AS n_users, CAST(NULL AS BIGINT) AS med_gap_x2 FROM s1
        |  UNION ALL SELECT 2, 'click', count(*),
        |    CAST(round(2 * quantile_cont(t - tp, 0.5)) AS BIGINT) FROM s2
        |  UNION ALL SELECT 3, 'purchase', count(*),
        |    CAST(round(2 * quantile_cont(t - tp, 0.5)) AS BIGINT) FROM s3)
        |ORDER BY step""".stripMargin,
    "sessionize_native" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
        |m AS (
        |  SELECT user_id, event_id, tus,
        |    CASE WHEN lag(tus) OVER w IS NULL
        |           OR tus - lag(tus) OVER w >= 1800000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |s AS (
        |  SELECT user_id, tus,
        |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM m)
        |SELECT user_id, count(*) AS n_events,
        |  min(tus) AS start_us, max(tus) AS end_us
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, start_us""".stripMargin,
    "sessionize_batch" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
        |m AS (
        |  SELECT user_id, event_id, tus,
        |    CASE WHEN lag(tus) OVER w IS NULL
        |           OR tus - lag(tus) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |s AS (
        |  SELECT user_id, tus,
        |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM m)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(tus) AS start_us, max(tus) AS end_us
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "purchase_attribution" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
        |FROM events p JOIN events c
        |  ON p.event_type = 'purchase' AND c.event_type = 'click'
        | AND p.user_id = c.user_id
        | AND epoch_ns(c.ts) <= epoch_ns(p.ts)
        | AND epoch_ns(c.ts) >= epoch_ns(p.ts) - 3600000000000
        |ORDER BY purchase_id, click_id""".stripMargin,
    "asof_join" ->
      """WITH p AS (
        |  SELECT user_id, ts, max(event_id) AS purchase_id FROM events
        |  WHERE event_type = 'purchase' GROUP BY user_id, ts)
        |SELECT e.event_id, e.user_id,
        |  coalesce(p.purchase_id, -1) AS asof_purchase_id
        |FROM events e ASOF LEFT JOIN p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY e.event_id""".stripMargin,
    "interval_join" ->
      """SELECT a.event_id AS a_event_id, b.event_id AS b_event_id, a.user_id
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        | AND abs(epoch_ns(a.ts) - epoch_ns(b.ts)) <= 60000000000
        |ORDER BY a_event_id, b_event_id""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "asof_join" -> (asofJoin _),
    "interval_join" -> (intervalJoin _),
    "purchase_attribution" -> (purchaseAttribution _),
    "sessionize_batch" -> (sessionizeBatch _),
    "sessionize_native" -> (sessionizeNative _),
    "events_funnel" -> (eventsFunnel _),
    "events_funnel_window" -> (eventsFunnelWindow _)
  )
}
