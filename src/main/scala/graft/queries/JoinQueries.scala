package graft.queries

import graft.operators.{AsOfJoin, RangeJoin}
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val oracles: Map[String, String] = Map(
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
    "interval_join" -> (intervalJoin _)
  )
}
