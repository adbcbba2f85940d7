package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** FUNNEL analysis — the ordered-step conversion count every product
  * analytics engine ships (Amplitude/Mixpanel funnels; ClickHouse
  * `windowFunnel`): how many users performed step 1, then step 2
  * STRICTLY AFTER their first step-1 event, then step 3 after that
  * first qualifying step-2 event, and so on. "First qualifying
  * occurrence" semantics: each step anchors at the MINIMUM timestamp
  * greater than the previous step's anchor — the standard strict-order
  * funnel definition, deterministic regardless of event order in the
  * input.
  *
  * Scale shape: step k is a filter on the step's event type, an
  * equi-join on the user key against the (shrinking) set of users who
  * reached step k-1, and a per-user min aggregate — every stage keys
  * on the same uniform user column, so after the first exchange the
  * partitioning is reusable, and each stage's frame only shrinks
  * (conversion is monotone). No window over a user's full history, no
  * per-user event-list state.
  *
  * Each anchor frame is PERSISTED and the per-step results are
  * computed eagerly while the caches are hot (one bounded row per
  * step — driver-side result assembly is metadata, not data): without
  * the persist, the k-th step's aggregate re-executes the whole
  * 1..k-1 anchor chain, an O(k^2) recomputation of the event scan.
  */
object Funnel {

  /** The lazy anchor chain: element k-1 = (user_id, t anchor, gap =
    * t - previous anchor) for users who reached step k. `windowGap`
    * bounds each step to land within that many time units of the
    * PREVIOUS step's anchor (None = unbounded, the strict-order
    * funnel). Exposed for plan-shape tests — production entry points
    * persist these and release them after the counts. */
  private[graft] def anchorChain(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String],
      windowGap: Option[Long]
  ): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val e = events.select(col(userCol).as("user_id"),
      col(typeCol).as("etype"), col(tsCol).as("t"))
    steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, _)) =>
        val typed = e.filter(col("etype") === step)
        val qualified = prev match {
          case None => typed.withColumn("t_prev", lit(null).cast("long"))
          case Some(p) =>
            val chained = typed
              .join(p.select(col("user_id"), col("t").as("t_prev")), "user_id")
              .filter(col("t") > col("t_prev"))
            windowGap.fold(chained)(g =>
              chained.filter(col("t") <= col("t_prev") + g))
        }
        // anchor = FIRST qualifying occurrence; min_by keeps that
        // anchor's gap to the previous step (deterministic: t is the
        // min and t_prev is fixed per user within a step)
        Some(qualified.groupBy("user_id").agg(
          min(col("t")).as("t"),
          (min(col("t")) - first(col("t_prev"))).as("gap")))
    }.flatten
  }

  /** Per-step conversion counts for the ordered `steps` event types.
    * Returns (step 1-based, event_type, n_users), one row per step.
    * Timestamps compare strictly (`>`): same-timestamp events do NOT
    * chain — a tie cannot prove order. */
  def conversion(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]
  ): DataFrame =
    run(events, userCol, typeCol, tsCol, steps, windowGap = None,
      withLatency = false)

  /** WINDOWED funnel (the ClickHouse `windowFunnel(T)` shape, anchored
    * at the first qualifying occurrence): step k counts only when it
    * lands within `windowGap` time units of the step k-1 anchor, and
    * each step reports the MEDIAN step-to-step latency of its
    * converting users. Returns (step, event_type, n_users,
    * med_gap_x2) — the median is emitted DOUBLED as a long so the
    * even-count interpolated midpoint (a + b) / 2 stays integer-exact
    * across engines (2 * median(longs) is always integral); step 1 has
    * no previous anchor, so its med_gap_x2 is NULL. */
  def windowedConversion(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String],
      windowGap: Long
  ): DataFrame = {
    require(windowGap > 0, s"windowGap must be positive, got $windowGap")
    run(events, userCol, typeCol, tsCol, steps, Some(windowGap),
      withLatency = true)
  }

  private def run(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String],
      windowGap: Option[Long],
      withLatency: Boolean
  ): DataFrame = {
    val spark = events.sparkSession
    val anchors = anchorChain(events, userCol, typeCol, tsCol, steps,
      windowGap).map(_.persist())
    try {
      // one bounded row per step; step k's aggregate reads step k-1's
      // cache, so the whole funnel is ONE pass per step, never O(k^2).
      // 2 * percentile(.5) of longs is exact: the interpolated midpoint
      // (a + b) / 2 doubles back to the integer a + b.
      val rows = anchors.zip(steps).zipWithIndex.map { case ((a, step), i) =>
        val r = a.agg(count(lit(1)).as("n"),
          round(percentile(col("gap"), lit(0.5)) * 2).cast("long").as("m2"))
          .head()
        Row(i + 1L, step, r.getLong(0),
          if (i == 0 || r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1)))
      }
      val schema = StructType(Seq(
        StructField("step", LongType, nullable = false),
        StructField("event_type", StringType, nullable = false),
        StructField("n_users", LongType, nullable = false),
        StructField("med_gap_x2", LongType, nullable = true)))
      val out = spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(rows).asJava), schema)
      if (withLatency) out else out.drop("med_gap_x2")
    } finally anchors.foreach(_.unpersist())
  }
}
