package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  */
object Funnel {

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
  ): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    val e = events.select(col(userCol).as("user_id"),
      col(typeCol).as("etype"), col(tsCol).as("t"))
    // anchor frames: (user_id, t = first qualifying occurrence)
    val anchors = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, _)) =>
        val typed = e.filter(col("etype") === step)
        val qualified = prev match {
          case None => typed
          case Some(p) => typed
            .join(p.select(col("user_id"), col("t").as("t_prev")), "user_id")
            .filter(col("t") > col("t_prev"))
        }
        Some(qualified.groupBy("user_id").agg(min(col("t")).as("t")))
    }.flatten
    anchors.zip(steps).zipWithIndex
      .map { case ((a, step), i) =>
        a.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1L).as("step"), lit(step).as("event_type"),
            col("n_users"))
      }
      .reduce(_ unionByName _)
  }
}
