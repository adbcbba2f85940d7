package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Funnel.conversion]]: strict-order anchoring, tie non-chaining,
  * monotone step shrink. */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String, Long)],
      steps: Seq[String]): Map[Long, Long] =
    Funnel.conversion(rows.toDF("user_id", "event_type", "t"),
        "user_id", "event_type", "t", steps)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

  test("strict ordering: steps chain only through increasing " +
    "timestamps; anchors are the FIRST qualifying occurrence") {
    val rows = Seq(
      // user 1 completes: view@1 click@2 purchase@3
      (1L, "view", 1L), (1L, "click", 2L), (1L, "purchase", 3L),
      // user 2: click BEFORE the view never counts; no click after
      (2L, "click", 1L), (2L, "view", 2L), (2L, "purchase", 3L),
      // user 3: anchors at the FIRST view (t=1); the click@2 chains
      // even though a later view@5 exists
      (3L, "view", 1L), (3L, "view", 5L), (3L, "click", 2L),
      // user 4: purchase ties the click timestamp -> does not chain
      (4L, "view", 1L), (4L, "click", 2L), (4L, "purchase", 2L))
    assert(run(rows, Seq("view", "click", "purchase")) ==
      Map(1L -> 4L, 2L -> 3L, 3L -> 1L))
  }

  test("a user re-entering earlier steps cannot shortcut later ones " +
    "(anchor stays the first qualifying, not the best)") {
    // first view at t=10; the only click is at t=5 (before) -> no step 2,
    // even though a view at t=1 would have made it qualify if the anchor
    // re-sorted — it does: the FIRST view is t=1 here, so click@5 chains
    val rows = Seq(
      (1L, "view", 1L), (1L, "view", 10L), (1L, "click", 5L),
      (2L, "view", 10L), (2L, "click", 5L))
    assert(run(rows, Seq("view", "click")) == Map(1L -> 2L, 2L -> 1L))
  }

  test("single-step funnel counts distinct users with the event") {
    val rows = Seq((1L, "view", 1L), (1L, "view", 2L), (2L, "view", 1L),
      (3L, "click", 1L))
    assert(run(rows, Seq("view")) == Map(1L -> 2L))
  }
}
