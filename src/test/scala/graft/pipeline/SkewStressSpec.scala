package graft.pipeline

import graft.SparkTestSession
import graft.tools.StragglerProbe
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SKEW-STRESS pins for the export/mixture/top-k family: a corpus where
  * ONE domain owns 50% of all documents (and one order priority owns
  * 50% of all orders) — the hot key every "no domain dominates" rule
  * meets in production — must finish WITHOUT a straggler task more
  * than 4× the stage-median task time ([[StragglerProbe]] listener
  * assertion). The naive unsalted plan is probed as the NEGATIVE
  * control on the same data: one of its reducers MUST read >4× the
  * stage-median shuffle bytes (the deterministic signature of the hot
  * key concentrating in one task — asserted on bytes, not wall-time,
  * so suite contention cannot flake it), proving the probe can
  * actually see the failure the salted/prefix-sum plans avoid.
  *
  * Floors: only stages with ≥ 8 tasks and a ≥ 400 ms max task are
  * judged — smaller stages are scheduling noise either way. */
class SkewStressSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** 50%-hot narrow corpus: `hot` owns half the rows, 19 cold sources
    * share the rest (the ScaleGen sf1 plant, without the text column —
    * the operators under test only read id/source/n_chars). */
  private def skewedDocs(n: Long): DataFrame =
    spark.range(0, n, 1, 32).select(
      col("id").as("doc_id"),
      when(pmod(xxhash64(lit("sk"), col("id")), lit(100)) < 50, lit("hot"))
        .otherwise(concat(lit("src"),
          pmod(xxhash64(lit("s"), col("id")), lit(19)))).as("source"),
      (pmod(xxhash64(lit("nc"), col("id")), lit(500)) + 50).as("n_chars"))

  private def withWideShuffle[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try f finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** One untimed execution, then the probed one: the first run of a
    * plan pays whole-stage-codegen compilation inside its first few
    * tasks (observed: a uniform 32-task range scan with a 10× "max"
    * that is just janino), which is warm-up, not skew. */
  private def probeWarm[A](thunk: => A): Seq[StragglerProbe.StageBalance] = {
    thunk
    StragglerProbe.measure(spark)(thunk)._2
  }

  private def stragglersOf(balances: Seq[StragglerProbe.StageBalance])
      : Seq[StragglerProbe.StageBalance] =
    balances.filter(b => b.nTasks >= 8 && b.maxMs >= 400 && b.ratio > 4.0)

  /** A true hot-key straggler is DETERMINISTIC (same partitioning →
    * same overloaded task every run); a GC/suite-contention spike is
    * not (observed in-suite: one 4×+ task in an otherwise balanced
    * salted stage that vanishes on re-probe — under the FULL 600+-test
    * suite even 3 consecutive probes have all read dirty once). So the
    * pin fails only if NO probe out of 5 comes back clean, and each
    * retry first drains the suite's accumulated shuffle garbage
    * (System.gc outside the measured window) so one collection pause
    * cannot poison every attempt. */
  private def assertBalanced(name: String)(
      probe: => Seq[StragglerProbe.StageBalance]): Unit = {
    var last: Seq[StragglerProbe.StageBalance] = Nil
    val clean = (1 to 5).exists { attempt =>
      if (attempt > 1) System.gc()
      last = stragglersOf(probe)
      last.isEmpty
    }
    assert(clean,
      s"$name straggled on the 50%-hot corpus in 5/5 probes:\n  " +
        last.mkString("\n  "))
  }

  test("salted domain cap is straggler-free on a 50%-hot corpus; " +
    "the naive rank on the same data DOES straggle (probe control)") {
    withWideShuffle {
      val docs = skewedDocs(2000000L)
      assertBalanced("domainCap")(probeWarm {
        graft.pipeline.Export
          .domainCap(docs, "doc_id", "source", cap = 20)
          .agg(count(lit(1))).head()
      })
      // negative control: the literal collect-the-group-then-take-k
      // shape, which lands the hot key's 1M structs in ONE reducer.
      // (A plain row_number+filter is NOT a control anymore: Spark's
      // WindowGroupLimit pushes the top-k map-side and largely defuses
      // the skew — worth knowing, but domainCap still wins by never
      // materializing per-group state at all.)
      //
      // The control asserts on per-task SHUFFLE-READ BYTES, not task
      // wall-time: the hot key's partially-collected lists all land in
      // one reducer, so that task's fetch bytes dwarf the stage median
      // on EVERY run — a property of the partitioning and the data,
      // where the old >4x task-TIME assertion flaked under full-suite
      // GC/scheduling contention. AQE partition coalescing is disabled
      // for the control only: it would merge the small cold partitions
      // into few large ones and hide the imbalance the probe must see
      // (the hot partition itself can never be split — it is one key).
      val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
      val prevCoalesce = spark.conf.get(coalesceKey)
      val naive =
        try {
          spark.conf.set(coalesceKey, "false")
          StragglerProbe.measure(spark) {
            docs.groupBy("source")
              .agg(slice(array_sort(collect_list(struct(
                md5(col("doc_id").cast("string")), col("doc_id")))), 1, 20)
                .as("top"))
              // consume `top` so column pruning cannot delete the sort
              .agg(sum(size(col("top")))).head()
          }._2
        } finally spark.conf.set(coalesceKey, prevCoalesce)
      assert(naive.exists(b => b.nTasks >= 8 && b.maxReadBytes >= (1L << 20) &&
          b.maxReadBytes > 4L * math.max(1L, b.medianReadBytes)),
        s"probe control: the naive hot-key collect should read >4x the " +
          s"stage-median shuffle bytes in one task, got:\n  " +
          naive.mkString("\n  "))
    }
  }

  test("mixture sampling (hash-range prefix sums) is straggler-free " +
    "on a 50%-hot corpus") {
    withWideShuffle {
      val docs = skewedDocs(2000000L)
      val budget = pmod(xxhash64(lit("bud"), col("source")), lit(400000L)) +
        lit(200000L)
      assertBalanced("mixtureSample")(probeWarm {
        graft.pipeline.Export
          .mixtureSample(docs, "doc_id", "source", "n_chars", budget)
          .agg(count(lit(1))).head()
      })
    }
  }

  test("salted grouped top-k is straggler-free when one group owns " +
    "50% of all orders") {
    withWideShuffle {
      val orders = spark.range(0, 2000000L, 1, 32).select(
        col("id").as("o_orderkey"),
        when(pmod(xxhash64(lit("pk"), col("id")), lit(100)) < 50,
          lit("1-URGENT"))
          .otherwise(concat(lit("prio"),
            pmod(xxhash64(lit("p"), col("id")), lit(4))))
          .as("o_orderpriority"),
        pmod(xxhash64(lit("tp"), col("id")), lit(50000000L))
          .as("price_cents"))
      assertBalanced("saltedTopK")(probeWarm {
        graft.operators.TopK.saltedTopK(
            orders, keys = Seq("o_orderpriority"),
            ordering = Seq(col("price_cents").desc, col("o_orderkey").asc),
            k = 3, saltFrom = col("o_orderkey"), salts = 16)
          .agg(count(lit(1))).head()
      })
    }
  }
}
