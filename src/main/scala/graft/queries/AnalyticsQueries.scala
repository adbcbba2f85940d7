package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classic analytics over the testdata — aggregation, broadcast-join
  * rollup, windowed top-k, event-time bucketing. The reference itself
  * exposes no SQL surface (SURVEY §2.4); these exercise the Spark surface
  * a user of the engine gets for free and anchor the bench on shapes whose
  * 100 TB plans matter (partial aggregation, broadcast vs shuffle join,
  * per-group top-k without a global sort).
  *
  * All money/quantity outputs are integer cents (per-ROW rounding then
  * integer sums) — float-summation order can differ across engines, so
  * only integer math crosses the oracle boundary.
  */
object AnalyticsQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("long")

  /** TPC-H Q1-shaped pricing summary. Map-side partial agg, one shuffle
    * on the 6-value group key. */
  def aggPricing(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(cents(col("l_quantity"))).as("sum_qty_cents"),
        sum(cents(col("l_extendedprice"))).as("sum_price_cents"),
        sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("sum_disc_price_cents"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Revenue by market segment: lineitem |><| orders (shuffle on the fact
    * key) |><| customer (broadcast — dim fits in memory at any SF where
    * customers ~ SF * 150k; at 100 TB switch to shuffle via AQE's
    * size-based demotion, which the explicit hint still allows). */
  def joinRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue_cents"),
        count(lit(1)).as("n_lines"))
      .orderBy("c_mktsegment")
  }

  /** TPC-H Q3 shape (shipping priority): segment-filtered customers
    * BROADCAST against date-filtered orders, shuffle-joined with the
    * lineitem fact on the order key, grouped per order, global top-10
    * via TakeOrderedAndProject (no full sort — the limit prunes
    * per-partition before one tiny merge). Filters sit on each scan so
    * they push into the parquet readers. */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cut = to_date(lit("1998-07-01"))
    val c = t(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val o = t(spark, dir, "orders").filter(col("o_orderdate") < cut)
    val li = t(spark, dir, "lineitem").filter(col("l_shipdate") > cut)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("o_orderpriority"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q10 shape (returned items): return-flagged lineitem against
    * a date-windowed orders join, customer enriched with the broadcast
    * nation dim, top-20 revenue losers. */
  def returnedItems(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem").filter(col("l_returnflag") === "R")
    val o = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= to_date(lit("1997-01-01")) &&
        col("o_orderdate") < to_date(lit("1998-01-01")))
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("revenue_cents"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("revenue_cents").desc, col("c_custkey").asc)
      .limit(20)
  }

  /** TPC-H Q5 shape (local supplier volume): the fact shuffles on the
    * order key once, the customer dim joins on custkey, and the LOCAL
    * constraint (customer and supplier in the same nation) rides the
    * broadcast supplier join as a second equi-key — no extra shuffle.
    * nation ⋈ region (filtered to one region) broadcasts as one tiny
    * dim. */
  def localSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val r = t(spark, dir, "region").filter(col("r_name") === "ASIA")
    val n = t(spark, dir, "nation")
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val s = t(spark, dir, "supplier")
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= to_date(lit("1997-01-01")) &&
        col("o_orderdate") < to_date(lit("1998-01-01")))
    val li = t(spark, dir, "lineitem")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(s), li("l_suppkey") === s("s_suppkey") &&
        c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .groupBy("n_name")
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("revenue_cents"),
        count(lit(1)).as("n_lines"))
      .orderBy("n_name")
  }

  /** TPC-H Q18 shape (large orders): the heavy-order key set comes from
    * one grouped HAVING aggregate over the fact (map-side partial agg),
    * then joins orders + customer — the aggregate-driven semi-join
    * pattern. Top-50 by value via TakeOrderedAndProject. `l_quantity`
    * is integral in this corpus, so the double sum (and the > 250
    * boundary) is fp-exact on every engine. */
  def largeOrders(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val big = li.groupBy("l_orderkey")
      .agg(sum(col("l_quantity")).as("qty"))
      .filter(col("qty") > 250.0)
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    o.join(big, o("o_orderkey") === big("l_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .select(c("c_custkey"), col("c_name"), o("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        cents(col("o_totalprice")).as("price_cents"),
        col("qty").cast("long").as("sum_qty"))
      .orderBy(col("price_cents").desc, col("o_orderkey").asc)
      .limit(50)
  }

  /** Top-3 orders by value per priority: per-group top-k via window
    * rank — shuffles once on the partition key; no global sort. */
  def windowTopK(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .withColumn("price_cents", cents(col("o_totalprice")))
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("price_cents").desc, col("o_orderkey").asc)
    o.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select("o_orderpriority", "rnk", "o_orderkey", "price_cents")
      .orderBy("o_orderpriority", "rnk")
  }

  /** The SAME top-k through the skew-proof two-phase form
    * ([[graft.operators.TopK.saltedTopK]]) — the ordering is total
    * (price desc, orderkey tie-break), so the salted result must
    * hash-match `window_topk`'s oracle verbatim. */
  def windowTopKSalted(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .withColumn("price_cents", cents(col("o_totalprice")))
    graft.operators.TopK.saltedTopK(
        o, keys = Seq("o_orderpriority"),
        ordering = Seq(col("price_cents").desc, col("o_orderkey").asc),
        k = 3, saltFrom = col("o_orderkey"), salts = 8)
      .select("o_orderpriority", "rnk", "o_orderkey", "price_cents")
      .orderBy("o_orderpriority", "rnk")
  }

  /** Event-time hourly rollup — the batch twin of the streaming windowed
    * aggregation (graft.streaming.EventStream.windowedStats). The events
    * parquet stores TIMESTAMP(NANOS), which Spark only reads as a long
    * (`nanosAsLong`); the hour bucket is integer arithmetic on nanos. */
  def eventsWindow(spark: SparkSession, dir: String): DataFrame = {
    graft.sources.NanosParquet.readEvents(spark, dir)
      .groupBy(
        expr("((ts div 1000000000) div 3600) * 3600").cast("long")
          .as("hour_epoch"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(cents(col("value"))).as("sum_value_cents"))
      .orderBy("hour_epoch", "event_type")
  }

  /** Event-transition matrix — first-order Markov path analysis over
    * per-user event streams (the "what do users do next" product
    * question; the empirical transition counts double as the training
    * statistics for Markov-chain attribution). Each user's events order
    * by (ts, event_id) — a TOTAL order, event_id is unique — and every
    * adjacent pair contributes one (src, dst) transition; the matrix
    * carries the count and the integer fixed-point row-conditional
    * probability `P(dst | src) = (n * 1e6) div n_src`.
    *
    * Scale shape: ONE shuffle (the per-user lead window), then
    * everything is event-type-bounded — map-side partial counts onto
    * |types|² keys, a margin aggregate over the cached matrix, and a
    * deterministic full-matrix emit (no limit needed at this
    * cardinality). */
  /** The transition-COUNT half of [[eventsTransitions]], split out so
    * the plan pin (PlanQualitySpec) asserts the PRODUCTION shape — one
    * user-window exchange, map-side-partial counts onto type-bounded
    * keys — rather than a hand-copied replica that could drift. */
  private[graft] def eventsTransitionCounts(spark: SparkSession,
      dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    graft.sources.NanosParquet.readEvents(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .where(col("next_type").isNotNull)
      .groupBy(col("event_type").as("src"), col("next_type").as("dst"))
      .agg(count(lit(1)).as("n"))
  }

  def eventsTransitions(spark: SparkSession, dir: String): DataFrame = {
    // cached: the margin and the final join both consume the matrix —
    // |types|^2 rows, trivially memory-resident
    val c12 = eventsTransitionCounts(spark, dir).cache()
    val c1 = c12.groupBy("src").agg(sum(col("n")).as("n_src"))
    val out = c12.join(c1, "src")
      .select(col("src"), col("dst"), col("n"),
        expr("(n * 1000000) div n_src").as("p_x1e6"))
      .orderBy(col("n").desc, col("src"), col("dst"))
    // materialize the |types|^2-row matrix and RELEASE the cache —
    // repeated calls must not accumulate dead cached blocks
    val materialized = out.localCheckpoint(true)
    c12.unpersist()
    materialized
  }

  /** Corpus vocabulary top-k: explode tokens, global term counts, top 20
    * by frequency (term tiebreak). Scale shape: map-side partial counts
    * over the exploded terms, ONE shuffle on term, top-k without a global
    * sort of the vocabulary. */
  def vocabTopK(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("term").asc)
      .limit(20)

  /** Exact vocabulary heavy hitters (count >= 1/500 of all tokens) via
    * SpaceSaving candidates + broadcast-semi-join recount
    * ([[graft.pipeline.Sketches.heavyHitters]]) — never shuffles the
    * full vocabulary; the oracle recomputes the same set exactly with
    * a plain GROUP BY ... HAVING, certifying the candidate phase's
    * superset guarantee end-to-end. */
  def heavyHittersQuery(spark: SparkSession, dir: String): DataFrame =
    graft.pipeline.Sketches.heavyHitters(
      t(spark, dir, "documents")
        .select(explode(split(col("text"), " ")).as("term")),
      "term", denom = 500)
      .orderBy("term")

  /** Multi-level rollup of the pricing aggregate: (flag, status), (flag),
    * and grand total in one pass — Spark's partial-aggregate rollup. */
  def rollupPricing(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        sum(cents(col("l_extendedprice"))).as("sum_price_cents"),
        count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("sum_price_cents"), col("n"))
      .orderBy("flag", "status")

  /** Full CUBE with grouping_id disambiguation: all four grouping sets
    * of (flag, status) in one pass. Unlike [[rollupPricing]]'s coalesce
    * trick, `grouping_id()` distinguishes a REAL NULL group value from a
    * rolled-up level — the standard disambiguator (bit i set = column i
    * rolled up; Spark and the SQL-standard GROUPING() agree on the bit
    * order). One shuffle: Spark expands the grouping sets map-side. */
  def cubePricing(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(
        grouping_id().cast("long").as("gid"),
        sum(cents(col("l_extendedprice"))).as("sum_price_cents"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag").as("flag"),
        col("l_linestatus").as("status"),
        col("gid"), col("sum_price_cents"), col("n"))
      .orderBy("gid", "flag", "status")

  /** Set operations over supplier key sets: suppliers shipping both
    * returned ('R') and accepted ('A') lines (INTERSECT) and only
    * returned (EXCEPT), emitted as one UNION ALL relation. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val r = li.filter(col("l_returnflag") === "R").select("l_suppkey").distinct()
    val a = li.filter(col("l_returnflag") === "A").select("l_suppkey").distinct()
    val both = r.intersect(a).withColumn("relation", lit("both"))
    val onlyR = r.except(a).withColumn("relation", lit("only_r"))
    both.unionByName(onlyR).orderBy("relation", "l_suppkey")
  }

  /** Exact per-group discrete quantiles (p25/p50/p75/p95) of line price:
    * rank rows per group, pick the value at ceil(q*n) — deterministic and
    * engine-replayable where percentile sketches (approx_percentile /
    * DuckDB quantile) are not. The ceil is computed in INTEGER space
    * (q_pct*n + 99)/100: a double 0.95*n can land on either side of an
    * integer boundary depending on the engine's literal type.
    * Scale shape: one shuffle on the group key; the rank window sorts
    * within groups only (no global sort). */
  def quantiles(spark: SparkSession, dir: String): DataFrame = {
    val base = t(spark, dir, "lineitem")
      .select(col("l_returnflag"), cents(col("l_extendedprice")).as("price_cents"))
    val wRank = Window.partitionBy("l_returnflag").orderBy("price_cents")
    val wAll = Window.partitionBy("l_returnflag")
    base
      .withColumn("rn", row_number().over(wRank).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("q_pct", explode(array(lit(25L), lit(50L), lit(75L), lit(95L))))
      .filter(col("rn") ===
        greatest(lit(1L), floor((col("q_pct") * col("n") + 99L) / lit(100.0))))
      .select(col("l_returnflag"), col("q_pct"),
        col("price_cents").as("value_cents"))
      .orderBy("l_returnflag", "q_pct")
  }

  /** Fixed-width histogram of event values: bin = floor(value_cents /
    * 2000), per-bin count and integer sum. Narrow row transform + one
    * shuffle on the bin key. */
  def valueHistogram(spark: SparkSession, dir: String): DataFrame =
    graft.sources.NanosParquet.readEvents(spark, dir)
      .select(cents(col("value")).as("value_cents"))
      .withColumn("bin", floor(col("value_cents") / 2000L).cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("value_cents")).as("sum_cents"))
      .orderBy("bin")

  /** Z-order layout audit: bucket lineitem by the top bits of the Morton
    * code over (orderkey, suppkey) — per bucket, BOTH keys' ranges stay
    * tight (the property that makes min/max file stats prune scans on
    * either column at 100 TB). Narrow per-row z-value + one shuffle on
    * the bucket id; no global sort. */
  /** One definition of the z-layout constants for query AND oracle. */
  private val ZBits = 16
  private val ZBucketShift = 2 * ZBits - 4 // top 4 bits -> 16 buckets

  def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem").select(
      (col("l_orderkey") % 65536).as("okey"),
      (col("l_suppkey") % 65536).as("skey"))
    val z = graft.operators.ZOrder.zValue2(col("okey"), col("skey"), ZBits)
    li.withColumn("bucket", shiftright(z, ZBucketShift))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n"),
        min(col("okey")).as("min_okey"), max(col("okey")).as("max_okey"),
        min(col("skey")).as("min_skey"), max(col("skey")).as("max_skey"))
      .orderBy("bucket")
  }

  /** TPC-H Q4 shape (order priority check): orders in a date window that
    * contain at least one returned line — a correlated EXISTS, planned as
    * a LEFT SEMI join on the order key. The lineitem side carries only
    * the filter + key columns (column-pruned scan), and the semi join
    * never duplicates orders no matter how many lines match. The corpus
    * has no l_commitdate/l_receiptdate, so the "late delivery" predicate
    * becomes `l_returnflag = 'R'` — same plan shape. */
  def orderPriority(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= to_date(lit("1997-01-01")) &&
        col("o_orderdate") < to_date(lit("1997-07-01")))
    val late = t(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R").select("l_orderkey")
    o.join(late, o("o_orderkey") === late("l_orderkey"), "leftsemi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q7 shape (volume shipping): the nation dim joins the fact
    * TWICE under different roles (supplier nation vs customer nation),
    * and the two-country restriction is a disjunction over the PAIR —
    * it can only be applied after both dims are attached. Both nation
    * joins and the supplier join broadcast; the only shuffles are the
    * fact⋈orders and orders⋈customer equi-joins. */
  def volumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= to_date(lit("1997-01-01")) &&
        col("l_shipdate") < to_date(lit("1998-01-01")))
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    val s = t(spark, dir, "supplier")
    val n = t(spark, dir, "nation")
    val n1 = n.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = n.select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(s), li("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n1), s("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), c("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("revenue_cents"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q14 shape (promo revenue): conditional aggregation over a
    * month of the fact against the broadcast part dim — numerator and
    * denominator in ONE pass (a single scan + broadcast join; the CASE
    * rides the aggregate). Both emitted as integer cents; the oracle
    * takes the same two sums, so no float division crosses engines. */
  def promoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= to_date(lit("1997-09-01")) &&
        col("l_shipdate") < to_date(lit("1997-10-01")))
    val p = t(spark, dir, "part")
    val rev = cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", rev).otherwise(0L)).as("promo_cents"),
        sum(rev).as("total_cents"))
  }

  /** TPC-H Q19 shape (discounted revenue): an OR of three
    * (brand, size-range, quantity-range) conjunctions across the
    * lineitem⋈part join. The part-only legs (brand, size) push into the
    * broadcast-side scan as one disjunction; the mixed legs evaluate on
    * the joined row. Exercises disjunctive predicate handling — the
    * optimizer must NOT expand this into a union of three scans. */
  def disjunctiveParts(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val p = t(spark, dir, "part")
    val joined = li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
    val arm1 = col("p_brand") === "Brand#1" &&
      col("p_size").between(1, 15) && col("l_quantity").between(1, 11)
    val arm2 = col("p_brand") === "Brand#2" &&
      col("p_size").between(1, 25) && col("l_quantity").between(10, 20)
    val arm3 = col("p_brand") === "Brand#3" &&
      col("p_size").between(1, 35) && col("l_quantity").between(20, 30)
    joined.filter(arm1 || arm2 || arm3)
      .agg(
        sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue_cents"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q21 shape (suppliers who kept orders waiting): one EXISTS and
    * one NOT EXISTS, both correlated on the order key with a suppkey
    * INEQUALITY — a LEFT SEMI then a LEFT ANTI self-join of the fact,
    * each shuffling on the equi-key (orderkey) with the `<>` riding the
    * join condition. "Failed" is `l_returnflag = 'R'` (the corpus has no
    * receipt/commit dates). Top-20 via TakeOrderedAndProject. */
  def waitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders").filter(col("o_orderstatus") === "F")
    val s = t(spark, dir, "supplier")
    val l1 = li.filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_suppkey")
    val others = li.select(col("l_orderkey").as("r_okey"), col("l_suppkey").as("r_skey"))
    val othersFailed = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("f_okey"), col("l_suppkey").as("f_skey"))
    l1
      .join(others, l1("l_orderkey") === col("r_okey") &&
        l1("l_suppkey") =!= col("r_skey"), "leftsemi")
      .join(othersFailed, l1("l_orderkey") === col("f_okey") &&
        l1("l_suppkey") =!= col("f_skey"), "leftanti")
      .join(o, l1("l_orderkey") === o("o_orderkey"), "leftsemi")
      .join(broadcast(s), l1("l_suppkey") === s("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(20)
  }

  /** TPC-H Q22 shape (idle rich customers): a scalar aggregate subquery
    * (global mean balance) gates the customer scan, then a NOT EXISTS
    * against date-filtered orders (no orders since 1998 — the unwindowed
    * variant is vacuous in this corpus) — broadcast of a ONE-ROW
    * aggregate + a LEFT ANTI join on the customer key. The mean comparison is done in integer
    * space (bal_cents * count > sum_cents), so no float mean crosses
    * the engine boundary. */
  def idleCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    val o = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= to_date(lit("1998-01-01")))
      .select("o_custkey")
    val avgT = c.filter(col("c_acctbal") > 0)
      .agg(sum(cents(col("c_acctbal"))).as("bal_sum"), count(lit(1)).as("bal_cnt"))
    c.crossJoin(broadcast(avgT))
      .filter(cents(col("c_acctbal")) * col("bal_cnt") > col("bal_sum"))
      .join(o, c("c_custkey") === o("o_custkey"), "leftanti")
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("numcust"),
        sum(cents(col("c_acctbal"))).as("totacctbal_cents"))
      .orderBy("n_name")
  }

  /** TPC-H Q6 shape (forecast revenue): filter + global aggregate with
    * NO join — every predicate (date window, discount band, quantity
    * cap) pushes into the parquet scan, so at 100 TB the whole query is
    * a pruned scan + one partial-agg merge. The revenue term
    * `price * discount` rounds per row to integer cents. */
  def forecastRevenue(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= to_date(lit("1997-01-01")) &&
        col("l_shipdate") < to_date(lit("1998-01-01")) &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(
        sum(cents(col("l_extendedprice") * col("l_discount"))).as("revenue_cents"),
        count(lit(1)).as("n_lines"))

  /** TPC-H Q13 shape (customer order distribution): LEFT OUTER join with
    * the selective predicate on the JOIN side (filtering orders BEFORE
    * an outer join is equivalent to putting it in the ON clause — and
    * prunes the shuffle), then a two-level aggregate. The first groupBy
    * reuses the join's hash partitioning on the customer key (no second
    * shuffle); the second aggregate is over ~20 distinct counts. */
  def customerDistribution(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer").select("c_custkey")
    val o = t(spark, dir, "orders")
      .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
      .select("o_custkey", "o_orderkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q15 shape (top supplier): quarter revenue per supplier (ONE
    * shuffle, map-side partial agg), then the max gate rides a broadcast
    * of the ONE-ROW global max — the classic "WHERE x = (SELECT max)"
    * decorrelation with no self-join of the fact. Integer cents make the
    * max equality engine-exact. */
  def topSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= to_date(lit("1997-07-01")) &&
        col("l_shipdate") < to_date(lit("1997-10-01")))
      .groupBy("l_suppkey")
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("total_revenue_cents"))
    val mx = rev.agg(max(col("total_revenue_cents")).as("mx"))
    t(spark, dir, "supplier")
      .join(rev, col("s_suppkey") === col("l_suppkey"))
      .crossJoin(broadcast(mx))
      .filter(col("total_revenue_cents") === col("mx"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue_cents"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q17 shape (small-quantity revenue): the correlated
    * "l_quantity < 0.2 * avg(l_quantity) per part" subquery decorrelated
    * into a per-part aggregate joined back to the fact. The part filter
    * broadcasts FIRST so the aggregate runs only over relevant parts'
    * lines; the mean comparison happens in integer space
    * (5 * qty * count < sum) — no float mean crosses engines. The
    * agg output and the join both hash on the part key, so AQE plans
    * ONE fact shuffle. */
  def smallQuantityRevenue(spark: SparkSession, dir: String): DataFrame = {
    val p = t(spark, dir, "part")
      .filter(col("p_type") === "MEDIUM").select("p_partkey")
    val rel = t(spark, dir, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
    val pq = rel.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("l_quantity")).cast("long").as("sq"),
        count(lit(1)).as("cq"))
    rel.join(pq, col("l_partkey") === col("pk"))
      .filter(lit(5L) * col("l_quantity").cast("long") * col("cq") < col("sq"))
      .agg(sum(cents(col("l_extendedprice"))).as("price_cents"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q2 shape (min-cost supplier): the corpus has no partsupp, so
    * the part-supplier cost relation derives from lineitem — min unit
    * price (cents) per (part, supplier). The region-restricted supplier
    * dim broadcasts onto that aggregate, the per-part minimum re-joins
    * on (part, cost) — the decorrelated "= (SELECT min ...)" — and the
    * filtered part dim broadcasts last. Top-100 via
    * TakeOrderedAndProject; the only fact-sized shuffle is the first
    * (part, supplier) aggregate. */
  def minCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val ps = t(spark, dir, "lineitem")
      .groupBy("l_partkey", "l_suppkey")
      .agg(min(cents(col("l_extendedprice") / col("l_quantity"))).as("cost_cents"))
    val sup = t(spark, dir, "supplier")
      .join(t(spark, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .join(t(spark, dir, "region").filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val psr = ps.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
    val minc = psr.groupBy(col("l_partkey").as("mk"))
      .agg(min(col("cost_cents")).as("min_cost"))
    val p = t(spark, dir, "part")
      .filter(col("p_type") === "LARGE" && col("p_size").between(10, 30))
    psr
      .join(minc, col("l_partkey") === col("mk") &&
        col("cost_cents") === col("min_cost"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select(cents(col("s_acctbal")).as("acctbal_cents"), col("s_name"),
        col("n_name"), col("p_partkey"), col("p_brand"), col("cost_cents"))
      .orderBy(col("acctbal_cents").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }

  /** TPC-H Q8 shape (market share): PROMO-part sales to customers in one
    * region, numerator = the slice supplied from another region — the
    * share's numerator and denominator aggregate in ONE pass (CASE
    * inside the sum). Every dim (part, customer-region nations,
    * supplier + its region name) broadcasts; the only shuffles are the
    * two fact equi-joins (lineitem⋈orders, orders⋈customer). */
  def marketShare(spark: SparkSession, dir: String): DataFrame = {
    val n = t(spark, dir, "nation")
    val r = t(spark, dir, "region")
    val amerNations = n
      .join(r.filter(col("r_name") === "AMERICA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("am_nk"))
    val supRegion = t(spark, dir, "supplier")
      .join(n.select(col("n_nationkey").as("sn_nk"), col("n_regionkey").as("sn_rk")),
        col("s_nationkey") === col("sn_nk"))
      .join(r.select(col("r_regionkey").as("sr_rk"), col("r_name").as("s_region")),
        col("sn_rk") === col("sr_rk"))
      .select(col("s_suppkey"), col("s_region"))
    val p = t(spark, dir, "part")
      .filter(col("p_type") === "PROMO").select("p_partkey")
    val o = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= to_date(lit("1996-01-01")) &&
        col("o_orderdate") < to_date(lit("1998-01-01")))
    val li = t(spark, dir, "lineitem")
    val rev = cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(amerNations), col("c_nationkey") === col("am_nk"))
      .join(broadcast(supRegion), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        sum(when(col("s_region") === "EUROPE", rev).otherwise(0L))
          .as("europe_cents"),
        sum(rev).as("total_cents"))
      .orderBy("o_year")
  }

  /** TPC-H Q9 shape (product-type profit): LIKE-filtered part dim
    * broadcast onto the fact, orders joined only for the year, supplier
    * → nation for the group key. The corpus has no partsupp, so unit
    * cost is modeled as 10% of the part's retail price — per-row profit
    * stays integer cents. One fact shuffle (lineitem⋈orders); the
    * descending year inside the ordering exercises mixed-direction
    * sort-key output. */
  def productProfit(spark: SparkSession, dir: String): DataFrame = {
    val p = t(spark, dir, "part")
      .filter(col("p_name").like("%bolt%"))
      .select("p_partkey", "p_retailprice")
    val profit = cents(col("l_extendedprice") * (lit(1) - col("l_discount"))) -
      round(col("l_quantity") * col("p_retailprice") * 10).cast("long")
    t(spark, dir, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(spark, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(profit).as("profit_cents"))
      .orderBy(col("n_name"), col("o_year").desc)
  }

  /** TPC-H Q11 shape (important parts): per-part value restricted to one
    * region's suppliers, kept when above 2× the MEAN part value — the
    * "HAVING sum > (SELECT fraction-of-total)" shape with the global
    * gate as a broadcast one-row aggregate. The threshold is
    * count-relative (value * n_parts > 2 * total, integer space) so it
    * scales with corpus size instead of going vacuous. The global
    * (total, count) re-aggregates the per-part sums — no second fact
    * scan. */
  def importantParts(spark: SparkSession, dir: String): DataFrame = {
    val sup = t(spark, dir, "supplier")
      .join(t(spark, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .join(t(spark, dir, "region").filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey")
    val v = t(spark, dir, "lineitem")
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey")
      .agg(sum(cents(col("l_extendedprice"))).as("value_cents"))
    val tot = v.agg(sum(col("value_cents")).as("total"),
      count(lit(1)).as("nparts"))
    v.crossJoin(broadcast(tot))
      .filter(col("value_cents") * col("nparts") > lit(2L) * col("total"))
      .select("l_partkey", "value_cents")
      .orderBy(col("value_cents").desc, col("l_partkey"))
  }

  /** TPC-H Q16 shape (supplier-part count): NOT IN over the
    * "complaint" suppliers planned as a broadcast LEFT ANTI join (keys
    * are non-null on both sides, so NOT IN ≡ anti join), then
    * count(DISTINCT supplier) per part attribute — Spark's two-phase
    * distinct aggregate (partial distinct before the shuffle). The part
    * filter (two <> plus an IN list) broadcasts onto the fact. */
  def supplierPartCount(spark: SparkSession, dir: String): DataFrame = {
    val excl = t(spark, dir, "supplier")
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    val p = t(spark, dir, "part")
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    t(spark, dir, "lineitem").select("l_partkey", "l_suppkey")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(excl), col("l_suppkey") === col("s_suppkey"), "leftanti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** TPC-H Q20 shape (excess suppliers): nested IN subqueries planned as
    * semi-joins over a conditional aggregate — (part, supplier) pairs
    * whose 1997 shipped quantity exceeds half their all-time quantity
    * (the partsupp availability threshold re-expressed on lineitem,
    * integer space: 2 * q97 > q_all), parts gated by a LIKE broadcast,
    * suppliers by region. The supplier table LEFT SEMI joins the
    * qualifying key set; nothing fact-sized leaves the first
    * aggregate. */
  def excessSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val bolts = t(spark, dir, "part")
      .filter(col("p_name").like("%bolt%")).select("p_partkey")
    val pq = t(spark, dir, "lineitem")
      .join(broadcast(bolts), col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("l_quantity")).cast("long").as("sq_all"),
        sum(when(year(col("l_shipdate")) === 1997, col("l_quantity"))
          .otherwise(0.0)).cast("long").as("sq_97"))
      .filter(lit(2L) * col("sq_97") > col("sq_all"))
      .select("l_suppkey").distinct()
    t(spark, dir, "supplier")
      .join(t(spark, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .join(t(spark, dir, "region").filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .join(pq, col("s_suppkey") === col("l_suppkey"), "leftsemi")
      .select("s_suppkey", "s_name", "n_name")
      .orderBy("s_suppkey")
  }

  /** Semi-structured property shredding: extract the integer field `k`
    * from the JSON `props` column and aggregate per event type. The
    * extraction is `get_json_object` — a codegen'd path expression over
    * the string, no UDF — and malformed/missing fields surface as an
    * honest `n_bad` count instead of silently vanishing. At 100 TB this
    * is one narrow projection + one agg shuffle; shredding at read time
    * beats re-parsing JSON in every downstream query. */
  def eventsJson(spark: SparkSession, dir: String): DataFrame =
    graft.sources.NanosParquet.readEvents(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_bad"),
        sum("k").as("sum_k"), min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("event_type")

  /** Pivot (long -> wide): per-user event counts with one column per
    * event type. The value list is EXPLICIT, so no driver-side distinct
    * pass plans the pivot — at 100 TB the implicit form's `collect()`
    * of distinct keys is the scale hazard. One shuffle (the groupBy);
    * the pivot itself is map-side conditional aggregation. */
  def eventsPivot(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    graft.sources.NanosParquet.readEvents(spark, dir)
      .groupBy("user_id")
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .select(col("user_id") +:
        types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy("user_id")
  }

  /** Time-series gap fill / resample ([[graft.operators.Resample]]):
    * events bucketed to a 15-minute grid per event type, densified to
    * one row per (type, bucket) across each type's own [min, max] —
    * counts zero-filled, the revenue level carried forward (LOCF). The
    * grid is a distributed `sequence()` explode (O(output), no driver
    * loop); the LOCF window parallelizes per key. */
  def eventsResample(spark: SparkSession, dir: String): DataFrame = {
    val step = 900L
    val agg = graft.sources.NanosParquet.readEvents(spark, dir)
      .groupBy(col("event_type"),
        (expr("(ts div 1000000000)").cast("long") / step).cast("long")
          .*(step).as("bucket"))
      .agg(count(lit(1)).as("n_events"),
        sum(cents(col("value"))).as("sum_cents"))
    graft.operators.Resample.gapFill(agg, Seq("event_type"), "bucket",
        step, zeroFill = Seq("n_events"), locf = Seq("sum_cents"))
      .select(col("event_type"), col("bucket"), col("n_events"),
        col("sum_cents").as("locf_sum_cents"), col("gap"))
      .orderBy("event_type", "bucket")
  }

  /** COHORT RETENTION — the product-analytics staple: users grouped by
    * the week of their first event (the cohort), and for each
    * (cohort_week, weeks_since) cell the number of cohort members still
    * active that many weeks later. Cell (c, 0) is the cohort size, so
    * retention ratios are derivable without a second pass.
    *
    * Scale shape (100 TB of events): activity first collapses to
    * DISTINCT (user, week) — one shuffle with map-side combine, output
    * bounded by users × calendar-weeks regardless of event volume —
    * then the per-user first week is a min-window over that already
    * tiny frame (uniform user key, no skew), and the final cell count
    * is an aggregate over cohort-weeks × weeks-since rows. No
    * per-user event lists, no self-join of the raw event table. */
  def eventsRetention(spark: SparkSession, dir: String): DataFrame = {
    val uw = graft.sources.NanosParquet.readEvents(spark, dir)
      .select(col("user_id"),
        expr("(ts div 1000000000) div 604800").as("week"))
      .distinct()
    uw.withColumn("cohort_week",
        min(col("week")).over(Window.partitionBy("user_id")))
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("weeks_since"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "weeks_since")
  }

  /** PageRank over the supplier CO-OCCURRENCE graph
    * ([[graft.operators.PageRank]]): suppliers are linked when they
    * fulfil lines of the same order (parallel edges = co-occurrence
    * weight), and 3 integer fixed-point iterations rank structural
    * importance — the crawl-prioritization / corpus-weighting signal,
    * exercised on the TPC-H graph. The co-occurrence construction is
    * symmetric, so every node has out-edges (no dangling mass) and the
    * bit-exact oracle replays all 3 iterations as chained CTEs. */
  def supplierPagerank(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .distinct()
    val pairs = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.sk") =!= col("b.sk"))
      .select(col("a.sk").as("src"), col("b.sk").as("dst"))
    graft.operators.PageRank.run(pairs, iters = 3)
      .withColumnRenamed("node", "s_suppkey")
      .orderBy("s_suppkey")
  }

  /** Exact TRIANGLE COUNT + local clustering coefficient per node
    * ([[graft.operators.Triangles]]) over the supplier STRONG-TIE
    * graph — the community-structure signal of a link-analysis pass
    * (boilerplate farms and spam clusters surface as near-cliques).
    * Edges are co-occurrence pairs with weight ≥ 6 shared orders: the
    * standard edge-weight threshold of link analysis, and the step
    * that keeps exact counting meaningful — the UNthresholded TPC-H
    * co-occurrence graph approaches a complete graph as the corpus
    * grows (every supplier pair eventually shares some order), where
    * the triangle count itself is Θ(n³) and certifies nothing.
    * Degree-ordered wedge orientation keeps the quadratic step bounded
    * by out-degree (O(sqrt(|E|)) per node), so the plan survives hub
    * nodes; the oracle replays thresholding, orientation, wedges, and
    * closure as plain joins. */
  def supplierTriangles(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .distinct()
    val pairs = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.sk") =!= col("b.sk"))
      .select(col("a.sk").as("src"), col("b.sk").as("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      .filter(col("w") >= 6)
      .select("src", "dst")
    graft.operators.Triangles.perNode(pairs)
      .withColumnRenamed("node", "s_suppkey")
      .orderBy("s_suppkey")
  }

  /** Rolling ANOMALY DETECTION over daily event volume — the data-
    * quality tripwire of an ingest pipeline (a scraper outage or a
    * crawler loop shows up as a day whose count leaves the trailing
    * band). A day is anomalous when |count - mean7| > 2 * stddev7 over
    * the 7 PRECEDING calendar days, evaluated entirely in integers:
    * (7c - S)^2 > 4 * (7Q - S^2) with S = sum, Q = sum-of-squares of
    * the window — algebraically identical to the z-score test, exact
    * on any engine. Days with fewer than 7 preceding days are dropped
    * (the window is undefined there, and an all-integer output keeps
    * the oracle compare dtype-stable). The raw scan collapses to one row per
    * calendar day FIRST (missing days zero-filled), so the global
    * ordered window runs over #days rows — driver-bounded at any
    * corpus size, never over raw events. */
  /** The zero-filled dense per-day event-count series (one row per
    * calendar day over the table's full range) — the shared input of
    * the time-series family (anomaly / forecast): the raw scan
    * collapses map-side FIRST, so everything downstream is #days rows
    * at any corpus size. */
  private def denseDailyCounts(spark: SparkSession, dir: String): DataFrame = {
    val daily = graft.sources.NanosParquet.readEvents(spark, dir)
      .select(expr("(ts div 1000000000) div 86400").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n"))
    val bounds = daily.agg(min("day"), max("day")).head()
    require(!bounds.isNullAt(0), "events table is empty — no day range")
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    spark.range(lo, hi + 1).select(col("id").as("day"))
      .join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("n"), lit(0L)).as("n"))
  }

  def eventsAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val dense = denseDailyCounts(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("day").rowsBetween(-7, -1)
    dense
      .withColumn("s7", sum("n").over(w))
      .withColumn("q7", sum(col("n") * col("n")).over(w))
      .withColumn("w7", count(lit(1)).over(w))
      .filter(col("w7") === 7)
      .select(col("day"), col("n"), col("s7"), col("q7"),
        ((lit(7L) * col("n") - col("s7")) * (lit(7L) * col("n") - col("s7")) >
          lit(4L) * (lit(7L) * col("q7") - col("s7") * col("s7")))
          .as("is_anomaly"))
      .orderBy("day")
  }

  /** Holt's LINEAR-TREND exponential smoothing over daily event volume
    * — the capacity-planning forecast next to the anomaly tripwire,
    * evaluated in EXACT integer arithmetic so any engine replays it
    * bit-for-bit: α = β = 1/2 as floor-halving,
    * level_t = ⌊(y_t + level_{t-1} + trend_{t-1}) / 2⌋,
    * trend_t = ⌊(level_t − level_{t-1} + trend_{t-1}) / 2⌋
    * (floor division — trends go negative; Math.floorDiv here,
    * floor(x / 2.0) in the oracle's recursive CTE because DuckDB's `//`
    * TRUNCATES toward zero on negatives — a cross-engine trap worth
    * remembering). The recurrence
    * is inherently sequential, so it runs as ONE sorted partition over
    * the dense per-day series — #days rows at any corpus size, after
    * the map-side collapse of the raw scan; nothing round-trips the
    * driver. */
  def eventsForecast(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    denseDailyCounts(spark, dir)
      .as[(Long, Long)]
      .repartition(1).sortWithinPartitions("day")
      .mapPartitions { it =>
        var init = false
        var level = 0L
        var trend = 0L
        it.map { case (day, n) =>
          if (!init) { init = true; level = n; trend = 0L }
          else {
            val newLevel = Math.floorDiv(n + level + trend, 2)
            val newTrend = Math.floorDiv(newLevel - level + trend, 2)
            level = newLevel
            trend = newTrend
          }
          (day, n, level, trend, level + 7 * trend)
        }
      }
      .toDF("day", "n", "level", "trend", "forecast_7d")
      .orderBy("day")
  }

  /** Holt–Winters ADDITIVE-SEASONAL smoothing (period 7 — the weekly
    * cycle every traffic series carries) over daily event volume: the
    * seasonal sibling of [[eventsForecast]], same exact-integer
    * discipline (α = β = γ = 1/2 as floor-halving, Math.floorDiv /
    * floor(x / 2.0) — never `//`, which truncates toward zero on
    * negatives in DuckDB):
    *
    *   level_t = ⌊(y_t − s_{t−7} + level_{t−1} + trend_{t−1}) / 2⌋
    *   trend_t = ⌊(level_t − level_{t−1} + trend_{t−1}) / 2⌋
    *   s_t     = ⌊(y_t − level_t + s_{t−7}) / 2⌋
    *   forecast(+7) = level_t + 7·trend_t + s_t   (s_{t+7−7} = s_t)
    *
    * The first cycle (t ≤ 7) initializes level = y_t, trend = s = 0;
    * seasonals accumulate from the second cycle on. The recurrence is
    * sequential with a 7-slot ring of trailing seasonals, so it runs as
    * ONE sorted partition over the dense per-day series — #days rows at
    * any corpus size after the map-side collapse; the oracle carries
    * the ring as a recursive-CTE list column. */
  def eventsForecastSeasonal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    denseDailyCounts(spark, dir)
      .as[(Long, Long)]
      .repartition(1).sortWithinPartitions("day")
      .mapPartitions { it =>
        val seas = scala.collection.mutable.Queue.empty[Long]
        var level = 0L
        var trend = 0L
        var rn = 0L
        it.map { case (day, n) =>
          rn += 1
          var s = 0L
          if (rn <= 7) { level = n; trend = 0L; seas.enqueue(0L) }
          else {
            val sOld = seas.dequeue()
            val newLevel = Math.floorDiv(n - sOld + level + trend, 2)
            val newTrend = Math.floorDiv(newLevel - level + trend, 2)
            s = Math.floorDiv(n - newLevel + sOld, 2)
            level = newLevel
            trend = newTrend
            seas.enqueue(s)
          }
          (day, n, level, trend, s, level + 7 * trend + s)
        }
      }
      .toDF("day", "n", "level", "trend", "seasonal", "forecast_7d")
      .orderBy("day")
  }

  /** Time-series GAP FILL with linear interpolation — the resample
    * repair step of a metrics pipeline (a missing day of telemetry must
    * not read as zero). Gaps are PLANTED deterministically (days ≡ 2
    * mod 5 are dropped from the daily counts) so the query certifies
    * the interpolation arithmetic: a filled day reads
    * prev + floor((next − prev)·(d − prevDay) / (nextDay − prevDay)),
    * the classic two-sided linear fill, evaluated identically in both
    * engines (small-magnitude double floor — exact). The series
    * collapses to one row per day BEFORE the ordered windows, so the
    * global window input is #days rows at any corpus size. */
  def eventsGapfill(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = graft.sources.NanosParquet.readEvents(spark, dir)
      .select(expr("(ts div 1000000000) div 86400").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n"))
    val kept = daily.filter(col("day") % 5 =!= 2)
    val bounds = kept.agg(min("day"), max("day")).head()
    require(!bounds.isNullAt(0), "events table is empty — no day range")
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val dense = spark.range(lo, hi + 1).select(col("id").as("day"))
      .join(kept, Seq("day"), "left")
    val before = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    val after = Window.orderBy("day")
      .rowsBetween(0, Window.unboundedFollowing)
    val dayIf = when(col("n").isNotNull, col("day"))
    dense
      .withColumn("pv", last("n", ignoreNulls = true).over(before))
      .withColumn("pd", last(dayIf, ignoreNulls = true).over(before))
      .withColumn("nv", first("n", ignoreNulls = true).over(after))
      .withColumn("nd", first(dayIf, ignoreNulls = true).over(after))
      .select(col("day"),
        when(col("n").isNotNull, col("n")).otherwise(
          col("pv") + floor((col("nv") - col("pv")).cast("double") *
            (col("day") - col("pd")) / (col("nd") - col("pd"))).cast("long"))
          .as("n_filled"),
        col("n").isNull.as("was_gap"))
      .orderBy("day")
  }

  /** Rolling ACTIVE USERS — DAU and trailing-7-day WAU per calendar day
    * over the events table's full day range (missing days surface as
    * zeros, not holes). The rolling distinct is computed exactly
    * without any per-day rescan: activity collapses to DISTINCT
    * (user, day) first (bounded by users × days, independent of raw
    * event volume), each activity day then contributes to the ≤ 7
    * window days it can be seen from (one ×7 explode), and a second
    * distinct collapses multi-day users inside one window. No window
    * function over user history, no self-join of the raw events. The
    * day bounds are one bounded scalar aggregate (two longs to the
    * driver). */
  def eventsActiveUsers(spark: SparkSession, dir: String): DataFrame = {
    // the raw-event scan + distinct is the dominant cost at scale and
    // feeds THREE consumers (bounds, dau, wau) — checkpoint it once so
    // none of them re-pays it
    val ud = graft.sources.NanosParquet.readEvents(spark, dir)
      .select(col("user_id"),
        expr("(ts div 1000000000) div 86400").as("day"))
      .distinct()
      .localCheckpoint(true)
    val bounds = ud.agg(min("day"), max("day")).head()
    require(!bounds.isNullAt(0), "events table is empty — no day range")
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + 6)).as("day"))
      .filter(col("day") <= hi)
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("wau7"))
    spark.range(lo, hi + 1).select(col("id").as("day"))
      .join(dau, Seq("day"), "left")
      .join(wau, Seq("day"), "left")
      .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("wau7"), lit(0L)).as("wau7"))
      .orderBy("day")
  }

  /** One unrolled PageRank iteration as two chained CTEs (SQL twin of
    * the update rule in [[graft.operators.PageRank]]). */
  private def prIterSql(i: Int): String = {
    val prev = if (i == 1) "r0" else s"r${i - 1}"
    s"""s$i AS (
       |  SELECT e.dst AS node, sum(e.w * ($prev.r // d.deg)) AS s
       |  FROM e JOIN $prev ON e.src = $prev.node
       |  JOIN deg d ON e.src = d.node
       |  GROUP BY 1),
       |r$i AS (
       |  SELECT d.node,
       |    CAST(15000000000000 // (100 * n)
       |      + (85 * coalesce(s$i.s, 0)) // 100 AS BIGINT) AS r
       |  FROM deg d CROSS JOIN nn LEFT JOIN s$i ON d.node = s$i.node)"""
      .stripMargin
  }

  private val supplierPagerankOracle: String =
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
       |e0 AS (
       |  SELECT a.sk AS src, b.sk AS dst FROM li a
       |  JOIN li b ON a.ok = b.ok AND a.sk <> b.sk),
       |e AS (SELECT src, dst, count(*) AS w FROM e0 GROUP BY 1, 2),
       |deg AS (SELECT src AS node, CAST(sum(w) AS BIGINT) AS deg
       |        FROM e GROUP BY 1),
       |nn AS (SELECT count(*) AS n FROM deg),
       |r0 AS (SELECT node, CAST(1000000000000 // n AS BIGINT) AS r
       |       FROM deg CROSS JOIN nn),
       |${prIterSql(1)},
       |${prIterSql(2)},
       |${prIterSql(3)}
       |SELECT d.node AS s_suppkey, r3.r AS pr_x1e12, d.deg
       |FROM deg d JOIN r3 ON d.node = r3.node ORDER BY 1""".stripMargin

  private val windowTopkOracle: String =
    """WITH o AS (
      |  SELECT o_orderpriority, o_orderkey,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
      |  FROM orders),
      |r AS (
      |  SELECT o_orderpriority,
      |    CAST(row_number() OVER (PARTITION BY o_orderpriority
      |      ORDER BY price_cents DESC, o_orderkey) AS BIGINT) AS rnk,
      |    o_orderkey, price_cents
      |  FROM o)
      |SELECT o_orderpriority, rnk, o_orderkey, price_cents FROM r
      |WHERE rnk <= 3 ORDER BY o_orderpriority, rnk""".stripMargin

  val oracles: Map[String, String] = Map(
    "cube_pricing" ->
      """SELECT l_returnflag AS flag, l_linestatus AS status,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_cents,
        |  count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, flag NULLS FIRST, status NULLS FIRST""".stripMargin,
    "events_json" ->
      """WITH e AS (
        |  SELECT event_type,
        |    TRY_CAST(CASE WHEN json_valid(props) THEN props->>'k' END
        |      AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type,
        |  count(*) AS n,
        |  CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  min(k) AS min_k,
        |  max(k) AS max_k
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,
    "events_pivot" ->
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // transition matrix: per-user lead over the (ts, event_id) total
    // order, then counts + integer row-conditional probabilities
    "events_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tus, event_type FROM events),
        |tr AS (
        |  SELECT event_type AS src,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS dst
        |  FROM e),
        |c AS (SELECT src, dst, count(*) AS n FROM tr WHERE dst IS NOT NULL GROUP BY 1, 2),
        |m AS (SELECT src, sum(n) AS n_src FROM c GROUP BY 1)
        |SELECT src, dst, CAST(n AS BIGINT) AS n,
        |  CAST((n * 1000000) // n_src AS BIGINT) AS p_x1e6
        |FROM c JOIN m USING (src)
        |ORDER BY n DESC, src, dst""".stripMargin,
    "supplier_pagerank" -> supplierPagerankOracle,
    "supplier_triangles" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
        |und AS (
        |  SELECT a.sk AS u, b.sk AS v FROM li a
        |  JOIN li b ON a.ok = b.ok AND a.sk < b.sk
        |  GROUP BY 1, 2 HAVING count(*) >= 6),
        |deg AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
        |    SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und) t
        |  GROUP BY 1),
        |o AS (
        |  SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND und.u < und.v)
        |              THEN und.u ELSE und.v END AS a,
        |         CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND und.u < und.v)
        |              THEN und.v ELSE und.u END AS b
        |  FROM und JOIN deg du ON und.u = du.node
        |  JOIN deg dv ON und.v = dv.node),
        |w AS (SELECT x.a AS a, x.b AS b, y.b AS c
        |      FROM o x JOIN o y ON x.a = y.a AND x.b < y.b),
        |tri AS (SELECT w.a, w.b, w.c FROM w JOIN und
        |        ON und.u = least(w.b, w.c) AND und.v = greatest(w.b, w.c)),
        |pn AS (SELECT node, CAST(count(*) AS BIGINT) AS triangles FROM (
        |  SELECT a AS node FROM tri UNION ALL SELECT b AS node FROM tri
        |  UNION ALL SELECT c AS node FROM tri) t GROUP BY 1)
        |SELECT deg.node AS s_suppkey, deg.deg,
        |  CAST(coalesce(pn.triangles, 0) AS BIGINT) AS triangles,
        |  CAST(CASE WHEN deg.deg >= 2 THEN
        |    (2000000 * coalesce(pn.triangles, 0))
        |      // (deg.deg * (deg.deg - 1))
        |  ELSE 0 END AS BIGINT) AS cc_x1e6
        |FROM deg LEFT JOIN pn ON deg.node = pn.node
        |ORDER BY s_suppkey""".stripMargin,
    "events_forecast" ->
      """WITH RECURSIVE d0 AS (
        |  SELECT epoch_us(ts) // 1000000 // 86400 AS day, count(*) AS n
        |  FROM events GROUP BY 1),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM d0),
        |grid AS (SELECT unnest(range(b.lo, b.hi + 1)) AS day FROM b),
        |dense AS (
        |  SELECT g.day, CAST(coalesce(d0.n, 0) AS BIGINT) AS n,
        |    row_number() OVER (ORDER BY g.day) AS rn
        |  FROM grid g LEFT JOIN d0 ON g.day = d0.day),
        |h AS (
        |  SELECT rn, day, n, n AS level, CAST(0 AS BIGINT) AS trend
        |  FROM dense WHERE rn = 1
        |  UNION ALL
        |  SELECT d.rn, d.day, d.n,
        |    CAST(floor((d.n + h.level + h.trend) / 2.0) AS BIGINT) AS level,
        |    CAST(floor((CAST(floor((d.n + h.level + h.trend) / 2.0) AS BIGINT)
        |      - h.level + h.trend) / 2.0) AS BIGINT) AS trend
        |  FROM h JOIN dense d ON d.rn = h.rn + 1)
        |SELECT day, n, level, trend,
        |  CAST(level + 7 * trend AS BIGINT) AS forecast_7d
        |FROM h ORDER BY day""".stripMargin,
    // Holt–Winters additive period-7: the recursive CTE carries the
    // trailing seasonal ring as a LIST column (seas[1] = s_{t-7});
    // the level expression inlines into trend/seasonal because a
    // recursive SELECT cannot reference its own output aliases
    "events_forecast_seasonal" ->
      """WITH RECURSIVE d0 AS (
        |  SELECT epoch_us(ts) // 1000000 // 86400 AS day, count(*) AS n
        |  FROM events GROUP BY 1),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM d0),
        |grid AS (SELECT unnest(range(b.lo, b.hi + 1)) AS day FROM b),
        |dense AS (
        |  SELECT g.day, CAST(coalesce(d0.n, 0) AS BIGINT) AS n,
        |    row_number() OVER (ORDER BY g.day) AS rn
        |  FROM grid g LEFT JOIN d0 ON g.day = d0.day),
        |h AS (
        |  SELECT rn, day, n, n AS level, CAST(0 AS BIGINT) AS trend,
        |    CAST(0 AS BIGINT) AS s, [CAST(0 AS BIGINT)] AS seas
        |  FROM dense WHERE rn = 1
        |  UNION ALL
        |  SELECT d.rn, d.day, d.n,
        |    CASE WHEN d.rn <= 7 THEN d.n
        |      ELSE CAST(floor((d.n - h.seas[1] + h.level + h.trend) / 2.0) AS BIGINT) END,
        |    CASE WHEN d.rn <= 7 THEN CAST(0 AS BIGINT)
        |      ELSE CAST(floor((CAST(floor((d.n - h.seas[1] + h.level + h.trend) / 2.0) AS BIGINT)
        |        - h.level + h.trend) / 2.0) AS BIGINT) END,
        |    CASE WHEN d.rn <= 7 THEN CAST(0 AS BIGINT)
        |      ELSE CAST(floor((d.n - CAST(floor((d.n - h.seas[1] + h.level + h.trend) / 2.0) AS BIGINT)
        |        + h.seas[1]) / 2.0) AS BIGINT) END,
        |    CASE WHEN d.rn <= 7 THEN list_append(h.seas, CAST(0 AS BIGINT))
        |      ELSE list_append(h.seas[2:7],
        |        CAST(floor((d.n - CAST(floor((d.n - h.seas[1] + h.level + h.trend) / 2.0) AS BIGINT)
        |          + h.seas[1]) / 2.0) AS BIGINT)) END
        |  FROM h JOIN dense d ON d.rn = h.rn + 1)
        |SELECT day, n, level, trend, s AS seasonal,
        |  CAST(level + 7 * trend + s AS BIGINT) AS forecast_7d
        |FROM h ORDER BY day""".stripMargin,
    "events_gapfill" ->
      """WITH d0 AS (
        |  SELECT epoch_us(ts) // 1000000 // 86400 AS day, count(*) AS n
        |  FROM events GROUP BY 1),
        |kept AS (SELECT day, CAST(n AS BIGINT) AS n FROM d0 WHERE day % 5 <> 2),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM kept),
        |grid AS (SELECT unnest(range(b.lo, b.hi + 1)) AS day FROM b),
        |dense AS (
        |  SELECT g.day, kept.n FROM grid g LEFT JOIN kept ON g.day = kept.day),
        |w AS (
        |  SELECT day, n,
        |    last_value(n IGNORE NULLS) OVER bf AS pv,
        |    last_value(CASE WHEN n IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER bf AS pd,
        |    first_value(n IGNORE NULLS) OVER af AS nv,
        |    first_value(CASE WHEN n IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER af AS nd
        |  FROM dense
        |  WINDOW bf AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
        |                AND CURRENT ROW),
        |         af AS (ORDER BY day ROWS BETWEEN CURRENT ROW
        |                AND UNBOUNDED FOLLOWING))
        |SELECT day,
        |  CAST(CASE WHEN n IS NOT NULL THEN n
        |    ELSE pv + CAST(floor(CAST(nv - pv AS DOUBLE)
        |      * (day - pd) / (nd - pd)) AS BIGINT)
        |  END AS BIGINT) AS n_filled,
        |  n IS NULL AS was_gap
        |FROM w ORDER BY day""".stripMargin,
    "events_anomaly" ->
      """WITH d0 AS (
        |  SELECT epoch_us(ts) // 1000000 // 86400 AS day, count(*) AS n
        |  FROM events GROUP BY 1),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM d0),
        |grid AS (SELECT unnest(range(b.lo, b.hi + 1)) AS day FROM b),
        |dense AS (
        |  SELECT g.day, CAST(coalesce(d0.n, 0) AS BIGINT) AS n
        |  FROM grid g LEFT JOIN d0 ON g.day = d0.day),
        |w AS (
        |  SELECT day, n,
        |    CAST(sum(n) OVER win AS BIGINT) AS s7,
        |    CAST(sum(n * n) OVER win AS BIGINT) AS q7,
        |    count(*) OVER win AS w7
        |  FROM dense
        |  WINDOW win AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT day, n, s7, q7,
        |  (7 * n - s7) * (7 * n - s7) > 4 * (7 * q7 - s7 * s7) AS is_anomaly
        |FROM w WHERE w7 = 7 ORDER BY day""".stripMargin,
    "events_active_users" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id,
        |    epoch_us(ts) // 1000000 // 86400 AS day
        |  FROM events),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM ud),
        |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
        |wx AS (
        |  SELECT DISTINCT user_id, day + o AS day
        |  FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS o)
        |  WHERE day + o <= (SELECT hi FROM b)),
        |wau AS (SELECT day, count(*) AS wau7 FROM wx GROUP BY 1),
        |grid AS (
        |  SELECT unnest(range(lo, hi + 1)) AS day FROM b)
        |SELECT g.day,
        |  CAST(coalesce(dau.dau, 0) AS BIGINT) AS dau,
        |  CAST(coalesce(wau.wau7, 0) AS BIGINT) AS wau7
        |FROM grid g
        |LEFT JOIN dau ON g.day = dau.day
        |LEFT JOIN wau ON g.day = wau.day
        |ORDER BY g.day""".stripMargin,
    "events_retention" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id,
        |    epoch_us(ts) // 1000000 // 604800 AS week
        |  FROM events),
        |c AS (
        |  SELECT user_id, week,
        |    min(week) OVER (PARTITION BY user_id) AS cohort_week
        |  FROM uw)
        |SELECT cohort_week, week - cohort_week AS weeks_since,
        |  count(*) AS n_users
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "events_resample" ->
      """WITH agg AS (
        |  SELECT event_type,
        |    (epoch_us(ts) // 1000000 // 900) * 900 AS bucket,
        |    count(*) AS n,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s
        |  FROM events GROUP BY 1, 2),
        |rng AS (SELECT event_type, min(bucket) AS lo, max(bucket) AS hi
        |        FROM agg GROUP BY 1),
        |grid AS (SELECT event_type,
        |           unnest(range(lo, hi + 900, 900)) AS bucket FROM rng),
        |j AS (SELECT g.event_type, g.bucket, a.n, a.s
        |      FROM grid g LEFT JOIN agg a USING (event_type, bucket)),
        |f AS (SELECT event_type, bucket, n, s,
        |  last_value(CASE WHEN n IS NOT NULL THEN {'v': s} END IGNORE NULLS)
        |    OVER (PARTITION BY event_type ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carry
        |  FROM j)
        |SELECT event_type, bucket,
        |  CASE WHEN n IS NULL THEN 0 ELSE n END AS n_events,
        |  CASE WHEN n IS NULL THEN carry.v ELSE s END AS locf_sum_cents,
        |  n IS NULL AS gap
        |FROM f ORDER BY 1, 2""".stripMargin,
    "forecast_revenue" ->
      """SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "customer_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
        |  GROUP BY 1)
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_revenue_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-07-01' AND l_shipdate < TIMESTAMP '1997-10-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue_cents
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_revenue_cents = (SELECT max(total_revenue_cents) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "small_quantity_revenue" ->
      """WITH pq AS (
        |  SELECT l_partkey, CAST(sum(l_quantity) AS BIGINT) AS sq, count(*) AS cq
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_type = 'MEDIUM' GROUP BY 1)
        |SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
        |  count(*) AS n_lines
        |FROM lineitem JOIN pq USING (l_partkey)
        |WHERE 5 * CAST(l_quantity AS BIGINT) * cq < sq""".stripMargin,
    "min_cost_supplier" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(CAST(round(l_extendedprice / l_quantity * 100) AS BIGINT)) AS cost_cents
        |  FROM lineitem GROUP BY 1, 2),
        |sup AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
        |psr AS (SELECT * FROM ps JOIN sup ON l_suppkey = s_suppkey),
        |minc AS (SELECT l_partkey AS mk, min(cost_cents) AS min_cost FROM psr GROUP BY 1)
        |SELECT CAST(round(s_acctbal * 100) AS BIGINT) AS acctbal_cents, s_name, n_name,
        |  p_partkey, p_brand, cost_cents
        |FROM psr JOIN minc ON l_partkey = mk AND cost_cents = min_cost
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 30
        |ORDER BY acctbal_cents DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin,
    "market_share" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(sum(CASE WHEN sr.r_name = 'EUROPE'
        |    THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS europe_cents,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN region cr ON cn.n_regionkey = cr.r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN region sr ON sn.n_regionkey = sr.r_regionkey
        |WHERE p_type = 'PROMO' AND cr.r_name = 'AMERICA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "product_profit" ->
      """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
        |    - CAST(round(l_quantity * p_retailprice * 10) AS BIGINT)) AS BIGINT) AS profit_cents
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%bolt%'
        |GROUP BY 1, 2 ORDER BY 1, 2 DESC""".stripMargin,
    "important_parts" ->
      """WITH v AS (
        |  SELECT l_partkey, CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'
        |  GROUP BY 1)
        |SELECT l_partkey, value_cents FROM v
        |WHERE value_cents * (SELECT count(*) FROM v) > 2 * (SELECT sum(value_cents) FROM v)
        |ORDER BY value_cents DESC, l_partkey""".stripMargin,
    "supplier_part_count" ->
      """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "excess_suppliers" ->
      """SELECT s_suppkey, s_name, n_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM (
        |      SELECT l_partkey, l_suppkey,
        |        CAST(sum(l_quantity) AS BIGINT) AS sq_all,
        |        CAST(sum(CASE WHEN year(l_shipdate) = 1997 THEN l_quantity ELSE 0 END) AS BIGINT) AS sq_97
        |      FROM lineitem
        |      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
        |      GROUP BY 1, 2)
        |    WHERE 2 * sq_97 > sq_all)
        |ORDER BY s_suppkey""".stripMargin,
    "order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "volume_shipping" ->
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(sum(rev) AS BIGINT) AS revenue_cents
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |    CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS rev
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')))
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "promo_revenue" ->
      """SELECT
        |  CAST(sum(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
        |    ELSE 0 END) AS BIGINT) AS promo_cents,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        |  AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin,
    "disjunctive_parts" ->
      """SELECT
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "waiting_suppliers" ->
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM orders
        |              WHERE o_orderkey = l1.l_orderkey AND o_orderstatus = 'F')
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    "idle_customers" ->
      """WITH avg_t AS (
        |  SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_sum,
        |    count(*) AS bal_cnt
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT n_name, count(*) AS numcust,
        |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS totacctbal_cents
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |CROSS JOIN avg_t
        |WHERE CAST(round(c_acctbal * 100) AS BIGINT) * bal_cnt > bal_sum
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '1998-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "zorder_layout" -> {
      val z = graft.operators.ZOrder.zValue2Sql("okey", "skey", ZBits)
      s"""WITH t AS (
         |  SELECT l_orderkey % 65536 AS okey, l_suppkey % 65536 AS skey
         |  FROM lineitem),
         |b AS (SELECT okey, skey, ($z) >> $ZBucketShift AS bucket FROM t)
         |SELECT bucket, count(*) AS n,
         |  min(okey) AS min_okey, max(okey) AS max_okey,
         |  min(skey) AS min_skey, max(skey) AS max_skey
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin
    },
    "quantiles" ->
      """WITH b AS (
        |  SELECT l_returnflag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents
        |  FROM lineitem),
        |r AS (
        |  SELECT l_returnflag, price_cents,
        |    CAST(row_number() OVER (PARTITION BY l_returnflag ORDER BY price_cents) AS BIGINT) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM b)
        |SELECT l_returnflag, q_pct, price_cents AS value_cents
        |FROM r CROSS JOIN (VALUES (CAST(25 AS BIGINT)), (50), (75), (95)) qs(q_pct)
        |WHERE rn = greatest(1, CAST(floor((q_pct * n + 99) / 100.0) AS BIGINT))
        |ORDER BY l_returnflag, q_pct""".stripMargin,
    "value_histogram" ->
      """SELECT CAST(floor(CAST(round(value * 100) AS BIGINT) / 2000.0) AS BIGINT) AS bin,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "set_ops" ->
      """WITH r AS (SELECT DISTINCT l_suppkey FROM lineitem WHERE l_returnflag = 'R'),
        |a AS (SELECT DISTINCT l_suppkey FROM lineitem WHERE l_returnflag = 'A'),
        |both_s AS (SELECT l_suppkey, 'both' AS relation FROM (SELECT * FROM r INTERSECT SELECT * FROM a)),
        |only_r AS (SELECT l_suppkey, 'only_r' AS relation FROM (SELECT * FROM r EXCEPT SELECT * FROM a))
        |SELECT l_suppkey, relation FROM both_s
        |UNION ALL SELECT l_suppkey, relation FROM only_r
        |ORDER BY relation, l_suppkey""".stripMargin,
    "vocab_topk" ->
      """SELECT term, count(*) AS freq
        |FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |GROUP BY term ORDER BY freq DESC, term ASC LIMIT 20""".stripMargin,
    "heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |SELECT term, count(*) AS cnt FROM toks
        |GROUP BY term
        |HAVING count(*) * 500 >= (SELECT count(*) FROM toks)
        |ORDER BY term""".stripMargin,
    "rollup_pricing" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
        |  count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,
    "agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "shipping_priority" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |  o_orderpriority,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-07-01'
        |  AND l_shipdate > TIMESTAMP '1998-07-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_cents DESC, l_orderkey LIMIT 10""".stripMargin,
    "returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_cents DESC, c_custkey LIMIT 20""".stripMargin,
    "local_supplier_volume" ->
      """SELECT n_name,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "large_orders" ->
      """SELECT c_custkey, c_name, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
        |  CAST(big.qty AS BIGINT) AS sum_qty
        |FROM orders
        |JOIN (SELECT l_orderkey, sum(l_quantity) AS qty FROM lineitem
        |      GROUP BY 1 HAVING sum(l_quantity) > 250) big
        |  ON o_orderkey = big.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY price_cents DESC, o_orderkey LIMIT 50""".stripMargin,
    "join_revenue" ->
      """SELECT c_mktsegment,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "window_topk" -> windowTopkOracle,
    "window_topk_salted" -> windowTopkOracle,
    "events_window" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
        |  event_type,
        |  count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_resample" -> (eventsResample _),
    "events_retention" -> (eventsRetention _),
    "supplier_pagerank" -> (supplierPagerank _),
    "supplier_triangles" -> (supplierTriangles _),
    "events_anomaly" -> (eventsAnomaly _),
    "events_gapfill" -> (eventsGapfill _),
    "events_forecast" -> (eventsForecast _),
    "events_forecast_seasonal" -> (eventsForecastSeasonal _),
    "events_active_users" -> (eventsActiveUsers _),
    "cube_pricing" -> (cubePricing _),
    "events_json" -> (eventsJson _),
    "events_pivot" -> (eventsPivot _),
    "events_transitions" -> (eventsTransitions _),
    "forecast_revenue" -> (forecastRevenue _),
    "customer_distribution" -> (customerDistribution _),
    "top_supplier" -> (topSupplier _),
    "small_quantity_revenue" -> (smallQuantityRevenue _),
    "min_cost_supplier" -> (minCostSupplier _),
    "market_share" -> (marketShare _),
    "product_profit" -> (productProfit _),
    "important_parts" -> (importantParts _),
    "supplier_part_count" -> (supplierPartCount _),
    "excess_suppliers" -> (excessSuppliers _),
    "order_priority" -> (orderPriority _),
    "volume_shipping" -> (volumeShipping _),
    "promo_revenue" -> (promoRevenue _),
    "disjunctive_parts" -> (disjunctiveParts _),
    "waiting_suppliers" -> (waitingSuppliers _),
    "idle_customers" -> (idleCustomers _),
    "set_ops" -> (setOps _),
    "vocab_topk" -> (vocabTopK _),
    "heavy_hitters" -> (heavyHittersQuery _),
    "rollup_pricing" -> (rollupPricing _),
    "agg_pricing" -> (aggPricing _),
    "join_revenue" -> (joinRevenue _),
    "shipping_priority" -> (shippingPriority _),
    "local_supplier_volume" -> (localSupplierVolume _),
    "large_orders" -> (largeOrders _),
    "returned_items" -> (returnedItems _),
    "window_topk" -> (windowTopK _),
    "window_topk_salted" -> (windowTopKSalted _),
    "events_window" -> (eventsWindow _),
    "quantiles" -> (quantiles _),
    "value_histogram" -> (valueHistogram _),
    "zorder_layout" -> (zorderLayout _)
  )
}
