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
