package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic SCALE-VALIDATION fixture generator: reproduces the
  * driver testdata's *shape* (schemas, measured moments, key spaces —
  * see TESTDATA.md; /root/testdata itself is read-only) at any
  * multiple, so the expensive pipelines can be timed at sf0.1-shape
  * AND sf1-shape with like-for-like distributions and the wall-time
  * ratio read directly (SCALE.md).
  *
  * `mult = 1` is the sf0.1 shape (5,000 docs / 2,000 vectors / 150k
  * orders / ~600k lineitem over 1,000 suppliers); `mult = 10` is the
  * sf1 shape. Every value derives from `xxhash64(seed, id, …)` —
  * generation is a fully distributed projection over `spark.range`
  * (no driver-side data, no RNG state), so the same (outDir, mult)
  * always writes byte-identical content.
  *
  * TWO DELIBERATE skew plants (absent from the driver data, present
  * here so the skew-stress pins face a truly hot key):
  *  - `src0` owns ~50% of documents (the one-domain-dominates corpus
  *    every export/mixture operator must survive);
  *  - `1-URGENT` owns ~50% of orders (the hot group for salted top-k).
  *
  * Usage: `runMain graft.tools.ScaleGen <outDir> <mult>`.
  */
object ScaleGen {

  /** The driver corpus's 31-word vocabulary (measured from sf0.1). */
  val Vocab: Seq[String] = Seq(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window")

  private def h(seed: String, cols: Column*): Column =
    xxhash64((lit(seed) +: cols): _*)

  /** documents(doc_id, text, lang, source, n_chars): 10..100 words
    * from [[Vocab]], 5 langs, 20 sources with the src0 hot plant,
    * ~0.16% exact-duplicate rows (id % 625 == 624 repeats the
    * previous id's text — keyed through `cid`, zero joins). */
  def documents(spark: SparkSession, nDocs: Long,
      hotSharePct: Int = 50): DataFrame = {
    val vocabArr = array(Vocab.map(lit): _*)
    val id = col("id")
    // content id: the planted exact dup re-derives its neighbor's text
    val cid = when(id % 625 === 624, id - 1).otherwise(id)
    val nWords = pmod(h("nw", cid), lit(91)) + lit(10)
    val words = transform(sequence(lit(1L), nWords), i =>
      element_at(vocabArr,
        (pmod(h("w", cid, i), lit(Vocab.size)) + 1).cast("int")))
    val lang = element_at(array(Seq("en", "en", "en", "en", "en", "en",
        "de", "fr", "es", "zh").map(lit): _*),
      (pmod(h("lg", id), lit(10)) + 1).cast("int"))
    val source = when(pmod(h("sk", id), lit(100)) < hotSharePct, lit("src0"))
      .otherwise(concat(lit("src"), pmod(h("s", id), lit(19)) + 1))
    spark.range(0, nDocs, 1, 32)
      .select(
        id.as("doc_id"),
        array_join(words, " ").as("text"),
        lang.as("lang"),
        source.as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  /** embeddings(vec_id, embedding float[64], label 0..9): hash-derived
    * components L2-normalized — matches the driver vectors' measured
    * geometry (unit norm, no cluster tilt: within-label cosine ≈ 0). */
  def embeddings(spark: SparkSession, nVecs: Long): DataFrame = {
    val raw = transform(sequence(lit(0L), lit(63L)), i =>
      (pmod(h("e", col("id"), i), lit(2001)).cast("double") - 1000.0) / 1000.0)
    spark.range(0, nVecs, 1, 32)
      .select(col("id").as("vec_id"), raw.as("_raw"),
        pmod(h("l", col("id")), lit(10)).cast("int").as("label"))
      .withColumn("_nrm",
        sqrt(aggregate(col("_raw"), lit(0.0), (a, x) => a + x * x)))
      .select(col("vec_id"),
        transform(col("_raw"), x => (x / col("_nrm")).cast("float"))
          .as("embedding"),
        col("label"))
  }

  /** orders(o_orderkey, o_custkey, o_orderstatus, o_totalprice,
    * o_orderdate, o_orderpriority) with the 1-URGENT hot plant. */
  def orders(spark: SparkSession, nOrders: Long, nCust: Long,
      hotSharePct: Int = 50): DataFrame = {
    val id = col("id")
    val prio = when(pmod(h("pk", id), lit(100)) < hotSharePct,
        lit("1-URGENT"))
      .otherwise(element_at(array(Seq("2-HIGH", "3-MEDIUM",
          "4-NOT SPECIFIED", "5-LOW").map(lit): _*),
        (pmod(h("p", id), lit(4)) + 1).cast("int")))
    spark.range(0, nOrders, 1, 32)
      .select(
        id.as("o_orderkey"),
        pmod(h("c", id), lit(nCust)).as("o_custkey"),
        element_at(array(lit("O"), lit("P"), lit("F")),
          (pmod(h("st", id), lit(3)) + 1).cast("int")).as("o_orderstatus"),
        (lit(1000.0) + pmod(h("tp", id), lit(499000)).cast("double") +
          pmod(h("tc", id), lit(100)).cast("double") / 100.0)
          .as("o_totalprice"),
        timestamp_seconds(lit(788918400L) +
          pmod(h("od", id), lit(2400)) * 86400L).as("o_orderdate"),
        prio.as("o_orderpriority"))
  }

  /** lineitem over the same order keys: 1..7 lines per order
    * (avg ≈ 4, the TPC-H shape), supplier/part keys uniform over
    * their scaled key spaces. */
  def lineitem(spark: SparkSession, nOrders: Long, nSupp: Long,
      nPart: Long): DataFrame = {
    val ok = col("ok")
    val ln = col("l_linenumber")
    spark.range(0, nOrders, 1, 64)
      .select(col("id").as("ok"),
        explode(sequence(lit(1),
          (pmod(h("nl", col("id")), lit(7)) + 1).cast("int")))
          .as("l_linenumber"))
      .select(
        ok.as("l_orderkey"),
        pmod(h("pt", ok, ln), lit(nPart)).as("l_partkey"),
        pmod(h("sp", ok, ln), lit(nSupp)).as("l_suppkey"),
        ln,
        (pmod(h("q", ok, ln), lit(50)) + 1).cast("double").as("l_quantity"),
        (lit(900.0) + pmod(h("ep", ok, ln), lit(104100)).cast("double") +
          pmod(h("ec", ok, ln), lit(100)).cast("double") / 100.0)
          .as("l_extendedprice"),
        (pmod(h("d", ok, ln), lit(11)).cast("double") / 100.0)
          .as("l_discount"),
        (pmod(h("t", ok, ln), lit(9)).cast("double") / 100.0).as("l_tax"),
        element_at(array(lit("N"), lit("A"), lit("R")),
          (pmod(h("rf", ok, ln), lit(3)) + 1).cast("int"))
          .as("l_returnflag"),
        element_at(array(lit("O"), lit("F")),
          (pmod(h("ls", ok, ln), lit(2)) + 1).cast("int"))
          .as("l_linestatus"),
        timestamp_seconds(lit(789004800L) +
          pmod(h("sd", ok, ln), lit(2490)) * 86400L).as("l_shipdate"))
  }

  /** events(event_id, ts, user_id, event_type, value, props): the
    * driver shape at sf0.1 — 100k events / 1,500 users / 5 types over
    * a 30-day window, value in [0, ~560). Timestamps write as
    * TIMESTAMP(MICROS); `NanosParquet.readEvents` normalizes either
    * encoding, so the scaled fixture reads through the same path as
    * the driver data. */
  def events(spark: SparkSession, nEvents: Long, nUsers: Long): DataFrame = {
    val id = col("id")
    spark.range(0, nEvents, 1, 32)
      .select(
        id.as("event_id"),
        timestamp_micros(lit(1704067200000000L) +
          pmod(h("ets", id), lit(30L * 86400L)) * 1000000L +
          pmod(h("eus", id), lit(1000000L))).as("ts"),
        pmod(h("eu", id), lit(nUsers)).as("user_id"),
        element_at(array(Seq("view", "view", "view", "click", "click",
            "signup", "purchase", "error").map(lit): _*),
          (pmod(h("et", id), lit(8)) + 1).cast("int")).as("event_type"),
        (pmod(h("ev", id), lit(56021)).cast("double") / 100.0).as("value"),
        concat(lit("{\"k\": "), pmod(h("ek", id), lit(100)), lit("}"))
          .as("props"))
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleGen <outDir> <mult>")
    val outDir = args(0)
    val mult = args(1).toInt
    require(mult >= 1 && mult <= 100, s"mult out of range: $mult")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // match the driver testdata's TIMESTAMP(MICROS) encoding (the
      // INT96 default is a third encoding nothing else ships)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val m = mult.toLong
    documents(spark, 5000L * m)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    embeddings(spark, 2000L * m)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    orders(spark, 150000L * m, 15000L * m)
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
    lineitem(spark, 150000L * m, 1000L * m, 20000L * m)
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    events(spark, 100000L * m, 1500L * m)
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    println(s"[scalegen] wrote documents/embeddings/orders/lineitem/events " +
      s"at mult=$mult to $outDir")
    spark.stop()
  }
}
