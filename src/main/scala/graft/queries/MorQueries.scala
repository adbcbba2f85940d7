package graft.queries

import graft.plans.MergeOnRead
import graft.plans.MergeOnRead.EqDeleteTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Merge-on-read correctness queries over the driver testdata.
  *
  * The deletes are SYNTHESIZED deterministically from `lineitem` itself so
  * the DuckDB oracle can reproduce them from the same parquet inputs:
  *
  *  - the table is striped into 4 synthetic "data files"
  *    `f0..f3 = l_orderkey % 4`; position within a file is the row ordinal
  *    ordered by the (l_orderkey, l_linenumber) primary key;
  *  - data sequence numbers: files f0,f1 have seq 1; f2,f3 have seq 3
  *    (so an eq-delete at seq 2 hits only half the data — exercising the
  *    strict `data.seq < delete.seq` rule, reference J2);
  *  - position deletes: the first line of every 10th order;
  *  - equality deletes #1 on key (l_orderkey, l_linenumber), seq 2;
  *  - equality deletes #2 on key (l_suppkey), seq 4 (applies to ALL data).
  *
  * All exercise [[MergeOnRead.liveRows]] — the engine's real join chain.
  */
object MorQueries {

  import MergeOnRead.{SysHiddenFilePath, SysHiddenPos, SysHiddenSeqNum}

  private val outCols = Seq("l_orderkey", "l_linenumber", "l_suppkey", "l_returnflag")

  /** Deterministic total order of lineitem rows (verified unique at
    * sf0.001/0.01/0.1) — (l_orderkey, l_linenumber) alone has duplicates in
    * the synthetic data, which would make pos assignment engine-dependent.
    * Shared with CompactionE2EQuery: BOTH engines' position assignment
    * depends on this exact list. */
  val rowKey: Seq[String] = Seq("l_orderkey", "l_linenumber", "l_partkey",
    "l_suppkey", "l_quantity", "l_extendedprice")

  private def lineitem(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")

  /** lineitem striped into synthetic files with hidden columns attached. */
  def base(spark: SparkSession, dir: String): DataFrame = {
    val fileId = col("l_orderkey") % 4
    val w = Window.partitionBy(fileId).orderBy(rowKey.map(col): _*)
    lineitem(spark, dir)
      .withColumn(SysHiddenFilePath, concat(lit("f"), fileId))
      .withColumn(SysHiddenPos, row_number().over(w).cast("long") - 1)
      .withColumn(SysHiddenSeqNum, when(fileId < 2, 1L).otherwise(3L))
  }

  def posDeletes(spark: SparkSession, dir: String): DataFrame =
    base(spark, dir)
      .filter(col("l_orderkey") % 10 === 0 && col("l_linenumber") === 1)
      .select(SysHiddenFilePath, SysHiddenPos)

  def eqDeletesOrderLine(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .filter(col("l_orderkey") % 7 === 0)
      .select("l_orderkey", "l_linenumber").distinct()
      .withColumn(SysHiddenSeqNum, lit(2L))

  def eqDeletesSupp(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .filter(col("l_suppkey") % 50 === 0)
      .select("l_suppkey").distinct()
      .withColumn(SysHiddenSeqNum, lit(4L))

  private def ordered(df: DataFrame): DataFrame =
    df.orderBy(outCols.map(col): _*)

  /** J3: no deletes — straight projection. */
  def morNoDeletes(spark: SparkSession, dir: String): DataFrame =
    ordered(MergeOnRead.liveRows(base(spark, dir), outCols))

  /** J1: position-delete anti-join. */
  def morPosDeletes(spark: SparkSession, dir: String): DataFrame =
    ordered(MergeOnRead.liveRows(
      base(spark, dir), outCols,
      posDeletes = Some(posDeletes(spark, dir))))

  /** J2: sequence-aware equality-delete anti-join. */
  def morEqDeletes(spark: SparkSession, dir: String): DataFrame =
    ordered(MergeOnRead.liveRows(
      base(spark, dir), outCols,
      eqDeletes = Seq(EqDeleteTable(
        eqDeletesOrderLine(spark, dir), Seq("l_orderkey", "l_linenumber")))))

  /** J2 chained: two equality-delete schemas in file order. */
  def morEqMulti(spark: SparkSession, dir: String): DataFrame =
    ordered(MergeOnRead.liveRows(
      base(spark, dir), outCols,
      eqDeletes = Seq(
        EqDeleteTable(eqDeletesOrderLine(spark, dir), Seq("l_orderkey", "l_linenumber")),
        EqDeleteTable(eqDeletesSupp(spark, dir), Seq("l_suppkey")))))

  /** J1+J2: the full chain — position deletes then both eq-delete tables. */
  def morFull(spark: SparkSession, dir: String): DataFrame =
    ordered(MergeOnRead.liveRows(
      base(spark, dir), outCols,
      posDeletes = Some(posDeletes(spark, dir)),
      eqDeletes = Seq(
        EqDeleteTable(eqDeletesOrderLine(spark, dir), Seq("l_orderkey", "l_linenumber")),
        EqDeleteTable(eqDeletesSupp(spark, dir), Seq("l_suppkey")))))

  /** S1 analog: manifest/file inventory — per synthetic file: content
    * class, record count, byte-proxy (sum of key), min/max pos. */
  def manifestScan(spark: SparkSession, dir: String): DataFrame =
    base(spark, dir)
      .groupBy(col(SysHiddenFilePath).as("file_path"))
      .agg(
        count(lit(1)).as("record_count"),
        max(col(SysHiddenPos)).as("max_pos"),
        min(col(SysHiddenSeqNum)).as("seq_num"))
      .orderBy("file_path")

  /** V1 analog: validator — input MoR row count vs output row count.
    * Emits one row (input_rows, output_rows, valid). */
  def validatorCounts(spark: SparkSession, dir: String): DataFrame = {
    val live = MergeOnRead.liveRows(
      base(spark, dir), outCols,
      posDeletes = Some(posDeletes(spark, dir)),
      eqDeletes = Seq(
        EqDeleteTable(eqDeletesOrderLine(spark, dir), Seq("l_orderkey", "l_linenumber")),
        EqDeleteTable(eqDeletesSupp(spark, dir), Seq("l_suppkey"))))
    val a = live.agg(count(lit(1)).as("output_rows"))
    val b = lineitem(spark, dir).agg(count(lit(1)).as("input_rows"))
    a.crossJoin(b)
      .select(col("input_rows"), col("output_rows"),
        (col("output_rows") <= col("input_rows")).as("valid"))
  }

  /** Oracle SQL (ANSI, DuckDB-runnable) for each query above. */
  private val baseCte =
    """base AS (
      |  SELECT l_orderkey, l_linenumber, l_suppkey, l_returnflag,
      |         'f' || (l_orderkey % 4) AS sys_hidden_file_path,
      |         row_number() OVER (PARTITION BY l_orderkey % 4 ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice) - 1 AS sys_hidden_pos,
      |         CASE WHEN l_orderkey % 4 < 2 THEN 1 ELSE 3 END AS sys_hidden_seq_num
      |  FROM lineitem
      |)""".stripMargin
  private val posCte =
    """pos_del AS (
      |  SELECT sys_hidden_file_path, sys_hidden_pos FROM base
      |  WHERE l_orderkey % 10 = 0 AND l_linenumber = 1
      |)""".stripMargin
  private val eq1Cte =
    """eq_del_1 AS (
      |  SELECT DISTINCT l_orderkey, l_linenumber, 2 AS sys_hidden_seq_num
      |  FROM lineitem WHERE l_orderkey % 7 = 0
      |)""".stripMargin
  private val eq2Cte =
    """eq_del_2 AS (
      |  SELECT DISTINCT l_suppkey, 4 AS sys_hidden_seq_num
      |  FROM lineitem WHERE l_suppkey % 50 = 0
      |)""".stripMargin
  private val afterPos =
    """after_pos AS (
      |  SELECT * FROM base d WHERE NOT EXISTS (
      |    SELECT 1 FROM pos_del p
      |    WHERE p.sys_hidden_file_path = d.sys_hidden_file_path
      |      AND p.sys_hidden_pos = d.sys_hidden_pos)
      |)""".stripMargin
  private def afterEq1(src: String) =
    s"""after_eq1 AS (
       |  SELECT * FROM $src d WHERE NOT EXISTS (
       |    SELECT 1 FROM eq_del_1 e
       |    WHERE e.l_orderkey = d.l_orderkey AND e.l_linenumber = d.l_linenumber
       |      AND d.sys_hidden_seq_num < e.sys_hidden_seq_num)
       |)""".stripMargin
  private val afterEq2 =
    """after_eq2 AS (
      |  SELECT * FROM after_eq1 d WHERE NOT EXISTS (
      |    SELECT 1 FROM eq_del_2 e
      |    WHERE e.l_suppkey = d.l_suppkey
      |      AND d.sys_hidden_seq_num < e.sys_hidden_seq_num)
      |)""".stripMargin
  private val outSel =
    "SELECT l_orderkey, l_linenumber, l_suppkey, l_returnflag FROM %s ORDER BY l_orderkey, l_linenumber, l_suppkey, l_returnflag"

  val oracles: Map[String, String] = Map(
    "mor_no_deletes" ->
      s"WITH $baseCte ${outSel.format("base")}",
    "mor_pos_deletes" ->
      s"WITH $baseCte, $posCte, $afterPos ${outSel.format("after_pos")}",
    "mor_eq_deletes" ->
      s"WITH $baseCte, $eq1Cte, ${afterEq1("base")} ${outSel.format("after_eq1")}",
    "mor_eq_multi" ->
      s"WITH $baseCte, $eq1Cte, $eq2Cte, ${afterEq1("base")}, $afterEq2 ${outSel.format("after_eq2")}",
    "mor_full" ->
      s"WITH $baseCte, $posCte, $eq1Cte, $eq2Cte, $afterPos, ${afterEq1("after_pos")}, $afterEq2 ${outSel.format("after_eq2")}",
    "manifest_scan" ->
      s"""WITH $baseCte
         |SELECT sys_hidden_file_path AS file_path, count(*) AS record_count,
         |       max(sys_hidden_pos) AS max_pos,
         |       CAST(min(sys_hidden_seq_num) AS BIGINT) AS seq_num
         |FROM base GROUP BY 1 ORDER BY 1""".stripMargin,
    "validator_counts" ->
      s"""WITH $baseCte, $posCte, $eq1Cte, $eq2Cte, $afterPos, ${afterEq1("after_pos")}, $afterEq2
         |SELECT (SELECT count(*) FROM lineitem) AS input_rows,
         |       (SELECT count(*) FROM after_eq2) AS output_rows,
         |       (SELECT count(*) FROM after_eq2) <= (SELECT count(*) FROM lineitem) AS valid""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mor_no_deletes" -> (morNoDeletes _),
    "mor_pos_deletes" -> (morPosDeletes _),
    "mor_eq_deletes" -> (morEqDeletes _),
    "mor_eq_multi" -> (morEqMulti _),
    "mor_full" -> (morFull _),
    "manifest_scan" -> (manifestScan _),
    "validator_counts" -> (validatorCounts _)
  )
}
