package graft.queries

import graft.compaction.Compaction
import graft.core.CompactionConfig
import graft.sources.TableReader
import graft.txn.{FileTableCatalog, TableMetadata, TableSnapshot, TableWrites}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Batch CDC as an oracle-checked query ([[TableReader.changelog]]):
  * drive a table through appends, an equality delete, a position
  * delete, and a FULL COMPACTION, then read the per-commit changelog of
  * the whole interval. The hash-match certifies:
  *
  *   - insert attribution (each append's rows appear exactly once, at
  *     its own `commit_version`);
  *   - delete semantics per kind (the eq-delete hits only OLDER rows;
  *     the position delete names physical ordinals, minus the rows the
  *     eq-delete already killed — a multiset diff, not a file replay);
  *   - compaction invisibility (the rewrite commit contributes ZERO
  *     change rows even though it replaced every file).
  *
  * Fixture versions are deterministic (v1 bootstrap … v6 compaction),
  * so the oracle pins the attribution by constant.
  */
object ChangelogQuery {

  private val rowKey = MorQueries.rowKey
  private val outCols = Seq("l_orderkey", "l_linenumber", "l_suppkey", "l_returnflag")
  private val orderCols = outCols ++ Seq("change_type", "commit_version")

  private val builtTables =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def buildTable(spark: SparkSession, dir: String): String =
    builtTables.computeIfAbsent(dir, _ => {
      val tableDir = Files.createTempDirectory("graft-changelog").toString
      val li = spark.read.parquet(s"$dir/lineitem.parquet").persist()
      try {
        def sorted(df: DataFrame) =
          df.repartition(1).sortWithinPartitions(rowKey.map(col): _*)
        TableMetadata.commit(tableDir, TableSnapshot(1, 1, 0, Nil))
        // v2: even rows, one sorted file (physical pos == oracle ordinal)
        TableWrites.appendData(tableDir,
          sorted(li.filter(col("l_orderkey") % 2 === 0)))
        val dataFiles = TableMetadata.loadOrThrow(tableDir)
          .files.filter(_.content == "data")
        require(dataFiles.size == 1,
          s"expected 1 data file from the sorted append, got ${dataFiles.size}")
        // v3: equality-delete every 13th orderkey (hits only v2 data)
        TableWrites.appendEqualityDeletes(tableDir,
          li.filter(col("l_orderkey") % 13 === 0).select("l_orderkey"),
          Seq("l_orderkey"))
        // v4: odd rows — newer than the delete, unaffected by it
        TableWrites.appendData(tableDir,
          sorted(li.filter(col("l_orderkey") % 2 === 1)))
        // v5: position-delete the first 100 physical rows of the v2 file
        TableWrites.appendPositionDeletes(tableDir,
          spark.range(100).select(
            lit(dataFiles.head.path).as("file_path"), col("id").as("pos")))
      } finally li.unpersist()
      // v6: full compaction — rewrites every file, changes no rows
      Compaction.builder()
        .withSpark(spark).withTableDir(tableDir)
        .withConfig(CompactionConfig(enableValidateCompaction = true))
        .build()
        .compact()
      require(TableMetadata.loadOrThrow(tableDir).version == 6,
        "fixture drifted: the compaction commit should be v6")
      tableDir
    })

  def run(spark: SparkSession, dir: String): DataFrame = {
    val tableDir = buildTable(spark, dir)
    TableReader.changelog(spark, tableDir, fromVersion = 1, toVersion = 6)
      .withColumnRenamed("_change_type", "change_type")
      .withColumnRenamed("_commit_version", "commit_version")
      .select(orderCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
  }

  /** NET changes ([[TableReader.netChangelog]]) over TWO intervals of
    * the same fixture, tagged in one result:
    *
    *   - `full` (v1→v6, from the empty bootstrap): every insert that a
    *     later delete killed must CANCEL — the net is exactly the final
    *     live state as inserts, nothing else;
    *   - `tail` (v2→v6): both change types survive — the odd-row append
    *     nets to inserts, the eq-/pos-deleted even rows net to deletes.
    *
    * The hash-match certifies insert/delete cancellation per row value
    * and the multiset identity net(changelog) = endpoint-state diff. */
  def runNet(spark: SparkSession, dir: String): DataFrame = {
    val tableDir = buildTable(spark, dir)
    // identifier columns = the verified-unique row key + the projected
    // outputs: the netting shuffle carries 8 columns, not all 16
    val idCols = (rowKey ++ outCols).distinct
    def net(from: Long, tag: String): DataFrame =
      TableReader.netChangelog(spark, tableDir, from, 6, columns = idCols)
        .withColumn("interval", lit(tag))
    val cols = ("interval" +: outCols) ++ Seq("change_type", "change_count")
    net(1, "full").unionByName(net(2, "tail"))
      .withColumnRenamed("_change_type", "change_type")
      .withColumnRenamed("_change_count", "change_count")
      .select(cols.map(col): _*)
      .orderBy(cols.map(col): _*)
  }

  val netOracle: String = {
    val key6 = rowKey.mkString(", ")
    val cols = outCols.mkString(", ")
    s"""WITH f1 AS (
       |  SELECT *, row_number() OVER (ORDER BY $key6) - 1 AS pos
       |  FROM lineitem WHERE l_orderkey % 2 = 0),
       |f2 AS (SELECT * FROM lineitem WHERE l_orderkey % 2 = 1),
       |ch AS (
       |  SELECT 'full' AS interval, $cols, 'insert' AS change_type,
       |         CAST(1 AS BIGINT) AS change_count
       |  FROM f1 WHERE l_orderkey % 13 <> 0 AND pos >= 100
       |  UNION ALL
       |  SELECT 'full', $cols, 'insert', CAST(1 AS BIGINT) FROM f2
       |  UNION ALL
       |  SELECT 'tail', $cols, 'insert', CAST(1 AS BIGINT) FROM f2
       |  UNION ALL
       |  SELECT 'tail', $cols, 'delete', CAST(1 AS BIGINT)
       |  FROM f1 WHERE l_orderkey % 13 = 0 OR pos < 100)
       |SELECT * FROM ch
       |ORDER BY interval, $cols, change_type, change_count""".stripMargin
  }

  // -------- update pairing (compute_updates) ----------------------------

  private val updateTables =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Update-paired CDC ([[TableReader.changelogUpdates]]): one upsert
    * commit that mixes every change species —
    *
    *   - keys %10==1 get NEW values → `update_preimage`/`update_postimage`
    *     pairs (the delete+insert of one key in one commit re-typed);
    *   - keys %10==2 are rewritten IDENTICALLY → carry-overs, dropped
    *     entirely (the upsert noise Iceberg's compute_updates removes);
    *   - keys %10==3 spawn brand-new keys → plain inserts;
    *   - keys %10==4 are CDC-deleted → plain deletes;
    *
    * against the base append's plain inserts at v2. The hash-match
    * certifies the pairing, the carry-over removal, and that nothing
    * else was touched. */
  def runUpdates(spark: SparkSession, dir: String): DataFrame = {
    val tableDir = updateTables.computeIfAbsent(dir, _ => {
      val td = Files.createTempDirectory("graft-cdc-upd").toString
      val base = spark.read.parquet(s"$dir/orders.parquet").select(
        col("o_orderkey"), col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"))
      TableMetadata.commit(td, TableSnapshot(1, 1, 0, Nil))
      TableWrites.appendData(td, base) // v2
      val updated = base.filter(col("o_orderkey") % 10 === 1)
        .withColumn("o_orderpriority", lit("UPDATED"))
        .withColumn("price_cents", col("price_cents") + 5L)
      val carryover = base.filter(col("o_orderkey") % 10 === 2)
      val fresh = base.filter(col("o_orderkey") % 10 === 3)
        .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
      TableWrites.upsert(td, // v3
        updated.unionByName(carryover).unionByName(fresh),
        keyCols = Seq("o_orderkey"),
        deleteKeys = Some(base.filter(col("o_orderkey") % 10 === 4)
          .select("o_orderkey")))
      require(TableMetadata.loadOrThrow(td).version == 3,
        "fixture drifted: the upsert commit should be v3")
      td
    })
    val cols = Seq("o_orderkey", "o_orderpriority", "price_cents",
      "change_type", "commit_version")
    TableReader.changelogUpdates(spark, tableDir, fromVersion = 1,
        toVersion = 3, identifierColumns = Seq("o_orderkey"))
      .withColumnRenamed("_change_type", "change_type")
      .withColumnRenamed("_commit_version", "commit_version")
      .select(cols.map(col): _*)
      .orderBy(cols.map(col): _*)
  }

  val updatesOracle: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderpriority,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
      |  FROM orders),
      |ch AS (
      |  SELECT o_orderkey, o_orderpriority, price_cents,
      |    'insert' AS change_type, CAST(2 AS BIGINT) AS commit_version
      |  FROM base
      |  UNION ALL
      |  SELECT o_orderkey, o_orderpriority, price_cents,
      |    'update_preimage', 3 FROM base WHERE o_orderkey % 10 = 1
      |  UNION ALL
      |  SELECT o_orderkey, 'UPDATED', price_cents + 5,
      |    'update_postimage', 3 FROM base WHERE o_orderkey % 10 = 1
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, o_orderpriority, price_cents,
      |    'insert', 3 FROM base WHERE o_orderkey % 10 = 3
      |  UNION ALL
      |  SELECT o_orderkey, o_orderpriority, price_cents,
      |    'delete', 3 FROM base WHERE o_orderkey % 10 = 4)
      |SELECT * FROM ch ORDER BY 1, 2, 3, 4, 5""".stripMargin

  private val replicaDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** CDC replication end-to-end ([[graft.txn.Replicate]]): bootstrap a
    * keyed replica at v2 (the checkpoint-consumer pattern), then ONE
    * sync applies the rest of the history as net changes — deletes,
    * re-inserts and compaction noise included. The replica read must
    * equal the source's final live state, and a replayed sync must
    * no-op (checkpoint idempotence). */
  def runReplicate(spark: SparkSession, dir: String): DataFrame = {
    val tableDir = buildTable(spark, dir)
    val replicaDir = replicaDirs.computeIfAbsent(dir, _ => {
      val dst = Files.createTempDirectory("graft-replica").toString
      graft.txn.Replicate.bootstrap(spark, tableDir, dst, rowKey,
        atVersion = 2)
      val v = graft.txn.Replicate.sync(spark, tableDir, dst, rowKey)
      require(v == 6, s"fixture drifted: sync should land at v6, got $v")
      require(graft.txn.Replicate.sync(spark, tableDir, dst, rowKey) == v,
        "a replayed sync must be a checkpoint no-op")
      dst
    })
    TableReader.read(spark, replicaDir)
      .select(outCols.map(col): _*).orderBy(outCols.map(col): _*)
  }

  val replicateOracle: String = {
    val key6 = rowKey.mkString(", ")
    val cols = outCols.mkString(", ")
    s"""WITH f1 AS (
       |  SELECT *, row_number() OVER (ORDER BY $key6) - 1 AS pos
       |  FROM lineitem WHERE l_orderkey % 2 = 0),
       |f2 AS (SELECT * FROM lineitem WHERE l_orderkey % 2 = 1),
       |live AS (
       |  SELECT $cols FROM f1 WHERE l_orderkey % 13 <> 0 AND pos >= 100
       |  UNION ALL
       |  SELECT $cols FROM f2)
       |SELECT * FROM live ORDER BY $cols""".stripMargin
  }

  val oracle: String = {
    val key6 = rowKey.mkString(", ")
    val cols = outCols.mkString(", ")
    s"""WITH f1 AS (
       |  SELECT *, row_number() OVER (ORDER BY $key6) - 1 AS pos
       |  FROM lineitem WHERE l_orderkey % 2 = 0),
       |f2 AS (SELECT * FROM lineitem WHERE l_orderkey % 2 = 1),
       |ch AS (
       |  SELECT $cols, 'insert' AS change_type,
       |         CAST(2 AS BIGINT) AS commit_version FROM f1
       |  UNION ALL
       |  SELECT $cols, 'delete', CAST(3 AS BIGINT)
       |  FROM f1 WHERE l_orderkey % 13 = 0
       |  UNION ALL
       |  SELECT $cols, 'insert', CAST(4 AS BIGINT) FROM f2
       |  UNION ALL
       |  SELECT $cols, 'delete', CAST(5 AS BIGINT)
       |  FROM f1 WHERE pos < 100 AND l_orderkey % 13 <> 0)
       |SELECT * FROM ch
       |ORDER BY ${orderCols.mkString(", ")}""".stripMargin
  }
}
