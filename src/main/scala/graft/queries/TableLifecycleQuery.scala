package graft.queries

import graft.sources.TableReader
import graft.txn.{FileTableCatalog, IcebergTableCatalog, TableCatalog, TableSnapshot, TableWrites}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Write-API lifecycle as an oracle-checked query: drive the table
  * exclusively through the PUBLIC write/read surface —
  *
  *  1. bootstrap an empty table;
  *  2. [[TableWrites.appendData]] the even-orderkey lineitem rows
  *     (one sorted file, sequence 1);
  *  3. [[TableWrites.appendEqualityDeletes]] on l_orderkey % 13 == 0
  *     (sequence 2 — applies to the older data only);
  *  4. appendData the odd rows (sequence 3 — SURVIVE the delete);
  *  5. [[TableWrites.appendPositionDeletes]] for positions 0..99 of the
  *     first data file;
  *  6. [[TableReader.read]] — merge-on-read WITHOUT any compaction.
  *
  * The DuckDB oracle recomputes the survivors from lineitem alone, so a
  * hash-match certifies the append/delete commit semantics AND the
  * user-facing read path end-to-end. `compaction_e2e` certifies the
  * same algebra through the compactor; this certifies it through the
  * public API with sequence numbers assigned by the commits themselves.
  */
object TableLifecycleQuery {

  private val rowKey = MorQueries.rowKey
  private val outCols = Seq("l_orderkey", "l_linenumber", "l_suppkey", "l_returnflag")

  def run(spark: SparkSession, dir: String): DataFrame =
    runWith(spark, dir, FileTableCatalog, "graft-lifecycle")

  /** The SAME lifecycle against the Iceberg v2 format catalog — every
    * commit lands as metadata.json + Avro manifests, every load walks
    * snapshot -> manifest list -> manifest entries, and the final MoR
    * read must hash-match the identical DuckDB oracle. */
  def runIceberg(spark: SparkSession, dir: String): DataFrame =
    runWith(spark, dir, IcebergTableCatalog, "graft-lifecycle-iceberg")

  /** Filtered MoR read: the same table, read with a predicate declared
    * through [[TableReader.read]]'s `filter` — Catalyst pushes it through
    * the anti-join chain to the parquet scan (PlanQualitySpec pins the
    * `PushedFilters`), and the oracle applies the same predicate over the
    * recomputed survivors. */
  def runFiltered(spark: SparkSession, dir: String): DataFrame = {
    val tableDir = buildTable(spark, dir, FileTableCatalog, "graft-lifecycle-filt")
    TableReader.read(spark, tableDir,
        filter = Some(col("l_suppkey") % 10 === 3))
      .select(outCols.map(col): _*)
      .orderBy(outCols.map(col): _*)
  }

  private def runWith(spark: SparkSession, dir: String,
      catalog: TableCatalog, prefix: String): DataFrame = {
    val tableDir = buildTable(spark, dir, catalog, prefix)
    TableReader.read(spark, tableDir, catalog = catalog)
      .select(outCols.map(col): _*)
      .orderBy(outCols.map(col): _*)
  }

  /** Drive the table through the public write API; returns the table dir. */
  private def buildTable(spark: SparkSession, dir: String,
      catalog: TableCatalog, prefix: String): String = {
    val tableDir = Files.createTempDirectory(prefix).toString
    // fixture-only cache: three appends derive from one lineitem read
    val li = spark.read.parquet(s"$dir/lineitem.parquet").persist()
    try {
      def sorted(df: DataFrame) =
        df.repartition(1).sortWithinPartitions(rowKey.map(col): _*)

      catalog.commitCas(tableDir, TableSnapshot(1, 1, 0, Nil))
      // seq 1: even rows, physically sorted so row i == row_number()-1
      TableWrites.appendData(tableDir,
        sorted(li.filter(col("l_orderkey") % 2 === 0)), catalog = catalog)
      // the position/oracle mapping assumes the sorted single-partition
      // append landed as ONE physical file (a maxRecordsPerFile-style
      // session setting would split it and positions would diverge from
      // the oracle's global ordinal — fail clearly instead)
      val dataFilesAfterFirst = catalog.loadOrThrow(tableDir)
        .files.count(_.content == "data")
      require(dataFilesAfterFirst == 1,
        s"expected 1 data file from the sorted append, got $dataFilesAfterFirst")
      // seq 2: equality-delete every 13th orderkey (hits only seq-1 data)
      TableWrites.appendEqualityDeletes(tableDir,
        li.filter(col("l_orderkey") % 13 === 0).select("l_orderkey"),
        Seq("l_orderkey"), catalog = catalog)
      // seq 3: odd rows — newer than the delete, all survive
      TableWrites.appendData(tableDir,
        sorted(li.filter(col("l_orderkey") % 2 === 1)), catalog = catalog)
    } finally li.unpersist()
    // seq 4: position-delete the first 100 physical rows of the seq-1 file
    val firstFile = catalog.loadOrThrow(tableDir)
      .files.filter(_.content == "data").minBy(_.sequenceNumber).path
    TableWrites.appendPositionDeletes(tableDir,
      spark.range(100).select(lit(firstFile).as("file_path"), col("id").as("pos")),
      catalog = catalog)
    tableDir
  }

  /** Same expected-survivor computation as the compaction e2e (this
    * query certifies the identical algebra through the public API) —
    * ONE shared definition so the scenarios cannot drift apart. */
  val oracle: String = CompactionE2EQuery.oracle

  /** The shared survivor computation with the pushed predicate applied
    * on top (filter and anti-join commute, so this is the law the
    * filtered read must satisfy). */
  val filteredOracle: String =
    s"""SELECT * FROM (
       |${CompactionE2EQuery.oracle}
       |) WHERE l_suppkey % 10 = 3
       |ORDER BY l_orderkey, l_linenumber, l_suppkey, l_returnflag""".stripMargin
}
