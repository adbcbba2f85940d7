package graft.queries

import graft.sources.TableReader
import graft.txn.{TableMetadata, TableSnapshot, TableWrites}
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

  def run(spark: SparkSession, dir: String): DataFrame = {
    val tableDir = Files.createTempDirectory("graft-lifecycle").toString
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    def sorted(df: DataFrame) =
      df.repartition(1).sortWithinPartitions(rowKey.map(col): _*)

    TableMetadata.commit(tableDir, TableSnapshot(1, 1, 0, Nil))
    // seq 1: even rows, physically sorted so row i == row_number()-1
    TableWrites.appendData(tableDir, sorted(li.filter(col("l_orderkey") % 2 === 0)))
    // seq 2: equality-delete every 13th orderkey (hits only seq-1 data)
    TableWrites.appendEqualityDeletes(tableDir,
      li.filter(col("l_orderkey") % 13 === 0).select("l_orderkey"),
      Seq("l_orderkey"))
    // seq 3: odd rows — newer than the delete, all survive
    TableWrites.appendData(tableDir, sorted(li.filter(col("l_orderkey") % 2 === 1)))
    // seq 4: position-delete the first 100 physical rows of the seq-1 file
    val firstFile = TableMetadata.loadOrThrow(tableDir)
      .files.filter(_.content == "data").minBy(_.sequenceNumber).path
    TableWrites.appendPositionDeletes(tableDir,
      spark.range(100).select(lit(firstFile).as("file_path"), col("id").as("pos")))

    TableReader.read(spark, tableDir)
      .select(outCols.map(col): _*)
      .orderBy(outCols.map(col): _*)
  }

  val oracle: String = {
    val key6 = rowKey.mkString(", ")
    s"""WITH even AS (
       |  SELECT *, row_number() OVER (ORDER BY $key6) - 1 AS pos
       |  FROM lineitem WHERE l_orderkey % 2 = 0),
       |odd AS (SELECT * FROM lineitem WHERE l_orderkey % 2 = 1),
       |even_live AS (
       |  SELECT * FROM even WHERE pos >= 100 AND l_orderkey % 13 <> 0),
       |unioned AS (
       |  SELECT l_orderkey, l_linenumber, l_suppkey, l_returnflag FROM even_live
       |  UNION ALL
       |  SELECT l_orderkey, l_linenumber, l_suppkey, l_returnflag FROM odd)
       |SELECT * FROM unioned
       |ORDER BY l_orderkey, l_linenumber, l_suppkey, l_returnflag""".stripMargin
  }
}
