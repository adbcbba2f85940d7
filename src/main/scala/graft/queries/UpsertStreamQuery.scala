package graft.queries

import graft.sources.TableReader
import graft.streaming.StreamingIngest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.file.Files

/** The CDC/upsert streaming sink ([[StreamingIngest.upsertWriter]]) as
  * an oracle-checked query — the write shape that PRODUCES equality
  * deletes (the reference compaction's raison d'être: Flink-style
  * keyed changelogs landing delete+data pairs every batch):
  *
  *  - batch 0 loads the even-orderkey rows;
  *  - batch 1 upserts: `%4==0` keys updated to 'U', `%4==1` keys are
  *    fresh inserts tagged 'I';
  *  - batch 2 mixes CDC DELETES (`%8==0` keys, flag column) with
  *    updates (`%8==2` → 'V') in one batch — one atomic commit holds
  *    the merged delete file and the new data rows;
  *  - batch 1 is then REPLAYED with poisoned payloads ('X'): the
  *    replay marker must make it a no-op, so sink idempotence lands in
  *    the hash match, not just in a spec.
  *
  * The final merge-on-read read must equal the keyed changelog's net
  * effect, which the oracle recomputes from lineitem in closed form.
  */
object UpsertStreamQuery {

  private val keyCols = Seq("l_orderkey", "l_linenumber", "l_partkey",
    "l_suppkey", "lq", "lep")
  private val outCols = keyCols :+ "l_returnflag"

  private val tables =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def run(spark: SparkSession, dir: String): DataFrame = {
    val tableDir = tables.computeIfAbsent(dir, _ => {
      val td = Files.createTempDirectory("graft-stream-upsert").toString
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .selectExpr("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "CAST(round(l_quantity * 100) AS BIGINT) AS lq",
          "CAST(round(l_extendedprice * 100) AS BIGINT) AS lep",
          "l_returnflag")
        .persist()
      try {
        val w = StreamingIngest.upsertWriter(td, schemaId = 1, keyCols,
          deleteFlagCol = Some("_cdc_delete"))
        def up(df: DataFrame) = df.withColumn("_cdc_delete", lit(false))
        def del(df: DataFrame) = df.withColumn("_cdc_delete", lit(true))
        w(up(li.filter(col("l_orderkey") % 2 === 0)), 0L)
        w(up(li.filter(col("l_orderkey") % 4 === 0)
            .withColumn("l_returnflag", lit("U")))
          .unionByName(up(li.filter(col("l_orderkey") % 4 === 1)
            .withColumn("l_returnflag", lit("I")))), 1L)
        w(del(li.filter(col("l_orderkey") % 8 === 0))
          .unionByName(up(li.filter(col("l_orderkey") % 8 === 2)
            .withColumn("l_returnflag", lit("V")))), 2L)
        // replay of batch 1 with POISONED payloads: the marker must
        // skip it — if it committed, 'X' rows would break the hash
        w(up(li.filter(col("l_orderkey") % 4 === 0)
          .withColumn("l_returnflag", lit("X"))), 1L)
      } finally li.unpersist()
      td
    })
    TableReader.read(spark, tableDir)
      .select(outCols.map(col): _*)
      .orderBy(outCols.map(col): _*)
  }

  val oracle: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
      |  CAST(round(l_quantity * 100) AS BIGINT) AS lq,
      |  CAST(round(l_extendedprice * 100) AS BIGINT) AS lep,
      |  CASE WHEN l_orderkey % 8 = 4 THEN 'U'
      |       WHEN l_orderkey % 8 = 2 THEN 'V'
      |       WHEN l_orderkey % 4 = 1 THEN 'I'
      |       ELSE l_returnflag END AS l_returnflag
      |FROM lineitem
      |WHERE (l_orderkey % 2 = 0 AND l_orderkey % 8 <> 0)
      |   OR l_orderkey % 4 = 1
      |ORDER BY 1, 2, 3, 4, 5, 6, 7""".stripMargin
}
