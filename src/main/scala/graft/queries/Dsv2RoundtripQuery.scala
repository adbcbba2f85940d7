package graft.queries

import graft.txn.{FileTableCatalog, TableSnapshot, TableWrites}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.file.Files

/** DSv2 write + read roundtrip as an oracle-checked query:
  *
  *  1. three `df.write.format("graft").mode("append")` commits land
  *     thirds of lineitem (l_orderkey % 3) — each append runs the
  *     executor-side rolling DataWriter and the CAS append commit;
  *  2. an equality delete on `l_orderkey % 17 == 0` lands BETWEEN the
  *     second and third append, so it kills matching rows of the first
  *     two commits while the third (newer sequence) survives it;
  *  3. `spark.read.format("graft")` reads the live rows back WITH a
  *     pushed filter (`l_orderkey % 2 = 0` stays a residual Spark
  *     re-applies; the DSv2 reader applies the delete chain per task).
  *
  * The oracle recomputes the survivors from lineitem alone, so a
  * hash-match certifies the whole DSv2 surface end-to-end: writer
  * rolling + attempt publish + append sequencing + per-task
  * position/equality delete application + residual filtering.
  */
object Dsv2RoundtripQuery {

  private val outCols = Seq("l_orderkey", "l_linenumber", "l_suppkey", "l_returnflag")

  private val tables =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def run(spark: SparkSession, dir: String): DataFrame = {
    val tableDir = tables.computeIfAbsent(dir, _ => {
      val td = Files.createTempDirectory("graft-dsv2-rt").toString
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(outCols.map(col): _*).persist()
      try {
        FileTableCatalog.commitCas(td, TableSnapshot(1, 1, 0, Nil))
        def appendThird(k: Int): Unit =
          li.filter(col("l_orderkey") % 3 === k)
            .write.format("graft").mode("append").save(td)
        appendThird(0) // seq 1
        appendThird(1) // seq 2
        TableWrites.appendEqualityDeletes(td, // seq 3
          li.filter(col("l_orderkey") % 17 === 0).select("l_orderkey"),
          Seq("l_orderkey"))
        appendThird(2) // seq 4 — survives the delete
      } finally li.unpersist()
      td
    })
    spark.read.format("graft").load(tableDir)
      .filter(col("l_orderkey") % 2 === 0)
      .select(outCols.map(col): _*)
      .orderBy(outCols.map(col): _*)
  }

  val oracle: String =
    """SELECT l_orderkey, l_linenumber, l_suppkey, l_returnflag
      |FROM lineitem
      |WHERE l_orderkey % 2 = 0
      |  AND (l_orderkey % 3 = 2 OR l_orderkey % 17 <> 0)
      |ORDER BY l_orderkey, l_linenumber, l_suppkey, l_returnflag""".stripMargin
}
