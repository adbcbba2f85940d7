package graft.sinks

import graft.SparkTestSession
import graft.core.{CompactionError, Constraints}
import graft.txn.{TableMetadata, TableSnapshot, TableWrites}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Write-time CHECK constraints ([[graft.core.Constraints]], the Delta
  * `CONSTRAINT ... CHECK` model): every writer path rejects violating
  * batches before any commit, NULL passes (SQL CHECK semantics), and
  * compaction (existing rows) is exempt. */
class ConstraintsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    val wh = Files.createTempDirectory("graft-ck-wh").toString
    s.conf.set("spark.sql.catalog.gck", classOf[graft.sql.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gck.warehouse", wh)
    s
  }
  import spark.implicits._
  private def sql(q: String) = spark.sql(q)

  private def violated(body: => Unit): Unit = {
    val e = intercept[Exception](body)
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.toString +: chain(t.getCause)
    assert(chain(e).exists(_.contains("CHECK constraint")),
      s"expected a CHECK violation, got: $e")
  }

  test("SQL INSERT and MERGE enforce; NULL passes; valid rows commit") {
    sql("CREATE NAMESPACE IF NOT EXISTS gck.db")
    sql(s"""CREATE TABLE gck.db.t (id BIGINT, v BIGINT, s STRING)
           |TBLPROPERTIES (
           |  '${Constraints.Prop}' =
           |    '{"v_pos": "v > 0", "s_len": "length(s) >= 2"}',
           |  'graft.rowlevel.mode'='merge-on-read')""".stripMargin)
    sql("INSERT INTO gck.db.t VALUES (1, 10, 'ok'), (2, NULL, NULL)") // NULL passes
    violated { sql("INSERT INTO gck.db.t VALUES (3, -1, 'ok')") }
    violated { sql("INSERT INTO gck.db.t VALUES (4, 5, 'x')") }
    // the failed INSERTs committed nothing
    assert(sql("SELECT count(*) FROM gck.db.t").collect().head.getLong(0) == 2)
    // MERGE updates route through the delta writer's insert side
    sql("CREATE TABLE gck.db.src (id BIGINT, v BIGINT, s STRING)")
    sql("INSERT INTO gck.db.src VALUES (1, 99, 'up'), (5, 7, 'new')")
    sql("""MERGE INTO gck.db.t USING gck.db.src ON t.id = src.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(sql("SELECT v FROM gck.db.t WHERE id = 1").collect()
      .head.getLong(0) == 99)
    sql("UPDATE gck.db.src SET v = -5")
    violated { sql(
      """MERGE INTO gck.db.t USING gck.db.src ON t.id = src.id
        |WHEN MATCHED THEN UPDATE SET *""".stripMargin) }
    assert(sql("SELECT v FROM gck.db.t WHERE id = 1").collect()
      .head.getLong(0) == 99, "failed MERGE must not partially apply")
  }

  test("library appendData/upsert and streaming ingest enforce") {
    val dir = Files.createTempDirectory("graft-ck-lib").toString
    TableMetadata.commit(dir, TableSnapshot(1, 1, 0, Nil, properties = Map(
      Constraints.Prop -> """{"v_pos": "v > 0"}""")))
    TableWrites.appendData(dir, Seq((1L, 5L)).toDF("id", "v").coalesce(1))
    violated { TableWrites.appendData(dir,
      Seq((2L, -3L)).toDF("id", "v").coalesce(1)) }
    violated { TableWrites.upsert(dir,
      Seq((1L, 0L)).toDF("id", "v"), Seq("id")) }
    val w = graft.streaming.StreamingIngest.batchWriter(dir, schemaId = 1)
    w(Seq((3L, 2L)).toDF("id", "v").coalesce(1), 10L)
    violated { w(Seq((4L, -1L)).toDF("id", "v").coalesce(1), 11L) }
    assert(graft.sources.TableReader.read(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 5L), (3L, 2L)))
    // compaction of EXISTING rows is exempt (it rewrites, not writes)
    graft.compaction.Compaction.builder().withSpark(spark)
      .withTableDir(dir).build().compact()
    assert(graft.sources.TableReader.read(spark, dir).count() == 2)
  }

  test("a malformed or non-boolean constraint fails the write loudly") {
    val dir = Files.createTempDirectory("graft-ck-bad").toString
    TableMetadata.commit(dir, TableSnapshot(1, 1, 0, Nil, properties = Map(
      Constraints.Prop -> """{"bad": "v + 1"}""")))
    val e = intercept[Exception] {
      TableWrites.appendData(dir, Seq((1L, 5L)).toDF("id", "v").coalesce(1))
    }
    assert(e.getMessage.contains("boolean"))
    val dir2 = Files.createTempDirectory("graft-ck-bad2").toString
    TableMetadata.commit(dir2, TableSnapshot(1, 1, 0, Nil, properties = Map(
      Constraints.Prop -> """{"bad": "nope > 0"}""")))
    intercept[Exception] {
      TableWrites.appendData(dir2, Seq((1L, 5L)).toDF("id", "v").coalesce(1))
    }
  }
}
