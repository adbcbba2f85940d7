package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions must make the native expressions callable from pure
  * SQL in a session constructed with `withExtensions` (the shared test
  * session is built that way — getOrCreate would ignore extensions on an
  * already-running context, so a per-suite session cannot be used). */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = graft.SparkTestSession.spark

  test("all graft functions are SQL-callable and consistent") {
    spark.sql("SELECT 'the quick brown fox jumps over the lazy dog' AS text")
      .createOrReplaceTempView("ext_docs")
    val row = spark.sql(
      """SELECT
        |  size(shingles(text, 3)) AS n_sh,
        |  size(minhash_signature(shingles(text, 3), 8)) AS n_mh,
        |  simhash32(shingles(text, 3)) AS sim,
        |  size(hashed_set(shingles(text, 3), 'j')) AS n_hs,
        |  hash_min(shingles(text, 3), 'fp') AS hmin,
        |  sorted_intersect_count(hashed_set(shingles(text, 3), 'j'),
        |                         hashed_set(shingles(text, 3), 'j')) AS self_inter,
        |  jaccard_x1000(hashed_set(shingles(text, 3), 'j'),
        |                hashed_set(shingles(text, 3), 'j')) AS self_jac,
        |  round(cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)), 6) AS self_cos
        |FROM ext_docs""".stripMargin).collect().head
    assert(row.getAs[Int]("n_sh") == 7)
    assert(row.getAs[Int]("n_mh") == 8)
    assert(row.getAs[Int]("n_hs") == 7)
    assert(row.getAs[Int]("self_inter") == 7)
    assert(row.getAs[Long]("self_jac") == 1000L)
    assert(row.getAs[Double]("self_cos") == 1.0)
  }

  test("hashKind and hyperplane_bucket are SQL-reachable") {
    val row = spark.sql(
      """SELECT
        |  minhash_signature(array('a','b'), 4, 'xx') AS mh_xx,
        |  minhash_signature(array('a','b'), 4) AS mh_md5,
        |  simhash32(array('a','b'), 'xx') AS sim_xx,
        |  size(hashed_set(array('a','b'), 'j', 'xx')) AS n_hs_xx,
        |  hyperplane_bucket(array_repeat(0.5F, 64), 64, 8) AS hb
        |""".stripMargin).collect().head
    // different hash families must produce different signatures
    assert(row.getSeq[Long](0).toList != row.getSeq[Long](1).toList)
    assert(row.getAs[Int]("n_hs_xx") == 2)
    val hb = row.getAs[Long]("hb")
    assert(hb >= 0 && hb < 256)
  }

  test("non-literal arity arguments are rejected clearly") {
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_signature(array('a'), id + 1) FROM range(1)")
        .collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("graft_table TVF: SQL reads the MoR table, with time travel") {
    import graft.txn.{FileTableCatalog, TableSnapshot, TableWrites}
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tvf").toString
    FileTableCatalog.commitCas(dir, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(dir,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").coalesce(1))
    TableWrites.appendEqualityDeletes(dir,
      Seq(Tuple1(2L)).toDF("id"), Seq("id"))

    // current state through pure SQL == the programmatic read
    val sqlRows = spark.sql(s"SELECT id, v FROM graft_table('$dir') ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(sqlRows == Seq((1L, "a"), (3L, "c")))
    val api = graft.sources.TableReader.read(spark, dir)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(sqlRows == api)

    // time travel to the pre-delete snapshot (v2 = first append)
    val old = spark.sql(s"SELECT id FROM graft_table('$dir', 2) ORDER BY id")
      .as[Long].collect().toSeq
    assert(old == Seq(1L, 2L, 3L))

    // composes with the rest of SQL (joins, aggregates)
    val n = spark.sql(
      s"""SELECT count(*) FROM graft_table('$dir') t
         |JOIN graft_table('$dir', 2) o ON t.id = o.id""".stripMargin)
      .head().getLong(0)
    assert(n == 2L)

    val bad = intercept[Exception] {
      spark.sql("SELECT * FROM graft_table(42)").collect()
    }
    assert(bad.getMessage.contains("string literal"))
  }

  test("graft_net_changes and graft_updates TVFs: SQL CDC surface") {
    import graft.txn.{FileTableCatalog, TableSnapshot, TableWrites}
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tvf-cdc").toString
    FileTableCatalog.commitCas(dir, TableSnapshot(1, 1, 0, Nil))
    // v2: ids 1-3; v3 upsert: id 1 updated, id 2 carry-over, id 9 new
    TableWrites.appendData(dir,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").coalesce(1))
    TableWrites.upsert(dir,
      Seq((1L, "A"), (2L, "b"), (9L, "z")).toDF("id", "v"),
      keyCols = Seq("id"))

    // net from the EMPTY bootstrap: churn cancels per row value — the
    // (1,"a") insert+delete nets away entirely, leaving exactly the
    // final live state as inserts
    val net = spark.sql(
      s"""SELECT id, v, _change_type FROM graft_net_changes('$dir', 1, 3)
         |ORDER BY id, v, _change_type""".stripMargin)
      .as[(Long, String, String)].collect().toSeq
    assert(net == Seq((1L, "A", "insert"), (2L, "b", "insert"),
      (3L, "c", "insert"), (9L, "z", "insert")))
    // ...while the tail interval (v2 onward) shows both directions
    val tail = spark.sql(
      s"""SELECT id, v, _change_type FROM graft_net_changes('$dir', 2, 3)
         |ORDER BY id, v, _change_type""".stripMargin)
      .as[(Long, String, String)].collect().toSeq
    assert(tail == Seq((1L, "A", "insert"), (1L, "a", "delete"),
      (9L, "z", "insert")))

    // updates: id 1 re-types to a pre/post pair, carry-over id 2 drops
    val upd = spark.sql(
      s"""SELECT id, v, _change_type FROM graft_updates('$dir', 1, 3, 'id')
         |WHERE _commit_version = 3 ORDER BY id, v""".stripMargin)
      .as[(Long, String, String)].collect().toSeq
    assert(upd == Seq((1L, "A", "update_postimage"),
      (1L, "a", "update_preimage"), (9L, "z", "insert")))
  }

  test("wrong arity gets the usage string, not IndexOutOfBounds") {
    def usageError(sql: String, expect: String): Unit = {
      val e = intercept[Exception] { spark.sql(sql).collect() }
      def chain(t: Throwable): List[Throwable] =
        if (t == null) Nil else t :: chain(t.getCause)
      val msgs = chain(e).map(x => s"${x.getClass.getName}: ${x.getMessage}")
      assert(msgs.exists(_.contains(expect)), msgs.mkString("\n"))
      assert(!chain(e).exists(_.isInstanceOf[IndexOutOfBoundsException]),
        s"raw IndexOutOfBounds leaked for: $sql")
    }
    usageError("SELECT * FROM graft_updates('/t', 1, 2)",
      "graft_updates(tableDir, fromVersion, toVersion, identifierCols)")
    usageError("SELECT * FROM graft_changes('/t', 1)",
      "graft_changes(tableDir, fromVersion, toVersion)")
    usageError("SELECT * FROM graft_net_changes('/t')",
      "graft_net_changes(tableDir, fromVersion, toVersion)")
    usageError("SELECT * FROM graft_table('/t', 1, 2)",
      "graft_table(tableDir[, asOfVersion])")
    usageError("SELECT shingles('a b c')", "shingles(text, n)")
    usageError("SELECT minhash_signature(array('a'))",
      "minhash_signature(features, numHashes[, hashKind])")
    usageError("SELECT cosine_sim(array(1.0F))", "cosine_sim(a, b)")
    usageError("SELECT hyperplane_bucket(array(0.5F), 1)",
      "hyperplane_bucket(vec, dims, numBits)")
  }
}
