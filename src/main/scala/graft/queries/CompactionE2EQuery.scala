package graft.queries

import graft.compaction.Compaction
import graft.core.CompactionConfig
import graft.txn.{FileEntry, TableMetadata, TableSnapshot}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

/** End-to-end compaction as an oracle-checked query: build a real table
  * (2 data files + position-delete file + equality-delete file) from
  * lineitem, run the FULL engine — scan with `_metadata` hidden columns,
  * anti-join chain, rolling write, CAS commit, validation — and return
  * the committed table's rows. The DuckDB oracle recomputes the expected
  * survivors from lineitem alone, so a hash-match certifies the whole
  * pipeline, not just the join algebra.
  *
  * Layout written (deterministic):
  *  - f1.parquet: even l_orderkey rows, sorted by the unique 6-column row
  *    key, sequence number 1 — physical row i == row_number()-1 of the
  *    sorted even rows;
  *  - f2.parquet: odd rows, same sort, sequence number 3;
  *  - pos-delete: (f1, pos) for pos < 100;
  *  - eq-delete on l_orderkey % 13 == 0 at sequence 2 (hits only f1,
  *    strict seq rule).
  */
object CompactionE2EQuery {

  private val rowKey = MorQueries.rowKey // one verified-unique definition
  private val outCols = Seq("l_orderkey", "l_linenumber", "l_suppkey", "l_returnflag")

  private[queries] def writeOne(df: DataFrame, target: String): (Long, Long) = {
    val tmp = Files.createTempDirectory("graft-e2e-w").toString
    df.write.mode("overwrite").parquet(tmp)
    val parts = new File(tmp).listFiles().filter(_.getName.endsWith(".parquet"))
    require(parts.length == 1,
      s"writeOne expects a single-partition df, got ${parts.length} part files")
    Files.createDirectories(Paths.get(target).getParent)
    Files.move(parts.head.toPath, Paths.get(target), StandardCopyOption.REPLACE_EXISTING)
    // clean the scratch dir (only _SUCCESS/crc markers remain); the table
    // dir itself must outlive this call — the returned DataFrame reads it
    Option(new File(tmp).listFiles()).getOrElse(Array.empty).foreach(_.delete())
    new File(tmp).delete()
    // footer row count — exact, no Spark job per fixture file
    (new File(target).length(),
      graft.sources.ParquetStats.fileStats(target, Nil)._1)
  }

  /** Fixture-file template cache: the expensive synthetic inputs (full
    * lineitem sorts forced into single files) build ONCE per sf dir;
    * each timed run copies them into a fresh table dir, so the per-run
    * cost is the ENGINE (compaction + validation + read-back), not
    * repeated fixture sorting. Pos-delete files are still written per
    * run — they embed the data file's absolute (per-run) path. */
  private val templates =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def templateFiles(dir: String, key: String)(
      build: String => Unit): String =
    templates.computeIfAbsent(s"$dir#$key", _ => {
      val t = Files.createTempDirectory(s"graft-tmpl-$key").toString
      build(t)
      t
    })

  /** Copy one template file into the run's data dir; (path, size, rows)
    * from the copy's own length + footer. */
  private def copyInto(tmpl: String, name: String,
      dataDir: String): (String, Long, Long) = {
    val target = s"$dataDir/$name"
    Files.createDirectories(Paths.get(dataDir))
    Files.copy(Paths.get(s"$tmpl/$name"), Paths.get(target))
    (target, new File(target).length(),
      graft.sources.ParquetStats.fileStats(target, Nil)._1)
  }

  def run(spark: SparkSession, dir: String): DataFrame = {
    val tmpl = templateFiles(dir, "e2e") { t =>
      val li = spark.read.parquet(s"$dir/lineitem.parquet").persist()
      try {
        // single sorted partition => physical row order == sort order
        def sorted(df: DataFrame) =
          df.repartition(1).sortWithinPartitions(rowKey.map(col): _*)
        writeOne(sorted(li.filter(col("l_orderkey") % 2 === 0)), s"$t/f1.parquet")
        writeOne(sorted(li.filter(col("l_orderkey") % 2 === 1)), s"$t/f2.parquet")
        writeOne(li.filter(col("l_orderkey") % 13 === 0)
          .select("l_orderkey").distinct().repartition(1), s"$t/eq-del.parquet")
      } finally li.unpersist()
    }
    val tableDir = Files.createTempDirectory("graft-e2e-table").toString
    val (f1, s1, r1) = copyInto(tmpl, "f1.parquet", s"$tableDir/data")
    val (f2, s2, r2) = copyInto(tmpl, "f2.parquet", s"$tableDir/data")
    val (ed, s4, r4) = copyInto(tmpl, "eq-del.parquet", s"$tableDir/data")
    val pd = s"$tableDir/data/pos-del.parquet"
    val (s3, r3) = writeOne(
      spark.range(100).coalesce(1)
        .select(lit(f1).as("file_path"), col("id").as("pos")), pd)
    TableMetadata.commit(tableDir, TableSnapshot(
      version = 1, schemaId = 1, lastSequenceNumber = 3,
      files = Seq(
        FileEntry(f1, "data", s1, r1, sequenceNumber = 1),
        FileEntry(f2, "data", s2, r2, sequenceNumber = 3),
        FileEntry(pd, "position-deletes", s3, r3, sequenceNumber = 3),
        FileEntry(ed, "equality-deletes", s4, r4, sequenceNumber = 2,
          equalityIds = Seq("l_orderkey")))))

    Compaction.builder()
      .withSpark(spark).withTableDir(tableDir)
      .withConfig(CompactionConfig(enableValidateCompaction = true))
      .build()
      .compact()

    val snap = TableMetadata.loadOrThrow(tableDir)
    spark.read.parquet(snap.files.map(_.path): _*)
      .select(outCols.map(col): _*)
      .orderBy(outCols.map(col): _*)
  }

  /** INCREMENTAL compaction as an oracle-checked query (the reference
    * ships Full only; this is the daily `rewrite_data_files` shape):
    *
    *  - f1 (seq 1, small): l_orderkey % 8 == 0, sorted — SELECTED;
    *  - f2 (seq 3, small): % 8 == 1 — SELECTED;
    *  - f3 (seq 1, LARGE): % 8 >= 2 — KEPT (above the small-file
    *    threshold);
    *  - pos-delete (seq 3): first 50 physical rows of f1 — applied
    *    during the rewrite;
    *  - eq-delete (seq 2) on % 13 == 0 — applies to f1 (applied during
    *    rewrite) AND to the untouched f3 (must be RETAINED by the
    *    commit and applied at read time).
    *
    * The commit must remove exactly {f1, f2}, keep f3 and both delete
    * files, and the final merge-on-read must show: f1 survivors
    * (pos >= 50, not %13), all of f2 (newer than the eq-delete), f3
    * minus %13 — certifying both the selective rewrite and that
    * retained deletes keep working against untouched files. */
  def runIncremental(spark: SparkSession, dir: String): DataFrame = {
    val tmpl = templateFiles(dir, "incr") { t =>
      val li = spark.read.parquet(s"$dir/lineitem.parquet").persist()
      try {
        def sorted(df: DataFrame) =
          df.repartition(1).sortWithinPartitions(rowKey.map(col): _*)
        writeOne(sorted(li.filter(col("l_orderkey") % 8 === 0)), s"$t/f1.parquet")
        writeOne(sorted(li.filter(col("l_orderkey") % 8 === 1)), s"$t/f2.parquet")
        writeOne(sorted(li.filter(col("l_orderkey") % 8 >= 2)), s"$t/f3.parquet")
        writeOne(li.filter(col("l_orderkey") % 13 === 0)
          .select("l_orderkey").distinct().repartition(1), s"$t/eq-del.parquet")
      } finally li.unpersist()
    }
    val tableDir = Files.createTempDirectory("graft-incr-table").toString
    val (f1, s1, r1) = copyInto(tmpl, "f1.parquet", s"$tableDir/data")
    val (f2, s2, r2) = copyInto(tmpl, "f2.parquet", s"$tableDir/data")
    val (f3, s3, r3) = copyInto(tmpl, "f3.parquet", s"$tableDir/data")
    val (ed, s5, r5) = copyInto(tmpl, "eq-del.parquet", s"$tableDir/data")
    val pd = s"$tableDir/data/pos-del.parquet"
    val (s4, r4) = writeOne(
      spark.range(50).coalesce(1)
        .select(lit(f1).as("file_path"), col("id").as("pos")), pd)
    TableMetadata.commit(tableDir, TableSnapshot(
      version = 1, schemaId = 1, lastSequenceNumber = 3,
      files = Seq(
        FileEntry(f1, "data", s1, r1, sequenceNumber = 1),
        FileEntry(f2, "data", s2, r2, sequenceNumber = 3),
        FileEntry(f3, "data", s3, r3, sequenceNumber = 1),
        FileEntry(pd, "position-deletes", s4, r4, sequenceNumber = 3),
        FileEntry(ed, "equality-deletes", s5, r5, sequenceNumber = 2,
          equalityIds = Seq("l_orderkey")))))

    // threshold = 0.75 * s3 sits between the small files (~s3/6) and f3
    Compaction.builder()
      .withSpark(spark).withTableDir(tableDir)
      .withConfig(CompactionConfig(
        enableValidateCompaction = true,
        targetFileSizeBytes = s3,
        compactionType = graft.core.CompactionType.Incremental(0.75)))
      .build()
      .compact()

    // file-level invariants of the selective rewrite (the row-level
    // outcome is what the DuckDB oracle hash-checks below)
    val snap = TableMetadata.loadOrThrow(tableDir)
    val paths = snap.files.map(_.path).toSet
    require(paths.contains(f3), "untouched large file must survive the commit")
    require(paths.contains(pd) && paths.contains(ed),
      "delete files must be retained while untouched data files remain")
    require(!paths.contains(f1) && !paths.contains(f2),
      "selected small files must be removed by the commit")

    graft.sources.TableReader.read(spark, tableDir)
      .select(outCols.map(col): _*)
      .orderBy(outCols.map(col): _*)
  }

  val incrementalOracle: String = {
    val key6 = rowKey.mkString(", ")
    s"""WITH f1 AS (
       |  SELECT *, row_number() OVER (ORDER BY $key6) - 1 AS pos
       |  FROM lineitem WHERE l_orderkey % 8 = 0),
       |f1_live AS (
       |  SELECT * FROM f1 WHERE pos >= 50 AND l_orderkey % 13 <> 0),
       |f2 AS (SELECT * FROM lineitem WHERE l_orderkey % 8 = 1),
       |f3_live AS (
       |  SELECT * FROM lineitem WHERE l_orderkey % 8 >= 2 AND l_orderkey % 13 <> 0),
       |unioned AS (
       |  SELECT l_orderkey, l_linenumber, l_suppkey, l_returnflag FROM f1_live
       |  UNION ALL
       |  SELECT l_orderkey, l_linenumber, l_suppkey, l_returnflag FROM f2
       |  UNION ALL
       |  SELECT l_orderkey, l_linenumber, l_suppkey, l_returnflag FROM f3_live)
       |SELECT * FROM unioned
       |ORDER BY l_orderkey, l_linenumber, l_suppkey, l_returnflag""".stripMargin
  }

  /** Partitioned (bucket-transform) compaction as an oracle-checked query:
    * build a one-file table from lineitem, compact with a
    * `bucket(4, l_orderkey)` partition spec (reference S8: partition
    * values computed from the spec, not raw columns), and return per-file
    * stats where the bucket id is parsed FROM THE COMMITTED FILE PATHS —
    * certifying the physical routing, not just the bucket expression. The
    * oracle recomputes each row's bucket with the same md5-derived hash
    * and aggregates; a hash-match proves every row landed in (exactly)
    * the directory its partition value demands. Leaf files stay
    * self-contained: the original l_orderkey is read from the files
    * themselves (`__p_` mirroring). */
  def runBucket(spark: SparkSession, dir: String): DataFrame = {
    val tmpl = templateFiles(dir, "bkt") { t =>
      writeOne(spark.read.parquet(s"$dir/lineitem.parquet").repartition(1),
        s"$t/f1.parquet")
    }
    val tableDir = Files.createTempDirectory("graft-bkt-table").toString
    val (f1, s1, r1) = copyInto(tmpl, "f1.parquet", s"$tableDir/data")
    TableMetadata.commit(tableDir, TableSnapshot(
      version = 1, schemaId = 1, lastSequenceNumber = 1,
      files = Seq(FileEntry(f1, "data", s1, r1, sequenceNumber = 1))))

    Compaction.builder()
      .withSpark(spark).withTableDir(tableDir)
      .withConfig(CompactionConfig(
        enableValidateCompaction = true,
        partitionSpec = Seq(graft.core.BucketTransform(4, "l_orderkey"))))
      .build()
      .compact()

    val snap = TableMetadata.loadOrThrow(tableDir)
    spark.read.parquet(snap.files.map(_.path): _*)
      .withColumn("bucket",
        regexp_extract(col("_metadata.file_path"),
          "__p_l_orderkey_bucket=(\\d+)", 1).cast("long"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_orderkey")).as("sum_okey"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy("bucket")
  }

  val bucketOracle: String =
    s"""WITH b AS (
       |  SELECT l_orderkey,
       |    ${QuerySql.h64("'bkt:' || l_orderkey")} % 4 AS bucket
       |  FROM lineitem)
       |SELECT bucket, count(*) AS n_rows,
       |  CAST(sum(l_orderkey) AS BIGINT) AS sum_okey,
       |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
       |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin

  val oracle: String = {
    val key6 = rowKey.mkString(", ")
    s"""WITH f1 AS (
       |  SELECT *, row_number() OVER (ORDER BY $key6) - 1 AS pos
       |  FROM lineitem WHERE l_orderkey % 2 = 0),
       |f2 AS (SELECT * FROM lineitem WHERE l_orderkey % 2 = 1),
       |f1_live AS (
       |  SELECT * FROM f1 WHERE pos >= 100 AND l_orderkey % 13 <> 0),
       |unioned AS (
       |  SELECT l_orderkey, l_linenumber, l_suppkey, l_returnflag FROM f1_live
       |  UNION ALL
       |  SELECT l_orderkey, l_linenumber, l_suppkey, l_returnflag FROM f2)
       |SELECT * FROM unioned
       |ORDER BY l_orderkey, l_linenumber, l_suppkey, l_returnflag""".stripMargin
  }
}
