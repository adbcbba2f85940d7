package graft.txn

import graft.SparkTestSession
import graft.sql.GraftCatalog
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** analyze_table distinct counts: committed with an exact file-set
  * hash, served to the CBO only while that file set is unchanged, and
  * suppressed for pruned scans. */
class TableAnalyzeSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    val wh = Files.createTempDirectory("graft-an-wh").toString
    s.conf.set("spark.sql.catalog.gan", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gan.warehouse", wh)
    s
  }
  private def sql(q: String) = spark.sql(q)
  private def wh = spark.conf.get("spark.sql.catalog.gan.warehouse")

  private def statsOf(dir: String, filter: Option[String] = None) = {
    var df = spark.read.format("graft").load(dir)
    filter.foreach(f => df = df.filter(f))
    df.queryExecution.executedPlan
      .collectFirst { case b: BatchScanExec => b }.get
      .scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
  }

  private def ndvOf(dir: String, col: String,
      filter: Option[String] = None): java.util.OptionalLong = {
    val cs = statsOf(dir, filter).columnStats()
      .get(org.apache.spark.sql.connector.expressions.Expressions.column(col))
    if (cs == null) java.util.OptionalLong.empty() else cs.distinctCount()
  }

  test("analyze publishes NDVs; appends fall back to sketches; " +
    "deletes hard-cut") {
    sql("CREATE NAMESPACE IF NOT EXISTS gan.db")
    sql("CREATE TABLE gan.db.t (id BIGINT, grp STRING)")
    sql("""INSERT INTO gan.db.t
          |SELECT id, concat('g', CAST(id % 37 AS STRING)) FROM range(0, 5000)""".stripMargin)
    val dir = s"$wh/db/t"
    // un-analyzed: the WRITE-TIME sketches already serve a distinct
    // count — exact for grp (37 < K distinct hashes survive the merge)
    val preAnalyze = ndvOf(dir, "grp")
    assert(preAnalyze.isPresent && preAnalyze.getAsLong == 37L,
      s"sub-K sketch merge must be exact, got $preAnalyze")
    val res = sql("CALL gan.system.analyze_table(`table` => 'db.t')")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // HLL++ at 1% rsd on 37/5000 distincts is exact or near-exact
    assert(math.abs(res("grp") - 37L) <= 1)
    assert(math.abs(res("id") - 5000L) <= 100)
    val served = ndvOf(dir, "grp")
    assert(served.isPresent && math.abs(served.getAsLong - 37L) <= 1)
    // an append invalidates the EXACT stats (hard hash guard), but the
    // sketch merge — which includes the new file — still serves, so an
    // actively-loaded table keeps NDVs without re-analyzing (r7 gap)
    sql("INSERT INTO gan.db.t VALUES (5000, 'brand-new-group')")
    val afterAppend = ndvOf(dir, "grp")
    assert(afterAppend.isPresent && afterAppend.getAsLong == 38L,
      s"append must serve the sketch-merged count, got $afterAppend")
    assert(TableAnalyze.exactNdv(FileTableCatalog.loadOrThrow(dir)).isEmpty,
      "the exact stats must be invalidated by the append")
    // id has > K distincts -> KMV estimate, rsd ~ 1/sqrt(128)
    val idNdv = ndvOf(dir, "id")
    assert(idNdv.isPresent &&
      math.abs(idNdv.getAsLong - 5001L) <= 5001L / 4,
      s"KMV estimate out of tolerance: $idNdv")
    // a DELETE hides rows the sketches still describe -> hard cut, no
    // statistic at all rather than an overstated one
    sql("DELETE FROM gan.db.t WHERE grp = 'brand-new-group'")
    assert(!ndvOf(dir, "grp").isPresent,
      "deletes must suppress both exact and sketch NDVs")
    // re-analyze restores the exact path
    sql("CALL gan.system.analyze_table(`table` => 'db.t', columns => 'grp')")
    val again = ndvOf(dir, "grp")
    assert(again.isPresent && math.abs(again.getAsLong - 37L) <= 1)
  }

  test("analyze with histogram serves equi-height bins to the scan's " +
    "column statistics; appends invalidate them") {
    sql("CREATE TABLE gan.db.h (id BIGINT, skew BIGINT, s STRING)")
    // heavily skewed column: ~half the rows share value 0
    sql("""INSERT INTO gan.db.h
          |SELECT id, CASE WHEN id % 2 = 0 THEN 0 ELSE id END, 'x'
          |FROM range(0, 4000)""".stripMargin)
    val dir = s"$wh/db/h"
    sql("CALL gan.system.analyze_table(`table` => 'db.h', " +
      "histogram => true, bins => 8)")
    def histOf(c: String) = {
      val cs = statsOf(dir).columnStats()
        .get(org.apache.spark.sql.connector.expressions.Expressions.column(c))
      if (cs == null) java.util.Optional.empty[
        org.apache.spark.sql.connector.read.colstats.Histogram]()
      else cs.histogram()
    }
    val h = histOf("skew")
    assert(h.isPresent, "numeric column must carry a histogram")
    val bins = h.get.bins()
    assert(bins.length == 8)
    assert(h.get.height() == 4000.0 / 8)
    // the skew shows: the low bins sit entirely on the hot value 0
    assert(bins.head.lo() == 0.0 && bins.head.hi() == 0.0 &&
      bins.head.ndv() <= 1, s"hot-value bin: ${bins.head.lo()}..${bins.head.hi()}")
    assert(bins.last.hi() == 3999.0)
    // non-numeric column: NDV yes, histogram no
    assert(!histOf("s").isPresent)
    // an append invalidates the histogram (same hash guard as NDVs)
    sql("INSERT INTO gan.db.h VALUES (9999, 9999, 'y')")
    assert(!histOf("skew").isPresent,
      "append must hard-cut the analyze-time histogram")
    // a histogram-LESS re-analyze must not resurrect the stale one: it
    // refreshes the file-set hash the old histogram would otherwise
    // ride back in on
    sql("CALL gan.system.analyze_table(`table` => 'db.h')")
    assert(ndvOf(dir, "skew").isPresent, "re-analyze must serve NDVs")
    assert(!histOf("skew").isPresent,
      "a stale histogram must not re-validate under the fresh hash")
    // ...and a histogram re-analyze brings it back
    sql("CALL gan.system.analyze_table(`table` => 'db.h', " +
      "histogram => true, bins => 8)")
    assert(histOf("skew").isPresent)
  }

  test("pruned scans suppress table-level NDVs") {
    val dir = s"$wh/db/t"
    sql("CALL gan.system.analyze_table(`table` => 'db.t')")
    assert(ndvOf(dir, "grp").isPresent)
    // a bounds-pruning filter narrows the file set -> table-level NDV
    // would overstate -> suppressed
    val pruned = ndvOf(dir, "grp", Some("id < 10"))
    val all = statsOf(dir).numRows().getAsLong
    val prunedRows = statsOf(dir, Some("id < 10")).numRows().getAsLong
    // precondition, not a guard: if pruning itself regressed this test
    // must fail rather than pass vacuously
    assert(prunedRows < all, "fixture must actually prune files")
    assert(!pruned.isPresent)
  }

  test("iceberg-format analyze publishes a spec-shaped Puffin " +
    "statistics file registered in metadata.json") {
    import spark.implicits._
    val swh = Files.createTempDirectory("graft-an-iwh").toString
    spark.conf.set("spark.sql.catalog.gani", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gani.warehouse", swh)
    spark.conf.set("spark.sql.catalog.gani.format", "iceberg")
    sql("CREATE NAMESPACE IF NOT EXISTS gani.db")
    sql("CREATE TABLE gani.db.st (id BIGINT, k STRING)")
    sql("INSERT INTO gani.db.st SELECT id, CAST(id % 7 AS STRING) FROM range(0, 100)")
    sql("CALL gani.system.analyze_table(`table` => 'db.st')")
    val dir = s"$swh/db/st"
    // the CURRENT metadata.json carries the spec `statistics` field
    val mdFiles = new java.io.File(s"$dir/metadata").listFiles()
      .filter(_.getName.endsWith(".metadata.json")).sortBy(_.getName)
    val md = new String(java.nio.file.Files.readAllBytes(
      mdFiles.last.toPath), "UTF-8")
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(md)
    val stats = node.get("statistics")
    assert(stats != null && stats.size == 1, s"statistics field missing:\n$md")
    val entry = stats.get(0)
    // the entry's snapshot-id IS the snapshot that carries it: readers
    // that exact-match the current snapshot id (Spark-Iceberg's model)
    // must find it — a follow-up-commit registration would reference a
    // snapshot-id that is never current
    assert(entry.get("snapshot-id").asLong ==
      node.get("current-snapshot-id").asLong,
      s"stats snapshot-id must match the carrying snapshot:\n$md")
    val statsPath = entry.get("statistics-path").asText
    assert(new java.io.File(statsPath).length() ==
      entry.get("file-size-in-bytes").asLong)
    // blob metadata: one NDV blob per analyzed column, estimate in the
    // `ndv` property (the theta-blob convention foreign readers use)
    val blobs = entry.get("blob-metadata")
    val byCol = (0 until blobs.size).map { i =>
      val b = blobs.get(i)
      b.get("properties").get("column").asText ->
        (b.get("properties").get("ndv").asText.toLong,
          b.get("offset").asLong, b.get("fields").get(0).asInt)
    }.toMap
    assert(byCol.keySet == Set("id", "k"))
    assert(byCol("k")._1 == 7L, s"k NDV should be exact-ish, got $byCol")
    // the blob BODY is the estimate as 8 bytes big-endian
    val raw = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(statsPath))
    val off = byCol("k")._2.toInt
    val bodyNdv = java.nio.ByteBuffer.wrap(raw, off, 8).getLong
    assert(bodyNdv == byCol("k")._1)
    // field ids resolve through the table schema
    assert(byCol("id")._3 > 0 && byCol("k")._3 > 0)
  }

  test("unknown analyze column is refused") {
    intercept[graft.core.CompactionError.Config] {
      sql("CALL gan.system.analyze_table(`table` => 'db.t', columns => 'nope')")
    }
  }

  test("racing analyzes of disjoint columns merge, not lost-update") {
    sql("CREATE TABLE gan.db.race (id BIGINT, grp STRING)")
    sql("""INSERT INTO gan.db.race
          |SELECT id, concat('g', CAST(id % 7 AS STRING)) FROM range(0, 200)""".stripMargin)
    val dir = s"$wh/db/race"
    // interleave the classic read-merge-write race: while analyze(id)
    // is between its scan and its commit, a CONCURRENT analyze(grp)
    // commits first. The outer commit must RE-MERGE against the
    // reloaded snapshot inside its retry, not overwrite grp's NDV with
    // its pre-race view.
    object racing extends TableCatalog {
      var fired = false
      override def load(t: String) = FileTableCatalog.load(t)
      override def commitCas(t: String, s: TableSnapshot): Unit = {
        if (!fired) {
          fired = true
          TableAnalyze.analyze(spark, t, Seq("grp"), FileTableCatalog)
        }
        FileTableCatalog.commitCas(t, s)
      }
      override def versions(t: String) = FileTableCatalog.versions(t)
      override def loadVersion(t: String, v: Long) = FileTableCatalog.loadVersion(t, v)
      override def deleteVersion(t: String, v: Long) = FileTableCatalog.deleteVersion(t, v)
    }
    TableAnalyze.analyze(spark, dir, Seq("id"), racing)
    assert(racing.fired, "race fixture must actually interleave")
    val ndv = TableAnalyze.currentNdv(FileTableCatalog.loadOrThrow(dir))
    assert(ndv.contains("grp"),
      "concurrently committed NDV column must survive the later commit")
    assert(ndv.contains("id"))
    assert(math.abs(ndv("grp") - 7L) <= 1 && math.abs(ndv("id") - 200L) <= 10)
  }
}
