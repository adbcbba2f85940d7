package graft.txn

import graft.core.{CompactionError, RetryConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** `ANALYZE`-style distinct-count statistics for the cost-based
  * optimizer — the one per-column statistic the write-time stamps
  * cannot provide (a footer has no NDV).
  *
  * `analyze` scans the table's LIVE rows (merge-on-read chain applied)
  * with HyperLogLog++ sketches (`approx_count_distinct`, 1% rsd) and
  * commits the counts as snapshot properties together with a HASH of
  * the exact file set that was scanned. The scan reports
  * `distinctCount` ONLY while the current file set still matches that
  * hash — any append, delete, or compaction silently invalidates the
  * stats instead of feeding the planner numbers about data that no
  * longer exists (Spark's own ANALYZE TABLE keeps serving stale
  * statistics; at 100 TB a stale NDV under-sizes a join output and
  * invites a broadcast OOM, so staleness here is a hard cutoff).
  * Append-mostly tables simply re-run the procedure after batch loads.
  */
object TableAnalyze {

  /** JSON `{column: ndv}` of the last analyze. */
  val NdvProp = "graft.stats.ndv"
  /** [[fileSetHash]] of the snapshot the NDVs were computed against. */
  val FilesHashProp = "graft.stats.files-hash"

  private val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.registerModule(com.fasterxml.jackson.module.scala.DefaultScalaModule)
    m
  }

  /** Order-independent digest of the snapshot's whole file set —
    * data AND delete files (a new deletion vector changes live NDV as
    * surely as an append does). One record per line: paths cannot
    * contain '\n', so distinct sets can never collide by record
    * concatenation. */
  def fileSetHash(snap: TableSnapshot): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    snap.files.map(f => s"${f.path}:${f.sizeBytes}:${f.sequenceNumber}\n")
      .sorted
      .foreach(l => md.update(l.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    md.digest().map("%02x".format(_)).mkString.take(32)
  }

  /** Compute and commit NDVs for `columns` (every HASHABLE top-level
    * column when empty — map/array/struct columns have no distinct-count
    * semantics HLL accepts and are skipped, not fatal). A partial
    * analyze MERGES into still-valid earlier counts for the same file
    * set rather than discarding them. Aborts instead of committing
    * stats for a file set that changed mid-analyze. */
  def analyze(spark: SparkSession, tableDir: String,
      columns: Seq[String] = Nil,
      catalog: TableCatalog = FileTableCatalog): Map[String, Long] = {
    val snap = catalog.loadOrThrow(tableDir)
    // pin the scan to the hashed snapshot: the hash and the rows must
    // describe the SAME version by construction, not by a lucky race
    val df = graft.sources.TableReader.read(spark, tableDir,
      asOfVersion = Some(snap.version), catalog = catalog)
    val hashable = df.schema.fields.filterNot(f =>
      f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType] ||
        f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] ||
        f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
      .map(_.name).toSeq
    // explicit columns resolve case-insensitively, like Spark itself
    val byLower = df.schema.fieldNames.map(n => n.toLowerCase -> n).toMap
    val cols =
      if (columns.isEmpty) hashable
      else columns.map { c =>
        byLower.getOrElse(c.toLowerCase, throw CompactionError.Config(
          s"analyze column '$c' is not in the table schema " +
            s"(${df.schema.fieldNames.mkString(", ")})"))
      }
    if (cols.isEmpty) throw CompactionError.Config(
      "no analyzable (atomic-typed) columns in the table")
    val scannedHash = fileSetHash(snap)
    val aggs = cols.map(c => approx_count_distinct(col(s"`$c`"), 0.01).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val fresh = cols.zipWithIndex.map { case (c, i) => c -> row.getLong(i) }.toMap
    // the merge base is read from EACH ATTEMPT's reloaded snapshot
    // inside the CAS loop: two concurrent analyzes of disjoint column
    // sets both land (the later one re-merges over the earlier commit)
    // instead of the later silently dropping the earlier's columns
    var merged = fresh
    new CommitManager(tableDir, RetryConfig(), catalog = catalog)
      .updateTableProperties(
        expectedSchemaId = snap.schemaId,
        // a file committed between the scan and this commit would make
        // the hash lie about what was analyzed — abort, never publish
        validate = cur => if (fileSetHash(cur) != scannedHash)
          throw CompactionError.StaleRewrite(
            "table files changed while analyzing; re-run analyze_table")) { cur =>
        // validate ran first, so cur's file set IS the scanned one —
        // any EXACT NDVs cur carries for it are safe to merge under
        // (sketch estimates must never be committed as exact counts)
        merged = exactNdv(cur) ++ fresh
        (Map(
          NdvProp -> mapper.writeValueAsString(merged),
          FilesHashProp -> scannedHash), Set.empty)
      }
    merged
  }

  /** NDVs for the planner: the ANALYZED exact counts while still valid
    * for `snap`'s file set, else the write-time sketch merge
    * ([[sketchNdv]]) — which survives appends, the case the hard exact
    * guard (rightly) invalidates. */
  def currentNdv(snap: TableSnapshot): Map[String, Long] = {
    val exact = exactNdv(snap)
    if (exact.nonEmpty) exact else sketchNdv(snap)
  }

  /** The committed NDVs, ONLY while still exact for `snap`'s file set. */
  def exactNdv(snap: TableSnapshot): Map[String, Long] =
    (snap.properties.get(NdvProp), snap.properties.get(FilesHashProp)) match {
      case (Some(json), Some(hash)) if hash == fileSetHash(snap) =>
        try {
          import scala.jdk.CollectionConverters._
          val n = mapper.readTree(json)
          n.properties().asScala.map(e => e.getKey -> e.getValue.asLong).toMap
        } catch { case _: Exception => Map.empty }
      case _ => Map.empty
    }

  /** Append-surviving NDV from the WRITE-TIME sketches
    * ([[graft.core.NdvSketch]]): merge each column's per-file sketches
    * across the current data files. Served ONLY when
    *  - NO delete file exists (a sketch describes its file's contents;
    *    hidden rows would make the merge overstate live NDV, which
    *    undersizes join outputs — the dangerous direction), and
    *  - EVERY data file carries a sketch for the column (an unsketched
    *    file would silently undercount).
    * Deletes, rewrites through non-sketching writers, and pre-feature
    * files therefore hard-cut to "no statistic", exactly like the
    * analyze guard — never a wrong number. */
  def sketchNdv(snap: TableSnapshot): Map[String, Long] = {
    val data = snap.files.filter(_.content == "data")
    if (data.isEmpty || snap.files.exists(_.content != "data")) Map.empty
    else {
      val cols = data.map(_.ndvSketch.keySet).reduce(_ intersect _)
      cols.flatMap { c =>
        graft.core.NdvSketch.estimate(data.map(_.ndvSketch(c)).toSeq)
          .map(c -> _)
      }.toMap
    }
  }
}
