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
  /** JSON `{column: {h: height, b: [[lo, hi, ndv], ...]}}` — the
    * equi-height histograms of the last `analyze(histogram = true)`,
    * guarded by the SAME file-set hash as the NDVs. */
  val HistProp = "graft.stats.histograms"

  /** One column's equi-height histogram: `height` (non-null) rows per
    * bin; bins as (lo, hi, ndv) in the column's DOUBLE-space
    * representation (Catalyst's histogram model). */
  final case class Hist(height: Double, bins: Seq[(Double, Double, Long)])

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
      catalog: TableCatalog = FileTableCatalog,
      /** Also compute EQUI-HEIGHT HISTOGRAMS for the numeric/date/
        * timestamp columns of the analyze set — the distribution
        * statistic that lets the CBO estimate range-predicate and join
        * selectivity on SKEWED data, where min/max + NDV assume a
        * uniformity that can be off by orders of magnitude. Served to
        * Spark through the DSv2 `columnStats().histogram()` surface
        * under the same exact file-set guard as the NDVs. Cost: two
        * extra aggregation passes (percentile boundaries, per-interval
        * distinct counts). */
      histogram: Boolean = false,
      histogramBins: Int = 32): Map[String, Long] = {
    require(histogramBins >= 2 && histogramBins <= 1000,
      s"histogramBins must be in [2, 1000], got $histogramBins")
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
    val freshHist: Map[String, Hist] =
      if (!histogram) Map.empty else computeHistograms(df, cols, histogramBins)
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
        val mergedHist = exactHistograms(cur) ++ freshHist
        // committing a NEW FilesHashProp would falsely re-validate a
        // histogram committed against an OLDER file set (its own hash
        // died with that set) — when no valid histograms survive this
        // commit, the property must go, not linger
        val removeStaleHist: Set[String] =
          if (mergedHist.isEmpty && cur.properties.contains(HistProp))
            Set(HistProp)
          else Set.empty
        (Map(
          NdvProp -> mapper.writeValueAsString(merged),
          FilesHashProp -> scannedHash) ++
          icebergStatisticsProp(tableDir, cur, merged, catalog) ++
          (if (mergedHist.isEmpty) Map.empty[String, String]
           else Map(HistProp -> histJson(mergedHist))), removeStaleHist)
      }
    merged
  }

  /** Iceberg-format tables additionally publish the NDVs as a
    * spec-shaped STATISTICS FILE (Puffin, one blob per column with the
    * estimate in the blob's `ndv` property, spec `statistics` entry in
    * metadata.json) committed ATOMICALLY with the NDV properties: the
    * entry's snapshot-id is the version the commit CREATES, so a reader
    * that exact-matches the current snapshot id finds it (a follow-up
    * commit would register a snapshot-id that is never current).
    * HONEST LIMIT: the blob type is engine-specific (`graft-ndv-v1` —
    * no Apache DataSketches dependency exists here, so real theta
    * sketches cannot be produced); readers that filter blobs by
    * `apache-datasketches-theta-v1` skip it, while the spec field, the
    * per-blob `ndv` property and the 8-byte big-endian body remain
    * inspectable by anything spec-aware. The Puffin is written inside
    * the CAS attempt (a retried attempt strands a small orphan file —
    * harmless); a failure never blocks the analyze commit. */
  private def icebergStatisticsProp(tableDir: String,
      cur: TableSnapshot, ndvs: Map[String, Long],
      catalog: TableCatalog): Map[String, String] = {
    if (!catalog.isInstanceOf[IcebergTableCatalog.type]) return Map.empty
    val fieldIds: Map[String, Int] = cur.currentSchema
      .map(_.fields.map(f => f.name -> f.id).toMap).getOrElse(return Map.empty)
    val committedVersion = cur.version + 1
    val blobs = ndvs.toSeq.sortBy(_._1).flatMap { case (c, n) =>
      fieldIds.get(c).map(id => graft.io.Puffin.NdvBlob(id, c, n))
    }
    if (blobs.isEmpty) return Map.empty
    try {
      val path = s"$tableDir/metadata/stats-" +
        s"${java.util.UUID.randomUUID().toString.take(8)}.puffin"
      val stats = graft.io.Puffin.writeStatsFile(path,
        snapshotId = committedVersion,
        sequenceNumber = cur.lastSequenceNumber, blobs)
      // jackson renders the entry: paths are escaped, not interpolated
      val entry = mapper.createObjectNode()
      entry.put("snapshot-id", committedVersion)
      entry.put("statistics-path", stats.path)
      entry.put("file-size-in-bytes", stats.sizeBytes)
      entry.put("file-footer-size-in-bytes", stats.footerSizeBytes)
      entry.set[com.fasterxml.jackson.databind.JsonNode]("blob-metadata",
        mapper.readTree(stats.blobMetadataJson))
      val arr = mapper.createArrayNode()
      arr.add(entry)
      Map(IcebergTableCatalog.StatisticsProp -> mapper.writeValueAsString(arr))
    } catch { case scala.util.control.NonFatal(_) => Map.empty }
  }

  private def histEligible(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: NumericType | DateType | TimestampType | TimestampNTZType => true
      case _ => false
    }
  }

  /** Two aggregation passes, both covering EVERY eligible column at
    * once: (1) equi-height bin boundaries via `percentile_approx` at
    * `bins + 1` quantiles + the non-null count; (2) per-interval
    * distinct counts via Catalyst's interval-HLL aggregate — the same
    * two-pass shape Spark's own `ANALYZE ... FOR COLUMNS` uses with
    * `spark.sql.statistics.histogram.enabled`. */
  private def computeHistograms(df: org.apache.spark.sql.DataFrame,
      cols: Seq[String], bins: Int): Map[String, Hist] = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val hc = cols.filter(c => histEligible(df.schema(c).dataType))
    if (hc.isEmpty) return Map.empty
    val probs = lit((0 to bins).map(_.toDouble / bins).toArray)
    val aggsA = hc.flatMap(c => Seq(
      percentile_approx(col(s"`$c`").cast("double"), probs, lit(10000)).as(s"p_$c"),
      count(col(s"`$c`")).as(s"n_$c")))
    val rowA = df.agg(aggsA.head, aggsA.tail: _*).head()
    // a column with zero non-null rows yields null percentiles — skip it
    val withEp: Seq[(String, Array[Double], Long)] = hc.flatMap { c =>
      val i = rowA.fieldIndex(s"p_$c")
      if (rowA.isNullAt(i)) None
      else Some((c, rowA.getSeq[Double](i).toArray,
        rowA.getLong(rowA.fieldIndex(s"n_$c"))))
    }
    if (withEp.isEmpty) return Map.empty
    val aggsB = withEp.map { case (c, ep, _) =>
      toCol(org.apache.spark.sql.catalyst.expressions.aggregate
        .ApproxCountDistinctForIntervals(
          toExpr(col(s"`$c`").cast("double")),
          org.apache.spark.sql.catalyst.expressions.Literal
            .create(ep, ArrayType(DoubleType)),
          0.05).toAggregateExpression()).as(s"i_$c")
    }
    val rowB = df.agg(aggsB.head, aggsB.tail: _*).head()
    withEp.map { case (c, ep, nonNull) =>
      val ndvs = rowB.getSeq[Long](rowB.fieldIndex(s"i_$c"))
      c -> Hist(nonNull.toDouble / bins,
        (0 until bins).map(i => (ep(i), ep(i + 1), ndvs(i))))
    }.toMap
  }

  private def histJson(m: Map[String, Hist]): String =
    mapper.writeValueAsString(m.map { case (c, h) =>
      c -> Map("h" -> h.height,
        "b" -> h.bins.map(b => Seq(b._1, b._2, b._3.toDouble)))
    })

  /** The committed histograms, ONLY while still exact for `snap`'s file
    * set (same guard as [[exactNdv]] — the two stats share
    * [[FilesHashProp]]). */
  def exactHistograms(snap: TableSnapshot): Map[String, Hist] =
    (snap.properties.get(HistProp), snap.properties.get(FilesHashProp)) match {
      case (Some(json), Some(hash)) if hash == fileSetHash(snap) =>
        try {
          import scala.jdk.CollectionConverters._
          mapper.readTree(json).properties().asScala.map { e =>
            val h = e.getValue.get("h").asDouble
            val bins = e.getValue.get("b").elements().asScala.map { b =>
              (b.get(0).asDouble, b.get(1).asDouble, b.get(2).asLong)
            }.toSeq
            e.getKey -> Hist(h, bins)
          }.toMap
        } catch { case _: Exception => Map.empty }
      case _ => Map.empty
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
