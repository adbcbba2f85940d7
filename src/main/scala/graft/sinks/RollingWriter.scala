package graft.sinks

import graft.core._
import graft.io.FileIO
import org.apache.spark.sql.DataFrame

/** Size-targeted parquet writing — the Spark analog of the reference's
  * rolling data-file writer (S7/S9,
  * core/src/executor/iceberg_writer/rolling_iceberg_writer.rs:26-132).
  *
  * The reference rolls files imperatively mid-stream; Spark's declarative
  * writer exposes the same control as plan-level knobs, which is the
  * scalable shape (one write task per partition, no driver involvement):
  *
  *  - `targetPartitions` parallel writer tasks (reference X2/X4);
  *  - `maxRecordsPerFile` = targetFileSizeBytes / estimated bytes-per-row,
  *    estimated from the INPUT files' size/row ratio (compaction knows
  *    both) so output files land near the 1 GiB target regardless of row
  *    width;
  *  - snappy compression (reference S9 default).
  *
  * The exact reference rolling predicate is preserved as the pure
  * [[graft.operators.RollingPolicy]] (tested against the ported truth
  * table); at cluster scale the declarative form is strictly better — it
  * needs no per-writer byte feedback loop and AQE balances the writer
  * partitions.
  */
object RollingWriter {

  /** Estimate bytes/row from input stats; conservative fallback 256 B. */
  def estimateBytesPerRow(totalBytes: Long, totalRows: Long): Double =
    if (totalRows > 0 && totalBytes > 0) totalBytes.toDouble / totalRows
    else 256.0

  def maxRecordsPerFile(targetFileSizeBytes: Long, bytesPerRow: Double): Long =
    math.max(1L, (targetFileSizeBytes / math.max(1.0, bytesPerRow)).toLong)

  /** Write `df` as size-targeted parquet data files under `outDir`,
    * returning the written files' metadata (reference
    * core/src/executor/datafusion/mod.rs:73-171 returns Vec<DataFile>).
    *
    * @param partitionSpec fanout partition transforms (reference S8,
    *        FanoutPartitionWriterBuilder, executor/datafusion/mod.rs:157-169):
    *        rows are routed to per-partition-VALUE directories, values
    *        computed by identity/bucket/truncate/day transforms
    *        ([[graft.core.PartitionTransform]]); each writer task fans out
    *        to the partitions it sees, so no extra shuffle is imposed
    *        (Iceberg's `fanout.enabled` shape). Spark's `partitionBy`
    *        drops partition columns from the file DATA (directory names
    *        only), which would silently lose data for any consumer reading
    *        committed leaf files — so the fanout is driven by computed
    *        `__p_<field>` columns: directories are `__p_<field>=<v>/`,
    *        while every data file keeps all original columns with full
    *        type fidelity.
    */
  def write(
      df: DataFrame,
      request: RewriteFilesRequest,
      sequenceNumber: Long,
      partitionSpec: Seq[PartitionTransform] = Nil
  ): Seq[DataFileMeta] = {
    val cfg = request.config
    val inBytes = request.tasks.dataFiles.map(_.lengthBytes).sum
    val inRows = request.tasks.dataFiles.map(_.recordCount).filter(_ >= 0).sum
    val bpr = estimateBytesPerRow(inBytes, inRows)
    val maxRecords = maxRecordsPerFile(cfg.targetFileSizeBytes, bpr)

    val (outDf, partCols) =
      if (partitionSpec.isEmpty) (df, Nil)
      else (
        partitionSpec.foldLeft(df)((d, t) =>
          d.withColumn(s"__p_${t.fieldName}", t.expr(d.schema(t.source).dataType))),
        partitionSpec.map(t => s"__p_${t.fieldName}"))

    // layout: z-order clustering (range-partition + sort on the Morton
    // code, so each output file bounds BOTH z columns) or the reference's
    // plain round-robin repartition (X2)
    var persisted: DataFrame = null
    def requireColumns(cols: Seq[String], what: String): Unit =
      cols.find(!outDf.columns.contains(_)).foreach { missing =>
        throw graft.core.CompactionError.Config(
          s"$what column '$missing' is not in the written schema " +
            s"(${outDf.columns.mkString(", ")})")
      }
    val distributed = cfg.zOrderBy match {
      case Seq(a, b) =>
        import org.apache.spark.sql.functions.{col => c, min => fmin, max => fmax}
        requireColumns(cfg.zOrderBy, "zOrderBy")
        require(!outDf.columns.contains("__zval"),
          "column name __zval is reserved by the z-order writer")
        // normalize both key domains onto 16 bits with exact integer math
        // (raw keys wider than 16 bits would alias on their low bits and
        // cluster nothing). The domain comes from the INPUT files' parquet
        // footer stats — zero Spark jobs; re-aggregating over the live-row
        // plan would run the whole scan + anti-join chain twice, the most
        // expensive part of a 100 TB compaction. Footer stats are a
        // superset of the live domain (deleted rows still count), which
        // normalization tolerates. Fallback when stats are absent or
        // non-integral: persist() the live rows so the min/max pass and
        // the write share one computation.
        val domain: Option[(Long, Long, Long, Long)] =
          graft.sources.ParquetStats
            .minMaxLong(request.tasks.dataFiles.map(_.filePath), Seq(a, b))
            .map(m => (m(a)._1, m(a)._2, m(b)._1, m(b)._2))
        val (mins: Option[(Long, Long, Long, Long)], src: DataFrame) = domain match {
          case some @ Some(_) => (some, outDf)
          case None =>
            persisted = outDf.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            val r = persisted.agg(fmin(c(a)), fmax(c(a)), fmin(c(b)), fmax(c(b))).first()
            if (r.isNullAt(0)) (None, persisted) // empty input
            else {
              def lv(i: Int) = r.getAs[Number](i).longValue
              (Some((lv(0), lv(1), lv(2), lv(3))), persisted)
            }
        }
        mins match {
          case None => src.repartition(cfg.targetPartitions) // empty input
          case Some((amin, amax, bmin, bmax)) =>
            val zc = c("__zval")
            src
              .withColumn("__zval", graft.operators.ZOrder.zValue2(
                graft.operators.ZOrder.normalize16(c(a).cast("long"), amin, amax),
                graft.operators.ZOrder.normalize16(c(b).cast("long"), bmin, bmax)))
              .repartitionByRange(cfg.targetPartitions, zc)
              .sortWithinPartitions(zc)
              .drop("__zval")
        }
      case _ if cfg.sortBy.nonEmpty =>
        // linear sort layout (declared write order). Unpartitioned:
        // range-partition on the sort key, then sort — each task writes
        // a disjoint key slice, the bounds-tightening trade of the
        // sorted DSv2 write path. Partitioned: HASH-cluster on the
        // partition VALUE columns instead (Iceberg's hash distribution
        // mode) — every partition value lands in exactly one task, so
        // compaction converges each bucket/partition to ONE sorted file
        // (unless size rolling splits it), which is the layout the
        // scan's `SupportsReportOrdering` + SPJ fast path needs for
        // exchange-free AND sort-free merge joins. Range-partitioning
        // on the sort key here would make every task fan out to every
        // partition dir: task×partition small files and multiple sorted
        // runs per partition value, which forfeits the sorted report.
        import org.apache.spark.sql.functions.{col => c}
        requireColumns(cfg.sortBy.map(_.column), "sortBy")
        val sortCols = cfg.sortBy.map(f =>
          if (f.descending) c(f.column).desc else c(f.column).asc)
        if (partCols.isEmpty)
          outDf
            .repartitionByRange(cfg.targetPartitions, sortCols: _*)
            .sortWithinPartitions(sortCols: _*)
        else
          outDf
            .repartition(cfg.targetPartitions, partCols.map(c(_)): _*)
            .sortWithinPartitions(partCols.map(c(_).asc) ++ sortCols: _*)
      case _ => outDf.repartition(cfg.targetPartitions)
    }
    try {
      // configured point-lookup blooms ride write options into the
      // parquet output format — rewrites keep the table's bloom coverage
      val writer = graft.core.BloomColumns.applyOptions(
        distributed
          .write
          .mode("overwrite")
          .option("compression", cfg.parquetCompression)
          .option("maxRecordsPerFile", maxRecords),
        cfg.bloomColumns, distributed.schema.fieldNames.toSeq)
      (if (partCols.nonEmpty) writer.partitionBy(partCols: _*) else writer)
        .parquet(request.outputDir)
    } finally if (persisted != null) persisted.unpersist()

    listDataFiles(request.outputDir, sequenceNumber)
  }

  /** Recursively list written parquet files (fanout writes nest files
    * under partition-value directories); resolved through Hadoop
    * [[FileIO]] so object-store output dirs list the same way. */
  def listDataFiles(dir: String, sequenceNumber: Long): Seq[DataFileMeta] =
    FileIO.listFilesRecursive(dir)
      .filter(_._1.endsWith(".parquet"))
      .map { case (path, len) => DataFileMeta(path, len, -1L, sequenceNumber) }
}
