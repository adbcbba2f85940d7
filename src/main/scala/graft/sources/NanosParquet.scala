package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scoped reader for parquet files carrying TIMESTAMP(NANOS) columns.
  *
  * Spark reads nanosecond timestamps only as `BIGINT` nanos behind
  * `spark.sql.legacy.parquet.nanosAsLong` — but mutating the SESSION conf
  * from inside a query constructor leaks long-typed reads to every later
  * timestamp consumer in the same session (order-dependent
  * action-at-a-distance). Scoping the flag to one read requires two
  * pieces, because each alone is insufficient:
  *
  *  - an EXPLICIT schema, so driver-side schema inference (which consults
  *    only the session conf and would throw `PARQUET_TYPE_ILLEGAL`) is
  *    skipped entirely;
  *  - the flag as a per-read OPTION, which Spark copies into this scan's
  *    Hadoop conf (`newHadoopConfWithOptions`) where the executor-side
  *    footer conversion reads it.
  *
  * The session conf is never touched.
  */
object NanosParquet {

  /** Read `path` with `schemaDDL` (nanos timestamp columns declared
    * BIGINT), without mutating any session conf. */
  def read(spark: SparkSession, path: String, schemaDDL: String): DataFrame =
    spark.read
      .schema(schemaDDL)
      .option("spark.sql.legacy.parquet.nanosAsLong", "true")
      .parquet(path)

  /** Driver-testdata `events` table: `ts` surfaced as BIGINT epoch-nanos
    * regardless of the file's own precision. */
  val EventsSchema =
    "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, " +
      "value DOUBLE, props STRING"

  /** The file's `ts` timestamp unit, from its own footer (memoized per
    * path+mtime — the driver regenerates testdata between rounds). */
  private val nanosByPath =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long),
      java.lang.Boolean]()
  private def tsIsNanos(path: String): Boolean = {
    // key on length AND mtime: a regenerated file of identical byte
    // length must not serve a stale unit decision
    val fs = graft.io.FileIO.fs(path)
    val st0 = fs.getFileStatus(new org.apache.hadoop.fs.Path(path))
    // a Spark-written table is a DIRECTORY of part files with ONE
    // schema — sniff any part file's footer (the scale fixtures write
    // this layout; the driver testdata is a single file). The listing
    // RECURSES so Hive-partitioned layouts (day=…/part-*.parquet, no
    // top-level files) resolve too; any part file serves, they share
    // the schema.
    val st =
      if (!st0.isDirectory) st0
      else {
        val it = fs.listFiles(st0.getPath, true)
        var found: org.apache.hadoop.fs.FileStatus = null
        while (found == null && it.hasNext) {
          val s = it.next()
          if (s.getPath.getName.endsWith(".parquet")) found = s
        }
        if (found == null) throw new java.io.FileNotFoundException(
          s"no parquet part files under $path")
        found
      }
    val key = (path, st.getLen, st.getModificationTime)
    nanosByPath.computeIfAbsent(key, _ => {
      val inFile = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        st.getPath, graft.io.FileIO.hadoopConf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(inFile)
      try {
        val schema = r.getFooter.getFileMetaData.getSchema
        val t = schema.getType(schema.getFieldIndex("ts"))
        t.getLogicalTypeAnnotation match {
          case ts: org.apache.parquet.schema.LogicalTypeAnnotation
              .TimestampLogicalTypeAnnotation =>
            ts.getUnit ==
              org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit.NANOS
          case _ => false
        }
      } finally r.close()
    })
  }

  /** Every consumer computes in epoch-nanos (`ts div 1000` → µs, the
    * precision the DuckDB oracles use), so both encodings the driver has
    * shipped — TIMESTAMP(NANOS) and TIMESTAMP(MICROS) — normalize here:
    * nanos reads long behind the legacy flag; micros reads as a real
    * timestamp and scales ×1000. A unit change in regenerated testdata
    * must never silently shift every time computation by 1000×. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    if (tsIsNanos(path)) read(spark, path, EventsSchema)
    else {
      import org.apache.spark.sql.functions._
      // the driver writes isAdjustedToUTC=false, which Spark surfaces as
      // TIMESTAMP_NTZ; every graft session pins the session zone to UTC,
      // so the NTZ→LTZ cast is the identity DuckDB's epoch_us applies
      spark.read.parquet(path)
        .withColumn("ts",
          expr("unix_micros(cast(ts as timestamp)) * 1000"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    }
  }
}
