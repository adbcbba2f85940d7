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

  /** Driver-testdata `events` table: `ts` is TIMESTAMP(NANOS) in the file,
    * surfaced as BIGINT epoch-nanos. */
  val EventsSchema =
    "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, " +
      "value DOUBLE, props STRING"

  def readEvents(spark: SparkSession, dir: String): DataFrame =
    read(spark, s"$dir/events.parquet", EventsSchema)
}
