package graft.txn

import graft.core.CompactionError
import graft.sources.TableReader
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CDC REPLICATION: keep a keyed replica table in sync with a source by
  * applying net changelogs — the downstream half of the changelog
  * contract ([[TableReader.netChangelog]]), packaged so a consumer
  * never hand-rolls the merge:
  *
  * {{{
  *   // bootstrap: full-read the source at a checkpointed version
  *   Replicate.bootstrap(spark, srcDir, dstDir, keys, atVersion)
  *   // each cycle: apply everything since the checkpoint, atomically
  *   val v = Replicate.sync(spark, srcDir, dstDir)
  * }}}
  *
  * `sync` computes the net changes over `(checkpoint, current]` — cost
  * ∝ changed data, intra-interval churn cancelled — and applies them as
  * ONE upsert commit on the replica: net inserts upsert by key, net
  * deletes whose key was not re-inserted become key deletes. The
  * replica checkpoint (the source version it reflects) rides the same
  * commit, so replay after a crash is idempotent; a lagging checkpoint
  * whose interval expired surfaces [[TableReader.changelog]]'s resync
  * recipe (bootstrap again).
  *
  * Keys must identify rows uniquely in the source (the usual CDC
  * primary-key contract): a net insert multiplicity > 1 for one key
  * means the source holds duplicate keys and the keyed replica cannot
  * represent it — refused loudly, never silently collapsed.
  */
object Replicate {

  /** Replica table properties: the source dir, the source version the
    * replica reflects, and the key columns it was bootstrapped with. */
  val SourceProp = "graft.replica.source"
  val SyncedVersionProp = "graft.replica.synced-version"
  val KeysProp = "graft.replica.keys"

  /** Create the replica at `dstDir` holding the source's state at
    * `atVersion` (default: current). */
  def bootstrap(
      spark: SparkSession,
      srcDir: String,
      dstDir: String,
      keys: Seq[String],
      atVersion: Long = -1L,
      catalog: TableCatalog = FileTableCatalog
  ): Long = {
    require(keys.nonEmpty, "replication needs at least one key column")
    require(keys.forall(!_.contains(",")),
      "replica key column names must not contain ','")
    val srcSnap = catalog.loadOrThrow(srcDir)
    val v = if (atVersion > 0) atVersion else srcSnap.version
    TableMetadata.commit(dstDir, TableSnapshot(1, 1, 0, Nil, properties = Map(
      SourceProp -> srcDir,
      SyncedVersionProp -> v.toString,
      KeysProp -> keys.mkString(","))))
    TableReader.readOption(spark, srcDir, asOfVersion = Some(v),
        catalog = catalog)
      .filter(df => !df.isEmpty)
      .foreach { df =>
        TableWrites.upsert(dstDir, df, keys, catalog = catalog,
          setProperties = Map(SyncedVersionProp -> v.toString))
      }
    v
  }

  /** Apply the source's net changes since the replica's checkpoint in
    * ONE atomic upsert commit. Returns the new checkpoint (no-op when
    * already current). `keys` defaults to the bootstrap keys persisted
    * in the replica's [[KeysProp]] property; passing them explicitly is
    * allowed only when they MATCH the persisted list — upserting on a
    * different key than the replica was built on would silently corrupt
    * it, so a mismatch is refused. (Replicas created before [[KeysProp]]
    * existed carry no persisted list: there an explicit `keys` is
    * required and is persisted on this sync's commit.) */
  def sync(
      spark: SparkSession,
      srcDir: String,
      dstDir: String,
      keys: Seq[String] = Nil,
      catalog: TableCatalog = FileTableCatalog
  ): Long = {
    val dst = catalog.loadOrThrow(dstDir)
    if (!dst.properties.get(SourceProp).contains(srcDir))
      throw CompactionError.Config(
        s"$dstDir is not a replica of $srcDir (bootstrap first)")
    val storedKeys = dst.properties.get(KeysProp)
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
    val useKeys = (storedKeys, keys) match {
      case (Some(s), k) if k.isEmpty || k == s => s
      case (Some(s), k) => throw CompactionError.Config(
        s"replica $dstDir was bootstrapped with keys " +
          s"(${s.mkString(", ")}) but sync was called with " +
          s"(${k.mkString(", ")}); syncing on a different key would " +
          "corrupt the replica — omit keys or pass the bootstrap list")
      case (None, k) if k.nonEmpty => k // pre-KeysProp replica
      case (None, _) => throw CompactionError.Config(
        s"replica $dstDir carries no persisted key list (bootstrapped " +
          "by an older build) — pass the bootstrap keys explicitly; " +
          "this sync will persist them")
    }
    val lastV = dst.properties.get(SyncedVersionProp)
      .flatMap(_.toLongOption).getOrElse(throw CompactionError.Config(
        s"$dstDir carries no synced-version checkpoint"))
    val srcV = catalog.loadOrThrow(srcDir).version
    if (srcV <= lastV) {
      // already current — but a legacy replica syncing with explicit
      // keys still gets them persisted NOW (the "this sync will persist
      // them" promise must not depend on the source having moved)
      if (storedKeys.isEmpty)
        new CommitManager(dstDir, catalog = catalog)
          .setTableProperties(Map(KeysProp -> useKeys.mkString(",")),
            Set.empty, expectedSchemaId = dst.schemaId)
      return lastV
    }

    val net = try {
      TableReader.netChangelog(spark, srcDir, lastV, srcV, catalog).persist()
    } catch {
      case e: CompactionError.EmptyInterval =>
        // property-/schema-only advance: just move the checkpoint
        new CommitManager(dstDir, catalog = catalog)
          .setTableProperties(Map(SyncedVersionProp -> srcV.toString,
              KeysProp -> useKeys.mkString(",")),
            Set.empty, expectedSchemaId = dst.schemaId)
        return srcV
    }
    try {
      if (net.isEmpty) {
        // rewrites/conversions only: zero net changes — move the
        // checkpoint without an upsert commit
        new CommitManager(dstDir, catalog = catalog)
          .setTableProperties(Map(SyncedVersionProp -> srcV.toString,
              KeysProp -> useKeys.mkString(",")),
            Set.empty, expectedSchemaId = dst.schemaId)
        return srcV
      }
      // the primary-key contract: one net-inserted row per key
      val dupKeys = net.filter(col("_change_type") === "insert")
        .groupBy(useKeys.map(col): _*)
        .agg(sum(col("_change_count")).as("_n"))
        .filter(col("_n") > 1L)
      if (!dupKeys.isEmpty) throw CompactionError.Config(
        s"source rows are not unique per (${useKeys.mkString(", ")}); a " +
          "keyed replica cannot represent duplicate keys — replicate " +
          "with the full unique key")
      val inserts = net.filter(col("_change_type") === "insert")
        .drop("_change_type", "_change_count")
      // a delete whose key was re-inserted is an UPDATE — the upsert's
      // own eq-delete replaces it; only keys with no surviving insert
      // become deletes
      val deletes = net.filter(col("_change_type") === "delete")
        .select(useKeys.map(col): _*)
        .join(inserts.select(useKeys.map(col): _*), useKeys, "left_anti")
      TableWrites.upsert(dstDir, inserts, useKeys, catalog = catalog,
        deleteKeys = Some(deletes),
        setProperties = Map(SyncedVersionProp -> srcV.toString,
          KeysProp -> useKeys.mkString(",")),
        validate = reloaded => {
          val nowV = reloaded.properties.get(SyncedVersionProp)
            .flatMap(_.toLongOption).getOrElse(-1L)
          if (nowV != lastV) throw CompactionError.Config(
            s"concurrent sync: checkpoint moved v$lastV -> v$nowV; " +
              "re-run sync (the newer state already includes these rows)")
        })
      srcV
    } finally net.unpersist()
  }
}
