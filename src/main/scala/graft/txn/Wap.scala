package graft.txn

/** Write-audit-publish (WAP) staging — the Iceberg `write.wap.enabled`
  * / `spark.wap.id` workflow re-expressed on the engine's linear
  * version chain:
  *
  *  - a STAGED commit is a real, immutable snapshot version carrying
  *    the [[IdProp]] marker (plus [[ParentProp]], the main-lineage
  *    version it was built from). Staged versions occupy version
  *    numbers but are INVISIBLE to current-state resolution
  *    ([[TableMetadata.load]] walks past them), so readers, writers and
  *    compaction never see unaudited rows;
  *  - AUDIT reads address the staged snapshot directly — `VERSION AS OF
  *    'wap:<id>'` or the staged version number;
  *  - PUBLISH cherry-picks the staged snapshot's net-new data files
  *    onto the CURRENT main snapshot as a fresh commit (pure appends
  *    only — the one commit shape that re-applies safely under any
  *    interleaved main history, which is also where Iceberg's
  *    cherry-pick draws the line), recording the id in
  *    [[PublishedProp]] so a second publish is refused;
  *  - DISCARD deletes the staged version and any file no surviving
  *    snapshot references.
  *
  * Staged-but-unpublished versions are protected from snapshot
  * expiration ([[CommitManager.expireSnapshots]]).
  */
object Wap {

  /** User-set TABLE property: staging must be opted into per table.
    * With it false/absent, a write under an active wap id REFUSES
    * (publishing unaudited data because one table missed a property is
    * the failure WAP exists to prevent). */
  val EnabledProp = "graft.wap.enabled"
  /** Spark SESSION conf naming the in-flight wap id (the analog of
    * Iceberg's `spark.wap.id`): while set, appends to WAP-enabled
    * tables commit STAGED. */
  val SessionConf = "spark.graft.wap.id"
  /** Per-snapshot marker: present exactly on staged snapshots. */
  val IdProp = "graft.wap.id"
  /** Staged snapshots: the main-lineage version the staged files were
    * appended onto (net-new files = staged minus this parent). */
  val ParentProp = "graft.wap.parent"
  /** Main-lineage JSON map `{wapId: stagedVersion}` of published ids —
    * the double-publish guard and the expiry-protection cutoff. */
  val PublishedProp = "graft.wap.published"
  /** Main-lineage JSON map `{wapId: stagedVersion}` of DISCARDED ids.
    * Discard keeps the staged version FILE as a tombstone (so the
    * version sequence has no hole for streams to trip on, and the
    * number is never re-used for an unrelated commit) and deletes only
    * the staged data files; normal snapshot expiration reaps the
    * tombstone later. */
  val DiscardedProp = "graft.wap.discarded"

  def isStaged(s: TableSnapshot): Boolean = s.properties.contains(IdProp)

  private val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.registerModule(com.fasterxml.jackson.module.scala.DefaultScalaModule)
    m
  }

  /** Decode one of the id→version bookkeeping maps of a MAIN-lineage
    * snapshot (empty when the property is absent or malformed — a
    * malformed map must never make a staged id look unpublished AND
    * unprotected at once, so expiry treats decode failure as "nothing
    * recorded"). Shared with [[Branch]]'s registry/floor maps, which
    * use the same name→version JSON shape. */
  private[txn] def idMap(s: TableSnapshot, prop: String): Map[String, Long] =
    s.properties.get(prop).map { json =>
      try {
        import scala.jdk.CollectionConverters._
        mapper.readTree(json).properties().asScala
          .map(e => e.getKey -> e.getValue.asLong).toMap
      } catch { case _: Exception => Map.empty[String, Long] }
    }.getOrElse(Map.empty)

  def publishedMap(s: TableSnapshot): Map[String, Long] = idMap(s, PublishedProp)
  def discardedMap(s: TableSnapshot): Map[String, Long] = idMap(s, DiscardedProp)
  /** Ids whose lifecycle is CLOSED (published or discarded). Wap ids
    * are SINGLE-USE: the bookkeeping maps have one slot per id, and a
    * re-used id would make the earlier record unreachable — which would
    * un-protect or double-publish the earlier stage. Staging refuses
    * closed ids ([[CommitManager.appendFiles]]). */
  def closedIds(s: TableSnapshot): Set[String] =
    publishedMap(s).keySet ++ discardedMap(s).keySet

  def idsJson(m: Map[String, Long]): String =
    mapper.writeValueAsString(m)

  /** All staged snapshots of the table, newest first, each with its
    * lifecycle state resolved against `current`: "open", "published",
    * or "discarded" (tombstone awaiting expiry). Cost: one metadata
    * read per retained version — inspection/maintenance surface, not a
    * hot path. */
  def listStaged(catalog: TableCatalog, tableDir: String,
      current: TableSnapshot): Seq[(TableSnapshot, String)] = {
    val published = publishedMap(current)
    val discarded = discardedMap(current)
    catalog.versions(tableDir).reverse
      .flatMap(catalog.loadVersion(tableDir, _))
      .filter(isStaged)
      .map { s =>
        val id = s.properties(IdProp)
        val state =
          if (published.get(id).contains(s.version)) "published"
          else if (discarded.get(id).contains(s.version)) "discarded"
          else "open"
        s -> state
      }
  }

  /** The OPEN staged snapshot carrying `wapId`, if any. Ids are
    * single-use, so at most one can exist; the newest-first walk
    * short-circuits on the first hit (staged tips sit near the top of
    * the version sequence in the common stage→publish flow), and
    * closed ids skip the scan entirely via the bookkeeping maps. */
  def findStaged(catalog: TableCatalog, tableDir: String,
      current: TableSnapshot, wapId: String): Option[TableSnapshot] =
    if (closedIds(current).contains(wapId)) None
    else catalog.versions(tableDir).reverseIterator
      .flatMap(catalog.loadVersion(tableDir, _))
      .find(s => isStaged(s) && s.properties(IdProp) == wapId)
}
