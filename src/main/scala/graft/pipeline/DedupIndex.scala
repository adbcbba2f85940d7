package graft.pipeline

import graft.core.CompactionError
import graft.sources.TableReader
import graft.txn.{FileTableCatalog, TableCatalog, TableWrites}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INCREMENTALLY MAINTAINED near-dup index — MinHash-LSH band rows as
  * a graft table, kept in sync by the corpus changelog. The batch
  * near-dup pass ([[Dedup.minhashLsh]]) recomputes every signature and
  * self-joins the whole band table; at 100 TB a daily ingest cannot
  * re-pay that. The index inverts the cost: band rows persist once,
  * and deduplicating a new batch is
  *
  *   probe bands (∝ batch) ⋈ index bands (collisions only)
  *   → exact-jaccard verify on the candidate ids (∝ candidates)
  *
  * — never a corpus-wide signature pass, never an all-pairs join. The
  * same delta+base lifecycle as the text/ANN indexes: [[refresh]]
  * applies the corpus's net changes as ONE atomic upsert commit
  * (equality-delete changed docs' band rows, insert re-derived rows,
  * advance the synced-version marker), and serving gates on
  * marker == corpus version, so a lagging index is detected, not
  * silently stale.
  */
object DedupIndex {

  val SourceProp = "graft.dedupidx.source"
  val SyncedProp = "graft.dedupidx.synced-version"
  /** "numHashes,bandSize[,hashKind]" — frozen at build time; a probe or
    * refresh with different parameters (INCLUDING the hash family —
    * md5 rows never collide with xx rows) would silently never match,
    * so both derive all three from the stored property. Two-token
    * legacy values read as md5. */
  val ParamsProp = "graft.dedupidx.params"

  /** LSH band rows of a (doc_id, text) frame: (band, band_key, doc_id),
    * band_key equal iff all `bandSize` signature slots match — the same
    * banding as [[Dedup.minhashLsh]] (one narrow projection + explode,
    * no shuffle). */
  def bandRows(docs: DataFrame, numHashes: Int, bandSize: Int,
      hashKind: String = "md5"): DataFrame = {
    require(numHashes % bandSize == 0,
      "numHashes must be divisible by bandSize")
    val numBands = numHashes / bandSize
    docs
      .select(col("doc_id"), TextFunctions.shingles3(col("text")).as("sh"))
      .withColumn("mh", graft.functions.HashColumns
        .minhashSignature(col("sh"), numHashes, hashKind))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(numBands - 1)),
          b => concat_ws(",", slice(col("mh"), b * bandSize + 1, lit(bandSize)))))
          .as(Seq("band", "band_key")))
      .select(col("band").cast("long").as("band"), col("band_key"),
        col("doc_id"))
  }

  private def params(props: Map[String, String], idxDir: String)
      : (Int, Int, String) =
    props.get(ParamsProp) match {
      case Some(s) =>
        def int(t: String): Int = t.toIntOption.getOrElse(
          throw CompactionError.Config(
            s"$idxDir carries a malformed $ParamsProp: $s"))
        s.split(",") match {
          case Array(nh, bs) => (int(nh), int(bs), "md5")
          case Array(nh, bs, hk) if hk == "md5" || hk == "xx" =>
            (int(nh), int(bs), hk)
          case _ => throw CompactionError.Config(
            s"$idxDir carries a malformed $ParamsProp: $s")
        }
      case None => throw CompactionError.Config(
        s"$idxDir carries no $ParamsProp — not a dedup index")
    }

  /** Bring the bands index up to the corpus's current version by
    * applying the NET changelog since the index marker, as ONE atomic
    * upsert commit (the [[TextIndex.refresh]] lifecycle verbatim:
    * eq-delete changed ids' band rows, insert re-derived rows, advance
    * the marker; concurrent refreshes abort on the marker guard).
    * Returns the new synced corpus version. */
  def refresh(
      spark: SparkSession,
      corpusDir: String,
      idxDir: String,
      catalog: TableCatalog = FileTableCatalog
  ): Long = {
    val idx = catalog.loadOrThrow(idxDir)
    if (!idx.properties.get(SourceProp).contains(corpusDir))
      throw CompactionError.Config(
        s"$idxDir does not index $corpusDir (build it first)")
    val (numHashes, bandSize, hashKind) = params(idx.properties, idxDir)
    val lastV = idx.properties.get(SyncedProp).flatMap(_.toLongOption)
      .getOrElse(throw CompactionError.Config(
        s"$idxDir carries no synced-version marker"))
    val curV = catalog.loadOrThrow(corpusDir).version
    if (curV <= lastV) return lastV

    val net = TableReader
      .netChangelog(spark, corpusDir, lastV, curV, catalog).persist()
    try {
      // per-id duplicate guard — the shared index key contract
      val dup = net.groupBy("doc_id", "_change_type")
        .agg(sum(col("_change_count")).as("c"))
        .filter(col("c") > 1L)
      if (!dup.isEmpty) throw CompactionError.Config(
        "corpus rows are not unique per doc_id (net multiplicity > 1); " +
          "a bands index keyed by doc_id cannot represent duplicates")
      val ins = net.filter(col("_change_type") === "insert")
        .select("doc_id", "text")
      val changedIds = net.select("doc_id").distinct()
      TableWrites.upsert(idxDir, bandRows(ins, numHashes, bandSize, hashKind),
        keyCols = Seq("doc_id"),
        catalog = catalog,
        deleteKeys = Some(changedIds),
        setProperties = Map(SyncedProp -> curV.toString),
        validate = reloaded => {
          val nowV = reloaded.properties.get(SyncedProp)
            .flatMap(_.toLongOption).getOrElse(-1L)
          if (nowV != lastV) throw CompactionError.Config(
            s"concurrent index refresh: marker moved v$lastV -> v$nowV; " +
              "re-run refresh (the newer state already covers this delta)")
        })
      curV
    } finally net.unpersist()
  }

  /** Near-dup pairs INVOLVING the probe docs, served from the synced
    * index: probe-side bands re-derived narrowly from the (filtered)
    * corpus read, candidates = band collisions against the index,
    * verification = exact hashed-shingle jaccard over ONLY the
    * candidate ids' texts. Both-probe pairs count once (a < b).
    *
    * @param probeFilter selects the batch being deduplicated (e.g.
    *                    `col("doc_id") % 5 === 0`, or the ids of
    *                    today's ingest)
    * @return (a_id, b_id, jac_x1000), true jaccard >= threshold
    */
  def probePairs(
      spark: SparkSession,
      corpusDir: String,
      idxDir: String,
      probeFilter: Column,
      thresholdX1000: Int,
      catalog: TableCatalog = FileTableCatalog
  ): DataFrame = {
    val idx = catalog.loadOrThrow(idxDir)
    if (!idx.properties.get(SourceProp).contains(corpusDir))
      throw CompactionError.Config(
        s"$idxDir does not index $corpusDir (build it first)")
    val synced = idx.properties.get(SyncedProp).flatMap(_.toLongOption)
    val curV = catalog.loadOrThrow(corpusDir).version
    if (!synced.contains(curV)) throw CompactionError.Config(
      s"$idxDir lags the corpus (synced ${synced.getOrElse(-1L)}, " +
        s"corpus v$curV) — refresh before serving")
    val (numHashes, bandSize, hashKind) = params(idx.properties, idxDir)
    val corpus = TableReader.read(spark, corpusDir, catalog = catalog)
      .select(col("doc_id"), col("text"))
    val probeBands = bandRows(corpus.filter(probeFilter),
      numHashes, bandSize, hashKind)
      .withColumnRenamed("doc_id", "p_id")
    val idxBands = TableReader.read(spark, idxDir, catalog = catalog)
    val cand = probeBands
      .join(idxBands,
        probeBands("band") === idxBands("band") &&
          probeBands("band_key") === idxBands("band_key") &&
          col("p_id") =!= idxBands("doc_id"))
      .select(least(col("p_id"), idxBands("doc_id")).as("a_id"),
        greatest(col("p_id"), idxBands("doc_id")).as("b_id"))
      .distinct()
    // verification ∝ candidates: only the candidate ids' texts pay the
    // shingle + set-hash cost — the semi-join prunes the corpus scan
    // BEFORE the expensive projection (the ANN re-rank id-pushdown
    // pattern), never a corpus-wide signature pass
    val candIds = cand.select(col("a_id").as("doc_id"))
      .unionByName(cand.select(col("b_id").as("doc_id")))
      .distinct()
    val shhOf = corpus
      .join(candIds, Seq("doc_id"), "leftsemi")
      .select(col("doc_id"),
        graft.functions.HashColumns
          .hashedSet(TextFunctions.shingles3(col("text")), "j", hashKind)
          .as("shh"))
    cand
      .join(shhOf.as("x"), col("a_id") === col("x.doc_id"))
      .join(shhOf.as("y"), col("b_id") === col("y.doc_id"))
      .withColumn("jac_x1000",
        TextFunctions.jaccardX1000Sorted(col("x.shh"), col("y.shh")))
      .filter(col("jac_x1000") >= thresholdX1000)
      .select("a_id", "b_id", "jac_x1000")
  }
}
