package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TextFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k per query — the correctness
  *    baseline. Cost O(|Q| * |corpus|); at scale, broadcast the (small)
  *    query set so the corpus is scanned once with no shuffle, and top-k
  *    is a per-partition window (rank <= k prunes before the final sort).
  *  - [[lshTopK]]: random-hyperplane LSH — deterministic sign sketches
  *    from [[TextFunctions.hash64]]; candidates = same bucket, then exact
  *    re-rank within bucket. The 100 TB path: bucket join replaces the
  *    full cross product.
  */
object Similarity {

  /** Exact top-k by cosine. Returns (query_id, rank, vec_id, cos_x1e6).
    * Scores are emitted as rounded integers (x1e6) to keep oracle
    * comparisons float-free; ranking ties break by vec_id. */
  def bruteForceTopK(
      queries: DataFrame, // (query_id, qv)
      corpus: DataFrame,  // (vec_id, v)
      k: Int
  ): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_x1e6",
        round(cosine(col("qv"), col("v")) * 1e6).cast("long"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_x1e6").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cos_x1e6")
  }

  /** Deterministic random-hyperplane bucket key for a vector column:
    * `numBits` sign bits, hyperplane component (b, d) derived from
    * hash64("hp", "b,d"), centered to +-0.5. The dot product is rounded
    * to 9 decimals before the sign test so the bucket is reproducible
    * across engines regardless of their float-summation order.
    * Native expression; [[hyperplaneBucketHof]] is the interpreted twin. */
  def hyperplaneBucket(vec: Column, dims: Int, numBits: Int): Column =
    graft.functions.HashColumns.hyperplaneBucket(vec, dims, numBits)

  /** HOF form of [[hyperplaneBucket]] (cross-validation twin). */
  def hyperplaneBucketHof(vec: Column, dims: Int, numBits: Int): Column = {
    // weight(b,d) in [-0.5, 0.5): (hash % 1000)/1000 - 0.5
    def weight(b: Column, d: Column): Column =
      (pmod(hash64(lit("hp"), concat(b, lit(","), d)), lit(1000L))
        .cast("double") / 1000.0) - 0.5
    aggregate(
      transform(sequence(lit(0), lit(numBits - 1)), b => {
        val dotProd = aggregate(
          transform(sequence(lit(0), lit(dims - 1)),
            d => vec.getItem(d).cast("double") * weight(b, d)),
          lit(0.0), (acc, v) => acc + v)
        when(round(dotProd, 9) > 0, pow(lit(2.0), b).cast("long"))
          .otherwise(lit(0L))
      }),
      lit(0L), (acc, v) => acc + v)
  }

  /** IVF-flat ANN: deterministic coarse quantizer + bucket probe.
    *
    *  - centroids = the `numCentroids` corpus vectors with the smallest
    *    hash64("c", vec_id) — a deterministic uniform sample standing in
    *    for k-means (IVF-flat with random centroids; swap in trained
    *    centroids without changing the plan shape);
    *  - every corpus vector is assigned to its nearest centroid
    *    (distance rounded to 9 decimals, centroid-id tie-break — engine
    *    reproducible);
    *  - a query probes its `nProbe` nearest centroid buckets and
    *    re-ranks candidates exactly.
    *
    * Scale shape: the centroid table is tiny and broadcast; assignment is
    * a narrow pass over the corpus; the probe join shuffles only
    * candidates (corpus/numCentroids * nProbe per query on average), not
    * the full corpus per query.
    */
  def ivfTopK(
      queries: DataFrame, // (query_id, qv)
      corpus: DataFrame,  // (vec_id, v)
      k: Int,
      numCentroids: Int = 16,
      nProbe: Int = 4
  ): DataFrame = {
    val centroids = corpus
      .withColumn("h", hash64(lit("c"), col("vec_id").cast("string")))
      .orderBy(col("h"), col("vec_id"))
      .limit(numCentroids)
      .select(col("vec_id").as("cid"), col("v").as("cv"))

    def dist2(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) =>
        (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, v) => acc + v)

    def nearest(df: DataFrame, vec: String, idCol: String, keep: Int): DataFrame = {
      val w = Window.partitionBy(idCol)
        .orderBy(col("cdist").asc, col("cid").asc)
      df.crossJoin(broadcast(centroids))
        .withColumn("cdist", round(dist2(col(vec), col("cv")), 9))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= keep)
        .drop("cv", "cdist", "crank")
    }

    val bucketed = nearest(corpus, "v", "vec_id", keep = 1)
    val probes = nearest(queries, "qv", "query_id", keep = nProbe)

    val scored = bucketed.join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_x1e6",
        round(cosine(col("qv"), col("v")) * 1e6).cast("long"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_x1e6").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cos_x1e6")
  }

  /** IVF-flat with TRAINED centroids: `lloydIters` k-means (Lloyd)
    * refinement rounds over the hash-sampled initialization, then the
    * same broadcast-probe search as [[ivfTopK]] — plan shape unchanged
    * (the centroid table stays 16 rows and broadcast; training adds
    * narrow passes over the corpus).
    *
    * Every training step is EXACT integer arithmetic so the result is
    * order-independent and engine-replayable (a float k-means differs in
    * the last ulp across engines and summation orders, which would flip
    * assignments):
    *  - vectors are quantized once: `px[i] = round(v[i] * 1e6)` as long;
    *  - assignment distance = integer squared L2 over `px` (exact);
    *  - new centroid component = floor(sum / count) — an integer sum is
    *    associative, so partition order cannot change the mean. (Sums stay
    *    double-exact below 2^53: fine up to ~10^9 rows per centroid at
    *    this scale factor; shard the mean or widen to decimal beyond.)
    * Clusters that lose all members simply drop out (both engines
    * group-by the surviving assignments). Final re-rank still uses exact
    * float cosine on the original vectors.
    */
  /** Integer-exact k-means, shared by [[ivfTopKTrained]], [[pqTopK]]'s
    * recipe, and [[Dedup.semanticDedup]]: vectors quantize x1e6 to
    * longs, distances are exact integer L2, means floor-divide — every
    * step replays bit-for-bit in any engine (float k-means can NOT be
    * oracle-checked: ulp-order divergence flips assignments). */
  private[pipeline] object IntKMeans {
    def quant(vec: Column): Column =
      transform(vec, x => round(x.cast("double") * 1e6).cast("long"))
    def idist(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, v) => acc + v)
    /** Nearest-`keep` centroid assignment; ties break by cid. */
    def assign(df: DataFrame, vecCol: String, idCol: String,
        cents: DataFrame, keep: Int): DataFrame = {
      val w = Window.partitionBy(idCol).orderBy(col("cdist").asc, col("cid").asc)
      df.crossJoin(broadcast(cents))
        .withColumn("cdist", idist(col(vecCol), col("cq")))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= keep)
        .drop("cq", "cdist", "crank")
    }
    /** Hash-sampled seeds + `lloydIters` exact-integer Lloyd rounds.
      * Returns centroids (cid, cq). */
    def train(corpusQ: DataFrame, idCol: String, pxCol: String,
        numCentroids: Int, lloydIters: Int): DataFrame = {
      var centroids = corpusQ
        .withColumn("h", hash64(lit("c"), col(idCol).cast("string")))
        .orderBy(col("h"), col(idCol))
        .limit(numCentroids)
        .select(col(idCol).as("cid"), col(pxCol).as("cq"))
      for (_ <- 1 to lloydIters) {
        val assigned = assign(corpusQ.select(idCol, pxCol), pxCol, idCol,
          centroids, keep = 1)
        // element-wise integer mean: explode dims, sum exactly, floor-divide
        centroids = assigned
          .select(col("cid"), posexplode(col(pxCol)).as(Seq("pos", "value")))
          .groupBy("cid", "pos")
          .agg(floor(sum(col("value")).cast("double") / count(lit(1)))
            .cast("long").as("m"))
          .groupBy("cid")
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
            s => s.getField("m")).as("cq"))
      }
      centroids
    }
  }

  def ivfTopKTrained(
      queries: DataFrame, // (query_id, qv)
      corpus: DataFrame,  // (vec_id, v)
      k: Int,
      numCentroids: Int = 16,
      nProbe: Int = 4,
      lloydIters: Int = 2
  ): DataFrame = {
    import IntKMeans.{assign, quant}

    val corpusQ = corpus.withColumn("px", quant(col("v"))).persist()
    val centroids = IntKMeans.train(corpusQ.select("vec_id", "px"),
      "vec_id", "px", numCentroids, lloydIters)

    val bucketed = assign(corpusQ, "px", "vec_id", centroids, keep = 1).drop("px")
    val probes = assign(queries.withColumn("px", quant(col("qv"))),
      "px", "query_id", centroids, keep = nProbe).drop("px")

    val scored = bucketed.join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_x1e6",
        round(cosine(col("qv"), col("v")) * 1e6).cast("long"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_x1e6").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cos_x1e6")
  }

  /** PERSISTED IVF index, build side: train integer-exact centroids
    * over the corpus and assign each vector its nearest — the
    * materialization step for ANN over a corpus too big to re-cluster
    * per query batch. The caller writes `assignments` to a table
    * PARTITIONED BY identity(cid) (per-centroid files) and stores the
    * returned centroid list as index metadata (it IS the index
    * directory: numCentroids × dims longs). Search then never retrains
    * — see [[ivfSearchIndexed]].
    *
    * @return (centroids collected as (cid, quantized components) —
    *         deliberately driver-side, it is bounded metadata, not
    *         data; assignments (corpus columns + `cid`), lazy)
    */
  def ivfIndex(
      corpus: DataFrame, // (vec_id, v)
      numCentroids: Int = 16,
      lloydIters: Int = 2
  ): (Seq[(Long, Seq[Long])], DataFrame) = {
    import IntKMeans.{assign, quant}
    val spark = corpus.sparkSession
    import spark.implicits._
    val corpusQ = corpus.withColumn("px", quant(col("v")))
    val centroids = IntKMeans.train(corpusQ.select("vec_id", "px"),
      "vec_id", "px", numCentroids, lloydIters)
    val collected = centroids.collect().map(r =>
      r.getLong(0) -> r.getSeq[Long](1).toSeq).toSeq.sortBy(_._1)
    // assignments reference the COLLECTED centroids (a literal local
    // frame), not the lazy training plan — otherwise materializing the
    // assignments would re-run the whole Lloyd training a second time
    val centDf = collected.toDF("cid", "cq")
    (collected, assign(corpusQ, "px", "vec_id", centDf, keep = 1)
      .drop("px"))
  }

  /** PERSISTED IVF index, search side: per query, probe the `nProbe`
    * nearest stored centroids, then score ONLY those centroids' index
    * rows. `readIndex` is handed the distinct probed cid set so the
    * caller can push it into the table scan as a filter — on a table
    * partitioned by cid, planning prunes every unprobed partition's
    * files with ZERO IO, which is the whole point of persisting the
    * index: search cost ∝ probed buckets, not corpus size. The probed
    * cid set is collected driver-side — bounded by numCentroids (index
    * metadata scale), never by data.
    */
  def ivfSearchIndexed(
      queries: DataFrame, // (query_id, qv)
      centroids: Seq[(Long, Seq[Long])],
      readIndex: Seq[Long] => DataFrame, // probed cids -> (vec_id, v, cid)
      k: Int,
      nProbe: Int = 4
  ): DataFrame = {
    import IntKMeans.{assign, quant}
    val spark = queries.sparkSession
    import spark.implicits._
    val centDf = centroids.toDF("cid", "cq")
    val probes = assign(queries.withColumn("px", quant(col("qv"))),
      "px", "query_id", centDf, keep = nProbe).drop("px")
    val cids = probes.select("cid").distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    val scored = readIndex(cids).join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_x1e6",
        round(cosine(col("qv"), col("v")) * 1e6).cast("long"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_x1e6").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cos_x1e6")
  }

  /** Product-quantization ANN (Jégou/Douze/Schmid, "Product Quantization
    * for Nearest Neighbor Search", IEEE TPAMI 2011): split each vector
    * into `numSubs` subvectors, train a `codebookSize`-entry codebook per
    * subspace (Lloyd k-means), encode every corpus vector as `numSubs`
    * small codes, and answer queries by ADC — a per-query lookup table of
    * query-subvector-to-codeword distances, summed over subspaces by code
    * lookup instead of touching the original vectors.
    *
    * THE memory-compression scale path for billion-vector search: a
    * 64-dim float vector (256-512 B) becomes `numSubs` codes (4 B here),
    * so the scored side of the search carries ~100x less data — the scan
    * of a 100 TB embedding corpus scores against codes that fit in a
    * fraction of executor memory, with the codebooks and per-query
    * distance tables (numSubs x codebookSize ints) broadcast.
    *
    * Training reuses [[ivfTopKTrained]]'s integer-exact Lloyd recipe
    * (quantize x1e6 -> exact integer L2 -> floor-divided means), keyed by
    * subspace, so codebooks, codes, and ADC distances replay bit-for-bit
    * in any engine; the returned `adist` is the exact integer ADC
    * distance (smaller = nearer), ranked ascending with vec_id
    * tie-break. Empty codebook entries drop out exactly as in IVF.
    *
    * Plan shape: training = narrow subvector explode + tiny groupBys;
    * encoding = corpus x broadcast(codebook, numSubs*codebookSize rows)
    * with a per-(vector, subspace) window min; search scores the code
    * rows against BROADCAST per-query distance maps — a narrow pass with
    * no corpus shuffle; the only exchange in the search is the per-query
    * top-k window, and nothing ever plans a cartesian product over two
    * large sides.
    */
  def pqTopK(
      queries: DataFrame, // (query_id, qv)
      corpus: DataFrame,  // (vec_id, v)
      dims: Int,
      k: Int,
      numSubs: Int = 4,
      codebookSize: Int = 16,
      lloydIters: Int = 2,
      /** Ceiling on the ADC broadcast: total (query x subspace x
        * codeword) distance entries shipped to executors at once. Each
        * query's map holds numSubs*codebookSize entries, so an
        * unguarded 100k-query batch would blow through the broadcast
        * limit; past the ceiling the query set processes in
        * deterministic hash chunks (scoring is per-query independent,
        * so the union of chunked top-ks is exact). */
      maxAdcEntries: Long = 32L * 1024 * 1024
  ): DataFrame = {
    val (out, caches) = pqTopKLazy(queries, corpus, dims, k, numSubs,
      codebookSize, lloydIters, maxAdcEntries)
    // materialize the (small) top-k result and RELEASE every cached
    // input immediately — repeated calls must not accumulate dead cached
    // blocks in executor storage. A lazy-return + deferred-unpersist
    // variant was A/B-timed at ~1.5x SLOWER end-to-end on the bench
    // (steady 5.5-6.3s vs 3.6-3.8s at sf0.1): the consumer's action
    // re-runs the scoring stage against the caches, which costs more
    // than scoring once here while they are hot.
    val materialized = out.localCheckpoint(true)
    caches.foreach(_.unpersist())
    materialized
  }

  /** The lazy PQ plan plus the frames it persisted — split out so plan
    * shape stays inspectable ([[pqTopK]] checkpoints the result, which
    * truncates lineage to an ExistingRDD scan). */
  private[graft] def pqTopKLazy(
      queries: DataFrame,
      corpus: DataFrame,
      dims: Int,
      k: Int,
      numSubs: Int = 4,
      codebookSize: Int = 16,
      lloydIters: Int = 2,
      maxAdcEntries: Long = 32L * 1024 * 1024
  ): (DataFrame, Seq[DataFrame]) = {
    require(dims % numSubs == 0, s"dims=$dims not divisible by numSubs=$numSubs")
    val subLen = dims / numSubs
    def quant(vec: Column): Column =
      transform(vec, x => round(x.cast("double") * 1e6).cast("long"))
    def idist(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, v) => acc + v)
    // (id, m, spx): one row per vector per subspace — narrow explode
    def subVectors(df: DataFrame, idCol: String, vecCol: String): DataFrame =
      df.select(col(idCol),
          posexplode(transform(sequence(lit(0), lit(numSubs - 1)),
            m => slice(quant(col(vecCol)), (m * subLen + 1).cast("int"),
              lit(subLen)))).as(Seq("m", "spx")))

    val corpusSub = subVectors(corpus, "vec_id", "v").persist()

    // nearest codebook entry per (row, subspace); keep=1
    def assign(sub: DataFrame, idCol: String, cents: DataFrame): DataFrame = {
      val w = Window.partitionBy(col(idCol), col("m"))
        .orderBy(col("cdist").asc, col("code").asc)
      sub.join(broadcast(cents), Seq("m"))
        .withColumn("cdist", idist(col("spx"), col("cq")))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") === 1)
        .drop("cq", "cdist", "crank")
    }

    // init: per subspace, the codebookSize subvectors with the smallest
    // hash64("pq:m:", vec_id) — deterministic seeding, replayable anywhere
    val wInit = Window.partitionBy("m").orderBy(col("h").asc, col("vec_id").asc)
    var codebook = corpusSub
      .withColumn("h", hash64(lit("pq"),
        concat(col("m").cast("string"), lit(":"), col("vec_id").cast("string"))))
      .withColumn("irank", row_number().over(wInit))
      .filter(col("irank") <= codebookSize)
      .select(col("m"), col("vec_id").as("code"), col("spx").as("cq"))

    for (_ <- 1 to lloydIters) {
      val assigned = assign(corpusSub, "vec_id", codebook)
      // integer mean per (subspace, code, dim): exact sum, floor divide
      codebook = assigned
        .select(col("m"), col("code"), posexplode(col("spx")).as(Seq("pos", "value")))
        .groupBy("m", "code", "pos")
        .agg(floor(sum(col("value")).cast("double") / count(lit(1)))
          .cast("long").as("mean"))
        .groupBy("m", "code")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mean")))),
          s => s.getField("mean")).as("cq"))
    }

    // codewords trained under their SEED vec_id names could collide in
    // the m*1024+code map key packing below (seed ids are arbitrary
    // longs — code_a == code_b + 1024*(m_b - m_a) would alias two
    // codewords, and map_from_entries throws on the duplicate key).
    // Remap to DENSE per-subspace ids; the remap is monotone in the
    // seed id, so assignment tie-breaks and every distance are
    // unchanged — internal naming only, invisible in the output
    val wDense = Window.partitionBy("m").orderBy(col("code").asc)
    codebook = codebook.withColumn("code",
      (row_number().over(wDense) - 1).cast("long"))
    // the trained codebook is TINY (numSubs x codebookSize rows) but its
    // lineage is the whole Lloyd chain; it is referenced by two separate
    // JOBS (the dtAll count below, then the scoring action), and
    // cross-job exchange reuse does not exist — persist it so Lloyd
    // trains once per invocation, not once per job
    codebook = codebook.persist()

    // corpus codes collapsed to ONE row per vector: the compressed
    // representation (numSubs small ints — the ~100x memory story)
    val codes = assign(corpusSub, "vec_id", codebook)
      .groupBy("vec_id")
      .agg(transform(array_sort(collect_list(struct(col("m"), col("code")))),
        s => s.getField("code")).as("codes"))
    // per-query ADC lookup table over EVERY codeword, packed as a map
    // keyed m*1024+code (codebookSize <= 1024 by construction)
    require(codebookSize <= 1024, s"codebookSize=$codebookSize exceeds key packing")

    // scoring is NARROW: codes x broadcast(per-query maps), adist = sum of
    // numSubs map lookups — no shuffle of the corpus-side rows at all;
    // the only exchange left is the per-query top-k window
    def scoreChunk(dt: DataFrame): DataFrame = {
      val scored = codes.crossJoin(broadcast(dt))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("adist",
          aggregate(sequence(lit(0), lit(numSubs - 1)), lit(0L),
            (acc, m) => acc + element_at(col("dmap"),
              m * 1024 + element_at(col("codes"), (m + 1).cast("int")))))
      val w = Window.partitionBy("query_id")
        .orderBy(col("adist").asc, col("vec_id").asc)
      scored
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= k)
        .select("query_id", "rank", "vec_id", "adist")
    }

    // one dmap row per query — the frame the broadcast ships. Counting
    // it gates the ceiling for FREE: the count materializes the cache
    // the broadcast (or each chunk's filter) then reads.
    val dtAll = subVectors(queries, "query_id", "qv")
      .join(broadcast(codebook), Seq("m"))
      .withColumn("d", idist(col("spx"), col("cq")))
      .groupBy("query_id")
      .agg(map_from_entries(collect_list(
        struct(col("m") * 1024 + col("code"), col("d")))).as("dmap"))
      .persist()
    val perQueryEntries = numSubs.toLong * codebookSize
    val qCount = dtAll.count()
    val chunks = math.min(qCount max 1L,
      (qCount * perQueryEntries + maxAdcEntries - 1) / maxAdcEntries max 1L).toInt
    val out =
      if (chunks <= 1) scoreChunk(dtAll)
      else {
        // each chunk re-reads the compressed codes, not the raw corpus —
        // persist them so the chunk loop doesn't re-encode
        codes.persist()
        (0 until chunks).map { c =>
          scoreChunk(dtAll.filter(
            pmod(hash64(lit("pqchunk"), col("query_id").cast("string")),
              lit(chunks)) === c))
        }.reduce(_ union _)
      }
    (out, Seq(dtAll, codes, corpusSub, codebook))
  }

  /** IVF-PQ ANN — the composed billion-vector architecture (Jégou et
    * al. 2011 §V; FAISS `IndexIVFPQ`): a coarse quantizer routes every
    * vector to a centroid bucket, and product quantization encodes the
    * RESIDUAL (vector - centroid) — residuals concentrate near zero,
    * so the same codebook budget quantizes them far more precisely
    * than raw vectors. Search probes `nProbe` buckets and scores ONLY
    * those buckets' codes by ADC against per-(query, bucket) residual
    * distance tables.
    *
    * Why this is THE 100 TB shape: IVF cuts the scored set to
    * nProbe/numCentroids of the corpus, PQ cuts the bytes per scored
    * row ~100x, and the bucket join + broadcast distance tables mean
    * the corpus is never shuffled and never cross-joined — cost ∝
    * probed codes, memory ∝ codes + broadcast tables.
    *
    * Everything is integer-exact ([[IntKMeans]] quantization, exact
    * integer L2, floor-divided means; residuals are exact long
    * differences), so training, encoding, and ADC replay bit-for-bit
    * in the DuckDB oracle. Returns (query_id, rank, vec_id, adist)
    * ranked by ascending integer ADC distance, vec_id tie-break. */
  def ivfPqTopK(
      queries: DataFrame, // (query_id, qv)
      corpus: DataFrame,  // (vec_id, v)
      dims: Int,
      k: Int,
      numCentroids: Int = 16,
      nProbe: Int = 4,
      lloydIters: Int = 2,
      numSubs: Int = 4,
      codebookSize: Int = 16
  ): DataFrame = {
    val (out, caches) = ivfPqTopKLazy(queries, corpus, dims, k,
      numCentroids, nProbe, lloydIters, numSubs, codebookSize)
    // materialize, then release every cache (the pqTopK discipline)
    val materialized = out.localCheckpoint(true)
    caches.foreach(_.unpersist())
    materialized
  }

  // ---- IVF-PQ internals, shared by the one-shot search and the
  // ---- persisted-index build/search paths ----

  /** Residual subvectors: one row per (row, subspace), keeping
    * `keepCols`. Input must carry an `rx` long-array column. */
  private def residualSubVectors(df: DataFrame, keepCols: Seq[String],
      numSubs: Int, subLen: Int): DataFrame =
    df.select(keepCols.map(col) :+
      posexplode(transform(sequence(lit(0), lit(numSubs - 1)),
        m => slice(col("rx"), (m * subLen + 1).cast("int"), lit(subLen))))
        .as(Seq("m", "spx")): _*)

  /** Nearest-`keep` centroid assignment KEEPING the centroid vector
    * (the residual needs cq, which [[IntKMeans.assign]] drops).
    * Input must carry a `px` quantized column. */
  private def nearestCentroidsKeep(df: DataFrame, idCol: String,
      cents: DataFrame, keep: Int): DataFrame = {
    val w = Window.partitionBy(idCol).orderBy(col("cdist").asc, col("cid").asc)
    df.crossJoin(broadcast(cents))
      .withColumn("cdist", IntKMeans.idist(col("px"), col("cq")))
      .withColumn("crank", row_number().over(w))
      .filter(col("crank") <= keep)
      .drop("cdist", "crank")
  }

  /** Nearest codebook entry per (row, subspace). */
  private def nearestCodes(sub: DataFrame, idCol: String,
      cb: DataFrame): DataFrame = {
    val w = Window.partitionBy(col(idCol), col("m"))
      .orderBy(col("ddist").asc, col("code").asc)
    sub.join(broadcast(cb), Seq("m"))
      .withColumn("ddist", IntKMeans.idist(col("spx"), col("cq")))
      .withColumn("drank", row_number().over(w))
      .filter(col("drank") === 1)
      .drop("cq", "ddist", "drank")
  }

  /** The trained IVF-PQ model: coarse centroids, residual codebooks,
    * and per-(vector, subspace) codes. `caches` must be released by
    * the caller once the model's frames are consumed. */
  private[graft] final case class IvfPqModel(
      cents: DataFrame,    // (cid, cq), persisted
      codebook: DataFrame, // (m, code, cq), persisted
      codes: DataFrame,    // (vec_id, cid, m, code), lazy
      caches: Seq[DataFrame])

  private def buildIvfPqModel(
      corpus: DataFrame, // (vec_id, v)
      dims: Int,
      numCentroids: Int,
      lloydIters: Int,
      numSubs: Int,
      codebookSize: Int
  ): IvfPqModel = {
    import IntKMeans.quant
    require(dims % numSubs == 0, s"dims=$dims not divisible by numSubs=$numSubs")
    val subLen = dims / numSubs
    val corpusQ = corpus.withColumn("px", quant(col("v"))).persist()
    val cents = IntKMeans.train(corpusQ.select("vec_id", "px"),
      "vec_id", "px", numCentroids, lloydIters).persist()
    // corpus residuals, exact long arithmetic: rx = px - cq
    val res = nearestCentroidsKeep(corpusQ.select("vec_id", "px"),
        "vec_id", cents, keep = 1)
      .withColumn("rx", zip_with(col("px"), col("cq"), (a, b) => a - b))
      .select("vec_id", "cid", "rx")
    val corpusSub = residualSubVectors(res, Seq("vec_id", "cid"),
      numSubs, subLen).persist()
    // ONE codebook per subspace, trained on residuals (hash-seeded,
    // integer-exact Lloyd — pqTopKLazy's recipe keyed by "ivfpq")
    val wInit = Window.partitionBy("m").orderBy(col("h").asc, col("vec_id").asc)
    var codebook = corpusSub
      .withColumn("h", TextFunctions.hash64(lit("ivfpq"),
        concat(col("m").cast("string"), lit(":"), col("vec_id").cast("string"))))
      .withColumn("irank", row_number().over(wInit))
      .filter(col("irank") <= codebookSize)
      .select(col("m"), col("vec_id").as("code"), col("spx").as("cq"))
    for (_ <- 1 to lloydIters) {
      val assigned = nearestCodes(corpusSub, "vec_id", codebook)
      codebook = assigned
        .select(col("m"), col("code"), posexplode(col("spx")).as(Seq("pos", "value")))
        .groupBy("m", "code", "pos")
        .agg(floor(sum(col("value")).cast("double") / count(lit(1)))
          .cast("long").as("mean"))
        .groupBy("m", "code")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mean")))),
          s => s.getField("mean")).as("cq"))
    }
    codebook = codebook.persist()
    // the compressed index: one code per (vector, subspace), bucket id
    // riding along — this is all search ever scans
    val codes = nearestCodes(corpusSub, "vec_id", codebook)
      .select("vec_id", "cid", "m", "code")
    IvfPqModel(cents, codebook, codes,
      Seq(corpusQ, cents, corpusSub, codebook))
  }

  /** Per-(query, probed-bucket) ADC distance tables: probe `nProbe`
    * centroids, take the query residual AGAINST EACH probed centroid,
    * and price every codeword — (query_id, cid, m, code, d), tiny
    * (|Q| x nProbe x numSubs x codebookSize rows), built to broadcast. */
  private def ivfPqDistanceTables(
      queries: DataFrame, // (query_id, qv)
      cents: DataFrame,
      codebook: DataFrame,
      numSubs: Int,
      subLen: Int,
      nProbe: Int
  ): DataFrame = {
    val probes = nearestCentroidsKeep(
      queries.withColumn("px", IntKMeans.quant(col("qv")))
        .select("query_id", "px"),
      "query_id", cents, keep = nProbe)
      .withColumn("rx", zip_with(col("px"), col("cq"), (a, b) => a - b))
      .select("query_id", "cid", "rx")
    residualSubVectors(probes, Seq("query_id", "cid"), numSubs, subLen)
      .join(broadcast(codebook), Seq("m"))
      .withColumn("d", IntKMeans.idist(col("spx"), col("cq")))
      .select("query_id", "cid", "m", "code", "d")
  }

  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("adist").asc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "adist")
  }

  /** The lazy IVF-PQ plan plus the frames it persisted — split out so
    * plan shape stays inspectable (the public form checkpoints, which
    * truncates lineage to an ExistingRDD scan). */
  private[graft] def ivfPqTopKLazy(
      queries: DataFrame,
      corpus: DataFrame,
      dims: Int,
      k: Int,
      numCentroids: Int = 16,
      nProbe: Int = 4,
      lloydIters: Int = 2,
      numSubs: Int = 4,
      codebookSize: Int = 16
  ): (DataFrame, Seq[DataFrame]) = {
    val subLen = dims / numSubs
    val model = buildIvfPqModel(corpus, dims, numCentroids, lloydIters,
      numSubs, codebookSize)
    val dt = ivfPqDistanceTables(queries, model.cents, model.codebook,
      numSubs, subLen, nProbe)
    // bucket join: only probed buckets' codes score; sum the numSubs
    // per-subspace lookups into the exact integer ADC distance
    val scored = model.codes.join(broadcast(dt), Seq("cid", "m", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy("query_id", "vec_id")
      .agg(sum(col("d")).as("adist"))
    (rankTopK(scored, k), model.caches)
  }

  /** PERSISTED IVF-PQ index, build side: train coarse centroids and
    * residual codebooks, then encode every vector as its bucket id
    * plus `numSubs` codes — the COMPRESSED index a billion-vector
    * deployment materializes (codes are ~100x smaller than vectors).
    * The caller writes `codes` to a table PARTITIONED BY identity(cid)
    * and stores the returned centroid and codebook lists as index
    * metadata (together they ARE the model: (numCentroids +
    * numSubs*codebookSize) x small long vectors). The returned codes
    * frame references the COLLECTED model as literal frames, so
    * materializing it never re-runs training.
    *
    * @return (centroids (cid, quantized), codebook (m, code,
    *         quantized), codes (vec_id, codes ARRAY sorted by m, cid))
    */
  def ivfPqIndex(
      corpus: DataFrame, // (vec_id, v)
      dims: Int,
      numCentroids: Int = 16,
      lloydIters: Int = 2,
      numSubs: Int = 4,
      codebookSize: Int = 16
  ): (Seq[(Long, Seq[Long])], Seq[(Int, Long, Seq[Long])], DataFrame) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val subLen = dims / numSubs
    val model = buildIvfPqModel(corpus, dims, numCentroids, lloydIters,
      numSubs, codebookSize)
    val cents = model.cents.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toSeq.sortBy(_._1)
    // training names codewords by their SEED vec_id (arbitrary longs);
    // the stored index remaps them to DENSE per-subspace ids
    // (0..codebookSize-1, in seed-id order — a monotone bijection, so
    // nearest-code tie-breaks and all distances are unchanged). Dense
    // ids are what makes the search side's m*1024+code map key packing
    // collision-free by construction.
    val cb = model.codebook.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2).toSeq))
      .toSeq.sortBy(t => (t._1, t._2))
      .groupBy(_._1).toSeq.flatMap { case (m, entries) =>
        entries.zipWithIndex.map { case ((_, _, cq), i) => (m, i.toLong, cq) }
      }.sortBy(t => (t._1, t._2))
    model.caches.foreach(_.unpersist())
    // re-derive the codes against the LITERAL model (training lineage
    // gone): one assignment pass for buckets, one for codes
    (cents, cb, ivfPqEncode(corpus, dims, cents, cb, numSubs))
  }

  /** Encode (vec_id, v) rows against a FROZEN IVF-PQ model: nearest
    * stored centroid, residual, nearest codeword per subspace —
    * bit-identical to the build pass, so incrementally refreshed rows
    * are indistinguishable from built rows. Returns
    * (vec_id, codes ARRAY sorted by m, cid). */
  def ivfPqEncode(
      vectors: DataFrame, // (vec_id, v)
      dims: Int,
      centroids: Seq[(Long, Seq[Long])],
      codebook: Seq[(Int, Long, Seq[Long])],
      numSubs: Int = 4
  ): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val subLen = dims / numSubs
    val centDf = centroids.toDF("cid", "cq")
    val cbDf = codebook.toDF("m", "code", "cq")
    val res = nearestCentroidsKeep(
      vectors.withColumn("px", IntKMeans.quant(col("v")))
        .select("vec_id", "px"),
      "vec_id", centDf, keep = 1)
      .withColumn("rx", zip_with(col("px"), col("cq"), (a, b) => a - b))
      .select("vec_id", "cid", "rx")
    nearestCodes(
      residualSubVectors(res, Seq("vec_id", "cid"), numSubs, subLen),
      "vec_id", cbDf)
      .groupBy("vec_id", "cid")
      .agg(transform(array_sort(collect_list(struct(col("m"), col("code")))),
        s => s.getField("code")).as("codes"))
      .select("vec_id", "codes", "cid")
  }

  /** PERSISTED IVF-PQ index, search side: probe `nProbe` stored
    * centroids per query, hand the probed cid set to `readIndex` (on a
    * cid-partitioned table, planning prunes every unprobed partition —
    * zero IO), and ADC-score the pruned CODE rows against broadcast
    * per-(query, bucket) distance maps. Search cost ∝ probed buckets x
    * compressed rows; the original vectors are never read at all. */
  def ivfPqSearchIndexed(
      queries: DataFrame, // (query_id, qv)
      dims: Int,
      centroids: Seq[(Long, Seq[Long])],
      codebook: Seq[(Int, Long, Seq[Long])],
      readIndex: Seq[Long] => DataFrame, // probed cids -> (vec_id, codes, cid)
      k: Int,
      nProbe: Int = 4,
      numSubs: Int = 4
  ): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val subLen = dims / numSubs
    require(codebook.forall(_._2 < 1024),
      "code ids must be dense (< 1024) for the map key packing — " +
        "build the index with ivfPqIndex, which remaps seed ids")
    val centDf = centroids.toDF("cid", "cq")
    val cbDf = codebook.toDF("m", "code", "cq")
    val dt = ivfPqDistanceTables(queries, centDf, cbDf, numSubs, subLen,
      nProbe)
    // per-(query, bucket) lookup map keyed m*1024+code (code < 1024)
    val dtm = dt.groupBy("query_id", "cid")
      .agg(map_from_entries(collect_list(
        struct(col("m") * 1024L + col("code"), col("d")))).as("dmap"))
    val cids = dt.select("cid").distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    val scored = readIndex(cids).join(broadcast(dtm), Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adist",
        aggregate(sequence(lit(0), lit(numSubs - 1)), lit(0L),
          (acc, m) => acc + element_at(col("dmap"),
            m * 1024L + element_at(col("codes"), (m + 1).cast("int")))))
      .select("query_id", "vec_id", "adist")
    rankTopK(scored, k)
  }

  /** LSH ANN: same-bucket candidates re-ranked exactly. Recall < 1 by
    * construction; deterministic. Returns (query_id, rank, vec_id,
    * cos_x1e6) with rank over bucket candidates only. */
  def lshTopK(
      queries: DataFrame, // (query_id, qv)
      corpus: DataFrame,  // (vec_id, v)
      dims: Int,
      k: Int,
      numBits: Int = 8
  ): DataFrame = {
    val qb = queries.withColumn("bucket", hyperplaneBucket(col("qv"), dims, numBits))
    val cb = corpus.withColumn("bucket", hyperplaneBucket(col("v"), dims, numBits))
    val scored = cb.join(broadcast(qb), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_x1e6",
        round(cosine(col("qv"), col("v")) * 1e6).cast("long"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_x1e6").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cos_x1e6")
  }
}
