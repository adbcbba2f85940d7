package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "en"),
    (2L, "the quick brown fox jumps over the lazy cat", "en"), // near-dup of 1
    (3L, "completely different words appear here today friends", "en"),
    (4L, "the quick brown fox jumps over the lazy dog", "en")  // exact dup of 1
  ).toDF("doc_id", "text", "lang")

  test("exact dedup keeps min id and counts copies") {
    val r = Dedup.exact(docs, col("text"), col("doc_id"))
      .orderBy("survivor_id")
      .select("survivor_id", "copies").as[(Long, Long)].collect()
    assert(r.toSeq == Seq((1L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("minhash LSH finds near and exact dups, not unrelated docs") {
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text", 32, 4, 500)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L))) // exact dup always survives
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("xx production hash path finds exact dups like the md5 path") {
    val pairsXx = Dedup.minhashLsh(docs, "doc_id", "text", 32, 4, 500,
        hashKind = "xx")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // identical texts have identical signatures under ANY hash
    assert(pairsXx.contains((1L, 4L)))
    assert(!pairsXx.exists(p => p._1 == 3L || p._2 == 3L))
    val shXx = Dedup.simhashPairs(docs, "doc_id", "text", "lang",
        maxDistance = 0, hashKind = "xx")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(shXx.contains((1L, 4L))) // distance 0 for the exact dup
    assertThrows[IllegalArgumentException] {
      Dedup.minhashLsh(docs, "doc_id", "text", 32, 4, 500, hashKind = "nope")
        .collect()
    }
  }

  test("connected components: transitive chains collapse to the min id") {
    // components: {1,2,3,10} via chain + triangle edge, {20,21}, isolated
    // node 30 paired with 31
    val pairs = Seq(
      (2L, 3L), (1L, 2L), (3L, 10L), (1L, 10L),
      (20L, 21L),
      (30L, 31L)
    ).toDF("a_id", "b_id")
    val comp = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L,
      20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L))
    // the over-keep case the greedy pair-drop gets wrong: pairs (A,C) and
    // (B,C) must keep only A — B joins the component through C
    val chain = Seq((1L, 3L), (2L, 3L)).toDF("a_id", "b_id")
    val c2 = Dedup.connectedComponents(chain).as[(Long, Long)].collect().toMap
    assert(c2 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("connected components: a planted diameter-100 chain converges " +
    "in O(log n) star rounds with a BOUNDED result plan depth") {
    // a path graph 0-1-...-100: label propagation needs 100 rounds (the
    // r9 shape); alternating large-star/small-star needs ~log2(n). The
    // per-round eager checkpoint also keeps the persist-only lineage
    // pathology dead (BENCH_r02: 42 s, BENCH_r08: 35 s excursions).
    val n = 101
    val chain = (0 until n - 1).map(i => (i.toLong, i + 1L))
      .toDF("a_id", "b_id")
    val out = Dedup.connectedComponents(chain, maxIter = 15)
    assert(Dedup.connectedComponentsRounds.get() <= 15,
      s"star rounds must be O(log n), took " +
        s"${Dedup.connectedComponentsRounds.get()}")
    // the RESULT plan must be flat: an eagerly checkpointed frame scans
    // materialized partitions (LogicalRDD), not a 100-join lineage
    val planNodes = out.queryExecution.optimizedPlan.collect { case p => p }
    assert(planNodes.size <= 3,
      s"lineage must be truncated every round; plan has " +
        s"${planNodes.size} nodes:\n${out.queryExecution.optimizedPlan}")
    val comp = out.as[(Long, Long)].collect().toMap
    assert(comp == (0 until n).map(i => i.toLong -> 0L).toMap)
  }

  test("sequence packing: greedy fill, oversized docs pack alone, " +
    "bucket state resets, deterministic under shuffle") {
    import graft.pipeline.Packing
    // bucket 0: ids 0,4,8,12 tokens 100,100,100,300 (budget 256)
    //   -> packs [0,4] [8] [12 oversized alone]
    // bucket 1: ids 1,5 tokens 256,1 -> [1 exactly-full] [5]
    val docs = Seq(
      (0L, 100L), (4L, 100L), (8L, 100L), (12L, 300L),
      (1L, 256L), (5L, 1L)
    ).toDF("doc_id", "n_tokens")
    val got = Packing.packSequences(docs, "doc_id", "n_tokens",
      budget = 256L, buckets = 4)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      0L -> ((0L, 0L, 0L)), 4L -> ((0L, 0L, 1L)),
      8L -> ((0L, 1L, 0L)), 12L -> ((0L, 2L, 0L)),
      1L -> ((1L, 0L, 0L)), 5L -> ((1L, 1L, 0L))))
    // determinism: a pre-scrambled input packs identically
    val scrambled = Packing.packSequences(
      docs.repartition(7), "doc_id", "n_tokens", 256L, 4)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(scrambled == got)
  }

  test("substring dedup: a duplicated span is removed from EVERY copy " +
    "wherever it starts; unique text and short docs survive untouched") {
    // the shared 6-token span sits at position 0 in doc 10, mid-doc in
    // doc 11 (straddling any fixed chunk boundary), and at the tail of
    // doc 12 — the sliding window must catch all three
    val span = "s1 s2 s3 s4 s5 s6"
    val d = Seq(
      (10L, s"$span u1 u2 u3"),
      (11L, s"v1 v2 v3 $span v4 v5"),
      (12L, s"w1 w2 w3 w4 $span"),
      (13L, "all unique tokens here nothing repeats at all ever"),
      (14L, "tiny doc") // shorter than the window: never touched
    ).toDF("doc_id", "text")
    val r = Dedup.substringDedup(d, "doc_id", "text", minTokens = 6)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_removed").as[(Long, Long, Long)]
      .collect().toSeq
    assert(r == Seq((10L, 9L, 6L), (11L, 11L, 6L), (12L, 10L, 6L),
      (13L, 9L, 0L), (14L, 2L, 0L)))
    // splicing is byte-exact: doc 11 keeps exactly its flanks
    val digests = Dedup.substringDedup(d, "doc_id", "text", 6)
      .filter(col("doc_id") === 11L).select("kept_digest")
      .as[String].head()
    val expected = d.sparkSession.range(1)
      .select(md5(lit("v1 v2 v3 v4 v5"))).as[String].head()
    assert(digests == expected)
    // a WITHIN-doc repeat also counts as duplication (two occurrences)
    val selfRep = Seq((20L, s"$span x y $span")).toDF("doc_id", "text")
    val sr = Dedup.substringDedup(selfRep, "doc_id", "text", 6)
      .select("n_tokens", "n_removed").as[(Long, Long)].head()
    assert(sr == ((14L, 12L)))
    // overlapping duplicated windows merge: covered positions dedup,
    // so n_removed never exceeds n_tokens
    val over = Seq((30L, s"$span s7"), (31L, s"$span s7 z")).toDF("doc_id", "text")
    val ov = Dedup.substringDedup(over, "doc_id", "text", 6)
      .orderBy("doc_id")
      .select("n_tokens", "n_removed").as[(Long, Long)].collect().toSeq
    assert(ov == Seq((7L, 7L), (8L, 7L)))
  }

  test("BPE training: frequency-weighted argmax merges, greedy leftmost " +
    "application, learned merges compose, early exhaustion stops") {
    // corpus: 'ab' x3, 'abab' x2, 'cd' x1 -> pair counts:
    //   (a,b) = 3 + 2*2 = 7; (b,a) = 2; (c,d) = 1
    val d = Seq((1L, "ab ab ab abab abab cd")).toDF("doc_id", "text")
    val m = Bpe.train(d, "text", merges = 4)
      .orderBy("step")
      .select("step", "merged", "cnt").as[(Long, String, Long)]
      .collect().toSeq
    // step 1 merges (a,b) everywhere — including BOTH occurrences in
    // 'abab' (leftmost non-overlapping); step 2 then sees (ab,ab)=2
    // vs (c,d)=1; step 3 merges (c,d); then nothing remains
    assert(m == Seq((1L, "ab", 7L), (2L, "abab", 2L), (3L, "cd", 1L)),
      s"got $m")
    // ties break by pair string: 'xy' x2 vs 'yx' x2 -> (x,y) wins
    val t = Seq((1L, "xy xy yx yx")).toDF("doc_id", "text")
    val first = Bpe.train(t, "text", merges = 1)
      .select("merged").as[String].head()
    assert(first == "xy")
  }

  test("ngram jaccard: exact dup = 1000, near-dup above 500") {
    val all = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "lang", 0)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(all((1L, 4L)) == 1000L)
    assert(all((1L, 2L)) >= 500L && all((1L, 2L)) < 1000L)
  }

  test("simhash distance: exact dup -> 0") {
    val r = Dedup.simhashPairs(docs, "doc_id", "text", "lang", 32)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, d) => (a, b) -> d }.toMap
    assert(r((1L, 4L)) == 0L)
    assert(r((1L, 2L)) < r((1L, 3L))) // near-dup closer than unrelated
  }

  test("lm fluency: repeated bigrams score high, unique ones the base " +
    "rate, short docs 0 by definition") {
    val d = Seq(
      (1L, "a b a b a b"), // c(a,b)=3, c(a.)=3 -> p=1e6; (b,a)=2/2 -> 1e6
      (2L, "a b"),         // one bigram, c(a,b)=4? no: global counts
      (3L, "x"),           // no bigram
      (4L, "")).toDF("doc_id", "text")
    val r = TextAnalysis.lmFluency(d, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_bigrams", "fluency_x1e6")
      .as[(Long, Long, Long)].collect().toSeq
    // corpus-global counts: c(a,b)=4 over c(a·)=4 -> 1e6; c(b,a)=2 over
    // c(b·)=2 -> 1e6; doc 3/4 have no bigrams -> 0
    assert(r == Seq((1L, 5L, 1000000L), (2L, 1L, 1000000L),
      (3L, 0L, 0L), (4L, 0L, 0L)))
    // a rare continuation dilutes the mean below the common one
    val d2 = Seq((1L, "q r q r q r"), (2L, "q z")).toDF("doc_id", "text")
    val r2 = TextAnalysis.lmFluency(d2, "doc_id", "text")
      .orderBy("doc_id").select("fluency_x1e6").as[Long].collect().toSeq
    // c(q,r)=3, c(q,z)=1, c(q·)=4: doc1 mean blends 750000 (q r) and
    // 1e6 (r q); doc2 = 250000
    assert(r2.last == 250000L && r2.head > r2.last)
  }

  test("DSIR importance scoring: target-vocabulary docs outrank " +
    "raw-vocabulary docs, exact fixed-point values, parity selection") {
    // target docs (tgt=true) speak {alpha, beta}; raw-only docs speak
    // {gamma, delta}; a mixed doc sits between
    val d = Seq(
      (1L, "alpha beta alpha", true), (2L, "beta alpha beta", true),
      (3L, "gamma delta gamma", false), (4L, "delta gamma delta", false),
      (5L, "alpha gamma", false))
      .toDF("doc_id", "text", "tgt")
    val got = TextAnalysis
      .importanceScore(d, "doc_id", "text", col("tgt"), buckets = 16)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "importance_x1e6", "selected")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got.map(_._2) == Seq(3L, 3L, 3L, 3L, 2L))
    // exact replay of the integer formula over the tiny corpus
    val md = graft.functions.Hash64.newMd5()
    def b(tok: String): Long = graft.functions.Hash64.hash64(md,
      graft.functions.Hash64.seedPrefix("ds"),
      tok.getBytes("UTF-8")) % 16L
    val toks = Seq(
      ("alpha", true), ("beta", true), ("alpha", true),
      ("beta", true), ("alpha", true), ("beta", true),
      ("gamma", false), ("delta", false), ("gamma", false),
      ("delta", false), ("gamma", false), ("delta", false),
      ("alpha", false), ("gamma", false)).map { case (t, g) => (b(t), g) }
    val craw = toks.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val ctgt = toks.filter(_._2).groupBy(_._1).view
      .mapValues(_.size.toLong).toMap
    val (traw, ttgt) = (toks.size.toLong, toks.count(_._2).toLong)
    def ratio(bk: Long): Long = {
      val pt = (ctgt.getOrElse(bk, 0L) + 1) * 1000000000L / (ttgt + 16)
      val pr = (craw(bk) + 1) * 1000000000L / (traw + 16)
      pt * 1000000L / pr
    }
    def score(ts: Seq[String]): Long =
      ts.map(t => ratio(b(t))).sum / ts.size
    assert(got.map(_._3) == Seq(
      score(Seq("alpha", "beta", "alpha")),
      score(Seq("beta", "alpha", "beta")),
      score(Seq("gamma", "delta", "gamma")),
      score(Seq("delta", "gamma", "delta")),
      score(Seq("alpha", "gamma"))))
    // semantics: target vocabulary scores above parity and is selected;
    // raw-only vocabulary scores below parity and is dropped
    assert(got(0)._3 > 1000000L && got(0)._4)
    assert(got(2)._3 < 1000000L && !got(2)._4)
    assert(got.forall(x => x._4 == (x._3 >= 1000000L)))
    // the mixed doc lands strictly between the pure ones
    assert(got(4)._3 < got(0)._3 && got(4)._3 > got(2)._3)
  }

  test("model gate: deterministic hashed-linear score, sign decides " +
    "keep, identical texts score identically") {
    val d = Seq((1L, "alpha beta"), (2L, "alpha beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.modelScore(d, "doc_id", "text", dims = 64)
      .orderBy("doc_id")
      .select("doc_id", "score", "n_tokens", "keep")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(r(0)._2 == r(1)._2 && r(0)._4 == r(1)._4)
    assert(r.map(_._3) == Seq(2L, 2L, 1L))
    assert(r.forall(x => x._4 == (x._2 >= 0L)))
    // weights are the hash-derived stand-in: recompute one expectation
    val md = graft.functions.Hash64.newMd5()
    def w(tok: String): Long = {
      val b = graft.functions.Hash64.hash64(md,
        graft.functions.Hash64.seedPrefix("t"),
        tok.getBytes("UTF-8")) % 64L
      (graft.functions.Hash64.hash64(md,
        graft.functions.Hash64.seedPrefix("w"),
        b.toString.getBytes("UTF-8")) % 2001L) - 1000L
    }
    assert(r(2)._2 == w("gamma"))
    assert(r(0)._2 == w("alpha") + w("beta"))
  }

  test("language id: stopword scoring with deterministic tie-break") {
    val d = Seq(
      (1L, "the cat and the dog", "en"),
      (2L, "der hund und die katze ist da", "de"),
      (3L, "xyz qrs tuv", "zz")).toDF("doc_id", "text", "lang")
    val r = TextAnalysis.languageId(d, "doc_id", "text", "lang")
      .select("doc_id", "predicted_lang", "agree")
      .as[(Long, String, Boolean)].collect()
      .map { case (id, p, a) => id -> ((p, a)) }.toMap
    assert(r(1L) == (("en", true)))
    assert(r(2L) == (("de", true)))
    assert(r(3L)._1 == "en") // zero scores everywhere -> first lang wins
  }

  test("brute-force topk ranks by cosine with id tie-break") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f)),   // identical to query
      (2L, Array(0.0f, 1.0f)),   // orthogonal
      (3L, Array(0.7f, 0.7f))    // diagonal
    ).toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" === 0)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val c = vecs.select($"vec_id", $"embedding".as("v"))
    val r = Similarity.bruteForceTopK(q, c, 3)
      .select("rank", "vec_id").as[(Long, Long)].collect().toSeq.sorted
    assert(r == Seq((1L, 1L), (2L, 3L), (3L, 2L)))
  }

  test("lsh topk candidates are a subset of brute-force ranking") {
    val vecs = (0L until 50L).map { i =>
      (i, Array.tabulate(8)(d => math.sin(i * 13.7 + d * 2.3).toFloat))
    }.toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" < 2)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val c = vecs.select($"vec_id", $"embedding".as("v"))
    val lsh = Similarity.lshTopK(q, c, dims = 8, k = 5, numBits = 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val bf = Similarity.bruteForceTopK(q, c, 50)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(lsh.nonEmpty)
    assert(lsh.subsetOf(bf))
  }

  test("ivf topk: subset of brute force, deterministic, nonzero recall") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val c = e.select($"vec_id", $"embedding".as("v"))
    val ivf = Similarity.ivfTopK(q, c, k = 10, numCentroids = 16, nProbe = 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf2 = Similarity.ivfTopK(q, c, k = 10, numCentroids = 16, nProbe = 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(ivf == ivf2) // deterministic
    val bf = Similarity.bruteForceTopK(q, c, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(ivf.nonEmpty)
    // probing 4/16 buckets must recover a nonzero share of the true top-10
    assert((ivf intersect bf).nonEmpty)
  }

  test("pq topk: self-coded duplicate ranks first, deterministic, nonzero recall") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val c = e.select($"vec_id", $"embedding".as("v"))
    def run() = Similarity.pqTopK(q, c, dims = 64, k = 10)
      .select("query_id", "rank", "vec_id", "adist")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
    val pq = run()
    assert(pq == run()) // deterministic end-to-end (training included)
    assert(pq.forall(_._4 >= 0)) // ADC distance is a sum of squares
    // a vector sharing the query's exact codes has adist == the query's
    // own quantization residual — for a query in the corpus, its nearest
    // neighbors by ADC must overlap the true cosine top-k
    val bf = Similarity.bruteForceTopK(q, c, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val got = pq.map(r => (r._1, r._3)).toSet
    assert((got intersect bf).nonEmpty)
    // per query: exactly k rows, ranks 1..k, adist non-decreasing
    pq.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2) == (1L to 10L))
      assert(rows.map(_._4) == rows.map(_._4).sorted)
    }
  }

  test("pq topk: a tiny ADC ceiling chunks the query set without changing results") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter($"vec_id" < 6)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val c = e.select($"vec_id", $"embedding".as("v"))
    def run(ceiling: Long) = Similarity.pqTopK(q, c, dims = 64, k = 5,
      maxAdcEntries = ceiling)
      .select("query_id", "rank", "vec_id", "adist")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
    // default numSubs*codebookSize = 64 entries/query; a 100-entry
    // ceiling forces several chunks over 6 queries
    val chunked = run(100L)
    val whole = run(32L * 1024 * 1024)
    assert(chunked == whole,
      "chunked ADC scoring must be exact: per-query top-k is independent")
  }

  test("multimodal feature extraction: deterministic stub decode over binary") {
    import Multimodal._
    val media = Seq(
      MediaRow(1L, "image", "fake-jpeg-bytes".getBytes("UTF-8"), "s1"),
      MediaRow(2L, "audio", Array.emptyByteArray, "s2"),
      MediaRow(3L, "video", null, "s3")
    ).toDS()
    val feats = extractFeatures(media).collect().sortBy(_.media_id)
    assert(feats.length == 3)
    assert(feats(0).byte_len == 15L)
    assert(feats(0).digest.length == 32)
    assert(feats(0).feature.length == 8)
    assert(feats(1).feature.toSeq == Seq.fill(8)(0.0f))
    assert(feats(2).byte_len == 0L && feats(2).digest == "")
    // determinism
    val again = extractFeatures(media).collect().sortBy(_.media_id)
    assert(again.map(_.feature.toSeq).toSeq == feats.map(_.feature.toSeq).toSeq)
  }

  test("contamination flags only docs sharing an n-gram with the benchmark") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely different words nothing shared here at all ok"),
      (3L, "prefix text then quick brown fox jumps over suffix words"),
      (4L, "short doc")
    ).toDF("doc_id", "text")
    val bench = Seq((99L, "the quick brown fox jumps over a fence")).toDF("doc_id", "text")
    val hits = TextAnalysis.contamination(docs, bench, "doc_id", "text", n = 5)
      .as[(Long, Long)].collect().toMap
    // doc 1 shares "the quick brown fox jumps" and "quick brown fox jumps over"
    assert(hits(1L) == 2L)
    assert(hits(3L) == 1L) // only "quick brown fox jumps over"
    assert(!hits.contains(2L) && !hits.contains(4L))
  }

  test("pii scrub redacts emails then digit runs, deterministically") {
    val docs = Seq(
      (1L, "mail me at a.b+c@mail.example.org or 12345678 now"),
      (2L, "clean text with short 123 numbers only"),
      (3L, "two mails x@y.io and z@w.co plus 99999999999")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.piiScrub(docs, "doc_id", "text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(r(0)._2 == 1L && r(0)._3 == 1L)
    assert(r(1)._2 == 0L && r(1)._3 == 0L)
    assert(r(2)._2 == 2L && r(2)._3 == 1L)
    // digest equals md5 of the expected scrubbed text
    val expected = "mail me at <EMAIL> or <NUM> now"
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r(0)._4 == hex)
  }

  test("container decode parses real bytes: magic, BE dims, checksum") {
    import Multimodal._
    def img(id: Long, w: Int, h: Int, v: Int): (Long, Array[Byte]) = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("GIMG".getBytes("UTF-8"))
      out.write((w >> 8) & 0xff); out.write(w & 0xff)
      out.write((h >> 8) & 0xff); out.write(h & 0xff)
      (0 until w * h).foreach(_ => out.write(v))
      (id, out.toByteArray)
    }
    // 300 > 255 exercises the BE high byte of the uint16 dims
    val media = Seq(img(1L, 3, 2, 7), img(2L, 300, 1, 200)).toDS()
    val decoded = decodeImages(media).collect().sortBy(_.doc_id)
    assert(decoded(0) == DecodedMedia(1L, 3, 2, 6L, 42L))
    assert(decoded(1) == DecodedMedia(2L, 300, 1, 300L, 60000L))
    // malformed payloads fail loudly, not silently
    val bad = Seq((9L, "nope".getBytes("UTF-8"))).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      decodeImages(bad).collect()
    }
    assert(e.getMessage != null)
  }

  test("gopher rules: each rule fires on planted evidence, keep is the conjunction") {
    val w50 = (1 to 50).map(i => s"the word$i").mkString(" ") // 100 words, has 'the'
    val docs = Seq(
      (1L, w50),                                        // passes everything
      (2L, "too short to keep"),                        // word count < 50
      (3L, (1 to 60).map(_ => "a").mkString(" ")),      // mean len 1 < 3, no stop
      (4L, (1 to 60).map(_ => "the ###x").mkString(" ")), // >10% symbol words
      (5L, (1 to 60).map(_ => "the 12345").mkString(" ")) // 50% alpha < 80%
    ).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(docs, "doc_id", "text", minStops = 1)
      .collect().map(x => x.getLong(0) ->
        (x.getBoolean(6), x.getBoolean(7), x.getBoolean(8), x.getBoolean(9),
          x.getBoolean(10), x.getBoolean(11))).toMap
    assert(r(1L) == ((true, true, true, true, true, true)))
    assert(!r(2L)._1 && !r(2L)._6, "word-count rule")
    assert(!r(3L)._2 && !r(3L)._5 && !r(3L)._6, "mean-length + stop rules")
    assert(!r(4L)._4 && !r(4L)._6, "symbol rule")
    assert(!r(5L)._3 && !r(5L)._6, "alpha rule")
  }

  test("count-min: never-seen probes estimate 0 and are never dropped") {
    import graft.pipeline.Sketches
    val data = Seq("x", "x", "y").toDF("t")
    val sketch = Sketches.countMin(data, "t", depth = 4, width = 4096)
    val probes = Seq(("x", 2L), ("definitely-missing-token", 0L))
      .toDF("token", "true_cnt")
    val est = Sketches.countMinEstimate(sketch, probes, "token", 4, 4096)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(est("x") >= 2L, "overestimate property")
    // the missing probe must survive the join AND read ~0 (an
    // unpopulated cell counts 0; 4096-wide rows make a full 4-cell
    // collision with {x, y} astronomically unlikely)
    assert(est.contains("definitely-missing-token"))
    assert(est("definitely-missing-token") == 0L)
  }

  test("random projection: one-hot vectors read the sign matrix back") {
    val signs = RandomProjection.signMatrix(8, 16)
    // deterministic: same matrix on every call (backfill consistency)
    assert(signs.map(_.toSeq).toSeq ==
      RandomProjection.signMatrix(8, 16).map(_.toSeq).toSeq)
    assert(signs.forall(_.forall(s => s == 1.0 || s == -1.0)))
    val oneHot = (0 until 16).map { d =>
      (d.toLong, Array.tabulate(16)(i => if (i == d) 1.0f else 0.0f))
    }
    val out = RandomProjection
      .project(oneHot.toDF("vec_id", "v"), "vec_id", "v", 16, 8)
      .collect()
    out.foreach { r =>
      val d = r.getLong(0).toInt
      (0 until 8).foreach { k =>
        assert(r.getLong(1 + k) == (signs(k)(d) * 1e6).toLong,
          s"component p$k of one-hot dim $d must equal the sign")
      }
    }
  }

  test("real WAV decode: JDK audio codec round-trip, exact channel sums") {
    import Multimodal._
    // build a real container with the JDK writer (WAVE little-endian,
    // AIFF big-endian — the latter exercises decodeWav's BE branch)
    def clip(id: Long, samples: Array[Array[Short]], aiff: Boolean)
        : (Long, Array[Byte]) = {
      val ch = samples.length
      val n = samples(0).length
      val pcm = new Array[Byte](n * ch * 2)
      for (i <- 0 until n; c <- 0 until ch) {
        val s = samples(c)(i)
        val o = (i * ch + c) * 2
        if (aiff) { pcm(o) = ((s >> 8) & 0xff).toByte; pcm(o + 1) = (s & 0xff).toByte }
        else { pcm(o) = (s & 0xff).toByte; pcm(o + 1) = ((s >> 8) & 0xff).toByte }
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, ch, true, aiff)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val baos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        if (aiff) javax.sound.sampled.AudioFileFormat.Type.AIFF
        else javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
      (id, baos.toByteArray)
    }
    val mono = clip(1L, Array(Array[Short](5, -7, 32767, -32768)), aiff = false)
    val stereo = clip(2L, Array(Array[Short](1, 2, 3), Array[Short](-1, -2, -3)), aiff = false)
    val bigEnd = clip(3L, Array(Array[Short](100, -200)), aiff = true)
    val out = decodeWav(Seq(mono, stereo, bigEnd).toDS()).collect().sortBy(_.doc_id)
    assert(out(0) == AudioFeatures(1L, 1, 4L, 5L - 7L + 32767L - 32768L, 0L))
    assert(out(1) == AudioFeatures(2L, 2, 3L, 6L, -6L))
    assert(out(2) == AudioFeatures(3L, 1, 2L, -100L, 0L))
    // garbage fails loudly, never silent features
    val e = intercept[org.apache.spark.SparkException] {
      decodeWav(Seq((9L, "not audio".getBytes("UTF-8"))).toDS()).collect()
    }
    assert(e.getMessage != null)
  }

  test("real MJPEG-AVI video decode: RIFF walk + per-frame JDK JPEG " +
    "decode, header cross-check, loud failures") {
    import Multimodal._
    def grayJpeg(w: Int, h: Int, g: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", baos)
      baos.toByteArray
    }
    // 3 frames at grays 10/200/255 in an 11x5 stream (odd JPEG sizes
    // exercise the RIFF pad-byte walk)
    val frames = Seq(grayJpeg(11, 5, 10), grayJpeg(11, 5, 200),
      grayJpeg(11, 5, 255))
    val avi = writeMjpegAvi(frames, 11, 5)
    val out = decodeMjpegAvi(Seq((7L, avi)).toDS()).collect().head
    val pix = 11L * 5L * (10L + 200L + 255L)
    assert(out == VideoFeatures(7L, 3, 11, 5, pix, pix, pix))
    // malformed containers fail loudly, never silent features:
    def fails(payload: Array[Byte]): Unit = {
      val e = intercept[org.apache.spark.SparkException] {
        decodeMjpegAvi(Seq((9L, payload)).toDS()).collect()
      }
      assert(e.getMessage != null)
    }
    fails("not a riff container at all".getBytes("UTF-8")) // bad magic
    fails(avi.take(40).toArray) // torn header
    // header/stream frame-count disagreement: flip avih dwTotalFrames
    val lied = avi.clone()
    // avih data starts at RIFF(12) + LIST hdr(12) + avih hdr(8) = 32;
    // dwTotalFrames is at offset 16 within it
    assert(new String(lied, 24, 4, "US-ASCII") == "avih")
    lied(32 + 16) = 9
    fails(lied)
    // a frame chunk that is not a decodable image
    val junk = writeMjpegAvi(Seq(Array.fill[Byte](64)(3)), 4, 4)
    fails(junk)
  }

  test("payload meta equals md5 of utf8 text") {
    val d = Seq((1L, "hello")).toDF("doc_id", "text")
    val r = Multimodal.payloadMeta(d, "doc_id", "text")
      .as[(Long, Long, String)].collect().head
    assert(r == ((1L, 5L, "5d41402abc4b2a76b9719d911017c592")))
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("passage dedup keeps the globally-first occurrence, reassembles byte-exact") {
    val corpus = Seq(
      (1L, "a b c d e f"), // passages (n=3): "a b c", "d e f" — both first
      (2L, "a b c x y z"), // "a b c" dup of doc1#0 -> dropped; "x y z" kept
      (3L, "d e f")        // dup of doc1#1 (later doc wins nothing) -> empty
    ).toDF("doc_id", "text")
    val r = Dedup.passageDedup(corpus, "doc_id", "text", passageTokens = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(r == Seq(
      (1L, 2L, 2L, md5hex("a b c d e f")),
      (2L, 2L, 1L, md5hex("x y z")),
      (3L, 1L, 0L, md5hex(""))))
  }

  test("passage dedup: within-doc repeats collapse to the first chunk") {
    val corpus = Seq((7L, "p q r p q r p q r")).toDF("doc_id", "text")
    val r = Dedup.passageDedup(corpus, "doc_id", "text", passageTokens = 3)
      .as[(Long, Long, Long, String)].collect().head
    assert(r == ((7L, 3L, 1L, md5hex("p q r"))))
  }

  test("bloom-prefiltered contamination equals the exact path") {
    val train = docs
    val bench = docs.filter(col("doc_id") % 2 === 0)
    val exact = TextAnalysis.contamination(train, bench, "doc_id", "text", n = 3)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    val bloomed = TextAnalysis.contaminationBloom(
        train, bench, "doc_id", "text", n = 3,
        expectedGrams = 1000, fpp = 0.01)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(exact.nonEmpty && bloomed == exact)
  }

  test("PMI collocations rank exclusive pairs above promiscuous ones") {
    // "alpha beta" always co-occur exclusively; "the x" pairs spread
    // "the" across many successors, so their lift is diluted
    val corpus = Seq(
      (1L, "alpha beta the cat the dog the pig the cow the hen"),
      (2L, "alpha beta the cat the dog the pig the cow the ant"),
      (3L, "alpha beta the cat the dog the pig the fox the bee"),
      (4L, "alpha beta the cat the dog the pig the cow the owl"),
      (5L, "alpha beta the cat the dog the pig the cow the ram")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.collocations(corpus, "text",
        minCount = 5L, topK = 3)
      .as[(String, String, Long, Long)].collect()
    assert(r.head._1 == "alpha" && r.head._2 == "beta")
    // exact fixed-point value: 12 words/doc -> 11 bigrams x 5 docs,
    // N=55; c12=5, c1("alpha" as left)=5, c2("beta" as right)=5 ->
    // (5*55*1e6) div 25 = 1.1e7
    assert(r.head._4 == 11000000L)
    assert(r.forall(_._3 >= 5L), "min-count gate")
  }

  test("hard negatives keep only the cosine band, ranked within it") {
    import org.apache.spark.sql.functions.col
    val qs = Seq((100L, Array(1.0f, 0.0f))).toDF("query_id", "qv")
    val corpus = Seq(
      (1L, Array(1.0f, 0.01f)),  // ~0.99999: above the band -> excluded (positive)
      (2L, Array(1.0f, 0.9f)),   // ~0.743: inside the band
      (3L, Array(1.0f, 1.2f)),   // ~0.640: inside the band
      (4L, Array(0.0f, 1.0f))    // 0.0: below the band -> excluded
    ).toDF("vec_id", "v")
    val r = Similarity.hardNegatives(qs, corpus, k = 10,
        loX1e6 = 500000L, hiX1e6 = 900000L)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(r == Seq(2L, 3L),
      s"band [0.5, 0.9) must keep exactly the confusable middle, got $r")
  }

  test("MMR trades relevance for diversity; lambda=1e6 degenerates to top-k") {
    // query at origin-ish; a,b nearly identical high-relevance pair,
    // c slightly less relevant but orthogonal to them
    val qs = Seq((100L, Array(1.0f, 0.0f, 0.0f)))
      .toDF("query_id", "qv")
    val corpus = Seq(
      (1L, Array(0.99f, 0.14f, 0.0f)),  // rel ~ cos to q: high
      (2L, Array(0.99f, 0.141f, 0.0f)), // near-clone of 1
      (3L, Array(0.7f, 0.0f, 0.71f))    // lower rel, orthogonal-ish
    ).toDF("vec_id", "v")
    // pure relevance (lambda = 1e6): picks 1, 2, 3 in cosine order
    val pure = Similarity.mmrTopK(qs, corpus, poolK = 3, k = 3,
        lambdaX1e6 = 1000000L)
      .orderBy("sel_rank").select("vec_id").as[Long].collect().toSeq
    assert(pure.take(2).toSet == Set(1L, 2L) && pure(2) == 3L)
    // diversity-weighted: after picking one of the clone pair, the
    // orthogonal vector beats the clone
    val div = Similarity.mmrTopK(qs, corpus, poolK = 3, k = 3,
        lambdaX1e6 = 500000L)
      .orderBy("sel_rank").select("vec_id").as[Long].collect().toSeq
    assert(div(1) == 3L, s"second MMR pick must be the diverse vector, got $div")
    // ranks are 1..k and scores strictly ordered within the greedy walk
    val full = Similarity.mmrTopK(qs, corpus, poolK = 3, k = 3,
        lambdaX1e6 = 500000L)
      .select("sel_rank").as[Long].collect().toSeq.sorted
    assert(full == Seq(1L, 2L, 3L))
  }
}
