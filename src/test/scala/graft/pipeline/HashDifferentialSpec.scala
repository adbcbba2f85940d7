package graft.pipeline

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Differential certification of the xxHash64 production twins against
  * the md5 reference semantics: hash VALUES legitimately differ, but
  * the near-dup GEOMETRY the pipelines derive from them must not.
  * DuckDB cannot replay seeded xxh64, so these equivalences are the
  * oracle-side blind spot this spec pins (VERDICT r7 item 7). */
class HashDifferentialSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("planted corpus: md5 and xx minhash emit the identical pair set") {
    val docs = graft.queries.PipelineQueries.plantedDocs(spark, sf).cache()
    try {
      val md5 = pairSet(Dedup.minhashLsh(docs, "doc_id", "text",
        numHashes = 32, bandSize = 4, thresholdX1000 = 500, hashKind = "md5"))
      val xx = pairSet(Dedup.minhashLsh(docs, "doc_id", "text",
        numHashes = 32, bandSize = 4, thresholdX1000 = 500, hashKind = "xx"))
      assert(md5 == xx, s"minhash geometry diverged: md5-only=${md5 -- xx}, " +
        s"xx-only=${xx -- md5}")
      // and both equal the planted truth {(3i, 3i+1)}
      assert(md5.forall { case (a, b) => b == a + 1 && a % 3 == 0 })
      assert(md5.nonEmpty)
    } finally docs.unpersist()
  }

  test("planted corpus: md5 and xx simhash emit the identical pair set") {
    val docs = graft.queries.PipelineQueries.plantedDocs(spark, sf).cache()
    try {
      val md5 = pairSet(Dedup.simhashPairs(docs, "doc_id", "text", "blk",
        maxDistance = 2, hashKind = "md5"))
      val xx = pairSet(Dedup.simhashPairs(docs, "doc_id", "text", "blk",
        maxDistance = 2, hashKind = "xx"))
      assert(md5 == xx, s"simhash geometry diverged: md5-only=${md5 -- xx}, " +
        s"xx-only=${xx -- md5}")
      assert(md5.forall { case (a, b) => b == a + 1 && a % 3 == 0 })
      assert(md5.nonEmpty)
    } finally docs.unpersist()
  }

  test("real corpus: verified xx minhash equals verified md5 minhash " +
    "(both are the exact >=0.5-jaccard truth)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").cache()
    try {
      val md5 = pairSet(Dedup.minhashLsh(docs, "doc_id", "text",
        numHashes = 32, bandSize = 4, thresholdX1000 = 500, hashKind = "md5"))
      val xx = pairSet(Dedup.minhashLsh(docs, "doc_id", "text",
        numHashes = 32, bandSize = 4, thresholdX1000 = 500, hashKind = "xx"))
      assert(md5 == xx,
        s"real-corpus verified outputs diverged: md5-only=${md5 -- xx}, " +
          s"xx-only=${xx -- md5}")
      assert(md5.nonEmpty)
    } finally docs.unpersist()
  }

  test("real corpus: xx simhash runs within the declared distance bound") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = Dedup.simhashPairs(docs, "doc_id", "text", "lang",
      maxDistance = 6, hashKind = "xx").collect()
    assert(out.nonEmpty, "xx simhash must find the corpus' planted dups")
    assert(out.forall(_.getAs[Long]("dist") <= 6))
  }
}
