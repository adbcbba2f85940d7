package graft.functions

import graft.SparkTestSession
import graft.pipeline.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native hash expressions must produce bit-identical values to the
  * interpreted md5-HOF forms (which are what the DuckDB oracle replays). */
class HashExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .limit(50)
    .select($"doc_id", TextFunctions.shingles3($"text").as("sh"))
    .cache()

  test("minhash signature: native == HOF md5 form") {
    val native = docs.select($"doc_id",
      TextFunctions.minhashSignature($"sh", 8).as("mh"))
    val hof = docs.select($"doc_id",
      TextFunctions.minhashSignatureHof($"sh", 8).as("mh"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
  }

  test("simhash32: native == SQL-HOF form") {
    val native = docs.select($"doc_id", TextFunctions.simhash32($"sh").as("s"))
    val hof = docs.select($"doc_id", TextFunctions.simhash32Hof("sh").as("s"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
  }

  test("hashMin: native == array_min of hash64") {
    val native = docs.select($"doc_id", HashColumns.hashMin($"sh", "fp").as("m"))
    val hof = docs.select($"doc_id",
      array_min(transform($"sh", s => TextFunctions.hash64(lit("fp"), s))).as("m"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
  }

  test("hash64 value check against a known md5") {
    // md5("fp:hello") -- first 15 hex digits as int64, computed directly
    val v = Seq("hello").toDF("s")
      .select(HashColumns.hashMin(array($"s"), "fp").as("m"))
      .as[Long].head()
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("fp:hello".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    assert(v == java.lang.Long.parseLong(hex, 16))
  }

  test("native shingles == HOF shingles (as sets, with order preserved)") {
    val t = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    val native = t.select($"doc_id", TextFunctions.shingles3($"text").as("sh"))
    val hof = t.select($"doc_id", TextFunctions.shingles3Hof($"text").as("sh"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
    // edge cases: <3 words, consecutive spaces (empty-token parity)
    val edge = Seq("one two", "a b c", "a  b c d").toDF("text")
    val n2 = edge.select(TextFunctions.shingles3($"text").as("sh"))
    val h2 = edge.select(TextFunctions.shingles3Hof($"text").as("sh"))
    assert(n2.collect().map(_.getSeq[String](0)).toSeq ==
      h2.collect().map(_.getSeq[String](0)).toSeq)
  }

  test("sorted intersect count == size(array_intersect)") {
    val pairs = docs.as("a").crossJoin(docs.as("b")).limit(200)
      .select(array_sort($"a.sh").as("x"), array_sort($"b.sh").as("y"))
    val native = pairs.select(HashColumns.sortedIntersectCount($"x", $"y").as("c"))
    val builtin = pairs.select(size(array_intersect($"x", $"y")).as("c"))
    assert(native.exceptAll(builtin).isEmpty && builtin.exceptAll(native).isEmpty)
  }

  test("fused jaccard == floor(1000*|intersect|/|union|)") {
    val pairs = docs.as("a").crossJoin(docs.as("b")).limit(300)
      .select(array_sort($"a.sh").as("x"), array_sort($"b.sh").as("y"))
    val native = pairs.select(HashColumns.jaccardX1000($"x", $"y").as("j"))
    val builtin = pairs.select(
      floor(lit(1000.0) * size(array_intersect($"x", $"y")) /
        size(array_union($"x", $"y"))).cast("long").as("j"))
    assert(native.exceptAll(builtin).isEmpty && builtin.exceptAll(native).isEmpty)
  }

  test("native hyperplane bucket == HOF bucket") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val native = e.select($"vec_id",
      HashColumns.hyperplaneBucket($"embedding", 64, 8).as("b"))
    val hof = e.select($"vec_id",
      graft.pipeline.Similarity.hyperplaneBucketHof($"embedding", 64, 8).as("b"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
    // short-vector parity: BOTH forms reject vectors shorter than dims
    // (HOF via ANSI out-of-bounds getItem, native via its own guard)
    val short = Seq(Array(0.5f, -0.5f)).toDF("embedding")
    assertThrows[Exception] {
      short.select(HashColumns.hyperplaneBucket($"embedding", 64, 8)).collect()
    }
    assertThrows[Exception] {
      short.select(
        graft.pipeline.Similarity.hyperplaneBucketHof($"embedding", 64, 8)).collect()
    }
  }

  test("native cosine == HOF cosine bitwise") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(100)
    val pairs = e.as("a").crossJoin(e.as("b")).limit(500)
      .select($"a.embedding".as("x"), $"b.embedding".as("y"))
    val native = pairs.select(TextFunctions.cosine($"x", $"y").as("c"))
    val hof = pairs.select(TextFunctions.cosineHof($"x", $"y").as("c"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
  }

  test("empty feature array yields nulls (list_min-of-empty parity)") {
    val df = Seq(Seq.empty[String]).toDF("sh")
    val mh = df.select(TextFunctions.minhashSignature($"sh", 4)).head().getSeq[Any](0)
    assert(mh == Seq(null, null, null, null))
    assert(df.select(HashColumns.hashMin($"sh", "fp")).head().isNullAt(0))
  }
}
