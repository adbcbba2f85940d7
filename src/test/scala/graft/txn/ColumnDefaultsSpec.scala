package graft.txn

import graft.SparkTestSession
import graft.compaction.Compaction
import graft.core._
import graft.sources.TableReader
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Column DEFAULT values (the Iceberg v3 initial/write-default model):
  * literal validation + canonicalization, default fill on every read
  * path (plan-level reconcile, DSv2 columnar, DSv2 row), equality
  * deletes keyed on default-read columns, the frozen-initial-default
  * contract, compaction materialization, and the iceberg-format
  * round-trip. */
class ColumnDefaultsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mkTable(): String = {
    val dir = Files.createTempDirectory("graft-defaults").toString
    FileTableCatalog.commitCas(dir, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(dir,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name"))
    dir
  }

  test("canonicalize: literals validate, bad defaults fail loudly") {
    assert(ColumnDefaults.canonicalize("5", "bigint") == "5L")
    assert(ColumnDefaults.canonicalize("'web'", "string") == "'web'")
    assert(ColumnDefaults.canonicalize("true", "boolean") == "true")
    // NULL is a legal explicit default
    val nullCanon = ColumnDefaults.canonicalize("NULL", "bigint")
    assert(ColumnDefaults.catalystValue(nullCanon, org.apache.spark.sql
      .types.LongType) == null)
    intercept[CompactionError.Config] {
      ColumnDefaults.canonicalize("id + 1", "bigint") // not a literal
    }
    intercept[CompactionError.Config] {
      ColumnDefaults.canonicalize("((", "bigint") // unparseable
    }
    intercept[CompactionError.Config] {
      ColumnDefaults.canonicalize("'abc'", "bigint") // uncastable (ANSI)
    }
    intercept[CompactionError.Config] {
      ColumnDefaults.canonicalize("array(1)", "array<int>") // unsupported type
    }
  }

  test("timestamp defaults canonicalize with an explicit UTC offset — " +
    "zone-independent re-parse") {
    val canon = ColumnDefaults.canonicalize(
      "TIMESTAMP '2024-06-01 12:00:00+00:00'", "timestamp")
    assert(canon.contains("+00:00"),
      s"canonical timestamp text must carry an offset, got: $canon")
    val micros = ColumnDefaults.catalystValue(canon,
      org.apache.spark.sql.types.TimestampType).asInstanceOf[Long]
    // 2024-06-01T12:00:00Z in epoch micros, independent of any zone
    assert(micros == java.time.Instant.parse("2024-06-01T12:00:00Z")
      .getEpochSecond * 1000000L)
  }

  test("initial-default fills pre-existing files on the plan path; a " +
    "defaultless add stays null") {
    val dir = mkTable()
    SchemaEvolution.evolve(dir, Seq(
      SchemaOp.Add("score", "bigint", default = Some("7")),
      SchemaOp.Add("tag", "string")))
    TableWrites.appendData(dir,
      Seq((4L, "d", 9L, "t4")).toDF("id", "name", "score", "tag"))
    val rows = TableReader.read(spark, dir).orderBy("id").collect().map(r =>
      (r.getLong(0), Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.getString(3))))
    assert(rows.toSeq == Seq(
      (1L, Some(7L), None), (2L, Some(7L), None), (3L, Some(7L), None),
      (4L, Some(9L), Some("t4"))))
  }

  test("DSv2 columnar and row readers fill the same defaults") {
    val dir = mkTable()
    SchemaEvolution.evolve(dir,
      Seq(SchemaOp.Add("score", "bigint", default = Some("7")),
        SchemaOp.Add("src", "string", default = Some("'web'"))))
    TableWrites.appendData(dir,
      Seq((4L, "d", 9L, "api")).toDF("id", "name", "score", "src"))
    def readAll(vectorized: Boolean) =
      spark.read.format("graft").option("vectorizedRead", vectorized)
        .load(dir).orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSeq
    val expected = Seq((1L, 7L, "web"), (2L, 7L, "web"), (3L, 7L, "web"),
      (4L, 9L, "api"))
    assert(readAll(vectorized = true) == expected, "columnar path")
    assert(readAll(vectorized = false) == expected, "row path")
  }

  test("equality delete keyed on a defaulted column kills default-read " +
    "rows on every path") {
    val dir = mkTable()
    SchemaEvolution.evolve(dir,
      Seq(SchemaOp.Add("score", "bigint", default = Some("7"))))
    // rows 1..3 READ score=7 via the initial-default -> all must die;
    // the later append carries a higher data sequence -> survives the
    // strict `<` rule even though its value also matches
    TableWrites.appendEqualityDeletes(dir,
      Seq(Tuple1(7L)).toDF("score"), Seq("score"))
    TableWrites.appendData(dir,
      Seq((4L, "d", 7L)).toDF("id", "name", "score"))
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(TableReader.read(spark, dir)) == Seq(4L), "plan path")
    assert(ids(spark.read.format("graft").load(dir)) == Seq(4L),
      "columnar path")
    assert(ids(spark.read.format("graft")
      .option("vectorizedRead", false).load(dir)) == Seq(4L), "row path")
    // a NULL-filled column (no default) keeps the old contract: the
    // delete can never match, old rows stay live
    val dir2 = mkTable()
    SchemaEvolution.evolve(dir2, Seq(SchemaOp.Add("tag", "string")))
    TableWrites.appendEqualityDeletes(dir2,
      Seq(Tuple1("x")).toDF("tag"), Seq("tag"))
    assert(ids(TableReader.read(spark, dir2)) == Seq(1L, 2L, 3L))
  }

  test("compaction materializes the initial-default physically") {
    val dir = mkTable()
    SchemaEvolution.evolve(dir,
      Seq(SchemaOp.Add("score", "bigint", default = Some("7"))))
    new Compaction(spark, dir,
      CompactionConfig(targetPartitions = 1)).compact()
    val snap = FileTableCatalog.loadOrThrow(dir)
    val dataFiles = snap.files.filter(_.content == "data")
    assert(dataFiles.forall(_.schemaId == snap.schemaId))
    dataFiles.foreach { f =>
      val vals = spark.read.parquet(f.path).select("score")
        .collect().map(_.getLong(0)).toSeq
      assert(vals.nonEmpty && vals.forall(_ == 7L),
        s"compacted file must carry the materialized default: $vals")
    }
  }

  test("SET DEFAULT moves the write-default; the initial-default is frozen") {
    val dir = mkTable()
    SchemaEvolution.evolve(dir,
      Seq(SchemaOp.Add("score", "bigint", default = Some("7"))))
    SchemaEvolution.evolve(dir,
      Seq(SchemaOp.SetDefault("score", Some("9"))))
    val f = FileTableCatalog.loadOrThrow(dir)
      .currentSchema.get.fields.find(_.name == "score").get
    assert(f.initialDefault == Some("7L"), "initial-default must not move")
    assert(f.writeDefault == Some("9L"))
    // pre-existing rows still read the FROZEN initial default
    val scores = TableReader.read(spark, dir).select("score")
      .collect().map(_.getLong(0)).toSeq
    assert(scores == Seq(7L, 7L, 7L))
    // DROP DEFAULT clears the write default only
    SchemaEvolution.evolve(dir, Seq(SchemaOp.SetDefault("score", None)))
    val f2 = FileTableCatalog.loadOrThrow(dir)
      .currentSchema.get.fields.find(_.name == "score").get
    assert(f2.initialDefault == Some("7L") && f2.writeDefault.isEmpty)
    // setting a default on a missing column is refused
    intercept[CompactionError.Config] {
      SchemaEvolution.evolve(dir, Seq(SchemaOp.SetDefault("nope", Some("1"))))
    }
  }

  test("iceberg-format catalog round-trips defaults as v3 single-values") {
    val cat = IcebergTableCatalog
    val dir = Files.createTempDirectory("graft-iceberg-defaults").toString
    cat.commitCas(dir, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(dir,
      Seq((1L, "a"), (2L, "b")).toDF("id", "name").coalesce(1), catalog = cat)
    SchemaEvolution.evolve(dir, Seq(
      SchemaOp.Add("score", "bigint", default = Some("7")),
      SchemaOp.Add("src", "string", default = Some("'web'")),
      SchemaOp.Add("ok", "boolean", default = Some("true")),
      SchemaOp.Add("w", "double", default = Some("1.5"))), catalog = cat)
    val snap = cat.loadOrThrow(dir)
    val byName = snap.currentSchema.get.fields.map(f => f.name -> f).toMap
    assert(byName("score").initialDefault == Some("7L"))
    assert(byName("src").initialDefault == Some("'web'"))
    assert(byName("ok").initialDefault == Some("true"))
    assert(byName("w").initialDefault.isDefined)
    // the defaults land in metadata.json as the spec's JSON values
    val metaDir = new java.io.File(s"$dir/metadata")
    val metaJson = metaDir.listFiles().filter(_.getName.endsWith(".metadata.json"))
      .sortBy(_.getName).last
    val doc = IcebergFormat.parse(
      new String(java.nio.file.Files.readAllBytes(metaJson.toPath), "UTF-8"))
    import scala.jdk.CollectionConverters._
    val fields = doc.get("schemas").elements().asScala.toSeq.last
      .get("fields").elements().asScala.toSeq
    val scoreField = fields.find(_.get("name").asText == "score").get
    assert(scoreField.get("initial-default").asLong == 7L)
    val srcField = fields.find(_.get("name").asText == "src").get
    assert(srcField.get("initial-default").asText == "web")
    // ...and the default-filled read works through the iceberg catalog
    val rows = TableReader.read(spark, dir, catalog = cat)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSeq
    assert(rows == Seq((1L, 7L, "web"), (2L, 7L, "web")))
  }
}
