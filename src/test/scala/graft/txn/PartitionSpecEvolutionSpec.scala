package graft.txn

import graft.SparkTestSession
import graft.core._
import graft.sources.PartitionPruning
import org.apache.spark.sql.types.{LongType, StringType}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Partition-spec EVOLUTION (the Iceberg per-file spec-id model): the
  * new spec applies to new files, each file prunes under ITS OWN
  * layout, and compaction migrates old files. The alias danger this
  * design exists for: bucket(4) and bucket(8) both render the field
  * `c_bucket=k`, so judging an old file's ordinal under the current
  * spec would silently drop matching rows. */
class PartitionSpecEvolutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def keyPath(t: PartitionTransform, v: Any,
      dt: org.apache.spark.sql.types.DataType, idx: Int): String = {
    val key = PartitionKey.key(Seq(PartitionKey.field(t, t.eval(v, dt))))
    s"/w/t/data/x/$key.part-0-$idx.parquet"
  }

  test("evolvePartitionSpec commits ids, history, and file stamps") {
    val dir = Files.createTempDirectory("graft-pevo").toString
    FileTableCatalog.commitCas(dir, TableSnapshot(1, 1, 0, Nil,
      properties = Map(PartitionSpecCodec.Property -> "identity:region")))
    TableWrites.appendData(dir,
      Seq((1L, "EU"), (2L, "US")).toDF("id", "region").coalesce(1))
    val cm = new CommitManager(dir)
    cm.evolvePartitionSpec(PartitionSpecCodec.decode("bucket:8:id"),
      expectedSchemaId = 1)
    val snap = FileTableCatalog.loadOrThrow(dir)
    assert(PartitionSpecCodec.currentId(Some(snap)) == 1L)
    assert(PartitionSpecCodec.of(Some(snap)) == Seq(BucketTransform(8, "id")))
    assert(PartitionSpecCodec.history(Some(snap)) == Map(
      0L -> Seq(IdentityTransform("region")),
      1L -> Seq(BucketTransform(8, "id"))))
    // pre-evolution files keep spec 0
    assert(snap.files.filter(_.content == "data").forall(_.specId == 0L))
    // post-evolution appends stamp the NEW id
    TableWrites.appendData(dir,
      Seq((3L, "AP")).toDF("id", "region").coalesce(1))
    val snap2 = FileTableCatalog.loadOrThrow(dir)
    assert(snap2.files.filter(_.content == "data")
      .map(_.specId).toSet == Set(0L, 1L))
    // second evolution appends to the history; identical spec refused
    cm.evolvePartitionSpec(Nil, expectedSchemaId = 1)
    val snap3 = FileTableCatalog.loadOrThrow(dir)
    assert(PartitionSpecCodec.currentId(Some(snap3)) == 2L)
    assert(PartitionSpecCodec.history(Some(snap3)).keySet == Set(0L, 1L, 2L))
    intercept[CompactionError.Config] {
      cm.evolvePartitionSpec(Nil, expectedSchemaId = 1)
    }
  }

  test("bucket(4) -> bucket(8): old files prune under their OWN ordinal") {
    val b4 = BucketTransform(4, "c")
    val b8 = BucketTransform(8, "c")
    // a value whose bucket-4 ordinal is NOT a valid bucket-8 alias
    val v = (1L to 1000L).find(x =>
      b4.eval(x, LongType) != b8.eval(x, LongType)).get
    val oldFile = FileEntry(keyPath(b4, v, LongType, 0), "data", 1L, 1L, 1L,
      specId = 0L)
    val specFor: FileEntry => Seq[PartitionTransform] =
      f => if (f.specId == 0L) Seq(b4) else Seq(b8)
    // per-file resolution keeps the matching old file
    val kept = PartitionPruning.prunePerFile(Seq(oldFile), specFor,
      Map("c" -> Seq[Any](v)), Map("c" -> LongType))
    assert(kept == Seq(oldFile),
      "old-spec file holding the value must survive its own-spec ordinal")
    // judging it under the CURRENT spec would have dropped it — the bug
    // per-file resolution exists to prevent
    val wrong = PartitionPruning.prune(Seq(oldFile), Seq(b8),
      Map("c" -> Seq[Any](v)), Map("c" -> LongType))
    assert(wrong.isEmpty,
      "fixture must actually alias (else this case proves nothing)")
    // and a NON-matching old file still prunes under its own spec
    val miss = (1L to 1000L).find(x =>
      b4.eval(x, LongType) != b4.eval(v, LongType)).get
    val missFile = FileEntry(keyPath(b4, miss, LongType, 1), "data", 1L, 1L, 1L,
      specId = 0L)
    val kept2 = PartitionPruning.prunePerFile(Seq(oldFile, missFile), specFor,
      Map("c" -> Seq[Any](v)), Map("c" -> LongType))
    assert(kept2 == Seq(oldFile), "pruning must still bite per spec")
  }

  test("property: across random spec pairs, matching files always survive") {
    val rng = new scala.util.Random(21)
    def transform(): PartitionTransform = rng.nextInt(3) match {
      case 0 => IdentityTransform("c")
      case 1 => BucketTransform(rng.nextInt(16) + 1, "c")
      case 2 => TruncateTransform(rng.nextInt(50) + 1, "c")
    }
    (1 to 300).foreach { _ =>
      val specA = Seq(transform())
      val specB = Seq(transform())
      val vals = List.fill(rng.nextInt(20) + 2)(rng.nextLong() % 1000)
      val (aVals, bVals) = vals.splitAt(vals.size / 2)
      val files =
        aVals.zipWithIndex.map { case (v, i) =>
          FileEntry(keyPath(specA.head, v, LongType, i), "data", 1L, 1L, 1L,
            specId = 0L) -> v
        } ++ bVals.zipWithIndex.map { case (v, i) =>
          FileEntry(keyPath(specB.head, v, LongType, 100 + i), "data",
            1L, 1L, 1L, specId = 1L) -> v
        }
      val target = vals(rng.nextInt(vals.size))
      val specFor: FileEntry => Seq[PartitionTransform] =
        f => if (f.specId == 0L) specA else specB
      val kept = PartitionPruning.prunePerFile(files.map(_._1), specFor,
        Map("c" -> Seq[Any](target)), Map("c" -> LongType)).map(_.path).toSet
      files.foreach { case (f, v) =>
        val own = specFor(f).head
        if (own.eval(v, LongType) == own.eval(target, LongType))
          assert(kept.contains(f.path),
            s"dropped matching file under ${own} for value $v (target $target)")
      }
    }
  }

  test("spec-history codec round-trips arbitrary specs") {
    val rng = new scala.util.Random(5)
    def transform(): PartitionTransform = rng.nextInt(4) match {
      case 0 => IdentityTransform(s"c${rng.nextInt(5)}")
      case 1 => BucketTransform(rng.nextInt(64) + 1, s"c${rng.nextInt(5)}")
      case 2 => TruncateTransform(rng.nextInt(40) + 1, s"c${rng.nextInt(5)}")
      case 3 => DayTransform(s"c${rng.nextInt(5)}")
    }
    (1 to 200).foreach { _ =>
      val hist = (0L to rng.nextInt(4).toLong).map(id =>
        id -> Seq.fill(rng.nextInt(3))(transform()).toSeq).toMap
      val enc = PartitionSpecCodec.encodeHistory(hist)
      assert(PartitionSpecCodec.decodeHistory(enc) == hist,
        s"history codec must round-trip: $hist via '$enc'")
    }
  }

  test("compaction migrates old-spec files to the current layout") {
    val dir = Files.createTempDirectory("graft-pevo-compact").toString
    FileTableCatalog.commitCas(dir, TableSnapshot(1, 1, 0, Nil))
    TableWrites.appendData(dir,
      (0L until 64L).map(i => (i, s"r${i % 3}")).toDF("id", "region").coalesce(1))
    new CommitManager(dir).evolvePartitionSpec(
      PartitionSpecCodec.decode("bucket:4:id"), expectedSchemaId = 1)
    graft.compaction.Compaction.builder()
      .withSpark(spark).withTableDir(dir)
      .withConfig(CompactionConfig(targetPartitions = 2))
      .build().compact()
    val snap = FileTableCatalog.loadOrThrow(dir)
    val data = snap.files.filter(_.content == "data")
    assert(data.nonEmpty)
    assert(data.forall(_.specId == PartitionSpecCodec.currentId(Some(snap))),
      s"compaction output must carry the current spec id, got " +
        s"${data.map(_.specId).distinct}")
    assert(data.forall(f => PartitionKey.parse(f.path).contains("id_bucket")),
      "compaction output must be laid out under the new spec")
  }

  test("dynamic overwrite refuses a mixed-spec table") {
    val dir = Files.createTempDirectory("graft-pevo-dyn").toString
    FileTableCatalog.commitCas(dir, TableSnapshot(1, 1, 0, Nil,
      properties = Map(PartitionSpecCodec.Property -> "identity:region")))
    TableWrites.appendData(dir,
      Seq((1L, "EU")).toDF("id", "region").coalesce(1))
    new CommitManager(dir).evolvePartitionSpec(
      PartitionSpecCodec.decode("bucket:4:id"), expectedSchemaId = 1)
    val e = intercept[CompactionError.Config] {
      new CommitManager(dir).overwritePartitions(
        Seq(FileEntry("/w/t/data/id_bucket=1.part-0-0.parquet", "data",
          1L, 1L, -1L)),
        Set("id_bucket=1"), p => Some("id_bucket=1"), expectedSchemaId = 1)
    }
    assert(e.getMessage.contains("spec-evolved"))
  }

  test("Iceberg catalog round-trips per-file spec ids") {
    val dir = Files.createTempDirectory("graft-pevo-ice").toString
    val tmp = Files.createTempDirectory("graft-pevo-ice-w").toString
    Seq((1L, "a")).toDF("id", "v").coalesce(1)
      .write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val f1 = s"$dir/data/f1.parquet"
    Files.createDirectories(java.nio.file.Paths.get(f1).getParent)
    Files.move(part.toPath, java.nio.file.Paths.get(f1))
    val hist = Map(
      0L -> PartitionSpecCodec.decode("identity:v"),
      1L -> PartitionSpecCodec.decode("bucket:4:id"))
    val sketch = {
      val acc = new NdvSketch.Acc
      (1L to 10L).foreach(v => acc.add(NdvSketch.hashLong(v)))
      acc.serialize
    }
    IcebergTableCatalog.commitCas(dir, TableSnapshot(1, 1, 1,
      files = Seq(
        FileEntry(f1, "data", new java.io.File(f1).length(), 1L,
          sequenceNumber = 1, specId = 0L,
          ndvSketch = Map("id" -> sketch))),
      properties = Map(
        PartitionSpecCodec.Property -> "bucket:4:id",
        PartitionSpecCodec.IdProperty -> "1",
        PartitionSpecCodec.HistoryProperty -> PartitionSpecCodec.encodeHistory(hist))))
    val loaded = IcebergTableCatalog.loadOrThrow(dir)
    assert(loaded.files.head.specId == 0L,
      s"non-current spec id must round-trip, got ${loaded.files.head.specId}")
    assert(PartitionSpecCodec.currentId(Some(loaded)) == 1L)
    assert(PartitionSpecCodec.history(Some(loaded)) == hist)
    // write-time NDV sketches survive the iceberg-format round-trip
    // too (else the feature would be silently inert on these tables)
    assert(loaded.files.head.ndvSketch == Map("id" -> sketch))
    assert(TableAnalyze.sketchNdv(loaded) == Map("id" -> 10L))
  }
}
