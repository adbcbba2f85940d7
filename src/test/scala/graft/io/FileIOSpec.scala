package graft.io

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Local-disk FileSystem that answers for the `mock:` scheme, so the
  * NON-local FileIO code paths (temp+rename CAS, conflict detection)
  * execute for real without a remote cluster. */
class MockSchemeFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("mock:///")
}

/** FileIO behavior on both path families. */
class FileIOSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def mockDir(): String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.mock.impl", classOf[MockSchemeFs].getName)
    FileIO.invalidateConfCache()
    "mock:" + Files.createTempDirectory("fio-mock").toString
  }

  test("local CAS: create-if-absent via hard link") {
    val dir = Files.createTempDirectory("fio-local").toString
    FileIO.casCreate(s"$dir/v1.json", "winner")
    assert(FileIO.readString(s"$dir/v1.json") == "winner")
    intercept[FileIO.AlreadyExists] {
      FileIO.casCreate(s"$dir/v1.json", "loser")
    }
    assert(FileIO.readString(s"$dir/v1.json") == "winner")
    // no temp litter
    assert(FileIO.listFiles(dir).map(_._1).forall(!_.endsWith(".tmp")))
  }

  test("remote-scheme CAS: temp+rename publish, conflict keeps the winner") {
    val dir = mockDir()
    FileIO.casCreate(s"$dir/v1.json", "winner")
    assert(FileIO.readString(s"$dir/v1.json") == "winner")
    intercept[FileIO.AlreadyExists] {
      FileIO.casCreate(s"$dir/v1.json", "loser")
    }
    assert(FileIO.readString(s"$dir/v1.json") == "winner")
    assert(FileIO.listFiles(dir).map(_._1).forall(!_.endsWith(".tmp")))
  }

  test("registered conditional-put intercepts CAS for its scheme") {
    // an in-memory "object store" with true compare-and-swap — the
    // shape an S3 If-None-Match client implements behind the same seam
    val store = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
    FileIO.registerConditionalPut("condmock", new FileIO.ConditionalPut {
      override def putIfAbsent(path: String, content: Array[Byte]): Unit =
        if (store.putIfAbsent(path, content) != null)
          throw new FileIO.AlreadyExists(path)
    })
    try {
      FileIO.casCreate("condmock://bucket/t/v1.json", "first")
      // the winner's bytes landed in the store, not on any filesystem
      assert(new String(store.get("condmock://bucket/t/v1.json")) == "first")
      // a losing committer gets the conflict from the STORE's CAS
      intercept[FileIO.AlreadyExists] {
        FileIO.casCreate("condmock://bucket/t/v1.json", "second")
      }
      assert(new String(store.get("condmock://bucket/t/v1.json")) == "first")
      // other schemes are untouched by the registration
      val dir = Files.createTempDirectory("cas-other").toString
      FileIO.casCreate(s"$dir/v1.json", "local")
      assert(FileIO.readString(s"$dir/v1.json") == "local")
    } finally FileIO.unregisterConditionalPut("condmock")
  }

  test("remote-scheme listing, rename, length, delete round-trip") {
    val dir = mockDir()
    FileIO.mkdirs(dir)
    FileIO.writeString(s"$dir/a.txt", "aaaa")
    assert(FileIO.exists(s"$dir/a.txt"))
    assert(FileIO.fileLength(s"$dir/a.txt") == 4L)
    assert(FileIO.rename(s"$dir/a.txt", s"$dir/b.txt"))
    assert(!FileIO.exists(s"$dir/a.txt") && FileIO.exists(s"$dir/b.txt"))
    // (listFilesRecursive is exercised on the local family — RawLocal's
    // LocatedFileStatus eagerly loads permissions via `new File(uri)`,
    // which rejects the mock scheme; real remote FSs don't do that)
    assert(FileIO.listFiles(dir).map(_._2) == Seq(4L))
    assert(FileIO.delete(s"$dir/b.txt"))
    assert(FileIO.listFiles(dir).isEmpty)
  }
}
