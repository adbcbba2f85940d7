package graft.txn

import graft.SparkTestSession
import graft.core.{CompactionConfig, CompactionError, DataFileMeta, RetryConfig}
import org.scalatest.funsuite.AnyFunSuite

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap

/** The network catalog seam, end-to-end: a REST snapshot service
  * running in-JVM (`com.sun.net.httpserver` — no egress) carries REAL
  * engine traffic through [[RestTableCatalog]]: appends, a full
  * compaction, and an 8-way commit race arbitrated entirely by the
  * server's putIfAbsent. This is the shared-metastore deployment shape
  * the reference gets from plugging a REST iceberg-rust catalog into
  * `Arc<dyn Catalog>`. */
class RestTableCatalogSpec extends AnyFunSuite {

  /** Minimal REST snapshot service: (table, version) → JSON in a map;
    * commit arbitration = map putIfAbsent → 409 for losers. */
  private final class SnapshotServer {
    private val store = new ConcurrentHashMap[(String, Long), String]()
    val conflicts = new java.util.concurrent.atomic.AtomicInteger(0)
    private val VersionRe = """"version"\s*:\s*(\d+)""".r
    private val server =
      com.sun.net.httpserver.HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

    server.createContext("/v1/tables/", (ex: com.sun.net.httpserver.HttpExchange) => {
      def respond(code: Int, body: String): Unit = {
        val b = body.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length)
        if (b.nonEmpty) ex.getResponseBody.write(b)
        ex.close()
      }
      try {
        val segs = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty)
        // v1 / tables / {id} / snapshots [/ {version}]
        val table = new String(java.util.Base64.getUrlDecoder.decode(segs(2)),
          StandardCharsets.UTF_8)
        (ex.getRequestMethod, segs.length) match {
          case ("GET", 4) =>
            val vs = store.keySet().stream().filter(_._1 == table)
              .map[Long](_._2).sorted().toArray.mkString(",")
            respond(200, s"""{"versions":[$vs]}""")
          case ("GET", 5) =>
            Option(store.get((table, segs(4).toLong))) match {
              case Some(json) => respond(200, json)
              case None       => respond(404, "")
            }
          case ("POST", 4) =>
            val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
            val v = VersionRe.findFirstMatchIn(body).get.group(1).toLong
            if (store.putIfAbsent((table, v), body) != null) {
              conflicts.incrementAndGet(); respond(409, "version exists")
            } else respond(200, "")
          case ("DELETE", 5) =>
            if (store.remove((table, segs(4).toLong)) != null) respond(204, "")
            else respond(404, "")
          case _ => respond(400, "bad request")
        }
      } catch { case e: Throwable => respond(500, String.valueOf(e.getMessage)) }
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
    val base: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  private def withServer(f: (String, SnapshotServer) => Unit): Unit = {
    val s = new SnapshotServer
    try f(s.base, s) finally s.stop()
  }

  test("snapshot round-trip over HTTP: commit, load, versions, delete") {
    withServer { (base, _) =>
      val cat = new RestTableCatalog(base)
      val t = "/warehouse/db/orders"
      assert(cat.load(t).isEmpty && cat.versions(t).isEmpty)
      cat.commitCas(t, TableSnapshot(1, 1, 0, Nil))
      cat.commitCas(t, TableSnapshot(2, 1, 1,
        Seq(FileEntry("/warehouse/db/orders/data/a.parquet", "data", 10, 5, 1,
          specId = 3L, ndvSketch = Map("id" -> "AAAAAAAAAAE=")))))
      intercept[CompactionError.CommitConflict] {
        cat.commitCas(t, TableSnapshot(2, 1, 1, Nil))
      }
      assert(cat.versions(t) == Seq(1L, 2L))
      val cur = cat.loadOrThrow(t)
      assert(cur.version == 2L && cur.files.head.recordCount == 5L)
      // per-file spec ids and NDV sketches ride the snapshot JSON wire
      // format unchanged — layout evolution and append-surviving stats
      // work against a network catalog too
      assert(cur.files.head.specId == 3L)
      assert(cur.files.head.ndvSketch == Map("id" -> "AAAAAAAAAAE="))
      assert(cat.loadVersion(t, 1).exists(_.files.isEmpty))
      cat.deleteVersion(t, 1)
      assert(cat.versions(t) == Seq(2L))
      cat.deleteVersion(t, 1) // idempotent, like FileIO.delete
    }
  }

  test("8 racing committers: the server arbitrates one winner per version") {
    withServer { (base, srv) =>
      val cat = new RestTableCatalog(base)
      val t = "/warehouse/db/race"
      cat.commitCas(t, TableSnapshot(1, 1, 0, Nil))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      val results = (0 until 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean =
            try {
              new CommitManager(t,
                RetryConfig(maxRetries = 30, minDelayMs = 1, maxDelayMs = 5),
                catalog = cat)
                .rewriteFiles(Seq(DataFileMeta(s"/t/c$i.parquet", 1, 1, -1)),
                  Set.empty, 1, 5)
              true
            } catch { case _: Throwable => false }
        })
      }
      pool.shutdown()
      assert(results.map(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
        .forall(identity), "every committer should win a version")
      val snap = cat.loadOrThrow(t)
      assert(snap.version == 9L)
      val paths = snap.files.map(_.path).toSet
      (0 until 8).foreach(i => assert(paths.contains(s"/t/c$i.parquet")))
      assert(srv.conflicts.get() > 0, "the race should hit the 409 path")
    }
  }

  test("append + compaction run end-to-end with snapshots only in the REST service") {
    withServer { (base, _) =>
      val spark = SparkTestSession.spark
      import spark.implicits._
      val cat = new RestTableCatalog(base)
      val dir = Files.createTempDirectory("graft-rest-table").toString
      cat.commitCas(dir, TableSnapshot(1, 1, 0, Nil))
      TableWrites.appendData(dir,
        (1L to 500L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(2),
        catalog = cat)
      TableWrites.appendEqualityDeletes(dir,
        Seq(7L, 13L).toDF("id"), Seq("id"), catalog = cat)
      // NO metadata on disk: the table dir holds only data files
      assert(!new java.io.File(s"$dir/metadata").exists(),
        "snapshots must live in the service, not the table dir")
      graft.compaction.Compaction.builder()
        .withSpark(spark).withTableDir(dir)
        .withConfig(CompactionConfig(
          targetPartitions = 1, enableValidateCompaction = true))
        .withCatalog(cat)
        .build().compact()
      val rows = graft.sources.TableReader.read(spark, dir, catalog = cat)
        .as[(Long, String)].collect()
      assert(rows.length == 498)
      assert(!rows.exists(r => r._1 == 7L || r._1 == 13L))
    }
  }
}
