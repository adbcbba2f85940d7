package graft.io

import graft.core.{DataFileMeta, RetryConfig}
import graft.txn.{CommitManager, TableMetadata, TableSnapshot}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

/** The store-native conditional-put seam, end-to-end: an in-memory
  * object-store fake registered via [[FileIO.registerConditionalPut]]
  * carries REAL snapshot commits. The fake's only atomic primitive is a
  * map `putIfAbsent` — exactly the contract of S3 `If-None-Match: *` /
  * GCS `x-goog-if-generation-match: 0` — and its disk write is a plain
  * non-atomic PUT, so exactly-one-winner must come from the conditional
  * check alone, never from rename/hard-link atomicity. This is the
  * integration point an S3/GCS deployment implements (the reference
  * delegates the same responsibility to its catalog,
  * `/root/reference/core/src/compaction/mod.rs:530-614`). */
class ConditionalPutSpec extends AnyFunSuite {

  /** Object-store semantics distilled: one atomic reservation per key,
    * then an unconditional write. Throws [[FileIO.AlreadyExists]] on a
    * lost reservation, like a 412 Precondition Failed. */
  private final class MemStorePut extends FileIO.ConditionalPut {
    val puts = new AtomicInteger(0)
    val conflicts = new AtomicInteger(0)
    private val reserved = new ConcurrentHashMap[String, java.lang.Boolean]()
    // rendezvous: when armed, the next TWO putIfAbsent calls wait for
    // each other before reserving. At race start every committer
    // attempts the same next-version key, so the pair is guaranteed to
    // contend — one organic AlreadyExists per run, no scheduler luck
    // (an unforced 8-way race CAN legally serialize with zero
    // conflicts, which made the organic-conflict assert flaky before).
    private val gatePasses = new AtomicInteger(0)
    private val gate = new java.util.concurrent.CyclicBarrier(2)
    def armGate(): Unit = gatePasses.set(2)
    override def putIfAbsent(path: String, content: Array[Byte]): Unit = {
      if (gatePasses.getAndDecrement() > 0) {
        try gate.await(30, java.util.concurrent.TimeUnit.SECONDS)
        catch { case _: Exception => () } // never deadlock the test
      }
      if (reserved.putIfAbsent(path, java.lang.Boolean.TRUE) != null) {
        conflicts.incrementAndGet()
        throw new FileIO.AlreadyExists(path)
      }
      val p = Paths.get(path)
      Files.createDirectories(p.getParent)
      Files.write(p, content) // plain PUT: no rename, no link, no fsync
      puts.incrementAndGet()
    }
  }

  test("racing committers: the conditional put alone yields one winner per version") {
    val dir = Files.createTempDirectory("graft-condput").toString
    val fake = new MemStorePut
    // local paths have no URI scheme -> casCreate routes them to the
    // "file" registration; every commit below goes through the fake
    FileIO.registerConditionalPut("file", fake)
    try {
      TableMetadata.commit(dir, TableSnapshot(1, 1, 0, Nil))
      assert(fake.puts.get() == 1, "bootstrap commit must route through the seam")
      fake.armGate() // next two puts rendezvous -> guaranteed contention
      val threads = 8
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val results = (0 until threads).map { i =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean =
            try {
              new CommitManager(dir,
                RetryConfig(maxRetries = 30, minDelayMs = 1, maxDelayMs = 5))
                .rewriteFiles(Seq(DataFileMeta(s"/t/c$i.parquet", 1, 1, -1)),
                  Set.empty, 1, 5)
              true
            } catch { case _: Throwable => false }
        })
      }
      pool.shutdown()
      val ok = results.map(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
      assert(ok.forall(identity), "every committer should win a version")
      val snap = TableMetadata.loadOrThrow(dir)
      assert(snap.version == 9L, "8 racing appends over v1 must land v2..v9")
      val paths = snap.files.map(_.path).toSet
      (0 until threads).foreach(i => assert(paths.contains(s"/t/c$i.parquet"),
        s"committer $i's file must survive the race"))
      // the seam did the arbitration: 9 winning puts (bootstrap + 8
      // versions), and the armed rendezvous guarantees the conflict
      // path ran ORGANICALLY (two live committers, same version key,
      // one 412) — not just via the duplicate-reservation probe below
      assert(fake.puts.get() == 9,
        s"expected 9 winning puts, got ${fake.puts.get()}")
      assert(fake.conflicts.get() >= 1,
        "the rendezvoused pair must produce at least one organic " +
          s"AlreadyExists (got ${fake.conflicts.get()})")
      info(s"organic put conflicts observed during the race: " +
        s"${fake.conflicts.get()}")
      val probe = s"$dir/condput-probe"
      fake.putIfAbsent(probe, Array[Byte](1))
      intercept[FileIO.AlreadyExists] {
        fake.putIfAbsent(probe, Array[Byte](2))
      }
    } finally FileIO.unregisterConditionalPut("file")
  }

  test("casCreate falls back to local atomics when no put is registered") {
    val dir = Files.createTempDirectory("graft-condput-fb").toString
    val target = s"$dir/v1.json"
    FileIO.casCreate(target, "{}")
    intercept[FileIO.AlreadyExists] { FileIO.casCreate(target, "{}") }
  }
}
