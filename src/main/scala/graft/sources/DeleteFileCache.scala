package graft.sources

import java.lang.ref.SoftReference
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Per-JVM cache of PARSED delete-file content, so a delete file shared
  * by many scan tasks is read and decoded once per executor rather than
  * once per task.
  *
  * Rationale: with T data-file tasks sharing K delete files, the naive
  * per-task load is O(T×K) object-store reads and T duplicate in-memory
  * sets per executor. The reference reads each delete file once per
  * query — it registers the file as a named DataFusion table and
  * anti-joins it (`/root/reference/core/src/executor/datafusion/
  * datafusion_processor.rs:74-120`); Iceberg's Spark path ships an
  * executor-level delete cache for the same reason. On a 1000-executor
  * cluster this caps delete IO at (executors × K) instead of
  * (tasks × K), and tasks in the same JVM share one parsed set.
  *
  * Entries are [[SoftReference]]s — the JVM reclaims them under heap
  * pressure before OOMing, which is the right trade for a cache whose
  * ceiling is "every delete file an executor's tasks touch". Keys carry
  * the file's committed length as a staleness stamp: delete files are
  * immutable once committed (unique names per attempt), so path+length
  * identifies content; a replaced file (outside a commit, or a test
  * reusing a path) misses and reloads.
  *
  * Loading is single-flight per key: concurrent tasks hitting the same
  * cold file wait on one load instead of racing N parses. The loaded
  * values are probed concurrently by many tasks — they must never be
  * mutated after publication (the map's happens-before edge makes the
  * fully-built structure safe to share).
  */
private[graft] object DeleteFileCache {

  private final case class Key(path: String, stamp: Long, variant: String)

  private val cache = new ConcurrentHashMap[Key, SoftReference[AnyRef]]()
  private val inFlight = new ConcurrentHashMap[Key, Object]()

  /** Count of actual loads (cache misses) — observability for specs
    * asserting "≤ 1 parse per file per JVM". */
  private val missCount = new AtomicLong(0)

  def misses: Long = missCount.get()

  /** Drop everything (test isolation between suites). */
  def clear(): Unit = { cache.clear(); missCount.set(0) }

  /** Return the cached value for (path, stamp, variant), loading it at
    * most once per JVM across concurrent callers. `variant`
    * discriminates different PARSES of the same file (e.g. eq-delete
    * key sets typed by different schemas). */
  def getOrLoad[V <: AnyRef](path: String, stamp: Long, variant: String)(
      load: => V): V = {
    val key = Key(path, stamp, variant)
    val r0 = cache.get(key)
    val hit0 = if (r0 != null) r0.get() else null
    if (hit0 != null) return hit0.asInstanceOf[V]
    val lock = inFlight.computeIfAbsent(key, _ => new Object)
    try lock.synchronized {
      val r1 = cache.get(key)
      val hit1 = if (r1 != null) r1.get() else null
      if (hit1 != null) hit1.asInstanceOf[V]
      else {
        val v = load
        missCount.incrementAndGet()
        // opportunistic sweep of GC-cleared entries so the key map
        // itself cannot grow without bound across long sessions
        val it = cache.entrySet().iterator()
        while (it.hasNext) if (it.next().getValue.get() == null) it.remove()
        cache.put(key, new SoftReference[AnyRef](v))
        v
      }
    } finally inFlight.remove(key, lock)
  }
}
