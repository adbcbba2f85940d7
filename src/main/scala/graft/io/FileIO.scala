package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.collection.mutable.ArrayBuffer

/** File IO behind one interface, resolved per-path through Hadoop
  * [[FileSystem]] — the analog of the reference's `FileIO` abstraction
  * (core/src/executor/mod.rs:38-45; S3/GCS features Cargo.toml:17-21).
  * Every metadata/commit/listing path in the engine goes through here, so
  * `s3a://`, `hdfs://`, `gs://` and plain local paths all work wherever
  * the classpath carries the scheme's connector.
  *
  * Atomic publish (the CAS primitive under snapshot commits):
  *  - local filesystem: POSIX hard `link()` of a fully-written temp file —
  *    fails with EEXIST when the target exists (a rename would silently
  *    REPLACE it, letting a losing concurrent committer overwrite the
  *    winner's snapshot);
  *  - any other scheme: fully-written temp sibling + no-replace rename —
  *    atomic claim on HDFS (rename refuses an existing destination), and
  *    readers can never observe a torn/empty snapshot. On object stores
  *    rename is copy-based; a true conditional-put (S3 `If-None-Match`)
  *    needs a store-specific client — slot it in here when deploying
  *    against a store that races committers.
  */
object FileIO {

  /** Hadoop conf: the active Spark session's (so `spark.hadoop.*` settings
    * apply) or a fresh default outside any session. Cached per session
    * instance — building it copies every session conf entry, and callers
    * like the exact writer's publish loop hit this once per file.
    * (Session conf changes made AFTER the first IO call are not picked
    * up; commit-path IO settings belong in the session builder.) */
  @volatile private var cachedConf: (AnyRef, Configuration) = null
  /** Drop the cached conf (tests that mutate hadoop settings mid-session). */
  private[graft] def invalidateConfCache(): Unit = cachedConf = null
  def hadoopConf: Configuration = {
    val s = SparkSession.getActiveSession.orNull
    val c = cachedConf
    if (c != null && (c._1 eq s)) c._2
    else {
      val conf =
        if (s != null) s.sessionState.newHadoopConf() else new Configuration()
      cachedConf = (s, conf)
      conf
    }
  }

  def fs(p: Path): FileSystem = p.getFileSystem(hadoopConf)
  def fs(p: String): FileSystem = fs(new Path(p))

  /** The driver's hadoop conf as a SERIALIZABLE entry array — ship this
    * to executor-side readers/writers and rebuild with [[confFrom]]: a
    * bare `new Configuration()` in a task lacks the session's
    * `spark.hadoop.*` settings (object-store credentials, endpoints),
    * silently breaking non-local table dirs. Configuration itself is
    * not serializable; its entries are. */
  def hadoopConfEntries(): Array[(String, String)] = {
    import scala.jdk.CollectionConverters._
    hadoopConf.iterator().asScala.map(e => (e.getKey, e.getValue)).toArray
  }

  /** Rebuild a Configuration from [[hadoopConfEntries]] output. */
  def confFrom(entries: Array[(String, String)]): Configuration = {
    val c = new Configuration(false)
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }

  private def isLocal(p: Path): Boolean = {
    val scheme = Option(p.toUri.getScheme)
    scheme.isEmpty || scheme.contains("file")
  }

  /** Strip a `file:` prefix to a raw local path for java.nio operations. */
  private def localPath(p: Path): java.nio.file.Path =
    Paths.get(p.toUri.getPath match {
      case null => p.toString
      case s    => s
    })

  /** Listing-result path as a string usable for BOTH metadata round-trips
    * and re-reads: local paths come back bare (`/a/b` — comparable to
    * task paths and `_metadata.file_path` after normalization), while
    * remote paths KEEP their scheme and authority (`s3a://bucket/a/b` —
    * stripping them would resolve later reads against the default FS). */
  private def pathString(p: Path): String =
    if (isLocal(p)) p.toUri.getPath else p.toString

  def exists(p: String): Boolean = {
    val hp = new Path(p)
    fs(hp).exists(hp)
  }

  /** Non-recursive listing of plain files directly under `dir` (empty when
    * the directory does not exist). */
  def listFiles(dir: String): Seq[(String, Long)] = {
    val hp = new Path(dir)
    val f = fs(hp)
    if (!f.exists(hp)) Nil
    else f.listStatus(hp).toSeq
      .filter(_.isFile)
      .map(s => (pathString(s.getPath), s.getLen))
  }

  /** Recursive listing of plain files under `dir`, sorted by path. */
  def listFilesRecursive(dir: String): Seq[(String, Long)] = {
    val hp = new Path(dir)
    val f = fs(hp)
    if (!f.exists(hp)) Nil
    else {
      val out = ArrayBuffer.empty[(String, Long)]
      val it = f.listFiles(hp, true)
      while (it.hasNext) {
        val s = it.next()
        if (s.isFile) out += ((pathString(s.getPath), s.getLen))
      }
      out.sortBy(_._1).toSeq
    }
  }

  /** Recursive listing with modification times, sorted by path —
    * orphan-file cleanup needs the mtime to honor its grace period. */
  def listFilesWithMtime(dir: String): Seq[(String, Long, Long)] = {
    val hp = new Path(dir)
    val f = fs(hp)
    if (!f.exists(hp)) Nil
    else {
      val out = ArrayBuffer.empty[(String, Long, Long)]
      val it = f.listFiles(hp, true)
      while (it.hasNext) {
        val s = it.next()
        if (s.isFile)
          out += ((pathString(s.getPath), s.getLen, s.getModificationTime))
      }
      out.sortBy(_._1).toSeq
    }
  }

  def readString(p: String): String = {
    val hp = new Path(p)
    val in = new BufferedReader(
      new InputStreamReader(fs(hp).open(hp), StandardCharsets.UTF_8))
    try {
      val sb = new StringBuilder
      val buf = new Array[Char](8192)
      var n = in.read(buf)
      while (n >= 0) { sb.appendAll(buf, 0, n); n = in.read(buf) }
      sb.toString
    } finally in.close()
  }

  /** Plain (non-CAS) overwrite write. */
  def writeString(p: String, content: String): Unit = {
    val hp = new Path(p)
    val out = fs(hp).create(hp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Plain overwrite write of raw bytes (deletion-vector Puffin files —
    * binary container, not text). `conf` must be passed on EXECUTORS
    * (see [[readBytesRange]]). */
  def writeBytes(p: String, content: Array[Byte],
      conf: Configuration = null): Unit = {
    val hp = new Path(p)
    val out = (if (conf == null) fs(hp) else hp.getFileSystem(conf))
      .create(hp, true)
    try out.write(content)
    finally out.close()
  }

  /** Ranged read: exactly `length` bytes starting at `offset`. The read
    * is positioned (`readFully`), so a task fetching one deletion-vector
    * blob out of a shared Puffin file pulls only its own byte range —
    * never the whole file. `conf` must be passed on EXECUTORS (rebuilt
    * via [[confFrom]]) — there is no active session there, so the
    * default conf lacks object-store credentials. */
  def readBytesRange(p: String, offset: Long, length: Int,
      conf: Configuration = null): Array[Byte] = {
    val hp = new Path(p)
    val in = (if (conf == null) fs(hp) else hp.getFileSystem(conf)).open(hp)
    try {
      val buf = new Array[Byte](length)
      in.readFully(offset, buf, 0, length)
      buf
    } finally in.close()
  }

  def delete(p: String): Boolean = {
    val hp = new Path(p)
    fs(hp).delete(hp, false)
  }

  def deleteRecursive(p: String): Boolean = {
    val hp = new Path(p)
    fs(hp).delete(hp, true)
  }

  /** Move `src` to `dst` (same filesystem). */
  def rename(src: String, dst: String): Boolean = {
    val s = new Path(src)
    fs(s).rename(s, new Path(dst))
  }

  def fileLength(p: String): Long = {
    val hp = new Path(p)
    fs(hp).getFileStatus(hp).getLen
  }

  /** Non-recursive listing of directories directly under `dir`. */
  def listDirectories(dir: String): Seq[String] = {
    val hp = new Path(dir)
    val f = fs(hp)
    if (!f.exists(hp)) Nil
    else f.listStatus(hp).toSeq.filter(_.isDirectory)
      .map(p => pathString(p.getPath))
  }

  def mkdirs(dir: String): Unit = {
    val hp = new Path(dir)
    fs(hp).mkdirs(hp)
  }

  /** Error raised when [[casCreate]] loses the create-if-absent race. */
  final class AlreadyExists(val path: String, cause: Throwable = null)
      extends RuntimeException(s"target already exists: $path", cause)

  /** Store-native conditional put: a TRUE atomic create-if-absent the
    * way the target store implements it — S3 `If-None-Match: *`, GCS
    * `x-goog-if-generation-match: 0`, Azure `If-None-Match: *`. The
    * Hadoop FileSystem API cannot express these (its rename is
    * copy-then-delete on object stores, so the no-replace rename below
    * is only best-effort there); a deployment that genuinely races
    * committers against an object store registers one of these per URI
    * scheme and every snapshot commit in the engine goes through it.
    * (The reference delegates the same responsibility to its catalog,
    * core/src/compaction/mod.rs:530-614.) */
  trait ConditionalPut {
    /** Atomically create `path` with `content` iff absent; must throw
      * [[AlreadyExists]] when the object already exists. */
    def putIfAbsent(path: String, content: Array[Byte]): Unit
  }

  private val conditionalPuts =
    new java.util.concurrent.ConcurrentHashMap[String, ConditionalPut]()

  /** Register a store-native [[ConditionalPut]] for a URI scheme (e.g.
    * "s3a"); [[casCreate]] routes commits on that scheme through it. */
  def registerConditionalPut(scheme: String, impl: ConditionalPut): Unit =
    conditionalPuts.put(scheme, impl)
  def unregisterConditionalPut(scheme: String): Unit =
    conditionalPuts.remove(scheme)

  /** Atomically create `target` with `content` iff it does not exist.
    * Throws [[AlreadyExists]] when another writer got there first.
    * Resolution order: a registered store-native [[ConditionalPut]] for
    * the target's scheme, else POSIX hard-link (local), else no-replace
    * rename (atomic on HDFS, best-effort on object stores). */
  def casCreate(target: String, content: String): Unit = {
    val hp = new Path(target)
    val registered = conditionalPuts.get(
      Option(hp.toUri.getScheme).getOrElse("file"))
    if (registered != null) {
      registered.putIfAbsent(target, content.getBytes(StandardCharsets.UTF_8))
      return
    }
    val f = fs(hp)
    f.mkdirs(hp.getParent)
    if (isLocal(hp)) {
      // local: write a temp sibling, then atomic hard-link into place
      val dir = localPath(hp.getParent)
      Files.createDirectories(dir)
      val tmp = dir.resolve(
        s"${hp.getName}.${java.util.UUID.randomUUID()}.tmp")
      Files.writeString(tmp, content)
      try Files.createLink(localPath(hp), tmp)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new AlreadyExists(target)
        case e: java.nio.file.FileSystemException if Files.exists(localPath(hp)) =>
          throw new AlreadyExists(target, e)
      } finally Files.deleteIfExists(tmp)
    } else {
      // remote: write a FULLY-CLOSED temp sibling first, then claim the
      // target with a no-replace rename. Creating the target directly
      // would make a zero-length file visible to concurrent readers
      // before the content lands (a torn snapshot read). HDFS rename
      // refuses an existing destination (returns false) — the CAS; on
      // object stores rename is copy-based and a true conditional-put
      // client should replace this when committers genuinely race.
      val tmp = new Path(hp.getParent,
        s"${hp.getName}.${java.util.UUID.randomUUID()}.tmp")
      val out = f.create(tmp, true)
      try out.write(content.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      try {
        // fast-path conflict check first: some FileSystems (POSIX-backed)
        // implement rename as a silent REPLACE, which would let a loser
        // overwrite the winner — on those, this check is the (best-effort)
        // CAS; on HDFS the no-replace rename below is the atomic one
        if (f.exists(hp)) throw new AlreadyExists(target)
        if (!f.rename(tmp, hp)) {
          if (f.exists(hp)) throw new AlreadyExists(target)
          else throw new java.io.IOException(
            s"rename $tmp -> $target failed with no existing target")
        }
      } finally f.delete(tmp, false)
    }
  }
}
