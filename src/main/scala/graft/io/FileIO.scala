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
  *  - any other scheme: `FileSystem.create(path, overwrite = false)` — an
  *    atomic create-if-absent claim on HDFS; on object stores this is the
  *    closest primitive the Hadoop API exposes (a true conditional-put —
  *    S3 `If-None-Match` — needs a store-specific client; slot it in here
  *    when deploying against a store that races committers).
  */
object FileIO {

  /** Hadoop conf: the active Spark session's (so `spark.hadoop.*` settings
    * apply) or a fresh default outside any session. */
  def hadoopConf: Configuration =
    SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  def fs(p: Path): FileSystem = p.getFileSystem(hadoopConf)
  def fs(p: String): FileSystem = fs(new Path(p))

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
      .map(s => (s.getPath.toUri.getPath, s.getLen))
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
        if (s.isFile) out += ((s.getPath.toUri.getPath, s.getLen))
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
      .map(_.getPath.toUri.getPath)
  }

  def mkdirs(dir: String): Unit = {
    val hp = new Path(dir)
    fs(hp).mkdirs(hp)
  }

  /** Error raised when [[casCreate]] loses the create-if-absent race. */
  final class AlreadyExists(val path: String, cause: Throwable = null)
      extends RuntimeException(s"target already exists: $path", cause)

  /** Atomically create `target` with `content` iff it does not exist.
    * Throws [[AlreadyExists]] when another writer got there first. */
  def casCreate(target: String, content: String): Unit = {
    val hp = new Path(target)
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
      // remote: create-if-absent (atomic on HDFS; best-available on object
      // stores until a conditional-put client is wired in)
      val out =
        try f.create(hp, false)
        catch {
          case e: org.apache.hadoop.fs.FileAlreadyExistsException =>
            throw new AlreadyExists(target, e)
          case e: java.io.IOException if f.exists(hp) =>
            throw new AlreadyExists(target, e)
        }
      try out.write(content.getBytes(StandardCharsets.UTF_8))
      finally out.close()
    }
  }
}
