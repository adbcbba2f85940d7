package graft.txn

import graft.core.CompactionError

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Network catalog client: snapshots live in a shared metastore behind
  * an HTTP service instead of the table's own directory. This is the
  * deployment seam the reference gets from `Arc<dyn Catalog>` accepting
  * any iceberg-rust catalog — REST, Glue, memory
  * (`/root/reference/core/src/compaction/mod.rs:53,176`); here the same
  * engine surface ([[graft.compaction.Compaction]], [[CommitManager]],
  * the DSv2 source/sinks) plugs a network catalog by constructor
  * injection, with data files still addressed by their object-store
  * paths.
  *
  * Protocol — JSON over HTTP, the Iceberg-REST-catalog commit shape
  * distilled to this engine's snapshot model; `{id}` is the
  * base64url-encoded table path (table paths contain '/', which no
  * URL-escaping survives the server's path normalization):
  *
  * {{{
  * GET    {base}/v1/tables/{id}/snapshots            -> {"versions":[1,2,...]}
  * GET    {base}/v1/tables/{id}/snapshots/{version}  -> snapshot JSON | 404
  * POST   {base}/v1/tables/{id}/snapshots            -> 200 | 409 version exists
  * DELETE {base}/v1/tables/{id}/snapshots/{version}  -> 200 | 404
  * }}}
  *
  * The SERVER arbitrates each commit — at most one winner per version,
  * answering 409 to losers (mapped to the retryable
  * [[CompactionError.CommitConflict]], so [[CommitManager]]'s backoff
  * loop reloads and retries exactly as with the filesystem CAS). The
  * client therefore needs NO filesystem atomicity at all, which is what
  * makes racing committers safe on object stores without native
  * conditional puts.
  *
  * A network failure during POST is indeterminate (the commit may have
  * landed server-side); it surfaces as non-retryable
  * [[CompactionError.Io]] so the caller re-inspects the table instead
  * of blindly re-committing the same version.
  */
final class RestTableCatalog(
    baseUri: String,
    requestTimeout: Duration = Duration.ofSeconds(30)
) extends TableCatalog {

  private val base = baseUri.stripSuffix("/")
  private val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(requestTimeout)
    .build()

  private def enc(table: String): String =
    java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString(table.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def req(url: String): HttpRequest.Builder =
    HttpRequest.newBuilder(URI.create(url)).timeout(requestTimeout)

  private def send(r: HttpRequest, what: String): HttpResponse[String] =
    try client.send(r, HttpResponse.BodyHandlers.ofString())
    catch {
      case e: java.io.IOException =>
        throw CompactionError.Io(s"catalog $what failed: ${e.getMessage}", e)
      case e: InterruptedException =>
        Thread.currentThread().interrupt()
        throw CompactionError.Io(s"catalog $what interrupted", e)
    }

  private def getOpt(url: String, what: String): Option[String] = {
    val resp = send(req(url).GET().build(), what)
    resp.statusCode() match {
      case 200 => Some(resp.body())
      case 404 => None
      case c => throw CompactionError.Io(s"catalog $what: HTTP $c ${resp.body()}")
    }
  }

  override def load(table: String): Option[TableSnapshot] =
    // current state = newest non-staged version (same contract as
    // TableMetadata.load; the staged-skip runs client-side, so a plain
    // snapshot store needs no WAP awareness)
    versions(table).reverseIterator
      .flatMap(loadVersion(table, _))
      .find(!Branch.isOutOfMain(_))

  override def commitCas(table: String, snapshot: TableSnapshot): Unit = {
    val url = s"$base/v1/tables/${enc(table)}/snapshots"
    val body = TableMetadata.snapshotToJson(snapshot)
    val resp = send(req(url)
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(), "commit")
    resp.statusCode() match {
      case 200 | 201 => ()
      case 409 => throw CompactionError.CommitConflict(
        s"snapshot v${snapshot.version} already exists (server-arbitrated)")
      case c => throw CompactionError.Io(
        s"catalog commit: HTTP $c ${resp.body()}")
    }
  }

  override def versions(table: String): Seq[Long] =
    getOpt(s"$base/v1/tables/${enc(table)}/snapshots", "versions") match {
      case None => Nil
      case Some(body) =>
        // {"versions":[...]} — extracted without a full mapper round
        // trip to keep the wire format explicit and minimal
        val m = RestTableCatalog.VersionsRe.findFirstMatchIn(body).getOrElse(
          throw CompactionError.Io(s"catalog versions: unparseable $body"))
        val inner = m.group(1).trim
        if (inner.isEmpty) Nil
        else inner.split(",").map(_.trim.toLong).toSeq.sorted
    }

  override def loadVersion(table: String, version: Long): Option[TableSnapshot] =
    getOpt(s"$base/v1/tables/${enc(table)}/snapshots/$version", s"load v$version")
      .map(TableMetadata.snapshotFromJson)

  override def deleteVersion(table: String, version: Long): Unit = {
    val resp = send(
      req(s"$base/v1/tables/${enc(table)}/snapshots/$version").DELETE().build(),
      s"delete v$version")
    resp.statusCode() match {
      case 200 | 204 | 404 => () // idempotent like FileIO.delete
      case c => throw CompactionError.Io(s"catalog delete: HTTP $c")
    }
  }
}

object RestTableCatalog {
  private val VersionsRe = """"versions"\s*:\s*\[([^\]]*)\]""".r
}
