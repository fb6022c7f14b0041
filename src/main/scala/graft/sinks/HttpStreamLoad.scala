package graft.sinks

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.util.Base64

/** Real Stream Load HTTP transport: the actual wire protocol the
  * reference's Routine Load drives into StarRocks
  * (/root/reference/create-routine-load.sh:1-40 configures it;
  * create-starrocks-tables.sh:1-51 creates the PK tables it lands in).
  *
  * Protocol (public StarRocks/Doris Stream Load API):
  *  - `PUT {fe}/api/{db}/{table}/_stream_load` with a `label` header
  *    (idempotency key), `Authorization: Basic`, and format headers
  *    (`format: json`, `strip_outer_array`, ...);
  *  - the FE answers **307 Temporary Redirect** to a BE's address; the
  *    client re-PUTs the SAME body and headers to the redirect target
  *    (redirects are followed manually — labels must not be consumed
  *    by a client that silently drops the body on redirect);
  *  - the BE answers 200 with a JSON body whose `Status` field decides
  *    the outcome: `Success` / `Publish Timeout` → loaded;
  *    `Label Already Exists` with `ExistingJobStatus: FINISHED` → a
  *    retry of an already-applied chunk, ALSO success (this is what
  *    makes at-least-once delivery exactly-once per label); anything
  *    else → failure.
  *  - transient failures (IOException, HTTP 5xx) retry with backoff
  *    under the SAME label, so the server-side label dedup — not the
  *    client — guarantees each chunk lands once.
  *
  * Serializable by construction (config only); the HttpClient is
  * per-JVM lazy state, so each executor builds one client and reuses
  * it across chunks. Plugs into [[StarRocksSink.write]] unchanged:
  * `StarRocksSink.write(df, label, HttpStreamLoad(url, db, tbl).transport)`.
  */
final case class HttpStreamLoad(
    feUrl: String, db: String, table: String,
    user: String = "root", password: String = "",
    formatHeaders: Map[String, String] =
      Map("format" -> "json", "strip_outer_array" -> "false"),
    maxAttempts: Int = 4, backoffMs: Long = 200L,
    maxRedirects: Int = 3, timeoutMs: Long = 60000L) extends Serializable {
  require(maxAttempts >= 1 && maxRedirects >= 0)

  def transport: StarRocksSink.Transport = (label, payload) => send(label, payload)

  /** Ship one chunk; throws after `maxAttempts` failed attempts. */
  def send(label: String, payload: String): Unit = {
    val body = payload.getBytes(StandardCharsets.UTF_8)
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt < maxAttempts) {
      attempt += 1
      try {
        val resp = putFollowingRedirects(
          s"${feUrl.stripSuffix("/")}/api/$db/$table/_stream_load", label, body)
        if (resp.statusCode() / 100 == 5)
          throw new java.io.IOException(s"HTTP ${resp.statusCode()} from ${resp.uri()}")
        val status = jsonField(resp.body(), "Status").getOrElse(
          throw new IllegalStateException(
            s"stream load response has no Status: ${resp.body().take(200)}"))
        status match {
          case "Success" | "Publish Timeout" => return
          case "Label Already Exists"
            if jsonField(resp.body(), "ExistingJobStatus").contains("FINISHED") =>
            return // retried chunk already applied — exactly-once by label
          case other => throw new IllegalStateException(
            s"stream load $label failed: Status=$other " +
              s"${jsonField(resp.body(), "Message").getOrElse("")}")
        }
      } catch {
        case e: java.io.IOException =>
          lastErr = e
          if (attempt < maxAttempts)
            Thread.sleep(backoffMs * (1L << math.min(attempt - 1, 4)))
      }
    }
    throw new java.io.IOException(
      s"stream load $label: $maxAttempts attempts failed", lastErr)
  }

  private def putFollowingRedirects(url: String, label: String,
                                    body: Array[Byte]): HttpResponse[String] = {
    var target = url
    var hops = 0
    while (true) {
      val req = HttpRequest.newBuilder(URI.create(target))
        .timeout(java.time.Duration.ofMillis(timeoutMs))
        .header("Authorization", "Basic " + Base64.getEncoder.encodeToString(
          s"$user:$password".getBytes(StandardCharsets.UTF_8)))
        .header("label", label)
      formatHeaders.foreach { case (k, v) => req.header(k, v) }
      val resp = HttpStreamLoad.client.send(
        req.PUT(HttpRequest.BodyPublishers.ofByteArray(body)).build(),
        HttpResponse.BodyHandlers.ofString())
      resp.statusCode() match {
        case 307 | 308 | 301 | 302 =>
          hops += 1
          if (hops > maxRedirects)
            throw new java.io.IOException(s"stream load $label: too many redirects")
          target = resp.headers().firstValue("Location").orElseThrow(() =>
            new java.io.IOException(s"redirect without Location from $target"))
        case _ => return resp
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Minimal extraction of a top-level string field from the (flat)
    * Stream Load response JSON — enough for Status / ExistingJobStatus /
    * Message; a full parser is overkill for a fixed flat protocol. */
  private def jsonField(json: String, field: String): Option[String] = {
    val m = java.util.regex.Pattern
      .compile("\"" + java.util.regex.Pattern.quote(field) + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"")
      .matcher(json)
    if (m.find()) Some(m.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
    else None
  }
}

object HttpStreamLoad {
  // one client per JVM (executor), shared by every transport instance
  private lazy val client: HttpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NEVER) // manual: body must re-send
    .build()
}
