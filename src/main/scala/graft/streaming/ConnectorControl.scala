package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** Kafka Connect REST lifecycle client — the analogue of the reference
  * deployment's connector-management loop
  * (/root/reference/register-debezium.sh:1-26: POST the connector
  * JSON, poll /status, delete on teardown; Connect's standard REST
  * surface also carries pause/resume, used operationally between
  * those two). This is the first script a migrating user runs, so the
  * engine ships the same verbs over the same wire shapes:
  *
  *  - [[register]]   → POST /connectors            (201/200; 409 named)
  *  - [[status]]     → GET  /connectors/n/status   (connector + task states)
  *  - [[pause]]      → PUT  /connectors/n/pause    (202)
  *  - [[resume]]     → PUT  /connectors/n/resume   (202)
  *  - [[delete]]     → DELETE /connectors/n        (204)
  *  - [[list]]       → GET  /connectors
  *  - [[sourceConfig]] → GET /connectors/n/config, translated through
  *    [[KafkaCdc.fromConnectorConfig]] into the exact Spark
  *    `readStream.format("kafka")` options — register-then-wire is one
  *    call pair instead of a hand-copied topic list.
  *
  * Transport is the JDK HttpClient (no extra dependency); JSON rides
  * json4s, which ships with Spark. Errors surface as
  * [[ConnectorControl.RestError]] carrying the HTTP code and body —
  * a 409 duplicate-register or 404 unknown-connector is a named
  * condition, not a parse failure. Spec'd against an in-process fake
  * Connect endpoint (the HttpStreamLoad fake-FE pattern; the sandbox
  * has no live broker by design).
  */
object ConnectorControl {

  final case class RestError(code: Int, body: String, what: String)
      extends RuntimeException(s"$what failed: HTTP $code — ${body.take(300)}")

  /** `/status` result: connector state plus each task's state, the
    * two things register-debezium.sh's jq output surfaces. */
  final case class ConnectorStatus(name: String, state: String,
                                   taskStates: Seq[String]) {
    def running: Boolean =
      state == "RUNNING" && taskStates.forall(_ == "RUNNING")
  }
}

class ConnectorControl(baseUrl: String,
                       client: HttpClient = HttpClient.newHttpClient()) {
  import ConnectorControl._
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  private val base = baseUrl.stripSuffix("/")

  private def sendResp(what: String, req: HttpRequest,
                       okCodes: Set[Int]): HttpResponse[String] = {
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (!okCodes.contains(resp.statusCode()))
      throw RestError(resp.statusCode(), resp.body(), what)
    resp
  }

  private def send(what: String, req: HttpRequest,
                   okCodes: Set[Int]): String =
    sendResp(what, req, okCodes).body()

  private def req(path: String) =
    HttpRequest.newBuilder(URI.create(s"$base$path"))
      .header("Accept", "application/json")

  /** Connector names ride in URL path segments; a space or reserved
    * character would make URI.create throw IllegalArgumentException
    * instead of surfacing a clean RestError — percent-encode the
    * segment (URLEncoder is form-encoding, so its '+' must become
    * the path-legal "%20"). */
  private def enc(name: String): String =
    java.net.URLEncoder.encode(name, java.nio.charset.StandardCharsets.UTF_8)
      .replace("+", "%20")

  /** POST the connector-create JSON (`{"name": …, "config": {…}}`).
    * Returns the connector name from the response. 409 = already
    * exists (Connect's duplicate-register answer) surfaces as a
    * RestError with that code, not a silent overwrite. */
  def register(connectorJson: String): String = {
    val resp = sendResp("register",
      req("/connectors")
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(connectorJson)).build(),
      okCodes = Set(200, 201))
    JsonMethods.parse(resp.body()) \ "name" match {
      case JString(n) => n
      case _ =>
        // carry the server's ACTUAL status (200 vs 201), not a guess
        throw RestError(resp.statusCode(), resp.body(),
          "register (no name in response)")
    }
  }

  def list(): Seq[String] =
    JsonMethods.parse(send("list", req("/connectors").GET().build(), Set(200))) match {
      case JArray(vs) => vs.collect { case JString(s) => s }
      case _ => Nil
    }

  def status(name: String): ConnectorStatus = {
    val j = JsonMethods.parse(send("status",
      req(s"/connectors/${enc(name)}/status").GET().build(), Set(200)))
    val state = j \ "connector" \ "state" match {
      case JString(s) => s; case _ => "UNKNOWN"
    }
    val tasks = j \ "tasks" match {
      case JArray(ts) => ts.map(t => t \ "state" match {
        case JString(s) => s; case _ => "UNKNOWN"
      })
      case _ => Nil
    }
    ConnectorStatus(name, state, tasks)
  }

  def pause(name: String): Unit =
    send("pause", req(s"/connectors/${enc(name)}/pause")
      .PUT(HttpRequest.BodyPublishers.noBody()).build(), Set(200, 202))

  def resume(name: String): Unit =
    send("resume", req(s"/connectors/${enc(name)}/resume")
      .PUT(HttpRequest.BodyPublishers.noBody()).build(), Set(200, 202))

  def delete(name: String): Unit =
    send("delete", req(s"/connectors/${enc(name)}").DELETE().build(), Set(204))

  /** Fetch the registered connector's live config and translate it to
    * the Spark Kafka source options — the bridge from "connector is
    * registered" to "stream is reading the right topics from the
    * right offset". */
  def sourceConfig(name: String, brokers: String): KafkaCdc.Config = {
    val body = send("config", req(s"/connectors/${enc(name)}/config").GET().build(),
      Set(200))
    val cfg = JsonMethods.parse(body) match {
      case JObject(fields) => fields.collect { case (k, JString(v)) => k -> v }.toMap
      case _ => throw RestError(200, body, "config (not a JSON object)")
    }
    KafkaCdc.fromConnectorConfig(cfg, brokers)
  }
}
