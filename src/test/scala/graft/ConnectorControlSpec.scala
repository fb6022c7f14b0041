package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{ConnectorControl, KafkaCdc}

/** ConnectorControl against an in-process fake Kafka Connect REST
  * endpoint (the HttpStreamLoad fake-FE pattern) — walks the
  * reference's register-debezium.sh loop: register → status → pause →
  * resume → delete, plus the register→Spark-source translation, and
  * the named error surfaces (409 duplicate, 404 unknown).
  */
class ConnectorControlSpec extends AnyFunSuite {

  // name -> config JSON object text; paused set tracked separately
  private val connectors = new ConcurrentHashMap[String, Map[String, String]]()
  private val paused = ConcurrentHashMap.newKeySet[String]()

  private def respond(x: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes(StandardCharsets.UTF_8)
    if (b.isEmpty) x.sendResponseHeaders(code, -1)
    else { x.sendResponseHeaders(code, b.length) }
    if (b.nonEmpty) x.getResponseBody.write(b)
    x.close()
  }

  private def jstr(m: Map[String, String]): String =
    m.map { case (k, v) => s""""$k": "$v"""" }.mkString("{", ", ", "}")

  private lazy val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/connectors", { x =>
      val path = x.getRequestURI.getPath.stripPrefix("/connectors")
        .stripPrefix("/")
      (x.getRequestMethod, path.split("/").filter(_.nonEmpty).toList) match {
        case ("POST", Nil) =>
          val body = new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          import org.json4s._
          import org.json4s.jackson.JsonMethods
          val root = JsonMethods.parse(body)
          val name = (root \ "name").asInstanceOf[JString].s
          val cfg = (root \ "config") match {
            case JObject(fs) => fs.collect { case (k, JString(v)) => k -> v }.toMap
            case _ => Map.empty[String, String]
          }
          if (connectors.putIfAbsent(name, cfg) != null)
            respond(x, 409, s"""{"error_code":409,"message":"Connector $name already exists"}""")
          else
            respond(x, 201, s"""{"name": "$name", "config": ${jstr(cfg)}, "tasks": []}""")
        case ("GET", Nil) =>
          respond(x, 200, connectors.keySet().toArray.map(n => s""""$n"""").mkString("[", ",", "]"))
        case ("GET", name :: "status" :: Nil) if connectors.containsKey(name) =>
          val st = if (paused.contains(name)) "PAUSED" else "RUNNING"
          respond(x, 200,
            s"""{"name":"$name","connector":{"state":"$st","worker_id":"w:1"},
               |"tasks":[{"id":0,"state":"$st","worker_id":"w:1"}]}""".stripMargin)
        case ("GET", name :: "config" :: Nil) if connectors.containsKey(name) =>
          respond(x, 200, jstr(connectors.get(name)))
        case ("PUT", name :: "pause" :: Nil) if connectors.containsKey(name) =>
          paused.add(name); respond(x, 202, "")
        case ("PUT", name :: "resume" :: Nil) if connectors.containsKey(name) =>
          paused.remove(name); respond(x, 202, "")
        case ("DELETE", name :: Nil) if connectors.containsKey(name) =>
          connectors.remove(name); paused.remove(name); respond(x, 204, "")
        case (_, name :: _) if !connectors.containsKey(name) =>
          respond(x, 404, s"""{"error_code":404,"message":"Connector $name not found"}""")
        case _ => respond(x, 405, "")
      }
    })
    s.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(2))
    s.start(); s
  }

  private def control =
    new ConnectorControl(s"http://127.0.0.1:${server.getAddress.getPort}")

  // the reference's debezium-connector.json shape
  private val connectorJson =
    """{"name": "mysql-connector",
      |  "config": {
      |    "connector.class": "io.debezium.connector.mysql.MySqlConnector",
      |    "topic.prefix": "srv",
      |    "database.include.list": "inventory",
      |    "table.include.list": "inventory.orders,inventory.customers",
      |    "snapshot.mode": "initial"
      |}}""".stripMargin

  test("register -> status -> pause -> resume -> delete walks the reference loop") {
    connectors.clear(); paused.clear()
    val c = control
    assert(c.register(connectorJson) == "mysql-connector")
    assert(c.list() == Seq("mysql-connector"))
    val st = c.status("mysql-connector")
    assert(st.running && st.state == "RUNNING" && st.taskStates == Seq("RUNNING"))
    c.pause("mysql-connector")
    val p = c.status("mysql-connector")
    assert(!p.running && p.state == "PAUSED")
    c.resume("mysql-connector")
    assert(c.status("mysql-connector").running)
    c.delete("mysql-connector")
    assert(c.list().isEmpty)
  }

  test("registered config translates to the same Spark source options as the direct path") {
    connectors.clear(); paused.clear()
    val c = control
    c.register(connectorJson)
    val viaRest = c.sourceConfig("mysql-connector", brokers = "k1:9092,k2:9092")
    // the KafkaCdcSpec-established direct translation of the same map
    val direct = KafkaCdc.fromConnectorConfig(Map(
      "topic.prefix" -> "srv",
      "table.include.list" -> "inventory.orders,inventory.customers",
      "snapshot.mode" -> "initial"), brokers = "k1:9092,k2:9092")
    assert(viaRest.sourceOptions == direct.sourceOptions)
    assert(viaRest.sourceOptions("subscribe") ==
      "srv.inventory.orders,srv.inventory.customers")
    assert(viaRest.sourceOptions("startingOffsets") == "earliest")
    c.delete("mysql-connector")
  }

  test("409 duplicate register and 404 unknown connector are named errors") {
    connectors.clear(); paused.clear()
    val c = control
    c.register(connectorJson)
    val dup = intercept[ConnectorControl.RestError](c.register(connectorJson))
    assert(dup.code == 409 && dup.body.contains("already exists"))
    val gone = intercept[ConnectorControl.RestError](c.status("nope"))
    assert(gone.code == 404)
    c.delete("mysql-connector")
    val del = intercept[ConnectorControl.RestError](c.delete("mysql-connector"))
    assert(del.code == 404)
  }
}
