package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sinks.{HttpStreamLoad, StarRocksSink}

/** D15: the real Stream Load HTTP transport against an in-process fake
  * StarRocks (JDK HttpServer): FE 307-redirect → BE accept, label
  * dedup, transient-failure retry — the full wire protocol minus the
  * database. */
class HttpStreamLoadSpec extends SparkSpec {
  import spark.implicits._

  // fake cluster state
  private val applied = new ConcurrentHashMap[String, String]() // label → payload
  private val beHits = new AtomicInteger(0)
  private val feHits = new AtomicInteger(0)
  private val dedupHits = new AtomicInteger(0)
  private val failNext = new AtomicBoolean(false)
  private val sawAuth = new AtomicBoolean(true)

  private def respond(x: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes(StandardCharsets.UTF_8)
    x.sendResponseHeaders(code, b.length)
    x.getResponseBody.write(b); x.close()
  }

  private lazy val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val port = () => s.getAddress.getPort
    // FE: redirect every load to the "BE" without consuming the body
    s.createContext("/api/", { x =>
      feHits.incrementAndGet()
      if (x.getRequestHeaders.getFirst("Authorization") == null) sawAuth.set(false)
      x.getResponseHeaders.add("Location",
        s"http://127.0.0.1:${port()}/be${x.getRequestURI.getPath}")
      x.sendResponseHeaders(307, -1); x.close()
    })
    // BE: apply the body once per label; an armed failNext dies with a
    // 500 BEFORE applying, so the client must retry under the same label
    s.createContext("/be/api/", { x =>
      beHits.incrementAndGet()
      val label = x.getRequestHeaders.getFirst("label")
      val body = new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      if (failNext.getAndSet(false))
        respond(x, 500, """{"Status":"Fail","Message":"injected"}""")
      else if (applied.putIfAbsent(label, body) != null) {
        dedupHits.incrementAndGet()
        respond(x, 200,
          """{"Status":"Label Already Exists","ExistingJobStatus":"FINISHED"}""")
      }
      else respond(x, 200,
        s"""{"TxnId":${beHits.get()},"Label":"$label","Status":"Success"}""")
    })
    s.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    s.start(); s
  }

  private def loader(maxAttempts: Int = 4) = HttpStreamLoad(
    feUrl = s"http://127.0.0.1:${server.getAddress.getPort}",
    db = "testdb", table = "orders", backoffMs = 10L, maxAttempts = maxAttempts)

  test("chunks land exactly once through FE redirect + BE accept") {
    applied.clear(); beHits.set(0); feHits.set(0)
    val df = (1 to 200).map(i => (i.toLong, s"n$i")).toDF("id", "name").repartition(4)
    val chunks = StarRocksSink.write(df, "loadA", loader().transport, maxChunkBytes = 1024)
    assert(chunks.toInt == applied.size)
    assert(applied.keySet().asScala.forall(_.startsWith("loadA-")))
    val lines = applied.values().asScala.toSeq.flatMap(_.linesIterator)
    assert(lines.size == 200 && lines.forall(_.contains("\"id\":")))
    assert(feHits.get() >= chunks, "every chunk goes through the FE redirect")
    assert(sawAuth.get(), "every FE request carried Basic auth")
  }

  test("a transient BE 500 retries under the same label and lands once") {
    applied.clear(); failNext.set(true)
    val df = Seq((1L, "x")).toDF("id", "name").coalesce(1)
    val chunks = StarRocksSink.write(df, "loadB", loader().transport)
    assert(chunks == 1L && applied.size == 1)
    assert(!failNext.get(), "injected failure was consumed")
  }

  test("a full re-run (task retry / job restart) dedupes by label") {
    applied.clear()
    val df = (1 to 50).map(i => (i.toLong, s"n$i")).toDF("id", "name").repartition(2)
    StarRocksSink.write(df, "loadC", loader().transport, maxChunkBytes = 512)
    val snapshot = new java.util.HashMap(applied)
    StarRocksSink.write(df, "loadC", loader().transport, maxChunkBytes = 512) // replay
    assert(applied == snapshot, "replayed chunks must not re-apply")
  }

  test("streaming CDC pipeline lands on the HTTP endpoint end to end") {
    // the reference's full shape: envelope stream → keyed upsert state
    // → labeled Stream Load over the REAL wire protocol
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    applied.clear()
    implicit val sqlCtx = spark.sqlContext
    val payload = StructType(Seq(
      StructField("id", LongType), StructField("seq", LongType),
      StructField("v", StringType)))
    def env(id: Long, seq: Long, v: String, op: String, tsMs: Long): String = {
      val img = s"""{"id":$id,"seq":$seq,"v":"$v"}"""
      val (b, a) = if (op == "d") (img, "null") else ("null", img)
      s"""{"before":$b,"after":$a,"op":"$op","ts_ms":$tsMs}"""
    }
    val input = MemoryStream[String]
    input.addData(
      env(1, 1, "a", "c", 100), env(1, 2, "a2", "u", 200),
      env(2, 1, "b", "c", 100))
    val cfg = CdcPipeline.Config(payload, keyField = "id", seqField = "seq")
    val states = CdcPipeline.stream(
      input.toDF().withColumnRenamed("value", "json"), "json", cfg)
    val q = CdcPipeline.toStreamLoadSink(states, "e2e", loader().transport)
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val lines = applied.values().asScala.toSeq.flatMap(_.linesIterator)
    // latest-wins state per key: key 1 at seq 2 ("a2"), key 2 at seq 1
    // (the payload rides as an escaped JSON string inside the row)
    assert(lines.size == 2, s"expected 2 state rows, got: $lines")
    assert(lines.exists(l => l.contains("\"key\":1") && l.contains("a2")) &&
      lines.exists(l => l.contains("\"key\":2")))
    assert(applied.keySet().asScala.forall(_.startsWith("e2e-b")))
  }

  test("exactly-once across a crash between the sink PUT and the checkpoint commit") {
    // the production question: the batch's PUTs succeeded, the process
    // died BEFORE Structured Streaming wrote commits/<epoch> — on
    // restart the engine replays the same epoch, foreachBatch re-ships
    // the same labels, and the server's label dedup (not the client)
    // keeps the table exactly-once
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    applied.clear()
    implicit val sqlCtx = spark.sqlContext
    val payload = StructType(Seq(
      StructField("id", LongType), StructField("seq", LongType),
      StructField("v", StringType)))
    def env(id: Long, seq: Long, v: String): String =
      s"""{"before":null,"after":{"id":$id,"seq":$seq,"v":"$v"},"op":"c","ts_ms":100}"""
    val ckpt = TestTmp.dir("sl_ckpt").toString
    val input = MemoryStream[String]
    input.addData(env(1, 1, "a"), env(2, 1, "b"), env(3, 1, "c"))
    val cfg = CdcPipeline.Config(payload, keyField = "id", seqField = "seq")
    def start() = CdcPipeline.toStreamLoadSink(
        CdcPipeline.stream(input.toDF().withColumnRenamed("value", "json"), "json", cfg),
        "xonce", loader().transport)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    val q1 = start(); q1.processAllAvailable(); q1.stop(); q1.awaitTermination()
    // the restart must not race q1's teardown on the shared checkpoint
    val deadline = System.nanoTime() + 30L * 1000000000L
    while (spark.streams.active.exists(_.id == q1.id) && System.nanoTime() < deadline)
      Thread.sleep(50)
    val snapshot = new java.util.HashMap(applied)
    assert(!snapshot.isEmpty, "batch 0 shipped")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(ckpt, "commits", "0")))
    // crash window: PUT done (applied has the chunks), commit marker not
    // yet durable — simulated by deleting it (plus the local-fs .crc
    // sidecar, which a real crash would also never leave alone)
    java.nio.file.Files.delete(java.nio.file.Paths.get(ckpt, "commits", "0"))
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(ckpt, "commits", ".0.crc"))
    val dedupBefore = dedupHits.get()
    val beBefore = beHits.get()
    val q2 = start(); q2.processAllAvailable(); q2.stop() // replays epoch 0
    assert(beHits.get() > beBefore,
      "the replayed epoch must re-PUT its chunks (the client cannot know they landed)")
    assert(dedupHits.get() > dedupBefore,
      "the BE must answer Label Already Exists + FINISHED for the replay")
    assert(applied == snapshot,
      "server-side label dedup keeps the landed rows exactly-once under replay")
  }

  test("a permanent failure surfaces after maxAttempts") {
    applied.clear()
    server.createContext("/be/api/testdb/permfail/_stream_load", { x =>
      x.getRequestBody.readAllBytes()
      respond(x, 500, """{"Status":"Fail","Message":"always"}""")
    })
    val bad = loader(maxAttempts = 2).copy(table = "permfail")
    val df = Seq((1L, "x")).toDF("id", "name").coalesce(1)
    val e = intercept[Exception] {
      StarRocksSink.write(df, "loadD", bad.transport)
    }
    val messages = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(messages.exists(_.contains("attempts failed")), messages.mkString(" | "))
  }
}
