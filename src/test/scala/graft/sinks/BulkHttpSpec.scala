package graft.sinks

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkSpec
import graft.sinks.BulkHttp.{BulkConfig, BulkResult}

import java.io.ByteArrayOutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger
import java.util.zip.GZIPInputStream
import scala.collection.mutable.ArrayBuffer

/** Drives the production bulk sink against an in-process HTTP stub:
  * success, whole-request 429 retry, per-item 429 retry, partial failure
  * with raiseOnError/ignoreStatus, byte-capped chunking, and the index
  * lifecycle calls — the paths `search_client.py:100-212` exercises against
  * a live cluster.
  */
class BulkHttpSpec extends SparkSpec {
  import spark.implicits._

  /** One stub per test: records every request's action lines; `plan` maps
    * request ordinal → per-action status override (None = all 200s).
    */
  private final class Stub(plan: Int => Option[Either[Int, Seq[Int]]]) {
    val requests = new ArrayBuffer[Seq[String]]() // meta/source lines per request
    val ordinal = new AtomicInteger(0)
    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var lastContentEncoding: String = _

    server.createContext(
      "/_bulk",
      (ex: HttpExchange) => {
        val body = readBody(ex)
        val lines = body.split("\n").filter(_.nonEmpty).toSeq
        // meta lines alternate with sources for index ops; metas identify actions
        val metas = lines.filter(l => l.startsWith("""{"index":""") || l.startsWith("""{"delete":"""))
        requests.synchronized { requests += lines }
        val n = ordinal.getAndIncrement()
        plan(n) match {
          case Some(Left(httpStatus)) =>
            respond(ex, httpStatus, """{"error":"rejected"}""")
          case other =>
            val statuses = other.flatMap(_.toOption).getOrElse(Seq.fill(metas.size)(200))
            val items = metas.zip(statuses).map { case (meta, st) =>
              val kind = if (meta.startsWith("""{"delete":""")) "delete" else "index"
              val err = if (st >= 300 && st != 404) s""","error":{"type":"stub","status":$st}""" else ""
              s"""{"$kind":{"status":$st$err}}"""
            }
            respond(ex, 200, s"""{"errors":${statuses.exists(_ >= 300)},"items":[${items.mkString(",")}]}""")
        }
      }
    )
    // index lifecycle endpoints: everything else
    @volatile var lastPutBody: String = _
    // `GET /` info body for version negotiation; null = 400 (the sink must
    // fall back to modern-ES behavior)
    @volatile var infoJson: String = _
    server.createContext(
      "/",
      (ex: HttpExchange) => {
        val body = readBody(ex)
        val (method, path) = (ex.getRequestMethod, ex.getRequestURI.getPath)
        (method, path) match {
          case ("GET", "/") if infoJson != null     => respond(ex, 200, infoJson)
          case ("HEAD", _)                          => respond(ex, 404, "")
          case ("PUT", _)                           => lastPutBody = body; respond(ex, 200, """{"acknowledged":true}""")
          case ("DELETE", _)                        => respond(ex, 200, """{"acknowledged":true}""")
          case ("POST", p) if p.endsWith("_refresh") => respond(ex, 200, "{}")
          case _                                    => respond(ex, 400, "{}")
        }
      }
    )
    server.start()
    val endpoint = s"http://127.0.0.1:${server.getAddress.getPort}"

    private def readBody(ex: HttpExchange): String = {
      lastContentEncoding = ex.getRequestHeaders.getFirst("Content-Encoding")
      val raw = ex.getRequestBody.readAllBytes()
      val bytes =
        if (lastContentEncoding == "gzip") {
          val out = new ByteArrayOutputStream()
          val in = new GZIPInputStream(new java.io.ByteArrayInputStream(raw))
          in.transferTo(out); out.toByteArray
        } else raw
      new String(bytes, StandardCharsets.UTF_8)
    }

    private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
      val b = body.getBytes(StandardCharsets.UTF_8)
      if (ex.getRequestMethod == "HEAD") ex.sendResponseHeaders(status, -1)
      else { ex.sendResponseHeaders(status, b.length); ex.getResponseBody.write(b) }
      ex.close()
    }

    def stop(): Unit = server.stop(0)
  }

  private def ops(n: Int) =
    (1 to n).map(i => ("index", i.toString, s"""{"v":$i,"route":"r$i"}""")).toDF("op", "_id", "doc")

  test("happy path: all docs land, gzip wire, routing + pipeline metadata, count/byte chunking") {
    val stub = new Stub(_ => None)
    try {
      val cfg = BulkConfig(
        stub.endpoint, "idx", chunkSize = 10,
        pipeline = Some("clean"), routing = Some("route")
      )
      val r = BulkHttp.write(ops(37).repartition(3), cfg)
      assert(r == BulkResult(37, 0, 0, 0, stub.requests.size))
      assert(stub.lastContentEncoding == "gzip")
      val metas = stub.requests.flatten.filter(_.startsWith("""{"index":"""))
      assert(metas.size == 37)
      assert(metas.forall(_.contains(""""pipeline":"clean"""")))
      assert(metas.exists(_.contains(""""routing":"r7"""")))
      // chunkSize honored: no request carries more than 10 actions
      assert(stub.requests.forall(_.count(_.startsWith("""{"index":""")) <= 10))

      // deletes: no source line, no pipeline on the action
      stub.requests.clear()
      val del = Seq(("delete", "9", null: String)).toDF("op", "_id", "doc")
      val rd = BulkHttp.write(del, cfg)
      assert(rd.succeeded == 1)
      val dmeta = stub.requests.flatten.filter(_.startsWith("""{"delete":"""))
      assert(dmeta.size == 1 && !dmeta.head.contains("pipeline"))
    } finally stub.stop()
  }

  test("byte cap splits chunks; refresh=true lands on the URL") {
    val stub = new Stub(_ => None)
    try {
      val cfg = BulkConfig(
        stub.endpoint, "idx", chunkSize = 1000, maxChunkBytes = 60,
        httpCompress = false, refresh = true
      )
      val r = BulkHttp.write(ops(6).coalesce(1), cfg)
      assert(r.succeeded == 6)
      // every action is ~50 bytes: the 60-byte cap forces one action per request
      assert(stub.requests.size == 6, s"got ${stub.requests.size} requests")
      assert(stub.lastContentEncoding == null)
    } finally stub.stop()
  }

  test("whole-request 429 backs off and resends; exhausted retries raise") {
    val stub = new Stub(n => if (n == 0) Some(Left(429)) else None)
    try {
      val cfg = BulkConfig(
        stub.endpoint, "idx", maxRetries = 2, initialBackoffMs = 10, maxBackoffMs = 50
      )
      val r = BulkHttp.write(ops(5).coalesce(1), cfg)
      assert(r.succeeded == 5 && r.retriedItems == 5 && r.requests == 2)
    } finally stub.stop()

    val always429 = new Stub(_ => Some(Left(429)))
    try {
      val cfg = BulkConfig(
        always429.endpoint, "idx", maxRetries = 1, initialBackoffMs = 1, maxBackoffMs = 5
      )
      val ex = intercept[Exception] { BulkHttp.write(ops(3).coalesce(1), cfg) }
      assert(ex.getMessage != null || ex.getCause != null) // surfaced as job failure
      assert(always429.requests.size == 2) // initial + 1 retry
    } finally always429.stop()
  }

  test("per-item 429: only rejected actions are resent") {
    // request 0: second item rejected; request 1: all good
    val stub = new Stub(n => if (n == 0) Some(Right(Seq(200, 429, 200))) else None)
    try {
      val cfg = BulkConfig(
        stub.endpoint, "idx", maxRetries = 2, initialBackoffMs = 10, maxBackoffMs = 50
      )
      val r = BulkHttp.write(ops(3).coalesce(1), cfg)
      assert(r.succeeded == 3 && r.retriedItems == 1 && r.requests == 2)
      // the retry request carries exactly the one rejected action
      assert(stub.requests(1).count(_.startsWith("""{"index":""")) == 1)
      assert(stub.requests(1).exists(_.contains(""""_id":"2"""")))
    } finally stub.stop()
  }

  test("partial failure: raiseOnError fails the job; ignoreStatus swallows") {
    val failing = new Stub(n => Some(Right(Seq(200, 400, 200))))
    try {
      val cfg = BulkConfig(failing.endpoint, "idx", maxRetries = 0)
      intercept[Exception] { BulkHttp.write(ops(3).coalesce(1), cfg) }
    } finally failing.stop()

    val ignoring = new Stub(n => if (n == 0) Some(Right(Seq(200, 404, 200))) else None)
    try {
      val cfg = BulkConfig(ignoring.endpoint, "idx") // 404 ignored by default
      val r = BulkHttp.write(ops(3).coalesce(1), cfg)
      assert(r.succeeded == 2 && r.ignored == 1 && r.failed == 0)
    } finally ignoring.stop()

    val tolerated = new Stub(n => Some(Right(Seq(200, 400, 200))))
    try {
      val cfg = BulkConfig(tolerated.endpoint, "idx", raiseOnError = false)
      val r = BulkHttp.write(ops(3).coalesce(1), cfg)
      assert(r.succeeded == 2 && r.failed == 1)
    } finally tolerated.stop()
  }

  test("malformed bulk response (item count mismatch) fails loudly, not silently") {
    // a proxy/load-balancer returning a truncated items array must never be
    // treated as success — that would count unacked docs as indexed
    val stub = new Stub(_ => Some(Right(Seq(200)))) // 3 actions, 1 item back
    try {
      val cfg = BulkConfig(stub.endpoint, "idx")
      val ex = intercept[Exception] { BulkHttp.write(ops(3).coalesce(1), cfg) }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
      assert(messages(ex).exists(_.contains("items")), s"unexpected: $ex")
    } finally stub.stop()
  }

  test("backoff jitter stays within ±20% of the exponential base and decorrelates") {
    val cfg = BulkHttp.BulkConfig(endpoint = "http://x", index = "i",
      initialBackoffMs = 1000, maxBackoffMs = 600000)
    // attempt 1 → base 1000, attempt 3 → base 4000; jittered ∈ [0.8b, 1.2b]
    for ((attempt, base) <- Seq(1 -> 1000L, 3 -> 4000L)) {
      val draws = (1 to 200).map(_ => BulkHttp.backoffMs(cfg, attempt))
      assert(draws.forall(d => d >= (base * 0.8).toLong && d <= (base * 1.2).toLong),
        s"attempt $attempt out of window: min=${draws.min} max=${draws.max}")
      // lockstep would be a single repeated value; jitter must spread
      assert(draws.distinct.size > 10, s"attempt $attempt draws not jittered: ${draws.distinct}")
    }
    // the cap clamps the jittered value too, never exceeding maxBackoffMs
    val capped = BulkHttp.BulkConfig(endpoint = "http://x", index = "i",
      initialBackoffMs = 1000, maxBackoffMs = 1100)
    assert((1 to 100).map(_ => BulkHttp.backoffMs(capped, 10)).forall(_ <= 1100L))
  }

  test("index lifecycle: create (HEAD-check + PUT), delete, refresh") {
    val stub = new Stub(_ => None)
    try {
      assert(BulkHttp.createIndex(stub.endpoint, "idx", """{"mappings":{}}"""))
      BulkHttp.deleteIndex(stub.endpoint, "idx")
      BulkHttp.refresh(stub.endpoint, Seq("idx"))
    } finally stub.stop()
  }

  test("createIndex round-trip carries settings AND mappings (search_client.py:261-288)") {
    val stub = new Stub(_ => None)
    try {
      val doc = graft.schema.SchemaDef.parse(
        """{"database": "db", "index": "books",
            "setting": {"number_of_shards": 2, "analysis": {"analyzer": {"ng": {"tokenizer": "ngram"}}}},
            "nodes": {"table": "book", "columns": ["isbn"],
                      "transform": {"mapping": {"isbn": {"type": "keyword"}}}}}"""
      )
      val body = SearchSink.buildMapping(doc.root, doc.routing, doc.setting)
      assert(BulkHttp.createIndex(stub.endpoint, doc.index, body))
      val sent = new com.fasterxml.jackson.databind.ObjectMapper().readTree(stub.lastPutBody)
      assert(sent.get("settings").get("index").get("number_of_shards").asInt() == 2)
      assert(sent.get("settings").get("index").get("analysis").get("analyzer").has("ng"))
      assert(sent.get("mappings").get("properties").get("isbn").get("type").asText() == "keyword")
    } finally stub.stop()
  }

  test("version negotiation: ES 6.x gets _doc mapping wrap + _type on bulk actions (search_client.py:349)") {
    val stub = new Stub(_ => None)
    stub.infoJson =
      """{"name":"n","version":{"number":"6.8.2","build_flavor":"default"},"tagline":"You Know, for Search"}"""
    try {
      assert(BulkHttp.serverInfo(stub.endpoint) == BulkHttp.ServerInfo("elasticsearch", 6))
      // mapping body wrapped under the _doc type
      BulkHttp.createIndex(stub.endpoint, "idx",
        """{"settings": {"index": {"number_of_shards": 1}}, "mappings": {"properties": {"a": {"type": "keyword"}}}}""")
      val sent = new com.fasterxml.jackson.databind.ObjectMapper().readTree(stub.lastPutBody)
      assert(sent.get("mappings").has("_doc"))
      assert(sent.get("mappings").get("_doc").get("properties").get("a").get("type").asText == "keyword")
      assert(sent.get("settings").get("index").get("number_of_shards").asInt == 1)
      // bulk metadata carries _type on index AND delete actions
      val mixed = Seq(("index", "1", """{"a":1}"""), ("delete", "2", null: String))
        .toDF("op", "_id", "doc")
      val r = BulkHttp.write(mixed, BulkConfig(stub.endpoint, "idx"))
      assert(r.succeeded == 2)
      val metas = stub.requests.flatten.filter(l =>
        l.startsWith("""{"index":""") || l.startsWith("""{"delete":"""))
      assert(metas.size == 2 && metas.forall(_.contains(""""_type":"_doc"""")))
    } finally stub.stop()
  }

  test("version negotiation: ES 8.x and OpenSearch need no legacy shims; no-info falls back modern") {
    // 8.x-shaped
    val es8 = new Stub(_ => None)
    es8.infoJson = """{"version":{"number":"8.11.4"},"tagline":"You Know, for Search"}"""
    try {
      assert(BulkHttp.serverInfo(es8.endpoint) == BulkHttp.ServerInfo("elasticsearch", 8))
      BulkHttp.createIndex(es8.endpoint, "idx", """{"mappings": {"properties": {}}}""")
      assert(!es8.lastPutBody.contains("_doc"))
      BulkHttp.write(ops(1), BulkConfig(es8.endpoint, "idx"))
      assert(!es8.requests.flatten.exists(_.contains("_type")))
    } finally es8.stop()
    // OpenSearch 2.x: major 2 < 7 but is_opensearch → modern behavior
    val os2 = new Stub(_ => None)
    os2.infoJson = """{"version":{"number":"2.11.0","distribution":"opensearch"}}"""
    try {
      val info = BulkHttp.serverInfo(os2.endpoint)
      assert(info == BulkHttp.ServerInfo("opensearch", 2) && !info.legacyMappingType)
      BulkHttp.createIndex(os2.endpoint, "idx", """{"mappings": {"properties": {}}}""")
      assert(!os2.lastPutBody.contains("_doc"))
      BulkHttp.write(ops(1), BulkConfig(os2.endpoint, "idx"))
      assert(!os2.requests.flatten.exists(_.contains("_type")))
    } finally os2.stop()
    // endpoint with no GET / (the pre-negotiation stubs): modern default
    val mute = new Stub(_ => None)
    try assert(BulkHttp.serverInfo(mute.endpoint) == BulkHttp.ServerInfo("elasticsearch", 8))
    finally mute.stop()
  }

  test("version negotiation: failed probes are not cached — endpoint renegotiates once it responds") {
    val stub = new Stub(_ => None)
    try {
      // GET / answers 400 (cluster "still booting"): degrade to modern for
      // this call, but do NOT pin it — an ES 6 endpoint briefly down at
      // first contact must not keep modern wire format for the JVM's life
      assert(BulkHttp.serverInfo(stub.endpoint) == BulkHttp.ServerInfo("elasticsearch", 8))
      stub.infoJson = """{"version":{"number":"6.8.23"}}"""
      assert(BulkHttp.serverInfo(stub.endpoint) == BulkHttp.ServerInfo("elasticsearch", 6))
      // the successful probe IS cached: dropping the body changes nothing
      stub.infoJson = null
      assert(BulkHttp.serverInfo(stub.endpoint) == BulkHttp.ServerInfo("elasticsearch", 6))
    } finally stub.stop()
  }

  test("product loop: GraftSync publishes snapshot + incremental ops over HTTP") {
    import graft.GraftSync
    import graft.catalog.{Catalog, TableMeta}
    import graft.cdc.Changes
    val stub = new Stub(_ => None)
    try {
      val cat = Catalog(Map("book" -> TableMeta("book", Seq("id"))))
      @volatile var book = Seq((1L, "a"), (2L, "b")).toDF("id", "title")
      val sync = GraftSync(
        spark,
        """{"database": "db", "index": "books", "pipeline": "clean", "nodes":
             {"table": "book", "columns": ["id", "title"]}}""",
        cat,
        _ => book,
        java.nio.file.Files.createTempDirectory("graft-publish").toString
      )
      val cfg0 = sync.bulkConfig(stub.endpoint)
      assert(cfg0.index == "books" && cfg0.pipeline.contains("clean"))
      val cfg = cfg0.copy(chunkSize = 10)

      // snapshot: index bootstrapped (HEAD+PUT), both docs published with
      // the schema's ingest pipeline on the action metadata
      val r0 = sync.publishSnapshot(cfg)
      assert(r0.succeeded == 2)
      val snapMetas = stub.requests.flatten.filter(_.startsWith("""{"index":"""))
      assert(snapMetas.size == 2 && snapMetas.forall(_.contains(""""pipeline":"clean"""")))

      // incremental: local snapshot, then one publishChanges call feeds the
      // remote (index op for the new row, delete op for the removed one)
      // and the local index from a single engine pass
      sync.snapshot()
      stub.requests.synchronized(stub.requests.clear())
      book = Seq((2L, "b"), (3L, "c")).toDF("id", "title")
      val r1 = sync.publishChanges(
        Changes.of(spark, Seq(
          (Changes.Insert, "book", null, """{"id": 3}""", 10L),
          (Changes.Delete, "book", """{"id": 1}""", null, 11L)
        )),
        cfg
      )
      assert(r1.succeeded == 2)
      val lines = stub.requests.flatten
      assert(lines.exists(l => l.startsWith("""{"index":""") && l.contains(""""_id":"3"""")))
      assert(lines.exists(l => l.startsWith("""{"delete":""") && l.contains(""""_id":"1"""")))
      // and the local index saw the same batch
      assert(sync.state.docs.collect().map(_.getString(0)).toSet == Set("2", "3"))
      assert(sync.state.checkpoint.contains(9L)) // min(10,11)-1
    } finally stub.stop()
  }
}
