package graft.sinks

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, Row}

import java.io.ByteArrayOutputStream
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import java.util.zip.GZIPOutputStream
import scala.collection.mutable.ArrayBuffer

/** Production write path to an ES/OpenSearch-compatible endpoint: the
  * distributed equivalent of the reference's bulk indexer
  * (`pgsync/search_client.py:100-212`). Each executor partition streams its
  * rendered `_bulk` actions in chunks capped by action count AND bytes
  * (`ELASTICSEARCH_CHUNK_SIZE` 5 000 / `ELASTICSEARCH_MAX_CHUNK_BYTES`
  * 100 MB, `settings.py:145-148`), with the reference's retry discipline
  * (`settings.py:156-162`): 429 rejections — whole-request or per-item —
  * back off `initialBackoff · 2^(attempt-1)` capped at `maxBackoff`
  * (2 s → 600 s defaults) and resend only the rejected actions; other item
  * failures honor `ignoreStatus`/`raiseOnError`
  * (`settings.py:169-179`).
  *
  * Scale shape: `foreachPartition`, so concurrency = partition count (the
  * reference's 4-thread `parallel_bulk` becomes the cluster's natural
  * parallelism), no driver materialization, one long-lived HTTP client per
  * executor JVM. Progress is reported through accumulators — the
  * distributed form of the reference's `doc_count`.
  */
object BulkHttp {

  /** Knobs mirror `pgsync/settings.py:145-179` (times in millis). */
  final case class BulkConfig(
      endpoint: String,
      index: String,
      chunkSize: Int = 5000,
      maxChunkBytes: Long = 100L * 1024 * 1024,
      maxRetries: Int = 0,
      initialBackoffMs: Long = 2000,
      maxBackoffMs: Long = 600000,
      raiseOnError: Boolean = true,
      ignoreStatus: Set[Int] = Set(404),
      httpCompress: Boolean = true,
      refresh: Boolean = false,
      pipeline: Option[String] = None,
      routing: Option[String] = None,
      timeoutMs: Long = 10000
  ) extends Serializable

  /** Outcome counters (accumulator totals across all partitions). */
  final case class BulkResult(
      succeeded: Long,
      failed: Long,
      ignored: Long,
      retriedItems: Long,
      requests: Long
  )

  // one client + mapper per executor JVM (HttpClient is thread-safe)
  @transient private lazy val mapper = new ObjectMapper()
  @transient private lazy val client =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(30)).build()

  // ---- version negotiation (`search_client.py:38-77,349`) ------------------

  /** Server identity from `GET /`: distribution + major version. The
    * reference branches client behavior on `is_opensearch` and
    * `major_version`; the two wire-visible differences this sink must honor
    * are the ES < 7 `_doc` mapping type (mappings body wrapped, `_type` on
    * bulk action metadata) — OpenSearch never needs them regardless of its
    * own 1.x/2.x numbering (`search_client.py:349`).
    */
  final case class ServerInfo(distribution: String, major: Int) {
    def isOpenSearch: Boolean = distribution == "opensearch"
    def legacyMappingType: Boolean = !isOpenSearch && major > 0 && major < 7
  }

  // negotiated once per endpoint per JVM — the driver probes, executors
  // receive the resolved booleans through the action plan, never the probe
  private val infoCache = new java.util.concurrent.ConcurrentHashMap[String, ServerInfo]()

  /** `GET /` once per endpoint, cached ONLY on a successful probe. An
    * unreachable endpoint or a non-2xx (e.g. a cluster still booting)
    * degrades to modern ES (major 8, no legacy shims) for THIS call but is
    * NOT cached — caching a failed probe would pin an ES 6 endpoint that was
    * briefly down to the wrong wire format for the JVM's lifetime; the next
    * call re-probes.
    */
  def serverInfo(endpoint: String, timeoutMs: Long = 10000): ServerInfo = {
    val cached = infoCache.get(endpoint)
    if (cached != null) cached
    else
      fetchInfo(endpoint, timeoutMs) match {
        case Some(info) =>
          val prev = infoCache.putIfAbsent(endpoint, info)
          if (prev != null) prev else info
        case None => ServerInfo("elasticsearch", 8)
      }
  }

  private def fetchInfo(endpoint: String, timeoutMs: Long): Option[ServerInfo] =
    try {
      val req = HttpRequest
        .newBuilder(URI.create(s"$endpoint/"))
        .timeout(Duration.ofMillis(timeoutMs))
        .GET()
        .build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() >= 300) None
      else {
        val root = mapper.readTree(resp.body())
        val version = root.path("version")
        val major = version.path("number").asText("").split("\\.").headOption
          .flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(8)
        val distro =
          if (version.path("distribution").asText("") == "opensearch" ||
              root.path("tagline").asText("").toLowerCase.contains("opensearch"))
            "opensearch"
          else "elasticsearch"
        Some(ServerInfo(distro, major))
      }
    } catch { case _: Exception => None }

  /** Wrap the create body's `mappings` in the `_doc` type for ES < 7
    * (`search_client.py:349-351` does the same to the derived mapping).
    */
  private[sinks] def legacyMappingsBody(body: String): String = {
    val root = mapper.readTree(body)
    root match {
      case obj: com.fasterxml.jackson.databind.node.ObjectNode if obj.has("mappings") =>
        val wrapper = mapper.createObjectNode()
        wrapper.set[JsonNode]("_doc", obj.get("mappings"))
        obj.set[JsonNode]("mappings", wrapper)
        obj.toString
      case _ => body
    }
  }

  /** Index a batch of ops (`op`, `_id`, `doc`) — one bulk stream per
    * partition. Blocks until every partition finishes; throws (failing the
    * Spark job) on unrecoverable errors when `raiseOnError`.
    */
  def write(ops: DataFrame, cfg: BulkConfig): BulkResult = {
    // negotiate on the driver; the legacy `_type` travels as plan literals
    val info = serverInfo(cfg.endpoint, cfg.timeoutMs)
    val actions = SearchSink.bulkActions(
      ops, cfg.index, cfg.routing, cfg.pipeline, legacyType = info.legacyMappingType)
    val sc = ops.sparkSession.sparkContext
    val succeeded = sc.longAccumulator("bulk.succeeded")
    val failed = sc.longAccumulator("bulk.failed")
    val ignored = sc.longAccumulator("bulk.ignored")
    val retried = sc.longAccumulator("bulk.retriedItems")
    val requests = sc.longAccumulator("bulk.requests")
    actions.foreachPartition { (it: Iterator[Row]) =>
      val chunk = new ArrayBuffer[String]()
      var bytes = 0L
      def flush(): Unit = if (chunk.nonEmpty) {
        val stats = sendChunk(chunk.toIndexedSeq, cfg)
        succeeded.add(stats.succeeded); failed.add(stats.failed)
        ignored.add(stats.ignored); retried.add(stats.retriedItems)
        requests.add(stats.requests)
        chunk.clear(); bytes = 0L
      }
      it.foreach { row =>
        val action = row.getString(0)
        val sz = action.getBytes(StandardCharsets.UTF_8).length + 1L
        // flush BEFORE adding when the byte cap would be crossed, so a chunk
        // never exceeds maxChunkBytes (an oversized single action still goes
        // alone — the server's rejection is the right signal there)
        if (chunk.nonEmpty && (bytes + sz > cfg.maxChunkBytes || chunk.size >= cfg.chunkSize))
          flush()
        chunk += action
        bytes += sz
      }
      flush()
    }
    BulkResult(succeeded.value, failed.value, ignored.value, retried.value, requests.value)
  }

  /** One chunk through the retry loop. Returns counters; throws on
    * exhausted retries / fatal statuses when `raiseOnError`.
    */
  private[sinks] def sendChunk(all: IndexedSeq[String], cfg: BulkConfig): BulkResult = {
    var remaining = all
    var attempt = 1
    var succeeded = 0L; var failed = 0L; var ignored = 0L
    var retriedItems = 0L; var requests = 0L
    val errors = new ArrayBuffer[String]()

    while (remaining.nonEmpty) {
      val resp = post(bulkUrl(cfg), remaining.mkString("", "\n", "\n"), cfg)
      requests += 1
      if (resp.statusCode == 429) {
        // whole-request rejection: resend everything (streaming_bulk parity)
        if (attempt > cfg.maxRetries)
          throw new RuntimeException(
            s"bulk to ${cfg.endpoint}/${cfg.index} rejected (429) after $attempt attempts"
          )
        retriedItems += remaining.size
        Thread.sleep(backoffMs(cfg, attempt)); attempt += 1
      } else if (resp.statusCode >= 300) {
        throw new RuntimeException(
          s"bulk to ${cfg.endpoint}/${cfg.index} failed: HTTP ${resp.statusCode}: ${truncate(resp.body)}"
        )
      } else {
        val items = mapper.readTree(resp.body).path("items")
        require(
          items.size == remaining.size,
          s"bulk response has ${items.size} items for ${remaining.size} actions"
        )
        val rejected = new ArrayBuffer[String]()
        var i = 0
        while (i < remaining.size) {
          val item = items.get(i).elements().next() // {"index": {...}} / {"delete": {...}}
          val status = item.path("status").asInt(0)
          if (status == 429) rejected += remaining(i)
          else if (status >= 200 && status < 300 && !item.has("error")) succeeded += 1
          else if (cfg.ignoreStatus.contains(status)) ignored += 1
          else {
            failed += 1
            if (errors.size < 5) errors += truncate(item.toString)
          }
          i += 1
        }
        if (failed > 0 && cfg.raiseOnError)
          throw new RuntimeException(
            s"$failed bulk action(s) failed (first errors: ${errors.mkString("; ")})"
          )
        if (rejected.nonEmpty) {
          if (attempt > cfg.maxRetries) {
            if (cfg.raiseOnError)
              throw new RuntimeException(
                s"${rejected.size} bulk action(s) still rejected (429) after $attempt attempts"
              )
            failed += rejected.size
            remaining = IndexedSeq.empty
          } else {
            retriedItems += rejected.size
            remaining = rejected.toIndexedSeq
            Thread.sleep(backoffMs(cfg, attempt)); attempt += 1
          }
        } else remaining = IndexedSeq.empty
      }
    }
    BulkResult(succeeded, failed, ignored, retriedItems, requests)
  }

  /** Exponential backoff with ±20% jitter. A server-wide 429 hits every
    * partition at once; without jitter all tasks sleep the same
    * `initial · 2^(attempt-1)` and retry in lockstep, re-creating the
    * overload each round (thundering herd). The jitter decorrelates the
    * retry times; the result is clamped to `maxBackoffMs`.
    */
  private[sinks] def backoffMs(cfg: BulkConfig, attempt: Int): Long = {
    val base =
      math.min(cfg.maxBackoffMs, cfg.initialBackoffMs * (1L << math.min(attempt - 1, 32)))
    val jittered =
      (base * (0.8 + 0.4 * java.util.concurrent.ThreadLocalRandom.current().nextDouble())).toLong
    math.min(cfg.maxBackoffMs, math.max(0L, jittered))
  }

  private def bulkUrl(cfg: BulkConfig): String =
    s"${cfg.endpoint}/_bulk" + (if (cfg.refresh) "?refresh=true" else "")

  private final case class Resp(statusCode: Int, body: String)

  private def post(url: String, body: String, cfg: BulkConfig): Resp = {
    val raw = body.getBytes(StandardCharsets.UTF_8)
    val payload = if (cfg.httpCompress) gzip(raw) else raw
    val builder = HttpRequest
      .newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(cfg.timeoutMs))
      .header("Content-Type", "application/x-ndjson")
      .POST(HttpRequest.BodyPublishers.ofByteArray(payload))
    if (cfg.httpCompress) builder.header("Content-Encoding", "gzip")
    val resp = client.send(builder.build(), HttpResponse.BodyHandlers.ofString())
    Resp(resp.statusCode(), resp.body())
  }

  private def gzip(raw: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(raw.length / 2 + 64)
    val gz = new GZIPOutputStream(out)
    try gz.write(raw)
    finally gz.close()
    out.toByteArray
  }

  private def truncate(s: String, n: Int = 300): String =
    if (s == null) "" else if (s.length <= n) s else s.take(n) + "…"

  // ---- index lifecycle (`search_client.py:268-302,87-96`) ------------------

  /** Create the index with settings+mapping when absent (`_create_index` /
    * `create_setting`): HEAD-check, then PUT the body. Returns true when the
    * index was created, false when it already existed.
    */
  def createIndex(endpoint: String, index: String, body: String, timeoutMs: Long = 10000): Boolean = {
    val head = HttpRequest
      .newBuilder(URI.create(s"$endpoint/$index"))
      .timeout(Duration.ofMillis(timeoutMs))
      .method("HEAD", HttpRequest.BodyPublishers.noBody())
      .build()
    if (client.send(head, HttpResponse.BodyHandlers.discarding()).statusCode() == 200) return false
    // ES < 7 expects the mapping body under the `_doc` type
    val negotiated =
      if (serverInfo(endpoint, timeoutMs).legacyMappingType) legacyMappingsBody(body) else body
    val put = HttpRequest
      .newBuilder(URI.create(s"$endpoint/$index"))
      .timeout(Duration.ofMillis(timeoutMs))
      .header("Content-Type", "application/json")
      .PUT(HttpRequest.BodyPublishers.ofString(negotiated))
      .build()
    val resp = client.send(put, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() >= 300)
      throw new RuntimeException(s"create index $index failed: HTTP ${resp.statusCode()}: ${truncate(resp.body())}")
    true
  }

  /** Drop the index, ignoring 400/404 like the reference's `teardown`. */
  def deleteIndex(endpoint: String, index: String, timeoutMs: Long = 10000): Unit = {
    val del = HttpRequest
      .newBuilder(URI.create(s"$endpoint/$index"))
      .timeout(Duration.ofMillis(timeoutMs))
      .DELETE()
      .build()
    val resp = client.send(del, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() >= 300 && resp.statusCode() != 400 && resp.statusCode() != 404)
      throw new RuntimeException(s"delete index $index failed: HTTP ${resp.statusCode()}")
  }

  /** `POST /<indices>/_refresh` (`search_client.py:214-216`). */
  def refresh(endpoint: String, indices: Seq[String], timeoutMs: Long = 10000): Unit = {
    val req = HttpRequest
      .newBuilder(URI.create(s"$endpoint/${indices.mkString(",")}/_refresh"))
      .timeout(Duration.ofMillis(timeoutMs))
      .POST(HttpRequest.BodyPublishers.noBody())
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() >= 300)
      throw new RuntimeException(s"refresh failed: HTTP ${resp.statusCode()}")
  }
}
