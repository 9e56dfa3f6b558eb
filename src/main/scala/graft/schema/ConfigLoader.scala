package graft.schema

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.time.Duration
import scala.util.matching.Regex

/** Config-document loading with the reference's `config_loader` semantics
  * (`pgsync/utils.py:204-300`): a JSON file holds ONE schema doc or an
  * ARRAY of docs (one per index); each doc's TOP-LEVEL string values get
  * environment-variable templating with Python `Template.safe_substitute`
  * rules — `$VAR` / `${VAR}`, `$$` escapes to `$`, unknown variables are
  * left verbatim, nested values are never templated (the reference's
  * `TypeError` skip). Sources may be a local path, an http(s) URL, or any
  * Hadoop FileSystem URI — s3a/hdfs/file (`validate_config`,
  * `utils.py:178-201`; the reference's S3 branch `utils.py:264-281`
  * becomes the scheme-agnostic Hadoop FS read).
  */
object ConfigLoader {

  private val mapper = new ObjectMapper()

  // Python string.Template pattern: $$, ${name}, $name
  private val Pattern: Regex =
    """\$(?:(\$)|\{([_a-zA-Z][_a-zA-Z0-9]*)\}|([_a-zA-Z][_a-zA-Z0-9]*))""".r

  /** `Template(value).safe_substitute(env)`: substitute known variables,
    * leave unknown references untouched, collapse `$$` to `$`.
    */
  def safeSubstitute(s: String, env: Map[String, String]): String =
    Pattern.replaceAllIn(
      s,
      m =>
        Regex.quoteReplacement(
          if (m.group(1) != null) "$"
          else {
            val name = if (m.group(2) != null) m.group(2) else m.group(3)
            env.getOrElse(name, m.matched)
          }
        )
    )

  /** Split a config body into per-index doc JSON strings, templating each
    * doc's top-level string fields from `env`.
    */
  def docs(configJson: String, env: Map[String, String] = sys.env): Seq[String] = {
    val root =
      try mapper.readTree(configJson)
      catch {
        case e: com.fasterxml.jackson.core.JacksonException =>
          throw new IllegalArgumentException(s"config is not valid JSON: ${e.getMessage}", e)
      }
    val nodes =
      if (root.isArray) {
        import scala.jdk.CollectionConverters._
        root.elements.asScala.toSeq
      } else Seq(root)
    nodes.map {
      case obj: ObjectNode =>
        val fields = {
          import scala.jdk.CollectionConverters._
          obj.fieldNames.asScala.toSeq
        }
        fields.foreach { f =>
          val v = obj.get(f)
          if (v.isTextual) obj.put(f, safeSubstitute(v.asText, env))
        }
        mapper.writeValueAsString(obj)
      case other => mapper.writeValueAsString(other)
    }
  }

  /** Load config text from a local path or http(s) URL — the reference's
    * source dispatch (`utils.py:264-281`) minus S3.
    */
  def fetch(source: String): String = {
    val lower = source.toLowerCase
    if (lower.startsWith("http://") || lower.startsWith("https://")) {
      val client = HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()
      val req = HttpRequest
        .newBuilder(URI.create(source))
        .timeout(Duration.ofSeconds(60))
        .header("Accept", "application/json")
        .GET()
        .build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() >= 300)
        throw new RuntimeException(s"config fetch from $source failed: HTTP ${resp.statusCode()}")
      val body = resp.body()
      // ensure it's valid JSON before returning (utils.py:239-246)
      try mapper.readTree(body)
      catch {
        case e: com.fasterxml.jackson.core.JacksonException =>
          throw new IllegalArgumentException(s"expected JSON from $source: ${e.getMessage}", e)
      }
      body
    } else if (source.contains("://")) {
      // Any Hadoop FileSystem URI (s3a://, hdfs://, file://, ...) loads
      // uniformly — the scheme-agnostic analogue of the reference's S3
      // branch (utils.py:264-281). Plain s3:// is rewritten to s3a://, the
      // Hadoop-native S3 client.
      val uriStr = if (lower.startsWith("s3://")) "s3a://" + source.drop(5) else source
      val uri = URI.create(uriStr)
      val fs = org.apache.hadoop.fs.FileSystem.get(uri, new org.apache.hadoop.conf.Configuration())
      val path = new org.apache.hadoop.fs.Path(uri)
      if (!fs.exists(path))
        throw new java.io.FileNotFoundException(s"""Config "$source" not found""")
      val in = fs.open(path)
      val body =
        try new String(in.readAllBytes(), StandardCharsets.UTF_8)
        finally in.close()
      try mapper.readTree(body)
      catch {
        case e: com.fasterxml.jackson.core.JacksonException =>
          throw new IllegalArgumentException(s"expected JSON from $source: ${e.getMessage}", e)
      }
      body
    } else {
      val p = Paths.get(source)
      if (!Files.exists(p))
        throw new java.io.FileNotFoundException(s"""Local config "$source" not found""")
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
    }
  }

  /** Fetch + split + template in one call. */
  def load(source: String, env: Map[String, String] = sys.env): Seq[String] =
    docs(fetch(source), env)
}
