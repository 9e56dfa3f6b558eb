package graft.transform

import org.apache.spark.sql.{DataFrame, Dataset, Row}

/** Per-document plugin surface, mirroring the reference's
  * `Plugin.transform(doc, _id, _index) -> dict` ABC
  * (`pgsync/plugin.py:15-21`): arbitrary rewrites chained in configuration
  * order (`plugin.py:52-54`), where a falsy return drops the document
  * (`plugin.py:102-103`, applied at `sync.py:1571-1574`).
  *
  * Spark shape: a `Row => Option[Row]` applied via one `flatMap` over the
  * whole chain (single pass, no per-plugin materialization). Heavyweight
  * plugins (the reference's `plugins/openai_plugin.py` /
  * `sentence_transformer_plugin.py` hold remote clients / models) should
  * extend [[PartitionDocTransform]] instead, which gives per-partition
  * lazy initialization — the `mapPartitions` idiom, not per-row setup.
  */
trait DocTransform extends Serializable {

  /** Plugin name (the reference discovers/filters plugins by name,
    * `plugin.py:56-91`).
    */
  def name: String

  /** Rewrite one document; `None` drops it. */
  def apply(doc: Row): Option[Row]
}

/** Plugin with a per-partition lifecycle: `open()` once per partition before
  * rows stream through (load the model, connect the client).
  */
trait PartitionDocTransform extends DocTransform {
  def open(): Unit
}

/** Credential lookup hook mirroring `Plugin.auth(key)`
  * (`pgsync/plugin.py:106-115`, consumed by `urls.py:40-53` for PG/ES/Redis
  * passwords): asked in chain order, first defined answer wins.
  */
trait AuthProvider extends Serializable {
  def auth(key: String): Option[String]
}

object Auth {
  def resolve(chain: Seq[AuthProvider], key: String): Option[String] =
    chain.view.flatMap(_.auth(key)).headOption
}

object Plugins {

  /** Discover [[DocTransform]] implementations on the classpath and select
    * the configured ones, in configuration order — the reference's package
    * walk + name filter (`plugin.py:49-91`: `iter_modules`/`import_module`
    * over the plugins package, keep classes whose `name` is configured,
    * sort by `names.index`). The JVM-native equivalent of a package walk is
    * `java.util.ServiceLoader`: implementations register in
    * `META-INF/services/graft.transform.DocTransform` and need a no-arg
    * constructor. Configured names with no matching implementation are
    * skipped, like the reference's walk (it only collects matches).
    */
  def discover(
      names: Seq[String],
      loader: ClassLoader = Thread.currentThread().getContextClassLoader
  ): Seq[DocTransform] = {
    if (names.isEmpty) return Nil
    import scala.jdk.CollectionConverters._
    val available = java.util.ServiceLoader
      .load(classOf[DocTransform], loader)
      .iterator()
      .asScala
      .toSeq
    val byName = available.groupBy(_.name)
    names.flatMap(n => byName.getOrElse(n, Nil))
  }

  /** Apply a configuration-ordered plugin chain in one pass. The schema must
    * be unchanged by the plugins (the reference mutates dicts freely; the
    * relational equivalent is schema-preserving rewrites — schema-changing
    * logic belongs in column expressions before this stage).
    */
  def apply(docs: DataFrame, chain: Seq[DocTransform]): DataFrame = {
    if (chain.isEmpty) return docs
    val enc = org.apache.spark.sql.Encoders.row(docs.schema)
    val ds: Dataset[Row] = docs.mapPartitions { rows =>
      chain.foreach {
        case p: PartitionDocTransform => p.open()
        case _                        =>
      }
      rows.flatMap { row =>
        chain.foldLeft(Option(row)) { (acc, plugin) => acc.flatMap(plugin.apply) }
      }
    }(enc)
    ds.toDF()
  }
}
