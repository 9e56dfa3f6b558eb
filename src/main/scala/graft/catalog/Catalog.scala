package graft.catalog

/** Table metadata catalog: primary keys + foreign keys, resolved at build
  * time into join specs.
  *
  * The reference introspects a live database via SQLAlchemy reflection
  * (`pgsync/base.py:306-345`) and resolves join keys per node pair with an
  * explicit-hint-wins policy (`pgsync/querybuilder.py:161-296`: an explicit
  * `relationship.foreign_key` is honored, otherwise FK metadata is searched
  * in both directions; no key found raises ForeignKeyError). We reproduce the
  * *semantics* as a pure build-time resolver over a declarative catalog: no
  * runtime operator, no per-query introspection — the resolved
  * [[JoinSpec]] is baked into the DataFrame plan, so Catalyst sees plain
  * equi-join conditions it can push down / reorder / broadcast.
  */
final case class ForeignKey(
    childTable: String,
    childColumns: Seq[String],
    parentTable: String,
    parentColumns: Seq[String]
)

final case class TableMeta(
    name: String,
    primaryKeys: Seq[String],
    foreignKeys: Seq[ForeignKey] = Nil
)

/** Join keys between a parent node and a child node, as resolved from the
  * catalog or an explicit schema hint. `parentColumns(i)` joins
  * `childColumns(i)`.
  */
final case class JoinSpec(parentColumns: Seq[String], childColumns: Seq[String]) {
  require(
    parentColumns.length == childColumns.length && parentColumns.nonEmpty,
    s"join spec arity mismatch: $parentColumns vs $childColumns"
  )
}

final case class ForeignKeyNotFoundError(parent: String, child: String)
    extends RuntimeException(
      s"No foreign key relationship found between '$parent' and '$child'"
    )

final case class UnknownTableError(table: String)
    extends RuntimeException(s"Table '$table' not present in catalog")

final case class Catalog(tables: Map[String, TableMeta]) {

  def apply(name: String): TableMeta =
    tables.getOrElse(name, throw UnknownTableError(name))

  def primaryKeys(name: String): Seq[String] = apply(name).primaryKeys

  /** Resolve the join between `parent` and `child`.
    *
    * Mirrors `querybuilder.py:258-288`: look for a FK from child→parent
    * first (FK columns live on the child), then parent→child (FK columns
    * live on the parent, e.g. orders.o_custkey → customer.c_custkey when
    * customer is the child node). Explicit hints are applied by the caller
    * (schema layer) before falling back here.
    */
  def resolveJoin(parent: String, child: String): JoinSpec = {
    val childFk = apply(child).foreignKeys.find(_.parentTable == parent)
    val parentFk = apply(parent).foreignKeys.find(_.parentTable == child)
    (childFk, parentFk) match {
      case (Some(fk), _) => JoinSpec(fk.parentColumns, fk.childColumns)
      case (_, Some(fk)) => JoinSpec(fk.childColumns, fk.parentColumns)
      case _             => throw ForeignKeyNotFoundError(parent, child)
    }
  }
}

object Catalog {

  /** Catalog for the driver's TPC-H-ish test data (`/root/testdata/sf*`).
    * In production this would be loaded from config or JDBC metadata; the
    * shape is identical.
    */
  val testData: Catalog = Catalog(
    Map(
      "region" -> TableMeta("region", Seq("r_regionkey")),
      "nation" -> TableMeta(
        "nation",
        Seq("n_nationkey"),
        Seq(ForeignKey("nation", Seq("n_regionkey"), "region", Seq("r_regionkey")))
      ),
      "customer" -> TableMeta(
        "customer",
        Seq("c_custkey"),
        Seq(ForeignKey("customer", Seq("c_nationkey"), "nation", Seq("n_nationkey")))
      ),
      "supplier" -> TableMeta(
        "supplier",
        Seq("s_suppkey"),
        Seq(ForeignKey("supplier", Seq("s_nationkey"), "nation", Seq("n_nationkey")))
      ),
      "part" -> TableMeta("part", Seq("p_partkey")),
      "orders" -> TableMeta(
        "orders",
        Seq("o_orderkey"),
        Seq(ForeignKey("orders", Seq("o_custkey"), "customer", Seq("c_custkey")))
      ),
      "lineitem" -> TableMeta(
        "lineitem",
        Seq("l_orderkey", "l_linenumber"),
        Seq(
          ForeignKey("lineitem", Seq("l_orderkey"), "orders", Seq("o_orderkey")),
          ForeignKey("lineitem", Seq("l_partkey"), "part", Seq("p_partkey")),
          ForeignKey("lineitem", Seq("l_suppkey"), "supplier", Seq("s_suppkey"))
        )
      ),
      "events" -> TableMeta("events", Seq("event_id")),
      "documents" -> TableMeta("documents", Seq("doc_id")),
      "embeddings" -> TableMeta("embeddings", Seq("vec_id"))
    )
  )
}
