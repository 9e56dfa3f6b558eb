package graft.assemble

import graft.catalog.{Catalog, JoinSpec}
import graft.schema._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DataType, NumericType, StringType}

/** Compiles a schema [[Node]] tree into ONE DataFrame plan that denormalizes
  * the root table and its related tables into nested documents.
  *
  * Reference semantics: `pgsync/querybuilder.py:999-1023` (`build_queries`
  * post-order dispatch to `_root` / `_through` / `_non_through` /
  * `_children`), which emits a single SQL statement of LEFT OUTER LATERAL
  * joins + `JSON_AGG` / `JSON_BUILD_OBJECT`. The Spark-first re-expression:
  *
  *   - child one_to_many  → `child.groupBy(fk).agg(collect_list(struct(...)))`
  *     then `parent.join(agg, fk, "left_outer")` — no LATERAL needed
  *     (`querybuilder.py:843-997` `_non_through`).
  *   - many_to_many through → `through.join(child).groupBy(parentFk).agg(...)`
  *     (`querybuilder.py:584-841` `_through`), through-table PKs folded into
  *     lineage exactly as `_get_child_keys` does (`querybuilder.py:364-386`).
  *   - one_to_one → plain left join with a `struct` column.
  *   - `_id` = PK values joined with `|` (`pgsync/sync.py:527-535`,
  *     delimiter `constants.py:205`).
  *   - `_meta` = {table → {pk → sorted distinct values}}
  *     (`pgsync/transform.py:230-288`), built here with pure higher-order
  *     expressions (no UDF) from a flat lineage array carried through the
  *     aggregations.
  *
  * Scale notes: the whole tree is one Catalyst plan, so predicate pushdown /
  * column pruning reach the parquet scans; each one_to_many child costs one
  * shuffle (the groupBy) whose key is also the join key, so the subsequent
  * join reuses the exchange; child aggregation is map-side-combinable; small
  * one_to_one dimensions are broadcast by AQE. Arrays are sorted
  * (`sort_array`) to make output deterministic — the reference leaves order
  * unspecified and its tests sort before comparing
  * (`tests/testing_utils.py:52-68`).
  */
object DocAssembler {

  val IdColumn = "_id"
  val MetaColumn = "_meta"
  private val LineageCol = "__lineage"
  val IdDelimiter = "|" // constants.py:205

  /** A compiled child: DataFrame holding ONLY `keyCols` + `label` +
    * `lineageCol`, to be left-joined to the parent on
    * `parentCols(i) == keyCols(i)`.
    */
  private final case class ChildPlan(
      df: DataFrame,
      keyCols: Seq[String],
      parentCols: Seq[String],
      label: String,
      lineageCol: String,
      isMany: Boolean,
      /** Per-leg citext flag, aligned with keyCols/parentCols: the child
        * side was already lower()ed at the source, the parent side folds in
        * the join condition.
        */
      foldKeys: Seq[Boolean] = Nil
  )

  /** citext membership: comparisons on this column fold case
    * (`pgsync/base.py:61-69`; [[graft.catalog.TableMeta.caseInsensitive]]).
    * A leg folds when EITHER side's column is citext, like Postgres type
    * promotion for citext = text.
    */
  private def citext(catalog: Catalog, table: String, column: String): Boolean =
    catalog.tables.get(table).exists(_.caseInsensitive.contains(column))

  /** Assemble the document DataFrame for `root`'s tree: `_id`, doc fields,
    * child labels, `_meta`. `load` maps table name → DataFrame.
    * `rootScanFilter` restricts ONLY the root-position scan (used by the
    * incremental engine) — a plain `load` override could not distinguish the
    * root position from a self-referencing child scan of the same table.
    */
  def assemble(
      root: Node,
      load: String => DataFrame,
      catalog: Catalog,
      rootScanFilter: DataFrame => DataFrame = identity
  ): DataFrame = {
    val pks = primaryKeys(root, catalog)
    val pkKeep = pks.map(p => p -> s"__pk_$p")
    val dict = lineageDict(root, catalog)
    val built = buildNode(root, load, catalog, extraKeep = pkKeep,
      scanFilter = rootScanFilter, dictIdx = dict.zipWithIndex.toMap)
    val idCol =
      concat_ws(IdDelimiter, pkKeep.map { case (_, o) => col(o).cast(StringType) }: _*)
        .as(IdColumn)
    built.df.select(
      idCol +: built.fieldNames.map(col) :+ squashMeta(col(LineageCol), dict).as(MetaColumn): _*
    )
  }

  /** Plan-time dictionary of every (table, pk) pair the tree can emit into
    * lineage. Entries then shuffle as (int, value) instead of repeating the
    * constant table/pk strings per row ([[graft.expr.SquashMeta]] expands
    * them back when squashing `_meta`).
    */
  private def lineageDict(root: Node, catalog: Catalog): Seq[(String, String)] = {
    val buf = scala.collection.mutable.LinkedHashSet.empty[(String, String)]
    def visit(n: Node): Unit = {
      primaryKeys(n, catalog).foreach(p => buf += ((n.table, p)))
      n.children.foreach { c =>
        c.relationship.toSeq.flatMap(_.throughTables).foreach { t =>
          catalog.primaryKeys(t).foreach(p => buf += ((t, p)))
        }
        visit(c)
      }
    }
    visit(root)
    buf.toSeq
  }

  /** Documents as (`_id`, JSON string) — the shape the search sink indexes
    * (`pgsync/sync.py:1556-1579`).
    */
  def assembleJson(
      root: Node,
      load: String => DataFrame,
      catalog: Catalog
  ): DataFrame = {
    val df = assemble(root, load, catalog)
    val payload = df.columns.filterNot(_ == IdColumn).map(col).toIndexedSeq
    df.select(col(IdColumn), to_json(struct(payload: _*)).as("doc"))
  }

  def primaryKeys(node: Node, catalog: Catalog): Seq[String] =
    if (node.primaryKeyOverride.nonEmpty) node.primaryKeyOverride
    else catalog.primaryKeys(node.table)

  /** Resolve every child's join spec — explicit `foreign_key` hint wins,
    * else catalog FK introspection (`querybuilder.py:161-324` semantics);
    * through children get a (through table, child leg) pair. The ONE place
    * these rules live: the assembler, the incremental walk-up chains, and
    * the layout advisor all derive from it.
    */
  private[graft] def resolveChildSpecs(
      node: Node,
      catalog: Catalog
  ): Seq[(Node, JoinSpec, Option[(String, JoinSpec)])] =
    node.children.map { c =>
      val rel = c.relationship.get
      rel.throughTables.headOption match {
        case Some(through) =>
          // parent—through leg + through—child leg (querybuilder.py:298-324).
          val parentLeg = rel.foreignKey
            .map(fk => JoinSpec(fk.parent, fk.child))
            .getOrElse(catalog.resolveJoin(node.table, through))
          val childLeg = catalog.resolveJoin(through, c.table)
          (c, parentLeg, Some((through, childLeg)))
        case None =>
          val spec = rel.foreignKey
            .map(fk => JoinSpec(fk.parent, fk.child))
            .getOrElse(catalog.resolveJoin(node.table, c.table))
          (c, spec, None)
      }
    }

  /** Compiled node: DataFrame + ordered top-level doc field names. The frame
    * holds the doc fields, one column per child label, `__lineage`, and the
    * requested `extraKeep` (base column → output name) passthroughs.
    */
  private final case class Built(df: DataFrame, fieldNames: Seq[String])

  private def buildNode(
      node: Node,
      load: String => DataFrame,
      catalog: Catalog,
      extraKeep: Seq[(String, String)],
      scanFilter: DataFrame => DataFrame = identity,
      dictIdx: Map[(String, String), Int]
  ): Built = {
    val base = scanFilter(load(node.table))
    val pks = primaryKeys(node, catalog)

    // Configured columns, or every base column (node.py:141-162).
    val colRefs =
      if (node.columns.nonEmpty) node.columns
      else base.columns.toSeq.map(ColumnRef(_))

    // Validation up front, with the reference's error shapes: unknown column
    // (ColumnNotFoundError, node.py:298-302) and duplicate child labels.
    val available = base.columns.toSet
    colRefs.map(_.base).find(c => !available.contains(c)).foreach { c =>
      throw SchemaError(s"Column '$c' not present on table '${node.table}'")
    }
    val dupLabels = node.children.groupBy(_.label).collect { case (l, cs) if cs.size > 1 => l }
    if (dupLabels.nonEmpty)
      throw SchemaError(s"Duplicate child labels on '${node.table}': ${dupLabels.mkString(", ")}")

    // Child join specs resolved at build time (querybuilder.py:161-296
    // semantics: explicit hint wins, else catalog FK metadata, both
    // directions).
    val childSpecs = resolveChildSpecs(node, catalog)

    // Column pruning: only the base columns actually needed, so the pruned
    // schema reaches the parquet scan.
    val needed = (colRefs.map(_.base) ++ pks ++ extraKeep.map(_._1) ++
      childSpecs.flatMap(_._2.parentColumns)).distinct
    var df = base.select(needed.map(col): _*)

    // Doc fields with JSON-path projection (node.py:200-303), then the
    // node-level transforms replace → rename → concat (transform.py:211-216)
    // as pure column rewrites.
    var fields: Seq[(String, Column)] = colRefs.map { cr =>
      val c =
        if (cr.hasPath) get_json_object(col(cr.base), cr.jsonPath)
        else col(cr.base)
      cr.alias -> c
    }
    val pruned = df
    fields = applyTransforms(node.transform, fields,
      resolveType = c => scala.util.Try(pruned.select(c).schema.head.dataType).toOption)

    // Own lineage entries: one per PK column (querybuilder.py:364-386),
    // dictionary-encoded — (table, pk) are plan-time constants.
    val ownLineage = array(pks.map { p =>
      struct(
        lit(dictIdx((node.table, p))).as("k"),
        col(p).cast(StringType).as("value")
      )
    }: _*)

    // Attach children.
    var lineageExprs: Seq[Column] = Seq(ownLineage)
    var childValueCols: Seq[(String, Column)] = Nil
    childSpecs.zipWithIndex.foreach { case ((childNode, spec, throughInfo), i) =>
      // Self-referencing one_to_many joins on OR of the FK legs
      // (querybuilder.py:575-577). The groupBy-then-join translation is
      // wrong there (grouping key ≠ join key), so matches are resolved
      // against the parent first, then aggregated per parent PK.
      val selfRefMany = childNode.table == node.table && throughInfo.isEmpty &&
        childNode.relationship.get.relType == RelType.OneToMany &&
        spec.parentColumns.length > 1
      // citext legs (per join column pair): parent side folds in the join
      // condition, child side folds at its key source (finishChild) so
      // case-variant FK values aggregate as ONE key. Self-referencing
      // OR-joins rejoin the parent on its PK and are not folded.
      val foldLegs: Seq[Boolean] = throughInfo match {
        case Some((through, _)) =>
          spec.parentColumns.zip(spec.childColumns).map { case (p, c) =>
            citext(catalog, node.table, p) || citext(catalog, through, c)
          }
        case None =>
          spec.parentColumns.zip(spec.childColumns).map { case (p, c) =>
            citext(catalog, node.table, p) || citext(catalog, childNode.table, c)
          }
      }
      val plan = throughInfo match {
        case Some((through, childLeg)) =>
          buildThroughChild(childNode, through, spec, childLeg, load, catalog, i, dictIdx, foldLegs)
        case None if selfRefMany =>
          buildSelfRefChild(childNode, spec, df, pks, load, catalog, i, dictIdx)
        case None =>
          buildDirectChild(childNode, spec, load, catalog, i, dictIdx, foldLegs)
      }
      val cond = plan.parentCols
        .zip(plan.keyCols)
        .zipAll(plan.foldKeys, ("", ""), false)
        .map {
          case ((p, k), fold) if fold => lower(df(p)) === plan.df(k)
          case ((p, k), _)            => df(p) === plan.df(k)
        }
        .reduce { (a, b) =>
          // one_to_one self-reference keeps the reference's OR-join row
          // semantics (row per match, like the SQL join it compiles to).
          if (childNode.table == node.table && throughInfo.isEmpty && !selfRefMany) a || b
          else a && b
        }
      df = df.join(plan.df, cond, "left_outer").drop(plan.keyCols: _*)
      val value =
        if (plan.isMany)
          coalesce(col(plan.label), array().cast(df.schema(plan.label).dataType))
        else col(plan.label)
      childValueCols = childValueCols :+ (plan.label -> value)
      lineageExprs = lineageExprs :+ coalesce(
        col(plan.lineageCol),
        array().cast(df.schema(plan.lineageCol).dataType)
      )
    }

    val outCols =
      fields.map { case (n, c) => c.as(n) } ++
        childValueCols.map { case (n, c) => c.as(n) } :+
        concat(lineageExprs: _*).as(LineageCol)
    val keepExprs = extraKeep.map { case (b, o) => col(b).as(o) }
    val out = df.select(outCols ++ keepExprs: _*)
    Built(out, fields.map(_._1) ++ childValueCols.map(_._1))
  }

  /** Non-through child (`querybuilder.py:843-997`): aggregate (one_to_many)
    * or project (one_to_one) the child, keyed by its FK columns.
    */
  private def buildDirectChild(
      child: Node,
      spec: JoinSpec,
      load: String => DataFrame,
      catalog: Catalog,
      idx: Int,
      dictIdx: Map[(String, String), Int],
      foldKeys: Seq[Boolean] = Nil
  ): ChildPlan = {
    val keyNames = spec.childColumns.indices.map(i => s"__k${idx}_$i")
    val built =
      buildNode(child, load, catalog, extraKeep = spec.childColumns.zip(keyNames),
        dictIdx = dictIdx)
    finishChild(child, built, keyNames, spec.parentColumns, s"__lineage_c$idx",
      foldKeys = foldKeys)
  }

  /** Self-referencing one_to_many child (`querybuilder.py:575-577` OR
    * semantics): resolve (parent pk, child row) matches as a UNION of one
    * equi-join per FK leg (deduplicated — a row matching several legs
    * appears once, as in the SQL OR), then aggregate per parent PK. The
    * resulting plan joins back to the parent on its PK with plain equality.
    */
  private def buildSelfRefChild(
      child: Node,
      spec: JoinSpec,
      parentDf: DataFrame,
      parentPks: Seq[String],
      load: String => DataFrame,
      catalog: Catalog,
      idx: Int,
      dictIdx: Map[(String, String), Int]
  ): ChildPlan = {
    val childPks = primaryKeys(child, catalog)
    val pkNames = childPks.indices.map(i => s"__cpk${idx}_$i")
    val legNames = spec.childColumns.indices.map(i => s"__leg${idx}_$i")
    val built = buildNode(
      child,
      load,
      catalog,
      extraKeep = spec.childColumns.zip(legNames) ++ childPks.zip(pkNames),
      dictIdx = dictIdx
    )
    val keyNames = parentPks.indices.map(i => s"__k${idx}_$i")
    val docCol = struct(built.fieldNames.map(col): _*)
    // equi-join per leg, then union + dedup on (parent pk, child pk)
    val matches = spec.parentColumns.zip(legNames).map { case (pCol, legName) =>
      parentDf
        .select(parentPks.zip(keyNames).map { case (p, k) => col(p).as(k) } :+ col(pCol).as("__pv"): _*)
        .join(built.df, col("__pv") === built.df(legName))
        .select(keyNames.map(col) ++ pkNames.map(col) :+ docCol.as("__doc") :+ col(LineageCol).as("__lin"): _*)
    }.reduce(_ unionAll _).dropDuplicates(keyNames ++ pkNames)

    val lineageName = s"__lineage_c$idx"
    val rel = child.relationship.get
    val value = rel.variant match {
      case Variant.Scalar => col("__doc")(built.fieldNames.head)
      case Variant.Object => col("__doc")
    }
    val out = matches
      .groupBy(keyNames.map(col): _*)
      .agg(
        sort_array(collect_list(value)).as(child.label),
        flatten(collect_list(col("__lin"))).as(lineageName)
      )
    ChildPlan(out, keyNames, parentPks, child.label, lineageName, isMany = true)
  }

  /** Through child (`querybuilder.py:584-841`): join child to the through
    * table on the child leg, aggregate grouped by the through table's
    * parent-side FK columns; through-table PKs join the lineage
    * (`querybuilder.py:764-783`).
    */
  private def buildThroughChild(
      child: Node,
      through: String,
      parentLeg: JoinSpec,
      childLeg: JoinSpec,
      load: String => DataFrame,
      catalog: Catalog,
      idx: Int,
      dictIdx: Map[(String, String), Int],
      foldKeys: Seq[Boolean] = Nil
  ): ChildPlan = {
    val cNames = childLeg.childColumns.indices.map(i => s"__c${idx}_$i")
    val built =
      buildNode(child, load, catalog, extraKeep = childLeg.childColumns.zip(cNames),
        dictIdx = dictIdx)

    val throughPks = catalog.primaryKeys(through)
    val keyNames = parentLeg.childColumns.indices.map(i => s"__k${idx}_$i")
    val keyExprs = parentLeg.childColumns.zip(keyNames).map { case (b, o) => col(b).as(o) }
    val passCols = (childLeg.parentColumns ++ throughPks).distinct
    val t = load(through).select(keyExprs ++ passCols.map(col): _*)

    val throughLineage = array(throughPks.map { p =>
      struct(
        lit(dictIdx((through, p))).as("k"),
        col(p).cast(StringType).as("value")
      )
    }: _*)

    val joined = t
      .join(
        built.df,
        childLeg.parentColumns.zip(cNames).map { case (a, b) => t(a) === built.df(b) }
          .reduce(_ && _)
      )
      .withColumn("__through_lineage", throughLineage)

    finishChild(
      child,
      Built(joined, built.fieldNames),
      keyNames,
      parentLeg.parentColumns,
      s"__lineage_c$idx",
      extraLineage = Some(col("__through_lineage")),
      foldKeys = foldKeys
    )
  }

  /** Shared tail: shape the child value per (type, variant) and aggregate
    * one_to_many groups. Output frame holds ONLY keys + label + lineage, so
    * self-referencing joins cannot collide on column names.
    */
  private def finishChild(
      child: Node,
      built: Built,
      keyNames: Seq[String],
      parentCols: Seq[String],
      lineageName: String,
      extraLineage: Option[Column] = None,
      foldKeys: Seq[Boolean] = Nil
  ): ChildPlan = {
    val rel = child.relationship.get
    // citext legs: lower() the child key AT THE SOURCE so case-variant FK
    // values group/join as one key (the parent side folds in the caller's
    // join condition)
    val builtDf = keyNames.zip(foldKeys).foldLeft(built.df) {
      case (d, (k, true)) => d.withColumn(k, lower(col(k)))
      case (d, _)         => d
    }
    val built2 = Built(builtDf, built.fieldNames)
    val docValue: Column = rel.variant match {
      case Variant.Scalar =>
        // scalar variant: bare value of the (single) configured column
        // (querybuilder.py:936-961 scalar branch).
        col(
          built.fieldNames.headOption.getOrElse(
            throw SchemaError(s"scalar variant requires a column on '${child.table}'")
          )
        )
      case Variant.Object =>
        struct(built.fieldNames.map(col): _*)
    }
    val rowLineage = extraLineage match {
      case Some(extra) => concat(col(LineageCol), extra)
      case None        => col(LineageCol)
    }

    rel.relType match {
      case RelType.OneToOne =>
        val out = built2.df.select(
          keyNames.map(col) ++ Seq(docValue.as(child.label), rowLineage.as(lineageName)): _*
        )
        ChildPlan(out, keyNames, parentCols, child.label, lineageName, isMany = false,
          foldKeys = foldKeys)
      case RelType.OneToMany =>
        val out = built2.df
          .groupBy(keyNames.map(col): _*)
          .agg(
            sort_array(collect_list(docValue)).as(child.label),
            flatten(collect_list(rowLineage)).as(lineageName)
          )
        ChildPlan(out, keyNames, parentCols, child.label, lineageName, isMany = true,
          foldKeys = foldKeys)
    }
  }

  /** Node-level transforms as column rewrites: replace → rename → concat
    * (`pgsync/transform.py:211-216`; order documented in reference
    * README.md:249). No UDFs — `regexp_replace` / alias change / `concat_ws`.
    */
  private[graft] def applyTransforms(
      t: TransformSpec,
      fields: Seq[(String, Column)],
      resolveType: Column => Option[DataType] = _ => None
  ): Seq[(String, Column)] = {
    if (t.isEmpty) return fields
    // replace: substring find/replace per field (transform.py:114-209).
    var out = fields.map { case (n, c) =>
      t.replace.get(n) match {
        case Some(subs) =>
          val replaced = subs.foldLeft(c) { case (cc, (from, to)) =>
            regexp_replace(
              cc,
              java.util.regex.Pattern.quote(from),
              java.util.regex.Matcher.quoteReplacement(to)
            )
          }
          n -> replaced
        case None => n -> c
      }
    }
    // rename (transform.py:18-64).
    out = out.map { case (n, c) => t.rename.getOrElse(n, n) -> c }
    // concat: destination = delimiter-join; missing keys keep the literal
    // name (transform.py:66-112). The reference joins `filter(None, values)`
    // — Python-falsy values (null, 0, "", false) are all dropped, not just
    // nulls, so each part is nulled when falsy for its resolved type before
    // concat_ws (which then drops the nulls).
    t.concat.foreach { spec =>
      val parts = spec.columns.map { cn =>
        out.find(_._1 == cn)
          .map { case (_, c) => falsyToNull(c, resolveType(c)).cast(StringType) }
          .getOrElse(lit(cn))
      }
      out = out :+ (spec.destination -> concat_ws(spec.delimiter, parts: _*))
    }
    // geo: destination = geo_point / geo_shape value assembled from source
    // doc fields (post-rename names, like concat). Unlike concat there is no
    // literal fallback — a missing source column is a schema error, not data.
    t.geo.foreach { g =>
      import graft.functions.{GeoFunctions => GF}
      def src(name: String): Column = out
        .find(_._1 == name)
        .map(_._2)
        .getOrElse(throw graft.schema.SchemaError(
          s"geo '${g.destination}' source column '$name' is not a field of this node"))
      val value = (g.kind, g.lat, g.lon, g.wkt, g.geojson) match {
        case ("point", Some(la), Some(lo), None, None) => GF.geoPoint(src(la), src(lo))
        case ("point", None, None, Some(w), None)      => GF.geoPointFromWkt(src(w))
        case ("point", None, None, None, Some(j))      => GF.geoPointFromGeoJson(src(j))
        case ("shape", _, _, Some(w), None)            => GF.geoShapeFromWkt(src(w))
        case ("shape", _, _, None, Some(j))            => GF.geoShapeFromGeoJson(src(j))
        case _ =>
          throw graft.schema.SchemaError(s"geo '${g.destination}' spec is invalid") // unreachable post-parse
      }
      out = out :+ (g.destination -> value)
    }
    out
  }

  /** Null out Python-falsy values per type (`transform.py:97` uses
    * `filter(None, values)`): "" for strings, 0 for numerics, false for
    * booleans. Unknown types pass through (null-only dropping).
    */
  private def falsyToNull(c: Column, t: Option[DataType]): Column = t match {
    case Some(StringType)     => when(c === lit(""), lit(null)).otherwise(c)
    case Some(BooleanType)    => when(!c, lit(null)).otherwise(c)
    case Some(_: NumericType) => when(c === lit(0), lit(null)).otherwise(c)
    case _                    => c
  }

  /** `_meta` squash (`pgsync/transform.py:230-288`): flatten the lineage
    * array into {table → {pk → sorted distinct values}} — single-pass native
    * expression ([[graft.expr.SquashMeta]]); per-row, no extra shuffle, no
    * UDF boundary.
    */
  private[graft] def squashMeta(lineage: Column, dict: Seq[(String, String)] = Nil): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expr.SquashMeta(org.apache.spark.sql.GraftColumnBridge.expression(lineage), dict)
    )
}
