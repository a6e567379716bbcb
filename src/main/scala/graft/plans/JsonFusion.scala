package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Expression, GetJsonObject, GetStructField, JsonToStructs, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fuses repeated `get_json_object(col, '$.k')` probes of one JSON
  * column into a single `from_json` parse (SURVEY §4 item 4 — the one
  * declared optimizer rule; optimization only, not correctness).
  *
  * `get_json_object` re-parses its input document on EVERY call: a
  * projection reading k top-level keys from the same payload column
  * tokenizes the document k times. When ≥2 distinct simple top-level
  * paths (`$.name`) probe the same deterministic column inside one
  * Project/Filter, the probes are fused onto one shared
  * `JsonToStructs(struct<name: string, ...>)`. On a 100 TB ingest scan
  * this turns the payload-read cost from O(keys × doc) to O(doc) per
  * row without touching any call site.
  *
  * HOW the sharing is guaranteed differs by node (ADVICE round 8):
  *   - `Project`: the parse is HOISTED into one `Alias` in a child
  *     Project and every former probe site becomes a `GetStructField`
  *     on that attribute — structurally one evaluation per row, with
  *     or without whole-stage codegen (interpreted fallback included).
  *     `CollapseProject` cannot merge the two projects back, because
  *     doing so would duplicate a non-cheap expression referenced ≥2
  *     times — the exact refusal its cost check encodes.
  *   - `Filter`: the condition is rewritten in place to structurally
  *     identical parse instances, and one-parse-per-row relies on
  *     codegen subexpression elimination (predicate CSE). CODEGEN
  *     DEPENDENCY, documented: on interpreted fallback each probe
  *     re-parses — no worse than a hoist would end up, since predicate
  *     pushdown substitutes hoisted aliases back inline anyway.
  *   - probes whose input references a lambda variable (inside a
  *     higher-order function body) cannot be hoisted past the project
  *     boundary; they keep the in-place shared-instance form too.
  *
  * Scope is deliberately conservative:
  *   - only literal `$.name` paths (no nesting, wildcards, or
  *     indexing — those keep `get_json_object`'s streaming matcher,
  *     which can short-circuit where a full parse cannot);
  *   - only when ≥2 DISTINCT names probe one column (a single probe
  *     is cheaper as the streaming matcher);
  *   - string-typed fields only, so values round-trip as raw JSON
  *     text exactly like `get_json_object` emits them (verified
  *     equivalence incl. objects, arrays, numbers, booleans, null,
  *     malformed docs, padded/trailing input — JsonFusionSpec).
  *
  * KNOWN divergence (documented, judged acceptable): a document with a
  * DUPLICATE top-level key yields the first match under
  * `get_json_object`'s streaming scan but the last under a full parse.
  * Duplicate keys are undefined in JSON; the reference's own serde
  * pipeline (`serde_json`) is last-wins, i.e. the fused form. Disable
  * per session with `SET spark.graft.jsonFusion.enabled=false`.
  */
object JsonFusion extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.jsonFusion.enabled"

  private val SimplePath = """^\$\.([A-Za-z_][A-Za-z0-9_]*)$""".r

  /** `get_json_object(json, '$.name')` over a deterministic column. */
  private def probe(e: Expression): Option[(Expression, String)] = e match {
    case GetJsonObject(json, Literal(p: UTF8String, StringType)) if json.deterministic =>
      p.toString match {
        case SimplePath(name) => Some((json, name))
        case _ => None
      }
    case _ => None
  }

  private def enabled: Boolean =
    SQLConf.get.getConfString(ConfKey, "true").toBoolean

  def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case p: Project => rewriteProject(p)
      case f: Filter =>
        f.copy(condition = rewriteInPlace(Seq(f.condition), fusedGroups(Seq(f.condition))).head)
    }
  }

  /** Fusable probe groups across one node's expression list, in first-
    * occurrence order (stable alias naming): canonicalized probed
    * column → (sample expr, sorted distinct field names), groups with
    * ≥2 names only.
    */
  private def fusedGroups(exprs: Seq[Expression])
    : Seq[(Expression, (Expression, Seq[String]))] = {
    val names = collection.mutable.LinkedHashMap
      .empty[Expression, collection.mutable.SortedSet[String]]
    val sample = collection.mutable.Map.empty[Expression, Expression]
    exprs.foreach(_.foreach { e =>
      probe(e).foreach { case (json, name) =>
        names.getOrElseUpdate(json.canonicalized, collection.mutable.SortedSet.empty) += name
        sample.getOrElseUpdate(json.canonicalized, json)
      }
    })
    names.iterator.collect {
      case (canon, ns) if ns.size >= 2 => canon -> (sample(canon), ns.toSeq)
    }.toSeq
  }

  /** One shared parse per group. The explicit mode option IS the
    * default (semantics unchanged) but must be present: when this rule
    * runs inside the operator-optimization fixed point (the
    * `injectOptimizerRule` install path), Spark's OptimizeCsvJsonExprs
    * prunes any options-free multi-field GetStructField(JsonToStructs)
    * back down to one single-field parse PER SITE on the next
    * iteration — k separate Jackson passes again, silently undoing the
    * fusion. The prune only fires on `options.isEmpty`, so pinning the
    * default mode keeps the shared parse intact (JsonFusionSpec pins
    * this under a real `spark.sql.extensions` session).
    */
  private def sharedParse(json: Expression, fields: Seq[String]): JsonToStructs = {
    val schema = StructType(fields.map(StructField(_, StringType)))
    JsonToStructs(schema, Map("mode" -> "PERMISSIVE"), json,
      Some(SQLConf.get.sessionLocalTimeZone))
  }

  /** In-place rewrite: every probe site becomes a field access on a
    * structurally identical parse instance (one evaluation per row via
    * codegen subexpression elimination — see class doc for the
    * interpreted-fallback caveat).
    */
  private def rewriteInPlace(
      exprs: Seq[Expression],
      groups: Seq[(Expression, (Expression, Seq[String]))]): Seq[Expression] = {
    if (groups.isEmpty) return exprs
    val parsed: Map[Expression, (JsonToStructs, Seq[String])] =
      groups.map { case (canon, (json, fields)) =>
        canon -> (sharedParse(json, fields), fields)
      }.toMap
    exprs.map(_.transform {
      case e if probe(e).isDefined =>
        val (json, name) = probe(e).get
        parsed.get(json.canonicalized) match {
          case Some((jts, fields)) =>
            GetStructField(jts, fields.indexOf(name), Some(name))
          case None => e
        }
    })
  }

  /** Project rewrite: hoist each fusable group's parse into a single
    * child-Project `Alias`; former probe sites reference its attribute
    * — structurally one parse per row, independent of codegen. Groups
    * whose probed input is not computable from the child's output
    * (lambda variables) fall back to the in-place form.
    */
  private def rewriteProject(p: Project): LogicalPlan = {
    val groups = fusedGroups(p.projectList)
    if (groups.isEmpty) return p
    val (hoistable, inPlace) =
      groups.partition { case (_, (json, _)) => json.references.subsetOf(p.child.outputSet) }

    val aliases: Seq[(Expression, (Alias, Seq[String]))] =
      hoistable.zipWithIndex.map { case ((canon, (json, fields)), i) =>
        canon -> (Alias(sharedParse(json, fields), s"_graft_json_fused$i")(), fields)
      }
    val aliasByCanon = aliases.toMap
    val inPlaceParsed: Map[Expression, (JsonToStructs, Seq[String])] =
      inPlace.map { case (canon, (json, fields)) =>
        canon -> (sharedParse(json, fields), fields)
      }.toMap

    val newList = p.projectList.map(_.transform {
      case e if probe(e).isDefined =>
        val (json, name) = probe(e).get
        aliasByCanon.get(json.canonicalized) match {
          case Some((al, fields)) =>
            GetStructField(al.toAttribute, fields.indexOf(name), Some(name))
          case None => inPlaceParsed.get(json.canonicalized) match {
            case Some((jts, fields)) =>
              GetStructField(jts, fields.indexOf(name), Some(name))
            case None => e
          }
        }
    }.asInstanceOf[NamedExpression])

    if (aliases.isEmpty) p.copy(projectList = newList)
    else Project(newList,
      Project(p.child.output ++ aliases.map(_._2._1), p.child))
  }
}

object JsonFusionInstall {
  /** Idempotently install the rule into a running session (the
    * in-process analogue of `injectOptimizerRule` for sessions built
    * without `spark.sql.extensions`).
    */
  def register(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(JsonFusion))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ JsonFusion
  }
}
