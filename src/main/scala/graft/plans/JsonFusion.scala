package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{
  Expression, GetJsonObject, GetStructField, JsonToStructs, Literal}
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
  * Project/Filter, each probe is rewritten to a field access on one
  * shared `JsonToStructs(struct<name: string, ...>)` — the rewritten
  * expressions are structurally identical, so whole-stage codegen's
  * subexpression elimination evaluates the parse once per row. On a
  * 100 TB ingest scan this turns the payload-read cost from
  * O(keys × doc) to O(doc) per row without touching any call site.
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
      case p: Project =>
        p.copy(projectList = rewriteAll(p.projectList).map(
          _.asInstanceOf[org.apache.spark.sql.catalyst.expressions.NamedExpression]))
      case f: Filter =>
        f.copy(condition = rewriteAll(Seq(f.condition)).head)
    }
  }

  /** Rewrite every fusable probe across one node's expression list. */
  private def rewriteAll(exprs: Seq[Expression]): Seq[Expression] = {
    // group probe names by the (canonicalized) probed column
    val names = collection.mutable.Map.empty[Expression, collection.mutable.SortedSet[String]]
    val sample = collection.mutable.Map.empty[Expression, Expression]
    exprs.foreach(_.foreach { e =>
      probe(e).foreach { case (json, name) =>
        names.getOrElseUpdate(json.canonicalized, collection.mutable.SortedSet.empty) += name
        sample.getOrElseUpdate(json.canonicalized, json)
      }
    })
    val fusable = names.filter(_._2.size >= 2)
    if (fusable.isEmpty) return exprs

    val tz = Some(SQLConf.get.sessionLocalTimeZone)
    // one parse expression per probed column; identical instances at
    // every former probe site → codegen subexpression elimination.
    // The explicit mode option IS the default (semantics unchanged) but
    // must be present: when this rule runs inside the operator-
    // optimization fixed point (the `injectOptimizerRule` install
    // path), Spark's OptimizeCsvJsonExprs prunes any options-free
    // multi-field GetStructField(JsonToStructs) back down to one
    // single-field parse PER SITE on the next iteration — k separate
    // Jackson passes again, silently undoing the fusion. The rule
    // only fires on `options.isEmpty`, so pinning the default mode
    // keeps the shared parse intact (JsonFusionSpec pins this under a
    // real `spark.sql.extensions` session).
    val parsed: Map[Expression, (JsonToStructs, Seq[String])] =
      fusable.map { case (canon, nameSet) =>
        val fields = nameSet.toSeq
        val schema = StructType(fields.map(StructField(_, StringType)))
        canon -> (JsonToStructs(schema, Map("mode" -> "PERMISSIVE"), sample(canon), tz), fields)
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
