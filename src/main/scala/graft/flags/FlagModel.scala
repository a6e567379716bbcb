package graft.flags

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Minimal JSON value model for flag configs and property contexts —
  * mirrors the reference's `serde_json::Value` usage
  * (`/root/reference/src/feature_flags.rs`). Jackson (already on the
  * Spark classpath) does the parsing; no extra dependency.
  */
sealed trait JsonV
case object JNull extends JsonV
final case class JBool(v: Boolean) extends JsonV
final case class JNum(v: Double) extends JsonV
final case class JStr(v: String) extends JsonV
final case class JArr(v: Seq[JsonV]) extends JsonV
final case class JObj(v: Map[String, JsonV]) extends JsonV

object JsonV {
  private val mapper = new ObjectMapper()

  def parse(raw: String): JsonV = fromNode(mapper.readTree(raw))

  def fromNode(n: JsonNode): JsonV =
    if (n == null || n.isNull) JNull
    else if (n.isBoolean) JBool(n.asBoolean())
    else if (n.isNumber) JNum(n.asDouble())
    else if (n.isTextual) JStr(n.asText())
    else if (n.isArray) JArr(n.elements().asScala.map(fromNode).toSeq)
    else JObj(n.properties().asScala.map(e => e.getKey -> fromNode(e.getValue)).toMap)
}

/** Flag definitions (`feature_flags.rs:78-168` serde structs). */
final case class FlagVariant(
    key: String,
    rolloutPercentage: Double = 0.0,
    payload: Option[JsonV] = None)

final case class PropertyFilter(
    key: String,
    value: JsonV,
    operator: Option[String] = None,       // default "eq"
    propertyType: Option[String] = None,   // "person" (default) | "group"
    groupType: Option[String] = None)

final case class FlagCondition(
    properties: Seq[PropertyFilter] = Nil,
    rolloutPercentage: Option[Double] = None,
    variants: Seq[FlagVariant] = Nil,
    variant: Option[String] = None)

final case class FeatureFlag(
    key: String,
    active: Boolean = true,
    flagType: String = "boolean",          // boolean | multivariate
    rolloutPercentage: Option[Double] = None,
    variants: Seq[FlagVariant] = Nil,
    payload: Option[JsonV] = None,
    variantPayloads: Map[String, JsonV] = Map.empty,
    conditions: Seq[FlagCondition] = Nil,
    groupType: Option[String] = None,
    evaluationEnvironments: Option[Seq[String]] = None,
    salt: Option[String] = None,
    id: Option[Long] = None,
    version: Option[Long] = None,
    description: Option[String] = None)

/** Evaluation context (`FeatureFlagContext`): merged person props,
  * request groups, group props.
  */
final case class FlagContext(
    distinctId: String,
    personProperties: Map[String, JsonV] = Map.empty,
    groups: Map[String, String] = Map.empty,
    groupProperties: Map[String, Map[String, JsonV]] = Map.empty)

final case class FlagResult(
    key: String,
    value: JsonV,                          // JBool or JStr(variant)
    payload: Option[JsonV],
    active: Boolean,
    reason: String,                        // disabled|no_match|out_of_rollout|match
    conditionIndex: Option[Int])

final case class FlagEvalOptions(
    flagKeys: Option[Set[String]] = None,
    evaluationEnvironments: Option[Set[String]] = None)

/** F1: flag-store parse — `{flags:[...]}` envelope or bare array
  * (`feature_flags.rs:28-37`).
  */
object FlagStore {
  def fromJson(raw: String): Seq[FeatureFlag] = {
    val v = JsonV.parse(raw.trim)
    val arr = v match {
      case JArr(items) => items
      case JObj(m) => m.getOrElse("flags", JArr(Nil)) match {
        case JArr(items) => items
        case _ => Nil
      }
      case _ => Nil
    }
    arr.collect { case o: JObj => parseFlag(o) }
  }

  private def str(o: JObj, k: String): Option[String] =
    o.v.get(k).collect { case JStr(s) => s }
  private def num(o: JObj, k: String): Option[Double] =
    o.v.get(k).collect { case JNum(n) => n }
  private def arr(o: JObj, k: String): Seq[JsonV] =
    o.v.get(k).collect { case JArr(a) => a }.getOrElse(Nil)

  private def parseVariant(o: JObj): FlagVariant =
    FlagVariant(str(o, "key").getOrElse(""), num(o, "rollout_percentage").getOrElse(0.0),
      o.v.get("payload").filter(_ != JNull))

  private def parseFilter(o: JObj): PropertyFilter =
    PropertyFilter(
      key = str(o, "key").getOrElse(""),
      value = o.v.getOrElse("value", JNull),
      operator = str(o, "operator").orElse(str(o, "op")), // serde alias "op" (feature_flags.rs PropertyFilter)
      propertyType = str(o, "type"),
      groupType = str(o, "group_type"))

  private def parseCondition(o: JObj): FlagCondition =
    FlagCondition(
      properties = arr(o, "properties").collect { case f: JObj => parseFilter(f) },
      rolloutPercentage = num(o, "rollout_percentage"),
      variants = arr(o, "variants").collect { case v: JObj => parseVariant(v) },
      variant = str(o, "variant"))

  private def parseFlag(o: JObj): FeatureFlag =
    FeatureFlag(
      key = str(o, "key").getOrElse(""),
      active = o.v.get("active").collect { case JBool(b) => b }.getOrElse(true),
      flagType = str(o, "type").getOrElse("boolean"),
      rolloutPercentage = num(o, "rollout_percentage"),
      variants = arr(o, "variants").collect { case v: JObj => parseVariant(v) },
      payload = o.v.get("payload").filter(_ != JNull),
      variantPayloads = o.v.get("variant_payloads").collect {
        case JObj(m) => m }.getOrElse(Map.empty),
      conditions = arr(o, "conditions").collect { case c: JObj => parseCondition(c) },
      groupType = str(o, "group_type"),
      evaluationEnvironments = o.v.get("evaluation_environments").collect {
        case JArr(a) => a.collect { case JStr(s) => s } },
      salt = str(o, "salt"),
      id = num(o, "id").map(_.toLong),
      version = num(o, "version").map(_.toLong),
      description = str(o, "description"))
}
