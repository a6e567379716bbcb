package graft.flags

/** F7: response shaping for the `/decide` and `/flags` read paths —
  * `to_maps`/`to_flag_details` (`feature_flags.rs:170-204,408-451`) and
  * the endpoint response assembly (`lib.rs:1053-1147`). Driver-side
  * Scala (point lookups over the replayed person dimension); bulk
  * backfills use the same values via [[FlagColumns]].
  */
object FlagResponse {

  /** JSON rendering for response assembly (stable key order: insertion). */
  def render(v: JsonV): String = v match {
    case JNull => "null"
    case JBool(b) => b.toString
    case JNum(n) => if (n.isWhole && math.abs(n) < 1e15) n.toLong.toString else n.toString
    case JStr(s) => "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    case JArr(items) => items.map(render).mkString("[", ",", "]")
    case JObj(m) => m.map { case (k, x) => render(JStr(k)) + ":" + render(x) }.mkString("{", ",", "}")
  }

  /** `to_maps(version)`: (featureFlags, featureFlagPayloads); v2 hides
    * inactive flags entirely.
    */
  def toMaps(results: Seq[FlagResult], version: Int): (Map[String, JsonV], Map[String, JsonV]) = {
    val visible = results.filter(r => version != 2 || r.active)
    val flags = visible.map(r => r.key -> r.value).toMap
    val payloads = visible.flatMap(r => r.payload.map(r.key -> _)).toMap
    (flags, payloads)
  }

  /** `flag_detail`: enabled/variant/metadata/reason object per flag. */
  def flagDetail(r: FlagResult, flag: Option[FeatureFlag] = None): JObj = {
    val enabled = r.value match {
      case JBool(b) => b
      case _ => true // variant string ⇒ enabled
    }
    val base = Vector(
      "key" -> JStr(r.key),
      "enabled" -> JBool(enabled)) ++
      (r.value match { case JStr(v) => Vector("variant" -> JStr(v)); case _ => Vector() })
    val metadata = flag.toVector.flatMap { f =>
      f.id.map(i => "id" -> JNum(i.toDouble)).toVector ++
        f.version.map(v => "version" -> JNum(v.toDouble)) ++
        f.description.map(d => "description" -> JStr(d))
    } ++ r.payload.map(p => "payload" -> JStr(render(p)))
    val reason = Vector("code" -> JStr(r.reason)) ++
      r.conditionIndex.map(i => "condition_index" -> JNum(i.toDouble))
    JObj((base ++
      (if (metadata.nonEmpty) Vector("metadata" -> JObj(metadata.toMap)) else Vector()) :+
      ("reason" -> JObj(reason.toMap))).toMap)
  }

  def toFlagDetails(results: Seq[FlagResult], flags: Seq[FeatureFlag]): Map[String, JsonV] = {
    val byKey = flags.map(f => f.key -> f).toMap
    results.map(r => r.key -> (flagDetail(r, byKey.get(r.key)): JsonV)).toMap
  }

  /** `/decide` response (lib.rs:1060-1086): api token precedence is
    * body > token > header > env default.
    */
  def decideResponse(
      results: Seq[FlagResult], version: Int,
      apiToken: Option[String],
      sessionRecordingEndpoint: Option[String]): JObj = {
    val (flags, payloads) = toMaps(results, version)
    JObj(Map(
      "config" -> JObj(apiToken.map(t => "apiToken" -> JStr(t)).toMap),
      "featureFlags" -> JObj(flags),
      "featureFlagPayloads" -> JObj(payloads),
      "sessionRecording" -> (sessionRecordingEndpoint match {
        case Some(e) => JObj(Map("endpoint" -> JStr(e), "proxy" -> JBool(true)))
        case None => JBool(false)
      })))
  }

  /** `/flags?v=&config=` response (lib.rs:1109-1147). */
  def flagsResponse(
      results: Seq[FlagResult], flags: Seq[FeatureFlag], version: Int,
      includeConfig: Boolean, requestId: String, evaluatedAtMillis: Long,
      sessionRecordingEndpoint: Option[String]): JObj = {
    val (flagMap, payloads) = toMaps(results, version)
    val base = Vector(
      "featureFlags" -> JObj(flagMap),
      "featureFlagPayloads" -> JObj(payloads),
      "flags" -> JObj(toFlagDetails(results, flags)),
      "errorsWhileComputingFlags" -> JBool(false),
      "requestId" -> JStr(requestId),
      "evaluatedAt" -> JNum(evaluatedAtMillis.toDouble))
    val cfg = if (includeConfig) Vector(
      "sessionRecording" -> JObj(
        (sessionRecordingEndpoint.map(e => "endpoint" -> JStr(e)).toVector :+
          ("proxy" -> (JBool(true): JsonV))).toMap),
      "supportedCompression" -> JArr(Seq(JStr("gzip"), JStr("gzip-js"))))
    else Vector()
    JObj((base ++ cfg).toMap)
  }
}
