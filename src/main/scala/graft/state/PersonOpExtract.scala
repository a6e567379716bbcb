package graft.state

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** T1: extract [[PersonOp]]s from the canonical event table — the glue
  * between ingest output and the person-state replay, mirroring the
  * reference's per-endpoint update builders
  * (`/root/reference/src/persons.rs:360-456`, `lib.rs:690-718`):
  *
  *   - capture events: `properties.$set` / `$set_once` / `$unset`
  *     (`update_from_capture`); an event with none of them is still an
  *     `ensure_person` touch (empty op — registration, no version bump);
  *   - `$identify`: bare properties act as `$set` unless `$set`/
  *     `$set_once` keys are present (`update_from_identify`), the
  *     routed `extra.$set_once` (browser top-level `$set_once`) extends
  *     set_once, and `$anon_distinct_id` (item-level → extra, else
  *     `properties.$anon_distinct_id`) emits the implicit alias edge
  *     when it differs from the distinct_id;
  *   - `$create_alias`: the explicit edge from `extra.alias`;
  *   - `$engage`: `extra.$set` / `$set_once` / `$unset`
  *     (`update_from_engage`);
  *   - `$unset` payloads normalize like `extract_unset`
  *     (persons.rs:439-456): array → its string elements (non-strings
  *     dropped), object → its keys, bare string → that one key;
  *   - `$groupidentify` / `$snapshot` rows touch no person state
  *     (their distinct_id is a group key / sentinel).
  *
  * Everything is codegen'd Column logic over the already-parsed JSON
  * payload columns — one map-only pass producing the compact op table
  * that then shuffles once by identity component in [[Replay.persons]].
  */
object PersonOpExtract {

  private val mapSS: DataType = DataType.fromDDL("map<string,string>")
  private val emptyMap = typedLit(Map.empty[String, String])
  private val emptyArr = typedLit(Seq.empty[String])

  private def jmap(c: Column): Column = coalesce(from_json(c, mapSS), emptyMap)

  /** `extract_unset` (persons.rs:439-456) over the raw JSON text of the
    * `$unset` value: `[..]` → string elements only (variant-typed parse
    * drops non-strings, exactly the reference's `filter_map(as_str)`),
    * `{..}` → keys, scalar string → itself. Malformed bracket-leading
    * strings fall back to the single-string form.
    */
  def unsetKeys(v: Column): Column = {
    val varr = from_json(v, DataType.fromDDL("array<variant>"))
    val strElems = transform(
      filter(varr, e => schema_of_variant(e) === "STRING"),
      e => variant_get(e, "$", "string"))
    when(v.isNull, emptyArr)
      .when(v.startsWith("["), coalesce(strElems, array(v)))
      .when(v.startsWith("{"), coalesce(map_keys(from_json(v, mapSS)), array(v)))
      .otherwise(array(v))
  }

  /** events → (raw_id, ord, set, set_once, unset, alias_to), one op per
    * person-touching event. `ord` must be a total order over the
    * event's position in the ingest stream (the replay folds by it).
    */
  def fromCanonical(events: DataFrame, ord: Column): DataFrame = {
    val ev = col("event")
    val pm = jmap(col("properties"))
    val pp = jmap(col("person_properties"))
    val extra = col("extra")

    // identify: $set/$set_once keys present → routed; else bare props
    val hasDollar = map_contains_key(pp, "$set") || map_contains_key(pp, "$set_once")
    val idSet = when(hasDollar, jmap(element_at(pp, "$set")))
      .otherwise(pp)
    val idSetOnce = map_concat(
      when(hasDollar, jmap(element_at(pp, "$set_once"))).otherwise(emptyMap),
      // extra.$set_once extends (browser $identify route, persons.rs:395-398);
      // map_concat in Spark 4 is last-wins on duplicate keys = extend semantics
      jmap(element_at(extra, "$set_once")))
    val anon = coalesce(element_at(extra, "$anon_distinct_id"),
      element_at(pp, "$anon_distinct_id"))

    events
      .filter(ev =!= "$groupidentify" && ev =!= "$snapshot")
      .select(
        col("distinct_id").as("raw_id"),
        ord.as("ord"),
        when(ev === "$identify", idSet)
          .when(ev === "$engage", jmap(element_at(extra, "$set")))
          .when(ev === "$create_alias", emptyMap)
          .otherwise(jmap(element_at(pm, "$set"))).as("set"),
        when(ev === "$identify", idSetOnce)
          .when(ev === "$engage", jmap(element_at(extra, "$set_once")))
          .when(ev === "$create_alias", emptyMap)
          .otherwise(jmap(element_at(pm, "$set_once"))).as("set_once"),
        when(ev === "$identify" || ev === "$create_alias", emptyArr)
          .when(ev === "$engage", unsetKeys(element_at(extra, "$unset")))
          .otherwise(unsetKeys(element_at(pm, "$unset"))).as("unset"),
        when(ev === "$create_alias", element_at(extra, "alias"))
          .when(ev === "$identify" && anon =!= col("distinct_id"), anon)
          .as("alias_to"))
  }
}

/** T8 glue: extract [[GroupOp]]s from the canonical event table —
  * mirrors the reference's group-update call sites:
  *
  *   - `$groupidentify`: one update for (extra.group_type,
  *     extra.group_key) with the event's `properties` object (the
  *     routed `$group_set` / server item properties; an empty object
  *     still applies — `/groups` endpoint has no emptiness guard,
  *     lib.rs:879-897);
  *   - every other event (capture/identify: from `properties`;
  *     engage: from the routed `extra` fields): for each
  *     `$group_set[group_type]` whose key appears in `$groups` and
  *     whose props form a NON-empty object, one update
  *     (lib.rs:423-450,608-632,960-996 — the `continue` guards drop
  *     missing keys, non-object props, and empty objects).
  *
  * Map-only Column logic with one `explode` per `$group_set` entry —
  * the compact (type,key,ord,set) op table then shuffles once by
  * (type,key) in [[Replay.groups]].
  */
object GroupOpExtract {

  private val mapSS: DataType = DataType.fromDDL("map<string,string>")

  /** events → (group_type, group_key, ord, set). */
  def fromCanonical(events: DataFrame, ord: Column): DataFrame = {
    val ev = col("event")
    val extra = col("extra")

    val gi = events.filter(ev === "$groupidentify")
      .select(
        element_at(extra, "group_type").as("group_type"),
        element_at(extra, "group_key").as("group_key"),
        ord.as("ord"),
        from_json(col("properties"), mapSS).as("set"))
      .filter(col("group_type").isNotNull && col("group_key").isNotNull &&
        col("set").isNotNull)

    val src = when(ev === "$engage", element_at(extra, "$group_set"))
      .otherwise(get_json_object(col("properties"), "$.$group_set"))
    val groupsSrc = when(ev === "$engage", element_at(extra, "$groups"))
      .otherwise(get_json_object(col("properties"), "$.$groups"))
    val rest = events.filter(ev =!= "$groupidentify" && ev =!= "$snapshot")
      .select(ord.as("ord"),
        from_json(groupsSrc, mapSS).as("__groups"),
        explode(from_json(src, mapSS)).as(Seq("group_type", "__props_text")))
      .select(
        col("group_type"),
        element_at(col("__groups"), col("group_type")).as("group_key"),
        col("ord"),
        from_json(col("__props_text"), mapSS).as("set"))
      .filter(col("group_key").isNotNull && col("set").isNotNull &&
        size(map_keys(col("set"))) > 0)

    gi.unionByName(rest)
  }
}
