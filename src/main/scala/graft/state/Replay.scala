package graft.state

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One person-state update operation (T1's extraction output): the
  * batch-replay analogue of `PersonUpdate` (`/root/reference/src/
  * persons.rs:360-430`). `ord` is the total order within the entity
  * (ingest order); `aliasTo` carries an alias edge (identify's
  * anon-id merge or an explicit `$create_alias`).
  */
final case class PersonOp(
    raw_id: String,
    ord: Long,
    set: Map[String, String],
    set_once: Map[String, String],
    unset: Seq[String],
    alias_to: Option[String])

/** Final person state — `PersonRecord` (`persons.rs:21-31`) minus the
  * store plumbing. `version` counts applied ops (batch replay rebuilds
  * from epoch, so merge bumps fold into op counts).
  */
final case class PersonRecord(
    canonical_id: String,
    person_seq_id: Long,
    version: Long,
    distinct_ids: Seq[String],
    properties: Map[String, String],
    properties_set_once: Map[String, String],
    first_ord: Long)

final case class GroupOp(
    group_type: String,
    group_key: String,
    ord: Long,
    set: Map[String, String])

/** `GroupRecord` (`/root/reference/src/groups.rs:16-23`). */
final case class GroupRecord(
    group_type: String,
    group_key: String,
    version: Long,
    properties: Map[String, String],
    first_ord: Long)

/** Batch replay of the person/group state machines.
  *
  * The reference serializes per-entity updates through Durable Objects
  * (`persons.rs:488-542`); the Spark form shuffles ops by canonical id
  * and folds each group in `ord` order — same per-entity total order,
  * executed data-parallel across entities. The fold itself is a direct
  * transcription of `apply_update` (`persons.rs:55-74`):
  *
  *   - `$set` overwrites `properties[k]`
  *   - `$set_once` writes `properties_set_once[k]` only if `k` is
  *     absent from BOTH maps
  *   - `$unset` removes `k` from both maps
  *   - the op's distinct_id registers into `distinct_ids`
  *   - `version += 1`
  *
  * Streaming runs the identical fold per micro-batch via
  * `flatMapGroupsWithState` (see graft.streaming).
  */
object Replay {

  /** Pure fold: apply one update to (properties, set_once). Shared by
    * batch replay, streaming state, and tests.
    */
  def applyUpdate(
      props: Map[String, String],
      setOnce: Map[String, String],
      op: PersonOp): (Map[String, String], Map[String, String]) = {
    var p = props ++ op.set
    var so = setOnce
    op.set_once.foreach { case (k, v) =>
      if (!p.contains(k) && !so.contains(k)) so = so.updated(k, v)
    }
    op.unset.foreach { k => p = p - k; so = so - k }
    (p, so)
  }

  /** Merged view: `properties` ∪ `properties_set_once`, set wins
    * (`persons.rs:112-120`).
    */
  def mergedProperties(r: PersonRecord): Map[String, String] =
    r.properties_set_once ++ r.properties

  /** Replay person ops to final person records.
    *
    * ops must carry: raw_id, ord, set, set_once, unset, alias_to.
    * Identity resolution first (CC fixpoint over alias edges), then a
    * shuffle on canonical id + an in-group ordered fold, then dense
    * sequential ids assigned by first-touch order (`persons.rs:544-570`
    * counter semantics) — via sort + zipWithIndex, which stays fully
    * distributed (no single-partition window).
    */
  def persons(spark: SparkSession, ops: Dataset[PersonOp],
      labelOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column = identity)
    : Dataset[PersonRecord] = {
    import spark.implicits._

    val edges = ops.filter(_.alias_to.isDefined)
      .map(o => (o.raw_id, o.alias_to.get)).toDF("src", "dst")
    val redirects = IdentityResolver.components(spark, edges, labelOf)

    // resolve raw ids; ids without alias edges are their own canonical
    val resolved = ops.toDF()
      .join(broadcast(redirects), col("raw_id") === col("id"), "left")
      .withColumn("canonical", coalesce(col("canonical"), col("raw_id")))
      .drop("id")

    // alias also registers the *target* id on the person (ensure_person
    // on both sides of a merge, persons.rs:281-326): emit a no-op
    // registration for alias_to so distinct_ids unions it.
    val aliasReg = resolved.filter(col("alias_to").isNotNull)
      .select(col("alias_to").as("raw_id"), col("ord"),
        typedLit(Map.empty[String, String]).as("set"),
        typedLit(Map.empty[String, String]).as("set_once"),
        typedLit(Seq.empty[String]).as("unset"),
        lit(null).cast("string").as("alias_to"), col("canonical"))
      .withColumn("register_only", lit(true))
    val folded = resolved.withColumn("register_only", lit(false))
      .unionByName(aliasReg)
      .select(col("canonical"), col("raw_id"), col("ord"), col("set"),
        col("set_once"), col("unset"), col("register_only"))
      .as[(String, String, Long, Map[String, String], Map[String, String], Seq[String], Boolean)]
      .groupByKey(_._1)
      .mapGroups { (canonical, it) =>
        val sorted = it.toArray.sortBy(t => (t._3, t._2))
        var props = Map.empty[String, String]
        var setOnce = Map.empty[String, String]
        var dids = Vector.empty[String]
        var version = 0L
        sorted.foreach { case (_, rawId, ord, set, so, unset, regOnly) =>
          if (!dids.contains(rawId)) dids :+= rawId
          if (!regOnly) {
            val r = applyUpdate(props, setOnce, PersonOp(rawId, ord, set, so, unset, None))
            props = r._1; setOnce = r._2
            version += 1
          }
        }
        PersonRecord(canonical, -1L, version, dids.sorted,
          props, setOnce, sorted.head._3)
      }

    // dense first-touch sequence ids: distributed sort + zipWithIndex
    val withIds = folded.rdd
      .sortBy(r => (r.first_ord, r.canonical_id))
      .zipWithIndex()
      .map { case (r, i) => r.copy(person_seq_id = i + 1) }
    spark.createDataset(withIds)
  }

  /** T9: person debug snapshot — the point query behind
    * `GET /__debug/person/:id` (`lib.rs:1196-1226`): resolve any known
    * distinct_id to its record. On the replayed dimension this is a
    * membership filter over `distinct_ids` (at serving scale: a
    * broadcast redirect map + key lookup).
    */
  def personSnapshot(persons: Dataset[PersonRecord], distinctId: String): Option[PersonRecord] = {
    import persons.sparkSession.implicits._
    persons.filter(p => p.distinct_ids.contains(distinctId) || p.canonical_id == distinctId)
      .collect().headOption
  }

  /** Replay group ops: last-write-wins per-key upsert in `ord` order
    * (`groups.rs:25-42`), keyed by (group_type, group_key).
    */
  def groups(spark: SparkSession, ops: Dataset[GroupOp]): Dataset[GroupRecord] = {
    import spark.implicits._
    ops.groupByKey(o => (o.group_type, o.group_key))
      .mapGroups { (key: (String, String), it: Iterator[GroupOp]) =>
        val (gt, gk) = key
        val sorted = it.toArray.sortBy(_.ord)
        var props = Map.empty[String, String]
        sorted.foreach(o => props = props ++ o.set)
        GroupRecord(gt, gk, sorted.length.toLong, props, sorted.head.ord)
      }
  }
}
