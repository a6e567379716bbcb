package graft.flags

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Vectorized flag evaluation for bulk backfills: the same F3–F6
  * semantics as [[FlagEval]], expressed as Column logic over a person
  * table whose properties live in a `map<string,string>` column
  * (values = JSON scalar text, the merged-person-properties view).
  *
  * Everything except the SHA1 bucket is pure Catalyst (codegen'd,
  * null-safe); the bucket is a deterministic Scala UDF wrapping the
  * exact [[FlagEval.bucketFor]] bytes — a UDF because Spark's `sha1()`
  * returns hex and the unsigned-64 fold would hit sign edge cases in
  * expression space; bit-exactness defines production assignment, so
  * the scalar function is shared verbatim with the serving path.
  *
  * At 100 TB: a flag backfill is a map-only scan of the person table
  * with these predicates fused into whole-stage codegen — no shuffle,
  * no join, no state.
  */
object FlagColumns {

  val bucketUdf = udf((salt: String, hashId: String) => FlagEval.bucketFor(salt, hashId))

  /** Numeric coercion ladder (string→double, bool→0/1); `try_cast` so
    * non-numeric strings become null (→ filter false), matching the
    * scalar path, instead of an ANSI cast error.
    */
  private def asNum(v: Column): Column =
    when(lower(trim(v)) === "true", 1.0)
      .when(lower(trim(v)) === "false", 0.0)
      .otherwise(v.try_cast(DoubleType))

  private def jstr(v: JsonV): String = v match {
    case JStr(s) => s
    case JNum(n) => if (n.isWhole) n.toLong.toString else n.toString
    case JBool(b) => b.toString
    case JNull => null
    case other => other.toString
  }

  /** One property filter → boolean Column over (props map, the filter's
    * expected literal). `actual` values are JSON scalar text; absent
    * key ⇒ false for every operator (reference semantics).
    */
  def filterCol(props: Column, f: PropertyFilter): Column = {
    val actual = element_at(props, f.key)
    val expectedS = jstr(f.value)
    val eq = (a: Column) =>
      a === lit(expectedS) || (asNum(a).isNotNull && asNum(a) === asNum(lit(expectedS)))
    val base: Column = f.operator.getOrElse("eq") match {
      case "is_set" => actual.isNotNull
      case "is_not" => !eq(actual)
      case "in" => f.value match {
        case JArr(items) => items.map(i => actual === lit(jstr(i)) ||
          (asNum(actual).isNotNull && asNum(actual) === asNum(lit(jstr(i)))))
          .reduceOption(_ || _).getOrElse(lit(false))
        case _ => lit(false)
      }
      case "not_in" => f.value match {
        case JArr(items) => !items.map(i => actual === lit(jstr(i)) ||
          (asNum(actual).isNotNull && asNum(actual) === asNum(lit(jstr(i)))))
          .reduceOption(_ || _).getOrElse(lit(false))
        case _ => lit(false)
      }
      case "contains" => actual.contains(lit(expectedS))
      case "regex" => actual.rlike(expectedS)
      case "gt" => asNum(actual) > asNum(lit(expectedS))
      case "gte" => asNum(actual) >= asNum(lit(expectedS))
      case "lt" => asNum(actual) < asNum(lit(expectedS))
      case "lte" => asNum(actual) <= asNum(lit(expectedS))
      case _ => eq(actual)
    }
    coalesce(actual.isNotNull && base, lit(false))
  }

  /** All of a condition's filters AND'ed. */
  def conditionCol(props: Column, cond: FlagCondition): Column =
    cond.properties.map(filterCol(props, _)).reduceOption(_ && _).getOrElse(lit(true))

  /** Boolean-flag enablement over (distinct_id, props): first matching
    * condition wins, then rollout bucketing — the Column mirror of
    * `evaluate_flag`. Multivariate selection stays on the scalar path
    * (serving); backfills mostly need enablement.
    */
  def enabledCol(distinctId: Column, props: Column, flag: FeatureFlag): Column = {
    if (!flag.active) return lit(false)
    val salt = flag.salt.getOrElse(flag.key)
    val bucket = bucketUdf(lit(salt), distinctId)
    def rolloutOk(r: Option[Double]): Column = {
      val pct = r.orElse(flag.rolloutPercentage).getOrElse(100.0)
      bucket < lit(math.min(math.max(pct, 0.0), 100.0))
    }
    if (flag.conditions.isEmpty) rolloutOk(None)
    else {
      // CASE over conditions in order: first property-match decides
      flag.conditions.foldLeft(when(lit(false), lit(false))) { (acc, cond) =>
        acc.when(conditionCol(props, cond), rolloutOk(cond.rolloutPercentage))
      }.otherwise(lit(false))
    }
  }
}
