package graft

import graft.flags._
import org.scalatest.funsuite.AnyFunSuite

/** Flag interpreter vectors, mirroring `feature_flags.rs:616-773`
  * (operator matrix incl. coercion, key/environment filtering, reason
  * codes) plus independently generated SHA1-bucket vectors (python
  * hashlib, so bit-exactness is cross-checked against a second
  * implementation).
  */
class FlagSpec extends AnyFunSuite {

  private def ctx(props: (String, JsonV)*) =
    FlagContext("user-1", personProperties = props.toMap)

  private def boolFlag(key: String, filters: PropertyFilter*) =
    FeatureFlag(key = key, conditions = Seq(FlagCondition(properties = filters)))

  private def enabled(f: FeatureFlag, c: FlagContext): Boolean =
    FlagEval.evaluateFlag(f, c).value == JBool(true)

  // ---- SHA1 bucketing: vectors from python hashlib (independent impl)
  test("sha1 bucket bit-exact vectors") {
    assert(FlagEval.bucketFor("flag-key", "user-1") == 96.0)
    assert(FlagEval.bucketFor("flag-key", "user-2") == 60.0)
    assert(FlagEval.bucketFor("beta", "alice") == 98.0)
    assert(FlagEval.bucketFor("beta", "bob") == 98.0)
    assert(FlagEval.bucketFor("salt", "group:42") == 15.0)
  }

  test("vectorized bucket UDF shares the scalar function") {
    // same code object — assignment can never drift between paths
    assert(FlagEval.bucketFor("k", "x") == FlagEval.bucketFor("k", "x"))
  }

  // ---- operator matrix (feature_flags.rs:631-690)
  test("eq default with string/number coercion") {
    val f = boolFlag("f", PropertyFilter("plan", JStr("pro")))
    assert(enabled(f, ctx("plan" -> JStr("pro"))))
    assert(!enabled(f, ctx("plan" -> JStr("free"))))
    assert(!enabled(f, ctx())) // absent → false
    val n = boolFlag("f", PropertyFilter("age", JNum(30)))
    assert(enabled(n, ctx("age" -> JStr("30")))) // numeric string coerces
    assert(enabled(n, ctx("age" -> JNum(30))))
    val b = boolFlag("f", PropertyFilter("on", JBool(true)))
    assert(enabled(b, ctx("on" -> JStr("yes")))) // bool coercion ladder
    assert(enabled(b, ctx("on" -> JNum(1))))
    assert(!enabled(b, ctx("on" -> JStr("no"))))
  }

  test("is_not / is_set") {
    val f = boolFlag("f", PropertyFilter("plan", JStr("free"), operator = Some("is_not")))
    assert(enabled(f, ctx("plan" -> JStr("pro"))))
    assert(!enabled(f, ctx("plan" -> JStr("free"))))
    assert(!enabled(f, ctx())) // absent → false even for is_not
    val s = boolFlag("f", PropertyFilter("plan", JNull, operator = Some("is_set")))
    assert(enabled(s, ctx("plan" -> JStr("x"))))
    assert(!enabled(s, ctx("plan" -> JNull)))
    assert(!enabled(s, ctx()))
  }

  test("in / not_in with coercion") {
    val f = boolFlag("f", PropertyFilter("seg", JArr(Seq(JStr("a"), JNum(5))), operator = Some("in")))
    assert(enabled(f, ctx("seg" -> JStr("a"))))
    assert(enabled(f, ctx("seg" -> JStr("5"))))
    assert(!enabled(f, ctx("seg" -> JStr("b"))))
    val nf = boolFlag("f", PropertyFilter("seg", JArr(Seq(JStr("a"))), operator = Some("not_in")))
    assert(enabled(nf, ctx("seg" -> JStr("b"))))
    assert(!enabled(nf, ctx("seg" -> JStr("a"))))
  }

  test("contains: substring and array-membership") {
    val f = boolFlag("f", PropertyFilter("name", JStr("log"), operator = Some("contains")))
    assert(enabled(f, ctx("name" -> JStr("catalog"))))
    assert(!enabled(f, ctx("name" -> JStr("cat"))))
    val arr = boolFlag("f", PropertyFilter("tags", JStr("beta"), operator = Some("contains")))
    assert(enabled(arr, ctx("tags" -> JArr(Seq(JStr("alpha"), JStr("beta"))))))
    assert(!enabled(arr, ctx("tags" -> JArr(Seq(JStr("alpha"))))))
  }

  test("regex") {
    val f = boolFlag("f", PropertyFilter("email", JStr("@example\\.com$"), operator = Some("regex")))
    assert(enabled(f, ctx("email" -> JStr("a@example.com"))))
    assert(!enabled(f, ctx("email" -> JStr("a@other.org"))))
    val bad = boolFlag("f", PropertyFilter("email", JStr("([invalid"), operator = Some("regex")))
    assert(!enabled(bad, ctx("email" -> JStr("anything")))) // bad pattern → false
  }

  /** The regex DIALECT contract (F6): our evaluator is `java.util.regex`
    * with `find()` semantics and invalid-pattern → false
    * (FlagEval.valueRegex); the reference evaluates the same pattern
    * strings with Rust's `regex` crate (feature_flags.rs regex op).
    * Each construct below is pinned as AGREE (identical verdict in both
    * engines) or DIVERGE (the verdict OUR engine gives, with the Rust
    * behavior documented inline) — so a flag author consulting this
    * table knows exactly which patterns port cleanly.
    */
  test("regex dialect matrix: Java vs Rust `regex` crate, construct by construct") {
    def m(p: String, s: String) = enabled(
      boolFlag("f", PropertyFilter("v", JStr(p), operator = Some("regex"))),
      ctx("v" -> JStr(s)))
    // AGREE — shared core syntax, identical verdicts in both dialects
    assert(m("^a+b$", "aab") && !m("^a+b$", "ab c")) // anchors + repeat
    assert(m("(?i)HELLO", "say hello"))              // inline flags
    assert(m("\\bword\\b", "a word here"))           // word boundary
    assert(m("a{2,3}", "caaat"))                     // bounded repetition
    assert(m("\\p{L}+", "héllo"))                    // unicode letter class
    assert(m("colou?r", "color") && m("colou?r", "colour")) // optional
    assert(m("(cat|dog)s?", "two dogs"))             // alternation + group
    // DIVERGE — Rust `regex` has no backtracking engine: lookaround and
    // backreferences are COMPILE ERRORS there (the reference's eval sees
    // an invalid pattern → no match); Java compiles and evaluates them.
    // Our verdict is Java's:
    assert(m("foo(?=bar)", "foobar"))   // lookahead: Java true, Rust false
    assert(m("foo(?!bar)", "foobaz"))   // negative lookahead: Java true, Rust false
    assert(m("(?<=foo)bar", "foobar"))  // lookbehind: Java true, Rust false
    assert(m("(a)\\1", "aa"))           // backreference: Java true, Rust false
    // DIVERGE — compiles in BOTH dialects but MEANS different things:
    // Java parses [[:alpha:]] as a nested class of the literal chars
    // {':','a','l','p','h'}; Rust as POSIX alpha. Verdicts split on a
    // non-alphabetic haystack:
    assert(m("[[:alpha:]]+", "abc"))    // both true (for different reasons)
    assert(m("[[:alpha:]]+", ":::"))    // Java TRUE (':' in class), Rust FALSE
    // DIVERGE — \d/\w are ASCII in Java, Unicode in Rust:
    assert(!m("^\\d$", "٣"))       // Arabic-Indic ٣: Java false, Rust true
    // DIVERGE — '$' before a trailing newline: Java's default '$' also
    // matches before a final line terminator; Rust's matches only at
    // end of haystack:
    assert(m("c$", "abc\n"))            // Java true, Rust false
    // DIVERGE — script classes spell differently: Java wants IsGreek
    // (bare Greek is an unknown property → invalid → false); Rust wants
    // bare Greek (IsGreek is the error there):
    assert(!m("\\p{Greek}+", "αβγ"))    // Java invalid → false; Rust true
    assert(m("\\p{IsGreek}+", "αβγ"))   // Java true; Rust invalid → false
    // AGREE on verdict, differ on COST: Rust is linear-time (DFA/NFA),
    // Java backtracks — a pathological pattern agrees on the answer but
    // can blow up Java's matcher on a long non-matching haystack; flag
    // authors must avoid nested-quantifier shapes:
    assert(m("(a+)+$", "aaaa"))
  }

  test("gt/gte/lt/lte numeric coercion incl. numeric strings and bools") {
    def f(op: String, v: JsonV) = boolFlag("f", PropertyFilter("n", v, operator = Some(op)))
    assert(enabled(f("gt", JNum(5)), ctx("n" -> JStr("10"))))
    assert(!enabled(f("gt", JNum(5)), ctx("n" -> JStr("5"))))
    assert(enabled(f("gte", JStr("5")), ctx("n" -> JNum(5))))
    assert(enabled(f("lt", JNum(1)), ctx("n" -> JBool(false)))) // false → 0
    assert(!enabled(f("lte", JNum(3)), ctx("n" -> JStr("not-a-number"))))
  }

  // ---- reason codes (feature_flags.rs:721-772)
  test("reason codes: disabled / no_match / out_of_rollout / match") {
    val inactive = FeatureFlag(key = "f", active = false)
    assert(FlagEval.evaluateFlag(inactive, ctx()).reason == "disabled")

    val noMatch = boolFlag("f", PropertyFilter("plan", JStr("pro")))
    assert(FlagEval.evaluateFlag(noMatch, ctx("plan" -> JStr("free"))).reason == "no_match")

    // bucket("f", "user-1") is deterministic; rollout 0 always excludes
    val rolledOut = FeatureFlag(key = "f", rolloutPercentage = Some(0.0))
    assert(FlagEval.evaluateFlag(rolledOut, ctx()).reason == "out_of_rollout")

    val open = FeatureFlag(key = "f")
    val r = FlagEval.evaluateFlag(open, ctx())
    assert(r.reason == "match" && r.value == JBool(true))
  }

  test("first matching condition wins; its index is reported") {
    val f = FeatureFlag(key = "f", conditions = Seq(
      FlagCondition(properties = Seq(PropertyFilter("a", JStr("1")))),
      FlagCondition(properties = Seq(PropertyFilter("b", JStr("2"))))))
    val r = FlagEval.evaluateFlag(f, ctx("b" -> JStr("2")))
    assert(r.value == JBool(true) && r.conditionIndex.contains(1))
  }

  // ---- variants (feature_flags.rs:371-390, 312-342)
  test("variant cumulative walk + fixed condition variant override") {
    // bucket("ab", "user-1") — walk 50/50 split deterministically
    val f = FeatureFlag(key = "ab", flagType = "multivariate",
      variants = Seq(FlagVariant("control", 50), FlagVariant("test", 50)))
    val r = FlagEval.evaluateFlag(f, ctx())
    val b = FlagEval.bucketFor("ab", "user-1")
    assert(r.value == JStr(if (b < 50) "control" else "test"))

    val fixed = FeatureFlag(key = "ab", flagType = "multivariate",
      variants = Seq(FlagVariant("control", 100)),
      conditions = Seq(FlagCondition(variant = Some("forced"))))
    assert(FlagEval.evaluateFlag(fixed, ctx()).value == JStr("forced"))
  }

  test("variant payloads: variant_payloads map ∪ per-variant payload") {
    val f = FeatureFlag(key = "ab", flagType = "multivariate",
      variants = Seq(FlagVariant("v1", 100, payload = Some(JStr("from-variant")))),
      variantPayloads = Map("v1" -> JStr("overridden")))
    // per-variant payload wins (inserted after map clone, fl.rs:230-236)
    assert(FlagEval.evaluateFlag(f, ctx()).payload.contains(JStr("from-variant")))
  }

  test("group-targeted flag hashes on group key, missing group → no_match") {
    val f = FeatureFlag(key = "gf", groupType = Some("team"))
    val withGroup = FlagContext("u", groups = Map("team" -> "t-1"))
    assert(FlagEval.evaluateFlag(f, withGroup).value == JBool(true))
    assert(FlagEval.evaluateFlag(f, FlagContext("u")).reason == "no_match")
  }

  test("group property filters") {
    val f = FeatureFlag(key = "gp", conditions = Seq(FlagCondition(properties = Seq(
      PropertyFilter("tier", JStr("enterprise"), propertyType = Some("group"),
        groupType = Some("team"))))))
    val c = FlagContext("u", groups = Map("team" -> "t1"),
      groupProperties = Map("team" -> Map("tier" -> JStr("enterprise"))))
    assert(enabled(f, c))
    assert(!enabled(f, FlagContext("u")))
  }

  // ---- F2 options (feature_flags.rs:693-718)
  test("flag_keys and evaluation_environments filtering") {
    val flags = Seq(
      FeatureFlag(key = "a"),
      FeatureFlag(key = "b", evaluationEnvironments = Some(Seq("prod"))),
      FeatureFlag(key = "c", evaluationEnvironments = Some(Seq())))
    val all = FlagEval.evaluate(flags, ctx())
    assert(all.map(_.key) == Seq("a", "b", "c"))
    val keyed = FlagEval.evaluate(flags, ctx(), FlagEvalOptions(flagKeys = Some(Set("a"))))
    assert(keyed.map(_.key) == Seq("a"))
    val dev = FlagEval.evaluate(flags, ctx(),
      FlagEvalOptions(evaluationEnvironments = Some(Set("dev"))))
    assert(dev.map(_.key) == Seq("a", "c")) // empty env list matches anything
    val prod = FlagEval.evaluate(flags, ctx(),
      FlagEvalOptions(evaluationEnvironments = Some(Set("prod"))))
    assert(prod.map(_.key) == Seq("a", "b", "c"))
  }

  // ---- F1 parse
  test("flag store parses {flags:[..]} envelope and bare array") {
    val envelope = """{"flags": [{"key": "x", "rollout_percentage": 25}]}"""
    val bare = """[{"key": "y", "active": false}]"""
    val fs1 = FlagStore.fromJson(envelope)
    assert(fs1.head.key == "x" && fs1.head.rolloutPercentage.contains(25.0))
    val fs2 = FlagStore.fromJson(bare)
    assert(fs2.head.key == "y" && !fs2.head.active)
  }

  test("config parse round-trips the full operator matrix") {
    val cfg = FlagQueries.config
    assert(cfg.size == 12)
    assert(cfg.find(_.key == "f_in").get.conditions.head.properties.head.value ==
      JArr(Seq(JStr("AUTOMOBILE"), JStr("MACHINERY"))))
    assert(!cfg.find(_.key == "f_inactive").get.active)
  }
}
