package graft

import graft.state.{PersonOp, Replay}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck invariants for the person-state fold (SURVEY §5):
  * properties that must hold for EVERY op sequence, not just the ported
  * vectors. The fold under test is the exact shared
  * [[Replay.applyUpdate]] — the same function batch replay and
  * streaming state use.
  */
class StatePropertySpec extends AnyFunSuite {

  private val keyGen = Gen.oneOf("a", "b", "c", "d")
  private val valGen = Gen.oneOf("1", "2", "3")
  private val mapGen = Gen.mapOf(Gen.zip(keyGen, valGen)).map(_.take(2))

  private val opGen: Gen[PersonOp] = for {
    set <- mapGen
    setOnce <- mapGen
    unset <- Gen.listOf(keyGen).map(_.take(2))
  } yield PersonOp("id", 0, set, setOnce, unset, None)

  private val opsGen: Gen[List[PersonOp]] = Gen.listOf(opGen)

  private def fold(ops: Seq[PersonOp]): (Map[String, String], Map[String, String]) =
    ops.foldLeft((Map.empty[String, String], Map.empty[String, String])) {
      case ((p, so), op) => Replay.applyUpdate(p, so, op)
    }

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(r.passed, r.status.toString)
  }

  test("merged view: $set always wins over $set_once") {
    check(Prop.forAll(opsGen) { ops =>
      val (props, setOnce) = fold(ops)
      val merged = setOnce ++ props
      props.forall { case (k, v) => merged(k) == v }
    })
  }

  test("$set_once immutability: first surviving write wins until unset") {
    check(Prop.forAll(opsGen) { ops =>
      val (_, setOnce) = fold(ops)
      var expected = Map.empty[String, String]
      var props = Map.empty[String, String]
      ops.foreach { op =>
        props = props ++ op.set
        op.set_once.foreach { case (k, v) =>
          if (!props.contains(k) && !expected.contains(k)) expected += k -> v
        }
        op.unset.foreach { k => expected -= k; props -= k }
      }
      setOnce == expected
    })
  }

  test("a key whose last touch is $unset is absent from both maps") {
    check(Prop.forAll(opsGen) { ops =>
      val lastTouch = collection.mutable.Map.empty[String, String]
      ops.foreach { op =>
        op.set.keys.foreach(k => lastTouch(k) = "set")
        // set_once only counts as a touch when the key is currently
        // absent (never touched, or last touch was an unset)
        op.set_once.keys.foreach(k =>
          if (!lastTouch.get(k).exists(a => a == "set" || a == "once")) lastTouch(k) = "once")
        op.unset.foreach(k => lastTouch(k) = "unset")
      }
      val (props, setOnce) = fold(ops)
      lastTouch.forall { case (k, action) =>
        action != "unset" || (!props.contains(k) && !setOnce.contains(k))
      }
    })
  }

  test("incremental chunked application == one-shot fold (stream == batch)") {
    check(Prop.forAll(opsGen, opsGen) { (a, b) =>
      val oneShot = fold(a ++ b)
      val (p1, so1) = fold(a)
      val twoPhase = b.foldLeft((p1, so1)) {
        case ((p, so), op) => Replay.applyUpdate(p, so, op)
      }
      oneShot == twoPhase
    })
  }

  test("fold never resurrects values: every value came from some op") {
    check(Prop.forAll(opsGen) { ops =>
      val (props, setOnce) = fold(ops)
      val allSet = ops.flatMap(_.set).toSet
      val allOnce = ops.flatMap(_.set_once).toSet
      props.forall(allSet.contains) && setOnce.forall(allOnce.contains)
    })
  }
}
