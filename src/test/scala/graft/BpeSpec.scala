package graft

import graft.llm.Bpe
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.llm.Bpe]]: merge learning and encoding pinned against an
  * independently-written reference implementation (different data
  * structures and traversal), plus the properties the registered
  * query's gates assert.
  */
class BpeSpec extends AnyFunSuite {

  /** Independent trainer: pair counting via sliding windows +
    * groupMapReduce, merges applied via list folding — shares no code
    * with the production trainer.
    */
  private def refTrain(dict: Seq[(String, Long)], n: Int): Seq[(String, String)] = {
    var words = dict.map { case (w, f) => (w.map(_.toString).toList, f) }
    val out = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var i = 0
    while (i < n) {
      val counts = words.flatMap { case (syms, f) =>
        if (syms.size < 2) Nil else syms.sliding(2).map(p => ((p.head, p(1)), f)).toList
      }.groupMapReduce(_._1)(_._2)(_ + _)
      if (counts.isEmpty) i = n
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        out += best
        words = words.map { case (syms, f) =>
          val merged = scala.collection.mutable.ListBuffer.empty[String]
          var rest = syms
          while (rest.nonEmpty) rest match {
            case a :: b :: tl if a == best._1 && b == best._2 =>
              merged += a + b; rest = tl
            case a :: tl => merged += a; rest = tl
            case Nil =>
          }
          (merged.toList, f)
        }
        i += 1
      }
    }
    out.toList
  }

  /** Encode by replaying the merge LIST in training order — the
    * classical definition; must equal rank-greedy [[Bpe.encode]].
    */
  private def refEncode(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms = word.map(_.toString).toList
    merges.foreach { m =>
      val merged = scala.collection.mutable.ListBuffer.empty[String]
      var rest = syms
      while (rest.nonEmpty) rest match {
        case a :: b :: tl if a == m._1 && b == m._2 => merged += a + b; rest = tl
        case a :: tl => merged += a; rest = tl
        case Nil =>
      }
      syms = merged.toList
    }
    syms
  }

  private val rnd = new scala.util.Random(1729)
  private def randWord(): String = {
    val alpha = "abcde"
    (0 until (1 + rnd.nextInt(12))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
  }
  private def randDict(n: Int): Seq[(String, Long)] =
    (0 until n).map(_ => randWord()).distinct.map(w => (w, 1L + rnd.nextInt(50).toLong))

  test("merge learning matches the independent reference trainer") {
    for (_ <- 0 until 20) {
      val dict = randDict(40)
      assert(Bpe.train(dict, 25) == refTrain(dict, 25), s"dict=$dict")
    }
  }

  test("training is order-independent in the dict input") {
    val dict = randDict(60)
    assert(Bpe.train(dict.reverse, 30) == Bpe.train(dict, 30))
    assert(Bpe.train(rnd.shuffle(dict), 30) == Bpe.train(dict, 30))
  }

  test("rank-greedy encode == replaying merges in training order") {
    for (_ <- 0 until 10) {
      val dict = randDict(40)
      val merges = Bpe.train(dict, 25)
      val ranks = merges.zipWithIndex.toMap
      for (_ <- 0 until 200) {
        val w = randWord()
        assert(Bpe.encode(w, ranks) == refEncode(w, merges), s"word=$w merges=$merges")
      }
    }
  }

  test("gates: reconstruction, piece bounds, vocab closure (incl. unseen words)") {
    val dict = randDict(80)
    val merges = Bpe.train(dict, 40)
    val ranks = merges.zipWithIndex.toMap
    val vocab = dict.flatMap(_._1.map(_.toString)).toSet ++ merges.map(p => p._1 + p._2)
    for (_ <- 0 until 500) {
      val w = randWord()
      val ps = Bpe.encode(w, ranks)
      assert(ps.mkString("") == w)
      assert(ps.nonEmpty && ps.size <= w.length)
      // pieces are single chars or merge products; chars of DICT words
      // are in the declared vocab (unseen chars segment to themselves)
      assert(ps.forall(p => p.length == 1 || vocab.contains(p)))
    }
  }
}
