package graft

import graft.llm.WordPiece
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.llm.WordPiece]]: likelihood-merge training pinned against an
  * independently-written recompute (fractions via BigInt pairs +
  * groupMapReduce — no shared code), plus hand-pinned longest-match
  * encode behavior incl. the UNK contract.
  */
class WordPieceSpec extends AnyFunSuite {

  /** Independent trainer: recomputes symbol/pair frequencies with
    * groupMapReduce per step and picks the max-score pair by sorting
    * all candidates on an exact fraction ordering.
    */
  private def refTrain(dict: Seq[(String, Long)], n: Int): Seq[(String, String)] = {
    def symbols(w: String): List[String] =
      w.toList.zipWithIndex.map { case (c, i) => if (i == 0) c.toString else s"##$c" }
    var words = dict.map { case (w, f) => (symbols(w), f) }
    val out = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var step = 0
    while (step < n) {
      val sf = words.flatMap { case (syms, f) => syms.map(_ -> f) }
        .groupMapReduce(_._1)(_._2)(_ + _)
      val pf = words.flatMap { case (syms, f) =>
        if (syms.size < 2) Nil else syms.sliding(2).map(p => ((p.head, p(1)), f)).toList
      }.groupMapReduce(_._1)(_._2)(_ + _)
      if (pf.isEmpty) step = n
      else {
        // exact fraction order: score(p) = c/(fa·fb); compare via
        // cross-multiplication, then lexicographic pair
        val best = pf.toSeq.sortWith { case (((a1, b1), c1), ((a2, b2), c2)) =>
          val l = BigInt(c1) * BigInt(sf(a2)) * BigInt(sf(b2))
          val r = BigInt(c2) * BigInt(sf(a1)) * BigInt(sf(b1))
          if (l != r) l > r
          else Ordering.Tuple2[String, String].lt((a1, b1), (a2, b2))
        }.head._1
        out += best
        val joined = best._1 + best._2.stripPrefix("##")
        words = words.map { case (syms, f) =>
          val merged = scala.collection.mutable.ListBuffer.empty[String]
          var rest = syms
          while (rest.nonEmpty) rest match {
            case a :: b :: tl if a == best._1 && b == best._2 =>
              merged += joined; rest = tl
            case a :: tl => merged += a; rest = tl
            case Nil =>
          }
          (merged.toList, f)
        }
        step += 1
      }
    }
    out.toList
  }

  test("merge list equals the independent recompute (likelihood score, exact tie-breaks)") {
    val dict = Seq(
      ("the", 50L), ("then", 10L), ("they", 8L), ("them", 6L),
      ("spark", 20L), ("spa", 5L), ("park", 7L), ("low", 12L),
      ("lower", 4L), ("lowest", 3L), ("er", 9L), ("est", 2L))
    assert(WordPiece.train(dict, 25) == refTrain(dict, 25))
  }

  test("likelihood beats raw count: a rare-but-exclusive pair wins over a frequent promiscuous one") {
    // "xy" appears 5 times and x,y appear nowhere else (score 5/(5·5));
    // "ab" appears 50 times but a,b are everywhere (50/(150·150)) —
    // raw-count BPE would merge (a,##b) first, WordPiece must not
    val dict = Seq(("ab", 50L), ("ax", 0L), ("a", 100L), ("b", 100L), ("xy", 5L))
      .filter(_._2 > 0)
    val first = WordPiece.train(dict, 1).head
    assert(first == ("x", "##y"), s"expected the exclusive pair, got $first")
  }

  test("greedy longest-match encode: longest prefix wins; continuation ## enforced; UNK on alien char") {
    val vocab = Set("un", "##aff", "##able", "##ffa", "u", "##n", "##a", "##f", "##b", "##l", "##e")
    // longest-first: un + ##aff + ##able (not u/##n/... and not ##ffa)
    assert(WordPiece.encode("unaffable", vocab) ==
      Seq("un", "##aff", "##able"))
    // a word starting with a continuation-only symbol cannot start: 'a'
    // is only in vocab as ##a → position 0 has no match → UNK
    assert(WordPiece.encode("aff", vocab) == Seq(WordPiece.Unk))
    // alien char anywhere → UNK for the whole word (BERT semantics)
    assert(WordPiece.encode("unz", vocab) == Seq(WordPiece.Unk))
  }

  test("vocab closure: every dict word re-encodes to itself piece-joined, never UNK") {
    val dict = Seq(("hello", 5L), ("help", 3L), ("yellow", 2L), ("low", 8L))
    val merges = WordPiece.train(dict, 10)
    val vocab = WordPiece.vocabOf(dict, merges)
    dict.foreach { case (w, _) =>
      val ps = WordPiece.encode(w, vocab)
      assert(ps != Seq(WordPiece.Unk), s"$w must not UNK")
      assert(ps.map(_.stripPrefix("##")).mkString("") == w)
      assert(ps.forall(vocab.contains))
    }
  }
}
