package graft

import graft.llm.Unigram
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.llm.Unigram]]: Viterbi segmentation pinned against
  * brute-force enumeration of EVERY segmentation (exhaustive
  * max-product search — shares no code with the production DP), plus
  * the trainer's determinism/coverage properties the registered
  * query's gates assert.
  */
class UnigramSpec extends AnyFunSuite {

  /** All segmentations of `word` into vocab pieces, scored by raw
    * probability product — exponential, fine for short words.
    */
  private def allSegmentations(word: String,
      probs: Map[String, Double]): Seq[(Seq[String], Double)] = {
    if (word.isEmpty) return Seq((Seq.empty, 1.0))
    (1 to math.min(word.length, Unigram.SeedMaxLen)).flatMap { l =>
      val head = word.substring(0, l)
      probs.get(head) match {
        case Some(p) =>
          allSegmentations(word.substring(l), probs)
            .map { case (tail, s) => (head +: tail, p * s) }
        case None => Seq.empty
      }
    }
  }

  private val dict: Seq[(String, Long)] = Seq(
    "spark" -> 90L, "sparkly" -> 12L, "park" -> 55L, "parking" -> 30L,
    "spar" -> 8L, "king" -> 40L, "kin" -> 9L, "ing" -> 70L,
    "stream" -> 65L, "streaming" -> 45L, "steam" -> 20L, "a" -> 100L)

  test("Viterbi segmentation is max-product optimal vs exhaustive enumeration") {
    val probs = Unigram.train(dict)
    dict.map(_._1).foreach { w =>
      val got = Unigram.segment(w, probs)
      val all = allSegmentations(w, probs)
      assert(all.nonEmpty, s"no segmentation found for $w")
      val bestScore = all.map(_._2).max
      val gotScore = got.map(probs).product
      assert(gotScore == bestScore,
        s"$w: Viterbi $got (p=$gotScore) < exhaustive best " +
          s"${all.maxBy(_._2)._1} (p=$bestScore)")
      // the declared tie-break: among max-product segmentations, a
      // FEWEST-pieces one (the per-cell last-piece comparison then
      // fixes a single deterministic winner - determinism is pinned
      // separately below)
      val ties = all.filter(_._2 == bestScore).map(_._1)
      assert(got.size == ties.map(_.size).min,
        s"$w: tie-break picked ${got.size} pieces, fewest is ${ties.map(_.size).min}")
    }
  }

  test("segmentation reconstructs and stays within the learned vocab") {
    val probs = Unigram.train(dict)
    dict.map(_._1).foreach { w =>
      val ps = Unigram.segment(w, probs)
      assert(ps.mkString("") == w, s"$w reconstructed as ${ps.mkString("")}")
      assert(ps.nonEmpty && ps.size <= w.length)
      assert(ps.forall(probs.contains), s"$w produced out-of-vocab pieces $ps")
    }
  }

  test("training is deterministic and keeps the single-char coverage floor") {
    val p1 = Unigram.train(dict)
    val p2 = Unigram.train(dict)
    assert(p1 == p2, "two trainings on the same dict diverged")
    val chars = dict.map(_._1).flatMap(_.toSeq).map(_.toString).toSet
    chars.foreach(c => assert(p1.contains(c), s"single char $c pruned"))
    val z = p1.values.sum
    assert(math.abs(z - 1.0) < 1e-9, s"probabilities sum to $z")
  }

  test("training prunes to the target vocab on a large synthetic dict") {
    // enough distinct words to overflow TargetVocab at the seed stage
    val vocabWords = (0 until 900).map { i =>
      val s = Integer.toString(i + 10000, 26).map(c => ('a' + Character.digit(c, 26)).toChar)
      (s.mkString, (i % 37 + 1).toLong)
    }
    val probs = Unigram.train(vocabWords)
    val nChars = vocabWords.flatMap(_._1.toSeq).map(_.toString).distinct.size
    assert(probs.size <= math.max(Unigram.TargetVocab, nChars),
      s"vocab ${probs.size} exceeds target")
    // every word still segments and reconstructs after pruning
    vocabWords.take(50).foreach { case (w, _) =>
      assert(Unigram.segment(w, probs).mkString("") == w)
    }
  }

  test("frequent multi-char pieces survive training over frequent words") {
    val probs = Unigram.train(dict)
    // 'ing' rides three frequent words (ing, parking, streaming) — a
    // unigram LM that prunes it has a broken E-step
    assert(probs.keys.exists(p => p.length > 1),
      "no multi-char piece survived at all")
    assert(probs.contains("ing") || probs.contains("king"),
      s"high-value suffix pruned; kept: ${probs.keys.filter(_.length > 2).toSeq.sorted}")
  }
}
