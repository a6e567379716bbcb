package graft.llm

import graft.queries.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer training + Viterbi encoding — the
  * SentencePiece family (Kudo 2018, "Subword Regularization") beside
  * [[Bpe]]'s merge-list family: a piece VOCABULARY with unigram
  * probabilities is learned by EM + pruning, and encoding picks the
  * maximum-likelihood segmentation by Viterbi instead of replaying
  * greedy merges.
  *
  * Division of labor at 100 TB — identical to [[Bpe]]'s (and to
  * SentencePiece's own trainer):
  *
  *   - the CORPUS-sized work is the word-frequency dict election (one
  *     map-side-combined compact-token shuffle; document payloads
  *     never move) — [[Bpe.electDict]], shared verbatim;
  *   - candidate seeding + EM + pruning run on the DICT, which is
  *     vocabulary-sized (Heaps' law) and driver-held by the same
  *     bounded-collect contract as the BPE merges and the k-means
  *     centroids. Candidates are the dict words' substrings (≤
  *     [[SeedMaxLen]] chars), capped at [[SeedCap]] by seed score —
  *     the bounded stand-in for SentencePiece's suffix-array seeding;
  *   - ENCODING fans back out: final piece scores broadcast, every
  *     word Viterbi-segments independently inside a map stage (a
  *     Scala UDF — lattice DP has no Spark built-in; SURVEY §4's UDF
  *     carve-out).
  *
  * Float discipline: EM runs in the RAW-PROBABILITY domain with only
  * +,*,/ — all correctly-rounded IEEE ops, no libm transcendentals —
  * which is safe from underflow because every lattice is a dict WORD
  * (≤ ~30 chars), not a document. Determinism: the dict election is
  * ordered (freq DESC, token ASC), seeding/pruning ties break on
  * (score, piece) lexicographically, and Viterbi prefers the FEWER-
  * piece then lexicographically-smaller segmentation on exact score
  * ties — the learned vocab and every segmentation are pure functions
  * of the corpus, partition-invariant (DeterminismSpec).
  *
  * Oracle strategy (`q_text_unigram`): DuckDB cannot run EM; as with
  * [[Bpe]], the row set is the elected word dict (token, freq,
  * n_chars — hash-matched) and the tokenizer's correctness rides
  * in-row boolean gates the oracle emits as TRUE: `reconstructs`
  * (Viterbi pieces concatenate back to the word), `n_pieces_ok`
  * (1 ≤ pieces ≤ chars), `pieces_in_vocab` (every piece is in the
  * learned vocab). UnigramSpec additionally pins Viterbi optimality
  * against brute-force segmentation enumeration and the EM fixpoint
  * against an independent recompute.
  */
object Unigram {

  /** Longest candidate piece seeded (SentencePiece default ~16; the
    * synthetic corpus' words are short).
    */
  val SeedMaxLen = 8

  /** Candidate-vocab cap after seeding (driver-bounded). */
  val SeedCap = 4000

  /** Final piece-vocab size the prune rounds converge to. Tuned BELOW
    * the fixture corpus's seeded candidate count (~500 substrings of
    * its ~31-token dict) so the registered query actually EXECUTES the
    * EM/prune rounds, not just the seeding — a production run pins its
    * own size (32k-ish); same trainer.
    */
  val TargetVocab = 120

  /** Fraction of prunable (multi-char) pieces dropped per round. */
  val PruneFrac = 0.25

  /** EM iterations between prune rounds. */
  val EmIters = 2

  /** Seed candidate pieces from the dict words' substrings: score =
    * (occurrence frequency weighted by word freq) × piece length (the
    * "long frequent substrings first" heuristic standing in for the
    * suffix-array ESA scores). Single characters are always kept —
    * they are the coverage floor Viterbi falls back to.
    */
  def seed(dict: Seq[(String, Long)]): Seq[(String, Long)] = {
    val counts = scala.collection.mutable.Map.empty[String, Long]
    dict.foreach { case (w, f) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= SeedMaxLen && i + l <= w.length) {
          val s = w.substring(i, i + l)
          counts(s) = counts.getOrElse(s, 0L) + f
          l += 1
        }
        i += 1
      }
    }
    val chars = counts.filter(_._1.length == 1).toSeq
    val multi = counts.filter(_._1.length > 1).toSeq
      .map { case (s, c) => (s, c * s.length) }
      .sortBy { case (s, sc) => (-sc, s) }
      .take(math.max(SeedCap - chars.size, 0))
    (chars.map { case (s, c) => (s, c) } ++ multi).sortBy(_._1)
  }

  /** Viterbi segmentation of `word` under piece probabilities: the
    * maximum-product path over the piece lattice. Ties break toward
    * FEWER pieces, then per-cell toward the lexicographically smaller
    * last piece — exact comparisons on correctly-rounded doubles, so
    * the winner is a deterministic, engine- and partition-invariant
    * function of (word, probs).
    */
  def segment(word: String, probs: Map[String, Double]): Seq[String] = {
    val n = word.length
    if (n == 0) return Seq.empty
    // best(i): (score, pieces) for word[0,i)
    val score = Array.fill(n + 1)(-1.0)
    val nPieces = Array.fill(n + 1)(Int.MaxValue)
    val back = Array.fill(n + 1)(-1) // start index of last piece
    score(0) = 1.0
    nPieces(0) = 0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - SeedMaxLen)
      while (j < i) {
        if (score(j) > 0) {
          val piece = word.substring(j, i)
          probs.get(piece) match {
            case Some(p) =>
              val s = score(j) * p
              val np = nPieces(j) + 1
              val better = s > score(i) ||
                (s == score(i) && (np < nPieces(i) ||
                  (np == nPieces(i) && back(i) >= 0 &&
                    piece < word.substring(back(i), i))))
              if (better) { score(i) = s; nPieces(i) = np; back(i) = j }
            case None => ()
          }
        }
        j += 1
      }
      i += 1
    }
    if (score(n) <= 0) return word.map(_.toString) // unreachable: chars always in vocab
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var k = n
    while (k > 0) { out += word.substring(back(k), k); k = back(k) }
    out.reverse.toSeq
  }

  /** Train the unigram LM: seed → (EM × prune) rounds until the vocab
    * fits [[TargetVocab]]. Hard (Viterbi) EM: E-step counts pieces
    * along each dict word's best segmentation weighted by word freq;
    * M-step renormalizes. Pruning drops the lowest-expected-count
    * multi-char pieces ([[PruneFrac]] per round); single chars never
    * prune (coverage). Returns piece → probability.
    */
  def train(dict: Seq[(String, Long)]): Map[String, Double] = {
    var vocab: Seq[(String, Long)] = seed(dict)
    val total0 = vocab.map(_._2).sum.toDouble
    var probs: Map[String, Double] = vocab.map { case (s, c) => s -> c / total0 }.toMap
    var rounds = 0
    while (probs.size > TargetVocab && rounds < 20) {
      var it = 0
      var counts: Map[String, Double] = Map.empty
      while (it < EmIters) {
        val c = scala.collection.mutable.Map.empty[String, Double]
        dict.foreach { case (w, f) =>
          segment(w, probs).foreach { p =>
            c(p) = c.getOrElse(p, 0.0) + f.toDouble
          }
        }
        val tot = c.values.sum
        counts = c.toMap
        probs = probs.map { case (s, _) => s -> (counts.getOrElse(s, 0.0) / tot) }
        it += 1
      }
      // prune: drop lowest-count multi-char pieces, ties on piece asc
      val multi = probs.keys.filter(_.length > 1).toSeq
        .sortBy(s => (counts.getOrElse(s, 0.0), s))
      val nDrop = math.min(
        math.max((multi.size * PruneFrac).toInt, 1),
        math.max(probs.size - TargetVocab, 0))
      val dropped = multi.take(nDrop).toSet
      probs = probs.filter { case (s, _) => !dropped.contains(s) }
      // renormalize over the surviving vocab
      val z = probs.values.sum
      probs = probs.map { case (s, p) => s -> p / z }
      rounds += 1
    }
    probs
  }

  /** Q-TEXT-UNIGRAM: elect the word dict (the one corpus scan — shared
    * with BPE), train the unigram LM on the driver, then Viterbi-encode
    * the dict rows and emit the correctness gates in-row.
    */
  def unigram(s: SparkSession, d: String): DataFrame = {
    val dict = Bpe.dictLocal(s, d)
    val probs = train(dict)
    val probsBc = s.sparkContext.broadcast(probs)
    val encodeUdf = udf { (w: String) => segment(w, probsBc.value) }
    val inVocabUdf = udf { (ps: Seq[String]) => ps.forall(probsBc.value.contains) }
    s.createDataFrame(dict).toDF("tok", "freq")
      .withColumn("pieces", encodeUdf(col("tok")))
      .select(col("tok"), col("freq"), length(col("tok")).cast("long").as("n_chars"),
        (concat_ws("", col("pieces")) === col("tok")).as("reconstructs"),
        (size(col("pieces")) >= 1 &&
          size(col("pieces")) <= length(col("tok"))).as("n_pieces_ok"),
        inVocabUdf(col("pieces")).as("pieces_in_vocab"))
  }

  val unigramSql: String = {
    import Portable._
    s"""WITH w AS (
       |  SELECT tok, count(*)::BIGINT AS freq
       |  FROM (SELECT unnest(${tokensSql("text")}) AS tok FROM documents)
       |  GROUP BY tok ORDER BY freq DESC, tok LIMIT ${Bpe.DictCap})
       |SELECT tok, freq, len(tok)::BIGINT AS n_chars,
       |  TRUE AS reconstructs, TRUE AS n_pieces_ok, TRUE AS pieces_in_vocab
       |FROM w""".stripMargin
  }

  /** Q-TEXT-UNIGRAM-ENCODE: tokenize the CORPUS under the trained
    * unigram LM — the stage a training pipeline actually runs at scale
    * (the dict-row encode above gates the trainer; this measures the
    * fan-out). Per document: word count, word-char total (both
    * oracle-exact), and the encode correctness gates folded across
    * every word in the document.
    *
    * Shape at 100 TB: piece scores broadcast once; encoding is a
    * map-only `mapPartitions` pass with a PER-PARTITION word→pieces
    * memo — Zipf makes the hit rate high (the fixture corpus's ~31
    * distinct words mean each partition Viterbis each word once, then
    * serves from the memo), so the cost per row is a hash probe, not a
    * lattice DP. No shuffle, no driver collect beyond the dict the
    * trainer already holds.
    */
  def unigramEncode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dict = Bpe.dictLocal(s, d)
    val probs = train(dict)
    val probsBc = s.sparkContext.broadcast(probs)
    graft.Tables.par(graft.Tables.documents(s, d))
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        val p = probsBc.value
        val memo = scala.collection.mutable.HashMap.empty[String, Seq[String]]
        rows.map { case (id, text) =>
          // whitespace tokenization, matched to Portable.tokens / the
          // oracle's string_split_regex('\s+') rendering
          val words = text.split("\\s+").filter(_.nonEmpty)
          var pieces = 0L
          var chars = 0L
          var ok = true
          var inVocab = true
          words.foreach { w =>
            val ps = memo.getOrElseUpdate(w, segment(w, p))
            pieces += ps.length
            chars += w.length
            ok &&= ps.mkString("") == w
            inVocab &&= ps.forall(p.contains)
          }
          (id, words.length.toLong, chars, ok,
            words.isEmpty || (pieces >= words.length && pieces <= chars), inVocab)
        }
      }
      .toDF("doc_id", "n_words", "n_word_chars",
        "reconstructs_all", "pieces_bounded", "pieces_in_vocab_all")
  }

  val unigramEncodeSql: String = {
    import Portable._
    s"""SELECT doc_id,
       |  len(${tokensSql("text")})::BIGINT AS n_words,
       |  list_reduce(list_prepend(0, list_transform(${tokensSql("text")},
       |    t -> len(t)::BIGINT)), (a, b) -> a + b)::BIGINT AS n_word_chars,
       |  TRUE AS reconstructs_all, TRUE AS pieces_bounded, TRUE AS pieces_in_vocab_all
       |FROM documents""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q_text_unigram", unigram, Some(unigramSql)),
    Q("q_text_unigram_encode", unigramEncode, Some(unigramEncodeSql)))
}
