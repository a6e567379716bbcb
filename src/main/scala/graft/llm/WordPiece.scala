package graft.llm

import graft.Tables
import graft.queries.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WordPiece vocabulary learning + greedy longest-match encoding — the
  * third tokenizer family beside BPE ([[Bpe]]) and unigram-LM
  * ([[Unigram]]): the BERT-lineage scheme (Schuster & Nakajima 2012;
  * the HF `WordPieceTrainer` formulation). Training is BPE's merge
  * loop with a LIKELIHOOD score — pick the pair maximizing
  * `count(ab) / (count(a)·count(b))` instead of raw `count(ab)` — and
  * continuation symbols carry the `##` prefix; encoding is rank-free
  * greedy longest-match-first against the final vocab.
  *
  * Division of labor at 100 TB is identical to [[Bpe]] (and every
  * production trainer): the corpus-sized stage is ONE word-count
  * shuffle; merge learning runs on the vocabulary-sized dict under the
  * bounded-collect contract; encoding broadcasts the vocab and fans
  * out embarrassingly parallel.
  *
  * Determinism: the score is a ratio of exact integer counts — the
  * argmax compares `c₁·fa₂·fb₂` vs `c₂·fa₁·fb₁` cross-multiplied in
  * BigInt (no float ratio ever forms), ties break on pair
  * lexicographic order, so the learned vocab is a pure function of
  * the corpus under any partitioning.
  *
  * Oracle strategy (`q_text_wordpiece`/`q_text_wordpiece_encode`):
  * DuckDB cannot run the trainer — the row set is the elected dict /
  * per-doc token stats with EXACT hash-matched columns, and encode
  * correctness rides as in-row boolean gates the oracle emits TRUE
  * (the [[Bpe]]/[[Unigram]] pattern); WordPieceSpec pins training and
  * encoding against an independent recompute.
  */
object WordPiece {

  /** Merge steps; same budget rationale as [[Bpe.NumMerges]]. */
  val NumMerges = 60

  /** Word as WordPiece symbols: first char plain, rest `##`-prefixed. */
  def toSymbols(w: String): Array[String] =
    w.zipWithIndex.map { case (c, i) =>
      if (i == 0) c.toString else "##" + c
    }.toArray

  /** Join rule: the continuation marker survives only on the left
    * piece (`a`+`##b`→`ab`, `##a`+`##b`→`##ab`).
    */
  def join(a: String, b: String): String = a + b.stripPrefix("##")

  /** Learn up to `numMerges` merges from a (word, freq) dict; returns
    * them in training order.
    */
  def train(dict: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var words: Array[(Array[String], Long)] =
      dict.map { case (w, f) => (toSymbols(w), f) }.toArray
    val merges = Seq.newBuilder[(String, String)]
    var step = 0
    var done = false
    while (step < numMerges && !done) {
      val symFreq = scala.collection.mutable.Map.empty[String, Long]
      val pairFreq = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length) {
          symFreq(syms(i)) = symFreq.getOrElse(syms(i), 0L) + f
          if (i < syms.length - 1) {
            val k = (syms(i), syms(i + 1))
            pairFreq(k) = pairFreq.getOrElse(k, 0L) + f
          }
          i += 1
        }
      }
      if (pairFreq.isEmpty) done = true
      else {
        // argmax of c/(fa·fb), exact: cross-multiplied BigInt compare
        var best: (String, String) = null
        var bestC, bestFa, bestFb = BigInt(0)
        pairFreq.foreach { case (p @ (a, b), c) =>
          val (cc, fa, fb) = (BigInt(c), BigInt(symFreq(a)), BigInt(symFreq(b)))
          val cmp =
            if (best == null) 1
            else {
              val d = (cc * bestFa * bestFb).compare(bestC * fa * fb)
              if (d != 0) d
              else if (a != best._1) best._1.compare(a) // lexicographic tie-break
              else best._2.compare(b)
            }
          if (cmp > 0) { best = p; bestC = cc; bestFa = fa; bestFb = fb }
        }
        merges += best
        words = words.map { case (syms, f) => (mergeOnce(syms, best), f) }
        step += 1
      }
    }
    merges.result()
  }

  private def mergeOnce(syms: Array[String], pair: (String, String)): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += join(syms(i), syms(i + 1)); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** The final vocab: every initial symbol of the dict + every merge
    * product.
    */
  def vocabOf(dict: Seq[(String, Long)], merges: Seq[(String, String)]): Set[String] =
    dict.flatMap(w => toSymbols(w._1)).toSet ++ merges.map(p => join(p._1, p._2))

  val Unk = "[UNK]"

  /** Greedy longest-match-first encode (BERT's WordPiece runtime): at
    * each position take the LONGEST vocab piece (`##`-prefixed past
    * position 0); any position with no match makes the whole word
    * [[Unk]] (the reference BERT behavior).
    */
  def encode(word: String, vocab: Set[String]): Seq[String] = {
    val out = Seq.newBuilder[String]
    var start = 0
    while (start < word.length) {
      var end = word.length
      var piece: String = null
      while (end > start && piece == null) {
        val cand = (if (start == 0) "" else "##") + word.substring(start, end)
        if (vocab.contains(cand)) piece = cand else end -= 1
      }
      if (piece == null) return Seq(Unk)
      out += piece
      start = end
    }
    out.result()
  }

  /** Q-TEXT-WORDPIECE: elect the word dict ([[Bpe.electDict]] — the
    * single corpus-sized stage, shared definition), learn the
    * likelihood merges on the driver, encode + gate the dict rows.
    */
  def wordpiece(s: SparkSession, d: String): DataFrame = {
    val dict = Bpe.dictLocal(s, d)
    val merges = train(dict, NumMerges)
    val vocab = vocabOf(dict, merges)
    val vocabBc = s.sparkContext.broadcast(vocab)
    val encodeUdf = udf { (w: String) => encode(w, vocabBc.value) }
    s.createDataFrame(dict).toDF("tok", "freq")
      .withColumn("pieces", encodeUdf(col("tok")))
      .select(col("tok"), col("freq"), length(col("tok")).cast("long").as("n_chars"),
        // dict words are made of corpus alphabet symbols — all in
        // vocab — so a correct encoder never UNKs here
        (concat_ws("", transform(col("pieces"),
          p => regexp_replace(p, "^##", ""))) === col("tok")).as("reconstructs"),
        (size(col("pieces")) >= 1 &&
          size(col("pieces")) <= length(col("tok"))).as("n_pieces_ok"),
        (!array_contains(col("pieces"), Unk)).as("no_unk"))
  }

  val wordpieceSql: String = {
    import Portable._
    s"""WITH w AS (
       |  SELECT tok, count(*)::BIGINT AS freq
       |  FROM (SELECT unnest(${tokensSql("text")}) AS tok FROM documents)
       |  GROUP BY tok ORDER BY freq DESC, tok LIMIT ${Bpe.DictCap})
       |SELECT tok, freq, len(tok)::BIGINT AS n_chars,
       |  TRUE AS reconstructs, TRUE AS n_pieces_ok, TRUE AS no_unk
       |FROM w""".stripMargin
  }

  /** Q-TEXT-WORDPIECE-ENCODE: encode the document stream itself
    * (the [[Unigram.unigramEncode]] shape): per doc, exact word/char
    * counts hash-matched, encode invariants as in-row gates. Words
    * outside the elected dict still encode from the learned vocab's
    * symbols — UNK only where a word contains a character the dict's
    * alphabet lacks, counted exactly.
    */
  def wordpieceEncode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dict = Bpe.dictLocal(s, d)
    val vocab = vocabOf(dict, train(dict, NumMerges))
    val vocabBc = s.sparkContext.broadcast(vocab)
    Tables.par(Tables.documents(s, d))
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        val v = vocabBc.value
        val memo = scala.collection.mutable.HashMap.empty[String, Seq[String]]
        rows.map { case (id, text) =>
          val words = text.split("\\s+").filter(_.nonEmpty)
          var unks = 0L
          var alien = 0L
          var ok = true
          var inVocab = true
          words.foreach { w =>
            val ps = memo.getOrElseUpdate(w, encode(w, v))
            // UNK ⟺ some position's single-char symbol is outside the
            // learned alphabet: single chars of every dict word are in
            // the vocab, so encode only dead-ends on an alien char
            if (w.zipWithIndex.exists { case (c, i) =>
                !v.contains((if (i == 0) "" else "##") + c) }) alien += 1
            if (ps == Seq(Unk)) unks += 1
            else {
              ok &&= ps.map(_.stripPrefix("##")).mkString("") == w
              inVocab &&= ps.forall(v.contains)
            }
          }
          (id, words.length.toLong, ok, inVocab, unks == alien)
        }
      }
      .toDF("doc_id", "n_words", "reconstructs_all", "pieces_in_vocab_all", "unk_sound")
  }

  val wordpieceEncodeSql: String = {
    import Portable._
    s"""SELECT doc_id,
       |  len(${tokensSql("text")})::BIGINT AS n_words,
       |  TRUE AS reconstructs_all, TRUE AS pieces_in_vocab_all, TRUE AS unk_sound
       |FROM documents""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q_text_wordpiece", wordpiece, Some(wordpieceSql)),
    Q("q_text_wordpiece_encode", wordpieceEncode, Some(wordpieceEncodeSql)))
}
