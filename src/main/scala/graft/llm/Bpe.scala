package graft.llm

import graft.Tables
import graft.queries.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary learning + subword encoding — the
  * tokenizer-training stage of an LLM data pipeline (Sennrich et al.
  * 2016; the merge-list form used by GPT-2/RoBERTa tokenizers).
  *
  * Division of labor at 100 TB (the same split every production BPE
  * trainer uses — HF tokenizers, fastBPE, SentencePiece's BPE mode):
  *
  *   - the CORPUS-sized work — word counting — is one map-side-combined
  *     compact-pair shuffle (token → freq), exactly [[TextOps.vocab]]'s
  *     scan; document payloads never move;
  *   - merge learning runs on the WORD-FREQUENCY DICT, which is
  *     vocabulary-sized (Heaps' law: sublinear in corpus size) and is
  *     the data a driver/single node holds by design — the same
  *     bounded-collect contract as the k-means centroids and the
  *     elected vocab;
  *   - ENCODING fans back out: the learned merge ranks broadcast to
  *     executors and every word/document encodes independently inside
  *     a map stage (here via a Scala UDF — iterative greedy pair
  *     merging has no Spark built-in; SURVEY §4's UDF carve-out).
  *
  * Determinism: ties in pair counts break by pair lexicographic order,
  * and the dict itself is elected by (freq DESC, token ASC) — the
  * learned merge list is a pure function of the corpus, so re-training
  * on re-partitioned data yields byte-identical vocabularies.
  *
  * Oracle strategy (`q_text_bpe`): DuckDB cannot run BPE, so the row
  * set is the elected dict with its EXACT columns (token, freq,
  * n_chars — hash-matched) plus the encode correctness GATES as in-row
  * booleans the oracle emits as TRUE (the estimate-twin pattern used
  * by every sketch query): `reconstructs` (pieces concatenate back to
  * the token), `n_pieces_ok` (1 ≤ pieces ≤ chars), `pieces_in_vocab`
  * (every piece is a learned merge product or a single character).
  * A broken trainer or encoder fails a gate; BpeSpec additionally pins
  * the merge list and segmentations against an independent
  * implementation.
  */
object Bpe {

  /** Merge steps to learn; enough to form multi-char subwords on the
    * synthetic corpus while keeping the registered query sub-second.
    */
  val NumMerges = 60

  /** Dict cap for the registered query (driver-bounded by the same
    * budget argument as the vocab election; real trainers cap too).
    */
  val DictCap = 1500

  /** Learn `numMerges` merges from a (word, freq) dict. Returns merge
    * pairs in training order (rank = index).
    */
  def train(dict: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var words: Array[(Array[String], Long)] =
      dict.map { case (w, f) => (w.map(_.toString).toArray, f) }.toArray
    val merges = Seq.newBuilder[(String, String)]
    var step = 0
    var done = false
    while (step < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, f) => (mergeOnce(syms, best), f) }
        step += 1
      }
    }
    merges.result()
  }

  /** One left-to-right merge pass of `pair` over a symbol sequence. */
  private def mergeOnce(syms: Array[String], pair: (String, String)): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Encode one word with learned merge ranks: repeatedly apply the
    * LOWEST-ranked adjacent pair present (the standard BPE encode;
    * equivalent to replaying the merges in training order — BpeSpec
    * pins the equivalence).
    */
  def encode(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var syms = word.map(_.toString).toArray
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (bestPair == null) continue = false
      else syms = mergeOnce(syms, bestPair)
    }
    syms.toSeq
  }

  /** Dict election: the one corpus-sized stage. `orderBy(...).limit`
    * with no intervening projection so the physical plan is the
    * per-partition top-k merge (`TakeOrderedAndProject`), never a
    * range-partitioned global sort — PlanSpec pins this.
    */
  def electDict(s: SparkSession, d: String): DataFrame = {
    import Portable._
    Tables.par(Tables.documents(s, d))
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("tok")).limit(DictCap)
  }

  /** The elected dict on the driver, METERED (VERDICT r15 #5): already
    * bounded by [[DictCap]] rows; this is the one collect all three
    * tokenizer trainers (BPE/unigram/WordPiece) share, and it records
    * the dict's MEASURED bytes under `tokenizer_dict` so the
    * bounded-model-artifact contract is a number in the bench artifact,
    * not a design claim.
    */
  def dictLocal(s: SparkSession, d: String): Seq[(String, Long)] =
    graft.HeapWatermark.recordRows("tokenizer_dict", electDict(s, d).collect())
      .map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Q-TEXT-BPE: elect the word dict (one corpus scan, collected under
    * the same bounded-dict contract the trainer needs anyway), learn
    * the merges on the driver, then encode + gate the dict rows. The
    * output side starts from the already-collected dict — re-deriving
    * it from the corpus would scan 100 TB a second time to rebuild
    * 1500 rows we are holding.
    */
  def bpe(s: SparkSession, d: String): DataFrame = {
    val dict = dictLocal(s, d)
    val merges = train(dict, NumMerges)
    val ranks = merges.zipWithIndex.toMap
    val vocab: Set[String] =
      dict.flatMap(_._1.map(_.toString)).toSet ++ merges.map(p => p._1 + p._2)
    val ranksBc = s.sparkContext.broadcast(ranks)
    val vocabBc = s.sparkContext.broadcast(vocab)
    val encodeUdf = udf { (w: String) => encode(w, ranksBc.value) }
    val inVocabUdf = udf { (ps: Seq[String]) => ps.forall(vocabBc.value.contains) }
    s.createDataFrame(dict).toDF("tok", "freq")
      .withColumn("pieces", encodeUdf(col("tok")))
      .select(col("tok"), col("freq"), length(col("tok")).cast("long").as("n_chars"),
        (concat_ws("", col("pieces")) === col("tok")).as("reconstructs"),
        (size(col("pieces")) >= 1 &&
          size(col("pieces")) <= length(col("tok"))).as("n_pieces_ok"),
        inVocabUdf(col("pieces")).as("pieces_in_vocab"))
  }

  val bpeSql: String = {
    import Portable._
    s"""WITH w AS (
       |  SELECT tok, count(*)::BIGINT AS freq
       |  FROM (SELECT unnest(${tokensSql("text")}) AS tok FROM documents)
       |  GROUP BY tok ORDER BY freq DESC, tok LIMIT $DictCap)
       |SELECT tok, freq, len(tok)::BIGINT AS n_chars,
       |  TRUE AS reconstructs, TRUE AS n_pieces_ok, TRUE AS pieces_in_vocab
       |FROM w""".stripMargin
  }

  val all: Seq[Q] = Seq(Q("q_text_bpe", bpe, Some(bpeSql)))
}
