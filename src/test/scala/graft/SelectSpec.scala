package graft

import graft.llm.{Dedup, Select}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Behavior checks for the data-selection operators ([[graft.llm.Select]]):
  * the oracle harness proves bit-equality with DuckDB; these assert the
  * SEMANTIC properties each operator exists for.
  */
class SelectSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  test("lm score: probabilities are probabilities; rare tokens depress the score") {
    val rows = Select.lmScore(spark, sf)
      .select(col("doc_id"), col("mean_tok_prob"), col("rare_ratio"), col("n_rare"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p, rr) = (r.getDouble(1), r.getDouble(2))
      assert(p > 0.0 && p < 1.0, s"doc ${r.getLong(0)}: mean_tok_prob $p out of (0,1)")
      assert(rr >= 0.0 && rr <= 1.0)
    }
    // any doc holding rare tokens must score a lower mean prob than the
    // rare-free average (the rare token's probability drags the mean)
    val withRare = rows.filter(_.getLong(3) > 0)
    if (withRare.nonEmpty) {
      val cleanAvg = rows.filter(_.getLong(3) == 0).map(_.getDouble(1)).sum /
        rows.count(_.getLong(3) == 0)
      assert(withRare.map(_.getDouble(1)).max < cleanAvg,
        "a rare-token doc scored above the clean-doc average")
    }
  }

  test("classifier: prediction is the score sign; scores are bounded mean differences") {
    val rows = Select.classifier(spark, sf)
      .select(col("score_num"), col("score"), col("pred_target")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2) == (r.getLong(0) > 0L), "pred_target != sign(score_num)")
      // |mean(p_t - p_r)| <= 1
      assert(math.abs(r.getDouble(1)) <= 1.0)
    }
  }

  test("split is leakage-safe: no near-dup pair straddles train/val") {
    val splits = Select.split(spark, sf)
      .select(col("doc_id"), col("split"))
    val pairs = Dedup.minhashPairs(spark, sf).select(col("doc_a"), col("doc_b"))
    val straddle = pairs
      .join(splits.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("split", "sa"), "doc_a")
      .join(splits.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("split", "sb"), "doc_b")
      .filter(col("sa") =!= col("sb"))
      .count()
    assert(straddle == 0L, s"$straddle near-dup pairs straddle the split")
    // and both sides are non-trivially populated at the 90/10 hash split
    val bySplit = splits.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.getOrElse("train", 0L) > 0L)
  }

  test("domain cap: ranks are dense per source and the cap binds exactly") {
    val df = Select.domainCap(spark, sf)
    val perSource = df.groupBy(col("source"))
      .agg(count(lit(1)).as("n"), max(col("rk")).as("max_rk"),
        countDistinct(col("rk")).as("n_rk"),
        sum(when(col("kept_cap"), 1L).otherwise(0L)).as("n_kept"),
        first(col("n_docs_source")).as("n_docs_source"))
      .collect()
    assert(perSource.nonEmpty)
    perSource.foreach { r =>
      val (n, maxRk, nRk, nKept, nSrc) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(n == nSrc && maxRk == n && nRk == n, s"${r.getString(0)}: ranks not dense 1..$n")
      assert(nKept == math.min(Select.DomainCap.toLong, n),
        s"${r.getString(0)}: cap kept $nKept of $n")
    }
  }

  test("search: top-k docs all contain a query term, ranks dense, scores non-increasing") {
    import graft.llm.Portable
    val res = Select.search(spark, sf).collect()
      .groupBy(_.getString(0))
    assert(res.keySet == Select.SearchQueries.map(_._1).toSet)
    val docToks = Tables.documents(spark, sf)
      .select(col("doc_id"), Portable.tokens(col("text")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    for ((qid, rows) <- res; terms = Select.SearchQueries.toMap.apply(qid)) {
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length), s"$qid ranks not dense")
      assert(sorted.length <= Select.SearchTopK)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getDouble(3) >= b.getDouble(3), s"$qid scores increase")
        case _ =>
      }
      sorted.foreach { r =>
        assert(terms.exists(docToks(r.getLong(2)).contains),
          s"$qid returned doc ${r.getLong(2)} containing no query term")
      }
    }
  }
}
