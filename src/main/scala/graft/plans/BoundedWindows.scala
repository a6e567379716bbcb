package graft.plans

/** The registry's ONLY legal partition-less windows — each input is
  * provably bounded (a preceding `limit`, a fixed grid, or a small
  * dimension aggregate), never the raw fact stream, with the bound
  * argued inline. Everything else must use [[BucketedOrder]] or a
  * keyed window.
  *
  * Shared by two gates so they cannot drift:
  *   - PlanSpec's static gate walks every registered query's optimized
  *     plan and fails on a partition-less `Window` not listed here;
  *   - Bench's runtime gate captures `WindowExec` "No Partition
  *     Defined" warnings per query and fails the run if the emitting
  *     query isn't listed — so a NEW unbounded window can't hide in
  *     the expected warn noise of the bench tail (it would pass the
  *     static gate only by being off-registry, e.g. inside a
  *     foreachBatch body the logical walk never sees).
  */
object BoundedWindows {
  val justification: Map[String, String] = Map(
    "q_corpus_temperature" -> "2 windows over the per-SOURCE count aggregate (V rows)",
    "q_prod_anomaly" -> "rolling 7-day stats over the per-DAY rollup — calendar-bounded (≤366·years rows)",
    "q_stream_anomaly" -> "the same day-rollup verdict window over the watermark-finalized daily series",
    "q_ingest_quota" -> "median rank over the (org × day) rollup — 20 × days dimension rows",
    "q_corpus_weighted_sample" -> "tau window AFTER .limit(SampleK+1) — k+1 rows",
    "q_flag_bootstrap" -> "CI rank over the 200-replicate dimension (BootReplicates rows)",
    "q_sim_index_stats" -> "cell-balance window over the K-centroid aggregate (K rows)",
    "q_text_mix" -> "mixTargets window over the per-LANG count aggregate (V rows)",
    "q_text_mix_topk" -> "same mixTargets V-row window",
    "q_text_search" -> "per-query rank AFTER .limit(SearchTopK) — k rows, 3 queries",
    "q_text_vocab" -> "id assignment AFTER .limit(VocabSize) — V rows (Heaps-bounded)")
}
