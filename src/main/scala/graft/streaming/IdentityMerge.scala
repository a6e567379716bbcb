package graft.streaming

import graft.state.{IdentityResolver, PersonOp, PersonRecord, Replay, ResolvedOp}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.storage.StorageLevel

/** Streaming identity merge — the cross-batch alias resolver.
  *
  * The keyed-state folds in [[Streaming]] handle per-id updates, but a
  * mid-stream alias between two ALREADY-materialized person records
  * cannot be expressed as keyed state: Spark's state store scopes each
  * key's state to itself, while the reference merges two live records
  * inside the Durable Object at alias time
  * (`/root/reference/src/persons.rs:255-338`). Each micro-batch is
  * reconciled against the state in four steps —
  *
  *   1. RESOLVE: map the batch's ids through the redirect dimension
  *      derived from state (`distinct_id → canonical_id` for every
  *      registered non-canonical id — depth-1 complete by
  *      construction, so no chain walk is needed here);
  *   2. CONNECT: connected components over THIS batch's resolved alias
  *      edges ([[IdentityResolver.localComponents]]) give the fold
  *      key — two existing canonical ids linked by a new edge land in
  *      one group;
  *   3. RE-KEY + MERGE: records whose canonical id joins a touched
  *      component are re-keyed to it and cogrouped with the batch's
  *      ops; [[Replay.foldComponent]] — the SAME fold as batch replay —
  *      runs seeded with those records, so merge-prefers-primary and
  *      version absorption are shared code, not a re-implementation;
  *   4. COMMIT: untouched records (a narrow filter against the batch's
  *      component-key set — the full state never shuffles) union the
  *      folded survivors into the next state epoch.
  *
  * Parity: after any prefix of batches the state equals batch
  * [[Replay.persons]] over the ops seen so far, provided each entity's
  * ops arrive in `ord` order across batches (within a batch, order is
  * free — the fold sorts). That is the reference's own guarantee: a DO
  * applies updates in arrival order (`persons.rs:488-542`).
  *
  * WHY the state loop runs on RDDs, not DataFrames (the one deliberate
  * exception to graft's Dataset-first rule, per SURVEY §4's carve-out):
  * the first cut of this operator WAS fully declarative — the redirect
  * dimension, component keys, and touched set were broadcast-joined
  * DataFrames and the commit was a Dataset union. Profiling it at
  * sf0.1 showed ~0.8 s PER EPOCH of driver-side Catalyst work
  * (analysis + optimization + codegen of the RDD-rooted state join
  * forest, re-planned every epoch because the state leaf is new each
  * time) against ~0.25 s of actual cluster execution — at a 1-second
  * micro-batch cadence the planner alone would consume the whole
  * budget, and the cost is per-BATCH, not per-byte, so no cluster
  * makes it better. Keyed state maintenance is exactly the imperative
  * per-partition logic the RDD layer is for (it is what Structured
  * Streaming's own stateful operators do internally); the dimension
  * maps this trades through the driver (redirects, per-batch
  * components, touched comps) are the SAME sets the declarative form
  * moved through broadcast exchanges — one driver hop either way, now
  * without re-planning.
  *
  * At scale: per epoch the work is proportional to the BATCH size
  * (ops, their redirect lookups, the touched records), not the state
  * size — untouched state passes through a narrow filter (no shuffle),
  * only touched records and the batch's ops shuffle into the cogroup,
  * and lineage is cut per epoch by re-rooting the state RDD (locally
  * here; a production deployment writes the epoch delta to the lake
  * keyed by `batchId`, idempotent like [[graft.sources.Lake]]).
  *
  * Past the driver budget the operator DEGRADES instead of erroring:
  * each per-epoch dimension is probed (count + chars, no collect)
  * before it is shipped, and an over-budget dimension flips ITS stage
  * to a distributed form for that epoch — redirect resolution becomes
  * two batch-sized join shuffles against the redirect dimension, and a
  * pathological batch id dimension routes through the SHARED CC
  * fixpoint ([[IdentityResolver.components]]) with join-based
  * re-keying (which inherently pays one full-state shuffle to split
  * touched from untouched). The two probes are independent, so a
  * 100 TB-scale person dimension with normal micro-batches keeps the
  * narrow no-shuffle state filter and only moves the resolve step off
  * the driver. Distributed epochs pay per-epoch Catalyst planning for
  * the CC fixpoint — acceptable exactly because such epochs are huge;
  * parity with batch [[Replay.persons]] is pinned for both regimes by
  * IdentityMergeSpec (a mid-stream budget cross included).
  */
final class IdentityMergeState(
    spark: SparkSession,
    driverHeapBudget: Long = IdentityResolver.LocalHeapBudget) {
  import spark.implicits._

  private var stateRdd: RDD[PersonRecord] =
    spark.sparkContext.emptyRDD[PersonRecord]
  private var epoch: Long = -1L

  /** Target committed-state rows per partition (sizes the state's
    * partition-count growth as rows accumulate across epochs; the
    * PersonRecord dimension is compact, so 1M rows ≈ low-hundreds of
    * MB — well under block limits with headroom).
    */
  private val StateRowsPerPartition = 1L << 20

  /** Target batch-ops rows per partition for the per-epoch shuffles
    * (id-pair distinct, cogroup fold). Ops rows are small; 64k rows is
    * a comfortably sub-second task, and the floor of 2 keeps every
    * epoch exercising real distribution.
    */
  private val OpsRowsPerPartition = 1L << 16

  /** Committed-state width: derived from the last committed row count
    * (ceil(rows / [[StateRowsPerPartition]])), monotone — so a stream
    * of narrow micro-batches cannot pin a large accumulated state at
    * the batch width, and (being size-derived only) a one-off WIDE
    * batch cannot pin the state at ITS width either.
    */
  private var statePartsHint: Int = 2

  /** Rows in the last committed state — the pre-count upper-bound input
    * for the commit width (new rows ≤ last committed + batch ops).
    */
  private var lastStateRows: Long = 0L

  /** (ccMap, touchedSet) of the LAST committed epoch — the dimension
    * that identifies which committed records that epoch changed, kept
    * for [[saveDelta]]'s touched-records filter. Driver-resident and
    * batch-dimension-bounded (the same collects processBatch already
    * budget-gates).
    */
  private var lastDims: Option[(Map[String, String], Set[String])] = None

  /** (dir, epoch) of this handle's last snapshot write (or the restore
    * point, which validated the dir's lineage) — the handle-local
    * authority [[saveDelta]]'s contiguity guard requires IN ADDITION to
    * the dir scan: epoch numbers alone cannot distinguish "I wrote
    * epoch N−1 here" from a FOREIGN run's dir whose numbering happens
    * to collide, and chaining a delta onto another run's base would
    * merge two unrelated states on restore.
    */
  private var lastSaved: Option[(String, Long)] = None

  /** Highest committed batch id (-1 = fresh state, nothing folded). */
  def committedEpoch: Long = synchronized(epoch)

  /** (lastStateRows, statePartsHint) — the commit-width inputs, exposed
    * for the restore-seeding regression spec only.
    */
  private[graft] def sizeHints: (Long, Int) = synchronized((lastStateRows, statePartsHint))

  /** Current records (canonical state, `person_seq_id` unassigned). */
  def records: Dataset[PersonRecord] = spark.createDataset(stateRdd)

  /** Probe a per-epoch dimension's driver footprint WITHOUT collecting:
    * a cheap (count, chars) fold (narrow over the persisted source),
    * returning whether [[IdentityResolver.estimatedHeapBytes]] fits the
    * budget. The probe-first contract is shared with
    * [[IdentityResolver.components]]: an over-budget dimension is never
    * shipped to the driver to find out it doesn't fit.
    */
  private def dimFits[T](rdd: RDD[T], chars: T => Long): Boolean = {
    val (n, c) = rdd.map(t => (1L, chars(t)))
      .fold((0L, 0L)) { case ((n1, c1), (n2, c2)) => (n1 + n2, c1 + c2) }
    IdentityResolver.estimatedHeapBytes(n, c) <= driverHeapBudget
  }

  /** Collect a probe-approved dimension and record the measured
    * watermark: the bytes model applied to the rows ACTUALLY retained
    * (count + exact char sum of the collected array) — the bench
    * artifact carries the per-site maxima (HeapWatermark).
    */
  private def collectMeasured[T: scala.reflect.ClassTag](
      rdd: RDD[T], chars: T => Long, what: String): Array[T] = {
    val arr = rdd.collect()
    graft.HeapWatermark.record(s"identity_merge.$what",
      IdentityResolver.estimatedHeapBytes(arr.length.toLong,
        arr.iterator.map(chars).sum))
    arr
  }

  /** Loud, once-per-epoch note that a dimension outgrew the driver
    * budget and the epoch is running the distributed fallback — the
    * degradation is by design (100 TB id dimensions exist), but an
    * operator watching the stream should see the regime change.
    */
  private def noteDegrade(batchId: Long, what: String): Unit =
    System.err.println(
      s"[identity-merge] batch=$batchId: $what dimension exceeds the driver budget " +
        s"(${driverHeapBudget >> 20} MiB) - degrading to the distributed " +
        "resolve/CC path for this epoch (join-based re-key; full-state shuffle " +
        "only if the batch dimension itself is over budget)")

  /** Fold one micro-batch of ops into the state. Idempotent by
    * `batchId`: a foreachBatch retry of an already-committed epoch is
    * a no-op (the streaming sink's replay contract).
    */
  def processBatch(ops: Dataset[PersonOp], batchId: Long): Unit = synchronized {
    if (batchId <= epoch) return
    val trace = sys.env.contains("SPARK_GRAFT_TRACE")
    var t0 = System.nanoTime()
    def mark(what: String): Unit = if (trace) {
      val t1 = System.nanoTime()
      System.err.println(f"[merge-trace] batch=$batchId $what ${(t1 - t0) / 1e9}%.3fs")
      t0 = t1
    }
    // the ONE Catalyst plan of the epoch: scan/filter/deserialize the
    // batch into JVM objects; everything after runs at the RDD layer
    // (class doc explains why). Persisted because two jobs read it:
    // the id-pair collect and the fold.
    val opsRdd = ops.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // epoch shuffle width follows the batch's VOLUME, not its
      // inherited partition count: a micro-batch arrives at the
      // input's width but may hold only thousands of rows, and
      // per-epoch shuffles at input width are mostly empty-task
      // scheduling (measured ~60% of epoch wall time at sf0.1 with
      // 32-wide shuffles over ~40k-row batches). The count is one
      // cheap extra job — it materializes the persist the very next
      // job would pay for anyway. ceil(rows/target) keeps a genuinely
      // large batch wide; the input width caps it (never widen beyond
      // the source).
      val nOps = opsRdd.count()
      val batchParts = math.max(2, math.min(opsRdd.getNumPartitions,
        math.ceil(nOps.toDouble / OpsRowsPerPartition).toInt))
      // fold/join width: the max of the batch's width, the state's
      // current width, and the state-SIZE-derived width (committed row
      // count / target rows-per-partition, tracked each epoch below).
      // The size term is what lets the state grow WIDER than any single
      // micro-batch as rows accumulate — without it a stream of narrow
      // batches would pin a multi-million-row state at the batch width
      // forever (slow full-state scans, 2 GB block-limit risk). This
      // sizes the EPOCH's shuffles only; the commit below narrows back
      // to the size-derived width.
      val parts = math.max(batchParts, math.max(stateRdd.getNumPartitions, statePartsHint))
      val epochPersists = collection.mutable.ListBuffer.empty[RDD[_]]
      val broadcasts =
        collection.mutable.ListBuffer.empty[org.apache.spark.broadcast.Broadcast[_]]

      // RESOLVE: the redirect dimension — every registered
      // non-canonical distinct_id → its canonical id. The design-normal
      // regime holds it driver-resident (redirect-map-sized; the
      // reference keeps the same map in one Durable Object) and
      // resolves in-task through a broadcast; past the driver budget
      // the epoch DEGRADES to two batch-sized join shuffles against the
      // redirect dimension — the joins move the BATCH plus the matching
      // redirect slices, never the full record state. First epoch
      // (epoch -1 ⇒ state empty by construction): no redirects, skip
      // the state scan entirely.
      val redirectsRdd: RDD[(String, String)] = stateRdd.flatMap(r =>
        r.distinct_ids.filter(_ != r.canonical_id).map(d => (d, r.canonical_id)))
      val redirectChars = (p: (String, String)) => (p._1.length + p._2.length).toLong
      val resolved: RDD[(PersonOp, String, Option[String])] =
        if (epoch < 0L) opsRdd.map(o => (o, o.raw_id, o.alias_to))
        else if (dimFits(redirectsRdd, redirectChars)) {
          val rm = collectMeasured(redirectsRdd, redirectChars, "redirect").toMap
          val rmB = spark.sparkContext.broadcast(rm)
          broadcasts += rmB
          opsRdd.map { o =>
            val m = rmB.value
            (o, m.getOrElse(o.raw_id, o.raw_id), o.alias_to.map(a => m.getOrElse(a, a)))
          }
        } else {
          noteDegrade(batchId, "redirect")
          // persisted: the alias and plain branches below would otherwise
          // each re-run the raw-side join during materialization
          val byRaw = opsRdd.map(o => (o.raw_id, o))
            .leftOuterJoin(redirectsRdd, parts)
            .map { case (raw, (o, ro)) => (o, ro.getOrElse(raw)) }
            .persist(StorageLevel.MEMORY_AND_DISK)
          epochPersists += byRaw
          val aliased = byRaw.filter(_._1.alias_to.isDefined)
            .map { case (o, rRaw) => (o.alias_to.get, (o, rRaw)) }
            .leftOuterJoin(redirectsRdd, parts)
            .map { case (al, ((o, rRaw), ra)) => (o, rRaw, Option(ra.getOrElse(al))) }
          val plain = byRaw.filter(_._1.alias_to.isEmpty)
            .map { case (o, rRaw) => (o, rRaw, None: Option[String]) }
          aliased.union(plain)
        }
      // persisted: read by the pair probe/collect, the edges, and the fold
      val resolvedP = resolved.persist(StorageLevel.MEMORY_AND_DISK)
      epochPersists += resolvedP
      mark("resolve-built")

      // CONNECT: the batch's distinct resolved (raw, alias) pairs —
      // bounded by the batch's id dimension — give both the alias edges
      // (→ component map) and the touched-component set (every resolved
      // raw id's comp). The micro-batch trigger bounds this set in
      // normal operation, so the design-normal regime runs the driver
      // union-find + a narrow untouched filter (the full state never
      // shuffles). A batch whose id dimension exceeds the budget
      // degrades to the SHARED distributed CC fixpoint
      // ([[IdentityResolver.components]]) with join-based re-keying —
      // which inherently pays ONE full-state shuffle to split touched
      // from untouched records (the price of a state too big to
      // broadcast a touched-set against).
      val pairsRdd = resolvedP.map { case (_, rRaw, rAl) => (rRaw, rAl) }.distinct(batchParts)
      val pairChars = (p: (String, Option[String])) =>
        (p._1.length + p._2.map(_.length).getOrElse(0)).toLong
      val (opRows, untouched, seeds, dimsForDelta) =
        if (dimFits(pairsRdd, pairChars)) {
          val pairs = collectMeasured(pairsRdd, pairChars, "batch id-pair")
          val edges = pairs.iterator.collect {
            case (rRaw, Some(al)) if al != rRaw => (rRaw, al)
          }.toSeq.distinct
          val ccMap: Map[String, String] =
            IdentityResolver.localComponents(edges).toMap
          val touchedSet: Set[String] = pairs.iterator
            .map(p => ccMap.getOrElse(p._1, p._1)).toSet
          // one broadcast carries the per-epoch dimensions to the tasks
          val dims = spark.sparkContext.broadcast((ccMap, touchedSet))
          broadcasts += dims
          val opRows: RDD[(String, ResolvedOp)] = resolvedP.map { case (o, rRaw, rAl) =>
            val comp = dims.value._1.getOrElse(rRaw, rRaw)
            comp -> ResolvedOp(comp, o.raw_id, o.ord, o.set, o.set_once, o.unset,
              o.alias_to, rRaw, rAl)
          }
          val untouched = stateRdd.filter { r =>
            val (cm, ts) = dims.value
            !ts.contains(cm.getOrElse(r.canonical_id, r.canonical_id))
          }
          val seeds: RDD[(String, PersonRecord)] = stateRdd.flatMap { r =>
            val (cm, ts) = dims.value
            val comp = cm.getOrElse(r.canonical_id, r.canonical_id)
            if (ts.contains(comp)) Some(comp -> r) else None
          }
          (opRows, untouched, seeds, Some((ccMap, touchedSet)))
        } else {
          noteDegrade(batchId, "batch id-pair")
          import spark.implicits._
          val edges = resolvedP.flatMap { case (_, rRaw, rAl) =>
            rAl.filter(_ != rRaw).map(a => (rRaw, a))
          }.distinct(batchParts)
          // the SHARED fixpoint decides local-vs-distributed itself
          // under the same budget, so a small edge set stays cheap even
          // inside the fallback epoch
          val ccRdd = IdentityResolver.components(
              spark, edges.toDF("src", "dst"), localHeapBudget = driverHeapBudget)
            .rdd.map(r => (r.getString(0), r.getString(1)))
            .persist(StorageLevel.MEMORY_AND_DISK)
          epochPersists += ccRdd
          val opRows: RDD[(String, ResolvedOp)] = resolvedP
            .map { case (o, rRaw, rAl) => (rRaw, (o, rAl)) }
            .leftOuterJoin(ccRdd, parts)
            .map { case (rRaw, ((o, rAl), c0)) =>
              val comp = c0.getOrElse(rRaw)
              comp -> ResolvedOp(comp, o.raw_id, o.ord, o.set, o.set_once, o.unset,
                o.alias_to, rRaw, rAl)
            }
          // touched components == the distinct comp keys of the batch's
          // ops (every op contributes its resolved raw id's comp — the
          // same set the driver branch builds)
          val touchedComps = opRows.map(p => (p._1, ())).distinct(batchParts)
          val marked = stateRdd.map(r => (r.canonical_id, r))
            .leftOuterJoin(ccRdd, parts)
            .map { case (cid, (r, c0)) => (c0.getOrElse(cid), r) }
            .leftOuterJoin(touchedComps, parts)
            .persist(StorageLevel.MEMORY_AND_DISK)
          epochPersists += marked
          val untouched = marked.filter(_._2._2.isEmpty).map(_._2._1)
          val seeds: RDD[(String, PersonRecord)] = marked
            .filter(_._2._2.isDefined)
            .map { case (comp, (r, _)) => (comp, r) }
          // no driver-resident dims this epoch → saveDelta falls back
          // to a full base (the touched filter needs them)
          (opRows, untouched, seeds, None)
        }
      mark("components")

      // RE-KEY + MERGE: only the touched records and the batch's ops
      // shuffle into the cogroup.
      val folded: RDD[PersonRecord] = seeds.cogroup(opRows, parts)
        .map { case (_, (recs, opIt)) =>
          Replay.foldComponent(recs.iterator, opIt.iterator)
        }
      mark("plan-built")

      // COMMIT: re-root the state RDD (cuts lineage, explicit block
      // control). Coalesce first: the union's partition count is
      // untouched's (the prior state's) PLUS the fold shuffle's, so
      // without it the state gains partitions every epoch and every
      // later state scan pays the extra empty-task overhead. The commit
      // width is SIZE-derived, not `parts`: committing at `parts`
      // would pin the state at any one-off wide batch's width
      // permanently (hint is monotone and the next epoch takes
      // max(batchParts, committed width, hint), so the wide width would
      // never relax). The size bound uses what is known BEFORE the
      // count: new rows ≤ prior committed rows + this batch's ops, so a
      // first-epoch backfill of millions of persons still commits wide
      // enough that no partition exceeds the row target (coalescing a
      // huge fold into the stale 2-wide hint is the 2 GB-block/OOM
      // failure StateRowsPerPartition exists to prevent); a small batch
      // still narrows straight back to the hint.
      val commitParts = math.min(parts, math.max(statePartsHint,
        math.ceil((lastStateRows + nOps).toDouble / StateRowsPerPartition).toInt))
      val next = untouched.union(folded).coalesce(commitParts)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val stateRows = next.count()
      lastStateRows = stateRows
      // the commit count is free sizing information: derive next
      // epoch's width hint so rows-per-partition stays bounded. Ratchet
      // on the SIZE-derived term only — folding `parts` in here would
      // let one anomalously wide micro-batch pin the committed-state
      // width forever (the empty-task overhead this hint exists to
      // avoid); a wide batch still widens ITS epoch via the max at the
      // fold, then the width relaxes back to what the state size needs.
      statePartsHint = math.max(statePartsHint,
        math.ceil(stateRows.toDouble / StateRowsPerPartition).toInt)
      mark("commit-count")
      // unpersist, not destroy: a lost `next` block recomputes through
      // this epoch's lineage, which still closes over the broadcasts
      broadcasts.foreach(_.unpersist(blocking = false))
      epochPersists.foreach(_.unpersist(blocking = false))
      stateRdd.unpersist()
      stateRdd = next
      epoch = batchId
      lastDims = dimsForDelta
    } finally opsRdd.unpersist()
  }

  /** Final person dimension with dense first-touch sequence ids —
    * identical assignment to batch [[Replay.persons]].
    *
    * Scale note: the dense ids come from a global `sortBy` +
    * `zipWithIndex` over the PERSON DIMENSION — fine while persons ≪
    * events (always, here: the dimension is the distinct-id set, not
    * the event stream), but a total sort all the same. At an extreme
    * dimension size (billions of persons) assign ids per-partition
    * instead: `sortBy` then `zipWithIndex`'s two-job form is already
    * partition-offset based, so the swap is to a monotonically-
    * increasing-id + offset-fix layout that avoids holding the sort's
    * single range-partitioned pass — the ordering contract (first_ord,
    * canonical_id) is what must be preserved, not this implementation.
    */
  def persons(): Dataset[PersonRecord] = {
    val withIds = stateRdd
      .sortBy(r => (r.first_ord, r.canonical_id))
      .zipWithIndex()
      .map { case (r, i) => r.copy(person_seq_id = i + 1) }
    spark.createDataset(withIds)
  }

  /** Release the state's cached blocks (end-of-stream cleanup). */
  def close(): Unit = synchronized { stateRdd.unpersist() }

  /** Snapshot the committed state to `dir/epoch=N` (parquet, committed
    * by the `_SUCCESS` marker). Pairs with [[IdentityMergeState.restore]]
    * to make a streaming checkpoint survivable: call after each batch
    * (or every k batches) from the foreachBatch sink. A full snapshot
    * per epoch is the simple form; at lake scale the same layout holds
    * per-epoch DELTAS (only touched records change per batch —
    * compaction then mirrors [[graft.sources.Lake]]).
    */
  def save(dir: String): Unit = synchronized {
    if (epoch >= 0) {
      records.write.mode("overwrite").parquet(s"$dir/epoch=$epoch")
      lastSaved = Some((dir, epoch))
    }
  }

  /** Per-epoch DELTA snapshot — the lake-scale form of [[save]]: write
    * only the records the last committed epoch TOUCHED (its folded
    * components) to `dir/delta=N`, so the per-epoch write is bounded by
    * the micro-batch's component set instead of the accumulated state.
    * The first call into an empty `dir` (or a handle with no per-epoch
    * dimension, e.g. straight after a restore) writes a full [[save]]
    * base instead.
    *
    * Merged-AWAY records need no tombstones: the fold carries every
    * absorbed id in the survivor's `distinct_ids`, so
    * [[IdentityMergeState.restoreDeltas]] derives deletions — a record
    * is dead iff a STRICTLY-LATER record of a different canonical id
    * lists its canonical id among its `distinct_ids`. (A dead record's
    * id can never become canonical again: ops on it resolve through the
    * survivor's redirect from then on.) Periodic compaction = [[save]]
    * (a fresh full base; later [[IdentityMergeState.restoreDeltas]]
    * reads only deltas newer than the newest base), mirroring
    * [[graft.sources.Lake.compact]].
    */
  def saveDelta(dir: String): Unit = synchronized {
    if (epoch < 0) return
    // CONTIGUITY GUARD: `lastDims` describes ONLY the last committed
    // epoch's touched set, so a delta write is valid solely when (a)
    // THIS handle's last write (or validated restore point) is this
    // dir at epoch−1 (== epoch for an idempotent re-save) — epoch
    // numbers in a foreign run's dir can collide, and chaining a delta
    // onto another run's base would merge unrelated states — and (b)
    // the dir scan agrees (a base exists, newest committed snapshot is
    // epoch−1/epoch). Any gap — saveDelta skipped for an epoch, an
    // unvalidated dir, a lost write — falls back to a full [[save]]
    // base instead (which is also how periodic compaction happens).
    val bases = IdentityMergeState.committedSnapshots(dir, "epoch=")
    val newest = (bases ++ IdentityMergeState.committedSnapshots(dir, "delta="))
      .foldLeft(-1L)(math.max)
    val ownLineage = lastSaved.exists { case (d, e) =>
      d == dir && (e == epoch - 1 || e == epoch)
    }
    lastDims match {
      case Some((cm, ts)) if ownLineage && bases.nonEmpty &&
          (newest == epoch - 1 || newest == epoch) =>
        records
          .filter(r => ts.contains(cm.getOrElse(r.canonical_id, r.canonical_id)))
          .write.mode("overwrite").parquet(s"$dir/delta=$epoch")
        lastSaved = Some((dir, epoch))
      case _ => save(dir)
    }
  }
}

object IdentityMergeState {

  /** The one parser of the snapshot layout (`epoch=N` / `delta=N` dirs
    * committed by a `_SUCCESS` marker) — shared by the writer's
    * contiguity guard and both recovery paths so the layout convention
    * cannot desynchronize between them. Non-numeric suffixes (stray
    * entries) are ignored rather than thrown on.
    */
  private[streaming] def committedSnapshots(dir: String, prefix: String): Seq[Long] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => f.getName.startsWith(prefix) &&
        new java.io.File(f, "_SUCCESS").exists())
      .flatMap(f => f.getName.stripPrefix(prefix).toLongOption)

  /** Rebuild a state handle from the newest committed snapshot under
    * `dir` (empty/missing dir → a fresh handle at epoch -1). This is
    * the recovery path [[IdentityMerge.run]]'s resume guard points at:
    * restore to the checkpoint's epoch, then resume the stream.
    *
    * Delegates to [[restoreDeltas]]: a base-only dir reduces to reading
    * the newest base (the window/anti-join are no-ops over one epoch),
    * and a delta-maintained dir MUST replay the deltas — restoring the
    * bare base would rebuild a stale state whose epoch still satisfies
    * the resume guard, so the checkpoint would skip the delta epochs'
    * already-committed batches and silently drop those persons.
    */
  def restore(spark: SparkSession, dir: String): IdentityMergeState =
    restoreDeltas(spark, dir)

  /** Rebuild a state handle from a BASE snapshot plus the per-epoch
    * deltas [[IdentityMergeState.saveDelta]] wrote after it. Resolution
    * is two set-level rules, both deterministic:
    *
    *   1. latest-writer-wins per canonical id (a touched record's newest
    *      delta version supersedes older ones and the base);
    *   2. merged-away deletion: drop a record iff a strictly-later
    *      record of a DIFFERENT canonical id carries this record's
    *      canonical id in `distinct_ids` (see [[IdentityMergeState.saveDelta]]'s
    *      no-tombstone contract).
    *
    * Runs as a dimension-sized shuffle (persons, not events) once per
    * recovery. Seeds the commit-width hints like [[restore]].
    */
  def restoreDeltas(spark: SparkSession, dir: String): IdentityMergeState = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val st = new IdentityMergeState(spark)
    val bases = committedSnapshots(dir, "epoch=")
    if (bases.isEmpty) return st // nothing committed → fresh handle
    val base = bases.max
    val deltas = committedSnapshots(dir, "delta=").filter(_ > base).sorted
    val all = (Seq(base -> s"$dir/epoch=$base") ++ deltas.map(n => n -> s"$dir/delta=$n"))
      .map { case (n, p) => spark.read.parquet(p).withColumn("__e", lit(n)) }
      .reduce(_ unionByName _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("canonical_id").orderBy(col("__e").desc)
    val latest = all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val absorbed = latest.select(
      explode(col("distinct_ids")).as("__id"),
      col("canonical_id").as("__other"), col("__e").as("__oe"))
      .filter(col("__id") =!= col("__other"))
    val alive = latest.join(absorbed,
      latest("canonical_id") === absorbed("__id") && absorbed("__oe") > latest("__e"),
      "left_anti")
    st.stateRdd = alive.drop("__e").as[PersonRecord]
      .rdd.persist(StorageLevel.MEMORY_AND_DISK)
    st.lastStateRows = st.stateRdd.count()
    st.statePartsHint = math.max(2,
      math.ceil(st.lastStateRows.toDouble / st.StateRowsPerPartition).toInt)
    st.epoch = (base +: deltas).max
    st.lastSaved = Some((dir, st.epoch)) // validated lineage: deltas may chain
    st
  }
}

object IdentityMerge {

  /** Wire a PersonOp stream into a state handle via foreachBatch.
    *
    * Refuses a RESUMED checkpoint paired with a FRESH state handle:
    * the checkpoint would skip past already-committed offsets while the
    * in-memory state restarts empty, silently dropping every person
    * folded before the restart — strictly worse than reprocessing from
    * scratch. Recovery needs a state handle rebuilt to the checkpoint's
    * epoch first (production: reload the lake's epoch-keyed delta, as
    * the class doc describes; tests/dev: a fresh checkpoint dir).
    */
  def run(ops: Dataset[PersonOp], st: IdentityMergeState, checkpoint: String): StreamingQuery = {
    val resumed = {
      val offsets = new java.io.File(checkpoint, "offsets")
      offsets.isDirectory && offsets.list() != null && offsets.list().nonEmpty
    }
    require(!(resumed && st.committedEpoch < 0L),
      s"checkpoint '$checkpoint' has committed offsets but the state handle is fresh " +
        "(epoch -1): resuming would skip every batch folded before the restart. " +
        "Restore the state to the checkpoint's epoch, or start from a clean checkpoint.")
    ops.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch((batch: Dataset[PersonOp], id: Long) => st.processBatch(batch, id))
      .start()
  }

  /** Incremental drive of a batch op table in `ord`-ascending chunks —
    * the deterministic harness form of the stream (used by
    * `q_pipe_stream_merge` and specs): same code path as the streaming
    * sink, micro-batch boundaries at the given chunk count.
    */
  def replayChunked(spark: SparkSession, ops: Dataset[PersonOp], chunks: Int): IdentityMergeState = {
    val st = new IdentityMergeState(spark)
    // localCheckpoint (eager), not persist: a persist caches the DATA but
    // every per-batch action still re-analyzes/re-optimizes the full
    // upstream LOGICAL plan (ingest parse → op extraction) — measured ~1s
    // of driver-side Catalyst time per micro-batch at sf0.1. Truncating
    // the plan here makes each batch's trees start from the materialized
    // ops, exactly like a real streaming micro-batch would.
    // LOCAL checkpoint = blocks are unrecoverable on executor loss; fine
    // for this deterministic harness driver (the whole replay re-runs),
    // a real cluster deployment checkpoints the op table reliably (lake
    // write) instead. The blocks are released below once the last batch
    // commits — localCheckpoint pins them for the app lifetime otherwise.
    val trace = sys.env.contains("SPARK_GRAFT_TRACE")
    var tr0 = System.nanoTime()
    def mark(what: String): Unit = if (trace) {
      val t1 = System.nanoTime()
      System.err.println(f"[merge-trace] replay $what ${(t1 - tr0) / 1e9}%.3fs")
      tr0 = t1
    }
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val opsDf = ops.localCheckpoint(true)
    val ckptRdds = spark.sparkContext.getPersistentRDDs
      .collect { case (id, rdd) if !persistedBefore.contains(id) => rdd }
    mark("checkpoint")
    // arithmetic ord cuts from one cheap min/max agg (parity holds for
    // ANY ord-respecting split, so there is no reason to pay a
    // quantile pass for balanced batch sizes)
    val mm = graft.HeapWatermark.recordRows("identity_merge.ord_minmax",
      opsDf.agg(min(col("ord")), max(col("ord"))).collect()).head
    mark("minmax")
    val cuts: Seq[(Double, Double)] =
      if (mm.isNullAt(0) || chunks <= 1) Seq((Double.NegativeInfinity, Double.PositiveInfinity))
      else {
        val (lo, hi) = (mm.getLong(0).toDouble, mm.getLong(1).toDouble)
        val bounds = (1 until chunks).map(i => lo + (hi - lo) * i / chunks)
        (Seq(Double.NegativeInfinity) ++ bounds :+ Double.PositiveInfinity)
          .distinct.sliding(2).map(p => (p.head, p.last)).toSeq
      }
    cuts.zipWithIndex.foreach { case ((lo, hi), i) =>
      // metered as "data": the incremental fold itself, vs the harness
      // checkpoint/minmax floor above (Bench stream decomposition)
      graft.PhaseMeter.time("data")(
        st.processBatch(opsDf.filter(col("ord") > lo && col("ord") <= hi), i.toLong))
    }
    ckptRdds.foreach(_.unpersist(blocking = false))
    st
  }
}
