package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** The lake-table surface the engine depends on, as a seam
  * (VERDICT r13 item 3): everything above this trait (pipelines,
  * streaming sinks, serving reads) speaks versioned-table semantics —
  * atomic commits, time travel, copy-on-write DML, incremental reads,
  * retention — and nothing else. [[SnapshotsFormat]] is the offline
  * implementation (this container has no Iceberg jars);
  * [[IcebergFormat]] maps the same contract onto a real Iceberg
  * catalog using only SQL + `format("iceberg")` strings, so it
  * compiles with no Iceberg classes on the classpath and activates
  * the day the jars exist (the reference's actual lake is Iceberg,
  * `/root/reference/README.md:237-258`). TableFormatSpec runs the
  * contract against Snapshots always, and against Iceberg
  * when-available (cancelled offline).
  *
  * `table` is the implementation's table handle: a filesystem dir for
  * Snapshots, a catalog-qualified name (`cat.db.tbl`) for Iceberg.
  * `version` is the implementation's snapshot identity: sequential
  * manifest versions for Snapshots, snapshot ids for Iceberg — opaque
  * to callers, obtained from [[currentVersion]]/[[versions]] and only
  * passed back.
  */
trait TableFormat {

  /** Append `df` as one atomic commit. */
  def append(spark: SparkSession, table: String, df: DataFrame): Unit

  /** Replace the table's entire contents as one atomic commit. */
  def replace(spark: SparkSession, table: String, df: DataFrame): Unit

  /** Current table contents. */
  def read(spark: SparkSession, table: String): DataFrame

  /** Newest committed version, None if never committed. */
  def currentVersion(spark: SparkSession, table: String): Option[Long]

  /** All committed versions, oldest first. */
  def versions(spark: SparkSession, table: String): Seq[Long]

  /** Time travel to an exact committed version. */
  def readAt(spark: SparkSession, table: String, version: Long): DataFrame

  /** Time travel to the newest snapshot at or before `tsMs`. */
  def readAsOf(spark: SparkSession, table: String, tsMs: Long): DataFrame

  /** SQL DELETE semantics: remove rows where `pred` IS TRUE (NULL
    * survives), as one atomic commit.
    */
  def deleteWhere(spark: SparkSession, table: String, pred: Column): Unit

  /** Keyed upsert (MERGE INTO … UPDATE SET * / INSERT *): source rows
    * replace same-keyed rows, unmatched source rows insert.
    */
  def mergeInto(spark: SparkSession, table: String, source: DataFrame,
      keyCols: Seq[String]): Unit

  /** Move the table pointer back to `toVersion` as a NEW commit
    * (history is never rewritten).
    */
  def rollback(spark: SparkSession, table: String, toVersion: Long): Unit

  /** Rewrite the current file list into ~`files` files (a new commit;
    * row contents unchanged).
    */
  def compact(spark: SparkSession, table: String, files: Int): Unit

  /** Drop history older than the newest `keepLast` snapshots and
    * reclaim data files only they referenced.
    */
  def expire(spark: SparkSession, table: String, keepLast: Int): Unit

  // ----- incremental / CDC (VERDICT r14 #6: the full snapshot surface
  // ----- is part of the CONTRACT, not a Snapshots-only extension)

  /** Incremental APPEND scan: the rows added by the snapshots in
    * (`fromVersion`, `toVersion`]. Throws if the range contains a
    * non-append snapshot — row-level deltas of rewrites are
    * [[changesBetween]]'s job (the Iceberg incremental-scan split).
    */
  def readIncremental(spark: SparkSession, table: String,
      fromVersion: Long, toVersion: Long): DataFrame

  /** Row-level CDC between two committed versions: each changed row
    * with `_change_type` `insert`/`delete` (an update appears as its
    * delete+insert pair); rows carried unchanged (compaction) emit
    * nothing.
    */
  def changesBetween(spark: SparkSession, table: String,
      fromVersion: Long, toVersion: Long): DataFrame

  // ----- write-audit-publish staging

  /** Stage `df` durably WITHOUT making it visible to [[read]]; returns
    * the stage id the audit step passes to [[readStaged]] and then
    * [[publishStaged]]/[[discardStaged]]. Implementations may require
    * the table to already exist (Iceberg WAP does).
    */
  def stageWrite(spark: SparkSession, table: String, df: DataFrame): String

  /** The staged rows (exactly as [[publishStaged]] would commit them). */
  def readStaged(spark: SparkSession, table: String, stageId: String): DataFrame

  /** Atomically commit a staged write (zero data movement). */
  def publishStaged(spark: SparkSession, table: String, stageId: String): Unit

  /** Drop a staged write that failed its audit; never becomes visible. */
  def discardStaged(spark: SparkSession, table: String, stageId: String): Unit

  // ----- exactly-once streaming epochs

  /** Idempotent epoch APPEND: commit `df` tagged with `batchId`; a
    * failure-replayed epoch (same `batchId`, checkpoint-monotonic per
    * sink) finds its tag already committed and SKIPS. Replay detection
    * must survive [[expire]] (an expiry-proof high-water, not a scan of
    * retained history).
    */
  def commitEpoch(spark: SparkSession, table: String, df: DataFrame,
      batchId: Long): Unit

  /** Idempotent epoch keyed UPSERT — the [[mergeInto]] twin of
    * [[commitEpoch]]: how a streaming pipeline maintains a keyed
    * serving table. Duplicate keys within one batch must be resolved
    * upstream (the micro-batch is the unit of last-write-wins).
    */
  def mergeEpoch(spark: SparkSession, table: String, df: DataFrame,
      keyCols: Seq[String], batchId: Long): Unit
}

/** The offline implementation — delegates to [[Snapshots]]' manifest
  * format (spec-gated ×20+ in SnapshotsSpec, which continues to test
  * the object directly; this adapter is the swap point, one file).
  */
object SnapshotsFormat extends TableFormat {
  def append(spark: SparkSession, table: String, df: DataFrame): Unit =
    { Snapshots.commit(spark, table, df); () }
  def replace(spark: SparkSession, table: String, df: DataFrame): Unit =
    { Snapshots.commit(spark, table, df, operation = "replace", replace = true); () }
  def read(spark: SparkSession, table: String): DataFrame =
    Snapshots.read(spark, table)
  def currentVersion(spark: SparkSession, table: String): Option[Long] =
    Snapshots.currentVersion(spark, table)
  def versions(spark: SparkSession, table: String): Seq[Long] =
    Snapshots.snapshots(spark, table).map(_.version)
  def readAt(spark: SparkSession, table: String, version: Long): DataFrame =
    Snapshots.readAt(spark, table, version)
  def readAsOf(spark: SparkSession, table: String, tsMs: Long): DataFrame =
    Snapshots.readAsOf(spark, table, tsMs)
  def deleteWhere(spark: SparkSession, table: String, pred: Column): Unit =
    { Snapshots.deleteWhere(spark, table, pred); () }
  def mergeInto(spark: SparkSession, table: String, source: DataFrame,
      keyCols: Seq[String]): Unit =
    { Snapshots.mergeInto(spark, table, source, keyCols); () }
  def rollback(spark: SparkSession, table: String, toVersion: Long): Unit =
    { Snapshots.rollback(spark, table, toVersion); () }
  def compact(spark: SparkSession, table: String, files: Int): Unit =
    { Snapshots.compactSnapshot(spark, table, files); () }
  def expire(spark: SparkSession, table: String, keepLast: Int): Unit =
    { Snapshots.expire(spark, table, keepLast); () }
  def readIncremental(spark: SparkSession, table: String,
      fromVersion: Long, toVersion: Long): DataFrame =
    Snapshots.readIncremental(spark, table, fromVersion, toVersion)
  def changesBetween(spark: SparkSession, table: String,
      fromVersion: Long, toVersion: Long): DataFrame =
    Snapshots.changesBetween(spark, table, fromVersion, toVersion)
  def stageWrite(spark: SparkSession, table: String, df: DataFrame): String =
    Snapshots.stageWrite(spark, table, df)
  def readStaged(spark: SparkSession, table: String, stageId: String): DataFrame =
    Snapshots.readStaged(spark, table, stageId)
  def publishStaged(spark: SparkSession, table: String, stageId: String): Unit =
    { Snapshots.publishStaged(spark, table, stageId); () }
  def discardStaged(spark: SparkSession, table: String, stageId: String): Unit =
    Snapshots.discardStaged(spark, table, stageId)
  def commitEpoch(spark: SparkSession, table: String, df: DataFrame,
      batchId: Long): Unit =
    Snapshots.commitEpoch(df, table, batchId)
  def mergeEpoch(spark: SparkSession, table: String, df: DataFrame,
      keyCols: Seq[String], batchId: Long): Unit =
    Snapshots.mergeEpoch(df, table, keyCols, batchId)
}

/** The production mapping onto a REAL Iceberg catalog — written
  * entirely against public Spark SQL + DataFrame APIs (`MERGE INTO`,
  * `VERSION AS OF`, the `system.*` procedures), so this file compiles
  * with zero Iceberg classes on the classpath; it runs the moment the
  * runtime jars + a catalog conf exist. `table` must be a
  * catalog-qualified name whose catalog is configured as an Iceberg
  * `SparkCatalog`. Versions are Iceberg snapshot ids (opaque longs —
  * exactly what the trait contract allows).
  *
  * Availability probe: [[IcebergFormat.available]] — the integration
  * spec cancels when false (this container), and a deployment's smoke
  * test runs the same contract suite the offline format passes.
  */
object IcebergFormat extends TableFormat {

  /** True iff an Iceberg Spark runtime is on the classpath. */
  def available: Boolean =
    try { Class.forName("org.apache.iceberg.spark.SparkCatalog"); true }
    catch { case _: Throwable => false }

  private def catalogOf(table: String): String = table.split('.').head

  def append(spark: SparkSession, table: String, df: DataFrame): Unit =
    df.writeTo(table).append()
  def replace(spark: SparkSession, table: String, df: DataFrame): Unit =
    df.writeTo(table).createOrReplace()
  def read(spark: SparkSession, table: String): DataFrame =
    spark.read.table(table)
  def currentVersion(spark: SparkSession, table: String): Option[Long] =
    versions(spark, table).lastOption
  def versions(spark: SparkSession, table: String): Seq[Long] =
    graft.HeapWatermark.recordRows("iceberg.versions",
      spark.read.table(s"$table.snapshots")
        .orderBy("committed_at")
        .select("snapshot_id").collect()).map(_.getLong(0)).toSeq
  def readAt(spark: SparkSession, table: String, version: Long): DataFrame =
    spark.read.option("snapshot-id", version).table(table)
  def readAsOf(spark: SparkSession, table: String, tsMs: Long): DataFrame =
    spark.read.option("as-of-timestamp", tsMs).table(table)
  def deleteWhere(spark: SparkSession, table: String, pred: Column): Unit =
    // V2 overwrite-by-filter with an empty frame = DELETE WHERE pred:
    // rows MATCHING pred (IS TRUE) are replaced by nothing; NULL rows
    // don't match and survive — the same NULL contract SnapshotsSpec
    // pins on the offline format. No Column→SQL rendering needed.
    spark.read.table(table).limit(0).writeTo(table).overwrite(pred)
  def mergeInto(spark: SparkSession, table: String, source: DataFrame,
      keyCols: Seq[String]): Unit = {
    val v = s"graft_src_${java.lang.Long.toHexString(System.nanoTime())}"
    source.createOrReplaceTempView(v)
    val on = keyCols.map(k => s"t.$k <=> s.$k").mkString(" AND ")
    try {
      spark.sql(
        s"""MERGE INTO $table t USING $v s ON $on
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin); ()
    } finally spark.catalog.dropTempView(v)
  }
  def rollback(spark: SparkSession, table: String, toVersion: Long): Unit =
    { spark.sql(s"CALL ${catalogOf(table)}.system.rollback_to_snapshot" +
        s"('$table', $toVersion)"); () }
  def compact(spark: SparkSession, table: String, files: Int): Unit =
    { spark.sql(s"CALL ${catalogOf(table)}.system.rewrite_data_files" +
        s"(table => '$table')"); () }
  def expire(spark: SparkSession, table: String, keepLast: Int): Unit =
    { spark.sql(s"CALL ${catalogOf(table)}.system.expire_snapshots" +
        s"(table => '$table', retain_last => $keepLast)"); () }

  def readIncremental(spark: SparkSession, table: String,
      fromVersion: Long, toVersion: Long): DataFrame =
    // Iceberg's incremental append scan: start exclusive, end inclusive
    // — same (from, to] contract as Snapshots; throws on a non-append
    // snapshot in range, same split
    spark.read.format("iceberg")
      .option("start-snapshot-id", fromVersion.toString)
      .option("end-snapshot-id", toVersion.toString)
      .load(table)

  def changesBetween(spark: SparkSession, table: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, when}
    val view = s"graft_chg_${java.lang.Long.toHexString(System.nanoTime())}"
    spark.sql(
      s"""CALL ${catalogOf(table)}.system.create_changelog_view(
         |  table => '$table',
         |  options => map('start-snapshot-id', '$fromVersion',
         |                 'end-snapshot-id', '$toVersion'),
         |  changelog_view => '$view')""".stripMargin)
    // normalize to the contract's lowercase insert/delete (Iceberg may
    // emit UPDATE_BEFORE/UPDATE_AFTER when identifier columns are set —
    // an update IS its delete+insert pair, same as Snapshots)
    spark.table(view)
      .withColumn("_change_type",
        when(col("_change_type").isin("INSERT", "UPDATE_AFTER"), lit("insert"))
          .otherwise(lit("delete")))
      .drop("_change_ordinal", "_commit_snapshot_id")
  }

  /** WAP id → its staged (unreferenced) snapshot id, from the snapshots
    * metadata table's summary map.
    */
  private def stagedSnapshotId(spark: SparkSession, table: String,
      stageId: String): Long = {
    import org.apache.spark.sql.functions.{col, element_at}
    val rows = graft.HeapWatermark.recordRows("iceberg.staged_snapshot",
      spark.read.table(s"$table.snapshots")
        .filter(element_at(col("summary"), "wap.id") === stageId)
        .select("snapshot_id").collect())
    require(rows.nonEmpty, s"no staged snapshot with wap.id=$stageId in $table")
    rows.head.getLong(0)
  }

  def stageWrite(spark: SparkSession, table: String, df: DataFrame): String =
    // Iceberg keys WAP staging off the SESSION-global spark.wap.id, so
    // two concurrent stageWrite calls on one SparkSession would tag one
    // append with the other's id (the r15 advisor's race) — serialize
    // the set→append→unset critical section per JVM. Cross-session
    // staging is unaffected (each session has its own conf); callers
    // needing concurrent staging should use cloned sessions
    // (spark.newSession()), which this lock intentionally doesn't block.
    synchronized {
      // Iceberg WAP: the table must exist and carry write.wap.enabled;
      // the append under spark.wap.id lands as an UNREFERENCED snapshot
      // (invisible to reads) until cherry-picked
      val id = s"wap_${java.lang.Long.toHexString(System.nanoTime())}"
      spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES ('write.wap.enabled'='true')")
      spark.conf.set("spark.wap.id", id)
      try df.writeTo(table).append()
      finally spark.conf.unset("spark.wap.id")
      id
    }

  def readStaged(spark: SparkSession, table: String, stageId: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    // the staged snapshot's view of the table MINUS the published
    // current = exactly the staged rows; Iceberg's WAP snapshot is
    // current-plus-staged, so except against current
    val staged = spark.read
      .option("snapshot-id", stagedSnapshotId(spark, table, stageId).toString)
      .table(table)
    staged.exceptAll(spark.read.table(table)).select(staged.columns.map(col): _*)
  }

  def publishStaged(spark: SparkSession, table: String, stageId: String): Unit =
    { spark.sql(s"CALL ${catalogOf(table)}.system.cherrypick_snapshot" +
        s"('$table', ${stagedSnapshotId(spark, table, stageId)})"); () }

  def discardStaged(spark: SparkSession, table: String, stageId: String): Unit =
    { spark.sql(s"CALL ${catalogOf(table)}.system.expire_snapshots" +
        s"(table => '$table', " +
        s"snapshot_ids => ARRAY(${stagedSnapshotId(spark, table, stageId)}))"); () }

  private val HighWaterProp = "graft.epoch.high-water"

  /** Expiry-proof epoch replay detection: committed ⇔
    * `batchId <= max(property high-water, max retained summary tag)`.
    *
    * BOTH tiers are consulted because [[commitEpoch]] tags the DATA
    * commit with the summary property and bumps the table-property
    * high-water in a SEPARATE metadata commit — a crash between the two
    * leaves hw = N−1 while epoch N's data is already in the table, and
    * a checkpoint replay of batch N deciding from the property alone
    * would append the epoch AGAIN (the r15 advisor's duplicate-row
    * hole). The property is the expiry-proof floor (survives
    * expire_snapshots); the summary tag covers the crash window while
    * its snapshot is retained — and a tagged snapshot only lacks its
    * property bump for the instant between the two commits, so expiry
    * racing exactly that window would require expiring the newest
    * snapshot, which retain-last semantics never do. Checkpointed
    * batchIds are strictly monotonic per sink, same contract as the
    * offline format (which sets the property atomically with the data
    * commit and needs no second tier).
    */
  private def epochCommitted(spark: SparkSession, table: String,
      batchId: Long): Boolean = {
    import org.apache.spark.sql.functions.{col, element_at, max}
    if (!spark.catalog.tableExists(table)) return false
    val hw = graft.HeapWatermark.recordRows("iceberg.epoch_high_water",
      spark.sql(s"SHOW TBLPROPERTIES $table")
        .filter(col("key") === HighWaterProp)
        .select("value").collect()).headOption
      .flatMap(r => r.getString(0).toLongOption)
    if (hw.exists(batchId <= _)) true
    else {
      val tagged = graft.HeapWatermark.recordRows("iceberg.epoch_summary_tag",
        spark.read.table(s"$table.snapshots")
          .select(element_at(col("summary"), "graft.epoch").cast("long").as("e"))
          .agg(max(col("e"))).collect()).head
      !tagged.isNullAt(0) && batchId <= tagged.getLong(0)
    }
  }

  private def setHighWater(spark: SparkSession, table: String, batchId: Long): Unit =
    { spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES " +
        s"('$HighWaterProp'='$batchId')"); () }

  def commitEpoch(spark: SparkSession, table: String, df: DataFrame,
      batchId: Long): Unit =
    if (!epochCommitted(spark, table, batchId)) {
      // the snapshot-property tag rides the SAME commit as the data, so
      // a crash before the (separate) property bump still leaves the
      // replay detectable via the summary fallback — no duplicate append
      if (spark.catalog.tableExists(table))
        df.writeTo(table)
          .option("snapshot-property.graft.epoch", batchId.toString).append()
      else
        df.writeTo(table)
          .option("snapshot-property.graft.epoch", batchId.toString).create()
      setHighWater(spark, table, batchId)
    }

  def mergeEpoch(spark: SparkSession, table: String, df: DataFrame,
      keyCols: Seq[String], batchId: Long): Unit =
    if (!epochCommitted(spark, table, batchId)) {
      // MERGE INTO cannot carry a snapshot property; the high-water bump
      // is a separate metadata commit. The gap is safe: a checkpoint
      // replay re-runs the SAME batch, and a keyed upsert of identical
      // rows is idempotent — state converges, then the bump lands.
      if (spark.catalog.tableExists(table))
        mergeInto(spark, table, df, keyCols)
      else df.writeTo(table).create()
      setHighWater(spark, table, batchId)
    }
}
