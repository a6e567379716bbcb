package graft.llm

import graft.Tables
import graft.queries.Q
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode step is a clearly-marked deterministic STUB ([[StubCodec]]).
  * What is real — and what this module demonstrates/tests — is the
  * Spark-side plumbing a 100 TB media pipeline needs:
  *
  *   - a stable binary+metadata schema (media payload never inflated to
  *     strings, metadata strongly typed),
  *   - typed `Dataset[MediaRow]` with case-class encoders,
  *   - `mapPartitions` batch processing (the Scala analogue of
  *     `mapInPandas`: one codec init per partition, streamed iterator,
  *     no per-row setup cost, no driver collect),
  *   - frame sampling producing an exploded (media, frame_idx) table.
  *
  * At scale: binaries live in the lake; partitions are sized by
  * `spark.sql.files.maxPartitionBytes` so a partition of payloads fits
  * executor memory; decode parallelism = partition count, no shuffle.
  */
object Multimodal {

  /** Input row: opaque payload + envelope metadata. */
  final case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte])

  /** Decoded metadata row (stub-decoded). */
  final case class MediaMeta(
      doc_id: Long, kind: String, n_bytes: Long,
      width: Long, height: Long, n_frames: Long, checksum: Long)

  /** STUB media codec — replace with a real decoder (e.g. javacpp
    * ffmpeg / ImageIO) in production. Deterministic so tests and the
    * DuckDB oracle can verify the surrounding plumbing end-to-end:
    * "width/height" are derived from the first payload bytes, the
    * "frame count" from the payload length, the checksum is a byte sum.
    */
  object StubCodec {
    def decode(r: MediaRow): MediaMeta = {
      val b = r.payload
      val b0 = if (b.length > 0) b(0) & 0xffL else 0L
      val b1 = if (b.length > 1) b(1) & 0xffL else 0L
      var sum = 0L
      var i = 0
      while (i < b.length) { sum += (b(i) & 0xffL); i += 1 }
      MediaMeta(
        doc_id = r.doc_id, kind = r.kind, n_bytes = b.length.toLong,
        width = (b0 * 256 + b1) % 1920, height = (b1 * 256 + b0) % 1080,
        n_frames = math.min(b.length.toLong / 32 + 1, 16L),
        checksum = sum)
    }
  }

  /** Synthesize the media table from `documents` (UTF-8 payload bytes;
    * the corpus has no real binaries). kind cycles image/audio/video.
    */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.par(Tables.documents(s, d)).select(
      col("doc_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Q-MEDIA-1: per-partition stub decode → typed metadata table.
    * Real plumbing: Dataset encoder, mapPartitions, one codec per
    * partition. Oracle recomputes the stub's arithmetic from `text`
    * directly (ascii-only corpus ⇒ byte i == char i).
    */
  def mediaMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d).as[MediaRow]
      .mapPartitions { rows =>
        // codec init happens once per partition here
        rows.map(StubCodec.decode)
      }
      .toDF()
  }

  val mediaMetaSql: String =
    """SELECT doc_id,
      |  ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
      |  len(text)::BIGINT AS n_bytes,
      |  (ascii(substr(text, 1, 1)) * 256 + ascii(substr(text, 2, 1))) % 1920 AS width,
      |  (ascii(substr(text, 2, 1)) * 256 + ascii(substr(text, 1, 1))) % 1080 AS height,
      |  least(len(text) // 32 + 1, 16)::BIGINT AS n_frames,
      |  list_reduce(list_prepend(0, list_transform(generate_series(1, len(text)), i -> ascii(substr(text, i, 1)))), (a, b) -> a + b)::BIGINT AS checksum
      |FROM documents""".stripMargin

  /** Q-MEDIA-DEDUP: fixed-size chunk-digest dedup over the BINARY
    * column — the digest-level dedup a crawl pipeline runs on media
    * payloads BEFORE any decode (whole-payload WARC digests catch only
    * byte-identical copies; fixed 32-byte chunk digests additionally
    * catch shared prefixes/segments — re-encoded containers with
    * identical leading streams, partial re-uploads). No codec
    * involved, so nothing here is stubbed: slice the raw bytes, md5
    * each chunk, report digests present in more than one media row.
    *
    * Shape at 100 TB: one map pass slicing+hashing (the binary never
    * shuffles — only 16-byte digests + doc ids do), a digest-keyed
    * map-side-combined rollup; the single distinct rides the two-level
    * aggregate.
    */
  def mediaDedup(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d)
      // Zero-length guard: for an empty payload the chunk-count formula
      // gives sequence(0, -1), which Spark renders as a DESCENDING
      // [0, -1] (step defaults to -1 when stop < start) — two phantom
      // chunks — while the oracle's generate_series(0, -1) is empty.
      // Empty media carries no chunk digests; drop it before exploding.
      .filter(length(col("payload")) > 0)
      .select(col("doc_id"), col("payload"),
        posexplode(sequence(lit(0L), expr("(length(payload) + 31) div 32 - 1"))))
      .select(col("doc_id"),
        md5(expr("substring(payload, CAST(col * 32 + 1 AS INT), 32)")).as("digest"))
      .groupBy(col("digest"))
      .agg(countDistinct(col("doc_id")).as("n_media"),
        count(lit(1)).as("n_occurrences"),
        min(col("doc_id")).as("keeper_doc"))
      .filter(col("n_media") > 1)

  /** Oracle hashes the same bytes: DuckDB strings are UTF-8, the
    * payload is exactly `encode(text, 'UTF-8')`, and the corpus is
    * ASCII (spec-asserted) so `substr` counts the same units.
    */
  val mediaDedupSql: String =
    """WITH ch AS (
      |  SELECT doc_id, md5(substr(text, (f * 32 + 1)::INT, 32)) AS digest
      |  FROM documents,
      |    unnest(generate_series(0, (len(text) + 31) // 32 - 1)) AS g(f))
      |SELECT digest, count(DISTINCT doc_id)::BIGINT AS n_media,
      |  count(*)::BIGINT AS n_occurrences, min(doc_id) AS keeper_doc
      |FROM ch GROUP BY digest HAVING count(DISTINCT doc_id) > 1""".stripMargin

  /** Q-MEDIA-2: frame sampling — every media row explodes into its
    * sampled frame index list with a per-frame byte offset (the shape a
    * real frame extractor emits; at 100 TB this is the pre-shuffle form
    * for frame-level feature extraction).
    */
  def frameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val meta = mediaTable(s, d).as[MediaRow]
      .mapPartitions(rows => rows.map(StubCodec.decode)).toDF()
    meta
      .select(col("doc_id"), col("kind"), col("n_bytes"), col("n_frames"),
        posexplode(sequence(lit(0L), col("n_frames") - 1)))
      .select(col("doc_id"), col("kind"),
        col("col").as("frame_idx"),
        (col("col") * expr("n_bytes DIV n_frames")).as("byte_offset"))
  }

  val frameSampleSql: String =
    """WITH meta AS (
      |  SELECT doc_id,
      |    ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
      |    len(text)::BIGINT AS n_bytes,
      |    least(len(text) // 32 + 1, 16)::BIGINT AS n_frames
      |  FROM documents)
      |SELECT doc_id, kind, f AS frame_idx, f * (n_bytes // n_frames) AS byte_offset
      |FROM meta, unnest(generate_series(0, n_frames - 1)) AS g(f)""".stripMargin

  /** Q-MEDIA-3: feature extraction → vector search, the full
    * multimodal-to-ANN path: per-partition stub "encoder" (a normalized
    * 64-bin byte histogram standing in for a CLIP/wav2vec forward pass —
    * the real plumbing is the batched mapPartitions shape and the typed
    * `array<double>` feature column), then IVF cell assignment against
    * the embedding table's centroids (broadcast, exact L2, rank-1).
    * At 100 TB: encode is map-only GPU-batchable work; the assignment
    * join broadcasts 8 centroids; no payload ever shuffles.
    */
  def mediaEmbed(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.DoubleType
    val feats = mediaTable(s, d).as[MediaRow]
      .mapPartitions { rows =>
        // encoder init once per partition; rows stream through in batches
        rows.map { r =>
          val h = new Array[Double](64)
          r.payload.foreach(b => h((b & 0xff) % 64) += 1.0)
          val n = math.max(r.payload.length, 1).toDouble
          (r.doc_id, h.map(_ / n).toSeq)
        }
      }.toDF("doc_id", "feat")
    val c = Tables.embeddings(s, d).filter(col("vec_id") < Portable.nCells(s, d))
      .select(col("vec_id").as("centroid_id"), col("embedding").as("c_emb"))
    Similarity.nearestCentroid(feats, c, id = "doc_id", vec = "feat")
  }

  val mediaEmbedSql: String =
    s"""WITH m AS (
      |  SELECT doc_id,
      |    list_transform(generate_series(0, 63), j ->
      |      len(list_filter(generate_series(1, len(text)),
      |        i -> ascii(substr(text, i, 1)) % 64 = j))::DOUBLE
      |      / greatest(len(text), 1)) AS feat
      |  FROM documents),
      |c AS (SELECT vec_id AS centroid_id, embedding AS c_emb FROM embeddings WHERE vec_id < ${Portable.cellCountSql()}),
      |scored AS (
      |  SELECT doc_id, centroid_id,
      |    list_reduce(list_transform(generate_series(1, 64), i ->
      |      (feat[i] - c_emb[i]::DOUBLE) * (feat[i] - c_emb[i]::DOUBLE)),
      |      (x, y) -> x + y) AS dist2
      |  FROM m, c)
      |SELECT doc_id, centroid_id, dist2 FROM (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY dist2, centroid_id) AS rn
      |  FROM scored) WHERE rn = 1""".stripMargin

  /** Resized output row: original + post-resize dimensions and the
    * resampled payload's stats.
    */
  final case class MediaResized(
      doc_id: Long, kind: String, width: Long, height: Long,
      out_width: Long, out_height: Long, out_bytes: Long, out_checksum: Long)

  /** Q-MEDIA-4: stub resize — downscale every media payload so its
    * longest side fits [[ResizeMaxDim]]. The "resampling" is a
    * deterministic byte-stride decimation (stands in for pixel
    * decimation; a real codec swaps into the same per-partition slot),
    * so the oracle can recompute the resized payload's size/checksum
    * from the source bytes. The plumbing is the real part: typed rows,
    * one codec per partition, payload transformed executor-side —
    * never collected, never stringified.
    */
  val ResizeMaxDim = 256L

  def resize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val m = StubCodec.decode(r)
          val maxDim = math.max(m.width, m.height)
          val scale = if (maxDim <= ResizeMaxDim) 1L else (maxDim + ResizeMaxDim - 1) / ResizeMaxDim
          var sum = 0L
          var n = 0L
          var i = 0
          while (i < r.payload.length) {
            sum += (r.payload(i) & 0xffL); n += 1; i += scale.toInt
          }
          MediaResized(m.doc_id, m.kind, m.width, m.height,
            m.width / scale, m.height / scale, n, sum)
        }
      }
      .toDF()
  }

  val resizeSql: String =
    s"""WITH m AS (
       |  SELECT doc_id,
       |    ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
       |    (ascii(substr(text, 1, 1)) * 256 + ascii(substr(text, 2, 1))) % 1920 AS width,
       |    (ascii(substr(text, 2, 1)) * 256 + ascii(substr(text, 1, 1))) % 1080 AS height,
       |    text
       |  FROM documents),
       |sc AS (
       |  SELECT *, CASE WHEN greatest(width, height) <= $ResizeMaxDim THEN 1
       |                 ELSE (greatest(width, height) + ${ResizeMaxDim - 1}) // $ResizeMaxDim
       |            END AS scale
       |  FROM m)
       |SELECT doc_id, kind, width, height,
       |  width // scale AS out_width, height // scale AS out_height,
       |  CASE WHEN len(text) = 0 THEN 0
       |       ELSE (len(text) - 1) // scale + 1 END::BIGINT AS out_bytes,
       |  list_reduce(list_prepend(0, list_transform(
       |    generate_series(1, len(text), scale::INT), i -> ascii(substr(text, i, 1)))),
       |    (a, b) -> a + b)::BIGINT AS out_checksum
       |FROM sc""".stripMargin

  /** Q-MEDIA-6: cross-modal retrieval with a metadata predicate — the
    * "FAISS with a filter" shape a caption→image training pipeline
    * runs: caption-side query vectors search ONLY the image-kind media
    * embeddings, through the same IVF coarse quantizer the `q_sim_*`
    * family serves from. The predicate arrives as a JOIN against the
    * media metadata table (not an inline column hack) and restricts
    * the index side BEFORE any cell assignment or scoring.
    *
    * Shape at 100 TB: the metadata predicate is an id-keyed equi-join
    * (sort-merge on the shared id, prunable to the `kind` partition if
    * the lake partitions by modality); the 8 centroids broadcast; the
    * query set broadcasts; each query scores only its own cell's image
    * vectors. Non-image modalities never leave their scan; nothing is
    * all-pairs.
    */
  def mediaSearch(s: SparkSession, d: String): DataFrame = {
    import Portable._
    val meta = Tables.par(Tables.documents(s, d)).select(
      col("doc_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"))
    val e = Tables.par(Tables.embeddings(s, d)).select(col("vec_id"), col("embedding"))
    val c = e.filter(col("vec_id") < Portable.nCells(s, d))
      .select(col("vec_id").as("centroid_id"), col("embedding").as("c_emb"))
    // nearest coarse cell per vector — shared map-side argmin (narrow),
    // embedding rejoined by vec_id for the scoring stage. The input is
    // PERSISTED first (minhashPairs' persist-then-reuse convention,
    // reclaimed by Tables.releaseCaches): nearestCentroid's output is
    // rejoined against its own input, so an unpersisted frame evaluates
    // its subtree twice — for the images side that recomputed the
    // embeddings⋈metadata filter join (ADVICE r16; 8 parquet scans in
    // the before plan, 4 after — plans/r17/q_media_search_*.txt).
    def nearestCell(df: DataFrame): DataFrame = {
      val in = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      Similarity.nearestCentroid(in, c)
        .select(col("vec_id"), col("centroid_id"))
        .join(in, Seq("vec_id"))
    }
    val images = nearestCell(
        e.join(meta.filter(col("kind") === "image"), e("vec_id") === meta("doc_id"))
          .select(col("vec_id"), col("embedding")))
      .withColumn("nrm", l2norm(col("embedding")))
    val qs = nearestCell(e.filter(col("vec_id") % 37 === 5))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("centroid_id").as("q_cell"))
      .withColumn("q_nrm", l2norm(col("q_emb")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cosine").desc, col("doc_id"))
    images.join(broadcast(qs),
        col("centroid_id") === col("q_cell") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("doc_id"),
        (dot(col("embedding"), col("q_emb")) / (col("nrm") * col("q_nrm"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
  }

  val mediaSearchSql: String = {
    import Portable._
    s"""WITH meta AS (
       |  SELECT doc_id, ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind
       |  FROM documents),
       |e AS (SELECT vec_id, embedding FROM embeddings),
       |c AS (SELECT vec_id AS centroid_id, embedding AS c_emb FROM e WHERE vec_id < ${cellCountSql()}),
       |img AS (
       |  SELECT e.vec_id, e.embedding FROM e
       |  JOIN meta ON e.vec_id = meta.doc_id WHERE meta.kind = 'image'),
       |imgcell AS (
       |  SELECT vec_id, embedding, centroid_id FROM (
       |    SELECT i.vec_id, i.embedding, c.centroid_id,
       |      row_number() OVER (PARTITION BY i.vec_id
       |        ORDER BY ${dist2Sql("i.embedding", "c_emb")}, c.centroid_id) AS rn
       |    FROM img i, c) WHERE rn = 1),
       |q AS (SELECT vec_id, embedding FROM e WHERE vec_id % 37 = 5),
       |qcell AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb, centroid_id AS q_cell FROM (
       |    SELECT q.vec_id, q.embedding, c.centroid_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${dist2Sql("q.embedding", "c_emb")}, c.centroid_id) AS rn
       |    FROM q, c) WHERE rn = 1),
       |scored AS (
       |  SELECT q_id, i.vec_id AS doc_id,
       |    ${dotSql("i.embedding", "q_emb")}
       |      / (${l2normSql("i.embedding")} * ${l2normSql("q_emb")}) AS cosine
       |  FROM imgcell i JOIN qcell ON i.centroid_id = q_cell AND i.vec_id <> q_id)
       |SELECT q_id, doc_id, cosine, CAST(rank AS INT) AS rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, doc_id) AS rank
       |  FROM scored) WHERE rank <= 3""".stripMargin
  }

  /** Per-frame signature row (stub codec output: the byte sum of the
    * frame's slice — a real pipeline emits a perceptual hash or frame
    * embedding from the same per-partition slot).
    */
  final case class FrameSig(doc_id: Long, frame_idx: Long, sig: Long)

  /** Q-MEDIA-7: shot-boundary detection — the video segmentation pass a
    * training pipeline runs before frame sampling: per-frame signatures
    * from the (stub) codec, frame-to-frame jumps, and a boundary
    * wherever a jump exceeds 2× the clip's mean jump. The verdict is
    * ALL-INTEGER (`jump · n_jumps > 2 · Σjumps` — no division), so both
    * engines agree bit-exactly.
    *
    * Shape at 100 TB: signature extraction is the map-only
    * `mapPartitions` codec slot (payloads never shuffle — only the
    * compact (doc, frame, sig) rows do); the lag window, the mean-jump
    * window, and the final rollup ALL key on `doc_id`, so one
    * doc-keyed exchange serves the whole query.
    */
  def mediaShots(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val sigs = mediaTable(s, d).as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val m = StubCodec.decode(r)
          val stride = (m.n_bytes / m.n_frames).toInt
          (0L until m.n_frames).map { f =>
            val off = (f * stride).toInt
            val end = math.min(off + stride, r.payload.length)
            var sum = 0L
            var i = off
            while (i < end) { sum += (r.payload(i) & 0xffL); i += 1 }
            FrameSig(r.doc_id, f, sum)
          }
        }
      }.toDF()
    val wLag = Window.partitionBy("doc_id").orderBy("frame_idx")
    val wDoc = Window.partitionBy("doc_id")
    sigs
      .withColumn("jump", abs(col("sig") - lag(col("sig"), 1).over(wLag)))
      .withColumn("n_jumps", count(col("jump")).over(wDoc))
      .withColumn("sum_jumps", sum(col("jump")).over(wDoc))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_frames"),
        (lit(1L) + coalesce(
          count(when(col("jump") * col("n_jumps") > lit(2) * col("sum_jumps"), 1)),
          lit(0L))).as("n_shots"),
        coalesce(max(col("jump")), lit(0L)).as("max_jump"))
  }

  val mediaShotsSql: String =
    """WITH m AS (
      |  SELECT doc_id, text, len(text) AS nb, least(len(text) // 32 + 1, 16) AS nf
      |  FROM documents),
      |fr AS (
      |  SELECT doc_id, f,
      |    list_reduce(list_prepend(0, list_transform(
      |      generate_series(f * (nb // nf) + 1, least(f * (nb // nf) + (nb // nf), nb)),
      |      i -> ascii(substr(text, i, 1)))), (a, b) -> a + b) AS sig
      |  FROM m, unnest(generate_series(0, nf - 1)) AS g(f)),
      |d AS (
      |  SELECT doc_id, f,
      |    abs(sig - lag(sig) OVER (PARTITION BY doc_id ORDER BY f)) AS jump
      |  FROM fr),
      |t AS (
      |  SELECT doc_id,
      |    count(*)::BIGINT AS n_frames,
      |    count(jump) AS n_jumps, sum(jump) AS sum_jumps,
      |    coalesce(max(jump), 0)::BIGINT AS max_jump
      |  FROM d GROUP BY 1),
      |b AS (
      |  SELECT d.doc_id, count(*) FILTER (WHERE d.jump * t.n_jumps > 2 * t.sum_jumps) AS nb
      |  FROM d JOIN t USING (doc_id) WHERE d.jump IS NOT NULL GROUP BY 1)
      |SELECT t.doc_id, t.n_frames, (1 + coalesce(b.nb, 0))::BIGINT AS n_shots, t.max_jump
      |FROM t LEFT JOIN b USING (doc_id)""".stripMargin

  /** Per-chunk energy row (stub codec output: byte sum of a 32-byte
    * window — a real pipeline emits RMS frame energy from the same
    * per-partition decoder slot).
    */
  final case class ChunkEnergy(doc_id: Long, chunk_idx: Long, energy: Long)

  /** Q-MEDIA-9: voice-activity segmentation — the audio twin of
    * [[mediaShots]], completing the image/audio/video triad: per-chunk
    * energies from the (stub) codec, a chunk is SILENT when its energy
    * falls below half the clip mean (`energy · n_chunks · 2 <
    * Σenergy` — integer-only, no division), and contiguous voiced runs
    * become the VAD segments a speech pipeline feeds to ASR. Output
    * per clip: chunk/voiced counts, segment count, longest segment,
    * voiced share.
    *
    * Shape at 100 TB: energy extraction is the map-only
    * `mapPartitions` codec slot (payloads never shuffle — only the
    * compact (doc, chunk, energy) rows do); the mean, the run
    * boundaries (lag + running sum), and both rollups ALL key on
    * `doc_id`, so one doc-keyed exchange serves the whole query.
    */
  def mediaVad(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val chunks = mediaTable(s, d)
      .filter(col("kind") === "audio" && length(col("payload")) > 0)
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val n = (r.payload.length + 31) / 32
          (0L until n.toLong).map { f =>
            val off = (f * 32).toInt
            val end = math.min(off + 32, r.payload.length)
            var sum = 0L
            var i = off
            while (i < end) { sum += (r.payload(i) & 0xffL); i += 1 }
            ChunkEnergy(r.doc_id, f, sum)
          }
        }
      }.toDF()
    val wDoc = Window.partitionBy("doc_id")
    val wLag = Window.partitionBy("doc_id").orderBy("chunk_idx")
    val flagged = chunks
      .withColumn("n_chunks", count(lit(1)).over(wDoc))
      .withColumn("sum_energy", sum(col("energy")).over(wDoc))
      .withColumn("voiced",
        col("energy") * col("n_chunks") * 2 >= col("sum_energy"))
    val runs = flagged
      .withColumn("strt", (col("voiced") &&
        !coalesce(lag(col("voiced"), 1).over(wLag), lit(false))).cast("int"))
      .withColumn("run_id", sum(col("strt")).over(wLag))
    val segs = runs.filter(col("voiced"))
      .groupBy(col("doc_id"), col("run_id"))
      .agg(count(lit(1)).as("seg_len"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segments"),
        max(col("seg_len")).as("max_segment_chunks"))
    flagged.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        count(when(col("voiced"), 1)).as("n_voiced"))
      .join(segs, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"), col("n_voiced"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("max_segment_chunks"), lit(0L)).as("max_segment_chunks"),
        (col("n_voiced").cast("double") / col("n_chunks")).as("voiced_share"))
  }

  val mediaVadSql: String =
    """WITH a AS (
      |  SELECT doc_id, text, len(text) AS nb FROM documents
      |  WHERE doc_id % 3 = 1 AND len(text) > 0),
      |ch AS (
      |  SELECT doc_id, f AS chunk_idx,
      |    list_reduce(list_prepend(0, list_transform(
      |      generate_series(f * 32 + 1, least(f * 32 + 32, nb)),
      |      i -> ascii(substr(text, i, 1)))), (x, y) -> x + y) AS energy
      |  FROM a, unnest(generate_series(0, (nb + 31) // 32 - 1)) AS g(f)),
      |v AS (
      |  SELECT doc_id, chunk_idx, energy,
      |    count(*) OVER (PARTITION BY doc_id) AS n_chunks,
      |    sum(energy) OVER (PARTITION BY doc_id) AS sum_energy,
      |    energy * count(*) OVER (PARTITION BY doc_id) * 2
      |      >= sum(energy) OVER (PARTITION BY doc_id) AS voiced
      |  FROM ch),
      |r AS (
      |  SELECT *, CASE WHEN voiced AND NOT coalesce(lag(voiced) OVER w, FALSE)
      |    THEN 1 ELSE 0 END AS strt
      |  FROM v WINDOW w AS (PARTITION BY doc_id ORDER BY chunk_idx)),
      |ri AS (
      |  SELECT *, sum(strt) OVER (PARTITION BY doc_id ORDER BY chunk_idx) AS run_id
      |  FROM r),
      |segs AS (
      |  SELECT doc_id, run_id, count(*) AS seg_len FROM ri WHERE voiced GROUP BY 1, 2),
      |sa AS (
      |  SELECT doc_id, count(*)::BIGINT AS n_segments,
      |    max(seg_len)::BIGINT AS max_segment_chunks
      |  FROM segs GROUP BY 1),
      |per AS (
      |  SELECT doc_id, count(*)::BIGINT AS n_chunks,
      |    (count(*) FILTER (WHERE voiced))::BIGINT AS n_voiced
      |  FROM v GROUP BY 1)
      |SELECT p.doc_id, p.n_chunks, p.n_voiced,
      |  coalesce(sa.n_segments, 0)::BIGINT AS n_segments,
      |  coalesce(sa.max_segment_chunks, 0)::BIGINT AS max_segment_chunks,
      |  p.n_voiced::DOUBLE / p.n_chunks AS voiced_share
      |FROM per p LEFT JOIN sa USING (doc_id)""".stripMargin

  /** Q-MEDIA-8: image–text alignment gate — the LAION/DataComp-style
    * CLIP-score curation filter: every candidate (caption, image) pair
    * scores caption-encoder × image-encoder cosine against a
    * threshold, and the per-source removal rate is reported in the
    * [[graft.llm.Corpus.filterChain]] audit shape (each release quotes
    * exactly this table). Candidates are ID-KEYED: each image pairs
    * with its own page caption and the NEXT page's caption (the
    * crawl-misalignment candidate a real pipeline must reject) — never
    * all-pairs.
    *
    * Encoders are the stub pair ([[mediaEmbed]]'s byte-histogram slot
    * for images, the same histogram over caption chars for text — a
    * real CLIP tower swaps into the same per-partition slot). The gate
    * is EXACT: features are integer counts, so cos ≥ 0.97 evaluates as
    * the cross-multiplication `10000·dot² ≥ 9409·‖a‖²·‖b‖²` — int64
    * only, no sqrt, no float compare, bit-equal on any engine.
    * Threshold 0.97 sits inside the misaligned-pair cosine spread
    * (measured 0.81–0.99 on the fixture corpus), so the gate passes
    * every aligned pair and rejects roughly half the misaligned ones —
    * hard negatives survive, as they do under a real CLIP threshold.
    *
    * Shape at 100 TB: both encoders are map-only (the image payload
    * never shuffles — the 64-long histogram does); candidate pairing
    * is an id-keyed equi-join; the rollup shuffles |sources| rows.
    */
  def mediaAlign(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // image tower: per-partition stub encoder over the BINARY payload
    val imgHist = mediaTable(s, d).as[MediaRow]
      .filter(_.kind == "image")
      .mapPartitions { rows =>
        rows.map { r =>
          val h = new Array[Long](64)
          r.payload.foreach(b => h((b & 0xff) % 64) += 1L)
          (r.doc_id, h.toSeq)
        }
      }.toDF("img_id", "img_hist")
    // text tower: the caption side of the stub encoder pair — the same
    // per-partition encoder slot as the image tower (a column-expr
    // histogram would be O(64·len) per caption: 64 filter passes over
    // the code array; the encoder slot is one O(len) pass)
    val capHist = graft.Tables.par(graft.Tables.documents(s, d))
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions { rows =>
        rows.map { case (id, src, t) =>
          val h = new Array[Long](64)
          var i = 0
          while (i < t.length) { h(t.charAt(i) % 64) += 1L; i += 1 }
          (id, src, h.toSeq)
        }
      }.toDF("cap_id", "source", "cap_hist")
    val dot = aggregate(
      zip_with(col("img_hist"), col("cap_hist"), (x, y) => x * y),
      lit(0L), (a, x) => a + x)
    def n2(c: Column): Column = aggregate(c, lit(0L), (a, x) => a + x * x)
    imgHist
      .select(col("img_id"), col("img_hist"),
        explode(array(col("img_id"), col("img_id") + 1)).as("cap_id"))
      .join(capHist, Seq("cap_id"))
      .select(col("source"), (col("cap_id") === col("img_id")).as("aligned"),
        (dot * dot * 10000 >= n2(col("img_hist")) * n2(col("cap_hist")) * 9409)
          .as("keep"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep") && col("aligned"), 1L).otherwise(0L)).as("n_kept_aligned"),
        sum(when(!col("keep"), 1L).otherwise(0L)).as("n_dropped"))
      .select(col("source"), col("n_pairs"), col("n_kept"), col("n_kept_aligned"),
        col("n_dropped"),
        (col("n_dropped").cast("double") / col("n_pairs").cast("double")).as("drop_rate"))
  }

  val mediaAlignSql: String =
    """WITH h AS (
      |  SELECT doc_id, source,
      |    list_transform(generate_series(0, 63), j ->
      |      len(list_filter(generate_series(1, len(text)),
      |        i -> ascii(substr(text, i, 1)) % 64 = j))::BIGINT) AS hist
      |  FROM documents),
      |img AS (SELECT doc_id AS img_id, hist AS img_hist FROM h WHERE doc_id % 3 = 0),
      |pairs AS (
      |  SELECT i.img_id, c.doc_id AS cap_id, c.source,
      |    i.img_hist, c.hist AS cap_hist
      |  FROM (SELECT img_id, img_hist, unnest([img_id, img_id + 1]) AS cap_id FROM img) i
      |  JOIN h c ON c.doc_id = i.cap_id),
      |scored AS (
      |  SELECT source, cap_id = img_id AS aligned,
      |    list_reduce(list_prepend(0, list_transform(generate_series(1, 64),
      |      k -> img_hist[k] * cap_hist[k])), (a, b) -> a + b) AS dot,
      |    list_reduce(list_prepend(0, list_transform(generate_series(1, 64),
      |      k -> img_hist[k] * img_hist[k])), (a, b) -> a + b) AS na2,
      |    list_reduce(list_prepend(0, list_transform(generate_series(1, 64),
      |      k -> cap_hist[k] * cap_hist[k])), (a, b) -> a + b) AS nb2
      |  FROM pairs),
      |v AS (SELECT source, aligned, dot * dot * 10000 >= na2 * nb2 * 9409 AS keep FROM scored)
      |SELECT source, count(*)::BIGINT AS n_pairs,
      |  sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
      |  sum(CASE WHEN keep AND aligned THEN 1 ELSE 0 END)::BIGINT AS n_kept_aligned,
      |  sum(CASE WHEN NOT keep THEN 1 ELSE 0 END)::BIGINT AS n_dropped,
      |  sum(CASE WHEN NOT keep THEN 1 ELSE 0 END)::DOUBLE / count(*)::DOUBLE AS drop_rate
      |FROM v GROUP BY source""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_media_meta", mediaMeta, Some(mediaMetaSql)),
    Q("q_media_align", mediaAlign, Some(mediaAlignSql)),
    Q("q_media_shots", mediaShots, Some(mediaShotsSql)),
    Q("q_media_vad", mediaVad, Some(mediaVadSql)),
    Q("q_media_dedup", mediaDedup, Some(mediaDedupSql)),
    Q("q_media_resize", resize, Some(resizeSql)),
    Q("q_media_frames", frameSample, Some(frameSampleSql)),
    Q("q_media_embed", mediaEmbed, Some(mediaEmbedSql)),
    Q("q_media_search", mediaSearch, Some(mediaSearchSql)))
}
