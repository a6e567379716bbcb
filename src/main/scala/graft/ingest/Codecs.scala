package graft.ingest

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream, Inflater, InflaterInputStream, Deflater, DeflaterOutputStream}
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Wire-payload codecs: content-encoding decode with magic-byte
  * sniffing, and HMAC signature verification.
  *
  * Mirrors the reference's decode ladder
  * (`/root/reference/src/extractors.rs:566-631`): an explicit
  * `compression` label wins; otherwise sniff — gzip magic `1f 8b`,
  * zlib magic `78`, then try-zlib-fall-back-to-gzip, else passthrough.
  * HMAC per `/root/reference/src/extractors.rs:320-399`: SHA-256
  * (`sha256=` prefix) or SHA-1 (GitHub `sha1=` style), constant-time
  * compare.
  *
  * These are genuine scalar UDFs — Spark has no decompress/HMAC
  * built-in. They sit at the ingest edge only (decode once per payload,
  * before the canonical projection), never in analytic hot paths, so
  * the codegen boundary they introduce is amortized over whole request
  * bodies. All are null-safe: undecodable input → null (row filtered to
  * a dead-letter path, never a job abort).
  */
object Codecs {

  // ----------------------------------------------------------- byte-level

  def gzipCompress(data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(data); gz.close()
    bos.toByteArray
  }

  def zlibCompress(data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val deflater = new Deflater()
    val d = new DeflaterOutputStream(bos, deflater)
    try { d.write(data); d.finish() } finally { d.close(); deflater.end() }
    bos.toByteArray
  }

  // Streams MUST be closed (and explicit Inflaters/Deflaters end()ed):
  // each java.util.zip native object holds ~tens of KB off-heap, and at
  // millions of payloads per executor, leaking them to finalizers turns
  // the decode stage into a GC stall.
  private def readAll(in: java.io.InputStream): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    try {
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    bos.toByteArray
  }

  def gzipDecompress(data: Array[Byte]): Array[Byte] =
    readAll(new GZIPInputStream(new ByteArrayInputStream(data)))

  // Per-thread reusable Inflater for the zlib path: at millions of
  // small payloads per executor, a fresh Inflater per row costs a
  // native zalloc/zfree pair and ~32 KB of window setup each time —
  // reset() reuses the native state. Bounded by executor thread count
  // (task threads are pooled and long-lived), so these are never
  // end()ed; that is the deliberate trade documented here. The gzip
  // path keeps GZIPInputStream (header/trailer + CRC semantics).
  private val tlInflater = new ThreadLocal[Inflater] {
    override def initialValue(): Inflater = new Inflater()
  }
  private val tlBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  def zlibDecompress(data: Array[Byte]): Array[Byte] = {
    val inf = tlInflater.get()
    inf.reset()
    inf.setInput(data)
    val buf = tlBuf.get()
    val bos = new ByteArrayOutputStream(math.max(64, data.length * 4))
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n > 0) bos.write(buf, 0, n)
        // input exhausted before the stream's end marker = truncated —
        // same failure the stream-based path raised as EOFException
        else if (inf.needsInput() || inf.needsDictionary())
          throw new java.util.zip.ZipException("truncated zlib stream")
      }
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new java.util.zip.ZipException(e.getMessage)
    }
    bos.toByteArray
  }

  /** Decode with explicit method, else sniff (extractors.rs:593-631). */
  def decodeAuto(data: Array[Byte], method: String): Array[Byte] = {
    if (data == null) return null
    try {
      Option(method).map(_.toLowerCase) match {
        case Some("gzip") | Some("gzip-js") => gzipDecompress(data)
        case Some("zlib") | Some("deflate") => zlibDecompress(data)
        case _ =>
          if (data.length >= 2 && (data(0) & 0xff) == 0x1f && (data(1) & 0xff) == 0x8b)
            gzipDecompress(data)
          else if (data.length >= 1 && (data(0) & 0xff) == 0x78)
            try zlibDecompress(data) catch { case _: Exception => gzipDecompress(data) }
          else data
      }
    } catch { case _: Exception => null }
  }

  // ----------------------------------------------------------------- HMAC

  def hmacHex(algo: String, secret: String, data: Array[Byte]): String = {
    val mac = Mac.getInstance(algo)
    mac.init(new SecretKeySpec(secret.getBytes("UTF-8"), algo))
    mac.doFinal(data).map("%02x".format(_)).mkString
  }

  def hmacSha256Hex(secret: String, data: Array[Byte]): String = hmacHex("HmacSHA256", secret, data)
  def hmacSha1Hex(secret: String, data: Array[Byte]): String = hmacHex("HmacSHA1", secret, data)

  /** Constant-time signature check; accepts `sha256=<hex>` or
    * `sha1=<hex>` prefixes (extractors.rs:356-390).
    */
  def verifySignature(secret: String, data: Array[Byte], provided: String): Boolean = {
    if (provided == null || data == null) return false
    val (algo, hex) = provided match {
      case s if s.startsWith("sha256=") => ("HmacSHA256", s.stripPrefix("sha256="))
      case s if s.startsWith("sha1=")   => ("HmacSHA1", s.stripPrefix("sha1="))
      case s                            => ("HmacSHA256", s)
    }
    val expected = hmacHex(algo, secret, data)
    java.security.MessageDigest.isEqual(expected.getBytes, hex.toLowerCase.getBytes)
  }

  // ------------------------------------- S3: form/base64 `data` envelopes

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** The `data`-field decode ladder (`extractors.rs:593-631`): optional
    * base64 (invalid base64 falls back to the raw bytes), then
    *   - labeled `gzip` → gzip; `gzip-js`/`zlib`/`deflate` → zlib
    *     (gzip-js is a zlib stream — posthog-js wraps with pako),
    *   - any other label → undecodable (null),
    *   - unlabeled: parse raw; on parse failure try zlib, then gzip.
    * Returns decoded JSON bytes whose root is an object/array, else
    * null (the reference rejects scalar roots).
    */
  def decodeDataString(data: String, compression: String): Array[Byte] = {
    if (data == null) return null
    val raw =
      try java.util.Base64.getDecoder.decode(data)
      catch { case _: IllegalArgumentException => data.getBytes("UTF-8") }
    def containerOrNull(bytes: Array[Byte]): Array[Byte] =
      try { val n = mapper.readTree(bytes); if (n != null && n.isContainerNode) bytes else null }
      catch { case _: Exception => null }
    Option(compression).map(_.toLowerCase) match {
      case Some("gzip") =>
        try containerOrNull(gzipDecompress(raw)) catch { case _: Exception => null }
      case Some("gzip-js") | Some("zlib") | Some("deflate") =>
        try containerOrNull(zlibDecompress(raw)) catch { case _: Exception => null }
      case Some(_) => null // unsupported compression label
      case None =>
        val plain = containerOrNull(raw)
        if (plain != null) plain
        else {
          val z = try containerOrNull(zlibDecompress(raw)) catch { case _: Exception => null }
          if (z != null) z
          else try containerOrNull(gzipDecompress(raw)) catch { case _: Exception => null }
        }
    }
  }

  /** S3: normalize a form-encoded or `data:`-enveloped body to the
    * plain JSON envelope `{<shared fields>, batch: [items]}` that the
    * declarative explode/normalize chain already understands.
    *
    *   - form bodies (`application/x-www-form-urlencoded` or a
    *     `data=` prefix): urlencoded pairs; `data` is the (possibly
    *     base64/compressed) payload, `compression`/`compression_method`
    *     labels it, every other pair is a shared field
    *     (`extractors.rs:457-505`);
    *   - JSON bodies whose `data` field is a STRING (double-encoded,
    *     base64, compressed — posthog-js emits all three): decode it,
    *     the sibling keys are shared fields (`parse_json_payload`);
    *   - shared fields merge into each item, item wins
    *     (`deserialize_events` or_insert), and stay on the envelope for
    *     envelope-level handling (api_key precedence, sent_at);
    *   - `{batch:}`/bare-object/bare-array data contents per
    *     `apply_batch_data`/`normalize_batch_array`.
    *
    * Returns null for undecodable payloads (dead-letter row, never an
    * abort). Bodies needing none of this pass through unchanged (same
    * String instance — the gating `when` in [[Normalizer]] makes this a
    * no-op for the JSON hot path).
    */
  def normalizeEnvelope(body: String, isForm: Boolean): String = {
    import com.fasterxml.jackson.databind.JsonNode
    import com.fasterxml.jackson.databind.node.ObjectNode
    if (body == null) return null
    try {
      if (isForm || body.startsWith("data=")) {
        var data: String = null
        var compression: String = null
        val shared = mapper.createObjectNode()
        body.split("&").iterator.filter(_.nonEmpty).foreach { kv =>
          val i = kv.indexOf('=')
          val k = java.net.URLDecoder.decode(if (i < 0) kv else kv.substring(0, i), "UTF-8")
          val v = java.net.URLDecoder.decode(if (i < 0) "" else kv.substring(i + 1), "UTF-8")
          k match {
            case "data" => data = v
            case "compression" | "compression_method" => compression = v
            case other => shared.put(other, v)
          }
        }
        if (data == null) return null
        rebuild(mapper.readTree(decodeDataString(data, compression)), shared)
      } else {
        val root = try mapper.readTree(body) catch { case _: Exception => return body }
        if (root == null || !root.isObject) return body
        val obj = root.asInstanceOf[ObjectNode]
        val comp = {
          val c = obj.remove("compression")
          if (c != null) c else obj.remove("compression_method")
        }
        val dataNode = obj.remove("data")
        if (dataNode == null) {
          // no data envelope: body minus any stray compression labels
          if (comp == null) body else mapper.writeValueAsString(obj)
        } else if (dataNode.isTextual) {
          val compStr = if (comp != null && comp.isTextual) comp.asText() else null
          rebuild(mapper.readTree(decodeDataString(dataNode.asText(), compStr)), obj)
        } else if (dataNode.isContainerNode) {
          rebuild(dataNode, obj) // {data:{...}}/{data:[...]}: compression ignored
        } else null // scalar data → reject
      }
    } catch { case _: Exception => null }
  }

  /** `apply_batch_data` + `deserialize_events`: content → batch array,
    * leftover content-object keys or_insert into the envelope, shared
    * envelope fields or_insert into each item (item wins).
    */
  private def rebuild(
      content: com.fasterxml.jackson.databind.JsonNode,
      shared: com.fasterxml.jackson.databind.node.ObjectNode): String = {
    import com.fasterxml.jackson.databind.JsonNode
    import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
    import scala.jdk.CollectionConverters._
    if (content == null) return null
    val batch: ArrayNode = mapper.createArrayNode()
    if (content.isArray) {
      content.elements().asScala.foreach(batch.add)
    } else if (content.isObject) {
      val cObj = content.asInstanceOf[ObjectNode].deepCopy()
      val b = cObj.remove("batch")
      if (b != null) {
        if (b.isArray) b.elements().asScala.foreach(batch.add)
        else if (b.isObject) batch.add(b)
        else return null
      } else batch.add(cObj.deepCopy())
      // leftover content keys join the envelope (or_insert)
      cObj.properties().asScala.foreach { e =>
        if (!shared.has(e.getKey)) shared.set[JsonNode](e.getKey, e.getValue)
      }
    } else return null
    // shared fields merge into each item, item wins (deserialize_events)
    val mergedBatch = mapper.createArrayNode()
    batch.elements().asScala.foreach {
      case o: ObjectNode =>
        val m = o.deepCopy()
        shared.properties().asScala.foreach { e =>
          if (!m.has(e.getKey)) m.set[JsonNode](e.getKey, e.getValue)
        }
        mergedBatch.add(m)
      case _ => return null // reference: non-object items are a structure error
    }
    val out = shared.deepCopy()
    out.set[JsonNode]("batch", mergedBatch)
    mapper.writeValueAsString(out)
  }

  // ------------------------------------------------------------ Column API

  val decodeAutoUdf = udf((data: Array[Byte], method: String) => decodeAuto(data, method))
  val normalizeEnvelopeUdf = udf((body: String, isForm: Boolean) => normalizeEnvelope(body, isForm))
  val gzipUdf = udf((s: String) => gzipCompress(s.getBytes("UTF-8")))
  val zlibUdf = udf((s: String) => zlibCompress(s.getBytes("UTF-8")))
  val hmacSha256Udf = udf((secret: String, data: Array[Byte]) => hmacSha256Hex(secret, data))
  val verifySigUdf = udf((secret: String, data: Array[Byte], sig: String) => verifySignature(secret, data, sig))

  /** Decode a (possibly compressed) payload column to a UTF-8 string.
    *
    * ND-marked (the function is pure; the marker is an optimizer
    * fence): the decoded body feeds the whole ingest chain, and a
    * deterministic UDF alias gets re-inlined into every downstream
    * reference by CollapseProject — measured as 41 decompress calls
    * per row on the wire path. The fence pins one evaluation per row.
    */
  def decodeToString(data: Column, method: Column): Column =
    decodeAutoNdUdf(data, method).cast("string")

  private val decodeAutoNdUdf = decodeAutoUdf.asNondeterministic()
}
