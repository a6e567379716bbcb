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

  def zlibDecompress(data: Array[Byte]): Array[Byte] = {
    val inflater = new Inflater()
    try readAll(new InflaterInputStream(new ByteArrayInputStream(data), inflater))
    finally inflater.end()
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

  // ------------------------------------------------------------ Column API

  val decodeAutoUdf = udf((data: Array[Byte], method: String) => decodeAuto(data, method))
  val gzipUdf = udf((s: String) => gzipCompress(s.getBytes("UTF-8")))
  val zlibUdf = udf((s: String) => zlibCompress(s.getBytes("UTF-8")))
  val hmacSha256Udf = udf((secret: String, data: Array[Byte]) => hmacSha256Hex(secret, data))
  val verifySigUdf = udf((secret: String, data: Array[Byte], sig: String) => verifySignature(secret, data, sig))

  /** Decode a (possibly compressed) payload column to a UTF-8 string. */
  def decodeToString(data: Column, method: Column): Column =
    decodeAutoUdf(data, method).cast("string")
}
