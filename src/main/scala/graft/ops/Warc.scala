package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC (Web ARChive, ISO 28500) ingestion — the container format
  * Common Crawl and most web-scale training corpora arrive in. REAL
  * parser per the public spec: `WARC/1.0`/`1.1` version line, CRLF
  * header block, `Content-Length`-framed payload, `CRLF CRLF` record
  * terminator; gzip inputs (per-record members concatenated, the
  * standard `.warc.gz` layout) inflate transparently via the JDK's
  * multi-member `GZIPInputStream`. The encoder exists for tests and the
  * gate's synthesized corpora (same pattern as the audio/video codecs:
  * REAL bytes built in-plan, parsed back, oracled in closed form).
  *
  * 100 TB posture: parsing is a per-partition streaming pass
  * (`mapPartitions`, like every binary decoder in [[Multimodal]] — no
  * Catalyst expression can frame variable-length records); one WARC blob
  * never materializes more than its own records, and malformed input
  * degrades per-BLOB (records before the corruption parse, `valid=false`
  * marks the tail) rather than failing the scan.
  */
object Warc {

  /** One parsed record: (warc_type, headers in order, payload bytes). */
  final case class WarcRecord(
      warcType: String,
      headers: Seq[(String, String)],
      payload: Array[Byte])

  private val Crlf = "\r\n".getBytes("US-ASCII")

  /** Encode records as a WARC/1.0 byte stream (optionally gzip — one
    * member per record, the standard `.warc.gz` layout).
    */
  def encodeWarc(records: Seq[WarcRecord], gzip: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      val rec = new java.io.ByteArrayOutputStream()
      def line(s: String): Unit = {
        rec.write(s.getBytes("UTF-8")); rec.write(Crlf)
      }
      line("WARC/1.0")
      line(s"WARC-Type: ${r.warcType}")
      r.headers.foreach { case (k, v) => line(s"$k: $v") }
      line(s"Content-Length: ${r.payload.length}")
      rec.write(Crlf)
      rec.write(r.payload)
      rec.write(Crlf); rec.write(Crlf)
      if (gzip) {
        val gz = new java.util.zip.GZIPOutputStream(out)
        gz.write(rec.toByteArray); gz.finish()
      } else out.write(rec.toByteArray)
    }
    out.toByteArray
  }

  /** Inflate a (possibly multi-member) gzip buffer; non-gzip input
    * returns unchanged. The JDK's GZIPInputStream consumes concatenated
    * members — exactly the `.warc.gz` record-per-member layout.
    */
  private[graft] def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    if (bytes.length < 2 ||
      (bytes(0) & 0xff) != 0x1f || (bytes(1) & 0xff) != 0x8b) return bytes
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  /** Parse a WARC byte stream (plain or gzip). Returns the records parsed
    * before the first corruption; `strict` decides whether trailing
    * garbage after a well-formed prefix throws or truncates.
    */
  def decodeWarc(raw: Array[Byte]): (Seq[WarcRecord], Boolean) = {
    val bytes =
      try gunzipAll(raw)
      catch { case _: java.io.IOException => return (Nil, false) }
    val records = Seq.newBuilder[WarcRecord]
    var pos = 0
    var valid = true
    def lineEnd(from: Int): Int = {
      var i = from
      while (i + 1 < bytes.length && !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 < bytes.length) i else -1
    }
    while (valid && pos < bytes.length) {
      // skip inter-record padding CRLFs (lenient, like warcio)
      while (pos + 1 < bytes.length && bytes(pos) == '\r' && bytes(pos + 1) == '\n')
        pos += 2
      if (pos >= bytes.length) ()
      else {
        val vEnd = lineEnd(pos)
        val version =
          if (vEnd < 0) null else new String(bytes, pos, vEnd - pos, "UTF-8")
        if (version == null || !version.startsWith("WARC/")) valid = false
        else {
          pos = vEnd + 2
          var warcType: String = null
          var contentLength = -1L
          val headers = Seq.newBuilder[(String, String)]
          var headersDone = false
          while (valid && !headersDone) {
            val hEnd = lineEnd(pos)
            if (hEnd < 0) valid = false
            else if (hEnd == pos) { headersDone = true; pos += 2 }
            else {
              val line = new String(bytes, pos, hEnd - pos, "UTF-8")
              val ci = line.indexOf(':')
              if (ci <= 0) valid = false
              else {
                val k = line.substring(0, ci).trim
                val v = line.substring(ci + 1).trim
                if (k.equalsIgnoreCase("WARC-Type")) warcType = v
                else if (k.equalsIgnoreCase("Content-Length"))
                  contentLength = try v.toLong catch { case _: NumberFormatException => -1L }
                else headers += (k -> v)
                pos = hEnd + 2
              }
            }
          }
          if (valid) {
            if (contentLength < 0 || pos + contentLength > bytes.length) valid = false
            else {
              val payload = java.util.Arrays.copyOfRange(
                bytes, pos, pos + contentLength.toInt)
              pos += contentLength.toInt
              // record terminator: CRLF CRLF
              if (pos + 4 <= bytes.length &&
                bytes(pos) == '\r' && bytes(pos + 1) == '\n' &&
                bytes(pos + 2) == '\r' && bytes(pos + 3) == '\n') {
                pos += 4
                records += WarcRecord(
                  if (warcType == null) "" else warcType,
                  headers.result(), payload)
              } else valid = false
            }
          }
        }
      }
    }
    (records.result(), valid)
  }

  /** Parse a binary WARC column into one row per record:
    * (idCol, rec_idx, warc_type, n_headers, content_length BIGINT,
    * payload BINARY, warc_valid — the BLOB-level well-formedness flag,
    * repeated on each of its rows; a fully-corrupt blob yields one row
    * with NULL record fields so corruption is countable downstream).
    */
  def parseWarcRecords(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("rec_idx", IntegerType),
      StructField("warc_type", StringType),
      StructField("n_headers", IntegerType),
      StructField("content_length", LongType),
      StructField("payload", BinaryType),
      StructField("warc_valid", BooleanType)))
    val projected = df.select(col(idCol).cast(LongType), col(binCol))
    val rdd = projected.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
        val raw = r.getAs[Array[Byte]](1)
        if (raw == null) Iterator.single(Row(id, null, null, null, null, null, false))
        else {
          val (recs, valid) = decodeWarc(raw)
          if (recs.isEmpty)
            Iterator.single(Row(id, null, null, null, null, null, valid))
          else recs.iterator.zipWithIndex.map { case (rec, i) =>
            Row(id, i, rec.warcType, rec.headers.length,
              rec.payload.length.toLong, rec.payload, valid)
          }
        }
      }
    }
    spark.createDataFrame(rdd, schema).withColumnRenamed("id", idCol)
  }
}
