package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Warc
import graft.ops.Warc.WarcRecord

/** WARC parsing: round-trips (plain + gzip multi-member), corruption
  * degradation, and the DataFrame surface.
  */
class WarcSpec extends AnyFunSuite {
  import TestSpark._

  private def sampleRecords = Seq(
    WarcRecord("warcinfo",
      Seq("WARC-Record-ID" -> "<urn:uuid:1>"), "software: graft\r\n".getBytes("UTF-8")),
    WarcRecord("response",
      Seq("WARC-Record-ID" -> "<urn:uuid:2>", "WARC-Target-URI" -> "http://x.example/"),
      "HTTP/1.1 200 OK\r\n\r\nhello körper 你好".getBytes("UTF-8")),
    WarcRecord("request",
      Seq("WARC-Record-ID" -> "<urn:uuid:3>"), Array.emptyByteArray))

  test("plain round-trip preserves types, headers, and payload bytes") {
    val bytes = Warc.encodeWarc(sampleRecords)
    val (recs, valid) = Warc.decodeWarc(bytes)
    assert(valid)
    assert(recs.map(_.warcType) == Seq("warcinfo", "response", "request"))
    assert(recs(1).headers.contains("WARC-Target-URI" -> "http://x.example/"))
    assert(recs(1).payload.toSeq == sampleRecords(1).payload.toSeq)
    assert(recs(2).payload.isEmpty)
  }

  test("gzip multi-member (.warc.gz layout) round-trips transparently") {
    val bytes = Warc.encodeWarc(sampleRecords, gzip = true)
    assert((bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
    val (recs, valid) = Warc.decodeWarc(bytes)
    assert(valid)
    assert(recs.map(_.warcType) == Seq("warcinfo", "response", "request"))
    assert(recs(1).payload.toSeq == sampleRecords(1).payload.toSeq)
  }

  test("corruption degrades per-blob: prefix parses, valid=false") {
    val good = Warc.encodeWarc(sampleRecords)
    // truncate inside the last record's payload framing
    val cut = java.util.Arrays.copyOfRange(good, 0, good.length - 6)
    val (recs, valid) = Warc.decodeWarc(cut)
    assert(!valid)
    assert(recs.length == 2) // the two intact records still parse
    // bad Content-Length
    val bad = new String(good, "ISO-8859-1")
      .replaceFirst("Content-Length: 17", "Content-Length: XX")
      .getBytes("ISO-8859-1")
    val (recs2, valid2) = Warc.decodeWarc(bad)
    assert(!valid2 && recs2.isEmpty)
    // non-WARC bytes entirely
    val (recs3, valid3) = Warc.decodeWarc("not a warc".getBytes)
    assert(!valid3 && recs3.isEmpty)
  }

  test("parseWarcRecords explodes blobs to rows; corrupt blobs stay countable") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = java.util.Arrays.asList(
      Row(java.lang.Long.valueOf(1L), Warc.encodeWarc(sampleRecords)),
      Row(java.lang.Long.valueOf(2L), Warc.encodeWarc(sampleRecords.take(1), gzip = true)),
      Row(java.lang.Long.valueOf(3L), "garbage".getBytes),
      Row(java.lang.Long.valueOf(4L), null))
    val df = spark.createDataFrame(rows, StructType(Seq(
      StructField("doc_id", LongType), StructField("blob", BinaryType))))
    val out = Warc.parseWarcRecords(df, "doc_id", "blob")
    val byId = out.collect().groupBy(_.getLong(0))
    assert(byId(1L).length == 3 && byId(1L).forall(_.getBoolean(6)))
    assert(byId(2L).length == 1 && byId(2L).head.getString(2) == "warcinfo")
    assert(byId(3L).length == 1 && !byId(3L).head.getBoolean(6) && byId(3L).head.isNullAt(1))
    assert(byId(4L).length == 1 && !byId(4L).head.getBoolean(6))
    // payload content-lengths surface exactly
    val resp = byId(1L).find(_.getString(2) == "response").get
    assert(resp.getLong(4) == sampleRecords(1).payload.length.toLong)
  }
}
