package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Warc

/** The `format("warc")` DataSource V2 connector: record rows match the
  * library parser on the same bytes, plain and gzipped files coexist, one
  * partition per file, column pruning reaches the reader, corrupt files
  * degrade instead of failing the scan.
  */
class WarcSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rec(i: Int, uri: String): Warc.WarcRecord =
    Warc.WarcRecord(
      if (i % 2 == 0) "response" else "request",
      Seq(
        "WARC-Record-ID" -> s"<urn:test:$i>",
        "WARC-Target-URI" -> uri,
        "Content-Type" -> "text/plain"),
      s"payload body $i ${"x" * i}".getBytes("UTF-8"))

  private def writeDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_warcsrc")
    java.nio.file.Files.write(
      dir.resolve("a.warc"),
      Warc.encodeWarc(Seq(rec(0, "https://a.example/0"), rec(1, "https://a.example/1"))))
    java.nio.file.Files.write(
      dir.resolve("b.warc.gz"),
      Warc.encodeWarc(
        Seq(rec(2, "https://b.example/2"), rec(3, "https://b.example/3"),
          rec(4, "https://b.example/4")),
        gzip = true))
    // a non-warc file in the directory must be ignored by the listing
    java.nio.file.Files.write(dir.resolve("notes.txt"), "ignore me".getBytes)
    dir.toString
  }

  test("reads records from plain and gzipped files; rows match the parser") {
    val dir = writeDir()
    val df = spark.read.format("warc").load(dir)
    val rows = df.orderBy("path", "rec_idx").collect()
    assert(rows.length === 5)
    // per-file record counts and indices
    val byFile = rows.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(byFile.keys.map(_.split('/').last).toSet === Set("a.warc", "b.warc.gz"))
    assert(byFile.values.toSet === Set(2, 3))
    // field content matches the encode inputs
    val r0 = rows.find(r => r.getString(0).endsWith("a.warc") && r.getInt(1) == 0).get
    assert(r0.getString(2) === "response")
    assert(r0.getString(3) === "https://a.example/0")
    assert(r0.getInt(4) === 3)
    assert(r0.getBoolean(7))
    assert(new String(r0.getAs[Array[Byte]]("payload"), "UTF-8")
      .startsWith("payload body 0"))
    // parity with the library parser over the same gz bytes
    val gzBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "b.warc.gz"))
    val (recs, valid) = Warc.decodeWarc(gzBytes)
    assert(valid && recs.length === 3)
    val viaSource = rows.filter(_.getString(0).endsWith("b.warc.gz"))
      .sortBy(_.getInt(1)).map(r => new String(r.getAs[Array[Byte]]("payload"), "UTF-8"))
    assert(viaSource.toSeq === recs.map(r => new String(r.payload, "UTF-8")))
  }

  test("one input partition per file; pruning reaches the reader") {
    val dir = writeDir()
    val df = spark.read.format("warc").load(dir)
    assert(df.rdd.getNumPartitions === 2)
    // projected read works and the scan's readSchema shrinks
    val uris = df.select("target_uri").as[String].collect().sorted
    assert(uris.length === 5 && uris.forall(_.startsWith("https://")))
    val plan = df.select("target_uri").queryExecution.executedPlan.toString
    assert(plan.contains("target_uri"))
    assert(!plan.toLowerCase.contains("payload"),
      s"pruned scan must not carry payload:\n$plan")
    // aggregate over the source
    assert(df.count() === 5L)
  }

  test("corrupt file degrades: intact prefix parses, warc_valid false") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warcbad")
    val good = Warc.encodeWarc(Seq(rec(0, "https://ok.example/")))
    val corrupt = good ++ "WARC/1.0\r\nbroken".getBytes("US-ASCII")
    java.nio.file.Files.write(dir.resolve("c.warc"), corrupt)
    val rows = spark.read.format("warc").load(dir.toString).collect()
    assert(rows.length === 1)
    assert(!rows(0).getBoolean(7), "truncated tail must flip warc_valid")
    assert(rows(0).getString(3) === "https://ok.example/")
  }

  test("glob paths and missing-path error") {
    val dir = writeDir()
    val df = spark.read.format("warc").load(s"$dir/*.warc.gz")
    assert(df.count() === 3L)
    val err = intercept[Exception] {
      spark.read.format("warc").load()
    }
    assert(String.valueOf(err.getMessage).toLowerCase.contains("path"))
  }
}
