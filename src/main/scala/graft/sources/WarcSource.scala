package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.Warc

/** `spark.read.format("warc").load(path)` — a DataSource V2 connector over
  * the engine's ISO 28500 parser ([[graft.ops.Warc]]): point it at a
  * directory (or glob) of `.warc` / `.warc.gz` files and get one row per
  * WARC record. The Spark-native spelling of crawl ingestion — the
  * planner sees an ordinary table (column pruning is pushed into the
  * reader; adding filters composes as usual), and the WebIngest pipeline
  * starts from a path instead of a pre-staged blob column.
  *
  * Partitioning: one input partition per FILE — gzipped WARCs are
  * record-per-member concatenated gzip streams, which are not splittable
  * mid-file; the web-archive convention is many ~1 GB files, so file
  * granularity IS the parallelism (same contract as Spark's own
  * binaryFile/text sources for .gz). Corrupt files degrade per the
  * parser's contract: the intact prefix parses, `warc_valid` goes false —
  * a dirty crawl never kills the scan.
  *
  * Schema: (path, rec_idx, warc_type, target_uri, n_headers,
  * content_length, payload, warc_valid).
  */
class WarcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcDataSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WarcTable(WarcDataSource.pathsFrom(new CaseInsensitiveStringMap(properties)))
}

object WarcDataSource {
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("rec_idx", IntegerType, nullable = true),
    StructField("warc_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("n_headers", IntegerType, nullable = true),
    StructField("content_length", LongType, nullable = true),
    StructField("payload", BinaryType, nullable = true),
    StructField("warc_valid", BooleanType, nullable = false)))

  private[sources] def pathsFrom(options: CaseInsensitiveStringMap): Seq[String] = {
    val multi = Option(options.get("paths")).map(_.split(",").toSeq).getOrElse(Nil)
    val single = Option(options.get("path")).toSeq
    val all = (multi ++ single).map(_.trim).filter(_.nonEmpty)
    require(all.nonEmpty, "warc source requires a path")
    all
  }

  /** Expand globs/directories to the concrete .warc/.warc.gz file list. */
  private[sources] def listFiles(paths: Seq[String]): Seq[String] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    paths.flatMap { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      val matched = Option(fs.globStatus(hp)).map(_.toSeq).getOrElse(Nil)
      matched.flatMap { st =>
        if (st.isDirectory)
          fs.listStatus(st.getPath).toSeq.filter(_.isFile).map(_.getPath.toString)
        else Seq(st.getPath.toString)
      }
    }.filter(n => n.endsWith(".warc") || n.endsWith(".warc.gz")).sorted
  }
}

final class WarcTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"warc(${paths.mkString(",")})"
  override def schema(): StructType = WarcDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(paths)
}

final class WarcScanBuilder(paths: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = WarcDataSource.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve source field order; an empty projection (count(*)) keeps
    // zero fields and the reader emits empty rows
    required = StructType(
      WarcDataSource.schema.fields.filter(f =>
        requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = new WarcScan(paths, required)
}

final class WarcScan(paths: Seq[String], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    WarcDataSource.listFiles(paths).map(WarcFilePartition(_): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory = {
    // Hadoop Configuration is not serializable — ship the entries the
    // driver resolved and rebuild executor-side (the V2 analogue of
    // SerializableConfiguration, which is private[spark])
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val entries = conf.iterator().asScala
      .map(e => e.getKey -> e.getValue).toMap
    new WarcReaderFactory(required, entries)
  }
}

final case class WarcFilePartition(file: String) extends InputPartition

final class WarcReaderFactory(
    required: StructType,
    hadoopConf: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WarcPartitionReader(
      partition.asInstanceOf[WarcFilePartition].file, required, hadoopConf)
}

/** Reads one WARC file: whole-member bytes through the library parser,
  * one InternalRow per record, projected to the pruned schema. */
final class WarcPartitionReader(
    file: String,
    required: StructType,
    hadoopConf: Map[String, String])
    extends PartitionReader[InternalRow] {

  private var rows: Iterator[InternalRow] = _
  private var current: InternalRow = _

  private def fieldValue(
      name: String,
      idx: Int,
      rec: Warc.WarcRecord,
      valid: Boolean): Any = name match {
    case "path" => UTF8String.fromString(file)
    case "rec_idx" => idx
    case "warc_type" => UTF8String.fromString(rec.warcType)
    case "target_uri" =>
      rec.headers.collectFirst {
        case (k, v) if k.equalsIgnoreCase("WARC-Target-URI") =>
          UTF8String.fromString(v)
      }.orNull
    case "n_headers" => rec.headers.length
    case "content_length" => rec.payload.length.toLong
    case "payload" => rec.payload
    case "warc_valid" => valid
  }

  private def load(): Unit = {
    val hconf = new org.apache.hadoop.conf.Configuration(false)
    hadoopConf.foreach { case (k, v) => hconf.set(k, v) }
    val hp = new Path(file)
    val fs = hp.getFileSystem(hconf)
    val in = fs.open(hp)
    val bytes =
      try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](1 << 16)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
        bos.toByteArray
      } finally in.close()
    val (recs, valid) = Warc.decodeWarc(bytes)
    rows = recs.iterator.zipWithIndex.map { case (rec, i) =>
      InternalRow.fromSeq(
        required.fields.toSeq.map(f => fieldValue(f.name, i, rec, valid)))
    }
  }

  override def next(): Boolean = {
    if (rows == null) load()
    if (rows.hasNext) { current = rows.next(); true } else false
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
