package graft.sources

import java.util.{List => JList, Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.{Encoder, Encoders}

import graft.model.Triple
import graft.riot.NTriples

/**
 * DataSource V2 face for the N-Triples reader:
 * `spark.read.format("ntriples").load(path)` — the idiomatic Spark-native
 * source API over the same line parser `riot.NTriples` exposes through
 * `textFile + mapPartitions` (reference: riot's RDFParser/Lang registry,
 * jena-arq riot/RDFLanguages.java). What V2 adds over the mapPartitions
 * face:
 *
 *  - **split planning is explicit**: every file is cut into byte ranges of
 *    `spark.sql.files.maxPartitionBytes` at PLAN time, so one huge .nt
 *    file parallelizes across the cluster (a line belongs to the split
 *    holding its first byte — the standard text-split contract);
 *  - **top-level column pruning** reaches the source: `SELECT s` reads and
 *    emits only the subject struct per row (the parse still sees the
 *    line; pruning saves row width, not IO — honest for a text format);
 *  - the short name registers through DataSourceRegister
 *    (META-INF/services), as a packaged source would.
 *
 * Malformed lines are skipped (strict=false), matching the streaming
 * ingest path; comment/blank lines yield nothing.
 */
class NTriplesDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "ntriples"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NTriplesTable.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val paths = Option(properties.get("paths"))
      .map(p => org.json4s.jackson.JsonMethods.parse(p)
        .values.asInstanceOf[List[String]])
      .getOrElse(Option(properties.get("path")).toList)
    new NTriplesTable(paths)
  }
}

object NTriplesTable {
  implicit val tripleEncoder: Encoder[Triple] = Encoders.product[Triple]
  val Schema: StructType = tripleEncoder.schema

  /** The session's Hadoop conf (spark.hadoop.*, fs.* credentials) as a
   * serializable property list — executors rebuild a Configuration from
   * it, so s3a/hdfs settings survive the driver -> task hop. */
  def hadoopProps(): Array[(String, String)] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val it = conf.iterator()
    val buf = scala.collection.mutable.ArrayBuffer[(String, String)]()
    while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
    buf.toArray
  }

  def confOf(props: Array[(String, String)]): Configuration = {
    val c = new Configuration(false)
    props.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** Data files only: skip _SUCCESS/_temporary/.crc and other hidden or
   * system entries, like Spark's built-in file sources. */
  def isDataFile(name: String): Boolean =
    !name.startsWith("_") && !name.startsWith(".")
}

class NTriplesTable(paths: Seq[String]) extends Table
    with SupportsRead with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"ntriples(${paths.mkString(",")})"
  override def schema(): StructType = NTriplesTable.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new NTriplesScanBuilder(paths)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    require(paths.length == 1, "ntriples write needs exactly one target path")
    new NTriplesWriteBuilder(paths.head, info.schema())
  }
}

class NTriplesScanBuilder(paths: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = NTriplesTable.Schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    // top-level (s/p/o) pruning only: Catalyst may hand a NESTED pruned
    // schema (s: struct<lex>) — re-expand each kept field to the full
    // Term struct and let Spark project the subfields above the scan.
    // An empty prune (count(*)) keeps zero fields: the reader emits
    // empty rows. readSchema() always matches what the reader emits.
    required = StructType(requiredSchema.fields.map(f =>
      NTriplesTable.Schema(NTriplesTable.Schema.fieldIndex(f.name))))

  override def build(): Scan = new NTriplesScan(paths, required)
}

case class NTriplesSplit(path: String, start: Long, end: Long)
  extends InputPartition

class NTriplesScan(paths: Seq[String], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val maxSplit = SparkSession.active.sessionState.conf.filesMaxPartitionBytes
    paths.flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      // globStatus expands wildcards and passes literal paths through
      val roots = Option(fs.globStatus(path)).getOrElse(Array.empty)
      require(roots.nonEmpty, s"ntriples: no files match $p")
      val files = roots.flatMap { st =>
        if (st.isDirectory)
          fs.listStatus(st.getPath).filter(f =>
            f.isFile && NTriplesTable.isDataFile(f.getPath.getName))
        else Array(st)
      }
      files.flatMap { st =>
        val f = st.getPath
        val len = st.getLen
        if (len == 0) Seq(NTriplesSplit(f.toString, 0L, 0L))
        else (0L until len by maxSplit).map(off =>
          NTriplesSplit(f.toString, off, math.min(off + maxSplit, len)))
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new NTriplesReaderFactory(required, NTriplesTable.hadoopProps())
}

class NTriplesReaderFactory(required: StructType,
    hadoopProps: Array[(String, String)]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new NTriplesPartitionReader(partition.asInstanceOf[NTriplesSplit],
      required, hadoopProps)
}

/** Reads [start, end) of one file: skips the partial first line unless at
 * offset 0, and reads the line that BEGINS before `end` to completion —
 * every line is owned by exactly one split. */
class NTriplesPartitionReader(split: NTriplesSplit, required: StructType,
    hadoopProps: Array[(String, String)])
    extends PartitionReader[InternalRow] {

  // seek to start-1 (not start): if the previous line ends exactly at the
  // boundary, the skip consumes only its '\n' and a line beginning exactly
  // at `start` is kept — Hadoop LineRecordReader's contract
  private val seekTo = if (split.start == 0) 0L else split.start - 1
  private val in = {
    val path = new Path(split.path)
    val fs = path.getFileSystem(NTriplesTable.confOf(hadoopProps))
    val stream = fs.open(path)
    stream.seek(seekTo)
    // buffer above the seeked stream: byte-wise read() below would
    // otherwise pay a synchronized virtual call into the FS stack per byte
    new java.io.BufferedInputStream(stream, 64 * 1024)
  }
  // position of the NEXT unread byte, tracked manually (readLine below)
  private var pos: Long = seekTo
  private val serializer =
    ExpressionEncoder(NTriplesTable.tripleEncoder
      .asInstanceOf[org.apache.spark.sql.catalyst.encoders.AgnosticEncoder[Triple]])
      .createSerializer()
  private val fullSchema = NTriplesTable.Schema
  private val fieldIdx = required.fields.map(f => fullSchema.fieldIndex(f.name))
  private var current: InternalRow = _

  if (split.start > 0) skipLine() // owned by the previous split

  /** Reads bytes up to and including '\n' (or EOF); returns them minus the
   * terminator, or null at EOF. Tracks `pos`. */
  private def readLine(): String = {
    val buf = new java.io.ByteArrayOutputStream(128)
    var b = in.read()
    if (b == -1) return null
    while (b != -1 && b != '\n') { buf.write(b); pos += 1; b = in.read() }
    if (b == '\n') pos += 1
    new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
      .stripSuffix("\r")
  }

  private def skipLine(): Unit = {
    var b = in.read()
    while (b != -1 && b != '\n') { pos += 1; b = in.read() }
    if (b == '\n') pos += 1
  }

  override def next(): Boolean = {
    while (true) {
      if (pos >= split.end) return false // next line starts in a later split
      val line = readLine()
      if (line == null) return false
      NTriples.parseLine(line, strict = false) match {
        case Some(t) =>
          // copy first: the serializer reuses its output buffer per call
          val full = serializer(t).copy()
          current = if (fieldIdx.length == fullSchema.length) full
          else {
            val vals = fieldIdx.map(i => full.get(i, fullSchema(i).dataType))
            new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
              vals.asInstanceOf[Array[Any]])
          }
          return true
        case None => () // blank/comment/malformed: skip
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}

// ----------------------------------------------------------------- write

/** DSv2 write path: `df.write.format("ntriples").save(dir)` — one
 * canonical .nt file per partition, two-phase commit (tasks write to
 * `_temporary/<uuid>.nt`, the driver renames into place on job commit and
 * deletes strays on abort — the FileOutputCommitter shape without the
 * Hadoop committer machinery). Input must carry the Triple schema
 * (s/p/o Term structs). */
class NTriplesWriteBuilder(path: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  require(schema.fieldNames.sameElements(NTriplesTable.Schema.fieldNames),
    s"ntriples sink needs (s, p, o) Term structs, got: ${schema.fieldNames.mkString(",")}")
  private var doTruncate = false
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    doTruncate = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.Write {
      override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
        new NTriplesBatchWrite(path, doTruncate)
    }
}

case class NTriplesCommitMsg(tempFile: String)
  extends org.apache.spark.sql.connector.write.WriterCommitMessage

class NTriplesBatchWrite(path: String, truncate: Boolean)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write.{DataWriterFactory, PhysicalWriteInfo, WriterCommitMessage}

  // job-unique tag: part files of concurrent/successive append jobs never
  // collide, and each job owns its own temp dir (a concurrent job's commit
  // must not sweep this job's uncommitted task files)
  private val jobTag = java.util.UUID.randomUUID().toString.take(8)
  private val hadoopProps = NTriplesTable.hadoopProps()

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new NTriplesWriterFactory(path, jobTag, hadoopProps)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(NTriplesTable.confOf(hadoopProps))
    if (truncate && fs.exists(dir))
      fs.listStatus(dir).filter(s => s.isFile && s.getPath.getName.endsWith(".nt"))
        .foreach(s => fs.delete(s.getPath, false))
    fs.mkdirs(dir)
    messages.zipWithIndex.foreach { case (m, i) =>
      val tmp = new Path(m.asInstanceOf[NTriplesCommitMsg].tempFile)
      val dest = new Path(dir, f"part-$i%05d-$jobTag.nt")
      // Hadoop rename reports failure via its return value, not exceptions
      if (!fs.rename(tmp, dest))
        throw new java.io.IOException(
          s"ntriples commit: rename $tmp -> $dest failed")
    }
    fs.delete(new Path(dir, s"_temporary-$jobTag"), true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(NTriplesTable.confOf(hadoopProps))
    fs.delete(new Path(path, s"_temporary-$jobTag"), true)
  }
}

class NTriplesWriterFactory(path: String, jobTag: String,
    hadoopProps: Array[(String, String)])
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new NTriplesDataWriter(path, jobTag, hadoopProps, partitionId, taskId)
}

class NTriplesDataWriter(path: String, jobTag: String,
    hadoopProps: Array[(String, String)], partitionId: Int, taskId: Long)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  private val tmp = new Path(path,
    s"_temporary-$jobTag/part-$partitionId-$taskId-${java.util.UUID.randomUUID()}.nt")
  private val fs = tmp.getFileSystem(NTriplesTable.confOf(hadoopProps))
  private val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
    fs.create(tmp, true), java.nio.charset.StandardCharsets.UTF_8))

  private def term(row: InternalRow, i: Int): graft.model.Term = {
    val t = row.getStruct(i, 4)
    graft.model.Term(t.getByte(0), t.getUTF8String(1).toString,
      t.getUTF8String(2).toString, t.getUTF8String(3).toString)
  }

  override def write(row: InternalRow): Unit = {
    out.write(Triple(term(row, 0), term(row, 1), term(row, 2)).toNTriples)
    out.write('\n')
  }

  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    out.close()
    NTriplesCommitMsg(tmp.toString)
  }

  override def abort(): Unit = {
    out.close()
    fs.delete(tmp, false)
  }

  override def close(): Unit = ()
}
