package graft.sources

import java.util.{Map => JMap}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.{AgnosticEncoder, ExpressionEncoder}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.Encoders

import graft.model.{Quad, Term, Triple}
import graft.riot.{NQuads, NTriples}

/**
 * DataSource V2 faces for the line-oriented RDF formats:
 * `spark.read/write.format("ntriples" | "nquads")` — the idiomatic
 * Spark-native source API over the same line parsers `riot.NTriples` /
 * `riot.NQuads` expose through `textFile + mapPartitions` (reference:
 * riot's RDFParser/Lang registry, jena-arq riot/RDFLanguages.java).
 * What V2 adds over the mapPartitions faces:
 *
 *  - **split planning is explicit**: every file is cut into byte ranges of
 *    `spark.sql.files.maxPartitionBytes` at PLAN time, so one huge file
 *    parallelizes across the cluster (a line belongs to the split holding
 *    its first byte — the Hadoop line-split contract, seek to start-1);
 *  - **top-level column pruning** reaches the source (`SELECT s` emits only
 *    the subject struct; the parse still sees the line — pruning saves row
 *    width, not IO, which is all a text format can offer);
 *  - **two-phase write commit**: tasks write to a job-unique _temporary
 *    dir, the driver renames into place on commit (rename failures throw)
 *    and aborts sweep only their own job's temp files;
 *  - short names register through DataSourceRegister (META-INF/services),
 *    and the session's Hadoop conf (spark.hadoop.*, fs.* credentials)
 *    rides to executors as a serialized property list.
 *
 * Malformed lines are skipped (strict=false), matching the streaming
 * ingest path; comment/blank lines yield nothing.
 */
sealed trait RdfLineFormat extends Serializable {
  def name: String
  def schema: StructType
  /** Parse one line to an InternalRow of `schema`, or None to skip.
   * `cache` is the per-partition node cache (§2.1) — hot IRIs repeat
   * millions of times per file; the reader allocates one per split. */
  def parseToRow(line: String, cache: NTriples.NodeCache = null): Option[InternalRow]
  /** Canonical line for one InternalRow of `schema`. */
  def rowToLine(row: InternalRow): String

  protected def term(row: InternalRow, i: Int): Term = {
    val t = row.getStruct(i, 4)
    Term(t.getByte(0), t.getUTF8String(1).toString,
      t.getUTF8String(2).toString, t.getUTF8String(3).toString)
  }
}

case object TripleLineFormat extends RdfLineFormat {
  override def name: String = "ntriples"
  // ExpressionEncoder serializers reuse an internal row buffer and are NOT
  // thread-safe — concurrent reader tasks in one executor JVM must each
  // get their own instance (a shared one corrupts rows between the
  // serialize and the copy)
  @transient private lazy val serializer =
    ThreadLocal.withInitial[Triple => InternalRow](() =>
      ExpressionEncoder(Encoders.product[Triple]
        .asInstanceOf[AgnosticEncoder[Triple]]).createSerializer()(_))
  override val schema: StructType = Encoders.product[Triple].schema
  override def parseToRow(line: String,
      cache: NTriples.NodeCache): Option[InternalRow] =
    NTriples.parseLine(line, strict = false, cache).map(serializer.get()(_).copy())
  override def rowToLine(row: InternalRow): String =
    Triple(term(row, 0), term(row, 1), term(row, 2)).toNTriples
}

case object QuadLineFormat extends RdfLineFormat {
  override def name: String = "nquads"
  // see TripleLineFormat: per-thread serializer instances
  @transient private lazy val serializer =
    ThreadLocal.withInitial[Quad => InternalRow](() =>
      ExpressionEncoder(Encoders.product[Quad]
        .asInstanceOf[AgnosticEncoder[Quad]]).createSerializer()(_))
  override val schema: StructType = Encoders.product[Quad].schema
  override def parseToRow(line: String,
      cache: NTriples.NodeCache): Option[InternalRow] =
    NQuads.parseLine(line, strict = false, cache).map(serializer.get()(_).copy())
  override def rowToLine(row: InternalRow): String =
    Quad(term(row, 0), term(row, 1), term(row, 2), term(row, 3)).toNQuads
}

class NTriplesDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "ntriples"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TripleLineFormat.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new RdfLineTable(RdfLineTable.paths(properties), TripleLineFormat)
}

class NQuadsDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "nquads"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    QuadLineFormat.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new RdfLineTable(RdfLineTable.paths(properties), QuadLineFormat)
}

object RdfLineTable {
  def paths(properties: JMap[String, String]): Seq[String] =
    Option(properties.get("paths"))
      .map(p => org.json4s.jackson.JsonMethods.parse(p)
        .values.asInstanceOf[List[String]])
      .getOrElse(Option(properties.get("path")).toList)

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

class RdfLineTable(paths: Seq[String], fmt: RdfLineFormat)
    extends Table with SupportsRead with SupportsWrite {
  require(paths.nonEmpty,
    s"${fmt.name}: no path specified — use .load(path), .save(path) or " +
      """option("paths", "[...]")""")
  override def name(): String = s"${fmt.name}(${paths.mkString(",")})"
  override def schema(): StructType = fmt.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RdfLineScanBuilder(paths, fmt)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(paths.length == 1, s"${fmt.name} write needs exactly one target path")
    new RdfLineWriteBuilder(paths.head, info.schema(), fmt)
  }
}

class RdfLineScanBuilder(paths: Seq[String], fmt: RdfLineFormat)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fmt.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    // top-level (s/p/o/g) pruning only: Catalyst may hand a NESTED pruned
    // schema (s: struct<lex>) — re-expand each kept field to the full
    // Term struct and let Spark project the subfields above the scan.
    // An empty prune (count(*)) keeps zero fields: the reader emits
    // empty rows. readSchema() always matches what the reader emits.
    required = StructType(requiredSchema.fields.map(f =>
      fmt.schema(fmt.schema.fieldIndex(f.name))))

  override def build(): Scan = new RdfLineScan(paths, required, fmt)
}

case class RdfLineSplit(path: String, start: Long, end: Long)
  extends InputPartition

class RdfLineScan(paths: Seq[String], required: StructType, fmt: RdfLineFormat)
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
      require(roots.nonEmpty, s"${fmt.name}: no files match $p")
      val files = roots.flatMap { st =>
        if (st.isDirectory)
          fs.listStatus(st.getPath).filter(f =>
            f.isFile && RdfLineTable.isDataFile(f.getPath.getName))
        else Array(st)
      }
      files.flatMap { st =>
        val f = st.getPath
        // the reader byte-splits and parses RAW bytes: a compressed file
        // would silently parse to zero rows — reject loudly (the
        // text-source + riot-parser path decompresses if needed)
        val lower = f.getName.toLowerCase
        val codec = Seq(".gz", ".bz2", ".zst", ".snappy", ".deflate",
          ".lz4", ".xz").find(lower.endsWith)
        require(codec.isEmpty,
          s"${fmt.name}: compressed file $f (${codec.get}) is not " +
            "supported by the byte-splitting reader — decompress, or use " +
            "spark.read.text + riot parseLine (which decompresses)")
        val len = st.getLen
        if (len == 0) Seq(RdfLineSplit(f.toString, 0L, 0L))
        else (0L until len by maxSplit).map(off =>
          RdfLineSplit(f.toString, off, math.min(off + maxSplit, len)))
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // broadcast the Hadoop conf once per scan instead of serializing the
    // full property list into every task (Spark's own sources do the
    // same via SerializableConfiguration)
    new RdfLineReaderFactory(required, SparkSession.active.sparkContext
      .broadcast(RdfLineTable.hadoopProps()), fmt)
}

class RdfLineReaderFactory(required: StructType,
    hadoopProps: org.apache.spark.broadcast.Broadcast[Array[(String, String)]],
    fmt: RdfLineFormat)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new RdfLinePartitionReader(partition.asInstanceOf[RdfLineSplit],
      required, hadoopProps.value, fmt)
}

/** Reads [start, end) of one file: skips the partial first line unless at
 * offset 0, and reads the line that BEGINS before `end` to completion —
 * every line is owned by exactly one split. */
class RdfLinePartitionReader(split: RdfLineSplit, required: StructType,
    hadoopProps: Array[(String, String)], fmt: RdfLineFormat)
    extends PartitionReader[InternalRow] {

  // seek to start-1 (not start): if the previous line ends exactly at the
  // boundary, the skip consumes only its '\n' and a line beginning exactly
  // at `start` is kept — Hadoop LineRecordReader's contract
  private val seekTo = if (split.start == 0) 0L else split.start - 1
  private val in = {
    val path = new Path(split.path)
    val fs = path.getFileSystem(RdfLineTable.confOf(hadoopProps))
    val stream = fs.open(path)
    stream.seek(seekTo)
    // buffer above the seeked stream: byte-wise read() below would
    // otherwise pay a synchronized virtual call into the FS stack per byte
    new java.io.BufferedInputStream(stream, 64 * 1024)
  }
  // position of the NEXT unread byte, tracked manually (readLine below)
  private var pos: Long = seekTo
  // per-split node cache: hot IRIs repeat millions of times per file
  private val cache = new NTriples.NodeCache()
  private val fullSchema = fmt.schema
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
      fmt.parseToRow(line, cache) match {
        case Some(full) =>
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

/** DSv2 write path: `df.write.format("ntriples"|"nquads").save(dir)` —
 * one canonical file per partition, two-phase commit (tasks write to
 * `_temporary-<job>/<uuid>`, the driver renames into place on job commit
 * and deletes strays on abort — the FileOutputCommitter shape without the
 * Hadoop committer machinery). Input must carry the format's schema. */
class RdfLineWriteBuilder(path: String, schema: StructType, fmt: RdfLineFormat)
    extends WriteBuilder with SupportsTruncate {
  require(schema.fieldNames.sameElements(fmt.schema.fieldNames),
    s"${fmt.name} sink needs ${fmt.schema.fieldNames.mkString("(", ", ", ")")} " +
      s"Term structs, got: ${schema.fieldNames.mkString(",")}")
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new RdfLineBatchWrite(path, doTruncate, fmt)
  }
}

case class RdfLineCommitMsg(tempFile: String) extends WriterCommitMessage

class RdfLineBatchWrite(path: String, truncate: Boolean, fmt: RdfLineFormat)
    extends BatchWrite {

  // job-unique tag: part files of concurrent/successive append jobs never
  // collide, and each job owns its own temp dir (a concurrent job's commit
  // must not sweep this job's uncommitted task files)
  private val jobTag = java.util.UUID.randomUUID().toString.take(8)
  private val hadoopProps = RdfLineTable.hadoopProps()
  private val ext = if (fmt.name == "nquads") "nq" else "nt"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    // conf broadcast once per job, not serialized into every task
    new RdfLineWriterFactory(path, jobTag, ext,
      SparkSession.active.sparkContext.broadcast(hadoopProps), fmt)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(RdfLineTable.confOf(hadoopProps))
    fs.mkdirs(dir)
    // rename the NEW files in first, THEN delete the old ones (truncate):
    // a rename failure mid-commit must leave the old data intact — the
    // reverse order could lose both generations. Job-tagged names cannot
    // collide with prior jobs' files.
    val renamed = messages.zipWithIndex.map { case (m, i) =>
      val tmp = new Path(m.asInstanceOf[RdfLineCommitMsg].tempFile)
      val dest = new Path(dir, f"part-$i%05d-$jobTag.$ext")
      // Hadoop rename reports failure via its return value, not exceptions
      if (!fs.rename(tmp, dest))
        throw new java.io.IOException(
          s"${fmt.name} commit: rename $tmp -> $dest failed")
      dest.getName
    }.toSet
    if (truncate)
      fs.listStatus(dir).filter(s => s.isFile &&
          (s.getPath.getName.endsWith(".nt") || s.getPath.getName.endsWith(".nq")) &&
          !renamed.contains(s.getPath.getName))
        .foreach(s => fs.delete(s.getPath, false))
    fs.delete(new Path(dir, s"_temporary-$jobTag"), true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(RdfLineTable.confOf(hadoopProps))
    fs.delete(new Path(path, s"_temporary-$jobTag"), true)
  }
}

class RdfLineWriterFactory(path: String, jobTag: String, ext: String,
    hadoopProps: org.apache.spark.broadcast.Broadcast[Array[(String, String)]],
    fmt: RdfLineFormat)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new RdfLineDataWriter(path, jobTag, ext, hadoopProps.value, fmt,
      partitionId, taskId)
}

class RdfLineDataWriter(path: String, jobTag: String, ext: String,
    hadoopProps: Array[(String, String)], fmt: RdfLineFormat,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {
  private val tmp = new Path(path,
    s"_temporary-$jobTag/part-$partitionId-$taskId-${java.util.UUID.randomUUID()}.$ext")
  private val fs = tmp.getFileSystem(RdfLineTable.confOf(hadoopProps))
  private val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
    fs.create(tmp, true), java.nio.charset.StandardCharsets.UTF_8))

  override def write(row: InternalRow): Unit = {
    out.write(fmt.rowToLine(row))
    out.write('\n')
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    RdfLineCommitMsg(tmp.toString)
  }

  override def abort(): Unit = {
    out.close()
    fs.delete(tmp, false)
  }

  override def close(): Unit = ()
}
