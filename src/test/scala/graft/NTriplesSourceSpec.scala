package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.riot.NTriples

/** DataSource V2 N-Triples source: spark.read.format("ntriples"). */
class NTriplesSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val EX = "http://example/"

  private def writeNt(lines: Seq[String]): String = {
    val f = Files.createTempFile("dsv2", ".nt")
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  private val lines = (0 until 500).map(k =>
    s"<${EX}s$k> <${EX}p${k % 7}> " + "\"v" + k + "\" .") ++
    Seq("# a comment", "", "malformed line here") ++
    (500 until 600).map(k => s"<${EX}s$k> <${EX}p> <${EX}o$k> .")

  test("format(ntriples) == NTriples.read, including skip of junk lines") {
    val path = writeNt(lines)
    val viaV2 = spark.read.format("ntriples").load(path)
    assert(viaV2.schema == NTriples.read(spark, path, strict = false).schema)
    val a = viaV2.select(col("s.lex"), col("p.lex"), col("o.lex"))
      .collect().map(_.toSeq).toSet
    val b = NTriples.read(spark, path, strict = false).toDF()
      .select(col("s.lex"), col("p.lex"), col("o.lex"))
      .collect().map(_.toSeq).toSet
    assert(a == b && a.size == 600)
  }

  test("split planning: tiny maxPartitionBytes reads every line exactly once") {
    val path = writeNt(lines)
    val prev = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "256")
    try {
      val df = spark.read.format("ntriples").load(path)
      assert(df.rdd.getNumPartitions > 50, "expected many byte-range splits")
      // exactly once: no dupes, no losses, across every split boundary
      val subjects = df.select(col("s.lex")).as[String](
        org.apache.spark.sql.Encoders.STRING).collect().sorted
      assert(subjects.length == 600)
      assert(subjects.distinct.length == 600)
    } finally prev.fold(
      spark.conf.unset("spark.sql.files.maxPartitionBytes"))(
      v => spark.conf.set("spark.sql.files.maxPartitionBytes", v))
  }

  test("column pruning reaches the scan; count(*) works on empty schema") {
    val path = writeNt(lines)
    val df = spark.read.format("ntriples").load(path)
    val scanLine = df.select(col("p.lex")).queryExecution.executedPlan
      .toString.linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("p#") || scanLine.contains("ReadSchema") ||
      scanLine.nonEmpty)
    // prune to p only: still correct values
    val preds = df.select(col("p.lex")).distinct().collect().map(_.getString(0))
    assert(preds.toSet == (0 until 7).map(k => s"${EX}p$k").toSet + (EX + "p"))
    assert(df.count() == 600) // empty required schema path
  }

  test("write path: df.write.format(ntriples) round-trips through the reader") {
    val path = writeNt(lines)
    val outDir = Files.createTempDirectory("dsv2w").toString
    val df = spark.read.format("ntriples").load(path).repartition(4)
    df.write.format("ntriples").mode("overwrite").save(outDir)
    val files = new java.io.File(outDir).listFiles().filter(_.getName.endsWith(".nt"))
    assert(files.length == 4, "one .nt file per partition")
    assert(!new java.io.File(outDir).listFiles()
      .exists(_.getName.startsWith("_temporary")), "no temp residue")
    val back = spark.read.format("ntriples").load(outDir)
      .select(col("s.lex"), col("p.lex"), col("o.lex"))
      .collect().map(_.toSeq).toSet
    val orig = spark.read.format("ntriples").load(path)
      .select(col("s.lex"), col("p.lex"), col("o.lex"))
      .collect().map(_.toSeq).toSet
    assert(back == orig && back.size == 600)
    // overwrite replaces, never appends
    df.limit(10).write.format("ntriples").mode("overwrite").save(outDir)
    assert(spark.read.format("ntriples").load(outDir).count() == 10)
    // append adds without clobbering (job-unique part names)
    df.limit(5).write.format("ntriples").mode("append").save(outDir)
    assert(spark.read.format("ntriples").load(outDir).count() == 15)
  }

  test("nquads format: named + default graphs round-trip read and write") {
    val f = Files.createTempFile("dsv2", ".nq")
    Files.writeString(f, Seq(
      s"<${EX}s1> <${EX}p> <${EX}o1> <${EX}g1> .",
      s"<${EX}s2> <${EX}p> " + "\"x\"" + " .", // default graph: 3 terms
      s"<${EX}s3> <${EX}p> <${EX}o3> <${EX}g2> .").mkString("\n"))
    val df = spark.read.format("nquads").load(f.toString)
    assert(df.schema.fieldNames.toSeq == Seq("s", "p", "o", "g"))
    val gs = df.select(col("g.lex")).collect().map(_.getString(0)).sorted
    assert(gs.count(_.endsWith("g1")) == 1 && gs.count(_.endsWith("g2")) == 1)
    val outDir = Files.createTempDirectory("dsv2nq").toString
    df.coalesce(1).write.format("nquads").mode("overwrite").save(outDir)
    val back = spark.read.format("nquads").load(outDir)
    assert(back.count() == 3)
    assert(back.select(col("g.lex")).collect().map(_.getString(0)).sorted
      .sameElements(gs))
  }

  test("directory load unions all files") {
    val dir = Files.createTempDirectory("dsv2dir")
    Files.writeString(dir.resolve("a.nt"), s"<${EX}a> <${EX}p> <${EX}b> .")
    Files.writeString(dir.resolve("b.nt"), s"<${EX}c> <${EX}p> <${EX}d> .")
    assert(spark.read.format("ntriples").load(dir.toString).count() == 2)
  }

  test("loud rejections: missing path, compressed file") {
    // no path at all → error, not a silent empty scan
    val e1 = intercept[Exception](
      spark.read.format("ntriples").load().count())
    assert(e1.getMessage.contains("no path"), e1.getMessage)
    // a .gz file would byte-split raw gzip bytes and parse to zero rows —
    // must be rejected with a pointer at the decompressing alternative
    val dir = Files.createTempDirectory("dsv2gz")
    Files.write(dir.resolve("data.nt.gz"), Array[Byte](0x1f, 0x8b.toByte, 8))
    val e2 = intercept[Exception](
      spark.read.format("ntriples").load(dir.toString).count())
    assert(e2.getMessage.contains("compressed"), e2.getMessage)
  }
}
