package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Term, Triple}
import graft.streaming.StreamIngest

/** Structured-Streaming ingest + RDF-Patch change stream (SURVEY.md §2.11):
 * AvailableNow drains deterministically; checkpoint dir gives resume. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val EX = "http://example/"
  private def line(k: Int) = s"<${EX}s$k> <${EX}p> " + "\"" + k + "\" ."

  test("streaming postings maintenance: appended docs become searchable") {
    import spark.implicits._
    import graft.text.TextIndex
    val idx = Files.createTempDirectory("st_textidx").toString + "/idx"
    val in = Files.createTempDirectory("st_textidx_in").toString
    val ckpt = Files.createTempDirectory("st_textidx_ck").toString
    // initial committed layout over one document
    val g0 = spark.createDataset(Seq(
      Triple(Term.iri(EX + "d1"), Term.iri(EX + "title"),
        Term.string("The quick brown fox")))).toDF()
    TextIndex.materializePostings(g0, idx, buckets = 8, partitions = 1)
    def hits(q: String): Set[String] =
      TextIndex.searchIndexed(spark, idx, q, None)
        .collect().map(_.getStruct(0).getString(1)).toSet
    assert(hits("brown") == Set(EX + "d1"))
    // stream a second document in as N-Triples micro-batches
    Files.writeString(java.nio.file.Paths.get(in, "a.nt"),
      s"""<${EX}d2> <${EX}title> "A lazy brown dog" .""" + "\n")
    val q = TextIndex.maintainPostingsStream(
        StreamIngest.readNTriplesStream(spark, in).toDF(), idx, ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(hits("brown") == Set(EX + "d1", EX + "d2"))
    assert(hits("quick") == Set(EX + "d1"))
    // a replayed batch (checkpoint re-delivery) duplicates rows but not
    // results — scoring counts distinct slots, candidates are distinct
    val g2 = spark.createDataset(Seq(
      Triple(Term.iri(EX + "d2"), Term.iri(EX + "title"),
        Term.string("A lazy brown dog")))).toDF()
    TextIndex.appendPostingsBatch(g2, idx)
    assert(hits("brown") == Set(EX + "d1", EX + "d2"))
    val scores = TextIndex.searchIndexed(spark, idx, "lazy brown", None)
      .collect().map(r => (r.getStruct(0).getString(1), r.getLong(2))).toMap
    assert(scores(EX + "d2") == 2L) // duplication did not inflate the score
  }

  test("streaming N-Triples ingest: files appear -> triples land; resume skips done work") {
    val in = Files.createTempDirectory("st_in").toString
    val out = Files.createTempDirectory("st_out").toString
    val ckpt = Files.createTempDirectory("st_ckpt").toString

    Files.writeString(java.nio.file.Paths.get(in, "a.nt"),
      (1 to 50).map(line).mkString("\n") + "\n# comment\n")
    val q1 = StreamIngest.appendToTable(
      StreamIngest.readNTriplesStream(spark, in), out, ckpt)
    q1.awaitTermination()
    assert(spark.read.parquet(out).count() == 50)

    // new file arrives; restart from the same checkpoint → only the delta
    Files.writeString(java.nio.file.Paths.get(in, "b.nt"),
      (51 to 70).map(line).mkString("\n"))
    val q2 = StreamIngest.appendToTable(
      StreamIngest.readNTriplesStream(spark, in), out, ckpt)
    q2.awaitTermination()
    assert(spark.read.parquet(out).count() == 70)

    // third restart with NO new data: nothing is re-ingested (resume)
    val q3 = StreamIngest.appendToTable(
      StreamIngest.readNTriplesStream(spark, in), out, ckpt)
    q3.awaitTermination()
    assert(spark.read.parquet(out).count() == 70)
  }

  test("windowed predicate rates with watermark (streaming OpGroup)") {
    import org.apache.spark.sql.functions._
    val in = Files.createTempDirectory("st_win").toString
    // 30 triples, event time embedded in the object: 3 tumbling 10s windows
    val lines = (0 until 30).map { i =>
      f"<http://e/s$i> <http://e/p${i % 2}> " +
        f""""2026-01-01T00:00:$i%02d" ."""
    }
    Files.writeString(java.nio.file.Paths.get(in, "w.nt"), lines.mkString("\n"))
    val st = StreamIngest.readNTriplesStream(spark, in).toDF()
      .withColumn("ts", to_timestamp(col("o.lex")))
    val agg = StreamIngest.predicateRates(st, "ts", "10 seconds", "30 seconds")
    val q = agg.writeStream.format("memory").queryName("predrates")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.sql("SELECT predicate, n FROM predrates").collect()
    // 3 windows × 2 predicates, 5 triples each
    assert(rows.length == 6)
    assert(rows.forall(_.getLong(1) == 5L))
    assert(rows.map(_.getString(0)).toSet == Set("http://e/p0", "http://e/p1"))
  }

  test("RDF-Patch stream: adds/deletes fold into successive snapshots") {
    import spark.implicits._
    val snaps = Files.createTempDirectory("st_snaps").toString

    def patch(op: String, k: Int) =
      (op, Term.iri(s"${EX}s$k"), Term.iri(EX + "p"), Term.string(k.toString))
    // batch 0: add 1..10; apply directly (same code path foreachBatch runs)
    val b0 = Seq.tabulate(10)(i => patch("A", i + 1))
      .toDF("op", "s", "p", "o")
    StreamIngest.applyPatchBatch(b0, snaps, 0)
    // batch 1: delete 1..3, add 11
    val b1 = ((1 to 3).map(patch("D", _)) :+ patch("A", 11)).toDF("op", "s", "p", "o")
    StreamIngest.applyPatchBatch(b1, snaps, 1)

    val s1 = spark.read.parquet(s"$snaps/s1/spo")
    val lexes = s1.collect().map(_.getAs[Row]("s").getString(1)).toSet
    assert(s1.count() == 8)
    assert(!lexes.contains(s"${EX}s2") && lexes.contains(s"${EX}s11"))

    // idempotent replay (checkpoint recovery re-delivers a batch)
    StreamIngest.applyPatchBatch(b1, snaps, 1)
    assert(spark.read.parquet(s"$snaps/s1/spo").count() == 8)
  }

  test("RDF-Patch fold honors in-batch op order when rows carry seq") {
    import spark.implicits._
    val snaps = Files.createTempDirectory("st_snaps_seq").toString
    def row(seq: Long, op: String, k: Int) =
      (seq, op, Term.iri(s"${EX}q$k"), Term.iri(EX + "p"), Term.string(k.toString))
    // q1: A then D (must end ABSENT — RDFPatchOps.applyChanges is
    // sequential); q2: D then A (must end PRESENT); q3: plain add
    val b = Seq(row(0, "A", 1), row(1, "D", 1),
      row(2, "D", 2), row(3, "A", 2), row(4, "A", 3))
      .toDF("seq", "op", "s", "p", "o")
    StreamIngest.applyPatchBatch(b, snaps, 0)
    val lexes = spark.read.parquet(s"$snaps/s0/spo")
      .collect().map(_.getAs[Row]("s").getString(1)).toSet
    assert(lexes == Set(s"${EX}q2", s"${EX}q3"), lexes)
  }

  test("streaming exact dedup: keyed state survives restarts (flatMapGroupsWithState)") {
    import org.apache.spark.sql.functions._
    val in = Files.createTempDirectory("st_dedup_in").toString
    val ckpt = Files.createTempDirectory("st_dedup_ck").toString
    val out = Files.createTempDirectory("st_dedup_out").toString
    def docStream = spark.readStream.format("text")
      .load(in).select(
        // try_cast: ANSI cast would throw on a junk id before the
        // operator's own poisoned-row guard can skip the row
        expr("try_cast(split(value, '\\\\|')[0] as long)").as("doc_id"),
        split(col("value"), "\\|").getItem(1).as("text"))
    def drain(): Unit = {
      val q = StreamIngest.dedupStream(docStream).toDF("doc_id", "h")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // batch 1: ids 0..9 over five distinct contents → five firsts
    Files.writeString(java.nio.file.Paths.get(in, "a.txt"),
      (0 until 10).map(i => s"$i|content ${i % 5}").mkString("\n"))
    drain()
    val first = spark.read.parquet(out).collect()
    assert(first.length == 5)
    // the representative is the SMALLEST id of each content group
    assert(first.map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    // batch 2 AFTER A RESTART: four known contents + one new → one emit
    Files.writeString(java.nio.file.Paths.get(in, "b.txt"),
      (10 until 15).map(i => s"$i|content ${i % 5 + 1}").mkString("\n"))
    drain()
    val all = spark.read.parquet(out).collect()
    assert(all.length == 6, s"state must survive the restart: ${all.length} rows")
    assert(all.map(_.getLong(0)).contains(14L)) // "content 5" is the only new one
    // batch 3: poisoned rows — a non-numeric id (casts to null) and a
    // line with no '|' (null text) must be SKIPPED, not kill the query
    Files.writeString(java.nio.file.Paths.get(in, "c.txt"),
      "abc|content 1\nno-separator-here\n20|content 9")
    drain()
    val after = spark.read.parquet(out).collect()
    assert(after.length == 7, s"poisoned rows must be skipped: ${after.length}")
    assert(after.map(_.getLong(0)).contains(20L))
  }

  test("simhash60 (row-local Scala) == d5's SQL simhash, doc for doc") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val fromSql = graft.queries.OpsQueries.d5_simhash(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val texts = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty)
    texts.foreach { case (id, t) =>
      assert(graft.ops.MinHash.simhash60(t) == fromSql(id), s"doc $id") }
  }

  test("streaming near-dup: banded SimHash state finds pairs across restarts") {
    import org.apache.spark.sql.functions._
    val in = Files.createTempDirectory("st_nd_in").toString
    val ckpt = Files.createTempDirectory("st_nd_ck").toString
    val out = Files.createTempDirectory("st_nd_out").toString
    def docStream = spark.readStream.format("text")
      .load(in).select(
        // try_cast: ANSI cast would throw on a junk id before the
        // operator's own poisoned-row guard can skip the row
        expr("try_cast(split(value, '\\\\|')[0] as long)").as("doc_id"),
        split(col("value"), "\\|").getItem(1).as("text"))
    def drain(): Unit = {
      val q = StreamIngest.nearDupStream(docStream).toDF("a_id", "b_id", "hamming")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val texts = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).where(col("doc_id") < 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // batch 1: ten distinct base docs
    Files.writeString(java.nio.file.Paths.get(in, "a.txt"),
      texts.toSeq.sortBy(_._1).map { case (id, t) => s"$id|$t" }.mkString("\n"))
    drain()
    val base = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    // batch 2 AFTER A RESTART: near-identical copies (first token dropped,
    // ids +1000) must pair with their batch-1 originals out of state
    Files.writeString(java.nio.file.Paths.get(in, "b.txt"),
      texts.toSeq.sortBy(_._1).map { case (id, t) =>
        s"${id + 1000}|${t.substring(t.indexOf(' ') + 1)}" }.mkString("\n"))
    drain()
    val pairs = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val planted = (0L until 10L).map(i => (i, i + 1000L))
    val found = planted.count(pairs.contains)
    info(s"cross-restart planted recall: $found/10 (plus ${base.length} base-batch pairs)")
    assert(found >= 9, s"found only $found of 10 planted cross-batch pairs")
  }

  test("streaming per-document SHACL validation (broadcast shapes)") {
    import org.apache.spark.sql.functions._
    import graft.shacl.SH
    val in = Files.createTempDirectory("st_shacl_in").toString
    val ckpt = Files.createTempDirectory("st_shacl_ck").toString
    val out = Files.createTempDirectory("st_shacl_out").toString
    // shapes: every <name> value must be a literal of length >= 3
    val shape = Term.iri(EX + "S")
    val ps = Term.iri(EX + "S-p")
    val shapes = Seq(
      Triple(shape, SH.rdfType, SH.sh("NodeShape")),
      Triple(shape, SH.sh("targetSubjectsOf"), Term.iri(EX + "name")),
      Triple(shape, SH.sh("property"), ps),
      Triple(ps, SH.sh("path"), Term.iri(EX + "name")),
      Triple(ps, SH.sh("minLength"), Term.lit("3", Term.XSD + "integer")))
    // one document per line: triples separated by "~" (reassembled below)
    def doc(id: Int, names: String*) =
      s"$id|" + names.zipWithIndex.map { case (n, k) =>
        s"""<${EX}e$k> <${EX}name> "$n" .""" }.mkString("~")
    Files.writeString(java.nio.file.Paths.get(in, "a.txt"),
      Seq(doc(1, "Alice", "Bob"), doc(2, "Al"), doc(3, "Eve", "Jo")).mkString("\n"))
    val docs = spark.readStream.format("text").load(in).select(
      split(col("value"), "\\|").getItem(0).cast("long").as("doc_id"),
      translate(split(col("value"), "\\|").getItem(1), "~", "\n").as("text"))
    val q = StreamIngest.validateStream(docs, shapes)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.read.parquet(out).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2))).toMap
    assert(rows(1L) == (true, 0L))
    assert(rows(2L) == (false, 1L)) // "Al" is too short
    assert(rows(3L) == (false, 1L)) // "Eve" passes, "Jo" is too short
  }
}
