package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.model.Triple
import graft.ops.Graphs
import graft.riot.NTriples
import graft.store.TripleStore

/**
 * Incremental / streaming ingest (SURVEY.md §2.11). The reference's
 * incremental surfaces map onto Structured Streaming:
 *
 *  - push-parse `StreamRDF` callbacks (riot/system/StreamRDF.java:33–53)
 *    → a streaming text source parsed per micro-batch in `mapPartitions`;
 *  - `AsyncParser`'s producer/consumer chunking (AsyncParser.java:52–346)
 *    → the engine's own micro-batch boundaries;
 *  - the RDF-Patch change log (jena-rdfpatch/.../RDFChanges.java: A/D
 *    quad ops with transaction markers) → an append-only (op, s, p, o)
 *    stream folded into successive immutable snapshots.
 *
 * Resumability (north rule): `checkpointLocation` makes every query
 * restartable from its last committed offset — the streaming twin of the
 * batch pipeline's stage manifests. `Trigger.AvailableNow` drains what
 * exists and stops, which is how the tests drive it deterministically.
 */
object StreamIngest {

  /** Streaming N-Triples source: every line that appears under `path`
   * becomes a triple. Line-oriented ⇒ clean micro-batch splits. */
  def readNTriplesStream(spark: SparkSession, path: String): Dataset[Triple] = {
    import spark.implicits._
    spark.readStream
      .format("text")
      .load(path)
      .as[String]
      .mapPartitions { it =>
        // per-partition node cache (§2.1): hot IRIs repeat millions of
        // times per feed — same discipline as the batch NTriples.read
        val cache = new NTriples.NodeCache()
        it.flatMap(NTriples.parseLine(_, strict = false, cache))
      }
  }

  /** Watermarked tumbling-window aggregation over a timestamped triple
   * stream: triples/predicate per event-time window (the Structured
   * Streaming windowed-agg face of §2.11 — the streaming sibling of
   * OpGroup). The watermark bounds state: windows older than it finalize
   * and late rows beyond it are dropped by the engine, so state size is
   * O(open windows), not O(stream). Input needs an event-time column
   * `tsCol` plus the p term column. */
  def predicateRates(triples: DataFrame, tsCol: String = "ts",
                     windowLen: String = "10 seconds",
                     watermark: String = "30 seconds"): DataFrame =
    triples
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen),
        col("p.lex").as("predicate"))
      .agg(count(lit(1)).as("n"))

  /** Continuous dedup-append sink: each micro-batch is deduplicated
   * against nothing but itself (a per-batch foreachBatch dedup — a
   * streaming `dropDuplicates` would be CROSS-batch keyed state, i.e.
   * O(all distinct triples) of unbounded memory+checkpoint) and appended
   * as parquet; downstream snapshot compaction applies graph set
   * semantics, which also absorbs the at-least-once replay a failed
   * foreachBatch commit can produce. Returns the running query (caller
   * stops it or lets AvailableNow drain). */
  def appendToTable(triples: Dataset[Triple], outDir: String,
                    checkpointDir: String): StreamingQuery =
    triples.toDF()
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.dropDuplicates("s", "p", "o")
          .write.mode("append").parquet(outDir)
      }
      .start()

  /** Cross-micro-batch STREAMING exact dedup — the training-pipeline
   * dedup operator (batch twin: OpsQueries.d1) at stream time. Rows are
   * keyed by content hash; the FIRST arrival per hash is emitted
   * (deterministic representative: min id within its batch) and every
   * later duplicate — same batch or any later batch, across restarts —
   * is dropped by keyed state (`flatMapGroupsWithState`, the custom-state
   * face of Structured Streaming that SURVEY §2.11 maps
   * mapGroupsWithState onto). State per key is one boolean ⇒ O(distinct
   * contents), hash-partitioned across executors at scale and persisted
   * in the checkpoint, so a restarted query still recognizes duplicates
   * of everything seen before the restart. Emits (doc_id, content_hash). */
  def dedupStream(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): Dataset[(Long, String)] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    docs
      .select(expr(s"try_cast(`$idCol` as long)").as("id"), md5(col(textCol)).as("h"))
      // malformed rows (null/non-numeric id, null text) are skipped like
      // nearDupStream — the primitive-Long tuple encoder would otherwise
      // NPE and kill the whole query on one poisoned row
      .where(col("id").isNotNull && col("h").isNotNull)
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Boolean, (Long, String)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (h: String, rows: Iterator[(Long, String)], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator((rows.minBy(_._1)._1, h))
          }
      }
  }

  /** Cross-micro-batch STREAMING near-dup detection — the streaming twin
   * of d7's banded SimHash LSH. Each document's 60-bit SimHash (computed
   * row-locally with MinHash.simhash60 — a pure function, so no
   * shuffle-aggregation precedes the stateful operator) fans out to its
   * 6 × 10-bit band segments; keyed state per (band, segment) bucket
   * holds up to `bucketCap` (id, simhash) representatives. A new arrival
   * is compared against its buckets' members (Hamming over two longs)
   * and every pair within `maxHamming` is emitted — across batches and
   * across restarts, since the buckets live in the checkpoint. Banding
   * is COMPLETE for Hamming ≤ 5 by pigeonhole (6 segments); the cap
   * bounds both state and per-arrival work exactly like d4/d7's
   * degenerate-bucket guards. A pair sharing several segments is emitted
   * once per shared bucket — dedup at the sink (`dropDuplicates` on the
   * id pair) if exact-once pairs are needed. */
  def nearDupStream(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", maxHamming: Int = 5,
      bucketCap: Int = 64): Dataset[(Long, Long, Int)] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    docs
      .select(expr(s"try_cast(`$idCol` as long)").as("id"), col(textCol).as("t"))
      // malformed rows (null id/text) are skipped, like the riot readers'
      // strict=false path — a poisoned row must not kill the whole query
      .where(col("id").isNotNull && col("t").isNotNull)
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val sh = graft.ops.MinHash.simhash60(text)
        (0 until 6).map(b => (b.toLong * 1024 + ((sh >> (b * 10)) & 1023L), id, sh))
      }
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[(Long, Long)], (Long, Long, Int)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[(Long, Long, Long)],
         state: GroupState[List[(Long, Long)]]) =>
          var seen = state.getOption.getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Int)]()
          // deterministic intra-batch order: smaller ids become members
          // first, so a same-batch pair is found when the larger arrives
          rows.toSeq.sortBy(_._2).foreach { case (_, id, sh) =>
            if (!seen.exists(_._1 == id)) {
              seen.foreach { case (oid, osh) =>
                val ham = java.lang.Long.bitCount(sh ^ osh)
                if (ham <= maxHamming)
                  out += (if (oid < id) (oid, id, ham) else (id, oid, ham))
              }
              if (seen.size < bucketCap) seen = (id, sh) :: seen
            }
          }
          state.update(seen)
          out.iterator
      }
  }

  /**
   * Streaming per-document SHACL validation: each row carries one
   * document-sized KG as N-Triples text; the shapes graph — schema-sized
   * by definition — ships once per executor via broadcast, and the pure
   * `shacl.Validator` runs inside mapPartitions. No state, no shuffle:
   * the many-small-KGs validation shape at any scale (the single-huge-KG
   * shape is `shacl.DfShacl`). Emits one row per document:
   * (doc_id, conforms, violations, components).
   */
  def validateStream(docs: DataFrame, shapes: Seq[Triple],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(shapes)
    docs.select(expr(s"try_cast(`$idCol` as long)").as("id"), col(textCol).as("t"))
      // skip malformed rows (null id/text) — same poisoned-row guard as
      // the dedup/near-dup streams
      .where(col("id").isNotNull && col("t").isNotNull)
      .as[(Long, String)]
      .mapPartitions { it =>
        val sh = bc.value
        it.map { case (id, text) =>
          val report = graft.shacl.Validator.validate(
            sh, NTriples.parseDocument(text))
          (id, report.conforms, report.results.size.toLong,
            report.results.map(_.component.lex).distinct.sorted)
        }
      }.toDF("doc_id", "conforms", "violations", "components")
  }

  /**
   * RDF-Patch-style change stream: rows (op: "A"|"D", s, p, o term
   * structs). Each micro-batch is folded into the CURRENT snapshot with
   * Graphs.applyDelta and committed as the NEXT immutable snapshot dir —
   * the streaming version of the reference's RDFPatchOps.applyChanges
   * over our Iceberg-style snapshot chain.
   */
  def applyPatchStream(patches: DataFrame, snapshotsDir: String,
                       checkpointDir: String): StreamingQuery =
    patches.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyPatchBatch(batch, snapshotsDir, batchId)
      }
      .start()

  /** One patch micro-batch → one committed snapshot (idempotent per
   * batchId: an already-committed snapshot dir is left untouched, so a
   * replayed batch after checkpoint recovery is a no-op). */
  def applyPatchBatch(batch: DataFrame, snapshotsDir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    requireLocalDir(snapshotsDir)
    val target = s"$snapshotsDir/s$batchId"
    if (TripleStore.isCommitted(target)) return
    val prior = latestCommitted(snapshotsDir, batchId)
    val current = prior match {
      case Some((_, p)) => spark.read.parquet(s"$p/spo")
      case None =>
        import spark.implicits._
        spark.emptyDataset[Triple].toDF()
    }
    // RDFPatchOps.applyChanges is SEQUENTIAL: an A-then-D of one triple
    // within a batch ends absent, D-then-A present. With a `seq` column
    // (RdfPatch.toChangeRows emits one) the LAST op per triple decides —
    // a window over the patch's own order, not arrival order. Without
    // seq the fold is the set form (base − dels) ∪ adds, where adds win.
    val resolved =
      if (batch.columns.contains("seq")) {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("s", "p", "o").orderBy(col("seq").desc)
        batch.withColumn("__rn", row_number().over(w))
          .where(col("__rn") === 1).drop("__rn")
      } else batch
    val adds = resolved.where(col("op") === "A").select("s", "p", "o")
    val dels = resolved.where(col("op") === "D").select("s", "p", "o")
    val next = Graphs.applyDelta(current, Graphs.Delta(adds, dels))
    next.write.mode("overwrite").parquet(s"$target/spo")
    // lineage records the snapshot ACTUALLY read as the base — batch ids
    // can be gapped (a superseded failed write), and batch 0 has no
    // parent; s(batchId-1) would fabricate both
    TripleStore.writeManifest(java.nio.file.Paths.get(target, "manifest.json"),
      Map("snapshot" -> s"s$batchId",
        "parent" -> prior.map(p => s"s${p._1}").getOrElse("none")))
  }

  /** Snapshot listing and manifests run through driver-side java.io/nio —
   * a cluster-FS URI (hdfs://, s3a://) would silently list nothing and
   * fold every batch into an empty base. Loud guard; at cluster scale
   * the snapshot chain belongs in a table format's own metadata (the
   * Iceberg analog TripleStore documents). */
  private def requireLocalDir(dir: String): Unit =
    require(!dir.matches("^[a-zA-Z][a-zA-Z0-9+.-]*://.*") || dir.startsWith("file:"),
      s"snapshot chain requires a local filesystem path, got '$dir'")

  /** The latest committed snapshot id+path strictly before `beforeId`. */
  private def latestCommitted(snapshotsDir: String,
      beforeId: Long): Option[(Long, String)] = {
    val dir = new java.io.File(snapshotsDir)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("s"))
      .flatMap(f => scala.util.Try(f.getName.drop(1).toLong).toOption.map(_ -> f))
      .filter { case (id, f) => id < beforeId && TripleStore.isCommitted(f.getPath) }
      .sortBy(_._1)
      .lastOption
      .map { case (id, f) => (id, f.getPath) }
  }

  /** The latest committed snapshot strictly before `beforeId` (empty graph
   * when none exists). */
  def latestSnapshot(spark: SparkSession, snapshotsDir: String, beforeId: Long): DataFrame = {
    requireLocalDir(snapshotsDir)
    latestCommitted(snapshotsDir, beforeId) match {
      case Some((_, p)) => spark.read.parquet(s"$p/spo")
      case None =>
        import spark.implicits._
        spark.emptyDataset[Triple].toDF()
    }
  }
}
