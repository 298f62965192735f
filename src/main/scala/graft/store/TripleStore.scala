package graft.store

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Triple-table materialization — the columnar analog of TDB2's storage
 * layout: three index permutations SPO / POS / OSP
 * (reference: jena-db/.../dboe/sys/Names.java:43–47, wired in
 * jena-tdb2/.../params/StoreParamsConst.java:78–84), realized as
 * range-partitioned, sorted Parquet so Catalyst's min/max stats give the
 * same "pick the index for the pattern shape" behavior as Jena's three
 * hash maps (mem/store/fast/FastTripleStore.java:36–85).
 *
 * Dedup before write = Graph set semantics ("add does nothing if the triple
 * is already present", mem/store/TripleStore.java:43–47).
 *
 * Snapshots are Iceberg-style without the Iceberg runtime (not on the
 * offline classpath): each commit is an immutable directory
 * `snapshots/<id>/` with the three table dirs, a `lineage/` metrics table,
 * and a `manifest.json` written atomically (temp file + move). Resume =
 * "does a committed manifest for this stage+input exist" — idempotent
 * stages re-run only what is missing (north rule resumability).
 */
object TripleStore {

  /** Await a batch of concurrent layout writes such that (a) a failure is
   * raised only after EVERY sibling finished — Future.sequence fails
   * fast while stragglers keep writing into the snapshot dir, racing any
   * retry of the same uncommitted snapshot — and (b) sibling failures
   * surface as suppressed exceptions instead of vanishing. */
  private def awaitAll(writes: Seq[scala.concurrent.Future[_]]): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val settled = Future.sequence(
      writes.map(_.map(scala.util.Success(_): scala.util.Try[Any])
        .recover { case e => scala.util.Failure(e) }))
    val failures = Await.result(settled, Duration.Inf)
      .collect { case scala.util.Failure(e) => e }
    if (failures.nonEmpty) {
      failures.tail.foreach(failures.head.addSuppressed)
      throw failures.head
    }
  }

  /** Flatten struct terms to 12 scalar columns for columnar stats/pruning. */
  def flatten(triples: DataFrame): DataFrame =
    triples.select(
      col("s.kind").as("s_kind"), col("s.lex").as("s_lex"),
      col("s.dt").as("s_dt"), col("s.lang").as("s_lang"),
      col("p.kind").as("p_kind"), col("p.lex").as("p_lex"),
      col("p.dt").as("p_dt"), col("p.lang").as("p_lang"),
      col("o.kind").as("o_kind"), col("o.lex").as("o_lex"),
      col("o.dt").as("o_dt"), col("o.lang").as("o_lang"),
      col("repo"), col("lang"))

  private val termCols = Seq(
    "s_kind", "s_lex", "s_dt", "s_lang",
    "p_kind", "p_lex", "p_dt", "p_lang",
    "o_kind", "o_lex", "o_dt", "o_lang")

  /**
   * Dedup (set semantics) + the three sorted layouts + lineage + manifest.
   *
   * Shuffle plan (the load-bearing decision at 100 TB): dedup rides the
   * SPO range shuffle instead of paying its own hash shuffle — under range
   * partitioning by (s,p,o) identical triples land in the same partition,
   * and after an in-partition sort on the full term key duplicates are
   * adjacent, so a narrow `mapPartitions` sweep removes them. POS/OSP and
   * the lineage table are then derived from the COMMITTED SPO files
   * (columnar re-read — what a production job does anyway instead of
   * holding the full set in executor memory). Net: 3 full-data shuffles
   * instead of 4, and no multi-GB cache competing with sort memory.
   */
  def materialize(triples: DataFrame, snapshotDir: String,
                  parent: Option[String], partitions: Int = 32): Long = {
    val spark = triples.sparkSession
    val t0 = System.nanoTime()
    // opt-in phase laps (SPARK_GRAFT_LAPS=1 or -Dgraft.laps=1): decomposes
    // the fixed driver term of the scaling model (BASELINE.md trial 10)
    val lapOn = sys.env.get("SPARK_GRAFT_LAPS").contains("1") ||
      sys.props.get("graft.laps").contains("1")
    var tl = t0
    def lap(name: String): Unit = if (lapOn) {
      val now = System.nanoTime()
      println(f"[materialize] $name%-10s ${(now - tl) / 1e9}%.1f s")
      tl = now
    }

    val flat = flatten(triples)
    val keyIdx = termCols.map(flat.schema.fieldIndex)
    flat
      .repartitionByRange(partitions, col("s_lex"), col("p_lex"), col("o_lex"))
      .sortWithinPartitions(termCols.map(col): _*)
      .mapPartitions { rows =>
        // adjacent-duplicate elimination on the 12-col term key (repo/lang
        // may differ between duplicates; first-in-sort-order wins, same
        // arbitrary-winner semantics as dropDuplicates)
        var prev: Seq[Any] = null
        rows.filter { r =>
          val key = keyIdx.map(r.get)
          val keep = prev == null || key != prev
          prev = key
          keep
        }
      }(org.apache.spark.sql.Encoders.row(flat.schema))
      .write.mode(SaveMode.Overwrite).parquet(s"$snapshotDir/spo")
    lap("spo_write")

    val spo = spark.read.parquet(s"$snapshotDir/spo")
    val total = spo.count()
    lap("count")

    // POS/OSP carry the 12 term columns only: the query read path
    // (Compiler.scanPattern) never touches repo/lang on the secondary
    // layouts, the struct fallback and lineage read SPO — so the two
    // derived range shuffles move ~15% fewer bytes per row, which is pure
    // win on the memory-bandwidth-bound materialize stage (BASELINE.md
    // per-stage split).
    def sortedWrite(name: String, keys: Seq[String]): Unit =
      spo.select(termCols.map(col): _*)
        .repartitionByRange(partitions, keys.map(col): _*)
        .sortWithinPartitions(keys.map(col): _*)
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$snapshotDir/$name")

    // POS/OSP + lineage are independent reads of the committed SPO files —
    // concurrent jobs overlap their shuffles and commit phases
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val writes = Seq(
      Future(sortedWrite("pos", Seq("p_lex", "o_lex", "s_lex"))),
      Future(sortedWrite("osp", Seq("o_lex", "s_lex", "p_lex"))),
      Future {
        // per-partition lineage + metrics rows (north rule): counts by the
        // pipeline's partition key (repo, lang)
        spo.groupBy("repo", "lang")
          .agg(count(lit(1)).as("n_triples"),
            countDistinct(col("s_lex")).as("n_subjects"))
          .coalesce(1)
          .write.mode(SaveMode.Overwrite).parquet(s"$snapshotDir/lineage")
      })
    awaitAll(writes)
    lap("pos_osp_lineage")

    val wallMs = (System.nanoTime() - t0) / 1000000
    writeManifest(Paths.get(snapshotDir, "manifest.json"), Map(
      "snapshot" -> Paths.get(snapshotDir).getFileName.toString,
      "parent" -> parent.getOrElse(""),
      "layouts" -> "spo,pos,osp",
      "n_triples" -> total.toString,
      "wall_ms" -> wallMs.toString))
    total
  }

  /**
   * Dictionary-encoded materialization — the TDB2 NodeTable analog
   * (jena-tdb2/.../store/nodetable/NodeTable.java; SURVEY.md §1.6 "terms
   * are dictionary-encoded to fixed-width NodeIds"). Term ids are
   * CONTENT-DERIVED (xxhash64 of the 4 struct fields), so no sequential-id
   * coordination point exists — any executor can compute any term's id
   * locally, exactly like the seeded bnode labels. Layouts become narrow
   * (s_id, p_id, o_id) long rows: range shuffles move ~20 bytes/triple
   * instead of hundreds, which is the difference between memory-bandwidth-
   * bound and CPU-bound at high parallelism (measured in BASELINE.md).
   *
   * Output: `terms/` dictionary (id → term struct fields) + sorted
   * `spo/pos/osp` id-fact tables + `lineage/` + manifest.
   */
  def materializeEncoded(triples: DataFrame, snapshotDir: String,
                         parent: Option[String], partitions: Int = 32): Long = {
    val t0 = System.nanoTime()
    val flat = flatten(triples)

    def tid(p: String): Column =
      xxhash64(col(s"${p}_kind"), col(s"${p}_lex"), col(s"${p}_dt"), col(s"${p}_lang"))

    val facts = flat
      .withColumn("s_id", tid("s")).withColumn("p_id", tid("p")).withColumn("o_id", tid("o"))
      .select("s_id", "p_id", "o_id", "repo", "lang",
        "s_kind", "s_lex", "s_dt", "s_lang",
        "p_kind", "p_lex", "p_dt", "p_lang",
        "o_kind", "o_lex", "o_dt", "o_lang")
      .dropDuplicates("s_id", "p_id", "o_id")
      .cache()
    val total = facts.count()

    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global

    // repo/lang ride only the primary SPO layout (decodeEncoded's default);
    // the id-BGP read path (Compiler.scanBgp) projects the three id columns
    def idWrite(name: String, keys: Seq[String]): Unit =
      facts.select(Seq("s_id", "p_id", "o_id") ++
          (if (name == "spo") Seq("repo", "lang") else Nil) map col: _*)
        .repartitionByRange(partitions, keys.map(col): _*)
        .sortWithinPartitions(keys.map(col): _*)
        .write.mode(SaveMode.Overwrite).parquet(s"$snapshotDir/$name")

    // reuse the already-materialized id columns (re-hashing would cost 3
    // extra full-data xxhash passes on the bandwidth-bound stage)
    def slot(p: String) = facts.select(col(s"${p}_id").as("id"),
      col(s"${p}_kind").as("kind"),
      col(s"${p}_lex").as("lex"), col(s"${p}_dt").as("dt"), col(s"${p}_lang").as("lang"))

    val writes = Seq(
      Future(idWrite("spo", Seq("s_id", "p_id", "o_id"))),
      Future(idWrite("pos", Seq("p_id", "o_id", "s_id"))),
      Future(idWrite("osp", Seq("o_id", "s_id", "p_id"))),
      Future {
        val dict = slot("s").union(slot("p")).union(slot("o"))
          .dropDuplicates("kind", "lex", "dt", "lang")
          .repartitionByRange(math.max(1, partitions / 4), col("id"))
          .sortWithinPartitions("id")
          .persist()
        // collision guard: content-derived ids are only sound while every
        // distinct term gets a distinct id. One vocabulary-sized count
        // pair; on a collision the snapshot would silently decode WRONG
        // terms and merge distinct triples — fail before committing.
        val nTerms = dict.count()
        val nIds = dict.select("id").distinct().count()
        if (nTerms != nIds) {
          dict.unpersist()
          throw new IllegalStateException(
            s"xxhash64 term-id collision: $nTerms distinct terms map to " +
              s"$nIds ids — the encoded layout cannot represent this " +
              "vocabulary; use the term-struct materialize instead")
        }
        dict.write.mode(SaveMode.Overwrite).parquet(s"$snapshotDir/terms")
        dict.unpersist()
      },
      Future {
        facts.groupBy("repo", "lang")
          .agg(count(lit(1)).as("n_triples"), countDistinct(col("s_id")).as("n_subjects"))
          .coalesce(1)
          .write.mode(SaveMode.Overwrite).parquet(s"$snapshotDir/lineage")
      })
    awaitAll(writes)
    facts.unpersist()

    writeManifest(Paths.get(snapshotDir, "manifest.json"), Map(
      "snapshot" -> Paths.get(snapshotDir).getFileName.toString,
      "parent" -> parent.getOrElse(""),
      "layouts" -> "spo,pos,osp,terms(encoded)",
      "encoding" -> "xxhash64-termid",
      "n_triples" -> total.toString,
      "wall_ms" -> ((System.nanoTime() - t0) / 1000000).toString))
    total
  }

  /** Decode an id-encoded layout back to term-struct triples (three
   * dictionary joins — AQE broadcasts the dictionary when it fits). */
  def decodeEncoded(spark: SparkSession, snapshotDir: String,
                    layout: String = "spo"): DataFrame = {
    val facts = spark.read.parquet(s"$snapshotDir/$layout")
    val terms = spark.read.parquet(s"$snapshotDir/terms")
    def term(alias: String) = terms.select(col("id").as(s"${alias}_tid"),
      struct(col("kind"), col("lex"), col("dt"), col("lang")).as(alias))
    // repo/lang ride only the primary spo layout; pos/osp decode to the
    // bare term triple
    val extras =
      if (facts.columns.contains("repo")) Seq(col("repo"), col("lang")) else Nil
    facts
      .join(term("s"), col("s_id") === col("s_tid"))
      .join(term("p"), col("p_id") === col("p_tid"))
      .join(term("o"), col("o_id") === col("o_tid"))
      .select(Seq(col("s"), col("p"), col("o")) ++ extras: _*)
  }

  /** Atomic manifest commit: write temp, then move into place. A snapshot
   * without manifest.json is by definition uncommitted → safely re-runnable. */
  def writeManifest(path: Path, fields: Map[String, String]): Unit = {
    Files.createDirectories(path.getParent)
    def q(s: String) = "\"" + s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x" // other control chars
      case c => c.toString
    } + "\""
    val json = fields.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ", ", "}")
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def isCommitted(snapshotDir: String): Boolean =
    Files.exists(Paths.get(snapshotDir, "manifest.json"))

  /** Content digest of an input directory for snapshot-dir keying: the
   * canonical path plus every parquet file's (relative name, size,
   * mtime), sha-256'd. Two different inputs cannot collide, and a
   * changed input (new files, rewritten files) changes the digest — the
   * stale-reuse hazard a bare path hashCode had. */
  def inputDigest(dir: String): String = {
    val root = Paths.get(dir).toAbsolutePath.normalize
    val entries =
      if (!Files.exists(root)) Seq.empty
      else {
        val st = Files.walk(root)
        try {
          import scala.jdk.CollectionConverters._
          st.iterator().asScala
            .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
            .map(p => s"${root.relativize(p)}|${Files.size(p)}|" +
              s"${Files.getLastModifiedTime(p).toMillis}")
            .toSeq.sorted
        } finally st.close()
      }
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(root.toString.getBytes("UTF-8"))
    entries.foreach(e => md.update(('\n' + e).getBytes("UTF-8")))
    md.digest().take(12).map("%02x".format(_)).mkString
  }

  /** Read back a [[writeManifest]] document (flat string→string JSON).
   * Missing file → empty map. */
  def readManifest(path: Path): Map[String, String] = {
    if (!Files.exists(path)) return Map.empty
    def unesc(s: String): String = {
      val b = new StringBuilder
      var i = 0
      while (i < s.length) {
        if (s.charAt(i) == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case 'n' => b.append('\n'); i += 2
            case 'r' => b.append('\r'); i += 2
            case 't' => b.append('\t'); i += 2
            case 'u' if i + 5 < s.length =>
              b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
              i += 6
            case c => b.append(c); i += 2
          }
        } else { b.append(s.charAt(i)); i += 1 }
      }
      b.toString
    }
    """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
      .findAllMatchIn(Files.readString(path))
      .map(m => unesc(m.group(1)) -> unesc(m.group(2))).toMap
  }

  /** Pattern-shaped read: pick the layout whose leading sort column is
   * bound — the FastTripleStore index-selection rule, columnar edition
   * (mem/pattern/PatternClassifier.java:51).
   *
   * Matching is by LEXICAL FORM only — an IRI, a bnode label and a
   * literal sharing a lexical form all match (handy for IRI-shaped
   * lookups, wrong for term-exact semantics; use
   * `Compiler.SnapshotGraph.scanPattern` for full 4-field term matching).
   * The result always carries the 12 term columns regardless of which
   * layout served it (repo/lang live only on spo and would make the
   * schema data-dependent). */
  def scan(spark: SparkSession, snapshotDir: String,
           s: Option[String], p: Option[String], o: Option[String]): DataFrame = {
    val layout = (s, p, o) match {
      case (Some(_), _, _) => "spo"
      case (None, Some(_), _) => "pos"
      case (None, None, Some(_)) => "osp"
      case _ => "spo"
    }
    var df = spark.read.parquet(s"$snapshotDir/$layout")
      .select(termCols.map(col): _*)
    s.foreach(v => df = df.where(col("s_lex") === v))
    p.foreach(v => df = df.where(col("p_lex") === v))
    o.foreach(v => df = df.where(col("o_lex") === v))
    df
  }

  // ------------------------------------------------------------- quads
  // Named-graph layouts GSPO / GPOS / GOSP — the TDB2 primary quad
  // indexes (dboe/sys/Names.java:43–47 primaryIndexQuads). Same shuffle
  // plan as `materialize`: dedup rides the GSPO range shuffle, the other
  // two layouts derive from the committed GSPO files.

  /** Flatten (s,p,o,g) struct columns to 16 scalar columns. */
  def flattenQuads(quads: DataFrame): DataFrame =
    quads.select(
      col("g.kind").as("g_kind"), col("g.lex").as("g_lex"),
      col("g.dt").as("g_dt"), col("g.lang").as("g_lang"),
      col("s.kind").as("s_kind"), col("s.lex").as("s_lex"),
      col("s.dt").as("s_dt"), col("s.lang").as("s_lang"),
      col("p.kind").as("p_kind"), col("p.lex").as("p_lex"),
      col("p.dt").as("p_dt"), col("p.lang").as("p_lang"),
      col("o.kind").as("o_kind"), col("o.lex").as("o_lex"),
      col("o.dt").as("o_dt"), col("o.lang").as("o_lang"))

  private val quadTermCols = Seq(
    "g_kind", "g_lex", "g_dt", "g_lang",
    "s_kind", "s_lex", "s_dt", "s_lang",
    "p_kind", "p_lex", "p_dt", "p_lang",
    "o_kind", "o_lex", "o_dt", "o_lang")

  /** Quad-store materialization: dedup + GSPO/GPOS/GOSP sorted layouts +
   * per-graph lineage + manifest. */
  def materializeQuads(quads: DataFrame, snapshotDir: String,
                       parent: Option[String], partitions: Int = 32): Long = {
    val spark = quads.sparkSession
    val t0 = System.nanoTime()

    val flat = flattenQuads(quads)
    val keyIdx = quadTermCols.map(flat.schema.fieldIndex)
    flat
      .repartitionByRange(partitions, col("g_lex"), col("s_lex"), col("p_lex"), col("o_lex"))
      .sortWithinPartitions(quadTermCols.map(col): _*)
      .mapPartitions { rows =>
        var prev: Seq[Any] = null
        rows.filter { r =>
          val key = keyIdx.map(r.get)
          val keep = prev == null || key != prev
          prev = key
          keep
        }
      }(org.apache.spark.sql.Encoders.row(flat.schema))
      .write.mode(SaveMode.Overwrite).parquet(s"$snapshotDir/gspo")

    val gspo = spark.read.parquet(s"$snapshotDir/gspo")
    val total = gspo.count()

    def sortedWrite(name: String, keys: Seq[String]): Unit =
      gspo.repartitionByRange(partitions, keys.map(col): _*)
        .sortWithinPartitions(keys.map(col): _*)
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$snapshotDir/$name")

    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val writes = Seq(
      Future(sortedWrite("gpos", Seq("g_lex", "p_lex", "o_lex", "s_lex"))),
      Future(sortedWrite("gosp", Seq("g_lex", "o_lex", "s_lex", "p_lex"))),
      Future {
        gspo.groupBy("g_lex")
          .agg(count(lit(1)).as("n_quads"),
            countDistinct(col("s_lex")).as("n_subjects"))
          .coalesce(1)
          .write.mode(SaveMode.Overwrite).parquet(s"$snapshotDir/lineage")
      })
    awaitAll(writes)

    writeManifest(Paths.get(snapshotDir, "manifest.json"), Map(
      "snapshot" -> Paths.get(snapshotDir).getFileName.toString,
      "parent" -> parent.getOrElse(""),
      "layouts" -> "gspo,gpos,gosp",
      "n_quads" -> total.toString,
      "wall_ms" -> ((System.nanoTime() - t0) / 1000000).toString))
    total
  }

  /** Quad-pattern read: graph-bound scans prune on the leading g_lex of
   * every layout; within a graph the s/p/o shape picks the index exactly
   * like `scan`. */
  /** Lexical-form matching, like [[scan]] — term-exact quad patterns go
   * through `Compiler.QuadSnapshotGraph.scanQuadPattern`. All quad
   * layouts carry the same 16 columns, so no schema trim is needed. */
  def scanQuads(spark: SparkSession, snapshotDir: String,
                g: Option[String], s: Option[String],
                p: Option[String], o: Option[String]): DataFrame = {
    val layout = (s, p, o) match {
      case (Some(_), _, _) => "gspo"
      case (None, Some(_), _) => "gpos"
      case (None, None, Some(_)) => "gosp"
      case _ => "gspo"
    }
    var df = spark.read.parquet(s"$snapshotDir/$layout")
    g.foreach(v => df = df.where(col("g_lex") === v))
    s.foreach(v => df = df.where(col("s_lex") === v))
    p.foreach(v => df = df.where(col("p_lex") === v))
    o.foreach(v => df = df.where(col("o_lex") === v))
    df
  }

  /** Rebuild (s,p,o,g) struct columns from a flattened quad layout. */
  def unflattenQuads(df: DataFrame): DataFrame = {
    def term(p: String) = struct(
      col(s"${p}_kind").as("kind"), col(s"${p}_lex").as("lex"),
      col(s"${p}_dt").as("dt"), col(s"${p}_lang").as("lang")).as(p)
    df.select(term("s"), term("p"), term("o"), term("g"))
  }
}
