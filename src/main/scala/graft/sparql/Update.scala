package graft.sparql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.algebra.{Compiler, Construct, TermCols}
import graft.model.Term

/**
 * SPARQL 1.1 Update engine over immutable QUAD DataFrames — the Spark
 * mapping of the reference's `UpdateEngineWorker` (jena-arq/.../sparql/
 * modify/UpdateEngineWorker.java:66 INSERT DATA, :342 DELETE/INSERT WHERE
 * incl. WITH/USING, graph management :120–240). Where the reference
 * mutates a DatasetGraph in place, every operation here produces a NEW
 * dataset DataFrame (the snapshot model of SURVEY.md §2.11/north rule):
 * callers chain updates functionally and commit the result as the next
 * snapshot (e.g. via graft.store.TripleStore).
 *
 * Dataset representation: columns (s, p, o, g) of term structs;
 * `g = Term.defaultGraph` marks the default graph; a row with NULL
 * s/p/o is an EXISTENCE MARKER for an empty named graph (filtered out of
 * every triple scan by the compiler) — so CREATE/CLEAR keep a graph in
 * the dataset while DROP removes it.
 *
 * Semantics per SPARQL 1.1 Update:
 *  - a DELETE/INSERT's WHERE is evaluated ONCE against the pre-state
 *    (re-scoped by WITH / USING [NAMED] like FROM); deletions and
 *    insertions both instantiate against those bindings, deletions apply
 *    first ((G ∖ D) ∪ A);
 *  - INSERT templates may hold blank nodes (fresh per binding, via
 *    Construct's per-row bnode remapping); DELETE templates may not
 *    (raised at parse time);
 *  - graph set semantics throughout (INSERT DATA is idempotent);
 *  - graph-management ops on a missing graph raise; SILENT converts the
 *    error to a no-op (the W3C update-silent behavior). LOAD always
 *    raises (executors read datasets, not web documents) — LOAD SILENT
 *    is a no-op.
 */
object Update {

  private val DG: Term = Term.defaultGraph
  private val dgLex: String = DG.lex
  private def glex: Column = TermCols.lex(col("g"))

  def parse(text: String): Seq[Parser.UpdateAst] = Parser.parseUpdate(text)

  /** Triple-level compatibility API: the graph is the DEFAULT graph of a
   * one-graph dataset; named-graph effects of the request are discarded
   * on return. */
  def run(graph: DataFrame, text: String): DataFrame =
    runDataset(graph.select("s", "p", "o").withColumn("g", TermCols.const(DG)), text)
      .filter(glex === dgLex && col("s").isNotNull)
      .select("s", "p", "o")

  /** Apply a (possibly compound, ';'-separated) update request to a quad
   * dataset; returns the post-state. Operations see each other's effects
   * in order, like the reference's sequential UpdateEngineWorker visit.
   * Every 8 ops the accumulated plan is checkpointed — long compound
   * requests otherwise grow a nested except/union plan whose per-op
   * existence probes (graphExists) re-execute the whole chain. */
  def runDataset(quads: DataFrame, text: String): DataFrame = {
    val reqTag = freshReqTag()
    parse(text).zipWithIndex.foldLeft(quads.select("s", "p", "o", "g")) {
      case (d, (u, k)) =>
        val next = applyOne(d, u, k, reqTag)
        if ((k + 1) % 8 == 0) next.localCheckpoint(true) else next
    }
  }

  // bnode labels minted by a request must be FRESH per request (SPARQL
  // 1.1 Update §3.1.3.1: running `INSERT DATA { _:b :p :o }` twice
  // creates TWO bnodes) — a per-JVM counter feeds each request's scope
  private val reqCtr = new java.util.concurrent.atomic.AtomicLong()
  private def freshReqTag(): String = "q" + reqCtr.incrementAndGet()

  def applyOne(ds: DataFrame, u: Parser.UpdateAst, opIdx: Int = 0,
               reqTag: String = freshReqTag()): DataFrame = u match {
    // DATA blocks: bnode labels are scoped to the REQUEST (the same label
    // in two DATA graphs/ops of one request is the same bnode; a LATER
    // request minting the same source label gets a fresh bnode)
    case Parser.UpdateData(true, qs) => setUnion(ds, constQuads(ds, qs, reqTag))
    case Parser.UpdateData(false, qs) => ds.except(constQuads(ds, qs, reqTag))

    case Parser.UpdateModify(del, ins, where, withG, usingD, usingN) =>
      val view = datasetView(ds, withG, usingD, usingN)
      val sols0 = Compiler.compile(where, Compiler.DfGraph(view))
      // evaluate the WHERE once: both templates instantiate against the
      // same checkpointed bindings (otherwise an expensive WHERE runs one
      // full job per template)
      val sols =
        if (del.nonEmpty && ins.nonEmpty) sols0.localCheckpoint(true) else sols0
      val defG = withG.map(Term.iri).getOrElse(DG)
      // template bnodes are fresh per EXECUTION: each op of each request
      // gets its own scope. localCheckpoint pins the instantiation: the
      // frames hold nondeterministic per-row bnode ids (and a union of
      // them under `except`'s anti-join trips Spark's
      // PushDownLeftSemiAntiJoin assertion, SPARK optimizer bug) —
      // materializing one instantiation is also exactly the reference's
      // evaluate-once semantics
      val removals =
        if (del.nonEmpty)
          Construct.constructQuads(del, sols, defG, s"_${reqTag}_u$opIdx")
            .localCheckpoint(true)
        else ds.limit(0)
      val additions =
        if (ins.nonEmpty)
          Construct.constructQuads(ins, sols, defG, s"_${reqTag}_u$opIdx")
            .localCheckpoint(true)
        else ds.limit(0)
      setUnion(ds.except(removals), additions)

    case Parser.UpdateClear(target, silent, drop) =>
      clearDrop(ds, target, silent, drop)

    case Parser.UpdateCreate(iri, silent) =>
      if (graphExists(ds, iri)) {
        if (silent) ds
        else throw new IllegalArgumentException(s"CREATE: graph <$iri> already exists")
      } else ds.unionByName(marker(ds.sparkSession, iri))

    case Parser.UpdateTransfer(kind, from, to, silent) =>
      transfer(ds, kind, from, to, silent)

    case Parser.UpdateLoad(doc, _, silent) =>
      if (silent) ds
      else throw new IllegalArgumentException(
        s"LOAD <$doc>: document fetching is not supported (use the riot readers)")
  }

  // ------------------------------------------------------------- helpers

  private def setUnion(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).dropDuplicates("s", "p", "o", "g")

  /** Materialize a concrete-quads DATA block: template instantiation
   * against a single empty solution row (INSERT DATA's blank nodes get
   * one fresh label per request — the request tag scopes them, like the
   * reference's per-request bnode scope). */
  private def constQuads(like: DataFrame, qs: Seq[Parser.QuadPat],
                         reqTag: String): DataFrame =
    Construct.constructQuads(qs, like.sparkSession.range(1).toDF("__one"), DG,
        s"_$reqTag")
      .localCheckpoint(true) // see UpdateModify note

  /** Re-scope the dataset for a WHERE: USING/USING NAMED act like
   * FROM / FROM NAMED; otherwise WITH makes its graph the default. */
  private def datasetView(ds: DataFrame, withG: Option[String],
                          usingD: Seq[String], usingN: Seq[String]): DataFrame =
    if (usingD.nonEmpty || usingN.nonEmpty) {
      val defaultPart = ds.filter(glex.isin(usingD: _*) && col("s").isNotNull)
        .withColumn("g", TermCols.const(DG))
      val namedPart = ds.filter(glex.isin(usingN: _*) && glex =!= dgLex)
      defaultPart.unionByName(namedPart)
    } else withG match {
      case Some(w) =>
        val defaultPart = ds.filter(glex === w && col("s").isNotNull)
          .withColumn("g", TermCols.const(DG))
        val namedPart = ds.filter(glex =!= dgLex)
        defaultPart.unionByName(namedPart)
      case None => ds
    }

  private def graphExists(ds: DataFrame, iri: String): Boolean =
    !ds.filter(glex === iri).isEmpty

  /** Existence marker row for a (possibly empty) named graph. */
  private def marker(spark: SparkSession, iri: String): DataFrame = {
    val nul = lit(null).cast(TermCols.schema)
    spark.range(1).select(nul.as("s"), nul.as("p"), nul.as("o"),
      TermCols.const(Term.iri(iri)).as("g"))
  }

  private def clearDrop(ds: DataFrame, target: Parser.GraphRef,
                        silent: Boolean, drop: Boolean): DataFrame = target match {
    case Parser.GDefault =>
      // the default graph always exists; CLEAR and DROP both just empty it
      ds.filter(glex =!= dgLex)
    case Parser.GNamed(iri) =>
      if (!graphExists(ds, iri)) {
        if (silent) ds
        else throw new IllegalArgumentException(
          s"${if (drop) "DROP" else "CLEAR"}: no such graph <$iri>")
      } else {
        val rest = ds.filter(glex =!= iri)
        if (drop) rest else rest.unionByName(marker(ds.sparkSession, iri))
      }
    case Parser.GAllNamed =>
      val defaultPart = ds.filter(glex === dgLex)
      if (drop) defaultPart
      else defaultPart.unionByName( // keep the emptied graphs in the dataset
        ds.filter(glex =!= dgLex).select(col("g")).distinct()
          .select(lit(null).cast(TermCols.schema).as("s"),
            lit(null).cast(TermCols.schema).as("p"),
            lit(null).cast(TermCols.schema).as("o"), col("g")))
    case Parser.GAll =>
      if (drop) ds.limit(0)
      else ds.filter(glex =!= dgLex).select(col("g")).distinct()
        .select(lit(null).cast(TermCols.schema).as("s"),
          lit(null).cast(TermCols.schema).as("p"),
          lit(null).cast(TermCols.schema).as("o"), col("g"))
  }

  private def transfer(ds: DataFrame, kind: String, from: Parser.GraphRef,
                       to: Parser.GraphRef, silent: Boolean): DataFrame = {
    def lexOf(r: Parser.GraphRef): String = r match {
      case Parser.GDefault => dgLex
      case Parser.GNamed(iri) => iri
      case other => throw new IllegalArgumentException(s"$kind: bad target $other")
    }
    val (fl, tl) = (lexOf(from), lexOf(to))
    if (fl == tl) return ds
    val fromExists = fl == dgLex || graphExists(ds, fl)
    if (!fromExists) {
      if (silent) return ds
      else throw new IllegalArgumentException(s"$kind: no such graph <$fl>")
    }
    val toTerm = if (tl == dgLex) DG else Term.iri(tl)
    val srcAsTo = ds.filter(glex === fl && col("s").isNotNull)
      .withColumn("g", TermCols.const(toTerm))
    val withMarker =
      if (tl == dgLex) srcAsTo
      else srcAsTo.unionByName(marker(ds.sparkSession, tl))
    kind match {
      case "ADD" => setUnion(ds, withMarker)
      case "COPY" => // destination is REPLACED
        setUnion(ds.filter(glex =!= tl), withMarker)
      case "MOVE" => // destination replaced, source dropped entirely
        setUnion(ds.filter(glex =!= tl && glex =!= fl), withMarker)
    }
  }
}
