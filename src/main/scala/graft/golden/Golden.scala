package graft.golden

import java.nio.file.{Files, Paths}

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.algebra.Compiler
import graft.model.{Iso, Term, Triple}
import graft.normalize.Literals
import graft.riot.{NTriples, ResultSetIO, TurtleLite}
import graft.sparql.{Parser, Sparql}

/**
 * Manifest-driven golden-test machinery over the reference's OWN W3C test
 * data (SURVEY.md §5.1; reference runner:
 * jena-arq/src/test/java/org/apache/jena/arq/junit/manifest/ManifestProcessor.java,
 * result comparison ResultsCompare / IsoMatcher.java:50–74). A manifest
 * (`manifest.ttl`) lists entries `(mf:action (qt:query, qt:data*),
 * mf:result)`; the runner executes each through
 * Parser → Compiler → DataFrame and compares against the stored
 * `.srx`/`.srj`/`.ttl` expectation, blank-node-isomorphism-aware and
 * value-canonical (QueryEvalTest compares by VALUE by default —
 * QueryEvalTest.java:80 — mirrored here by canonicalizing numeric /
 * boolean / dateTime lexical forms on both sides).
 *
 * Driver-side by design: manifests and golden result sets are tiny; the
 * DataFrames under test still execute distributed.
 */
object Manifest {

  val MF = "http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#"
  val MFX = "http://jena.hpl.hp.com/2005/05/test-manifest-extra#"
  val QT = "http://www.w3.org/2001/sw/DataAccess/tests/test-query#"
  val UT = "http://www.w3.org/2009/sparql/tests/test-update#"
  private val RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val RDFS = "http://www.w3.org/2000/01/rdf-schema#"

  /** Pre-/post-state of an UpdateEvaluationTest: default-graph files plus
   * (file, graph-name) named-graph pairs. */
  final case class DatasetSpec(data: Seq[String], graphData: Seq[(String, String)])

  final case class Entry(
      name: String,
      types: Set[String],
      query: Option[String],    // local file path
      data: Seq[String],        // local file paths (default graph)
      graphData: Seq[String],   // local file paths (named graphs)
      result: Option[String],   // local file path
      // SPARQL Update tests (ut: vocabulary)
      request: Option[String] = None,
      updPre: DatasetSpec = DatasetSpec(Nil, Nil),
      updPost: Option[DatasetSpec] = None,
      // federated tests: qt:serviceData (endpoint IRI, data file) pairs
      serviceData: Seq[(String, String)] = Nil,
      // mf:assumedTestBase: (local manifest dir prefix → published URL) —
      // relative IRIs in action/result docs resolve against the PUBLISHED
      // base, not the local path
      assumedBase: Option[(String, String)] = None)

  /** Parse one manifest.ttl into its test entries (list order kept). */
  def load(manifestPath: String): Seq[Entry] = {
    val p = Paths.get(manifestPath).toAbsolutePath
    val dir = p.getParent.toString
    val base = "file://" + dir + "/"
    val triples = TurtleLite.parse(
      new String(Files.readAllBytes(p), "UTF-8"), base)

    val byS: Map[Term, Seq[(String, Term)]] =
      triples.groupBy(_.s).map { case (s, ts) => s -> ts.map(t => (t.p.lex, t.o)) }
    def objs(s: Term, pred: String): Seq[Term] =
      byS.getOrElse(s, Nil).collect { case (pl, o) if pl == pred => o }
    def obj(s: Term, pred: String): Option[Term] = objs(s, pred).headOption
    def listItems(head: Term): Seq[Term] = {
      val out = ListBuffer[Term]()
      var cur = head
      while (!(cur.kind == Term.KIND_IRI && cur.lex == RDF + "nil")) {
        obj(cur, RDF + "first").foreach(out += _)
        cur = obj(cur, RDF + "rest").getOrElse(Term.iri(RDF + "nil"))
      }
      out.toList
    }
    def path(t: Term): String = t.lex.stripPrefix("file://")

    val manifestNodes = triples.collect {
      case t if t.p.lex == RDF + "type" && t.o.lex == MF + "Manifest" => t.s
    }.distinct
    // ut:graphData [ ut:graph <file> ; rdfs:label "name" ] pairs
    def utGraphPairs(node: Term): Seq[(String, String)] =
      objs(node, UT + "graphData").flatMap { gd =>
        for {
          f <- obj(gd, UT + "graph")
          label <- obj(gd, RDFS + "label")
        } yield (path(f), label.lex)
      }
    def datasetSpec(node: Term): DatasetSpec =
      DatasetSpec(objs(node, UT + "data").map(path), utGraphPairs(node))

    manifestNodes.flatMap { m =>
      val assumed = obj(m, MF + "assumedTestBase")
        .map(b => (dir + "/", b.lex))
      objs(m, MF + "entries").flatMap(listItems).map { e =>
        val action = obj(e, MF + "action")
        val query = action.flatMap {
          case a if a.kind == Term.KIND_IRI && byS.get(a).isEmpty => Some(a)
          case a => obj(a, QT + "query")
        }
        val resultNode = obj(e, MF + "result")
        Entry(
          name = obj(e, MF + "name").map(_.lex).getOrElse(e.lex),
          types = objs(e, RDF + "type").map(_.lex).toSet,
          query = query.map(path),
          data = action.toSeq.flatMap(objs(_, QT + "data")).map(path),
          graphData = action.toSeq.flatMap(objs(_, QT + "graphData")).map(path),
          result = resultNode.filter(r =>
            r.kind == Term.KIND_IRI && byS.get(r).isEmpty).map(path),
          request = action.flatMap(obj(_, UT + "request")).map(path),
          updPre = action.map(datasetSpec).getOrElse(DatasetSpec(Nil, Nil)),
          updPost = resultNode.map(datasetSpec),
          serviceData = action.toSeq
            .flatMap(objs(_, QT + "serviceData"))
            .flatMap(sd => for {
              ep <- obj(sd, QT + "endpoint")
              f <- obj(sd, QT + "data")
            } yield (ep.lex, path(f))),
          assumedBase = assumed)
      }
    }
  }
}

object GoldenRunner {

  sealed trait Outcome
  case object Passed extends Outcome
  final case class Failed(detail: String) extends Outcome
  final case class Skipped(reason: String) extends Outcome

  final case class CaseResult(name: String, outcome: Outcome)

  private val EvalTypes = Set(
    Manifest.MF + "QueryEvaluationTest", Manifest.MFX + "TestQuery")
  private val UpdateEvalTypes = Set(Manifest.MF + "UpdateEvaluationTest")
  private val PosSyntaxTypes = Set("PositiveSyntaxTest", "PositiveSyntaxTest11",
    "PositiveUpdateSyntaxTest", "PositiveUpdateSyntaxTest11").map(Manifest.MF + _) ++
    Set(Manifest.MFX + "PositiveSyntaxTestARQ")
  private val NegSyntaxTypes = Set("NegativeSyntaxTest", "NegativeSyntaxTest11",
    "NegativeUpdateSyntaxTest", "NegativeUpdateSyntaxTest11").map(Manifest.MF + _) ++
    Set(Manifest.MFX + "NegativeSyntaxTestARQ")

  /** Run every entry of a manifest; `skip` maps test names to triage
   * reasons (recorded, not executed). */
  def runManifest(spark: SparkSession, manifestPath: String,
                  skip: Map[String, String] = Map.empty,
                  only: Option[String] = None): Seq[CaseResult] =
    Manifest.load(manifestPath)
      .filter(e => only.forall(_ == e.name)).map { e =>
      CaseResult(e.name,
        if (skip.contains(e.name)) Skipped(skip(e.name))
        else if (e.types.intersect(UpdateEvalTypes).nonEmpty)
          runUpdateEntry(spark, e)
        else if (e.types.intersect(PosSyntaxTypes).nonEmpty ||
          e.types.intersect(NegSyntaxTypes).nonEmpty)
          runSyntaxEntry(e, negative = e.types.intersect(NegSyntaxTypes).nonEmpty)
        else if (e.types.isEmpty && e.query.nonEmpty && e.result.nonEmpty)
          // untyped entries with a query action + expected result default
          // to query evaluation (the reference's ManifestProcessor does
          // the same for ARQ's own PropertyFunctions/ValueTesting lists)
          runEntry(spark, e)
        else if (e.types.intersect(EvalTypes).isEmpty)
          Skipped("not a query-evaluation test: " + e.types.map(shortT).mkString(","))
        else runEntry(spark, e))
    }

  private def shortT(iri: String) = iri.substring(iri.lastIndexOf('#') + 1)

  // ------------------------------------------------- triple-term helpers

  /** Rewrite every blank-node label in a term with `f`, descending into
   * triple-term components — labels inside the canonical `<<( … )>>` text
   * are real bnodes, so a per-document scope must rename them too. */
  private def mapBnodes(t: Term, f: String => String): Term = t.kind match {
    case Term.KIND_BNODE => Term.bnode(f(t.lex))
    case Term.KIND_LIT if graft.cdt.Cdt.isCdt(t) =>
      // bnodes INSIDE composite-datatype literals share the document's
      // label scope (SPARQL-CDTs bnodes suite)
      graft.cdt.Cdt.mapBnodeLabels(t, f)
    case Term.KIND_TRIPLE_TERM =>
      NTriples.parseTripleTermComponents(t.lex) match {
        case Some((s, p, o)) =>
          Term(Term.KIND_TRIPLE_TERM,
            "<<( " + mapBnodes(s, f).toNTriples + " " + mapBnodes(p, f).toNTriples +
              " " + mapBnodes(o, f).toNTriples + " )>>", "", "")
        case None => t
      }
    case _ => t
  }

  private def hasBnode(t: Term): Boolean = t.kind match {
    case Term.KIND_BNODE => true
    case Term.KIND_TRIPLE_TERM =>
      NTriples.parseTripleTermComponents(t.lex).exists {
        case (s, p, o) => hasBnode(s) || hasBnode(p) || hasBnode(o)
      }
    case _ => false
  }

  private val TtS = Term.iri("urn:graft:tt:s")
  private val TtP = Term.iri("urn:graft:tt:p")
  private val TtO = Term.iri("urn:graft:tt:o")

  /** Expand triple terms CONTAINING bnodes into synthetic component nodes
   * (`_:__ttK urn:graft:tt:s S …`, recursive) so [[Iso]] — which treats
   * terms atomically — can include tt-embedded bnodes in the bijection.
   * Ground triple terms stay opaque: their canonical text already
   * compares. Applied to BOTH sides before any isomorphism check. */
  private def expandTT(ts: Seq[Triple]): Seq[Triple] = {
    val out = ListBuffer[Triple]()
    var k = 0
    def conv(t: Term): Term =
      if (t.kind == Term.KIND_TRIPLE_TERM && hasBnode(t))
        NTriples.parseTripleTermComponents(t.lex) match {
          case Some((s, p, o)) =>
            k += 1
            val n = Term.bnode("__tt" + k)
            out += Triple(n, TtS, conv(s))
            out += Triple(n, TtP, conv(p))
            out += Triple(n, TtO, conv(o))
            n
          case None => t
        }
      else t
    ts.foreach(t => out += Triple(conv(t.s), t.p, conv(t.o)))
    out.toList
  }

  private def isoTT(a: Seq[Triple], b: Seq[Triple]): Boolean =
    Iso.isomorphic(expandTT(a.map(canonTriple)), expandTT(b.map(canonTriple)))

  // ---------------------------------------------- RIOT parser suites (rdft:)

  private val RDFT = "http://www.w3.org/ns/rdftest#"
  private val QuadP = Term.iri("urn:graft:quad")

  /** W3C RDF 1.1/1.2 parser-suite runner (rdft: vocabulary — the suites
   * the reference runs via Scripts_RIOT_rdf_tests_std): Turtle / TriG /
   * N-Triples / N-Quads positive/negative syntax and eval tests executed
   * against graft.riot's document parsers. No SparkSession needed — the
   * parsers are pure; the distributed path wraps the same functions in
   * mapPartitions. */
  def runRiotManifest(manifestPath: String,
                      skip: Map[String, String] = Map.empty): Seq[CaseResult] =
    Manifest.load(manifestPath).map { e =>
      CaseResult(e.name,
        if (skip.contains(e.name)) Skipped(skip(e.name))
        else if (!e.types.exists(_.startsWith(RDFT)))
          Skipped("not an rdftest case: " + e.types.map(shortT).mkString(","))
        else runRiotEntry(e))
    }

  /** The suites' expected .nt files resolve relative IRIs against the
   * tests' PUBLISHED URL, not the local path: use the manifest's own
   * mf:assumedTestBase when declared (rrx11-2, rrx12, the rdf12 suites),
   * else the rdf-tests-cg checkout → published-URL mapping. */
  private def webBase(path: String, assumed: Option[(String, String)]): String =
    assumed match {
      case Some((localPrefix, web)) if path.startsWith(localPrefix) =>
        web + path.stripPrefix(localPrefix)
      case _ =>
        path.replace("/root/reference/jena-arq/testing/rdf-tests-cg/",
          "https://w3c.github.io/rdf-tests/")
    }

  private def parseAnyRdf(path: String,
                          assumed: Option[(String, String)]): Seq[graft.model.Quad] = {
    val text = readFile(path)
    val base = webBase(path, assumed)
    import graft.model.Quad
    if (path.endsWith(".nt"))
      NTriples.parseDocument(text).map(t => Quad(t.s, t.p, t.o, Term.defaultGraph))
    else if (path.endsWith(".nq")) graft.riot.NQuads.parseDocument(text)
    else if (path.endsWith(".trig")) graft.riot.TrigLite.parse(text, base)
    else if (path.endsWith(".rdf"))
      graft.riot.RdfXmlLite.parse(text, base).map(t => Quad(t.s, t.p, t.o, Term.defaultGraph))
    else TurtleLite.parse(text, base).map(t => Quad(t.s, t.p, t.o, Term.defaultGraph))
  }

  /** Dataset isomorphism under ONE bnode bijection: each named-graph quad
   * becomes `(g, urn:graft:quad, <<(s p o)>>)` and [[isoTT]]'s triple-term
   * expansion carries embedded bnodes into the bijection. `.distinct`:
   * an RDF graph is a SET — a document asserting the same triple twice
   * holds it once (Graph.add set semantics, mem/store/TripleStore.java). */
  private def datasetTriples(qs: Seq[graft.model.Quad]): Seq[Triple] =
    qs.distinct.map { q =>
      if (q.g == Term.defaultGraph) Triple(q.s, q.p, q.o)
      else Triple(q.g, QuadP, Term(Term.KIND_TRIPLE_TERM,
        "<<( " + q.s.toNTriples + " " + q.p.toNTriples + " " + q.o.toNTriples + " )>>",
        "", ""))
    }

  private def runRiotEntry(e: Manifest.Entry): Outcome = {
    val action = e.query.getOrElse(return Skipped("no action file"))
    val negative = e.types.exists(t => t.startsWith(RDFT) && t.contains("Negative"))
    val parsed =
      try Right(parseAnyRdf(action, e.assumedBase))
      catch { case ex: Exception => Left(ex) }
    (parsed, negative) match {
      case (Left(_), true) => Passed
      case (Left(ex), false) =>
        Failed("parse error: " + String.valueOf(ex.getMessage).take(200))
      case (Right(_), true) => Failed("negative test parsed successfully")
      case (Right(qs), false) =>
        e.result match {
          case None => Passed // positive-syntax test
          case Some(rf) =>
            val exp = parseAnyRdf(rf, e.assumedBase)
            if (isoTT(datasetTriples(qs), datasetTriples(exp))) Passed
            else Failed(s"${qs.size} quads vs expected ${exp.size}\n  actual:   " +
              qs.take(8).map(q => q.s.toNTriples + " " + q.p.toNTriples + " " +
                q.o.toNTriples).mkString(" | ") +
              "\n  expected: " + exp.take(8).map(q => q.s.toNTriples + " " +
                q.p.toNTriples + " " + q.o.toNTriples).mkString(" | "))
        }
    }
  }

  /** Positive/NegativeSyntaxTest: the action IRI is the query/update file
   * itself; a positive test must parse, a negative one must RAISE (the
   * reference's SyntaxTest). `.ru` files go through the Update grammar. */
  def runSyntaxEntry(e: Manifest.Entry, negative: Boolean): Outcome = {
    val file = e.query.orElse(e.request)
      .getOrElse(return Skipped("no action file"))
    val text = readFile(file)
    val qBase = "file://" + Paths.get(file).toAbsolutePath.getParent.toString + "/"
    val parsed: Either[Throwable, Unit] =
      try {
        if (file.endsWith(".ru")) graft.sparql.Parser.parseUpdate(text)
        else graft.sparql.Parser.parseAny(text, qBase, arq = file.endsWith(".arq"))
        Right(())
      } catch { case t: Throwable => Left(t) }
    (parsed, negative) match {
      case (Right(_), false) => Passed
      case (Left(_), true) => Passed
      case (Left(t), false) => Failed("did not parse: " + t.getMessage)
      case (Right(_), true) => Failed("parsed but must be rejected")
    }
  }

  def runEntry(spark: SparkSession, e: Manifest.Entry): Outcome = {
    // qt:serviceData: register each endpoint's dataset for loopback
    // federation (the reference's runner spins up in-process endpoints;
    // ours wires GraphSources into ServiceRegistry) — unregistered on exit
    e.serviceData.zipWithIndex.foreach { case ((ep, f), k) =>
      val ts = readData(f).map(t => Triple(
        mapBnodes(t.s, s"svc${k}_" + _), t.p, mapBnodes(t.o, s"svc${k}_" + _)))
      graft.algebra.ServiceRegistry.register(ep, Compiler.DfGraph(
        spark.createDataset(ts.distinct)(
          org.apache.spark.sql.Encoders.product[Triple]).toDF()))
    }
    try runEntryInner(spark, e)
    finally e.serviceData.foreach { case (ep, _) =>
      graft.algebra.ServiceRegistry.unregister(ep) }
  }

  private def runEntryInner(spark: SparkSession, e: Manifest.Entry): Outcome = {
    try {
      val queryFile = e.query.getOrElse(return Skipped("no qt:query"))
      val resultFile = e.result.getOrElse(return Skipped("no mf:result"))
      val queryText = readFile(queryFile)
      // relative IRIs in the query (GRAPH <data-g1.ttl>, FROM <…>) resolve
      // against the query file's location — the same file:// base the data
      // loader uses, so graph names and expected-result IRIs line up
      val qBase = "file://" + Paths.get(queryFile).toAbsolutePath.getParent.toString + "/"

      val form =
        try Parser.parseAny(queryText, qBase, arq = queryFile.endsWith(".arq"))
        catch { case ex: Exception => return Skipped("parser: " + ex.getMessage) }

      // each document gets its own bnode-label scope (the reference's
      // LabelToNode.createScopeByDocumentHash) — labels must not collide
      // across qt:data / qt:graphData files. RDF graphs are SETS: dedup
      // (reified-triple sugar can assert the same rdf:reifies triple twice)
      def scoped(ts: Seq[Triple], tag: String): Seq[Triple] =
        ts.map(t => Triple(mapBnodes(t.s, tag + "_" + _), t.p,
          mapBnodes(t.o, tag + "_" + _))).distinct
      // qt:data may be TriG (named-graph blocks) — those rows land in
      // named graphs of the quad dataset, not the default graph
      import graft.model.Quad
      val dataQuads: Seq[Quad] = e.data.zipWithIndex.flatMap { case (f, k) =>
        if (f.endsWith(".trig"))
          graft.riot.TrigLite.parse(readFile(f),
            "file://" + Paths.get(f).toAbsolutePath.toString)
            .map(q => Quad(mapBnodes(q.s, s"d${k}_" + _), q.p,
              mapBnodes(q.o, s"d${k}_" + _), q.g)).distinct
        else scoped(readData(f), s"d$k").map(t =>
          Quad(t.s, t.p, t.o, Term.defaultGraph))
      }
      val defTriples = dataQuads.collect {
        case q if q.g.lex == Term.DEFAULT_GRAPH => Triple(q.s, q.p, q.o) }
      // named graphs are named by their file:// location (how the
      // reference's manifest runner loads qt:graphData)
      val useQuads = e.graphData.nonEmpty ||
        dataQuads.size != defTriples.size ||
        "(?is).*\\b(GRAPH|FROM)\\b.*".r.matches(queryText)
      val g: DataFrame =
        if (useQuads) {
          val dq = dataQuads
          // FROM / FROM NAMED name graphs by LOCATION — the reference's
          // runner loads those files into the dataset; mirror that for
          // file:// IRIs resolving to existing test files
          val fromFiles = "(?i)FROM\\s+(NAMED\\s+)?<([^>]+)>".r
            .findAllMatchIn(queryText)
            .map(m => graft.normalize.Iri.resolve(qBase, m.group(2)))
            .filter(_.startsWith("file://")).map(_.stripPrefix("file://"))
            .filter(p => Files.exists(Paths.get(p))).toList
          val namedFiles =
            (e.graphData ++ fromFiles).distinct.map(f =>
              Paths.get(f).toAbsolutePath.toString)
          val nq = namedFiles.zipWithIndex.flatMap { case (f, k) =>
            val gname = Term.iri("file://" + f)
            val ts = scoped(readData(f), s"g$k")
            // an EMPTY named graph still EXISTS in the dataset (GRAPH ?g
            // must enumerate it): a marker quad with NULL triple slots,
            // filtered out of every triple scan by the compiler
            if (ts.isEmpty) Seq(Quad(null, null, null, gname))
            else ts.map(t => Quad(t.s, t.p, t.o, gname))
          }
          spark.createDataset(dq ++ nq)(
            org.apache.spark.sql.Encoders.product[Quad]).toDF()
        } else spark.createDataset(defTriples)(
          org.apache.spark.sql.Encoders.product[Triple]).toDF()

      form match {
        case Parser.SelectQ(op) =>
          val actual = collectSolutions(Compiler.compile(op, g))
          val expected = resultFile match {
            case f if f.endsWith(".srx") =>
              collectSolutions(ResultSetIO.fromSparqlXml(spark, readFile(f)))
            case f if f.endsWith(".srj") =>
              collectSolutions(ResultSetIO.fromSparqlJson(spark, readFile(f)))
            case f if f.endsWith(".tsv") =>
              collectSolutions(ResultSetIO.fromTsv(spark, readFile(f)))
            case f if f.endsWith(".ttl") || f.endsWith(".n3") => rdfResultSet(f)
            case f if f.endsWith(".rdf") => rdfXmlResultSet(f)
            case f => return Skipped("result format: " + f.split('.').last)
          }
          val ordered = hasTopLevelOrderBy(queryText)
          // SELECT REDUCED permits ANY duplicate cardinality between
          // DISTINCT and none (the reference compares these tests with lax
          // cardinality, QueryEvalTest laxCardinality) — our Reduced is a
          // full dedup, so compare the solution SETS
          val lax = "(?is).*\\bREDUCED\\b.*".r.matches(queryText)
          val ok =
            if (lax) sameSolutions(actual.distinct, expected.distinct, ordered = false)
            else sameSolutions(actual, expected, ordered)
          if (ok) Passed
          else Failed(s"${actual.size} rows vs expected ${expected.size}\n" +
            s"actual:   ${render(actual.take(8))}\nexpected: ${render(expected.take(8))}")

        case Parser.AskQ(op) =>
          val actual = !Compiler.compile(op, g).isEmpty
          val expected = askExpected(resultFile)
          if (actual == expected) Passed
          else Failed(s"ASK: got $actual, expected $expected")

        case Parser.ConstructQ(template, op, quads) =>
          if (quads.nonEmpty)
            return Skipped("named-graph CONSTRUCT template (quad output; " +
              "no dataset-level expectation format in the gated suites)")
          val actualG = graft.algebra.Construct.construct(
            template, Compiler.compile(op, g))
          val actual = actualG.collect().map(rowTriple).toSeq
          if (!resultFile.endsWith(".ttl") && !resultFile.endsWith(".nt"))
            return Skipped("CONSTRUCT result format: " + resultFile.split('.').last)
          val expected = readData(resultFile)
          if (isoTT(actual, expected)) Passed
          else Failed(s"CONSTRUCT: ${actual.size} triples vs expected ${expected.size}")

        case _ => Skipped("query form not in runner (DESCRIBE)")
      }
    } catch {
      // Throwable: a harness must survive StackOverflowError from a
      // pathologically deep Column tree and report it as that case's
      // failure instead of killing the whole run
      case ex: Throwable =>
        Failed("exception: " + ex.getClass.getSimpleName + ": " + ex.getMessage)
    }
  }

  /** Execute one `mf:UpdateEvaluationTest`: build the pre-state quad
   * dataset (ut:data default + ut:graphData named, empty graphs as
   * existence markers), run the .ru request through the quad Update
   * engine, and compare the post-state graph-by-graph: the default graph
   * and every expected named graph must match by bnode isomorphism, and
   * any actual named graph NOT in the expectation must be empty (graph
   * EXISTENCE after emptying is representation-defined — Jena's mem
   * datasets drop empty graphs — so the comparison is content-based). */
  def runUpdateEntry(spark: SparkSession, e: Manifest.Entry): Outcome = {
    try {
      import graft.model.Quad
      val requestFile = e.request.getOrElse(return Skipped("no ut:request"))
      val post = e.updPost.getOrElse(return Skipped("no mf:result dataset"))

      def scoped(ts: Seq[Triple], tag: String): Seq[Triple] =
        ts.map(t => Triple(mapBnodes(t.s, tag + "_" + _), t.p,
          mapBnodes(t.o, tag + "_" + _))).distinct
      def quadsOf(spec: Manifest.DatasetSpec, tag: String): Seq[Quad] = {
        // ut:data may be TriG — its GRAPH blocks land in named graphs
        val dq = spec.data.zipWithIndex.flatMap { case (f, k) =>
          if (f.endsWith(".trig"))
            graft.riot.TrigLite.parse(readFile(f),
              "file://" + Paths.get(f).toAbsolutePath.toString)
              .map(q => Quad(mapBnodes(q.s, s"${tag}d${k}_" + _), q.p,
                mapBnodes(q.o, s"${tag}d${k}_" + _), q.g)).distinct
          else scoped(readData(f), s"${tag}d$k")
            .map(t => Quad(t.s, t.p, t.o, Term.defaultGraph)) }
        val nq = spec.graphData.zipWithIndex.flatMap { case ((f, name), k) =>
          val g = Term.iri(name)
          val ts = scoped(readData(f), s"${tag}g$k")
          if (ts.isEmpty) Seq(Quad(null, null, null, g))
          else ts.map(t => Quad(t.s, t.p, t.o, g))
        }
        dq ++ nq
      }

      val pre = spark.createDataset(quadsOf(e.updPre, "a"))(
        org.apache.spark.sql.Encoders.product[Quad]).toDF()
      val after = graft.sparql.Update.runDataset(pre, readFile(requestFile))

      // actual post-state, grouped by graph, markers dropped
      val actual: Map[String, Seq[Triple]] = after.collect().toSeq
        .flatMap { r =>
          def t(idx: Int): Term = {
            val x = r.getAs[Row](idx)
            if (x == null) null
            else Term(x.getByte(0), x.getString(1), x.getString(2), x.getString(3))
          }
          val g = t(3)
          if (t(0) == null) None else Some(g.lex -> Triple(t(0), t(1), t(2)))
        }
        .groupBy(_._1).map { case (g, ts) => g -> ts.map(_._2) }

      val dgLex = Term.defaultGraph.lex
      val expQuads = quadsOf(post, "e")
      val expDefault = expQuads.collect {
        case q if q.s != null && q.g.lex == dgLex => q.triple }
      val expNamed: Map[String, Seq[Triple]] = expQuads
        .filter(q => q.g.lex != dgLex).groupBy(_.g.lex)
        .map { case (g, qs) => g -> qs.filter(_.s != null).map(_.triple) }

      def iso(a: Seq[Triple], b: Seq[Triple]) = isoTT(a, b)

      val defaultBad =
        if (iso(actual.getOrElse(dgLex, Nil), expDefault)) None
        else Some(s"default graph: ${actual.getOrElse(dgLex, Nil).size} triples " +
          s"vs expected ${expDefault.size}")
      val namedBad = expNamed.collectFirst {
        case (name, exp) if !iso(actual.getOrElse(name, Nil), exp) =>
          s"graph <$name>: ${actual.getOrElse(name, Nil).size} triples " +
            s"vs expected ${exp.size}"
      }
      val extraBad = (actual.keySet - dgLex -- expNamed.keySet)
        .find(g => actual(g).nonEmpty)
        .map(g => s"unexpected non-empty graph <$g> (${actual(g).size} triples)")
      defaultBad.orElse(namedBad).orElse(extraBad) match {
        case Some(msg) => Failed(msg)
        case None => Passed
      }
    } catch {
      case ex: Throwable =>
        Failed("exception: " + ex.getClass.getSimpleName + ": " + ex.getMessage)
    }
  }

  // ------------------------------------------------------------ data & files

  private def readFile(path: String): String =
    new String(Files.readAllBytes(Paths.get(path)), "UTF-8")

  private def readData(path: String): Seq[Triple] = {
    // base = the FILE's own URI (not its directory): `<>` in the document
    // denotes the document — for qt:graphData that IS the graph name
    val base = "file://" + Paths.get(path).toAbsolutePath.toString
    if (path.endsWith(".nt"))
      readFile(path).split("\n").toSeq.flatMap(l => NTriples.parseLine(l, strict = false))
    else if (path.endsWith(".rdf"))
      graft.riot.RdfXmlLite.parse(readFile(path), base)
    else TurtleLite.parse(readFile(path), base)
  }

  private def rowTriple(r: Row): Triple = {
    def t(idx: Int): Term = {
      val x = r.getAs[Row](idx)
      Term(x.getByte(0), x.getString(1), x.getString(2), x.getString(3))
    }
    Triple(t(0), t(1), t(2))
  }

  // ------------------------------------------------- solution-set comparison

  type Solution = Map[String, Term]

  private def collectSolutions(df: DataFrame): Seq[Solution] = {
    // only term-struct columns are variables (a var-free query's internal
    // __unit gate column is not a binding)
    val vars = df.schema.fields.zipWithIndex.collect {
      case (f, idx) if f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType] =>
        (f.name, idx)
    }.toSeq
    df.collect().toSeq.map { r =>
      vars.flatMap { case (v, idx) =>
        val x = r.getAs[Row](idx)
        if (x == null) None
        else Some(v -> Term(x.getByte(0), x.getString(1), x.getString(2), x.getString(3)))
      }.toMap
    }
  }

  /** Value-canonical view of a term (equalsByValue): numeric/boolean/
   * dateTime lexical forms canonicalized; everything else as-is. */
  private def canonTerm(t: Term): Term =
    if (t.kind == Term.KIND_LIT && t.lang.isEmpty)
      Term(t.kind, Literals.canonLiteral(t.lex, t.dt), t.dt, "")
    else if (t.kind == Term.KIND_TRIPLE_TERM)
      NTriples.parseTripleTermComponents(t.lex) match {
        case Some((s, p, o)) =>
          Term(Term.KIND_TRIPLE_TERM,
            "<<( " + canonTerm(s).toNTriples + " " + canonTerm(p).toNTriples +
              " " + canonTerm(o).toNTriples + " )>>", "", "")
        case None => t
      }
    else t

  private def canonTriple(t: Triple): Triple =
    Triple(canonTerm(t.s), canonTriplePred(t.p), canonTerm(t.o))
  private def canonTriplePred(p: Term): Term = p

  /** Multiset equality of solution sets, bnode-isomorphism-aware: encode
   * each set as an RDF graph — one fresh row bnode per solution carrying a
   * marker plus (urn:v:var → term) edges — and reuse the graph Iso
   * matcher. Row bnodes absorb row permutation; term bnodes must map
   * consistently ACROSS rows, exactly the reference's semantics
   * (ResultsCompare.equalsByValue). */
  def sameSolutions(a: Seq[Solution], b: Seq[Solution], ordered: Boolean): Boolean =
    if (ordered) {
      a.size == b.size &&
        canonSeq(a).zip(canonSeq(b)).forall { case (x, y) => x == y }
    } else Iso.isomorphic(expandTT(encode(a)), expandTT(encode(b)))

  private val RowMarker = Term.iri("urn:graft:row")

  private def encode(sols: Seq[Solution]): Seq[Triple] =
    sols.zipWithIndex.flatMap { case (sol, k) =>
      val rowNode = Term.bnode(s"__row$k")
      Triple(rowNode, RowMarker, Term.string("r")) +:
        sol.toSeq.map { case (v, t) =>
          Triple(rowNode, Term.iri("urn:graft:v:" + v), canonTerm(t))
        }
    }

  /** Ordered compare: rename bnodes by first occurrence over the row
   * sequence (vars in sorted order) — sound because order is fixed. */
  private def canonSeq(sols: Seq[Solution]): Seq[Map[String, Term]] = {
    val seen = scala.collection.mutable.Map[String, String]()
    def rename(t: Term): Term =
      mapBnodes(canonTerm(t), l => seen.getOrElseUpdate(l, "c" + seen.size))
    sols.map { sol =>
      sol.toSeq.sortBy(_._1).map { case (v, t) => v -> rename(t) }.toMap
    }
  }

  /** Detect a top-level ORDER BY (ordered result-set comparison, like the
   * reference's QueryEvalTest ordered mode). Only an ORDER BY at brace
   * depth 0 orders the outer results — a subquery / LATERAL ORDER BY does
   * not (ARQ Lateral suite nests them). Strings and comments are skipped
   * so braces inside literals do not confuse the depth count. */
  private def hasTopLevelOrderBy(q: String): Boolean = {
    var depth = 0; var i = 0
    val n = q.length
    while (i < n) {
      q.charAt(i) match {
        case '{' => depth += 1; i += 1
        case '}' => depth -= 1; i += 1
        case c @ ('"' | '\'') =>
          i += 1
          while (i < n && q.charAt(i) != c) {
            if (q.charAt(i) == '\\') i += 1
            i += 1
          }
          i += 1
        case '#' => while (i < n && q.charAt(i) != '\n') i += 1
        case c if (c == 'O' || c == 'o') && depth == 0 &&
          q.regionMatches(true, i, "ORDER", 0, 5) =>
          var j = i + 5
          while (j < n && q.charAt(j).isWhitespace) j += 1
          if (q.regionMatches(true, j, "BY", 0, 2)) return true
          i += 1
        case _ => i += 1
      }
    }
    false
  }

  /** DAWG result-set-in-RDF format (vocabulary
   * http://www.w3.org/2001/sw/DataAccess/tests/result-set#), used by the
   * older data-r2 suites: rs:solution → rs:binding → (rs:variable,
   * rs:value), optional rs:index for ordered sets. */
  private def rdfResultSet(path: String): Seq[Solution] = {
    val RS = "http://www.w3.org/2001/sw/DataAccess/tests/result-set#"
    val triples = readData(path)
    val byS = triples.groupBy(_.s)
    def objs(s: Term, p: String): Seq[Term] =
      byS.getOrElse(s, Nil).collect { case t if t.p.lex == p => t.o }
    val sols = triples.filter(_.p.lex == RS + "solution").map(_.o)
    val indexed = sols.map { sNode =>
      val bindings = objs(sNode, RS + "binding").flatMap { b =>
        for {
          v <- objs(b, RS + "variable").headOption
          value <- objs(b, RS + "value").headOption
        } yield v.lex -> value
      }.toMap
      val idx = objs(sNode, RS + "index").headOption.map(_.lex.toDouble)
      (idx, bindings)
    }
    if (indexed.forall(_._1.isDefined)) indexed.sortBy(_._1.get).map(_._2)
    else indexed.map(_._2)
  }

  /** The same DAWG result-set vocabulary serialized as (constrained)
   * RDF/XML — `rs:solution rdf:parseType="Resource"` elements with
   * rs:index / rs:binding(variable, value); values are literals
   * (rdf:datatype / xml:lang), rdf:resource IRIs or rdf:nodeID bnodes.
   * A targeted DOM walk, not a general RDF/XML parser (which stays out
   * of scope, SURVEY §7.4). */
  private def rdfXmlResultSet(path: String): Seq[Solution] = {
    val RS = "http://www.w3.org/2001/sw/DataAccess/tests/result-set#"
    val RDFNS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    val factory = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    factory.setNamespaceAware(true)
    val doc = factory.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(readFile(path).getBytes("UTF-8")))
    def children(e: org.w3c.dom.Element, ns: String, local: String) = {
      val nl = e.getElementsByTagNameNS(ns, local)
      (0 until nl.getLength).map(nl.item(_).asInstanceOf[org.w3c.dom.Element])
        .filter(_.getParentNode eq e)
    }
    def valueTerm(v: org.w3c.dom.Element): Term = {
      val res = v.getAttributeNS(RDFNS, "resource")
      val nid = v.getAttributeNS(RDFNS, "nodeID")
      val dt = v.getAttributeNS(RDFNS, "datatype")
      val lang = v.getAttribute("xml:lang")
      if (res.nonEmpty) Term.iri(res)
      else if (nid.nonEmpty) Term.bnode(nid)
      else if (lang.nonEmpty) Term.langLit(v.getTextContent, lang)
      else if (dt.nonEmpty) Term.lit(v.getTextContent, dt)
      else Term.string(v.getTextContent)
    }
    val sols = doc.getElementsByTagNameNS(RS, "solution")
    val indexed = (0 until sols.getLength).map { k =>
      val sol = sols.item(k).asInstanceOf[org.w3c.dom.Element]
      val idx = children(sol, RS, "index").headOption.map(_.getTextContent.trim.toDouble)
      val bindings = children(sol, RS, "binding").flatMap { b =>
        for {
          v <- children(b, RS, "variable").headOption
          value <- children(b, RS, "value").headOption
        } yield v.getTextContent -> valueTerm(value)
      }.toMap
      (idx, bindings)
    }
    if (indexed.nonEmpty && indexed.forall(_._1.isDefined))
      indexed.sortBy(_._1.get).map(_._2)
    else indexed.map(_._2)
  }

  private def askExpected(resultFile: String): Boolean = {
    val text = readFile(resultFile)
    if (resultFile.endsWith(".srx"))
      "(?s).*<boolean>\\s*(true|false)\\s*</boolean>.*".r
        .findFirstMatchIn(text).map(_.group(1) == "true")
        .getOrElse(throw new IllegalArgumentException("no <boolean> in " + resultFile))
    else if (resultFile.endsWith(".srj"))
      "(?s).*\"boolean\"\\s*:\\s*(true|false).*".r
        .findFirstMatchIn(text).map(_.group(1) == "true")
        .getOrElse(throw new IllegalArgumentException("no boolean in " + resultFile))
    else if (resultFile.endsWith(".ttl") || resultFile.endsWith(".n3"))
      // DAWG result-set-in-RDF boolean (rs:boolean)
      readData(resultFile)
        .find(_.p.lex == "http://www.w3.org/2001/sw/DataAccess/tests/result-set#boolean")
        .map(_.o.lex == "true")
        .getOrElse(throw new IllegalArgumentException("no rs:boolean in " + resultFile))
    else throw new IllegalArgumentException("ASK result format: " + resultFile)
  }

  private def render(sols: Seq[Solution]): String =
    sols.map(s => s.toSeq.sortBy(_._1)
      .map { case (v, t) => s"?$v=${t.toNTriples}" }.mkString("{", " ", "}"))
      .mkString(" | ")
}
