package graft.sparql

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit => slit, _}

import graft.algebra._
import graft.algebra.TermCols
import graft.functions.{SparqlFunctions => SF}
import graft.model.{NTriplesEscape, Term}

/**
 * SPARQL SELECT parser — text → `graft.algebra.Op` (the reference path
 * QueryFactory.create → AlgebraGenerator, SURVEY.md §3.A steps 1–2,
 * jena-arq/.../sparql/algebra/AlgebraGenerator.java:105). A hand-rolled
 * recursive-descent parser over the SPARQL 1.1 SELECT core:
 *
 *   PREFIX/BASE, SELECT [DISTINCT|REDUCED] (vars | * | (expr AS ?v) with
 *   aggregates), FROM / FROM NAMED, WHERE { triples with ';' ',' 'a',
 *   property paths (^p, p1/p2, p1|p2, p+, p*, p?, !(...), p{n,m}),
 *   RDF-star quoted triples (constants AND variable slots), blank nodes
 *   as non-distinguished variables, FILTER, OPTIONAL, MINUS, UNION,
 *   BIND, VALUES, GRAPH, FILTER [NOT] EXISTS, nested groups },
 *   GROUP BY (vars + expressions) / HAVING (incl. inline aggregates) /
 *   ORDER BY (vars + expressions) / LIMIT / OFFSET.
 *
 * Solution modifiers wrap in the reference's documented order
 * (AlgebraGenerator.java:480–592): group → having-filter → order →
 * project → distinct/reduced → slice. Expressions compile straight to
 * Column trees over term structs via SparqlFunctions (no interpreter);
 * unknown function names resolve through graft.functions.Registry.
 *
 * ASK / CONSTRUCT / DESCRIBE text forms parse via `parseAny`; SPARQL
 * Update requests via `parseUpdate`; subqueries (`{ SELECT ... }`) nest
 * with per-SELECT aggregate scoping. SERVICE parses to the algebra's
 * Service node (full syntax compatibility, sparql11 syntax-fed);
 * EXECUTION raises in the Compiler — federation is out of scope
 * (SURVEY §7.4). The ARQ path EXTENSIONS `P_Shortest`/`P_Multi`/
 * `P_Distinct` are deliberately absent: standard SPARQL 1.1 query text
 * has no surface syntax for them (ARQ builds them only through its Java
 * algebra API), so no parsable query can reach them — documented raise
 * per SURVEY §2.8. The reference itself does not evaluate P_Shortest
 * (jena-arq/.../sparql/path/eval/PathEvaluator.java:158 throws
 * ARQNotImplemented), and P_Distinct/P_Multi only toggle the result
 * CARDINALITY engine (PathEvaluator.java:142–154); our PathEval is
 * set-based throughout, i.e. P_Distinct semantics — the unique-results
 * mode SPARQL 1.1 itself specifies for `*`/`+`.
 */
object Parser {

  /** Parsed query form (Query.java's SELECT/ASK/CONSTRUCT trichotomy). */
  sealed trait QueryForm
  final case class SelectQ(op: Op) extends QueryForm
  final case class AskQ(op: Op) extends QueryForm
  final case class ConstructQ(template: Seq[TriplePattern], op: Op,
                              quads: Seq[QuadPat] = Nil) extends QueryForm
  /** DESCRIBE <iri>... | DESCRIBE ?v [WHERE {...}] — resources to slice
   * (concise bounded description) either named directly or bound by the
   * pattern. */
  final case class DescribeQ(iris: Seq[String], vars: Seq[String],
                             where: Option[Op]) extends QueryForm

  /** Parsed SPARQL Update operations (reference AST: update/Update*.java;
   * executed by graft.sparql.Update — UpdateEngineWorker.java:66,342,370).
   * Quad-aware: every triple carries an optional graph slot. */
  sealed trait UpdateAst
  /** One template/data entry: triple + optional GRAPH slot (None = the
   * default graph, or the WITH graph when one is declared). */
  final case class QuadPat(g: Option[TermPat], tp: TriplePattern)
  /** INSERT DATA / DELETE DATA — concrete quads only. */
  final case class UpdateData(insert: Boolean, quads: Seq[QuadPat]) extends UpdateAst
  /** [WITH <g>] DELETE {q} INSERT {q} [USING …] WHERE {p} (either template
   * may be empty); DELETE WHERE {p} parses as delete-template ==
   * where-pattern. `withGraph` redirects the default graph for templates
   * AND the WHERE; USING/USING NAMED re-scope the WHERE's dataset like
   * FROM / FROM NAMED (UpdateEngineWorker.java:342 + DynamicDatasets). */
  final case class UpdateModify(delete: Seq[QuadPat], insert: Seq[QuadPat],
                                where: Op,
                                withGraph: Option[String] = None,
                                usingDefault: Seq[String] = Nil,
                                usingNamed: Seq[String] = Nil) extends UpdateAst
  /** Graph-management target (GraphStore spec 3.2.2–3.2.5). */
  sealed trait GraphRef
  case object GDefault extends GraphRef
  final case class GNamed(iri: String) extends GraphRef
  case object GAllNamed extends GraphRef
  case object GAll extends GraphRef
  /** CLEAR (drop=false) / DROP (drop=true): CLEAR keeps the emptied graph
   * in the dataset, DROP removes it. */
  final case class UpdateClear(target: GraphRef, silent: Boolean,
                               drop: Boolean) extends UpdateAst
  final case class UpdateCreate(iri: String, silent: Boolean) extends UpdateAst
  /** ADD / COPY / MOVE src TO dst. */
  final case class UpdateTransfer(kind: String, from: GraphRef, to: GraphRef,
                                  silent: Boolean) extends UpdateAst
  /** LOAD <doc> [INTO GRAPH <g>] — no document fetch in this engine
   * (executors read datasets, not web documents): always an error, which
   * SILENT converts to a no-op (the W3C load-silent behavior). */
  final case class UpdateLoad(doc: String, into: Option[String],
                              silent: Boolean) extends UpdateAst

  /** `base` resolves relative IRIs in the query (the query file's
   * location, like QueryFactory.create(query, baseURI)); a BASE
   * declaration in the text overrides it. */
  def parse(query: String, base: String = "", arq: Boolean = false): Op =
    new P(query, base, arq).parseQuery()

  /** `arq = true` enables ARQ's extended syntax (the reference's
   * Syntax.syntaxARQ, used for `.arq` test files): LET assignment,
   * bare/AS-less SELECT and GROUP BY expressions, SELECT * with
   * GROUP BY, and quad CONSTRUCT templates. Standard mode keeps the
   * strict SPARQL 1.1/1.2 grammar (the W3C negative-syntax suites). */
  def parseAny(query: String, base: String = "", arq: Boolean = false): QueryForm =
    new P(query, base, arq).parseAnyForm()

  /** Parse a ';'-separated SPARQL Update request. */
  def parseUpdate(text: String): Seq[UpdateAst] = new P(text).parseUpdateOps()

  // ---------------------------------------------------------------------
  private final class P(s: String, baseIri: String = "", arqMode: Boolean = false) {
    private var i = 0
    private val prefixes = scala.collection.mutable.Map[String, String]()
    private var base = baseIri
    private var sawAgg = false
    /** Variables referenced in expression position OUTSIDE aggregate
     * arguments — read as per-SELECT-expression deltas to enforce the
     * grouped-query scope rule (vars must be group keys / earlier
     * aliases; SPARQL §19.8, the reference's Query.setResultVars check). */
    private val exprVarRefs = ListBuffer[String]()
    /** EXACT names of parser-internal helper vars (__bn_*, __qt*, __ord*,
     * __gk*) introduced so far — SELECT * drops precisely these, never a
     * legitimate user variable that happens to start with "__" (a user
     * ?__qt1 colliding with a generated name is vanishingly unlikely and
     * would be a scope error in any case). */
    private val hiddenVars = scala.collection.mutable.Set[String]()
    /** Property-function argument vars NOT bound in their own triples
     * block (→ the IRI that needs them): resolved by an enclosing
     * OPTIONAL via a correlated lateral, or a parse error at the end. */
    private val pfDeferredRefs =
      scala.collection.mutable.LinkedHashMap[String, String]()
    private def usedHiddenVars: Boolean = hiddenVars.nonEmpty

    /** Basic-graph-pattern scope for blank-node labels: a label may be
     * used in ONE BGP only (SPARQL §19.6; the reference rejects reuse
     * across OPTIONAL/UNION/GRAPH/groups — syntax-sparql4 syn-bad-3x).
     * The scope id bumps at every group entry and after every non-triples
     * element except FILTER (filters do not delimit a BGP). */
    private var bgpScopeCtr = 0
    private var bgpScope = 0
    private def newBgpScope(): Unit = { bgpScopeCtr += 1; bgpScope = bgpScopeCtr }
    private val bnodeLabelScope = scala.collection.mutable.Map[String, Int]()

    /** In-scope variables of a parsed pattern (SPARQL §18.2.1) — drives
     * the BIND / `(expr AS ?v)` "target must not already be in scope"
     * rejections (the reference's checks in SyntaxVarScope). */
    private def opVars(op: Op): Set[String] = {
      def pv(ps: Seq[TermPat]): Set[String] =
        ps.collect { case TVar(n) => n }.toSet
      op match {
        case Bgp(ps) => pv(ps.flatMap(tp => Seq(tp.s, tp.p, tp.o)))
        case PathPattern(s0, _, o0) => pv(Seq(s0, o0))
        case QuadBgp(g, ps) => pv(Seq(g) ++ ps.flatMap(tp => Seq(tp.s, tp.p, tp.o)))
        case GraphScope(_, in) => opVars(in)
        case GraphVarEnum(v, in) => opVars(in) + v
        case Project(vs, _) => vs.toSet
        case Filter(_, in) => opVars(in)
        case Extend(v, _, in) => opVars(in) + v
        case Table(vs, rows) => vs.toSet ++ rows.flatMap(_.keys)
        case Join(l, r) => opVars(l) ++ opVars(r)
        case LeftJoin(l, r, _) => opVars(l) ++ opVars(r)
        case SemiJoin(l, _) => opVars(l)
        case AntiJoin(l, _) => opVars(l)
        case Minus(l, _) => opVars(l)
        case ExistsFlag(v, _, in) => opVars(in) + v
        case DropVars(vs, in) => opVars(in) -- vs
        case Lateral(l, r) => opVars(l) ++ opVars(r)
        case Unfold(_, ov, iv, in) => opVars(in) + ov ++ iv
        case Group(keys, aggs, _) => keys.toSet ++ aggs.map(_._1)
        case Order(_, in) => opVars(in)
        case Slice(_, _, in) => opVars(in)
        case Distinct(in) => opVars(in)
        case Reduced(in) => opVars(in)
        case Union(l, r) => opVars(l) ++ opVars(r)
        case DatasetNames(g) => pv(Seq(g))
        case DatasetClause(_, _, in) => opVars(in)
        case Label(_, in) => opVars(in)
        case Null => Set.empty
        case ExtOp(_, vs, in) => opVars(in) ++ vs
        case GraphOp(_, vs, in) => opVars(in) ++ vs
        case Service(_, t, body, _) => pv(Seq(t)) ++ opVars(body)
      }
    }

    /** Variables a pattern ASSIGNS (BIND / VALUES / `AS` aliases /
     * UNFOLD targets) and still exposes — a Project hides the
     * assignments it drops. Drives the LATERAL restriction below. */
    private def assignedVars(op: Op): Set[String] = op match {
      case Extend(v, _, in) => assignedVars(in) + v
      case Table(vs, _) => vs.toSet
      case Unfold(_, ov, iv, in) => assignedVars(in) + ov ++ iv
      case Project(vs, in) => assignedVars(in).intersect(vs.toSet)
      case Group(keys, aggs, in) =>
        assignedVars(in).intersect(keys.toSet) ++ aggs.map(_._1)
      case Filter(_, in) => assignedVars(in)
      case Order(_, in) => assignedVars(in)
      case Slice(_, _, in) => assignedVars(in)
      case Distinct(in) => assignedVars(in)
      case Reduced(in) => assignedVars(in)
      case Label(_, in) => assignedVars(in)
      case DatasetClause(_, _, in) => assignedVars(in)
      case GraphScope(_, in) => assignedVars(in)
      case GraphVarEnum(_, in) => assignedVars(in)
      case DropVars(vs, in) => assignedVars(in) -- vs
      case ExistsFlag(_, _, in) => assignedVars(in)
      case Join(l, r) => assignedVars(l) ++ assignedVars(r)
      case LeftJoin(l, r, _) => assignedVars(l) ++ assignedVars(r)
      case Union(l, r) => assignedVars(l) ++ assignedVars(r)
      case Lateral(l, r) => assignedVars(l) ++ assignedVars(r)
      case Minus(l, _) => assignedVars(l)
      case SemiJoin(l, _) => assignedVars(l)
      case AntiJoin(l, _) => assignedVars(l)
      case GraphOp(_, _, in) => assignedVars(in)
      case _ => Set.empty // Bgp, PathPattern, QuadBgp, DatasetNames, Null, ExtOp
    }

    /** Does a TERM (a possible triple subject) begin at the cursor? Drives
     * the strict "triples must be '.'-separated" rejections. */
    private def peekTermStart: Boolean = {
      ws()
      peekVar || peekIs('<') || peekIs('_') || peekIs('"') || peekIs('\'') ||
        peekIs('(') || peekIs('[') || peekIs(':') ||
        (i < s.length && (s.charAt(i).isDigit ||
          ((s.charAt(i) == '+' || s.charAt(i) == '-') && i + 1 < s.length &&
            s.charAt(i + 1).isDigit))) ||
        kwAhead("true") || kwAhead("false") || peekPrefixedName()
    }

    /** Does a VERB (property-path start) begin at the cursor? A dangling
     * ';' or a subject-only statement is followed by something else. */
    private def peekVerbStart: Boolean = {
      ws()
      peekVar || aKeywordAhead || (peekIs('<') && !s.startsWith("<<", i)) ||
        peekIs(':') || peekIs('(') || peekIs('^') || peekIs('!') ||
        peekPrefixedName()
    }

    /** Non-null while parsing a FILTER constraint: each expression-level
     * [NOT] EXISTS{…} registers an `ExistsFlag` wrapper here and reads a
     * hidden boolean var — sound at ANY polarity/position (||, !, IF,
     * comparisons), unlike a semi/anti-join rewrite. The wrappers apply at
     * group end (with the other deferred EXISTS ops), the flag filters
     * right after, then the flags drop. */
    private var existsCtx: ListBuffer[Op => Op] = null
    private var existsVars: ListBuffer[String] = null
    private var exCounter = 0

    def parseAnyForm(): Parser.QueryForm = {
      val form = parseAnyForm0()
      checkDeferredPfRefs()
      form
    }

    private def parseAnyForm0(): Parser.QueryForm = {
      prologue()
      if (kwAhead("ASK")) {
        eatKw("ASK")
        ws(); if (kwAhead("WHERE")) eatKw("WHERE")
        val op = groupGraphPattern()
        ws()
        if (i < s.length) fail("trailing content after ASK pattern")
        Parser.AskQ(op)
      } else if (kwAhead("CONSTRUCT")) {
        eatKw("CONSTRUCT")
        ws()
        // long form: CONSTRUCT { template } …; short form: CONSTRUCT
        // [FROM …] WHERE { triples } — the braces are BOTH the template
        // and the pattern (ConstructQuery second alternative)
        val longForm = peekIs('{')
        var template: Seq[TriplePattern] = Nil
        var quadTmpl: Seq[Parser.QuadPat] = Nil
        if (longForm) {
          if (arqMode) {
            // ARQ quad templates: GRAPH blocks allowed (syntax-quad-construct)
            val qs = quadBlock()
            template = qs.collect { case Parser.QuadPat(None, tp) => tp }
            quadTmpl = qs.filter(_.g.isDefined)
          } else template = templateBlock()
        }
        val fromDefaults = ListBuffer[String]()
        val fromNamed = ListBuffer[String]()
        var goingFrom = true
        while (goingFrom) {
          if (eatKw2("FROM", "NAMED")) fromNamed += iriOnly()
          else if (eatKw("FROM")) fromDefaults += iriOnly()
          else goingFrom = false
        }
        expectKw("WHERE")
        var op =
          if (longForm) groupGraphPattern()
          else if (arqMode) {
            // ARQ short form may hold GRAPH blocks / nested groups: the
            // quad-aware template parse, then the same text as a pattern
            ws()
            val save = i
            val qs = quadBlock()
            template = qs.collect { case Parser.QuadPat(None, tp) => tp }
            quadTmpl = qs.filter(_.g.isDefined)
            i = save
            groupGraphPattern()
          } else {
            ws()
            val save = i
            template = templateBlock() // first pass: the template triples
            i = save
            groupGraphPattern() // second pass: the same text as a pattern
          }
        if (fromDefaults.nonEmpty || fromNamed.nonEmpty)
          op = DatasetClause(fromDefaults.toList, fromNamed.toList, op)
        var limit = -1L; var offset = 0L
        var more = true
        while (more) {
          if (eatKw("LIMIT")) limit = integer()
          else if (eatKw("OFFSET")) offset = integer()
          else more = false
        }
        if (limit >= 0 || offset > 0)
          op = Slice(offset, if (limit >= 0) limit else Long.MaxValue, op)
        ws()
        if (i < s.length) fail("trailing content after CONSTRUCT")
        Parser.ConstructQ(template, applyTmplExts(op), quadTmpl)
      } else if (kwAhead("DESCRIBE")) {
        eatKw("DESCRIBE")
        ws()
        // DESCRIBE ( VarOrIri+ | '*' ) WhereClause? — vars and IRIs mix
        // freely (syntax-sparql2 syntax-form-describe02)
        val dVars = ListBuffer[String]()
        val iris = ListBuffer[String]()
        var star = false
        if (peekIs('*')) { i += 1; star = true }
        else {
          var goingD = true
          while (goingD) {
            ws()
            if (peekVar) dVars += varName()
            else if (peekIs('<') || peekIs(':') || peekPrefixedName()) iris += iriOnly()
            else goingD = false
          }
          if (dVars.isEmpty && iris.isEmpty) fail("DESCRIBE needs a target")
        }
        val w = if (kwAhead("WHERE") || peekIs('{')) {
          eatKw("WHERE"); Some(groupGraphPattern())
        } else None
        ws()
        if (i < s.length) fail("trailing content after DESCRIBE")
        val vs =
          if (star)
            w.map(opVars(_).filterNot(hiddenVars).toSeq.sorted).getOrElse(Nil)
          else dVars.toList
        Parser.DescribeQ(iris.toList, vs, w)
      } else Parser.SelectQ(parseQueryNoPrologue())
    }

    /** CONSTRUCT template: plain triples (';' ',' 'a', bnode labels),
     * no paths/filters. */
    private def templateBlock(): Seq[TriplePattern] = {
      val saveBnodeMode = bnodeIsVar
      bnodeIsVar = false
      try templateBlock0()
      finally bnodeIsVar = saveBnodeMode
    }

    // template bnodes are remapped to FRESH bnodes per solution row by
    // Construct — collections/property lists expand to labeled template
    // bnodes and get that per-row remapping for free
    private var tbnCounter = 0
    private def tmplFreshB(): TermPat = {
      tbnCounter += 1; TConst(Term.bnode("tmpl" + tbnCounter))
    }
    /** Variable-bearing triple terms in TEMPLATES compile to hidden
     * `__ttN` columns Extended onto the WHERE op (TRIPLE(...) over the
     * solution's bindings); the template slot is then a plain TVar. The
     * accumulated extends wrap the op at ConstructQ/UpdateMod build. */
    private var ttCounter = 0
    private val tmplExts = ListBuffer[(String, RowExpr)]()
    private def applyTmplExts(op: Op): Op = {
      val wrapped = tmplExts.foldLeft(op) { case (o, (n, e)) => Extend(n, e, o) }
      tmplExts.clear()
      wrapped
    }
    private def tmplSlot(out: ListBuffer[TriplePattern]): TermPat = {
      ws()
      if (s.startsWith("<<(", i)) tmplTT(out)
      else if (s.startsWith("<<", i)) tmplReified(out)
      else if (peekIs('(')) tmplCollection(out)
      else if (peekIs('[')) tmplPropListNode(out)
      else termPat()
    }
    private def pat2re(p: TermPat): RowExpr = p match {
      case TVar(n) => RowExpr(v => v(n))
      case TConst(t) => RowExpr(_ => TermCols.const(t))
    }

    /** ARQ property functions recognized as magic predicates
     * (reference: sparql/pfunction/library/, registered in
     * PropertyFunctionRegistry; SURVEY §2.10). Parsed specially in
     * [[triplesBlock]]: list-object arguments stay RAW (no rdf:first/rest
     * collection desugar) and the pattern compiles to generator /
     * bind-or-filter ops instead of a stored-triple match. */
    private val ListNs = "http://jena.apache.org/ARQ/list#"
    private val ApfNs = "http://jena.apache.org/ARQ/property#"
    private val TextNs = "http://jena.apache.org/text#"
    private val propFuncIris: Set[String] = Set(
      ListNs + "member", ListNs + "index", ListNs + "length",
      "http://www.w3.org/2000/01/rdf-schema#member",
      ApfNs + "bag", ApfNs + "seq", ApfNs + "alt", ApfNs + "container",
      ApfNs + "splitIRI", ApfNs + "localname", ApfNs + "namespace",
      ApfNs + "str", ApfNs + "assign", ApfNs + "concat", ApfNs + "strSplit",
      TextNs + "query")
    /** Triple-term component in a template: term, nested `<<( )>>`, or
     * nested reified `<< >>` (its reifier node). Left = ground constant,
     * Right = per-solution expression. */
    private def tmplTTComp(out: ListBuffer[TriplePattern]): Either[Term, RowExpr] = {
      ws()
      if (s.startsWith("<<(", i)) {
        i += 3
        val a = tmplTTComp(out); val b = tmplTTComp(out); val c = tmplTTComp(out)
        ws()
        if (!s.startsWith(")>>", i)) fail("expected ')>>' closing triple term")
        i += 3
        (a, b, c) match {
          case (Left(x), Left(y), Left(z)) => Left(ttOf(x, y, z))
          case _ =>
            val (ca, cb, cc) =
              (a.fold(t => RowExpr(_ => TermCols.const(t)), identity),
                b.fold(t => RowExpr(_ => TermCols.const(t)), identity),
                c.fold(t => RowExpr(_ => TermCols.const(t)), identity))
            Right(RowExpr(v => SF.tripleFn(ca(v), cb(v), cc(v))))
        }
      } else if (s.startsWith("<<", i)) {
        tmplReified(out) match {
          case TConst(t) => Left(t)
          case TVar(n) => Right(RowExpr(v => v(n)))
        }
      } else if (peekIs('[')) {
        i += 1; ws()
        if (!peekIs(']')) fail("only '[]' (no property list) is allowed here")
        i += 1
        tmplFreshB() match {
          case TConst(t) => Left(t)
          case TVar(n) => Right(RowExpr(v => v(n)))
        }
      } else if (aKeywordAhead) { i += 1; Left(Term.iri(RdfNs + "type")) }
      else termPat() match {
        case TConst(t) => Left(t)
        case TVar(n) => Right(RowExpr(v => v(n)))
      }
    }
    private def tmplTT(out: ListBuffer[TriplePattern]): TermPat =
      tmplTTComp(out) match {
        case Left(t) => TConst(t)
        case Right(ex) =>
          ttCounter += 1
          val nv = "__tt" + ttCounter
          tmplExts += (nv -> ex)
          TVar(nv)
      }
    /** Reified triple in a template: `<< s p o ( ~ reifier )? >>` emits a
     * `reifier rdf:reifies tt` template triple; the value is the reifier
     * (a fresh template bnode — remapped per solution — unless named). */
    private def tmplReified(out: ListBuffer[TriplePattern]): TermPat = {
      i += 2
      val a = tmplTTComp(out); val b = tmplTTComp(out); val c = tmplTTComp(out)
      ws()
      val reif: TermPat =
        if (peekIs('~')) {
          i += 1; ws()
          if (s.startsWith(">>", i)) tmplFreshB() else termPat()
        } else tmplFreshB()
      ws()
      if (!s.startsWith(">>", i)) fail("expected '>>' closing reified triple")
      i += 2
      val tt: TermPat = (a, b, c) match {
        case (Left(x), Left(y), Left(z)) => TConst(ttOf(x, y, z))
        case _ =>
          ttCounter += 1
          val nv = "__tt" + ttCounter
          val (ca, cb, cc) =
            (a.fold(t => RowExpr(_ => TermCols.const(t)), identity),
              b.fold(t => RowExpr(_ => TermCols.const(t)), identity),
              c.fold(t => RowExpr(_ => TermCols.const(t)), identity))
          tmplExts += (nv -> RowExpr(v => SF.tripleFn(ca(v), cb(v), cc(v))))
          TVar(nv)
      }
      out += TriplePattern(reif, TConst(Term.iri(RdfNs + "reifies")), tt)
      reif
    }
    /** Annotation tail in a template: asserts the base triple (caller did)
     * and reifies it per block. */
    private def tmplAnnotation(subj: TermPat, pred: TermPat, obj: TermPat,
        out: ListBuffer[TriplePattern]): Unit = {
      def ttSlot(): TermPat = (subj, pred, obj) match {
        case (TConst(x), TConst(y), TConst(z)) => TConst(ttOf(x, y, z))
        case _ =>
          ttCounter += 1
          val nv = "__tt" + ttCounter
          val (ca, cb, cc) = (pat2re(subj), pat2re(pred), pat2re(obj))
          tmplExts += (nv -> RowExpr(v => SF.tripleFn(ca(v), cb(v), cc(v))))
          TVar(nv)
      }
      var reifier: Option[TermPat] = None
      var going = true
      while (going) {
        ws()
        if (peekIs('~')) {
          i += 1; ws()
          val r =
            if (peekIs('{') || peekIs('~') || peekIs('.') || peekIs(';') ||
              peekIs(',') || peekIs('}')) tmplFreshB()
            else termPat()
          out += TriplePattern(r, TConst(Term.iri(RdfNs + "reifies")), ttSlot())
          reifier = Some(r)
        } else if (s.startsWith("{|", i)) {
          i += 2
          val r = reifier.getOrElse {
            val fb = tmplFreshB()
            out += TriplePattern(fb, TConst(Term.iri(RdfNs + "reifies")), ttSlot())
            fb
          }
          ws()
          if (!s.startsWith("|}", i)) tmplPredObjList(r, out)
          ws()
          if (!s.startsWith("|}", i)) fail("expected '|}' closing annotation")
          i += 2
          reifier = None
        } else going = false
      }
    }
    private def tmplCollection(out: ListBuffer[TriplePattern]): TermPat = {
      i += 1; ws()
      val items = ListBuffer[TermPat]()
      while (!peekIs(')')) {
        if (i >= s.length) fail("unterminated collection in template")
        items += tmplSlot(out); ws()
      }
      i += 1
      if (items.isEmpty) TConst(Term.iri(RdfNs + "nil"))
      else {
        val nodes = items.toList.map(_ => tmplFreshB())
        nodes.zip(items).zipWithIndex.foreach { case ((n, item), k) =>
          out += TriplePattern(n, TConst(Term.iri(RdfNs + "first")), item)
          out += TriplePattern(n, TConst(Term.iri(RdfNs + "rest")),
            if (k == items.size - 1) TConst(Term.iri(RdfNs + "nil")) else nodes(k + 1))
        }
        nodes.head
      }
    }
    private def tmplPropListNode(out: ListBuffer[TriplePattern]): TermPat = {
      i += 1; ws()
      val n = tmplFreshB()
      if (peekIs(']')) { i += 1; n }
      else { tmplPredObjList(n, out); ws(); expect(']'); n }
    }
    private def tmplPredObjList(subj: TermPat, out: ListBuffer[TriplePattern]): Unit = {
      var moreProps = true
      while (moreProps) {
        ws()
        val pred: TermPat =
          if (peekVar) TVar(varName()) else TConst(Term.iri(iriOnly()))
        var moreObjs = true
        while (moreObjs) {
          val obj = tmplSlot(out)
          out += TriplePattern(subj, pred, obj)
          ws()
          tmplAnnotation(subj, pred, obj, out)
          if (peekIs(',')) i += 1 else moreObjs = false
        }
        ws()
        if (peekIs(';')) { i += 1; ws()
          if (peekIs('.') || peekIs('}') || peekIs(']')) moreProps = false }
        else moreProps = false
      }
    }
    /** One template statement: subject + its predicate-object list. */
    private def tmplStatement(out: ListBuffer[TriplePattern]): Unit = {
      val subj = tmplSlot(out)
      ws()
      if (!peekIs('.') && !peekIs('}')) tmplPredObjList(subj, out)
    }

    private def templateBlock0(): Seq[TriplePattern] = {
      expect('{')
      val out = ListBuffer[TriplePattern]()
      ws()
      while (!peekIs('}')) {
        tmplStatement(out)
        ws()
        if (peekIs('.')) i += 1
        ws()
      }
      i += 1
      out.toList
    }

    /** Quad template/data block: bare triples (default graph / WITH graph)
     * interleaved with `GRAPH <g>/?v { triples }` sections (the Quads
     * production of the Update grammar). */
    private def quadBlock(): Seq[Parser.QuadPat] = {
      val saveBnodeMode = bnodeIsVar
      bnodeIsVar = false
      try {
        expect('{')
        val out = ListBuffer[Parser.QuadPat]()
        ws()
        while (!peekIs('}')) {
          if (kwAhead("GRAPH")) {
            eatKw("GRAPH")
            ws()
            val gp: TermPat = if (peekVar) TVar(varName()) else TConst(iriTerm())
            out ++= templateBlock0().map(t => Parser.QuadPat(Some(gp), t))
          } else if (peekIs('{')) {
            // ARQ quad template: a bare nested block is default-graph
            // triples (syntax-quad-construct-09)
            out ++= templateBlock0().map(t => Parser.QuadPat(None, t))
          } else {
            val tmp = ListBuffer[TriplePattern]()
            tmplStatement(tmp)
            out ++= tmp.map(t => Parser.QuadPat(None, t))
          }
          ws()
          if (peekIs('.')) i += 1
          ws()
        }
        i += 1
        out.toList
      } finally bnodeIsVar = saveBnodeMode
    }

    def parseQuery(): Op = {
      prologue()
      val op = selectBody()
      ws()
      if (i < s.length) fail(s"trailing content: '${s.substring(i).take(30)}'")
      checkDeferredPfRefs()
      op
    }

    /** Deferred property-function refs nothing bound are errors. */
    private def checkDeferredPfRefs(): Unit =
      pfDeferredRefs.headOption.foreach { case (n, iri) =>
        fail(s"<$iri> argument ?$n is not bound in the same triples block")
      }

    /** SPARQL 1.1 Update grammar (SPARQLParser's Update productions),
     * ';'-separated: INSERT/DELETE DATA (quads), DELETE WHERE,
     * [WITH] DELETE/INSERT [USING] WHERE, CLEAR/DROP/CREATE,
     * ADD/COPY/MOVE, LOAD. */
    /** Blank-node label → index of the update operation that used it: a
     * label may not recur in a LATER operation of the same request
     * (SPARQL 1.1 Update §19.6; syntax-update-54). */
    private val dataBnodeLabels = scala.collection.mutable.Map[String, Int]()
    private def checkDataBnodes(qs: Seq[Parser.QuadPat], opIdx: Int): Unit =
      qs.foreach { case Parser.QuadPat(g, tp) =>
        (g.toSeq ++ Seq(tp.s, tp.p, tp.o)).foreach {
          case TConst(t) if t.isBNode =>
            dataBnodeLabels.get(t.lex) match {
              case Some(prev) if prev != opIdx =>
                fail(s"blank node label _:${t.lex} reused across update operations")
              case _ => dataBnodeLabels(t.lex) = opIdx
            }
          case _ =>
        }
      }

    def parseUpdateOps(): Seq[Parser.UpdateAst] = {
      prologue()
      val out = ListBuffer[Parser.UpdateAst]()
      var going = true
      while (going) {
        ws()
        // per-operation prologues are legal between ';'-separated ops
        prologue()
        ws()
        if (i >= s.length) going = false
        else if (eatKw2("INSERT", "DATA")) {
          val d = dataBlock(allowBnodes = true)
          checkDataBnodes(d, out.size)
          out += Parser.UpdateData(insert = true, d)
        }
        else if (eatKw2("DELETE", "DATA"))
          out += Parser.UpdateData(insert = false, dataBlock(allowBnodes = false))
        else if (eatKw2("DELETE", "WHERE")) {
          val pat = quadBlock()
          requireNoBnodes(pat, "DELETE WHERE")
          out += Parser.UpdateModify(pat, Nil, quadsAsWhere(pat))
        } else if (kwAhead("WITH") || kwAhead("DELETE") || kwAhead("INSERT")) {
          val withG = if (eatKw("WITH")) Some(iriOnly()) else None
          if (eatKw2("DELETE", "WHERE")) {
            val pat = quadBlock()
            requireNoBnodes(pat, "DELETE WHERE")
            out += Parser.UpdateModify(pat, Nil, quadsAsWhere(pat), withG)
          } else {
            val del =
              if (eatKw("DELETE")) {
                val d = quadBlock(); requireNoBnodes(d, "DELETE template"); d
              } else Nil
            // NOTE: bnode labels in INSERT templates are instantiated
            // fresh per operation — reuse across operations is legal
            // (basic-update insert-where-same-bnode); only INSERT DATA
            // carries the §19.6 cross-operation reuse restriction.
            val ins = if (eatKw("INSERT")) quadBlock() else Nil
            if (del.isEmpty && ins.isEmpty)
              fail("DELETE/INSERT WHERE needs at least one template")
            val usingD = ListBuffer[String]()
            val usingN = ListBuffer[String]()
            var goingU = true
            while (goingU) {
              if (eatKw2("USING", "NAMED")) usingN += iriOnly()
              else if (eatKw("USING")) usingD += iriOnly()
              else goingU = false
            }
            expectKw("WHERE")
            out += Parser.UpdateModify(del, ins, applyTmplExts(groupGraphPattern()),
              withG, usingD.toList, usingN.toList)
          }
        } else if (kwAhead("CLEAR") || kwAhead("DROP")) {
          val drop = kwAhead("DROP")
          if (drop) eatKw("DROP") else eatKw("CLEAR")
          val silent = eatKw("SILENT")
          val target: Parser.GraphRef =
            if (eatKw("GRAPH")) Parser.GNamed(iriOnly())
            else if (eatKw("DEFAULT")) Parser.GDefault
            else if (eatKw("NAMED")) Parser.GAllNamed
            else if (eatKw("ALL")) Parser.GAll
            else fail("CLEAR/DROP needs GRAPH <iri> | DEFAULT | NAMED | ALL")
          out += Parser.UpdateClear(target, silent, drop)
        } else if (eatKw("CREATE")) {
          val silent = eatKw("SILENT")
          expectKw("GRAPH")
          out += Parser.UpdateCreate(iriOnly(), silent)
        } else if (kwAhead("ADD") || kwAhead("COPY") || kwAhead("MOVE")) {
          val kind =
            if (eatKw("ADD")) "ADD" else if (eatKw("COPY")) "COPY"
            else { eatKw("MOVE"); "MOVE" }
          val silent = eatKw("SILENT")
          def ref(): Parser.GraphRef =
            if (eatKw("DEFAULT")) Parser.GDefault
            else { eatKw("GRAPH"); Parser.GNamed(iriOnly()) }
          val from = ref()
          expectKw("TO")
          val to = ref()
          out += Parser.UpdateTransfer(kind, from, to, silent)
        } else if (eatKw("LOAD")) {
          val silent = eatKw("SILENT")
          val doc = iriOnly()
          val into = if (eatKw2("INTO", "GRAPH")) Some(iriOnly()) else None
          out += Parser.UpdateLoad(doc, into, silent)
        } else fail("unsupported update operation")
        ws()
        // operations are ';'-separated (UpdateUnit grammar) — juxtaposed
        // operations are a syntax error (syntax-update-bad-07)
        if (peekIs(';')) i += 1
        else if (i < s.length) fail("expected ';' between update operations")
      }
      out.toList
    }

    /** DELETE WHERE's quads act as their own WHERE pattern: bare triples
     * form a BGP, graph'd sections quad-BGPs, joined on shared vars. */
    private def quadsAsWhere(quads: Seq[Parser.QuadPat]): Op = {
      val bare = quads.collect { case Parser.QuadPat(None, tp) => tp }
      val byG = quads.collect { case Parser.QuadPat(Some(gp), tp) => (gp, tp) }
        .groupBy(_._1)
      val parts: Seq[Op] =
        (if (bare.nonEmpty) Seq(Bgp(bare)) else Nil) ++
          byG.toSeq.sortBy(_._1.toString).map { case (gp, tps) =>
            QuadBgp(gp, tps.map(_._2)) }
      parts.reduceLeftOption(Join(_, _)).getOrElse(Table(Nil, Seq(Map.empty)))
    }

    /** Concrete-quads block for INSERT/DELETE DATA — no variables. */
    private def dataBlock(allowBnodes: Boolean): Seq[Parser.QuadPat] = {
      val qs = quadBlock()
      qs.foreach { case Parser.QuadPat(g, tp) =>
        (g.toSeq ++ Seq(tp.s, tp.p, tp.o)).foreach {
          case TVar(n) => fail(s"variable ?$n not allowed in DATA block")
          case TConst(t) if t.isBNode && !allowBnodes =>
            fail("blank node not allowed in DELETE DATA")
          case _ =>
        }
      }
      qs
    }

    private def requireNoBnodes(qs: Seq[Parser.QuadPat], where: String): Unit =
      qs.foreach { case Parser.QuadPat(_, tp) =>
        Seq(tp.s, tp.p, tp.o).foreach {
          case TConst(t) if t.isBNode => fail(s"blank node not allowed in $where")
          case _ =>
        }
      }

    private def parseQueryNoPrologue(): Op = {
      val op = selectBody()
      ws()
      if (i < s.length) fail(s"trailing content: '${s.substring(i).take(30)}'")
      op
    }

    /** SELECT query body (no prologue, no end-of-input check — reused by
     * subqueries, AlgebraGenerator's SUB SELECT path). Aggregate detection
     * (`sawAgg`) is scoped per SELECT so a subquery's aggregates never
     * force grouping onto the outer query. */
    private def selectBody(): Op = {
      val outerSawAgg = sawAgg
      sawAgg = false
      try selectBody0()
      finally sawAgg = outerSawAgg
    }

    private def selectBody0(): Op = {
      expectKw("SELECT")
      val distinct = eatKw("DISTINCT")
      val reduced = !distinct && eatKw("REDUCED")
      val proj = projection()

      // dataset clauses (FROM / FROM NAMED) — applied to the pattern
      val fromDefaults = ListBuffer[String]()
      val fromNamed = ListBuffer[String]()
      var goingFrom = true
      while (goingFrom) {
        if (eatKw2("FROM", "NAMED")) fromNamed += iriOnly()
        else if (eatKw("FROM")) fromDefaults += iriOnly()
        else goingFrom = false
      }

      eatKw("WHERE")
      var op = groupGraphPattern()
      // §19.8 projection rules (the reference's SyntaxVarScope checks):
      // no duplicate projected names; an AS target must not already be
      // in scope in the WHERE pattern (syn-bad-03, syntax-SELECTscope2)
      val projNames = proj.map { case SelVar(v) => v; case SelExpr(v, _, _, _) => v }
      projNames.diff(projNames.distinct).headOption.foreach(v =>
        fail(s"duplicate variable ?$v in SELECT projection"))
      val whereScopeForAs = opVars(op)
      if (fromDefaults.nonEmpty || fromNamed.nonEmpty)
        op = DatasetClause(fromDefaults.toList, fromNamed.toList, op)

      // GROUP BY: vars, (expr AS ?v), or bare (expr) → hidden key var
      var hiddenGroupExpr = false
      val groupKeys = if (eatKw2("GROUP", "BY")) {
        val ks = ListBuffer[String]()
        var goingG = true
        while (goingG) {
          ws()
          if (peekVar) ks += varName()
          else if (peekIs('(')) {
            expect('(')
            val e = expression()
            val v = if (eatKw("AS")) varName()
                    else {
                      hiddenGroupExpr = true
                      val hv = s"__gk${ks.size}"
                      hiddenVars += hv
                      hv
                    }
            expect(')')
            op = Extend(v, e, op)
            ks += v
          } else if (bareCallAhead) {
            // ARQ: `GROUP BY str(?p)` — bare call keyed by a hidden var
            val e = expression()
            hiddenGroupExpr = true
            val hv = s"__gk${ks.size}"
            hiddenVars += hv
            op = Extend(hv, e, op)
            ks += hv
          } else goingG = false
        }
        ks.toList
      } else Nil
      val selExprs = proj.collect { case SelExpr(v, e, _, _) => v -> e }
      val aggSelExprs = proj.collect { case SelExpr(v, e, true, _) => v -> e }
      val postSelExprs = proj.collect { case SelExpr(v, e, false, _) => v -> e }
      val grouped = groupKeys.nonEmpty || sawAgg
      // parse HAVING before finalizing the Group: an inline aggregate in
      // the constraint — HAVING(COUNT(?x) > 5) — must be HOISTED into the
      // Group's outputs (AlgebraGenerator allocates an internal var for
      // it); a Filter above the Group cannot hold an aggregate Column.
      var havingExpr: Option[RowExpr] = None
      var havingAgg = false
      if (eatKw("HAVING")) {
        val sawBefore = sawAgg
        sawAgg = false
        // HAVING takes one or more juxtaposed constraints — conjunctive
        // (HavingClause ::= 'HAVING' HavingCondition+)
        var he = constraint()
        while ({ ws(); peekIs('(') }) {
          val h2 = constraint()
          val h1 = he
          he = RowExpr(v => h1(v) && h2(v))
        }
        havingExpr = Some(he)
        havingAgg = sawAgg
        sawAgg = sawBefore || sawAgg
      }
      if (havingAgg && !grouped)
        fail("HAVING with an aggregate requires GROUP BY or an aggregated SELECT")
      // §19.8 AS-target in-scope rule (the reference's SyntaxVarScope):
      // ungrouped, the target must not be in scope in the WHERE pattern
      // (syn-bad-03, syntax-SELECTscope2). GROUPED, grouping re-scopes the
      // projection — only the GROUP BY-exposed vars conflict (checked
      // below; sparql12 group-by-scope-1 is legal, -bad-1..3 are not).
      if (!grouped) {
        proj.collect { case SelExpr(v, _, _, _) => v }
          .find(whereScopeForAs.contains)
          .foreach(v => fail(s"AS target ?$v is already in scope in the WHERE pattern"))
      }
      if (grouped) {
        // SELECT * cannot combine with grouping (syntax-query syn-bad-01);
        // ARQ's extended syntax permits it — the group keys project
        if (proj.isEmpty && !arqMode)
          fail("SELECT * cannot be used with GROUP BY or aggregates")
        // `(expr AS ?v)` must not redefine a var the GROUP BY exposes
        // (SPARQL §19.8 "in-scope" rule; group-by-scope syntax tests)
        selExprs.map(_._1).find(groupKeys.contains).foreach(v =>
          fail(s"SELECT expression reuses in-scope variable ?$v from GROUP BY"))
        // grouped-query projection scope (SPARQL §19.8): a projected var
        // must be a group key (or an earlier AS alias), and a
        // non-aggregate SELECT expression may only reference group keys
        // and earlier aliases. Vars inside aggregate arguments are exempt
        // (their refs were dropped by noNestedAgg's log rollback).
        val visible = scala.collection.mutable.Set[String](groupKeys: _*)
        proj.foreach {
          case SelVar(v) =>
            if (!visible.contains(v))
              fail(s"SELECT variable ?$v is not a GROUP BY key in a grouped query")
          case SelExpr(v, _, true, _) => visible += v
          case SelExpr(v, _, false, refs) =>
            refs.find(r => !visible.contains(r)).foreach(r =>
              fail(s"variable ?$r in SELECT expression is neither grouped nor an earlier alias"))
            visible += v
        }
        val aggs =
          if (havingAgg) aggSelExprs :+ ("__having" -> havingExpr.get)
          else aggSelExprs
        op = Group(groupKeys, aggs, op)
        // non-aggregate select expressions evaluate ABOVE the group, in
        // projection order, so they can reference earlier AS aliases
        // (e.g. (COUNT(?v) AS ?c) (?c+1 AS ?d))
        postSelExprs.foreach { case (v, e) => op = Extend(v, e, op) }
        havingExpr.foreach { c =>
          op = if (havingAgg) Filter(RowExpr(v => v("__having")), op) else Filter(c, op)
        }
        if (havingAgg && proj.isEmpty)
          fail("HAVING with an inline aggregate requires an explicit projection")
      } else {
        // plain SELECT expressions (no aggregation) are BINDs before the
        // projection (the reference's SELECT-expression extends,
        // AlgebraGenerator.java:535)
        selExprs.foreach { case (v, e) => op = Extend(v, e, op) }
        havingExpr.foreach(c => op = Filter(c, op))
      }

      var hiddenOrd = List.empty[String]
      var sortKeys = List.empty[SortKey]
      if (eatKw2("ORDER", "BY")) {
        val keys = ListBuffer[SortKey]()
        val ordExtends = ListBuffer[(String, RowExpr)]()
        // a bracketted key that is just "?v" sorts on the var directly;
        // anything else becomes a hidden BIND below the Order
        def brackettedKey(asc: Boolean): Unit = {
          expect('(')
          ws()
          val save = i
          if (peekVar) {
            val v = varName()
            ws()
            if (peekIs(')')) { i += 1; keys += SortKey(v, asc); return }
            i = save
          }
          val e = expression()
          expect(')')
          val hv = s"__ord${ordExtends.size}"
          hiddenVars += hv
          ordExtends += (hv -> e)
          keys += SortKey(hv, asc)
        }
        var going = true
        while (going) {
          ws()
          if (eatKw("ASC")) brackettedKey(asc = true)
          else if (eatKw("DESC")) brackettedKey(asc = false)
          else if (peekVar) keys += SortKey(varName(), ascending = true)
          else if (peekIs('(')) brackettedKey(asc = true)
          else if (peekIs(':') || (i < s.length && s.charAt(i).isLetter &&
            !kwAhead("LIMIT") && !kwAhead("OFFSET") && !kwAhead("VALUES") &&
            !kwAhead("GROUP") && !kwAhead("HAVING"))) {
            // bare built-in / cast / custom-function call as an order
            // condition: ORDER BY str(?o), xsd:integer(?o), :func2(?o)
            val e = functionCallE().asTermE
            val hv = s"__ord${ordExtends.size}"
            hiddenVars += hv
            ordExtends += (hv -> e)
            keys += SortKey(hv, ascending = true)
          }
          else going = false
        }
        ordExtends.foreach { case (v, e) => op = Extend(v, e, op) }
        sortKeys = keys.toList
        hiddenOrd = ordExtends.map(_._1).toList
      }

      val projVars = proj.map { case SelVar(v) => v; case SelExpr(v, _, _, _) => v }
      def applyProject(): Unit = {
        if (projVars.nonEmpty) op = Project(projVars, op)
        else if (hiddenOrd.nonEmpty || hiddenGroupExpr || usedHiddenVars) {
          // SELECT * — drop exactly the generated helper columns (a user
          // var merely starting with "__" survives)
          val hv = hiddenVars.toSet
          op = ExtOp(df => df.drop(df.columns.filter(hv.contains): _*), Nil, op)
        }
      }
      // Modifier order is order→project→distinct→slice
      // (AlgebraGenerator.java:480–592) — but dropDuplicates does NOT
      // preserve order, so DISTINCT/REDUCED over an ordered sequence must
      // dedup FIRST and sort AFTER (the reference's
      // TransformOrderByDistinctApplication rewrite). Legal exactly when
      // every sort key is a projected plain variable; otherwise keep the
      // literal order (an ORDER BY on a non-projected/derived key under
      // DISTINCT has no stable answer after projection anyway).
      val dedupThenSort = (distinct || reduced) && sortKeys.nonEmpty &&
        hiddenOrd.isEmpty &&
        sortKeys.forall(k => projVars.isEmpty || projVars.contains(k.v))
      if (dedupThenSort) {
        applyProject()
        op = if (distinct) Distinct(op) else Reduced(op)
        op = Order(sortKeys, op)
      } else {
        if (sortKeys.nonEmpty) op = Order(sortKeys, op)
        applyProject()
        if (distinct) op = Distinct(op)
        if (reduced) op = Reduced(op)
      }

      var limit = -1L; var offset = 0L
      var more = true
      while (more) {
        if (eatKw("LIMIT")) limit = integer()
        else if (eatKw("OFFSET")) offset = integer()
        else more = false
      }
      if (limit >= 0 || offset > 0)
        op = Slice(offset, if (limit >= 0) limit else Long.MaxValue, op)
      // trailing VALUES clause (grammar: SelectQuery … ValuesClause) —
      // joined with the query result (SPARQL 10.2)
      if (eatKw("VALUES")) op = Join(op, valuesClause())
      op
    }

    // ---- projection
    private sealed trait Sel
    private case class SelVar(v: String) extends Sel
    private case class SelExpr(v: String, e: RowExpr, agg: Boolean,
        refs: List[String] = Nil) extends Sel

    /** ARQ bare expression ahead: `name(...)` / `pn:fn(...)` — a function
     * or aggregate call standing alone in SELECT / GROUP BY (ARQ
     * extended syntax; standard SPARQL requires the `(expr AS ?v)`
     * form). */
    private def bareCallAhead: Boolean = arqMode && {
      ws()
      var j = i
      while (j < s.length && (graft.riot.Chars.pnChars(s.codePointAt(j)) ||
        s.charAt(j) == ':' || s.charAt(j) == '.'))
        j += Character.charCount(s.codePointAt(j))
      j > i && {
        val w = s.substring(i, j).toUpperCase
        var k = j
        while (k < s.length && Character.isWhitespace(s.charAt(k))) k += 1
        k < s.length && s.charAt(k) == '(' &&
          !Set("WHERE", "FROM", "GROUP", "HAVING", "ORDER", "LIMIT", "OFFSET",
            "VALUES", "EXISTS", "NOT", "FILTER", "BIND", "OPTIONAL", "MINUS",
            "SERVICE", "GRAPH", "UNION", "LATERAL", "LET", "SELECT").contains(w)
      }
    }

    private var selExprN = 0
    private def freshSelVar(): String = {
      selExprN += 1
      val hv = s"__sel$selExprN"
      hiddenVars += hv
      hv
    }

    private def projection(): List[Sel] = {
      val out = ListBuffer[Sel]()
      // vars MENTIONED in select expressions so far — an AS target may
      // not be among them (ARQ SyntaxVarScope; Syntax-ARQ scope-bad-1/2)
      val mentioned = scala.collection.mutable.Set[String]()
      ws()
      if (peekIs('*')) { i += 1; return Nil } // empty = keep all visible vars
      var going = true
      while (going) {
        ws()
        if (peekVar) out += SelVar(varName())
        else if (peekIs('(')) {
          expect('(')
          // track whether THIS expression contains an aggregate: a
          // non-aggregate select expression in a grouped query evaluates
          // ABOVE the Group (it may reference earlier AS aliases —
          // AlgebraGenerator's projectionExtends order)
          val sawBefore = sawAgg
          val refMark = exprVarRefs.length
          sawAgg = false
          val e = expression()
          val exprAgg = sawAgg
          sawAgg = sawBefore || sawAgg
          val refs = exprVarRefs.drop(refMark).toList
          // ARQ allows `(expr)` with no AS — a generated name
          val v =
            if (arqMode && { ws(); peekIs(')') }) freshSelVar()
            else { expectKw("AS"); varName() }
          expect(')')
          mentioned ++= refs
          if (mentioned.contains(v))
            fail(s"AS target ?$v is used in a SELECT expression (scope rule)")
          out += SelExpr(v, e, exprAgg, refs)
        } else if (bareCallAhead) {
          val sawBefore = sawAgg
          val refMark = exprVarRefs.length
          sawAgg = false
          val e = expression()
          val exprAgg = sawAgg
          sawAgg = sawBefore || sawAgg
          val refs = exprVarRefs.drop(refMark).toList
          mentioned ++= refs
          out += SelExpr(freshSelVar(), e, exprAgg, refs)
        } else going = false
      }
      if (out.isEmpty) fail("empty SELECT projection")
      out.toList
    }

    // ---- group graph pattern
    private def groupGraphPattern(): Op = {
      val (op, fils) = groupPatternParts()
      fils.foldLeft(op)((o, f) => Filter(f, o))
    }

    /** Parse a `{ … }` group, returning (pattern, top-level filters).
     * SPARQL scopes every FILTER to the WHOLE group regardless of its
     * textual position (AlgebraGenerator wraps OpFilter around the group
     * at the end) — so constraints are COLLECTED here and applied by the
     * caller: groupGraphPattern wraps them as Filter ops; OPTIONAL turns
     * them into the left-join condition (the LeftJoin expr of SPARQL
     * §6.2, AlgebraGenerator's getOfOptional path) so a filter on an
     * outer variable — `OPTIONAL { ?y :q ?w . FILTER(?v=2) }` — sees the
     * merged row, not the bare RHS. FILTER [NOT] EXISTS likewise applies
     * at group end (order among group-level filters is immaterial —
     * they are all row predicates over the same solution set). */
    private def groupPatternParts(): (Op, List[RowExpr]) = {
      expect('{')
      newBgpScope() // a group starts a fresh basic graph pattern
      ws()
      // a GroupGraphPattern may be a DIRECT SubSelect: '{' SELECT … '}'
      // (grammar rule GroupGraphPattern ::= '{' (SubSelect |
      // GroupGraphPatternSub) '}')
      if (kwAhead("SELECT")) {
        val sub = selectBody()
        expect('}')
        return (sub, Nil)
      }
      var current: Option[Op] = None
      val filters = ListBuffer[RowExpr]()
      val deferred = ListBuffer[Op => Op]() // EXISTS / NOT EXISTS at group end
      // constraints containing expression-level EXISTS: applied at group
      // end INSIDE this group (after their ExistsFlag wrappers), then the
      // spent flag vars drop. An OPTIONAL whose filter holds EXISTS thus
      // evaluates the flag over the RHS rows — ARQ evaluates such filters
      // over the merged row; divergence only when the EXISTS body names
      // left-only vars (rare; none of the W3C suites do).
      val flagFilters = ListBuffer[RowExpr]()
      val flagVars = ListBuffer[String]()
      def add(next: Op): Unit =
        current = Some(current.map(Join(_, next)).getOrElse(next))

      // tracks whether the LAST element was a GraphPatternNotTriples —
      // only those may be followed by an optional '.' (grammar
      // GroupGraphPatternSub); a '.' after a triples block was consumed
      // by the block itself, so a leftover one is the `?s ?p ?o . .`
      // double-dot error (syntax-sparql3 syn-bad-08..13)
      var lastNonTriples = false
      var going = true
      while (going) {
        ws()
        if (peekIs('}')) { i += 1; going = false }
        else if (eatKw("FILTER")) {
          ws()
          // Constraint ::= BrackettedExpression | BuiltInCall |
          // FunctionCall — a bare variable or literal must be rejected
          // (syntax-sparql3 filter-missing-parens)
          if (peekVar || peekIs('"') || peekIs('\'') ||
            (i < s.length && s.charAt(i).isDigit))
            fail("FILTER needs a bracketted expression, built-in, or function call")
          lastNonTriples = true
          if (eatKw("EXISTS")) {
            val r = groupGraphPattern()
            deferred += (o => SemiJoin(o, r))
          } else if (eatKw2("NOT", "EXISTS")) {
            val r = groupGraphPattern()
            deferred += (o => AntiJoin(o, r))
          } else {
            // [NOT] EXISTS may appear INSIDE the constraint at any
            // position — compiled to hidden boolean flags (see existsCtx)
            val save = existsCtx; val saveV = existsVars
            existsCtx = ListBuffer(); existsVars = ListBuffer()
            try {
              val c = constraint()
              if (existsCtx.nonEmpty) {
                deferred ++= existsCtx
                flagFilters += c
                flagVars ++= existsVars
              } else filters += c
            } finally { existsCtx = save; existsVars = saveV }
          }
        }
        else if (eatKw("OPTIONAL")) {
          val defBefore = pfDeferredRefs.keySet.toSet
          val (r, fils) = groupPatternParts()
          val defRefs = pfDeferredRefs.keySet.toSet -- defBefore
          val cond = fils.reduceOption((a, b) => RowExpr(v => a(v) && b(v)))
          val left = current.getOrElse(Table(Nil, Seq(Map.empty)))
          current = Some(
            if (defRefs.nonEmpty && defRefs.subsetOf(opVars(left))) {
              // RHS property functions read vars the LEFT binds: the
              // per-binding substitution OPTIONAL — correlated lateral
              // left join (unmatched left rows survive via lat's
              // LeftJoin-over-unit path)
              pfDeferredRefs --= defRefs
              Lateral(left, LeftJoin(Table(Nil, Seq(Map.empty)), r, cond))
            } else LeftJoin(left, r, cond))
          newBgpScope(); lastNonTriples = true
        }
        else if (eatKw("MINUS")) {
          val r = groupGraphPattern()
          current = Some(Minus(current.getOrElse(Table(Nil, Seq(Map.empty))), r))
          newBgpScope(); lastNonTriples = true
        }
        else if (eatKw("SERVICE")) {
          // SERVICE (SILENT)? (iri | var) group — parsed to the Service
          // node (syntax-fed); executes against ServiceRegistry endpoints
          val silent = eatKw("SILENT")
          ws()
          val target = if (peekVar) TVar(varName()) else TConst(iriTerm())
          ws()
          // capture the body's SOURCE TEXT, prologue-completed, for the
          // HTTP transport seam (ServiceRegistry.ServiceTransport): a
          // deployment with egress ships this string to the remote
          // endpoint; the local GraphSource path ignores it
          val bodyStart = i
          val body = groupGraphPattern()
          // the prologue must carry BASE too — a body using relative IRIs
          // would otherwise resolve against the REMOTE endpoint's base
          val baseDecl = // `base` here would hit a later local; qualify
            if (P.this.base.nonEmpty) s"BASE <${P.this.base}>\n" else ""
          val prologue = baseDecl +
            prefixes.map { case (p, ns) => s"PREFIX $p: <$ns>" }
              .mkString("", "\n", "\n")
          val bodyText = prologue + "SELECT * WHERE " +
            s.substring(bodyStart, i).trim
          val svc = Service(silent, target, body, Some(bodyText))
          current = Some(current.map(Join(_, svc)).getOrElse(svc))
          newBgpScope(); lastNonTriples = true
        }
        else if (eatKw("LATERAL")) {
          // ARQ extension (reference: sparql/algebra/op/OpLateral.java +
          // the LateralCheck syntax rule): the RHS is re-evaluated per
          // left row; it must be a group, and it may not ASSIGN (BIND /
          // VALUES / `AS`) a variable the left side already binds —
          // assignments hidden behind a sub-SELECT that does not project
          // them are fine (Syntax-Lateral suite, bad-01..08 vs 01..05).
          ws()
          if (!peekIs('{')) fail("LATERAL requires a group pattern")
          val left = current.getOrElse(Table(Nil, Seq(Map.empty)))
          val r = groupGraphPattern()
          assignedVars(r).filterNot(_.startsWith("__"))
            .intersect(opVars(left)).headOption.foreach(v =>
              fail(s"LATERAL assigns variable ?$v already bound on its left side"))
          current = Some(Lateral(left, r))
          newBgpScope(); lastNonTriples = true
        }
        else if (arqMode && eatKw("LET")) {
          // ARQ LET(?v := expr): assignment semantics (OpAssign,
          // QueryIterAssign.java:67–80) — fresh var binds like BIND; a
          // var the pattern already binds keeps rows only where the
          // values agree (sameValue on canonical terms = equality)
          expect('(')
          val v = varName()
          ws()
          if (!s.startsWith(":=", i)) fail("LET needs ':='")
          i += 2
          val e = expression()
          expect(')')
          val left = current.getOrElse(Table(Nil, Seq(Map.empty)))
          current = Some(
            if (opVars(left).contains(v))
              Filter(RowExpr(r => r(v) === e(r)), left)
            else Extend(v, e, left))
          lastNonTriples = true
        }
        else if (eatKw("BIND")) {
          expect('(')
          val e = expression()
          expectKw("AS")
          val v = varName()
          expect(')')
          // the BIND target must not already be in scope in this group
          // (SPARQL §19.8; syntax-query syntax-BINDscope6..8)
          if (current.exists(c => opVars(c).contains(v)))
            fail(s"BIND target ?$v is already in scope in this group")
          current = Some(Extend(v, e, current.getOrElse(Table(Nil, Seq(Map.empty)))))
          newBgpScope(); lastNonTriples = true
        }
        else if (eatKw("UNFOLD")) {
          // SPARQL-CDTs: UNFOLD(expr AS ?v1 (, ?v2)?) — one row per list
          // element (?v2 = 1-based index) / map entry (?v1 key, ?v2 value)
          expect('(')
          val e = expression()
          expectKw("AS")
          val v1 = varName()
          ws()
          val v2 = if (peekIs(',')) { i += 1; ws(); Some(varName()) } else None
          ws(); expect(')')
          Seq(Some(v1), v2).flatten.foreach { v =>
            if (current.exists(c => opVars(c).contains(v)))
              fail(s"UNFOLD target ?$v is already in scope in this group")
          }
          val hv = s"__unf${hiddenVars.size}"
          hiddenVars += hv
          val in = Extend(hv, e, current.getOrElse(Table(Nil, Seq(Map.empty))))
          current = Some(Unfold(hv, v1, v2, in))
          newBgpScope(); lastNonTriples = true
        }
        else if (eatKw("VALUES")) {
          add(valuesClause()); newBgpScope(); lastNonTriples = true
        }
        else if (eatKw("GRAPH")) {
          val gp = if (peekVar) TVar(varName()) else TConst(iriTerm())
          val inner = groupGraphPattern()
          (gp, inner) match {
            // GRAPH x {} — dataset-names enumeration / existence gate
            case (_, Table(Nil, rows)) if rows == Seq(Map.empty[String, Term]) =>
              add(DatasetNames(gp))
            case (_, Bgp(ps)) => add(QuadBgp(gp, ps))
            // constant graph: any body shape — re-scoped to that graph
            case (TConst(t), other) => add(GraphScope(t, other))
            // variable graph over a complex body — fast path: every inner
            // BGP becomes a quad pattern sharing a HIDDEN graph var, so
            // joins / OPTIONAL / UNION evaluate per named graph with NO
            // driver-side enumeration — and the USER var joins at the
            // boundary only (SPARQL 18.5 eval of Graph(var, P):
            // Join(eval(D[g], P), {var→g}); the body does NOT see ?g
            // pre-bound — the W3C graph-optional case). Bodies the rewrite
            // cannot express (paths, subqueries, MINUS, VALUES-only, a
            // filter on ?g itself) take the per-graph enumeration node.
            case (TVar(gv), other) =>
              gvCounter += 1
              val hv = s"__gv$gvCounter"
              scopeToGraphVar(other, hv, gv) match {
                case Some(scoped) if containsBgp(other) =>
                  hiddenVars += hv
                  add(ExtOp(df => {
                    if (df.columns.contains(gv))
                      df.filter(col(gv).isNull || col(gv) === col(hv))
                        .withColumn(gv, coalesce(col(gv), col(hv)))
                        .drop(hv)
                    else df.withColumnRenamed(hv, gv)
                  }, Seq(gv), scoped))
                case _ => add(GraphVarEnum(gv, other))
              }
          }
          newBgpScope(); lastNonTriples = true
        }
        else if (peekIs('{')) {
          // a group / subselect (groupGraphPattern handles both), or a
          // UNION chain over either form
          var acc = groupGraphPattern()
          while (eatKw("UNION")) acc = Union(acc, groupGraphPattern())
          add(acc)
          newBgpScope(); lastNonTriples = true
        }
        else {
          add(triplesBlock())
          lastNonTriples = false
        }
        ws()
        // optional statement dot ONLY after a GraphPatternNotTriples
        if (lastNonTriples && peekIs('.')) { i += 1; lastNonTriples = false }
      }
      val base = current.getOrElse(Table(Nil, Seq(Map.empty)))
      var out = deferred.foldLeft(base)((o, f) => f(o))
      if (flagFilters.nonEmpty) {
        out = flagFilters.foldLeft(out)((o, f) => Filter(f, o))
        out = DropVars(flagVars.toList, out)
      }
      (out, filters.toList)
    }

    /** Contiguous triple patterns with ';' ',' shorthand and paths. Path
     * expressions other than a plain link compile to PathPattern joined in.
     *
     * RDF-star: a quoted triple `<< … >>` containing VARIABLES desugars to
     * an internal variable over the opaque triple-term column plus
     * SUBJECT/PREDICATE/OBJECT accessor binds and filters — the
     * set-at-a-time twin of the reference's per-binding term unification
     * (SolverRX3.java:95–110). Variable scope: fresh vars bind (Extend),
     * vars already seen in this triples chunk unify (Filter); the chunk
     * flushes right after a quoted pattern so later patterns join on the
     * newly bound vars. */
    private def triplesBlock(): Op = {
      var op: Option[Op] = None
      val bgp = ListBuffer[TriplePattern]()
      val chunkVars = scala.collection.mutable.Set[String]()
      val pendingExt = ListBuffer[(String, RowExpr)]()
      val pendingFil = ListBuffer[RowExpr]()
      // property-function rewrites, applied over the WHOLE block's op at
      // the end (Jena's TransformPropertyFunction likewise splits magic
      // predicates out of the BGP and plans them after it): each entry
      // sees (block op so far, its bound vars) and decides bind-vs-filter
      val blockPf = ListBuffer[(Op, Set[String]) => Op]()
      def flushInto(next: Option[Op]): Unit = {
        // vars the BGP/path pieces bind directly — a pending accessor
        // Extend for one of those must become a unification Filter instead
        // (e.g. `<<?s ?p :o>> ?p ?z`: ?p is extracted from the triple term
        // AND matched as the outer predicate; the accessor decision was
        // made before the outer slots were parsed)
        val pieceVars: Set[String] =
          (bgp.flatMap(tp => Seq(tp.s, tp.p, tp.o)) ++ next.toSeq.flatMap {
            case PathPattern(s2, _, o2) => Seq(s2, o2)
            case _ => Nil
          }).collect { case TVar(n) => n }.toSet
        val pieces = (if (bgp.nonEmpty) Seq(Bgp(bgp.toList)) else Nil) ++ next.toSeq
        bgp.clear()
        pieces.foreach(p => op = Some(op.map(Join(_, p)).getOrElse(p)))
        pendingExt.foreach { case (v, e) =>
          if (pieceVars(v))
            op = Some(Filter(RowExpr(r => r(v) === e(r)), op.get))
          else op = Some(Extend(v, e, op.get))
        }
        pendingFil.foreach(f => op = Some(Filter(f, op.get)))
        pendingExt.clear()
        pendingFil.clear()
      }
      def note(p: TermPat): TermPat = {
        p match { case TVar(n) => chunkVars += n; case _ => }
        p
      }
      // (pattern, needs a chunk flush — quoted/reified forms bind hidden
      // vars that later patterns must see joined in)
      def slotPat(): (TermPat, Boolean) = {
        ws()
        if (s.startsWith("<<(", i)) {
          ttComp() match {
            case CC(t) => (TConst(t), false)
            case CN(a, b, c) =>
              val tv = freshQt()
              emitTTBindings(tv, a, b, c)
              (TVar(tv), true)
            case CV(n) => (TVar(n), true) // cannot arise from '<<('
          }
        } else if (s.startsWith("<<", i)) (reifiedPattern(), true)
        else if (peekIs('(')) (collectionPat(), false)
        else if (peekIs('[')) (bnodePropListPat(), false)
        else (note(termPat()), false)
      }
      /** Fresh hidden var over an opaque triple-term column. */
      def freshQt(): String = {
        qtCounter += 1
        val tv = "__qt" + qtCounter
        hiddenVars += tv
        chunkVars += tv
        tv
      }
      /** One component of a triple-term/reified-triple pattern: a var, a
       * constant, a NESTED var-bearing triple term, or a nested reified
       * triple (whose value is its reifier node). */
      def ttComp(predSlot: Boolean = false): TTComp = {
        ws()
        if (s.startsWith("<<(", i)) {
          i += 3
          val a = ttComp(); val b = ttComp(predSlot = true); val c = ttComp()
          ws()
          if (!s.startsWith(")>>", i)) fail("expected ')>>' closing triple term")
          i += 3
          (a, b, c) match {
            case (CC(x), CC(y), CC(z)) => CC(ttOf(x, y, z))
            case _ => CN(a, b, c)
          }
        } else if (s.startsWith("<<", i)) {
          reifiedPattern() match {
            case TVar(n) => CV(n)
            case TConst(t) => CC(t)
          }
        } else if (peekIs('[')) {
          // ANON `[]` inside a triple-term/reified pattern: a fresh
          // non-distinguished variable (property lists are not in the
          // ReifiedTriple/TripleTerm grammar — only bare blank nodes).
          // Never legal in the PREDICATE slot (Verb is var | iri only).
          if (predSlot) fail("a blank node cannot be a predicate")
          i += 1; ws()
          if (!peekIs(']')) fail("only '[]' (no property list) is allowed here")
          i += 1
          qtCounter += 1
          val hv = "__an" + qtCounter
          hiddenVars += hv
          chunkVars += hv
          CV(hv)
        } else if (aKeywordAhead) { i += 1; CC(Term.iri(RdfNs + "type")) }
        else termPat() match {
          case TVar(n) => CV(n)
          case TConst(t) => CC(t)
        }
      }
      /** Bind/unify the components of the triple term held in hidden var
       * `tv` via the SUBJECT/PREDICATE/OBJECT accessors — the
       * set-at-a-time twin of the reference's per-binding term
       * unification (SolverRX3.java:95–110). Fresh vars Extend, vars
       * already seen in the chunk Filter-unify, constants Filter-match;
       * nested triple terms recurse through a fresh hidden var. */
      def emitTTBindings(tv: String, a: TTComp, b: TTComp, c: TTComp): Unit = {
        pendingFil += RowExpr(v => SF.isTripleFn(v(tv)))
        def comp(cp: TTComp, acc: Column => Column): Unit = cp match {
          case CV(nm) =>
            if (chunkVars(nm)) pendingFil += RowExpr(v => v(nm) === acc(v(tv)))
            else {
              chunkVars += nm
              pendingExt += (nm -> RowExpr(v => acc(v(tv))))
            }
          case CC(t) => pendingFil += RowExpr(v => acc(v(tv)) === TermCols.const(t))
          case CN(x, y, z) =>
            val nv = freshQt()
            pendingExt += (nv -> RowExpr(v => acc(v(tv))))
            emitTTBindings(nv, x, y, z)
        }
        comp(a, SF.subjectFn); comp(b, SF.predicateFn); comp(c, SF.objectFn)
      }
      /** SPARQL 1.2 annotation tail after a pattern triple:
       * `( '~' reifier? )? ( '{|' predicateObjectList '|}' )*` — each
       * block matches `reifier rdf:reifies <triple term of (s,p,o)>` plus
       * the annotation patterns on the reifier. Returns whether anything
       * was parsed (caller flushes the chunk). */
      def patAnnotation(subj: TermPat, pred: TermPat, obj: TermPat): Boolean = {
        def asComp(p: TermPat): TTComp = p match {
          case TVar(n) => CV(n)
          case TConst(t) => CC(t)
        }
        def ttPat(): TermPat = (subj, pred, obj) match {
          case (TConst(x), TConst(y), TConst(z)) => TConst(ttOf(x, y, z))
          case _ =>
            val tv = freshQt()
            emitTTBindings(tv, asComp(subj), asComp(pred), asComp(obj))
            TVar(tv)
        }
        var any = false
        var reifier: Option[TermPat] = None
        var going = true
        while (going) {
          ws()
          if (peekIs('~')) {
            i += 1; ws()
            val r: TermPat =
              if (peekIs('{') || peekIs('~') || peekIs('.') || peekIs(';') ||
                peekIs(',') || peekIs('}')) {
                rfCounter += 1
                val hv = "__rf" + rfCounter; hiddenVars += hv; TVar(hv)
              } else note(termPat())
            bgp += TriplePattern(r, TConst(Term.iri(RdfNs + "reifies")), ttPat())
            reifier = Some(r)
            any = true
          } else if (s.startsWith("{|", i)) {
            i += 2
            val r = reifier.getOrElse {
              rfCounter += 1
              val hv = "__rf" + rfCounter; hiddenVars += hv
              val fresh = TVar(hv)
              bgp += TriplePattern(fresh, TConst(Term.iri(RdfNs + "reifies")), ttPat())
              fresh
            }
            ws()
            if (!s.startsWith("|}", i)) parsePredObjList(r, subjQt = false)
            ws()
            if (!s.startsWith("|}", i)) fail("expected '|}' closing annotation")
            i += 2
            reifier = None
            any = true
          } else going = false
        }
        any
      }
      /** SPARQL 1.2 reified triple pattern `<< s p o ( ~ reifier )? >>`:
       * adds `reifier rdf:reifies <triple term>` to the BGP and stands for
       * the reifier node (a fresh hidden — non-distinguished — var when
       * `~` is absent, mirroring the reference's desugaring in
       * ParserBase.createReifiedTriple). */
      def reifiedPattern(): TermPat = {
        i += 2 // '<<'
        val a = ttComp(); val b = ttComp(predSlot = true); val c = ttComp()
        ws()
        val reif: TermPat =
          if (peekIs('~')) {
            i += 1; ws()
            if (s.startsWith(">>", i)) { rfCounter += 1
              val hv = "__rf" + rfCounter; hiddenVars += hv; TVar(hv) }
            else note(termPat())
          } else { rfCounter += 1
            val hv = "__rf" + rfCounter; hiddenVars += hv; TVar(hv) }
        ws()
        if (!s.startsWith(">>", i)) fail("expected '>>' closing reified triple")
        i += 2
        val tt: TermPat = (a, b, c) match {
          case (CC(x), CC(y), CC(z)) => TConst(ttOf(x, y, z))
          case _ =>
            val tv = freshQt()
            emitTTBindings(tv, a, b, c)
            TVar(tv)
        }
        reif match { case TVar(n) => chunkVars += n; case _ => }
        bgp += TriplePattern(reif, TConst(Term.iri(RdfNs + "reifies")), tt)
        reif
      }
      /** `( e1 e2 … )` in a pattern slot: desugars to hidden
       * non-distinguished variables over rdf:first/rdf:rest/rdf:nil
       * patterns — matching the collection shape TurtleLite/real Turtle
       * emits in data (SPARQL 1.1 §4.2.2 Collections). */
      def collectionPat(): TermPat = {
        i += 1 // '('
        ws()
        val items = ListBuffer[TermPat]()
        while (!peekIs(')')) {
          if (i >= s.length) fail("unterminated collection")
          items += collItem()
          ws()
        }
        i += 1
        if (items.isEmpty) TConst(Term.iri(RdfNs + "nil"))
        else {
          val nodes = items.toList.map { _ =>
            collCounter += 1
            val hv = "__cl" + collCounter
            hiddenVars += hv
            TVar(hv)
          }
          nodes.zip(items).zipWithIndex.foreach { case ((n, item), k) =>
            bgp += TriplePattern(n, TConst(Term.iri(RdfNs + "first")), item)
            bgp += TriplePattern(n, TConst(Term.iri(RdfNs + "rest")),
              if (k == items.size - 1) TConst(Term.iri(RdfNs + "nil")) else nodes(k + 1))
          }
          nodes.head
        }
      }
      def collItem(): TermPat = {
        ws()
        if (s.startsWith("<<(", i)) ttComp() match {
          case CC(t) => TConst(t)
          case CV(n) => TVar(n)
          case CN(a, b, c) =>
            val tv = freshQt(); emitTTBindings(tv, a, b, c); TVar(tv)
        }
        else if (s.startsWith("<<", i)) reifiedPattern()
        else if (peekIs('(')) collectionPat()
        else if (peekIs('[')) bnodePropListPat()
        else note(termPat())
      }
      /** `[]` / `[ p o ; … ]` in a pattern slot: a hidden non-distinguished
       * variable (SPARQL blank-node semantics) plus its property patterns. */
      def bnodePropListPat(): TermPat = {
        i += 1 // '['
        ws()
        bplCounter += 1
        val hv = "__bpl" + bplCounter
        hiddenVars += hv
        val v = TVar(hv)
        if (peekIs(']')) { i += 1; v }
        else {
          parsePredObjList(v, subjQt = false)
          ws()
          expect(']')
          v
        }
      }
      /** Raw argument list of a property function: `( t1 t2 … )` kept as
       * terms (NOT collection-desugared), or a single term. */
      def pfTerm(): TermPat = {
        ws()
        if (peekIs('[')) {
          // ANON `[]` — a fresh don't-care variable
          i += 1; ws()
          if (!peekIs(']')) fail("only '[]' (no property list) is allowed in property-function args")
          i += 1
          pfCounter += 1; val hv = "__pfa" + pfCounter; hiddenVars += hv
          TVar(hv)
        } else termPat()
      }
      def pfArgs(): Seq[TermPat] = {
        ws()
        if (peekIs('(')) {
          i += 1; ws()
          val out = ListBuffer[TermPat]()
          while (!peekIs(')')) {
            if (i >= s.length) fail("unterminated property-function argument list")
            out += pfTerm()
            ws()
          }
          i += 1
          // `()` object = the rdf:nil constant, not an empty arg list
          if (out.isEmpty) Seq(TConst(Term.iri(RdfNs + "nil"))) else out.toList
        } else Seq(pfTerm())
      }
      /** One property-function application `subj <pf-iri> args`. Emission
       * is deferred to the end of the block so bind-vs-filter decisions
       * see every pattern-bound variable (reference:
       * TransformPropertyFunction splits pfuncs out of the BGP). */
      def emitPropFunc(iri: String, subj: TermPat): Unit = {
        val args = pfArgs()
        def arity(n: Int): Unit =
          if (args.size != n) fail(s"<$iri> takes $n object argument(s)")
        // bind-or-filter a slot against a computed per-row value; pure
        // value exprs must only reference block-bound vars; a ref bound
        // OUTSIDE the block is DEFERRED — an enclosing OPTIONAL that
        // binds it compiles to a correlated lateral left join (the
        // reference's per-binding substitution, PropertyFunctions
        // splitIRI-9); refs nothing ever binds fail at end of parse
        def unifyPure(slot: TermPat, refs: Seq[TermPat], value: RowExpr): Unit =
          blockPf += { (opIn, bound) =>
            refs.collect { case TVar(n) if !bound(n) => n }.foreach(n =>
              pfDeferredRefs.getOrElseUpdate(n, iri))
            slot match {
              case TVar(n) if !bound(n) => Extend(n, value, opIn)
              case other =>
                Filter(RowExpr(v => pat2re(other)(v) === value(v)), opIn)
            }
          }
        // graph-reading generator: f(subjCol, outCols) builds the
        // DataFrame transform; bound/constant out-slots unify via hidden
        // columns, an unbound subject is enumerated by the generator
        def graphGen(outs: Seq[TermPat])(
            f: (String, Seq[String]) => (org.apache.spark.sql.DataFrame,
              org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame): Unit =
          blockPf += { (opIn, bound) =>
            var cur = opIn
            val sv = subj match {
              case TVar(n) => n
              case TConst(t) =>
                pfCounter += 1; val hv = "__pfs" + pfCounter; hiddenVars += hv
                cur = Extend(hv, RowExpr(_ => TermCols.const(t)), cur); hv
            }
            // an out slot may only take its own name if it is a FRESH var
            // distinct from the subject column and every other out slot
            // (`?x rdfs:member ?x` unifies via a hidden column + filter)
            val taken = scala.collection.mutable.Set[String](sv)
            val outNames = outs.map {
              case TVar(n) if !bound(n) && !taken(n) => taken += n; n
              case _ =>
                pfCounter += 1; val hv = "__pfo" + pfCounter; hiddenVars += hv; hv
            }
            cur = GraphOp(f(sv, outNames), outNames, cur)
            outs.zip(outNames).foreach {
              case (TVar(n), h) if n == h => ()
              case (slot, h) =>
                cur = Filter(RowExpr(v => pat2re(slot)(v) === v(h)), cur)
            }
            cur
          }
        val localOf: Column => Column =
          c => regexp_extract(TermCols.lex(c), "([^/#]*)$", 1)
        val nsOf: Column => Column = { c =>
          val l = TermCols.lex(c)
          l.substr(slit(1), length(l) - length(localOf(c)))
        }
        iri match {
          case _ if iri == ListNs + "member" =>
            // list:member ≡ the path rdf:rest*/rdf:first (ListBaseList
            // semantics) — rides the existing iterative path machinery.
            // An UNBOUND subject enumerates proper list HEADS only
            // (GraphList.listsInGraph), not every interior cell.
            arity(1)
            args.head match { case TVar(n) => chunkVars += n; case _ => }
            blockPf += { (opIn, bound) =>
              val pp = PathPattern(subj,
                PSeq(PZeroOrMore(PLink(RdfNs + "rest")), PLink(RdfNs + "first")),
                args.head)
              val joined = Join(opIn, pp)
              subj match {
                case TVar(n) if !bound(n) =>
                  GraphOp((df, gdf) =>
                    PropFuncs.restrictToListHeads(df, gdf, n), Nil, joined)
                case _ => joined
              }
            }
          case _ if iri == ListNs + "index" =>
            arity(2)
            graphGen(args)((sv, outs) =>
              (df, gdf) => PropFuncs.listIndexJoin(df, gdf, sv, outs(0), outs(1)))
          case _ if iri == ListNs + "length" =>
            arity(1)
            graphGen(args)((sv, outs) =>
              (df, gdf) => PropFuncs.listLengthJoin(df, gdf, sv, outs(0)))
          case _ if iri.endsWith("rdf-schema#member") || iri == ApfNs + "container" =>
            arity(1)
            graphGen(args)((sv, outs) =>
              (df, gdf) => PropFuncs.containerMember(df, gdf, sv, outs(0)))
          case _ if iri == ApfNs + "bag" || iri == ApfNs + "seq" || iri == ApfNs + "alt" =>
            arity(1)
            val ty = iri.substring(ApfNs.length).capitalize
            graphGen(args)((sv, outs) =>
              (df, gdf) => PropFuncs.containerOfType(df, gdf, ty, sv, outs(0)))
          case _ if iri == ApfNs + "splitIRI" =>
            // namespace binds as an IRI term, localname as a string
            // (reference SplitIRI.java output node kinds)
            arity(2)
            val sre = pat2re(subj)
            blockPf += ((opIn, _) =>
              Filter(RowExpr(v => TermCols.isIri(sre(v))), opIn))
            unifyPure(args(0), Seq(subj), RowExpr(v => TermCols.iriTerm(nsOf(sre(v)))))
            unifyPure(args(1), Seq(subj), RowExpr(v => TermCols.strTerm(localOf(sre(v)))))
          case _ if iri == ApfNs + "localname" =>
            arity(1)
            val sre = pat2re(subj)
            unifyPure(args(0), Seq(subj), RowExpr(v => TermCols.strTerm(localOf(sre(v)))))
          case _ if iri == ApfNs + "namespace" =>
            arity(1)
            val sre = pat2re(subj)
            unifyPure(args(0), Seq(subj), RowExpr(v => TermCols.strTerm(nsOf(sre(v)))))
          case _ if iri == ApfNs + "str" =>
            // subject := plain-literal STR(object)
            arity(1)
            val ore = pat2re(args.head)
            unifyPure(subj, args, RowExpr(v => SF.str(ore(v))))
          case _ if iri == ApfNs + "assign" =>
            // bidirectional unification (reference assign.java): bind
            // whichever side is unbound; both bound ⇒ sameValue filter
            arity(1)
            blockPf += { (opIn, bound) =>
              def isBound(p: TermPat) = p match {
                case TVar(n) => bound(n); case _ => true
              }
              (subj, args.head) match {
                case (TVar(n), o) if !bound(n) && isBound(o) =>
                  Extend(n, pat2re(o), opIn)
                case (s0, TVar(n)) if !bound(n) && isBound(s0) =>
                  Extend(n, pat2re(s0), opIn)
                case (s0, o) if isBound(s0) && isBound(o) =>
                  Filter(RowExpr(v => pat2re(s0)(v) === pat2re(o)(v)), opIn)
                case _ => fail("apf:assign needs at least one bound side")
              }
            }
          case _ if iri == ApfNs + "concat" =>
            unifyPure(subj, args, RowExpr(v =>
              TermCols.strTerm(concat(args.map(a => TermCols.lex(pat2re(a)(v))): _*))))
          case _ if iri == ApfNs + "strSplit" =>
            arity(2)
            val sep = args(1) match {
              case TConst(t) => t.lex
              case TVar(n) => fail(s"apf:strSplit separator must be a constant (got ?$n)")
            }
            blockPf += { (opIn, bound) =>
              val inV = args.head match {
                case TVar(n) if bound(n) => n
                case TVar(n) => fail(s"apf:strSplit input ?$n is not bound in the block")
                case TConst(_) =>
                  pfCounter += 1; val hv = "__pfs" + pfCounter; hiddenVars += hv; hv
              }
              var cur = args.head match {
                case TConst(t) => Extend(inV, RowExpr(_ => TermCols.const(t)), opIn)
                case _ => opIn
              }
              subj match {
                case TVar(n) if !bound(n) =>
                  ExtOp(df => PropFuncs.strSplit(df, inV, sep, n), Seq(n), cur)
                case other =>
                  pfCounter += 1; val hv = "__pfo" + pfCounter; hiddenVars += hv
                  cur = ExtOp(df => PropFuncs.strSplit(df, inV, sep, hv), Seq(hv), cur)
                  Filter(RowExpr(v => pat2re(other)(v) === v(hv)), cur)
              }
            }
          case _ if iri == TextNs + "query" =>
            // text:query forms (TextQueryPF.java:65 arg parsing):
            //   ?s text:query "keywords"
            //   ?s text:query (ex:pred? "keywords" limit? ?score?)
            // The reference's subject-list score form `(?s ?score)
            // text:query …` is not parseable here (pfunc subjects are
            // single terms); the trailing ?score object var is this
            // engine's documented equivalent.
            if (args.isEmpty) fail("text:query needs arguments")
            var rest = args
            val pred = rest.head match {
              case TConst(t) if t.isIri => rest = rest.tail; Some(t.lex)
              case _ => None
            }
            val q = rest.headOption match {
              case Some(TConst(t)) if t.isLiteral => rest = rest.tail; t.lex
              case _ => fail("text:query needs a constant string query")
            }
            val lim = rest.headOption match {
              case Some(TConst(t)) if t.isLiteral && t.lex.matches("[0-9]+") =>
                rest = rest.tail; Some(t.lex.toInt)
              case _ => None
            }
            if (!rest.forall(_.isInstanceOf[TVar]) || rest.size > 1)
              fail("text:query: at most one trailing ?score variable")
            graphGen(rest)((sv, outs) => (df, gdf) =>
              PropFuncs.textQuery(df, gdf, sv, outs.headOption, pred, q, lim))
          case other => fail(s"unsupported property function <$other>")
        }
      }
      def parsePredObjList(subj: TermPat, subjQt: Boolean): Unit = {
        var moreProps = true
        while (moreProps) {
          ws()
          // predicate: a variable, or a property path (plain IRI = PLink)
          val predVar = if (peekVar) Some(note(TVar(varName())).asInstanceOf[TVar]) else None
          val pth = if (predVar.isEmpty) path() else PLink("")
          var moreObjs = true
          while (moreObjs) {
            (predVar, pth) match {
              case (None, PLink(iri)) if propFuncIris(iri) =>
                emitPropFunc(iri, subj)
              case _ =>
                val (obj, objQt) = slotPat()
                var annotated = false
                (predVar, pth) match {
                  case (Some(pv), _) =>
                    bgp += TriplePattern(subj, pv, obj)
                    annotated = patAnnotation(subj, pv, obj)
                  case (None, PLink(iri)) =>
                    bgp += TriplePattern(subj, TConst(Term.iri(iri)), obj)
                    annotated = patAnnotation(subj, TConst(Term.iri(iri)), obj)
                  case (None, other) => flushInto(Some(PathPattern(subj, other, obj)))
                }
                if (subjQt || objQt || annotated) flushInto(None)
            }
            ws()
            if (peekIs(',')) i += 1 else moreObjs = false
          }
          ws()
          if (peekIs(';')) {
            i += 1; ws()
            // a dangling ';' is legal — continue only if a verb follows
            // (`:s :p :o ; OPTIONAL {...}` / `; FILTER(?x)`: the property
            // list ends and the keyword belongs to the group)
            moreProps = peekVerbStart
          }
          else moreProps = false
        }
      }
      var going = true
      while (going) {
        ws()
        val subjIsTT = s.startsWith("<<(", i)
        val sizeBefore = bgp.size
        val extBefore = pendingExt.size
        val opBefore = op
        val (subj, subjQt) = slotPat()
        ws()
        // `[ p o ] .` — a subject-only statement is legal when the subject
        // form itself produced patterns (bnode property list, non-empty
        // collection, reified triple); a bare term/ANON/nil is NOT
        // (VarOrTerm requires PropertyListNotEmpty — syntax-sparql3
        // lone-node / lone-list / bnode-dot)
        if (peekVerbStart) parsePredObjList(subj, subjQt)
        else if (subjIsTT)
          fail("a triple term cannot stand alone as a statement")
        else if (bgp.size == sizeBefore && pendingExt.size == extBefore &&
          (op eq opBefore) && !subjQt)
          // nothing emitted (bnode lists with a PATH verb flush into `op`,
          // so compare that reference too)
          fail("expected a predicate-object list after the subject")
        ws()
        if (peekIs('.')) {
          i += 1; ws()
          // another triples line only if a term follows
          going = peekTermStart
        } else {
          // TriplesSameSubject must be '.'-separated: a juxtaposed term
          // here is the missing-DOT error (syntax-sparql3 syn-bad-02..04)
          if (peekTermStart)
            fail("expected '.' between triples")
          going = false
        }
      }
      flushInto(None)
      var res = op.getOrElse(Bgp(Nil))
      // a block holding ONLY property functions evaluates them over the
      // unit solution ({} — one empty row), not an empty BGP
      if (blockPf.nonEmpty && res == Bgp(Nil)) res = Table(Nil, Seq(Map.empty))
      blockPf.foreach { f => res = f(res, opVars(res)) }
      res
    }

    /** Bare `a` (rdf:type) next, as a whole word (not a pname prefix)? */
    private def aKeywordAhead: Boolean =
      i < s.length && s.charAt(i) == 'a' &&
        (i + 1 >= s.length || Character.isWhitespace(s.charAt(i + 1)) ||
          "<(\"'?$".indexOf(s.charAt(i + 1)) >= 0)

    private var qtCounter = 0
    private var rfCounter = 0
    private var collCounter = 0
    private var bplCounter = 0
    private var pfCounter = 0
    private var gvCounter = 0
    private val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

    /** Component of a triple-term / reified-triple PATTERN: variable,
     * constant, or nested var-bearing triple term. */
    private sealed trait TTComp
    private final case class CV(n: String) extends TTComp
    private final case class CC(t: Term) extends TTComp
    private final case class CN(a: TTComp, b: TTComp, c: TTComp) extends TTComp

    /** Rewrite a GRAPH ?v body: every BGP becomes a QuadBgp on the graph
     * var (shared across the body, so structure-preserving operators keep
     * per-graph semantics — and nothing is enumerated driver-side).
     * Returns None for shapes the shared-var rewrite cannot express
     * faithfully — paths, subqueries/aggregates, MINUS (a shared hidden
     * var would satisfy its ≥1-both-bound requirement artificially),
     * nested GRAPH — which fall back to GraphVarEnum. */
    private def scopeToGraphVar(op: Op, gv: String, userVar: String): Option[Op] = {
      def go(o: Op): Option[Op] = o match {
        case Bgp(ps) => Some(QuadBgp(TVar(gv), ps))
        case _: QuadBgp => None // nested GRAPH
        case Join(l, r) => for { a <- go(l); b <- go(r) } yield Join(a, b)
        case LeftJoin(l, r, c) =>
          if (c.exists(refsVar(_, userVar))) None
          else for { a <- go(l); b <- go(r) } yield LeftJoin(a, b, c)
        case SemiJoin(l, r) => for { a <- go(l); b <- go(r) } yield SemiJoin(a, b)
        case AntiJoin(l, r) => for { a <- go(l); b <- go(r) } yield AntiJoin(a, b)
        case Minus(_, _) => None // needs per-graph eval without a shared var
        case Union(l, r) => for { a <- go(l); b <- go(r) } yield Union(a, b)
        // an expression naming the graph var itself needs ARQ's
        // substitution semantics — only the enumeration path provides it
        case Filter(c, in) => if (refsVar(c, userVar)) None else go(in).map(Filter(c, _))
        case Extend(v, e, in) =>
          if (refsVar(e, userVar)) None else go(in).map(Extend(v, e, _))
        case ExistsFlag(v, r, in) => for { a <- go(r); b <- go(in) } yield ExistsFlag(v, a, b)
        case DropVars(vs, in) => go(in).map(DropVars(vs, _))
        case Distinct(in) => go(in).map(Distinct(_))
        case Reduced(in) => go(in).map(Reduced(_))
        case t: Table => Some(t) // VALUES is graph-independent
        case _ => None // paths, subqueries, aggregates, slices, …
      }
      go(op)
    }

    /** Conservatively decide whether a RowExpr references `name`: build it
     * once against a recording resolver; an expression that cannot be
     * probed (throws) is assumed to reference it. */
    private def refsVar(e: RowExpr, name: String): Boolean = {
      var found = false
      try e { n => if (n == name) found = true; slit(null).cast(TermCols.schema) }
      catch { case _: Throwable => return true }
      found
    }

    /** Does the op tree contain a triple-scanning leaf (so the QuadBgp
     * rewrite binds the hidden graph var at all)? */
    private def containsBgp(op: Op): Boolean = op match {
      case _: Bgp => true
      case Join(l, r) => containsBgp(l) || containsBgp(r)
      case LeftJoin(l, r, _) => containsBgp(l) || containsBgp(r)
      case SemiJoin(l, _) => containsBgp(l)
      case AntiJoin(l, _) => containsBgp(l)
      case Union(l, r) => containsBgp(l) && containsBgp(r)
      case Filter(_, in) => containsBgp(in)
      case Extend(_, _, in) => containsBgp(in)
      case ExistsFlag(_, _, in) => containsBgp(in)
      case DropVars(_, in) => containsBgp(in)
      case Distinct(in) => containsBgp(in)
      case Reduced(in) => containsBgp(in)
      case _ => false
    }

    private def valuesClause(): Op = {
      ws()
      if (peekVar) {
        val v = varName()
        expect('{')
        val rows = ListBuffer[Map[String, Term]]()
        ws()
        while (!peekIs('}')) {
          if (eatKw("UNDEF")) rows += Map.empty
          else rows += Map(v -> constTerm())
          ws()
        }
        i += 1
        Table(Seq(v), rows.toList)
      } else {
        expect('(')
        val vars = ListBuffer[String]()
        while (peekVar) vars += varName()
        expect(')')
        if (vars.distinct.size != vars.size)
          fail("duplicate variable in VALUES clause")
        expect('{')
        val rows = ListBuffer[Map[String, Term]]()
        ws()
        while (!peekIs('}')) {
          expect('(')
          val m = scala.collection.mutable.Map[String, Term]()
          vars.foreach { v =>
            ws()
            if (eatKw("UNDEF")) () else m(v) = constTerm()
          }
          expect(')')
          rows += m.toMap
          ws()
        }
        i += 1
        Table(vars.toList, rows.toList)
      }
    }

    // ---- property paths (subset: link, ^, /, |, +, *, ?, !(...)).
    // Grammar precedence (SPARQL 1.1 §18.2.2.6 Path productions):
    // '|' (PathAlternative) is LOOSER than '/' (PathSequence), which is
    // looser than '^'/modifiers — :p1|:p2/:p3|:p4 = :p1|(:p2/:p3)|:p4.
    private def path(): Path = {
      var l = pathSeq()
      while ({ ws(); peekIs('|') }) { i += 1; l = PAlt(l, pathSeq()) }
      l
    }
    private def pathSeq(): Path = {
      var l = pathEltOrInverse()
      while ({ ws(); peekIs('/') }) { i += 1; l = PSeq(l, pathEltOrInverse()) }
      l
    }
    // '^' wraps the WHOLE element incl. its modifier (^p* = ^(p*)) —
    // PathEltOrInverse ::= PathElt | '^' PathElt
    private def pathEltOrInverse(): Path = {
      ws()
      if (peekIs('^')) { i += 1; PInverse(pathElt()) } else pathElt()
    }
    private def pathElt(): Path = {
      ws()
      var p: Path = pathPrimary()
      // postfix modifiers
      ws()
      if (peekIs('+')) { i += 1; p = POneOrMore(p) }
      else if (peekIs('*')) { i += 1; p = PZeroOrMore(p) }
      else if (peekIs('?') && !isVarStart(i + 1)) { i += 1; p = PZeroOrOne(p) }
      else if (peekIs('{')) {
        // p{n}, p{n,}, p{n,m}, p{,m} — P_Mod / P_FixedLength
        i += 1
        ws()
        val n = if (i < s.length && s.charAt(i).isDigit) integer().toInt else 0
        ws()
        p = if (peekIs(',')) {
          i += 1; ws()
          val m = if (i < s.length && s.charAt(i).isDigit) integer().toInt else -1
          PMod(p, n, m)
        } else if (n >= 1) PFixedLength(p, n)
        else PMod(p, 0, 0)
        expect('}')
      }
      p
    }
    private def pathPrimary(): Path = {
      ws()
      if (peekIs('!')) {
        // !(p1|…|^q1|…) — members may be inverse (^iri); bare `!p` and
        // `!^p` (no parens) are also legal SPARQL
        i += 1
        val paren = peekIs('(')
        if (paren) i += 1
        val fwd = ListBuffer[String]()
        val inv = ListBuffer[String]()
        def member(): Unit = {
          ws()
          if (peekIs('^')) { i += 1; inv += iriOnly() } else fwd += iriOnly()
        }
        member()
        ws()
        if (paren) {
          while (peekIs('|')) { i += 1; member(); ws() }
          expect(')')
        }
        PNegPropSet(fwd.toList, inv.toList)
      } else if (peekIs('(')) {
        i += 1
        val p = path()
        expect(')')
        p
      } else PLink(iriOnly())
    }
    private def iriOnly(): String = {
      ws()
      if (peekIs('<')) iriRef()
      // `a:` / `a.b:` are PREFIXES, not the rdf:type keyword
      else if (!peekPrefixedName() && kwAhead("a")) {
        eatKw("a"); "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
      }
      else prefixedIri()
    }

    // ---- terms
    /** In QUERY patterns a blank node label is a non-distinguished
     * VARIABLE (SPARQL 1.1 §4.1.4 — it never matches a stored bnode by
     * label); in CONSTRUCT/Update templates it stays a template bnode.
     * templateBlock flips the mode. */
    private var bnodeIsVar = true

    private def termPat(): TermPat = {
      ws()
      if (peekVar) TVar(varName())
      else if (bnodeIsVar && peekIs('_')) {
        expect('_'); expect(':')
        val lbl = name()
        bnodeLabelScope.get(lbl) match {
          case Some(sc) if sc != bgpScope =>
            fail(s"blank node label _:$lbl is reused across basic graph patterns")
          case _ => bnodeLabelScope(lbl) = bgpScope
        }
        val hv = "__bn_" + lbl
        hiddenVars += hv
        TVar(hv)
      }
      else TConst(constTerm())
    }

    /** RDF 1.2 triple term `<<( s p o )>>` (SPARQL 1.2 TripleTerm
     * production) — CONSTANT components only here (variable-bearing forms
     * go through the pattern/expression paths), canonicalized to the
     * engine's opaque triple-term text (matching the N-Triples storage
     * form, so constants equi-match stored triple terms). */
    private def quotedTriple(): Term = {
      i += 3 // '<<('
      def slot(): Term = {
        ws()
        if (peekIs('?') || peekIs('$'))
          fail("variables are not allowed in a constant triple term here")
        if (aKeywordAhead) { i += 1; Term.iri(RdfNs + "type") }
        else constTerm()
      }
      val (ts, tp, to) = (slot(), slot(), slot())
      ws()
      if (!s.startsWith(")>>", i)) fail("expected ')>>' closing triple term")
      i += 3
      // a CONSTANT triple term denotes an RDF 1.2 term: its subject must
      // be an IRI or blank node (literals/triple terms cannot be subjects)
      if (ts.kind != Term.KIND_IRI && ts.kind != Term.KIND_BNODE)
        fail("triple-term subject must be an IRI or blank node")
      if (tp.kind != Term.KIND_IRI)
        fail("triple-term predicate must be an IRI")
      ttOf(ts, tp, to)
    }

    /** Canonical triple-term constant from three component terms. */
    private def ttOf(ts: Term, tp: Term, to: Term): Term =
      Term(Term.KIND_TRIPLE_TERM,
        "<<( " + ts.toNTriples + " " + tp.toNTriples + " " + to.toNTriples + " )>>",
        "", "")

    private def constTerm(): Term = {
      ws()
      if (s.startsWith("<<(", i)) quotedTriple()
      else if (s.startsWith("<<", i))
        fail("a reified triple << … >> is not a constant term (SPARQL 1.2: " +
          "use <<( s p o )>> for the triple term; << >> is pattern sugar)")
      else if (peekIs('<')) Term.iri(iriRef())
      else if (peekIs('"') || peekIs('\'')) literal()
      else if (peekIs('_')) { expect('_'); expect(':'); Term.bnode(name()) }
      else if (kwAhead("true")) { eatKw("true"); Term.lit("true", Term.XSD_BOOLEAN) }
      else if (kwAhead("false")) { eatKw("false"); Term.lit("false", Term.XSD_BOOLEAN) }
      else if (peekIs('-') || peekIs('+') || (i < s.length && s.charAt(i).isDigit))
        numberTerm()
      else Term.iri(prefixedIri())
    }

    private def iriTerm(): Term = Term.iri(iriOnly())

    private def numberTerm(): Term = {
      val start = i
      if (peekIs('-') || peekIs('+')) i += 1
      // '.' belongs to the number only when followed by a digit: SPARQL's
      // DECIMAL is `[0-9]* '.' [0-9]+`, so `123.0.` is a decimal then the
      // statement dot (unlike Turtle, which allows a trailing-dot decimal)
      while (i < s.length && (s.charAt(i).isDigit ||
        (s.charAt(i) == '.' && i + 1 < s.length && s.charAt(i + 1).isDigit) ||
        s.charAt(i) == 'e' || s.charAt(i) == 'E' ||
        ((s.charAt(i) == '-' || s.charAt(i) == '+') && (s.charAt(i - 1) == 'e' || s.charAt(i - 1) == 'E'))))
        i += 1
      val w = s.substring(start, i)
      if (w.exists(c => c == 'e' || c == 'E')) Term.lit(w, Term.XSD_DOUBLE)
      else if (w.contains('.')) Term.lit(w, Term.XSD_DECIMAL)
      else Term.lit(w, Term.XSD_INTEGER)
    }

    private def literal(): Term = {
      val quote = s.charAt(i)
      val longQ = s.startsWith(quote.toString * 3, i)
      val lex =
        if (longQ) {
          // long string ('''…''' / """…"""): may span lines and contain
          // bare quotes; escapes still processed
          i += 3
          val sb = new StringBuilder
          while (i < s.length && !s.startsWith(quote.toString * 3, i)) {
            if (s.charAt(i) == '\\' && i + 1 < s.length) {
              sb.append(s.charAt(i)).append(s.charAt(i + 1)); i += 2
            } else { sb.append(s.charAt(i)); i += 1 }
          }
          if (i >= s.length) fail("unterminated long string")
          i += 3
          checkCodepointEscapes(sb.toString)
          NTriplesEscape.unescape(sb.toString)
        } else {
          i += 1
          val sb = new StringBuilder
          while (i < s.length && s.charAt(i) != quote) {
            if (s.charAt(i) == '\\') { sb.append(s.charAt(i)).append(s.charAt(i + 1)); i += 2 }
            else { sb.append(s.charAt(i)); i += 1 }
          }
          i += 1
          checkCodepointEscapes(sb.toString)
          NTriplesEscape.unescape(sb.toString)
        }
      if (peekIs('@')) {
        i += 1
        val st = i
        while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '-')) i += 1
        val tag = s.substring(st, i)
        // RDF 1.2 LANGTAG: optional '--dir' suffix, dir ∈ {ltr, rtl}
        val di = tag.indexOf("--")
        if (di >= 0 && tag.substring(di + 2) != "ltr" && tag.substring(di + 2) != "rtl")
          fail(s"invalid base direction '${tag.substring(di + 2)}' (must be ltr or rtl)")
        Term.langLit(lex, tag)
      } else if (i + 1 < s.length && s.charAt(i) == '^' && s.charAt(i + 1) == '^') {
        i += 2
        Term.lit(lex, iriOnly())
      } else Term.string(lex)
    }

    // ---- expressions → RowExpr (Column trees; SPARQL || && = != < > etc.)

    /** Typed expression node: the Column a RowExpr produces is a SQL
     * BOOLEAN (comparisons, logical ops, type tests), a term STRUCT, or —
     * inside arithmetic chains — a narrow NUMERIC pair struct
     * `(v: DOUBLE, r: INT)` of shadow value and promotion rank.
     *
     * The coercions (SPARQL EBV, boolean→xsd:boolean term, term→numeric
     * shadow, numeric→canonical term) happen exactly ONCE at each kind
     * boundary. The numeric kind is load-bearing for plan size: a full
     * term-struct construction per arithmetic node (numericTerm) references
     * its operand ~30×, so nested arithmetic `((a+b)*c)-d` grows the
     * Catalyst tree ~30^depth — analysis then OOMs/stack-overflows on
     * queries the reference evaluates trivially (observed on the W3C
     * expr-ops suite). The pair struct keeps per-level fan-out ≤4 and
     * formats the lexical form once at the boundary, keeping whole-stage
     * codegen linear in expression size. */
    private sealed trait ExKind
    private case object KBool extends ExKind
    private case object KTerm extends ExKind
    private case object KNum extends ExKind
    /** A syntactic xsd:duration/dayTimeDuration constant — lets `+`/`-`
     * dispatch to dateTime±duration arithmetic statically. */
    private case object KDur extends ExKind
    private case class Ex(e: RowExpr, kind: ExKind) {
      def asBool: RowExpr = kind match {
        case KBool => e
        case KTerm | KDur => RowExpr(v => TermCols.ebv(e(v)))
        case KNum => RowExpr(v => e(v).getField("v") =!= 0.0)
      }
      def asTermE: RowExpr = kind match {
        case KBool => RowExpr(v => SF.toTerm(e(v)))
        case KTerm | KDur => e
        case KNum => RowExpr { v =>
          val p = e(v)
          TermCols.numericTerm(p.getField("v"), p.getField("r"))
        }
      }
      def asNum: RowExpr = kind match {
        case KNum => e
        case KTerm | KDur => RowExpr { v =>
          val t = e(v)
          struct(TermCols.numValue(t).as("v"), TermCols.numRank(t).as("r"))
        }
        // a bare boolean is not numeric → eval error (NULL pair)
        case KBool => RowExpr(_ => slit(null).cast(
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType),
            org.apache.spark.sql.types.StructField("r", org.apache.spark.sql.types.IntegerType)))))
      }
    }

    /** Boolean-valued view (FILTER / HAVING constraints) — a bracketted
     * expression rides primaryE's '(' handling. */
    private def constraint(): RowExpr = exprE().asBool

    /** Term-valued view (BIND, SELECT exprs, ORDER BY, function args). */
    private def expression(): RowExpr = exprE().asTermE

    private def exprE(): Ex = orE()

    private def orE(): Ex = {
      var l = andE()
      while ({ ws(); s.startsWith("||", i) }) {
        i += 2; val r = andE(); val lb = l.asBool; val rb = r.asBool
        l = Ex(RowExpr(v => lb(v) || rb(v)), KBool)
      }
      l
    }
    private def andE(): Ex = {
      var l = relE()
      while ({ ws(); s.startsWith("&&", i) }) {
        i += 2; val r = relE(); val lb = l.asBool; val rb = r.asBool
        l = Ex(RowExpr(v => lb(v) && rb(v)), KBool)
      }
      l
    }
    private def relE(): Ex = {
      val l = addExpr()
      ws()
      // IN / NOT IN (SPARQL 17.4.1.9/.10): a fold of `=` comparisons under
      // || — SPARQL's error-absorbing OR (a TRUE match wins over an
      // erroring member) falls out of SQL 3-valued OR; NOT IN is the
      // 3-valued negation
      if (eatKw("IN")) return inListEx(l, negated = false)
      if (kwAhead("NOT")) {
        val save = i
        eatKw("NOT")
        if (eatKw("IN")) return inListEx(l, negated = true) else i = save
      }
      val opStr =
        if (s.startsWith("!=", i)) "!=" else if (s.startsWith("<=", i)) "<="
        else if (s.startsWith(">=", i)) ">=" else if (peekIs('=')) "="
        else if (peekIs('<') && !isIriStart) "<" else if (peekIs('>')) ">"
        else ""
      if (opStr.isEmpty) return l
      i += opStr.length
      val r = addExpr()
      cmpEx(opStr, l, r)
    }

    /** `expr [NOT] IN ( e1, …, en )` — empty lists are legal:
     * IN () = false, NOT IN () = true. */
    private def inListEx(l: Ex, negated: Boolean): Ex = {
      expect('(')
      val items = ListBuffer[Ex]()
      ws()
      if (!peekIs(')')) {
        items += exprE()
        while ({ ws(); peekIs(',') }) { i += 1; items += exprE() }
      }
      expect(')')
      val folded: RowExpr =
        if (items.isEmpty) RowExpr(_ => slit(false))
        else items.toList.map(it => cmpEx("=", l, it).asBool)
          .reduce((a, b) => RowExpr(v => a(v) || b(v)))
      Ex(if (negated) RowExpr(v => !folded(v)) else folded, KBool)
    }

    private def cmpEx(opStr: String, l: Ex, r: Ex): Ex = {
      // an arithmetic operand keeps the comparison in the numeric shadow —
      // no term round-trip (a non-numeric other side is an eval error →
      // NULL → row dropped, the SPARQL comparison-error semantics)
      if (l.kind == KNum || r.kind == KNum) {
        val (ln, rn) = (l.asNum, r.asNum)
        return Ex(RowExpr { v =>
          val (x, y) = (ln(v).getField("v"), rn(v).getField("v"))
          opStr match {
            case "=" => x === y
            case "!=" => x =!= y
            case "<" => x < y
            case ">" => x > y
            case "<=" => x <= y
            case ">=" => x >= y
          }
        }, KBool)
      }
      val lt = l.asTermE
      val rt = r.asTermE
      Ex(RowExpr { v =>
        val (ta, tb) = (lt(v), rt(v))
        // Value comparison dispatched by VALUE SPACE (NodeValue.java:385,
        // SPARQL 17.3 operator mapping + the open-world extensions):
        // numeric double shadow, boolean truth value, zoned/unzoned
        // temporal epoch shadows (XSD's partial order: mixed zoned-ness is
        // determinate only beyond the ±14 h implicit-timezone window, else
        // a type ERROR), plain-string and lang-string spaces; the fallback
        // is RDFterm-equal — same term TRUE, two non-same literals a type
        // ERROR (NULL → row dropped), else FALSE. COALESCE form: a shadow
        // verdict is NULL unless BOTH sides live in that space, so the
        // first non-NULL verdict wins — and each operand is referenced
        // once per space (plan-size discipline, see numericTerm's note).
        import graft.model.{Term => T}
        val DT = T.XSD_DATETIME
        val DA = T.XSD + "date"
        val (na, nb) = (TermCols.numValue(ta), TermCols.numValue(tb))
        val (ba, bb) = (TermCols.boolValue(ta), TermCols.boolValue(tb))
        // temporal shadows keyed on (primitive type, zoned-ness): zoned ↔
        // unzoned compares only through the ±14 h window; date ↔ dateTime
        // never compares by value
        val (tza, tzb) = (TermCols.zonedEpoch(ta, DT), TermCols.zonedEpoch(tb, DT))
        val (tua, tub) = (TermCols.unzonedEpoch(ta, DT), TermCols.unzonedEpoch(tb, DT))
        val (dza, dzb) = (TermCols.zonedEpoch(ta, DA), TermCols.zonedEpoch(tb, DA))
        val (dua, dub) = (TermCols.unzonedEpoch(ta, DA), TermCols.unzonedEpoch(tb, DA))
        val (sa, sb2) = (TermCols.strValue(ta), TermCols.strValue(tb))
        val (la, lb) = (TermCols.langStrValue(ta), TermCols.langStrValue(tb))
        val W = 50400L // 14 h — XSD implicit-timezone window
        val err = slit(null).cast(org.apache.spark.sql.types.BooleanType)
        def bothLit = TermCols.isLiteral(ta) && TermCols.isLiteral(tb)
        // NVCompare.sameValueAs VSPACE_UNKNOWN branch: either side in an
        // unknown/invalid value space → same term TRUE; differing
        // lang-taggedness → disjoint spaces, determinate verdict;
        // otherwise type ERROR. Two KNOWN but different spaces
        // (string vs num, date vs dateTime, lang vs plain) →
        // VSPACE_DIFFERENT → determinate not-same-value.
        def unknownSpace =
          TermCols.unknownSpaceLit(ta) || TermCols.unknownSpaceLit(tb)
        def bothCdt(x: Column, y: Column) = {
          import graft.cdt.Cdt
          TermCols.dt(x).isin(Cdt.LIST, Cdt.MAP) &&
            TermCols.dt(y).isin(Cdt.LIST, Cdt.MAP)
        }
        // list-less-than / map-less-than (NULL for non-CDT operands, so it
        // slots into the coalesce chains as the last resort)
        def cdtCmp = when(bothCdt(ta, tb),
          graft.cdt.CdtFunctions.cdtCmpUdf(ta, tb))
        def langnessDiffers =
          (TermCols.dt(ta) === T.RDF_LANGSTRING) =!=
            (TermCols.dt(tb) === T.RDF_LANGSTRING)
        // reaching the fallback with two same-primitive temporals means the
        // zoned/unzoned window left the order INDETERMINATE → type error
        def samePrimTemporal =
          (TermCols.dt(ta) === DT && TermCols.dt(tb) === DT) ||
          (TermCols.dt(ta) === DA && TermCols.dt(tb) === DA)
        // determinate verdicts across zoned/unzoned of ONE primitive; NULL
        // (indeterminate → error fallthrough) inside the window
        def crossLt(za: Column, ub: Column, ua: Column, zb: Column) = coalesce(
          when(za + W < ub, true).when(za - W > ub, false),
          when(ua + W < zb, true).when(ua - W > zb, false))
        def crossNe(za: Column, ub: Column, ua: Column, zb: Column) = coalesce(
          when(abs(za - ub) > W, true),
          when(abs(ua - zb) > W, true))
        val tLt = coalesce(tza < tzb, tua < tub, crossLt(tza, tub, tua, tzb))
        val dLt = coalesce(dza < dzb, dua < dub, crossLt(dza, dub, dua, dzb))
        val tGt = coalesce(tza > tzb, tua > tub, crossLt(tzb, tua, tub, tza))
        val dGt = coalesce(dza > dzb, dua > dub, crossLt(dzb, dua, dub, dza))
        opStr match {
          case "=" => coalesce(na === nb, ba === bb,
            tza === tzb, tua === tub, dza === dzb, dua === dub,
            when(crossNe(tza, tub, tua, tzb), false),
            when(crossNe(dza, dub, dua, dzb), false),
            sa === sb2, la === lb,
            when(ta.isNull || tb.isNull, err) // unbound/eval-error operand
              .when(ta === tb, true)
              .when(SF.isTripleFn(ta) && SF.isTripleFn(tb), // SPARQL 1.2:
                SF.tripleValueEq(ta, tb)) // component-wise value equality
              .when(bothCdt(ta, tb), // composite datatypes: value equality
                graft.cdt.CdtFunctions.cdtEqUdf(ta, tb))
              .when(bothLit && unknownSpace && langnessDiffers, false)
              .when(bothLit && (unknownSpace || samePrimTemporal), err)
              .otherwise(false))
          case "!=" => coalesce(na =!= nb, ba =!= bb,
            tza =!= tzb, tua =!= tub, dza =!= dzb, dua =!= dub,
            crossNe(tza, tub, tua, tzb), crossNe(dza, dub, dua, dzb),
            sa =!= sb2, la =!= lb,
            when(ta.isNull || tb.isNull, err) // unbound/eval-error operand
              .when(ta === tb, false)
              .when(SF.isTripleFn(ta) && SF.isTripleFn(tb),
                !SF.tripleValueEq(ta, tb))
              .when(bothCdt(ta, tb),
                !graft.cdt.CdtFunctions.cdtEqUdf(ta, tb))
              .when(bothLit && unknownSpace && langnessDiffers, true)
              .when(bothLit && (unknownSpace || samePrimTemporal), err)
              .otherwise(true))
          case "<" => coalesce(na < nb, ba < bb, tLt, dLt, sa < sb2, cdtCmp < 0)
          case ">" => coalesce(na > nb, ba > bb, tGt, dGt, sa > sb2, cdtCmp > 0)
          case "<=" => coalesce(na <= nb, ba <= bb,
            tza <= tzb, tua <= tub, crossLt(tza, tub, tua, tzb),
            dza <= dzb, dua <= dub, crossLt(dza, dub, dua, dzb),
            sa <= sb2, cdtCmp <= 0)
          case ">=" => coalesce(na >= nb, ba >= bb,
            tza >= tzb, tua >= tub, crossLt(tzb, tua, tub, tza),
            dza >= dzb, dua >= dub, crossLt(dzb, dua, dub, dza),
            sa >= sb2, cdtCmp >= 0)
        }
      }, KBool)
    }
    private def addExpr(): Ex = {
      var l = unaryE()
      var going = true
      while (going) {
        ws()
        if (peekIs('+') ) { i += 1; val r = unaryE(); val ll = l
          l = if (r.kind == KDur) {
            // dateTime + dayTimeDuration (op:add-dayTimeDuration-to-dateTime)
            val lt = ll.asTermE; val rt = r.e
            Ex(RowExpr(v => SF.dtAddDuration(lt(v), rt(v), plus = true)), KTerm)
          } else Ex(num2(ll.asNum, r.asNum, _ + _), KNum) }
        else if (peekIs('-')) { i += 1; val r = unaryE(); val ll = l
          l = if (r.kind == KDur) {
            val lt = ll.asTermE; val rt = r.e
            Ex(RowExpr(v => SF.dtAddDuration(lt(v), rt(v), plus = false)), KTerm)
          } else Ex(num2(ll.asNum, r.asNum, _ - _), KNum) }
        else if (peekIs('*')) { i += 1; val r = unaryE(); val ll = l
          l = Ex(num2(ll.asNum, r.asNum, _ * _), KNum) }
        else if (peekIs('/') ) { i += 1; val r = unaryE(); val ll = l
          l = Ex(num2(ll.asNum, r.asNum, _ / _, isDiv = true), KNum) }
        else going = false
      }
      l
    }
    /** Arithmetic with XSD numeric promotion over the narrow numeric-pair
     * kind: 1+2 is "3"^^xsd:integer, not a flat double (NodeValue.java:385
     * ladder); zero-divisor semantics as in SF.numericBinOp. Operands and
     * result are (v,r) pair structs — see the Ex scaladoc for why. */
    private def num2(l: RowExpr, r: RowExpr, f: (Column, Column) => Column,
                     isDiv: Boolean = false): RowExpr = RowExpr { v =>
      val a = l(v)
      val b = r(v)
      val (va, vb) = (a.getField("v"), b.getField("v"))
      val rank0 = greatest(a.getField("r"), b.getField("r"))
      val rank = if (isDiv) greatest(rank0, slit(1)) else rank0
      val res =
        if (!isDiv) f(va, vb)
        else when(vb =!= 0.0, va / vb)
          .when(rank0 >= 2 && vb === 0.0,
            when(va > 0.0, Double.PositiveInfinity)
              .when(va < 0.0, Double.NegativeInfinity)
              .otherwise(Double.NaN))
      struct(res.as("v"), rank.as("r"))
    }

    private def unaryE(): Ex = {
      ws()
      if (peekIs('!')) {
        i += 1; val e = unaryE()
        val eb = e.asBool
        Ex(RowExpr(v => !eb(v)), KBool)
      }
      // unary minus/plus on a non-numeric-literal operand: -?o, -(…)
      // (a leading sign followed by a digit is a signed numeric constant,
      // handled in primaryE)
      else if ((peekIs('-') || peekIs('+')) &&
        !(i + 1 < s.length && (s.charAt(i + 1).isDigit || s.charAt(i + 1) == '.'))) {
        val neg = peekIs('-')
        i += 1
        val e = unaryE()
        val p = e.asNum
        Ex(RowExpr { v =>
          val x = p(v)
          struct((if (neg) -x.getField("v") else x.getField("v")).as("v"),
            x.getField("r").as("r"))
        }, KNum)
      }
      else primaryE()
    }

    private def primaryE(): Ex = {
      ws()
      if (peekIs('(')) { expect('('); val e = exprE(); expect(')'); e }
      else if (peekVar) { val v = varName(); exprVarRefs += v; Ex(RowExpr(r => r(v)), KTerm) }
      else if (s.startsWith("<<(", i)) {
        // SPARQL 1.2 ExprTripleTerm: `<<( c1 c2 c3 )>>` over vars/consts —
        // compiles to the TRIPLE(…) constructor (SF.tripleFn), which
        // yields NULL (eval error) for an ill-formed subject/predicate.
        // A constant literal or nested triple term in the SUBJECT slot is
        // a SYNTAX error (the ExprTripleTerm grammar): reject at parse
        i += 3
        ws()
        if (peekIs('"') || peekIs('\'') || s.startsWith("<<(", i) ||
          (i < s.length && (s.charAt(i).isDigit || ((peekIs('-') || peekIs('+')) &&
            i + 1 < s.length && s.charAt(i + 1).isDigit))) ||
          kwAhead("TRUE") || kwAhead("FALSE"))
          fail("triple-term subject must be an IRI, blank node, or variable")
        val se = primaryE(); ws()
        val pe = primaryE(); ws()
        val oe = primaryE(); ws()
        if (!s.startsWith(")>>", i)) fail("expected ')>>' closing triple term")
        i += 3
        val (st, pt, ot) = (se.asTermE, pe.asTermE, oe.asTermE)
        Ex(RowExpr(v => SF.tripleFn(st(v), pt(v), ot(v))), KTerm)
      }
      else if (peekIs('"') || peekIs('\'') || peekIs('<') || (i < s.length && s.charAt(i).isDigit) ||
        ((peekIs('-') || peekIs('+')) && i + 1 < s.length && s.charAt(i + 1).isDigit)) {
        val t = constTerm()
        val kind =
          if (t.dt == Term.XSD + "dayTimeDuration" || t.dt == Term.XSD + "duration") KDur
          else KTerm
        Ex(RowExpr(_ => TermCols.const(t)), kind)
      }
      else if (kwAhead("true")) { eatKw("true")
        Ex(RowExpr(_ => TermCols.const(Term.lit("true", Term.XSD_BOOLEAN))), KTerm) }
      else if (kwAhead("false")) { eatKw("false")
        Ex(RowExpr(_ => TermCols.const(Term.lit("false", Term.XSD_BOOLEAN))), KTerm) }
      else if (kwAhead("EXISTS") || kwAhead("NOT")) {
        val save = i
        val neg = eatKw("NOT")
        if (eatKw("EXISTS")) {
          if (existsCtx == null)
            fail("EXISTS is only supported inside FILTER constraints")
          ws()
          // tolerate a bracketted group: EXISTS ({ … })
          val paren = peekIs('(')
          if (paren) i += 1
          val r = groupGraphPattern()
          if (paren) expect(')')
          exCounter += 1
          val hv = "__ex" + exCounter
          hiddenVars += hv
          existsVars += hv
          existsCtx += (o => ExistsFlag(hv, r, o))
          Ex(RowExpr(v =>
            if (neg) !TermCols.ebv(v(hv)) else TermCols.ebv(v(hv))), KBool)
        } else { i = save; functionCallE() }
      }
      else functionCallE()
    }

    /** Built-ins with a BOOLEAN SQL result — everything else yields a term
     * struct. Drives the Ex kind so EBV/term wraps land correctly. */
    private val boolFns = Set("REGEX", "BOUND", "SAMETERM", "ISIRI", "ISURI",
      "ISBLANK", "ISLITERAL", "ISNUMERIC", "ISTRIPLE", "CONTAINS",
      "STRSTARTS", "STRENDS", "LANGMATCHES", "HASLANG", "HASLANGDIR")

    private def functionCallE(): Ex = {
      val save = i
      val nm = if (peekIs(':')) "" else name()
      i = save
      Ex(functionCall(),
        if (boolFns.contains(nm.toUpperCase)) KBool else KTerm)
    }

    private def functionCall(): RowExpr = {
      val rawName = if (peekIs(':')) "" else name() // ':z' = empty prefix
      // prefixed-name call: XSD constructor cast (xsd:integer(?x), E_Cast)
      // or a registry function named by IRI
      if (peekIs(':')) {
        i += 1
        val st = i
        while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_' ||
          s.charAt(i) == '-')) i += 1
        val local = s.substring(st, i)
        val iri = prefixes.get(rawName) match {
          case Some(ns) => ns + local
          case None => fail(s"undeclared prefix '$rawName:'")
        }
        ws()
        // a prefixed name NOT followed by '(' is an IRI constant in the
        // expression (e.g. `datatype(?v) = xsd:string`)
        if (!peekIs('(')) return RowExpr(_ => TermCols.const(Term.iri(iri)))
        expect('(')
        val fnArgs = ListBuffer[RowExpr]()
        ws()
        if (!peekIs(')')) {
          fnArgs += expression()
          while ({ ws(); peekIs(',') }) { i += 1; fnArgs += expression() }
        }
        expect(')')
        val argv = fnArgs.toList
        if (iri.startsWith(Term.XSD)) {
          if (argv.size != 1) fail(s"cast $iri takes one argument")
          return RowExpr(v => SF.castFn(argv.head(v), iri))
        }
        return graft.functions.Registry.function(iri) match {
          case Some(f) => RowExpr(v => f(argv.map(_(v))))
          case None =>
            // a FunctionCall with an unbound IRI is syntactically VALID
            // (syntax-sparql2 syntax-function-0x); like the reference's
            // E_Function it fails when the expression is actually built
            RowExpr(_ => throw new IllegalArgumentException(
              s"unknown function <$iri>"))
        }
      }
      val fn = rawName.toUpperCase
      ws()
      def args(n: Int): Seq[RowExpr] = {
        expect('(')
        val out = ListBuffer[RowExpr]()
        if (n > 0) {
          out += expression()
          while ({ ws(); peekIs(',') }) { i += 1; out += expression() }
        }
        expect(')')
        out.toList
      }
      // `(DISTINCT? expr)` — the aggregate-argument form. An aggregate
      // inside an aggregate's argument is illegal (SPARQL §19.8 grammar
      // note; the reference's AggregatorFactory check). Variables inside
      // the argument are NOT subject to the group-key scope rule, so
      // their refs are dropped from the expression-var log.
      def noNestedAgg[A](parse: => A): A = {
        val outer = sawAgg
        val refMark = exprVarRefs.length
        sawAgg = false
        val r = parse
        if (sawAgg) fail("aggregate functions cannot be nested")
        sawAgg = outer
        exprVarRefs.remove(refMark, exprVarRefs.length - refMark)
        r
      }
      def aggArg(): (RowExpr, Boolean) = {
        expect('('); ws()
        val d = eatKw("DISTINCT")
        val a = noNestedAgg(expression())
        expect(')')
        (a, d)
      }
      fn match {
        case "COUNT" => sawAgg = true;
          expect('(')
          ws()
          val e: RowExpr =
            if (peekIs('*')) { i += 1; RowExpr(_ => TermCols.intTerm(count(slit(1)))) }
            else if (eatKw("DISTINCT")) {
              ws()
              if (peekIs('*')) { // COUNT(DISTINCT *): distinct solution rows
                i += 1
                RowExpr(v => TermCols.intTerm(count_distinct(v("*"))))
              } else { val a = noNestedAgg(expression())
                RowExpr(v => TermCols.intTerm(count_distinct(a(v)))) }
            }
            else { val a = noNestedAgg(expression())
              RowExpr(v => TermCols.intTerm(count(a(v)))) }
          expect(')'); e
        case "SUM" => sawAgg = true; val (a, d) = aggArg()
          RowExpr(v => if (d) SparqlAggregates.sumDistinctAgg(a(v))
                       else SparqlAggregates.sumAgg(a(v)))
        case "AVG" => sawAgg = true; val (a, d) = aggArg()
          RowExpr(v => if (d) SparqlAggregates.avgDistinctAgg(a(v))
                       else SparqlAggregates.avgAgg(a(v)))
        // DISTINCT is a semantic no-op for MIN/MAX/SAMPLE (AggMinDistinct
        // javadoc: "identical to AggMin") — parsed and dropped
        case "MIN" => sawAgg = true; val a = aggArg()._1; RowExpr(v => SparqlAggregates.minAgg(a(v)))
        case "MAX" => sawAgg = true; val a = aggArg()._1; RowExpr(v => SparqlAggregates.maxAgg(a(v)))
        case "SAMPLE" => sawAgg = true; val a = aggArg()._1; RowExpr(v => SparqlAggregates.sample(a(v)))
        case "GROUP_CONCAT" => sawAgg = true;
          expect('('); ws()
          val distinctG = eatKw("DISTINCT")
          val a = noNestedAgg(expression())
          val sep = if ({ ws(); peekIs(';') }) {
            i += 1; ws(); expectKw("SEPARATOR"); expect('='); ws(); literal().lex
          } else " "
          expect(')')
          RowExpr(v => if (distinctG) SparqlAggregates.groupConcatDistinct(a(v), sep)
                       else SparqlAggregates.groupConcat(a(v), sep))
        case "MEDIAN" => sawAgg = true; val a = args(1).head
          RowExpr(v => SparqlAggregates.medianAgg(a(v)))
        case "MODE" => sawAgg = true; val a = args(1).head
          RowExpr(v => SparqlAggregates.modeAgg(a(v)))
        case "FOLD" => sawAgg = true
          // FOLD(DISTINCT? expr (, expr)? (ORDER BY cond+)?) — the
          // SPARQL-CDTs aggregate (AggFoldList / AggFoldMap): one
          // expression folds a cdt:List, two fold a cdt:Map
          expect('('); ws()
          val distinctF = eatKw("DISTINCT")
          val a1 = noNestedAgg(expression())
          ws()
          val a2 = if (peekIs(',')) { i += 1; Some(noNestedAgg(expression())) }
                   else None
          ws()
          var foldAsc = true
          val ordKeys = ListBuffer[RowExpr]()
          if (eatKw2("ORDER", "BY")) {
            var going = true
            while (going) {
              ws()
              if (eatKw("ASC")) {
                expect('('); ordKeys += noNestedAgg(expression()); ws(); expect(')')
              } else if (eatKw("DESC")) {
                if (ordKeys.nonEmpty) fail("FOLD ORDER BY: DESC only as the single key")
                foldAsc = false
                expect('('); ordKeys += noNestedAgg(expression()); ws(); expect(')')
              } else if (peekVar) {
                val v = varName()
                ordKeys += RowExpr(row => row(v))
              } else going = false
            }
            if (ordKeys.isEmpty) fail("FOLD ORDER BY needs at least one condition")
          }
          ws(); expect(')')
          RowExpr { v =>
            val keys = ordKeys.toList.map(k => k(v))
            a2 match {
              case Some(ve) =>
                SparqlAggregates.foldCdtMap(a1(v), ve(v), keys, foldAsc)
              case None =>
                SparqlAggregates.foldCdtList(a1(v), distinctF, keys, foldAsc)
            }
          }
        case "STR" => val a = args(1).head; RowExpr(v => SF.str(a(v)))
        case "LANG" => val a = args(1).head; RowExpr(v => SF.langFn(a(v)))
        case "LANGDIR" => val a = args(1).head; RowExpr(v => SF.langDirFn(a(v)))
        case "HASLANG" => val a = args(1).head; RowExpr(v => SF.hasLangFn(a(v)))
        case "HASLANGDIR" => val a = args(1).head; RowExpr(v => SF.hasLangDirFn(a(v)))
        case "DATATYPE" =>
          expect('(')
          val a = exprE()
          expect(')')
          a.kind match {
            // DATATYPE of an arithmetic result: read the promotion rank off
            // the numeric pair — no term formatting round-trip
            case KNum => RowExpr { v =>
              val p = a.e(v)
              when(p.getField("v").isNotNull,
                TermCols.rankDatatypeTerm(p.getField("r")))
            }
            case _ => val t = a.asTermE; RowExpr(v => SF.datatype(t(v)))
          }
        case "IRI" | "URI" => val a = args(1).head
          val b = base // relative strings resolve against the query base
          RowExpr(v => SF.iriFn(a(v), b))
        case "STRLEN" => val a = args(1).head; RowExpr(v => SF.strlen(a(v)))
        case "UCASE" => val a = args(1).head; RowExpr(v => SF.ucase(a(v)))
        case "LCASE" => val a = args(1).head; RowExpr(v => SF.lcase(a(v)))
        case "SUBSTR" =>
          val as = args(2) // 2- or 3-argument form (fn:substring)
          if (as.size < 2 || as.size > 3) fail("SUBSTR takes 2 or 3 arguments")
          RowExpr(v => SF.substrFn(as(0)(v), TermCols.numValue(as(1)(v)),
            as.lift(2).map(a => TermCols.numValue(a(v)))))
        case "CONTAINS" => val as = args(2); RowExpr(v => SF.containsFn(as(0)(v), as(1)(v)))
        case "STRSTARTS" => val as = args(2); RowExpr(v => SF.strstarts(as(0)(v), as(1)(v)))
        case "STRENDS" => val as = args(2); RowExpr(v => SF.strends(as(0)(v), as(1)(v)))
        case "STRBEFORE" => val as = args(2); RowExpr(v => SF.strbefore(as(0)(v), as(1)(v)))
        case "STRAFTER" => val as = args(2); RowExpr(v => SF.strafter(as(0)(v), as(1)(v)))
        case "CONCAT" =>
          expect('(')
          val out = ListBuffer[RowExpr]()
          ws()
          if (!peekIs(')')) { // CONCAT() with no args = ""
            out += expression()
            while ({ ws(); peekIs(',') }) { i += 1; out += expression() }
          }
          expect(')')
          RowExpr(v => SF.concatFn(out.toList.map(_(v)): _*))
        case "REGEX" =>
          expect('('); val a = expression(); ws(); expect(','); ws()
          val pat = literal().lex
          ws()
          val flags = if (peekIs(',')) { i += 1; ws(); literal().lex } else ""
          expect(')')
          RowExpr(v => SF.regexFlags(a(v), pat, flags))
        case "REPLACE" =>
          expect('('); val a = expression(); ws(); expect(','); ws()
          val pat = expression(); ws(); expect(','); ws()
          val rep = expression()
          ws()
          val flags = if (peekIs(',')) { i += 1; ws(); literal().lex } else ""
          expect(')')
          RowExpr { v =>
            val p0 = pat(v)
            val pCol = if (flags.isEmpty) p0.getField("lex")
                       else concat(slit(s"(?$flags)"), p0.getField("lex"))
            SF.replaceFn(a(v), struct(p0.getField("kind").as("kind"),
              pCol.as("lex"), p0.getField("dt").as("dt"), p0.getField("lang").as("lang")),
              rep(v))
          }
        case "ENCODE_FOR_URI" => val a = args(1).head; RowExpr(v => SF.encodeForUri(a(v)))
        case "STRDT" => val as = args(2); RowExpr(v => SF.strdt(as(0)(v), as(1)(v)))
        case "STRLANG" => val as = args(2); RowExpr(v => SF.strlang(as(0)(v), as(1)(v)))
        case "STRLANGDIR" => val as = args(3)
          RowExpr(v => SF.strlangdir(as(0)(v), as(1)(v), as(2)(v)))
        case "BNODE" =>
          expect('(')
          ws()
          if (peekIs(')')) { i += 1; RowExpr(_ => SF.bnodeFresh()) }
          else { val a = expression(); expect(')'); RowExpr(v => SF.bnodeLabeled(a(v))) }
        case "UUID" => args(0); RowExpr(_ => SF.uuidIri())
        case "STRUUID" => args(0); RowExpr(_ => SF.struuid())
        case "NOW" => args(0); RowExpr(_ => SF.nowFn())
        case "RAND" => args(0); RowExpr(_ => SF.randFn())
        case "TZ" => val a = args(1).head; RowExpr(v => SF.tzFn(a(v)))
        case "TIMEZONE" => val a = args(1).head; RowExpr(v => SF.timezoneFn(a(v)))
        case "HOURS" => val a = args(1).head; RowExpr(v => SF.hoursFn(a(v)))
        case "MINUTES" => val a = args(1).head; RowExpr(v => SF.minutesFn(a(v)))
        case "SECONDS" => val a = args(1).head; RowExpr(v => SF.secondsFn(a(v)))
        case "SHA1" => val a = args(1).head; RowExpr(v => SF.sha1Fn(a(v)))
        case "SHA384" => val a = args(1).head; RowExpr(v => SF.sha384Fn(a(v)))
        case "SHA512" => val a = args(1).head; RowExpr(v => SF.sha512Fn(a(v)))
        // math library (sparql/function/library/Math_*) by bare name
        case "SQRT" => val a = args(1).head; RowExpr(v => SF.sqrtFn(a(v)))
        case "EXP" => val a = args(1).head; RowExpr(v => SF.expFn(a(v)))
        case "LOG" => val a = args(1).head; RowExpr(v => SF.logFn(a(v)))
        case "LOG10" => val a = args(1).head; RowExpr(v => SF.log10Fn(a(v)))
        case "SIN" => val a = args(1).head; RowExpr(v => SF.sinFn(a(v)))
        case "COS" => val a = args(1).head; RowExpr(v => SF.cosFn(a(v)))
        case "TAN" => val a = args(1).head; RowExpr(v => SF.tanFn(a(v)))
        case "ATAN" => val a = args(1).head; RowExpr(v => SF.atanFn(a(v)))
        case "POW" => val as = args(2); RowExpr(v => SF.powFn(as(0)(v), as(1)(v)))
        case "PI" => args(0); RowExpr(_ => SF.piTerm())
        case "ABS" => val a = args(1).head; RowExpr(v => SF.absFn(a(v)))
        case "CEIL" => val a = args(1).head; RowExpr(v => SF.ceilFn(a(v)))
        case "FLOOR" => val a = args(1).head; RowExpr(v => SF.floorFn(a(v)))
        case "ROUND" => val a = args(1).head; RowExpr(v => SF.roundFn(a(v)))
        case "YEAR" => val a = args(1).head; RowExpr(v => SF.yearFn(a(v)))
        case "MONTH" => val a = args(1).head; RowExpr(v => SF.monthFn(a(v)))
        case "DAY" => val a = args(1).head; RowExpr(v => SF.dayFn(a(v)))
        case "MD5" => val a = args(1).head; RowExpr(v => SF.md5Fn(a(v)))
        case "SHA256" => val a = args(1).head; RowExpr(v => SF.sha256Fn(a(v)))
        case "BOUND" => val a = args(1).head; RowExpr(v => SF.bound(a(v)))
        case "COALESCE" =>
          expect('(')
          val out = ListBuffer[RowExpr]()
          ws()
          if (!peekIs(')')) {
            out += expression()
            while ({ ws(); peekIs(',') }) { i += 1; out += expression() }
          }
          expect(')')
          // COALESCE() with no args: no expression evaluates → error/unbound
          if (out.isEmpty) RowExpr(_ => slit(null).cast(TermCols.schema))
          else RowExpr(v => SF.coalesceFn(out.toList.map(_(v)): _*))
        case "IF" =>
          val as = args(3)
          // the condition arrives as a term (expression() wraps booleans);
          // EBV recovers the SQL boolean — errors → NULL → ELSE branch is
          // NOT taken either (whole IF errors per SPARQL; when() yields
          // NULL when the condition is NULL only if no otherwise matches,
          // so route the NULL-cond case explicitly to an unbound term)
          RowExpr { v =>
            val c = TermCols.ebv(as(0)(v))
            when(c.isNull, slit(null).cast(TermCols.schema))
              .otherwise(SF.ifFn(c, as(1)(v), as(2)(v)))
          }
        case "SAMETERM" => val as = args(2); RowExpr(v => SF.sameTerm(as(0)(v), as(1)(v)))
        case "LANGMATCHES" => val as = args(2)
          RowExpr(v => SF.langMatches(as(0)(v), as(1)(v)))
        case "ADJUST" => val as = args(2)
          RowExpr(v => SF.adjustFn(as(0)(v), as(1)(v)))
        case "ISIRI" | "ISURI" => val a = args(1).head; RowExpr(v => TermCols.isIri(a(v)))
        case "ISBLANK" => val a = args(1).head; RowExpr(v => TermCols.isBlank(a(v)))
        case "ISLITERAL" => val a = args(1).head; RowExpr(v => TermCols.isLiteral(a(v)))
        case "ISNUMERIC" => val a = args(1).head; RowExpr(v => TermCols.isNumeric(a(v)))
        // RDF-star triple functions
        case "TRIPLE" => val as = args(3)
          RowExpr(v => SF.tripleFn(as(0)(v), as(1)(v), as(2)(v)))
        case "ISTRIPLE" => val a = args(1).head; RowExpr(v => SF.isTripleFn(a(v)))
        case "SUBJECT" => val a = args(1).head; RowExpr(v => SF.subjectFn(a(v)))
        case "PREDICATE" => val a = args(1).head; RowExpr(v => SF.predicateFn(a(v)))
        case "OBJECT" => val a = args(1).head; RowExpr(v => SF.objectFn(a(v)))
        case other =>
          // custom registries (FunctionRegistry / AggregateRegistry):
          // resolve after the built-ins, any arity for scalar functions
          graft.functions.Registry.function(other) match {
            case Some(f) =>
              expect('(')
              val out = ListBuffer[RowExpr]()
              ws()
              if (!peekIs(')')) {
                out += expression()
                while ({ ws(); peekIs(',') }) { i += 1; out += expression() }
              }
              expect(')')
              val argv = out.toList
              RowExpr(v => f(argv.map(_(v))))
            case None => graft.functions.Registry.aggregate(other) match {
              case Some(a) =>
                sawAgg = true
                val arg = args(1).head
                RowExpr(v => a(arg(v)))
              case None => fail(s"unsupported function $other")
            }
          }
      }
    }


    // ---- low-level lexing
    private def ws(): Unit = {
      var going = true
      while (going) {
        while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
        if (i < s.length && s.charAt(i) == '#') {
          while (i < s.length && s.charAt(i) != '\n') i += 1
        } else going = false
      }
    }
    private def peekIs(c: Char): Boolean = { ws(); i < s.length && s.charAt(i) == c }
    private def peekPrefixedName(): Boolean = {
      ws()
      i < s.length && (s.charAt(i).isLetter) && {
        // something like pn:local before a non-keyword context; PN_PREFIX
        // may contain '.'/'-' medially (`x.y:`)
        val save = i
        while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_' ||
          s.charAt(i) == '-' || s.charAt(i) == '.')) i += 1
        val r = i < s.length && s.charAt(i) == ':'
        i = save; r
      }
    }
    private def isIriStart: Boolean = {
      // '<' followed by a scheme-ish body then '>' on the same token
      val close = s.indexOf('>', i)
      close > 0 && !s.substring(i + 1, close).exists(Character.isWhitespace)
    }
    private def isVarStart(at: Int): Boolean =
      at < s.length && (s.charAt(at).isLetterOrDigit || s.charAt(at) == '_')

    private def expect(c: Char): Unit = {
      ws()
      if (i >= s.length || s.charAt(i) != c) fail(s"expected '$c'")
      i += 1
    }
    private def kwAhead(kw: String): Boolean = {
      ws()
      s.regionMatches(true, i, kw, 0, kw.length) &&
        (i + kw.length >= s.length || !s.charAt(i + kw.length).isLetterOrDigit)
    }
    private def eatKw(kw: String): Boolean = {
      if (kwAhead(kw)) { i += kw.length; true } else false
    }
    private def eatKw2(a: String, b: String): Boolean = {
      val save = i
      if (eatKw(a)) { if (eatKw(b)) true else { i = save; false } } else false
    }
    private def expectKw(kw: String): Unit =
      if (!eatKw(kw)) fail(s"expected $kw")

    private def varName(): String = {
      ws()
      if (!peekIs('?') && !peekIs('$')) fail("expected variable")
      i += 1
      name()
    }
    /** Is the next token a variable? (SPARQL allows both ?v and $v.) */
    private def peekVar: Boolean = peekIs('?') || peekIs('$')
    private def name(): String = {
      val st = i
      while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
      if (i == st) fail("expected name")
      s.substring(st, i)
    }
    private def integer(): Long = {
      ws()
      val st = i
      while (i < s.length && s.charAt(i).isDigit) i += 1
      s.substring(st, i).toLong
    }
    /** Reject `\\u`/`\\U` escapes denoting surrogate code points
     * (U+D800–U+DFFF): SPARQL 1.2 forbids them even as a high/low pair —
     * escapes denote code POINTS, and surrogates are not RDF characters
     * (the reference's EscapeStr checkers). */
    private def checkCodepointEscapes(raw: String): Unit = {
      var j = 0
      while (j < raw.length) {
        if (raw.charAt(j) == '\\' && j + 1 < raw.length) {
          raw.charAt(j + 1) match {
            case 'u' if j + 2 < raw.length && raw.charAt(j + 2) == '{' =>
              // \u{H+}: 1–6 hex digits, a scalar value ≤ U+10FFFF
              // (delim-hex-escape-bad-01..04: empty / 7+ digits / zero-pad)
              val close = raw.indexOf('}', j + 3)
              if (close < 0) fail("unterminated \\u{ escape")
              val hex = raw.substring(j + 2 + 1, close)
              if (hex.isEmpty || hex.length > 6 ||
                !hex.forall(c => Character.digit(c, 16) >= 0))
                fail(s"bad delimited codepoint escape \\u{$hex}")
              val cp = Integer.parseInt(hex, 16)
              if (cp > 0x10FFFF) fail(f"code point U+$cp%X out of range")
              if (cp >= 0xD800 && cp <= 0xDFFF)
                fail(f"surrogate code point escape \\u{$cp%04X} is not legal")
              j = close + 1
            case 'u' if j + 6 <= raw.length =>
              val cp = try Integer.parseInt(raw.substring(j + 2, j + 6), 16)
                       catch { case _: NumberFormatException => fail("bad \\u escape") }
              if (cp >= 0xD800 && cp <= 0xDFFF)
                fail(f"surrogate code point escape \\u$cp%04X is not legal")
              j += 6
            case 'U' if j + 10 <= raw.length =>
              val cp = try java.lang.Long.parseLong(raw.substring(j + 2, j + 10), 16)
                       catch { case _: NumberFormatException => fail("bad \\U escape") }
              if (cp >= 0xD800L && cp <= 0xDFFFL)
                fail(f"surrogate code point escape \\U$cp%08X is not legal")
              j += 10
            case _ => j += 2
          }
        } else j += 1
      }
    }

    private def iriRef(): String = {
      ws()
      expect('<')
      val close = s.indexOf('>', i)
      if (close < 0) fail("unterminated IRI")
      val body = s.substring(i, close)
      i = close + 1
      checkCodepointEscapes(body)
      val full = NTriplesEscape.unescape(body)
      // RFC 3986 §5.2.2 strict resolution, like the data parsers
      // (TurtleLite resolves every IRI ref): an absolute ref's path still
      // gets remove_dot_segments — Jena's IRIx does the same, which is
      // what makes <eXAMPLE://a/./b/../b/x> in a query match the
      // identically-written data IRI (DAWG i18n normalization-02).
      if (base.nonEmpty) graft.normalize.Iri.resolve(base, full)
      else if (graft.normalize.Iri.parse(full).scheme != null)
        graft.normalize.Iri.resolve("", full)
      else full
    }
    private def isHexAt(j: Int): Boolean =
      j < s.length && { val c = s.charAt(j)
        (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F') }
    /** Characters a '\' may escape inside PN_LOCAL (PN_LOCAL_ESC). */
    private val pnLocalEsc = "_~.-!$&'()*+,;=/?#@%"

    /** Prefix label before ':' — PN_PREFIX allows '.'/'-'/digits medially
     * (`x.y:`); a trailing '.' never belongs to the label. Full PN_CHARS
     * classes (riot.Chars) — combining marks included, so NFD text like
     * `resumé` lexes (i18n normalization-01). */
    private def pnPrefixLabel(): String = {
      val st = i
      while (i < s.length &&
        (graft.riot.Chars.pnChars(s.codePointAt(i)) || s.charAt(i) == '.'))
        i += Character.charCount(s.codePointAt(i))
      var p = s.substring(st, i)
      while (p.endsWith(".")) { p = p.dropRight(1); i -= 1 }
      p
    }

    /** PN_LOCAL per SPARQL 1.1: may START with a digit or ':', may CONTAIN
     * ':' and medial '.'/'-', takes %XX verbatim into the IRI and '\'
     * escapes (PN_LOCAL_ESC) unescaped; may not end with '.'
     * (syntax-query syn-pname-* / qname-escape-*). */
    private def prefixedIri(): String = {
      ws()
      val pfx = pnPrefixLabel()
      expect(':')
      val sb = new StringBuilder
      var rawDotRun = 0 // trailing RAW '.'s (statement terminators), not \.
      var going = true
      while (going) {
        if (i >= s.length) going = false
        else {
          val c = s.charAt(i)
          if (c == '%' && isHexAt(i + 1) && isHexAt(i + 2)) {
            sb.append(s, i, i + 3); i += 3; rawDotRun = 0
          } else if (c == '\\' && i + 1 < s.length &&
            pnLocalEsc.indexOf(s.charAt(i + 1)) >= 0) {
            sb.append(s.charAt(i + 1)); i += 2; rawDotRun = 0
          } else {
            val cp = s.codePointAt(i)
            val ok =
              if (sb.isEmpty)
                graft.riot.Chars.pnCharsU(cp) || cp == ':' || (cp >= '0' && cp <= '9')
              else graft.riot.Chars.pnChars(cp) || cp == ':' || cp == '.'
            if (ok) {
              sb.appendAll(Character.toChars(cp)); i += Character.charCount(cp)
              rawDotRun = if (cp == '.') rawDotRun + 1 else 0
            } else going = false
          }
        }
      }
      var local = sb.toString
      while (rawDotRun > 0 && local.endsWith(".")) {
        local = local.dropRight(1); i -= 1; rawDotRun -= 1
      }
      prefixes.get(pfx) match {
        case Some(ns) => ns + local
        case None => fail(s"undeclared prefix '$pfx:'")
      }
    }

    private def prologue(): Unit = {
      var going = true
      while (going) {
        if (eatKw("PREFIX")) {
          ws()
          val pfx = { val st = i
            while (i < s.length && s.charAt(i) != ':') i += 1
            s.substring(st, i).trim }
          // PN_PREFIX starts with a LETTER (PN_CHARS_BASE — digits and
          // '_' may only appear after it; syn-bad-pname-05/-07)
          if (pfx.nonEmpty && (!pfx.head.isLetter || pfx.last == '.' ||
            !pfx.forall(c => c.isLetterOrDigit || c == '_' || c == '-' || c == '.')))
            fail(s"invalid prefix label '$pfx'")
          expect(':')
          prefixes(pfx) = iriRef()
        } else if (eatKw("BASE")) base = iriRef()
        else if (eatKw("VERSION")) {
          // SPARQL 1.2 VersionDecl: `VERSION "1.2"` — accepted and
          // recorded nowhere (the engine implements the 1.2 surface)
          ws()
          if (!peekIs('"') && !peekIs('\'')) fail("VERSION needs a string literal")
          // the VersionSpecifier production takes only SHORT string forms
          if (s.startsWith("\"\"\"", i) || s.startsWith("'''", i))
            fail("VERSION takes a short string literal")
          literal()
        }
        else going = false
      }
    }

    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"SPARQL parse error at offset $i ('${s.substring(i.min(s.length)).take(25)}'): $msg")
  }
}
