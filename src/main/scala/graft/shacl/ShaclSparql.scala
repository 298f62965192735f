package graft.shacl

import scala.collection.mutable

import org.apache.spark.sql.SparkSession

import graft.algebra._
import graft.model.{Term, Triple}
import graft.sparql.Parser

/**
 * SHACL-SPARQL — sh:sparql constraints and SPARQL-based constraint
 * components (reference: jena-shacl/.../engine/constraint/SparqlConstraint
 * .java, SparqlValidation.java, parser/ConstraintComponents.java; spec:
 * SHACL §5–6). Composes the pure core [[Validator]] with the repo's own
 * SPARQL engine: every SPARQL constraint evaluates SET-AT-A-TIME as
 *
 *   Lateral(Table(pre-bound rows), query-op)
 *
 * — the correlated LATERAL is exactly the spec's pre-binding (each row
 * re-evaluates the query body with $this / $value / parameters bound),
 * but over ALL focus nodes in one Spark plan instead of one engine call
 * per node. Pre-binding syntax restrictions (SHACL §B: no MINUS /
 * SERVICE / VALUES, no reassignment of potentially pre-bound variables,
 * subqueries must project $this) are enforced on the parsed algebra and
 * raise — a validation over a shapes graph that violates them is a
 * FAILURE, not a report.
 */
object ShaclSparql {

  import SH._

  private val OWL_IMPORTS = "http://www.w3.org/2002/07/owl#imports"

  def validate(spark: SparkSession, shapes: Seq[Triple], data: Seq[Triple]): Report = {
    val core = Validator.validate(shapes, data)
    val sg = new GraphIndex(shapes.toVector)
    val dg = new GraphIndex(data.toVector)

    // (shape, focus nodes): targeted shapes plus their sh:property
    // children, focus propagated through the parent's value nodes
    val eng = new Validator.Engine(sg, dg)
    val pairs = mutable.LinkedHashMap[Term, mutable.LinkedHashSet[Term]]()
    def walk(shape: Term, focus: Seq[Term], depth: Int): Unit = {
      if (depth > 20 || focus.isEmpty) return
      val set = pairs.getOrElseUpdate(shape, mutable.LinkedHashSet[Term]())
      val fresh = focus.filterNot(set)
      if (fresh.isEmpty) return
      set ++= fresh
      val values = sg.obj(shape, sh("path")) match {
        case Some(pn) =>
          val p = SPath.parse(sg, pn)
          fresh.flatMap(f => p.eval(dg, f)).distinct
        case None => fresh
      }
      sg.objs(shape, sh("property")).foreach(walk(_, values, depth + 1))
    }
    eng.targetShapes.foreach(s => walk(s, eng.focusNodes(s), 0))

    val out = mutable.Buffer[VResult]()
    pairs.foreach { case (shape, focusSet) =>
      val focus = focusSet.toSeq
      if (!sg.obj(shape, sh("deactivated")).exists(_.lex == "true")) {
        evalSparqlConstraints(spark, sg, dg, shape, focus, out)
        evalComponents(spark, sg, dg, shape, focus, out)
      }
    }
    Report(core.conforms && out.isEmpty, core.results ++ out.toSeq)
  }

  // ---------------------------------------------------------- sh:sparql

  private def evalSparqlConstraints(spark: SparkSession, sg: GraphIndex,
      dg: GraphIndex, shape: Term, focus: Seq[Term],
      out: mutable.Buffer[VResult]): Unit = {
    val severity = sg.obj(shape, sh("severity")).getOrElse(Violation)
    val pathNode = sg.obj(shape, sh("path"))
    sg.objs(shape, sh("sparql")).foreach { c =>
      if (!sg.obj(c, sh("deactivated")).exists(_.lex == "true")) {
        val select = sg.obj(c, sh("select")).getOrElse(
          throw new IllegalArgumentException("sh:sparql without sh:select")).lex
        val text = prefixText(sg, sg.objs(c, sh("prefixes"))) +
          substPath(select, sg, pathNode)
        // pre-bound: $this per focus; $currentShape = the shape;
        // $shapesGraph = the shapes graph's name in the dataset (§5.3.2)
        val pre = Map("currentShape" -> shape,
          "shapesGraph" -> Term.iri(SHAPES_GRAPH_IRI))
        val rows = runSelect(spark, dg, sg, text,
          Seq("this", "currentShape", "shapesGraph"),
          focus.map(f => pre + ("this" -> f)),
          preBound = Set("this", "currentShape", "shapesGraph"))
        rows.foreach { r =>
          val f = r("this")
          out += VResult(f,
            r.get("path").filter(_.isIri).orElse(pathNode),
            Some(r.getOrElse("value", f)),
            sh("SPARQLConstraintComponent"), severity, shape)
        }
      }
    }
  }

  // ------------------------------------- SPARQL-based constraint components

  private final case class Param(path: Term, name: String, optional: Boolean)

  private def evalComponents(spark: SparkSession, sg: GraphIndex,
      dg: GraphIndex, shape: Term, focus: Seq[Term],
      out: mutable.Buffer[VResult]): Unit = {
    val severity = sg.obj(shape, sh("severity")).getOrElse(Violation)
    val pathNode = sg.obj(shape, sh("path"))
    val isProperty = pathNode.isDefined
    val components = sg.byPred.getOrElse(rdfType, Vector.empty).map(_.s)
      .distinct.filter(c => sg.isInstanceOf(c, sh("ConstraintComponent")))

    components.foreach { comp =>
      val params = sg.objs(comp, sh("parameter")).map { p =>
        val path = sg.obj(p, sh("path")).getOrElse(
          throw new IllegalArgumentException("sh:parameter without sh:path"))
        Param(path, localName(path),
          sg.obj(p, sh("optional")).exists(_.lex == "true"))
      }
      val bindings: Seq[(String, Term)] = params.flatMap(p =>
        sg.obj(shape, p.path).map(v => p.name -> v))
      val mandatoryOk = params.filter(!_.optional)
        .forall(p => bindings.exists(_._1 == p.name))
      if (bindings.nonEmpty && mandatoryOk) {
        val validator =
          (if (isProperty) sg.obj(shape, sh("path")).flatMap(_ =>
            sg.obj(comp, sh("propertyValidator")))
          else sg.obj(comp, sh("nodeValidator")))
            .orElse(sg.obj(comp, sh("validator")))
        validator.foreach { v =>
          val prefixes = prefixText(sg, sg.objs(v, sh("prefixes")))
          val boundNames = bindings.map(_._1)
          val values: Seq[Term] =
            if (isProperty)
              focus.flatMap(f => SPath.parse(sg, pathNode.get).eval(dg, f)).distinct
            else focus
          sg.obj(v, sh("ask")) match {
            case Some(ask) =>
              // ASK validator: per (focus, value); conforms iff true
              val rows = focus.flatMap { f =>
                val vals = if (isProperty)
                  SPath.parse(sg, pathNode.get).eval(dg, f).distinct else Seq(f)
                vals.map(x => Map("this" -> f, "value" -> x) ++ bindings)
              }
              val matched = runAsk(spark, dg, sg,
                prefixes + substPath(ask.lex, sg, pathNode),
                Seq("this", "value") ++ boundNames, rows,
                preBound = Set("this", "value") ++ boundNames)
              rows.filterNot(r => matched.contains((r("this"), r("value"))))
                .foreach { r =>
                  out += VResult(r("this"), pathNode, Some(r("value")),
                    comp, severity, shape)
                }
            case None =>
              val select = sg.obj(v, sh("select")).getOrElse(
                throw new IllegalArgumentException(
                  "SPARQL validator without sh:select/sh:ask")).lex
              val rows = runSelect(spark, dg, sg,
                prefixes + substPath(select, sg, pathNode),
                Seq("this") ++ boundNames,
                focus.map(f => Map("this" -> f) ++ bindings),
                preBound = Set("this") ++ boundNames)
              rows.foreach { r =>
                val f = r("this")
                out += VResult(f,
                  r.get("path").filter(_.isIri).orElse(pathNode),
                  Some(r.getOrElse("value", f)), comp, severity, shape)
              }
          }
        }
      }
    }
  }

  // ------------------------------------------------------------ plumbing

  private def localName(t: Term): String = {
    val s = t.lex
    val i = math.max(s.lastIndexOf('#'), s.lastIndexOf('/'))
    s.substring(i + 1)
  }

  /** sh:prefixes → sh:declare pairs, following owl:imports. */
  private def prefixText(sg: GraphIndex, roots: Seq[Term]): String = {
    val seen = mutable.LinkedHashSet[Term]()
    def imports(n: Term): Unit = if (!seen.contains(n)) {
      seen += n
      sg.objs(n, Term.iri(OWL_IMPORTS)).foreach(imports)
    }
    roots.foreach(imports)
    seen.toSeq.flatMap(n => sg.objs(n, sh("declare"))).flatMap { d =>
      for {
        p <- sg.obj(d, sh("prefix"))
        ns <- sg.obj(d, sh("namespace"))
      } yield s"PREFIX ${p.lex}: <${ns.lex}>\n"
    }.mkString
  }

  /** $PATH template substitution (property-shape validators; simple IRI
   * paths only — the template is textual per the spec). */
  private def substPath(query: String, sg: GraphIndex, pathNode: Option[Term]): String =
    if (!query.contains("$PATH")) query
    else pathNode match {
      case Some(p) if p.isIri => query.replace("$PATH", "<" + p.lex + ">")
      case Some(_) => throw new IllegalArgumentException(
        "$PATH substitution requires a simple IRI sh:path")
      case None => throw new IllegalArgumentException(
        "$PATH used outside a property shape")
    }

  /** SHACL §B pre-binding restrictions, enforced on the parsed algebra. */
  private def checkPreBinding(op: Op, preBound: Set[String], top: Boolean): Unit = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException("SHACL pre-binding: " + msg)
    op match {
      case Minus(_, _) => fail("MINUS is not allowed")
      case Service(_, _, _, _) => fail("SERVICE is not allowed")
      case Table(vars, _) if vars.nonEmpty => fail("VALUES is not allowed")
      case Extend(v, _, _) if preBound.contains(v) =>
        fail(s"reassignment of pre-bound ?$v")
      // solution modifiers wrap the TOP projection without opening a new
      // scope — keep `top` through them
      case Distinct(i) => return checkPreBinding(i, preBound, top)
      case Reduced(i) => return checkPreBinding(i, preBound, top)
      case Slice(_, _, i) => return checkPreBinding(i, preBound, top)
      case Order(_, i) => return checkPreBinding(i, preBound, top)
      case Project(vars, i) =>
        // the reference enforces this for the FOCUS variables ($this /
        // $value) — the auxiliary $shapesGraph/$currentShape need not be
        // re-projected (pre-binding-007)
        if (!top && !preBound.intersect(Set("this", "value")).subsetOf(vars.toSet))
          fail("subquery must project all pre-bound variables")
        return checkPreBinding(i, preBound, top = false)
      case _ => ()
    }
    // generic recursion over whatever Op children the node carries
    def walkAny(x: Any): Unit = x match {
      case o: Op => checkPreBinding(o, preBound, top = false)
      case s: Iterable[_] => s.foreach(walkAny)
      case p: Product if !p.isInstanceOf[Term] => p.productIterator.foreach(walkAny)
      case _ => ()
    }
    op match {
      case p: Product => p.productIterator.foreach(walkAny)
      case _ => ()
    }
  }

  /** The dataset a SHACL-SPARQL query sees: the data graph as the
   * default graph plus the shapes graph as a named graph, addressable
   * via the pre-bound $shapesGraph (spec §5.3.2). */
  private[shacl] val SHAPES_GRAPH_IRI = "urn:x-shacl:shapesGraph"

  private def datasetDf(spark: SparkSession, dg: GraphIndex, sg: GraphIndex) = {
    import spark.implicits._
    val g = Term.iri(SHAPES_GRAPH_IRI)
    val quads = dg.triples.map(t =>
      graft.model.Quad(t.s, t.p, t.o, Term.defaultGraph)) ++
      sg.triples.map(t => graft.model.Quad(t.s, t.p, t.o, g))
    spark.createDataset(quads).toDF()
  }

  /** Pre-binding as an algebra transform: join the pre-bound solution
   * table at every scope's LEAVES, extending each projection with the
   * pre-bound variables so they stay visible through subquery barriers —
   * the set-at-a-time equivalent of the spec's per-solution substitution
   * (one Spark plan for ALL focus nodes at once, not one engine call
   * per node). */
  private def inject(op: Op, preVars: Seq[String],
      rows: Seq[Map[String, Term]]): Op = {
    def table: Op = Table(preVars, rows)
    def in(o: Op): Op = o match {
      case Project(vs, i) => Project((vs ++ preVars).distinct, in(i))
      case Filter(c, i) => Filter(c, in(i))
      case Extend(v, e, i) => Extend(v, e, in(i))
      case Distinct(i) => Distinct(in(i))
      case Reduced(i) => Reduced(in(i))
      case Order(ks, i) => Order(ks, in(i))
      case Slice(a, b, i) => Slice(a, b, in(i))
      case Group(ks, ag, i) => Group(ks, ag, in(i))
      case Join(a, b) => Join(in(a), in(b))
      case LeftJoin(a, b, c) => LeftJoin(in(a), in(b), c)
      case Union(a, b) => Union(in(a), in(b))
      case SemiJoin(a, b) => SemiJoin(in(a), in(b))
      case AntiJoin(a, b) => AntiJoin(in(a), in(b))
      case Lateral(a, b) => Lateral(in(a), b) // RHS correlates already
      case GraphScope(gn, i) => GraphScope(gn, in(i))
      case GraphVarEnum(v, i) => GraphVarEnum(v, in(i))
      case Label(s, i) => Label(s, in(i))
      case DropVars(vs, i) => DropVars(vs, in(i))
      case leaf => Join(table, leaf)
    }
    in(op)
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[Map[String, Term]] = {
    val cols = df.columns
    df.collect().toSeq.map { r =>
      cols.zipWithIndex.flatMap { case (c, i) =>
        val x = r.getAs[org.apache.spark.sql.Row](i)
        if (x == null) None
        else Some(c -> Term(x.getByte(0), x.getString(1), x.getString(2), x.getString(3)))
      }.toMap
    }
  }

  /** Evaluate a SELECT constraint set-at-a-time. Returns one map per
   * violating solution. */
  private def runSelect(spark: SparkSession, dg: GraphIndex, sg: GraphIndex,
      text: String, preVars: Seq[String], preRows: Seq[Map[String, Term]],
      preBound: Set[String]): Seq[Map[String, Term]] = {
    if (preRows.isEmpty) return Nil
    val op = Parser.parseAny(text) match {
      case Parser.SelectQ(o) => o
      case _ => throw new IllegalArgumentException(
        "SPARQL constraint must be a SELECT query")
    }
    checkPreBinding(op, preBound, top = true)
    val eval = inject(op, preVars, preRows)
    rowsOf(Compiler.compile(eval, datasetDf(spark, dg, sg)))
  }

  /** Evaluate an ASK validator set-at-a-time; returns the (this, value)
   * pairs for which the ASK holds. */
  private def runAsk(spark: SparkSession, dg: GraphIndex, sg: GraphIndex,
      text: String, preVars: Seq[String], preRows: Seq[Map[String, Term]],
      preBound: Set[String]): Set[(Term, Term)] = {
    if (preRows.isEmpty) return Set.empty
    val op = Parser.parseAny(text) match {
      case Parser.AskQ(o) => o
      case _ => throw new IllegalArgumentException("ASK validator expected")
    }
    checkPreBinding(op, preBound, top = false)
    val eval = inject(Project(preVars, op), preVars, preRows.distinct)
    rowsOf(Compiler.compile(eval, datasetDf(spark, dg, sg)))
      .flatMap(r => for { t <- r.get("this"); v <- r.get("value") } yield (t, v))
      .toSet
  }
}
