package graft

import scala.util.Random

import org.apache.spark.sql.{DataFrame, Row}
import org.scalatest.funsuite.AnyFunSuite

import graft.algebra._
import graft.algebra.{TermCols => TC}
import graft.model.{Term, Triple}

/**
 * Dual-engine DIFFERENTIAL testing — the reference's own correctness
 * architecture (SURVEY §4.2/§5.6): a deliberately naive, materializing
 * evaluator exists purely as an oracle for the optimized engine
 * (jena-arq/.../sparql/engine/ref/QueryEngineRef.java:43,
 * EvaluatorSimple.java:50; manifest-ref-arq.ttl runs the same queries on
 * both engines and diffs). Here: `RefEval` implements SPARQL algebra
 * semantics directly over in-memory `Seq[Triple]` + `Map[String,Term]`
 * bindings (per-operator definitions from the SPARQL 1.1 spec §18.5), and
 * a fixed-seed generator produces random Op trees over the JOIN FAMILY —
 * Join/LeftJoin/Minus/Semi/Anti/Union/Filter/Extend/VALUES/Distinct/
 * Project/Group — where compatible-binding semantics bugs live (maybe-
 * bound shared variables, unbound-vs-NULL, error propagation). Each tree
 * is evaluated by the DataFrame compiler and by RefEval and compared as
 * solution MULTISETS (bag semantics).
 *
 * Expressions are generated as PAIRS (a compiler RowExpr and its local
 * semantics) because RowExpr is opaque Catalyst-column code; the catalog
 * pins the dual meaning of each operator including SPARQL error handling
 * (error = None locally, NULL column-side; Kleene AND/OR matches SQL
 * three-valued logic, QueryIterFilterExpr.java:52 drop-on-error).
 *
 * Fixed seed (offline cache has no scalatest-scalacheck bridge, like
 * NormalizeSpec); override iterations with -Dgraft.diff.n=N.
 */
class DifferentialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val EX = "http://example/"
  private def iri(s: String) = Term.iri(EX + s)
  private def int(n: Int) = Term.lit(n.toString, Term.XSD_INTEGER)

  // ------------------------------------------------------------ RefEval

  /** A solution: var → term; absent key = unbound (Binding.java:45). */
  type Sol = Map[String, Term]

  /** Dataset under evaluation: `triples` is the ACTIVE (default) graph;
   * `quads` the named-graph part (empty in triple mode). */
  final case class GData(triples: Seq[Triple], quads: Seq[graft.model.Quad])

  object RefEval {
    /** SPARQL §18.3 compatibility: agree on every shared bound var. */
    def compatible(a: Sol, b: Sol): Boolean =
      a.keySet.intersect(b.keySet).forall(k => a(k) == b(k))

    def matchPattern(g: Seq[Triple], tp: TriplePattern, sol: Sol): Seq[Sol] = {
      def slot(p: TermPat, actual: Term, acc: Sol): Option[Sol] = p match {
        case TAny => Some(acc)
        case TConst(t) => if (t == actual) Some(acc) else None
        case TVar(n) => acc.get(n) match {
          case Some(bound) => if (bound == actual) Some(acc) else None
          case None => Some(acc + (n -> actual))
        }
      }
      g.flatMap { t =>
        slot(tp.s, t.s, sol).flatMap(a => slot(tp.p, t.p, a))
          .flatMap(a => slot(tp.o, t.o, a)).toSeq
      }
    }

    /** Distinct reachability pairs (≥1 step) — Graphs.transitiveClosure. */
    def tc(rel: Seq[(Term, Term)]): Seq[(Term, Term)] = {
      val adj = rel.distinct.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      adj.keys.toSeq.flatMap { src =>
        val seen = scala.collection.mutable.Set[Term]()
        var frontier = adj.getOrElse(src, Set.empty)
        while (frontier.nonEmpty) {
          val next = frontier.filterNot(seen)
          seen ++= next
          frontier = next.flatMap(n => adj.getOrElse(n, Set.empty))
        }
        seen.toSeq.map(src -> _)
      }
    }

    /** All subject/object terms as identity pairs (zero-length node set). */
    def allNodes(g: Seq[Triple]): Seq[(Term, Term)] =
      (g.map(_.s) ++ g.map(_.o)).distinct.map(t => (t, t))

    /** Mirror of PathEval.pairs — BAG for link/inv/seq/alt/negset, SET
     * for the closure forms (visited-set ALP contract). */
    def pathRel(g: Seq[Triple], p: Path): Seq[(Term, Term)] = p match {
      case PLink(iri) =>
        g.filter(t => t.p.kind == Term.KIND_IRI && t.p.lex == iri).map(t => (t.s, t.o))
      case PNegPropSet(fwd, inv) =>
        def dir(excl: Seq[String], rev: Boolean) =
          g.filter(t => t.p.kind == Term.KIND_IRI && !excl.contains(t.p.lex))
            .map(t => if (rev) (t.o, t.s) else (t.s, t.o))
        (fwd.nonEmpty, inv.nonEmpty) match {
          case (_, false) => dir(fwd, rev = false)
          case (false, true) => dir(inv, rev = true)
          case (true, true) => dir(fwd, rev = false) ++ dir(inv, rev = true)
        }
      case PInverse(q) => pathRel(g, q).map(_.swap)
      case PAlt(a, b) => pathRel(g, a) ++ pathRel(g, b)
      case PSeq(a, b) =>
        val (la, lb) = (pathRel(g, a), pathRel(g, b))
        for ((x1, m) <- la; (m2, y) <- lb if m == m2) yield (x1, y)
      case POneOrMore(q) => tc(pathRel(g, q))
      case PZeroOrMore(q) => (tc(pathRel(g, q)) ++ allNodes(g)).distinct
      case PZeroOrOne(q) => (pathRel(g, q) ++ allNodes(g)).distinct
      case other => sys.error(s"RefEval: unsupported path $other")
    }

    /** 4-slot unification for QuadBgp: the graph slot joins exactly like
     * s/p/o (Compiler extraSlots); GRAPH never matches the default graph. */
    def matchQuad(qs: Seq[graft.model.Quad], gp: TermPat, tp: TriplePattern,
                  sol: Sol): Seq[Sol] = {
      def slot(p: TermPat, actual: Term, acc: Sol): Option[Sol] = p match {
        case TAny => Some(acc)
        case TConst(t) => if (t == actual) Some(acc) else None
        case TVar(n) => acc.get(n) match {
          case Some(b) => if (b == actual) Some(acc) else None
          case None => Some(acc + (n -> actual))
        }
      }
      qs.filter(q => q.g != Term.defaultGraph).flatMap { q =>
        slot(gp, q.g, sol).flatMap(a => slot(tp.s, q.s, a))
          .flatMap(a => slot(tp.p, q.p, a)).flatMap(a => slot(tp.o, q.o, a)).toSeq
      }
    }

    def eval(op: Op, g: GData, x: DExprs): Seq[Sol] = op match {
      case Bgp(pats) =>
        pats.foldLeft(Seq[Sol](Map.empty)) { (sols, tp) =>
          sols.flatMap(s => matchPattern(g.triples, tp, s))
        }
      case QuadBgp(gp, pats) =>
        pats.foldLeft(Seq[Sol](Map.empty)) { (sols, tp) =>
          sols.flatMap(s => matchQuad(g.quads, gp, tp, s))
        }
      case DatasetNames(gp) =>
        val names = g.quads.map(_.g).filter(_ != Term.defaultGraph).distinct
        gp match {
          // GRAPH <g> {} / GRAPH [] {} are existence gates: one unit row
          case TAny => if (names.nonEmpty) Seq(Map.empty: Sol) else Nil
          case TConst(t) =>
            if (names.contains(t)) Seq(Map.empty: Sol) else Nil
          case TVar(v) => names.map(n => Map(v -> n): Sol)
        }
      case GraphScope(gn, body) =>
        // GRAPH changes the ACTIVE graph only — the dataset's named part
        // stays visible to nested GRAPH/dataset operators (SPARQL 18.5
        // eval(D(D[iri]), P))
        val scoped = g.quads.filter(_.g == gn).map(q => Triple(q.s, q.p, q.o))
        eval(body, GData(scoped, g.quads), x)
      case GraphVarEnum(v, body) =>
        // §18.5: union over named graphs gn of Join(eval(D[gn], body), {v→gn});
        // v is NOT visible inside body — a body binding the name joins here
        val names = g.quads.map(_.g).filter(_ != Term.defaultGraph).distinct
        names.flatMap { gn =>
          val scoped = g.quads.filter(_.g == gn).map(q => Triple(q.s, q.p, q.o))
          eval(body, GData(scoped, g.quads), x).flatMap { m =>
            if (m.get(v).forall(_ == gn)) Some(m + (v -> gn)) else None
          }
        }
      case Lateral(l, r) =>
        // per-left-row RHS evaluation (set-at-a-time twin: compatible
        // join + per-tag windows). Slice/Distinct observe the left row.
        def evalLat(rr: Op, m1: Sol): Seq[Sol] = rr match {
          case Slice(off, lim, Order(keys, rb)) =>
            val merged = eval(rb, g, x).filter(compatible(m1, _)).map(m1 ++ _)
            // honor per-key direction (the generator emits ASC-only, but
            // the oracle must not silently mis-rank if that changes)
            val ord = new Ordering[Sol] {
              def compare(a: Sol, b: Sol): Int =
                keys.iterator.map { k =>
                  val c = keyOrd.compare(localKey(a.get(k.v)), localKey(b.get(k.v)))
                  if (k.ascending) c else -c
                }.find(_ != 0).getOrElse(0)
            }
            merged.sorted(ord).slice(off.toInt, off.toInt + lim.toInt)
          case Slice(_, _, _) =>
            // a per-left-row cut of UNORDERED rows is implementation-
            // arbitrary — the oracle refuses rather than guessing
            sys.error("lateral oracle: Slice without a full-key Order")
          case Distinct(rb) =>
            eval(rb, g, x).filter(compatible(m1, _)).map(m1 ++ _).distinct
          case Group(keys, aggs, rb) if keys.nonEmpty =>
            // per-left-row KEYED aggregation (Compiler.lat Group case:
            // group by left cols + keys over the compatible merged rows)
            val ms = eval(rb, g, x).filter(compatible(m1, _)).map(m1 ++ _)
            ms.groupBy(m => keys.flatMap(k => m.get(k).map(k -> _)).toMap)
              .toSeq.map { case (key, members) =>
                m1 ++ key ++ aggs.flatMap { case (n, a) =>
                  x.evalAgg(a, members).map(n -> _) }
              }
          case Group(_, _, _) =>
            sys.error("lateral oracle: keyless per-left-row Group not mirrored")
          case rb =>
            eval(rb, g, x).filter(compatible(m1, _)).map(m1 ++ _)
        }
        eval(l, g, x).flatMap(m1 => evalLat(r, m1))
      case DatasetClause(defaults, named, body) =>
        // FROM re-scope: default graph = set-UNION of the listed graphs
        // (GraphUnionRead dedup), named graphs = exactly the listed names
        val defT = g.quads.filter(q => defaults.contains(q.g.lex))
          .map(q => Triple(q.s, q.p, q.o)).distinct
        val namedQ = g.quads.filter(q =>
          named.contains(q.g.lex) && q.g != Term.defaultGraph)
        eval(body, GData(defT, namedQ), x)
      case PathPattern(sp, path, op2) =>
        var prs = pathRel(g.triples, path)
        // constant-endpoint zero-length augmentation (Compiler PathPattern:
        // SPARQL 18.4 ZeroLengthPath matches a constant against itself even
        // off-graph), mirrored incl. the consts-only distinct
        if (PathEval.allowsZero(path)) {
          val consts = Seq(sp, op2).collect { case TConst(t) => t }.distinct
          prs = prs ++ consts.map(t => (t, t))
          if (consts.nonEmpty) prs = prs.distinct
        }
        def slot(p: TermPat, actual: Term, acc: Sol): Option[Sol] = p match {
          case TAny => Some(acc)
          case TConst(t) => if (t == actual) Some(acc) else None
          case TVar(n) => acc.get(n) match {
            case Some(b) => if (b == actual) Some(acc) else None
            case None => Some(acc + (n -> actual))
          }
        }
        prs.flatMap { case (s, o) =>
          slot(sp, s, Map.empty: Sol).flatMap(a => slot(op2, o, a)).toSeq
        }
      case Join(l, r) =>
        val (ls, rs) = (eval(l, g, x), eval(r, g, x))
        for (a <- ls; b <- rs if compatible(a, b)) yield a ++ b
      case Union(l, r) => eval(l, g, x) ++ eval(r, g, x)
      case LeftJoin(l, r, cond) =>
        // §18.5 LeftJoin(Ω1,Ω2,expr) = Filter(expr, Join) ∪ Diff: μ1 alone
        // when no compatible μ2 makes expr true (false OR error both fail)
        val (ls, rs) = (eval(l, g, x), eval(r, g, x))
        val condTrue = (m: Sol) =>
          cond.forall(c => x.evalBool(c, m).contains(true))
        ls.flatMap { a =>
          val matches = rs.filter(b => compatible(a, b))
            .map(b => a ++ b).filter(condTrue)
          if (matches.nonEmpty) matches else Seq(a)
        }
      case Minus(l, r) =>
        // remove μ1 compatible with some μ2 SHARING ≥1 bound var
        // (OpExecutor.java:267–277, QueryIterMinus.java:35)
        val (ls, rs) = (eval(l, g, x), eval(r, g, x))
        ls.filter(a => !rs.exists(b =>
          compatible(a, b) && a.keySet.intersect(b.keySet).nonEmpty))
      case SemiJoin(l, r) =>
        val (ls, rs) = (eval(l, g, x), eval(r, g, x))
        ls.filter(a => rs.exists(b => compatible(a, b)))
      case AntiJoin(l, r) =>
        val (ls, rs) = (eval(l, g, x), eval(r, g, x))
        ls.filter(a => !rs.exists(b => compatible(a, b)))
      case ExistsFlag(v, r, input) =>
        val rs = eval(r, g, x)
        eval(input, g, x).map(a =>
          a + (v -> Term.lit(rs.exists(b => compatible(a, b)).toString,
            Term.XSD + "boolean")))
      case Filter(c, input) =>
        eval(input, g, x).filter(m => x.evalBool(c, m).contains(true))
      case Extend(v, e, input) =>
        // eval error ⇒ var stays unbound, row kept (QueryIterAssign.java:67)
        eval(input, g, x).map(m => x.evalTerm(e, m) match {
          case Some(t) => m + (v -> t)
          case None => m
        })
      case Project(vars, input) =>
        eval(input, g, x).map(_.filter(kv => vars.contains(kv._1)))
      case DropVars(vars, input) =>
        eval(input, g, x).map(_.filter(kv => !vars.contains(kv._1)))
      case Distinct(input) => eval(input, g, x).distinct
      case Table(_, rows) => rows
      case Group(keys, aggs, input) =>
        val sols = eval(input, g, x)
        val groups: Seq[(Sol, Seq[Sol])] =
          if (keys.isEmpty) Seq((Map.empty: Sol) -> sols)
          else sols.groupBy(m => keys.flatMap(k => m.get(k).map(k -> _)).toMap)
            .toSeq
        groups.map { case (key, members) =>
          key ++ aggs.flatMap { case (name, agg) =>
            x.evalAgg(agg, members).map(name -> _)
          }
        }
      case other => sys.error(s"RefEval: unsupported op $other")
    }
  }

  // ---------------------------------------------- dual expression catalog

  /** Registry pairing each generated RowExpr with its local semantics —
   * RowExprs are opaque closures, so the generator records both faces
   * under one id and `DExprs` dispatches the local one. */
  final class DExprs {
    sealed trait LocalF
    final case class LBool(f: Sol => Option[Boolean]) extends LocalF
    final case class LTerm(f: Sol => Option[Term]) extends LocalF
    final case class LAgg(f: Seq[Sol] => Option[Term]) extends LocalF
    private val locals = scala.collection.mutable.Map[RowExpr, LocalF]()
    private val shows = scala.collection.mutable.Map[RowExpr, String]()

    def bool(show: String, re: RowExpr, f: Sol => Option[Boolean]): RowExpr = {
      locals(re) = LBool(f); shows(re) = show; re
    }
    def term(show: String, re: RowExpr, f: Sol => Option[Term]): RowExpr = {
      locals(re) = LTerm(f); shows(re) = show; re
    }
    def agg(show: String, re: RowExpr, f: Seq[Sol] => Option[Term]): RowExpr = {
      locals(re) = LAgg(f); shows(re) = show; re
    }
    def evalBool(re: RowExpr, m: Sol): Option[Boolean] =
      locals(re) match { case LBool(f) => f(m); case _ => sys.error("not a bool expr") }
    def evalTerm(re: RowExpr, m: Sol): Option[Term] =
      locals(re) match { case LTerm(f) => f(m); case _ => sys.error("not a term expr") }
    def evalAgg(re: RowExpr, ms: Seq[Sol]): Option[Term] =
      locals(re) match { case LAgg(f) => f(ms); case _ => sys.error("not an agg expr") }
    def show(re: RowExpr): String = shows.getOrElse(re, "?")
  }

  // --------------------------------------------------------- generator

  private val varPool = Vector("a", "b", "c", "d")

  private def genTerm(rnd: Random): Term = rnd.nextInt(4) match {
    case 0 => iri("s" + rnd.nextInt(5))
    case 1 => iri("o" + rnd.nextInt(3))
    case 2 => Term.string("x" + rnd.nextInt(3)) // non-numeric: arithmetic errors
    case _ => int(1 + rnd.nextInt(5))
  }

  private def genGraph(rnd: Random): Seq[Triple] =
    (0 until (20 + rnd.nextInt(15))).map { _ =>
      Triple(iri("s" + rnd.nextInt(5)), iri("p" + rnd.nextInt(3)), genTerm(rnd))
    }.distinct

  private def genPattern(rnd: Random): TriplePattern = {
    def s = if (rnd.nextInt(10) < 6) TVar(varPool(rnd.nextInt(varPool.size)))
            else TConst(iri("s" + rnd.nextInt(5)))
    def p = if (rnd.nextInt(10) < 2) TVar(varPool(rnd.nextInt(varPool.size)))
            else TConst(iri("p" + rnd.nextInt(3)))
    def o = if (rnd.nextInt(10) < 6) TVar(varPool(rnd.nextInt(varPool.size)))
            else TConst(genTerm(rnd))
    TriplePattern(s, p, o)
  }

  private def genPath(rnd: Random, depth: Int): Path = {
    def link() = PLink(EX + "p" + rnd.nextInt(3))
    if (depth <= 0) {
      if (rnd.nextInt(5) == 0) {
        // negated property set: random forward/inverse member mix, never
        // both-empty (no !() syntax exists)
        val fwd = (0 until 3).filter(_ => rnd.nextBoolean()).map(i => EX + "p" + i)
        val inv = (0 until 3).filter(_ => rnd.nextBoolean()).map(i => EX + "p" + i)
        if (fwd.isEmpty && inv.isEmpty) PNegPropSet(Seq(EX + "p0"), Nil)
        else PNegPropSet(fwd, inv)
      } else link()
    } else rnd.nextInt(7) match {
      case 0 => PInverse(genPath(rnd, depth - 1))
      case 1 => PSeq(genPath(rnd, depth - 1), genPath(rnd, depth - 1))
      case 2 => PAlt(genPath(rnd, depth - 1), genPath(rnd, depth - 1))
      case 3 => POneOrMore(genPath(rnd, depth - 1))
      case 4 => PZeroOrMore(genPath(rnd, depth - 1))
      case 5 => PZeroOrOne(genPath(rnd, depth - 1))
      case _ => genPath(rnd, 0)
    }
  }

  private def showPath(p: Path): String = p match {
    case PLink(i) => i.stripPrefix(EX)
    case PInverse(q) => s"^(${showPath(q)})"
    case PSeq(a, b) => s"(${showPath(a)}/${showPath(b)})"
    case PAlt(a, b) => s"(${showPath(a)}|${showPath(b)})"
    case POneOrMore(q) => s"(${showPath(q)})+"
    case PZeroOrMore(q) => s"(${showPath(q)})*"
    case PZeroOrOne(q) => s"(${showPath(q)})?"
    case PNegPropSet(f, i) =>
      s"!(${(f.map(_.stripPrefix(EX)) ++ i.map("^" + _.stripPrefix(EX))).mkString("|")})"
    case other => other.toString
  }

  /** Kleene three-valued AND/OR — SQL NULL logic ≡ SPARQL error logic. */
  private def k3And(a: Option[Boolean], b: Option[Boolean]): Option[Boolean] =
    (a, b) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }
  private def k3Or(a: Option[Boolean], b: Option[Boolean]): Option[Boolean] =
    (a, b) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }

  private def localNum(t: Term): Option[Double] =
    if (t.kind == Term.KIND_LIT && (t.dt == Term.XSD_INTEGER ||
        t.dt == Term.XSD_DECIMAL || t.dt == Term.XSD_DOUBLE))
      t.lex.toDoubleOption
    else None

  /** Local mirror of TermCols.sortKey (SPARQL total order) over this
   * spec's term universe (IRIs, strings, canonical integers). */
  private def localKey(t: Option[Term]): (Int, Int, Double, String, String, String) =
    t match {
      case None => (0, 1, 0.0, "", "", "")
      case Some(x) =>
        val kr = x.kind match {
          case Term.KIND_BNODE => 1
          case Term.KIND_IRI => 2
          case Term.KIND_TRIPLE_TERM => 4
          case _ => 3
        }
        val num = localNum(x)
        (kr, if (num.isDefined) 0 else 1, num.getOrElse(0.0), x.lex, x.dt, x.lang)
    }
  private val keyOrd =
    implicitly[Ordering[(Int, Int, Double, String, String, String)]]

  private def genCond(rnd: Random, vars: Seq[String], x: DExprs, depth: Int = 0): RowExpr = {
    def vr() = vars(rnd.nextInt(vars.size))
    if (vars.isEmpty)
      return x.bool("true", RowExpr(_ => org.apache.spark.sql.functions.lit(true)),
        _ => Some(true))
    rnd.nextInt(if (depth < 1) 7 else 5) match {
      case 0 =>
        val v0 = vr()
        x.bool(s"BOUND(?$v0)", RowExpr(r => r(v0).isNotNull),
          m => Some(m.contains(v0)))
      case 1 =>
        val (v0, t) = (vr(), genTerm(rnd))
        x.bool(s"sameTerm(?$v0, ${rTerm(t)})", RowExpr(r => r(v0) === TC.const(t)),
          m => m.get(v0).map(_ == t))
      case 2 =>
        val (v0, k) = (vr(), 1 + rnd.nextInt(5))
        x.bool(s"(?$v0 < $k)", RowExpr(r => TC.numValue(r(v0)) < k),
          m => m.get(v0).flatMap(localNum).map(_ < k))
      case 3 =>
        val (v0, v1) = (vr(), vr())
        x.bool(s"sameTerm(?$v0, ?$v1)", RowExpr(r => r(v0) === r(v1)),
          m => for (a <- m.get(v0); b <- m.get(v1)) yield a == b)
      case 4 =>
        val v0 = vr()
        x.bool(s"isIRI(?$v0)", RowExpr(r => TC.isIri(r(v0))),
          m => m.get(v0).map(_.kind == Term.KIND_IRI))
      case 5 =>
        val (c1, c2) = (genCond(rnd, vars, x, depth + 1), genCond(rnd, vars, x, depth + 1))
        x.bool(s"(${x.show(c1)} && ${x.show(c2)})",
          RowExpr(r => c1(r) && c2(r)),
          m => k3And(x.evalBool(c1, m), x.evalBool(c2, m)))
      case _ =>
        val (c1, c2) = (genCond(rnd, vars, x, depth + 1), genCond(rnd, vars, x, depth + 1))
        x.bool(s"(${x.show(c1)} || ${x.show(c2)})",
          RowExpr(r => c1(r) || c2(r)),
          m => k3Or(x.evalBool(c1, m), x.evalBool(c2, m)))
    }
  }

  private def genTermExpr(rnd: Random, vars: Seq[String], x: DExprs,
                          depth: Int = 0): RowExpr = {
    import org.apache.spark.sql.functions.{when, lit}
    def vr() = vars(rnd.nextInt(vars.size))
    rnd.nextInt(if (vars.isEmpty) 1 else if (depth < 1) 6 else 3) match {
      case 0 =>
        val t = genTerm(rnd)
        x.term(rTerm(t), RowExpr(_ => TC.const(t)), _ => Some(t))
      case 1 =>
        val v0 = vr()
        x.term(s"?$v0", RowExpr(r => r(v0)), m => m.get(v0))
      case 2 =>
        // num(v)+1 as xsd:integer; non-numeric/unbound ⇒ error ⇒ unbound
        val v0 = vr()
        x.term(s"(?$v0 + 1)",
          RowExpr { r =>
            val n = TC.numValue(r(v0))
            when(n.isNotNull, TC.intTerm(n + 1))
          },
          m => m.get(v0).flatMap(localNum).map(d => int((d + 1).toLong.toInt)))
      case 3 =>
        // STR(?v): the lexical form as a simple literal (E_Str)
        val v0 = vr()
        x.term(s"STR(?$v0)",
          RowExpr(r => graft.functions.SparqlFunctions.str(r(v0))),
          m => m.get(v0).map(t => Term.string(t.lex)))
      case 4 =>
        // COALESCE: first argument that does NOT error (E_Coalesce)
        val (e1, e2) = (genTermExpr(rnd, vars, x, depth + 1),
          genTermExpr(rnd, vars, x, depth + 1))
        x.term(s"COALESCE(${x.show(e1)}, ${x.show(e2)})",
          RowExpr(r => graft.functions.SparqlFunctions.coalesceFn(e1(r), e2(r))),
          m => x.evalTerm(e1, m).orElse(x.evalTerm(e2, m)))
      case _ =>
        // IF: an erroring condition errors the whole IF (E_If; the same
        // guarded shape the Parser emits)
        val c = genCond(rnd, vars, x, 1)
        val (e1, e2) = (genTermExpr(rnd, vars, x, depth + 1),
          genTermExpr(rnd, vars, x, depth + 1))
        x.term(s"IF(${x.show(c)}, ${x.show(e1)}, ${x.show(e2)})",
          RowExpr { r =>
            val cc = c(r)
            when(cc.isNull, lit(null).cast(TC.schema))
              .otherwise(graft.functions.SparqlFunctions.ifFn(cc, e1(r), e2(r)))
          },
          m => x.evalBool(c, m) match {
            case None => None
            case Some(true) => x.evalTerm(e1, m)
            case Some(false) => x.evalTerm(e2, m)
          })
    }
  }

  /** Quad mode (set by the dataset differential test, read by leaf()):
   * adds QuadBgp / DatasetNames / GraphScope / GraphVarEnum leaves. Tests
   * in a funsuite run sequentially, so a field flag is safe. */
  private var quadMode = false
  /** Text mode additionally suppresses DatasetClause leaves (FROM is
   * query-level syntax, not renderable inside a group). */
  private var textMode = false

  private def genGraphName(rnd: Random): Term = iri("g" + (1 + rnd.nextInt(2)))

  /** Returns (op, visibleVars). Depth-bounded; expressions only reference
   * visible vars (the Parser's scope tracking guarantees the same). */
  private def genOp(rnd: Random, x: DExprs, depth: Int): (Op, Seq[String]) = {
    def quadLeaf(): (Op, Seq[String]) = rnd.nextInt(5) match {
      case 4 if !textMode =>
        // FROM / FROM NAMED re-scope over a shallow quad-mode body;
        // overlapping FROM graphs exercise the set-union dedup
        val all = Seq(EX + "g1", EX + "g2")
        val defaults = all.filter(_ => rnd.nextBoolean())
        val named = all.filter(_ => rnd.nextBoolean())
        val (body, vs) = genOp(rnd, x, 1)
        (DatasetClause(defaults, named, body), vs)
      case 0 =>
        val gp = if (rnd.nextBoolean()) TVar(varPool(rnd.nextInt(varPool.size)))
                 else TConst(genGraphName(rnd))
        val pats = (0 until 1 + rnd.nextInt(2)).map(_ => genPattern(rnd))
        (QuadBgp(gp, pats),
          (pats.flatMap(_.vars) ++ Seq(gp).collect { case TVar(n) => n }).distinct)
      case 1 =>
        val gp = if (rnd.nextBoolean()) TVar(varPool(rnd.nextInt(varPool.size)))
                 else TConst(genGraphName(rnd))
        (DatasetNames(gp), Seq(gp).collect { case TVar(n) => n })
      case 2 =>
        // body may itself contain GRAPH/dataset leaves: nested GRAPH
        // keeps the dataset's named part visible (quad-preserving
        // GraphScope re-scope)
        val (body, vs) = genOp(rnd, x, if (rnd.nextBoolean()) 1 else 0)
        (GraphScope(genGraphName(rnd), body), vs)
      case _ =>
        val v = varPool(rnd.nextInt(varPool.size))
        val pats = (0 until 1 + rnd.nextInt(2)).map(_ => genPattern(rnd))
        (GraphVarEnum(v, Bgp(pats)), (pats.flatMap(_.vars) :+ v).distinct)
    }
    def leaf(): (Op, Seq[String]) =
      if (quadMode && rnd.nextInt(10) < 5) quadLeaf()
      else rnd.nextInt(7) match {
      case 0 => // VALUES with occasional unbound cells
        val vs = rnd.shuffle(varPool).take(1 + rnd.nextInt(2)).sorted
        val rows = (0 until 1 + rnd.nextInt(3)).map { _ =>
          vs.flatMap(v => if (rnd.nextInt(4) == 0) None
                          else Some(v -> genTerm(rnd))).toMap
        }
        (Table(vs, rows), vs)
      case 1 => // property path: var/const endpoint mix
        def end() = if (rnd.nextInt(10) < 6) TVar(varPool(rnd.nextInt(varPool.size)))
                    else TConst(genTerm(rnd))
        val (s, o) = (end(), end())
        val pp = PathPattern(s, genPath(rnd, 1 + rnd.nextInt(2)), o)
        (pp, Seq(s, o).collect { case TVar(n) => n }.distinct)
      case _ =>
        val pats = (0 until 1 + rnd.nextInt(2)).map(_ => genPattern(rnd))
        (Bgp(pats), pats.flatMap(_.vars).distinct)
    }
    if (depth <= 0) leaf()
    else rnd.nextInt(12) match {
      case 0 => leaf()
      case 1 =>
        val (l, lv) = genOp(rnd, x, depth - 1)
        val (r, rv) = genOp(rnd, x, depth - 1)
        (Join(l, r), (lv ++ rv).distinct)
      case 2 =>
        val (l, lv) = genOp(rnd, x, depth - 1)
        val (r, rv) = genOp(rnd, x, depth - 1)
        (Union(l, r), (lv ++ rv).distinct)
      case 3 =>
        val (l, lv) = genOp(rnd, x, depth - 1)
        val (r, rv) = genOp(rnd, x, depth - 1)
        val cond = if (rnd.nextBoolean()) Some(genCond(rnd, (lv ++ rv).distinct, x))
                   else None
        (LeftJoin(l, r, cond), (lv ++ rv).distinct)
      case 4 =>
        val (l, lv) = genOp(rnd, x, depth - 1)
        val (r, _) = genOp(rnd, x, depth - 1)
        (Minus(l, r), lv)
      case 5 =>
        val (l, lv) = genOp(rnd, x, depth - 1)
        val (r, _) = genOp(rnd, x, depth - 1)
        (if (rnd.nextBoolean()) SemiJoin(l, r) else AntiJoin(l, r), lv)
      case 6 =>
        val (in, vs) = genOp(rnd, x, depth - 1)
        (Filter(genCond(rnd, vs, x), in), vs)
      case 7 =>
        val (in, vs) = genOp(rnd, x, depth - 1)
        val fresh = varPool.find(!vs.contains(_))
        fresh match {
          case Some(v) => (Extend(v, genTermExpr(rnd, vs, x), in), vs :+ v)
          case None => (in, vs)
        }
      case 8 =>
        val (in, vs) = genOp(rnd, x, depth - 1)
        (Distinct(in), vs)
      case 9 =>
        val (in, vs) = genOp(rnd, x, depth - 1)
        if (vs.isEmpty) (in, vs)
        else {
          val keep = rnd.shuffle(vs).take(1 + rnd.nextInt(vs.size))
          (Project(keep, in), keep)
        }
      case 10 =>
        // GROUP BY one key + one aggregate: unbound keys group together
        val (in, vs) = genOp(rnd, x, depth - 1)
        if (vs.size < 2) (in, vs)
        else {
          val key = vs(rnd.nextInt(vs.size))
          val cv = vs(rnd.nextInt(vs.size))
          // agg var must be FRESH (SPARQL forbids reusing an in-scope var
          // as the AS target — nested Groups put "n" in scope)
          val n = (Iterator.single("n") ++ Iterator.from(2).map("n" + _))
            .find(c => !vs.contains(c)).get
          def bound(ms: Seq[Sol]) = ms.flatMap(_.get(cv))
          val a = rnd.nextInt(5) match {
            case 0 => x.agg(s"COUNT(?$cv)",
              RowExpr(r => TC.intTerm(org.apache.spark.sql.functions.count(r(cv)))),
              ms => Some(int(ms.count(_.contains(cv)))))
            case 1 => x.agg(s"COUNT(DISTINCT ?$cv)",
              RowExpr(r => TC.intTerm(org.apache.spark.sql.functions.count_distinct(r(cv)))),
              ms => Some(int(bound(ms).distinct.size)))
            case 2 => x.agg(s"SUM(?$cv)",
              RowExpr(r => SparqlAggregates.sumAgg(r(cv))),
              // poisoned by any bound non-numeric; empty sum = integer 0;
              // integer-only universe keeps the promoted rank at integer
              ms => if (bound(ms).exists(t => localNum(t).isEmpty)) None
                    else Some(int(bound(ms).flatMap(localNum).sum.toLong.toInt)))
            case 3 => x.agg(s"MIN(?$cv)",
              RowExpr(r => SparqlAggregates.minAgg(r(cv))),
              ms => bound(ms).sortBy(t => localKey(Some(t)))(keyOrd).headOption)
            case _ => x.agg(s"MAX(?$cv)",
              RowExpr(r => SparqlAggregates.maxAgg(r(cv))),
              ms => bound(ms).sortBy(t => localKey(Some(t)))(keyOrd).lastOption)
          }
          (Group(Seq(key), Seq(n -> a), in), Seq(key, n))
        }
      case _ =>
        val (in, vs) = genOp(rnd, x, depth - 1)
        val (r, _) = genOp(rnd, x, depth - 1)
        val fresh = varPool.find(!vs.contains(_))
        fresh match {
          case Some(v) =>
            // spend the flag in a filter, then drop it — the common
            // expression-level EXISTS compilation shape
            val f = x.bool(s"flag($v)",
              RowExpr(rr => TC.lex(rr(v)) === "true"),
              m => m.get(v).map(_.lex == "true"))
            (DropVars(Seq(v), Filter(f, ExistsFlag(v, r, in))), vs)
          case None => (in, vs)
        }
    }
  }

  private def showOp(op: Op, x: DExprs): String = op match {
    case Bgp(ps) => "BGP(" + ps.map(p => s"${sl(p.s)} ${sl(p.p)} ${sl(p.o)}").mkString(" . ") + ")"
    case PathPattern(s, p, o) => s"Path(${sl(s)} ${showPath(p)} ${sl(o)})"
    case Join(l, r) => s"Join(${showOp(l, x)}, ${showOp(r, x)})"
    case Union(l, r) => s"Union(${showOp(l, x)}, ${showOp(r, x)})"
    case LeftJoin(l, r, c) =>
      s"LeftJoin(${showOp(l, x)}, ${showOp(r, x)}, ${c.map(x.show).getOrElse("-")})"
    case Minus(l, r) => s"Minus(${showOp(l, x)}, ${showOp(r, x)})"
    case SemiJoin(l, r) => s"Semi(${showOp(l, x)}, ${showOp(r, x)})"
    case AntiJoin(l, r) => s"Anti(${showOp(l, x)}, ${showOp(r, x)})"
    case ExistsFlag(v, r, in) => s"ExistsFlag($v, ${showOp(r, x)}, ${showOp(in, x)})"
    case Filter(c, in) => s"Filter(${x.show(c)}, ${showOp(in, x)})"
    case Extend(v, e, in) => s"Extend($v := ${x.show(e)}, ${showOp(in, x)})"
    case Project(vs, in) => s"Project(${vs.mkString(",")}, ${showOp(in, x)})"
    case DropVars(vs, in) => s"Drop(${vs.mkString(",")}, ${showOp(in, x)})"
    case Distinct(in) => s"Distinct(${showOp(in, x)})"
    case Group(ks, as, in) =>
      s"Group(${ks.mkString(",")}, ${as.map(a => a._1 + "=" + x.show(a._2)).mkString(",")}, ${showOp(in, x)})"
    case Table(vs, rows) => s"VALUES(${vs.mkString(",")} × ${rows.size})"
    case QuadBgp(gp, ps) =>
      s"QuadBGP(${sl(gp)}, " + ps.map(p => s"${sl(p.s)} ${sl(p.p)} ${sl(p.o)}").mkString(" . ") + ")"
    case DatasetNames(gp) => s"DatasetNames(${sl(gp)})"
    case GraphScope(gn, in) => s"Graph(${gn.lex.stripPrefix(EX)}, ${showOp(in, x)})"
    case DatasetClause(d, n, in) =>
      s"From(${d.map(_.stripPrefix(EX)).mkString(",")}; named=${n.map(_.stripPrefix(EX)).mkString(",")}, ${showOp(in, x)})"
    case GraphVarEnum(v, in) => s"GraphVar(?$v, ${showOp(in, x)})"
    case other => other.toString
  }
  private def sl(p: TermPat): String = p match {
    case TVar(n) => "?" + n
    case TConst(t) => t.lex.stripPrefix(EX)
    case TAny => "ANY"
  }

  // ------------------------------------------------ SPARQL text renderer

  private def rTerm(t: Term): String = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r")
    t.kind match {
      case Term.KIND_IRI => s"<${t.lex}>"
      case _ if t.dt == Term.XSD_INTEGER => t.lex
      case _ if t.dt == Term.XSD_STRING => "\"" + esc(t.lex) + "\""
      case _ => "\"" + esc(t.lex) + "\"^^<" + t.dt + ">"
    }
  }
  private def rPat(p: TermPat): String = p match {
    case TVar(n) => s"?$n"
    case TConst(t) => rTerm(t)
    case TAny => sys.error("TAny has no surface syntax")
  }
  private def rPath(p: Path): String = p match {
    case PLink(i) => s"<$i>"
    case PInverse(q) => s"^(${rPath(q)})"
    case PSeq(a, b) => s"(${rPath(a)}/${rPath(b)})"
    case PAlt(a, b) => s"(${rPath(a)}|${rPath(b)})"
    case POneOrMore(q) => s"(${rPath(q)})+"
    case PZeroOrMore(q) => s"(${rPath(q)})*"
    case PZeroOrOne(q) => s"(${rPath(q)})?"
    case PNegPropSet(f, i) =>
      s"!(${(f.map(x => s"<$x>") ++ i.map(x => s"^<$x>")).mkString("|")})"
    case other => sys.error(s"no syntax for $other")
  }

  /** Render a generated op as a SPARQL group-graph-pattern body. None for
   * shapes with no group-level surface syntax (DatasetClause mid-tree).
   * The expression catalog's `show` strings are valid SPARQL. */
  private def render(op: Op, x: DExprs): Option[String] = op match {
    case Bgp(ps) =>
      Some(ps.map(p => s"${rPat(p.s)} ${rPat(p.p)} ${rPat(p.o)} .").mkString(" "))
    case PathPattern(s, p, o) => Some(s"${rPat(s)} ${rPath(p)} ${rPat(o)} .")
    case QuadBgp(gp, ps) =>
      Some(s"GRAPH ${rPat(gp)} { " +
        ps.map(p => s"${rPat(p.s)} ${rPat(p.p)} ${rPat(p.o)} .").mkString(" ") + " }")
    case DatasetNames(gp) => Some(s"GRAPH ${rPat(gp)} { }")
    case GraphScope(gn, in) => render(in, x).map(b => s"GRAPH ${rTerm(gn)} { $b }")
    case GraphVarEnum(v, in) => render(in, x).map(b => s"GRAPH ?$v { $b }")
    case Join(l, r) =>
      for { a <- render(l, x); b <- render(r, x) } yield s"{ $a } { $b }"
    case Union(l, r) =>
      for { a <- render(l, x); b <- render(r, x) } yield s"{ $a } UNION { $b }"
    // OPTIONAL and MINUS are group-accumulation elements (they apply to
    // everything accumulated so far in their group) — wrap in their own
    // group so a parent's siblings stay outside the left operand
    case LeftJoin(l, r, cond) =>
      for { a <- render(l, x); b <- render(r, x) } yield
        s"{ { $a } OPTIONAL { $b ${cond.map(c => s"FILTER(${x.show(c)})").getOrElse("")} } }"
    case Minus(l, r) =>
      for { a <- render(l, x); b <- render(r, x) } yield s"{ { $a } MINUS { $b } }"
    // the EXISTS-ish renders wrap themselves in an EXTRA group: a SPARQL
    // filter applies to the WHOLE group it appears in, AFTER any sibling
    // BIND/patterns a parent may concatenate — without the wrapping, a
    // parent's BIND would enter the filter's scope and diverge from the
    // algebra (caught by the text differential)
    case SemiJoin(l, r) =>
      for { a <- render(l, x); b <- render(r, x) } yield
        s"{ { $a } FILTER EXISTS { $b } }"
    case AntiJoin(l, r) =>
      for { a <- render(l, x); b <- render(r, x) } yield
        s"{ { $a } FILTER NOT EXISTS { $b } }"
    case DropVars(Seq(v), Filter(_, ExistsFlag(v2, r, in))) if v == v2 =>
      // the generator's expression-level-EXISTS composite ≡ FILTER EXISTS
      for { a <- render(in, x); b <- render(r, x) } yield
        s"{ { $a } FILTER EXISTS { $b } }"
    case Filter(c, in) => render(in, x).map(b => s"{ $b FILTER(${x.show(c)}) }")
    case Extend(v, e, in) =>
      render(in, x).map(b => s"{ $b BIND(${x.show(e)} AS ?$v) }")
    case Distinct(in) =>
      render(in, x).map(b => s"{ SELECT DISTINCT * WHERE { $b } }")
    case Project(vs, in) =>
      render(in, x).map(b =>
        s"{ SELECT ${vs.map("?" + _).mkString(" ")} WHERE { $b } }")
    case Group(Seq(k), Seq((n, a)), in) =>
      render(in, x).map(b =>
        s"{ SELECT ?$k (${x.show(a)} AS ?$n) WHERE { $b } GROUP BY ?$k }")
    case Table(vs, rows) =>
      Some(s"VALUES (${vs.map("?" + _).mkString(" ")}) { " +
        rows.map(r => "(" + vs.map(v => r.get(v).map(rTerm).getOrElse("UNDEF"))
          .mkString(" ") + ")").mkString(" ") + " }")
    case _ => None
  }

  // --------------------------------------------------------- comparison

  private def collectSols(df: DataFrame): Seq[Sol] = {
    val vars = df.schema.fields.zipWithIndex.collect {
      case (f, idx) if f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType]
        && !f.name.startsWith("__") => // compiler-internal helper columns
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

  private def bag(sols: Seq[Sol]): Map[String, Int] =
    sols.map(m => m.toSeq.sortBy(_._1)
        .map { case (k, t) => s"$k=${t.kind}:${t.lex}:${t.dt}:${t.lang}" }
        .mkString("|"))
      .groupBy(identity).map { case (k, v) => k -> v.size }

  // --------------------------------------------------------------- test

  private val iterations =
    sys.props.get("graft.diff.n").map(_.toInt).getOrElse(60)

  test(s"differential: compiler ≡ naive evaluator on $iterations random plans") {
    val failures = Seq.newBuilder[String]
    var checked = 0
    (0 until iterations).foreach { i =>
      val rnd = new Random(0xD1FF + i)
      val x = new DExprs
      val g = genGraph(rnd)
      val (op, _) = genOp(rnd, x, depth = 2 + i % 3)
      val gdf = spark.createDataset(g)(
        org.apache.spark.sql.Encoders.product[Triple]).toDF()
      val expected = bag(RefEval.eval(op, GData(g, Nil), x))
      var crashed = false
      val actual =
        try bag(collectSols(Compiler.compile(op, gdf)))
        catch {
          case e: Exception =>
            failures += s"[$i] COMPILE FAILED: ${e.getMessage}\n  ${showOp(op, x)}"
            crashed = true
            Map.empty[String, Int]
        }
      checked += 1
      if (!crashed)
        if (actual != expected) {
          val missing = expected.toSeq.filterNot(kv => actual.get(kv._1).contains(kv._2))
          val extra = actual.toSeq.filterNot(kv => expected.get(kv._1).contains(kv._2))
          failures += s"[$i] MISMATCH ${showOp(op, x)}\n  expected-but-not-actual: " +
            s"${missing.take(4)}\n  actual-but-not-expected: ${extra.take(4)}"
        }
    }
    val fs = failures.result()
    assert(fs.isEmpty, s"${fs.size}/$checked differential failures:\n" +
      fs.take(6).mkString("\n"))
  }

  /** Store-path differential: the same random plans evaluated against a
   * MATERIALIZED TripleStore snapshot (SnapshotGraph — layout-aware
   * pattern compilation picking SPO/POS/OSP with pushed parquet filters)
   * must agree with the naive evaluator; exercises all 8 pattern shapes
   * against the custom scan-selection logic. One fixed graph, 30 plans. */
  test("differential: SnapshotGraph store read path on 30 random plans") {
    import org.apache.spark.sql.functions.lit
    val failures = Seq.newBuilder[String]
    val g = genGraph(new Random(0x570E))
    val gdf = spark.createDataset(g)(
      org.apache.spark.sql.Encoders.product[Triple]).toDF()
    val snap = java.nio.file.Files.createTempDirectory("graft_diff_snap").toString
    graft.store.TripleStore.materialize(
      gdf.withColumn("repo", lit("r0")).withColumn("lang", lit("x")),
      snap, parent = None, partitions = 2)
    val sg = Compiler.SnapshotGraph(spark, snap)
    (0 until 30).foreach { i =>
      val rnd = new Random(0x570E + 1 + i)
      val x = new DExprs
      val (op, _) = genOp(rnd, x, depth = 2 + i % 2)
      val expected = bag(RefEval.eval(op, GData(g, Nil), x))
      try {
        val actual = bag(collectSols(Compiler.compile(op, sg)))
        if (actual != expected) {
          val missing = expected.toSeq.filterNot(kv => actual.get(kv._1).contains(kv._2))
          val extra = actual.toSeq.filterNot(kv => expected.get(kv._1).contains(kv._2))
          failures += s"[$i] MISMATCH ${showOp(op, x)}\n  expected-but-not-actual: " +
            s"${missing.take(4)}\n  actual-but-not-expected: ${extra.take(4)}"
        }
      } catch {
        case e: Exception =>
          failures += s"[$i] COMPILE FAILED: ${e.getMessage}\n  ${showOp(op, x)}"
      }
    }
    val fs = failures.result()
    assert(fs.isEmpty, s"${fs.size} store-differential failures:\n" +
      fs.take(6).mkString("\n"))
  }

  /** Id-encoded store differential: the same plan family against a
   * dictionary-encoded snapshot (EncodedSnapshotGraph — narrow id
   * equi-joins with decode at projection edges; the TDB2 NodeTable
   * analog) must match the naive evaluator. */
  test("differential: EncodedSnapshotGraph id store on 30 random plans") {
    import org.apache.spark.sql.functions.lit
    val failures = Seq.newBuilder[String]
    val g = genGraph(new Random(0xE6C0))
    val gdf = spark.createDataset(g)(
      org.apache.spark.sql.Encoders.product[Triple]).toDF()
    val snap = java.nio.file.Files.createTempDirectory("graft_diff_enc").toString
    graft.store.TripleStore.materializeEncoded(
      gdf.withColumn("repo", lit("r0")).withColumn("lang", lit("x")),
      snap, parent = None, partitions = 2)
    val sg = Compiler.EncodedSnapshotGraph(spark, snap)
    (0 until 30).foreach { i =>
      val rnd = new Random(0xE6C0 + 1 + i)
      val x = new DExprs
      val (op, _) = genOp(rnd, x, depth = 2 + i % 2)
      val expected = bag(RefEval.eval(op, GData(g, Nil), x))
      try {
        val actual = bag(collectSols(Compiler.compile(op, sg)))
        if (actual != expected) {
          val missing = expected.toSeq.filterNot(kv => actual.get(kv._1).contains(kv._2))
          val extra = actual.toSeq.filterNot(kv => expected.get(kv._1).contains(kv._2))
          failures += s"[$i] MISMATCH ${showOp(op, x)}\n  expected-but-not-actual: " +
            s"${missing.take(4)}\n  actual-but-not-expected: ${extra.take(4)}"
        }
      } catch {
        case e: Exception =>
          failures += s"[$i] COMPILE FAILED: ${e.getMessage}\n  ${showOp(op, x)}"
      }
    }
    val fs = failures.result()
    assert(fs.isEmpty, s"${fs.size} encoded-store-differential failures:\n" +
      fs.take(6).mkString("\n"))
  }

  /** Dataset (quad) differential: random plans over a dataset with a
   * default graph + two named graphs — QuadBgp (graph slot joins like
   * s/p/o, never the default graph), DatasetNames, GRAPH <const>,
   * GRAPH ?var (per-graph enumeration with the boundary join), and the
   * default-graph scoping of plain BGPs and property paths. */
  test("differential: dataset semantics on 40 random quad plans") {
    import graft.model.Quad
    val failures = Seq.newBuilder[String]
    quadMode = true
    try (0 until 40).foreach { i =>
      val rnd = new Random(0x9AAD + i)
      val x = new DExprs
      val defG = genGraph(rnd)
      val named = (0 until 15 + rnd.nextInt(10)).map { _ =>
        Quad(iri("s" + rnd.nextInt(5)), iri("p" + rnd.nextInt(3)),
          genTerm(rnd), genGraphName(rnd))
      }.distinct
      val allQuads = defG.map(t => Quad(t.s, t.p, t.o, Term.defaultGraph)) ++ named
      val qdf = spark.createDataset(allQuads)(
        org.apache.spark.sql.Encoders.product[Quad]).toDF()
      val (op, _) = genOp(rnd, x, depth = 2 + i % 2)
      val expected = bag(RefEval.eval(op, GData(defG, named), x))
      try {
        val actual = bag(collectSols(Compiler.compile(op, qdf)))
        if (actual != expected) {
          val missing = expected.toSeq.filterNot(kv => actual.get(kv._1).contains(kv._2))
          val extra = actual.toSeq.filterNot(kv => expected.get(kv._1).contains(kv._2))
          failures += s"[$i] MISMATCH ${showOp(op, x)}\n  expected-but-not-actual: " +
            s"${missing.take(4)}\n  actual-but-not-expected: ${extra.take(4)}"
        }
      } catch {
        case e: Exception =>
          failures += s"[$i] COMPILE FAILED: ${e.getMessage}\n  ${showOp(op, x)}"
      }
    } finally quadMode = false
    val fs = failures.result()
    assert(fs.isEmpty, s"${fs.size} quad-differential failures:\n" +
      fs.take(6).mkString("\n"))
  }

  /** GRAPH ?var single-plan differential: rich GRAPH-LOCAL bodies
   * (BGPs, paths incl. closures and negated sets, VALUES, joins,
   * OPTIONAL, MINUS, EXISTS/NOT-EXISTS, DISTINCT) compiled through the
   * one-g-keyed-plan path — the enumeration fallback is CAPPED AT ZERO,
   * so only compGraphVar can serve — against RefEval's per-graph
   * enumeration semantics. Pins the active-graph threading through every
   * binary operator and the (g, node)-packed closures. */
  test("differential: GRAPH ?var single-plan on 40 rich graph-local bodies") {
    import graft.model.Quad
    val failures = Seq.newBuilder[String]
    quadMode = true
    spark.conf.set("graft.graphVarEnumMax", "0") // enumeration cannot serve
    try (0 until 40).foreach { i =>
      val rnd = new Random(0x51A6 + i)
      val x = new DExprs
      val defG = genGraph(rnd)
      val named = (0 until 15 + rnd.nextInt(10)).map { _ =>
        Quad(iri("s" + rnd.nextInt(5)), iri("p" + rnd.nextInt(3)),
          genTerm(rnd), genGraphName(rnd))
      }.distinct
      val allQuads = defG.map(t => Quad(t.s, t.p, t.o, Term.defaultGraph)) ++ named
      val qdf = spark.createDataset(allQuads)(
        org.apache.spark.sql.Encoders.product[Quad]).toDF()
      def leaf(): Op = rnd.nextInt(6) match {
        case 0 =>
          val s = if (rnd.nextBoolean()) TVar(varPool(rnd.nextInt(varPool.size)))
                  else TConst(iri("s" + rnd.nextInt(5)))
          PathPattern(s, genPath(rnd, 1), TVar(varPool(rnd.nextInt(varPool.size))))
        case 1 =>
          val vs = rnd.shuffle(varPool).take(1 + rnd.nextInt(2)).sorted
          Table(vs, (0 until 1 + rnd.nextInt(2)).map(_ =>
            vs.flatMap(v => if (rnd.nextInt(4) == 0) None
                            else Some(v -> genTerm(rnd))).toMap))
        case _ => Bgp((0 until 1 + rnd.nextInt(2)).map(_ => genPattern(rnd)))
      }
      def body(depth: Int): Op =
        if (depth == 0) leaf()
        else rnd.nextInt(9) match {
          case 0 => Join(body(depth - 1), body(depth - 1))
          case 1 => Union(body(depth - 1), body(depth - 1))
          case 2 => LeftJoin(body(depth - 1), body(depth - 1), None)
          case 3 => Minus(body(depth - 1), body(depth - 1))
          case 4 => SemiJoin(body(depth - 1), body(depth - 1))
          case 5 => AntiJoin(body(depth - 1), body(depth - 1))
          case 6 => Distinct(body(depth - 1))
          // LATERAL threads the hidden graph column through the
          // correlated leaf compiler (r5); per-row-sensitive (Distinct)
          // and plain RHSs both exercised
          case 7 => Lateral(body(depth - 1),
            if (rnd.nextBoolean()) Distinct(leaf()) else leaf())
          case _ => leaf()
        }
      val v = varPool(rnd.nextInt(varPool.size))
      val op = GraphVarEnum(v, body(1 + rnd.nextInt(2)))
      val expected = bag(RefEval.eval(op, GData(defG, named), x))
      try {
        val actual = bag(collectSols(Compiler.compile(op, qdf)))
        if (actual != expected) {
          val missing = expected.toSeq.filterNot(kv => actual.get(kv._1).contains(kv._2))
          val extra = actual.toSeq.filterNot(kv => expected.get(kv._1).contains(kv._2))
          failures += s"[$i] MISMATCH ${showOp(op, x)}\n  expected-but-not-actual: " +
            s"${missing.take(4)}\n  actual-but-not-expected: ${extra.take(4)}"
        }
      } catch {
        case e: Exception =>
          failures += s"[$i] COMPILE FAILED: ${e.getMessage}\n  ${showOp(op, x)}"
      }
    } finally {
      quadMode = false
      spark.conf.unset("graft.graphVarEnumMax")
    }
    val fs = failures.result()
    assert(fs.isEmpty, s"${fs.size} GRAPH-?var-single-plan failures:\n" +
      fs.take(6).mkString("\n"))
  }

  /** SPARQL TEXT differential: render each random plan as query text,
   * run it through the full Parser → Compiler path, and compare to the
   * naive evaluation of the ORIGINAL algebra — exercising the parser's
   * group building, OPTIONAL/FILTER folding, EXISTS rewrite, GRAPH
   * compilation, subqueries (projection/DISTINCT/GROUP BY) and VALUES on
   * structures the fixed W3C cases never enumerate. */
  test("differential: text round-trip — Parser+Compiler ≡ naive evaluator on random plans") {
    import graft.model.Quad
    val failures = Seq.newBuilder[String]
    var rendered = 0
    val textIters = sys.props.get("graft.diff.n").map(_.toInt / 2 + 25).getOrElse(50)
    quadMode = true; textMode = true
    try (0 until textIters).foreach { i =>
      val rnd = new Random(0x7E87 + i)
      val x = new DExprs
      val defG = genGraph(rnd)
      val named = (0 until 15 + rnd.nextInt(10)).map { _ =>
        Quad(iri("s" + rnd.nextInt(5)), iri("p" + rnd.nextInt(3)),
          genTerm(rnd), genGraphName(rnd))
      }.distinct
      val allQuads = defG.map(t => Quad(t.s, t.p, t.o, Term.defaultGraph)) ++ named
      val qdf = spark.createDataset(allQuads)(
        org.apache.spark.sql.Encoders.product[Quad]).toDF()
      val (op, _) = genOp(rnd, x, depth = 2 + i % 2)
      render(op, x).foreach { body =>
        rendered += 1
        val q = s"SELECT * WHERE { $body }"
        val expected = bag(RefEval.eval(op, GData(defG, named), x))
        try {
          val parsed = graft.sparql.Parser.parse(q)
          val actual = bag(collectSols(Compiler.compile(parsed, qdf)))
          if (actual != expected) {
            val missing = expected.toSeq.filterNot(kv => actual.get(kv._1).contains(kv._2))
            val extra = actual.toSeq.filterNot(kv => expected.get(kv._1).contains(kv._2))
            failures += s"[$i] MISMATCH $q\n  expected-but-not-actual: " +
              s"${missing.take(4)}\n  actual-but-not-expected: ${extra.take(4)}"
          }
        } catch {
          case e: Exception =>
            failures += s"[$i] PARSE/COMPILE FAILED: ${e.getMessage}\n  $q"
        }
      }
    } finally { quadMode = false; textMode = false }
    val fs = failures.result()
    assert(rendered * 10 >= textIters * 6, s"only $rendered/$textIters plans rendered to text")
    assert(fs.isEmpty, s"${fs.size}/$rendered text-differential failures:\n" +
      fs.take(6).mkString("\n"))
  }

  /** LATERAL differential: per-left-row Slice over a fully-keyed Order
   * (the window machinery: every rbody var is an ASC sort key, so rows
   * tying on all keys within one left row are identical and the cut is
   * deterministic), per-left-row Distinct, and the plain correlated join.
   * RefEval's Lateral case mirrors the compiler's compatible-join
   * semantics (the documented set-at-a-time twin of substitution). */
  test("differential: LATERAL with per-left-row LIMIT/DISTINCT on 30 random plans") {
    val failures = Seq.newBuilder[String]
    (0 until 30).foreach { i =>
      val rnd = new Random(0x1A7E + i)
      val x = new DExprs
      val g = genGraph(rnd)
      val (l, lv) = genOp(rnd, x, depth = 1)
      val (rb, rvs) = genOp(rnd, x, depth = 1)
      // the oracle mirrors per-left-row Slice/Group only at the RHS TOP;
      // nested inside rb they would not commute with the compatibility
      // filter (global-then-filter ≠ per-row) — skip those rbs. Distinct
      // commutes (filter-then-distinct ≡ distinct-then-filter).
      def hasGroupOrSlice(o: Op): Boolean = o match {
        case Group(_, _, _) | Slice(_, _, _) => true
        case p: Product => p.productIterator.exists {
          case oo: Op => hasGroupOrSlice(oo)
          case s: Seq[_] => s.exists { case oo: Op => hasGroupOrSlice(oo); case _ => false }
          case Some(oo: Op) => hasGroupOrSlice(oo)
          case _ => false
        }
      }
      if (hasGroupOrSlice(rb)) ()
      else {
      val r = rnd.nextInt(4) match {
        case 0 if rvs.nonEmpty =>
          Slice(rnd.nextInt(2), 1 + rnd.nextInt(2),
            Order(rvs.sorted.map(v => SortKey(v, ascending = true)), rb))
        case 1 => Distinct(rb)
        case 2 if rvs.size >= 2 && rvs.intersect(lv).size <= 1 =>
          // per-left-row keyed aggregation at the RHS top. Correlation is
          // restricted to the KEY var: in SPARQL text a lateral subquery
          // can only correlate through PROJECTED vars (non-projected
          // inner vars are renamed fresh), so a body var that is both
          // left-bound and aggregated has no text counterpart and its
          // algebra semantics is unspecified — not generated.
          val key = rvs.intersect(lv).headOption
            .getOrElse(rvs(rnd.nextInt(rvs.size)))
          val cv = rvs(rnd.nextInt(rvs.size))
          val n = (Iterator.single("n") ++ Iterator.from(2).map("n" + _))
            .find(c => !rvs.contains(c) && !lv.contains(c)).get
          val a = x.agg(s"COUNT(?$cv)",
            RowExpr(rr => TC.intTerm(org.apache.spark.sql.functions.count(rr(cv)))),
            ms => Some(int(ms.count(_.contains(cv)))))
          Group(Seq(key), Seq(n -> a), rb)
        case _ => rb
      }
      // a BIND in the RHS onto a var the left binds is a SPARQL scope
      // error (the compiler rejects it) — regenerate-as-skip those plans
      def extendVars(o: Op): Set[String] = o match {
        case Extend(v, _, in) => extendVars(in) + v
        case Filter(_, in) => extendVars(in)
        case Order(_, in) => extendVars(in)
        case Slice(_, _, in) => extendVars(in)
        case Distinct(in) => extendVars(in)
        case Project(_, in) => extendVars(in)
        case DropVars(_, in) => extendVars(in)
        case Group(_, _, in) => extendVars(in)
        case ExistsFlag(_, _, in) => extendVars(in)
        case Join(a, b) => extendVars(a) ++ extendVars(b)
        case Union(a, b) => extendVars(a) ++ extendVars(b)
        case LeftJoin(a, b, _) => extendVars(a) ++ extendVars(b)
        case Minus(a, _) => extendVars(a)
        case SemiJoin(a, _) => extendVars(a)
        case AntiJoin(a, _) => extendVars(a)
        case _ => Set.empty
      }
      if (extendVars(r).intersect(lv.toSet).nonEmpty) ()
      else {
      val op = Lateral(l, r)
      val gdf = spark.createDataset(g)(
        org.apache.spark.sql.Encoders.product[Triple]).toDF()
      val expected = bag(RefEval.eval(op, GData(g, Nil), x))
      try {
        val actual = bag(collectSols(Compiler.compile(op, gdf)))
        if (actual != expected) {
          val missing = expected.toSeq.filterNot(kv => actual.get(kv._1).contains(kv._2))
          val extra = actual.toSeq.filterNot(kv => expected.get(kv._1).contains(kv._2))
          failures += s"[$i] MISMATCH Lateral(${showOp(l, x)}, ${showOp(r, x)})\n" +
            s"  expected-but-not-actual: ${missing.take(4)}\n" +
            s"  actual-but-not-expected: ${extra.take(4)}"
        }
      } catch {
        case e: Exception =>
          failures += s"[$i] COMPILE FAILED: ${e.getMessage}\n  " +
            s"Lateral(${showOp(l, x)}, ${showOp(r, x)})"
      }
      }
      }
    }
    val fs = failures.result()
    assert(fs.isEmpty, s"${fs.size} lateral-differential failures:\n" +
      fs.take(6).mkString("\n"))
  }

  /** SPARQL Update differential: random `DELETE {…} INSERT {…} WHERE {…}`
   * requests (templates over the body's vars incl. maybe-bound ones,
   * constants, var predicates) against `Update.run`, compared with the
   * spec evaluation: WHERE once over the ORIGINAL graph, instantiate
   * templates per solution (unbound-var and ill-formed instantiations
   * dropped — literal subjects, non-IRI predicates), apply deletes then
   * inserts, set semantics (UpdateEngineWorker.java:342,370). */
  test("differential: SPARQL Update on 25 random requests") {
    val failures = Seq.newBuilder[String]
    var executed = 0
    textMode = true
    try (0 until 25).foreach { i =>
      val rnd = new Random(0x0bd8 + i)
      val x = new DExprs
      val g = genGraph(rnd)
      val (body, vs) = genOp(rnd, x, depth = 1 + i % 2)
      render(body, x).foreach { bodyText =>
        def tpl(): TriplePattern = {
          def s = if (vs.nonEmpty && rnd.nextBoolean()) TVar(vs(rnd.nextInt(vs.size)))
                  else TConst(iri("s" + rnd.nextInt(5)))
          def p = if (vs.nonEmpty && rnd.nextInt(4) == 0) TVar(vs(rnd.nextInt(vs.size)))
                  else TConst(iri("p" + rnd.nextInt(3)))
          def o = if (vs.nonEmpty && rnd.nextBoolean()) TVar(vs(rnd.nextInt(vs.size)))
                  else TConst(genTerm(rnd))
          TriplePattern(s, p, o)
        }
        val delT = Seq.fill(rnd.nextInt(2) + (if (rnd.nextBoolean()) 1 else 0))(tpl())
        val insT = Seq.fill(if (delT.isEmpty) 1 + rnd.nextInt(2) else rnd.nextInt(2))(tpl())
        def tplText(ts: Seq[TriplePattern]) =
          ts.map(t => s"${rPat(t.s)} ${rPat(t.p)} ${rPat(t.o)} .").mkString(" ")
        val q = (if (delT.nonEmpty) s"DELETE { ${tplText(delT)} } " else "") +
          (if (insT.nonEmpty) s"INSERT { ${tplText(insT)} } " else "") +
          s"WHERE { $bodyText }"
        // local spec evaluation
        val sols = RefEval.eval(body, GData(g, Nil), x)
        def ground(p: TermPat, m: Sol): Option[Term] = p match {
          case TConst(t) => Some(t)
          case TVar(v) => m.get(v)
          case TAny => None
        }
        def inst(ts: Seq[TriplePattern]): Set[Triple] =
          sols.flatMap(m => ts.flatMap { t =>
            for {
              s <- ground(t.s, m); p <- ground(t.p, m); o <- ground(t.o, m)
              if s.kind != Term.KIND_LIT && p.kind == Term.KIND_IRI
            } yield Triple(s, p, o)
          }).toSet
        val expected = (g.toSet -- inst(delT)) ++ inst(insT)
        try {
          val gdf = spark.createDataset(g)(
            org.apache.spark.sql.Encoders.product[Triple]).toDF()
          val out = graft.sparql.Update.run(gdf, q)
          val actual = out.collect().map { r =>
            def t(idx: Int) = {
              val c = r.getAs[Row](idx)
              Term(c.getByte(0), c.getString(1), c.getString(2), c.getString(3))
            }
            Triple(t(out.columns.indexOf("s")), t(out.columns.indexOf("p")),
              t(out.columns.indexOf("o")))
          }.toSet
          executed += 1
          if (actual != expected)
            failures += s"[$i] MISMATCH $q\n  missing: ${(expected -- actual).take(3)}" +
              s"\n  extra: ${(actual -- expected).take(3)}"
        } catch {
          case e: Exception =>
            failures += s"[$i] UPDATE FAILED: ${e.getMessage}\n  $q"
        }
      }
    } finally textMode = false
    val fs = failures.result()
    assert(executed >= 15, s"only $executed/25 requests executed")
    assert(fs.isEmpty, s"${fs.size}/$executed update-differential failures:\n" +
      fs.take(6).mkString("\n"))
  }

  /** ORDER BY differential: the compiled output must (a) be bag-equal to
   * the unordered oracle and (b) arrive SORTED per the local mirror of
   * the SPARQL total order (rows tying on every sort key may come in any
   * relative order — sortedness, not sequence equality, is the spec). */
  test("differential: ORDER BY respects the SPARQL total order on 30 random plans") {
    val failures = Seq.newBuilder[String]
    (0 until 30).foreach { i =>
      val rnd = new Random(0x04DE4 + i)
      val x = new DExprs
      val g = genGraph(rnd)
      val (op, vs0) = genOp(rnd, x, depth = 2)
      val vs = vs0.distinct
      if (vs.nonEmpty) {
        val keys = rnd.shuffle(vs).take(1 + rnd.nextInt(math.min(2, vs.size)))
          .map(v => SortKey(v, ascending = rnd.nextBoolean()))
        val gdf = spark.createDataset(g)(
          org.apache.spark.sql.Encoders.product[Triple]).toDF()
        val ordered = Order(keys, op)
        val expected = bag(RefEval.eval(op, GData(g, Nil), x))
        try {
          val rows = collectSols(Compiler.compile(ordered, gdf))
          if (bag(rows) != expected)
            failures += s"[$i] ORDER changed the bag: ${showOp(op, x)}"
          // adjacent-pair sortedness under the chained (asc/desc) comparator
          def cmp(a: Sol, b: Sol): Int =
            keys.iterator.map { k =>
              val c = keyOrd.compare(localKey(a.get(k.v)), localKey(b.get(k.v)))
              if (k.ascending) c else -c
            }.find(_ != 0).getOrElse(0)
          rows.sliding(2).zipWithIndex.foreach {
            case (Seq(a, b), j) =>
              if (cmp(a, b) > 0)
                failures += s"[$i] row $j out of order under " +
                  s"${keys.map(k => (if (k.ascending) "" else "-") + k.v).mkString(",")}: " +
                  showOp(op, x)
            case _ => ()
          }
        } catch {
          case e: Exception =>
            failures += s"[$i] COMPILE FAILED: ${e.getMessage}\n  ${showOp(op, x)}"
        }
      }
    }
    val fs = failures.result()
    assert(fs.isEmpty, s"${fs.size} order-differential failures:\n" +
      fs.take(6).mkString("\n"))
  }
}
