package graft.reason

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}

import graft.model.{Term, Triple}
import Rules.{Atom, Guard, LpRule, LpRuleSet, RConst, RTerm, RVar}

/**
 * Goal-directed (backward-chaining) rule engine + FB hybrid — the
 * Spark-era answer to the reference's LP machinery
 * (jena-core/.../reasoner/rulesys/impl/LPBRuleEngine.java tabled SLG
 * interpreter and FBRuleReasoner.java forward/backward hybrid).
 *
 * The reference interprets rules tuple-at-a-time with explicit
 * generator/consumer coroutines and goal tables. Here the same
 * semantics (memoized goal tables, termination on recursive Datalog)
 * come from a much simpler monotone scheme: every goal gets a table;
 * within one evaluation pass each goal is expanded at most once
 * (cycles return the table's current contents); passes repeat until no
 * table grows. Answer sets are finite (function-free rules over a
 * finite term universe) and growth is monotone, so the fixpoint is
 * exact — the reference's suspend/resume plumbing exists to stream
 * first answers early, which a set-at-a-time engine does not need.
 *
 * Faces:
 *  - [[Engine]]: pure per-graph goal solver (document-sized KGs, usable
 *    inside mapPartitions).
 *  - [[hybrid]]: FBRuleReasoner analog — forward rules run to fixpoint
 *    over the asserted facts; forward matches whose heads are NESTED
 *    backward rules emit instantiated backward rules (the
 *    etc/rdfs-fb-lp-expt.rules `[rdfs6: … -> [(?a ?q ?b) <- (?a ?p ?b)]]`
 *    form); queries are then answered goal-directed.
 *  - [[answerPerDoc]]: distributed face — one small KG per row, rules
 *    broadcast, each row answered inside mapPartitions (the
 *    ShexOps.validateGraphs discipline). Goal-directed means each
 *    document pays only for its goal's dependency cone, never the full
 *    closure — the property that matters when the goal is selective
 *    over billions of documents.
 */
object Lp {

  /** A goal: a triple pattern keyed by its constant slots. */
  type Goal = (Option[Term], Option[Term], Option[Term])

  // ---- shared term/atom helpers ----------------------------------------

  private def resolve(t: RTerm, b: Map[String, Term]): Option[Term] = t match {
    case RConst(c) => Some(c)
    case RVar(n) => b.get(n)
  }

  private def unify(pat: RTerm, v: Term,
      b: Map[String, Term]): Option[Map[String, Term]] = pat match {
    case RConst(c) => if (c == v) Some(b) else None
    case RVar(n) => b.get(n) match {
      case Some(x) => if (x == v) Some(b) else None
      case None => Some(b + (n -> v))
    }
  }

  private def matchAtom(a: Atom, t: Triple,
      b: Map[String, Term]): Option[Map[String, Term]] =
    unify(a.s, t.s, b).flatMap(unify(a.p, t.p, _)).flatMap(unify(a.o, t.o, _))

  /** Pure guard builtins. bound/unbound read the CURRENT binding state —
   * position in the body matters, which is why LpRule keeps body items
   * in source order. Value guards with an unbound argument fail (the
   * reference's builtins likewise reject unbound args). */
  private def guardOk(g: Guard, b: Map[String, Term]): Boolean = {
    def r(t: RTerm): Option[Term] = resolve(t, b)
    g.fn match {
      case "bound" => g.args.forall(r(_).isDefined)
      case "unbound" => g.args.forall(r(_).isEmpty)
      case "notEqual" =>
        (for { x <- r(g.args(0)); y <- r(g.args(1)) } yield x != y)
          .getOrElse(false)
      case "equal" =>
        (for { x <- r(g.args(0)); y <- r(g.args(1)) } yield x == y)
          .getOrElse(false)
      case "notLiteral" => r(g.args(0)).exists(!_.isLiteral)
      case "isLiteral" => r(g.args(0)).exists(_.isLiteral)
      case other => throw new IllegalArgumentException(s"builtin $other")
    }
  }

  private def instTerm(t: RTerm, b: Map[String, Term]): RTerm = t match {
    case RVar(n) => b.get(n).map(RConst.apply).getOrElse(t)
    case c => c
  }

  private def instAtom(a: Atom, b: Map[String, Term]): Atom =
    Atom(instTerm(a.s, b), instTerm(a.p, b), instTerm(a.o, b))

  /** Close a nested rule over the enclosing forward match's bindings:
   * outer-bound vars become constants, inner vars stay free. */
  private def instantiateRule(r: LpRule, b: Map[String, Term]): LpRule = {
    require(r.headRules.isEmpty,
      s"rule '${r.name}': doubly-nested rule heads are not supported")
    r.copy(
      body = r.body.map {
        case Left(a) => Left(instAtom(a, b))
        case Right(g) => Right(g.copy(args = g.args.map(instTerm(_, b))))
      },
      headTriples = r.headTriples.map(instAtom(_, b)))
  }

  // ---- backward (goal-directed) engine ---------------------------------

  /** Tabled backward solver over an immutable fact set. All rules must
   * be backward (single head). Deterministic; safe inside
   * mapPartitions. */
  final class Engine(facts: Iterable[Triple], rules: Seq[LpRule],
      maxPasses: Int = 100000) {
    rules.find(!_.backward).foreach(r => throw new IllegalArgumentException(
      s"rule '${r.name}': Engine takes backward rules only — run forward " +
        "rules through Lp.hybrid"))

    private val allFacts: Vector[Triple] = facts.toVector.distinct
    private val factsByP: Map[Term, Vector[Triple]] = allFacts.groupBy(_.p)

    private val tables = mutable.Map[Goal, mutable.LinkedHashSet[Triple]]()
    private val complete = mutable.Set[Goal]()
    private val passDone = mutable.Set[Goal]()
    private var grew = false
    // an aborted fixpoint leaves partially-grown tables that a LATER
    // successful find would wrongly mark complete — poison the engine
    private var poisoned = false

    /** All derivable triples matching the pattern (None = wildcard),
     * asserted facts included — the InfGraph.find analog. */
    def find(s: Option[Term], p: Option[Term], o: Option[Term]): Set[Triple] = {
      val goal = (s, p, o)
      if (poisoned) throw new IllegalStateException(
        "LP engine poisoned by an aborted fixpoint — rebuild the Engine")
      if (!complete(goal)) {
        var passes = 0
        do {
          grew = false
          passDone.clear()
          passes += 1
          if (passes > maxPasses) {
            poisoned = true
            throw new IllegalStateException(
              s"LP evaluation did not reach a fixpoint within $maxPasses passes")
          }
          solve(goal, Set.empty)
        } while (grew)
        // joint fixpoint over the goal's dependency cone reached: every
        // table touched so far is final (answer sets are monotone and
        // program-determined, so later goals cannot extend them)
        tables.keysIterator.foreach(complete += _)
      }
      tables(goal).toSet
    }

    def contains(t: Triple): Boolean =
      find(Some(t.s), Some(t.p), Some(t.o)).nonEmpty

    private def dataMatches(g: Goal): Iterator[Triple] = {
      val base = g._2 match {
        case Some(p) => factsByP.getOrElse(p, Vector.empty).iterator
        case None => allFacts.iterator
      }
      base.filter(t => g._1.forall(_ == t.s) && g._3.forall(_ == t.o))
    }

    private def solve(goal: Goal,
        active: Set[Goal]): mutable.LinkedHashSet[Triple] = {
      val tbl = tables.getOrElseUpdate(goal, {
        val t = mutable.LinkedHashSet[Triple]()
        dataMatches(goal).foreach(t += _)
        t
      })
      // cycles (active) and repeat visits within a pass (passDone)
      // return the table as-is; the outer pass loop re-runs to fixpoint
      if (complete(goal) || passDone(goal) || active(goal)) return tbl
      passDone += goal
      val act = active + goal
      rules.foreach { r =>
        val head = r.headTriples.head
        unifyHead(head, goal).foreach { b0 =>
          evalBody(r.body, b0, act).foreach { b =>
            // head vars are bound by body ∪ goal; a derivation with a
            // still-unbound head var would be a generalized triple in
            // the reference — dropped here (ground answers only), as is
            // a literal subject/predicate (not a legal RDF triple)
            for {
              ts <- resolve(head.s, b); tp <- resolve(head.p, b)
              to <- resolve(head.o, b)
            } {
              val t = Triple(ts, tp, to)
              if (!t.s.isLiteral && !t.p.isLiteral && tbl.add(t)) grew = true
            }
          }
        }
      }
      tbl
    }

    private def unifyHead(h: Atom, g: Goal): Option[Map[String, Term]] = {
      def step(t: RTerm, c: Option[Term],
          b: Map[String, Term]): Option[Map[String, Term]] = c match {
        case None => Some(b)
        case Some(v) => unify(t, v, b)
      }
      step(h.s, g._1, Map.empty).flatMap(step(h.p, g._2, _))
        .flatMap(step(h.o, g._3, _))
    }

    private def evalBody(items: Seq[Either[Atom, Guard]],
        b0: Map[String, Term], act: Set[Goal]): Seq[Map[String, Term]] =
      items.foldLeft(Vector(b0)) { (bs, item) =>
        item match {
          case Left(a) => bs.flatMap { b =>
            val sub = (resolve(a.s, b), resolve(a.p, b), resolve(a.o, b))
            // snapshot: the live table may grow while we recurse
            val answers = solve(sub, act).toVector
            answers.flatMap(matchAtom(a, _, b))
          }
          case Right(g) => bs.filter(guardOk(g, _))
        }
      }
  }

  // ---- FB hybrid --------------------------------------------------------

  /** FBRuleReasoner analog: forward rules run to fixpoint over
   * data ∪ axioms (backward conclusions do NOT feed forward matching,
   * same as the reference); nested rule heads emit instantiated
   * backward rules; the returned Engine answers goals over the
   * forward-extended fact set with all backward rules. */
  def hybrid(data: Iterable[Triple], rs: LpRuleSet,
      maxIter: Int = 10000): Engine = {
    val fwd = rs.rules.filterNot(_.backward)
    val bwd = mutable.LinkedHashSet[LpRule]() ++= rs.rules.filter(_.backward)

    val all = mutable.LinkedHashSet[Triple]() ++= data ++= rs.axioms
    // naive iteration (document-scale graphs): one full sweep per round
    // against a per-round snapshot, until neither facts nor generated
    // rules grow. The one-huge-KG face is Rules.closure (semi-naive
    // DataFrame deltas) — this loop exists for the goal-directed side.
    var changed = true
    var iter = 0
    while (changed) {
      iter += 1
      if (iter > maxIter) throw new IllegalStateException(
        s"hybrid forward phase did not reach a fixpoint within $maxIter rounds")
      changed = false
      val snapshot = all.toVector
      val byP = snapshot.groupBy(_.p)
      val derived = mutable.Buffer[Triple]()
      fwd.foreach { r =>
        evalBodyForward(r.body, byP, snapshot).foreach { b =>
          r.headTriples.foreach { h =>
            def bind(t: RTerm): Term = resolve(t, b).getOrElse(
              throw new IllegalStateException(
                s"rule '${r.name}': unbound head var survived validation"))
            val t = Triple(bind(h.s), bind(h.p), bind(h.o))
            if (!t.s.isLiteral && !t.p.isLiteral && !all.contains(t))
              derived += t
          }
          r.headRules.foreach { nr =>
            if (!nr.backward) throw new IllegalArgumentException(
              s"rule '${r.name}': nested FORWARD rule heads are not supported")
            if (bwd.add(instantiateRule(nr, b))) changed = true
          }
        }
      }
      derived.foreach(t => if (all.add(t)) changed = true)
    }
    new Engine(all, bwd.toSeq)
  }

  /** Forward body evaluation against a fact snapshot (no recursion). */
  private def evalBodyForward(items: Seq[Either[Atom, Guard]],
      byP: Map[Term, Vector[Triple]],
      snapshot: Vector[Triple]): Seq[Map[String, Term]] =
    items.foldLeft(Vector(Map.empty[String, Term])) { (bs, item) =>
      item match {
        case Left(a) => bs.flatMap { b =>
          val cands = resolve(a.p, b) match {
            case Some(p) => byP.getOrElse(p, Vector.empty)
            case None => snapshot
          }
          cands.flatMap(matchAtom(a, _, b))
        }
        case Right(g) => bs.filter(guardOk(g, _))
      }
    }

  // ---- distributed face --------------------------------------------------

  /** Goal-directed inference per document-KG row: `(id, triples)` in,
   * `(id, conclusions-matching-goal)` out. The rule set is parsed once
   * on the driver and broadcast; each row builds its hybrid engine and
   * answers ONLY the goal — per-row cost is the goal's dependency cone,
   * not the closure. */
  def answerPerDoc(rows: Dataset[(Long, Seq[Triple])], rulesText: String,
      goal: Goal): Dataset[(Long, Seq[Triple])] = {
    val spark = rows.sparkSession
    import spark.implicits._
    val rs = Rules.parseFull(rulesText)
    val bc = spark.sparkContext.broadcast(rs)
    rows.mapPartitions { it =>
      val rules = bc.value
      it.map { case (id, triples) =>
        (id, hybrid(triples, rules).find(goal._1, goal._2, goal._3)
          .toSeq.sortBy(_.toNTriples))
      }
    }
  }
}
