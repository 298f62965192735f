package graft.model

/**
 * Blank-node-isomorphism graph comparison — the test-comparator analog of
 * the reference's IsoMatcher (jena-arq/.../sparql/util/IsoMatcher.java:50–74;
 * SURVEY.md §5: "result comparison is bnode-isomorphism-aware"). Two
 * graphs are equal iff some bijection over blank nodes maps one triple set
 * onto the other; ground terms must match exactly.
 *
 * Algorithm: iterative signature refinement (color refinement) — each
 * bnode's signature is the multiset of its ground/positional context,
 * re-hashed with neighbor signatures until stable — followed by a
 * backtracking match within equal-signature classes. Driver-side by
 * design: golden-test graphs are small; distributed outputs are collected
 * for comparison exactly like the reference's test harness does.
 */
object Iso {

  def isomorphic(g1: Iterable[Triple], g2: Iterable[Triple]): Boolean = {
    val (a, b) = (g1.toVector, g2.toVector)
    if (a.size != b.size) return false
    val groundA = a.filter(t => !t.s.isBNode && !t.o.isBNode).toSet
    val groundB = b.filter(t => !t.s.isBNode && !t.o.isBNode).toSet
    if (groundA != groundB) return false
    val restA = a.filterNot(t => groundA.contains(t))
    val restB = b.filterNot(t => groundB.contains(t))

    val bnA = bnodes(restA)
    val bnB = bnodes(restB)
    if (bnA.size != bnB.size) return false

    val sigA = refine(restA, bnA)
    val sigB = refine(restB, bnB)
    if (sigA.values.toVector.sorted != sigB.values.toVector.sorted) return false

    // backtracking match within signature classes
    matchAll(restA, restB, bnA.toList.sortBy(sigA), sigA, sigB, Map.empty)
  }

  /**
   * Entailment-style subgraph check (the reference test-harness's
   * WGReasonerTester.testConclusions → Matcher.subgraphInferred): every
   * triple of `sub` must appear in `g` under SOME mapping of `sub`'s
   * blank nodes to arbitrary `g` terms (existential semantics — two
   * `sub` bnodes MAY map to the same term; no injectivity). Ground
   * terms must match exactly.
   */
  def subgraphInferred(sub: Iterable[Triple], g: Iterable[Triple]): Boolean = {
    val gs = g.toSet
    def bind(pat: Term, actual: Term, m: Map[String, Term]): Option[Map[String, Term]] =
      if (pat.isBNode) m.get(pat.lex) match {
        case Some(x) => if (x == actual) Some(m) else None
        case None => Some(m + (pat.lex -> actual))
      }
      else if (pat == actual) Some(m) else None
    def solve(ts: List[Triple], m: Map[String, Term]): Boolean = ts match {
      case Nil => true
      case t :: rest =>
        gs.exists { cand =>
          bind(t.s, cand.s, m)
            .flatMap(bind(t.p, cand.p, _))
            .flatMap(bind(t.o, cand.o, _))
            .exists(solve(rest, _))
        }
    }
    // bind most-ground triples first to prune the search
    val ordered = sub.toList.sortBy(t => Seq(t.s, t.p, t.o).count(_.isBNode))
    solve(ordered, Map.empty)
  }

  private def bnodes(ts: Seq[Triple]): Set[String] =
    ts.flatMap(t => Seq(t.s, t.o).filter(_.isBNode).map(_.lex)).toSet

  /** Stable signatures by color refinement (log rounds suffice). */
  private def refine(ts: Seq[Triple], bn: Set[String]): Map[String, String] = {
    var sig = bn.map(_ -> "b").toMap
    var changed = true
    var rounds = 0
    while (changed && rounds < bn.size + 2) {
      val next = bn.map { label =>
        val ctx = ts.flatMap { t =>
          val sPart =
            if (t.s.isBNode && t.s.lex == label)
              Some("S|" + render(t.p, sig) + "|" + render(t.o, sig))
            else None
          val oPart =
            if (t.o.isBNode && t.o.lex == label)
              Some("O|" + render(t.s, sig) + "|" + render(t.p, sig))
            else None
          sPart ++ oPart
        }.sorted.mkString(";")
        label -> Integer.toHexString(ctx.hashCode)
      }.toMap
      changed = next != sig
      sig = next
      rounds += 1
    }
    sig
  }

  private def render(t: Term, sig: Map[String, String]): String =
    if (t.isBNode) "_:" + sig.getOrElse(t.lex, "?") else t.toNTriples

  private def matchAll(ta: Seq[Triple], tb: Seq[Triple], remaining: List[String],
                       sigA: Map[String, String], sigB: Map[String, String],
                       mapping: Map[String, String]): Boolean = remaining match {
    case Nil => applyMapping(ta, mapping) == tb.toSet
    case x :: rest =>
      val candidates = sigB.collect {
        case (label, s) if s == sigA(x) && !mapping.values.exists(_ == label) => label
      }
      candidates.exists(c => matchAll(ta, tb, rest, sigA, sigB, mapping + (x -> c)))
  }

  private def applyMapping(ts: Seq[Triple], m: Map[String, String]): Set[Triple] =
    ts.map { t =>
      def mt(x: Term) = if (x.isBNode) Term.bnode(m.getOrElse(x.lex, x.lex)) else x
      Triple(mt(t.s), t.p, mt(t.o))
    }.toSet
}
