package graft

import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Iso, Term, Triple}
import graft.reason.{Lp, Rules}
import graft.riot.{NTriples, RdfXmlLite}

/** Backward (LP) engine + FB hybrid, gated on the reference's own
 * fixtures: hand-lifted cases from TestBackchainer.java (each cites its
 * source method) and the full TestLPRDFS run — the reference's
 * FBRuleReasoner over etc/rdfs-fb-lp-expt.rules against
 * testing/reasoners/rdfs/manifest-nodirect-noresource.rdf, answered
 * GOAL-DIRECTED per query pattern (not via a materialized closure). */
class LpSpec extends AnyFunSuite {

  private val ROOT = "/root/reference/jena-core/testing/reasoners"
  private val LP_RULES =
    "/root/reference/jena-core/src/main/resources/etc/rdfs-fb-lp-expt.rules"
  private val QT = "http://www.hpl.hp.com/semweb/2003/query_tester#"
  private val VAR = "var:"

  private def read(path: String): String =
    new String(Files.readAllBytes(Paths.get(path)), "UTF-8")

  private def loadRdf(rel: String): Seq[Triple] =
    RdfXmlLite.parse(read(s"$ROOT/$rel"), s"file://$ROOT/$rel")

  // bare-IRI constants, as the reference tests write them
  // (TestBackchainer.java:62–74)
  private def n(x: String) = Term.iri(x)
  private val Seq(a, b, c, d, p, q, r, s, t) =
    Seq("a", "b", "c", "d", "p", "q", "r", "s", "t").map(n)
  private val sP = Term.iri("http://www.w3.org/2000/01/rdf-schema#subPropertyOf")

  private def engine(rules: String, data: (Term, Term, Term)*): Lp.Engine = {
    val rs = Rules.parseFull(rules)
    Lp.hybrid(data.map { case (x, y, z) => Triple(x, y, z) }, rs)
  }
  private def triples(ts: (Term, Term, Term)*): Set[Triple] =
    ts.map { case (x, y, z) => Triple(x, y, z) }.toSet

  test("parser: bare backward rules and bracketed axioms (testRules1/testRuleAxioms)") {
    // TestBackchainer.java:78–84
    val rs = Rules.parseFull(
      "(?x ?q ?y) <- (?p rdfs:subPropertyOf ?q)(?x ?p ?y). " +
        "(?a rdfs:subPropertyOf ?c) <- (?a rdfs:subPropertyOf ?b)(?b rdfs:subPropertyOf ?c). ")
    assert(rs.rules.size == 2 && rs.rules.forall(_.backward))
    assert(rs.rules.head.bodyAtoms.size == 2)
    val ax = Rules.parseFull(
      "[ -> (p rdfs:subPropertyOf q)][ -> (q rdfs:subPropertyOf r) ][ -> (a p b) ]")
    assert(ax.axioms.size == 3 && ax.rules.isEmpty)
  }

  test("empty rule set + axioms lists the raw data (testListData)") {
    // TestBackchainer.java:247–289
    val e = engine("-> (d p d).", (p, sP, q), (q, sP, r), (a, p, b))
    assert(e.find(None, None, None) ==
      triples((p, sP, q), (q, sP, r), (a, p, b), (d, p, d)))
  }

  test("simple AND rule (testBaseRules1)") {
    // TestBackchainer.java:295–310
    val e = engine("[r1: (?a r ?c) <- (?a p ?b),(?b p ?c)]",
      (a, p, b), (b, p, c), (b, p, d))
    assert(e.find(None, Some(r), None) == triples((a, r, c), (a, r, d)))
  }

  test("OR rules with chaining (testBaseRules2/2b)") {
    // TestBackchainer.java:315–356
    val e = engine(
      "[r1: (?a r ?b) <- (?a p ?b)]" +
        "[r2: (?a r ?b) <- (?a q ?b)]" +
        "[r3: (?a r ?b) <- (?a t ?c), (?c t ?b)]" +
        "[r4: (?a t ?b) <- (?a s ?b)]",
      (a, p, b), (b, q, c), (a, s, b), (b, s, d))
    assert(e.find(None, Some(r), None) ==
      triples((a, r, b), (b, r, c), (a, r, d)))
  }

  test("transitive tabling (testBaseRules3/3b)") {
    // TestBackchainer.java:361–410
    val rule =
      "[rule: (?a rdfs:subPropertyOf ?c) <- (?a rdfs:subPropertyOf ?b),(?b rdfs:subPropertyOf ?c)]"
    val e1 = engine(rule, (p, sP, q), (q, sP, r), (p, sP, s), (s, sP, t), (a, p, b))
    assert(e1.find(None, Some(sP), None) == triples(
      (p, sP, q), (q, sP, r), (p, sP, s), (s, sP, t), (p, sP, t), (p, sP, r)))
    val e2 = engine(rule, (p, sP, q), (q, sP, r), (r, sP, t), (q, sP, s))
    assert(e2.find(None, Some(sP), None) == triples(
      (p, sP, q), (q, sP, r), (r, sP, t), (q, sP, s),
      (p, sP, s), (p, sP, r), (p, sP, t), (q, sP, t)))
  }

  test("left recursion through the goal's own table (testBaseRules4)") {
    // TestBackchainer.java:415–436
    val e = engine(
      "[r1: (?x p ?y) <- (?x r ?y)]" +
        "[r2: (?x p ?z) <- (?x p ?y), (?y r ?z)]",
      (a, r, b), (b, r, c), (b, r, b), (b, r, d))
    assert(e.find(Some(a), Some(p), None) ==
      triples((a, p, b), (a, p, d), (a, p, c)))
  }

  test("mutually recursive predicates (testBaseRulesXSB1)") {
    // TestBackchainer.java:441–462
    val e = engine(
      "[r1: (?x a ?y) <- (?x c ?y)]" +
        "[r2: (?x a ?y) <- (?x b ?z), (?z c ?y)]" +
        "[r3: (?x b ?y) <- (?x d ?y)]" +
        "[r4: (?x b ?y) <- (?x a ?z), (?z d ?y)]",
      (p, c, q), (q, c, r), (p, d, q), (q, d, r))
    assert(e.find(Some(p), Some(a), None) == triples((p, a, q), (p, a, r)))
  }

  test("bound/unbound guards are goal-sensitive (testBuiltin2/3)") {
    // TestBackchainer.java:525–566: the SAME rule set answers differently
    // depending on which goal slots arrive bound
    val e = engine(
      "[r1: (?x r ?y ) <- bound(?x), (?x p ?y) ]" +
        "[r2: (?x r ?y) <- unbound(?x), (?x q ?y)]",
      (a, p, b), (a, q, c))
    assert(e.find(Some(a), Some(r), None) == triples((a, r, b)))
    assert(e.find(None, Some(r), None) == triples((a, r, c)))
    val e3 = engine("[r1: (a p b ) <- unbound(?x) ]")
    assert(e3.find(Some(a), None, None) == triples((a, p, b)))
  }

  test("ground heads (testGroundHead)") {
    // TestBackchainer.java:571–586
    val e = engine("[r1: (a p b ) <- (a r b) ]", (a, r, b))
    assert(e.find(Some(a), None, None) == triples((a, p, b), (a, r, b)))
  }

  test("functor rules are rejected loudly (out of scope)") {
    // TestBackchainer.java:467–521 use f(?y,?z) functor terms — a
    // tuple-at-a-time structure our set-oriented engine does not model
    intercept[IllegalArgumentException](Rules.parseFull(
      "[r1: (?x r f(?y,?z)) <- (?x p ?y), (?x q ?z)]"))
  }

  test("hybrid: nested rule heads instantiate backward rules (rdfs6 form)") {
    // etc/rdfs-fb-lp-expt.rules:54 — forward match over the schema emits
    // a per-property backward rule; queries then chain through it
    val e = engine(
      "[rdfs6: (?p rdfs:subPropertyOf ?q), notEqual(?p,?q) -> [ (?a ?q ?b) <- (?a ?p ?b)] ]",
      (p, sP, q), (a, p, b))
    assert(e.find(None, Some(q), None) == triples((a, q, b)))
    // and the generated rule does NOT fire for the un-derived direction
    assert(e.find(None, Some(p), None) == triples((a, p, b)))
  }

  test("the reference's etc/rdfs-fb-lp-expt.rules parses (axioms, table, nested heads)") {
    val rs = Rules.parseFull(read(LP_RULES))
    assert(rs.axioms.size > 30, s"axioms: ${rs.axioms.size}")
    assert(rs.tabled.nonEmpty) // -> table(rdf:type).
    val nested = rs.rules.filter(_.headRules.nonEmpty)
    assert(nested.size == 3, s"nested-head rules: ${nested.map(_.name)}") // rdfs2/3/6
    assert(rs.rules.exists(r => r.backward && r.name == "rdfs9-alt"))
  }

  /** The TestLPRDFS suite: FBRuleReasoner(etc/rdfs-fb-lp-expt.rules) on
   * the reference's rdfs/manifest-nodirect-noresource.rdf, each query
   * pattern answered goal-directed (var: wildcards → open goal slots). */
  test("reference LP-RDFS manifest, goal-directed (TestLPRDFS)") {
    val rs = Rules.parseFull(read(LP_RULES))
    val manifest = loadRdf("rdfs/manifest-nodirect-noresource.rdf")
    val bySubj = manifest.groupBy(_.s)
    def prop(su: Term, pr: String): Seq[String] =
      bySubj.getOrElse(su, Nil).filter(_.p.lex == QT + pr).map(_.o.lex)
    val tests = manifest.collect {
      case Triple(su, pr, ob)
        if pr.lex.endsWith("#type") && ob.lex == QT + "Test" => su
    }.distinct
    assert(tests.size >= 15, s"found only ${tests.size} tests")

    val failures = mutable.Buffer[String]()
    tests.foreach { tc =>
      val desc = prop(tc, "description").headOption.getOrElse(tc.lex)
      try {
        val data = (prop(tc, "tbox") ++ prop(tc, "data")).flatMap(loadRdf)
        val eng = Lp.hybrid(data, rs)
        val queries = NTriples.parseDocument(read(
          s"$ROOT/${prop(tc, "query").head}"))
        def slot(pat: Term): Option[Term] =
          if (pat.isIri && pat.lex.startsWith(VAR)) None else Some(pat)
        val got = queries.flatMap(qp =>
          eng.find(slot(qp.s), slot(qp.p), slot(qp.o))).distinct
        val want = loadRdf(prop(tc, "result").head).distinct
        if (!Iso.isomorphic(got, want)) {
          val gotSet = got.map(_.toNTriples).toSet
          val wantSet = want.map(_.toNTriples).toSet
          failures += s"$desc:\n  missing: ${(wantSet -- gotSet).take(4)}" +
            s"\n  extra: ${(gotSet -- wantSet).take(4)}"
        }
      } catch {
        case e: Exception => failures += s"$desc: EXCEPTION ${e.getMessage}"
      }
    }
    assert(failures.isEmpty,
      s"${failures.size}/${tests.size} LP-RDFS cases failing:\n" +
        failures.mkString("\n"))
    info(s"${tests.size} LP-RDFS manifest cases green (goal-directed)")
  }

  // ---- TestBasicLP lifts (doTest protocol: rules + data, one goal,
  // expected answer set) — TestBasicLP.java:137–232, 547–654, 724–851.
  // The base data for doBasicTest is the single triple (a p b)
  // (TestBasicLP.java dataElts).
  private def doTest(rules: String, data: Seq[(Term, Term, Term)],
      goal: (Option[Term], Option[Term], Option[Term]),
      want: (Term, Term, Term)*): Unit = {
    val e = engine(rules, data: _*)
    assert(e.find(goal._1, goal._2, goal._3) == triples(want: _*))
  }
  private val Seq(cC1, cC2, cC3) = Seq("C1", "C2", "C3").map(n)

  test("basic LP operations (testBaseRules1–9)") {
    val base = Seq((a, p, b))
    // lookup under a non-matching rule set
    doTest("[r1: (?x r c) <- (?x p b)]", base, (None, Some(p), Some(b)), (a, p, b))
    // simple chain
    doTest("[r1: (?x r c) <- (?x p b)]", base, (None, Some(r), Some(c)), (a, r, c))
    // head unification (?x r ?x)
    doTest("[r1: (?x r ?x) <- (?x p b)]", base, (None, Some(r), Some(a)), (a, r, a))
    doTest("[r1: (?x r ?x) <- (?y p b), (?x p b)]", base,
      (None, Some(r), Some(a)), (a, r, a))
    // cascade through two derived predicates
    doTest("[r1: (?x q ?y) <- (?x r ?y)(?y s ?x)]" +
      "[r2: (?x r ?y) <- (?x p ?y)]" +
      "[r3: (?x s ?y) <- (?y p ?x)]", base, (None, Some(q), None), (a, q, b))
    // failure at head-unification time and in search: empty answers
    // (testBaseRules7's ?y is goal-bound, not body-bound)
    assert(engine("[r1: (?x r ?x) <- (?x p b)]", (a, p, b))
      .find(Some(a), Some(r), Some(b)).isEmpty)
    assert(engine("[r1: (?x r ?y) <- (?x p c)]", (a, p, b))
      .find(Some(a), Some(r), Some(b)).isEmpty)
    // chains, forward and inverted
    doTest("[r1: (?x q ?y) <- (?x r ?y)][r2: (?x r ?y) <- (?x p ?y)]",
      base, (None, Some(q), None), (a, q, b))
    doTest("[r1: (?x q ?y) <- (?x r ?y)][r2: (?x r ?y) <- (?y p ?x)]",
      base, (None, Some(q), None), (b, q, a))
  }

  test("wildcard predicates in goals, bodies and heads (testWildPredicate1–4)") {
    // TestBasicLP.java:547–654
    doTest("[r1: (b r ?y) <- (a ?y ?v)]",
      Seq((a, p, cC1), (a, q, cC2), (a, q, cC3)),
      (Some(b), Some(r), None), (b, r, p), (b, r, q))
    val rules2 = "[r1: (a r ?y) <- (b ?y ?v)]" +
      "[r2: (?x q ?y) <- (?x p ?y)]" +
      "[r3: (?x s C1) <- (?x p C1)]" +
      "[r4: (?x t C2) <- (?x p C2)]"
    doTest(rules2,
      Seq((b, p, cC1), (b, q, cC2), (b, q, cC3), (a, p, cC1), (a, p, cC2),
        (c, p, cC1)),
      (Some(a), None, None),
      (a, r, p), (a, r, q), (a, q, cC1), (a, q, cC2), (a, s, cC1),
      (a, t, cC2), (a, p, cC1), (a, p, cC2), (a, r, s))
    val rules3 = "[r1: (a r ?y) <- (b ?y ?v)]" +
      "[r2: (?x q ?y) <- (?x p ?y)]" +
      "[r3: (?x s C1) <- (?x p C1)]" +
      "[r4: (?x t ?y) <- (?x ?y C1)]"
    val data3 = Seq((b, p, cC1), (b, q, cC2), (b, q, cC3), (a, p, cC1),
      (a, p, cC2), (c, p, cC1))
    doTest(rules3, data3, (Some(a), None, Some(cC1)),
      (a, q, cC1), (a, s, cC1), (a, p, cC1))
    doTest(rules3, data3, (Some(a), Some(t), None),
      (a, t, q), (a, t, s), (a, t, p))
    doTest(rules3, data3, (None, Some(t), Some(q)),
      (a, t, q), (b, t, q), (c, t, q))
    doTest("[r1: (a ?p ?x) <- (b ?p ?x)]",
      Seq((b, p, cC1), (b, q, cC2), (b, q, cC3), (c, q, d)),
      (Some(a), None, None), (a, p, cC1), (a, q, cC2), (a, q, cC3))
  }

  test("tabled recursion (testTabled1–6)") {
    // TestBasicLP.java:724–851 — our engine tables every goal, so the
    // explicit setTabled()/table-directive variants collapse to one case
    doTest("[r1: (?a q ?b) <- (?a p ?b)][r2: (?x r ?y) <- (?x q ?y)]",
      Seq((a, p, b), (b, p, c)), (None, Some(r), None), (a, r, b), (b, r, c))
    doTest("[r1: (?a p ?c) <- (?a p ?b)(?b p ?c)]",
      Seq((a, p, b), (b, p, c), (b, p, d)), (None, Some(p), None),
      (a, p, b), (b, p, c), (a, p, c), (b, p, d), (a, p, d))
    val e = Term.iri("e")
    doTest("[r1: (?x p ?z) <- (?x p ?y), (?y p ?z)]" +
      "[r2: (?x p ?z) <- (?x e ?z), (?z q ?z)]",
      Seq((a, e, b), (a, e, d), (b, e, c), (a, q, a), (b, q, b), (c, q, c)),
      (Some(a), Some(p), None), (a, p, b), (a, p, c))
    doTest("[r1: (?a p ?c) <- (?a p ?b)(?b p ?c)][r2: (?a r ?b) <- (?a q ?b)]",
      Seq((a, p, b), (b, p, c), (a, q, d), (c, q, d)), (Some(a), None, None),
      (a, p, b), (a, p, c), (a, q, d), (a, r, d))
    // table directive inline in the rule text (testTabled6)
    doTest("[-> table(p)] [r1: (?a p ?c) <- (?a p ?b)(?b p ?c)]",
      Seq((a, p, b), (b, p, c), (b, p, d)), (None, Some(p), None),
      (a, p, b), (b, p, c), (a, p, c), (b, p, d), (a, p, d))
    // testTabled7: ?z is bound by the GOAL, not the body — aliased local
    // vars in the call plus goal-bound head vars
    doTest("[r1: (?a q ?b) <- (?a p ?b)]" +
      "[r2: (?a q ?a) <- (?a s ?a)]" +
      "[r2: (?a r ?z) <- (?a q ?a)]",
      Seq((a, p, b), (c, p, c), (a, p, a), (b, s, Term.iri("e")),
        (d, s, d)),
      (None, Some(r), Some(cC1)), (a, r, cC1), (c, r, cC1), (d, r, cC1))
  }

  test("cross-face: backward restatement equals the forward closure") {
    // rdfs8+rdfs9 stated backward must answer exactly what the forward
    // engine (Rules.closureLocal) materializes on the same graph
    val T = Term.iri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
    val sC = Term.iri("http://www.w3.org/2000/01/rdf-schema#subClassOf")
    val data = (1 to 6).map(i =>
      Triple(n(s"cls$i"), sC, n(s"cls${i + 1}"))) ++
      Seq(Triple(a, T, n("cls1")), Triple(b, T, n("cls3")))
    val fwd = Rules.parse(
      """[rdfs8: (?a rdfs:subClassOf ?b), (?b rdfs:subClassOf ?c) -> (?a rdfs:subClassOf ?c)]
         [rdfs9: (?x rdfs:subClassOf ?y), (?a rdf:type ?x) -> (?a rdf:type ?y)]""")
    val bwd = Rules.parseFull(
      """[rdfs8b: (?a rdfs:subClassOf ?c) <- (?a rdfs:subClassOf ?b), (?b rdfs:subClassOf ?c)]
         [rdfs9b: (?a rdf:type ?y) <- (?x rdfs:subClassOf ?y), (?a rdf:type ?x)]""")
    val want = Rules.closureLocal(data, fwd)
    val got = Lp.hybrid(data, bwd).find(None, None, None)
    assert(got == want)
  }
}
