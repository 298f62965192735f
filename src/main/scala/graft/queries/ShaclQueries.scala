package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.algebra.TermCols
import graft.model.{Term, Triple}
import graft.shacl.{DfShacl, SH}

/**
 * Oracle-gated SHACL validation: the customer/nation tables are
 * triple-encoded (with rdf:type assertions), a driver-side shapes graph
 * states flat constraints over them, and `DfShacl` compiles the
 * validation onto DataFrames. The DuckDB oracle restates each expected
 * violation set relationally over the original tables, so focus
 * targeting, the subject equi-join, per-value filters, the sh:class
 * anti-join, and the minCount zero-group left join are all checked
 * end-to-end by the driver gate.
 */
object ShaclQueries {

  private val NS = "urn:g:"

  /** Customer + nation triples, typed. */
  private def triples(s: SparkSession, d: String): DataFrame = {
    val customer = Tables.customer(s, d)
    val nation = Tables.nation(s, d)
    def iriCol(prefix: String, c: Column) =
      TermCols.iriTerm(concat(lit(NS + prefix), c.cast("string")))
    def t(sC: Column, p: String, oC: Column) =
      struct(sC.as("s"), TermCols.const(Term.iri(p)).as("p"), oC.as("o")).as("x")
    val rdfType = SH.RDF + "type"
    customer.select(t(iriCol("c:", col("c_custkey")), rdfType,
        TermCols.const(Term.iri(NS + "Customer"))))
      .union(customer.select(t(iriCol("c:", col("c_custkey")), NS + "name",
        TermCols.strTerm(col("c_name")))))
      .union(customer.select(t(iriCol("c:", col("c_custkey")), NS + "segment",
        TermCols.strTerm(col("c_mktsegment")))))
      .union(customer.select(t(iriCol("c:", col("c_custkey")), NS + "acctbal",
        TermCols.decTerm(col("c_acctbal")))))
      .union(customer.select(t(iriCol("c:", col("c_custkey")), NS + "inNation",
        iriCol("n:", col("c_nationkey")))))
      .union(nation.select(t(iriCol("n:", col("n_nationkey")), rdfType,
        TermCols.const(Term.iri(NS + "Nation")))))
      .select(col("x.s").as("s"), col("x.p").as("p"), col("x.o").as("o"))
  }

  /** The shapes graph — every flat component DfShacl compiles:
   * MinInclusive (122 negative balances at sf0.01), In (the HOUSEHOLD
   * segment is disallowed), MinCount (no customer has urn:g:phone),
   * Pattern (names must end in an even digit), and a conforming
   * property (inNation: class Nation + nodeKind IRI + maxCount 1 —
   * exercises the anti-join and count paths with zero violations). */
  private def shapes: Seq[Triple] = {
    import SH.sh
    val cs = Term.iri(NS + "CustomerShape")
    def ps(i: Int) = Term.iri(NS + s"CustomerShape-p$i")
    def b(l: String) = Term.bnode(l)
    def xsd(l: String, dt: String) = Term.lit(l, SH.XSD + dt)
    def rdfList(label: String, items: Seq[Term]): (Term, Seq[Triple]) = {
      val cells = items.indices.map(i => b(s"$label$i"))
      val ts = items.zipWithIndex.flatMap { case (it, i) =>
        Seq(Triple(cells(i), SH.rdfFirst, it),
          Triple(cells(i), SH.rdfRest,
            if (i == items.size - 1) SH.rdfNil else cells(i + 1)))
      }
      (cells.headOption.getOrElse(SH.rdfNil), ts)
    }
    val (inHead, inTs) = rdfList("seg", Seq("AUTOMOBILE", "BUILDING",
      "FURNITURE", "MACHINERY").map(Term.string))
    Seq(
      Triple(cs, SH.rdfType, sh("NodeShape")),
      Triple(cs, sh("targetClass"), Term.iri(NS + "Customer")),
      Triple(cs, sh("property"), ps(1)),
      Triple(ps(1), sh("path"), Term.iri(NS + "acctbal")),
      Triple(ps(1), sh("minInclusive"), xsd("0.0", "decimal")),
      Triple(cs, sh("property"), ps(2)),
      Triple(ps(2), sh("path"), Term.iri(NS + "segment")),
      Triple(ps(2), sh("in"), inHead),
      Triple(cs, sh("property"), ps(3)),
      Triple(ps(3), sh("path"), Term.iri(NS + "phone")),
      Triple(ps(3), sh("minCount"), xsd("1", "integer")),
      Triple(cs, sh("property"), ps(4)),
      Triple(ps(4), sh("path"), Term.iri(NS + "name")),
      Triple(ps(4), sh("pattern"), Term.string("[02468]$")),
      Triple(cs, sh("property"), ps(5)),
      Triple(ps(5), sh("path"), Term.iri(NS + "inNation")),
      Triple(ps(5), sh("class"), Term.iri(NS + "Nation")),
      Triple(ps(5), sh("nodeKind"), sh("IRI")),
      Triple(ps(5), sh("maxCount"), xsd("1", "integer"))) ++ inTs
  }

  def v1_shacl(s: SparkSession, d: String): DataFrame =
    DfShacl.validate(triples(s, d), shapes)

  val oracle: Map[String, String] = Map(
    "v1_shacl" -> s"""
      WITH c AS (SELECT * FROM customer)
      SELECT '${NS}c:' || c_custkey AS focus, '${NS}acctbal' AS path,
             'http://www.w3.org/ns/shacl#MinInclusiveConstraintComponent' AS component,
             regexp_replace(regexp_replace(
               CAST(CAST(c_acctbal AS DECIMAL(28,2)) AS VARCHAR),
               '(\\.\\d*?)0+$$', '\\1'), '\\.$$', '.0') AS value_lex
      FROM c WHERE c_acctbal < 0
      UNION ALL
      SELECT '${NS}c:' || c_custkey, '${NS}segment',
             'http://www.w3.org/ns/shacl#InConstraintComponent', c_mktsegment
      FROM c WHERE c_mktsegment NOT IN ('AUTOMOBILE','BUILDING','FURNITURE','MACHINERY')
      UNION ALL
      SELECT '${NS}c:' || c_custkey, '${NS}phone',
             'http://www.w3.org/ns/shacl#MinCountConstraintComponent', NULL
      FROM c
      UNION ALL
      SELECT '${NS}c:' || c_custkey, '${NS}name',
             'http://www.w3.org/ns/shacl#PatternConstraintComponent', c_name
      FROM c WHERE NOT regexp_matches(c_name, '[02468]$$')
      """)
}
