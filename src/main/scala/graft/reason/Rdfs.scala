package graft.reason

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.algebra.TermCols
import graft.model.Term
import graft.ops.Graphs

/**
 * RDFS materialization — the Spark mapping of the reference's streaming
 * RDFS engine (jena-arq/src/main/java/org/apache/jena/rdfs/engine/
 * ApplyRDFS.java + InfStreamRDFS.java; SURVEY.md §2.12/§2.11 "incremental
 * RDFS inference → stateless expansion rules inside the batch").
 *
 * Same architecture as the reference: the SCHEMA (subClassOf /
 * subPropertyOf / domain / range statements) is tiny and is closed
 * transitively up front (`SetupRDFS` precomputes the same closures); the
 * DATA pass is then a single stateless expansion — each data triple emits
 * its inferences by joining against the broadcast schema closures. No
 * fixpoint over the data is needed because RDFS rule heads never feed rule
 * bodies once the schema itself is closed (the property the reference's
 * one-pass stream engine relies on).
 *
 * Rules covered (the ApplyRDFS set):
 *   rdfs2  (p domain c)    + (s p o)            → (s rdf:type c)
 *   rdfs3  (p range c)     + (s p o)            → (o rdf:type c)
 *   rdfs5  subPropertyOf transitivity           (schema closure)
 *   rdfs7  (p subPropertyOf q) + (s p o)        → (s q o)
 *   rdfs9  (c subClassOf d) + (s rdf:type c)    → (s rdf:type d)
 *   rdfs11 subClassOf transitivity              (schema closure)
 * Domain/range fire through the property hierarchy (p subPropertyOf q,
 * q domain c ⇒ p effectively has domain c) by closing the schema first.
 */
object Rdfs {

  val RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
  private val RDFS = "http://www.w3.org/2000/01/rdf-schema#"
  val SUBCLASS: String = RDFS + "subClassOf"
  val SUBPROP: String = RDFS + "subPropertyOf"
  val DOMAIN: String = RDFS + "domain"
  val RANGE: String = RDFS + "range"

  private def byPred(g: DataFrame, p: String): DataFrame =
    g.filter(TermCols.lex(col("p")) === p && TermCols.isIri(col("p")))
      .select(col("s").as("src"), col("o").as("dst"))

  /** Reflexive-free transitive closure of a (small) schema relation. */
  private def closure(rel: DataFrame): DataFrame =
    Graphs.transitiveClosure(rel)

  /**
   * Materialize the RDFS closure of `data` under `schema`. Returns
   * data ∪ inferred, deduplicated (set semantics). The schema-side
   * closures are computed with the iterative frontier loop (schemas are
   * tiny); the data-side pass is broadcast joins only — one shuffle-free
   * expansion over arbitrarily large data, exactly the scale shape of the
   * reference's stream engine.
   */
  def materialize(data: DataFrame, schema: DataFrame): DataFrame = {
    val spark = data.sparkSession

    val subClass = closure(byPred(schema, SUBCLASS))
    val subProp = closure(byPred(schema, SUBPROP))
    // reflexive helper for propagating domain/range through the hierarchy:
    // p subPropertyOf* q (including p itself)
    val props = byPred(schema, SUBPROP)
      .select(col("src")).union(byPred(schema, SUBPROP).select(col("dst")))
      .union(byPred(schema, DOMAIN).select(col("src")))
      .union(byPred(schema, RANGE).select(col("src"))).distinct()
    val subPropRefl = subProp.union(props.select(col("src"), col("src").as("dst")))
    val domain = subPropRefl.toDF("p0", "p1")
      .join(byPred(schema, DOMAIN).toDF("p1", "cls"), "p1")
      .select(col("p0").as("src"), col("cls").as("dst")).distinct()
    val range = subPropRefl.toDF("p0", "p1")
      .join(byPred(schema, RANGE).toDF("p1", "cls"), "p1")
      .select(col("p0").as("src"), col("cls").as("dst")).distinct()

    val typeTerm = TermCols.const(Term.iri(RDF_TYPE))

    // rdfs7: s q o  for p subPropertyOf+ q
    val r7 = data.join(broadcast(subProp.toDF("sp_p", "sp_q")),
      col("p") === col("sp_p"))
      .select(col("s"), col("sp_q").as("p"), col("o"))

    // rdfs2/3: domain/range typing (through the closed hierarchy)
    val r2 = data.join(broadcast(domain.toDF("d_p", "d_c")), col("p") === col("d_p"))
      .select(col("s"), typeTerm.as("p"), col("d_c").as("o"))
    val r3 = data.join(broadcast(range.toDF("r_p", "r_c")), col("p") === col("r_p"))
      .filter(!TermCols.isLiteral(col("o"))) // literals take no rdf:type
      .select(col("o").as("s"), typeTerm.as("p"), col("r_c").as("o"))

    // rdfs9: supertype propagation over EVERY type assertion (explicit or
    // just inferred by rdfs2/3 — which is why types are unioned first)
    val types = data.filter(TermCols.lex(col("p")) === RDF_TYPE)
      .select("s", "p", "o")
      .union(r2).union(r3).distinct()
    val r9 = types.join(broadcast(subClass.toDF("sc_c", "sc_d")),
      col("o") === col("sc_c"))
      .select(col("s"), typeTerm.as("p"), col("sc_d").as("o"))

    data.select("s", "p", "o")
      .union(r7).union(r2).union(r3).union(r9)
      .dropDuplicates("s", "p", "o")
  }
}
