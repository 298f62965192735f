package graft.sparql

import org.apache.spark.sql.DataFrame

import graft.algebra.{Compiler, Construct}

/**
 * Query-facade — the `QueryExecution` surface (reference:
 * sparql/exec/QueryExecDataset.java:172–240): one call per query form over
 * a triple/quad DataFrame with term-struct columns s, p, o (and optional g).
 */
object Sparql {

  /** SELECT → solution DataFrame (one term-struct column per variable). */
  def select(query: String, graph: DataFrame): DataFrame =
    Compiler.compile(Parser.parse(query), graph)

  /** ASK → does at least one solution exist (QueryExecDataset.ask). */
  def ask(query: String, graph: DataFrame): Boolean = Parser.parseAny(query) match {
    case Parser.AskQ(op) => !Compiler.compile(op, graph).isEmpty
    case _ => throw new IllegalArgumentException("not an ASK query")
  }

  /** CONSTRUCT → triple DataFrame (template instantiation + set dedup,
   * QueryExecDataset.java:189–240 → TemplateLib). */
  def construct(query: String, graph: DataFrame): DataFrame =
    Parser.parseAny(query) match {
      case Parser.ConstructQ(template, op, Seq()) =>
        Construct.construct(template, Compiler.compile(op, graph))
      case Parser.ConstructQ(_, _, _) =>
        throw new IllegalArgumentException(
          "CONSTRUCT with GRAPH templates produces quads — use constructDataset")
      case _ => throw new IllegalArgumentException("not a CONSTRUCT query")
    }

  /** Quad CONSTRUCT (ARQ extended syntax: GRAPH blocks in the template)
   * → (s,p,o,g) DataFrame; bare template triples land in the default
   * graph. */
  def constructDataset(query: String, graph: DataFrame): DataFrame =
    Parser.parseAny(query, arq = true) match {
      case Parser.ConstructQ(template, op, quads) =>
        val sols = Compiler.compile(op, graph)
        val all = template.map(tp => graft.sparql.Parser.QuadPat(None, tp)) ++ quads
        Construct.constructQuads(all, sols, graft.model.Term.defaultGraph)
      case _ => throw new IllegalArgumentException("not a CONSTRUCT query")
    }

  /** DESCRIBE text form: `DESCRIBE <iri>...` slices the named resources;
   * `DESCRIBE ?v WHERE {...}` evaluates the pattern and describes every
   * IRI ?v binds (IRIs are collected to the driver — bounded by
   * `maxResources`, loudly). All resources are sliced in ONE set-at-a-time
   * pass (describeAll), not per-resource queries. */
  def describeQuery(query: String, graph: DataFrame,
                    maxResources: Int = 100000): DataFrame =
    Parser.parseAny(query) match {
      case Parser.DescribeQ(iris, Seq(), _) => describeAll(iris, graph)
      case Parser.DescribeQ(fixed, vars, whereOpt) =>
        import org.apache.spark.sql.functions._
        import graft.algebra.TermCols
        val op = whereOpt.getOrElse(
          throw new IllegalArgumentException("DESCRIBE ?v requires a WHERE pattern"))
        val sols = Compiler.compile(op, graph)
        // one pass: every projected var's IRI bindings, unioned (the
        // reference describes the union of all DESCRIBE targets)
        val bound = vars.filter(sols.columns.contains).flatMap { v =>
          sols.filter(TermCols.isIri(col(v)))
            .select(TermCols.lex(col(v))).distinct()
            .limit(maxResources + 1).collect().map(_.getString(0)).toSeq
        }.distinct
        require(bound.size <= maxResources,
          s"DESCRIBE binds more than $maxResources resources")
        describeAll((fixed ++ bound).distinct, graph)
      case _ => throw new IllegalArgumentException("not a DESCRIBE query")
    }

  /** DESCRIBE <iri>: the concise-bounded-description slice — all triples
   * with the resource as subject or object, plus subject-closure over
   * blank nodes reached from it (the reference's default DescribeHandler
   * behavior). Iterates only through bnode hops (bounded by bnode depth). */
  def describe(iri: String, graph: DataFrame, maxBnodeDepth: Int = 5): DataFrame =
    describeAll(Seq(iri), graph, maxBnodeDepth)

  /** Multi-resource DESCRIBE in one pass: seeds = triples touching ANY of
   * the resources, then the shared bnode-closure loop. */
  def describeAll(iris: Seq[String], graph: DataFrame,
                  maxBnodeDepth: Int = 5): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.algebra.TermCols
    if (iris.isEmpty) return graph.select("s", "p", "o").limit(0)
    val seed = graph.filter(
      (TermCols.isIri(col("s")) && TermCols.lex(col("s")).isin(iris: _*)) ||
      (TermCols.isIri(col("o")) && TermCols.lex(col("o")).isin(iris: _*)))
    var acc = seed.select("s", "p", "o")
    var frontier = acc
    var depth = 0
    var done = false
    while (!done && depth < maxBnodeDepth) {
      val bn = frontier.filter(TermCols.isBlank(col("o")))
        .select(col("o").as("__n")).distinct()
      val next = graph.join(bn, col("s") === col("__n")).select("s", "p", "o")
      val grown = acc.union(next).dropDuplicates("s", "p", "o")
      done = grown.count() == acc.count()
      frontier = next
      acc = grown
      depth += 1
    }
    acc
  }
}
