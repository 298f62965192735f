package graft.algebra

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.algebra.TermCols.{lex, strTerm}

/**
 * Property functions — "magic predicates" that GENERATE bindings rather
 * than match stored triples (SURVEY.md §2.10; reference:
 * sparql/pfunction/library/ — splitIRI, strSplit, listMember, container…,
 * executed via QueryIterProcedure). The Spark mapping is a generator
 * column (`explode`) or a derived-column transform over the solution set;
 * each function here is `DataFrame => DataFrame` over solution columns,
 * i.e. exactly the OpProcedure contract ("registered Scala transform",
 * SURVEY.md §2.10a).
 */
object PropFuncs {

  /** apf:strSplit — one row per separator-split part of `inVar`'s lexical
   * form, bound to `outVar`. */
  def strSplit(solutions: DataFrame, inVar: String, sep: String, outVar: String): DataFrame =
    solutions.withColumn(outVar,
      explode(split(lex(col(inVar)), java.util.regex.Pattern.quote(sep))))
      .withColumn(outVar, strTerm(col(outVar)))

  /** apf:splitIRI — bind namespace and local name of an IRI (split at the
   * last '#' or '/'). */
  def splitIri(solutions: DataFrame, iriVar: String,
               nsVar: String, localVar: String): DataFrame = {
    val iri = lex(col(iriVar))
    val local = regexp_extract(iri, "([^/#]*)$", 1)
    val ns = expr(s"substring(${iriCol(iriVar)}, 1, length(${iriCol(iriVar)}) - length(regexp_extract(${iriCol(iriVar)}, '([^/#]*)$$', 1)))")
    solutions
      .withColumn(nsVar, strTerm(ns))
      .withColumn(localVar, strTerm(local))
  }
  private def iriCol(v: String) = s"$v.lex"

  /** list:member over a materialized CDT list column. */
  def listMember(solutions: DataFrame, listVar: String, outVar: String): DataFrame =
    solutions.withColumn(outVar, explode(col(listVar)))

  /** list:index — (index, member) pairs, 1-based like list:index's output. */
  def listIndex(solutions: DataFrame, listVar: String,
                idxVar: String, outVar: String): DataFrame =
    solutions
      .select(col("*"), posexplode(col(listVar)).as(Seq("__i", outVar)))
      .withColumn(idxVar, TermCols.intTerm(col("__i") + 1)).drop("__i")

  /** list:length. */
  def listLength(solutions: DataFrame, listVar: String, outVar: String): DataFrame =
    solutions.withColumn(outVar, TermCols.intTerm(size(col(listVar))))

  private val RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

  /** (list, idx, member) rows for EVERY collection cell in the graph —
   * the set-at-a-time footing for the reference's list:* property
   * functions over rdf:first/rdf:rest chains (pfunction/library/list*,
   * which walk the chain per binding). Iterative rdf:rest hops with a
   * loud bound — cyclic `rest` chains are malformed data and raise
   * rather than loop. Index is 0-based (reference ListIndex output).
   * Cost note: the table is O(Σ per-list length²/2) rows — the same work
   * the reference's per-binding walks do, batched; pathological chain
   * lengths hit `maxLen` loudly. */
  def listIndexTable(graph: DataFrame, maxLen: Int = 10000): DataFrame = {
    val first = graph
      .filter(TermCols.isIri(col("p")) && lex(col("p")) === (RDF + "first"))
      .select(col("s").as("__cell"), col("o").as("__member"))
    val rest = graph
      .filter(TermCols.isIri(col("p")) && lex(col("p")) === (RDF + "rest"))
      .select(col("s").as("__from"), col("o").as("__to"))
    // NOTE: frontier/rest/cells all derive from `graph` — every join below
    // uses explicit frame aliases so the analyzer cannot mis-resolve the
    // shared-lineage attributes (a bare col(...) in a self-join can bind
    // to the wrong side and silently reverse the traversal).
    val cells = first.select(col("__cell"))
      .union(rest.select(col("__from").as("__cell"))).distinct().localCheckpoint(true)
    var frontier = cells.select(col("__cell").as("__list"), col("__cell").as("__at"),
      lit(0L).as("__idx")).localCheckpoint(true)
    var reach = frontier
    var iter = 0
    while (!frontier.isEmpty) {
      iter += 1
      if (iter > maxLen) throw new IllegalStateException(
        s"rdf:rest chain longer than $maxLen (or cyclic) — malformed collection")
      frontier = frontier.alias("f").join(rest.alias("r"),
          col("f.__at") === col("r.__from"))
        .select(col("f.__list").as("__list"), col("r.__to").as("__at"),
          (col("f.__idx") + 1).as("__idx"))
        .alias("n")
        .join(cells.alias("c"), col("n.__at") === col("c.__cell"), "left_semi")
        .localCheckpoint(true)
      if (!frontier.isEmpty) reach = reach.union(frontier)
    }
    reach.alias("rc").join(first.alias("fs"), col("rc.__at") === col("fs.__cell"))
      .select(col("rc.__list").as("__list"), col("rc.__idx").as("__idx"),
        col("fs.__member").as("__member"))
  }

  /** list:index — join each solution's `listVar` collection head against
   * [[listIndexTable]], binding 0-based `idxVar` + `memberVar`. */
  def listIndexJoin(solutions: DataFrame, graph: DataFrame, listVar: String,
                    idxVar: String, memberVar: String): DataFrame = {
    val idx = listIndexTable(graph).select(col("__list"),
      TermCols.intTerm(col("__idx")).as(idxVar), col("__member").as(memberVar))
    joinOnOrBind(solutions, idx, "__list", listVar)
  }

  /** list:length over graph-encoded collections; rdf:nil has length 0. */
  def listLengthJoin(solutions: DataFrame, graph: DataFrame, listVar: String,
                     lenVar: String): DataFrame = {
    val nilRow = graph.sparkSession.range(1).select(
      TermCols.const(graft.model.Term.iri(RDF + "nil")).as("__list"),
      lit(0L).as("__len"))
    val lens = listIndexTable(graph)
      .groupBy(col("__list")).agg((max(col("__idx")) + 1).as("__len"))
      .unionByName(nilRow)
      .select(col("__list"), TermCols.intTerm(col("__len")).as(lenVar))
    joinOnOrBind(solutions, lens, "__list", listVar)
  }

  /** rdfs:member-style container membership (pfunction/library container):
   * bind `memberVar` to the objects of rdf:_1, rdf:_2, … triples whose
   * subject is `containerVar`'s term — a generator join against the
   * graph, shuffling on the container term like any BGP join. Only nodes
   * TYPED rdf:Bag/Seq/Alt count as containers (reference ContainerMember
   * semantics — ARQ container-3: an untyped node with rdf:_N arcs is not
   * a container). */
  def containerMember(solutions: DataFrame, graph: DataFrame,
                      containerVar: String, memberVar: String): DataFrame = {
    val typed = typedContainers(graph, Seq("Bag", "Seq", "Alt"))
    val byArc = memberPairs(graph, memberVar).alias("m")
      .join(typed.alias("t"), col("m.__cont") === col("t.__typed"), "left_semi")
    // explicit rdfs:member STATEMENTS also count, typed or not
    // (ARQ container-9: untyped :x12 rdfs:member 2 is a solution)
    val explicit = graph.filter(TermCols.isIri(col("p")) &&
        lex(col("p")) === "http://www.w3.org/2000/01/rdf-schema#member")
      .select(col("s").as("__cont"), col("o").as(memberVar))
    joinOnOrBind(solutions, byArc.union(explicit), "__cont", containerVar)
  }

  private def typedContainers(graph: DataFrame, typeLocals: Seq[String]): DataFrame =
    graph.filter(
      TermCols.isIri(col("p")) && lex(col("p")) === (RDF + "type") &&
        TermCols.isIri(col("o")) && lex(col("o")).isin(typeLocals.map(RDF + _): _*))
      .select(col("s").as("__typed"))

  /** Generator join: equi-join when the key var is already a solution
   * column, else bind it from the generated rows (unbound-subject
   * property-function enumeration). A pattern block that STARTS with the
   * property function has the single-row unit table as its solutions —
   * the bind is then the generated frame itself, not a cross join
   * (keeps pfunc-leading queries off the CartesianProduct plan). */
  private def joinOnOrBind(sol: DataFrame, gen: DataFrame,
                           genKey: String, keyVar: String): DataFrame =
    if (sol.columns.contains(keyVar))
      sol.join(gen, sol(keyVar) === gen(genKey)).drop(genKey)
    else {
      val renamed = gen.withColumnRenamed(genKey, keyVar)
      sol.queryExecution.optimizedPlan match {
        case lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation
            if lr.data.lengthCompare(1) == 0 && sol.columns.isEmpty => renamed
        case _ => sol.crossJoin(renamed)
      }
    }

  private def memberPairs(graph: DataFrame, memberVar: String): DataFrame =
    graph
      .filter(TermCols.isIri(col("p")) &&
        lex(col("p")).rlike("^" + java.util.regex.Pattern.quote(RDF) + "_[0-9]+$"))
      .select(col("s").as("__cont"), col("o").as(memberVar))

  /** apf:bag / apf:seq / apf:alt — container membership restricted to
   * containers with the given rdf:type (Bag/Seq/Alt). */
  def containerOfType(solutions: DataFrame, graph: DataFrame, typeLocal: String,
                      containerVar: String, memberVar: String): DataFrame = {
    val typedMembers = memberPairs(graph, memberVar).alias("m")
      .join(typedContainers(graph, Seq(typeLocal)).alias("t"),
        col("m.__cont") === col("t.__typed"), "left_semi")
    joinOnOrBind(solutions, typedMembers, "__cont", containerVar)
  }

  /** Keep only solutions whose `listVar` is a PROPER list head: a node
   * with rdf:first that is not the object of any rdf:rest (the
   * enumeration set of GraphList.listsInGraph). */
  def restrictToListHeads(solutions: DataFrame, graph: DataFrame,
                          listVar: String): DataFrame = {
    val withFirst = graph
      .filter(TermCols.isIri(col("p")) && lex(col("p")) === (RDF + "first"))
      .select(col("s").as("__h"))
    val restTargets = graph
      .filter(TermCols.isIri(col("p")) && lex(col("p")) === (RDF + "rest"))
      .select(col("o").as("__h"))
    val heads = withFirst.alias("a")
      .join(restTargets.alias("b"), col("a.__h") === col("b.__h"), "left_anti")
    solutions.alias("s").join(heads.alias("h"),
      solutions(listVar) === col("h.__h"), "left_semi")
  }

  /** apf:assign — bind a computed column (the property-function face of
   * Extend; kept for library parity with pfunction/library/assign). */
  def assign(solutions: DataFrame, outVar: String,
             e: org.apache.spark.sql.Column): DataFrame =
    solutions.withColumn(outVar, e)

  /** apf:concat — outVar := concatenation of the input vars' lexical
   * forms (pfunction/library/concat). */
  def concatVars(solutions: DataFrame, outVar: String, inVars: String*): DataFrame =
    solutions.withColumn(outVar,
      strTerm(concat(inVars.map(v => lex(col(v))): _*)))

  /** apf:localname / apf:namespace — IRI split at the last '#' or '/'. */
  def localname(solutions: DataFrame, iriVar: String, outVar: String): DataFrame =
    solutions.withColumn(outVar,
      strTerm(regexp_extract(lex(col(iriVar)), "([^/#]*)$", 1)))
  def namespace(solutions: DataFrame, iriVar: String, outVar: String): DataFrame =
    solutions.withColumn(outVar, strTerm(
      expr(s"substring($iriVar.lex, 1, length($iriVar.lex) - length(regexp_extract($iriVar.lex, '([^/#]*)$$', 1)))")))

  /** text:query — analyzed keyword lookup over the graph's literals
   * (TextQueryPF.java:65; index machinery in [[graft.text.TextIndex]]).
   * One solution per matching (subject, literal); `scoreVar` binds the
   * deterministic matched-term count as an xsd:integer. An unbound
   * subject is enumerated from the hits; a bound one equi-joins them. */
  def textQuery(solutions: DataFrame, graph: DataFrame, subjVar: String,
                scoreVar: Option[String], pred: Option[String], q: String,
                limit: Option[Int]): DataFrame = {
    val hits0 = graft.text.TextIndex.search(graph, pred, q, limit)
    val hits = scoreVar match {
      case Some(sv) =>
        hits0.select(col("s").as("__th"), TermCols.intTerm(col("score")).as(sv))
      case None => hits0.select(col("s").as("__th"))
    }
    joinOnOrBind(solutions, hits, "__th", subjVar)
  }
}
