package graft.algebra

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Term
import graft.ops.Graphs

/**
 * Algebra → DataFrame compiler — the Spark-native `OpExecutor`
 * (reference: jena-arq/.../sparql/engine/main/OpExecutor.java:64, 495 LoC,
 * dispatching to 54 pull-based QueryIterator classes). Instead of a Volcano
 * iterator tree we emit one declarative DataFrame per algebra node and let
 * Catalyst plan it: filter/projection pushdown, TopN fusion, join strategy
 * selection and AQE replace the reference's OptimizerStd passes
 * (SURVEY.md §4.1 — "most reference rewrites are subsumed by Catalyst").
 *
 * Variable boundness is tracked per node like the reference's OpVars
 * (algebra/OpVars.java:47–90): `certain` vars are bound in every solution,
 * `maybe` vars can be NULL (after OPTIONAL / UNION / BIND). Shared-var join
 * keys compile to exact equi-conditions when both sides are certain —
 * a hashable Catalyst equi-join — and to SPARQL compatible-binding
 * conditions (`l <=> r OR l IS NULL OR r IS NULL`) only when a side may be
 * unbound (SURVEY.md §2.3 caveat). That keeps the common case (BGP chains)
 * on the broadcast/shuffled-hash fast path at 100 TB scale.
 */
object Compiler {

  /** A compiled solution set: DataFrame with one term-struct column per
   * variable + boundness metadata. */
  final case class Compiled(df: DataFrame, certain: Set[String], maybe: Set[String]) {
    def vars: Set[String] = certain ++ maybe
  }

  /** Where triple patterns scan from. `DfGraph` is the in-memory shape (a
   * DataFrame with term-struct columns s, p, o); `SnapshotGraph` is a
   * materialized TripleStore snapshot, where each pattern picks the
   * SPO/POS/OSP layout by its shape and pushes flat-column equality
   * filters into the parquet scan — the FastTripleStore index-selection
   * rule (mem/store/fast/FastTripleStore.java:36–85) wired into the
   * compiler instead of a union re-scan. */
  sealed trait GraphSource {
    def df: DataFrame
    def spark: SparkSession = df.sparkSession
  }
  final case class DfGraph(df: DataFrame) extends GraphSource
  final case class SnapshotGraph(override val spark: SparkSession, dir: String)
      extends GraphSource {
    /** Struct view over the SPO layout — the fallback for operators that
     * need the whole graph (paths beyond links, DESCRIBE, …). */
    lazy val df: DataFrame = {
      val flat = spark.read.parquet(s"$dir/spo")
      def term(p: String) = struct(
        col(s"${p}_kind").as("kind"), col(s"${p}_lex").as("lex"),
        col(s"${p}_dt").as("dt"), col(s"${p}_lang").as("lang")).as(p)
      flat.select(term("s"), term("p"), term("o"))
    }

    /** One triple-pattern scan: layout by shape, constants as flat-column
     * filters (pushed to parquet), variables as struct columns. */
    def scanPattern(tp: TriplePattern): Compiled = {
      val layout = (tp.s, tp.p, tp.o) match {
        case (TConst(_), _, _) => "spo"
        case (_, TConst(_), _) => "pos"
        case (_, _, TConst(_)) => "osp"
        case _ => "spo"
      }
      var d = spark.read.parquet(s"$dir/$layout")
      val slots = Seq(("s", tp.s), ("p", tp.p), ("o", tp.o))
      slots.foreach {
        case (c, TConst(t)) =>
          d = d.where(col(s"${c}_kind") === t.kind && col(s"${c}_lex") === t.lex &&
            col(s"${c}_dt") === t.dt && col(s"${c}_lang") === t.lang)
        case _ =>
      }
      val byVar = slots.collect { case (c, TVar(n)) => (n, c) }.groupBy(_._1)
      byVar.values.filter(_.size > 1).foreach { occ =>
        occ.map(_._2).sliding(2).foreach {
          case Seq(a, b) =>
            d = d.where(col(s"${a}_kind") === col(s"${b}_kind") &&
              col(s"${a}_lex") === col(s"${b}_lex") &&
              col(s"${a}_dt") === col(s"${b}_dt") &&
              col(s"${a}_lang") === col(s"${b}_lang"))
          case _ =>
        }
      }
      def term(c: String) = struct(
        col(s"${c}_kind").as("kind"), col(s"${c}_lex").as("lex"),
        col(s"${c}_dt").as("dt"), col(s"${c}_lang").as("lang"))
      val out = byVar.map { case (n, occ) => term(occ.head._2).as(n) }.toSeq
      Compiled(
        if (out.isEmpty) d.select(lit(1).as("__unit")) else d.select(out: _*),
        if (out.isEmpty) Set.empty else byVar.keySet, Set.empty)
    }
  }

  /**
   * Id-encoded snapshot (TripleStore.materializeEncoded output — the TDB2
   * NodeTable analog, jena-tdb2/.../nodetable/NodeTable.java): narrow
   * (s_id, p_id, o_id) LONG fact layouts plus a terms dictionary. A BGP
   * compiles to id-equi-joins over ~24-byte rows — the shuffle moves ids,
   * not lexical forms — and the dictionary joins back in ONCE per variable
   * at the BGP boundary (the columnar "decode at projection edges" of
   * SURVEY.md §1.6). Pattern constants are translated to ids by a
   * driver-side dictionary probe, bounded by the query's constant count.
   */
  final case class EncodedSnapshotGraph(override val spark: SparkSession, dir: String)
      extends GraphSource {
    /** Struct view (decoded) — fallback for operators beyond BGPs. */
    lazy val df: DataFrame =
      graft.store.TripleStore.decodeEncoded(spark, dir).select("s", "p", "o")

    private[algebra] def terms: DataFrame = spark.read.parquet(s"$dir/terms")

    /** Narrow (s_id, p_id, o_id) scan of a layout. */
    private[algebra] def idLayout(layout: String): DataFrame =
      spark.read.parquet(s"$dir/$layout").select("s_id", "p_id", "o_id")

    /** Driver-side constant→id probe (one scan for all constants of the
     * BGP; a term missing from the dictionary matches nothing). */
    private[algebra] def idsOf(cs: Seq[Term]): Map[Term, Long] = {
      if (cs.isEmpty) return Map.empty
      val cond = cs.map(t => col("kind") === t.kind && col("lex") === t.lex &&
        col("dt") === t.dt && col("lang") === t.lang).reduce(_ || _)
      terms.filter(cond).select("id", "kind", "lex", "dt", "lang").collect()
        .map(r => Term(r.getByte(1), r.getString(2), r.getString(3), r.getString(4)) ->
          r.getLong(0)).toMap
    }

    def scanBgp(patterns: Seq[TriplePattern]): Compiled = {
      val consts = patterns.flatMap(tp => Seq(tp.s, tp.p, tp.o))
        .collect { case TConst(t) => t }.distinct
      val ids = idsOf(consts)
      val missingConst = consts.exists(t => !ids.contains(t))

      def scanOne(tp: TriplePattern, k: Int): DataFrame = {
        val layout = (tp.s, tp.p, tp.o) match {
          case (TConst(_), _, _) => "spo"
          case (_, TConst(_), _) => "pos"
          case (_, _, TConst(_)) => "osp"
          case _ => "spo"
        }
        var d = spark.read.parquet(s"$dir/$layout").select("s_id", "p_id", "o_id")
        if (missingConst) d = d.limit(0) // a constant outside the dictionary
        val slots = Seq(("s_id", tp.s), ("p_id", tp.p), ("o_id", tp.o))
        slots.foreach {
          case (c, TConst(t)) => d = d.where(col(c) === ids.getOrElse(t, Long.MinValue))
          case _ =>
        }
        val byVar = slots.collect { case (c, TVar(n)) => (n, c) }.groupBy(_._1)
        byVar.values.filter(_.size > 1).foreach { occ =>
          occ.map(_._2).sliding(2).foreach {
            case Seq(a, b) => d = d.where(col(a) === col(b))
            case _ =>
          }
        }
        val out = byVar.map { case (n, occ) => col(occ.head._2).as(n) }.toSeq
        if (out.isEmpty) d.select(lit(1).as(s"__u$k")).limit(1) else d.select(out: _*)
      }

      val scans = patterns.zipWithIndex.map { case (tp, k) => scanOne(tp, k) }
      val joined = scans.reduceLeft { (l, r) =>
        val shared = l.columns.toSet.intersect(r.columns.toSet)
          .filterNot(_.startsWith("__u")).toSeq.sorted
        if (shared.nonEmpty) l.join(r, shared, "inner") else l.crossJoin(r)
      }
      val vars = joined.columns.filterNot(_.startsWith("__u")).toSeq
      // decode: one dictionary join per variable, id → term struct
      val decoded = vars.foldLeft(joined.select(vars.map(col): _*)) { (d, v) =>
        val dict = terms.select(col("id").as(s"__tid_$v"),
          struct(col("kind"), col("lex"), col("dt"), col("lang")).as(s"__t_$v"))
        d.join(dict, col(v) === col(s"__tid_$v"))
      }
      val out = vars.map(v => col(s"__t_$v").as(v))
      Compiled(
        if (out.isEmpty) joined.select(lit(1).as("__unit")).limit(1)
        else decoded.select(out: _*),
        vars.toSet, Set.empty)
    }
  }

  /** Materialized QUAD snapshot (GSPO/GPOS/GOSP layouts): GRAPH patterns
   * pick the layout by s/p/o shape — every quad layout leads with g_lex,
   * so a bound graph prunes file ranges on all of them — and push flat
   * filters into parquet. */
  final case class QuadSnapshotGraph(override val spark: SparkSession, dir: String)
      extends GraphSource {
    /** (s,p,o,g) struct view over GSPO — fallback for generic operators. */
    lazy val df: DataFrame = {
      val flat = spark.read.parquet(s"$dir/gspo")
      def term(p: String) = struct(
        col(s"${p}_kind").as("kind"), col(s"${p}_lex").as("lex"),
        col(s"${p}_dt").as("dt"), col(s"${p}_lang").as("lang")).as(p)
      flat.select(term("s"), term("p"), term("o"), term("g"))
    }

    /** One quad-pattern scan; `defaultOnly` pins the default graph (plain
     * BGP semantics), otherwise `gp` joins/filters like the s/p/o slots
     * restricted to NAMED graphs (GRAPH semantics). */
    def scanQuadPattern(gp: TermPat, tp: TriplePattern,
                        defaultOnly: Boolean = false): Compiled = {
      val layout = (tp.s, tp.p, tp.o) match {
        case (TConst(_), _, _) => "gspo"
        case (_, TConst(_), _) => "gpos"
        case (_, _, TConst(_)) => "gosp"
        case _ => "gspo"
      }
      var d = spark.read.parquet(s"$dir/$layout")
      if (defaultOnly) d = d.where(col("g_lex") === DefaultGraph)
      else d = d.where(col("g_lex") =!= DefaultGraph)
      val slots = Seq(("g", gp), ("s", tp.s), ("p", tp.p), ("o", tp.o))
      slots.foreach {
        case (c, TConst(t)) =>
          d = d.where(col(s"${c}_kind") === t.kind && col(s"${c}_lex") === t.lex &&
            col(s"${c}_dt") === t.dt && col(s"${c}_lang") === t.lang)
        case _ =>
      }
      val byVar = slots.collect { case (c, TVar(n)) => (n, c) }.groupBy(_._1)
      byVar.values.filter(_.size > 1).foreach { occ =>
        occ.map(_._2).sliding(2).foreach {
          case Seq(a, b) =>
            d = d.where(col(s"${a}_kind") === col(s"${b}_kind") &&
              col(s"${a}_lex") === col(s"${b}_lex") &&
              col(s"${a}_dt") === col(s"${b}_dt") &&
              col(s"${a}_lang") === col(s"${b}_lang"))
          case _ =>
        }
      }
      def term(c: String) = struct(
        col(s"${c}_kind").as("kind"), col(s"${c}_lex").as("lex"),
        col(s"${c}_dt").as("dt"), col(s"${c}_lang").as("lang"))
      val out = byVar.map { case (n, occ) => term(occ.head._2).as(n) }.toSeq
      Compiled(
        if (out.isEmpty) d.select(lit(1).as("__unit")) else d.select(out: _*),
        if (out.isEmpty) Set.empty else byVar.keySet, Set.empty)
    }
  }

  /** The graph being queried: a DataFrame with term-struct columns s, p, o
   * (the `Dataset[Triple]` shape of SURVEY.md §1.7). */
  def compile(op: Op, triples: DataFrame): DataFrame =
    comp(op, DfGraph(triples)).df

  /** Compile against any graph source (e.g. a store snapshot). */
  def compile(op: Op, g: GraphSource): DataFrame = comp(op, g).df

  /** Reserved default-graph name (reference: Quad.java:40). A quad table
   * is any graph DataFrame that also has a `g` term-struct column; a plain
   * BGP over it sees only the default graph. */
  val DefaultGraph = "urn:x-arq:DefaultGraph"

  private def hasGraphCol(g: DataFrame): Boolean = g.columns.contains("g")

  /** The ACTIVE (default) graph's triples of a frame that may be a quad
   * table: default-graph rows only, empty-graph marker rows dropped;
   * triple tables pass through. ONE definition shared by BGP scans and
   * PathEval so the two can never diverge. */
  private[algebra] def defaultGraphTriples(df: DataFrame): DataFrame =
    if (hasGraphCol(df))
      df.filter((TermCols.lex(col("g")) === DefaultGraph || col("g").isNull) &&
        col("s").isNotNull)
    else df

  private[algebra] def comp(op: Op, g: GraphSource): Compiled = op match {
    case Bgp(patterns) =>
      require(patterns.nonEmpty, "empty BGP")
      g match {
        case sg: SnapshotGraph =>
          patterns.map(sg.scanPattern).reduceLeft(join(_, _, "inner"))
        case esg: EncodedSnapshotGraph => esg.scanBgp(patterns)
        case qsg: QuadSnapshotGraph =>
          // un-GRAPHed BGP over a quad store = default graph only
          patterns.map(qsg.scanQuadPattern(TAny, _, defaultOnly = true))
            .reduceLeft(join(_, _, "inner"))
        case _ =>
          // on a quad table, an un-GRAPHed BGP matches the default graph
          // only; s-NULL marker rows (empty-graph existence markers) are
          // not triples
          val base = defaultGraphTriples(g.df)
          patterns.map(scan(base, _)).reduceLeft(join(_, _, "inner"))
      }

    case QuadBgp(gp, patterns) =>
      require(patterns.nonEmpty, "empty QuadBgp")
      g match {
        case qsg: QuadSnapshotGraph =>
          patterns.map(qsg.scanQuadPattern(gp, _))
            .reduceLeft(join(_, _, "inner"))
        case _ =>
          require(hasGraphCol(g.df), "QuadBgp needs a quad table (g column)")
          // GRAPH never matches the default graph (SPARQL dataset
          // semantics); empty-graph marker rows are not triples
          val named = g.df.filter(TermCols.lex(col("g")) =!= DefaultGraph &&
            col("g").isNotNull && col("s").isNotNull)
          patterns.map(scan(named, _, extraSlots = Seq(("g", gp))))
            .reduceLeft(join(_, _, "inner"))
      }

    case PathPattern(s, path, o) => compPath(g, s, path, o, None)

    case Project(vars, in) =>
      val c = comp(in, g)
      // projecting a var the pattern never binds is legal SPARQL — it is
      // simply unbound in every row (ARQ ValueTesting, pfunc ASK shapes)
      Compiled(c.df.select(vars.map(v =>
          if (c.vars(v)) col(v) else lit(null).cast(TermCols.schema).as(v)): _*),
        c.certain.intersect(vars.toSet),
        vars.toSet -- c.certain)

    case Filter(cond, in) =>
      val c = comp(in, g)
      // SQL NULL-filter drops the row = SPARQL eval-error semantics
      Compiled(c.df.filter(cond(v => resolve(c, v))), c.certain, c.maybe)

    case Extend(name, expr, in) =>
      val c = comp(in, g)
      require(!c.vars.contains(name), s"Extend onto bound var $name")
      Compiled(c.df.withColumn(name, expr(v => resolve(c, v))),
        c.certain, c.maybe + name)

    case Table(vars, rows) =>
      valuesTable(g.spark, vars, rows)

    // Join family: when one side is a closure-bearing path pattern whose
    // endpoint variable the OTHER side binds certainly, evaluate the path
    // SEEDED from that side's values (the ALP bound-endpoint analog,
    // PathEngineSPARQL.java:36 — the reference streams left bindings into
    // the path iterator). Restricting the path's pairs to src/dst values
    // the join partner actually produces cannot change the join result
    // (inner: dropped pairs never match; left/semi: dropped RIGHT rows
    // were incompatible on a certain shared var) but turns a global-
    // closure materialization into a cone walk.
    case Join(l, r) =>
      (l, r) match {
        case (_, pp: PathPattern) if seedablePath(pp) =>
          val cl = comp(l, g)
          join(cl, compPath(g, pp.s, pp.path, pp.o, Some(cl)), "inner")
        case (pp: PathPattern, _) if seedablePath(pp) =>
          val cr = comp(r, g)
          join(compPath(g, pp.s, pp.path, pp.o, Some(cr)), cr, "inner")
        case _ => join(comp(l, g), comp(r, g), "inner")
      }

    case LeftJoin(l, r, cond) =>
      r match {
        case pp: PathPattern if seedablePath(pp) =>
          val cl = comp(l, g)
          leftJoin(cl, compPath(g, pp.s, pp.path, pp.o, Some(cl)), cond)
        case _ => leftJoin(comp(l, g), comp(r, g), cond)
      }

    case SemiJoin(l, r) =>
      r match {
        case pp: PathPattern if seedablePath(pp) =>
          val cl = comp(l, g)
          halfJoin(cl, compPath(g, pp.s, pp.path, pp.o, Some(cl)), "left_semi")
        case _ => halfJoin(comp(l, g), comp(r, g), "left_semi")
      }

    case AntiJoin(l, r) => halfJoin(comp(l, g), comp(r, g), "left_anti")

    case Minus(l, r) => minusJoin(comp(l, g), comp(r, g))

    case ExistsFlag(v, r, in) => existsFlagC(comp(in, g), comp(r, g), v)

    case DropVars(vs, in) =>
      val c = comp(in, g)
      Compiled(c.df.drop(vs.filter(c.vars.contains): _*),
        c.certain -- vs, c.maybe -- vs)

    case GraphVarEnum(gv, body) =>
      // SPARQL 18.5: Union over g of Join(eval(D[g], P), {(var, g)}).
      // SINGLE-PLAN compile (the scale path): when the body is built from
      // graph-local operators, evaluate it ONCE over the named-quads frame
      // with the active graph threaded as a hidden certain column — every
      // scan binds it, every join/OPTIONAL/EXISTS keys on it (per-graph
      // scoping for free), aggregates group by it. No driver-side graph
      // enumeration, no N-way plan union: at one-named-graph-per-document
      // scale (the north star's 10^12 files) this is the only shape that
      // survives. The var is NOT visible inside the body (W3C
      // graph-variable-scope); a body that itself binds the var joins at
      // the boundary.
      val singlePlanOn = g.spark.conf
        .getOption("graft.graphVarSinglePlan").forall(_ != "off")
      if (singlePlanOn && graphVarSinglePlan(body)) compGraphVar(gv, body, g)
      else {
        // fallback: driver-side enumeration, one GraphScope plan per
        // graph, unioned — kept ONLY for bodies the single-plan compile
        // cannot express (nested GRAPH / FROM / sub-SLICE / LATERAL /
        // SERVICE), under a loud graph-count cap.
        val cap = g.spark.conf.getOption("graft.graphVarEnumMax")
          .map(_.toInt).getOrElse(1000)
        val terms = namedGraphTerms(g, cap)
        // zero named graphs: the union over graphs is EMPTY regardless of
        // the body (SPARQL 18.5) — compile one branch against a
        // never-matching name for the SCHEMA, then force zero rows (a
        // graph-independent body like VALUES would otherwise still emit
        // rows bound to the sentinel)
        val names = if (terms.isEmpty)
          Seq(Term.iri("urn:graft:no-such-graph")) else terms
        val out = names.map { t =>
          val c = comp(GraphScope(t, body), g)
          val const = TermCols.const(t)
          val df =
            if (c.vars(gv))
              c.df.filter(col(gv).isNull || col(gv) === const)
                .withColumn(gv, coalesce(col(gv), const))
            else c.df.withColumn(gv, const)
          Compiled(df, c.certain + gv, c.maybe - gv)
        }.reduceLeft(unionPad)
        if (terms.isEmpty) Compiled(out.df.limit(0), out.certain, out.maybe)
        else out
      }

    case Lateral(l, r) => lateral(comp(l, g), r, g)

    case Unfold(listVar, outVar, idxVar, in) =>
      unfoldC(comp(in, g), listVar, outVar, idxVar)

    case Union(l, r) => unionPad(comp(l, g), comp(r, g))

    case Group(keys, aggs, in) => groupC(comp(in, g), keys, aggs)

    case Order(keys, in) =>
      val c = comp(in, g)
      val sortCols = keys.map { k =>
        val sk = TermCols.sortKey(resolve(c, k.v))
        if (k.ascending) sk.asc else sk.desc
      }
      Compiled(c.df.orderBy(sortCols: _*), c.certain, c.maybe)

    case Slice(offset, limit, in) =>
      val c = comp(in, g)
      // Spark's native Offset keeps the preceding Sort's order — only
      // deterministic after Order, same caveat as QueryIterSlice.java.
      // limit == Long.MaxValue means OFFSET-without-LIMIT (parser contract)
      // — no limit node at all (Long.MaxValue.toInt would be -1).
      require(offset <= Int.MaxValue, s"OFFSET $offset exceeds supported range")
      require(limit == Long.MaxValue || limit <= Int.MaxValue,
        s"LIMIT $limit exceeds supported range")
      val off = if (offset <= 0) c.df else c.df.offset(offset.toInt)
      val df = if (limit == Long.MaxValue) off else off.limit(limit.toInt)
      Compiled(df, c.certain, c.maybe)

    case Distinct(in) =>
      val c = comp(in, g); Compiled(c.df.dropDuplicates(), c.certain, c.maybe)

    case Reduced(in) =>
      val c = comp(in, g); Compiled(c.df.dropDuplicates(), c.certain, c.maybe)

    case GraphScope(gname, in) =>
      val scoped: GraphSource = g match {
        case qsg: QuadSnapshotGraph if !usesDataset(in) =>
          DfGraph(qsg.spark.read.parquet(s"${qsg.dir}/gspo")
            .where(col("g_kind") === gname.kind && col("g_lex") === gname.lex &&
              col("g_dt") === gname.dt && col("g_lang") === gname.lang)
            .select(
              struct(col("s_kind").as("kind"), col("s_lex").as("lex"),
                col("s_dt").as("dt"), col("s_lang").as("lang")).as("s"),
              struct(col("p_kind").as("kind"), col("p_lex").as("lex"),
                col("p_dt").as("dt"), col("p_lang").as("lang")).as("p"),
              struct(col("o_kind").as("kind"), col("o_lex").as("lex"),
                col("o_dt").as("dt"), col("o_lang").as("lang")).as("o")))
        case _ if !usesDataset(in) =>
          require(hasGraphCol(g.df), "GRAPH needs a quad table (g column)")
          DfGraph(g.df
            .filter(col("g") === TermCols.const(gname) &&
              TermCols.lex(col("g")) =!= DefaultGraph &&
              col("s").isNotNull) // drop empty-graph marker rows
            .select("s", "p", "o"))
        case _ =>
          // the body re-accesses the DATASET (nested GRAPH, dataset
          // names, FROM): GRAPH only changes the ACTIVE graph — SPARQL
          // 18.5 eval(D(D[iri]), P) keeps the named-graph part visible,
          // so re-scope to a QUAD table: default := the named graph's
          // triples, named part unchanged
          require(hasGraphCol(g.df), "GRAPH needs a quad table (g column)")
          val glex = TermCols.lex(col("g"))
          val defaultPart = g.df.filter(col("g") === TermCols.const(gname) &&
              glex =!= DefaultGraph && col("s").isNotNull)
            .withColumn("g", TermCols.const(graft.model.Term.defaultGraph))
          val namedPart = g.df.filter(glex =!= DefaultGraph && col("g").isNotNull)
          DfGraph(defaultPart.union(namedPart))
      }
      comp(in, scoped)

    case Label(_, in) => comp(in, g)

    case Service(silent, target, body, bodyText) =>
      // Federated evaluation against a REGISTERED endpoint: either a
      // local GraphSource (the zero-egress stand-in) or an HTTP
      // ServiceTransport (the pluggable seam — reference:
      // sparql/exec/http/QueryExecHTTP.java). Either way the endpoint's
      // result set hash-joins with the outer bindings set-at-a-time.
      // SILENT ⇒ a failing/unknown endpoint yields the unit table
      // (SPARQL 1.1 Fed §4: "the SERVICE statement is considered to have
      // a result of a single solution mapping with no bindings").
      def unit = Compiled(
        g.spark.range(1).select(lit(1).as("__unit")), Set.empty, Set.empty)
      def evalAgainst(src: GraphSource): Compiled =
        if (!silent) comp(body, src)
        else
          try {
            val c = comp(body, src)
            c.df.queryExecution.analyzed // force analysis errors eagerly
            c
          } catch { case scala.util.control.NonFatal(_) => unit }
      def evalTransport(iri: String, t: ServiceRegistry.ServiceTransport): Compiled = {
        def run: Compiled = {
          val q = bodyText.getOrElse(throw new IllegalStateException(
            "SERVICE over an HTTP transport needs the body's source text " +
              "(algebra-built Service nodes carry none — parse the query " +
              "from text, or register a GraphSource endpoint instead)"))
          val (ct, payload) = t.execute(iri, q)
          val df = ServiceRegistry.parseResults(g.spark, ct, payload)
          // wire results carry no boundness metadata: every var is maybe
          Compiled(df, Set.empty, df.columns.toSet)
        }
        if (!silent) run
        else try run catch { case scala.util.control.NonFatal(_) => unit }
      }
      target match {
        case TConst(t) =>
          (ServiceRegistry.lookup(t.lex), ServiceRegistry.lookupTransport(t.lex)) match {
            case (Some(src), _) => evalAgainst(src)
            case (None, Some(tr)) => evalTransport(t.lex, tr)
            case (None, None) if silent => unit
            case (None, None) => throw new IllegalArgumentException(
              s"SERVICE endpoint <${t.lex}> is not registered — wire it " +
                "via graft.algebra.ServiceRegistry.register / registerTransport")
          }
        case TVar(v) =>
          // variable target: union over the registered endpoints, the
          // variable bound to each endpoint's IRI per branch (the
          // set-at-a-time twin of the reference's per-binding dispatch —
          // the outer join then restricts to whatever the query bound).
          // one branch per endpoint IRI: a GraphSource registration wins
          // over a transport for the same IRI (mirroring the TConst
          // lookup order) — without the dedup an endpoint registered both
          // ways would contribute its solutions twice
          val graphIris = ServiceRegistry.all.map(_._1).toSet
          val eps = ServiceRegistry.all.map { case (iri, src) =>
            () => (iri, evalAgainst(src))
          } ++ ServiceRegistry.allTransports.collect {
            case (iri, tr) if !graphIris(iri) =>
              () => (iri, evalTransport(iri, tr))
          }
          if (eps.isEmpty) {
            if (silent) unit
            else throw new IllegalArgumentException(
              s"SERVICE ?$v: no endpoints registered")
          } else
            eps.map { thunk =>
              val (iri, c) = thunk()
              Compiled(c.df.withColumn(v, TermCols.const(Term.iri(iri))),
                c.certain + v, c.maybe - v)
            }.reduce(unionPad)
      }

    case Null =>
      Compiled(g.spark.range(0).select(lit(1).as("__unit")),
        Set.empty, Set.empty)

    case DatasetNames(gp) =>
      // named graph names only (never the default graph) — OpDatasetNames
      val names: DataFrame = (g match {
        case qsg: QuadSnapshotGraph =>
          qsg.df.select(col("g"))
        case _ =>
          require(hasGraphCol(g.df), "GRAPH needs a quad table (g column)")
          g.df.select(col("g"))
      }).filter(TermCols.lex(col("g")) =!= DefaultGraph && col("g").isNotNull)
        .distinct()
      gp match {
        case TVar(v) => Compiled(names.select(col("g").as(v)), Set(v), Set.empty)
        case TConst(t) =>
          Compiled(names.filter(col("g") === TermCols.const(t))
            .select(lit(1).as("__unit")).limit(1), Set.empty, Set.empty)
        case TAny =>
          Compiled(names.select(lit(1).as("__unit")).limit(1), Set.empty, Set.empty)
      }

    case DatasetClause(defaults, named, in) =>
      require(hasGraphCol(g.df), "FROM / FROM NAMED need a quad table (g column)")
      val glex = TermCols.lex(col("g"))
      // the dataset is EXACTLY what the clauses describe (SPARQL 13.2):
      // graphs named in FROM merge into the default graph; FROM NAMED
      // graphs stay named; everything else disappears
      val defaultPart0 = g.df.filter(glex.isin(defaults: _*))
        .withColumn("g", TermCols.const(graft.model.Term.defaultGraph))
      // the FROM default graph is the set-UNION of the listed graphs — a
      // triple present in two of them matches ONCE (the reference's
      // GraphUnionRead.find wraps Iter.distinct, GraphUnionRead.java:119);
      // a single source graph is already a set, so skip the exchange then.
      // CONTRACT (matching the reference, where Graph.add dedupes on
      // insert): a quad table is duplicate-free per (g, s, p, o) — every
      // producer in this repo (TripleStore.materializeQuads, Update's
      // dataset ops, the riot readers via dropDuplicates) maintains it.
      // A caller feeding a non-set frame would see bag semantics here in
      // the single-graph case only, exactly as a corrupted store would
      // in the reference; we do not pay a per-query full-data exchange
      // to defend against it.
      val defaultPart =
        if (defaults.lengthCompare(1) > 0)
          defaultPart0.dropDuplicates("s", "p", "o")
        else defaultPart0
      val namedPart = g.df.filter(glex.isin(named: _*) && glex =!= DefaultGraph)
      comp(in, DfGraph(defaultPart.union(namedPart)))

    case ExtOp(f, certainVars, in) =>
      val c = comp(in, g)
      val df = f(c.df)
      val vars = df.columns.toSet
      Compiled(df, certainVars.toSet.intersect(vars), vars -- certainVars)

    case GraphOp(f, certainVars, in) =>
      val c = comp(in, g)
      val df = f(c.df, g.df)
      val vars = df.columns.toSet
      Compiled(df, c.certain.intersect(vars) ++ certainVars.toSet.intersect(vars),
        (vars -- c.certain) -- certainVars)
  }

  /** Resolve a variable to its column; unknown vars are NULL (unbound). */
  private def resolve(c: Compiled, v: String): Column =
    if (c.vars(v)) col(v) else lit(null).cast(TermCols.schema)

  /** Group compile over an already-compiled input (shared by [[comp]] and
   * the single-plan GRAPH ?var body compiler [[compG]]). */
  private def groupC(c: Compiled, keys: Seq[String],
                     aggs: Seq[(String, RowExpr)]): Compiled =
    if (aggs.isEmpty) {
      // GROUP BY with no aggregates in scope — one row per group, keys
      // only (SELECT ?s { … } GROUP BY ?s ≡ projected distinct)
      Compiled(c.df.select(keys.map(col): _*).dropDuplicates(),
        c.certain.intersect(keys.toSet), keys.toSet -- c.certain)
    } else {
      // "*" resolves to the whole visible row — COUNT(DISTINCT *)
      // (AggCountDistinct over bindings, not a single var)
      def res(v: String): Column =
        if (v == "*") struct(c.df.columns.map(col): _*) else resolve(c, v)
      val aggCols = aggs.map { case (name, e) => e(res).as(name) }
      val out =
        if (keys.isEmpty) c.df.agg(aggCols.head, aggCols.tail: _*)
        else c.df.groupBy(keys.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
      Compiled(out, c.certain.intersect(keys.toSet),
        aggs.map(_._1).toSet ++ c.maybe.intersect(keys.toSet))
    }

  /** UNFOLD compile over an already-compiled input (shared by [[comp]]
   * and [[compG]]). */
  private def unfoldC(c: Compiled, listVar: String, outVar: String,
                      idxVar: Option[String]): Compiled = {
    require(c.vars.contains(listVar), s"Unfold of unknown var $listVar")
    val isArray = c.df.schema(listVar).dataType
      .isInstanceOf[org.apache.spark.sql.types.ArrayType]
    val exploded =
      if (isArray) idxVar match {
        case Some(iv) =>
          c.df.select(col("*"), posexplode_outer(col(listVar)).as(Seq("__i", outVar)))
            .withColumn(iv, TermCols.intTerm(col("__i") + 1)).drop("__i")
        case None =>
          c.df.select(col("*"), explode_outer(col(listVar)).as(outVar))
      } else {
        // cdt:List / cdt:Map LITERAL (SPARQL-CDTs UNFOLD): one row per
        // element (v, 1-based idx) or map entry (key, value); a non-CDT
        // or malformed operand contributes no rows (plain explode)
        val pairs = c.df.select(col("*"),
          explode(graft.cdt.CdtFunctions.unfoldUdf(col(listVar))).as("__u"))
        val withV1 = pairs.withColumn(outVar, col("__u._1"))
        (idxVar match {
          case Some(iv) => withV1.withColumn(iv, col("__u._2"))
          case None => withV1
        }).drop("__u")
      }
    Compiled(exploded.drop(listVar), c.certain - listVar,
      c.maybe - listVar ++ Set(outVar) ++ idxVar.toSet)
  }

  /** Expression-level EXISTS flag over compiled left/right (shared by
   * [[comp]] and [[compG]] — in the latter both sides carry the hidden
   * graph column as a certain shared var, scoping the match per graph). */
  private def existsFlagC(l: Compiled, rc: Compiled, v: String): Compiled = {
    val rr = renamedRight(rc)
    val shared = l.vars.intersect(rc.vars).toSeq.sorted
    val mv = maybeShared(l, rc, shared)
    val lid = tagged(l.df)
    val matched =
      if (mv.size <= MaxDecomposedVars)
        compatMatches(lid, rr, l.certain, rc.certain,
          shared.filterNot(mv.contains), mv)
      else {
        val cond = shared.map { sv =>
          (col(sv) <=> col(RP + sv)) || col(sv).isNull || col(RP + sv).isNull
        }.foldLeft(lit(true))(_ && _)
        lid.join(rr, cond, "inner")
      }
    val ids = matched.select(col(LID)).distinct().withColumn("__exm", lit(true))
    val df = lid.join(ids, Seq(LID), "left_outer")
      .withColumn(v, TermCols.boolTerm(coalesce(col("__exm"), lit(false))))
      .drop(LID, "__exm")
    Compiled(df, l.certain + v, l.maybe)
  }

  /** Distinct NAMED graph names of the dataset (driver-side; bounded by
   * `cap` — the collect FAILS LOUDLY past it rather than OOM the driver).
   * Sorted for deterministic union order. */
  private def namedGraphTerms(g: GraphSource, cap: Int = Int.MaxValue): Seq[Term] = {
    val rows = namedGraphNamesDf(g).limit(math.min(cap.toLong + 1, Int.MaxValue).toInt)
      .collect()
    if (rows.length > cap) throw new IllegalStateException(
      s"GRAPH ?var enumeration fallback over > $cap named graphs — this " +
        "body shape compiles per-graph on the driver and cannot scale to " +
        "many graphs. Simplify the GRAPH body to the single-plan subset " +
        "(BGP/path/join/optional/filter/union/group) or raise " +
        "spark.conf graft.graphVarEnumMax explicitly.")
    rows.map { r =>
      val x = r.getStruct(0)
      graft.model.Term(x.getByte(0), x.getString(1), x.getString(2), x.getString(3))
    }.toSeq.sortBy(t => (t.kind, t.lex))
  }

  // ---- single-plan GRAPH ?var compile (the scale path) ----------------

  /** Hidden active-graph column threaded through [[compG]] — certain in
   * every sub-result, never visible to the query (guarded in
   * [[graphVarSinglePlan]]). */
  private val AGV = "__activeg"

  /** The dataset's NAMED quads as a (g, s, p, o) term-struct frame.
   * Empty-graph marker rows (s NULL) are KEPT — name enumeration needs
   * them; triple-level consumers filter s.isNotNull / on p. */
  private[algebra] def namedQuadsDf(g: GraphSource): DataFrame = {
    val base = g match {
      case qsg: QuadSnapshotGraph => qsg.df
      case _ =>
        require(hasGraphCol(g.df), "GRAPH needs a quad table (g column)")
        g.df
    }
    base.filter(TermCols.lex(col("g")) =!= DefaultGraph && col("g").isNotNull)
      .select(col("g"), col("s"), col("p"), col("o"))
  }

  /** Distinct named-graph names as a DISTRIBUTED frame (column `g`). */
  private def namedGraphNamesDf(g: GraphSource): DataFrame =
    namedQuadsDf(g).select(col("g")).distinct()

  /** Is `body` expressible by the single-plan GRAPH ?var compile? True
   * only for graph-local operators: scans bind the hidden graph column,
   * binary ops key on it, per-row ops ignore it, grouping and Slice
   * partition by it, LATERAL threads it through the correlated leaf
   * compiler. Excluded (→ enumeration fallback): dataset re-access
   * (nested GRAPH / QuadBgp / FROM / DatasetNames / SERVICE) and the
   * escape hatches (ExtOp/GraphOp see raw frames). */
  private def graphVarSinglePlan(op: Op): Boolean = {
    def ok(o: Op): Boolean = o match {
      case Bgp(_) | PathPattern(_, _, _) | Table(_, _) | Null => true
      case Join(a, b) => ok(a) && ok(b)
      case Lateral(a, b) => ok(a) && ok(b)
      case LeftJoin(a, b, _) => ok(a) && ok(b)
      case Union(a, b) => ok(a) && ok(b)
      case SemiJoin(a, b) => ok(a) && ok(b)
      case AntiJoin(a, b) => ok(a) && ok(b)
      case Minus(a, b) => ok(a) && ok(b)
      case ExistsFlag(_, r, in) => ok(r) && ok(in)
      case Filter(_, in) => ok(in)
      case Extend(_, _, in) => ok(in)
      case Project(_, in) => ok(in)
      case DropVars(_, in) => ok(in)
      case Distinct(in) => ok(in)
      case Reduced(in) => ok(in)
      case Group(_, _, in) => ok(in)
      case Order(_, in) => ok(in)
      case Slice(_, _, in) => ok(in)
      case Unfold(_, _, _, in) => ok(in)
      case Label(_, in) => ok(in)
      case _ => false
    }
    ok(op) && !opVisibleVars(op).contains(AGV)
  }

  /** GRAPH ?var as ONE plan: compile the body with [[compG]] (active
   * graph = hidden certain column), then surface the column as the graph
   * variable — joining when the body itself binds the var (SPARQL 18.5
   * boundary restriction, same as the enumeration fallback). */
  private def compGraphVar(gv: String, body: Op, g: GraphSource): Compiled = {
    val c = compG(body, g)
    if (c.vars(gv)) {
      val df = c.df.filter(col(gv).isNull || col(gv) === col(AGV))
        .withColumn(gv, coalesce(col(gv), col(AGV))).drop(AGV)
      Compiled(df, (c.certain - AGV) + gv, c.maybe - gv)
    } else
      Compiled(c.df.withColumnRenamed(AGV, gv), (c.certain - AGV) + gv, c.maybe)
  }

  /** Body compiler for the single-plan GRAPH ?var: mirrors [[comp]] over
   * the supported subset with the invariant that EVERY result carries the
   * hidden [[AGV]] column as a certain var — scans bind it from the quad
   * frame, so the shared-var join machinery scopes joins / OPTIONAL /
   * EXISTS / NOT EXISTS to the same graph automatically; grouping adds it
   * as a key (per-graph aggregation); graph-independent leaves (VALUES)
   * cross-join the distributed name frame (per-graph bag semantics). */
  private def compG(op: Op, g: GraphSource): Compiled = op match {
    case Bgp(patterns) =>
      require(patterns.nonEmpty, "empty BGP")
      comp(QuadBgp(TVar(AGV), patterns), g)

    case PathPattern(s0, path, o0) =>
      val nq = namedQuadsDf(g)
      // seeded per-graph evaluation for constant endpoints (the GRAPH
      // ?var twin of compPath's ALP seeding): the seed set is
      // (graph, const) for every named graph — the packed closure walks
      // only each graph's cone from the constant
      val seedOnG = g.spark.conf
        .getOption("graft.pathSeededEval").forall(_ != "off")
      def constSeeds(t: Term): DataFrame =
        namedGraphNamesDf(g).select(col("g"), TermCols.const(t).as("n"))
      var prs: DataFrame =
        if (!seedOnG || !PathEval.containsClosure(path)) PathEval.pairsG(nq, path)
        else (s0, o0) match {
          case (TConst(t), _) => PathEval.pairsGFrom(nq, path, constSeeds(t))
          case (_, TConst(t)) =>
            PathEval.pairsGFrom(nq, PathEval.inverse(path), constSeeds(t))
              .select(col("g"), col("dst").as("src"), col("src").as("dst"))
          case _ => PathEval.pairsG(nq, path)
        }
      if (PathEval.allowsZero(path)) {
        // zero-length const endpoints match themselves in EVERY named
        // graph (per-graph twin of the PathPattern zero augmentation)
        val consts = Seq(s0, o0).collect { case TConst(t) => t }.distinct
        consts.foreach { t =>
          prs = prs.union(namedGraphNamesDf(g).select(col("g"),
            TermCols.const(t).as("src"), TermCols.const(t).as("dst")))
        }
        if (consts.nonEmpty) prs = prs.distinct()
      }
      bindPairG(prs, s0, o0)

    case Table(vars, rows) =>
      // VALUES is graph-independent: per-graph semantics yield the table
      // once PER named graph — the tiny table broadcasts over the
      // distributed name frame (never a driver enumeration)
      val vt = valuesTable(g.spark, vars, rows)
      Compiled(namedGraphNamesDf(g).select(col("g").as(AGV))
          .crossJoin(broadcast(vt.df)),
        vt.certain + AGV, vt.maybe)

    case Null =>
      Compiled(g.spark.range(0)
          .select(lit(null).cast(TermCols.schema).as(AGV), lit(1).as("__unit")),
        Set(AGV), Set.empty)

    case Project(vars, in) =>
      val c = compG(in, g)
      val keep = vars :+ AGV
      Compiled(c.df.select(keep.map(v =>
          if (c.vars(v) || v == AGV) col(v)
          else lit(null).cast(TermCols.schema).as(v)): _*),
        c.certain.intersect(keep.toSet), vars.toSet -- c.certain)

    case Filter(cond, in) =>
      val c = compG(in, g)
      Compiled(c.df.filter(cond(v => resolve(c, v))), c.certain, c.maybe)

    case Extend(name, expr, in) =>
      val c = compG(in, g)
      require(!c.vars.contains(name), s"Extend onto bound var $name")
      Compiled(c.df.withColumn(name, expr(v => resolve(c, v))),
        c.certain, c.maybe + name)

    case Join(l, r) => join(compG(l, g), compG(r, g), "inner")
    // LATERAL inside GRAPH ?var: same correlated machinery, with the
    // leaf compiler swapped to compG — every RHS leaf binds the hidden
    // active-graph column, so the per-left-row correlation keys on it
    // and the lateral evaluation never crosses graphs (one plan for ALL
    // graphs; no enumeration fallback)
    case Lateral(a, b) => lateral(compG(a, g), b, g, leaf = compG(_, _))
    case LeftJoin(l, r, cond) => leftJoin(compG(l, g), compG(r, g), cond)
    case SemiJoin(l, r) => halfJoin(compG(l, g), compG(r, g), "left_semi")
    case AntiJoin(l, r) => halfJoin(compG(l, g), compG(r, g), "left_anti")
    case Minus(l, r) => minusJoinG(compG(l, g), compG(r, g))
    case ExistsFlag(v, r, in) => existsFlagC(compG(in, g), compG(r, g), v)
    case Union(l, r) => unionPad(compG(l, g), compG(r, g))

    case DropVars(vs, in) =>
      val c = compG(in, g)
      val safe = vs.filterNot(_ == AGV)
      Compiled(c.df.drop(safe.filter(c.vars.contains): _*),
        c.certain -- safe, c.maybe -- safe)

    case Distinct(in) =>
      val c = compG(in, g); Compiled(c.df.dropDuplicates(), c.certain, c.maybe)
    case Reduced(in) =>
      val c = compG(in, g); Compiled(c.df.dropDuplicates(), c.certain, c.maybe)

    case Group(keys, aggs, in) =>
      // per-graph grouping: the active graph is always a key
      val c = compG(in, g)
      val grouped = groupC(c, keys :+ AGV, aggs)
      if (keys.nonEmpty || aggs.isEmpty) grouped
      else {
        // keyless aggregate: per-graph evaluation yields EXACTLY ONE row
        // per named graph — including graphs whose body result is empty
        // (COUNT()=0 over the empty group; W3C aggregates "singleton"
        // case). groupBy(AGV) alone would drop those graphs, so pad the
        // missing ones with the zero-group row: the same aggregate
        // expressions evaluated over an EMPTY input (which is exactly
        // what the top-level keyless Group compiles to).
        val names = namedGraphNamesDf(g).select(col("g").as(AGV))
        val empty = c.df.limit(0)
        def res(v: String): Column =
          if (v == "*") struct(empty.columns.map(col): _*)
          else if (c.vars(v)) col(v) else lit(null).cast(TermCols.schema)
        val zeroRow = empty.agg(aggs.head._2(res).as(aggs.head._1),
          aggs.tail.map { case (n, e) => e(res).as(n) }: _*)
        val missing = names
          .join(grouped.df.select(col(AGV)), Seq(AGV), "left_anti")
          .crossJoin(broadcast(zeroRow))
        Compiled(grouped.df.unionByName(missing), grouped.certain, grouped.maybe)
      }

    case Order(keys, in) =>
      val c = compG(in, g)
      val sortCols = keys.map { k =>
        val sk = TermCols.sortKey(resolve(c, k.v))
        if (k.ascending) sk.asc else sk.desc
      }
      Compiled(c.df.orderBy(sortCols: _*), c.certain, c.maybe)

    // Slice commutes with per-row shapes (projection keeps rows 1:1), so
    // push it inside before looking for the ORDER BY: the parser emits
    // sub-selects as Slice(Project(Order(...))), and without this rewrite
    // the Order-unwrap below would never fire — the ordered per-graph
    // LIMIT would then rest on an UNSPECIFIED physical-ordering accident
    // (row_number over monotonically_increasing_id above a global Sort).
    case Slice(offset, limit, Project(vs, in)) =>
      compG(Project(vs, Slice(offset, limit, in)), g)
    case Slice(offset, limit, Label(_, in)) =>
      compG(Slice(offset, limit, in), g)

    case Slice(offset, limit, in) =>
      // per-graph LIMIT/OFFSET (sub-SELECT inside GRAPH ?var): a rank
      // window partitioned by the active graph — the per-group twin of
      // comp's global Slice. Ordered by the inner ORDER BY's keys when
      // present (deterministic); otherwise by an arbitrary stable id
      // (any n rows per graph, the same freedom the per-graph
      // enumeration has).
      require(offset <= Int.MaxValue, s"OFFSET $offset exceeds supported range")
      require(limit == Long.MaxValue || limit <= Int.MaxValue,
        s"LIMIT $limit exceeds supported range")
      val (sortCols, inner) = in match {
        case Order(keys, i2) =>
          val c0 = compG(i2, g)
          (keys.map { k =>
            val sk = TermCols.sortKey(resolve(c0, k.v))
            if (k.ascending) sk.asc else sk.desc
          }, c0)
        case _ => (Seq.empty[Column], compG(in, g))
      }
      import org.apache.spark.sql.expressions.Window
      // the UNORDERED branch picks "any n rows per graph" — a specified
      // freedom, but monotonically_increasing_id is partition-order-
      // dependent, so under a task retry (or between two consumers of
      // this plan) the chosen rows could differ. localCheckpoint pins the
      // assignment exactly like tagged() pins LID rows — retry-stable for
      // one materialization's cost on this rare branch only.
      val (w, ranked0) =
        if (sortCols.nonEmpty)
          (Window.partitionBy(col(AGV)).orderBy(sortCols: _*), inner.df)
        else
          (Window.partitionBy(col(AGV)).orderBy(col("__gslid")),
            inner.df.withColumn("__gslid", monotonically_increasing_id())
              .localCheckpoint(true))
      val hi = if (limit == Long.MaxValue) Long.MaxValue else offset + limit
      val ranked = ranked0.withColumn("__gsl", row_number().over(w))
      Compiled(ranked.filter(col("__gsl") > offset && col("__gsl") <= hi)
          .drop("__gsl", "__gslid"),
        inner.certain, inner.maybe)

    case Unfold(listVar, outVar, idxVar, in) =>
      unfoldC(compG(in, g), listVar, outVar, idxVar)

    case Label(_, in) => compG(in, g)

    case other => throw new IllegalStateException(
      s"compG: unsupported node $other — graphVarSinglePlan out of sync")
  }

  /** Per-graph MINUS: [[AGV]] scopes the anti-join to the same graph but
   * is NOT a query-shared var — the ≥1-both-bound-shared-var rule
   * (OpExecutor.java:267–277) applies to the DATA vars only, so two
   * patterns sharing no query variables still remove nothing. */
  private def minusJoinG(l: Compiled, r: Compiled): Compiled = {
    val shared = (l.vars.intersect(r.vars) - AGV).toSeq.sorted
    if (shared.isEmpty) return l
    val rr = renamedRight(r)
    val mv = maybeShared(l, r, shared)
    val agvEq = col(AGV) === col(RP + AGV)
    if (mv.isEmpty) {
      val cond = shared.map(v => col(v) === col(RP + v)).reduce(_ && _) && agvEq
      Compiled(l.df.join(rr, cond, "left_anti"), l.certain, l.maybe)
    } else if (mv.size <= MaxDecomposedVars) {
      val lid = tagged(l.df)
      val certainKeys = shared.filterNot(mv.contains)
      val matchedIds = compatMatches(lid, rr, l.certain, r.certain,
        certainKeys, mv, requireBothBound = true, extraKeys = Seq(AGV))
        .select(col(LID)).distinct()
      Compiled(lid.join(matchedIds, Seq(LID), "left_anti").drop(LID),
        l.certain, l.maybe)
    } else {
      val compat = shared.map { v =>
        (col(v) <=> col(RP + v)) || col(v).isNull || col(RP + v).isNull
      }.reduce(_ && _)
      val anyBothBound = shared.map { v =>
        col(v).isNotNull && col(RP + v).isNotNull
      }.reduce(_ || _)
      Compiled(l.df.join(rr, compat && anyBothBound && agvEq, "left_anti"),
        l.certain, l.maybe)
    }
  }

  /** Bind a (g, src, dst) pair frame against a path pattern's s/o slots,
   * keeping the graph column as [[AGV]] — the per-graph twin of
   * [[bindPair]] (same bag semantics). */
  private def bindPairG(pairs: DataFrame, s: TermPat, o: TermPat): Compiled = {
    var df = pairs
    s match {
      case TConst(t) => df = df.filter(col("src") === TermCols.const(t))
      case _ =>
    }
    o match {
      case TConst(t) => df = df.filter(col("dst") === TermCols.const(t))
      case _ =>
    }
    val ag = col("g").as(AGV)
    (s, o) match {
      case (TVar(a), TVar(b)) if a == b =>
        Compiled(df.filter(col("src") === col("dst"))
            .select(ag, col("src").as(a)), Set(AGV, a), Set.empty)
      case (TVar(a), TVar(b)) =>
        Compiled(df.select(ag, col("src").as(a), col("dst").as(b)),
          Set(AGV, a, b), Set.empty)
      case (TVar(a), _) =>
        Compiled(df.select(ag, col("src").as(a)), Set(AGV, a), Set.empty)
      case (_, TVar(b)) =>
        Compiled(df.select(ag, col("dst").as(b)), Set(AGV, b), Set.empty)
      case _ =>
        // both const: per-graph existence gate — one row per graph where
        // the pair holds (the per-graph twin of bindPair's limit(1))
        Compiled(df.select(ag).distinct(), Set(AGV), Set.empty)
    }
  }

  /** SPARQL bag union with unbound padding for one-sided vars. */
  private def unionPad(cl: Compiled, cr: Compiled): Compiled = {
    val all = (cl.vars ++ cr.vars).toSeq.sorted
    def pad(c: Compiled) = c.df.select(
      all.map(v => if (c.vars(v)) col(v) else lit(null).cast(TermCols.schema).as(v)): _*)
    Compiled(pad(cl).union(pad(cr)),
      cl.certain.intersect(cr.certain),
      (cl.vars ++ cr.vars) -- cl.certain.intersect(cr.certain))
  }

  // ---- triple-pattern scan (Graph.find, the 8 MatchPattern shapes —
  //      PatternClassifier.java:51; constants become pushable predicates)
  private[algebra] def scan(g: DataFrame, tp: TriplePattern,
                            extraSlots: Seq[(String, TermPat)] = Nil): Compiled = {
    var df = g
    val slots = extraSlots ++ Seq(("s", tp.s), ("p", tp.p), ("o", tp.o))
    slots.foreach {
      case (c, TConst(t)) => df = df.filter(col(c) === TermCols.const(t))
      case _ =>
    }
    // repeated variable inside one pattern ⇒ equality constraint
    val byVar = slots.collect { case (c, TVar(n)) => (n, c) }.groupBy(_._1)
    byVar.values.filter(_.size > 1).foreach { occ =>
      occ.map(_._2).sliding(2).foreach {
        case Seq(a, b) => df = df.filter(col(a) === col(b))
        case _ =>
      }
    }
    val out = byVar.map { case (n, occ) => col(occ.head._2).as(n) }.toSeq
    val names = byVar.keySet
    Compiled(if (out.isEmpty) df.select(lit(1).as("__unit")) else df.select(out: _*),
      if (out.isEmpty) Set.empty else names, Set.empty)
  }

  /** Can seeding ever apply to this path pattern in a join context? —
   * closure-bearing path with at least one variable endpoint (constant
   * endpoints are already seeded by [[compPath]] itself). */
  private def seedablePath(pp: PathPattern): Boolean =
    PathEval.containsClosure(pp.path) &&
      (pp.s.isInstanceOf[TVar] || pp.o.isInstanceOf[TVar])

  /** Compile one path pattern. For closure-bearing paths with a bound
   * endpoint — a CONSTANT subject/object, or (when `leftSeeds` carries the
   * join partner's compilation) a variable endpoint the partner binds
   * certainly — evaluation is SEEDED: the closure frontier starts from the
   * bound node set and walks only the reachable cone (the ALP algorithm,
   * PathEngine.java:49–122), instead of materializing the global closure
   * and post-filtering. Non-closure paths keep the global plan: Catalyst
   * pushes endpoint filters through scan/join chains by itself; only the
   * iterative loop (a localCheckpoint pushdown barrier) needs help. */
  private def compPath(g: GraphSource, s: TermPat, path: Path, o: TermPat,
                       leftSeeds: Option[Compiled]): Compiled = {
    def seedDfFor(p: TermPat): Option[DataFrame] = p match {
      case TVar(v) => leftSeeds.filter(_.certain(v))
        .map(_.df.select(col(v).as("n")))
      case _ => None
    }
    // escape hatch (and the honest A/B lever for the seeded-vs-global
    // closure benchmark): graft.pathSeededEval=off forces the pre-r5
    // global-closure-then-filter plan
    val seedOn = g.spark.conf
      .getOption("graft.pathSeededEval").forall(_ != "off")
    var pairs: DataFrame =
      if (!PathEval.containsClosure(path) || !seedOn) PathEval.pairs(g, path)
      else (s, o) match {
        case (TConst(t), _) => PathEval.pairsFromConst(g, path, t)
        case (_, TConst(t)) => PathEval.pairsFromConst(g, PathEval.inverse(path), t)
          .select(col("dst").as("src"), col("src").as("dst"))
        case _ => seedDfFor(s) match {
          case Some(sd) => PathEval.pairsFromSeeds(g, path, sd)
          case None => seedDfFor(o) match {
            case Some(sd) => PathEval.pairsFromSeeds(g, PathEval.inverse(path), sd)
              .select(col("dst").as("src"), col("src").as("dst"))
            case None => PathEval.pairs(g, path)
          }
        }
      }
    // A zero-length-matching path with a CONSTANT endpoint matches that
    // constant against itself even when the term is absent from the
    // graph ({ ?s :p* :o } on the empty graph binds ?s = :o — SPARQL
    // 18.4 ZeroLengthPath over the evaluation's term universe; the W3C
    // empty-dataset cases pin this).
    if (PathEval.allowsZero(path)) {
      val consts = Seq(s, o).collect { case TConst(t) => t }.distinct
      consts.foreach { t =>
        pairs = pairs.union(g.spark.range(1)
          .select(TermCols.const(t).as("src"), TermCols.const(t).as("dst")))
      }
      if (consts.nonEmpty) pairs = pairs.distinct()
    }
    bindPair(pairs, s, o)
  }

  /** Bind a (src, dst) pair table against the s/o slots of a path pattern. */
  private def bindPair(pairs: DataFrame, s: TermPat, o: TermPat): Compiled = {
    var df = pairs
    s match {
      case TConst(t) => df = df.filter(col("src") === TermCols.const(t))
      case _ =>
    }
    o match {
      case TConst(t) => df = df.filter(col("dst") === TermCols.const(t))
      case _ =>
    }
    // bag semantics here; arbitrary-length paths are already distinct at
    // the pairs() level (the ALP visited-set contract), fixed-shape paths
    // keep duplicates like their BGP flattening would.
    (s, o) match {
      case (TVar(a), TVar(b)) if a == b =>
        Compiled(df.filter(col("src") === col("dst")).select(col("src").as(a)),
          Set(a), Set.empty)
      case (TVar(a), TVar(b)) =>
        Compiled(df.select(col("src").as(a), col("dst").as(b)), Set(a, b), Set.empty)
      case (TVar(a), _) => Compiled(df.select(col("src").as(a)), Set(a), Set.empty)
      case (_, TVar(b)) => Compiled(df.select(col("dst").as(b)), Set(b), Set.empty)
      case _ => Compiled(df.select(lit(1).as("__unit")).limit(1), Set.empty, Set.empty)
    }
  }

  // ---- join machinery (SURVEY.md §2.3)

  private val RP = "__r__" // right-side disambiguation prefix
  private val LID = "__lid" // per-left-row tag for decomposed outer/semi joins

  /** Tag each left row with a unique id AND pin the assignment with an
   * eager localCheckpoint: the tagged frame is consumed by several plan
   * branches (each compatMatches case + the anti-join/window recovery),
   * and `monotonically_increasing_id` is partition-order-dependent — a
   * task retry or AQE re-plan between the two consumers could otherwise
   * assign DIFFERENT ids to the same row, silently corrupting
   * OPTIONAL/EXISTS/MINUS/LATERAL results. Checkpointing materializes one
   * id assignment that every consumer shares (same device as
   * transitiveClosure's per-round checkpoint). */
  private def tagged(ldf: DataFrame): DataFrame = taggedAs(ldf, LID)

  /** [[tagged]] with a caller-chosen column name — nested LATERAL scopes
   * each need their own live tag column. */
  private def taggedAs(ldf: DataFrame, name: String): DataFrame =
    ldf.withColumn(name, monotonically_increasing_id()).localCheckpoint(true)

  private def renamedRight(r: Compiled): DataFrame =
    r.df.columns.foldLeft(r.df)((d, c) => d.withColumnRenamed(c, RP + c))

  /** Per-shared-var join condition: exact equi when both certain, SPARQL
   * compatible-binding otherwise. */
  private def sharedCond(l: Compiled, r: Compiled): (Seq[String], Column) = {
    val shared = (l.vars.intersect(r.vars)).toSeq.sorted
    val conds = shared.map { v =>
      if (l.certain(v) && r.certain(v)) col(v) === col(RP + v)
      else (col(v) <=> col(RP + v)) || col(v).isNull || col(RP + v).isNull
    }
    (shared, conds.foldLeft(lit(true))(_ && _))
  }

  private def mergedSelect(l: Compiled, r: Compiled, shared: Seq[String]): Seq[Column] = {
    val lOnly = (l.vars -- shared).toSeq.sorted.map(col)
    val rOnly = (r.vars -- shared).toSeq.sorted.map(v => col(RP + v).as(v))
    val merged = shared.map(v => coalesce(col(v), col(RP + v)).as(v))
    lOnly ++ rOnly ++ merged
  }

  /** Shared vars where at least one side may be unbound — the ones whose
   * compatible-binding condition is NOT a plain equality. */
  private def maybeShared(l: Compiled, r: Compiled, shared: Seq[String]): Seq[String] =
    shared.filterNot(v => l.certain(v) && r.certain(v))

  /** Max number of maybe-bound shared vars the union-of-equi-joins
   * decomposition expands (≤3^n branches); beyond it we fall back to the
   * OR-condition (nested-loop) join — a shape no realistic OPTIONAL/UNION
   * query produces. */
  private val MaxDecomposedVars = 2

  /**
   * All compatible (left row, right row) matches as a UNION OF EQUI-JOINS.
   *
   * The naive compile of SPARQL compatibility over a maybe-bound shared
   * var — `l <=> r OR l IS NULL OR r IS NULL` — is a non-equi condition
   * Catalyst can only plan as BroadcastNestedLoopJoin: O(|L|·|R|) at
   * scale. Instead, partition the match space by the vars' null-pattern
   * (per var: 0 = both bound & equal, 1 = left unbound, 2 = left bound /
   * right unbound — disjoint and complete), giving ≤3^n branches that are
   * each a hashable equi-join on (certain keys + the case's both-bound
   * vars). Branches impossible for a certain side are skipped. Unbound-
   * pattern branches join on the certain keys only — inherent, since an
   * unbound var is compatible with everything — but scan only the
   * (typically small) unbound-row slices.
   */
  private def compatMatches(ldf: DataFrame, rdf: DataFrame,
                            lCertain: Set[String], rCertain: Set[String],
                            certainKeys: Seq[String], maybeVars: Seq[String],
                            requireBothBound: Boolean = false,
                            extraKeys: Seq[String] = Nil): DataFrame = {
    val cases0 = maybeVars.foldLeft(Seq(Seq.empty[Int])) { (acc, v) =>
      val ks = Seq(0) ++ (if (!lCertain(v)) Seq(1) else Nil) ++
        (if (!rCertain(v)) Seq(2) else Nil)
      acc.flatMap(c => ks.map(k => c :+ k))
    }
    // MINUS-only restriction: compatibility must hold on ≥1 BOTH-bound
    // shared var (OpExecutor.java:274). Certain keys are always both-bound;
    // when there are none, branches whose every maybe var is unbound on a
    // side (no case-0) cannot witness the requirement — skip them.
    val cases =
      if (requireBothBound && certainKeys.isEmpty) cases0.filter(_.contains(0))
      else cases0
    cases.map { c =>
      var lf = ldf
      var rf = rdf
      // extraKeys (per-graph scoping) join like certain keys but are NOT
      // ≥1-both-bound witnesses — the requireBothBound filter above reads
      // certainKeys only
      var keys = extraKeys ++ certainKeys
      maybeVars.zip(c).foreach { case (v, k) => k match {
        case 0 =>
          lf = lf.filter(col(v).isNotNull); rf = rf.filter(col(RP + v).isNotNull)
          keys = keys :+ v
        case 1 => lf = lf.filter(col(v).isNull)
        case 2 => lf = lf.filter(col(v).isNotNull); rf = rf.filter(col(RP + v).isNull)
      }}
      // a branch with NO equi keys is the unbound-slice × full-side case
      // (an unbound var is compatible with everything). Bounded by the
      // null-slice size, but Catalyst would plan it as BNLJ with a
      // size-estimated broadcast choice that can pick the FULL side; hint
      // the (typically tiny) null-slice side explicitly so the full side
      // streams (VERDICT r2, "What's wrong" #3).
      val cond = keys.map(v => col(v) === col(RP + v)).foldLeft(lit(true))(_ && _)
      if (keys.isEmpty) {
        if (c.contains(1)) broadcast(lf).join(rf, cond, "inner")
        else lf.join(broadcast(rf), cond, "inner")
      } else lf.join(rf, cond, "inner")
    }.reduce(_ union _)
  }

  private def join(l: Compiled, r: Compiled, how: String): Compiled = {
    // note: a side with no vars (fully-concrete pattern) still contributes
    // its cardinality (0 or 1 rows — set semantics) via the cross product,
    // i.e. it acts as an existence gate; mergedSelect drops its __unit col.
    val rr = renamedRight(r)
    val (shared, cond) = sharedCond(l, r)
    val mv = maybeShared(l, r, shared)
    val joined =
      if (mv.nonEmpty && mv.size <= MaxDecomposedVars)
        compatMatches(l.df, rr, l.certain, r.certain,
          shared.filterNot(mv.contains), mv)
      else l.df.join(rr, cond, how)
    Compiled(joined.select(mergedSelect(l, r, shared): _*),
      l.certain ++ r.certain, (l.maybe ++ r.maybe) -- (l.certain ++ r.certain))
  }

  private def leftJoin(l: Compiled, r: Compiled, extra: Option[RowExpr]): Compiled = {
    val rr = renamedRight(r)
    val (shared, compat) = sharedCond(l, r)
    // the embedded condition sees the MERGED row (filter scope of OPTIONAL)
    def mergedResolve(v: String): Column =
      if (shared.contains(v)) coalesce(col(v), col(RP + v))
      else if (l.vars(v)) col(v)
      else if (r.vars(v)) col(RP + v)
      else lit(null).cast(TermCols.schema)
    val mv = maybeShared(l, r, shared)
    val joined =
      if (mv.nonEmpty && mv.size <= MaxDecomposedVars) {
        // decomposed left join: tag left rows, compute all compatible
        // matches via equi-joins, then recover the unmatched left rows by
        // an (equi) anti-join on the tag — no nested-loop anywhere
        val lid = tagged(l.df)
        val matches0 = compatMatches(lid, rr, l.certain, r.certain,
          shared.filterNot(mv.contains), mv)
        val matches = extra match {
          case Some(e) => matches0.filter(e(mergedResolve))
          case None => matches0
        }
        val padded = rr.schema.fields.foldLeft(
          lid.join(matches.select(col(LID)).distinct(), Seq(LID), "left_anti")) {
            (d, f) => d.withColumn(f.name, lit(null).cast(f.dataType))
          }
        matches.unionByName(padded).drop(LID)
      } else {
        val cond = extra.map(e => compat && e(mergedResolve)).getOrElse(compat)
        l.df.join(rr, cond, "left_outer")
      }
    Compiled(joined.select(mergedSelect(l, r, shared): _*),
      l.certain, l.maybe ++ (r.vars -- l.certain))
  }

  /** LATERAL (OpLateral, OpExecutor.java:240; exec QueryIterLateral): the
   * RHS is re-evaluated per left row with the left row's bindings
   * SUBSTITUTED in — filters and BINDs inside the RHS see the left's
   * variables, per-row modifiers (LIMIT/OFFSET, aggregation, DISTINCT,
   * OPTIONAL) apply within each left row's evaluation, and a sub-SELECT
   * re-scopes: only its projected variables correlate (ARQ Lateral +
   * Syntax-Lateral suites). Set-at-a-time compilation [[lat]] threads the
   * left frame down the RHS tree: pattern leaves correlate via
   * compatible-binding joins, per-row-sensitive operators partition by a
   * per-left-row tag (row-stable: [[taggedAs]] checkpoints eagerly). The
   * tag + checkpoint are paid only when [[perRowSensitive]] says the RHS
   * needs them — a plain RHS stays the old single-join plan. */
  private def lateral(l: Compiled, r: Op, g: GraphSource,
                      leaf: (Op, GraphSource) => Compiled = comp): Compiled =
    if (!perRowSensitive(r)) lat(l, r, g, tag = "", leaf)
    else {
      val t = freshTag()
      val lt = Compiled(taggedAs(l.df, t), l.certain + t, l.maybe)
      val out = lat(lt, r, g, t, leaf)
      Compiled(out.df.drop(t), out.certain - t, out.maybe)
    }

  /** Does the body re-access the DATASET (named graphs / dataset names /
   * FROM) rather than only the active graph? Decides whether GraphScope
   * must keep the quad columns when re-scoping (a generic Product walk so
   * new Op nodes are covered by default). SERVICE bodies evaluate against
   * their own endpoint's dataset, so a hit inside one over-triggers
   * harmlessly (the quad columns are merely kept). */
  private def usesDataset(op: Op): Boolean = op match {
    case QuadBgp(_, _) | GraphScope(_, _) | GraphVarEnum(_, _) |
         DatasetNames(_) | DatasetClause(_, _, _) => true
    case p: Product =>
      // walk ANY nested structure (tuples, Options, collections) so an Op
      // child of a future algebra node is found no matter how it is
      // stored — a missed child would silently under-scope GraphScope
      def walk(x: Any): Boolean = x match {
        case o: Op => usesDataset(o)
        case q: Product => q.productIterator.exists(walk)
        case it: Iterable[_] => it.exists(walk)
        case _ => false
      }
      p.productIterator.exists(walk)
  }

  /** Does this RHS shape observe per-left-row evaluation (vs evaluating
   * identically for every left row)? Decides whether [[lateral]] must
   * materialize a per-left-row tag. */
  private def perRowSensitive(op: Op): Boolean = op match {
    case Slice(_, _, _) => true
    case Group(_, _, _) => true
    case Distinct(_) | Reduced(_) => true
    case Lateral(_, _) => true
    case Order(_, in) => perRowSensitive(in)
    case Filter(_, in) => perRowSensitive(in)
    case Extend(_, _, in) => perRowSensitive(in)
    case Project(_, in) => perRowSensitive(in)
    case Label(_, in) => perRowSensitive(in)
    case DropVars(_, in) => perRowSensitive(in)
    case Join(a, b) => perRowSensitive(a) || perRowSensitive(b)
    case LeftJoin(a, b, _) => perRowSensitive(a) || perRowSensitive(b)
    case Union(a, b) => perRowSensitive(a) || perRowSensitive(b)
    case SemiJoin(a, _) => perRowSensitive(a)
    case AntiJoin(a, _) => perRowSensitive(a)
    case Minus(a, _) => perRowSensitive(a)
    case _ => false
  }

  /** Pattern/visible variables of an RHS subtree — the collision guard for
   * sub-SELECT scope renaming in [[lat]]'s Project case. */
  private def opVisibleVars(op: Op): Set[String] = {
    def pv(ps: Seq[TermPat]): Set[String] = ps.collect { case TVar(n) => n }.toSet
    op match {
      case Bgp(ps) => pv(ps.flatMap(tp => Seq(tp.s, tp.p, tp.o)))
      case PathPattern(s0, _, o0) => pv(Seq(s0, o0))
      case QuadBgp(gp, ps) => pv(Seq(gp) ++ ps.flatMap(tp => Seq(tp.s, tp.p, tp.o)))
      case GraphScope(_, in) => opVisibleVars(in)
      case GraphVarEnum(v, in) => opVisibleVars(in) + v
      case Project(vs, _) => vs.toSet
      case Filter(_, in) => opVisibleVars(in)
      case Extend(v, _, in) => opVisibleVars(in) + v
      case Table(vs, _) => vs.toSet
      case Join(a, b) => opVisibleVars(a) ++ opVisibleVars(b)
      case LeftJoin(a, b, _) => opVisibleVars(a) ++ opVisibleVars(b)
      case SemiJoin(a, _) => opVisibleVars(a)
      case AntiJoin(a, _) => opVisibleVars(a)
      case Minus(a, _) => opVisibleVars(a)
      case ExistsFlag(v, _, in) => opVisibleVars(in) + v
      case DropVars(vs, in) => opVisibleVars(in) -- vs
      case Lateral(a, b) => opVisibleVars(a) ++ opVisibleVars(b)
      case Unfold(_, ov, iv, in) => opVisibleVars(in) + ov ++ iv
      case Group(keys, aggs, _) => keys.toSet ++ aggs.map(_._1)
      case Order(_, in) => opVisibleVars(in)
      case Slice(_, _, in) => opVisibleVars(in)
      case Distinct(in) => opVisibleVars(in)
      case Reduced(in) => opVisibleVars(in)
      case Union(a, b) => opVisibleVars(a) ++ opVisibleVars(b)
      case DatasetNames(gp) => pv(Seq(gp))
      case DatasetClause(_, _, in) => opVisibleVars(in)
      case Label(_, in) => opVisibleVars(in)
      case ExtOp(_, vs, in) => opVisibleVars(in) ++ vs
      case GraphOp(_, vs, in) => opVisibleVars(in) ++ vs
      case _ => Set.empty
    }
  }

  /** Correlated compile of a LATERAL RHS: `l` already holds the left
   * columns (plus the per-left-row `tag` column when the RHS is
   * per-row-sensitive); the result holds left + RHS columns with the
   * substitution semantics applied. */
  private def lat(l: Compiled, r: Op, g: GraphSource, tag: String,
                  leaf: (Op, GraphSource) => Compiled = comp): Compiled = r match {
    case Filter(cond, in) =>
      // RHS filters see the LEFT bindings (lateral-3 "filter scope")
      val c = lat(l, in, g, tag, leaf)
      Compiled(c.df.filter(cond(v => resolve(c, v))), c.certain, c.maybe)
    case Extend(name, expr, in) =>
      val c = lat(l, in, g, tag, leaf)
      require(!c.vars.contains(name), s"Extend onto bound var $name")
      Compiled(c.df.withColumn(name, expr(v => resolve(c, v))),
        c.certain, c.maybe + name)
    case Join(a, b) => lat(lat(l, a, g, tag, leaf), b, g, tag)
    case Union(a, b) => unionPad(lat(l, a, g, tag, leaf), lat(l, b, g, tag, leaf))
    case Distinct(in) =>
      // per-left-row dedup: the tag keeps duplicate left rows distinct
      val c = lat(l, in, g, tag, leaf)
      Compiled(c.df.dropDuplicates(), c.certain, c.maybe)
    case Reduced(in) => lat(l, Distinct(in), g, tag, leaf)
    case Order(_, in) =>
      // ordering without a slice has no observable effect on the multiset
      lat(l, in, g, tag, leaf)
    case Label(_, in) => lat(l, in, g, tag, leaf)
    case DropVars(vs, in) =>
      val c = lat(l, in, g, tag, leaf)
      Compiled(c.df.drop(vs: _*), c.certain -- vs, c.maybe -- vs)
    case LeftJoin(a, b, cond) =>
      // per-row OPTIONAL (optional-in-lateral): left' rows unmatched by
      // the correlated RHS survive with unbound RHS vars. Fresh tag —
      // left' may have multiplied the original left rows.
      val l2 = lat(l, a, g, tag, leaf)
      val t2 = freshTag()
      val lt2 = Compiled(taggedAs(l2.df, t2), l2.certain + t2, l2.maybe)
      val m0 = lat(lt2, b, g, t2, leaf)
      val matched = cond match {
        case Some(e) => Compiled(m0.df.filter(e(v => resolve(m0, v))), m0.certain, m0.maybe)
        case None => m0
      }
      val rhsVars = (matched.vars -- lt2.vars).toSeq.sorted
      val unmatched0 = lt2.df.join(
        matched.df.select(col(t2)).distinct(), Seq(t2), "left_anti")
      val padded = rhsVars.foldLeft(unmatched0)((d, v) =>
        d.withColumn(v, lit(null).cast(TermCols.schema)))
      val out = matched.df.unionByName(
        padded.select(matched.df.columns.map(col): _*)).drop(t2)
      Compiled(out, l2.certain, l2.maybe ++ rhsVars)
    case SemiJoin(a, b) => halfJoin(lat(l, a, g, tag, leaf), leaf(b, g), "left_semi")
    case AntiJoin(a, b) => halfJoin(lat(l, a, g, tag, leaf), leaf(b, g), "left_anti")
    case Minus(a, b) => minusJoin(lat(l, a, g, tag, leaf), leaf(b, g))
    case Slice(offset, limit, inner) =>
      // per-left-row LIMIT/OFFSET: row_number window over the tag
      require(offset <= Int.MaxValue && (limit == Long.MaxValue || limit <= Int.MaxValue),
        s"LATERAL slice ($offset, $limit) exceeds supported range")
      require(tag.nonEmpty, "internal: per-row slice without a lateral tag")
      // the parser's modifier nesting is slice(project(order(…))) — peel
      // both wrappers so the window sees the sort keys; the projection is
      // re-applied after the window (ORDER BY may reference vars the
      // SELECT clause then drops)
      val (body, sortKeys, projOpt) = inner match {
        case Order(ks, i2) => (i2, ks, None)
        case Project(vs, Order(ks, i2)) => (i2, ks, Some(vs))
        case Project(vs, i2) => (i2, Nil, Some(vs))
        case other => (other, Seq.empty[SortKey], None)
      }
      projOpt.foreach { vs =>
        val hidden = (opVisibleVars(body) -- vs).intersect(l.vars - tag)
        require(hidden.isEmpty,
          s"LATERAL sub-SELECT hides variable(s) ${hidden.mkString(", ")} that " +
            "collide with left-side bindings while using LIMIT/OFFSET — " +
            "rename the inner variables (scope rename is not implemented here)")
      }
      val joined = lat(l, body, g, tag, leaf)
      import org.apache.spark.sql.expressions.Window
      val orderCols =
        if (sortKeys.isEmpty) Seq(lit(1).asc)
        else sortKeys.map { k =>
          val sk = TermCols.sortKey(resolve(joined, k.v))
          if (k.ascending) sk.asc else sk.desc
        }
      val w = Window.partitionBy(col(tag)).orderBy(orderCols: _*)
      val keep =
        if (limit == Long.MaxValue) col("__rn") > offset
        else col("__rn") > offset && col("__rn") <= offset + limit
      val limited = joined.df.withColumn("__rn", row_number().over(w)).where(keep)
        .drop("__rn")
      projOpt match {
        case Some(vs) =>
          val keepCols = (l.vars ++ vs.filter(joined.vars)).toSeq.sorted
          Compiled(limited.select(keepCols.map(col): _*),
            l.certain ++ vs.toSet.intersect(joined.certain),
            (keepCols.toSet -- l.certain) -- vs.toSet.intersect(joined.certain))
        case None => Compiled(limited, joined.certain, joined.maybe)
      }
    case Group(keys, aggs, in) =>
      // per-left-row aggregation: group by (left cols + keys); with no
      // keys every left row yields exactly one row — unmatched left rows
      // get the aggregate-over-empty values (COUNT=0 etc.), obtained from
      // one global empty-frame aggregation.
      require(tag.nonEmpty, "internal: per-row group without a lateral tag")
      val c = lat(l, in, g, tag, leaf)
      require(aggs.nonEmpty, "LATERAL grouped subquery without aggregates")
      def res(v: String): Column =
        if (v == "*") struct(c.df.columns.map(col): _*) else resolve(c, v)
      val aggCols = aggs.map { case (name, e) => e(res).as(name) }
      val lCols = l.vars.toSeq.sorted
      val grouped = c.df.groupBy((lCols ++ keys).map(col): _*)
        .agg(aggCols.head, aggCols.tail: _*)
      val out =
        if (keys.nonEmpty) grouped
        else {
          val emptyVals = c.df.where(lit(false)).agg(aggCols.head, aggCols.tail: _*)
          val missing = l.df.select(lCols.map(col): _*)
            .join(grouped.select(col(tag)).distinct(), Seq(tag), "left_anti")
            .crossJoin(emptyVals)
          grouped.unionByName(missing.select(grouped.columns.map(col): _*))
        }
      Compiled(out, l.certain ++ keys.filter(c.certain), // agg outputs may be null
        aggs.map(_._1).toSet ++ (l.maybe ++ keys.filterNot(c.certain)))
    case Project(vs, inner) =>
      // sub-SELECT: only the PROJECTED vars stay in scope — hidden inner
      // vars are fresh (lateral-5 "different scope"). An uncorrelated
      // subquery (no projected var bound on the left) evaluates once,
      // globally — including its LIMIT (lateral-in-optional).
      val corr = vs.toSet.intersect(l.vars -- Set(tag))
      if (!perRowSensitive(inner) || corr.isEmpty)
        join(l, leaf(Project(vs, inner), g), "inner")
      else {
        val hidden = (opVisibleVars(inner) -- vs).intersect(l.vars - tag)
        require(hidden.isEmpty,
          s"LATERAL sub-SELECT hides variable(s) ${hidden.mkString(", ")} that " +
            "collide with left-side bindings while using per-row modifiers — " +
            "rename the inner variables (scope rename is not implemented here)")
        val c = lat(l, inner, g, tag, leaf)
        val keep = (l.vars ++ vs.filter(c.vars)).toSeq.sorted
        Compiled(c.df.select(keep.map(col): _*),
          l.certain ++ vs.toSet.intersect(c.certain),
          (keep.toSet -- l.certain) -- vs.toSet.intersect(c.certain))
      }
    case _ =>
      // pattern leaves & everything shape-insensitive: the correlated
      // re-execution IS the compatible-binding join (SURVEY §2.3). In
      // GRAPH ?var single-plan mode `leaf` is [[compG]]: every leaf binds
      // the hidden active-graph column, so the compatible-binding join
      // keys on it and the correlated evaluation stays graph-scoped.
      join(l, leaf(r, g), "inner")
  }

  private val tagCtr = new java.util.concurrent.atomic.AtomicLong()
  private def freshTag(): String = "__lt" + tagCtr.incrementAndGet()

  private def halfJoin(l: Compiled, r: Compiled, how: String): Compiled = {
    val rr = renamedRight(r)
    val (shared, cond) = sharedCond(l, r)
    val mv = maybeShared(l, r, shared)
    val df =
      if (mv.nonEmpty && mv.size <= MaxDecomposedVars) {
        // decomposed EXISTS / NOT EXISTS: matched left-row ids from the
        // union of equi-joins, then an equi semi/anti join on the tag
        val lid = tagged(l.df)
        val matchedIds = compatMatches(lid, rr, l.certain, r.certain,
          shared.filterNot(mv.contains), mv).select(col(LID)).distinct()
        lid.join(matchedIds, Seq(LID), how).drop(LID)
      } else l.df.join(rr, cond, how)
    Compiled(df, l.certain, l.maybe)
  }

  /** MINUS: remove left rows having a compatible right row with ≥1 shared
   * variable bound on BOTH sides; with no shared vars nothing is removed
   * (OpExecutor.java:267–277).
   *
   * Plan shapes, best-first (VERDICT r2 "What's wrong" #1): when every
   * shared var is certain on both sides the condition collapses to plain
   * equality and ≥1-both-bound holds trivially — a hashable equi
   * `left_anti`. With few maybe-bound shared vars, reuse the halfJoin
   * LID decomposition (union of equi-joins restricted to branches that
   * witness a both-bound var). Only the >MaxDecomposedVars tail — a shape
   * no realistic query produces — falls back to the OR-condition
   * nested-loop join. */
  private def minusJoin(l: Compiled, r: Compiled): Compiled = {
    val shared = l.vars.intersect(r.vars).toSeq.sorted
    if (shared.isEmpty) return l
    val rr = renamedRight(r)
    val mv = maybeShared(l, r, shared)
    if (mv.isEmpty) {
      val cond = shared.map(v => col(v) === col(RP + v)).reduce(_ && _)
      Compiled(l.df.join(rr, cond, "left_anti"), l.certain, l.maybe)
    } else if (mv.size <= MaxDecomposedVars) {
      val lid = tagged(l.df)
      val certainKeys = shared.filterNot(mv.contains)
      val matchedIds = compatMatches(lid, rr, l.certain, r.certain,
        certainKeys, mv, requireBothBound = true)
        .select(col(LID)).distinct()
      Compiled(lid.join(matchedIds, Seq(LID), "left_anti").drop(LID),
        l.certain, l.maybe)
    } else {
      val compat = shared.map { v =>
        (col(v) <=> col(RP + v)) || col(v).isNull || col(RP + v).isNull
      }.reduce(_ && _)
      val anyBothBound = shared.map { v =>
        col(v).isNotNull && col(RP + v).isNotNull
      }.reduce(_ || _)
      Compiled(l.df.join(rr, compat && anyBothBound, "left_anti"), l.certain, l.maybe)
    }
  }

  private def valuesTable(spark: SparkSession, vars: Seq[String],
                          rows: Seq[Map[String, Term]]): Compiled = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.StructType
    import scala.jdk.CollectionConverters._
    val schema = StructType(vars.map(v =>
      org.apache.spark.sql.types.StructField(v, TermCols.schema, nullable = true)))
    val data = rows.map(m => Row(vars.map(v =>
      m.get(v).map(t => Row(t.kind, t.lex, t.dt, t.lang)).orNull): _*))
    // LocalRelation (not an RDD): VALUES data is query-literal-sized, and
    // a local relation lets Catalyst fold/broadcast it — and lets the
    // property-function bind recognize the 1-row unit table statically
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](data.asJava), schema)
    val certain = vars.filter(v => rows.forall(_.contains(v))).toSet
    Compiled(df, certain, vars.toSet -- certain)
  }
}

/**
 * Property-path evaluation over the triple DataFrame — set-at-a-time
 * replacement for the reference's per-binding ALP BFS
 * (PathEngine.java:96–129). Closure operators reuse the semi-naive
 * frontier-delta loop (graft.ops.Graphs), whose per-round work is
 * proportional to the new-pairs delta and whose lineage is truncated by
 * localCheckpoint — the property the north rule's CC pass also relies on.
 */
object PathEval {

  import Compiler.{GraphSource, SnapshotGraph}

  /** Can `path` match with zero steps? (Drives the constant-endpoint
   * zero-length augmentation in the PathPattern compile.) */
  def allowsZero(p: Path): Boolean = p match {
    case PZeroOrMore(_) | PZeroOrOne(_) => true
    case PMod(_, min, _) => min == 0
    case PAlt(a, b) => allowsZero(a) || allowsZero(b)
    case PSeq(a, b) => allowsZero(a) && allowsZero(b)
    case PInverse(q) => allowsZero(q)
    case PDistinct(q) => allowsZero(q)
    case PMulti(q) => allowsZero(q)
    case _ => false
  }

  /** Structural inverse: a path `r` with pairs(r) = swap(pairs(p)),
   * inversion pushed to the leaves (PathFactory.pathInverse / the ARQ
   * inverse transform) — lets a bound OBJECT seed a forward walk. */
  def inverse(p: Path): Path = p match {
    case PLink(i) => PInverse(PLink(i))
    case PInverse(q) => q
    case PSeq(a, b) => PSeq(inverse(b), inverse(a))
    case PAlt(a, b) => PAlt(inverse(a), inverse(b))
    // NPS(fwd) ∪ ^NPS(inv) swapped = ^NPS(fwd) ∪ NPS(inv)
    case PNegPropSet(fwd, inv) => PNegPropSet(inv, fwd)
    case POneOrMore(q) => POneOrMore(inverse(q))
    case PZeroOrMore(q) => PZeroOrMore(inverse(q))
    case PZeroOrOne(q) => PZeroOrOne(inverse(q))
    case PFixedLength(q, n) => PFixedLength(inverse(q), n)
    case PMod(q, mn, mx) => PMod(inverse(q), mn, mx)
    case PDistinct(q) => PDistinct(inverse(q))
    case PMulti(q) => PMulti(inverse(q))
    case PShortest(q) => PShortest(inverse(q))
  }

  /** Does evaluating `p` run an iterative closure loop? Those are the
   * shapes where a bound endpoint can't reach the loop through Catalyst
   * filter pushdown (each round's localCheckpoint is a pushdown barrier),
   * so seeding must happen at evaluation time. Everything else — scans,
   * join chains, unions — gets endpoint constants pushed into the leaf
   * scans by the optimizer already. */
  def containsClosure(p: Path): Boolean = p match {
    case POneOrMore(_) | PZeroOrMore(_) => true
    case PMod(q, _, max) => max < 0 || containsClosure(q)
    case PSeq(a, b) => containsClosure(a) || containsClosure(b)
    case PAlt(a, b) => containsClosure(a) || containsClosure(b)
    case PInverse(q) => containsClosure(q)
    case PDistinct(q) => containsClosure(q)
    case PMulti(q) => containsClosure(q)
    case PZeroOrOne(q) => containsClosure(q)
    case PFixedLength(q, _) => containsClosure(q)
    case _ => false
  }

  /** The ACTIVE graph's triples: paths evaluate in the active graph
   * exactly like BGPs, so on a quad table only default-graph rows (and no
   * empty-graph marker rows) participate — without this filter a
   * top-level path would traverse NAMED-graph edges (caught by the quad
   * differential gate). Shares the Bgp scan's definition. */
  private def activeTriples(g: GraphSource): DataFrame =
    Compiler.defaultGraphTriples(g.df)

  /** All (src, dst) term pairs connected by `path`. Over a store snapshot,
   * a plain link scans the POS layout with the predicate pushed down (the
   * hot case — every closure's per-round probe); composite paths fall back
   * to the struct view. Over an ID-ENCODED snapshot, id-expressible paths
   * evaluate entirely on LONG columns ([[pairsId]]) — closure joins move
   * 16-byte rows, the dictionary joins in exactly once per endpoint at
   * the projection edge. */
  def pairs(g: GraphSource, path: Path): DataFrame = g match {
    case esg: Compiler.EncodedSnapshotGraph if idExpressible(path) =>
      decodeIdPairs(esg, pairsId(esg, path))
    case _ => pairs0(g, path)
  }

  // ---- seeded (bound-endpoint) evaluation — the ALP analog ------------
  //
  // Jena's path engine never closes the whole relation when an endpoint
  // is known: ALP seeds a BFS at the bound node and visits its cone
  // (path/eval/PathEngine.java:49–122, PathEngineSPARQL.java:36). The
  // distributed analog: the SAME frontier-delta loop as the global
  // closure, with the first frontier = the seed set's out-edges instead
  // of every edge (Graphs.reachableFrom). Results equal
  // pairs(g, path) restricted to src ∈ seeds, bag semantics per shape.

  /** Seeded pairs for one CONSTANT endpoint term (seed the inverse path
   * and swap for a bound object). Over an encoded snapshot the walk stays
   * in id space: one driver dictionary probe for the seed, closure joins
   * on LONGs, decode at the projection edge. */
  def pairsFromConst(g: GraphSource, path: Path, t: graft.model.Term): DataFrame =
    g match {
      case esg: Compiler.EncodedSnapshotGraph if idExpressible(path) =>
        val seedIds = esg.idsOf(Seq(t)).get(t) match {
          case Some(id) => esg.spark.range(1).select(lit(id).as("n"))
          case None => esg.spark.range(0).select(col("id").as("n"))
        }
        decodeIdPairs(esg, pairsIdFrom(esg, path, seedIds))
      case _ =>
        pairsFrom0(g, path,
          g.spark.range(1).select(TermCols.const(t).as("n")))
    }

  /** Seeded pairs for a join-bound endpoint: `seeds` is a one-column frame
   * of term structs (the join partner's certain values for the endpoint
   * var). Over an encoded snapshot the seeds encode through one dictionary
   * join, then the walk stays in id space. */
  def pairsFromSeeds(g: GraphSource, path: Path, seeds: DataFrame): DataFrame =
    g match {
      case esg: Compiler.EncodedSnapshotGraph if idExpressible(path) =>
        val sd = seeds.toDF("n").distinct()
        val idSeeds = sd.join(esg.terms,
            col("n.kind") === col("kind") && col("n.lex") === col("lex") &&
              col("n.dt") === col("dt") && col("n.lang") === col("lang"))
          .select(col("id").as("n"))
        decodeIdPairs(esg, pairsIdFrom(esg, path, idSeeds))
      case _ => pairsFrom0(g, path, seeds)
    }

  /** Identity pairs over seeds ∩ graph nodes (the restricted zero-length
   * set: global allNodes ∩ src∈seeds). */
  private def seedIdentity(nodes: DataFrame, seeds: DataFrame): DataFrame =
    nodes.join(seeds.toDF("n").distinct(), col("src") === col("n"), "left_semi")

  private def pairsFrom0(g: GraphSource, path: Path, seeds0: DataFrame): DataFrame = {
    val seeds = seeds0.toDF("n").distinct()
    path match {
      // leaves: a single scan — restrict src by a semi-join against the
      // (small, broadcastable) seed frame; Catalyst keeps the predicate
      // pushdown of the underlying scan
      case PLink(_) | PNegPropSet(_, _) | PInverse(PLink(_)) =>
        pairs(g, path).join(seeds, col("src") === col("n"), "left_semi")
      case PInverse(q) => pairsFrom0(g, inverse(q), seeds)
      case PSeq(a, b) =>
        val l = pairsFrom0(g, a, seeds)
        val r = pairsFrom0(g, b, l.select(col("dst").as("n")))
        l.select(col("src"), col("dst").as("__mid"))
          .join(r.select(col("src").as("__mid2"), col("dst")),
            col("__mid") === col("__mid2"))
          .select(col("src"), col("dst"))
      case PAlt(a, b) =>
        pairsFrom0(g, a, seeds).union(pairsFrom0(g, b, seeds))
      case POneOrMore(q) =>
        // inner pairs stay global (they ARE the edge relation the cone
        // walks); the closure itself is seeded. Select by NAME first:
        // reachableFrom renames positionally and scan output order is
        // not guaranteed (same guard as the global closure callers).
        Graphs.reachableFrom(pairs(g, q).select(col("src"), col("dst")), seeds)
      case PZeroOrMore(q) =>
        Graphs.reachableFrom(pairs(g, q).select(col("src"), col("dst")), seeds)
          .union(seedIdentity(allNodes(g), seeds)).distinct()
      case PZeroOrOne(q) =>
        pairsFrom0(g, q, seeds)
          .union(seedIdentity(allNodes(g), seeds)).distinct()
      case PFixedLength(q, n) =>
        require(n >= 1, "PFixedLength n must be >= 1")
        var acc = pairsFrom0(g, q, seeds)
        for (_ <- 2 to n) {
          val nxt = pairsFrom0(g, q, acc.select(col("dst").as("n")))
          acc = acc.select(col("src"), col("dst").as("__m"))
            .join(nxt.select(col("src").as("__m2"), col("dst")),
              col("__m") === col("__m2"))
            .select(col("src"), col("dst"))
        }
        acc
      case PMod(q, min, max) =>
        require(min >= 0 && (max < 0 || max >= min), s"bad path mod {$min,$max}")
        if (max < 0) {
          val head =
            if (min == 0) seedIdentity(allNodes(g), seeds)
            else pairsFrom0(g, PFixedLength(q, min), seeds)
          val star = pairsFrom0(g, PZeroOrMore(q), head.select(col("dst").as("n")))
          head.select(col("src"), col("dst").as("__m"))
            .join(star.select(col("src").as("__m2"), col("dst")),
              col("__m") === col("__m2"))
            .select(col("src"), col("dst")).distinct()
        } else {
          val parts = (math.max(min, 1) to max)
            .map(k => pairsFrom0(g, PFixedLength(q, k), seeds))
          val fixed =
            if (parts.isEmpty) seedIdentity(allNodes(g), seeds)
            else parts.reduce(_ union _)
          val withZero =
            if (min == 0) fixed.union(seedIdentity(allNodes(g), seeds)) else fixed
          withZero.distinct()
        }
      case PDistinct(q) => pairsFrom0(g, q, seeds).distinct()
      case PMulti(q) => pairsFrom0(g, q, seeds)
      case PShortest(q) =>
        throw new UnsupportedOperationException(
          s"P_Shortest is not implemented (matching the reference): $q")
    }
  }

  /** Id-space twin of [[pairsFrom0]] (seeds: one LONG column "n"). */
  private def pairsIdFrom(esg: Compiler.EncodedSnapshotGraph, path: Path,
                          seeds0: DataFrame): DataFrame = {
    val seeds = seeds0.toDF("n").distinct()
    def idIdentity: DataFrame =
      allNodeIds(esg).join(seeds, col("src") === col("n"), "left_semi")
    path match {
      case PLink(_) =>
        pairsId(esg, path).join(seeds, col("src") === col("n"), "left_semi")
      case PInverse(PLink(i)) =>
        pairsId(esg, PInverse(PLink(i)))
          .join(seeds, col("src") === col("n"), "left_semi")
      case PInverse(q) => pairsIdFrom(esg, inverse(q), seeds)
      case PSeq(a, b) =>
        val l = pairsIdFrom(esg, a, seeds)
        val r = pairsIdFrom(esg, b, l.select(col("dst").as("n")))
        l.select(col("src"), col("dst").as("__mid"))
          .join(r.select(col("src").as("__mid2"), col("dst")),
            col("__mid") === col("__mid2"))
          .select(col("src"), col("dst"))
      case PAlt(a, b) =>
        pairsIdFrom(esg, a, seeds).union(pairsIdFrom(esg, b, seeds))
      case POneOrMore(q) =>
        Graphs.reachableFrom(pairsId(esg, q).select(col("src"), col("dst")), seeds)
      case PZeroOrMore(q) =>
        Graphs.reachableFrom(pairsId(esg, q).select(col("src"), col("dst")), seeds)
          .union(idIdentity).distinct()
      case PZeroOrOne(q) =>
        pairsIdFrom(esg, q, seeds).union(idIdentity).distinct()
      case PFixedLength(q, n) =>
        require(n >= 1, "PFixedLength n must be >= 1")
        var acc = pairsIdFrom(esg, q, seeds)
        for (_ <- 2 to n) {
          val nxt = pairsIdFrom(esg, q, acc.select(col("dst").as("n")))
          acc = acc.select(col("src"), col("dst").as("__m"))
            .join(nxt.select(col("src").as("__m2"), col("dst")),
              col("__m") === col("__m2"))
            .select(col("src"), col("dst"))
        }
        acc
      case PMod(q, min, max) =>
        require(min >= 0 && (max < 0 || max >= min), s"bad path mod {$min,$max}")
        if (max < 0) {
          val head =
            if (min == 0) idIdentity
            else pairsIdFrom(esg, PFixedLength(q, min), seeds)
          val star = pairsIdFrom(esg, PZeroOrMore(q), head.select(col("dst").as("n")))
          head.select(col("src"), col("dst").as("__m"))
            .join(star.select(col("src").as("__m2"), col("dst")),
              col("__m") === col("__m2"))
            .select(col("src"), col("dst")).distinct()
        } else {
          val parts = (math.max(min, 1) to max)
            .map(k => pairsIdFrom(esg, PFixedLength(q, k), seeds))
          val fixed = if (parts.isEmpty) idIdentity else parts.reduce(_ union _)
          val withZero = if (min == 0) fixed.union(idIdentity) else fixed
          withZero.distinct()
        }
      case PDistinct(q) => pairsIdFrom(esg, q, seeds).distinct()
      case PMulti(q) => pairsIdFrom(esg, q, seeds)
      case other => throw new IllegalStateException(
        s"pairsIdFrom: $other is not id-expressible (idExpressible out of sync)")
    }
  }

  /** Paths the id-space evaluator covers. PNegPropSet needs per-predicate
   * KIND checks (a dictionary join per scan) — it keeps the decoded
   * fallback; PShortest raises either way. */
  private def idExpressible(p: Path): Boolean = p match {
    case PLink(_) => true
    case PInverse(q) => idExpressible(q)
    case PSeq(a, b) => idExpressible(a) && idExpressible(b)
    case PAlt(a, b) => idExpressible(a) && idExpressible(b)
    case POneOrMore(q) => idExpressible(q)
    case PZeroOrMore(q) => idExpressible(q)
    case PZeroOrOne(q) => idExpressible(q)
    case PFixedLength(q, _) => idExpressible(q)
    case PMod(q, _, _) => idExpressible(q)
    case PDistinct(q) => idExpressible(q)
    case PMulti(q) => idExpressible(q)
    case _ => false
  }

  /** (src, dst) LONG id pairs connected by `path` over the encoded
   * layouts — the same recursion as [[pairs0]] with joins/closures on
   * 8-byte ids. */
  private[graft] def pairsId(esg: Compiler.EncodedSnapshotGraph,
                             path: Path): DataFrame = path match {
    case PLink(iri) =>
      val ids = esg.idsOf(Seq(graft.model.Term.iri(iri)))
      val scan = esg.idLayout("pos")
      ids.values.headOption match {
        case Some(pid) => scan.where(col("p_id") === pid)
          .select(col("s_id").as("src"), col("o_id").as("dst"))
        case None => scan.limit(0)
          .select(col("s_id").as("src"), col("o_id").as("dst"))
      }
    case PInverse(p) =>
      pairsId(esg, p).select(col("dst").as("src"), col("src").as("dst"))
    case PAlt(a, b) => pairsId(esg, a).union(pairsId(esg, b))
    case PSeq(a, b) =>
      val l = pairsId(esg, a).select(col("src"), col("dst").as("__mid"))
      val r = pairsId(esg, b).select(col("src").as("__mid2"), col("dst"))
      l.join(r, col("__mid") === col("__mid2")).select(col("src"), col("dst"))
    case POneOrMore(p) =>
      Graphs.transitiveClosure(pairsId(esg, p))
    case PZeroOrMore(p) =>
      Graphs.transitiveClosure(pairsId(esg, p)).union(allNodeIds(esg)).distinct()
    case PZeroOrOne(p) =>
      pairsId(esg, p).union(allNodeIds(esg)).distinct()
    case PFixedLength(p, n) =>
      require(n >= 1, "PFixedLength n must be >= 1")
      val base = pairsId(esg, p)
      (2 to n).foldLeft(base) { (acc, _) =>
        acc.select(col("src"), col("dst").as("__m"))
          .join(base.select(col("src").as("__m2"), col("dst")),
            col("__m") === col("__m2"))
          .select(col("src"), col("dst"))
      }
    case PMod(p, min, max) =>
      require(min >= 0 && (max < 0 || max >= min), s"bad path mod {$min,$max}")
      if (max < 0) {
        val head =
          if (min == 0) allNodeIds(esg)
          else pairsId(esg, PFixedLength(p, min))
        val star = pairsId(esg, PZeroOrMore(p))
        head.select(col("src"), col("dst").as("__m"))
          .join(star.select(col("src").as("__m2"), col("dst")),
            col("__m") === col("__m2"))
          .select(col("src"), col("dst")).distinct()
      } else {
        val parts = (math.max(min, 1) to max).map(k => pairsId(esg, PFixedLength(p, k)))
        val fixed =
          if (parts.isEmpty) allNodeIds(esg)
          else parts.reduce(_ union _)
        val withZero = if (min == 0) fixed.union(allNodeIds(esg)) else fixed
        withZero.distinct()
      }
    case PDistinct(p) => pairsId(esg, p).distinct()
    case PMulti(p) => pairsId(esg, p)
    case other => throw new IllegalStateException(
      s"pairsId: $other is not id-expressible (idExpressible out of sync)")
  }

  /** Identity (id, id) pairs over every subject/object id. */
  private def allNodeIds(esg: Compiler.EncodedSnapshotGraph): DataFrame = {
    val spo = esg.idLayout("spo")
    spo.select(col("s_id").as("n")).union(spo.select(col("o_id").as("n")))
      .distinct().select(col("n").as("src"), col("n").as("dst"))
  }

  /** Decode an id-pair frame to term structs: ONE dictionary join per
   * endpoint, at the projection edge (SURVEY §1.6). */
  private def decodeIdPairs(esg: Compiler.EncodedSnapshotGraph,
                            idPairs: DataFrame): DataFrame = {
    def dict(tag: String) = esg.terms.select(col("id").as(s"__id_$tag"),
      struct(col("kind"), col("lex"), col("dt"), col("lang")).as(tag))
    idPairs
      .join(dict("__src_t"), col("src") === col("__id___src_t"))
      .join(dict("__dst_t"), col("dst") === col("__id___dst_t"))
      .select(col("__src_t").as("src"), col("__dst_t").as("dst"))
  }

  private def pairs0(g: GraphSource, path: Path): DataFrame = path match {
    case PLink(iri) => g match {
      case sg: SnapshotGraph =>
        sg.scanPattern(TriplePattern(TVar("src"),
          TConst(graft.model.Term.iri(iri)), TVar("dst"))).df
      case _ =>
        activeTriples(g).filter(TermCols.isIri(col("p")) && TermCols.lex(col("p")) === iri)
          .select(col("s").as("src"), col("o").as("dst"))
    }
    case PNegPropSet(fwd, inv) =>
      // SPARQL 1.1 §9.1 NPS translation: !(p…|^q…) =
      //   NPS(fwd)  ∪  ^NPS(inv) — each direction present only when its
      // member list is (P_NegPropSet.java fwd/bwd split)
      def dirScan(excluded: Seq[String], reversed: Boolean): DataFrame = {
        val base = activeTriples(g).filter(TermCols.isIri(col("p")) &&
          !TermCols.lex(col("p")).isin(excluded: _*))
        if (reversed) base.select(col("o").as("src"), col("s").as("dst"))
        else base.select(col("s").as("src"), col("o").as("dst"))
      }
      (fwd.nonEmpty, inv.nonEmpty) match {
        case (_, false) => dirScan(fwd, reversed = false)
        case (false, true) => dirScan(inv, reversed = true)
        case (true, true) =>
          dirScan(fwd, reversed = false).union(dirScan(inv, reversed = true))
      }
    case PInverse(p) =>
      pairs(g, p).select(col("dst").as("src"), col("src").as("dst"))
    case PAlt(a, b) => pairs(g, a).union(pairs(g, b)) // bag union (SPARQL alt)
    case PSeq(a, b) =>
      // bag semantics — one pair per intermediate node, matching the
      // reference's TransformPathFlatten rewrite of p1/p2 into a BGP
      val l = pairs(g, a).select(col("src"), col("dst").as("__mid"))
      val r = pairs(g, b).select(col("src").as("__mid2"), col("dst"))
      l.join(r, col("__mid") === col("__mid2"))
        .select(col("src"), col("dst"))
    case POneOrMore(p) =>
      Graphs.transitiveClosure(pairs(g, p).select(col("src"), col("dst")))
    case PZeroOrMore(p) =>
      Graphs.transitiveClosure(pairs(g, p).select(col("src"), col("dst")))
        .union(allNodes(g)).distinct()
    case PZeroOrOne(p) =>
      pairs(g, p).union(allNodes(g)).distinct()
    case PFixedLength(p, n) =>
      require(n >= 1, "PFixedLength n must be >= 1")
      val base = pairs(g, p)
      (2 to n).foldLeft(base) { (acc, _) =>
        acc.select(col("src"), col("dst").as("__m"))
          .join(base.select(col("src").as("__m2"), col("dst")), col("__m") === col("__m2"))
          .select(col("src"), col("dst"))
      }
    case PMod(p, min, max) =>
      require(min >= 0 && (max < 0 || max >= min), s"bad path mod {$min,$max}")
      if (max < 0) {
        // p{n,} = p{n} then p* — the closure handles the unbounded tail
        val head =
          if (min == 0) allNodes(g)
          else pairs(g, PFixedLength(p, min))
        val star = pairs(g, PZeroOrMore(p))
        head.select(col("src"), col("dst").as("__m"))
          .join(star.select(col("src").as("__m2"), col("dst")), col("__m") === col("__m2"))
          .select(col("src"), col("dst")).distinct()
      } else {
        // bounded: union of the fixed lengths, distinct pairs (the ALP
        // visited-set contract applies to mod paths in the reference)
        val parts = (math.max(min, 1) to max).map(k => pairs(g, PFixedLength(p, k)))
        val fixed =
          if (parts.isEmpty) allNodes(g)
          else parts.reduce(_ union _)
        val withZero = if (min == 0) fixed.union(allNodes(g)) else fixed
        withZero.distinct()
      }
    // ARQ algebra-level extensions (PathEvaluator.java:142-160):
    case PDistinct(p) => pairs(g, p).distinct()
    case PMulti(p) => pairs(g, p) // bag pass-through; see PMulti scaladoc
    case PShortest(p) =>
      // the reference throws ARQNotImplemented here (PathEvaluator.java:158)
      throw new UnsupportedOperationException(
        s"P_Shortest is not implemented (matching the reference): $p")
  }

  /** Identity pairs over every term occurring as subject or object of the
   * ACTIVE graph — SPARQL's zero-length-path node set. */
  private def allNodes(g: GraphSource): DataFrame = {
    val at = activeTriples(g)
    val n = at.select(col("s").as("n"))
      .union(at.select(col("o").as("n")))
      .filter(col("n").isNotNull).distinct()
    n.select(col("n").as("src"), col("n").as("dst"))
  }

  // ---- graph-threaded variant (single-plan GRAPH ?var) ----------------

  /** All (g, src, dst) pairs connected by `path` WITHIN each named graph
   * of `nq` (a (g, s, p, o) named-quads frame — marker rows tolerated:
   * every case filters on p or s). One plan for ALL graphs: joins key on
   * (g, node), closures pack (g, node) into the closure's node so a walk
   * can never cross graphs — the shape that survives one-graph-per-
   * document scale, where per-graph plan enumeration cannot. */
  def pairsG(nq: DataFrame, path: Path): DataFrame = path match {
    case PLink(iri) =>
      nq.filter(TermCols.isIri(col("p")) && TermCols.lex(col("p")) === iri)
        .select(col("g"), col("s").as("src"), col("o").as("dst"))
    case PNegPropSet(fwd, inv) =>
      def dirScan(excluded: Seq[String], reversed: Boolean): DataFrame = {
        val base = nq.filter(TermCols.isIri(col("p")) &&
          !TermCols.lex(col("p")).isin(excluded: _*))
        if (reversed) base.select(col("g"), col("o").as("src"), col("s").as("dst"))
        else base.select(col("g"), col("s").as("src"), col("o").as("dst"))
      }
      (fwd.nonEmpty, inv.nonEmpty) match {
        case (_, false) => dirScan(fwd, reversed = false)
        case (false, true) => dirScan(inv, reversed = true)
        case (true, true) =>
          dirScan(fwd, reversed = false).union(dirScan(inv, reversed = true))
      }
    case PInverse(p) =>
      pairsG(nq, p).select(col("g"), col("dst").as("src"), col("src").as("dst"))
    case PAlt(a, b) => pairsG(nq, a).union(pairsG(nq, b))
    case PSeq(a, b) =>
      val l = pairsG(nq, a).select(col("g"), col("src"), col("dst").as("__mid"))
      val r = pairsG(nq, b)
        .select(col("g").as("__g2"), col("src").as("__mid2"), col("dst"))
      l.join(r, col("g") === col("__g2") && col("__mid") === col("__mid2"))
        .select(col("g"), col("src"), col("dst"))
    case POneOrMore(p) => closureG(pairsG(nq, p))
    case PZeroOrMore(p) =>
      closureG(pairsG(nq, p)).union(allNodesG(nq)).distinct()
    case PZeroOrOne(p) =>
      pairsG(nq, p).union(allNodesG(nq)).distinct()
    case PFixedLength(p, n) =>
      require(n >= 1, "PFixedLength n must be >= 1")
      val base = pairsG(nq, p)
      (2 to n).foldLeft(base) { (acc, _) =>
        acc.select(col("g"), col("src"), col("dst").as("__m"))
          .join(base.select(col("g").as("__g2"), col("src").as("__m2"), col("dst")),
            col("g") === col("__g2") && col("__m") === col("__m2"))
          .select(col("g"), col("src"), col("dst"))
      }
    case PMod(p, min, max) =>
      require(min >= 0 && (max < 0 || max >= min), s"bad path mod {$min,$max}")
      if (max < 0) {
        val head =
          if (min == 0) allNodesG(nq)
          else pairsG(nq, PFixedLength(p, min))
        val star = pairsG(nq, PZeroOrMore(p))
        head.select(col("g"), col("src"), col("dst").as("__m"))
          .join(star.select(col("g").as("__g2"), col("src").as("__m2"), col("dst")),
            col("g") === col("__g2") && col("__m") === col("__m2"))
          .select(col("g"), col("src"), col("dst")).distinct()
      } else {
        val parts = (math.max(min, 1) to max).map(k => pairsG(nq, PFixedLength(p, k)))
        val fixed =
          if (parts.isEmpty) allNodesG(nq)
          else parts.reduce(_ union _)
        val withZero = if (min == 0) fixed.union(allNodesG(nq)) else fixed
        withZero.distinct()
      }
    case PDistinct(p) => pairsG(nq, p).distinct()
    case PMulti(p) => pairsG(nq, p)
    case PShortest(p) =>
      throw new UnsupportedOperationException(
        s"P_Shortest is not implemented (matching the reference): $p")
  }

  /** Per-graph transitive closure in ONE distributed loop: the graph name
   * rides inside the closure's node — struct(g, n) — so frontier joins
   * can only extend walks within a single graph. */
  private def closureG(edges: DataFrame): DataFrame = {
    val packed = edges.select(
      struct(col("g").as("g"), col("src").as("n")).as("src"),
      struct(col("g").as("g"), col("dst").as("n")).as("dst"))
    Graphs.transitiveClosure(packed)
      .select(col("src.g").as("g"), col("src.n").as("src"), col("dst.n").as("dst"))
  }

  /** Per-graph SEEDED reachability (the GRAPH ?var twin of the ALP
   * seeding): seeds are (g, n) rows; nodes pack as struct(g, n) exactly
   * like [[closureG]], so the frontier walks each graph's cone from its
   * own seeds and never crosses graphs. */
  private def reachableFromG(edges: DataFrame, seeds: DataFrame): DataFrame = {
    val packed = edges.select(
      struct(col("g").as("g"), col("src").as("n")).as("src"),
      struct(col("g").as("g"), col("dst").as("n")).as("dst"))
    val packedSeeds = seeds.toDF("g", "n")
      .select(struct(col("g").as("g"), col("n").as("n")).as("n"))
    Graphs.reachableFrom(packed, packedSeeds)
      .select(col("src.g").as("g"), col("src.n").as("src"), col("dst.n").as("dst"))
  }

  /** Per-graph seeded pairs — [[pairsFrom0]] with the graph name threaded
   * through every join/closure key. `seeds0`: (g, n) rows. Returns the
   * (g, src, dst) rows of [[pairsG]] restricted to src ∈ that graph's
   * seeds, walking only the seeded cones. */
  def pairsGFrom(nq: DataFrame, path: Path, seeds0: DataFrame): DataFrame = {
    val seeds = seeds0.toDF("__sg", "__sn").distinct()
    def restrict(d: DataFrame): DataFrame =
      d.join(seeds, col("g") === col("__sg") && col("src") === col("__sn"),
        "left_semi")
    def identity: DataFrame = restrict(allNodesG(nq))
    def reseed(d: DataFrame): DataFrame =
      d.select(col("g"), col("dst").as("n"))
    path match {
      case PLink(_) | PNegPropSet(_, _) | PInverse(PLink(_)) =>
        restrict(pairsG(nq, path))
      case PInverse(q) => pairsGFrom(nq, inverse(q), seeds)
      case PSeq(a, b) =>
        val l = pairsGFrom(nq, a, seeds)
        val r = pairsGFrom(nq, b, reseed(l))
        l.select(col("g"), col("src"), col("dst").as("__mid"))
          .join(r.select(col("g").as("__g2"), col("src").as("__mid2"), col("dst")),
            col("g") === col("__g2") && col("__mid") === col("__mid2"))
          .select(col("g"), col("src"), col("dst"))
      case PAlt(a, b) =>
        pairsGFrom(nq, a, seeds).union(pairsGFrom(nq, b, seeds))
      case POneOrMore(q) =>
        reachableFromG(pairsG(nq, q).select(col("g"), col("src"), col("dst")),
          seeds)
      case PZeroOrMore(q) =>
        reachableFromG(pairsG(nq, q).select(col("g"), col("src"), col("dst")),
          seeds).union(identity).distinct()
      case PZeroOrOne(q) =>
        pairsGFrom(nq, q, seeds).union(identity).distinct()
      case PFixedLength(q, n) =>
        require(n >= 1, "PFixedLength n must be >= 1")
        var acc = pairsGFrom(nq, q, seeds)
        for (_ <- 2 to n) {
          val nxt = pairsGFrom(nq, q, reseed(acc))
          acc = acc.select(col("g"), col("src"), col("dst").as("__m"))
            .join(nxt.select(col("g").as("__g2"), col("src").as("__m2"), col("dst")),
              col("g") === col("__g2") && col("__m") === col("__m2"))
            .select(col("g"), col("src"), col("dst"))
        }
        acc
      case PMod(q, min, max) =>
        require(min >= 0 && (max < 0 || max >= min), s"bad path mod {$min,$max}")
        if (max < 0) {
          val head =
            if (min == 0) identity
            else pairsGFrom(nq, PFixedLength(q, min), seeds)
          val star = pairsGFrom(nq, PZeroOrMore(q), reseed(head))
          head.select(col("g"), col("src"), col("dst").as("__m"))
            .join(star.select(col("g").as("__g2"), col("src").as("__m2"), col("dst")),
              col("g") === col("__g2") && col("__m") === col("__m2"))
            .select(col("g"), col("src"), col("dst")).distinct()
        } else {
          val parts = (math.max(min, 1) to max)
            .map(k => pairsGFrom(nq, PFixedLength(q, k), seeds))
          val fixed = if (parts.isEmpty) identity else parts.reduce(_ union _)
          val withZero = if (min == 0) fixed.union(identity) else fixed
          withZero.distinct()
        }
      case PDistinct(q) => pairsGFrom(nq, q, seeds).distinct()
      case PMulti(q) => pairsGFrom(nq, q, seeds)
      case PShortest(q) =>
        throw new UnsupportedOperationException(
          s"P_Shortest is not implemented (matching the reference): $q")
    }
  }

  /** Per-graph zero-length node set: (g, n, n) for every term occurring
   * as subject or object in graph g. */
  private def allNodesG(nq: DataFrame): DataFrame = {
    val t = nq.filter(col("s").isNotNull)
    val n = t.select(col("g"), col("s").as("n"))
      .union(t.select(col("g"), col("o").as("n")))
      .filter(col("n").isNotNull).distinct()
    n.select(col("g"), col("n").as("src"), col("n").as("dst"))
  }
}
