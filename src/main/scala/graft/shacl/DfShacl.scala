package graft.shacl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StringType}

import graft.model.{Term, Triple}

/**
 * DataFrame-compiled SHACL — the single-huge-KG face of the validator
 * (reference: jena-shacl/.../validation/ValidationProc.java walks a
 * Graph per focus node; here the "walk" is columnar set-at-a-time).
 *
 * Division of labor with [[Validator]]:
 *  - `Validator` is the COMPLETE core engine, pure per (shapes, data)
 *    pair — the right tool when the corpus is millions of document-sized
 *    KGs (run it inside mapPartitions; shapes broadcast).
 *  - `DfShacl` compiles the FLAT, high-volume constraint subset of a
 *    shapes graph onto DataFrame operators for one KG too big for any
 *    driver: each property shape becomes pruned scans of the triple
 *    table (filter on `p.lex` — a POS-layout range read in the store),
 *    one equi-join focus⨝values on the subject, per-value violations as
 *    codegen'd filters, and cardinality as a groupBy on the same key.
 *    Everything shuffles on the subject column only.
 *
 * Supported components (the flat subset): targetClass / targetNode /
 * targetSubjectsOf / targetObjectsOf; sh:path a predicate IRI or its
 * inverse; class, datatype, nodeKind, minCount, maxCount, min/max
 * Exclusive/Inclusive, minLength, maxLength, pattern(+flags i/m/s/x —
 * others rejected at compile), in, hasValue, languageIn, uniqueLang,
 * and the property-pair constraints equals / disjoint /
 * lessThan(OrEquals). Value ORDERING (ranges + lessThan*) delegates to
 * the pure face's `Xsd.compare` via one shared comparator, so numerics
 * are arbitrary-precision and dateTime/date order (incl. the
 * partial-order timezone window) agrees with `Validator` by
 * construction. Value nodes are a SET per focus (duplicate (s,p,o) rows
 * in the input do not inflate counts), like the pure face's `distinct`.
 * A shapes graph using anything else (logical operators, shape refs,
 * qualified shapes, closed, path operators, implicit rdfs:Class
 * targets) is rejected loudly at compile — route those through
 * `Validator`.
 *
 * Scale notes (100 TB KG): the driver holds only the shapes (schema-sized
 * by definition) and the rdfs:subClassOf ontology (collected from data
 * with a loud 100k cap — ontologies are small even when graphs are not).
 * No other driver-side data. k property shapes → k pruned scans; all
 * joins/aggregations key on `s`, so one upstream repartition by subject
 * is reused across every constraint of every shape targeting the same
 * focus set.
 */
object DfShacl {

  import SH._

  /** ONE comparator for both faces: delegates to the pure engine's
   * Xsd.compare (SPARQL operator comparison incl. arbitrary-precision
   * numerics and the dateTime partial order). A UDF leaves whole-stage
   * codegen only on range/lessThan-constrained slices — correctness
   * across the faces outweighs codegen on those branches (the DecimalType
   * cast it replaces silently overflowed >28-digit integers and rounded
   * >10-dp decimals). */
  private val cmpUdf = udf(
    (ak: Byte, alex: String, adt: String, alang: String,
     bk: Byte, blex: String, bdt: String, blang: String) =>
      Xsd.compare(Term(ak, alex, adt, alang), Term(bk, blex, bdt, blang))
        .map(Integer.valueOf).orNull)

  /** One flat property (or node) constraint set, compiled driver-side. */
  private final case class FlatShape(
      shapeIri: Term,
      focus: FocusSpec,
      // None = node shape (values = focus nodes); Some((pred, inverse))
      path: Option[(Term, Boolean)],
      clazz: Seq[Term],
      datatype: Option[Term],
      nodeKind: Option[String],
      minCount: Option[Int],
      maxCount: Option[Int],
      // full bound TERMS (every declared bound — multiple values are each
      // a constraint), ordered via the shared Xsd.compare
      minInc: Seq[Term], minExc: Seq[Term],
      maxInc: Seq[Term], maxExc: Seq[Term],
      minLength: Option[Int], maxLength: Option[Int],
      pattern: Option[(String, String)],
      inList: Option[Seq[Term]],
      hasValue: Seq[Term],
      // property-pair constraints (other predicate on the same focus)
      equalsP: Seq[Term], disjointP: Seq[Term],
      lessThan: Seq[Term], lessThanEq: Seq[Term],
      languageIn: Option[Seq[String]],
      uniqueLang: Boolean)

  private sealed trait FocusSpec
  private final case class FClass(cls: Term) extends FocusSpec
  private final case class FNodes(nodes: Seq[Term]) extends FocusSpec
  private final case class FSubjectsOf(p: Term) extends FocusSpec
  private final case class FObjectsOf(p: Term) extends FocusSpec

  private val flatPreds: Set[Term] = Set("path", "class", "datatype",
    "nodeKind", "minCount", "maxCount", "minInclusive", "minExclusive",
    "maxInclusive", "maxExclusive", "minLength", "maxLength", "pattern",
    "flags", "in", "hasValue", "severity", "deactivated", "targetClass",
    "targetNode", "targetSubjectsOf", "targetObjectsOf", "property",
    "equals", "disjoint", "lessThan", "lessThanOrEquals", "languageIn",
    "uniqueLang",
    "name", "description", "message", "order", "group").map(sh) ++
    Set(rdfType)

  /** Parse + flatten a shapes graph; throws on non-flat constructs. */
  private def compile(shapes: Seq[Triple]): Seq[FlatShape] = {
    val sg = new GraphIndex(shapes.toVector)

    def intOf(shape: Term, p: String): Option[Int] =
      sg.obj(shape, sh(p)).map(t =>
        try t.lex.trim.toInt
        catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"DfShacl: sh:$p on shape ${shape.lex} needs an integer, " +
              s"got '${t.lex}'")
        })

    def flatten(shape: Term, focus: FocusSpec): Seq[FlatShape] = {
      // deactivated FIRST: a disabled draft shape may legally carry
      // non-flat constraints — SHACL ignores it entirely, so must we
      if (sg.obj(shape, sh("deactivated")).exists(_.lex == "true")) return Nil
      val unsupported = sg.preds(shape).filterNot(flatPreds)
      if (unsupported.nonEmpty)
        throw new IllegalArgumentException(
          s"DfShacl: non-flat constraint(s) ${unsupported.map(_.lex).mkString(", ")} " +
            s"on shape ${shape.lex} — use graft.shacl.Validator for the full core")

      val path = sg.obj(shape, sh("path")).map { pn =>
        SPath.parse(sg, pn) match {
          case PPred(p) => (p, false)
          case PInv(PPred(p)) => (p, true)
          case other => throw new IllegalArgumentException(
            s"DfShacl: non-predicate sh:path $other — use Validator")
        }
      }
      val self = FlatShape(
        shapeIri = shape,
        focus = focus,
        path = path,
        clazz = sg.objs(shape, sh("class")),
        datatype = sg.obj(shape, sh("datatype")),
        nodeKind = sg.obj(shape, sh("nodeKind")).map(_.lex.stripPrefix(NS)),
        minCount = intOf(shape, "minCount"),
        maxCount = intOf(shape, "maxCount"),
        minInc = sg.objs(shape, sh("minInclusive")),
        minExc = sg.objs(shape, sh("minExclusive")),
        maxInc = sg.objs(shape, sh("maxInclusive")),
        maxExc = sg.objs(shape, sh("maxExclusive")),
        minLength = intOf(shape, "minLength"),
        maxLength = intOf(shape, "maxLength"),
        pattern = sg.obj(shape, sh("pattern")).map { p =>
          val fl = sg.obj(shape, sh("flags")).map(_.lex).getOrElse("")
          // only Java-inline-group flags pass through; anything else
          // (e.g. XPath's 'q') would PatternSyntaxException mid-task
          require(fl.forall("imsx".contains(_)),
            s"DfShacl: sh:flags '$fl' on shape ${shape.lex} — only i/m/s/x " +
              "are supported here; use graft.shacl.Validator")
          (p.lex, fl)
        },
        inList = sg.obj(shape, sh("in")).map(sg.list(_)),
        hasValue = sg.objs(shape, sh("hasValue")),
        equalsP = sg.objs(shape, sh("equals")),
        disjointP = sg.objs(shape, sh("disjoint")),
        lessThan = sg.objs(shape, sh("lessThan")),
        lessThanEq = sg.objs(shape, sh("lessThanOrEquals")),
        languageIn = sg.obj(shape, sh("languageIn")).map(sg.list(_).map(_.lex)),
        uniqueLang = sg.obj(shape, sh("uniqueLang")).exists(_.lex == "true"))
      val children = sg.objs(shape, sh("property")).flatMap(flatten(_, focus))
      self +: children
    }

    // implicit class targets (a shape that is also rdf:type rdfs:Class
    // targets its own instances — SHACL §2.1.3.1): not compiled here, and
    // skipping silently would under-validate — reject loudly
    val shSubjects = shapes.collect {
      case Triple(s, p, _) if p.lex.startsWith(NS) => s }.toSet
    shapes.collectFirst {
      case Triple(s, p, o) if p == rdfType &&
          o.lex == "http://www.w3.org/2000/01/rdf-schema#Class" &&
          shSubjects(s) => s
    }.foreach(s => throw new IllegalArgumentException(
      s"DfShacl: shape ${s.lex} uses an implicit rdfs:Class target — " +
        "use graft.shacl.Validator"))

    val targeted = shapes.collect {
      case Triple(s, p, o) if p == sh("targetClass") => (s, FClass(o): FocusSpec)
      case Triple(s, p, o) if p == sh("targetSubjectsOf") => (s, FSubjectsOf(o))
      case Triple(s, p, o) if p == sh("targetObjectsOf") => (s, FObjectsOf(o))
    } ++ {
      val tn = shapes.collect { case Triple(s, p, o) if p == sh("targetNode") => (s, o) }
      tn.groupBy(_._1).map { case (s, xs) => (s, FNodes(xs.map(_._2)): FocusSpec) }
    }
    targeted.distinct.flatMap { case (s, f) => flatten(s, f) }
  }

  private val RDFS_SUBCLASS = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
  private val RDF_TYPE = SH.RDF + "type"

  /**
   * Validate one huge triple DataFrame (term-struct columns s, p, o)
   * against a driver-side shapes graph. Returns a violations DataFrame
   * `(focus, path, component, value_lex)` — focus/path/component as
   * plain strings (IRI text or bnode label), value_lex the offending
   * value's lexical form where one exists.
   */
  def validate(triples: DataFrame, shapes: Seq[Triple]): DataFrame = {
    val flat = compile(shapes)
    val spark = triples.sparkSession
    import spark.implicits._

    // rdfs:subClassOf closure: ontology-sized by nature; collected with a
    // loud cap (same policy as ConnectedComponents.runAdaptive).
    val subClassEdges: Seq[(String, String)] = {
      val df = triples
        .filter($"p.lex" === RDFS_SUBCLASS && $"s.kind" === Term.KIND_IRI &&
          $"o.kind" === Term.KIND_IRI)
        .select($"s.lex", $"o.lex").limit(100001).as[(String, String)].collect().toSeq
      require(df.size <= 100000,
        "DfShacl: >100k rdfs:subClassOf triples — not an ontology; aborting")
      df
    }
    val superToSubs: Map[String, Seq[String]] =
      subClassEdges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    def subClassesOf(cls: String): Set[String] = {
      var seen = Set(cls); var frontier = List(cls)
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(superToSubs.getOrElse(_, Nil)).filterNot(seen)
        seen ++= next; frontier = next
      }
      seen
    }

    def predScan(p: Term): DataFrame = triples.filter($"p.lex" === p.lex)
    def instancesOf(cls: Term): DataFrame = {
      val classes = subClassesOf(cls.lex)
      triples.filter($"p.lex" === RDF_TYPE && $"o.kind" === Term.KIND_IRI &&
        $"o.lex".isin(classes.toSeq: _*)).select($"s")
    }
    def focusFrame(f: FocusSpec): DataFrame = (f match {
      case FClass(c) => instancesOf(c)
      case FSubjectsOf(p) => predScan(p).select($"s")
      case FObjectsOf(p) => predScan(p).select($"o".as("s"))
      case FNodes(ns) =>
        spark.createDataset(ns.map(n => (n.kind, n.lex, n.dt, n.lang)))
          .select(struct($"_1".as("kind"), $"_2".as("lex"), $"_3".as("dt"),
            $"_4".as("lang")).as("s"))
    }).dropDuplicates("s")

    val termLit: Term => Column = t =>
      struct(lit(t.kind).cast("tinyint").as("kind"), lit(t.lex).as("lex"),
        lit(t.dt).as("dt"), lit(t.lang).as("lang"))

    def viol(focusCol: Column, shape: FlatShape, component: String,
        value: Column): Column =
      struct(
        focusCol("lex").as("focus"),
        lit(shape.path.map(_._1.lex).orNull).as("path"),
        lit(SH.NS + component + "ConstraintComponent").as("component"),
        value.as("value_lex"))

    val out = flat.flatMap { fs =>
      val focus = focusFrame(fs.focus)
      // value nodes: (focus, value) pairs — inner join on the subject; the
      // same `s`-keyed shuffle serves every per-value constraint below.
      val vals: DataFrame = (fs.path match {
        case None => focus.select($"s", $"s".as("v"))
        case Some((p, false)) =>
          focus.join(predScan(p).select($"s", $"o".as("v")), Seq("s"))
        case Some((p, true)) =>
          focus.join(predScan(p).select($"o".as("s"), $"s".as("v")), Seq("s"))
        // SET semantics like the pure face's .distinct: duplicate input
        // rows must not inflate maxCount / uniqueLang counts
      }).dropDuplicates("s", "v")
      val v = col("v")
      val lexLen = length(v("lex"))
      val frames = Seq.newBuilder[DataFrame]

      def valueViol(cond: Column, component: String,
          valueLex: Column = v("lex")): Unit =
        frames += vals.filter(cond).select(viol(col("s"), fs, component, valueLex).as("r"))

      fs.datatype.foreach { dt =>
        val wf = Xsd.lexRegexFor(dt.lex) match {
          case Some(rx) =>
            val lexOk = v("lex").rlike("^(?:" + rx + ")$")
            Xsd.intRangeFor(dt.lex) match {
              case Some((lo, hi)) =>
                val asDec = v("lex").cast(DecimalType(38, 0))
                lexOk && lo.map(b => asDec >= lit(b.toString).cast(DecimalType(38, 0)))
                  .getOrElse(lit(true)) &&
                  hi.map(b => asDec <= lit(b.toString).cast(DecimalType(38, 0)))
                    .getOrElse(lit(true))
              case None => lexOk
            }
          case None => lit(true)
        }
        // coalesce: a cast-to-decimal overflow yields NULL — that is
        // "not well-formed", not "unknown"
        valueViol(v("kind") =!= Term.KIND_LIT || v("dt") =!= dt.lex ||
          !coalesce(wf, lit(false)), "Datatype")
      }
      fs.nodeKind.foreach { nk =>
        val ok: Column = nk match {
          case "IRI" => v("kind") === Term.KIND_IRI
          case "BlankNode" => v("kind") === Term.KIND_BNODE
          case "Literal" => v("kind") === Term.KIND_LIT
          case "BlankNodeOrIRI" => v("kind").isin(Term.KIND_IRI, Term.KIND_BNODE)
          case "BlankNodeOrLiteral" => v("kind").isin(Term.KIND_BNODE, Term.KIND_LIT)
          case "IRIOrLiteral" => v("kind").isin(Term.KIND_IRI, Term.KIND_LIT)
          case _ => lit(true)
        }
        valueViol(!ok, "NodeKind")
      }
      fs.clazz.foreach { c =>
        // value not an instance of c (or a literal) — left anti against the
        // instance set keeps only the violating values.
        val inst = instancesOf(c).withColumnRenamed("s", "v").dropDuplicates("v")
        frames += vals.join(inst, Seq("v"), "left_anti")
          .select(viol(col("s"), fs, "Class", v("lex")).as("r"))
      }
      // value-range constraints through the SHARED comparator (pure-face
      // Xsd.compare): arbitrary-precision numerics, string/boolean, and
      // the dateTime partial order — incomparable ⇒ violation, exactly
      // like Validator. One bound term = one constraint.
      def rangeViol(bounds: Seq[Term], component: String,
          ok: Column => Column): Unit =
        bounds.foreach { b =>
          val c = cmpUdf(v("kind"), v("lex"), v("dt"), v("lang"),
            lit(b.kind), lit(b.lex), lit(b.dt), lit(b.lang))
          valueViol(c.isNull || !ok(c), component)
        }
      rangeViol(fs.minInc, "MinInclusive", _ >= 0)
      rangeViol(fs.minExc, "MinExclusive", _ > 0)
      rangeViol(fs.maxInc, "MaxInclusive", _ <= 0)
      rangeViol(fs.maxExc, "MaxExclusive", _ < 0)
      fs.minLength.foreach(n =>
        valueViol(v("kind") === Term.KIND_BNODE || lexLen < n, "MinLength"))
      fs.maxLength.foreach(n =>
        valueViol(v("kind") === Term.KIND_BNODE || lexLen > n, "MaxLength"))
      fs.pattern.foreach { case (p, fl) =>
        val rx = (if (fl.nonEmpty) s"(?$fl)" else "") + p
        // SHACL pattern is a find (unanchored) — wrap for rlike's search
        valueViol(v("kind") === Term.KIND_BNODE || !v("lex").rlike(rx), "Pattern")
      }
      fs.inList.foreach { allowed =>
        val isAllowed = allowed.map(t => v === termLit(t))
          .reduceOption(_ || _).getOrElse(lit(false))
        valueViol(!isAllowed, "In")
      }
      fs.hasValue.foreach { t =>
        // focus nodes with NO value equal to t
        frames += focus.join(vals.filter(v === termLit(t)).select($"s"),
          Seq("s"), "left_anti")
          .select(viol(col("s"), fs, "HasValue", lit(null).cast(StringType)).as("r"))
      }
      // ---- property-pair constraints: the OTHER predicate's values on
      // the same focus — a second pruned scan, joined on the subject
      def otherVals(p: Term): DataFrame =
        focus.join(predScan(p).select($"s", $"o".as("w")), Seq("s"))
      fs.equalsP.foreach { p =>
        val ov = otherVals(p)
        frames += vals.join(ov.withColumnRenamed("w", "v"), Seq("s", "v"), "left_anti")
          .select(viol(col("s"), fs, "Equals", v("lex")).as("r"))
        frames += ov.join(vals.select($"s", $"v".as("w")), Seq("s", "w"), "left_anti")
          .select(viol(col("s"), fs, "Equals", col("w")("lex")).as("r"))
      }
      fs.disjointP.foreach { p =>
        frames += vals.join(otherVals(p).withColumnRenamed("w", "v"), Seq("s", "v"))
          .select(viol(col("s"), fs, "Disjoint", v("lex")).as("r"))
      }
      // lessThan / lessThanOrEquals: per (value, other-value) pair, via
      // the SAME shared comparator — numeric / string / boolean /
      // dateTime exactly as the pure engine orders them; incomparable
      // pairs are violations
      def pairOrderViol(preds: Seq[Term], component: String,
          strict: Boolean): Unit = preds.foreach { p =>
        val pairs = vals.join(otherVals(p), Seq("s"))
        val w = col("w")
        val c = cmpUdf(v("kind"), v("lex"), v("dt"), v("lang"),
          w("kind"), w("lex"), w("dt"), w("lang"))
        val ok = if (strict) c < 0 else c <= 0
        frames += pairs.filter(c.isNull || !ok)
          .select(viol(col("s"), fs, component, v("lex")).as("r"))
      }
      pairOrderViol(fs.lessThan, "LessThan", strict = true)
      pairOrderViol(fs.lessThanEq, "LessThanOrEquals", strict = false)
      fs.languageIn.foreach { tags =>
        val lc = lower(v("lang"))
        val ok = v("kind") === Term.KIND_LIT && v("lang") =!= "" &&
          tags.map { t =>
            val tl = t.toLowerCase
            lc === tl || lc.startsWith(tl + "-")
          }.reduceOption(_ || _).getOrElse(lit(false))
        valueViol(!ok, "LanguageIn")
      }
      if (fs.uniqueLang) {
        // one violation per focus with ≥1 duplicated language tag (the
        // pure engine reports one per duplicated tag, with no sh:value —
        // identical tuples, so the two faces agree set-wise)
        frames += vals.filter(v("kind") === Term.KIND_LIT && v("lang") =!= "")
          .groupBy($"s", lower(v("lang")).as("__l"))
          .agg(count(lit(1)).as("__n"))
          .filter($"__n" > 1).select($"s").dropDuplicates("s")
          .select(viol(col("s"), fs, "UniqueLang", lit(null).cast(StringType)).as("r"))
      }
      if (fs.path.isDefined && (fs.minCount.isDefined || fs.maxCount.isDefined)) {
        val counts = vals.groupBy($"s").agg(count(lit(1)).as("__n"))
        fs.minCount.foreach { n =>
          // left join: focus nodes with zero values must surface too
          frames += focus.join(counts, Seq("s"), "left_outer")
            .filter(coalesce($"__n", lit(0L)) < n)
            .select(viol(col("s"), fs, "MinCount", lit(null).cast(StringType)).as("r"))
        }
        fs.maxCount.foreach { n =>
          frames += counts.filter($"__n" > n)
            .select(viol(col("s"), fs, "MaxCount", lit(null).cast(StringType)).as("r"))
        }
      }
      frames.result()
    }

    val empty = spark.emptyDataset[(String, String, String, String)]
      .toDF("focus", "path", "component", "value_lex")
    out.map(_.select($"r.focus", $"r.path", $"r.component", $"r.value_lex"))
      .reduceOption(_.unionAll(_)).getOrElse(empty)
  }
}
