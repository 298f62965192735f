package graft.shacl

import scala.collection.mutable

import graft.model.{Term, Triple}

/** One validation result (reference: jena-shacl/.../validation/event /
 * ReportItem). `pathNode` is the sh:path structure node from the shapes
 * graph (or a bare predicate IRI for sh:closed results). */
final case class VResult(
    focus: Term,
    pathNode: Option[Term],
    value: Option[Term],
    component: Term,
    severity: Term,
    sourceShape: Term)

final case class Report(conforms: Boolean, results: Seq[VResult])

/**
 * SHACL core validation engine — complete over the W3C core constraint
 * components (reference: jena-shacl/.../engine/constraint/, one class per
 * component; validation loop ValidationProc.java). Pure per (shapes,
 * data) pair: safe inside mapPartitions for the many-small-KGs shape, and
 * the semantic oracle for DfShacl's DataFrame compilation.
 */
object Validator {

  import SH._

  def validate(shapes: Seq[Triple], data: Seq[Triple]): Report = {
    val e = new Engine(new GraphIndex(shapes.toVector), new GraphIndex(data.toVector))
    val out = mutable.Buffer[VResult]()
    e.targetShapes.foreach { shape =>
      e.focusNodes(shape).foreach(f => e.validateShape(shape, f, out))
    }
    Report(out.isEmpty, out.toSeq)
  }

  /** Report graph in the SHACL results vocabulary (fresh bnodes; path
   * structures copied from the shapes graph with relabeled bnodes). */
  def reportTriples(report: Report, shapes: Seq[Triple]): Seq[Triple] = {
    val sg = new GraphIndex(shapes.toVector)
    val out = mutable.Buffer[Triple]()
    var n = 0
    def fresh(): Term = { n += 1; Term.bnode(s"vr$n") }
    val r = fresh()
    out += Triple(r, rdfType, sh("ValidationReport"))
    out += Triple(r, sh("conforms"),
      Term.lit(if (report.conforms) "true" else "false", XSD + "boolean"))
    report.results.foreach { res =>
      val e = fresh()
      out += Triple(r, sh("result"), e)
      out += Triple(e, rdfType, sh("ValidationResult"))
      out += Triple(e, sh("focusNode"), res.focus)
      out += Triple(e, sh("resultSeverity"), res.severity)
      out += Triple(e, sh("sourceConstraintComponent"), res.component)
      out += Triple(e, sh("sourceShape"), res.sourceShape)
      res.value.foreach(v => out += Triple(e, sh("value"), v))
      res.pathNode.foreach { p =>
        if (p.isIri) out += Triple(e, sh("resultPath"), p)
        else {
          // re-serialize the parsed path canonically (copyPath analog)
          val (root, struct) = SPath.toTriples(SPath.parse(sg, p), fresh _)
          out += Triple(e, sh("resultPath"), root)
          out ++= struct
        }
      }
    }
    out.toSeq
  }

  // ------------------------------------------------------------- engine

  /** Package-visible so ShaclSparql can reuse targeting (targetShapes /
   * focusNodes) for the SPARQL-based constraints. */
  private[shacl] final class Engine(sg: GraphIndex, dg: GraphIndex) {

    /** (shape, node) pairs currently being conformance-checked — the
     * recursion guard (SHACL leaves recursive shapes undefined; like the
     * reference we treat an in-progress pair as conforming). */
    private val inProgress = mutable.Set[(Term, Term)]()

    private val targetPreds = Seq("targetNode", "targetClass",
      "targetSubjectsOf", "targetObjectsOf").map(sh)

    def targetShapes: Seq[Term] = {
      val explicit = targetPreds.flatMap(p =>
        sg.byPred.getOrElse(p, Vector.empty).map(_.s))
      val implicitClass = sg.byPred.getOrElse(rdfType, Vector.empty)
        .filter(t => t.o == sh("NodeShape") || t.o == sh("PropertyShape"))
        .map(_.s)
        .filter(s => sg.objs(s, rdfType).contains(Term.iri(RDFS + "Class")))
      (explicit ++ implicitClass).distinct
    }

    def focusNodes(shape: Term): Seq[Term] = {
      val tn = sg.objs(shape, sh("targetNode"))
      val tc = sg.objs(shape, sh("targetClass")).flatMap(dg.instancesOf)
      val ts = sg.objs(shape, sh("targetSubjectsOf"))
        .flatMap(p => dg.byPred.getOrElse(p, Vector.empty).map(_.s))
      val to = sg.objs(shape, sh("targetObjectsOf"))
        .flatMap(p => dg.byPred.getOrElse(p, Vector.empty).map(_.o))
      val ic =
        if (sg.objs(shape, rdfType).contains(Term.iri(RDFS + "Class")))
          dg.instancesOf(shape)
        else Nil
      (tn ++ tc ++ ts ++ to ++ ic).distinct
    }

    private def bool(shape: Term, p: String): Boolean =
      sg.obj(shape, sh(p)).exists(_.lex == "true")

    def validateShape(shape: Term, focus: Term, out: mutable.Buffer[VResult]): Unit = {
      if (bool(shape, "deactivated")) return
      val severity = sg.obj(shape, sh("severity")).getOrElse(Violation)
      val pathNodeOpt = sg.obj(shape, sh("path"))
      val path = pathNodeOpt.map(SPath.parse(sg, _))
      // value nodes are a SET (duplicate sequence-path routes collapse —
      // suite: path-sequence-duplicate-001)
      val values: Vector[Term] = path match {
        case Some(p) => p.eval(dg, focus).distinct
        case None => Vector(focus)
      }
      def res(value: Option[Term], comp: String,
          pn: Option[Term] = pathNodeOpt): Unit =
        out += VResult(focus, pn, value, sh(comp + "ConstraintComponent"),
          severity, shape)

      // ---- value-type components
      sg.objs(shape, sh("class")).foreach { c =>
        values.foreach(v =>
          if (v.isLiteral || !dg.isInstanceOf(v, c)) res(Some(v), "Class"))
      }
      sg.obj(shape, sh("datatype")).foreach { dt =>
        values.foreach(v =>
          if (!v.isLiteral || v.dt != dt.lex || !Xsd.wellFormed(v.lex, v.dt))
            res(Some(v), "Datatype"))
      }
      sg.obj(shape, sh("nodeKind")).foreach { nk =>
        val ok: Term => Boolean = nk.lex.stripPrefix(NS) match {
          case "IRI" => _.isIri
          case "BlankNode" => _.isBNode
          case "Literal" => _.isLiteral
          case "BlankNodeOrIRI" => v => v.isBNode || v.isIri
          case "BlankNodeOrLiteral" => v => v.isBNode || v.isLiteral
          case "IRIOrLiteral" => v => v.isIri || v.isLiteral
          case _ => _ => true
        }
        values.foreach(v => if (!ok(v)) res(Some(v), "NodeKind"))
      }

      // ---- cardinality (property shapes)
      if (path.isDefined) {
        sg.obj(shape, sh("minCount")).foreach(n =>
          if (values.size < n.lex.toInt) res(None, "MinCount"))
        sg.obj(shape, sh("maxCount")).foreach(n =>
          if (values.size > n.lex.toInt) res(None, "MaxCount"))
      }

      // ---- value-range
      def range(p: String, comp: String, ok: Int => Boolean): Unit =
        sg.objs(shape, sh(p)).foreach { bound =>
          values.foreach(v => Xsd.compare(v, bound) match {
            case Some(c) if ok(c) => ()
            case _ => res(Some(v), comp)
          })
        }
      range("minExclusive", "MinExclusive", _ > 0)
      range("minInclusive", "MinInclusive", _ >= 0)
      range("maxExclusive", "MaxExclusive", _ < 0)
      range("maxInclusive", "MaxInclusive", _ <= 0)

      // ---- string-based
      // CODE POINTS, not UTF-16 units: SHACL defines string length via
      // fn:string-length (code points), and the DataFrame face's length()
      // counts code points — one emoji is length 1 on both faces
      def cpLen(s: String): Int = s.codePointCount(0, s.length)
      sg.obj(shape, sh("minLength")).foreach(n =>
        values.foreach(v =>
          if (v.isBNode || cpLen(Xsd.strVal(v)) < n.lex.toInt)
            res(Some(v), "MinLength")))
      sg.obj(shape, sh("maxLength")).foreach(n =>
        values.foreach(v =>
          if (v.isBNode || cpLen(Xsd.strVal(v)) > n.lex.toInt)
            res(Some(v), "MaxLength")))
      sg.obj(shape, sh("pattern")).foreach { pat =>
        val flags = sg.obj(shape, sh("flags")).map(_.lex).getOrElse("")
        val rx = Xsd.regex(pat.lex, flags)
        values.foreach(v =>
          if (v.isBNode || !rx.matcher(Xsd.strVal(v)).find())
            res(Some(v), "Pattern"))
      }
      sg.obj(shape, sh("languageIn")).foreach { listHead =>
        val tags = sg.list(listHead).map(_.lex)
        values.foreach { v =>
          val base = v.lang.toLowerCase
          val ok = v.isLiteral && v.lang.nonEmpty && tags.exists { t =>
            val tl = t.toLowerCase
            base == tl || base.startsWith(tl + "-")
          }
          if (!ok) res(Some(v), "LanguageIn")
        }
      }
      if (bool(shape, "uniqueLang")) {
        val langs = values.filter(v => v.isLiteral && v.lang.nonEmpty)
          .groupBy(_.lang.toLowerCase)
        langs.toSeq.sortBy(_._1).foreach { case (_, vs) =>
          if (vs.size > 1) res(None, "UniqueLang")
        }
      }

      // ---- property-pair
      sg.objs(shape, sh("equals")).foreach { p =>
        val other = dg.objs(focus, p)
        (values.filterNot(other.contains) ++ other.filterNot(values.contains))
          .distinct.foreach(v => res(Some(v), "Equals"))
      }
      sg.objs(shape, sh("disjoint")).foreach { p =>
        val other = dg.objs(focus, p).toSet
        values.filter(other).distinct.foreach(v => res(Some(v), "Disjoint"))
      }
      sg.objs(shape, sh("lessThan")).foreach { p =>
        val other = dg.objs(focus, p)
        values.foreach(v => other.foreach(w =>
          if (!Xsd.compare(v, w).exists(_ < 0)) res(Some(v), "LessThan")))
      }
      sg.objs(shape, sh("lessThanOrEquals")).foreach { p =>
        val other = dg.objs(focus, p)
        values.foreach(v => other.foreach(w =>
          if (!Xsd.compare(v, w).exists(_ <= 0)) res(Some(v), "LessThanOrEquals")))
      }

      // ---- other value constraints
      sg.obj(shape, sh("in")).foreach { listHead =>
        val allowed = sg.list(listHead)
        values.foreach(v => if (!allowed.contains(v)) res(Some(v), "In"))
      }
      sg.objs(shape, sh("hasValue")).foreach { v =>
        if (!values.contains(v)) res(None, "HasValue")
      }

      // ---- logical
      sg.objs(shape, sh("not")).foreach { ref =>
        values.foreach(v => if (conforms(ref, v)) res(Some(v), "Not"))
      }
      sg.objs(shape, sh("and")).foreach { listHead =>
        val refs = sg.list(listHead)
        values.foreach(v =>
          if (!refs.forall(conforms(_, v))) res(Some(v), "And"))
      }
      sg.objs(shape, sh("or")).foreach { listHead =>
        val refs = sg.list(listHead)
        values.foreach(v =>
          if (!refs.exists(conforms(_, v))) res(Some(v), "Or"))
      }
      sg.objs(shape, sh("xone")).foreach { listHead =>
        val refs = sg.list(listHead)
        values.foreach(v =>
          if (refs.count(conforms(_, v)) != 1) res(Some(v), "Xone"))
      }

      // ---- shape-based
      sg.objs(shape, sh("node")).foreach { ref =>
        values.foreach(v => if (!conforms(ref, v)) res(Some(v), "Node"))
      }
      sg.objs(shape, sh("property")).foreach { ref =>
        values.foreach(v => validateShape(ref, v, out))
      }
      sg.obj(shape, sh("qualifiedValueShape")).foreach { qvs =>
        val disjointSiblings =
          if (bool(shape, "qualifiedValueShapesDisjoint")) siblingQvs(shape, qvs)
          else Nil
        val matching = values.filter(v =>
          conforms(qvs, v) && !disjointSiblings.exists(conforms(_, v)))
        sg.obj(shape, sh("qualifiedMinCount")).foreach(n =>
          if (matching.size < n.lex.toInt) res(None, "QualifiedMinCount"))
        sg.obj(shape, sh("qualifiedMaxCount")).foreach(n =>
          if (matching.size > n.lex.toInt) res(None, "QualifiedMaxCount"))
      }

      // ---- closed
      if (bool(shape, "closed")) {
        val ignored = sg.obj(shape, sh("ignoredProperties"))
          .map(sg.list(_)).getOrElse(Nil).toSet
        val allowed = sg.objs(shape, sh("property"))
          .flatMap(ps => sg.obj(ps, sh("path"))).filter(_.isIri).toSet ++ ignored
        dg.bySubj.getOrElse(focus, Vector.empty).foreach { t =>
          if (!allowed.contains(t.p))
            res(Some(t.o), "Closed", pn = Some(t.p))
        }
      }
    }

    /** Sibling qualified value shapes: other sh:property shapes of this
     * property shape's parents that carry sh:qualifiedValueShape. */
    private def siblingQvs(shape: Term, own: Term): Seq[Term] = {
      val parents = sg.subjs(sh("property"), shape)
      parents.flatMap(p => sg.objs(p, sh("property")))
        .filterNot(_ == shape)
        .flatMap(ps => sg.obj(ps, sh("qualifiedValueShape")))
        .filterNot(_ == own)
        .distinct
    }

    private def conforms(shape: Term, node: Term): Boolean = {
      val key = (shape, node)
      if (inProgress.contains(key)) return true
      inProgress += key
      try {
        val buf = mutable.Buffer[VResult]()
        validateShape(shape, node, buf)
        buf.isEmpty
      } finally inProgress -= key
    }
  }
}

/** XSD lexical well-formedness + SPARQL-operator-style value comparison
 * for the SHACL range/pair components (reference: jena-core datatypes
 * XSDDatatype validation + NodeValue comparisons). */
object Xsd {
  private val XSD = "http://www.w3.org/2001/XMLSchema#"

  private val intRanges: Map[String, (BigInt, BigInt)] = Map(
    "byte" -> (BigInt(-128), BigInt(127)),
    "short" -> (BigInt(-32768), BigInt(32767)),
    "int" -> (BigInt(Int.MinValue), BigInt(Int.MaxValue)),
    "long" -> (BigInt(Long.MinValue), BigInt(Long.MaxValue)),
    "unsignedByte" -> (BigInt(0), BigInt(255)),
    "unsignedShort" -> (BigInt(0), BigInt(65535)),
    "unsignedInt" -> (BigInt(0), BigInt(4294967295L)),
    "unsignedLong" -> (BigInt(0), BigInt("18446744073709551615")))

  private val INT_RX = "[+-]?\\d+".r
  private val DEC_RX = "[+-]?(\\d+(\\.\\d*)?|\\.\\d+)".r
  private val DBL_RX = "(?i)[+-]?((\\d+(\\.\\d*)?|\\.\\d+)(e[+-]?\\d+)?|INF|NaN)".r
  private val DATE_RX = "-?\\d{4,}-\\d{2}-\\d{2}(Z|[+-]\\d{2}:\\d{2})?".r
  private val TIME_RX = "\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?(Z|[+-]\\d{2}:\\d{2})?".r
  private val DATETIME_RX = ("-?\\d{4,}-\\d{2}-\\d{2}T" + TIME_RX.regex).r

  /** Anchored lexical-space regex for an XSD datatype, when one exists —
   * shared by `wellFormed` (driver) and DfShacl (column `rlike`). */
  def lexRegexFor(dt: String): Option[String] = {
    if (!dt.startsWith(XSD)) return None
    dt.stripPrefix(XSD) match {
      case "integer" | "nonNegativeInteger" | "nonPositiveInteger" |
           "negativeInteger" | "positiveInteger" => Some(INT_RX.regex)
      case l if intRanges.contains(l) => Some(INT_RX.regex)
      case "decimal" => Some(DEC_RX.regex)
      case "double" | "float" => Some(DBL_RX.regex)
      case "boolean" => Some("true|false|0|1")
      case "date" => Some(DATE_RX.regex)
      case "time" => Some(TIME_RX.regex)
      case "dateTime" => Some(DATETIME_RX.regex)
      case _ => None
    }
  }

  /** Inclusive value range for the bounded XSD integer types (and the sign
   * constraints of the unbounded derived-integer types as half-ranges). */
  def intRangeFor(dt: String): Option[(Option[BigInt], Option[BigInt])] = {
    if (!dt.startsWith(XSD)) return None
    dt.stripPrefix(XSD) match {
      case l if intRanges.contains(l) =>
        val (lo, hi) = intRanges(l); Some((Some(lo), Some(hi)))
      case "nonNegativeInteger" => Some((Some(BigInt(0)), None))
      case "positiveInteger" => Some((Some(BigInt(1)), None))
      case "nonPositiveInteger" => Some((None, Some(BigInt(0))))
      case "negativeInteger" => Some((None, Some(BigInt(-1))))
      case _ => None
    }
  }

  def wellFormed(lex: String, dt: String): Boolean = {
    if (!dt.startsWith(XSD)) return true
    val local = dt.stripPrefix(XSD)
    def fullInt: Boolean = INT_RX.matches(lex)
    local match {
      case "integer" => fullInt
      case "nonNegativeInteger" => fullInt && BigInt(lex) >= 0
      case "nonPositiveInteger" => fullInt && BigInt(lex) <= 0
      case "negativeInteger" => fullInt && BigInt(lex) < 0
      case "positiveInteger" => fullInt && BigInt(lex) > 0
      case l if intRanges.contains(l) =>
        fullInt && { val v = BigInt(lex); v >= intRanges(l)._1 && v <= intRanges(l)._2 }
      case "decimal" => DEC_RX.matches(lex)
      case "double" | "float" => DBL_RX.matches(lex)
      case "boolean" => lex == "true" || lex == "false" || lex == "0" || lex == "1"
      case "date" => DATE_RX.matches(lex)
      case "time" => TIME_RX.matches(lex)
      case "dateTime" => DATETIME_RX.matches(lex)
      case _ => true
    }
  }

  /** The string a string-based constraint sees (SPARQL str()): IRI text or
   * literal lexical form. */
  def strVal(t: Term): String = t.lex

  /** XPath-regex-ish via Java regex; SHACL flags i/m/s/x. */
  def regex(pattern: String, flags: String): java.util.regex.Pattern = {
    var f = 0
    if (flags.contains("i")) f |= java.util.regex.Pattern.CASE_INSENSITIVE
    if (flags.contains("m")) f |= java.util.regex.Pattern.MULTILINE
    if (flags.contains("s")) f |= java.util.regex.Pattern.DOTALL
    if (flags.contains("x")) f |= java.util.regex.Pattern.COMMENTS
    java.util.regex.Pattern.compile(pattern, f)
  }

  private val numericDts: Set[String] = (Seq("integer", "decimal", "double",
    "float", "nonNegativeInteger", "nonPositiveInteger", "negativeInteger",
    "positiveInteger") ++ intRanges.keys).map(XSD + _).toSet

  /** SPARQL operator comparison: Some(sign) when comparable. */
  def compare(a: Term, b: Term): Option[Int] = {
    if (!a.isLiteral || !b.isLiteral) return None
    if (numericDts.contains(a.dt) && numericDts.contains(b.dt)) {
      try Some(BigDecimal(a.lex.trim).compare(BigDecimal(b.lex.trim)))
      catch { case _: NumberFormatException => None }
    } else if (a.dt == XSD + "string" && b.dt == XSD + "string") {
      Some(a.lex.compare(b.lex))
    } else if (a.dt == XSD + "boolean" && b.dt == XSD + "boolean") {
      Some(a.lex.compare(b.lex)) // "false" < "true" lexicographically
    } else if ((a.dt == XSD + "dateTime" && b.dt == XSD + "dateTime") ||
        (a.dt == XSD + "date" && b.dt == XSD + "date")) {
      try dateTimeCompare(a.lex, b.lex, a.dt.endsWith("date"))
      catch { case _: RuntimeException => None }
    } else None
  }

  /** XSD dateTime ORDER is PARTIAL: zoned vs unzoned is determinate only
   * when the instants differ by more than the ±14:00 possible-offset
   * window (XSD 1.1 §3.3.8; suite: minInclusive-003). */
  private def dateTimeCompare(aLex: String, bLex: String,
      isDate: Boolean): Option[Int] = {
    def split(lex: String): (String, Option[String]) = {
      val m = "(Z|[+-]\\d{2}:\\d{2})$".r.findFirstIn(lex)
      (m.map(z => lex.dropRight(z.length)).getOrElse(lex), m)
    }
    def local(body: String): java.time.LocalDateTime =
      java.time.LocalDateTime.parse(if (isDate) body + "T00:00:00" else body)
    def instant(body: String, zone: String): java.time.Instant =
      java.time.OffsetDateTime.parse(
        (if (isDate) body + "T00:00:00" else body) +
          (if (zone == "Z") "Z" else zone)).toInstant
    val (ab, az) = split(aLex)
    val (bb, bz) = split(bLex)
    (az, bz) match {
      case (Some(z1), Some(z2)) => Some(instant(ab, z1).compareTo(instant(bb, z2)))
      case (None, None) => Some(local(ab).compareTo(local(bb)))
      case (Some(z1), None) =>
        val x = instant(ab, z1)
        val lo = instant(bb, "+14:00") // earliest possible instant for b
        val hi = instant(bb, "-14:00") // latest possible
        if (x.compareTo(lo) < 0) Some(-1)
        else if (x.compareTo(hi) > 0) Some(1)
        else None
      case (None, Some(_)) => dateTimeCompare(bLex, aLex, isDate).map(-_)
    }
  }
}
