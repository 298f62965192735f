package graft.algebra

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Term

/**
 * Column-level helpers over the 4-field term struct `(kind, lex, dt, lang)`
 * — the Spark mapping of Jena's term accessors and value-space machinery
 * (Node.java:149–226; ValueSpace.java:61–99; NodeCmp.java:39–129). All are
 * plain `org.apache.spark.sql.functions` compositions so they stay inside
 * whole-stage codegen (no UDFs on the query hot path).
 */
object TermCols {

  val schema: StructType = StructType(Seq(
    StructField("kind", ByteType, nullable = false),
    StructField("lex", StringType, nullable = false),
    StructField("dt", StringType, nullable = false),
    StructField("lang", StringType, nullable = false)))

  /** Literal term struct from a Scala Term constant. */
  def const(t: Term): Column = struct(
    lit(t.kind).cast(ByteType).as("kind"), lit(t.lex).as("lex"),
    lit(t.dt).as("dt"), lit(t.lang).as("lang"))

  def mk(kind: Column, lex: Column, dt: Column, lang: Column): Column =
    struct(kind.cast(ByteType).as("kind"), lex.as("lex"), dt.as("dt"), lang.as("lang"))

  // --- term accessors (E_Str / E_Lang / E_Datatype / E_IsIRI..., §2.9)
  def kind(t: Column): Column = t.getField("kind")
  def lex(t: Column): Column = t.getField("lex")
  def dt(t: Column): Column = t.getField("dt")
  def lang(t: Column): Column = t.getField("lang")
  def isIri(t: Column): Column = kind(t) === Term.KIND_IRI
  def isBlank(t: Column): Column = kind(t) === Term.KIND_BNODE
  def isLiteral(t: Column): Column = kind(t) === Term.KIND_LIT
  def bound(t: Column): Column = t.isNotNull

  private val numericDts: Seq[String] = Seq(
    Term.XSD_INTEGER, Term.XSD_DECIMAL, Term.XSD_DOUBLE, Term.XSD_FLOAT,
    Term.XSD + "int", Term.XSD + "long", Term.XSD + "short", Term.XSD + "byte",
    Term.XSD + "nonNegativeInteger", Term.XSD + "positiveInteger",
    Term.XSD + "negativeInteger", Term.XSD + "nonPositiveInteger",
    Term.XSD + "unsignedInt", Term.XSD + "unsignedLong",
    Term.XSD + "unsignedShort", Term.XSD + "unsignedByte")

  private val numLexRe = "^[+-]?((\\d+(\\.\\d*)?)|(\\.\\d+))([eE][+-]?\\d+)?$"

  def isNumeric(t: Column): Column =
    isLiteral(t) && dt(t).isin(numericDts: _*) && lex(t).rlike(numLexRe)

  /** Numeric value of a literal (NULL when not numeric) — the typed shadow
   * column of SURVEY.md §1.7; the rlike guard keeps ANSI casts safe. */
  def numValue(t: Column): Column =
    when(isNumeric(t), lex(t).cast(DoubleType))

  // --- XSD numeric promotion ladder (NodeValue.java:385 classifyNumeric):
  //     integer (and derived) < decimal < float < double. Arithmetic and
  //     SUM/AVG results carry the promoted type, not a flat xsd:double.
  private val rankDts: Seq[String] =
    Seq(Term.XSD_INTEGER, Term.XSD_DECIMAL, Term.XSD_FLOAT, Term.XSD_DOUBLE)

  /** Promotion rank of a numeric term (NULL when not numeric): derived
   * integer types (xsd:int, xsd:long, ...) rank as integer. */
  def numRank(t: Column): Column =
    when(!isNumeric(t), lit(null).cast(IntegerType))
      .when(dt(t) === Term.XSD_DECIMAL, 1)
      .when(dt(t) === Term.XSD_FLOAT, 2)
      .when(dt(t) === Term.XSD_DOUBLE, 3)
      .otherwise(0)

  /** Numeric term with the datatype of `rank` and the matching canonical
   * lexical form: integers print without a fraction, decimals in TTL
   * canonical form, float/double via the double shadow. Values run on the
   * double shadow — exact for integers < 2^53 (SURVEY §1.7 trade-off). */
  def numericTerm(value: Column, rank: Column): Column = {
    // NOTE on shape: Column trees are DAGs that Catalyst transforms expand
    // into trees, so every extra reference to `value` here MULTIPLIES the
    // plan size of whatever produced it. Keep the reference count minimal
    // (~6): one double cast feeds all branches, the non-finite detection
    // rides the cast's string form instead of separate isnan/±Inf checks.
    val dtc = element_at(array(rankDts.map(lit): _*), rank.cast(IntegerType) + 1)
    val d = value.cast(DoubleType)
    val dblStr = d.cast(StringType) // "12.5" | "NaN" | "Infinity" | "-Infinity"
    val decLex = {
      val sIn = d.cast(DecimalType(38, 10)).cast(StringType)
      regexp_replace(regexp_replace(sIn, "(\\.\\d*?)0+$", "$1"), "\\.$", ".0")
    }
    // float/double have non-finite members of their value space — canonical
    // XSD lexical forms INF / -INF / NaN (NormalizeValue.java:157–212)
    val dblLex = regexp_replace(dblStr, "^(-?)Infinity$", "$1INF")
    val lexc = when(rank === 0, d.cast(LongType).cast(StringType))
      .when(rank === 1, decLex)
      .otherwise(dblLex)
    // a NULL shadow value is a SPARQL eval error → unbound. So is a
    // non-finite value at integer/decimal rank (those value spaces have no
    // lexical form for it) — never emit a malformed struct with NULL lex.
    when(dblStr.isNotNull &&
        (rank >= 2 || !dblStr.rlike("NaN|Infinity")),
      mk(lit(Term.KIND_LIT), lexc, dtc, lit("")))
  }

  /** Boolean value of an xsd:boolean literal ("true"/"1" vs "false"/"0");
   * NULL when not a (well-formed) boolean — the boolean value space of
   * ValueSpace.java:61–99. */
  def boolValue(t: Column): Column =
    when(isLiteral(t) && dt(t) === Term.XSD_BOOLEAN && lex(t).isin("true", "1"), true)
      .when(isLiteral(t) && dt(t) === Term.XSD_BOOLEAN && lex(t).isin("false", "0"), false)

  /** Timestamp shadow of an xsd:dateTime/date literal — timezone-aware
   * (to_timestamp resolves a +hh:mm/Z designator to the instant), so
   * "2006-08-23T09:00:00+01:00" = "2006-08-23T08:00:00Z" compares equal,
   * the dateTime value space. NULL when not a dateTime. */
  private val dateDts = Seq(Term.XSD_DATETIME, Term.XSD + "date")

  /** Epoch-seconds shadow of a ZONED temporal of primitive type `dtIri`
   * (lexical form ends in a timezone designator): the determinate
   * timeline instant. XSD's partial order makes zoned and unzoned
   * temporals comparable only through the ±14 h implicit-timezone window
   * (XSD 1.1 §3.2.7.4), and xsd:date and xsd:dateTime are DISTINCT
   * primitive types that never compare by value — so the comparison
   * dispatch keys shadows on (primitive, zoned-ness), matching the
   * reference's verdicts on the W3C open-world date tests. ANSI-safe via
   * try_to_timestamp. */
  def zonedEpoch(t: Column, dtIri: String): Column = {
    val lx = lex(t)
    val des = regexp_extract(lx, "(Z|[+-]\\d{2}:\\d{2})$", 1)
    // dateTime designators parse natively; a zoned DATE does not — parse
    // the day and apply the offset by hand
    val inner =
      if (dtIri == Term.XSD_DATETIME) try_to_timestamp(lx).cast(DoubleType)
      else {
        val dayTs = try_to_timestamp(regexp_replace(lx, "(Z|[+-]\\d{2}:\\d{2})$", ""))
        val offSec = when(des.isin("Z", "+00:00", "-00:00"), 0L)
          .otherwise(when(substring(des, 1, 1) === "-", -1L).otherwise(1L) *
            (substring(des, 2, 2).cast(LongType) * 3600L +
              substring(des, 5, 2).cast(LongType) * 60L))
        dayTs.cast(DoubleType) - offSec
      }
    when(isLiteral(t) && dt(t) === dtIri && des =!= "", inner)
  }

  /** Epoch-seconds shadow of an UNZONED temporal of primitive `dtIri`;
   * the end-of-day form T24:00:00 normalizes to the next day's start. */
  def unzonedEpoch(t: Column, dtIri: String): Column = {
    val lx = lex(t)
    val t24 = date_add(
      try_to_timestamp(regexp_extract(lx, "^(\\d{4}-\\d{2}-\\d{2})T24:00:00", 1))
        .cast(DateType), 1).cast(TimestampType)
    when(isLiteral(t) && dt(t) === dtIri &&
        !lx.rlike("(Z|[+-]\\d{2}:\\d{2})$"),
      coalesce(try_to_timestamp(lx), t24).cast(DoubleType))
  }

  /** A literal whose VALUE SPACE is unknown (ValueSpace.VSPACE_UNKNOWN,
   * NVCompare.sameValueAs:114): an unknown datatype, or a known datatype
   * with a lexical form outside its lexical space ("xyz"^^xsd:integer).
   * Value comparison with such a literal is a type ERROR unless the
   * lang-taggedness differs (disjoint spaces → determinate verdict). */
  def unknownSpaceLit(t: Column): Column = {
    val known = numericDts ++ dateDts ++
      Seq(Term.XSD_BOOLEAN, Term.XSD_STRING, Term.RDF_LANGSTRING)
    isLiteral(t) && (
      !dt(t).isin(known: _*) ||
      (dt(t).isin(numericDts: _*) && !lex(t).rlike(numLexRe)) ||
      (dt(t) === Term.XSD_BOOLEAN && !lex(t).isin("true", "false", "1", "0")) ||
      (dt(t).isin(dateDts: _*) && !lex(t).rlike("^-?\\d{4}-\\d{2}-\\d{2}")))
  }

  /** The plain-string value space (simple literal == xsd:string). */
  def strValue(t: Column): Column =
    when(isLiteral(t) && dt(t) === Term.XSD_STRING, lex(t))

  /** Lang-string value: tag+lex, comparable only within one language
   * (tags are construction-canonicalized, so plain concat works). */
  def langStrValue(t: Column): Column =
    when(isLiteral(t) && dt(t) === Term.RDF_LANGSTRING,
      concat(lang(t), lit("\u0000"), lex(t)))

  /** Datatype IRI term for a numeric promotion rank — the DATATYPE(KNum)
   * fast path: skips formatting the whole numeric term just to read its
   * datatype back (plan-size discipline, see numericTerm's note). */
  def rankDatatypeTerm(rank: Column): Column =
    iriTerm(element_at(array(rankDts.map(lit): _*), rank.cast(IntegerType) + 1))

  /** sameTerm (Node.java:257): plain struct equality. After the normalize
   * stage one lexical form exists per value, so this is also sameValueAs
   * (Node.java:275) — the GraphMemValue trick (SURVEY.md §1.4). */
  def sameTerm(a: Column, b: Column): Column = a === b

  /** Effective boolean value (E_EBV, SPARQL 1.2 §17.2.2): VALID boolean
   * lexical forms ("true"/"1"/"false"/"0") by value, numerics by
   * != 0 ∧ ¬NaN, xsd:string by non-empty; everything else — including
   * ill-formed booleans/numerics and language-tagged strings — is an eval
   * error → NULL (⇒ filter drops, QueryIterFilterExpr.java:52–63).
   *
   * langString note: the reference's CODE takes the string rule for
   * rdf:langString too (XSDFuncOp.effectiveBooleanValue:302,
   * `isString() || isLangString()`), but its own vendored W3C sparql12
   * suite expects an eval ERROR for `!!"a"@en` (rdf-tests-cg/sparql/
   * sparql12/expression/not-not.srx leaves ?ebv unbound) — the code and
   * the test suite contradict each other. We follow the W3C suite (our
   * manifest gate's ground truth); AlgebraSpec pins the choice. */
  def ebv(t: Column): Column = {
    val d = lex(t).cast(DoubleType)
    when(isLiteral(t) && dt(t) === Term.XSD_BOOLEAN,
      when(lex(t).isin("true", "1"), true)
        .when(lex(t).isin("false", "0"), false))
      .when(isNumeric(t), when(isnan(d), false).otherwise(d =!= 0.0))
      .when(isLiteral(t) && dt(t) === Term.XSD_STRING && lang(t) === "",
        length(lex(t)) > 0)
  }

  // --- term constructors from plain SQL values (wrap agg/BIND results)
  def iriTerm(c: Column): Column = mk(lit(Term.KIND_IRI), c, lit(""), lit(""))
  def strTerm(c: Column): Column = mk(lit(Term.KIND_LIT), c, lit(Term.XSD_STRING), lit(""))
  def intTerm(c: Column): Column =
    mk(lit(Term.KIND_LIT), c.cast(LongType).cast(StringType), lit(Term.XSD_INTEGER), lit(""))
  /** xsd:decimal canonical form: strip trailing zeros but keep ".0"
   * (NormalizeValue.dtDecimalTTL — Literals.canonDecimal at column level). */
  def decTerm(c: Column, scale: Int = 2): Column = {
    val s = c.cast(DecimalType(28, scale)).cast(StringType)
    val stripped = regexp_replace(regexp_replace(s, "(\\.\\d*?)0+$", "$1"), "\\.$", ".0")
    mk(lit(Term.KIND_LIT), stripped, lit(Term.XSD_DECIMAL), lit(""))
  }
  /** NULL-preserving: a NULL boolean (eval error) yields a NULL term —
   * BIND of an errored expression must leave the var unbound, not bind
   * "false" (three-valued logic, E_LogicalNot over an error). */
  def boolTerm(c: Column): Column =
    when(c.isNotNull,
      mk(lit(Term.KIND_LIT), when(c, "true").otherwise("false"), lit(Term.XSD_BOOLEAN), lit("")))

  /** Canonical N-Triples rendering as a column expression (NodeFormatterNT
   * — escaping via a regexp_replace chain, stays in codegen). Used by the
   * TSV writer and the RDF-star TRIPLE constructor. */
  def ntCol(t: Column): Column = {
    val esc = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(lex(t), "\\\\", "\\\\\\\\"),
      "\"", "\\\\\""), "\n", "\\\\n"), "\r", "\\\\r"), "\t", "\\\\t")
    when(t.isNull, "")
      .when(isIri(t), concat(lit("<"), lex(t), lit(">")))
      .when(isBlank(t), concat(lit("_:"), lex(t)))
      .when(kind(t) === Term.KIND_TRIPLE_TERM, lex(t))
      .otherwise(concat(lit("\""), esc, lit("\""),
        when(lang(t) =!= "", concat(lit("@"), lang(t)))
          .when(dt(t) =!= "" && dt(t) =!= Term.XSD_STRING,
            concat(lit("^^<"), dt(t), lit(">")))
          .otherwise(lit(""))))
  }

  /**
   * SPARQL total-order sort key (ORDER BY comparator, NodeCmp.java:54 via
   * BindingComparator.java:150): unbound < blank nodes < IRIs < literals
   * < triple terms; numeric literals compare by value inside the NUM value
   * space (ValueSpace.java:61–99), everything else by lexical form then
   * datatype/lang. A derived struct column ⇒ plain multi-column sort —
   * no custom physical ordering needed (SURVEY.md §7.2).
   */
  /** Sortable encoding of a triple term's COMPONENTS (SPARQL 1.2 orders
   * triple terms recursively: subject, then predicate, then object —
   * NodeCmp compareRDFTerms triple branch). Kind prefix (bnode < IRI <
   * numeric lit < other lit < triple term) then the component key;
   * \u0001 separates components so a prefix IRI sorts before its
   * extensions. UDF — evaluated ONLY on triple-term rows (rare in data,
   * never on the scan/join hot path). */
  private[graft] def ttOrderKey(lexForm: String): String = {
    def numVal(t: Term): Option[Double] =
      if (t.kind != Term.KIND_LIT) None
      else if (!Set(Term.XSD_INTEGER, Term.XSD_DECIMAL, Term.XSD_DOUBLE,
        Term.XSD_FLOAT, Term.XSD + "long", Term.XSD + "int", Term.XSD + "short",
        Term.XSD + "byte", Term.XSD + "nonNegativeInteger",
        Term.XSD + "positiveInteger", Term.XSD + "negativeInteger",
        Term.XSD + "nonPositiveInteger", Term.XSD + "unsignedLong",
        Term.XSD + "unsignedInt", Term.XSD + "unsignedShort",
        Term.XSD + "unsignedByte").contains(t.dt)) None
      else try Some(t.lex.toDouble) catch { case _: NumberFormatException => None }
    def enc(t: Term): String = t.kind match {
      case Term.KIND_BNODE => "1" + t.lex
      case Term.KIND_IRI => "2" + t.lex
      case Term.KIND_TRIPLE_TERM =>
        graft.riot.NTriples.parseTripleTermComponents(t.lex) match {
          case Some((s, p, o)) =>
            "4" + enc(s) + "\u0001" + enc(p) + "\u0001" + enc(o)
          case None => "4" + t.lex
        }
      case _ => numVal(t) match {
        case Some(d) => "30" + f"${d + 1e15}%030.9f"
        case None => "31" + t.lex + "\u0002" + t.dt + "\u0002" + t.lang
      }
    }
    enc(Term(Term.KIND_TRIPLE_TERM, lexForm, "", ""))
  }
  private lazy val ttOrderKeyUdf = udf((l: String) => ttOrderKey(l))

  def sortKey(t: Column): Column = {
    val rank = when(t.isNull, 0)
      .when(kind(t) === Term.KIND_BNODE, 1)
      .when(kind(t) === Term.KIND_IRI, 2)
      .when(kind(t) === Term.KIND_TRIPLE_TERM, 4)
      .otherwise(3)
    // numeric literals form their own value sub-space before other literals
    // (ValueSpace ordering); an explicit sub-rank instead of a NaN filler in
    // numKey — NaN compares as larger-than-everything in Spark, which is a
    // direction-dependent surprise, while a rank column reverses cleanly
    // under DESC like every other key part
    val vsRank = when(isNumeric(t), 0).otherwise(1)
    struct(
      rank.as("kindRank"),
      vsRank.as("vsRank"),
      coalesce(numValue(t), lit(0.0)).as("numKey"),
      coalesce(when(kind(t) === Term.KIND_TRIPLE_TERM, ttOrderKeyUdf(lex(t)))
        .when(dt(t).isin(graft.cdt.Cdt.LIST, graft.cdt.Cdt.MAP),
          // composite datatypes order by their recursive value encoding
          graft.cdt.CdtFunctions.orderKeyUdf(lex(t), dt(t)))
        .otherwise(lex(t)), lit("")).as("lexKey"),
      coalesce(dt(t), lit("")).as("dtKey"),
      coalesce(lang(t), lit("")).as("langKey"))
  }
}
