package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.algebra.TermCols
import graft.algebra.TermCols.{dt, isIri, isLiteral, kind, lang, lex, mk}
import graft.model.Term

/**
 * SPARQL scalar function library over term-struct columns — the Spark
 * mapping of the reference's 93 `E_*` expression classes plus
 * `sparql/function/library/` (SURVEY.md §2.9). Every function:
 *
 *  - takes/returns 4-field term structs (`TermCols.schema`),
 *  - is built ONLY from `org.apache.spark.sql.functions` compositions, so
 *    it stays inside whole-stage codegen (no UDF walls on the hot path),
 *  - returns NULL on argument-type errors — SQL NULL is SPARQL's eval
 *    error, which filters drop (QueryIterFilterExpr.java:52–63) and BINDs
 *    keep as unbound (QueryIterAssign.java:67–69).
 *
 * Boolean-valued operations return plain BooleanColumns (for use in
 * Filter conditions); wrap with `toTerm` when a term is needed.
 */
object SparqlFunctions {

  private val S = Term.XSD_STRING
  private def strOf(c: Column): Column = TermCols.strTerm(c)

  /** Plain-or-lang string check: functions like UCASE are defined only on
   * string literals (string value space, ValueSpace.java). */
  private def isStringLit(t: Column): Column =
    isLiteral(t) && (dt(t) === S || dt(t) === Term.RDF_LANGSTRING)

  /** Keep the input's lang/dt on the result (SPARQL string-function rule:
   * UCASE("x"@en) = "X"@en). */
  private def likeInput(t: Column, newLex: Column): Column =
    when(isStringLit(t), mk(lit(Term.KIND_LIT), newLex, dt(t), lang(t)))

  // ---- term accessors (E_Str, E_Lang, E_Datatype)
  /** STR(term): lexical form of a literal, or the IRI string. */
  def str(t: Column): Column =
    when(isLiteral(t) || isIri(t), strOf(lex(t)))
  /** RDF 1.2 initial-text-direction literals ("x"@en--ltr) store the
   * combined tag in `lang` ("en--ltr"); the direction-aware accessors
   * split it (reference: NodeFunctions.lang/langdir after the
   * dirLangString addition). */
  val RDF_DIRLANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#dirLangString"
  private def baseLang(t: Column): Column = regexp_replace(lang(t), "--.*$", "")
  private def dirPart(t: Column): Column = regexp_extract(lang(t), "--(.*)$", 1)

  def langFn(t: Column): Column = when(isLiteral(t), strOf(baseLang(t)))
  /** LANGDIR(lit) → "ltr"/"rtl"/"" (SPARQL 1.2); error on non-literals. */
  def langDirFn(t: Column): Column = when(isLiteral(t), strOf(dirPart(t)))
  /** hasLANG / hasLANGDIR — boolean, FALSE (not error) for non-literals. */
  def hasLangFn(t: Column): Column = isLiteral(t) && lang(t) =!= ""
  def hasLangDirFn(t: Column): Column = isLiteral(t) && lang(t).contains("--")
  def datatype(t: Column): Column =
    when(isLiteral(t), TermCols.iriTerm(
      when(dt(t) === "", S)
        .when(dt(t) === Term.RDF_LANGSTRING && lang(t).contains("--"),
          RDF_DIRLANGSTRING)
        .otherwise(dt(t))))

  /** A SIMPLE literal in the RDF 1.1 sense: xsd:string, no language tag —
   * the only legal first argument of STRDT/STRLANG (E_StrDatatype
   * updated-for-RDF-1.1 rule: a lang-tagged or otherwise-typed input is a
   * type error). */
  private def isSimpleLit(t: Column): Column = isLiteral(t) && dt(t) === S

  // ---- term constructors (E_IRI, E_BNode, E_StrDatatype, E_StrLang)
  /** IRI(str): resolves RELATIVE strings against the query's base IRI
   * (E_IRI carries the parser base). Column-level resolution covers the
   * common shapes (scheme-absolute kept; //authority, /rooted, #fragment,
   * plain relative against the base's directory). */
  def iriFn(t: Column, base: String = ""): Column = {
    val sx = lex(t)
    val resolved =
      if (base.isEmpty) sx
      else {
        val schemeEnd = base.indexOf("://")
        val root = if (schemeEnd > 0) {
          val auth = base.indexOf('/', schemeEnd + 3)
          if (auth > 0) base.substring(0, auth) else base
        } else base
        val scheme = if (schemeEnd > 0) base.substring(0, schemeEnd + 1) else ""
        val noFrag = { val h = base.indexOf('#'); if (h >= 0) base.substring(0, h) else base }
        val dir = {
          val cut = noFrag.lastIndexOf('/')
          if (cut > schemeEnd + 2) noFrag.substring(0, cut + 1) else noFrag + "/"
        }
        when(sx.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), sx)
          .when(sx.startsWith("//"), concat(lit(scheme), sx))
          .when(sx.startsWith("/"), concat(lit(root), sx))
          .when(sx.startsWith("#"), concat(lit(noFrag), sx))
          .otherwise(concat(lit(dir), sx))
      }
    when(isIri(t), t).otherwise(when(isStringLit(t), TermCols.iriTerm(resolved)))
  }
  def strdt(t: Column, dtIri: Column): Column =
    when(isSimpleLit(t) && isIri(dtIri),
      mk(lit(Term.KIND_LIT), lex(t), lex(dtIri), lit("")))
  def strlang(t: Column, langTag: Column): Column =
    when(isSimpleLit(t) && isSimpleLit(langTag) && lex(langTag) =!= "",
      mk(lit(Term.KIND_LIT), lex(t), lit(Term.RDF_LANGSTRING), lex(langTag)))
  /** STRLANGDIR(str, lang, dir) — SPARQL 1.2 E_StrLangDir: dir must be
   * exactly "ltr" or "rtl" (case-sensitive), lang non-empty; otherwise an
   * eval error. */
  def strlangdir(t: Column, langTag: Column, dir: Column): Column =
    when(isSimpleLit(t) && isSimpleLit(langTag) && lex(langTag) =!= "" &&
      isSimpleLit(dir) && lex(dir).isin("ltr", "rtl"),
      mk(lit(Term.KIND_LIT), lex(t), lit(Term.RDF_LANGSTRING),
        concat(lex(langTag), lit("--"), lex(dir))))
  /** BNODE() per-row fresh label: deterministic from a provided seed col. */
  def bnodeFn(seed: Column): Column =
    mk(lit(Term.KIND_BNODE), sha2(seed.cast(StringType), 256).substr(1, 32), lit(""), lit(""))

  // ---- string functions (E_Str*, SURVEY §2.9 row 1)
  def strlen(t: Column): Column =
    when(isStringLit(t), TermCols.intTerm(length(lex(t))))
  /** SUBSTR with optional length (fn:substring 2- and 3-argument forms);
   * the result keeps the source's lang/dt. */
  def substrFn(t: Column, pos: Column, len: Option[Column]): Column = {
    val l = len.map(_.cast(IntegerType)).getOrElse(length(lex(t)))
    likeInput(t, substring(lex(t), pos.cast(IntegerType), l))
  }
  def ucase(t: Column): Column = likeInput(t, upper(lex(t)))
  def lcase(t: Column): Column = likeInput(t, lower(lex(t)))
  def strstarts(a: Column, b: Column): Column = lex(a).startsWith(lex(b))
  def strends(a: Column, b: Column): Column = lex(a).endsWith(lex(b))
  def containsFn(a: Column, b: Column): Column = lex(a).contains(lex(b))
  /** Argument compatibility of the two-string functions (SPARQL 17.4.3.4
   * fn argument rules): arg2 must be simple/xsd:string, or carry the SAME
   * language tag as arg1 — otherwise a type error. */
  private def strArgsCompatible(a: Column, b: Column): Column =
    isStringLit(a) && isStringLit(b) && (dt(b) === S || lang(a) === lang(b))
  /** STRBEFORE/STRAFTER (SPARQL 17.4.3.4): the matched prefix/suffix keeps
   * arg1's lang/dt; an EMPTY arg2 yields ""-with-arg1's-lang (STRBEFORE) /
   * arg1 itself (STRAFTER); NO MATCH yields a PLAIN "" (no lang — the
   * spec's 'empty simple literal' case); incompatible args are errors. */
  def strbefore(a: Column, b: Column): Column = {
    val pos = instr(lex(a), lex(b))
    when(strArgsCompatible(a, b),
      when(length(lex(b)) === 0, likeInput(a, lit("")))
        .when(pos > 0, likeInput(a, lex(a).substr(lit(1), pos - 1)))
        .otherwise(strOf(lit(""))))
  }
  def strafter(a: Column, b: Column): Column = {
    val pos = instr(lex(a), lex(b))
    when(strArgsCompatible(a, b),
      when(length(lex(b)) === 0, likeInput(a, lex(a)))
        .when(pos > 0, likeInput(a, lex(a).substr(pos + length(lex(b)), length(lex(a)))))
        .otherwise(strOf(lit(""))))
  }
  /** CONCAT (fn:concat + the SPARQL literal-type rules): every argument
   * must be a string literal (simple/xsd:string/langString) — numerics are
   * type errors; the result carries a language tag only when ALL arguments
   * share it, else it is a plain xsd:string. */
  def concatFn(ts: Column*): Column = {
    if (ts.isEmpty) return strOf(lit(""))
    val allStr = ts.map(isStringLit).reduce(_ && _)
    val sameLang = ts.map(t => dt(t) === Term.RDF_LANGSTRING &&
      lang(t) === lang(ts.head)).reduce(_ && _)
    val glued = concat(ts.map(lex): _*)
    when(allStr && sameLang,
      mk(lit(Term.KIND_LIT), glued, lit(Term.RDF_LANGSTRING), lang(ts.head)))
      .when(allStr, strOf(glued))
  }
  def replaceFn(t: Column, pattern: Column, replacement: Column): Column =
    likeInput(t, regexp_replace(lex(t), pattern.getField("lex"), replacement.getField("lex")))
  def regex(t: Column, pattern: String): Column = lex(t).rlike(pattern)
  def encodeForUri(t: Column): Column =
    when(isStringLit(t), strOf(url_encode(lex(t))))

  // ---- numerics (E_NumAbs/Ceiling/Floor/Round): result keeps the input's
  //      promotion rank with the matching canonical lexical form (Jena's
  //      XSDFuncOp.abs etc. return the argument's numeric type); values
  //      run on the double shadow (SURVEY §1.7 typed-shadow rule)
  private def numOp(t: Column, f: Column => Column): Column =
    when(TermCols.isNumeric(t),
      TermCols.numericTerm(f(TermCols.numValue(t)), TermCols.numRank(t)))
  def absFn(t: Column): Column = numOp(t, abs)
  def ceilFn(t: Column): Column = numOp(t, c => ceil(c).cast(DoubleType))
  def floorFn(t: Column): Column = numOp(t, c => floor(c).cast(DoubleType))
  def roundFn(t: Column): Column = numOp(t, c => round(c, 0))
  /** math:* library functions (sparql/function/library/Math_*) — all return
   * xsd:double like their XPath definitions. */
  def sqrtFn(t: Column): Column = mathOp(t, sqrt)
  private def mathOp(t: Column, f: Column => Column): Column =
    when(TermCols.isNumeric(t), TermCols.numericTerm(f(TermCols.numValue(t)), lit(3)))
  def expFn(t: Column): Column = mathOp(t, exp)
  def logFn(t: Column): Column = mathOp(t, log)
  def log10Fn(t: Column): Column = mathOp(t, log10)
  def sinFn(t: Column): Column = mathOp(t, sin)
  def cosFn(t: Column): Column = mathOp(t, cos)
  def tanFn(t: Column): Column = mathOp(t, tan)
  def atanFn(t: Column): Column = mathOp(t, atan)
  def powFn(a: Column, b: Column): Column =
    when(TermCols.isNumeric(a) && TermCols.isNumeric(b),
      TermCols.numericTerm(pow(TermCols.numValue(a), TermCols.numValue(b)), lit(3)))
  def piTerm(): Column = TermCols.numericTerm(lit(math.Pi), lit(3))

  /** XSD-promoted binary arithmetic (NodeValue.java:385): result rank =
   * max operand rank; integer ÷ integer yields xsd:decimal
   * (op:numeric-divide on integers). NULL (eval error) on non-numerics. */
  def numericBinOp(a: Column, b: Column, f: (Column, Column) => Column,
                   isDivide: Boolean = false): Column = {
    val rank0 = greatest(TermCols.numRank(a), TermCols.numRank(b))
    val rank = if (isDivide) greatest(rank0, lit(1)) else rank0
    val va = TermCols.numValue(a)
    val vb = TermCols.numValue(b)
    val res =
      if (!isDivide) f(va, vb)
      else {
        // op:numeric-divide, zero divisor (XPath F&O 4.2.5): an ERROR for
        // integer/decimal operands (→ unbound via numericTerm's NULL); IEEE
        // INF/-INF/NaN after float/double promotion. The CASE guard keeps
        // the zero divisor away from Divide, which throws under ANSI mode
        // (Spark 4 default) for every numeric type.
        when(vb =!= 0.0, va / vb)
          .when(rank0 >= 2 && vb === 0.0,
            when(va > 0.0, Double.PositiveInfinity)
              .when(va < 0.0, Double.NegativeInfinity)
              .otherwise(Double.NaN))
      }
    when(TermCols.isNumeric(a) && TermCols.isNumeric(b),
      TermCols.numericTerm(res, rank))
  }
  def numAdd(a: Column, b: Column): Column = numericBinOp(a, b, _ + _)

  /** Unary minus/plus (E_UnaryMinus/E_UnaryPlus): numeric value space
   * only, result carries the operand's promoted type; non-numerics are
   * eval errors (NULL). Unary plus canonicalizes ("+01" → "1"). */
  def unaryNum(t: Column, negate: Boolean): Column =
    when(TermCols.isNumeric(t), TermCols.numericTerm(
      if (negate) -TermCols.numValue(t) else TermCols.numValue(t),
      TermCols.numRank(t)))

  /** LANGMATCHES(lang, range) — RFC 4647 basic filtering: "*" matches any
   * non-empty tag; otherwise case-insensitive exact match or prefix
   * followed by '-'. */
  def langMatches(tag: Column, range: Column): Column = {
    val t = lower(lex(tag))
    val r = lower(lex(range))
    when(isStringLit(tag) && isStringLit(range),
      when(r === "*", t =!= "")
        .otherwise(t === r || t.startsWith(concat(r, lit("-")))))
  }

  // ---- hashes (E_MD5 / E_SHA*; the pipeline invariant uses sha2(...,256))
  def md5Fn(t: Column): Column = when(isStringLit(t), strOf(md5(lex(t))))
  def sha1Fn(t: Column): Column = when(isStringLit(t), strOf(sha1(lex(t))))
  def sha256Fn(t: Column): Column = when(isStringLit(t), strOf(sha2(lex(t), 256)))
  def sha384Fn(t: Column): Column = when(isStringLit(t), strOf(sha2(lex(t), 384)))
  def sha512Fn(t: Column): Column = when(isStringLit(t), strOf(sha2(lex(t), 512)))

  // ---- datetime accessors (E_DateTime*): on the timestamp shadow value.
  // Component accessors read the LOCAL (lexical) components, so the
  // timezone designator is stripped before parsing — HOURS of
  // "…T10:00:00+05:30" is 10, not the session-zone instant hour.
  private val dtTypes = Seq(Term.XSD_DATETIME, Term.XSD + "date")
  private def tsValue(t: Column): Column =
    when(isLiteral(t) && dt(t).isin(dtTypes: _*),
      try_to_timestamp(regexp_replace(lex(t), "(Z|[+-]\\d{2}:\\d{2})$", "")))
  def yearFn(t: Column): Column = whenTs(t, year)
  def monthFn(t: Column): Column = whenTs(t, month)
  def dayFn(t: Column): Column = whenTs(t, dayofmonth)
  def hoursFn(t: Column): Column = whenTs(t, hour)
  def minutesFn(t: Column): Column = whenTs(t, minute)
  /** SECONDS(): xsd:decimal (op:seconds-from-dateTime is xs:decimal —
   * fractional seconds survive), read from the lexical seconds field. */
  def secondsFn(t: Column): Column = {
    val secLex = regexp_extract(lex(t),
      ":(\\d{2}(?:\\.\\d+)?)(?:Z|[+-]\\d{2}:\\d{2})?$", 1)
    when(tsValue(t).isNotNull && secLex =!= "",
      TermCols.decTerm(secLex.cast(DoubleType), scale = 3))
  }
  private def whenTs(t: Column, f: Column => Column): Column = {
    val ts = tsValue(t)
    when(ts.isNotNull, TermCols.intTerm(f(ts)))
  }

  // ---- datetime constructors / accessors (E_Now, E_DateTimeTZ)
  /** NOW(): one value per query execution (Spark's current_timestamp is
   * query-stable, matching the reference's per-execution now). The lexical
   * form carries the session-zone offset ("Z" for UTC) like the
   * reference's zoned xsd:dateTime — so TZ(NOW()) is non-empty. */
  def nowFn(): Column = mk(lit(Term.KIND_LIT),
    date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ssXXX"),
    lit(Term.XSD_DATETIME), lit(""))
  /** TZ(dt): timezone designator from the lexical form; "" when absent. */
  def tzFn(t: Column): Column =
    when(isLiteral(t) && dt(t).isin(dtTypes: _*),
      strOf(regexp_extract(lex(t), "(Z|[+-]\\d{2}:\\d{2})$", 1)))

  /** TIMEZONE(dt): the designator as an xsd:dayTimeDuration
   * (fn:timezone-from-dateTime); ERROR when the input carries none. */
  def timezoneFn(t: Column): Column = {
    val des = regexp_extract(lex(t), "(Z|[+-]\\d{2}:\\d{2})$", 1)
    val hh = substring(des, 2, 2).cast(IntegerType)
    val mm = substring(des, 5, 2).cast(IntegerType)
    val dur = when(des.isin("Z", "+00:00", "-00:00"), lit("PT0S"))
      .otherwise(concat(
        when(substring(des, 1, 1) === "-", "-").otherwise(""),
        lit("PT"), hh.cast(StringType), lit("H"),
        when(mm > 0, concat(mm.cast(StringType), lit("M"))).otherwise(lit(""))))
    when(isLiteral(t) && dt(t).isin(dtTypes: _*) && des =!= "",
      mk(lit(Term.KIND_LIT), dur, lit(Term.XSD + "dayTimeDuration"), lit("")))
  }

  /** RAND(): xsd:double in [0,1) — nondeterministic like the reference. */
  def randFn(): Column = TermCols.numericTerm(rand(), lit(3))

  // ---- durations + timezone adjustment (E_AdjustToTimezone,
  //      op:add-dayTimeDuration-to-dateTime — the reference's NodeValue
  //      dateTime arithmetic on our timestamp shadow)

  /** Total seconds of a dayTimeDuration lexical form (-?PnDTnHnMn(.n)S).
   * Year/month components have no fixed length in seconds → NULL (a
   * SPARQL eval error), like the reference's dayTime-only operators. */
  def durationSeconds(lx: Column): Column = {
    // regexp_extract yields "" on no match — guard the cast (ANSI throws)
    def part(re: String) = {
      val x = regexp_extract(lx, re, 1)
      when(x =!= "", x.cast(org.apache.spark.sql.types.DoubleType)).otherwise(0.0)
    }
    val sign = when(lx.startsWith("-"), -1.0).otherwise(1.0)
    val total = sign * (part("(\\d+)D") * 86400 +
      part("T(?:\\d+H)?(?:(\\d+)M)?") * 60 +
      part("(\\d+)H") * 3600 +
      part("(\\d+(?:\\.\\d+)?)S"))
    when(lx.rlike("^-?P\\d+[YM]"), lit(null).cast(org.apache.spark.sql.types.DoubleType))
      .when(lx.rlike("^-?P"), total)
  }

  private def tzDesignator(lx: Column): Column =
    regexp_extract(lx, "(Z|[+-]\\d{2}:\\d{2})$", 1)
  private def localWallTs(lx: Column): Column =
    try_to_timestamp(regexp_replace(lx, "(Z|[+-]\\d{2}:\\d{2})$", ""))

  /** ADJUST(dateTime, tz) — ARQ's E_AdjustToTimezone /
   * fn:adjust-dateTime-to-timezone: `tz` is a dayTimeDuration naming the
   * target offset, or "" to strip the designator. A ZONED input converts
   * its instant to the target offset's wall clock; an UNZONED input keeps
   * its wall clock and gains the designator. Offsets beyond ±14 h are
   * errors (NULL). */
  def adjustFn(t: Column, tz: Column): Column = {
    val lx = lex(t)
    val des = tzDesignator(lx)
    val localStr = regexp_replace(lx, "(Z|[+-]\\d{2}:\\d{2})$", "")
    val local = try_to_timestamp(localStr)
    val curOff = when(des === "", lit(null).cast(org.apache.spark.sql.types.DoubleType))
      .when(des.isin("Z", "+00:00", "-00:00"), 0.0)
      .otherwise(when(substring(des, 1, 1) === "-", -1.0).otherwise(1.0) *
        (substring(des, 2, 2).cast(org.apache.spark.sql.types.DoubleType) * 3600 +
          substring(des, 5, 2).cast(org.apache.spark.sql.types.DoubleType) * 60))
    val target = durationSeconds(lex(tz))
    val newLocal = when(curOff.isNotNull,
        (local.cast(org.apache.spark.sql.types.DoubleType) - curOff + target)
          .cast(org.apache.spark.sql.types.TimestampType))
      .otherwise(local)
    val offMin = abs(target / 60).cast(org.apache.spark.sql.types.IntegerType)
    val desOut = when(target === 0.0, lit("Z")).otherwise(concat(
      when(target < 0, "-").otherwise("+"),
      lpad(floor(offMin / 60).cast(org.apache.spark.sql.types.IntegerType)
        .cast(org.apache.spark.sql.types.StringType), 2, "0"), lit(":"),
      lpad(pmod(offMin, lit(60)).cast(org.apache.spark.sql.types.StringType), 2, "0")))
    val isDT = isLiteral(t) && dt(t) === Term.XSD_DATETIME
    when(isDT && isStringLit(tz) && lex(tz) === "",
      mk(lit(Term.KIND_LIT), localStr, lit(Term.XSD_DATETIME), lit("")))
      .when(isDT && target.isNotNull && abs(target) <= 50400 && local.isNotNull,
        mk(lit(Term.KIND_LIT),
          concat(date_format(newLocal, "yyyy-MM-dd'T'HH:mm:ss"), desOut),
          lit(Term.XSD_DATETIME), lit("")))
  }

  /** dateTime ± dayTimeDuration: wall-clock arithmetic, the designator is
   * preserved (op:add/subtract-dayTimeDuration-to-dateTime). */
  def dtAddDuration(t: Column, dur: Column, plus: Boolean): Column = {
    val lx = lex(t)
    val des = tzDesignator(lx)
    val local = localWallTs(lx)
    val secs0 = durationSeconds(lex(dur))
    val secs = if (plus) secs0 else -secs0
    when(isLiteral(t) && dt(t) === Term.XSD_DATETIME && isLiteral(dur) &&
        local.isNotNull && secs.isNotNull,
      mk(lit(Term.KIND_LIT),
        concat(date_format(
          (local.cast(org.apache.spark.sql.types.DoubleType) + secs)
            .cast(org.apache.spark.sql.types.TimestampType),
          "yyyy-MM-dd'T'HH:mm:ss"), des),
        lit(Term.XSD_DATETIME), lit("")))
  }

  /** XPath constructor casts `xsd:integer(?x)` etc. (reference: E_Cast /
   * XSDFuncOp cast table). Invalid source values are eval errors → NULL
   * term. Numeric→integer truncates toward zero (XPath fn rules). */
  def castFn(t: Column, dtIri: String): Column = {
    import TermCols._
    val lx = lex(t)
    dtIri match {
      case Term.XSD_STRING =>
        // casting goes through the VALUE space for known datatypes
        // (XSDFuncOp: "0"^^boolean → "false", 0.0 decimal → "0",
        // 0E1 double → "0", 1.25 float → "1.25"); lexical form otherwise
        val boolStr = when(lx.isin("true", "1"), "true").otherwise("false")
        val d = numValue(t)
        val numStr = when(dt(t) === Term.XSD_INTEGER, lx)
          .when(d === d.cast(org.apache.spark.sql.types.LongType)
            .cast(org.apache.spark.sql.types.DoubleType),
            d.cast(org.apache.spark.sql.types.LongType).cast(StringType))
          .otherwise(d.cast(StringType))
        when(t.isNotNull && kind(t) =!= Term.KIND_BNODE, strTerm(coalesce(
          when(isLiteral(t) && dt(t) === Term.XSD_BOOLEAN, boolStr),
          when(isNumeric(t), numStr),
          lx)))
      case Term.XSD_BOOLEAN =>
        when(isLiteral(t) && dt(t) === Term.XSD_BOOLEAN, t)
          .when(isLiteral(t) && lx.isin("true", "false"), mk(lit(Term.KIND_LIT), lx, lit(Term.XSD_BOOLEAN), lit("")))
          .when(isLiteral(t) && lx.isin("1", "0"),
            boolTerm(lx === "1"))
          .when(isNumeric(t), boolTerm(numValue(t) =!= 0.0))
      case Term.XSD_INTEGER =>
        when(isNumeric(t), intTerm(numValue(t).cast(org.apache.spark.sql.types.LongType)))
          .when(isLiteral(t) && dt(t) === Term.XSD_BOOLEAN,
            intTerm(when(lx === "true", 1L).otherwise(0L)))
          .when(isLiteral(t) && lx.rlike("^[+-]?\\d+$"), intTerm(lx.cast(org.apache.spark.sql.types.LongType)))
      case Term.XSD_DECIMAL =>
        when(isNumeric(t), numericTerm(numValue(t), lit(1)))
          .when(isLiteral(t) && dt(t) === Term.XSD_BOOLEAN,
            numericTerm(when(lx === "true", 1.0).otherwise(0.0), lit(1)))
          .when(isLiteral(t) && lx.rlike("^[+-]?(\\d+(\\.\\d*)?|\\.\\d+)$"),
            numericTerm(lx.cast(org.apache.spark.sql.types.DoubleType), lit(1)))
      case Term.XSD_FLOAT =>
        when(isNumeric(t), numericTerm(numValue(t), lit(2)))
          .when(isLiteral(t) && dt(t) === Term.XSD_BOOLEAN,
            numericTerm(when(lx === "true", 1.0).otherwise(0.0), lit(2)))
          .when(isLiteral(t) && lx.rlike("^[+-]?((\\d+(\\.\\d*)?)|(\\.\\d+))([eE][+-]?\\d+)?$"),
            numericTerm(lx.cast(org.apache.spark.sql.types.DoubleType), lit(2)))
      case Term.XSD_DOUBLE =>
        when(isNumeric(t), numericTerm(numValue(t), lit(3)))
          .when(isLiteral(t) && dt(t) === Term.XSD_BOOLEAN,
            numericTerm(when(lx === "true", 1.0).otherwise(0.0), lit(3)))
          .when(isLiteral(t) && lx.rlike("^[+-]?((\\d+(\\.\\d*)?)|(\\.\\d+))([eE][+-]?\\d+)?$"),
            numericTerm(lx.cast(org.apache.spark.sql.types.DoubleType), lit(3)))
      case Term.XSD_DATETIME =>
        when(isLiteral(t) && try_to_timestamp(lx).isNotNull,
          mk(lit(Term.KIND_LIT), lx, lit(Term.XSD_DATETIME), lit("")))
      case _ => lit(null).cast(TermCols.schema) // unsupported cast target
    }
  }

  /** BNODE(): fresh blank node per row (nondeterministic label);
   * BNODE(str): the mapping str→bnode is scoped to ONE solution row
   * (SPARQL 17.4.2.9) — equal strings in the same row give the same
   * bnode, the same string in different rows gives different bnodes. The
   * row scope rides a per-row counter (each expression instance advances
   * once per row, so two BNODE calls in one projection agree). */
  def bnodeFresh(): Column =
    mk(lit(Term.KIND_BNODE), regexp_replace(expr("uuid()"), "-", ""), lit(""), lit(""))
  def bnodeLabeled(t: Column): Column =
    when(isStringLit(t), mk(lit(Term.KIND_BNODE),
      concat(lit("r"), monotonically_increasing_id().cast(StringType),
        lit("_"), lex(t)),
      lit(""), lit("")))

  /** REGEX with optional flags ('i','s','m','x' — mapped to the
   * embedded-flag prefix Java regex understands, like the reference's
   * RegexJava; 'q' = Pattern.LITERAL has no embedded form, so the pattern
   * is quoted instead). Applies to STRING literals only — an IRI or
   * lang-tagged operand is a type error → NULL → row dropped (fn:matches
   * takes xs:string). */
  def regexFlags(t: Column, pattern: String, flags: String): Column = {
    val (pat, fl) =
      if (flags.contains('q')) (java.util.regex.Pattern.quote(pattern), flags.filterNot(_ == 'q'))
      else (pattern, flags)
    val prefix = if (fl.isEmpty) "" else s"(?$fl)"
    when(isStringLit(t), lex(t).rlike(prefix + pat))
  }

  // ---- functional forms (E_Bound, E_Coalesce, E_If, E_SameTerm, EBV)
  def bound(t: Column): Column = t.isNotNull
  def coalesceFn(ts: Column*): Column = coalesce(ts: _*)
  def ifFn(cond: Column, a: Column, b: Column): Column = when(cond, a).otherwise(b)
  def sameTerm(a: Column, b: Column): Column = TermCols.sameTerm(a, b)
  def ebv(t: Column): Column = TermCols.ebv(t)
  def toTerm(b: Column): Column = TermCols.boolTerm(b)

  // ---- UUID (E_UUID / E_StrUUID) — nondeterministic, like the reference
  def uuidIri(): Column = TermCols.iriTerm(concat(lit("urn:uuid:"), expr("uuid()")))
  def struuid(): Column = strOf(expr("uuid()"))

  // ---- RDF-star triple functions (function/library/triple/: TripleFn,
  //      SubjectFn, PredicateFn, ObjectFn, IsTripleFn). The constructor
  //      is a pure column composition (canonical text via TermCols.ntCol);
  //      the accessors re-parse the canonical text with the N-Triples line
  //      parser in a UDF — triple terms never sit on scan/join hot paths
  //      (they are opaque struct-equality values there).
  def tripleFn(s: Column, p: Column, o: Column): Column =
    when(s.isNotNull && p.isNotNull && o.isNotNull &&
      // RDF 1.2 triple-term well-formedness: subject is an IRI or bnode
      // (triple terms only appear in object position), predicate an IRI
      (kind(s) === Term.KIND_IRI || kind(s) === Term.KIND_BNODE) && isIri(p),
      mk(lit(Term.KIND_TRIPLE_TERM),
        concat(lit("<<( "), TermCols.ntCol(s), lit(" "), TermCols.ntCol(p),
          lit(" "), TermCols.ntCol(o), lit(" )>>")),
        lit(""), lit("")))
  def isTripleFn(t: Column): Column = kind(t) === Term.KIND_TRIPLE_TERM

  private val subjectUdf = udf((l: String) =>
    graft.riot.NTriples.parseTripleTermComponents(l).map(_._1).orNull)
  private val predicateUdf = udf((l: String) =>
    graft.riot.NTriples.parseTripleTermComponents(l).map(_._2).orNull)
  private val objectUdf = udf((l: String) =>
    graft.riot.NTriples.parseTripleTermComponents(l).map(_._3).orNull)
  def subjectFn(t: Column): Column = when(isTripleFn(t), subjectUdf(lex(t)))
  def predicateFn(t: Column): Column = when(isTripleFn(t), predicateUdf(lex(t)))
  def objectFn(t: Column): Column = when(isTripleFn(t), objectUdf(lex(t)))

  /** SPARQL 1.2 `=` over two triple terms: component-wise VALUE equality,
   * recursing into nested triple terms (the reference's NodeValue
   * sameValueAs triple-term branch). Three-valued: null = eval error
   * (indeterminate component comparison). Off scan/join hot paths —
   * reached only from a FILTER with both sides already triple terms. */
  private[graft] def termValueEq(x: Term, y: Term): java.lang.Boolean = {
    import graft.model.{Term => T}
    if (x == y) return java.lang.Boolean.TRUE
    if (x.kind != y.kind) return java.lang.Boolean.FALSE
    x.kind match {
      case T.KIND_TRIPLE_TERM =>
        (graft.riot.NTriples.parseTripleTermComponents(x.lex),
          graft.riot.NTriples.parseTripleTermComponents(y.lex)) match {
          case (Some((s1, p1, o1)), Some((s2, p2, o2))) =>
            val vs = Seq(termValueEq(s1, s2), termValueEq(p1, p2), termValueEq(o1, o2))
            if (vs.contains(java.lang.Boolean.FALSE)) java.lang.Boolean.FALSE
            else if (vs.contains(null)) null
            else java.lang.Boolean.TRUE
          case _ => null
        }
      case T.KIND_LIT =>
        val numericDts = Set(T.XSD_INTEGER, T.XSD_DECIMAL, T.XSD_DOUBLE, T.XSD_FLOAT,
          T.XSD + "long", T.XSD + "int", T.XSD + "short", T.XSD + "byte",
          T.XSD + "nonNegativeInteger", T.XSD + "nonPositiveInteger",
          T.XSD + "positiveInteger", T.XSD + "negativeInteger",
          T.XSD + "unsignedLong", T.XSD + "unsignedInt", T.XSD + "unsignedShort",
          T.XSD + "unsignedByte")
        def num(t: Term): Option[BigDecimal] =
          if (!numericDts(t.dt)) None
          else try {
            if (t.dt == T.XSD_DOUBLE || t.dt == T.XSD_FLOAT)
              Some(BigDecimal(t.lex.toDouble))
            else Some(BigDecimal(t.lex))
          } catch { case _: NumberFormatException => None }
        def bool(t: Term): Option[Boolean] =
          if (t.dt != T.XSD_BOOLEAN) None
          else t.lex match {
            case "true" | "1" => Some(true)
            case "false" | "0" => Some(false)
            case _ => None
          }
        (num(x), num(y)) match {
          case (Some(a), Some(b)) => java.lang.Boolean.valueOf(a == b)
          case _ => (bool(x), bool(y)) match {
            case (Some(a), Some(b)) => java.lang.Boolean.valueOf(a == b)
            case _ =>
              val knownPlain = Set(T.XSD_STRING, T.RDF_LANGSTRING)
              if (knownPlain(x.dt) && knownPlain(y.dt))
                java.lang.Boolean.valueOf(x == y) // lex+lang exact (x != y here)
              else if ((x.dt == T.RDF_LANGSTRING) != (y.dt == T.RDF_LANGSTRING))
                java.lang.Boolean.FALSE // disjoint lang/plain spaces
              else null // unknown/temporal space, differing terms → eval error
          }
        }
      case _ => java.lang.Boolean.FALSE // IRIs/bnodes: identity only
    }
  }

  private val tripleEqUdf = udf { (a: String, b: String) =>
    val r = termValueEq(Term(Term.KIND_TRIPLE_TERM, a, "", ""),
      Term(Term.KIND_TRIPLE_TERM, b, "", ""))
    if (r == null) Option.empty[Boolean] else Some(r.booleanValue)
  }
  /** Column form of [[termValueEq]] over two triple-term columns. */
  def tripleValueEq(a: Column, b: Column): Column = tripleEqUdf(lex(a), lex(b))
}
