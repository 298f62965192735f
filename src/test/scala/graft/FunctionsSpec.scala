package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.algebra._
import graft.functions.{SparqlFunctions => SF}
import graft.model.{Term, Triple}
import graft.ops.Graphs

/** SPARQL function library + aggregates + CONSTRUCT + graph compose ops
 * (SURVEY.md §2.4/2.7/2.9, §3.A-4). */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val EX = "http://example/"

  private def one(terms: Term*): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(terms.indices.map(i =>
      StructField(s"t$i", TermCols.schema, nullable = true)))
    spark.createDataFrame(
      java.util.List.of(Row(terms.map(t => Row(t.kind, t.lex, t.dt, t.lang)): _*)),
      schema)
  }

  private def evalT(df: DataFrame, c: org.apache.spark.sql.Column): Term = {
    val r = df.select(c.as("r")).head().getAs[Row]("r")
    if (r == null) null
    else Term(r.getAs[Byte]("kind"), r.getAs[String]("lex"),
      r.getAs[String]("dt"), r.getAs[String]("lang"))
  }

  test("string functions: STR/STRLEN/UCASE/SUBSTR/STRBEFORE/STRAFTER/REPLACE") {
    val df = one(Term.langLit("Hello World", "en"), Term.iri(EX + "x"))
    assert(evalT(df, SF.str(col("t0"))) == Term.string("Hello World"))
    assert(evalT(df, SF.str(col("t1"))) == Term.string(EX + "x"))
    assert(evalT(df, SF.strlen(col("t0"))) == Term.lit("11", Term.XSD_INTEGER))
    // string ops preserve the language tag (SPARQL 17.4.3)
    assert(evalT(df, SF.ucase(col("t0"))) == Term.langLit("HELLO WORLD", "en"))
    assert(evalT(df, SF.substrFn(col("t0"), lit(1), Some(lit(5)))) == Term.langLit("Hello", "en"))
    val ab = one(Term.string("aXbXc"), Term.string("X"))
    assert(evalT(ab, SF.strbefore(col("t0"), col("t1"))) == Term.string("a"))
    assert(evalT(ab, SF.strafter(col("t0"), col("t1"))) == Term.string("bXc"))
    assert(evalT(ab, SF.replaceFn(col("t0"), struct(lit(2.toByte).as("kind"),
      lit("X").as("lex"), lit("").as("dt"), lit("").as("lang")), struct(
      lit(2.toByte).as("kind"), lit("-").as("lex"), lit("").as("dt"),
      lit("").as("lang")))) == Term.string("a-b-c"))
  }

  test("type errors evaluate to NULL (SPARQL eval error)") {
    val df = one(Term.iri(EX + "x"))
    assert(evalT(df, SF.strlen(col("t0"))) == null) // STRLEN of an IRI
    assert(evalT(df, SF.ucase(col("t0"))) == null)
    assert(evalT(df, SF.langFn(col("t0"))) == null)
  }

  test("term functions: LANG/DATATYPE/IRI/STRDT/STRLANG") {
    val df = one(Term.langLit("chat", "fr"), Term.string(EX + "made"),
      Term.lit("42", Term.XSD_INTEGER))
    assert(evalT(df, SF.langFn(col("t0"))) == Term.string("fr"))
    assert(evalT(df, SF.datatype(col("t2"))) == Term.iri(Term.XSD_INTEGER))
    assert(evalT(df, SF.datatype(col("t0"))) == Term.iri(Term.RDF_LANGSTRING))
    assert(evalT(df, SF.iriFn(col("t1"))) == Term.iri(EX + "made"))
    assert(evalT(df, SF.strdt(col("t1"), SF.iriFn(col("t1")))).dt == EX + "made")
  }

  test("numeric + hash + datetime") {
    val df = one(Term.lit("-2.5", Term.XSD_DECIMAL),
      Term.string("abc"), Term.lit("2024-03-05T10:15:30", Term.XSD_DATETIME))
    assert(evalT(df, SF.absFn(col("t0"))).lex == "2.5")
    assert(evalT(df, SF.floorFn(col("t0"))).lex == "-3.0")
    assert(evalT(df, SF.md5Fn(col("t1"))).lex == "900150983cd24fb0d6963f7d28e17f72")
    assert(evalT(df, SF.yearFn(col("t2"))) == Term.lit("2024", Term.XSD_INTEGER))
    assert(evalT(df, SF.hoursFn(col("t2"))) == Term.lit("10", Term.XSD_INTEGER))
    // NOW() emits a ZONED dateTime (reference behavior) — TZ(NOW()) is
    // non-empty ("Z" in the UTC session zone)
    val now = evalT(df, SF.nowFn())
    assert(now.dt == Term.XSD_DATETIME && now.lex.matches(".*([Zz]|[+-]\\d{2}:\\d{2})$"),
      s"NOW() lexical form must carry a timezone designator: ${now.lex}")
    val tzOfNow = evalT(df, SF.tzFn(SF.nowFn()))
    assert(tzOfNow != null && tzOfNow.lex.nonEmpty)
  }

  test("ADJUST + duration arithmetic (E_AdjustToTimezone, dayTimeDuration)") {
    val df = one(Term.lit("2024-03-05T10:15:30+01:00", Term.XSD_DATETIME),
      Term.lit("2024-03-05T23:30:00Z", Term.XSD_DATETIME),
      Term.lit("2024-03-05T10:15:30", Term.XSD_DATETIME))
    def dur(s0: String) = TermCols.const(Term.lit(s0, Term.XSD + "dayTimeDuration"))
    // zoned → new offset converts the instant's wall clock
    assert(evalT(df, SF.adjustFn(col("t0"), dur("PT0S")))
      == Term.lit("2024-03-05T09:15:30Z", Term.XSD_DATETIME))
    assert(evalT(df, SF.adjustFn(col("t0"), dur("PT5H30M")))
      == Term.lit("2024-03-05T14:45:30+05:30", Term.XSD_DATETIME))
    // unzoned keeps its wall clock and gains the designator
    assert(evalT(df, SF.adjustFn(col("t2"), dur("PT5H30M")))
      == Term.lit("2024-03-05T10:15:30+05:30", Term.XSD_DATETIME))
    // "" strips the designator
    assert(evalT(df, SF.adjustFn(col("t0"), TermCols.const(Term.string(""))))
      == Term.lit("2024-03-05T10:15:30", Term.XSD_DATETIME))
    // dateTime ± dayTimeDuration: wall-clock arithmetic, designator kept
    assert(evalT(df, SF.dtAddDuration(col("t1"), dur("PT45M"), plus = true))
      == Term.lit("2024-03-06T00:15:00Z", Term.XSD_DATETIME))
    assert(evalT(df, SF.dtAddDuration(col("t1"), dur("P1DT2H"), plus = false))
      == Term.lit("2024-03-04T21:30:00Z", Term.XSD_DATETIME))
    // year/month durations have no fixed seconds → eval error (unbound)
    assert(df.select(SF.dtAddDuration(col("t1"), dur("P1M"), plus = true).as("r"))
      .head().getAs[Row]("r") == null)
    // cross-timezone equality through the zoned shadow: +01:00 == Z form
    val g = spark.createDataset(Seq(
      Triple(Term.iri("urn:x"), Term.iri("urn:y"), Term.iri("urn:z")))).toDF()
    val q = Compiler.compile(graft.sparql.Parser.parse(
      """PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
         SELECT ?x WHERE {
           VALUES ?x { 1 }
           FILTER("2024-03-05T10:15:30+01:00"^^xsd:dateTime =
                  "2024-03-05T09:15:30Z"^^xsd:dateTime)
         }"""), g)
    assert(q.count() == 1)
  }

  test("DISTINCT aggregates: SUM/AVG/GROUP_CONCAT (AggSumDistinct family)") {
    val vals = Seq(
      Term.lit("1", Term.XSD_INTEGER), Term.lit("1", Term.XSD_INTEGER),
      Term.lit("01", Term.XSD_INTEGER), // same VALUE as "1" — distinct term
      Term.lit("2", Term.XSD_INTEGER))
    val df = spark.createDataset(vals.map(Tuple1(_))).toDF("v")
    def agg1(c: org.apache.spark.sql.Column): Term = {
      val r = df.agg(c.as("r")).head().getAs[Row]("r")
      if (r == null) null else Term(r.getByte(0), r.getString(1), r.getString(2), r.getString(3))
    }
    assert(agg1(SparqlAggregates.sumDistinctAgg(col("v"))) == Term.lit("3", Term.XSD_INTEGER))
    assert(agg1(SparqlAggregates.avgDistinctAgg(col("v"))) == Term.lit("1.5", Term.XSD_DECIMAL))
    assert(agg1(SparqlAggregates.groupConcatDistinct(col("v"), ",")).lex == "01,1,2")
  }

  test("aggregates: sum/avg poisoned by non-numeric; min over term order; concat") {
    val vals = Seq(
      Term.lit("1", Term.XSD_INTEGER), Term.lit("2", Term.XSD_INTEGER),
      Term.lit("4", Term.XSD_INTEGER))
    val df = spark.createDataset(vals.map(t => Tuple1(t))).toDF("v")
    def agg1(c: org.apache.spark.sql.Column): Term = {
      val r = df.agg(c.as("r")).head().getAs[Row]("r")
      if (r == null) null else Term(r.getByte(0), r.getString(1), r.getString(2), r.getString(3))
    }
    assert(agg1(SparqlAggregates.sumAgg(col("v"))).lex.toDouble == 7.0)
    assert(agg1(SparqlAggregates.avgAgg(col("v"))).lex.toDouble > 2.33
      && agg1(SparqlAggregates.avgAgg(col("v"))).lex.toDouble < 2.34)
    assert(agg1(SparqlAggregates.minAgg(col("v"))).lex == "1")
    assert(agg1(SparqlAggregates.maxAgg(col("v"))).lex == "4")
    assert(agg1(SparqlAggregates.medianAgg(col("v"))).lex.toDouble == 2.0)
    assert(agg1(SparqlAggregates.groupConcat(col("v"), ",")).lex == "1,2,4")

    // poisoned: one non-numeric bound value → sum is unbound
    val poisoned = spark.createDataset(
      (vals :+ Term.string("oops")).map(t => Tuple1(t))).toDF("v")
    assert(poisoned.agg(SparqlAggregates.sumAgg(col("v")).as("r")).head().getAs[Row]("r") == null)
    // but COUNT still works
    val cnt = poisoned.agg(SparqlAggregates.countVar(col("v")).as("r")).head().getAs[Row]("r")
    assert(cnt.getString(1) == "4")
  }

  test("XSD promotion: arithmetic + SUM/AVG result types; MIN skips unbound") {
    import graft.functions.{SparqlFunctions => SF}
    val one = spark.range(1)
      .select(TermCols.const(Term.lit("1", Term.XSD_INTEGER)).as("a"),
        TermCols.const(Term.lit("2.5", Term.XSD_DECIMAL)).as("d"))
    def t(c: org.apache.spark.sql.Column): Term = {
      val r = one.select(c.as("r")).head().getAs[Row]("r")
      Term(r.getByte(0), r.getString(1), r.getString(2), r.getString(3))
    }
    // integer + integer stays integer (no trailing .0), NodeValue ladder
    assert(t(SF.numAdd(col("a"), col("a"))) == Term.lit("2", Term.XSD_INTEGER))
    // integer + decimal promotes to decimal
    assert(t(SF.numericBinOp(col("a"), col("d"), _ + _)) == Term.lit("3.5", Term.XSD_DECIMAL))
    // integer / integer is decimal (op:numeric-divide)
    assert(t(SF.numericBinOp(col("a"), col("a"), _ / _, isDivide = true))
      == Term.lit("1.0", Term.XSD_DECIMAL))
    // division by zero (XPath op:numeric-divide): eval ERROR → unbound for
    // integer/decimal operands; IEEE INF / NaN for double operands — and
    // never an ANSI-mode SparkArithmeticException or a malformed struct
    val zero = TermCols.const(Term.lit("0", Term.XSD_INTEGER))
    assert(one.select(SF.numericBinOp(col("a"), zero, _ / _, isDivide = true).as("r"))
      .head().getAs[Row]("r") == null)
    assert(one.select(SF.numericBinOp(zero, zero, _ / _, isDivide = true).as("r"))
      .head().getAs[Row]("r") == null) // integer 0/0 → error → unbound
    val dblOne = TermCols.const(Term.lit("1.0", Term.XSD_DOUBLE))
    val dblZero = TermCols.const(Term.lit("0.0", Term.XSD_DOUBLE))
    assert(t(SF.numericBinOp(dblOne, dblZero, _ / _, isDivide = true))
      == Term.lit("INF", Term.XSD_DOUBLE))
    assert(t(SF.numericBinOp(dblZero, dblZero, _ / _, isDivide = true))
      == Term.lit("NaN", Term.XSD_DOUBLE))

    val ints = Seq(Term.lit("1", Term.XSD_INTEGER), Term.lit("2", Term.XSD_INTEGER))
    val withNull = spark.createDataset(
      ints.map(t0 => Tuple1(t0)) :+ Tuple1(null.asInstanceOf[Term])).toDF("v")
    def agg1(c: org.apache.spark.sql.Column): Term = {
      val r = withNull.agg(c.as("r")).head().getAs[Row]("r")
      if (r == null) null else Term(r.getByte(0), r.getString(1), r.getString(2), r.getString(3))
    }
    // SUM over integers is "3"^^xsd:integer, AVG is decimal (XPath fn:avg)
    assert(agg1(SparqlAggregates.sumAgg(col("v"))) == Term.lit("3", Term.XSD_INTEGER))
    assert(agg1(SparqlAggregates.avgAgg(col("v"))) == Term.lit("1.5", Term.XSD_DECIMAL))
    // MIN/MAX skip the unbound row instead of returning unbound
    assert(agg1(SparqlAggregates.minAgg(col("v"))).lex == "1")
    assert(agg1(SparqlAggregates.maxAgg(col("v"))).lex == "2")
  }

  test("RDF-star triple functions + CDT maps + custom registries") {
    import graft.functions.{CdtMap, Registry, SparqlFunctions => SF}
    val row = spark.range(1).select(
      TermCols.const(Term.iri(EX + "s")).as("s"),
      TermCols.const(Term.iri(EX + "p")).as("p"),
      TermCols.const(Term.langLit("hi", "en")).as("o"))
    def t(c: org.apache.spark.sql.Column): Term = {
      val r = row.select(c.as("r")).head().getAs[Row]("r")
      if (r == null) null else Term(r.getByte(0), r.getString(1), r.getString(2), r.getString(3))
    }
    // constructor → accessors round-trip through the canonical text
    val tt = t(SF.tripleFn(col("s"), col("p"), col("o")))
    assert(tt.kind == Term.KIND_TRIPLE_TERM)
    assert(t(SF.subjectFn(SF.tripleFn(col("s"), col("p"), col("o")))) == Term.iri(EX + "s"))
    assert(t(SF.objectFn(SF.tripleFn(col("s"), col("p"), col("o")))) == Term.langLit("hi", "en"))
    // ill-formed: literal subject → NULL (eval error)
    assert(t(SF.tripleFn(col("o"), col("p"), col("s"))) == null)

    // CDT maps
    val m = spark.range(1).select(
      org.apache.spark.sql.functions.map(
        org.apache.spark.sql.functions.lit("a"), org.apache.spark.sql.functions.lit(1),
        org.apache.spark.sql.functions.lit("b"), org.apache.spark.sql.functions.lit(2)).as("m"))
    assert(m.select(CdtMap.mapGet(col("m"),
      org.apache.spark.sql.functions.lit("b")).as("v")).head().getInt(0) == 2)
    assert(m.select(CdtMap.mapSize(col("m")).as("n")).head().getInt(0) == 2)
    val put = m.select(CdtMap.mapPut(col("m"),
      org.apache.spark.sql.functions.lit("a"), org.apache.spark.sql.functions.lit(9)).as("m2"))
    assert(put.select(CdtMap.mapGet(col("m2"),
      org.apache.spark.sql.functions.lit("a")).as("v")).head().getInt(0) == 9)

    // custom registries resolve from SPARQL text after the built-ins
    Registry.registerFunction("shout",
      args => SF.ucase(args.head))
    Registry.registerAggregate("maxlen",
      c => TermCols.intTerm(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.length(TermCols.lex(c)))))
    try {
      val g2 = spark.createDataset(Seq(
        Triple(Term.iri(EX + "a"), Term.iri(EX + "name"), Term.string("ann")),
        Triple(Term.iri(EX + "b"), Term.iri(EX + "name"), Term.string("beatrix"))))(
        org.apache.spark.sql.Encoders.product[Triple]).toDF()
      val rows = graft.algebra.Compiler.compile(graft.sparql.Parser.parse(
        s"""PREFIX ex: <$EX>
            SELECT (SHOUT(?n) AS ?u) WHERE { ex:a ex:name ?n }"""), g2).head()
      assert(rows.getAs[Row](0).getString(1) == "ANN")
      val agg = graft.algebra.Compiler.compile(graft.sparql.Parser.parse(
        s"""PREFIX ex: <$EX>
            SELECT (MAXLEN(?n) AS ?m) WHERE { ?s ex:name ?n }"""), g2).head()
      assert(agg.getAs[Row](0).getString(1) == "7")
    } finally {
      Registry.unregisterFunction("shout")
      Registry.unregisterAggregate("maxlen")
    }
  }

  test("CONSTRUCT: substitution, skipped incomplete rows, per-row bnodes") {
    val g = spark.createDataset(Seq(
      Triple(Term.iri(EX + "a"), Term.iri(EX + "name"), Term.string("A")),
      Triple(Term.iri(EX + "b"), Term.iri(EX + "name"), Term.string("B")),
      Triple(Term.iri(EX + "a"), Term.iri(EX + "mail"), Term.string("a@x")))).toDF()
    val solutions = Compiler.compile(
      LeftJoin(
        Bgp(Seq(TriplePattern(TVar("s"), TConst(Term.iri(EX + "name")), TVar("n")))),
        Bgp(Seq(TriplePattern(TVar("s"), TConst(Term.iri(EX + "mail")), TVar("m"))))), g)
    val out = Construct.construct(Seq(
      // ?s ex:label ?n  +  _:c ex:about ?s  +  ?s ex:mailbox ?m (partial)
      TriplePattern(TVar("s"), TConst(Term.iri(EX + "label")), TVar("n")),
      TriplePattern(TConst(Term.bnode("c")), TConst(Term.iri(EX + "about")), TVar("s")),
      TriplePattern(TVar("s"), TConst(Term.iri(EX + "mailbox")), TVar("m"))), solutions)
    val rows = out.collect()
    // 2 labels + 2 bnode-abouts + 1 mailbox (b has no mail → skipped)
    assert(rows.length == 5)
    val bnodes = rows.filter(_.getAs[Row]("s").getByte(0) == Term.KIND_BNODE)
      .map(_.getAs[Row]("s").getString(1)).toSet
    assert(bnodes.size == 2) // fresh bnode per solution row
  }

  test("graph compose: union/intersection/difference/delta set semantics") {
    def g(ts: Triple*): DataFrame = spark.createDataset(ts).toDF()
    val t1 = Triple(Term.iri(EX + "a"), Term.iri(EX + "p"), Term.string("1"))
    val t2 = Triple(Term.iri(EX + "b"), Term.iri(EX + "p"), Term.string("2"))
    val t3 = Triple(Term.iri(EX + "c"), Term.iri(EX + "p"), Term.string("3"))
    assert(Graphs.union(g(t1, t2), g(t2, t3)).count() == 3)
    assert(Graphs.intersection(g(t1, t2), g(t2, t3)).count() == 1)
    assert(Graphs.difference(g(t1, t2), g(t2, t3)).count() == 1)
    val after = Graphs.applyDelta(g(t1, t2), Graphs.Delta(g(t3), g(t1)))
    val lexes = after.collect().map(_.getAs[Row]("s").getString(1)).toSet
    assert(lexes == Set(EX + "b", EX + "c"))
  }
}
