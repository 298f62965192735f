package graft.riot

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.algebra.TermCols
import graft.model.Term

/**
 * SPARQL result-set writers (SURVEY.md §2.1 "result-set I/O"; reference:
 * riot/rowset/rw/RowSetWriterJSON.java and RowSetWriterCSV.java). A
 * solution DataFrame (one term-struct column per variable) serializes to:
 *
 *  - the W3C "SPARQL 1.1 Query Results JSON Format": one binding object
 *    per row, built entirely with column expressions (`to_json` over a
 *    struct of per-var objects) — distributed, no driver loop;
 *  - the Results CSV format: lexical forms only, Spark's csv writer.
 */
object ResultSetIO {

  /** One results-JSON binding object per solution row (distributed). */
  def bindingsJson(solutions: DataFrame): Dataset[String] = {
    val spark = solutions.sparkSession
    import spark.implicits._
    val vars = solutions.columns.toSeq
    val obj = struct(vars.map(v => termJson(col(v)).as(v)): _*)
    solutions.select(to_json(obj, Map("ignoreNullFields" -> "true")).as("j")).as[String]
  }

  /** Whole W3C results document (head + bindings); collects — intended for
   * query RESULTS, which are small by construction (LIMIT'd / aggregated).
   * For bulk exports use `bindingsJson` + write.text. */
  def toSparqlJson(solutions: DataFrame): String = {
    val vars = solutions.columns.toSeq
    val head = vars.map("\"" + _ + "\"").mkString("[", ",", "]")
    val rows = bindingsJson(solutions).collect()
    s"""{"head":{"vars":$head},"results":{"bindings":[${rows.mkString(",")}]}}"""
  }

  /** Per-term JSON object column: {"type":…,"value":…,(...)}. A combined
   * dirLang tag ("en--ltr", the storage convention) splits into xml:lang
   * + its:dir — the form this file's own readers (and conformant
   * writers) use; emitting the combined tag would be an invalid BCP47
   * xml:lang. (Known limit: triple-term bindings serialize their <<( )>>
   * text as a literal; the readers accept the nested "triple" form.) */
  private def termJson(t: Column): Column = {
    val typ = when(TermCols.kind(t) === Term.KIND_IRI, "uri")
      .when(TermCols.kind(t) === Term.KIND_BNODE, "bnode")
      .otherwise("literal")
    val lang = TermCols.lang(t)
    val baseLang = when(lang.contains("--"), substring_index(lang, "--", 1))
      .otherwise(lang)
    val dir = when(lang.contains("--"), substring_index(lang, "--", -1))
      .otherwise(lit(""))
    when(t.isNotNull, struct(
      typ.as("type"),
      TermCols.lex(t).as("value"),
      when(TermCols.isLiteral(t) && baseLang =!= "", baseLang).as("xml:lang"),
      when(TermCols.isLiteral(t) && dir =!= "", dir).as("its:dir"),
      when(TermCols.isLiteral(t) && TermCols.lang(t) === "" &&
        TermCols.dt(t) =!= "" && TermCols.dt(t) =!= Term.XSD_STRING,
        TermCols.dt(t)).as("datatype")))
  }

  /** SPARQL results CSV: header of variable names, lexical values —
   * bnodes carry the _: marker the format requires (RowSetWriterCSV). */
  def writeCsv(solutions: DataFrame, path: String): Unit =
    solutions.select(solutions.columns.map(v =>
      when(TermCols.kind(col(v)) === Term.KIND_BNODE,
          concat(lit("_:"), TermCols.lex(col(v))))
        .otherwise(TermCols.lex(col(v))).as(v)): _*)
      .write.mode("overwrite").option("header", "true").csv(path)

  // ---------------------------------------------------------------- XML/TSV

  private def xmlEscape(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    .replace("\"", "&quot;")

  /** W3C "SPARQL Query Results XML Format" document (RowSetWriterXML).
   * Collects — result-set documents are small by construction. */
  def toSparqlXml(solutions: DataFrame): String = {
    val vars = solutions.columns.toSeq
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\"?>\n")
    sb.append("<sparql xmlns=\"http://www.w3.org/2005/sparql-results#\"" +
      " xmlns:its=\"http://www.w3.org/2005/11/its\">\n<head>")
    vars.foreach(v => sb.append(s"""<variable name="${xmlEscape(v)}"/>"""))
    sb.append("</head>\n<results>\n")
    solutions.collect().foreach { r =>
      sb.append("<result>")
      vars.zipWithIndex.foreach { case (v, idx) =>
        val t = r.getAs[org.apache.spark.sql.Row](idx)
        if (t != null) {
          sb.append(s"""<binding name="${xmlEscape(v)}">""")
          val (kind, lex, dt, lang) = (t.getByte(0), t.getString(1), t.getString(2), t.getString(3))
          kind match {
            case Term.KIND_IRI => sb.append(s"<uri>${xmlEscape(lex)}</uri>")
            case Term.KIND_BNODE => sb.append(s"<bnode>${xmlEscape(lex)}</bnode>")
            case _ =>
              // combined dirLang tag splits to xml:lang + its:dir (the
              // form the readers consume; "en--ltr" is not valid BCP47)
              val (baseLang, dirPart) = lang.split("--", 2) match {
                case Array(b, d) => (b, d)
                case _ => (lang, "")
              }
              if (baseLang.nonEmpty && dirPart.nonEmpty)
                sb.append(s"""<literal xml:lang="${xmlEscape(baseLang)}" its:dir="${xmlEscape(dirPart)}">${xmlEscape(lex)}</literal>""")
              else if (lang.nonEmpty)
                sb.append(s"""<literal xml:lang="${xmlEscape(lang)}">${xmlEscape(lex)}</literal>""")
              else if (dt.nonEmpty && dt != Term.XSD_STRING)
                sb.append(s"""<literal datatype="${xmlEscape(dt)}">${xmlEscape(lex)}</literal>""")
              else sb.append(s"<literal>${xmlEscape(lex)}</literal>")
          }
          sb.append("</binding>")
        }
      }
      sb.append("</result>\n")
    }
    sb.append("</results>\n</sparql>\n")
    sb.toString
  }

  /** SPARQL results TSV lines (RowSetWriterTSV): full term syntax (via
   * TermCols.ntCol), one row per line — distributed; prepend `tsvHeader`
   * when writing a file. */
  def bindingsTsv(solutions: DataFrame): Dataset[String] = {
    val spark = solutions.sparkSession
    import spark.implicits._
    solutions.select(concat_ws("\t",
      solutions.columns.map(v => TermCols.ntCol(col(v))): _*).as("l")).as[String]
  }

  def tsvHeader(solutions: DataFrame): String =
    solutions.columns.map("?" + _).mkString("\t")

  /** Whole TSV document (header + rows); collects like toSparqlJson. */
  def toTsv(solutions: DataFrame): String =
    (tsvHeader(solutions) +: bindingsTsv(solutions).collect().toSeq).mkString("\n")

  // ---------------------------------------------------------------- readers
  // (RowSetReaderJSON / RowSetReaderXML): parse a results document back to
  // a solution DataFrame — the ingredient for manifest-style golden gates
  // (compare an engine run against a stored .srj/.srx file).

  import org.apache.spark.sql.{Row, SparkSession}
  import org.apache.spark.sql.types.{StructField, StructType}

  private def solutionsDf(spark: SparkSession, vars: Seq[String],
                          rows: Seq[Row]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(vars.map(v => StructField(v, TermCols.schema, nullable = true))))

  /** Quote bare identifiers OUTSIDE string literals (lenient-JSON last
   * resort); true/false/null stay bare. Tracks string state + escapes so
   * text inside values is never rewritten. */
  private def quoteBareIdents(s: String): String = {
    val out = new StringBuilder(s.length + 16)
    var i = 0
    var inStr = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        out.append(c)
        if (c == '\\' && i + 1 < s.length) { out.append(s.charAt(i + 1)); i += 1 }
        else if (c == '"') inStr = false
        i += 1
      } else if (c == '"') { inStr = true; out.append(c); i += 1 }
      else if (c.isDigit || (c == '-' && i + 1 < s.length && s.charAt(i + 1).isDigit)) {
        // pass a whole number token through (incl. 1e5 — its 'e' must not
        // be captured as an identifier)
        out.append(c); i += 1
        while (i < s.length && (s.charAt(i).isDigit || "+-.eE".contains(s.charAt(i)))) {
          out.append(s.charAt(i)); i += 1
        }
      }
      else if (c.isLetter || c == '_') {
        val start = i
        while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
        val word = s.substring(start, i)
        if (word == "true" || word == "false" || word == "null") out.append(word)
        else out.append('"').append(word).append('"')
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  private def termRow(typ: String, value: String, lang: String, dt: String): Row =
    typ match {
      case "uri" => Row(Term.KIND_IRI, value, "", "")
      case "bnode" => Row(Term.KIND_BNODE, value, "", "")
      case _ => // "literal" | "typed-literal" (legacy)
        // JENA-1563 (TestResultSet.rs_xmllang_datatype_2): a lang-tagged
        // binding may carry an explicit datatype only if it IS
        // rdf:langString/dirLangString — anything else is a reader error
        if (lang.nonEmpty && dt.nonEmpty && dt != Term.RDF_LANGSTRING &&
            dt != Chars.RDF_DIR_LANG_STRING)
          throw new IllegalArgumentException(
            s"lang-tagged result binding with incompatible datatype <$dt>")
        val dt2 = if (lang.nonEmpty) Term.RDF_LANGSTRING
          else if (dt.nonEmpty) dt else Term.XSD_STRING
        Row(Term.KIND_LIT, value, dt2, Term.canonLangTag(lang))
    }

  private def rowToTerm(r: Row): Term =
    Term(r.getByte(0), r.getString(1), r.getString(2), r.getString(3))

  /** A `"type":"triple"` binding (SPARQL 1.2 results-JSON): nested
   * subject/predicate/object term objects → canonical triple-term text. */
  private def tripleTermRow(sR: Row, pR: Row, oR: Row): Row =
    Row(Term.KIND_TRIPLE_TERM,
      "<<( " + rowToTerm(sR).toNTriples + " " + rowToTerm(pR).toNTriples + " " +
        rowToTerm(oR).toNTriples + " )>>", "", "")

  /** Parse a W3C results-JSON document (via Jackson, which ships with
   * Spark) into a solution DataFrame. */
  def fromSparqlJson(spark: SparkSession, json: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    // the reference's JSON result reader is lenient (some of its own test
    // fixtures use unquoted keys / single quotes — ARQ Lateral *.srj)
    mapper.configure(
      com.fasterxml.jackson.core.JsonParser.Feature.ALLOW_UNQUOTED_FIELD_NAMES, true)
    mapper.configure(
      com.fasterxml.jackson.core.JsonParser.Feature.ALLOW_SINGLE_QUOTES, true)
    val root =
      try mapper.readTree(json)
      catch {
        case _: com.fasterxml.jackson.core.JsonProcessingException =>
          // last resort for bare identifiers in VALUE position (e.g. an
          // unquoted var name inside "vars": [ "s", z ]) — quote them,
          // QUOTE-AWARE: a regex sweep would also fire inside string
          // values ("tags [alpha]") and corrupt the document
          mapper.readTree(quoteBareIdents(json))
      }
    val vars = root.path("head").path("vars").elements().asScala.map(_.asText).toSeq
    def jsonTerm(n: com.fasterxml.jackson.databind.JsonNode): Row =
      if (n.path("type").asText == "triple") {
        val v = n.path("value")
        tripleTermRow(jsonTerm(v.path("subject")), jsonTerm(v.path("predicate")),
          jsonTerm(v.path("object")))
      } else {
        // SPARQL 1.2 dirLangString bindings carry "its:dir" next to
        // "xml:lang" — stored combined ("en--ltr") in the lang slot
        val lang0 = Option(n.get("xml:lang")).map(_.asText).getOrElse("")
        val dir = Option(n.get("its:dir")).map(_.asText).getOrElse("")
        termRow(n.path("type").asText,
          n.path("value").asText,
          if (dir.nonEmpty) lang0 + "--" + dir else lang0,
          Option(n.get("datatype")).map(_.asText).getOrElse(""))
      }
    val rows = root.path("results").path("bindings").elements().asScala.map { b =>
      Row(vars.map { v =>
        val n = b.get(v)
        if (n == null) null else jsonTerm(n)
      }: _*)
    }.toSeq
    solutionsDf(spark, vars, rows)
  }

  /** Parse a SPARQL results TSV document (RowSetReaderTSV): header of
   * ?vars, then full term syntax per cell (the N-Triples line parser
   * reads each cell; empty cell = unbound). */
  def fromTsv(spark: SparkSession, tsv: String): DataFrame = {
    // drop only the trailing newline artifact: an EMPTY body line is a
    // real solution row with the (single) variable unbound — filtering
    // all empties silently changed cardinality on write→read
    val lines0 = tsv.split("\n", -1).toSeq
    val lines = if (lines0.nonEmpty && lines0.last.isEmpty)
      lines0.dropRight(1) else lines0
    require(lines.nonEmpty, "empty TSV document")
    val vars = lines.head.split("\t").map(_.trim.stripPrefix("?")).toSeq
    val rows = lines.tail.toSeq.map { line =>
      val cells = line.split("\t", -1)
      Row(vars.indices.map { i =>
        val cell = if (i < cells.length) cells(i).trim else ""
        if (cell.isEmpty) null
        else {
          // SPARQL TSV (SPARQL 1.1 Results CSV/TSV §4): numbers and
          // booleans may appear BARE, typed by their lexical form
          val t =
            if (cell.matches("[+-]?\\d+")) Term.lit(cell, Term.XSD_INTEGER)
            else if (cell.matches("[+-]?\\d*\\.\\d+")) Term.lit(cell, Term.XSD_DECIMAL)
            else if (cell.matches("[+-]?(\\d+(\\.\\d*)?|\\.\\d+)[eE][+-]?\\d+"))
              Term.lit(cell, Term.XSD_DOUBLE)
            else if (cell == "true" || cell == "false") Term.lit(cell, Term.XSD_BOOLEAN)
            else NTriples.parseTerm(cell)
          Row(t.kind, t.lex, t.dt, t.lang)
        }
      }: _*)
    }
    solutionsDf(spark, vars, rows)
  }

  /** Parse a W3C results-XML document (JDK DOM — no extra deps). */
  def fromSparqlXml(spark: SparkSession, xml: String): DataFrame = {
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    // results documents are DATA: no DTDs, no external entities (XXE)
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    dbf.setFeature("http://xml.org/sax/features/external-general-entities", false)
    dbf.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    dbf.setXIncludeAware(false)
    dbf.setExpandEntityReferences(false)
    val doc = dbf.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
    def elems(parent: org.w3c.dom.Element, name: String): Seq[org.w3c.dom.Element] = {
      val nl = parent.getElementsByTagName(name)
      (0 until nl.getLength).map(nl.item(_).asInstanceOf[org.w3c.dom.Element])
    }
    val rootE = doc.getDocumentElement
    val vars = elems(rootE, "variable").map(_.getAttribute("name"))
    val rows = elems(rootE, "result").map { res =>
      val bound = elems(res, "binding").flatMap { b =>
        val name = b.getAttribute("name")
        // an EMPTY <binding> element (no term child) appears in some W3C
        // files (e.g. sparql11/service/service07.srx) — read as unbound,
        // like the reference's reader
        val childOpt = {
          val nl = b.getChildNodes
          (0 until nl.getLength).map(nl.item)
            .collectFirst { case e: org.w3c.dom.Element => e }
        }
        childOpt.map { child =>
        def xmlTerm(e: org.w3c.dom.Element): Row = e.getTagName match {
          case "uri" => termRow("uri", e.getTextContent, "", "")
          case "bnode" => termRow("bnode", e.getTextContent, "", "")
          case "literal" =>
            val lang0 = Option(e.getAttribute("xml:lang")).getOrElse("")
            val dir = Option(e.getAttribute("its:dir")).getOrElse("")
            termRow("literal", e.getTextContent,
              if (dir.nonEmpty) lang0 + "--" + dir else lang0,
              Option(e.getAttribute("datatype")).getOrElse(""))
          case "triple" => // SPARQL 1.2: <triple><subject>…<predicate>…<object>…
            def slot(tag: String): Row = {
              val nl = e.getChildNodes
              val holder = (0 until nl.getLength).map(nl.item).collectFirst {
                case c: org.w3c.dom.Element if c.getTagName == tag => c
              }.getOrElse(throw new IllegalArgumentException(s"<triple> missing <$tag>"))
              val hn = holder.getChildNodes
              xmlTerm((0 until hn.getLength).map(hn.item).collectFirst {
                case c: org.w3c.dom.Element => c
              }.getOrElse(throw new IllegalArgumentException(s"empty <$tag>")))
            }
            tripleTermRow(slot("subject"), slot("predicate"), slot("object"))
          case other => throw new IllegalArgumentException(s"unknown term element <$other>")
        }
          name -> xmlTerm(child)
        }
      }.toMap
      Row(vars.map(v => bound.getOrElse(v, null)): _*)
    }
    solutionsDf(spark, vars, rows)
  }
}
