package graft.riot

import java.io.{BufferedOutputStream, ByteArrayOutputStream, InputStream, OutputStream}

import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.{Quad, Term, Triple}

/**
 * RDF Binary — the reference's two binary RDF serializations, re-implemented
 * from their PUBLIC wire specifications (no thrift/protobuf libraries exist
 * in this sandbox, so the byte codecs are hand-rolled):
 *
 *  - RDF-Thrift ("RDF binary encoding using Thrift",
 *    jena-arq/Grammar/RDF-Thrift/BinaryRDF.thrift; stream writer
 *    riot/thrift/StreamRDF2Thrift.java): a back-to-back sequence of
 *    `RDF_StreamRow` unions over Thrift's COMPACT protocol on an unframed
 *    stream (TRDF.java:67 — TIOStreamTransport + TCompactProtocol).
 *  - RDF-Protobuf (jena-arq/Grammar/RDF-Protobuf/binary-rdf.proto;
 *    riot/protobuf/ProtobufRDF.java:76): `RDF_StreamRow` proto3 messages,
 *    each varint-length-delimited ("writeDelimitedTo").
 *
 * The wire encodings follow the published protocol specs:
 *  - Thrift compact: field headers are (id-delta << 4 | type) with a
 *    per-struct delta stack, integers are zigzag LEB128 varints, strings
 *    are varint-length UTF-8, doubles are 8-byte little-endian, structs
 *    end with a 0x00 stop byte.
 *  - Protobuf: tags are (field << 3 | wire-type) varints; `sint` fields
 *    zigzag; submessages and strings length-delimited; doubles fixed64
 *    little-endian; proto3 omits default values.
 *
 * Term mapping mirrors ThriftConvert.java / ProtobufConvert.java behavior:
 * language literals carry `langtag` (+ `baseDirection`, which this model
 * stores combined as "en--ltr" in `Term.lang`), simple literals omit the
 * datatype (proto3 sets `simple=true`), and the value forms
 * (valInteger/valDouble/valDecimal) are ACCEPTED on read and mapped to the
 * corresponding xsd typed literals; the writers emit full lexical forms
 * (the reference's default — `encodeValues` is off in StreamRDF2Thrift).
 * `RDF_PrefixName` terms resolve against the prefix map accumulated from
 * `prefixDecl` rows. Quads with no G slot are default-graph quads.
 *
 * Both formats are sequential documents (not line-splittable), so the
 * distributed read is file-at-a-time (`binaryFiles` + per-partition parse)
 * and the sink writes one file per partition — the same parallelism model
 * the reference gets from one stream per file.
 */
object BinaryRdf {

  // =====================================================================
  // Thrift compact protocol
  // =====================================================================

  object TType {
    val STOP = 0; val BOOL_TRUE = 1; val BOOL_FALSE = 2; val BYTE = 3
    val I16 = 4; val I32 = 5; val I64 = 6; val DOUBLE = 7
    val BINARY = 8; val LIST = 9; val SET = 10; val MAP = 11; val STRUCT = 12
  }

  /** LEB128 + zigzag, shared by the thrift-compact and protobuf writers
   * (identical encodings; the readers differ only in their byte source). */
  private object Leb128 {
    def write(out: OutputStream, v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def zigzag32(n: Int): Long = ((n << 1) ^ (n >> 31)).toLong & 0xffffffffL
    def zigzag64(n: Long): Long = (n << 1) ^ (n >> 63)
  }

  final class CompactWriter(out: OutputStream) {
    private var lastId = 0
    private val stack = mutable.Stack[Int]()

    private def varint(v: Long): Unit = Leb128.write(out, v)
    private def zigzag32(n: Int): Long = Leb128.zigzag32(n)
    private def zigzag64(n: Long): Long = Leb128.zigzag64(n)

    def beginStruct(): Unit = { stack.push(lastId); lastId = 0 }
    def endStruct(): Unit = { out.write(TType.STOP); lastId = stack.pop() }

    def fieldHeader(id: Int, tpe: Int): Unit = {
      val delta = id - lastId
      if (delta >= 1 && delta <= 15) out.write((delta << 4) | tpe)
      else { out.write(tpe); varint(zigzag32(id)) }
      lastId = id
    }
    def writeString(id: Int, s: String): Unit = {
      fieldHeader(id, TType.BINARY)
      val b = s.getBytes(StandardCharsets.UTF_8)
      varint(b.length.toLong); out.write(b)
    }
    def writeI64(id: Int, v: Long): Unit = { fieldHeader(id, TType.I64); varint(zigzag64(v)) }
    def writeI32(id: Int, v: Int): Unit = { fieldHeader(id, TType.I32); varint(zigzag32(v)) }
    def writeDouble(id: Int, v: Double): Unit = {
      fieldHeader(id, TType.DOUBLE)
      val bits = java.lang.Double.doubleToLongBits(v)
      var i = 0
      while (i < 8) { out.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 } // little-endian
    }
    /** Open a struct-typed field: caller writes the nested struct then endStruct(). */
    def beginStructField(id: Int): Unit = { fieldHeader(id, TType.STRUCT); beginStruct() }
    /** List-typed field header: (size<<4|elemType), long form 0xF?+varint. */
    def listHeader(id: Int, size: Int, elemType: Int): Unit = {
      fieldHeader(id, TType.LIST)
      if (size < 15) out.write((size << 4) | elemType)
      else { out.write(0xf0 | elemType); varint(size.toLong) }
    }
  }

  final class CompactReader(in: InputStream) {
    private var lastId = 0
    private val stack = mutable.Stack[Int]()

    /** First header byte of the next row, or -1 at clean EOF. */
    def peekOrEof(): Int = in.read()

    private def u8(): Int = {
      val b = in.read()
      if (b < 0) throw new IllegalArgumentException("RDF-Thrift: truncated stream")
      b
    }
    private def varint(): Long = {
      var shift = 0; var v = 0L
      var b = u8()
      while ((b & 0x80) != 0) { v |= (b & 0x7fL) << shift; shift += 7; b = u8() }
      v | ((b & 0x7fL) << shift)
    }
    private def unzig(v: Long): Long = (v >>> 1) ^ -(v & 1)

    def beginStruct(): Unit = { stack.push(lastId); lastId = 0 }
    def endStruct(): Unit = { lastId = stack.pop() }

    /** (type, fieldId); type == STOP ends the struct. `first` feeds an
     * already-consumed peek byte back in (row-boundary EOF detection). */
    def fieldHeader(first: Int = -1): (Int, Int) = {
      val b = if (first >= 0) first else u8()
      if (b == TType.STOP) return (TType.STOP, 0)
      val tpe = b & 0x0f
      val delta = (b >> 4) & 0x0f
      val id = if (delta != 0) lastId + delta else unzig(varint()).toInt
      lastId = id
      (tpe, id)
    }
    def readString(): String = {
      val n = varint().toInt
      val b = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val k = in.read(b, off, n - off)
        if (k < 0) throw new IllegalArgumentException("RDF-Thrift: truncated string")
        off += k
      }
      new String(b, StandardCharsets.UTF_8)
    }
    def readI64(): Long = unzig(varint())
    def readI32(): Int = unzig(varint()).toInt
    /** (elemType, size) of a list value. */
    def listHeader(): (Int, Int) = {
      val h = u8(); val et = h & 0x0f
      val n = if (((h >> 4) & 0x0f) == 0x0f) varint().toInt else (h >> 4) & 0x0f
      (et, n)
    }
    def readDouble(): Double = {
      var bits = 0L; var i = 0
      while (i < 8) { bits |= u8().toLong << (8 * i); i += 1 }
      java.lang.Double.longBitsToDouble(bits)
    }
    def skip(tpe: Int): Unit = tpe match {
      case TType.BOOL_TRUE | TType.BOOL_FALSE => ()
      case TType.BYTE => u8()
      case TType.I16 | TType.I32 | TType.I64 => varint()
      case TType.DOUBLE => var i = 0; while (i < 8) { u8(); i += 1 }
      case TType.BINARY => val n = varint().toInt; var i = 0; while (i < n) { u8(); i += 1 }
      case TType.LIST | TType.SET =>
        val h = u8(); val et = h & 0x0f
        val n = if (((h >> 4) & 0x0f) == 0x0f) varint().toInt else (h >> 4) & 0x0f
        // bool LIST ELEMENTS occupy one byte each (only bool FIELDS carry
        // the value in the header) — consume them, or the stream desyncs
        if (et == TType.BOOL_TRUE || et == TType.BOOL_FALSE) {
          var i = 0; while (i < n) { u8(); i += 1 }
        } else { var i = 0; while (i < n) { skip(et); i += 1 } }
      case TType.MAP =>
        val n = varint().toInt
        if (n > 0) { val kv = u8(); var i = 0
          while (i < n) { skip((kv >> 4) & 0x0f); skip(kv & 0x0f); i += 1 } }
      case TType.STRUCT =>
        beginStruct()
        var f = fieldHeader()
        while (f._1 != TType.STOP) { skip(f._1); f = fieldHeader() }
        endStruct()
      case other => throw new IllegalArgumentException(s"RDF-Thrift: bad type $other")
    }
  }

  // ---- RDF_Term ⇄ Term over the compact protocol --------------------

  private def splitLangDir(lang: String): (String, String) = lang.indexOf("--") match {
    case -1 => (lang, "")
    case k => (lang.substring(0, k), lang.substring(k + 2))
  }

  /** RDF_Term union; None = RDF_UNDEF (unbound result-set cell). */
  private def readThriftTermOpt(r: CompactReader,
      prefixes: mutable.Map[String, String]): Option[Term] = {
    r.beginStruct()
    var term: Term = null
    var undef = false
    var f = r.fieldHeader()
    while (f._1 != TType.STOP) {
      (f._2, f._1) match {
        case (1, TType.STRUCT) => term = Term.iri(readSingleString(r))
        case (2, TType.STRUCT) => term = Term.bnode(readSingleString(r))
        case (3, TType.STRUCT) => term = readThriftLiteral(r, prefixes)
        case (4, TType.STRUCT) =>
          val (p, l) = readPrefixName(r)
          term = Term.iri(resolvePrefix(prefixes, p, l))
        case (7, TType.STRUCT) => r.skip(TType.STRUCT); undef = true
        case (9, TType.STRUCT) =>
          val (s, pp, o) = readThriftTriple(r, prefixes)
          term = tripleTerm(s, pp, o)
        case (10, TType.I64) => term = Term.lit(r.readI64().toString, Term.XSD_INTEGER)
        case (11, TType.DOUBLE) =>
          term = Term.lit(java.lang.Double.toString(r.readDouble()), Term.XSD_DOUBLE)
        case (12, TType.STRUCT) => term = readThriftDecimal(r)
        case (_, tpe) => r.skip(tpe) // variable/any/repeat or unknown
      }
      f = r.fieldHeader()
    }
    r.endStruct()
    if (term != null) Some(term)
    else if (undef) None
    else throw new IllegalArgumentException(
      "RDF-Thrift: RDF_Term union with no usable member")
  }

  private def readThriftTerm(r: CompactReader, prefixes: mutable.Map[String, String]): Term =
    readThriftTermOpt(r, prefixes).getOrElse(throw new IllegalArgumentException(
      "RDF-Thrift: UNDEF term outside a result-set row"))

  private def readSingleString(r: CompactReader): String = {
    r.beginStruct()
    var s = ""
    var f = r.fieldHeader()
    while (f._1 != TType.STOP) {
      if (f._2 == 1 && f._1 == TType.BINARY) s = r.readString() else r.skip(f._1)
      f = r.fieldHeader()
    }
    r.endStruct(); s
  }
  private def readPrefixName(r: CompactReader): (String, String) = {
    r.beginStruct()
    var p = ""; var l = ""
    var f = r.fieldHeader()
    while (f._1 != TType.STOP) {
      f._2 match {
        case 1 if f._1 == TType.BINARY => p = r.readString()
        case 2 if f._1 == TType.BINARY => l = r.readString()
        case _ => r.skip(f._1)
      }
      f = r.fieldHeader()
    }
    r.endStruct(); (p, l)
  }
  private def readThriftLiteral(r: CompactReader,
      prefixes: mutable.Map[String, String]): Term = {
    r.beginStruct()
    var lex = ""; var lang = ""; var dir = ""; var dt = ""
    var f = r.fieldHeader()
    while (f._1 != TType.STOP) {
      f._2 match {
        case 1 if f._1 == TType.BINARY => lex = r.readString()
        case 2 if f._1 == TType.BINARY => lang = r.readString()
        case 3 if f._1 == TType.BINARY => dt = r.readString()
        case 4 if f._1 == TType.STRUCT =>
          val (p, l) = readPrefixName(r); dt = resolvePrefix(prefixes, p, l)
        case 5 if f._1 == TType.BINARY => dir = r.readString()
        case _ => r.skip(f._1)
      }
      f = r.fieldHeader()
    }
    r.endStruct()
    mkLiteral(lex, lang, dir, dt)
  }
  private def readThriftDecimal(r: CompactReader): Term = {
    r.beginStruct()
    var v = 0L; var scale = 0
    var f = r.fieldHeader()
    while (f._1 != TType.STOP) {
      f._2 match {
        case 1 if f._1 == TType.I64 => v = r.readI64()
        case 2 if f._1 == TType.I32 => scale = r.readI32()
        case _ => r.skip(f._1)
      }
      f = r.fieldHeader()
    }
    r.endStruct()
    Term.lit(java.math.BigDecimal.valueOf(v, scale).toPlainString, Term.XSD_DECIMAL)
  }
  private def readThriftTriple(r: CompactReader,
      prefixes: mutable.Map[String, String]): (Term, Term, Term) = {
    r.beginStruct()
    var s: Term = null; var p: Term = null; var o: Term = null
    var f = r.fieldHeader()
    while (f._1 != TType.STOP) {
      f._2 match {
        case 1 if f._1 == TType.STRUCT => s = readThriftTerm(r, prefixes)
        case 2 if f._1 == TType.STRUCT => p = readThriftTerm(r, prefixes)
        case 3 if f._1 == TType.STRUCT => o = readThriftTerm(r, prefixes)
        case _ => r.skip(f._1)
      }
      f = r.fieldHeader()
    }
    r.endStruct()
    require(s != null && p != null && o != null, "RDF-Thrift: incomplete triple")
    (s, p, o)
  }

  private def tripleTerm(s: Term, p: Term, o: Term): Term =
    Term(Term.KIND_TRIPLE_TERM,
      "<<( " + s.toNTriples + " " + p.toNTriples + " " + o.toNTriples + " )>>", "", "")

  private def mkLiteral(lex: String, lang: String, dir: String, dt: String): Term =
    if (lang.nonEmpty)
      Term.langLit(lex, if (dir.nonEmpty) s"$lang--$dir" else lang)
    else if (dt.nonEmpty) Term.lit(lex, dt)
    else Term.string(lex)

  private def resolvePrefix(prefixes: mutable.Map[String, String],
      p: String, local: String): String = prefixes.get(p) match {
    case Some(base) => base + local
    case None => throw new IllegalArgumentException(
      s"RDF-Thrift/Protobuf: undeclared prefix '$p:' in prefixName")
  }

  // =====================================================================
  // RDF-Thrift stream rows
  // =====================================================================

  object ThriftRdf {

    /** Write triples as back-to-back RDF_StreamRow(triple) structs. */
    def writeTriples(ts: Iterator[Triple], out0: OutputStream): Unit = {
      val out = new BufferedOutputStream(out0)
      val w = new CompactWriter(out)
      ts.foreach { t =>
        w.beginStruct() // RDF_StreamRow
        w.beginStructField(2) // triple
        writeTripleFields(w, t.s, t.p, t.o)
        w.endStruct()
        w.endStruct()
      }
      out.flush()
    }

    def writeQuads(qs: Iterator[Quad], out0: OutputStream): Unit = {
      val out = new BufferedOutputStream(out0)
      val w = new CompactWriter(out)
      qs.foreach { q =>
        w.beginStruct()
        w.beginStructField(3) // quad
        writeTripleFields(w, q.s, q.p, q.o)
        if (q.g.lex != Term.DEFAULT_GRAPH) {
          w.beginStructField(4); writeTermInto(w, q.g)
        }
        w.endStruct()
        w.endStruct()
      }
      out.flush()
    }

    private def writeTripleFields(w: CompactWriter, s: Term, p: Term, o: Term): Unit = {
      w.beginStructField(1); writeTermInto(w, s)
      w.beginStructField(2); writeTermInto(w, p)
      w.beginStructField(3); writeTermInto(w, o)
    }

    /** Write the RDF_Term union MEMBERS into an already-open struct, then
     * close it — the compact protocol's field-id deltas are per-struct, so
     * nesting works with the writer's stack. */
    private def writeTermInto(w: CompactWriter, t: Term): Unit = {
      t.kind match {
        case Term.KIND_IRI =>
          w.beginStructField(1); w.writeString(1, t.lex); w.endStruct()
        case Term.KIND_BNODE =>
          w.beginStructField(2); w.writeString(1, t.lex); w.endStruct()
        case Term.KIND_LIT =>
          w.beginStructField(3)
          w.writeString(1, t.lex)
          if (t.lang.nonEmpty) {
            val (tag, dir) = splitLangDir(t.lang)
            w.writeString(2, tag)
            if (dir.nonEmpty) w.writeString(5, dir)
          } else if (t.dt.nonEmpty && t.dt != Term.XSD_STRING)
            w.writeString(3, t.dt)
          w.endStruct()
        case Term.KIND_TRIPLE_TERM =>
          NTriples.parseTripleTermComponents(t.lex) match {
            case Some((s, p, o)) =>
              w.beginStructField(9)
              writeTripleFields(w, s, p, o)
              w.endStruct()
            case None => throw new IllegalArgumentException(
              s"malformed triple term lexical form: ${t.lex}")
          }
        case k => throw new IllegalArgumentException(s"unwritable term kind $k")
      }
      w.endStruct() // RDF_Term
    }

    /** Parse a whole unframed stream; prefixDecl rows feed the prefix map,
     * triple AND quad rows are returned (quads as default-or-named). */
    def readQuads(in: InputStream): Iterator[Quad] = new Iterator[Quad] {
      private val r = new CompactReader(in)
      private val prefixes = mutable.Map[String, String]()
      private var nextQ: Quad = null
      private def advance(): Unit = {
        nextQ = null
        while (nextQ == null) {
          val first = r.peekOrEof()
          if (first < 0) return
          r.beginStruct()
          var f = r.fieldHeader(first)
          while (f._1 != TType.STOP) {
            f._2 match {
              case 1 if f._1 == TType.STRUCT => // prefixDecl
                val (p, uri) = readPrefixName(r) // same field shape (1,2)
                prefixes(p) = uri
              case 2 if f._1 == TType.STRUCT =>
                val (s, p, o) = readThriftTriple(r, prefixes)
                nextQ = Quad(s, p, o, Term.defaultGraph)
              case 3 if f._1 == TType.STRUCT =>
                nextQ = readThriftQuad(r, prefixes)
              case _ => r.skip(f._1)
            }
            f = r.fieldHeader()
          }
          r.endStruct()
        }
      }
      private def readThriftQuad(rr: CompactReader,
          pm: mutable.Map[String, String]): Quad = {
        rr.beginStruct()
        var s: Term = null; var p: Term = null; var o: Term = null
        var g: Term = Term.defaultGraph
        var f = rr.fieldHeader()
        while (f._1 != TType.STOP) {
          f._2 match {
            case 1 if f._1 == TType.STRUCT => s = readThriftTerm(rr, pm)
            case 2 if f._1 == TType.STRUCT => p = readThriftTerm(rr, pm)
            case 3 if f._1 == TType.STRUCT => o = readThriftTerm(rr, pm)
            case 4 if f._1 == TType.STRUCT => g = readThriftTerm(rr, pm)
            case _ => rr.skip(f._1)
          }
          f = rr.fieldHeader()
        }
        rr.endStruct()
        require(s != null && p != null && o != null, "RDF-Thrift: incomplete quad")
        Quad(s, p, o, g)
      }
      advance()
      override def hasNext: Boolean = nextQ != null
      override def next(): Quad = { val q = nextQ; advance(); q }
    }

    def readTriples(in: InputStream): Iterator[Triple] = readQuads(in).map(_.triple)

    def toBytes(ts: Seq[Triple]): Array[Byte] = {
      val bos = new ByteArrayOutputStream(); writeTriples(ts.iterator, bos); bos.toByteArray
    }
    def quadsToBytes(qs: Seq[Quad]): Array[Byte] = {
      val bos = new ByteArrayOutputStream(); writeQuads(qs.iterator, bos); bos.toByteArray
    }

    // ---- SPARQL result sets (Binding2Thrift / Thift2Binding):
    //      one RDF_VarTuple then RDF_DataTuple rows, unbound = RDF_UNDEF

    def writeResultSet(vars: Seq[String], rows: Iterator[Seq[Option[Term]]],
        out0: OutputStream): Unit = {
      val out = new BufferedOutputStream(out0)
      val w = new CompactWriter(out)
      w.beginStruct() // RDF_VarTuple
      w.listHeader(1, vars.size, TType.STRUCT)
      vars.foreach { v => w.beginStruct(); w.writeString(1, v); w.endStruct() }
      w.endStruct()
      rows.foreach { row =>
        w.beginStruct() // RDF_DataTuple
        w.listHeader(1, row.size, TType.STRUCT)
        row.foreach {
          case Some(t) => w.beginStruct(); writeTermInto(w, t)
          case None => // RDF_UNDEF member
            w.beginStruct(); w.beginStructField(7); w.endStruct(); w.endStruct()
        }
        w.endStruct() // RDF_DataTuple
      }
      out.flush()
    }

    def readResultSet(in: InputStream): (Seq[String], Seq[Seq[Option[Term]]]) = {
      val r = new CompactReader(in)
      val prefixes = mutable.Map[String, String]()
      // vars row
      val first = r.peekOrEof()
      require(first >= 0, "RDF-Thrift result set: empty stream")
      r.beginStruct()
      var vars = Seq.empty[String]
      var f = r.fieldHeader(first)
      while (f._1 != TType.STOP) {
        if (f._2 == 1 && f._1 == TType.LIST) {
          val (_, n) = r.listHeader()
          vars = (1 to n).map(_ => readSingleString(r))
        } else r.skip(f._1)
        f = r.fieldHeader()
      }
      r.endStruct()
      // data rows until EOF
      val rows = Seq.newBuilder[Seq[Option[Term]]]
      var head = r.peekOrEof()
      while (head >= 0) {
        r.beginStruct()
        var f2 = r.fieldHeader(head)
        while (f2._1 != TType.STOP) {
          if (f2._2 == 1 && f2._1 == TType.LIST) {
            val (_, n) = r.listHeader()
            rows += (1 to n).map(_ => readThriftTermOpt(r, prefixes))
          } else r.skip(f2._1)
          f2 = r.fieldHeader()
        }
        r.endStruct()
        head = r.peekOrEof()
      }
      (vars, rows.result())
    }
  }

  // =====================================================================
  // Protobuf wire format (binary-rdf.proto, proto3)
  // =====================================================================

  object ProtoWire {
    def varint(out: OutputStream, v: Long): Unit = Leb128.write(out, v)
    def tag(out: OutputStream, field: Int, wire: Int): Unit =
      varint(out, ((field.toLong << 3) | wire))
    def string(out: OutputStream, field: Int, s: String): Unit = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      tag(out, field, 2); varint(out, b.length.toLong); out.write(b)
    }
    def message(out: OutputStream, field: Int, body: Array[Byte]): Unit = {
      tag(out, field, 2); varint(out, body.length.toLong); out.write(body)
    }
    def sint64(out: OutputStream, field: Int, v: Long): Unit = {
      tag(out, field, 0); varint(out, Leb128.zigzag64(v))
    }
    def bool(out: OutputStream, field: Int, v: Boolean): Unit = {
      tag(out, field, 0); varint(out, if (v) 1L else 0L)
    }
    def double(out: OutputStream, field: Int, v: Double): Unit = {
      tag(out, field, 1)
      val bits = java.lang.Double.doubleToLongBits(v)
      var i = 0; while (i < 8) { out.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
    }
  }

  /** Bounded-slice protobuf reader (length-delimited submessages parse
   * against an explicit end offset). */
  final class ProtoReader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def u8(): Int = {
      if (pos >= end) throw new IllegalArgumentException(
        "RDF-Protobuf: truncated message (read past the slice end)")
      val b = buf(pos) & 0xff; pos += 1; b
    }
    def varint(): Long = {
      var shift = 0; var v = 0L
      var b = u8()
      while ((b & 0x80) != 0) { v |= (b & 0x7fL) << shift; shift += 7; b = u8() }
      v | ((b & 0x7fL) << shift)
    }
    def sint(): Long = { val v = varint(); (v >>> 1) ^ -(v & 1) }
    private def bounded(n: Int): Int = {
      if (n < 0 || pos + n > end) throw new IllegalArgumentException(
        s"RDF-Protobuf: declared length $n overruns the enclosing message")
      n
    }
    def string(): String = {
      val n = bounded(varint().toInt)
      val s = new String(buf, pos, n, StandardCharsets.UTF_8); pos += n; s
    }
    def sub(): ProtoReader = {
      val n = bounded(varint().toInt)
      val r = new ProtoReader(buf, pos, pos + n); pos += n; r
    }
    def fixed64(): Long = {
      bounded(8) // fixed-width reads must not cross the slice boundary
      var bits = 0L; var i = 0
      while (i < 8) { bits |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8; bits
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => pos += bounded(8)
      case 2 =>
        // NOTE two steps: `pos += bounded(varint())` would read the OLD pos
        // before varint() advances it (Scala evaluates the LHS read first)
        val n = bounded(varint().toInt); pos += n
      case 5 => pos += bounded(4)
      case w => throw new IllegalArgumentException(s"RDF-Protobuf: wire type $w")
    }
  }

  object ProtobufRdf {

    private def termBytes(t: Term): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      t.kind match {
        case Term.KIND_IRI =>
          val m = new ByteArrayOutputStream()
          ProtoWire.string(m, 1, t.lex)
          ProtoWire.message(bos, 1, m.toByteArray)
        case Term.KIND_BNODE =>
          val m = new ByteArrayOutputStream()
          ProtoWire.string(m, 1, t.lex)
          ProtoWire.message(bos, 2, m.toByteArray)
        case Term.KIND_LIT =>
          val m = new ByteArrayOutputStream()
          ProtoWire.string(m, 1, t.lex)
          if (t.lang.nonEmpty) {
            if (t.lang.contains("--")) ProtoWire.string(m, 5, t.lang) // langdir
            else ProtoWire.string(m, 2, t.lang)
          } else if (t.dt.nonEmpty && t.dt != Term.XSD_STRING)
            ProtoWire.string(m, 3, t.dt)
          else ProtoWire.bool(m, 9, v = true) // simple
          ProtoWire.message(bos, 3, m.toByteArray)
        case Term.KIND_TRIPLE_TERM =>
          NTriples.parseTripleTermComponents(t.lex) match {
            case Some((s, p, o)) => ProtoWire.message(bos, 6, tripleBytes(s, p, o))
            case None => throw new IllegalArgumentException(
              s"malformed triple term lexical form: ${t.lex}")
          }
        case k => throw new IllegalArgumentException(s"unwritable term kind $k")
      }
      bos.toByteArray
    }

    private def tripleBytes(s: Term, p: Term, o: Term): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      ProtoWire.message(bos, 1, termBytes(s))
      ProtoWire.message(bos, 2, termBytes(p))
      ProtoWire.message(bos, 3, termBytes(o))
      bos.toByteArray
    }

    /** One RDF_StreamRow message per triple/quad, varint-length-delimited. */
    def writeTriples(ts: Iterator[Triple], out0: OutputStream): Unit = {
      val out = new BufferedOutputStream(out0)
      ts.foreach { t =>
        val row = new ByteArrayOutputStream()
        ProtoWire.message(row, 2, tripleBytes(t.s, t.p, t.o))
        val b = row.toByteArray
        ProtoWire.varint(out, b.length.toLong); out.write(b)
      }
      out.flush()
    }

    def writeQuads(qs: Iterator[Quad], out0: OutputStream): Unit = {
      val out = new BufferedOutputStream(out0)
      qs.foreach { q =>
        val quad = new ByteArrayOutputStream()
        ProtoWire.message(quad, 1, termBytes(q.s))
        ProtoWire.message(quad, 2, termBytes(q.p))
        ProtoWire.message(quad, 3, termBytes(q.o))
        if (q.g.lex != Term.DEFAULT_GRAPH) ProtoWire.message(quad, 4, termBytes(q.g))
        val row = new ByteArrayOutputStream()
        ProtoWire.message(row, 3, quad.toByteArray)
        val b = row.toByteArray
        ProtoWire.varint(out, b.length.toLong); out.write(b)
      }
      out.flush()
    }

    private def readTermOpt(r: ProtoReader,
        prefixes: mutable.Map[String, String]): Option[Term] = {
      var term: Term = null
      var undef = false
      while (r.hasMore) {
        val t = r.varint(); val field = (t >>> 3).toInt; val wire = (t & 7).toInt
        field match {
          case 1 => term = Term.iri(readSingle(r.sub()))
          case 2 => term = Term.bnode(readSingle(r.sub()))
          case 3 => term = readLiteral(r.sub(), prefixes)
          case 4 => val (p, l) = readPrefixName(r.sub())
            term = Term.iri(resolvePrefix(prefixes, p, l))
          case 8 => r.skip(wire); undef = true
          case 5 | 7 | 9 => r.skip(wire) // variable/any/repeat
          case 6 => val (s, p, o) = readTriple(r.sub(), prefixes)
            term = tripleTerm(s, p, o)
          case 20 => term = Term.lit(r.sint().toString, Term.XSD_INTEGER)
          case 21 => term = Term.lit(
            java.lang.Double.toString(java.lang.Double.longBitsToDouble(r.fixed64())),
            Term.XSD_DOUBLE)
          case 22 =>
            val d = r.sub(); var v = 0L; var sc = 0
            while (d.hasMore) {
              val dt0 = d.varint(); ((dt0 >>> 3).toInt: @unchecked) match {
                case 1 => v = d.sint()
                case 2 => sc = d.sint().toInt
                case _ => d.skip((dt0 & 7).toInt)
              }
            }
            term = Term.lit(java.math.BigDecimal.valueOf(v, sc).toPlainString,
              Term.XSD_DECIMAL)
          case _ => r.skip(wire)
        }
      }
      if (term != null) Some(term)
      else if (undef) None
      else throw new IllegalArgumentException(
        "RDF-Protobuf: RDF_Term with no usable member")
    }
    private def readTerm(r: ProtoReader,
        prefixes: mutable.Map[String, String]): Term =
      readTermOpt(r, prefixes).getOrElse(throw new IllegalArgumentException(
        "RDF-Protobuf: UNDEF term outside a result-set row"))
    private def readSingle(r: ProtoReader): String = {
      var s = ""
      while (r.hasMore) {
        val t = r.varint()
        if ((t >>> 3).toInt == 1 && (t & 7) == 2) s = r.string() else r.skip((t & 7).toInt)
      }
      s
    }
    private def readPrefixName(r: ProtoReader): (String, String) = {
      var p = ""; var l = ""
      while (r.hasMore) {
        val t = r.varint(); ((t >>> 3).toInt: @unchecked) match {
          case 1 => p = r.string()
          case 2 => l = r.string()
          case _ => r.skip((t & 7).toInt)
        }
      }
      (p, l)
    }
    private def readLiteral(r: ProtoReader,
        prefixes: mutable.Map[String, String]): Term = {
      var lex = ""; var lang = ""; var dt = ""
      while (r.hasMore) {
        val t = r.varint(); (t >>> 3).toInt match {
          case 1 => lex = r.string()
          case 2 => lang = r.string()
          case 3 => dt = r.string()
          case 4 => val (p, l) = readPrefixName(r.sub())
            dt = resolvePrefix(prefixes, p, l)
          case 5 => lang = r.string() // langdir, already "en--ltr"-combined
          case 9 => r.varint() // simple marker
          case _ => r.skip((t & 7).toInt)
        }
      }
      mkLiteral(lex, lang, dir = "", dt)
    }
    private def readTriple(r: ProtoReader,
        prefixes: mutable.Map[String, String]): (Term, Term, Term) = {
      var s: Term = null; var p: Term = null; var o: Term = null
      while (r.hasMore) {
        val t = r.varint(); ((t >>> 3).toInt: @unchecked) match {
          case 1 => s = readTerm(r.sub(), prefixes)
          case 2 => p = readTerm(r.sub(), prefixes)
          case 3 => o = readTerm(r.sub(), prefixes)
          case _ => r.skip((t & 7).toInt)
        }
      }
      require(s != null && p != null && o != null, "RDF-Protobuf: incomplete triple")
      (s, p, o)
    }

    def readQuads(bytes: Array[Byte]): Iterator[Quad] = new Iterator[Quad] {
      private val top = new ProtoReader(bytes, 0, bytes.length)
      private val prefixes = mutable.Map[String, String]()
      private var nextQ: Quad = null
      private def advance(): Unit = {
        nextQ = null
        while (nextQ == null && top.hasMore) {
          val row = top.sub() // delimited RDF_StreamRow
          while (row.hasMore) {
            val t = row.varint(); (t >>> 3).toInt match {
              case 1 => val (p, uri) = readPrefixName(row.sub()); prefixes(p) = uri
              case 2 => val (s, p, o) = readTriple(row.sub(), prefixes)
                nextQ = Quad(s, p, o, Term.defaultGraph)
              case 3 =>
                val q = row.sub()
                var s: Term = null; var p: Term = null; var o: Term = null
                var g: Term = Term.defaultGraph
                while (q.hasMore) {
                  val qt = q.varint(); ((qt >>> 3).toInt: @unchecked) match {
                    case 1 => s = readTerm(q.sub(), prefixes)
                    case 2 => p = readTerm(q.sub(), prefixes)
                    case 3 => o = readTerm(q.sub(), prefixes)
                    case 4 => g = readTerm(q.sub(), prefixes)
                    case _ => q.skip((qt & 7).toInt)
                  }
                }
                require(s != null && p != null && o != null,
                  "RDF-Protobuf: incomplete quad")
                nextQ = Quad(s, p, o, g)
              case 4 => row.sub() // base decl: no relative IRIs are emitted
              case _ => row.skip((t & 7).toInt)
            }
          }
        }
      }
      advance()
      override def hasNext: Boolean = nextQ != null
      override def next(): Quad = { val q = nextQ; advance(); q }
    }

    def readTriples(bytes: Array[Byte]): Iterator[Triple] = readQuads(bytes).map(_.triple)

    def toBytes(ts: Seq[Triple]): Array[Byte] = {
      val bos = new ByteArrayOutputStream(); writeTriples(ts.iterator, bos); bos.toByteArray
    }
    def quadsToBytes(qs: Seq[Quad]): Array[Byte] = {
      val bos = new ByteArrayOutputStream(); writeQuads(qs.iterator, bos); bos.toByteArray
    }

    // ---- SPARQL result sets (Binding2Protobuf / Protobuf2Binding):
    //      delimited RDF_VarTuple, then delimited RDF_DataTuple rows

    def writeResultSet(vars: Seq[String], rows: Iterator[Seq[Option[Term]]],
        out0: OutputStream): Unit = {
      val out = new BufferedOutputStream(out0)
      val vt = new ByteArrayOutputStream()
      vars.foreach { v =>
        val m = new ByteArrayOutputStream()
        ProtoWire.string(m, 1, v)
        ProtoWire.message(vt, 1, m.toByteArray)
      }
      val vb = vt.toByteArray
      ProtoWire.varint(out, vb.length.toLong); out.write(vb)
      rows.foreach { row =>
        val dt = new ByteArrayOutputStream()
        row.foreach {
          case Some(t) => ProtoWire.message(dt, 1, termBytes(t))
          case None => // RDF_Term{undefined = 8 {}}
            val u = new ByteArrayOutputStream()
            ProtoWire.message(u, 8, Array.emptyByteArray)
            ProtoWire.message(dt, 1, u.toByteArray)
        }
        val b = dt.toByteArray
        ProtoWire.varint(out, b.length.toLong); out.write(b)
      }
      out.flush()
    }

    def readResultSet(bytes: Array[Byte]): (Seq[String], Seq[Seq[Option[Term]]]) = {
      val top = new ProtoReader(bytes, 0, bytes.length)
      val prefixes = mutable.Map[String, String]()
      require(top.hasMore, "RDF-Protobuf result set: empty stream")
      val vt = top.sub()
      val vars = Seq.newBuilder[String]
      while (vt.hasMore) {
        val t = vt.varint()
        if ((t >>> 3).toInt == 1 && (t & 7) == 2) vars += readSingle(vt.sub())
        else vt.skip((t & 7).toInt)
      }
      val rows = Seq.newBuilder[Seq[Option[Term]]]
      while (top.hasMore) {
        val dt = top.sub()
        val row = Seq.newBuilder[Option[Term]]
        while (dt.hasMore) {
          val t = dt.varint()
          if ((t >>> 3).toInt == 1 && (t & 7) == 2) row += readTermOpt(dt.sub(), prefixes)
          else dt.skip((t & 7).toInt)
        }
        rows += row.result()
      }
      (vars.result(), rows.result())
    }
  }

  // =====================================================================
  // Spark faces: file-at-a-time distributed read, one file per partition
  // write (the formats are sequential streams, not line-splittable)
  // =====================================================================

  def readThrift(spark: SparkSession, path: String): Dataset[Triple] = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (_, pds) =>
        // stream the file (the thrift reader is incremental); close the
        // handle when the row iterator is exhausted — AND on task
        // completion, because a short-circuited action (limit/take, or a
        // downstream failure) abandons the iterator mid-stream and the
        // exhaustion branch never runs
        val in = new java.io.BufferedInputStream(pds.open())
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
        val it = ThriftRdf.readTriples(in)
        new Iterator[Triple] {
          override def hasNext: Boolean = {
            val h = it.hasNext
            if (!h) in.close()
            h
          }
          override def next(): Triple = it.next()
        }
      }.toDS()
  }

  def readProtobuf(spark: SparkSession, path: String): Dataset[Triple] = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (_, pds) => ProtobufRdf.readTriples(pds.toArray()) }
      .toDS()
  }

  def writeThrift(triples: Dataset[Triple], dir: String): Unit =
    writePartitioned(triples, dir, ".rt", ThriftRdf.writeTriples)

  def writeProtobuf(triples: Dataset[Triple], dir: String): Unit =
    writePartitioned(triples, dir, ".rpb", ProtobufRdf.writeTriples)

  private def writePartitioned(triples: Dataset[Triple], dir: String,
      ext: String, writeFn: (Iterator[Triple], OutputStream) => Unit): Unit = {
    val dirPath = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(dirPath)
    // overwrite semantics, like the text sinks: stale part files from a
    // previous (wider) write would otherwise ride along in glob reads
    val old = java.nio.file.Files.list(dirPath)
    try old.forEach { p =>
      if (p.getFileName.toString.endsWith(ext)) java.nio.file.Files.delete(p)
    } finally old.close()
    triples.foreachPartition { (it: Iterator[Triple]) =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        // temp-file + atomic-rename: a task that dies mid-write never
        // leaves a truncated part file behind for readers
        val tmp = java.nio.file.Paths.get(dir, f".part-$pid%05d$ext.tmp")
        val out = java.nio.file.Files.newOutputStream(tmp)
        try writeFn(it, out) finally out.close()
        java.nio.file.Files.move(tmp, java.nio.file.Paths.get(dir, f"part-$pid%05d$ext"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        ()
      }
    }
  }
}
