package graft.cdt

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.model.Term
import graft.cdt.Cdt._

/**
 * The cdt: function library (reference: jena-arq
 * sparql/function/library/cdt/CDTLiteralFunctions.java) as Spark UDFs
 * over term structs, registered in `graft.functions.Registry` so SPARQL
 * text can call them by IRI. Eval errors are NULL terms (the engine's
 * SPARQL-error encoding); the reference's constructor functions turn
 * per-argument errors into CDT `null` elements, mirrored here via the
 * NULL-tolerant variadic entry points.
 */
object CdtFunctions {

  // ---------------- pure Term-level semantics ----------------
  private def orNull(f: => Term): Term =
    try f catch { case _: RuntimeException => null }

  private def list(t: Term): List[CV] = {
    require(isList(t), "not a cdt:List literal")
    parseList(t.lex)
  }
  private def map(t: Term): List[(Term, CV)] = {
    require(isMap(t), "not a cdt:Map literal")
    parseMap(t.lex)
  }
  private def nodeOf(v: CV): Term = v match {
    case CTerm(t) => t
    case CNull => throw new IllegalArgumentException("null value")
  }
  private val intFamily: Set[String] = Set("integer", "byte", "short", "int",
    "long", "nonNegativeInteger", "nonPositiveInteger", "negativeInteger",
    "positiveInteger", "unsignedByte", "unsignedShort", "unsignedInt",
    "unsignedLong").map(Term.XSD + _)
  private def intArg(t: Term): Int = {
    require(t != null && t.isLiteral && intFamily.contains(t.dt) &&
      t.lex.matches("[+-]?[0-9]+"), "not an integer literal")
    t.lex.toInt
  }
  private def validKey(t: Term): Boolean =
    t != null && (t.isIri || t.isLiteral)

  def fList(xs: Seq[Term]): Term =
    listTerm(xs.map(t => if (t == null) CNull else CTerm(t)))

  def fMap(xs: Seq[Term]): Term = {
    val entries = scala.collection.mutable.LinkedHashMap[Term, CV]()
    xs.grouped(2).foreach {
      case Seq(k, v) =>
        if (validKey(k) && !isCdt(k))
          entries(k) = if (v == null) CNull else CTerm(v)
      case _ => throw new IllegalArgumentException("odd arity")
    }
    mapTerm(entries.toSeq)
  }

  def fSize(t: Term): Term = {
    val n = if (isList(t)) list(t).size else map(t).size
    Term.lit(n.toString, Term.XSD_INTEGER)
  }

  def fGet(c: Term, k: Term): Term = {
    if (isList(c)) {
      val idx = intArg(k)
      val l = list(c)
      require(idx >= 1 && idx <= l.size, "out of bounds")
      nodeOf(l(idx - 1))
    } else {
      val m = map(c)
      require(validKey(k), "not a valid map key")
      require(m.nonEmpty, "empty map")
      m.find(_._1 == k) match {
        case Some((_, v)) => nodeOf(v)
        case None => throw new IllegalArgumentException("key not in map")
      }
    }
  }

  def fHead(t: Term): Term = {
    val l = list(t)
    require(l.nonEmpty, "empty list")
    nodeOf(l.head)
  }

  def fTail(t: Term): Term = {
    val l = list(t)
    require(l.nonEmpty, "empty list")
    listTerm(l.tail)
  }

  def fReverse(t: Term): Term = listTerm(list(t).reverse)

  def fConcat(xs: Seq[Term]): Term =
    listTerm(xs.toList.flatMap(list))

  def fContains(t: Term, x: Term): Term = {
    require(x != null, "error argument")
    val r = list(t).exists {
      // bnode-vs-other mismatches (None) are plain non-matches here — the
      // cdt error rule applies to =, not to the containment scan
      case CTerm(e) => sameValue(e, x).getOrElse(false)
      case CNull => false
    }
    Term.lit(r.toString, Term.XSD_BOOLEAN)
  }

  def fContainsTerm(t: Term, x: Term): Term = {
    require(x != null, "error argument")
    val r = list(t).exists { case CTerm(e) => e == x; case CNull => false }
    Term.lit(r.toString, Term.XSD_BOOLEAN)
  }

  def fContainsKey(t: Term, k: Term): Term = {
    require(k != null, "error argument")
    val r = validKey(k) && !isCdt(k) && map(t).exists(_._1 == k)
    Term.lit(r.toString, Term.XSD_BOOLEAN)
  }

  def fKeys(t: Term): Term = listTerm(map(t).map(e => CTerm(e._1)))

  /** merge: entries of the FIRST map win (reference MergeFct). */
  def fMerge(a: Term, b: Term): Term = {
    val (m1, m2) = (map(a), map(b))
    if (m1.isEmpty) return b
    if (m2.isEmpty) return a
    val out = scala.collection.mutable.LinkedHashMap[Term, CV](m2: _*)
    m1.foreach { case (k, v) => out(k) = v }
    mapTerm(out.toSeq)
  }

  /** put(map, key[, value]) — 2-arg and error-valued 3-arg store null. */
  def fPut(m0: Term, k: Term, v: Term, hasValueArg: Boolean): Term = {
    require(validKey(k) && !isCdt(k), "not a valid map key")
    val m = map(m0)
    val nv: CV = if (hasValueArg && v != null) CTerm(v) else CNull
    m.find(_._1 == k) match {
      case Some((_, old)) if old == nv => m0
      case _ =>
        val out = scala.collection.mutable.LinkedHashMap[Term, CV](m: _*)
        out(k) = nv
        mapTerm(out.toSeq)
    }
  }

  def fRemove(m0: Term, k: Term): Term = {
    require(k != null, "error argument")
    val m = map(m0)
    if (m.isEmpty || !validKey(k) || isCdt(k) || !m.exists(_._1 == k)) m0
    else mapTerm(m.filterNot(_._1 == k))
  }

  def fSubseq(t: Term, from: Term, len: Term): Term = {
    val idx = intArg(from)
    require(idx >= 1, "out of bounds")
    val l = list(t)
    val n = if (len == null) l.size - idx + 1 else intArg(len)
    require(n >= 0, "illegal length")
    require(idx <= l.size + 1, "out of bounds")
    require(idx + n <= l.size + 1, "beyond list length")
    if (idx == l.size + 1) { if (l.isEmpty) t else listTerm(Nil) }
    else listTerm(l.slice(idx - 1, idx - 1 + n))
  }

  // ---------------- Spark wiring ----------------
  // NOTE: scalar args are Option[Term] — Spark's case-class decoder NPEs
  // on a top-level NULL struct (Term has a primitive Byte field), and NULL
  // args are routine here (they encode SPARQL eval errors / unbound vars).
  private def t0(o: Option[Term]): Term = o.orNull

  private val u1 = Map(
    "size" -> udf((t: Option[Term]) => orNull(fSize(t0(t)))),
    "head" -> udf((t: Option[Term]) => orNull(fHead(t0(t)))),
    "tail" -> udf((t: Option[Term]) => orNull(fTail(t0(t)))),
    "reverse" -> udf((t: Option[Term]) => orNull(fReverse(t0(t)))),
    "keys" -> udf((t: Option[Term]) => orNull(fKeys(t0(t)))))

  private val u2 = Map(
    "get" -> udf((a: Option[Term], b: Option[Term]) => orNull(fGet(t0(a), t0(b)))),
    "contains" -> udf((a: Option[Term], b: Option[Term]) => orNull(fContains(t0(a), t0(b)))),
    "containsTerm" -> udf((a: Option[Term], b: Option[Term]) => orNull(fContainsTerm(t0(a), t0(b)))),
    "containsKey" -> udf((a: Option[Term], b: Option[Term]) => orNull(fContainsKey(t0(a), t0(b)))),
    "merge" -> udf((a: Option[Term], b: Option[Term]) => orNull(fMerge(t0(a), t0(b)))),
    "remove" -> udf((a: Option[Term], b: Option[Term]) => orNull(fRemove(t0(a), t0(b)))))

  private val uList = udf((xs: Seq[Term]) => orNull(fList(xs)))
  private val uMap = udf((xs: Seq[Term]) => orNull(fMap(xs)))
  private val uConcat = udf((xs: Seq[Term]) => {
    // strict: any errored (null) argument poisons the result
    if (xs.contains(null)) null else orNull(fConcat(xs))
  })
  private val uPut2 = udf((m: Option[Term], k: Option[Term]) =>
    orNull(fPut(t0(m), t0(k), null, hasValueArg = false)))
  private val uPut3 = udf((m: Option[Term], k: Option[Term], v: Option[Term]) =>
    orNull(fPut(t0(m), t0(k), t0(v), hasValueArg = true)))
  private val uSubseq2 = udf((t: Option[Term], f: Option[Term]) =>
    orNull(fSubseq(t0(t), t0(f), null)))
  private val uSubseq3 = udf((t: Option[Term], f: Option[Term], n: Option[Term]) =>
    orNull(fSubseq(t0(t), t0(f), t0(n))))

  /** cdt literal value-equality for the engine's `=`/`!=`; NULL = error. */
  val cdtEqUdf = udf((a: Option[Term], b: Option[Term]) =>
    Cdt.cdtEq(t0(a), t0(b)).map(java.lang.Boolean.valueOf).orNull)

  /** list/map-less-than comparison sign for `<`/`<=`/`>`/`>=`; NULL =
   * not comparable (eval error). */
  val cdtCmpUdf = udf((a: Option[Term], b: Option[Term]) =>
    Cdt.cdtCmpOp(t0(a), t0(b)).map(Integer.valueOf).orNull)

  /** ORDER BY sort-encoding of a cdt literal (total, recursive). */
  val orderKeyUdf = udf((lex: String, dt: String) =>
    Cdt.orderKey(graft.model.Term(graft.model.Term.KIND_LIT, lex, dt, "")))

  /** FOLD serializers (term collections → cdt literals). */
  val foldListUdf = udf((xs: Seq[Term]) => orNull(fList(xs)))
  val foldMapPairsUdf = udf((xs: Seq[(Term, Term)]) =>
    orNull(fMap(xs.flatMap(p => Seq(p._1, p._2)))))

  /** UNFOLD: one row per element — list → (element, 1-based index);
   * map → (key, value). NULL (malformed / not a CDT) → no rows. */
  val unfoldUdf = udf((t: Term) =>
    try {
      if (isList(t))
        parseList(t.lex).zipWithIndex.map { case (v, k) =>
          (v match { case CTerm(x) => x; case CNull => null },
            Term.lit((k + 1).toString, Term.XSD_INTEGER))
        }
      else if (isMap(t))
        parseMap(t.lex).map { case (k, v) =>
          (k, v match { case CTerm(x) => x; case CNull => null })
        }
      else null
    } catch { case _: RuntimeException => null })

  /** A term struct with NULL `kind` (an eval-error encoding some builders
   * produce) cannot decode into the non-nullable Byte of `Term` — coerce
   * it to a plain NULL struct before it reaches any UDF. */
  private def nt(c: Column): Column = when(c.getField("kind").isNotNull, c)

  def register(): Unit = {
    u1.foreach { case (n, f) =>
      graft.functions.Registry.registerFunction(NS + n, args => f(nt(args(0)))) }
    u2.foreach { case (n, f) =>
      graft.functions.Registry.registerFunction(NS + n,
        args => f(nt(args(0)), nt(args(1)))) }
    val emptyTermArray =
      array().cast("array<struct<kind:tinyint,lex:string,dt:string,lang:string>>")
    graft.functions.Registry.registerFunction(NS + "List",
      args => if (args.isEmpty) uList(emptyTermArray)
              else uList(array(args.map(nt): _*)))
    graft.functions.Registry.registerFunction(NS + "Map",
      args => if (args.isEmpty) uMap(emptyTermArray)
              else uMap(array(args.map(nt): _*)))
    graft.functions.Registry.registerFunction(NS + "concat",
      args => if (args.isEmpty) uConcat(emptyTermArray)
              else uConcat(array(args.map(nt): _*)))
    graft.functions.Registry.registerFunction(NS + "put", {
      case Seq(m, k) => uPut2(nt(m), nt(k))
      case Seq(m, k, v) => uPut3(nt(m), nt(k), nt(v))
      case other => throw new IllegalArgumentException(
        s"cdt:put takes 2 or 3 arguments, got ${other.size}")
    })
    graft.functions.Registry.registerFunction(NS + "subseq", {
      case Seq(t, f) => uSubseq2(nt(t), nt(f))
      case Seq(t, f, n) => uSubseq3(nt(t), nt(f), nt(n))
      case other => throw new IllegalArgumentException(
        s"cdt:subseq takes 2 or 3 arguments, got ${other.size}")
    })
  }
}
