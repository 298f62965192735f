package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Term

/**
 * GeoSPARQL-lite (reference: jena-geosparql — geo:wktLiteral geometry
 * literals and the geof: function library), re-expressed Spark-first
 * WITHOUT JTS (none exists in this sandbox): POINT / LINESTRING /
 * POLYGON-with-holes geometries, geof:distance, and the simple-features
 * predicates sfWithin / sfContains (ray-parity point-in-polygon) and
 * sfIntersects (orientation-sign segment intersection + containment
 * composite). The full curved/topological algebra (sfTouches, sfCrosses,
 * sfOverlaps on arbitrary geometry, exact-arithmetic boundaries) stays
 * out of scope — documented in SURVEY §7.4. The hot paths — distance,
 * constant-polygon membership, segment×polygon intersection — are
 * CODEGEN'D column expressions (regexp extraction + arithmetic, no UDFs).
 *
 * Scale path: `radiusJoin` buckets points into radius-sized grid cells
 * and equi-joins each cell against its 3×3 neighborhood — the same
 * banding idea as the MinHash/SimHash LSH joins; never an all-pairs
 * nested loop (PlanSpec asserts the plan shape). `polygonJoin` grids
 * polygon bboxes the same way and runs the parity test as a
 * higher-order-function fold over the edge array (no UDF in the filter,
 * no candidate×edge shuffle).
 */
object Geo {

  val WKT_DT = "http://www.opengis.net/ont/geosparql#wktLiteral"
  val UOM_METRE = "http://www.opengis.net/def/uom/OGC/1.0/metre"
  val UOM_KILOMETRE = "http://www.opengis.net/def/uom/OGC/1.0/kilometre"
  val UOM_DEGREE = "http://www.opengis.net/def/uom/OGC/1.0/degree"

  val EARTH_RADIUS_M = 6371008.8 // IUGG mean

  /** `POINT(lon lat)` with an optional leading `<crs>` IRI (CRS84 axis
   * order, the geo:wktLiteral default). */
  private val POINT_RX =
    "^\\s*(?:<[^>]*>\\s*)?POINT\\s*\\(\\s*([+-]?[0-9.eE+-]+)\\s+([+-]?[0-9.eE+-]+)\\s*\\)\\s*$"

  /** Longitude of a wkt lexical-form column (NULL when not a point). */
  def wktLon(lex: Column): Column =
    nullif(regexp_extract(lex, POINT_RX, 1), lit("")).cast("double")
  def wktLat(lex: Column): Column =
    nullif(regexp_extract(lex, POINT_RX, 2), lit("")).cast("double")

  /** Great-circle metres between two (lat, lon) degree pairs — plain
   * codegen'd trigonometry (geof:distance for point geometries). */
  def haversineMeters(lat1: Column, lon1: Column,
                      lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2 * EARTH_RADIUS_M) * atan(sqrt(a) / sqrt(lit(1.0) - a))
  }

  /** Driver/worker-side scalar twin of `haversineMeters`. */
  def haversineMeters(lat1: Double, lon1: Double,
                      lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon / 2), 2)
    2 * EARTH_RADIUS_M * math.atan2(math.sqrt(a), math.sqrt(1 - a))
  }

  def wktPointTerm(lon: Double, lat: Double): Term =
    Term.lit(s"POINT($lon $lat)", WKT_DT)

  /** Scalar geof:distance over two wkt POINT literals in the given unit
   * (metre / kilometre / degree-of-arc); None = eval error. */
  def distance(a: Term, b: Term, unit: String): Option[Double] = {
    def pt(t: Term): Option[(Double, Double)] = {
      if (t == null || !t.isLiteral || t.dt != WKT_DT) return None
      val m = java.util.regex.Pattern.compile(POINT_RX).matcher(t.lex)
      if (!m.matches()) None
      else try Some((m.group(1).toDouble, m.group(2).toDouble))
      catch { case _: NumberFormatException => None }
    }
    for ((lon1, lat1) <- pt(a); (lon2, lat2) <- pt(b)) yield {
      val metres = haversineMeters(lat1, lon1, lat2, lon2)
      unit match {
        case UOM_KILOMETRE => metres / 1000.0
        case UOM_DEGREE => math.toDegrees(metres / EARTH_RADIUS_M)
        case _ => metres // metre (default)
      }
    }
  }

  /** geof:distance as a registered SPARQL function (UDF — function-library
   * parity; pipelines use the codegen'd `haversineMeters` columns). */
  val GEOF = "http://www.opengis.net/def/function/geosparql/"
  private lazy val distUdf = udf((a: Option[Term], b: Option[Term], u: Option[Term]) =>
    distance(a.orNull, b.orNull, u.map(_.lex).getOrElse(UOM_METRE))
      .map(d => Term.lit(d.toString, Term.XSD_DOUBLE)).orNull)

  private lazy val withinUdf = udf((a: Option[Term], b: Option[Term]) =>
    sfWithin(a.orNull, b.orNull)
      .map(v => Term.lit(v.toString, Term.XSD + "boolean")).orNull)

  private lazy val intersectsUdf = udf((a: Option[Term], b: Option[Term]) =>
    sfIntersects(a.orNull, b.orNull)
      .map(v => Term.lit(v.toString, Term.XSD + "boolean")).orNull)

  private def boolPredUdf(f: (Term, Term) => Option[Boolean]) =
    udf((a: Option[Term], b: Option[Term]) =>
      f(a.orNull, b.orNull)
        .map(v => Term.lit(v.toString, Term.XSD + "boolean")).orNull)

  private[graft] def registerFunctions(): Unit = {
    graft.functions.Registry.registerFunction(GEOF + "distance", {
      case Seq(a, b) => distUdf(a, b,
        graft.algebra.TermCols.const(Term.iri(UOM_METRE)))
      case Seq(a, b, u) => distUdf(a, b, u)
      case other => throw new IllegalArgumentException(
        s"geof:distance takes 2 or 3 arguments, got ${other.size}")
    })
    // geof:sfWithin / sfContains — point-in-polygon subset (simple
    // features `within` with ray-parity boundary semantics; `contains`
    // is the argument flip)
    graft.functions.Registry.registerFunction(GEOF + "sfWithin", {
      case Seq(a, b) => withinUdf(a, b)
      case other => throw new IllegalArgumentException(
        s"geof:sfWithin takes 2 arguments, got ${other.size}")
    })
    graft.functions.Registry.registerFunction(GEOF + "sfContains", {
      case Seq(a, b) => withinUdf(b, a)
      case other => throw new IllegalArgumentException(
        s"geof:sfContains takes 2 arguments, got ${other.size}")
    })
    // geof:sfIntersects — point/linestring/polygon composite (symmetric)
    graft.functions.Registry.registerFunction(GEOF + "sfIntersects", {
      case Seq(a, b) => intersectsUdf(a, b)
      case other => throw new IllegalArgumentException(
        s"geof:sfIntersects takes 2 arguments, got ${other.size}")
    })
    // the rest of the simple-features topology set (DE-9IM-lite)
    Seq(("sfDisjoint", sfDisjoint _), ("sfTouches", sfTouches _),
      ("sfCrosses", sfCrosses _), ("sfOverlaps", sfOverlaps _),
      ("sfEquals", sfEquals _)).foreach { case (name, f) =>
      val u = boolPredUdf(f)
      graft.functions.Registry.registerFunction(GEOF + name, {
        case Seq(a, b) => u(a, b)
        case other => throw new IllegalArgumentException(
          s"geof:$name takes 2 arguments, got ${other.size}")
      })
    }
    // non-topological geometry functions (wktLiteral → wktLiteral)
    def geomFnUdf(f: Geom => Option[Geom]) = udf((a: Option[Term]) =>
      a.flatMap(t => parseGeom(t)).flatMap(f).map(wktTerm).orNull)
    Seq(("envelope", envelope _), ("boundary", boundary _),
      ("convexHull", convexHull _)).foreach { case (name, f) =>
      val u = geomFnUdf(f)
      graft.functions.Registry.registerFunction(GEOF + name, {
        case Seq(a) => u(a)
        case other => throw new IllegalArgumentException(
          s"geof:$name takes 1 argument, got ${other.size}")
      })
    }
    val sridUdf = udf((a: Option[Term]) => a.flatMap(getSrid)
      .map(s => Term.lit(s, Term.XSD + "anyURI")).orNull)
    graft.functions.Registry.registerFunction(GEOF + "getSRID", {
      case Seq(a) => sridUdf(a)
      case other => throw new IllegalArgumentException(
        s"geof:getSRID takes 1 argument, got ${other.size}")
    })
  }

  /**
   * All pairs of points within `radiusDeg` PLANAR degrees (squared
   * euclidean on lat/lon — the polynomial predicate is bit-identical
   * across engines, so it anchors the DuckDB oracle; swap the final
   * filter for `haversineMeters <= r` for geodesic semantics).
   *
   * Shape: each point lands in ONE cell of a radius-sized grid and probes
   * its 3×3 neighborhood on the build side — an equi-join on cell ids
   * with map-side pruning (a < b), never an all-pairs product. At 100×
   * the shuffle stays proportional to points × 9 and AQE handles dense
   * urban-cell skew.
   */
  def radiusJoinPlanar(points: DataFrame, radiusDeg: Double): DataFrame = {
    val cellL = floor(col("lon") / radiusDeg)
    val cellA = floor(col("lat") / radiusDeg)
    val probe = points.select(col("id").as("a"),
        col("lat").as("lat_a"), col("lon").as("lon_a"),
        cellL.as("cl"), cellA.as("ca"))
      .withColumn("dl", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("da", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("a"), col("lat_a"), col("lon_a"),
        (col("cl") + col("dl")).as("cl"), (col("ca") + col("da")).as("ca"))
    val build = points.select(col("id").as("b"),
      col("lat").as("lat_b"), col("lon").as("lon_b"),
      cellL.as("cl"), cellA.as("ca"))
    val r2 = radiusDeg * radiusDeg
    // no final dedup needed: the build side owns exactly ONE cell per
    // point, so a qualifying (a<b) pair matches in exactly one of the 9
    // probe cells — the join emits it once
    probe.join(build, Seq("cl", "ca"))
      .where(col("a") < col("b"))
      .where(
        (col("lat_a") - col("lat_b")) * (col("lat_a") - col("lat_b")) +
        (col("lon_a") - col("lon_b")) * (col("lon_a") - col("lon_b")) <= r2)
      .select(col("a"), col("b"))
  }

  // ---- polygons: point-in-polygon subset (no JTS) -----------------------

  /** Parse `POLYGON((x y, …)[, (hole …)…])` (optional leading CRS IRI)
   * into rings of (lon, lat) vertices. Rings may repeat the first vertex
   * last (WKT convention); the closing edge is implied either way. */
  def parsePolygon(lex0: String): Option[Seq[Seq[(Double, Double)]]] = {
    if (lex0 == null) return None
    val lex = lex0.replaceFirst("^\\s*<[^>]*>\\s*", "").trim
    if (!lex.toUpperCase.startsWith("POLYGON")) return None
    val body = lex.substring("POLYGON".length).trim
    if (!body.startsWith("(") || !body.endsWith(")")) return None
    val inner = body.substring(1, body.length - 1)
    val ringRx = java.util.regex.Pattern.compile("\\(([^()]*)\\)")
    val m = ringRx.matcher(inner)
    val rings = scala.collection.mutable.ArrayBuffer[Seq[(Double, Double)]]()
    try {
      while (m.find()) {
        val pts = m.group(1).split(",").toSeq.map(_.trim).filter(_.nonEmpty)
          .map { p =>
            val xy = p.split("\\s+")
            // a vertex with fewer than 2 coordinates (stray comma, truncated
            // literal) is a PARSE error, not a task-killing exception — one
            // malformed row on a dirty corpus must drop, not abort the job
            if (xy.length < 2) return None
            (xy(0).toDouble, xy(1).toDouble)
          }
        val ring = if (pts.length > 1 && pts.head == pts.last) pts.init else pts
        if (ring.length < 3) return None
        rings += ring
      }
    } catch { case _: NumberFormatException => return None }
    if (rings.isEmpty) None else Some(rings.toSeq)
  }

  /** Even-odd (ray-crossing) point-in-polygon over all rings — holes
   * flip the parity, so outer-ring + holes needs no special casing.
   * Boundary points follow ray parity (no exact arithmetic — documented
   * deviation from OGC's boundary-exclusive `within`). */
  def pointInRings(lon: Double, lat: Double,
                   rings: Seq[Seq[(Double, Double)]]): Boolean = {
    var crossings = 0
    rings.foreach { ring =>
      var i = 0
      val n = ring.length
      while (i < n) {
        val (ax, ay) = ring(i)
        val (bx, by) = ring((i + 1) % n)
        if ((ay > lat) != (by > lat) &&
            lon < ax + (bx - ax) * (lat - ay) / (by - ay))
          crossings += 1
        i += 1
      }
    }
    (crossings & 1) == 1
  }

  /** geof:sfWithin for the point subset: POINT within POLYGON (ray
   * parity), POINT within POINT (coordinate equality). A non-point first
   * argument or unparseable geometry is an eval error (None). */
  def sfWithin(a: Term, b: Term): Option[Boolean] = {
    def lexOf(t: Term): Option[String] =
      if (t != null && t.isLiteral && t.dt == WKT_DT) Some(t.lex) else None
    def pt(t: Term): Option[(Double, Double)] = lexOf(t).flatMap { l =>
      val m = java.util.regex.Pattern.compile(POINT_RX).matcher(l)
      if (!m.matches()) None
      else try Some((m.group(1).toDouble, m.group(2).toDouble))
      catch { case _: NumberFormatException => None }
    }
    pt(a).flatMap { case (lon, lat) =>
      pt(b) match {
        case Some((blon, blat)) => Some(lon == blon && lat == blat)
        case None => lexOf(b).flatMap(parsePolygon)
          .map(rings => pointInRings(lon, lat, rings))
      }
    }
  }

  // ---- linestrings + sfIntersects (no JTS) ------------------------------

  /** Parse `LINESTRING(x y, x y, …)` (optional leading CRS IRI) into a
   * vertex sequence (≥2 points). */
  def parseLineString(lex0: String): Option[Seq[(Double, Double)]] = {
    if (lex0 == null) return None
    val lex = lex0.replaceFirst("^\\s*<[^>]*>\\s*", "").trim
    if (!lex.toUpperCase.startsWith("LINESTRING")) return None
    val body = lex.substring("LINESTRING".length).trim
    if (!body.startsWith("(") || !body.endsWith(")")) return None
    val pts = body.substring(1, body.length - 1).split(",").toSeq
      .map(_.trim).filter(_.nonEmpty).map { p =>
        val xy = p.split("\\s+")
        if (xy.length < 2) return None
        try (xy(0).toDouble, xy(1).toDouble)
        catch { case _: NumberFormatException => return None }
      }
    if (pts.length < 2) None else Some(pts)
  }

  /** Parsed geometry union for the scalar predicates. `GMulti` covers
   * MULTIPOINT / MULTILINESTRING / MULTIPOLYGON / GEOMETRYCOLLECTION
   * (and the EMPTY geometries, as zero components). */
  sealed trait Geom
  final case class GPoint(lon: Double, lat: Double) extends Geom
  final case class GLine(pts: Seq[(Double, Double)]) extends Geom
  final case class GPolygon(rings: Seq[Seq[(Double, Double)]]) extends Geom
  final case class GMulti(comps: Seq[Geom]) extends Geom

  def parseGeom(t: Term): Option[Geom] = {
    if (t == null || !t.isLiteral || t.dt != WKT_DT) return None
    val m = java.util.regex.Pattern.compile(POINT_RX).matcher(t.lex)
    if (m.matches())
      try Some(GPoint(m.group(1).toDouble, m.group(2).toDouble))
      catch { case _: NumberFormatException => None }
    else parseLineString(t.lex).map(GLine.apply)
      .orElse(parsePolygon(t.lex).map(GPolygon.apply))
      .orElse(parseWktMulti(t.lex))
  }

  /** Recursive-descent WKT for the multi/collection types (+ EMPTY for
   * every type) — the simple types keep their regex fast paths above. */
  private def parseWktMulti(lex0: String): Option[Geom] = {
    if (lex0 == null) return None
    val lex = lex0.replaceFirst("^\\s*<[^>]*>\\s*", "").trim
    val c = new WktCursor(lex)
    c.geometry().filter { _ => c.ws(); c.i == lex.length }
  }

  private final class WktCursor(s: String) {
    var i = 0
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def word(): String = {
      ws(); val st = i
      while (i < s.length && s.charAt(i).isLetter) i += 1
      s.substring(st, i).toUpperCase
    }
    private def eat(ch: Char): Boolean = {
      ws(); if (i < s.length && s.charAt(i) == ch) { i += 1; true } else false
    }
    private def num(): Option[Double] = {
      ws(); val st = i
      while (i < s.length && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
      if (i == st) None
      else try Some(s.substring(st, i).toDouble)
      catch { case _: NumberFormatException => None }
    }
    /** x y [z [m]] — extra ordinates consumed and dropped. */
    private def coord(): Option[(Double, Double)] =
      for (x <- num(); y <- num()) yield { num().foreach(_ => num()); (x, y) }
    private def list[A](one: () => Option[A]): Option[Seq[A]] = {
      if (!eat('(')) return None
      val out = scala.collection.mutable.ArrayBuffer[A]()
      var ok = true
      var more = true
      while (ok && more) {
        one() match {
          case Some(a) => out += a; more = eat(',')
          case None => ok = false
        }
      }
      if (ok && eat(')')) Some(out.toSeq) else None
    }
    private def ring(): Option[Seq[(Double, Double)]] =
      list(() => coord()).flatMap { pts =>
        val r = if (pts.length > 1 && pts.head == pts.last) pts.init else pts
        if (r.length < 3) None else Some(r)
      }
    private def emptyOr(f: => Option[Geom]): Option[Geom] = {
      ws()
      if (s.regionMatches(true, i, "EMPTY", 0, 5)) { i += 5; Some(GMulti(Nil)) }
      else f
    }
    def geometry(): Option[Geom] = word() match {
      case "POINT" => emptyOr(list(() => coord()).collect {
        case Seq((x, y)) => GPoint(x, y) })
      case "LINESTRING" => emptyOr(list(() => coord())
        .filter(_.length >= 2).map(GLine.apply))
      case "POLYGON" => emptyOr(list(() => ring()).map(GPolygon.apply))
      case "MULTIPOINT" => emptyOr(list { () =>
        // points optionally wrapped in their own parens
        ws()
        if (i < s.length && s.charAt(i) == '(')
          list(() => coord()).collect { case Seq(p) => p }
        else coord()
      }.map(ps => GMulti(ps.map { case (x, y) => GPoint(x, y) })))
      case "MULTILINESTRING" => emptyOr(list(() =>
        list(() => coord()).filter(_.length >= 2).map(GLine.apply))
        .map(GMulti.apply))
      case "MULTIPOLYGON" => emptyOr(list(() =>
        list(() => ring()).map(GPolygon.apply)).map(GMulti.apply))
      case "GEOMETRYCOLLECTION" => emptyOr(list(() => geometry())
        .map(GMulti.apply))
      case _ => None
    }
  }

  /** Orientation sign of (p→q→r): >0 counter-clockwise, <0 clockwise,
   * 0 collinear (the determinant the reference's JTS robust predicates
   * compute — plain doubles here, documented). */
  def orient(px: Double, py: Double, qx: Double, qy: Double,
             rx: Double, ry: Double): Double =
    (qx - px) * (ry - py) - (qy - py) * (rx - px)

  private def onSegment(px: Double, py: Double, qx: Double, qy: Double,
                        rx: Double, ry: Double): Boolean =
    qx >= math.min(px, rx) && qx <= math.max(px, rx) &&
      qy >= math.min(py, ry) && qy <= math.max(py, ry)

  /** Closed-segment intersection (touching counts), orientation signs +
   * collinear-overlap cases — the classic CCW test. */
  def segmentsIntersect(ax: Double, ay: Double, bx: Double, by: Double,
                        cx: Double, cy: Double, dx: Double, dy: Double): Boolean = {
    val o1 = orient(ax, ay, bx, by, cx, cy)
    val o2 = orient(ax, ay, bx, by, dx, dy)
    val o3 = orient(cx, cy, dx, dy, ax, ay)
    val o4 = orient(cx, cy, dx, dy, bx, by)
    if (((o1 > 0 && o2 < 0) || (o1 < 0 && o2 > 0)) &&
        ((o3 > 0 && o4 < 0) || (o3 < 0 && o4 > 0))) true
    else if (o1 == 0 && onSegment(ax, ay, cx, cy, bx, by)) true
    else if (o2 == 0 && onSegment(ax, ay, dx, dy, bx, by)) true
    else if (o3 == 0 && onSegment(cx, cy, ax, ay, dx, dy)) true
    else if (o4 == 0 && onSegment(cx, cy, bx, by, dx, dy)) true
    else false
  }

  private def ringEdges(rings: Seq[Seq[(Double, Double)]]) =
    rings.flatMap(r => r.indices.map(i => (r(i), r((i + 1) % r.length))))

  private def lineSegs(pts: Seq[(Double, Double)]) =
    pts.sliding(2).collect { case Seq(a, b) => (a, b) }.toSeq

  private def segsCross(s1: Seq[((Double, Double), (Double, Double))],
                        s2: Seq[((Double, Double), (Double, Double))]): Boolean =
    s1.exists { case ((ax, ay), (bx, by)) =>
      s2.exists { case ((cx, cy), (dx, dy)) =>
        segmentsIntersect(ax, ay, bx, by, cx, cy, dx, dy) } }

  private def pointOnSegs(lon: Double, lat: Double,
                          segs: Seq[((Double, Double), (Double, Double))]): Boolean =
    segs.exists { case ((ax, ay), (bx, by)) =>
      orient(ax, ay, bx, by, lon, lat) == 0 &&
        onSegment(ax, ay, lon, lat, bx, by) }

  /**
   * geof:sfIntersects for the point/linestring/polygon subset
   * (reference: geof/topological/RelateFF.java → JTS `intersects`):
   * segment-intersection + containment composite —
   *  - point×point: equality; point×line: on-segment; point×polygon:
   *    ray parity;
   *  - line×line: any closed-segment pair intersects;
   *  - line×polygon: any vertex inside, or any segment crosses an edge;
   *  - polygon×polygon: vertex-containment either way, or any edge pair
   *    crosses.
   * Interior-covered degenerate cases (a geometry strictly inside a
   * HOLE's boundary touching nothing) follow ray parity like sfWithin.
   * None = eval error (unparseable/non-WKT input).
   */
  def sfIntersects(a: Term, b: Term): Option[Boolean] = {
    def go(ga: Geom, gb: Geom): Boolean = (ga, gb) match {
      case (GPoint(x1, y1), GPoint(x2, y2)) => x1 == x2 && y1 == y2
      case (GPoint(x, y), GLine(pts)) => pointOnSegs(x, y, lineSegs(pts))
      case (GPoint(x, y), GPolygon(rs)) =>
        pointInRings(x, y, rs) || pointOnSegs(x, y, ringEdges(rs))
      case (GLine(p1), GLine(p2)) => segsCross(lineSegs(p1), lineSegs(p2))
      case (GLine(pts), GPolygon(rs)) =>
        pts.exists { case (x, y) => pointInRings(x, y, rs) } ||
          segsCross(lineSegs(pts), ringEdges(rs))
      case (GPolygon(r1), GPolygon(r2)) =>
        r1.flatten.exists { case (x, y) => pointInRings(x, y, r2) } ||
          r2.flatten.exists { case (x, y) => pointInRings(x, y, r1) } ||
          segsCross(ringEdges(r1), ringEdges(r2))
      case (GMulti(cs), g) => cs.exists(c => go(c, g))
      case (x, y) => go(y, x) // remaining cases are the symmetric flips
    }
    for (ga <- parseGeom(a); gb <- parseGeom(b)) yield go(ga, gb)
  }

  // ---- DE-9IM-lite: the remaining simple-features predicates ------------
  //
  // touches / crosses / overlaps / disjoint / equals for the
  // point/linestring/polygon subset, built from the same orientation-sign
  // + ray-parity primitives as sfIntersects (reference:
  // geof/topological/*.java → JTS relate). No exact arithmetic exists
  // here (documented): interior/boundary classification follows double
  // rounding, and interior-intersection testing uses vertex + midpoint
  // samples plus proper-crossing detection — exact for the generic
  // cases, approximate for adversarially degenerate ones.

  private def strictlyInRings(x: Double, y: Double,
                              rings: Seq[Seq[(Double, Double)]]): Boolean =
    pointInRings(x, y, rings) && !pointOnSegs(x, y, ringEdges(rings))

  private def properCross(s1: Seq[((Double, Double), (Double, Double))],
                          s2: Seq[((Double, Double), (Double, Double))]): Boolean =
    s1.exists { case ((ax, ay), (bx, by)) =>
      s2.exists { case ((cx, cy), (dx, dy)) =>
        val o1 = orient(ax, ay, bx, by, cx, cy)
        val o2 = orient(ax, ay, bx, by, dx, dy)
        val o3 = orient(cx, cy, dx, dy, ax, ay)
        val o4 = orient(cx, cy, dx, dy, bx, by)
        ((o1 > 0 && o2 < 0) || (o1 < 0 && o2 > 0)) &&
          ((o3 > 0 && o4 < 0) || (o3 < 0 && o4 > 0))
      }
    }

  private def midpoints(segs: Seq[((Double, Double), (Double, Double))]) =
    segs.map { case ((ax, ay), (bx, by)) => ((ax + bx) / 2, (ay + by) / 2) }

  /** Collinear overlap of positive length between two segment sets. */
  private def collinearOverlap(
      s1: Seq[((Double, Double), (Double, Double))],
      s2: Seq[((Double, Double), (Double, Double))]): Boolean =
    s1.exists { case ((ax, ay), (bx, by)) =>
      s2.exists { case ((cx, cy), (dx, dy)) =>
        orient(ax, ay, bx, by, cx, cy) == 0 &&
          orient(ax, ay, bx, by, dx, dy) == 0 && {
            // project on the dominant axis; overlap length > 0
            val horiz = math.abs(bx - ax) >= math.abs(by - ay)
            val (a1, a2, b1, b2) =
              if (horiz) (math.min(ax, bx), math.max(ax, bx),
                math.min(cx, dx), math.max(cx, dx))
              else (math.min(ay, by), math.max(ay, by),
                math.min(cy, dy), math.max(cy, dy))
            math.min(a2, b2) > math.max(a1, b1)
          }
      }
    }

  /** Do the INTERIORS of two geometries intersect? (The discriminator
   * between touches and crosses/overlaps/within.) */
  private def interiorsIntersect(a: Geom, b: Geom): Boolean = (a, b) match {
    case (GPoint(x1, y1), GPoint(x2, y2)) => x1 == x2 && y1 == y2
    case (GPoint(x, y), GLine(p)) =>
      // a point's interior is itself; a line's interior excludes its two
      // end vertices
      val segs = lineSegs(p)
      pointOnSegs(x, y, segs) &&
        !((x, y) == p.head || (x, y) == p.last)
    case (GPoint(x, y), GPolygon(rs)) => strictlyInRings(x, y, rs)
    case (GLine(p1), GLine(p2)) =>
      // interior of a polyline = everything except its two GLOBAL end
      // vertices; interior samples = interior vertices + segment midpoints
      val (s1, s2) = (lineSegs(p1), lineSegs(p2))
      def interiorHit(pts: Seq[(Double, Double)],
                      other: Seq[(Double, Double)]) =
        pts.exists { case (x, y) =>
          pointOnSegs(x, y, lineSegs(other)) &&
            (x, y) != other.head && (x, y) != other.last
        }
      properCross(s1, s2) || collinearOverlap(s1, s2) ||
        interiorHit(p1.tail.init ++ midpoints(s1), p2) ||
        interiorHit(p2.tail.init ++ midpoints(s2), p1)
    case (GLine(p), GPolygon(rs)) =>
      val segs = lineSegs(p)
      p.exists { case (x, y) => strictlyInRings(x, y, rs) } ||
        midpoints(segs).exists { case (x, y) => strictlyInRings(x, y, rs) } ||
        properCross(segs, ringEdges(rs))
    case (GPolygon(r1), GPolygon(r2)) =>
      r1.flatten.exists { case (x, y) => strictlyInRings(x, y, r2) } ||
        r2.flatten.exists { case (x, y) => strictlyInRings(x, y, r1) } ||
        midpoints(ringEdges(r1)).exists { case (x, y) => strictlyInRings(x, y, r2) } ||
        midpoints(ringEdges(r2)).exists { case (x, y) => strictlyInRings(x, y, r1) } ||
        properCross(ringEdges(r1), ringEdges(r2))
    case (GMulti(cs), g) => cs.exists(c => interiorsIntersect(c, g))
    case _ => interiorsIntersect(b, a)
  }

  private def dim(g: Geom): Int = g match {
    case _: GPoint => 0
    case _: GLine => 1
    case _: GPolygon => 2
    case GMulti(cs) => if (cs.isEmpty) -1 else cs.map(dim).max
  }

  // component-set helpers for the generalized (multi-aware) predicates
  private def coversPt(g: Geom, x: Double, y: Double): Boolean = g match {
    case GPoint(px, py) => px == x && py == y
    case GLine(p) => pointOnSegs(x, y, lineSegs(p))
    case GPolygon(rs) =>
      pointInRings(x, y, rs) || pointOnSegs(x, y, ringEdges(rs))
    case GMulti(cs) => cs.exists(coversPt(_, x, y))
  }
  private def interiorPt(g: Geom, x: Double, y: Double): Boolean = g match {
    case GPoint(px, py) => px == x && py == y
    case GLine(p) => pointOnSegs(x, y, lineSegs(p)) &&
      (x, y) != p.head && (x, y) != p.last
    case GPolygon(rs) => strictlyInRings(x, y, rs)
    case GMulti(cs) => cs.exists(interiorPt(_, x, y))
  }
  private def samplePts(g: Geom): Seq[(Double, Double)] = g match {
    case GPoint(x, y) => Seq((x, y))
    case GLine(p) => p ++ midpoints(lineSegs(p))
    case GPolygon(rs) => rs.flatten ++ midpoints(ringEdges(rs))
    case GMulti(cs) => cs.flatMap(samplePts)
  }
  private def allSegsOf(g: Geom): Seq[((Double, Double), (Double, Double))] =
    g match {
      case _: GPoint => Nil
      case GLine(p) => lineSegs(p)
      case GPolygon(rs) => ringEdges(rs)
      case GMulti(cs) => cs.flatMap(allSegsOf)
    }
  private def lineSegsOf(g: Geom): Seq[((Double, Double), (Double, Double))] =
    g match {
      case GLine(p) => lineSegs(p)
      case GMulti(cs) => cs.flatMap(lineSegsOf)
      case _ => Nil
    }
  /** Sample-coverage containment: every sample of `a` covered by `b` and
   * no proper edge crossing — the approximation class of this module. */
  private def coveredBy(a: Geom, b: Geom): Boolean =
    samplePts(a).forall { case (x, y) => coversPt(b, x, y) } &&
      !properCross(allSegsOf(a), allSegsOf(b))

  /** geof:sfDisjoint — the exact complement of [[sfIntersects]]. */
  def sfDisjoint(a: Term, b: Term): Option[Boolean] =
    sfIntersects(a, b).map(!_)

  /** geof:sfTouches — geometries intersect but ONLY at boundaries
   * (interiors disjoint). Point×point pairs come out false automatically:
   * a point's interior IS the point, so any shared point intersects
   * interiors. */
  def sfTouches(a: Term, b: Term): Option[Boolean] =
    for (ga <- parseGeom(a); gb <- parseGeom(b); i <- sfIntersects(a, b))
      yield i && !interiorsIntersect(ga, gb)

  /** geof:sfCrosses — interiors intersect and the intersection is
   * lower-dimensional than the higher-dimensional input, per the SF
   * dimension table: (multi)point vs line/polygon (some point interior
   * to the other, some point outside), line×line proper crossings,
   * line×polygon pass-throughs. Same-dimension non-point pairs never
   * cross (that is overlaps' domain). */
  def sfCrosses(a: Term, b: Term): Option[Boolean] =
    for (ga <- parseGeom(a); gb <- parseGeom(b)) yield {
      val (da, db) = (dim(ga), dim(gb))
      def ptsCross(pts: Geom, other: Geom): Boolean = {
        val ps = samplePts(pts)
        ps.exists { case (x, y) => interiorPt(other, x, y) } &&
          ps.exists { case (x, y) => !coversPt(other, x, y) }
      }
      def lineCrossesArea(l: Geom, ar: Geom): Boolean =
        interiorsIntersect(l, ar) &&
          samplePts(l).exists { case (x, y) => !coversPt(ar, x, y) }
      (da, db) match {
        case (0, 1) | (0, 2) => ptsCross(ga, gb)
        case (1, 0) | (2, 0) => ptsCross(gb, ga)
        case (1, 1) => properCross(lineSegsOf(ga), lineSegsOf(gb))
        case (1, 2) => lineCrossesArea(ga, gb)
        case (2, 1) => lineCrossesArea(gb, ga)
        case _ => false
      }
    }

  /** geof:sfOverlaps — same dimension, interiors intersect, and neither
   * covers the other (containment tested by vertex+midpoint samples —
   * same approximation class as the rest of this module). Line pairs
   * additionally require a positive-length collinear run (a point-only
   * crossing is crosses, not overlaps). */
  def sfOverlaps(a: Term, b: Term): Option[Boolean] =
    for (ga <- parseGeom(a); gb <- parseGeom(b)) yield {
      val (da, db) = (dim(ga), dim(gb))
      da == db && (da match {
        case 0 => interiorsIntersect(ga, gb) &&
          !coveredBy(ga, gb) && !coveredBy(gb, ga)
        case 1 => collinearOverlap(lineSegsOf(ga), lineSegsOf(gb)) &&
          !coveredBy(ga, gb) && !coveredBy(gb, ga)
        case 2 => interiorsIntersect(ga, gb) &&
          !coveredBy(ga, gb) && !coveredBy(gb, ga)
        case _ => false
      })
    }

  /** geof:sfEquals — topological equality for the subset: equal
   * dimensions plus mutual sample coverage with no proper crossings
   * (vertex-redistribution and component-split tolerant — a LINESTRING
   * equals the MULTILINESTRING that partitions it). */
  def sfEquals(a: Term, b: Term): Option[Boolean] =
    for (ga <- parseGeom(a); gb <- parseGeom(b))
      yield dim(ga) == dim(gb) && coveredBy(ga, gb) && coveredBy(gb, ga)

  // ---- non-topological geometry functions (geof:envelope / boundary /
  //      convexHull / getSRID — jena-geosparql's JTS-free-implementable
  //      subset; buffer and the set-operation functions need real
  //      polygon clipping and stay out of scope) ------------------------

  private def fmt(d: Double): String =
    if (d == math.floor(d) && !d.isInfinite && math.abs(d) < 1e15)
      d.toLong.toString
    else d.toString

  private def fmtPt(p: (Double, Double)): String = s"${fmt(p._1)} ${fmt(p._2)}"

  /** Serialize a parsed geometry back to WKT. */
  def toWkt(g: Geom): String = g match {
    case GPoint(x, y) => s"POINT(${fmt(x)} ${fmt(y)})"
    case GLine(p) => s"LINESTRING(${p.map(fmtPt).mkString(", ")})"
    case GPolygon(rs) => "POLYGON(" + rs.map(r =>
      "(" + (r :+ r.head).map(fmtPt).mkString(", ") + ")").mkString(", ") + ")"
    case GMulti(Nil) => "GEOMETRYCOLLECTION EMPTY"
    case GMulti(cs) if cs.forall(_.isInstanceOf[GPoint]) =>
      "MULTIPOINT(" + cs.map { case GPoint(x, y) => s"(${fmt(x)} ${fmt(y)})" }
        .mkString(", ") + ")"
    case GMulti(cs) if cs.forall(_.isInstanceOf[GLine]) =>
      "MULTILINESTRING(" + cs.map { case GLine(p) =>
        "(" + p.map(fmtPt).mkString(", ") + ")" }.mkString(", ") + ")"
    case GMulti(cs) => "GEOMETRYCOLLECTION(" + cs.map(toWkt).mkString(", ") + ")"
  }

  def wktTerm(g: Geom): Term = Term.lit(toWkt(g), WKT_DT)

  /** geof:envelope — bounding box as a polygon (degenerate inputs give a
   * POINT or axis-aligned LINESTRING, JTS Envelope semantics). */
  def envelope(g: Geom): Option[Geom] = {
    val pts = samplePts(g)
    if (pts.isEmpty) return Some(GMulti(Nil))
    val (xs, ys) = (pts.map(_._1), pts.map(_._2))
    val (x0, x1, y0, y1) = (xs.min, xs.max, ys.min, ys.max)
    Some(
      if (x0 == x1 && y0 == y1) GPoint(x0, y0)
      else if (x0 == x1 || y0 == y1) GLine(Seq((x0, y0), (x1, y1)))
      else GPolygon(Seq(Seq((x0, y0), (x1, y0), (x1, y1), (x0, y1)))))
  }

  /** geof:boundary — point: empty; line: MOD-2 endpoints (JTS
   * Mod2BoundaryNodeRule — endpoints shared by an even number of
   * component ends cancel, so a closed line has an empty boundary);
   * polygon: its rings as closed linestrings. */
  def boundary(g: Geom): Option[Geom] = {
    def lineEnds(geom: Geom): Seq[(Double, Double)] = geom match {
      case GLine(p) => Seq(p.head, p.last)
      case GMulti(cs) => cs.flatMap(lineEnds)
      case _ => Nil
    }
    def ringsOf(geom: Geom): Seq[Seq[(Double, Double)]] = geom match {
      case GPolygon(rs) => rs
      case GMulti(cs) => cs.flatMap(ringsOf)
      case _ => Nil
    }
    val oddEnds = lineEnds(g).groupBy(identity).collect {
      case (p, occ) if occ.size % 2 == 1 => p
    }.toSeq.sortBy(identity)
    val ringLines = ringsOf(g).map(r => GLine(r :+ r.head))
    val comps = oddEnds.map { case (x, y) => GPoint(x, y) } ++ ringLines
    Some(comps match {
      case Seq(one) => one
      case cs => GMulti(cs)
    })
  }

  /** geof:convexHull — Andrew's monotone chain over every vertex
   * (degenerate inputs give POINT / LINESTRING). */
  def convexHull(g: Geom): Option[Geom] = {
    val pts = samplePts(g).distinct.sorted
    if (pts.isEmpty) return Some(GMulti(Nil))
    if (pts.length == 1) return Some(GPoint(pts.head._1, pts.head._2))
    def half(ps: Seq[(Double, Double)]): Seq[(Double, Double)] = {
      val h = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
      ps.foreach { p =>
        while (h.length >= 2 && orient(h(h.length - 2)._1, h(h.length - 2)._2,
          h.last._1, h.last._2, p._1, p._2) <= 0) h.remove(h.length - 1)
        h += p
      }
      h.toSeq
    }
    val lower = half(pts)
    val upper = half(pts.reverse)
    val hull = (lower.init ++ upper.init)
    if (hull.length <= 1) Some(GPoint(pts.head._1, pts.head._2))
    else if (hull.length == 2) Some(GLine(hull))
    else Some(GPolygon(Seq(hull)))
  }

  /** geof:getSRID — the geometry literal's CRS IRI (explicit prefix, else
   * the geo:wktLiteral default CRS84). */
  val DEFAULT_CRS = "http://www.opengis.net/def/crs/OGC/1.3/CRS84"
  def getSrid(t: Term): Option[String] = {
    if (t == null || !t.isLiteral || t.dt != WKT_DT) return None
    val m = java.util.regex.Pattern.compile("^\\s*<([^>]*)>").matcher(t.lex)
    Some(if (m.find()) m.group(1) else DEFAULT_CRS)
  }

  /**
   * CONSTANT-polygon segment-intersection as a pure codegen'd Column
   * predicate (the sfIntersects hot path for a segments corpus vs a
   * region): both endpoints' parity tests plus a STRICT orientation-sign
   * crossing test per polygon edge, all unrolled into whole-stage
   * codegen. The strict (<0 product) crossing test omits the
   * measure-zero collinear/touching cases — exactly the predicate the
   * DuckDB oracle restates; the exact closed-segment semantics live in
   * [[sfIntersects]].
   */
  def segIntersectsPolygonCol(ax: Column, ay: Column, bx: Column, by: Column,
                              rings: Seq[Seq[(Double, Double)]]): Column = {
    def orientC(px: Column, py: Column, qx: Column, qy: Column,
                rx: Column, ry: Column): Column =
      (qx - px) * (ry - py) - (qy - py) * (rx - px)
    val crosses = ringEdges(rings).map { case ((cx, cy), (dx, dy)) =>
      val o1 = orientC(ax, ay, bx, by, lit(cx), lit(cy))
      val o2 = orientC(ax, ay, bx, by, lit(dx), lit(dy))
      val o3 = orientC(lit(cx), lit(cy), lit(dx), lit(dy), ax, ay)
      val o4 = orientC(lit(cx), lit(cy), lit(dx), lit(dy), bx, by)
      o1 * o2 < 0 && o3 * o4 < 0
    }.reduce(_ || _)
    withinPolygonCol(ax, ay, rings) || withinPolygonCol(bx, by, rings) || crosses
  }

  /**
   * CONSTANT-polygon membership as a pure codegen'd Column predicate —
   * the common 100 TB shape (filter a corpus by a region): the polygon
   * parses ONCE on the driver, the bbox prefilter is a pushable
   * four-comparison conjunction, and the ray-crossing parity unrolls to
   * a chain of per-edge conditional adds inside whole-stage codegen (no
   * UDF, no per-row parsing).
   */
  def withinPolygonCol(lon: Column, lat: Column,
                       rings: Seq[Seq[(Double, Double)]]): Column = {
    val all = rings.flatten
    val (minX, maxX) = (all.map(_._1).min, all.map(_._1).max)
    val (minY, maxY) = (all.map(_._2).min, all.map(_._2).max)
    val bbox = lon >= minX && lon <= maxX && lat >= minY && lat <= maxY
    val edges = rings.flatMap { ring =>
      ring.indices.map(i => (ring(i), ring((i + 1) % ring.length)))
    }
    val crossings = edges.map { case ((ax, ay), (bx, by)) =>
      when((lit(ay) > lat) =!= (lit(by) > lat) &&
        lon < lit(ax) + lit(bx - ax) * (lat - lit(ay)) / lit(by - ay), 1)
        .otherwise(0)
    }.reduce(_ + _)
    bbox && crossings % 2 === 1
  }

  /**
   * Grid-bucketed point-in-polygon JOIN for a polygons TABLE: each
   * polygon's bbox explodes into `cellDeg` grid cells (area-bounded),
   * each point owns one cell, candidates come from the (cx, cy)
   * equi-join, and the exact ray test runs per candidate — the spatial
   * twin of the LSH band joins; never an all-pairs product.
   *
   * points: (id, lon, lat); polys: (pid, wkt lexical form).
   * Returns (id, pid) pairs.
   */
  def polygonJoin(points: DataFrame, polys: DataFrame,
                  cellDeg: Double): DataFrame = {
    // the parse UDF runs once per POLYGON row (table side, not candidate
    // side) and emits the closed edge list directly: [ax, ay, bx, by]
    // per edge across all rings — holes included, parity handles them
    val edgesUdf = udf((lex: String) =>
      parsePolygon(lex).map { rings =>
        rings.flatMap { r =>
          r.indices.map { i =>
            val (a, b) = (r(i), r((i + 1) % r.length))
            Array(a._1, a._2, b._1, b._2)
          }
        }.toArray
      }.orNull)
    val withEdges = polys.select(col("pid"), edgesUdf(col("wkt")).as("edges"))
      .where(col("edges").isNotNull)
    def axis(i: Int) = s"transform(edges, e -> e[$i])"
    val cells = withEdges
      .withColumn("cx", explode(sequence(
        floor(expr(s"array_min(${axis(0)})") / cellDeg),
        floor(expr(s"array_max(${axis(0)})") / cellDeg))))
      .withColumn("cy", explode(sequence(
        floor(expr(s"array_min(${axis(1)})") / cellDeg),
        floor(expr(s"array_max(${axis(1)})") / cellDeg))))
      .select(col("pid"), col("edges"), col("cx"), col("cy"))
    val pts = points.select(col("id"), col("lon"), col("lat"),
      floor(col("lon") / cellDeg).as("cx"), floor(col("lat") / cellDeg).as("cy"))
    // exact ray test per candidate as a higher-order AGGREGATE over the
    // edge array — the d5 conditional-sum trick: no UDF in the filter,
    // no candidate×edge explode/shuffle; crossing parity folds in place
    val parity = expr(
      """aggregate(edges, 0,
           (acc, e) -> acc + IF(((e[1] > lat) != (e[3] > lat))
             AND lon < e[0] + (e[2] - e[0]) * (lat - e[1]) / (e[3] - e[1]),
             1, 0)) % 2 = 1""")
    pts.join(cells, Seq("cx", "cy"))
      .where(parity)
      .select(col("id"), col("pid"))
  }
}
