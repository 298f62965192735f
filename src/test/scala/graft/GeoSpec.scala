package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Term
import graft.ops.Geo

/** GeoSPARQL-lite: WKT point parsing, geof:distance (haversine), the
 * grid-bucketed spatial radius join vs a brute-force oracle, and the
 * plan-shape guard (equi-join on cells, no nested loop). */
class GeoSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("WKT point extraction handles CRS prefixes and signs") {
    import spark.implicits._
    val df = Seq(
      "POINT(2.3514 48.8575)",
      "<http://www.opengis.net/def/crs/OGC/1.3/CRS84> POINT(-0.1278 51.5074)",
      "POINT(1e1 -2.5)",
      "LINESTRING(0 0, 1 1)").toDF("lex")
      .select(Geo.wktLon(col("lex")).as("lon"), Geo.wktLat(col("lex")).as("lat"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) == 2.3514 && rows(0).getDouble(1) == 48.8575)
    assert(rows(1).getDouble(0) == -0.1278 && rows(1).getDouble(1) == 51.5074)
    assert(rows(2).getDouble(0) == 10.0 && rows(2).getDouble(1) == -2.5)
    assert(rows(3).isNullAt(0)) // non-point geometry → NULL (eval error)
  }

  test("geof:distance — Paris↔London great circle ≈ 343.9 km") {
    val paris = Geo.wktPointTerm(2.3514, 48.8575)
    val london = Geo.wktPointTerm(-0.1278, 51.5074)
    val km = Geo.distance(paris, london, Geo.UOM_KILOMETRE).get
    assert(math.abs(km - 343.9) < 1.5, s"got $km km")
    val m = Geo.distance(paris, london, Geo.UOM_METRE).get
    assert(math.abs(m / 1000.0 - km) < 1e-9)
    assert(Geo.distance(paris, Term.string("nope"), Geo.UOM_METRE).isEmpty)
  }

  test("geof:distance callable from SPARQL text via the registry") {
    val q = """
      PREFIX geof: <http://www.opengis.net/def/function/geosparql/>
      PREFIX geo: <http://www.opengis.net/ont/geosparql#>
      PREFIX uom: <http://www.opengis.net/def/uom/OGC/1.0/>
      SELECT ?d WHERE {
        BIND(geof:distance("POINT(0 0)"^^geo:wktLiteral,
                           "POINT(0 1)"^^geo:wktLiteral, uom:kilometre) AS ?d)
      }"""
    val emptyGraph = spark.createDataset(Seq.empty[graft.model.Triple])(
      org.apache.spark.sql.Encoders.product[graft.model.Triple]).toDF()
    val df = graft.sparql.Sparql.select(q, emptyGraph)
    val d = df.collect()(0).getAs[org.apache.spark.sql.Row]("d")
      .getAs[String]("lex").toDouble
    assert(math.abs(d - 111.195) < 0.1, s"got $d km per degree")
  }

  test("radius grid join matches the brute-force pairs and avoids BNLJ") {
    import spark.implicits._
    val pts = (1L to 400L).toDF("id")
      .withColumn("lat", expr(
        "cast(conv(substr(md5(concat(id, 'lat')), 1, 15), 16, 10) as bigint)") % 1800 / 10.0 - 90.0)
      .withColumn("lon", expr(
        "cast(conv(substr(md5(concat(id, 'lon')), 1, 15), 16, 10) as bigint)") % 3600 / 10.0 - 180.0)
    val joined = Geo.radiusJoinPlanar(pts, 5.0)
    val brute = pts.as("p").join(pts.as("q"), col("p.id") < col("q.id"))
      .where(pow(col("p.lat") - col("q.lat"), 2) +
             pow(col("p.lon") - col("q.lon"), 2) <= 25.0)
      .select(col("p.id").as("a"), col("q.id").as("b"))
    assert(joined.count() > 0)
    assert(joined.exceptAll(brute).isEmpty && brute.exceptAll(joined).isEmpty)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "spatial join must stay on the grid-cell equi-join")
  }

  // the concave L-shape used across the polygon tests (CCW outer ring)
  private val L_WKT =
    "POLYGON((0 0, 60 0, 60 30, 30 30, 30 60, 0 60, 0 0))"

  test("point-in-polygon: parsing, concavity, holes, scalar/column parity") {
    val rings = Geo.parsePolygon(L_WKT).get
    assert(rings.head.length == 6) // closing vertex stripped
    // concave notch: (45, 45) is OUTSIDE the L, (15, 45) inside
    assert(!Geo.pointInRings(45, 45, rings))
    assert(Geo.pointInRings(15, 45, rings))
    assert(Geo.pointInRings(45, 15, rings))
    assert(!Geo.pointInRings(-1, 30, rings))
    // hole flips parity, point inside the hole is OUT
    val holed = Geo.parsePolygon(
      "POLYGON((0 0, 10 0, 10 10, 0 10), (4 4, 6 4, 6 6, 4 6))").get
    assert(Geo.pointInRings(2, 2, holed))
    assert(!Geo.pointInRings(5, 5, holed))
    // malformed vertices are PARSE errors (None), never task-killing
    // exceptions — one dirty literal must drop the row, not the job
    assert(Geo.parsePolygon("POLYGON((1, 2 2, 3 3))").isEmpty)
    assert(Geo.parsePolygon("POLYGON((1 x, 2 2, 3 3))").isEmpty)
    assert(Geo.parsePolygon("POLYGON((1 1, 2 2))").isEmpty)
    assert(Geo.sfWithin(Geo.wktPointTerm(1, 1),
      Term.lit("POLYGON((1, 2 2, 3 3))", Geo.WKT_DT)).isEmpty)
    // geof:sfWithin term face + point-within-point
    val geoPt = (lon: Double, lat: Double) => Geo.wktPointTerm(lon, lat)
    assert(Geo.sfWithin(geoPt(15, 45), Term.lit(L_WKT, Geo.WKT_DT)).get)
    assert(!Geo.sfWithin(geoPt(45, 45), Term.lit(L_WKT, Geo.WKT_DT)).get)
    assert(Geo.sfWithin(geoPt(1, 2), geoPt(1, 2)).get)
    assert(Geo.sfWithin(Term.string("x"), geoPt(1, 2)).isEmpty) // eval error
    // column face agrees with the scalar on a deterministic point cloud
    import spark.implicits._
    val pts = (0 until 500).map { k =>
      (k.toLong, (k * 37 % 140) - 20.0, (k * 53 % 140) - 20.0)
    }
    val df = pts.toDF("id", "lon", "lat")
      .where(Geo.withinPolygonCol(col("lon"), col("lat"), rings))
    val expected = pts.filter(p => Geo.pointInRings(p._2, p._3, rings))
      .map(_._1).toSet
    assert(df.collect().map(_.getLong(0)).toSet == expected)
  }

  test("geof:sfWithin / sfContains callable from SPARQL text") {
    val q = s"""
      PREFIX geof: <http://www.opengis.net/def/function/geosparql/>
      PREFIX geo: <http://www.opengis.net/ont/geosparql#>
      SELECT ?in ?out ?cont WHERE {
        BIND(geof:sfWithin("POINT(15 45)"^^geo:wktLiteral,
                           "$L_WKT"^^geo:wktLiteral) AS ?in)
        BIND(geof:sfWithin("POINT(45 45)"^^geo:wktLiteral,
                           "$L_WKT"^^geo:wktLiteral) AS ?out)
        BIND(geof:sfContains("$L_WKT"^^geo:wktLiteral,
                             "POINT(15 45)"^^geo:wktLiteral) AS ?cont)
      }"""
    val emptyGraph = spark.createDataset(Seq.empty[graft.model.Triple])(
      org.apache.spark.sql.Encoders.product[graft.model.Triple]).toDF()
    val r = graft.sparql.Sparql.select(q, emptyGraph).collect()(0)
    def lex(c: String) = r.getAs[org.apache.spark.sql.Row](c).getAs[String]("lex")
    assert(lex("in") == "true" && lex("out") == "false" && lex("cont") == "true")
  }

  test("polygonJoin: grid-bucketed candidates, exact ray test, no BNLJ") {
    import spark.implicits._
    val pts = (0 until 400).map { k =>
      (k.toLong, (k * 37 % 160) - 30.0, (k * 53 % 160) - 30.0)
    }.toDF("id", "lon", "lat")
    val polyWkts = Seq(
      (1L, L_WKT),
      (2L, "POLYGON((100 100, 110 100, 110 110, 100 110))"),
      (3L, "POLYGON((-30 -30, -10 -30, -10 -10, -30 -10))"))
    val polys = polyWkts.toDF("pid", "wkt")
    val out = Geo.polygonJoin(pts, polys, cellDeg = 20.0)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val parsed = polyWkts.map { case (pid, w) => (pid, Geo.parsePolygon(w).get) }
    val expected = (0 until 400).flatMap { k =>
      val (lon, lat) = ((k * 37 % 160) - 30.0, (k * 53 % 160) - 30.0)
      parsed.collect {
        case (pid, r0) if Geo.pointInRings(lon, lat, r0) => (k.toLong, pid)
      }
    }.toSet
    assert(got == expected)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "polygon join must stay on the grid-cell equi-join:\n" + plan)
    // the ray test is a higher-order fold over the edge array, not a UDF:
    // the per-candidate predicate (a FilterExec, or folded into the hash
    // join's post-join condition) must be the aggregate() fold with no
    // Scala UDF anywhere in it
    val conds = plan.linesIterator
      .filter(l => l.contains("Filter") || l.contains("Join")).toSeq
    assert(conds.exists(_.contains("aggregate(")),
      "parity predicate should be the HOF fold:\n" + plan)
    assert(!conds.exists(_.contains("UDF")),
      "no UDF in the candidate predicate:\n" + conds.mkString("\n"))
  }

  test("segment intersection: orientation + collinear cases") {
    // proper crossing
    assert(Geo.segmentsIntersect(0, 0, 10, 10, 0, 10, 10, 0))
    // disjoint
    assert(!Geo.segmentsIntersect(0, 0, 1, 1, 5, 5, 6, 6))
    // touching at an endpoint (closed semantics)
    assert(Geo.segmentsIntersect(0, 0, 5, 5, 5, 5, 9, 0))
    // collinear overlapping
    assert(Geo.segmentsIntersect(0, 0, 4, 0, 2, 0, 6, 0))
    // collinear disjoint
    assert(!Geo.segmentsIntersect(0, 0, 1, 0, 3, 0, 5, 0))
    // T-touch (endpoint on interior)
    assert(Geo.segmentsIntersect(0, 0, 10, 0, 5, -5, 5, 0))
  }

  test("sfIntersects: point/linestring/polygon composite") {
    def wkt(s: String) = Term.lit(s, Geo.WKT_DT)
    val poly = wkt("POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))")
    val holed = wkt("POLYGON((0 0, 20 0, 20 20, 0 20, 0 0), (5 5, 15 5, 15 15, 5 15, 5 5))")
    // line crossing the polygon edge, neither endpoint inside
    assert(Geo.sfIntersects(wkt("LINESTRING(-5 5, 15 5)"), poly).get)
    // line fully outside
    assert(!Geo.sfIntersects(wkt("LINESTRING(20 20, 30 30)"), poly).get)
    // line fully inside (no edge crossing — containment arm)
    assert(Geo.sfIntersects(wkt("LINESTRING(2 2, 3 3)"), poly).get)
    // line inside the HOLE of a holed polygon: parity says outside
    assert(!Geo.sfIntersects(wkt("LINESTRING(9 9, 11 11)"), holed).get)
    // symmetric dispatch
    assert(Geo.sfIntersects(poly, wkt("LINESTRING(-5 5, 15 5)")).get)
    // polygon×polygon: overlap / disjoint / one-inside-other
    assert(Geo.sfIntersects(poly,
      wkt("POLYGON((5 5, 15 5, 15 15, 5 15, 5 5))")).get)
    assert(!Geo.sfIntersects(poly,
      wkt("POLYGON((20 20, 30 20, 30 30, 20 30, 20 20))")).get)
    assert(Geo.sfIntersects(poly,
      wkt("POLYGON((2 2, 3 2, 3 3, 2 3, 2 2))")).get)
    // point cases: on-segment, in-polygon, disjoint
    assert(Geo.sfIntersects(wkt("POINT(5 0)"), poly).get)
    assert(Geo.sfIntersects(wkt("POINT(5 5)"), poly).get)
    assert(!Geo.sfIntersects(wkt("POINT(50 50)"), poly).get)
    assert(Geo.sfIntersects(wkt("POINT(2 2)"), wkt("LINESTRING(0 0, 4 4)")).get)
    // eval error on junk
    assert(Geo.sfIntersects(Term.string("nope"), poly).isEmpty)
  }

  test("DE-9IM-lite: touches / crosses / overlaps / disjoint / equals") {
    def wkt(s: String) = Term.lit(s, Geo.WKT_DT)
    val box = wkt("POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))")
    // --- touches: boundary-only contact
    assert(Geo.sfTouches(wkt("POINT(5 0)"), box).get)           // on edge
    assert(!Geo.sfTouches(wkt("POINT(5 5)"), box).get)          // interior
    assert(Geo.sfTouches(wkt("POLYGON((10 0, 20 0, 20 10, 10 10, 10 0))"), box).get) // shared edge
    assert(!Geo.sfTouches(wkt("POLYGON((5 5, 15 5, 15 15, 5 15, 5 5))"), box).get)   // overlap
    assert(Geo.sfTouches(wkt("LINESTRING(10 2, 10 8)"), box).get) // along edge
    assert(Geo.sfTouches(wkt("LINESTRING(10 5, 20 5)"), box).get) // endpoint on edge
    assert(!Geo.sfTouches(wkt("POINT(1 1)"), wkt("POINT(1 1)")).get) // empty boundary
    // line endpoint touching another line's endpoint
    assert(Geo.sfTouches(wkt("LINESTRING(0 0, 5 5)"), wkt("LINESTRING(5 5, 9 0)")).get)
    // lines crossing do NOT touch
    assert(!Geo.sfTouches(wkt("LINESTRING(0 0, 10 10)"), wkt("LINESTRING(0 10, 10 0)")).get)
    // --- crosses
    assert(Geo.sfCrosses(wkt("LINESTRING(0 0, 10 10)"), wkt("LINESTRING(0 10, 10 0)")).get)
    assert(!Geo.sfCrosses(wkt("LINESTRING(0 0, 4 0)"), wkt("LINESTRING(2 0, 8 0)")).get) // collinear = overlaps
    assert(Geo.sfCrosses(wkt("LINESTRING(-5 5, 15 5)"), box).get)  // through the box
    assert(Geo.sfCrosses(box, wkt("LINESTRING(5 5, 15 5)")).get)   // in-to-out
    assert(!Geo.sfCrosses(wkt("LINESTRING(2 2, 8 8)"), box).get)   // fully inside = within
    assert(!Geo.sfCrosses(wkt("POINT(5 5)"), box).get)             // points never cross
    // --- overlaps
    assert(Geo.sfOverlaps(wkt("LINESTRING(0 0, 4 0)"), wkt("LINESTRING(2 0, 8 0)")).get)
    assert(!Geo.sfOverlaps(wkt("LINESTRING(0 0, 10 0)"), wkt("LINESTRING(2 0, 8 0)")).get) // containment
    assert(Geo.sfOverlaps(box, wkt("POLYGON((5 5, 15 5, 15 15, 5 15, 5 5))")).get)
    assert(!Geo.sfOverlaps(box, wkt("POLYGON((2 2, 3 2, 3 3, 2 3, 2 2))")).get) // contained
    assert(!Geo.sfOverlaps(box, wkt("LINESTRING(-5 5, 15 5)")).get) // dim mismatch
    // --- disjoint = NOT intersects
    assert(Geo.sfDisjoint(wkt("POINT(50 50)"), box).get)
    assert(!Geo.sfDisjoint(wkt("POINT(5 5)"), box).get)
    // --- equals (vertex-redistribution tolerant)
    assert(Geo.sfEquals(box, wkt("POLYGON((0 0, 5 0, 10 0, 10 10, 0 10, 0 0))")).get)
    assert(Geo.sfEquals(box,
      wkt("POLYGON((0 0, 10 0, 10 10, 0 10, 0 5, 0 0))")).get) // extra collinear vertex → equal
    assert(!Geo.sfEquals(box,
      wkt("POLYGON((0 0, 12 0, 12 10, 0 10, 0 0))")).get) // genuinely different ring
    assert(Geo.sfEquals(wkt("LINESTRING(0 0, 10 0)"), wkt("LINESTRING(0 0, 5 0, 10 0)")).get)
    assert(!Geo.sfEquals(wkt("LINESTRING(0 0, 10 0)"), wkt("LINESTRING(0 0, 8 0)")).get)
    assert(Geo.sfEquals(wkt("POINT(3 4)"), wkt("POINT(3 4)")).get)
    // eval error propagates
    assert(Geo.sfTouches(Term.string("junk"), box).isEmpty)
  }

  test("multi-geometries: MULTI*/GEOMETRYCOLLECTION parse + predicates") {
    def wkt(s: String) = Term.lit(s, Geo.WKT_DT)
    val box = wkt("POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))")
    val mp = wkt("MULTIPOINT((5 5), (50 50))")
    val mpBare = wkt("MULTIPOINT(5 5, 50 50)")
    val ml = wkt("MULTILINESTRING((0 0, 4 0), (20 20, 30 30))")
    val mpoly = wkt("MULTIPOLYGON(((0 0, 10 0, 10 10, 0 10, 0 0)), ((20 20, 30 20, 30 30, 20 30, 20 20)))")
    val gc = wkt("GEOMETRYCOLLECTION(POINT(5 5), LINESTRING(20 20, 30 30))")
    // intersects: any component
    assert(Geo.sfIntersects(mp, box).get)
    assert(Geo.sfIntersects(mpBare, box).get)
    assert(!Geo.sfIntersects(ml, box).get ||
      Geo.sfIntersects(ml, box).get == Geo.sfIntersects(box, ml).get) // symmetric
    assert(Geo.sfIntersects(wkt("MULTILINESTRING((0 0, 4 0))"),
      wkt("LINESTRING(2 0, 8 0)")).get)
    assert(Geo.sfIntersects(gc, wkt("POINT(5 5)")).get)
    assert(Geo.sfIntersects(mpoly, wkt("POINT(25 25)")).get)
    assert(Geo.sfDisjoint(mpoly, wkt("POINT(15 15)")).get)
    // crosses: a multipoint with one point inside and one outside CROSSES
    assert(Geo.sfCrosses(mp, box).get)
    assert(!Geo.sfCrosses(wkt("MULTIPOINT((5 5), (6 6))"), box).get) // all inside = within
    // touches via a component boundary only
    assert(Geo.sfTouches(wkt("MULTIPOINT((5 0), (50 50))"), box).get)
    // equals: a line equals the multiline that partitions it
    assert(Geo.sfEquals(wkt("LINESTRING(0 0, 10 0)"),
      wkt("MULTILINESTRING((0 0, 4 0), (4 0, 10 0))")).get)
    assert(!Geo.sfEquals(wkt("LINESTRING(0 0, 10 0)"),
      wkt("MULTILINESTRING((0 0, 4 0), (6 0, 10 0))")).get) // gap
    // overlaps across components
    assert(Geo.sfOverlaps(wkt("MULTIPOINT(1 1, 2 2)"),
      wkt("MULTIPOINT(2 2, 3 3)")).get)
    // EMPTY geometries intersect nothing, equal each other
    assert(Geo.sfDisjoint(wkt("POINT EMPTY"), box).get)
    assert(Geo.sfEquals(wkt("POINT EMPTY"), wkt("MULTIPOLYGON EMPTY")).get)
    // malformed multi → eval error
    assert(Geo.sfIntersects(wkt("MULTIPOINT((5 5)"), box).isEmpty)
  }

  test("geometry functions: envelope / boundary / convexHull / getSRID") {
    def wkt(s: String) = Term.lit(s, Geo.WKT_DT)
    def geom(s: String) = Geo.parseGeom(wkt(s)).get
    // envelope
    assert(Geo.toWkt(Geo.envelope(geom("LINESTRING(1 2, 5 8, 3 0)")).get) ==
      "POLYGON((1 0, 5 0, 5 8, 1 8, 1 0))")
    assert(Geo.toWkt(Geo.envelope(geom("POINT(3 4)")).get) == "POINT(3 4)")
    assert(Geo.toWkt(Geo.envelope(geom("LINESTRING(0 2, 0 9)")).get) ==
      "LINESTRING(0 2, 0 9)")
    // boundary: line endpoints; closed line empty; polygon rings; mod-2
    assert(Geo.toWkt(Geo.boundary(geom("LINESTRING(0 0, 5 5)")).get) ==
      "MULTIPOINT((0 0), (5 5))")
    assert(Geo.toWkt(Geo.boundary(geom("LINESTRING(0 0, 5 0, 5 5, 0 0)")).get) ==
      "GEOMETRYCOLLECTION EMPTY")
    assert(Geo.toWkt(Geo.boundary(geom("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))")).get) ==
      "LINESTRING(0 0, 4 0, 4 4, 0 4, 0 0)")
    // mod-2: two lines sharing an endpoint — the shared one cancels
    assert(Geo.toWkt(Geo.boundary(
      geom("MULTILINESTRING((0 0, 5 5), (5 5, 9 0))")).get) ==
      "MULTIPOINT((0 0), (9 0))")
    // convex hull
    assert(Geo.toWkt(Geo.convexHull(
      geom("MULTIPOINT(0 0, 4 0, 4 4, 0 4, 2 2, 1 3)")).get) ==
      "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert(Geo.toWkt(Geo.convexHull(geom("MULTIPOINT(0 0, 2 2, 4 4)")).get) ==
      "LINESTRING(0 0, 4 4)")
    assert(Geo.toWkt(Geo.convexHull(geom("POINT(7 7)")).get) == "POINT(7 7)")
    // getSRID: explicit CRS prefix vs CRS84 default
    assert(Geo.getSrid(wkt("POINT(1 2)")).get == Geo.DEFAULT_CRS)
    assert(Geo.getSrid(wkt(
      "<http://www.opengis.net/def/crs/EPSG/0/4326> POINT(1 2)")).get ==
      "http://www.opengis.net/def/crs/EPSG/0/4326")
    // hull of a polygon contains the polygon (sample check)
    val hull = Geo.convexHull(geom("POLYGON((0 0, 60 0, 60 30, 30 30, 30 60, 0 60, 0 0))")).get
    assert(Geo.sfIntersects(Geo.wktTerm(hull), wkt("POINT(45 45)")).get) // concavity filled
  }

  test("WKT round-trip + parser robustness (never throws)") {
    def wkt(s: String) = Term.lit(s, Geo.WKT_DT)
    // parse → toWkt → parse is a fixpoint on the multi types
    for (s <- Seq(
      "MULTIPOINT((1 2), (3 4))",
      "MULTILINESTRING((0 0, 1 1), (2 2, 3 3, 4 0))",
      "GEOMETRYCOLLECTION(POINT(1 2), LINESTRING(0 0, 1 1))",
      "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))")) {
      val g1 = Geo.parseGeom(wkt(s)).get
      val g2 = Geo.parseGeom(wkt(Geo.toWkt(g1))).get
      assert(g1 == g2, s"round-trip drift on $s")
    }
    // malformed / junk inputs: Option.empty, never an exception
    for (junk <- Seq("", "POINT", "POINT(", "POINT(1)", "POINT(a b)",
      "MULTIPOINT((1 2)", "MULTIPOLYGON(((0 0, 1 0)))", "POLYGON(0 0, 1 1)",
      "GEOMETRYCOLLECTION(POINT(1 2), )", "LINESTRING(1 1)",
      "GEOMETRYCOLLECTION(GEOMETRYCOLLECTION(GEOMETRYCOLLECTION EMPTY)))",
      "MULTIPOINT(1 2, )", " POINT(1 2)", "POINT(1 2) extra")) {
      assert(Geo.parseGeom(wkt(junk)).forall {
        case Geo.GMulti(_) => true; case g => g != null },
        s"parser misbehaved on <$junk>")
    }
    // pseudo-random byte noise: parse must return cleanly
    val rnd = new scala.util.Random(42)
    (0 until 500).foreach { _ =>
      val s = (0 until rnd.nextInt(30)).map(_ =>
        "MULTIPOINT()LINES, 0123.eE-(".charAt(rnd.nextInt(27))).mkString
      Geo.parseGeom(wkt(s)) // must not throw
    }
  }

  test("segIntersectsPolygonCol matches the scalar composite on clean data") {
    import spark.implicits._
    val rings = Geo.parsePolygon("POLYGON((0 0, 60 0, 60 30, 30 30, 30 60, 0 60, 0 0))").get
    val segs = (0 until 300).map { k =>
      val ax = (k * 37 % 173) - 80.0 + 0.17
      val ay = (k * 53 % 167) - 80.0 + 0.31
      (k.toLong, ax, ay, ax + ((k * 29 % 41) - 20.0) + 0.13,
        ay + ((k * 31 % 43) - 21.0) + 0.07)
    }
    val df = segs.toDF("id", "ax", "ay", "bx", "by")
    val got = df.where(Geo.segIntersectsPolygonCol(
        col("ax"), col("ay"), col("bx"), col("by"), rings))
      .select("id").collect().map(_.getLong(0)).toSet
    def wkt(s: String) = Term.lit(s, Geo.WKT_DT)
    val polyT = wkt("POLYGON((0 0, 60 0, 60 30, 30 30, 30 60, 0 60, 0 0))")
    val exp = segs.collect {
      case (id, ax, ay, bx, by) if Geo.sfIntersects(
        wkt(s"LINESTRING($ax $ay, $bx $by)"), polyT).get => id
    }.toSet
    assert(got == exp)
    assert(got.nonEmpty && got.size < segs.size)
  }

  test("geof:sfIntersects callable from SPARQL text") {
    import spark.implicits._
    import graft.sparql.Sparql
    val EX = "http://example/"
    val g = spark.createDataset(Seq(
      graft.model.Triple(Term.iri(EX + "road1"), Term.iri(EX + "wkt"),
        Term.lit("LINESTRING(-5 5, 15 5)", Geo.WKT_DT)),
      graft.model.Triple(Term.iri(EX + "road2"), Term.iri(EX + "wkt"),
        Term.lit("LINESTRING(20 20, 30 30)", Geo.WKT_DT)))).toDF()
    val out = Sparql.select(
      s"""PREFIX geof: <${Geo.GEOF}>
          SELECT ?s WHERE {
            ?s <${EX}wkt> ?w .
            FILTER(geof:sfIntersects(?w,
              "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))"^^<${Geo.WKT_DT}>))
          }""", g)
    val subj = out.collect().map(_.getStruct(0).getString(1)).toSet
    assert(subj == Set(EX + "road1"))
  }
}
