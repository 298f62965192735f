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
  }
}
