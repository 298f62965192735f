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
}
