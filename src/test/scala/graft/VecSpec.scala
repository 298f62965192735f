package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.Vec

/** The native codegen'd CosineSim expression must be bit-identical to the
 * interpreted HOF formula it replaced (the DuckDB oracles were validated
 * against that formula), on both the codegen and interpreted eval paths. */
class VecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def hofCosine(a: String, b: String) = expr(
    s"""aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)),
                  0D, (acc, v) -> acc + v)
        / (sqrt(aggregate($a, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double)))
           * sqrt(aggregate($b, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double))))""")

  test("CosineSim == HOF formula bit-for-bit on real embedding pairs") {
    Vec.register(spark)
    val e = Tables.embeddings(spark, sf)
    val pairs = e.select(col("vec_id").as("a_id"), col("embedding").as("av"))
      .crossJoin(e.select(col("vec_id").as("b_id"), col("embedding").as("bv")))
      .where(col("a_id") < 40 && col("b_id") < 40)
    val both = pairs.select(col("a_id"), col("b_id"),
      expr(s"${Vec.CosineName}(av, bv)").as("native"), hofCosine("av", "bv").as("hof"))
    val rows = both.collect()
    assert(rows.length == 1600)
    rows.foreach { r =>
      val n = r.getDouble(2); val h = r.getDouble(3)
      // bit-identical, not approximately equal
      assert(java.lang.Double.doubleToRawLongBits(n) ==
        java.lang.Double.doubleToRawLongBits(h),
        s"(${r.getLong(0)},${r.getLong(1)}): native=$n hof=$h")
    }
  }

  test("GraftExtensions injects graft_cosine at session build (spark.sql.extensions path)") {
    // a separate session with the extension, no programmatic Vec.register.
    // getOrCreate() reuses the active session and would skip extensions —
    // clear default/active around the build (the SparkContext is shared).
    import org.apache.spark.sql.SparkSession
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession(); SparkSession.clearActiveSession()
    try {
      // .withExtensions == what spark.sql.extensions=graft.GraftExtensions
      // does at spark-submit; the conf form is a STATIC conf read from the
      // SparkContext conf at context creation, so it cannot be exercised
      // on this suite's shared context
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        s"SELECT ${Vec.CosineName}(cast(array(1.0, 0.0) as array<float>), " +
          "cast(array(1.0, 0.0) as array<float>)) AS c").head()
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    } finally {
      SparkSession.clearDefaultSession(); SparkSession.clearActiveSession()
      prev.foreach { p =>
        SparkSession.setDefaultSession(p); SparkSession.setActiveSession(p)
      }
    }
  }

  test("CosineSim null/edge semantics match the HOF on both eval paths") {
    Vec.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, Seq[java.lang.Float](1f, 2f, 3f), Seq[java.lang.Float](4f, 5f, 6f)),
      (2L, Seq[java.lang.Float](1f, null, 3f), Seq[java.lang.Float](4f, 5f, 6f)),
      (3L, Seq[java.lang.Float](0f, 0f), Seq[java.lang.Float](1f, 1f)), // zero vec -> NaN
      (4L, Seq[java.lang.Float](1f, 2f), Seq[java.lang.Float](1f, 2f, 9f)), // length skew
      (5L, null, Seq[java.lang.Float](1f))
    ).toDF("id", "a", "b")
      .select(col("id"), col("a").cast("array<float>"), col("b").cast("array<float>"))
    def run(codegen: Boolean): Map[Long, Option[Double]] = {
      val prev = spark.conf.getOption("spark.sql.codegen.wholeStage")
      spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
      spark.conf.set("spark.sql.codegen.factoryMode",
        if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN")
      try df.select(col("id"), expr(s"${Vec.CosineName}(a, b)").as("c")).collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      finally {
        prev.fold(spark.conf.unset("spark.sql.codegen.wholeStage"))(
          v => spark.conf.set("spark.sql.codegen.wholeStage", v))
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
    val cg = run(codegen = true)
    val interp = run(codegen = false)
    // the HOF reference THROWS on the zero-vector row under ANSI mode
    // (double DIVIDE_BY_ZERO); CosineSim is deliberately total and yields
    // NaN there instead — compare against the HOF on the other rows only
    val hof = df.where(col("id") =!= 3)
      .select(col("id"), hofCosine("a", "b").as("c")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    Seq(cg, interp).foreach { got =>
      assert(got(2).isEmpty && got(5).isEmpty) // null element / null array
      assert(got(3).exists(_.isNaN)) // zero vector: NaN, not an ANSI error
      Seq(1L, 4L).foreach { id => assert(got(id) == hof(id), s"id=$id") }
    }
    assert(cg.view.filterKeys(_ != 3).toMap == interp.view.filterKeys(_ != 3).toMap
      && cg(3).exists(_.isNaN) == interp(3).exists(_.isNaN))
  }
}
