package graft.shex

import org.apache.spark.sql.{DataFrame, Dataset}

import graft.model.{Term, Triple}

/**
 * Spark faces for ShEx validation — the many-small-KGs shape: one
 * document-sized graph per row, schema broadcast once per executor, the
 * pure `ShexValidator` running inside mapPartitions (no shuffle, no
 * state; the same scale pattern as `StreamIngest.validateStream` for
 * SHACL). At 100 TB the per-row work is constant-sized and the stage is
 * embarrassingly parallel.
 */
object ShexOps {

  /** Validate one focus node per row against a broadcast ShEx schema.
   * `rows` carries (id, triples, focus); emits (id, conforms). */
  def validateGraphs(rows: Dataset[(Long, Seq[Triple], Term)],
                     schema: ShexAst.ShexSchema,
                     shapeLabel: String): Dataset[(Long, Boolean)] = {
    val spark = rows.sparkSession
    import spark.implicits._
    // resolve triple-expression includes ONCE, then broadcast
    val bc = spark.sparkContext.broadcast(schema.resolved)
    rows.mapPartitions { it =>
      val sch = bc.value
      it.map { case (id, triples, focus) =>
        (id, ShexValidator.validate(triples, sch, focus, Some(shapeLabel)).conforms)
      }
    }
  }

  /** Parse ShExC text (no imports) — driver-side, tiny. */
  def parseSchema(shexc: String, base: String = ""): ShexAst.ShexSchema =
    ShexParser.parse(shexc, base)

  /** Streaming face: identical plan — mapPartitions is stateless, so the
   * same transform applies to a readStream DataFrame unchanged. */
  def validateGraphsStream(rows: Dataset[(Long, Seq[Triple], Term)],
                           schema: ShexAst.ShexSchema,
                           shapeLabel: String): DataFrame = {
    import rows.sparkSession.implicits._
    validateGraphs(rows, schema, shapeLabel).toDF("id", "conforms")
  }
}
