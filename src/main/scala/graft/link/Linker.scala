package graft.link

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.extract.Candidate
import graft.fixtures.DictRow
import graft.model.Term

/**
 * Entity linking: mention surface → canonical IRI from a dictionary.
 * The Spark-native replacement for the reference's Lucene text index lookup
 * (jena-text/.../TextQueryPF.java:65, TextIndexLucene.java:60 — "approximate
 * string → entity" is exactly this stage's contract).
 *
 * Join strategy (north rule: broadcast when the dictionary fits, salted
 * shuffled-hash otherwise):
 *  - `linkExact`           — broadcast hash join, zero shuffle on mentions.
 *  - `linkExactSalted`     — explicit key salting for skewed surfaces: the
 *    dictionary is replicated ×saltFactor and mentions get a deterministic
 *    salt from their provenance hash, so one hot surface ("E000000" appears
 *    in every 11th file) spreads over saltFactor reducers instead of one.
 *  - `linkFuzzy`           — MinHash-LSH blocking (graft.ops.MinHash) +
 *    scored candidate join for surfaces with no exact dictionary hit.
 *
 * Ties broken by (weight DESC, iri ASC) — deterministic across runs and
 * partitionings.
 */
object Linker {

  private def bestPerMention(joined: DataFrame, keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("weight").desc, col("iri").asc)
    joined.withColumn("_rk", row_number().over(w)).where(col("_rk") === 1).drop("_rk")
  }

  /** Broadcast exact link: resolved mentions get their object IRI,
   * non-mention rows pass through untouched, unlinkable mentions are
   * dropped (counted by the pipeline's metrics).
   *
   * `uniqueSurfaces = true` is a caller PROMISE that the dictionary has at
   * most one row per surface string — it skips the best-candidate window
   * (a full shuffle+sort of every mention). The default is the safe path:
   * an ambiguous dictionary gets the deterministic (weight DESC, iri ASC)
   * best candidate instead of silently duplicating mentions. */
  def exact(cands: Dataset[Candidate], dict: Dataset[DictRow],
            uniqueSurfaces: Boolean = false): Dataset[Candidate] =
    exactImpl(cands, dict, salted = false, saltFactor = 1, uniqueSurfaces)

  /** Salted shuffled exact link for skewed surfaces (dictionary too big to
   * broadcast at 10^12-file scale). saltFactor ≈ executors × 2. */
  def exactSalted(cands: Dataset[Candidate], dict: Dataset[DictRow],
                  saltFactor: Int, uniqueSurfaces: Boolean = false): Dataset[Candidate] =
    exactImpl(cands, dict, salted = true, saltFactor = saltFactor, uniqueSurfaces)

  private def exactImpl(cands: Dataset[Candidate], dict: Dataset[DictRow],
                        salted: Boolean, saltFactor: Int,
                        uniqueSurfaces: Boolean): Dataset[Candidate] = {
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    val spark = cands.sparkSession
    import spark.implicits._
    val mentions = cands.where(col("surface") =!= "")
    // a NULL surface (externally-produced parquet) is not a mention — it
    // must pass through (normalized to ""), not vanish by failing both
    // filters
    val passthru = cands.toDF()
      .where(col("surface") === "" || col("surface").isNull)
      .withColumn("surface", lit(""))

    val dictDf = dict.toDF("iri", "dict_surface", "weight")
    val joined0 =
      if (!salted)
        mentions.join(broadcast(dictDf), col("surface") === col("dict_surface"))
      else {
        // deterministic mention salt from row provenance; dictionary ×F —
        // the hot key's rows land on saltFactor reducers instead of one
        val m = mentions.withColumn("_salt",
          pmod(hash(col("s.lex"), col("sha256")), lit(saltFactor)))
        val d = dictDf.withColumn("_salt",
          explode(sequence(lit(0), lit(saltFactor - 1))))
        m.join(d, m("surface") === d("dict_surface") && m("_salt") === d("_salt"))
          .drop("_salt")
      }

    // best-candidate tie-break needs a per-mention window sort — a full
    // extra shuffle+sort of every mention. Skip it when the caller
    // declares surfaces unique (one dictionary row per surface string):
    // the join already yields exactly one candidate per mention.
    val best =
      if (uniqueSurfaces) joined0
      else bestPerMention(joined0, Seq("s", "p", "surface", "sha256"))
    val linked = best
      .withColumn("o", struct(
        lit(Term.KIND_IRI).cast("byte").as("kind"),
        col("iri").as("lex"), lit("").as("dt"), lit("").as("lang")))
      .select("s", "p", "o", "surface", "repo", "lang", "sha256")
      .withColumn("surface", lit(""))
    passthru.unionByName(linked).as[Candidate]
  }

  /**
   * Fuzzy entity linking (the north star's "MinHash-LSH blocking stage plus
   * scored joins"): mentions that miss the exact dictionary are blocked
   * against dictionary surfaces by MinHash band buckets over character
   * 3-gram shingles, candidates are scored by exact Jaccard, and each
   * mention takes the best candidate ≥ `minJaccardPermille` (ties broken by
   * weight DESC, iri ASC — deterministic). Mentions with no candidate at
   * all are dropped, like unlinkable exact mentions.
   *
   * Scale shape: candidate pairs come from an equi-join on (band, bucket)
   * — never an n² cross join; the dictionary side is banded once and the
   * join shuffles on bucket keys, so hot surfaces spread across buckets'
   * reducers the same way the salted exact join spreads hot keys.
   */
  def fuzzy(cands: Dataset[Candidate], dict: Dataset[DictRow],
            bands: Int = 4, rowsPerBand: Int = 2,
            minJaccardPermille: Int = 500): Dataset[Candidate] = {
    import graft.ops.MinHash
    // out-of-range bands read past the K-element signature: element_at
    // yields NULLs, array_join drops them, and every row lands in ONE
    // shared "" bucket — the n² cross join this blocking exists to avoid
    require(bands >= 1 && rowsPerBand >= 1 && bands * rowsPerBand <= MinHash.K,
      s"bands ($bands) x rowsPerBand ($rowsPerBand) must fit the " +
        s"${MinHash.K}-element MinHash signature")
    val spark = cands.sparkSession
    import spark.implicits._

    val mentions = cands.where(col("surface") =!= "")
    // NULL surfaces pass through normalized, as in exactImpl
    val passthru = cands.toDF()
      .where(col("surface") === "" || col("surface").isNull)
      .withColumn("surface", lit(""))
    val dictDf = dict.toDF("iri", "dict_surface", "weight")

    // exact hits first — cheap and precise; an ambiguous dictionary gets
    // the deterministic (weight DESC, iri ASC) best candidate, same safe
    // default as exact() — a plain join would silently duplicate mentions
    val exactHit = bestPerMention(
      mentions.join(broadcast(dictDf), col("surface") === col("dict_surface")),
      Seq("s", "p", "surface", "sha256"))
    val missed = mentions.join(broadcast(dictDf),
      col("surface") === col("dict_surface"), "left_anti")

    def banded(df: DataFrame, surfCol: String): DataFrame =
      df.withColumn("__sh", MinHash.charShingles(surfCol))
        .withColumn("__sig", MinHash.signature("__sh"))
        .select(col("*"), posexplode(
          MinHash.bandBuckets("__sig", bands, rowsPerBand)).as(Seq("__band", "__bucket")))
        .drop("__sig")

    val mB = banded(missed, "surface")
    val dB = banded(dictDf, "dict_surface")
      .withColumnRenamed("__sh", "__dsh")

    val scored = mB.join(dB, Seq("__band", "__bucket"))
      .withColumn("__jac", MinHash.jaccardPermille("__sh", "__dsh"))
      .where(col("__jac") >= minJaccardPermille)
      .select(mentions.columns.map(col) :+ col("iri") :+ col("weight") :+ col("__jac"): _*)
      .distinct()
    // best candidate per mention: jaccard DESC, then weight DESC, iri ASC
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("s"), col("p"), col("surface"), col("sha256"))
      .orderBy(col("__jac").desc, col("weight").desc, col("iri").asc)
    val best = scored.withColumn("__rk", row_number().over(w))
      .where(col("__rk") === 1)

    def resolve(df: DataFrame): DataFrame = df
      .withColumn("o", struct(
        lit(Term.KIND_IRI).cast("byte").as("kind"),
        col("iri").as("lex"), lit("").as("dt"), lit("").as("lang")))
      .select("s", "p", "o", "surface", "repo", "lang", "sha256")
      .withColumn("surface", lit(""))

    passthru
      .unionByName(resolve(exactHit))
      .unionByName(resolve(best))
      .as[Candidate]
  }
}
