package graft.extract

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.fixtures.{CorpusGen, CorpusRow}
import graft.model.Term
import graft.normalize.{BNodes, Iri, Literals}

/**
 * One candidate fact emitted by the mention detector. `o` is null and
 * `surface` non-empty for rows that still need entity linking; all other
 * rows are fully resolved at extraction time.
 *
 * This stage is the distributed twin of Jena's CONSTRUCT template
 * instantiation + RIOT parse (reference: jena-arq/.../modify/TemplateLib.java:70–121
 * for triple emission, riot/system/ParserProfileStd.java:45 for per-term
 * construction). All per-row work — IRI resolution against the file base,
 * literal canonicalization, document-scoped bnode labels — is pure and
 * embarrassingly parallel: the only shuffles in the whole pipeline are the
 * link join, the CC fixpoint, and the final dedup/sort.
 */
final case class Candidate(
    s: Term, p: Term, o: Term, surface: String,
    repo: String, lang: String, sha256: String)

object Extractor {

  /** Corpus → candidates. Repartitions by (repo, lang) first — the explicit
   * partition plan of the north rule; everything after is narrow. Pass
   * `repartition = false` when the input is already repo-partitioned
   * (e.g. a freshly generated corpus or a bucketed Iceberg read): the
   * re-shuffle of every content byte is then pure memory traffic. */
  def extract(corpus: Dataset[CorpusRow], repartition: Boolean = true): Dataset[Candidate] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val in = if (repartition) corpus.repartition(col("repo"), col("lang")) else corpus
    in.mapPartitions { rows => rows.flatMap(extractRow) }
  }

  /** Pure per-row mention detection — safe to call anywhere (tests use it
   * directly; Spark runs it inside mapPartitions). */
  def extractRow(row: CorpusRow): Iterator[Candidate] = {
    import CorpusGen._
    val fIriStr = fileIri(row.repo, row.path, row.commit)
    val f = Term.iri(fIriStr)
    val sha = sha256Hex(row.content)
    val scope = s"${row.repo}/${row.path}@${row.commit}"
    def done(s: Term, p: String, o: Term) =
      Candidate(s, Term.iri(p), o, "", row.repo, row.lang, sha)

    val structural = Iterator(
      done(Term.iri(repoIri(row.repo)), P_HASFILE, f),
      done(f, P_INLANG, Term.string(row.lang)),
      done(f, P_SHA256, Term.string(sha)))

    val fromLines = row.content.linesIterator.flatMap { line =>
      val parts = line.split(" ")
      parts(0) match {
        case "def" if parts.length > 1 =>
          Iterator(done(f, P_DEFINES, Term.iri(defIri(parts(1)))))
        case "import" if parts.length > 1 =>
          Iterator(Candidate(f, Term.iri(P_IMPORTS), null, parts(1),
            row.repo, row.lang, sha))
        case "sameas" if parts.length > 2 =>
          Iterator(done(Term.iri(KG + "entity/" + parts(1)), OWL_SAMEAS,
            Term.iri(KG + "entity/" + parts(2))))
        case "license" if parts.length > 1 =>
          Iterator(done(f, P_LICENSE, Term.string(parts(1))))
        case "size" if parts.length > 1 =>
          Iterator(done(f, P_SIZE,
            Term.lit(Literals.canonInteger(parts(1)), Term.XSD_INTEGER)))
        case "ref" if parts.length > 1 =>
          Iterator(done(f, P_REF, Term.iri(Iri.resolve(fIriStr, parts(1)))))
        case "note" if parts.length > 1 =>
          Iterator(done(f, P_NOTE, Term.bnode(BNodes.label(scope, parts(1)))))
        case _ => Iterator.empty
      }
    }
    structural ++ fromLines
  }

  /** The per-row invariant of the north rule: Spark's codegen'd sha2()
   * must agree with the JVM digest carried by the extractor. Fully
   * distributed (no collect): returns the rows violating it (must be empty). */
  def shaViolations(corpus: Dataset[CorpusRow]): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus
      .map(r => (r.repo, r.path, r.content, CorpusGen.sha256Hex(r.content)))
      .toDF("repo", "path", "content", "jvm_sha")
      .withColumn("spark_sha", sha2(col("content"), 256))
      .where(col("spark_sha") =!= col("jvm_sha"))
      .select("repo", "path", "jvm_sha", "spark_sha")
  }
}
