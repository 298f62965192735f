package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * MinHash-LSH column toolkit — shared by the dedup queries
 * (graft.queries.OpsQueries, whose DuckDB oracles embed the identical
 * constants) and the fuzzy entity linker (graft.link.Linker.fuzzy). The
 * Spark-native replacement for the reference's Lucene text index as the
 * approximate string→entity blocking structure (jena-text/.../
 * TextIndexLucene.java:60; SURVEY.md §2.1 "text index" row).
 *
 * Signature: base = md5-derived 60-bit hash of each shingle, reduced mod M;
 * h_i(x) = (x·P_i + B_i) mod M for K=8 universal hash functions — ONE md5
 * per shingle, products < 2^60 (no overflow, same in DuckDB). Banding b×r
 * with b bands of r rows gives the standard S-curve: a pair with Jaccard s
 * collides in some band with probability 1 − (1 − s^r)^b.
 */
object MinHash {

  val M = 1073741789L // prime < 2^30
  val P: Seq[Long] = Seq(606863L, 793487L, 957559L, 426389L,
    514229L, 846749L, 299709L, 626887L)
  val B: Seq[Long] = Seq(32452843L, 49979687L, 67867967L, 86028121L,
    15485863L, 23456789L, 54018521L, 77777777L)
  val K: Int = P.length

  private def pArr = P.mkString("array(", "L, ", "L)")
  private def bArr = B.mkString("array(", "L, ", "L)")

  /** Distinct character n-gram shingles of a string column. */
  def charShingles(c: String, n: Int = 3): Column =
    expr(s"array_distinct(transform(sequence(1, greatest(1, length($c)-${n - 1})), i -> substring($c, i, $n)))")

  /** Distinct word-bigram shingles of a pre-split token array column.
   * Guarded for <2-token rows: `sequence(1, 0)` DESCENDS in Spark, so
   * the unguarded transform would index element 0 (always an error) and
   * kill the job on a one-word document. Empty array → all-NULL
   * signature via [[sigSql]]'s empty branch. */
  def tokenBigrams(toks: String): Column =
    expr(tokenBigramsSql(toks))

  /** The raw SQL of [[tokenBigrams]] — the dedup queries inline it so
   * their DuckDB oracle builders mirror ONE definition. */
  def tokenBigramsSql(toks: String): String =
    s"""if(size($toks) < 2, array(),
        array_distinct(transform(sequence(1, size($toks)-1),
        j -> concat(element_at($toks, j), '_', element_at($toks, j+1)))))"""

  /** K-element minhash signature of a shingle array column. */
  def signature(shinglesCol: String): Column = expr(sigSql(shinglesCol))

  /** The raw SQL of `signature` (the DuckDB oracle builders mirror the
   * same arithmetic). Shape matters: the md5 transform is the INPUT of a
   * single `aggregate` fold, so each shingle is hashed ONCE and the fold
   * does K modular updates per shingle — the per-i `array_min(transform)`
   * formulation re-hashed every shingle K times (and projection collapse
   * undoes any hoisting through a helper column). Empty shingle arrays
   * yield an all-NULL signature like array_min over empty. */
  def sigSql(shinglesCol: String): String =
    s"""if(size($shinglesCol) = 0,
          transform(sequence(0, ${K - 1}), i -> cast(null as bigint)),
          aggregate(
            transform($shinglesCol, sh -> pmod(cast(conv(substr(md5(sh), 1, 15), 16, 10) as bigint), ${M}L)),
            array_repeat(${M}L, $K),
            (acc, h) -> zip_with(acc, sequence(0, ${K - 1}),
              (m, i) -> least(m, pmod(h * element_at($pArr, i+1) + element_at($bArr, i+1), ${M}L)))))"""

  /** [[sigSql]] over a PRE-HASHED 60-bit shingle array (each element =
   * hash60 of the shingle): the md5 is paid once when the array is
   * built, and the SAME long array then serves exact-overlap
   * verification — the t6 long-key trick applied to MinHash-LSH. Values
   * are bit-identical to sigSql on the raw shingles (sigSql's fold input
   * is pmod(hash60(sh), M) per shingle). */
  def sigSqlPrehashed(hsCol: String): String =
    s"""if(size($hsCol) = 0,
          transform(sequence(0, ${K - 1}), i -> cast(null as bigint)),
          aggregate(
            transform($hsCol, h0 -> pmod(h0, ${M}L)),
            array_repeat(${M}L, $K),
            (acc, h) -> zip_with(acc, sequence(0, ${K - 1}),
              (m, i) -> least(m, pmod(h * element_at($pArr, i+1) + element_at($bArr, i+1), ${M}L)))))"""

  /** (band, bucket) pairs from a signature column: `bands` bands of
   * `rowsPerBand` signature rows concatenated into a bucket key. Use with
   * posexplode to get one row per band. */
  def bandBuckets(sigCol: String, bands: Int, rowsPerBand: Int): Column = {
    // enforced HERE, not just in callers: out-of-range bands index past
    // the K-element signature — an ANSI error at best, and in lax mode a
    // silent shared "" bucket that degrades LSH to the n² cross join
    require(bands >= 1 && rowsPerBand >= 1 && bands * rowsPerBand <= K,
      s"bands ($bands) × rowsPerBand ($rowsPerBand) must fit the " +
        s"$K-element signature")
    expr(s"""transform(sequence(0, ${bands - 1}), b ->
        array_join(transform(sequence(1, $rowsPerBand),
          r -> element_at($sigCol, b * $rowsPerBand + r)), '_'))""")
  }

  /** Exact Jaccard (permille, integer — deterministic) of two array cols. */
  /** 60-bit SimHash of a document, computed row-locally in pure Scala —
   * BIT-IDENTICAL to the SQL formulation in OpsQueries.simhashed (d5's
   * oracle-gated definition: distinct whitespace tokens, hash60 = first
   * 15 hex chars of md5 as a 60-bit int, bit j set iff the +1/−1 token
   * vote sum is > 0). Used by the streaming near-dup operator, where a
   * per-row pure function beats a shuffle aggregation (no stateful-agg
   * chaining restrictions, no exchange). OpsSpec pins the equivalence. */
  def simhash60(text: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val toks = text.split(" ", -1).distinct
    val votes = new Array[Int](60)
    toks.foreach { t =>
      val digest = md.digest(t.getBytes("UTF-8"))
      md.reset()
      // first 15 hex chars = the big-endian first 8 bytes >>> 4 —
      // allocation-free twin of parseLong(hexString.take(15), 16)
      var h = 0L
      var k = 0
      while (k < 8) { h = (h << 8) | (digest(k) & 0xffL); k += 1 }
      h = h >>> 4
      var j = 0
      while (j < 60) {
        if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
    }
    var sh = 0L
    var j = 0
    while (j < 60) { if (votes(j) > 0) sh |= 1L << j; j += 1 }
    sh
  }

  def jaccardPermille(a: String, b: String): Column = {
    val inter = s"size(array_intersect($a, $b))"
    // two empty sets → 0 (not a link signal), never an ANSI divide-by-zero
    expr(s"""if(size($a) + size($b) - $inter = 0, 0L,
        (cast($inter as bigint) * 1000) div (size($a) + size($b) - $inter))""")
  }
}
