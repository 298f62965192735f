package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.OpsQueries
import graft.ops.Multimodal

/** Quality gates for the rows-only operators (no SQL oracle): LSH recall vs
 * exact baselines, multimodal batch plumbing, planted-near-dup recovery. */
class OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("ann: LSH-bucketed results are a high-recall subset of brute force") {
    val exact = OpsQueries.s1_ann_topk(spark, sf)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = OpsQueries.s2_ann_lsh(spark, sf)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & lsh).size.toDouble / exact.size
    info(f"ANN recall@5 = $recall%.2f (exact=${exact.size}, lsh=${lsh.size})")
    assert(recall >= 0.25, s"LSH recall too low: $recall")
    // every LSH hit must be a real vector pair with the claimed rank ceiling
    assert(lsh.forall { case (q, n) => q < 10 && n != q })
  }

  test("skew guard: a boilerplate cluster cannot explode d4 into O(n²) pairs") {
    // 100 byte-identical docs (every band bucket gets 200 members — the
    // pathological boilerplate shape) + 10 distinct long docs whose
    // planted near-dup copies d4 must still find. The >64-member bucket
    // cap must drop the boilerplate WITHOUT touching the honest pairs;
    // exact duplicates are d1's job (division of labor, SCALE.md).
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_skew").toString
    val boiler = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep green forest before nightfall tonight"
    val rows =
      (1L to 100L).map(i => (i, boiler, "en", "boiler", boiler.length.toLong)) ++
        (1001L to 1010L).map { i =>
          val text = (1 to 25).map(j => s"tok${i}w$j").mkString(" ")
          (i, text, "en", "unique", text.length.toLong)
        }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val pairs = OpsQueries.d4_dedup_lsh(spark, dir)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def inBoiler(id: Long) = (id >= 1 && id <= 100) ||
      (id >= 100001 && id <= 100100)
    // the 200-member cluster would contribute 200·199/2 = 19,900 pairs
    // without the cap — with it, zero
    assert(!pairs.exists(p => inBoiler(p._1) && inBoiler(p._2)),
      s"boilerplate pairs leaked through the bucket cap: ${pairs.count(p => inBoiler(p._1) && inBoiler(p._2))}")
    // every planted near-dup among the distinct docs is still found
    val expected = (1001L to 1010L).map(i => (i, i + 100000L)).toSet
    assert(expected.subsetOf(pairs),
      s"planted pairs lost: ${(expected -- pairs).toSeq.sorted}")
    // the identical cluster is exact-dedup's catch: d1 collapses all 200
    // copies onto one canonical id
    val d1 = OpsQueries.d1_dedup_exact(spark, dir)
      .where(col("is_dup") === 1).count()
    assert(d1 >= 199, s"exact dedup missed the identical cluster: $d1")
    // d7's guard for the same shape is the exact-simhash collapse: the
    // 100 identical docs reduce to ONE representative (min id), so no
    // non-representative boilerplate id can appear in any pair and the
    // output stays linear in distinct content, not in copies
    val d7 = OpsQueries.d7_simhash_lsh(spark, dir)
      .select("a_id", "b_id")
      .collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val nonReps = d7.filter(id => (id >= 2 && id <= 100) ||
      (id >= 100002 && id <= 100100))
    assert(nonReps.isEmpty,
      s"d7 paired non-representative boilerplate copies: ${nonReps.toSeq.sorted.take(5)}")
  }

  test("dedup LSH recovers the planted near-duplicates") {
    // d4 plants, for every doc d, a copy d+100000 with the first token
    // dropped (bigram-Jaccard ≈ (n-2)/n) — LSH must find nearly all of them
    val pairs = OpsQueries.d4_dedup_lsh(spark, sf)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val n = Tables.documents(spark, sf).count()
    val planted = (0L until n).map(i => (i, i + 100000L)).toSet
    val recall = (pairs & planted).size.toDouble / planted.size
    info(f"planted near-dup recall = $recall%.2f of $n")
    assert(recall >= 0.9)
  }

  test("multimodal: batched decode keeps every row, metadata is deterministic") {
    val docs = Tables.documents(spark, sf)
    val media = Multimodal.asMedia(docs)
    val meta1 = Multimodal.extractMeta(media, batchSize = 7).collect().sortBy(_.doc_id)
    val meta2 = Multimodal.extractMeta(media.repartition(13), batchSize = 64)
      .collect().sortBy(_.doc_id)
    assert(meta1.length == docs.count())
    assert(meta1.toSeq == meta2.toSeq) // batch size / partitioning invariant
    assert(meta1.forall(m => m.width >= 16 && m.channels >= 1 && m.n_bytes > 0))
  }

  test("multimodal: real javax.imageio decode round-trips generated PNGs") {
    val docs = Tables.documents(spark, sf).limit(40)
    val media = Multimodal.syntheticImages(docs)
    val meta = Multimodal.extractMeta(media, batchSize = 7)
      .collect().sortBy(_.doc_id)
    assert(meta.length == 40)
    meta.foreach { m =>
      assert(m.width == 8 + (m.doc_id % 32).toInt)
      assert(m.height == 8 + (m.doc_id * 3 % 32).toInt)
      assert(m.channels == (if (m.doc_id % 2 == 0) 1 else 3))
      assert(m.n_bytes > 0)
    }
    // poisoned-row policy: an image/* payload no reader can decode drops
    import spark.implicits._
    val junk = spark.createDataset(Seq(
      graft.ops.MediaRow(1L, Array[Byte](1, 2, 3), "image/png"),
      graft.ops.MediaRow(2L, meta.head.doc_id.toString.getBytes, "image/gif")))
    assert(Multimodal.extractMeta(junk).count() == 0)
    // a real PNG among junk survives
    val mixed = junk.union(media.limit(1))
    assert(Multimodal.extractMeta(mixed).count() == 1)
  }

  test("simhash: near-identical docs have small hamming distance") {
    import spark.implicits._
    val base = Tables.documents(spark, sf).where(col("doc_id") < 30)
      .select("doc_id", "text")
    // mutate a single token
    val mutated = base
      .withColumn("doc_id", col("doc_id") + 1000)
      .withColumn("text", expr("concat('zzz ', substring(text, instr(text, ' ') + 1))"))
    val all = base.union(mutated)
    all.createOrReplaceTempView("documents_tmp")
    val sh = all.select(col("doc_id"),
      expr("transform(array_distinct(split(text, ' ')), t -> cast(conv(substr(md5(t), 1, 15), 16, 10) as bigint))").as("hs"))
      .select(col("doc_id"), expr(
        """aggregate(sequence(0, 59), 0L, (acc, j) ->
             acc + if(aggregate(hs, 0L,
                       (a, h) -> a + if(((h >> j) & 1) = 1, 1L, -1L)) > 0,
                      shiftleft(1L, j), 0L))""").as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dists = (0L until 30L).map(i =>
      java.lang.Long.bitCount(sh(i) ^ sh(i + 1000)))
    info(s"hamming distances planted pairs: min=${dists.min} max=${dists.max}")
    assert(dists.max <= 20) // one-token mutation moves few bits
  }

  test("dedup clusters: d8 components are consistent with d4's pairs") {
    val pairs = OpsQueries.d4_dedup_lsh(spark, sf)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val canon = OpsQueries.d8_dedup_clusters(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // every near-dup pair landed in one cluster
    assert(pairs.forall { case (a, b) => canon(a)._1 == canon(b)._1 })
    // canonical id is a member of its own cluster and the cluster minimum
    val members = canon.keys.groupBy(k => canon(k)._1)
    members.foreach { case (c, ms) => assert(ms.min == c) }
    // exactly one keep=1 per cluster, and it is the canonical doc
    val keeps = canon.collect { case (id, (c, 1L)) => (id, c) }
    assert(keeps.size == members.size && keeps.forall { case (id, c) => id == c })
    // singletons keep themselves
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    canon.filterNot(kv => inPairs(kv._1)).foreach { case (id, (c, k)) =>
      assert(c == id && k == 1L) }
  }

  test("repetition: t7 signals match a direct recomputation per doc") {
    val got = OpsQueries.t7_repetition(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty && got.size == texts.length)
    texts.foreach { case (id, text) =>
      val ws = text.split(" ", -1)
      val bgs = ws.sliding(2).map(_.mkString("_")).toSeq
      val expect = (ws.length.toLong, ws.distinct.length.toLong,
        (ws.length - ws.distinct.length) * 1000L / ws.length,
        bgs.groupBy(identity).values.map(_.size).max * 1000L / bgs.size)
      assert(got(id) == expect, s"doc $id: ${got(id)} vs $expect")
    }
  }

  test("pii scrub: planted emails are counted and fully redacted") {
    val rows = OpsQueries.t8_pii_scrub(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    rows.foreach { case (id, n, _) =>
      val expect = (if (id % 7 == 0) 1 else 0) + (if (id % 13 == 0) 1 else 0)
      assert(n == expect, s"doc $id: $n emails, expected $expect")
    }
    assert(rows.exists(_._2 > 0))
    // redaction is total: recompute one planted doc's md5 after replacement
    val d0 = Tables.documents(spark, sf).where(col("doc_id") === 0)
      .select("text").head().getString(0)
    val aug = d0 + " contact user0@example.com for details" // 0 % 13 == 0 too
    val full = aug + " escalate to ops-0@internal.example.org asap"
    val red = full.replaceAll("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}", "<EMAIL>")
    assert(!red.contains("@"))
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(red.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows.find(_._1 == 0L).get._3 == md5)
  }

  test("lang-id: marker scoring predicts a language for every doc, deterministically") {
    val out = OpsQueries.t2_lang_id(spark, sf).collect()
    assert(out.nonEmpty)
    val langs = out.map(_.getAs[String]("lang_pred")).toSet
    assert(langs.subsetOf(Set("de", "en", "es", "fr")))
    // the synthetic corpus is English-heavy word salad: the en marker set
    // ('the','a','of','and','is','to') must dominate on most docs
    val en = out.count(_.getAs[String]("lang_pred") == "en")
    assert(en > out.length / 2, s"expected mostly en, got $en/${out.length}")
    // argmax consistency: the predicted language's score is the max
    out.foreach { r =>
      val scores = Map(
        "de" -> r.getAs[Long]("score_de"), "en" -> r.getAs[Long]("score_en"),
        "es" -> r.getAs[Long]("score_es"), "fr" -> r.getAs[Long]("score_fr"))
      assert(scores(r.getAs[String]("lang_pred")) == scores.values.max)
    }
  }

  test("decontam: every planted benchmark copy is flagged, originals mostly clean") {
    val flagged = OpsQueries.t6_decontam(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("overlap_permille")).toMap
    // docs 0..49 are the benchmark; their first-token-dropped copies
    // (ids 100000..100049) share nearly all word-8-grams
    (100000L until 100050L).foreach { id =>
      assert(flagged.contains(id), s"planted contaminated copy $id not flagged")
      assert(flagged(id) >= 900, s"copy $id overlap only ${flagged(id)} permille")
    }
    // decontamination is selective: most corpus docs are NOT flagged
    // (the word-salad corpus does contain occasional genuine duplicates
    // of benchmark docs — flagging those is the operator working)
    val nOriginalsFlagged = flagged.keys.count(_ < 100000L)
    val nDocs = OpsQueries.t2_lang_id(spark, sf).count()
    assert(nOriginalsFlagged < nDocs / 2,
      s"$nOriginalsFlagged of $nDocs originals flagged — not selective")
  }

  test("sample-mix: per-language empirical rates track the ppm targets, deterministically") {
    val docs = graft.Tables.documents(spark, sf)
    val totals = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = OpsQueries.c3_sample_mix(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val target = Map("en" -> 0.50, "zh" -> 0.80).withDefaultValue(0.25)
    totals.foreach { case (lang, n) =>
      val rate = kept.getOrElse(lang, 0L).toDouble / n
      // md5 draws are uniform; at n≥60 per lang a |rate-target| ≥ 0.17
      // would be a >3σ event — this bound catches wrong rates (25↔50↔80
      // are ≥ 0.25 apart), not sampling noise
      assert(math.abs(rate - target(lang)) < 0.17,
        f"$lang: rate $rate%.2f vs target ${target(lang)}%.2f (n=$n)")
    }
    // hash draws, not rand(): a second evaluation is bit-identical
    val again = OpsQueries.c3_sample_mix(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == kept)
  }

  test("shuffle-shards: a deterministic permutation, ranked per shard, never globally sorted") {
    val out = OpsQueries.c5_shuffle_shards(spark, sf).cache()
    val n = graft.Tables.documents(spark, sf).count()
    // a permutation: every doc exactly once, addresses unique
    assert(out.count() == n)
    assert(out.select("shard", "pos").distinct().count() == n)
    // per-shard positions are exactly 1..count(shard) (dense rank space)
    val bad = out.groupBy("shard")
      .agg(count(lit(1)).as("c"), max(col("pos")).as("mx"), min(col("pos")).as("mn"))
      .where(col("mx") =!= col("c") || col("mn") =!= 1L).count()
    assert(bad == 0L, s"$bad shards have non-dense position ranges")
    // it actually shuffles: reading in (shard, pos) order is not doc_id order
    val firstTen = out.orderBy(col("shard"), col("pos"))
      .limit(10).select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(firstTen != firstTen.sorted, s"shuffle left a sorted prefix: $firstTen")
    // deterministic: a second evaluation is bit-identical
    val again = OpsQueries.c5_shuffle_shards(spark, sf)
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
    out.unpersist()
  }

  test("split-groups: group-level disjointness — no source straddles train/eval") {
    val out = OpsQueries.c4_split_groups(spark, sf)
    // every source lands in exactly ONE split (the leakage-free property)
    val perSource = out.groupBy("source")
      .agg(countDistinct(col("split")).as("nsplits"))
      .where(col("nsplits") > 1).count()
    assert(perSource == 0L, s"$perSource sources straddle splits")
    // the 80/10/10 bucketing populates all three splits on this corpus
    // (deterministic: fixed salt, fixed source names)
    val bySplit = out.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet == Set("train", "valid", "test"), bySplit.toString)
    assert(bySplit("train") > bySplit("valid") && bySplit("train") > bySplit("test"))
    // total preserved: the split ASSIGNS, it never drops or duplicates
    assert(out.count() == graft.Tables.documents(spark, sf).count())
  }
}
