package graft

import org.apache.spark.sql.functions._

/** Pins `Dedup.bloomHistoryFlagBucketed` (q245): the bounded-driver form
  * of Bloom historical dedup. Covers both physical routes, the per-bucket
  * sizing math, the crossover decision, and the release() lifecycle. */
class BucketedBloomSpec extends SparkTestBase {
  import graft.operators.Dedup

  private def fixture = {
    import spark.implicits._
    val history = (1L to 400L).map(i => (i, s"historical document number $i"))
      .toDF("doc_id", "text")
    val newDocs = (
      (1L to 100L).map(i => (1000 + i, s"historical document number $i")) ++
      Seq((2001L, "  Historical   document number 7 "),
          (2002L, "HISTORICAL DOCUMENT NUMBER 8")) ++
      (1L to 300L).map(i => (3000 + i, s"genuinely fresh content $i"))
    ).toDF("doc_id", "text")
    (history, newDocs)
  }

  test("bucketed route: zero false negatives, fp bounded, releasable") {
    val (history, newDocs) = fixture
    val flag = Dedup.bloomHistoryFlagBucketed(newDocs, history, fpp = 0.01)
    assert(flag.route == "bloom-bucketed")
    val out = flag.df.select(col("doc_id"), col("maybe_dup")).collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toMap
    (1L to 100L).foreach(i => assert(out(1000 + i), s"missed dup $i"))
    assert(out(2001L) && out(2002L), "normalization variants must flag")
    val fp = (1L to 300L).count(i => out(3000 + i))
    assert(fp <= 15, s"fp = $fp of 300 at fpp = 0.01")
    flag.release() // flags are materialized above; destroy must be clean
  }

  test("degrade route: zero driver state, flags are EXACT membership") {
    val (history, newDocs) = fixture
    val flag = Dedup.bloomHistoryFlagBucketed(newDocs, history, fpp = 0.01,
      maxDriverBytes = 0L)
    assert(flag.route == "semi-join")
    val out = flag.df.select(col("doc_id"), col("maybe_dup")).collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toMap
    (1L to 100L).foreach(i => assert(out(1000 + i)))
    assert(out(2001L) && out(2002L))
    // exact: ZERO false positives on the degrade path
    (1L to 300L).foreach(i => assert(!out(3000 + i), s"fp on exact path $i"))
  }

  test("per-bucket sizing and the crossover decision") {
    // capacity = uniform expectation with 1.3x headroom, floored at 64
    assert(Dedup.bloomBucketCapacity(1000000L, 256) ==
      math.ceil(1000000.0 / 256 * 1.3).toLong)
    assert(Dedup.bloomBucketCapacity(100L, 256) == 64L)
    // total bits follow the Bloom optimum: ~9.59 bits/item at fpp 0.01,
    // so the default 1 GiB budget holds ~8x10^8 docs and degrades at 10^9
    val gib = 1L << 30
    assert(Dedup.bloomTotalBits(800000000L, 0.01) / 8 < gib)
    assert(Dedup.bloomTotalBits(1000000000L, 0.01) / 8 > gib)
  }

  test("quality classifier: deterministic training, exact scoring, learns") {
    import spark.implicits._
    import graft.operators.QualityClassifier
    // two separable vocabularies — the classifier must learn them
    val good = (1L to 60L).map(i =>
      (i, s"the quick brown fox likes clean prose number $i", true))
    val bad = (1L to 60L).map(i =>
      (100 + i, s"zzz spam casino pills xxx junk token $i", false))
    val docs = (good ++ bad).toDF("doc_id", "text", "y")
    val (w1, b1) = QualityClassifier.train(docs, "y", dims = 256)
    val (w2, b2) = QualityClassifier.train(docs, "y", dims = 256)
    assert(w1.toSeq == w2.toSeq && b1 == b2, "training must be bit-stable")
    val scored = QualityClassifier.score(docs, w1, b1)
      .join(docs.select(col("doc_id"), col("y")), "doc_id")
    val rows = scored.collect()
    val acc = rows.count(r => r.getBoolean(2) == r.getBoolean(3)).toDouble /
      rows.length
    assert(acc >= 0.95, s"separable vocab must classify: acc = $acc")
    // empty/null/no-letter text scores at the bias alone, no throw
    val edge = Seq((1L, ""), (2L, "123 456 !!!"), (3L, null))
      .toDF("doc_id", "text")
    val es = QualityClassifier.score(edge, w1, b1).collect()
    assert(es.length == 3 && es.forall(r => r.getDecimal(1) != null))
    assert(es.map(_.getDecimal(1)).distinct.length == 1,
      "all three edge rows must score at the bias")
  }

  test("many buckets with sparse history: absent buckets probe false") {
    import spark.implicits._
    val history = Seq((1L, "only one doc")).toDF("doc_id", "text")
    val newDocs = Seq((10L, "only one doc"), (11L, "something else"))
      .toDF("doc_id", "text")
    val flag = Dedup.bloomHistoryFlagBucketed(newDocs, history,
      buckets = 1024, fpp = 0.01)
    val out = flag.df.select(col("doc_id"), col("maybe_dup")).collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(out(10L) && !out(11L))
    flag.release()
  }

  test("area-minimizing LSH plan: sane shape, monotone rows, weights bite") {
    // rows-per-band must grow with the threshold: a steeper target
    // demands a sharper S-curve (MMDS §3.4.3)
    val picks = Seq(0.3, 0.5, 0.7, 0.9)
      .map(t => Dedup.bandingForArea(128, t)._2)
    assert(picks == picks.sorted, s"rows must rise with threshold: $picks")
    // every grid row uses all hashes; exactly one is chosen
    val grid = Dedup.lshPlanGrid(128, 0.8)
    assert(grid.forall(p => p.bands * p.rows == 128))
    assert(grid.count(_.chosen) == 1)
    // the chosen pair minimizes the summed area
    val chosen = grid.find(_.chosen).get
    assert(grid.forall(p => chosen.error <= p.error))
    // fearing misses (fnWeight > 1) never raises the miss area
    val fnHeavy = Dedup.lshPlanGrid(128, 0.8, fnWeight = 5.0).find(_.chosen).get
    assert(fnHeavy.fnArea <= chosen.fnArea)
    // the area rule sits at-or-near the midpoint rule but can differ;
    // both must place the curve midpoint (1/b)^(1/r) within ±0.2 of t
    val mid = math.pow(1.0 / chosen.bands, 1.0 / chosen.rows)
    assert(math.abs(mid - 0.8) < 0.2, s"midpoint drifted: $mid")
  }

  test("minhashPairs bands = -1 routes through the area plan") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog tonight!"),
      (3L, "completely different content with no overlap at all here"),
      (4L, "the quick brown fox jumps over a lazy dog tonight")
    ).toDF("doc_id", "text")
    val (ab, _) = Dedup.bandingForArea(128, 0.6)
    val auto = Dedup.minhashPairs(docs, "doc_id", "text",
      bands = -1, threshold = 0.6).select("id_a", "id_b").collect().toSet
    val explicit = Dedup.minhashPairs(docs, "doc_id", "text",
      bands = ab, threshold = 0.6).select("id_a", "id_b").collect().toSet
    assert(auto == explicit && auto.nonEmpty)
  }
}
