package graft

import graft.operators._
import graft.functions.aggregates.{LttbAggregator, TopKAggregator, TsPoint}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat again and again today"), // near dup of 1
    (4L, "completely unrelated text about distributed query engines and shuffles"),
    (5L, "another document that shares nothing with the rest of this tiny corpus")
  ).toDF("doc_id", "text")

  test("exact dedup keeps lowest id per text") {
    val ids = Dedup.exact(docs, "doc_id", Seq("text")).select("doc_id")
      .as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 3L, 4L, 5L))
  }

  test("minhash LSH finds exact and near duplicates, not unrelated") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
      numHashes = 128, bands = 32, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhashDedup removes the dup side") {
    val kept = Dedup.minhashDedup(docs, "doc_id", "text", threshold = 0.9)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(1L) && !kept.contains(2L))
  }

  test("bandingFor tunes the S-curve midpoint to the threshold") {
    // midpoint (1/b)^(1/r): 16×8 → 0.707, 8×16 → 0.878
    assert(Dedup.bandingFor(128, 0.7) == (16, 8))
    assert(Dedup.bandingFor(128, 0.88) == (8, 16))
    // higher thresholds always get fewer (wider) bands
    val b1 = Dedup.bandingFor(128, 0.5)._1
    val b2 = Dedup.bandingFor(128, 0.9)._1
    assert(b1 > b2)
  }

  test("minhashDedup anti-join is not broadcast-hinted (unbounded dup set)") {
    // the logical plan must carry no broadcast hint on the dup-id side —
    // the set is O(corpus) at scale; AQE may still pick broadcast when the
    // runtime size is small, but graft must not force it.
    val plan = Dedup.minhashDedup(docs, "doc_id", "text", threshold = 0.9)
      .queryExecution.optimizedPlan
    val hinted = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.hint.leftHint.exists(_.strategy.isDefined) ||
           j.hint.rightHint.exists(_.strategy.isDefined) => j
    }
    assert(hinted.isEmpty, s"found broadcast-hinted join(s): $hinted")
  }

  test("simhash maxBucket cap drops oversized buckets (recall/cost knob)") {
    // 30 identical docs -> every chunk bucket has 30 members. Cap below 30
    // drops them all (zero pairs); cap above yields all 435 exact pairs.
    val many = spark.range(30).selectExpr("id AS doc_id",
      "'same boilerplate text repeated across the corpus shard' AS text")
    assert(Dedup.simhashPairs(many, "doc_id", "text", hammingMax = 3,
      maxBucket = 10).count() == 0)
    assert(Dedup.simhashPairs(many, "doc_id", "text", hammingMax = 3,
      maxBucket = 100).count() == 435)
  }

  test("simhash pairs: identical docs at hamming 0") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", hammingMax = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("ngram jaccard pairs") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }
}

class SubstringDedupSpec extends SparkTestBase {
  import graft.operators.Dedup

  test("repeatedGramStats counts corpus-duplicated k-grams per document") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h X Y"),      // 3 grams; gram(1) repeats in docs 2/4
      (2L, "p q a b c d e f g h r"),    // 4 grams; gram at pos 3 repeats
      (3L, "u v w x y z"),              // < k tokens → zero grams
      (4L, "a b c d e f g h")           // exactly the repeated gram
    ).toDF("doc_id", "text")
    val st = Dedup.repeatedGramStats(docs, "doc_id", "text", k = 8)
      .orderBy("id").collect()
    assert(st.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 3L, 1L), (2L, 4L, 1L), (3L, 0L, 0L), (4L, 1L, 1L)))
    assert(st(2).isNullAt(3), "zero-gram docs have NULL ratio")
  }

  test("removeRepeatedSpans keeps the globally-first occurrence only") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h X Y"),
      (2L, "p q a b c d e f g h r"),
      (3L, "u v w x y z"),
      (4L, "a b c d e f g h")
    ).toDF("doc_id", "text")
    val out = Dedup.removeRepeatedSpans(docs, "doc_id", "text", k = 8)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq(
      (1L, "a b c d e f g h X Y"),  // first occurrence survives whole
      (2L, "p q r"),                // masked span excised, order kept
      (3L, "u v w x y z"),          // short doc untouched
      (4L, "")))                    // fully-duplicated doc empties
  }
}

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, sfDir, "embeddings")

  test("brute-force kNN: self is rank 1 with sim 1") {
    val top = Similarity.bruteForceKnn(emb, emb.filter($"vec_id" === 7), k = 3)
      .filter($"rk" === 1).head()
    assert(top.getAs[Long]("cid") == 7L)
    assert(math.abs(top.getAs[Double]("sim") - 1.0) < 1e-9)
  }

  test("IVF kNN recalls self and stays within k") {
    val (bucketed, centroids) = Similarity.ivfBucketize(emb, numCentroids = 8)
    val res = Similarity.ivfKnn(bucketed, centroids, emb.filter($"vec_id" < 3), k = 4)
    val byQ = res.groupBy("qid").count().as[(Long, Long)].collect().toMap
    assert(byQ.values.forall(_ <= 4))
    val selfHits = res.filter($"rk" === 1 && $"qid" === $"cid").count()
    assert(selfHits == 3)
  }

  test("quantized IVF search matches the float path's ranking") {
    val (bucketed, centroids) = Similarity.ivfBucketize(emb, numCentroids = 8)
    val qs = emb.filter($"vec_id" < 5)
    val fl = Similarity.ivfKnn(bucketed, centroids, qs, k = 5, nprobe = 8)
    val qz = Similarity.ivfKnnQuantized(bucketed, centroids, qs, k = 5, nprobe = 8)
    // the float rescore removes quantization error from the final ranking:
    // identical (qid, cid) sets, self recalled first
    val a = fl.select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = qz.select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((a & b).size.toDouble >= 0.9 * a.size, s"${(a & b).size} of ${a.size} overlap")
    assert(qz.filter($"rk" === 1 && $"qid" === $"cid").count() == 5)
    // the stored index really is codes-only: no float vector column
    val idx = Similarity.quantizedIndex(bucketed)
    assert(idx.columns.toSeq == Seq("bucket", "cid", "qcode"))
  }

  test("stored quantized index: codes-only scan, bucket partition pruning") {
    val (bucketed, centroids) = Similarity.ivfBucketize(emb, numCentroids = 8)
    val dir = graft.ArtifactStore.scratchDir("graft_qidx").toFile.getAbsolutePath
    Similarity.saveQuantizedIndex(bucketed, centroids, dir)
    val (codes, cents) = Similarity.loadQuantizedIndex(spark, dir)
    val qs = emb.filter($"vec_id" < 3)
    val res = Similarity.ivfKnnStored(codes, cents, emb, qs, k = 4, nprobe = 2)
    assert(res.filter($"rk" === 1 && $"qid" === $"cid").count() == 3)
    // the candidate scan carries NO float embedding column — the stored
    // file physically lacks it, so the 4x byte saving is real, and the
    // probed-bucket filter prunes partitions at the scan
    val plan = res.queryExecution.executedPlan.toString
    val codeScan = plan.linesIterator.find(l =>
      l.contains("Scan parquet") && l.contains(dir)).getOrElse("")
    assert(!codeScan.contains("embedding"), codeScan)
  }

  test("updateQuantizedIndex: delta add/remove against fixed centroids") {
    val base = emb.filter($"vec_id" % 10 =!= 0) // 90% of the corpus
    val late = emb.filter($"vec_id" % 10 === 0) // arrives later
    val (bucketed, centroids) = Similarity.ivfBucketize(base, numCentroids = 8)
    val removed = base.filter($"vec_id" % 7 === 3).select($"vec_id")
    val updated = Similarity.updateQuantizedIndex(
      Similarity.quantizedIndex(bucketed), centroids, removed, late)
    assert(updated.columns.toSeq == Seq("bucket", "cid", "qcode"))
    // end-state membership: (base − removed) ∪ late, no stragglers
    val endIds = emb.filter($"vec_id" % 10 === 0 ||
        ($"vec_id" % 10 =!= 0 && $"vec_id" % 7 =!= 3))
      .select($"vec_id").as[Long].collect().toSet
    assert(updated.select($"cid").as[Long].collect().toSet == endIds)
    // the delta-added vectors are searchable: full-probe stored search
    // recalls each late vector as its own top hit after float rescore
    val qs = late.limit(5)
    val res = Similarity.ivfKnnStored(updated, centroids, emb, qs,
      k = 3, nprobe = 8)
    assert(res.filter($"rk" === 1 && $"qid" === $"cid").count() == qs.count())
    // removed ids never surface as candidates
    val remSet = removed.as[Long].collect().toSet
    assert(res.filter($"cid".isin(remSet.toSeq: _*)).count() == 0)
  }

  test("embedding near-dup: oversized buckets are dropped, not exploded") {
    // 30 identical vectors forced into 1 centroid: with maxBucket below the
    // cluster size the pairwise stage must emit nothing (the O(bucket²)
    // blowup guard); with a generous cap it emits all pairs.
    val dense = (1L to 30L).map(i => (i, Array.fill(8)(1.0f))).toDF("vec_id", "embedding")
    val capped = Similarity.embeddingNearDupPairs(dense, threshold = 0.9,
      numCentroids = 1, maxBucket = 10)
    assert(capped.count() == 0)
    val uncapped = Similarity.embeddingNearDupPairs(dense, threshold = 0.9,
      numCentroids = 1, maxBucket = 100)
    assert(uncapped.count() == 30L * 29L / 2)
  }

  test("multi-probe raises near-dup recall over single-assignment IVF") {
    val exact = emb.as("a").join(emb.as("b"), $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("id_a"), $"b.vec_id".as("id_b"),
        graft.functions.VectorFunctions.cosineNative($"a.embedding", $"b.embedding").as("sim"))
      .filter($"sim" >= 0.4).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    def recall(np: Int): Double = {
      val found = Similarity.embeddingNearDupPairs(emb, 0.4, nprobe = np)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(found.subsetOf(exact)) // cosine-verified → precision exact
      if (exact.isEmpty) 1.0 else found.size.toDouble / exact.size
    }
    val (r1, r4) = (recall(1), recall(4))
    assert(r4 > r1, s"nprobe=4 recall $r4 not above nprobe=1 $r1")
    assert(r4 >= 0.8, s"nprobe=4 recall $r4 below floor")
  }

  test("near-dup constructors launch no driver-side job before an action") {
    // r3 review: hyperplaneNearDupPairs ran .head() for the dim and
    // embeddingNearDupPairs ran corpus.count() for centroid sizing — at
    // 100 TB each is a full extra pass. Both are now plan-time only.
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val p1 = Similarity.hyperplaneNearDupPairs(emb, 0.4, bits = 4, tables = 2)
      val p2 = Similarity.embeddingNearDupPairs(emb, 0.4)
      assert(p1.columns.toSeq == Seq("id_a", "id_b", "sim"))
      assert(p2.columns.toSeq == Seq("id_a", "id_b", "sim"))
      Thread.sleep(500) // listener bus is async
      assert(jobs.get() == 0, s"${jobs.get()} jobs ran during plan construction")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  test("hash split is deterministic, disjoint, and roughly proportional") {
    val ids = (1L to 10000L).toDF("id")
    val s1 = Sampling.hashSplit(ids, "id", Seq(0.8, 0.1, 0.1), Seq("train", "val", "test"))
    val s2 = Sampling.hashSplit(ids.repartition(13), "id",
      Seq(0.8, 0.1, 0.1), Seq("train", "val", "test"))
    // identical assignment regardless of partitioning
    assert(s1.orderBy("id").collect().toSeq == s2.orderBy("id").collect().toSeq)
    val counts = s1.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 10000L) // disjoint + exhaustive
    assert(math.abs(counts("train") - 8000L) < 300)
    assert(math.abs(counts("val") - 1000L) < 150)
  }

  test("hash sample is stable and monotone in the fraction") {
    val ids = (1L to 5000L).toDF("id")
    val small = Sampling.hashSample(ids, "id", 0.1).as[Long].collect().toSet
    val big = Sampling.hashSample(ids, "id", 0.3).as[Long].collect().toSet
    assert(small.subsetOf(big)) // growing the fraction only adds rows
    assert(math.abs(small.size - 500) < 100)
  }
}

class StratifiedSampleSpec extends SparkTestBase {
  import spark.implicits._
  import graft.operators.Sampling

  test("per-stratum rates hold and membership is stable under repartition") {
    val df = (1L to 20000L).map(i => (i, if (i % 3 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val out = Sampling.stratifiedSample(df, "lang",
      Map("en" -> 0.5), default = 0.05)
    val byLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    val en = byLang.getOrElse("en", 0L).toDouble / (20000 / 3)
    val de = byLang.getOrElse("de", 0L).toDouble / (20000 * 2 / 3)
    assert(math.abs(en - 0.5) < 0.05, s"en rate $en")
    assert(math.abs(de - 0.05) < 0.02, s"de rate $de")
    // same ids under a different partitioning — determinism, not RNG
    val again = Sampling.stratifiedSample(df.repartition(13), "lang",
      Map("en" -> 0.5), default = 0.05)
    assert(out.select("doc_id").exceptAll(again.select("doc_id")).count() == 0)
    assert(again.count() == out.count())
  }
}

class FuzzyJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("gram-blocked edit-distance join finds near matches, skips far ones") {
    val a = Seq((1L, "jonathan smith"), (2L, "maria garcia"), (3L, "zzz"))
      .toDF("id", "name")
    val b = Seq((10L, "jonathon smith"), (20L, "marla garcia"), (30L, "completely different"))
      .toDF("id", "name")
    val pairs = FuzzyJoin.pairs(a, "id", "name", b, "id", "name", maxDist = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 10L), (2L, 20L)))
  }

  test("stop-gram pruning bounds candidate generation") {
    // every string shares the boilerplate prefix; with the prefix grams
    // pruned, only true near-pairs survive as candidates
    val a = (1L to 50L).map(i => (i, f"common-prefix-$i%03d")).toDF("id", "name")
    val b = (1L to 50L).map(i => (i + 100L, f"common-prefix-$i%03d")).toDF("id", "name")
    val strict = FuzzyJoin.pairs(a, "id", "name", b, "id", "name",
      maxDist = 0, maxGramFreq = 10)
    // exact copies share their (rare) numeric suffix grams → found even
    // though all boilerplate grams were pruned
    assert(strict.count() == 50)
  }
}

class QuantifiedSpec extends SparkTestBase {
  import spark.implicits._
  import graft.operators.Quantified

  private def run(df: org.apache.spark.sql.DataFrame): Map[Int, Any] =
    df.collect().map(r => r.getInt(0) -> r.get(r.length - 1)).toMap

  test("3VL truth table: ordering ANY/ALL with nulls and empty subquery") {
    val base = Seq((1, Some(5.0)), (2, None: Option[Double])).toDF("id", "x")
    val withNull = Seq(Some(3.0), None).toDF("v")
    val empty = Seq.empty[Double].toDF("v")
    // 5 > ANY {3, null} = TRUE; null lhs → NULL
    assert(run(Quantified.anyComparison(base, $"x", ">", withNull, "r"))
      == Map(1 -> true, 2 -> null))
    // 5 < ANY {3, null}: 5<3 false, 5<null null → NULL
    assert(run(Quantified.anyComparison(base, $"x", "<", withNull, "r"))
      == Map(1 -> null, 2 -> null))
    // ANY over empty set is FALSE even for null lhs
    assert(run(Quantified.anyComparison(base, $"x", ">", empty, "r"))
      == Map(1 -> false, 2 -> false))
    // ALL over empty set is TRUE even for null lhs
    assert(run(Quantified.allComparison(base, $"x", "<", empty, "r"))
      == Map(1 -> true, 2 -> true))
    // 5 > ALL {3, null}: 5>3 true, 5>null null → NULL; refuted lhs → FALSE
    assert(run(Quantified.allComparison(base, $"x", ">", withNull, "r"))
      == Map(1 -> null, 2 -> null))
  }

  test("3VL membership: = ANY and != ALL (NOT IN)") {
    val base = Seq((1, Some(3.0)), (2, Some(9.0)), (3, None: Option[Double])).toDF("id", "x")
    val withNull = Seq(Some(3.0), None).toDF("v")
    val noNull = Seq(3.0, 4.0).toDF("v")
    // membership hit → TRUE regardless of nulls; miss + null present → NULL
    assert(run(Quantified.anyComparison(base, $"x", "=", withNull, "r"))
      == Map(1 -> true, 2 -> null, 3 -> null))
    assert(run(Quantified.anyComparison(base, $"x", "=", noNull, "r"))
      == Map(1 -> true, 2 -> false, 3 -> null))
    // NOT IN: hit → FALSE; miss with null in set → NULL (the classic trap)
    assert(run(Quantified.allComparison(base, $"x", "!=", withNull, "r"))
      == Map(1 -> false, 2 -> null, 3 -> null))
    assert(run(Quantified.allComparison(base, $"x", "!=", noNull, "r"))
      == Map(1 -> false, 2 -> true, 3 -> null))
  }
}

class TemporalSpec extends SparkTestBase {
  import spark.implicits._

  test("sessionize matches the SQL sessionization query (q74 parity)") {
    val events = Tables.load(spark, sfDir, "events")
    val api = Temporal.sessionize(events, Seq("user_id"), "ts", 1800L, "event_id")
      .groupBy("user_id").agg(max(col("session_id")).as("n_sessions"))
      .orderBy("user_id")
      .as[(Long, Long)].collect().toSeq
    val sqlSide = queries.QueriesPipeline.queries("q74_sessionize")(spark, sfDir)
      .as[(Long, Long)].collect().toSeq
    assert(api == sqlSide)
  }

  test("asof join ignores null-timestamp right rows; null-ts left rows get null") {
    val left = Seq((1L, "u", Some(10L)), (2L, "u", None: Option[Long])).toDF("id", "k", "t")
    val right = Seq(("u", Some(5L), "ok"), ("u", None: Option[Long], "poison"))
      .toDF("k", "t", "tag")
    val out = Temporal.asofJoin(left, right, Seq("k"), "t", Seq("tag"))
      .select("id", "tag").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "ok", 2L -> null))
  }

  test("asof join carries the latest prior right value, inclusive ties") {
    val left = Seq((1L, "u", 10L), (2L, "u", 20L), (3L, "u", 25L), (4L, "v", 5L))
      .toDF("id", "k", "t")
    val right = Seq(("u", 10L, "a"), ("u", 22L, "b"), ("v", 9L, "z"))
      .toDF("k", "t", "tag")
    val out = Temporal.asofJoin(left, right, Seq("k"), "t", Seq("tag"))
      .select("id", "tag").as[(Long, String)].collect().toMap
    // id=1: right at t=10 matches inclusively; id=3: latest ≤25 is t=22;
    // id=4: no right row at or before t=5 → null
    assert(out == Map(1L -> "a", 2L -> "a", 3L -> "b", 4L -> null))
  }
}

class SpatialJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("radius join finds cross-cell neighbors and excludes far points") {
    // two points 0.9° apart straddling a cell boundary, one far away
    val a = Seq((1L, Seq(0.05, 0.0)), (2L, Seq(50.0, 10.0))).toDF("aid", "pt")
    val b = Seq((10L, Seq(-0.85, 0.0)), (20L, Seq(120.0, 40.0))).toDF("bid", "pt")
    val pairs = SpatialJoin.radiusJoin(a, b, radiusKm = 150.0, "aid", "pt", "bid", "pt")
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 10L)))
  }

  test("radius join equals brute force on fixture points") {
    val pts = (1L to 60L).map(i =>
      (i, Seq((i % 50 - 25) * 1.0 + 0.3, (i % 30 - 15) * 1.0 + 0.7))).toDF("id", "pt")
    val blocked = SpatialJoin.radiusJoin(pts, pts.toDF("id2", "pt"), 500.0,
        "id", "pt", "id2", "pt")
      .filter($"id" < $"id2").select("id", "id2").as[(Long, Long)].collect().toSet
    val brute = pts.as("x").crossJoin(pts.toDF("id2", "pt2").as("y"))
      .filter($"id" < $"id2")
      .filter(graft.functions.GeoNetFunctions.haversineDistance($"pt", $"pt2") / 1000.0 <= 500.0)
      .select("id", "id2").as[(Long, Long)].collect().toSet
    assert(blocked == brute)
  }
}

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("token and quality metrics") {
    val df = Seq((1L, "The quick brown fox."), (2L, "")).toDF("doc_id", "text")
    val r = TextAnalysis.analyze(df, "doc_id", "text").orderBy("doc_id").collect()
    assert(r(0).getAs[Int]("n_tokens") == 4)
    assert(r(0).getAs[Long]("fingerprint") != 0L)
    assert(r(1).getAs[Int]("n_tokens") == 0)
    val q = r(0).getAs[Double]("quality")
    assert(q > 0.0 && q <= 1.0)
  }
}

class GopherRulesSpec extends SparkTestBase {
  import spark.implicits._

  test("gopherFlags: each rule trips on its designed failure class") {
    val good = ("the quick brown fox jumps over and over to be of use " +
      "that we have with plenty of ordinary words ") * 3
    val docs = Seq(
      (1L, good),                                  // passes everything
      (2L, "too short to keep"),                   // word count
      (3L, ("ok " * 60) + ("# " * 12)),            // symbol ratio
      (4L, "• a\n• b\n• c\n• d\n• e\n• f\n• g\n• h\n• i\n• j"), // bullets
      (5L, "12345 67890 " * 40)                    // alpha + stopwords
    ).toDF("doc_id", "text")
    val flags = graft.operators.TextAnalysis.gopherFlags(docs, "doc_id", "text")
      .orderBy($"doc_id").collect()
    def row(i: Int) = flags(i)
    assert(row(0).getBoolean(row(0).fieldIndex("keep")))
    assert(!row(1).getBoolean(row(1).fieldIndex("g_word_count")))
    assert(!row(2).getBoolean(row(2).fieldIndex("g_symbol")))
    assert(!row(3).getBoolean(row(3).fieldIndex("g_bullets")))
    assert(!row(4).getBoolean(row(4).fieldIndex("g_alpha")) &&
      !row(4).getBoolean(row(4).fieldIndex("g_stopwords")))
    assert(flags.drop(1).forall(r => !r.getBoolean(r.fieldIndex("keep"))))
  }
}

class MatchTextSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark filter pushdown with window functions"),
    (2L, "filter only document"),
    (3L, "nothing relevant here")).toDF("doc_id", "text")

  test("language analyzers: german/french/spanish stop + fold + stem chains") {
    import graft.operators.MatchText
    val de = MatchText.Analyzer.byName("german")
    assert(de.tokens("Die Häuser und Gärten") == Seq("haus", "gart"))
    assert(de.tokens("schönes Straßen-Bild") == Seq("schon", "strass", "bild"))
    val fr = MatchText.Analyzer.byName("french")
    assert(fr.tokens("les chevaux et beaux jours") == Seq("cheval", "beau", "jour"))
    val es = MatchText.Analyzer.byName("spanish")
    assert(es.tokens("los animales y las flores") == Seq("animal", "flor"))
    // the Column path agrees with the driver path
    val col = Seq("Die Häuser und Gärten").toDF("t")
      .select(de(org.apache.spark.sql.functions.col("t"))).head().getSeq[String](0)
    assert(col == Seq("haus", "gart"))
  }

  test("language analyzers: italian/portuguese/dutch/russian chains") {
    import graft.operators.MatchText
    val it = MatchText.Analyzer.byName("italian")
    assert(it.tokens("i libri e le belle serie") == Seq("libr", "bell", "ser"))
    val pt = MatchText.Analyzer.byName("portuguese")
    assert(pt.tokens("os corações e os animais bons") ==
      Seq("coração", "animal", "bon"))
    val nl = MatchText.Analyzer.byName("dutch")
    assert(nl.tokens("de huizen en mooie tuinen") ==
      Seq("huiz", "mooi", "tuin"))
    val ru = MatchText.Analyzer.byName("russian")
    assert(ru.tokens("и книги с цветов ночами") == Seq("книг", "цвет", "ноч"))
    // Column path agrees with the driver path (Cyrillic included)
    val colToks = Seq("и книги с цветов ночами").toDF("t")
      .select(ru(org.apache.spark.sql.functions.col("t"))).head().getSeq[String](0)
    assert(colToks == Seq("книг", "цвет", "ноч"))
  }

  test("fused analyzer expression = compositional chain = driver tokens") {
    import graft.operators.MatchText
    val texts = Seq(
      "Die Häuser und Gärten sind SCHÖN!!",
      "spark filter pushdown with window functions",
      "и книги с цветов ночами",
      "the cats ran across 42 bridges... quickly",
      "数据库 the エンジン and 大 spark2号",
      "kitapları ve หนังสือเล่มนี้ดี arabalar",
      "")
    val df = texts.toDF("t")
    val analyzers = Seq(
      MatchText.Analyzer.byName("german"),
      MatchText.Analyzer.byName("english"),
      MatchText.Analyzer.byName("russian"),
      MatchText.Analyzer.byName("cjk"),
      MatchText.Analyzer.byName("arabic"),
      MatchText.Analyzer.byName("hindi"),
      MatchText.Analyzer.byName("chinese"),
      MatchText.Analyzer.byName("turkish"),
      MatchText.Analyzer.byName("thai"),
      MatchText.Analyzer(edgeNgram = (3, 5)),
      MatchText.Analyzer(shingle = (2, 3)),
      MatchText.Analyzer(tokenizer = "keyword"))
    for (a <- analyzers) {
      val fused = df.select(a(col("t"))).collect().map(_.getSeq[String](0).toList).toList
      val chain = df.select(a.columnsChain(col("t"))).collect()
        .map(_.getSeq[String](0).toList).toList
      val driver = texts.map(t => a.tokens(t).toList).toList
      assert(fused == chain, s"fused != chain for $a")
      assert(fused == driver, s"fused != driver tokens for $a")
    }
    // and the fused expression participates in codegen (no UDF wrapper)
    val plan = df.select(MatchText.Analyzer.default(col("t")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_analyze"), plan)
  }

  test("cjk analyzer: bigram runs, lone-ideograph unigram, mixed scripts") {
    import graft.operators.MatchText
    val a = MatchText.Analyzer.byName("cjk")
    // a 4-char Han run → 3 overlapping bigrams
    assert(a.tokens("机器学习") == Seq("机器", "器学", "学习"))
    // lone ideograph stays a unigram; latin lowers; stop word drops
    assert(a.tokens("大 THE Spark") == Seq("大", "spark"))
    // adjacent CJK chars bigram together across scripts (katakana + han)
    assert(a.tokens("データ情報") == Seq("デー", "ータ", "タ情", "情報"))
    // latin+CJK in one token: standard tokenizer keeps them together,
    // the bigrammer re-segments
    assert(a.tokens("spark数据") == Seq("spark", "数据"))
    // hangul bigrams
    assert(a.tokens("학습데이터") == Seq("학습", "습데", "데이", "이터"))
    // CJKWidthFilter: fullwidth ASCII folds to halfwidth (and lowers),
    // halfwidth katakana folds to fullwidth before bigramming
    assert(a.tokens("ＳＰＡＲＫ３") == Seq("spark3"))
    assert(a.tokens("ﾃｽﾄ") == Seq("テス", "スト"))
  }

  test("cjk_bigram per-script flags: ignored_scripts + output_unigrams") {
    import graft.operators.MatchText
    // katakana/hangul ignored → those runs pass whole; han still bigrams
    val a = MatchText.Analyzer(cjkBigram = true,
      cjkIgnored = Seq("katakana", "hangul"))
    assert(a.tokens("データ分析") == Seq("データ", "分析"))
    assert(a.tokens("모델학습 数据库") == Seq("모델학습", "数据", "据库"))
    // ignored han passes per CHAR (Lucene's StandardTokenizer hands the
    // filter single ideographs); enabled katakana still bigrams
    val h = MatchText.Analyzer(cjkBigram = true, cjkIgnored = Seq("han"))
    assert(h.tokens("数据库データ") == Seq("数", "据", "库", "デー", "ータ"))
    // output_unigrams emits chars after each enabled segment's bigrams;
    // a lone ideograph stays a single unigram (no duplicate)
    val u = MatchText.Analyzer(cjkBigram = true, cjkOutputUnigrams = true)
    assert(u.tokens("学習") == Seq("学習", "学", "習"))
    assert(u.tokens("spark 大") == Seq("spark", "大"))
    // unknown script name fails loudly
    intercept[IllegalArgumentException] {
      MatchText.Analyzer(cjkBigram = true, cjkIgnored = Seq("latin"))
        .tokens("x")
    }
    // the fused kernel and the Column chain stay differential-equal for
    // every flag combination
    val texts = Seq("データ分析 spark", "模型학습", "数据库データ 大")
    val df = texts.toDF("t")
    for (an <- Seq(a, h, u)) {
      val fused = df.select(an(col("t"))).collect()
        .map(_.getSeq[String](0).toList).toList
      val chain = df.select(an.columnsChain(col("t"))).collect()
        .map(_.getSeq[String](0).toList).toList
      val driver = texts.map(t => an.tokens(t).toList).toList
      assert(fused == chain, s"fused != chain for $an")
      assert(fused == driver, s"fused != driver tokens for $an")
    }
  }

  test("wave-4 analyzers: all 34 reference builtin language types resolve") {
    import graft.operators.MatchText.Analyzer
    // the reference's full `type='<language>'` list (ddl/analyzers.rst)
    val all = Seq("arabic", "armenian", "basque", "brazilian", "bengali",
      "bulgarian", "catalan", "chinese", "cjk", "czech", "danish", "dutch",
      "english", "finnish", "french", "galician", "german", "greek",
      "hindi", "hungarian", "indonesian", "italian", "latvian",
      "lithuanian", "norwegian", "persian", "portuguese", "romanian",
      "russian", "sorani", "spanish", "swedish", "turkish", "thai")
    all.foreach(n => assert(Analyzer.exists(n), s"missing analyzer: $n"))
  }

  test("wave-4 analyzers: golden tokenizations per language chain") {
    import graft.operators.MatchText.Analyzer
    def tk(lang: String, s: String) = Analyzer.byName(lang).tokens(s)
    // arabic: article/conjunction prefixes, taa-marbuta fold, stop drop
    assert(tk("arabic", "الكتاب والكتب في المدرسة") ==
      Seq("كتاب", "كتب", "مدرس"))
    // turkish: agglutinative case/plural endings, longest-first
    assert(tk("turkish", "kitapları ve evlerinde") == Seq("kitap", "ev"))
    // greek: final-sigma fold + case endings
    assert(tk("greek", "και τα βιβλία των πόλεων") == Seq("βιβλί", "πόλε"))
    // hindi: matras survive tokenization (\p{M}), plural endings strip
    assert(tk("hindi", "लड़कों और किताबें") == Seq("लड़क", "किताब"))
    assert(tk("czech", "knihy a domech") == Seq("knih", "dom"))
    assert(tk("hungarian", "a házakban és könyveket") == Seq("házak", "könyv"))
    // indonesian: voice prefixes + -nya/-an suffixes
    assert(tk("indonesian", "membaca bukunya dan pekerjaan") ==
      Seq("baca", "buku", "kerja"))
    assert(tk("romanian", "cărțile și orașelor") == Seq("cărți", "oraș"))
    assert(tk("bulgarian", "книгите и градовете") == Seq("книг", "градове"))
    assert(tk("catalan", "els llibres i les cançons") == Seq("llibr", "cançon"))
    assert(tk("galician", "os libros e as cancións") == Seq("libro", "can"))
    assert(tk("latvian", "grāmatas un pilsētas") == Seq("grāmat", "pilsēt"))
    assert(tk("lithuanian", "knygos ir miestams") == Seq("knyg", "miest"))
    assert(tk("armenian", "գրքերը և քաղաքների") == Seq("գրք", "քաղաք"))
    assert(tk("basque", "liburuak eta etxeetan") == Seq("liburu", "etxe"))
    assert(tk("bengali", "বইগুলো এবং ছেলেদের") == Seq("বই", "ছেলে"))
    // brazilian rides the portuguese chain
    assert(tk("brazilian", "corações e animais") == Seq("coração", "animal"))
    // persian: arabic-ya fold, NO stemming (Lucene parity)
    assert(tk("persian", "اين شهر بزرگ") == Seq("این", "شهر", "بزرگ"))
    assert(tk("sorani", "کتێبەکان و شارەکە") == Seq("کتێب", "شار"))
    // thai: DICTIONARY word segmentation (platform BreakIterator, the
    // JDK's ICU-derived Thai dictionary) — unspaced text segments into
    // words, stop words (นี้) drop, vowel marks stay intact
    assert(tk("thai", "หนังสือ และ เมือง") == Seq("หนังสือ", "เมือง"))
    assert(tk("thai", "หนังสือเล่มนี้ดีมาก") ==
      Seq("หนังสือ", "เล่ม", "ดี", "มาก"))
    assert(tk("thai", "เมืองใหญ่ในประเทศไทย") ==
      Seq("เมือง", "ใหญ่", "ประเทศ", "ไทย"))
    // chinese: one token per Han ideograph (ES standard-tokenizer
    // behavior); kana/hangul runs stay whole
    assert(tk("chinese", "数据库 データベース 학습") ==
      Seq("数", "据", "库", "データベース", "학습"))
  }

  test("language analyzers: swedish/norwegian/danish/finnish chains") {
    import graft.operators.MatchText
    val sv = MatchText.Analyzer.byName("swedish")
    assert(sv.tokens("hästarna och böckerna på husen") ==
      Seq("häst", "böck", "hus"))
    val no = MatchText.Analyzer.byName("norwegian")
    assert(no.tokens("hestene og fjellene er fine") ==
      Seq("hest", "fjell", "fin"))
    val da = MatchText.Analyzer.byName("danish")
    assert(da.tokens("hestene og blomsterne på markerne") ==
      Seq("hest", "blomst", "mark"))
    val fi = MatchText.Analyzer.byName("finnish")
    assert(fi.tokens("kissat ja kukissa taloissa") ==
      Seq("kissa", "kuki", "taloi"))
  }

  test("match predicate requires all terms") {
    val hits = docs.filter(MatchText.matchPredicate(col("text"), "spark filter"))
      .select("doc_id").as[Long].collect().toSet
    assert(hits == Set(1L))
  }

  test("operator OR matches any term; fuzziness matches within edit distance") {
    val or = docs.filter(MatchText.matchPredicate(col("text"), "spark document",
        operator = "or")).select("doc_id").as[Long].collect().toSet
    assert(or == Set(1L, 2L), "OR = any term suffices")
    val fuzzy = docs.filter(MatchText.matchPredicate(col("text"), "sparkz filterz",
        fuzziness = 1)).select("doc_id").as[Long].collect().toSet
    assert(fuzzy == Set(1L), "both fuzzy terms hit doc 1 only")
    val exact = docs.filter(MatchText.matchPredicate(col("text"), "sparkz filterz"))
      .select("doc_id").as[Long].collect().toSet
    assert(exact.isEmpty, "fuzziness 0 stays exact")
  }

  test("phrase slop stretches the window in order only") {
    // doc 1: "spark filter …" adjacent; doc 4: one word between; doc 5:
    // reversed order — never matches regardless of slop
    val d = docs.union(Seq(
      (4L, "spark pushdown filter chain"),
      (5L, "filter the spark")).toDF("doc_id", "text"))
    def hits(slop: Int) =
      d.filter(MatchText.phraseSlopPredicate(col("text"), "spark filter", slop))
        .select("doc_id").as[Long].collect().toSet
    assert(hits(0) == Set(1L))
    assert(hits(1) == Set(1L, 4L))
    assert(hits(5) == Set(1L, 4L), "reversed order never matches")
  }

  test("porter analyzer conflates morphological variants") {
    val d = Seq((1L, "the running dogs relational"),
      (2L, "runs dog relate")).toDF("doc_id", "text")
    val a = MatchText.Analyzer.englishPorter
    val t1 = d.select(a(col("text"))).as[Seq[String]].collect()
    assert(t1(0) == Seq("run", "dog", "relat"))
    assert(t1(1) == Seq("run", "dog", "relat"),
      "index-side and variant terms stem to the same forms")
    assert(a.tokens("running relations") == Seq("run", "relat"),
      "query side stems through the same chain")
  }

  test("tf-idf search ranks the doc with rarer terms first") {
    val idx = MatchText.buildIndex(docs, "doc_id", "text")
    val res = MatchText.search(idx, "spark filter", topN = 5)
      .select("doc_id").as[Long].collect()
    assert(res.head == 1L)
    assert(res.toSet == Set(1L, 2L))
  }

  test("search on a built index runs no full-index aggregation") {
    // all global stats (nDocs, avgdl, df, dl) are fixed at build time; a
    // search plan must contain exactly ONE aggregate — the per-doc score
    // groupBy over the matched postings — and no countDistinct/docLen pass.
    val idx = MatchText.buildIndex(docs, "doc_id", "text")
    val plan = MatchText.searchBM25(idx, "spark filter", topN = 5)
      .queryExecution.optimizedPlan
    val aggs = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.length == 1, s"expected 1 aggregate (score groupBy), got ${aggs.length}")
  }

  test("analyzer chain: stopwords dropped, s-stemming identical on both paths") {
    val an = MatchText.Analyzer.english
    // driver-side query analysis must equal the Column-side doc analysis
    assert(an.tokens("The sparks and glasses of boxes") ==
      Seq("spark", "glass", "boxe"))
    val colSide = Seq(Tuple1("The sparks and glasses of boxes")).toDF("t")
      .select(an(col("t"))).as[Seq[String]].head()
    assert(colSide == Seq("spark", "glass", "boxe"))
  }

  test("fielded search: best_fields=max, most_fields=sum, boosts applied") {
    val fdocs = Seq(
      (1L, "spark engine", "a long body about databases and storage layers"),
      (2L, "storage notes", "spark spark spark appears often in this body"),
      (3L, "unrelated title", "nothing relevant at all")
    ).toDF("doc_id", "title", "body")
    val idx = MatchText.buildFieldedIndex(fdocs, "doc_id", Seq("title", "body"))
    val best = MatchText.searchFielded(idx, "spark", Map("title" -> 2.0), "best_fields", 5)
      .select("doc_id").as[Long].collect()
    val most = MatchText.searchFielded(idx, "spark", Map("title" -> 2.0), "most_fields", 5)
      .select("doc_id").as[Long].collect()
    // doc 3 never matches; docs 1 and 2 rank under both combinations
    assert(best.toSet == Set(1L, 2L) && most.toSet == Set(1L, 2L))
    // boosted title makes doc 1 win best_fields
    assert(best.head == 1L)
  }
}

class AggregatorsSpec extends SparkTestBase {
  import spark.implicits._

  test("topk returns exact ordered counts for low cardinality") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(1)("c")).toDF("v")
    val topk = udaf(new TopKAggregator(2), Encoders.STRING)
    val rows = df.agg(topk($"v").as("t")).select(explode($"t").as("e"))
      .select($"e.value", $"e.cnt").as[(String, Long)].collect().toSeq
    assert(rows == Seq(("a", 5L), ("b", 3L)))
  }

  test("lttb keeps endpoints and bounds size") {
    val agg = new LttbAggregator(10)
    val pts = Array.tabulate(100)(i => TsPoint(i.toLong, math.sin(i / 5.0)))
    val out = agg.lttb(pts, 10)
    assert(out.length == 10)
    assert(out.head == pts.head && out.last == pts.last)
  }
}

class MultimodalSpec extends SparkTestBase {
  test("feature extraction is deterministic with stable schema") {
    val docs = Tables.load(spark, sfDir, "documents").filter(col("doc_id") < 30)
    val media = Multimodal.syntheticMedia(docs, "doc_id", "text")
    val f1 = Multimodal.extractFeatures(media, dim = 8).orderBy("asset_id").collect()
    val f2 = Multimodal.extractFeatures(media, dim = 8).orderBy("asset_id").collect()
    assert(f1.toSeq == f2.toSeq)
    assert(f1.head.getSeq[Double](f1.head.fieldIndex("feature")).length == 8)
  }

  test("frame sampling yields one row per interval") {
    val docs = Tables.load(spark, sfDir, "documents").filter(col("doc_id") < 30)
    val media = Multimodal.syntheticMedia(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(media, everyMs = 500)
    assert(frames.count() > 0)
  }

  test("resize: nearest-neighbor resample preserves grid structure") {
    // pure-kernel check: 2× downsample picks every other source pixel
    val src = Array.tabulate(64)(_.toDouble) // 8×8 grid: px(y*8+x)=y*8+x
    val out = Multimodal.resampleNearest(src, 8, 8, 4, 4)
    assert(out.length == 16)
    assert(out(0) == 0.0 && out(5) == src(2 * 8 + 2) && out(15) == src(6 * 8 + 6))
    // distributed pass: stable schema, one thumb per asset
    val docs = Tables.load(spark, sfDir, "documents").filter(col("doc_id") < 10)
    val media = Multimodal.syntheticMedia(docs, "doc_id", "text")
    val thumbs = Multimodal.resize(media, 4, 4).collect()
    assert(thumbs.length == 10)
    assert(thumbs.forall(_.getSeq[Double](1).length == 16))
  }
}

class SkewSpec extends SparkTestBase {
  import spark.implicits._
  import graft.operators.Skew

  test("salted join returns the same rows as the plain join") {
    val lineitem = Tables.load(spark, sfDir, "lineitem")
    val supplier = Tables.load(spark, sfDir, "supplier")
    val plain = lineitem.join(supplier, lineitem("l_suppkey") === supplier("s_suppkey"))
      .select($"l_orderkey", $"l_linenumber", $"s_name")
    val salted = Skew.saltedJoin(
      lineitem.withColumnRenamed("l_suppkey", "k"),
      supplier.withColumnRenamed("s_suppkey", "k"),
      "k", uniqueCol = "l_orderkey", saltFactor = 8)
      .select($"l_orderkey", $"l_linenumber", $"s_name")
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("keyHistogram surfaces hot keys") {
    val hist = Skew.keyHistogram(Tables.load(spark, sfDir, "lineitem"), "l_returnflag", 3)
    assert(hist.count() == 3)
  }
}

class TopKSkewSpec extends SparkTestBase {
  import spark.implicits._
  import graft.functions.aggregates.TopKAggregator

  test("Misra-Gries TopK keeps heavy hitters beyond capacity") {
    // 2000 distinct cold keys + 3 hot keys, capacity 100 << cardinality
    val cold = (0 until 2000).map(i => s"cold_$i")
    val data = cold ++ Seq.fill(500)("hot_a") ++ Seq.fill(300)("hot_b") ++ Seq.fill(200)("hot_c")
    val df = spark.sparkContext.parallelize(data, 8).toDF("v")
    val topk = udaf(new TopKAggregator(3, capacity = 100), Encoders.STRING)
    val rows = df.agg(topk($"v").as("t")).select(explode($"t").as("e"))
      .select($"e.value").as[String].collect().toSeq
    assert(rows == Seq("hot_a", "hot_b", "hot_c"))
  }
}

class ConnectedComponentsSpec extends SparkTestBase {
  import spark.implicits._
  import graft.operators.Dedup

  test("transitive closure collapses chains to one component") {
    // chain 1-2, 2-3, 3-4 plus isolated pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comps(_) == 1L))
    assert(comps(10L) == 10L && comps(11L) == 10L)
  }

  test("transitive dedup keeps one doc per near-dup chain") {
    val docs = Seq(
      (1L, "aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii jjjj"),
      (2L, "aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii jjjj"),   // = 1
      (3L, "aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii jjjj"),   // = 1
      (4L, "totally different content that stands alone here okay")
    ).toDF("doc_id", "text")
    val kept = Dedup.minhashDedupTransitive(docs, "doc_id", "text", threshold = 0.9)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L))
  }
}

class StreamDedupSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  test("flatMapGroupsWithState drops duplicate event_ids across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val stream = mem.toDF().select(col("value").as("event_id"),
      (col("value") % 5).as("user_id"))
    val q = graft.streaming.EventsStream.dedupeStream(stream)
      .writeStream.format("memory").queryName("dedupstream").outputMode("append").start()
    try {
      mem.addData(1L, 2L, 2L, 3L)
      q.processAllAvailable()
      mem.addData(2L, 3L, 4L)   // 2 and 3 already seen in the previous batch
      q.processAllAvailable()
      val seen = spark.sql("SELECT event_id FROM dedupstream").as[Long].collect().toSeq
      assert(seen.sorted == Seq(1L, 2L, 3L, 4L))
    } finally q.stop()
  }
}

class StreamMinhashDedupSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  private val base = "the quick brown fox jumps over the lazy dog and then " +
    "runs far away into the deep dark forest to hide from everyone there"
  private def nearDup(s: String) = s.replace("dark", "darkish")

  test("dedupMinhashIncrement: near-dups drop across increments, state durable") {
    val state = graft.ArtifactStore.scratchDir("graft_mhstate").toFile.getAbsolutePath
    val other = "completely different content about spark sql execution " +
      "plans and columnar parquet readers with adaptive query execution enabled"
    val b1 = Seq((1L, base), (2L, other)).toDF("doc_id", "text")
    val kept1 = graft.streaming.DedupStream
      .dedupMinhashIncrement(b1, "doc_id", "text", state)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept1 == Set(1L, 2L))
    // increment 2: a near-dup of doc 1, an exact re-send of doc 2's text,
    // a fresh doc, and an intra-increment near-dup pair
    val fresh = "numbers and letters mixed into a wholly novel document " +
      "with nothing shared against the earlier corpus increments at all"
    val b2 = Seq((10L, nearDup(base)), (11L, other),
      (12L, fresh), (13L, nearDup(fresh))).toDF("doc_id", "text")
    val kept2 = graft.streaming.DedupStream
      .dedupMinhashIncrement(b2, "doc_id", "text", state)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept2 == Set(12L), s"kept $kept2")
    // increment 3: the fresh doc's near-dup now hits HISTORY state
    val b3 = Seq((20L, nearDup(fresh))).toDF("doc_id", "text")
    val kept3 = graft.streaming.DedupStream
      .dedupMinhashIncrement(b3, "doc_id", "text", state)
      .count()
    assert(kept3 == 0L)
  }

  test("minhashDedupStream: foreachBatch wiring dedups across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val state = graft.ArtifactStore.scratchDir("graft_mhstate2").toFile.getAbsolutePath
    val ckpt = graft.ArtifactStore.scratchDir("graft_mhckpt").toFile.getAbsolutePath
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = graft.streaming.DedupStream.minhashDedupStream(
      stream, "doc_id", "text", state, ckpt) { kept =>
      out ++= kept.select(col("doc_id")).as[Long](org.apache.spark.sql.Encoders.scalaLong).collect()
    }
    try {
      mem.addData((1L, base))
      q.processAllAvailable()
      mem.addData((2L, nearDup(base)))
      q.processAllAvailable()
      assert(out.toSeq == Seq(1L))
    } finally q.stop()
  }
}

class MediaHeaderSpec extends SparkTestBase {
  import spark.implicits._
  import graft.operators.Multimodal

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(26)
    out.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    out.putInt(13).put("IHDR".getBytes).putInt(w).putInt(h)
    out.array()
  }

  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(32)
    out.put(0xff.toByte).put(0xd8.toByte)                       // SOI
    out.put(0xff.toByte).put(0xe0.toByte).putShort(4).putShort(0) // APP0 len 4
    out.put(0xff.toByte).put(0xc0.toByte).putShort(10)            // SOF0
    out.put(8.toByte).putShort(h.toShort).putShort(w.toShort)
    out.array()
  }

  test("PNG and JPEG header dims parse correctly") {
    assert(Multimodal.pngDims(pngBytes(640, 480)).contains((640, 480)))
    assert(Multimodal.jpegDims(jpegBytes(1024, 768)).contains((1024, 768)))
    assert(Multimodal.pngDims("notapng".getBytes).isEmpty)
    assert(Multimodal.jpegDims(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("sniffDims runs distributed over a media table") {
    val media = Seq(
      (1L, "image", pngBytes(320, 200)),
      (2L, "image", jpegBytes(64, 32)),
      (3L, "image", "garbage".getBytes)
    ).toDF("asset_id", "media_type", "payload")
    val dims = Multimodal.sniffDims(media)
      .select($"asset_id", $"sniffed_dims._1".as("w"), $"sniffed_dims._2".as("h"))
      .orderBy("asset_id").collect()
    assert(dims(0).getInt(1) == 320 && dims(0).getInt(2) == 200)
    assert(dims(1).getInt(1) == 64 && dims(1).getInt(2) == 32)
    assert(dims(2).isNullAt(1))
  }
}

class StreamStaticJoinSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  test("stream-static dimension join enriches events incrementally") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((0L, "bronze"), (1L, "gold")).toDF("user_id", "tier")
    val mem = MemoryStream[Long]
    val stream = mem.toDF().select(col("value").as("event_id"), (col("value") % 2).as("user_id"))
    val q = stream.join(dim, Seq("user_id"))
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    try {
      mem.addData(1L, 2L, 3L)
      q.processAllAvailable()
      val tiers = spark.sql("SELECT event_id, tier FROM enriched ORDER BY event_id")
        .as[(Long, String)].collect().toSeq
      assert(tiers == Seq((1L, "gold"), (2L, "bronze"), (3L, "gold")))
    } finally q.stop()
  }
}

class StreamStreamJoinSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  test("watermarked stream-stream interval join pairs click with impression") {
    implicit val sqlCtx = spark.sqlContext
    val impressions = MemoryStream[Long]
    val clicks = MemoryStream[Long]
    val imp = impressions.toDF()
      .select(col("value").as("ad_id"),
        timestamp_seconds(lit(1000) + col("value")).as("imp_ts"))
      .withWatermark("imp_ts", "10 seconds")
    val clk = clicks.toDF()
      .select(col("value").as("ad_id"),
        timestamp_seconds(lit(1005) + col("value")).as("clk_ts"))
      .withWatermark("clk_ts", "10 seconds")
    // click must land within 30s after its impression — the state-bounded
    // interval join Structured Streaming supports at scale
    val q = imp.as("imp").join(clk.as("clk"),
        expr("imp.ad_id = clk.ad_id AND clk_ts BETWEEN imp_ts AND imp_ts + INTERVAL 30 seconds"))
      .select(col("imp.ad_id").as("ad_id"))
      .writeStream.format("memory").queryName("attributed").outputMode("append").start()
    try {
      impressions.addData(1L, 2L, 3L)
      clicks.addData(1L, 3L)
      q.processAllAvailable()
      val hits = spark.sql("SELECT ad_id FROM attributed ORDER BY ad_id")
        .as[Long].collect().toSeq
      assert(hits == Seq(1L, 3L))
    } finally q.stop()
  }
}

class StreamUpsertSinkSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  test("micro-batch upsert publishes one atomic version per batch") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = graft.ArtifactStore.scratchDir("vts").toFile.getAbsolutePath
    val path = tmp + "/t"
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.EventsStream.upsertStream(
      mem.toDF().toDF("id", "v"), path, Seq("id"), tmp + "/ckpt")
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      assert(graft.sources.VersionedTable.read(spark, path).count() == 2)
      mem.addData((2L, "B!"), (3L, "c"))
      q.processAllAvailable()
      val out = graft.sources.VersionedTable.read(spark, path)
        .orderBy("id").as[(Long, String)].collect().toSeq
      assert(out == Seq((1L, "a"), (2L, "B!"), (3L, "c")))
      assert(graft.sources.VersionedTable.versions(spark, path) == Seq(1, 2))
      // time travel still sees the first batch unmodified
      assert(graft.sources.VersionedTable.readVersion(spark, path, 1).count() == 2)
    } finally q.stop()
  }
}

class NullSafetySpec extends SparkTestBase {
  import spark.implicits._
  import graft.operators._

  private lazy val withNulls = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),
    (3L, null.asInstanceOf[String]),
    (4L, "")
  ).toDF("doc_id", "text")

  test("dedup operators tolerate null and empty text") {
    assert(Dedup.minhashPairs(withNulls, "doc_id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(Dedup.simhashPairs(withNulls, "doc_id", "text").count() >= 1)
    assert(Dedup.ngramJaccardPairs(withNulls, "doc_id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(Dedup.exact(withNulls, "doc_id", Seq("text")).count() == 3) // null+""+1 dup removed
  }

  test("text analysis yields nulls (not errors) for null text") {
    val r = TextAnalysis.analyze(withNulls, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r(2).isNullAt(r(2).fieldIndex("n_tokens")))
    assert(r(3).getAs[Int]("n_tokens") == 0)
  }

  test("empty inputs flow through LSH and kNN") {
    val empty = withNulls.filter($"doc_id" < 0)
    assert(Dedup.minhashPairs(empty, "doc_id", "text").count() == 0)
    val emb = Tables.load(spark, sfDir, "embeddings")
    assert(Similarity.bruteForceKnn(emb, emb.filter($"vec_id" < 0), k = 3).count() == 0)
  }
}

class KMeansIvfSpec extends SparkTestBase {
  import spark.implicits._
  import graft.operators.Similarity

  test("k-means refined IVF keeps k centroids of the right dimension and improves recall") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val queries = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceKnn(emb, queries, k = 5)

    val (b0, c0) = Similarity.ivfBucketize(emb, numCentroids = 8)
    val naive = Similarity.ivfKnn(b0, c0, queries, k = 5, nprobe = 2)
    val (b1, c1) = Similarity.kmeansBucketize(emb, numCentroids = 8, iters = 3)
    assert(c1.count() == 8)
    assert(c1.head().getSeq[Float](1).length == 64)
    val refined = Similarity.ivfKnn(b1, c1, queries, k = 5, nprobe = 2)

    val rNaive = Similarity.recallAtK(naive, exact)
    val rRefined = Similarity.recallAtK(refined, exact)
    assert(rRefined >= 0.3, s"refined recall too low: $rRefined")
    assert(rRefined >= rNaive - 0.15, s"refined $rRefined much worse than naive $rNaive")
    // every vector still lands in exactly one bucket
    assert(b1.count() == emb.count())
    // the r15 perf shape is locked: assignment over driver-trained
    // centroids is MAP-ONLY — zero exchanges in the bucketed plan
    // (was crossJoin -> groupBy -> join, two exchanges per build)
    val plan = b1.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"kmeansBucketize assignment must stay map-only; plan:\n$plan")
    // and it agrees with the distributed max_by assignment semantics
    // ivfBucketize uses (same centroids -> same buckets): rebuild the
    // distributed pass against the TRAINED centroids via the stored
    // path's shared assignFixed shape and compare
    val viaStored = Similarity.assignDistributed(emb, c1)
    val a = b1.select($"cid", $"bucket").as[(Long, Long)].collect().toMap
    val d = viaStored.select($"cid", $"bucket").as[(Long, Long)].collect().toMap
    assert(a == d, "map-only fold diverges from distributed max_by assignment")
  }

  test("recallAtK runs as a single Spark job") {
    // materialize the kNN inputs locally first — bruteForceKnn's own
    // broadcast-build job would otherwise be charged to recallAtK
    val emb = Tables.load(spark, sfDir, "embeddings")
    val queries = emb.filter($"vec_id" < 5)
    val rows = Similarity.bruteForceKnn(emb, queries, k = 3)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSeq
    val exact = rows.toDF("qid", "cid")
    val approx = rows.toDF("qid", "cid")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    // AQE materializes each shuffle stage as its own job and a broadcast
    // build is a job too — pin both off so the job count equals the
    // ACTION count, which is the property under test (the old
    // implementation ran two separate count() actions)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val abt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sparkContext.addSparkListener(listener)
    try {
      val r = Similarity.recallAtK(approx, exact)
      // listener events are async; AQE may also split the pass — allow the
      // bus a moment, then assert on job-START count which is synchronous
      // with job submission (all jobs have started by the time the blocking
      // head() returned)
      Thread.sleep(500)
      assert(r == 1.0)
      assert(jobs.get() == 1,
        s"recallAtK should be one agg pass, saw ${jobs.get()} jobs")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", abt)
    }
  }
}

class RedactSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val rows = Seq(
    (1L, "reach me at jane.doe+spam@mail.example.org or 1-555-867-5309 thanks"),
    (2L, "server 192.168.0.1 billed card 4111111111111111 yesterday"),
    (3L, "nothing sensitive here at all"),
    (4L, null.asInstanceOf[String])
  ).toDF("id", "txt")

  test("redact replaces every rule's spans with typed placeholders") {
    val out = Redact.scrub(rows, Seq("txt")).orderBy($"id")
      .select($"txt").as[String].collect()
    assert(out(0) == "reach me at <EMAIL> or <PHONE> thanks")
    assert(out(1) == "server <IP> billed card <NUM> yesterday")
    assert(out(2) == "nothing sensitive here at all")
    assert(out(3) == null) // null text passes through as null, not an error
  }

  test("audit hit counts match the spans redacted") {
    val audited = Redact.scrub(rows, Seq("txt")).orderBy($"id")
      .select($"email_hits", $"phone_hits", $"ipv4_hits", $"long_digits_hits")
      .collect()
    assert(audited(0).toSeq == Seq(1, 1, 0, 0))
    assert(audited(1).toSeq == Seq(0, 0, 1, 1))
    assert(audited(2).toSeq == Seq(0, 0, 0, 0))
  }

  test("redaction plan is a single shuffle-free projection") {
    val plan = Redact.scrub(rows, Seq("txt")).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}

class HyperplaneLshSpec extends SparkTestBase {
  import spark.implicits._

  test("hyperplane LSH pairs: exact precision, bounded recall loss") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val e = emb.select($"vec_id".as("id"), $"embedding".as("vec"))
    val exact = e.as("a").crossJoin(e.as("b"))
      .filter($"a.id" < $"b.id")
      .select($"a.id".as("id_a"), $"b.id".as("id_b"),
        graft.functions.VectorFunctions.cosineNative($"a.vec", $"b.vec").as("sim"))
      .filter($"sim" >= 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

    val found = Similarity.hyperplaneNearDupPairs(emb, threshold = 0.4,
        bits = 4, tables = 12)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

    // precision is exact by construction (cosine-verified candidates)
    assert(found.subsetOf(exact), s"false positives: ${found.diff(exact).take(3)}")
    // blocking recall: 1-(1-p^4)^12 with p ≈ 0.63 at θ(0.4) → ~0.87 expected
    val recall = if (exact.isEmpty) 1.0 else found.size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall too low (${found.size}/${exact.size})")
  }

  test("signatures are deterministic across runs") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val r1 = Similarity.hyperplaneNearDupPairs(emb, 0.4, bits = 4, tables = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val r2 = Similarity.hyperplaneNearDupPairs(emb.repartition(7), 0.4, bits = 4, tables = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(r1 == r2)
  }
}

class PackShardsSpec extends SparkTestBase {
  import spark.implicits._

  test("shard assignment is stable under repartitioning and balanced") {
    val docs = Tables.load(spark, sfDir, "documents")
    val s1 = Sampling.packShards(docs, "doc_id", 8)
      .select($"doc_id", $"shard").as[(Long, Int)].collect().toMap
    val s2 = Sampling.packShards(docs.repartition(13), "doc_id", 8)
      .select($"doc_id", $"shard").as[(Long, Int)].collect().toMap
    assert(s1 == s2)
    assert(s1.values.forall(s => s >= 0 && s < 8))
    val sizes = s1.values.groupBy(identity).map(_._2.size)
    val n = s1.size.toDouble / 8
    assert(sizes.min > n * 0.5 && sizes.max < n * 1.5,
      s"shards unbalanced: ${sizes.toSeq.sorted}")
  }

  test("writeShards lays out shard=K dirs capped by maxRecordsPerFile") {
    val docs = Tables.load(spark, sfDir, "documents")
    val out = graft.ArtifactStore.scratchDir("graft-shards").toString
    Sampling.writeShards(docs, "doc_id", out, numShards = 4, maxRecordsPerFile = 50)
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    assert(back.select($"shard").distinct().count() == 4)
    // every file respects the cap: 500 docs / 4 shards / 50-row cap → ≥3 files/shard
    val files = new java.io.File(out).listFiles().filter(_.getName.startsWith("shard="))
      .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
    assert(files.forall(_._2 >= 2), files.mkString(", "))
  }
}

class DecontaminateSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._

  test("flags exactly the docs sharing an 8-gram with the benchmark") {
    val docs = Tables.load(spark, sfDir, "documents")
    val bench = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val flagged = graft.operators.Decontaminate
      .flagContaminated(corpus, bench, "doc_id", "text", n = 8)
    // a doc that IS in the benchmark can never be flagged (disjoint inputs)
    assert(flagged.join(bench, flagged("doc_id") === bench("doc_id")).count() == 0)
    // planting a benchmark document verbatim in the corpus must flag it
    val planted = corpus.unionByName(
      bench.limit(1).withColumn("doc_id", lit(999999L)))
    val f2 = graft.operators.Decontaminate
      .flagContaminated(planted, bench, "doc_id", "text", n = 8)
    assert(f2.filter(col("doc_id") === 999999L).count() == 1)
    // dropContaminated removes exactly the flagged set
    val kept = graft.operators.Decontaminate
      .dropContaminated(planted, bench, "doc_id", "text", n = 8)
    assert(kept.count() == planted.count() - f2.count())
  }

  test("benchmark gram set is broadcast, corpus is not shuffled before the match") {
    val docs = Tables.load(spark, sfDir, "documents")
    val flagged = graft.operators.Decontaminate.flagContaminated(
      docs.filter(col("doc_id") % 10 =!= 0), docs.filter(col("doc_id") % 10 === 0),
      "doc_id", "text", n = 8)
    val plan = flagged.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"),
      "benchmark side must broadcast")
  }
}

/** Token-window chunking (TextAnalysis.chunkByTokens): boundary arithmetic,
  * overlap stitching, degenerate docs, and the no-shuffle plan contract. */
class ChunkingSpec extends SparkTestBase {
  import spark.implicits._
  import graft.operators.TextAnalysis

  test("chunks cover all tokens with the declared overlap") {
    val text = (1 to 150).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val rows = TextAnalysis.chunkByTokens(df, "doc_id", "text", 64, 16)
      .orderBy("chunk_id").collect()
    // 150 tokens, step 48: chunks at 0,48,96 -> 3 chunks
    assert(rows.length == 3)
    assert(rows(0).getInt(3) == 64 && rows(1).getInt(3) == 64 && rows(2).getInt(3) == 54)
    val c0 = rows(0).getString(2).split(" ")
    val c1 = rows(1).getString(2).split(" ")
    // 16-token overlap: last 16 of chunk 0 == first 16 of chunk 1
    assert(c0.takeRight(16).toSeq == c1.take(16).toSeq)
    assert(c1.head == "w49", "chunk 1 starts at token step+1")
    // full coverage: union of chunks == original tokens
    assert((c0 ++ c1.drop(16) ++ rows(2).getString(2).split(" ").drop(16)).toSeq ==
      text.split(" ").toSeq)
  }

  test("short, exact-size, and empty docs each yield exactly one chunk") {
    val df = Seq((1L, "a b c"), (2L, (1 to 64).map("t" + _).mkString(" ")),
      (3L, ""), (4L, "   ")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkByTokens(df, "doc_id", "text", 64, 16)
      .orderBy("doc_id").collect()
    assert(out.length == 4)
    assert(out.map(_.getInt(1)).forall(_ == 0), "all single chunks")
    assert(out(0).getInt(3) == 3 && out(1).getInt(3) == 64)
    assert(out(2).getInt(3) == 0 && out(2).getString(2) == "")
    assert(out(3).getInt(3) == 0, "whitespace-only doc has zero tokens")
  }

  test("chunking plans as scan-project-generate with no exchange") {
    val df = Tables.load(spark, sfDir, "documents")
    val plan = TextAnalysis.chunkByTokens(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
    assert(plan.contains("Generate"), "posexplode plans as Generate")
  }
}

/** Repetition metrics (TextAnalysis.repetitionStats) — the published
  * Gopher/MassiveText quality-rule shapes over synthetic repetitive docs. */
class RepetitionSpec extends SparkTestBase {
  import spark.implicits._
  import graft.operators.TextAnalysis

  test("duplicate lines and dominant bigrams are measured per document") {
    val docs = Seq(
      (1L, "unique one\nunique two\nunique three"),              // no dups
      (2L, "same line\nsame line\nsame line\nother line"),       // 3/4 same
      (3L, "buy now buy now buy now buy now"),                   // dominant bigram
      (4L, "word"),                                              // < 2 tokens
      (5L, "")                                                   // empty
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r(0).getDouble(2) == 0.0, "doc 1 has no duplicate lines")
    assert(math.abs(r(1).getDouble(2) - 0.5) < 1e-12, "doc 2: 4 lines, 2 distinct -> 0.5")
    // "buy now buy now..." bigrams: 'buy now' x4, 'now buy' x3 -> 4/7
    assert(math.abs(r(2).getDouble(3) - 4.0 / 7.0) < 1e-12)
    assert(r(3).getDouble(3) == 0.0 && r(4).getDouble(3) == 0.0,
      "degenerate docs have zero bigram share")
    assert(r(4).getInt(1) == 0, "empty doc has zero lines")
  }
}

/** int8 embedding quantization: code bounds and the half-step error
  * contract of symmetric quantization. */
class QuantizeSpec extends SparkTestBase {
  import graft.operators.Similarity

  test("round trip stays within half a quantization step; codes bounded") {
    val emb = Tables.load(spark, sfDir, "embeddings").limit(200)
    val q = emb.select(col("vec_id"), col("embedding"),
      Similarity.quantizeInt8(col("embedding")).as("q"))
    val checked = q.select(
      array_max(transform(col("q.codes"), c => abs(c.cast("int")))).as("max_code"),
      col("q.scale").as("scale"),
      array_max(zip_with(col("embedding"), Similarity.dequantizeInt8(col("q")),
        (a, b) => abs(a.cast("double") - b.cast("double")))).as("err"))
    val bad = checked.filter(col("max_code") > 127 ||
      col("err") > col("scale") * 0.5 + 1e-9).count()
    assert(bad == 0, "every vector reconstructs within scale/2")
    val worst = checked.agg(max(col("err") / col("scale"))).head().getDouble(0)
    assert(worst <= 0.5 + 1e-9 && worst > 0.0)
  }
}

/** URL canonicalization + URL-key dedup (operators/UrlNormalize). */
class UrlNormalizeSpec extends SparkTestBase {
  import graft.operators.UrlNormalize.normalize

  test("canonical form: case, www, default port, fragment, tracking, order") {
    assert(normalize("HTTPS://WWW.Site.COM:443/a/b?utm_source=x&b=2&a=1#top")
      == "https://site.com/a/b?a=1&b=2")
    assert(normalize("http://site.com:80/") == "http://site.com/")
    assert(normalize("http://site.com:8080/x") == "http://site.com:8080/x")
    assert(normalize("https://site.com") == "https://site.com/")
    // percent-decoding stabilizes equivalent spellings
    assert(normalize("https://site.com/a%20b?k=v%2B1")
      == normalize("https://site.com/a b?k=v+1"))
    // value-less and empty params survive; tracking params die case-insensitively
    assert(normalize("https://s.com/p?flag&UTM_SOURCE=x") == "https://s.com/p?flag")
    // unparseable input passes through trimmed, never throws
    assert(normalize("not a url") == "not a url")
    assert(normalize(null) == null)
  }

  test("dedupByUrl keeps the smallest id per canonical key") {
    import spark.implicits._
    val df = Seq(
      (1L, "https://www.site.com/a?utm_source=x"),
      (2L, "https://site.com/a"),
      (3L, "http://site.com/a"),     // different scheme → different key
      (4L, "https://site.com/b")
    ).toDF("id", "url")
    val out = graft.operators.UrlNormalize.dedupByUrl(df, "url", "id")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(1L, 3L, 4L))
  }
}

/** Filtered kNN (pre-filter pushdown) + hybrid RRF retrieval. */
class HybridSearchSpec extends SparkTestBase {
  import spark.implicits._
  import graft.operators.{MatchText, Similarity}

  test("filteredKnn: predicate prunes before the similarity kernel") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val res = Similarity.filteredKnn(
      emb, col("label") === 1, emb.filter(col("vec_id") < 3), k = 3)
    // every returned neighbour satisfies the predicate
    val cids = res.select("cid").collect().map(_.getLong(0)).toSet
    val allowed = emb.filter(col("label") === 1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(cids.subsetOf(allowed))
    // the filter reaches the parquet scan as a pushed filter
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("label"), plan)
  }

  test("hybridSearch: RRF fuses ranks, keeps one-sided contributions") {
    val docs = Seq(
      (1L, "spark filter spark filter"),   // strong lexical
      (2L, "spark filter"),                // lexical
      (3L, "nothing relevant here"),       // vector-only candidate
      (4L, "unrelated words entirely")
    ).toDF("doc_id", "text")
    val vecs = Seq(
      (1L, Seq(0.0f, 1.0f)), (2L, Seq(0.5f, 0.5f)),
      (3L, Seq(1.0f, 0.0f)), (4L, Seq(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val idx = MatchText.buildIndex(docs, "doc_id", "text")
    val qv = Seq((0L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.hybridSearch(idx, vecs, "spark filter", qv,
      topN = 4, poolN = 3).collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // doc 3 is lexical-absent but vector-rank-1: present with NULL bm25
    assert(byId.contains(3L) && byId(3L).isNullAt(2))
    // doc 1 appears in both lists -> two-sided rrf exceeds any one-sided
    val rrf1 = byId(1L).getDouble(1)
    assert(rrf1 > byId(3L).getDouble(1))
    // the formula: doc1 lex_rank=1 (highest tf), vec side rank from cosine
    val lexRank1 = byId(1L).getInt(4)
    assert(lexRank1 == 1)
  }
}

/** Greedy next-fit sequence packing. */
class PackSequencesSpec extends SparkTestBase {
  import spark.implicits._
  import graft.operators.Sampling

  test("next-fit semantics: order preserved, overflow closes, oversized alone") {
    val chunks = Seq(
      // shard 0: 100+100 fit in 256, +100 overflows -> seq 1
      (0L, 1L, 100L), (0L, 2L, 100L), (0L, 3L, 100L),
      // oversized chunk occupies its own sequence, then packing resumes
      (0L, 4L, 500L), (0L, 5L, 50L),
      // shard 1 packs independently
      (1L, 6L, 200L), (1L, 7L, 200L)
    ).toDF("shard", "chunk_id", "toks")
    val out = Sampling.packSequences(chunks, "shard", "chunk_id", "toks", 256)
      .orderBy("shard", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (0L, 1L, 0L, 0L), (0L, 2L, 0L, 100L),   // fits at offset 100
      (0L, 3L, 1L, 0L),                        // overflow -> new sequence
      (0L, 4L, 2L, 0L),                        // oversized, alone
      (0L, 5L, 3L, 0L),                        // next chunk can't join it
      (1L, 6L, 0L, 0L), (1L, 7L, 1L, 0L)))     // shard 1 independent
  }

  test("token budget is never exceeded by multi-chunk sequences") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), (col("doc_id") % 4).as("shard"),
        ((col("n_chars") % 50) + 10).as("toks"))
    val packed = Sampling.packSequences(docs, "shard", "doc_id", "toks", 128)
    val over = packed.groupBy("shard", "seq_id")
      .agg(sum("toks").as("total"), count(lit(1)).as("n"))
      .filter(col("total") > 128 && col("n") > 1)
    assert(over.count() == 0)
  }
}

/** Repeated-paragraph boilerplate removal (Dedup.dedupParagraphs). */
class ParagraphDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("boilerplate drops everywhere, order kept, empty docs survive") {
    val docs = Seq(
      (1L, "NAV\nalpha beta\nbody one\nNAV"),     // NAV twice in one doc
      (2L, "NAV\nbody two"),
      (3L, "NAV"),                                  // all boilerplate
      (4L, "zeta\nalpha beta\nbody four")
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup.dedupParagraphs(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // NAV (df=3) and 'alpha beta' (df=2) are boilerplate; bodies unique
    assert(out(0) == ((1L, "body one", 1L)))
    assert(out(1) == ((2L, "body two", 1L)))
    assert(out(2) == ((3L, "", 0L)))
    assert(out(3) == ((4L, "zeta\nbody four", 2L)))
  }

  test("minDf boundary: a paragraph in minDf-1 docs is kept") {
    val docs = Seq(
      (1L, "shared\nu1"), (2L, "shared\nu2"), (3L, "u3")
    ).toDF("doc_id", "text")
    val strict = graft.operators.Dedup.dedupParagraphs(docs, "doc_id", "text", minDf = 3)
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(strict.toSeq == Seq("shared\nu1", "shared\nu2", "u3"))
    val loose = graft.operators.Dedup.dedupParagraphs(docs, "doc_id", "text", minDf = 2)
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(loose.toSeq == Seq("u1", "u2", "u3"))
  }
}

/** Temperature-flattened corpus mixing (Sampling.temperatureMix). */
class TemperatureMixSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = (
    (1 to 900).map(i => (i.toLong, "big")) ++
    (901 to 1000).map(i => (i.toLong, "small"))
  ).toDF("doc_id", "domain")

  test("alpha < 1 boosts the low-resource domain; rates cap at 1") {
    val mixed = graft.operators.Sampling
      .temperatureMix(corpus, "domain", alpha = 0.5, targetRows = 200)
      .groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // weights ∝ sqrt(n): big 30, small 10 -> shares 0.75/0.25 ->
    // rates big = 150/900 ≈ .167, small = 50/100 = .5
    val big = mixed.getOrElse("big", 0L).toDouble
    val small = mixed.getOrElse("small", 0L).toDouble
    assert(small / 100.0 > big / 900.0 * 2, s"big=$big small=$small")
    assert(math.abs(big + small - 200) < 40, s"total=${big + small}")

    // a target larger than the corpus caps every rate at 1 — no dup rows
    val all = graft.operators.Sampling
      .temperatureMix(corpus, "domain", alpha = 0.5, targetRows = 10000)
    assert(all.count() == 1000)
  }

  test("alpha = 1 keeps natural proportions") {
    val mixed = graft.operators.Sampling
      .temperatureMix(corpus, "domain", alpha = 1.0, targetRows = 500)
      .groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val big = mixed.getOrElse("big", 0L).toDouble
    val small = mixed.getOrElse("small", 0L).toDouble
    // natural shares: both domains sampled at the same ~0.5 rate
    assert(math.abs(big / 900.0 - small / 100.0) < 0.15, s"big=$big small=$small")
  }
}

/** Linear quality classifier (TextAnalysis.scoreLinear). */
class ScoreLinearSpec extends SparkTestBase {
  import spark.implicits._

  test("unigram scoring, bigram features, empty text, no shuffle") {
    val docs = Seq(
      (1L, "good good content"), (2L, "bad stuff"), (3L, "")
    ).toDF("doc_id", "text")
    val uni = graft.operators.TextAnalysis.scoreLinear(
        docs, "text", Map("good" -> 1.0, "bad" -> -2.0), bias = 0.0)
      .orderBy("doc_id").collect().map(_.getDouble(2))
    def sig(z: Double) = 1.0 / (1.0 + math.exp(-z))
    assert(math.abs(uni(0) - sig(2.0)) < 1e-12)
    assert(math.abs(uni(1) - sig(-2.0)) < 1e-12)
    assert(math.abs(uni(2) - sig(0.0)) < 1e-12) // empty text scores the bias

    val bi = graft.operators.TextAnalysis.scoreLinear(
        docs, "text", Map("good good" -> 3.0), bias = -1.0, n = 2)
      .orderBy("doc_id").collect().map(_.getDouble(2))
    assert(math.abs(bi(0) - sig(2.0)) < 1e-12)  // one 'good good' bigram
    assert(math.abs(bi(1) - sig(-1.0)) < 1e-12)
    assert(math.abs(bi(2) - sig(-1.0)) < 1e-12) // < n tokens -> bias only

    // the scorer is a pure projection: no exchange in the plan
    val plan = graft.operators.TextAnalysis.scoreLinear(
      docs, "text", Map("good" -> 1.0)).queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("exchange"), plan)
  }
}

/** Bigram-LM perplexity scoring (TextAnalysis.lmBigramScore — the CCNet
  * lineage quality filter, Wenzek et al. 2020, as a corpus-trained
  * add-one bigram model). */
class LmPerplexitySpec extends SparkTestBase {
  import spark.implicits._

  test("repetitive text scores lower NLL than unique-bigram text") {
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha beta alpha beta"), // one bigram pair, high count
      (2L, "quartz womble echo romeo tango kilo lima node"), // all bigrams unique
      (3L, "alpha beta alpha beta alpha beta alpha beta"), // duplicate of 1
      (4L, "x")                                             // <2 tokens: no row
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.lmBigramScore(docs)
      .orderBy($"doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L),
      "a one-token document has no bigrams and no row")
    assert(out.forall(_.getLong(1) == 7L), "7 bigrams in an 8-token doc")
    val nll = out.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(nll(1L) == nll(3L), "identical docs score identically")
    assert(nll(1L) < nll(2L),
      s"the corpus-frequent bigrams must be less surprising: $nll")
    // deterministic across re-evaluation (decimal-summed terms)
    val again = graft.operators.TextAnalysis.lmBigramScore(docs)
      .orderBy($"doc_id").collect()
    assert(again.map(_.getDouble(2)).toSeq == out.map(_.getDouble(2)).toSeq)
  }
}

/** DSIR-style importance scoring (TextAnalysis.dsirScore — Xie et al.
  * 2023's target/raw bag-of-words log-ratio, deterministic top-m form). */
class DsirSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("target-like raw docs outscore dissimilar ones; target rows excluded") {
    val docs = Seq(
      (1L, "alpha beta alpha beta gamma", "en"),   // target
      (2L, "alpha beta delta alpha beta", "en"),   // target
      (3L, "alpha beta gamma alpha", "de"),        // raw, target-like
      (4L, "zulu yankee xray whisky victor", "de") // raw, dissimilar
    ).toDF("doc_id", "text", "lang")
    val out = graft.operators.TextAnalysis
      .dsirScore(docs, col("lang") === "en")
      .orderBy($"doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(3L, 4L),
      "only raw-pool documents are scored")
    val w = out.map(r => r.getLong(0) ->
      r.getDecimal(2).doubleValue()).toMap
    assert(w(3L) > w(4L),
      s"the target-like document must carry the higher importance weight: $w")
    assert(out.find(_.getLong(0) == 3L).get.getLong(1) == 4L, "n_toks")
    // deterministic across re-evaluation (decimal-summed terms)
    val again = graft.operators.TextAnalysis
      .dsirScore(docs, col("lang") === "en").orderBy($"doc_id").collect()
    assert(again.map(_.getDecimal(2)).toSeq == out.map(_.getDecimal(2)).toSeq)
  }
}

/** SemDeDup (Similarity.semDedup — Abbas et al. 2023's cluster-blocked
  * semantic dedup with the keep-lowest-id pruning rule). */
class SemDedupSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("within-cluster near-dups prune to the lowest id; blocking holds") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)),    // cluster 0 anchor
      (2L, Seq(0.99f, 0.01f)),  // cos≈0.99995 vs id 1 -> removed
      (3L, Seq(0.0f, 1.0f)),    // cluster 1, kept
      (4L, Seq(-1.0f, 0.0f)),   // cluster 1 (dist² 2 vs 4); cos vs 3 = 0, kept
      (5L, Seq(0.6f, 0.8f)),    // cluster 1; cos vs id 3 = 0.8 < tau, kept
      (6L, Seq(0.5f, 0.5f))     // equidistant -> tie-break to cluster 0
    ).toDF("vec_id", "embedding")
    val cent = Seq((0, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f)))
      .toDF("cidx", "cvec")
    val out = graft.operators.Similarity.semDedup(corpus, cent, tau = 0.9)
      .orderBy($"vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    assert(out.toSeq == Seq(
      (1L, 0, true), (2L, 0, false), (3L, 1, true),
      (4L, 1, true), (5L, 1, true), (6L, 0, true)), out.toSeq)
  }

  test("cross-cluster near-dups are NOT pruned (blocking is the contract)") {
    // two antipodal centroids; the pair is near-identical but a fixture
    // centroid set that separates them must leave both alive — callers
    // control the blocking quality via the centroids they pass
    val corpus = Seq(
      (1L, Seq(1.0f, 0.05f)),
      (2L, Seq(1.0f, -0.05f))).toDF("vec_id", "embedding")
    val cent = Seq((0, Seq(1.0f, 0.05f)), (1, Seq(1.0f, -0.05f)))
      .toDF("cidx", "cvec")
    val out = graft.operators.Similarity.semDedup(corpus, cent, tau = 0.5)
      .orderBy($"vec_id").collect()
    assert(out.forall(_.getBoolean(2)), "separated clusters never pair")
    assert(out.map(_.getInt(1)).toSeq == Seq(0, 1))
  }
}
