package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, SpatialJoin}

/** No-silent-caps telemetry (VERDICT r11 ask #6): every bounded pair
  * stage must SAY how much its cap dropped. `coBucketedPairsAudited`
  * reports (dropped_buckets, dropped_pairs); `radiusJoinAudited`
  * reports the grid's two coverage-caveat zones (seam_pts, polar_pts).
  * On the fixtures everything is zero — which is exactly what the q62 /
  * q112 hash-gated facts pin — and on synthetic over-cap data the
  * counts are the closed-form values. */
class CapAuditSpec extends SparkTestBase {

  test("minhash cap audit: zero drops on the fixture") {
    val d = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val cp = Dedup.minhashPairsAudited(d, "doc_id", "text",
      numHashes = 128, bands = 16, threshold = 0.8)
    val r = cp.drops.collect()(0)
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L,
      s"fixture unexpectedly hit the cap: $r")
  }

  test("an over-cap bucket reports its exact forfeited pair count") {
    import spark.implicits._
    // one hot key with 7 distinct ids (> cap 5) → 7·6/2 = 21 pairs
    // dropped from ONE bucket; a cold key with 3 ids survives (3 pairs)
    val keyed = ((1L to 7L).map(i => (100L, i)) ++
        Seq((200L, 11L), (200L, 12L), (200L, 13L)))
      .toDF("key", "id")
    val cp = Dedup.coBucketedPairsAudited(keyed, maxBucket = 5)
    assert(cp.pairs.count() == 3L)
    val r = cp.drops.collect()(0)
    assert(r.getLong(0) == 1L, s"dropped_buckets: $r")
    assert(r.getLong(1) == 21L, s"dropped_pairs: $r")
    // duplicate id entries inflate the SIZE filter but not the distinct
    // pair math: 6 entries of 4 distinct ids over cap 5 → 4·3/2 = 6
    val dup = Seq((300L, 1L), (300L, 1L), (300L, 2L), (300L, 2L),
      (300L, 3L), (300L, 4L)).toDF("key", "id")
    val r2 = Dedup.coBucketedPairsAudited(dup, maxBucket = 5)
      .drops.collect()(0)
    assert(r2.getLong(0) == 1L && r2.getLong(1) == 6L, s"dup bucket: $r2")
    // and the unaudited entry point still returns the identical pairs
    assert(Dedup.coBucketedPairs(keyed, 5).count() == 3L)
  }

  test("q62's drops fact reuses the band-bucket shuffle (one exchange)") {
    val df = SparkEntry.queries("q62_dedup_minhash")(spark, sfDir)
    df.collect() // let AQE finalize so reuse is visible in the plan
    // inspect the FINAL plan only (AQE appends the pre-reuse initial
    // plan below it, which would double-count exchanges)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the drops fact's bucket aggregation must REUSE the pairs branch's
    // band-key shuffle, not re-shuffle the signature stage
    assert(plan.contains("ReusedExchange"),
      "expected the drops branch to reuse the band-key exchange:\n" +
        plan.linesIterator.take(60).mkString("\n"))
    // count per LINE: a ReusedExchange line repeats the original
    // exchange's descriptor text, which must not count as a write
    val fresh = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(key") &&
        !l.contains("ReusedExchange"))
    assert(fresh == 1, s"band-key shuffle written $fresh times:\n$plan")
  }

  test("radius-join grid audit: zero caveat-zone points on the fixture") {
    val cust = Tables.load(spark, sfDir, "customer").select(col("c_custkey"),
      array((col("c_custkey") % 180 - 90).cast("double") + 0.5,
        (col("c_custkey") % 120 - 60).cast("double") + 0.5).as("pt"))
    val cust2 = cust.select(col("c_custkey").as("k2"), col("pt"))
    val cp = SpatialJoin.radiusJoinAudited(cust, cust2, radiusKm = 1000.0,
      "c_custkey", "pt", "k2", "pt", cellDeg = 18.1)
    val r = cp.drops.collect()(0)
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L,
      s"fixture points in caveat zones: $r")
  }

  test("radius-join grid audit counts seam and polar points") {
    import spark.implicits._
    val pts = Seq(
      (1L, 179.5, 10.0),  // antimeridian seam (|lon| ≥ 180 − cell)
      (2L, -179.9, 0.0),  // seam, west side
      (3L, 10.0, 85.0),   // polar cap
      (4L, 10.0, 10.0))   // clean
      .toDF("id", "lon", "lat")
      .select(col("id"), array(col("lon"), col("lat")).as("pt"))
    val pts2 = pts.select(col("id").as("id2"), col("pt"))
    val cp = SpatialJoin.radiusJoinAudited(pts, pts2, radiusKm = 100.0,
      "id", "pt", "id2", "pt", cellDeg = 1.0)
    val r = cp.drops.collect()(0)
    // both sides of the join contribute (a ∪ b = 2× the 4 points)
    assert(r.getLong(0) == 4L, s"seam_pts: $r")
    assert(r.getLong(1) == 2L, s"polar_pts: $r")
  }
}
