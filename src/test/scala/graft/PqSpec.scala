package graft

import org.apache.spark.sql.functions._

/** Product quantization (operators/Similarity.scala — Jégou/Douze/Schmid,
  * TPAMI 2011): codebook training determinism, encode shape, and
  * ADC + exact-re-rank search quality on a separable corpus. */
class PqSpec extends SparkTestBase {

  test("PQ trains deterministically; ADC+rerank finds exact neighbors") {
    import spark.implicits._
    // three well-separated clusters in 8 dims, seeded jitter
    val rnd = new scala.util.Random(7)
    val base = Seq(
      Array.fill(8)(1.0f),
      Array.fill(8)(-1.0f),
      Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f))
    val rows = (0 until 120).map { i =>
      val b = base(i % 3)
      (i.toLong, b.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val cb = operators.Similarity.pqTrain(df, m = 4, ksub = 8)
    assert(cb.length == 4 && cb(0).length <= 8 && cb(0)(0).length == 2)
    // pinned sample + init + iteration count → identical retrain
    val cb2 = operators.Similarity.pqTrain(df, m = 4, ksub = 8)
    assert(cb.flatten.flatten.toSeq == cb2.flatten.flatten.toSeq,
      "retraining must reproduce the codebooks bit-for-bit")
    val codes = operators.Similarity.pqEncode(df, cb)
    assert(codes.count() == 120)
    assert(codes.schema("codes").dataType.simpleString == "array<int>")

    val q = df.filter(col("vec_id") === 0)
    val hits = operators.Similarity.pqKnn(codes, cb, df, q, k = 5).collect()
    assert(hits.length == 5)
    assert(hits.map(_.getInt(3)).toSeq == (1 to 5), "ranks are 1..k")
    assert(hits.head.getLong(1) == 0L && hits.head.getDouble(2) == 0.0,
      "the query finds itself at rank 1 with exact distance 0")
    // every neighbor comes from the query's own cluster (ids ≡ 0 mod 3)
    assert(hits.forall(_.getLong(1) % 3 == 0),
      s"cross-cluster neighbor: ${hits.map(_.getLong(1)).mkString(",")}")
  }

  test("residual IVFADC: codes quantize v − centroid; search stays exact " +
       "on a separable corpus and reproduces deterministically") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val base = Seq(
      Array.fill(8)(2.0f),
      Array.fill(8)(-2.0f),
      Array.tabulate(8)(i => if (i % 2 == 0) 2.0f else -2.0f))
    val rows = (0 until 120).map { i =>
      val b = base(i % 3)
      (i.toLong, b.map(x => x + (rnd.nextFloat() - 0.5f) * 0.2f).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val (bucketed, cents) = operators.Similarity
      .kmeansBucketize(df, numCentroids = 3, iters = 2)
    // residuals: r + centroid(bucket) reconstructs the vector exactly
    // (float subtraction is exact to reassemble within 1 ulp — check a
    // loose bound; the POINT is the residual is centered near zero)
    val res = operators.Similarity.pqResiduals(bucketed, cents)
    val maxAbs = res.select(
      max(expr("aggregate(rvec, CAST(0.0 AS DOUBLE), " +
        "(a, x) -> greatest(a, abs(CAST(x AS DOUBLE))))"))).head.getDouble(0)
    assert(maxAbs < 1.0,
      s"residuals of a tight cluster must be small, got $maxAbs")

    val cb = operators.Similarity.pqTrainResidual(bucketed, cents, m = 4, ksub = 8)
    val cb2 = operators.Similarity.pqTrainResidual(bucketed, cents, m = 4, ksub = 8)
    assert(cb.flatten.flatten.toSeq == cb2.flatten.flatten.toSeq,
      "residual retrain must reproduce the codebooks bit-for-bit")
    val codes = operators.Similarity.ivfPqIndexResidual(bucketed, cents, cb)
    assert(codes.count() == 120)

    val q = df.filter(col("vec_id") < 2)
    val hits = operators.Similarity.ivfPqKnnStoredResidual(
      codes, cents, cb, df, q, k = 5, nprobe = 1).collect()
    assert(hits.length == 10, "5 hits per query")
    val byQ = hits.groupBy(_.getLong(0))
    byQ.foreach { case (qid, hs) =>
      val top = hs.minBy(_.getInt(3))
      assert(top.getLong(1) == qid && top.getDouble(2) == 1.0,
        s"query $qid must find itself at rank 1 (sim 1.0)")
      assert(hs.forall(_.getLong(1) % 3 == qid % 3),
        s"cross-cluster neighbor for $qid: ${hs.map(_.getLong(1)).mkString(",")}")
    }

    // delta maintenance: drop one id, add a shifted copy — the patched
    // index serves it from the fixed centroids/codebooks
    val added = Seq((200L, base(0).map(x => x + 0.01f).toSeq))
      .toDF("vec_id", "embedding")
    val patched = operators.Similarity.updatePqIndexResidual(
      codes, cents, cb, Seq(0L).toDF("vec_id"), added)
    assert(patched.filter(col("cid") === 0L).count() == 0)
    assert(patched.count() == 120)
    val q2 = added
    val hits2 = operators.Similarity.ivfPqKnnStoredResidual(
      patched, cents, cb, df.filter(col("vec_id") =!= 0L).unionByName(added),
      q2, k = 3, nprobe = 1).collect()
    assert(hits2.nonEmpty && hits2.minBy(_.getInt(3)).getLong(1) == 200L,
      "the delta-added row is served and finds itself first")
  }
}
