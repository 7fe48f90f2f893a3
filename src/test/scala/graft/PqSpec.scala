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
}
