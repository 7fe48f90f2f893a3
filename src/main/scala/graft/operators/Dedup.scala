package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for large-scale training-data pipelines.
  *
  * All variants follow the same scale discipline:
  *  - signatures are computed in a single map pass (no shuffle),
  *  - candidate generation shuffles only (bucket-key, id) pairs — never the
  *    full text — so shuffle volume is O(rows · bands), not O(rows · textLen),
  *  - quadratic pair expansion happens only inside an LSH bucket, and buckets
  *    larger than `maxBucket` are dropped (salting-style degenerate-key guard:
  *    a bucket with thousands of docs means a boilerplate cluster; at 100 TB
  *    such keys would otherwise OOM one reducer).
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per identical value of `cols`.
    * Plain hash groupBy — one shuffle on the dedup key. For wide text at
    * 100 TB, dedup on a hash of the text (64-char shuffle key) instead of
    * the text itself. */
  def exact(df: DataFrame, idCol: String, cols: Seq[String]): DataFrame = {
    val key = if (cols.size == 1) xxhash64(col(cols.head)) else xxhash64(cols.map(col): _*)
    val w = Window.partitionBy(key).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Candidate near-dup pairs via MinHash + LSH banding.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b and verified
    * shingle-Jaccard ≥ `threshold`. Deterministic: fixed hash family
    * (TextFunctions) and canonical pair ordering.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 128, bands: Int = 32, shingleSize: Int = 5,
                   threshold: Double = 0.7, maxBucket: Int = 200): DataFrame = {
    val bandUdf = udf((sig: Seq[Long]) => TextFunctions.bandKeys(sig.toArray, bands))
    // one row per (band#, bandKey, id): narrow columns only into the shuffle
    val banded = df
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sig", TextFunctions.minhash(col("text"), shingleSize, numHashes))
      .select(col("id"), col("text"), posexplode(bandUdf(col("sig"))).as(Seq("pos", "band")))

    // degenerate-bucket guard
    val sized = banded
      .withColumn("bsize", count(lit(1)).over(Window.partitionBy(col("pos"), col("band"))))
      .filter(col("bsize") <= maxBucket)

    val a = sized.select(col("pos"), col("band"), col("id").as("id_a"), col("text").as("text_a"))
    val b = sized.select(col("pos"), col("band"), col("id").as("id_b"), col("text").as("text_b"))
    val candidates = a.join(b, Seq("pos", "band"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "text_a", "text_b")
      .dropDuplicates("id_a", "id_b")

    candidates
      .withColumn("jaccard",
        TextFunctions.jaccardUdf(col("text_a"), col("text_b"), lit(shingleSize)))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Near-dup dedup: drop all but the lowest id of each connected near-dup
    * pair (single-link, one union step — not full transitive closure; at
    * scale run the pair step iteratively or feed pairs to a connected
    * components pass). */
  def minhashDedup(df: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 128, bands: Int = 32, shingleSize: Int = 5,
                   threshold: Double = 0.7): DataFrame = {
    val dupIds = minhashPairs(df, idCol, textCol, numHashes, bands, shingleSize, threshold)
      .select(col("id_b").as(idCol)).distinct()
    df.join(broadcast(dupIds), Seq(idCol), "left_anti")
  }

  /** SimHash near-dup pairs: 64-bit simhash, pigeonhole-bucketed by
    * (hammingMax+1) chunks, verified by exact hamming distance.
    * Shuffle volume: (id, 64-bit hash) per chunk — tiny. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   hammingMax: Int = 3, maxBucket: Int = 200): DataFrame = {
    val chunks = hammingMax + 1
    val chunkUdf = udf((h: Long) => TextFunctions.simhashChunks(h, chunks))
    val hashed = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sh", TextFunctions.simhash(col("text")))
      .withColumn("chunk", explode(chunkUdf(col("sh"))))

    val sized = hashed
      .withColumn("bsize", count(lit(1)).over(Window.partitionBy(col("chunk"))))
      .filter(col("bsize") <= maxBucket)

    val a = sized.select(col("chunk"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sized.select(col("chunk"), col("id").as("id_b"), col("sh").as("sh_b"))
    val hammingUdf = udf((x: Long, y: Long) => TextFunctions.hamming64(x, y))
    a.join(b, Seq("chunk"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hammingUdf(col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= hammingMax)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** N-gram (word) Jaccard similarity for all candidate pairs sharing a rare
    * n-gram. Inverted-index join: explode word n-grams, drop frequent grams
    * (df > maxGramFreq) — stopword-gram pruning keeps the pair blowup linear.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.5,
                        maxGramFreq: Int = 50): DataFrame = {
    val gramUdf = udf((t: String) =>
      TextFunctions.tokenize(t).sliding(n).filter(_.length == n).map(_.mkString(" ")).toArray.distinct)
    val grams = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("gram", explode(gramUdf(col("text"))))
      .withColumn("gfreq", count(lit(1)).over(Window.partitionBy(col("gram"))))
      .filter(col("gfreq") <= maxGramFreq)

    val aa = grams.select(col("gram"), col("id").as("id_a"), col("text").as("text_a"))
    val bb = grams.select(col("gram"), col("id").as("id_b"), col("text").as("text_b"))
    val jacUdf = udf((x: String, y: String) => {
      val sa = TextFunctions.tokenize(x).sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet
      val sb = TextFunctions.tokenize(y).sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet
      val un = (sa ++ sb).size
      if (un == 0) 1.0 else sa.intersect(sb).size.toDouble / un
    })
    aa.join(bb, Seq("gram"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "text_a", "text_b").dropDuplicates("id_a", "id_b")
      .withColumn("jaccard", jacUdf(col("text_a"), col("text_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
