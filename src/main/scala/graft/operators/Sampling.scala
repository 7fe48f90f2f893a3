package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training pipelines.
  *
  * RNG-based `df.sample` changes membership with partitioning, retries and
  * Spark versions; a 100 TB curation run needs the same document to land in
  * the same split every time. These operators key every decision on a
  * 64-bit hash of a stable id — no RNG, no state, embarrassingly parallel,
  * and a row's assignment is reproducible from its id alone.
  */
object Sampling {

  private def unit(idCol: Column): Column =
    (pmod(xxhash64(idCol), lit(1000000L)).cast("double") / 1000000.0)

  /** Add a `split` column assigning each row to one of `names` with the
    * given `weights` (normalized). Same id → same split, always. */
  def hashSplit(df: DataFrame, idCol: String,
                weights: Seq[Double], names: Seq[String]): DataFrame = {
    require(weights.length == names.length && weights.nonEmpty, "weights/names mismatch")
    require(weights.forall(_ > 0), "weights must be positive")
    val total = weights.sum
    val cuts = weights.scanLeft(0.0)(_ + _).tail.map(_ / total)
    val u = unit(col(idCol))
    val expr0 = names.zip(cuts).reverse
      .foldLeft(lit(names.last): Column) { case (acc, (name, cut)) =>
        when(u < cut, lit(name)).otherwise(acc)
      }
    df.withColumn("split", expr0)
  }

  /** Deterministic fraction sample: keeps ids whose hash falls below
    * `fraction` — stable under re-partitioning and retries, unlike
    * `df.sample`. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1)
    df.filter(unit(col(idCol)) < fraction)
  }

  /** Per-stratum deterministic sampling — the corpus-MIXING primitive
    * ("keep 100% of wikipedia, 8% of commoncrawl, 30% of code"): each
    * row's keep-decision is `unit_hash(id) < fraction(stratum)`, so
    * membership is reproducible from the id alone, rates are exact per
    * stratum in expectation, and the whole thing is a map-only filter —
    * no shuffle, no RNG, no state at 100 TB. Strata not in `fractions`
    * fall back to `default`. `unitOverride` lets a caller supply its own
    * [0,1) unit column (a replayable hash for cross-engine verification,
    * or a salted one for resample experiments). */
  def stratifiedSample(df: DataFrame, stratumCol: String,
                       fractions: Map[String, Double], default: Double,
                       idCol: String = "doc_id",
                       unitOverride: Option[Column] = None): DataFrame = {
    require(default >= 0 && default <= 1, "default fraction out of [0,1]")
    require(fractions.values.forall(f => f >= 0 && f <= 1),
      "stratum fraction out of [0,1]")
    val u = unitOverride.getOrElse(unit(col(idCol)))
    val fmap = typedLit(fractions)
    val frac = coalesce(fmap(col(stratumCol)), lit(default))
    df.filter(u < frac)
  }

  /** Temperature-flattened corpus mixing (the multilingual-LM sampling
    * rule: p_d ∝ (n_d/N)^alpha — mT5 §3.2, XLM-R): domain weights are
    * re-shaped with exponent `alpha` in (0,1] — alpha=1 keeps natural
    * proportions, alpha→0 approaches uniform, boosting low-resource
    * domains — and each domain is hash-sampled at the rate realizing its
    * re-weighted share of `targetRows`. Rates cap at 1: upsampling is a
    * data-loader concern, so over-asked domains under-fill the target
    * deterministically instead of duplicating rows. Domains must be
    * non-null.
    *
    * Scale shape: one map-side-combined groupBy for the domain sizes
    * (result rows = #domains, collected as metadata) and then the same
    * map-only deterministic id-hash filter as [[stratifiedSample]] —
    * membership is reproducible from the id alone, no shuffle of data. */
  def temperatureMix(df: DataFrame, domainCol: String, alpha: Double,
                     targetRows: Long, idCol: String = "doc_id",
                     unitOverride: Option[Column] = None): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0,1]")
    require(targetRows > 0, "targetRows must be positive")
    val sizes = df.groupBy(col(domainCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    val weights = sizes.map { case (d, n) => d -> math.pow(n.toDouble, alpha) }
    val wSum = weights.values.sum
    val rates = weights.map { case (d, w) =>
      d -> math.min(1.0, targetRows * (w / wSum) / sizes(d))
    }
    stratifiedSample(df, domainCol, rates, default = 0.0, idCol, unitOverride)
  }

  /** Deterministic global shuffle + shard assignment for training output.
    *
    * A training run wants (a) fixed shard membership — restarts and
    * different cluster sizes must produce the same shards, (b) rows shuffled
    * within a shard (no residual corpus order for the data loader to learn),
    * (c) balanced shard sizes. All three come from id hashes, no RNG:
    * `shard = xxhash64(id) mod n`, intra-shard order = an independent
    * second hash. One shuffle (the repartition); the sort is per-partition.
    */
  def packShards(df: DataFrame, idCol: String, numShards: Int): DataFrame = {
    require(numShards > 0)
    df.withColumn("shard",
        pmod(xxhash64(col(idCol)), lit(numShards.toLong)).cast("int"))
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(xxhash64(lit(1L), col(idCol)), col(idCol))
  }

  /** Write `df` as `numShards` training shards under `path`
    * (`shard=K/part-*.parquet`), each file capped at `maxRecordsPerFile`
    * rows so data-loader workers get uniformly sized units. */
  def writeShards(df: DataFrame, idCol: String, path: String,
                  numShards: Int, maxRecordsPerFile: Long = 100000L): Unit =
    packShards(df, idCol, numShards)
      .write.partitionBy("shard")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite").parquet(path)

  /** Greedy next-fit SEQUENCE PACKING — the training-batch prep step that
    * concatenates chunks into fixed-budget sequences (≤ `maxTokens`) so a
    * data loader wastes no context on padding. Deterministic contract: a
    * chunk that would overflow the open sequence CLOSES it and opens the
    * next (next-fit, not best-fit — best-fit's packing depends on the
    * whole group and reorders chunks; next-fit preserves chunk order,
    * which training pipelines want for document contiguity, and replays
    * exactly in SQL as a linear recurrence).
    *
    * Packing runs independently per `groupCol` (a shard): state is one
    * (seq, offset) pair per group, groups parallelize, and the only wide
    * operation is the one groupBy shuffle of narrow (id, tokens) rows —
    * chunk text does NOT flow through the packer; join the output ids
    * back to the text afterwards. Per-group chunk counts must fit a
    * collected list (shards are loader-sized by construction; packShards
    * upstream bounds them).
    *
    * Output: (groupCol, idCol, tokensCol, seq_id, seq_offset) — seq_id
    * counts sequences within the group, seq_offset is the chunk's token
    * offset inside its sequence. An oversized chunk (tokens > maxTokens)
    * occupies a sequence alone rather than being dropped — the caller
    * decides whether to truncate. */
  def packSequences(df: DataFrame, groupCol: String, idCol: String,
                    tokensCol: String, maxTokens: Int): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    val packUdf = udf((rows: Seq[org.apache.spark.sql.Row]) => {
      val sorted = rows.sortBy(_.getLong(0))
      var seq = 0L; var used = 0L
      sorted.map { r =>
        val id = r.getLong(0); val t = r.getLong(1)
        if (used > 0 && used + t > maxTokens) { seq += 1; used = 0 }
        val off = used
        used += t
        (id, t, seq, off)
      }
    })
    df.select(col(groupCol).as("grp"),
        col(idCol).cast("long").as("id"), col(tokensCol).cast("long").as("t"))
      .groupBy(col("grp"))
      .agg(collect_list(struct(col("id"), col("t"))).as("chunks"))
      .select(col("grp"), explode(packUdf(col("chunks"))).as("p"))
      .select(col("grp").as(groupCol), col("p._1").as(idCol),
        col("p._2").as(tokensCol), col("p._3").as("seq_id"),
        col("p._4").as("seq_offset"))
  }
}
