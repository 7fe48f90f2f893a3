package graft

import org.apache.spark.sql.functions._

/** The r11 driver-gate red's fix, gated (VERDICT r11 ask #1): dynamic
  * oracles (q248 classifier weights, q240 centroids) must derive BOTH
  * engines' inputs from one persisted artifact — the entry writes it,
  * builds its Spark literals from the read-back strings, and the oracle
  * builder splices the same artifact at dump time. No `@volatile` state
  * crosses the entry→dump boundary, and a missing artifact degrades to
  * a LOUD DuckDB error() oracle instead of silently-wrong VALUES. */
class ArtifactOracleSpec extends SparkTestBase {

  test("q248: persisted weights == spliced oracle values, idempotent") {
    val fn = SparkEntry.queries("q248_quality_classifier")
    val out1 = fn(spark, sfDir).collect()
    val rows = ArtifactStore.readPairs("q248_weights")
      .getOrElse(fail("q248 weights artifact missing after the entry ran"))
    val bias = rows.find(_._1 == -1).map(_._2)
      .getOrElse(fail("no bias row (idx -1) in the q248 artifact"))
    val weights = rows.filter(_._1 >= 0)
    assert(weights.nonEmpty, "trained classifier has no nonzero weights")

    // every persisted weight string appears VERBATIM in the spliced
    // oracle (same strings → DuckDB casts the identical decimals)
    val oracle = SparkEntry.oracleSql("q248_quality_classifier")
    assert(oracle.contains(s"CAST('$bias' AS DECIMAL(28,12))"),
      "spliced oracle bias != persisted artifact bias")
    weights.foreach { case (i, v) =>
      assert(oracle.contains(s"($i, CAST('$v' AS DECIMAL(28,12)))"),
        s"weight bucket $i missing or different in the spliced oracle")
    }
    assert(!oracle.contains("error("), "oracle degraded despite artifact")

    // idempotence: a re-run retrains deterministically, overwrites the
    // artifact with identical content, and scores identically
    val out2 = fn(spark, sfDir).collect()
    assert(ArtifactStore.readPairs("q248_weights").get == rows,
      "artifact changed across identical re-runs")
    assert(out1.map(_.toString).toSeq == out2.map(_.toString).toSeq,
      "entry output changed across identical re-runs")

    // and the Spark-side scores really are the artifact's model: replay
    // the logit for one doc from the persisted strings alone
    val wMap = weights.toMap
    val doc = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).orderBy("doc_id").limit(1)
      .collect()(0)
    val toks = graft.operators.QualityClassifier
      .tokensJvm(Option(doc.getString(1)).getOrElse(""), 64)
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(t: String): Int = {
      val hex = md.digest(t.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 15)
      (java.lang.Long.parseLong(hex, 16) % 1024).toInt
    }
    val expect = toks.foldLeft(BigDecimal(bias)) { (acc, t) =>
      acc + BigDecimal(wMap.getOrElse(bucket(t), "0"))
    }.setScale(12)
    val got = out1.find(_.getLong(0) == doc.getLong(0)).get
      .getDecimal(1)
    assert(BigDecimal(got) == expect,
      s"score for doc ${doc.getLong(0)}: plan=$got artifact-replay=$expect")
  }

  test("q240: persisted centroids == spliced oracle values") {
    SparkEntry.queries("q240_semdedup_auto")(spark, sfDir).collect()
    val rows = ArtifactStore.readPairs("q240_centroids")
      .getOrElse(fail("q240 centroid artifact missing after the entry ran"))
    assert(rows.nonEmpty)
    val oracle = SparkEntry.oracleSql("q240_semdedup_auto")
    rows.foreach { case (i, v) =>
      assert(oracle.contains(s"($i, CAST('$v' AS DOUBLE[]))"),
        s"centroid $i missing or different in the spliced oracle")
    }
    assert(!oracle.contains("error("), "oracle degraded despite artifact")
  }

  test("missing artifact degrades to a loud error() oracle") {
    val o = ArtifactStore.missingOracle("nope_artifact", "q_nope")
    assert(o.startsWith("SELECT error("))
    assert(o.contains("nope_artifact") && o.contains("q_nope"))
  }
}
