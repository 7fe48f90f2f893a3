package graft

import org.apache.spark.sql.functions._

/** Dynamic-oracle hygiene, gated:
  *  - q248 is PINNED since r13 (VERDICT r12 ask #1): its committed
  *    constants must be bit-for-bit reproducible by retraining on the
  *    sf0.01 fixture (fixture drift fails HERE — a deliberate
  *    regeneration point via graft.tools.PinQ248 — never the driver's
  *    gate), the static oracle must splice exactly those constants, and
  *    the entry's scores must replay from them.
  *  - q240 stays dynamic (entry-written ArtifactStore artifact spliced
  *    at dump time), so its persisted == spliced invariant stays gated,
  *    and the store's sf_dir staleness guard (VERDICT r12 ask #2) must
  *    turn a cross-fixture stale artifact into a LOUD degrade. */
class ArtifactOracleSpec extends SparkTestBase {

  test("q248: retraining on sf0.01 reproduces the PINNED constants") {
    val pinDir = operators.Q248PinnedModel.trainedOn
    assert(new java.io.File(pinDir).isDirectory,
      s"pin fixture $pinDir missing - cannot verify the committed model")
    val docs = Tables.load(spark, pinDir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
      .withColumn("is_en", col("lang") === "en")
    val (w, b) = operators.QualityClassifier.train(docs, "is_en")
    def dec(x: Double): String =
      operators.QualityClassifier.dec(x).bigDecimal.toPlainString
    val retrained = ((-1, dec(b)) +:
      w.zipWithIndex.collect { case (x, i) if x != 0.0 => (i, dec(x)) }
        .toSeq).sortBy(_._1)
    assert(retrained == operators.Q248PinnedModel.pairs.sortBy(_._1),
      "sf0.01 retrain != committed Q248PinnedModel - the fixture " +
        "changed; regenerate deliberately with graft.tools.PinQ248")
  }

  test("q248: static oracle splices the pinned constants verbatim") {
    val m = operators.Q248PinnedModel
    // r14: the splice is INTEGER-EXACT — each 12-dp pin scales ×10¹²
    // into the BIGINT micro-unit both engines sum (VERDICT r13 ask #1)
    def micros(v: String): Long =
      new java.math.BigDecimal(v).movePointRight(12).longValueExact
    val oracle = SparkEntry.oracleSql("q248_quality_classifier")
    assert(oracle.contains(s"CAST(${micros(m.bias)} AS BIGINT)"),
      "oracle bias != pinned bias micro-units")
    m.pairs.filter(_._1 >= 0).foreach { case (i, v) =>
      assert(oracle.contains(s"($i, CAST(${micros(v)} AS BIGINT))"),
        s"weight bucket $i missing or different in the static oracle")
    }
    assert(!oracle.toUpperCase.contains("DECIMAL"),
      "q248 oracle must stay integer-exact - no DECIMAL in the hashed row")
    assert(!oracle.contains("error("), "static oracle must never degrade")
    // and it IS static: two reads of the oracle map splice identically
    assert(oracle == SparkEntry.oracleSql("q248_quality_classifier"))
  }

  test("q248: entry scores replay from the pinned strings alone") {
    val fn = SparkEntry.queries("q248_quality_classifier")
    val out1 = fn(spark, sfDir).collect()
    val out2 = fn(spark, sfDir).collect()
    assert(out1.map(_.toString).toSeq == out2.map(_.toString).toSeq,
      "entry output changed across identical re-runs")
    val m = operators.Q248PinnedModel
    val doc = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).orderBy("doc_id").limit(1)
      .collect()(0)
    val toks = operators.QualityClassifier
      .tokensJvm(Option(doc.getString(1)).getOrElse(""), 64)
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(t: String): Int = {
      val hex = md.digest(t.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 15)
      (java.lang.Long.parseLong(hex, 16) % 1024).toInt
    }
    def micros(v: String): Long =
      new java.math.BigDecimal(v).movePointRight(12).longValueExact
    val expect = toks.foldLeft(micros(m.bias)) { (acc, t) =>
      acc + micros(m.weights.getOrElse(bucket(t), "0"))
    }
    val got = out1.find(_.getLong(0) == doc.getLong(0)).get.getLong(1)
    assert(got == expect,
      s"score for doc ${doc.getLong(0)}: plan=$got pinned-replay=$expect")
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

  test("stale artifact (wrong sf_dir) degrades to the loud error oracle") {
    val name = "stale_guard_probe"
    ArtifactStore.writePairs(spark, name, Seq((0, "1.5"), (1, "2.5")),
      sfDir = "/data/dirA")
    // matching expectation reads back; mismatched expectation is None
    assert(ArtifactStore.readPairs(name, "/data/dirA")
      .contains(Seq((0, "1.5"), (1, "2.5"))))
    assert(ArtifactStore.readPairs(name, "/data/dirB").isEmpty,
      "a stale artifact from a different fixture must NOT splice")
    // the oracle-facing read honors the invocation-level expectation
    // property (what Verify sets), so a Verify dump against dirB would
    // degrade to missingOracle's error() text
    val prev = System.getProperty(ArtifactStore.ExpectSfDirProperty)
    try {
      System.setProperty(ArtifactStore.ExpectSfDirProperty, "/data/dirB")
      assert(ArtifactStore.readPairsForOracle(name).isEmpty)
      val degraded = ArtifactStore.readPairsForOracle(name)
        .map(_ => "SELECT 1")
        .getOrElse(ArtifactStore.missingOracle(name, "q_stale_probe"))
      assert(degraded.startsWith("SELECT error("))
      assert(degraded.contains(name))
      System.setProperty(ArtifactStore.ExpectSfDirProperty, "/data/dirA")
      assert(ArtifactStore.readPairsForOracle(name).nonEmpty)
    } finally {
      if (prev == null)
        System.clearProperty(ArtifactStore.ExpectSfDirProperty)
      else System.setProperty(ArtifactStore.ExpectSfDirProperty, prev)
    }
  }

  test("missing artifact degrades to a loud error() oracle") {
    val o = ArtifactStore.missingOracle("nope_artifact", "q_nope")
    assert(o.startsWith("SELECT error("))
    assert(o.contains("nope_artifact") && o.contains("q_nope"))
  }
}
