package graft

/** Session temp-dir hygiene, CI-gated (VERDICT r12 ask #7): every
  * scratch location graft creates must live under ArtifactStore's two
  * exit-cleaned roots, so a long session (or a 252-entry sweep) leaves
  * nothing in /tmp when the JVM exits.
  *
  * Three layers:
  *  1. source audit — `Files.createTempDirectory` may appear ONLY in
  *     ArtifactStore.scala (the managed roots + the scratchDir API);
  *     any new call site must route through `ArtifactStore.scratchDir`;
  *  2. API shape — scratchDir always lands under the one shared,
  *     shutdown-hooked scratch root;
  *  3. runtime — after running a scratch-using catalog entry, no
  *     `/tmp/graft_*` entry created since this JVM started exists
  *     outside this JVM's managed roots (entries created earlier may
  *     belong to OTHER live graft processes and are not ours to judge;
  *     /tmp/graft_sf1 is the deliberate persistent sf1 fixture cache).
  */
class TempHygieneSpec extends SparkTestBase {

  test("source audit: createTempDirectory only in ArtifactStore") {
    val offenders = collection.mutable.ArrayBuffer[String]()
    def walk(f: java.io.File): Unit =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array()).foreach(walk)
      else if (f.getName.endsWith(".scala") &&
          java.nio.file.Files.readString(f.toPath)
            .contains("createTempDirectory(") &&
          f.getName != "ArtifactStore.scala")
        offenders += f.getPath
    walk(new java.io.File("src/main/scala"))
    assert(offenders.isEmpty,
      s"unmanaged temp-dir call sites (route through ArtifactStore" +
        s".scratchDir): ${offenders.mkString(", ")}")
  }

  test("scratchDir lands under the shared exit-cleaned root") {
    val a = ArtifactStore.scratchDir("hygiene_a")
    val b = ArtifactStore.scratchDir("hygiene_b")
    assert(a.getParent == b.getParent, "scratch dirs must share one root")
    assert(a.getParent.getFileName.toString.startsWith("graft_scratch"),
      s"unexpected scratch root: ${a.getParent}")
  }

  test("a sweep entry leaves no /tmp/graft_* outside the managed roots") {
    val jvmStart = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getStartTime
    // q247 exercises the scratch path (router root + JS UDF registry)
    SparkEntry.queries("q247_js_closures")(spark, sfDir).collect()
    val managed = Set(
      new java.io.File(ArtifactStore.root).getCanonicalPath,
      ArtifactStore.scratchDir("hygiene_probe").getParent
        .toFile.getCanonicalPath)
    val strays = Option(new java.io.File("/tmp").listFiles()).getOrElse(Array())
      .filter(_.getName.startsWith("graft_"))
      .filterNot(_.getName == "graft_sf1")
      .filterNot(f => managed.contains(f.getCanonicalPath))
      // graft_scratch*/graft_artifacts* roots belong to SOME graft JVM
      // and are exit-cleaned by its shutdown hook — a CONCURRENT
      // Verify/Bench process legitimately owns ones this test can see
      // (test 1's source audit guarantees nothing else creates them);
      // what this test hunts is any OTHER graft_* path born in this
      // JVM's lifetime, which would be an unmanaged write
      .filterNot(f => f.getName.startsWith("graft_scratch") ||
        f.getName.startsWith("graft_artifacts"))
      .filter { f =>
        // only entries born in THIS JVM's lifetime are attributable
        val attrs = java.nio.file.Files.readAttributes(f.toPath,
          classOf[java.nio.file.attribute.BasicFileAttributes])
        val created = attrs.creationTime.toMillis
        created > 0 && created >= jvmStart
      }
    assert(strays.isEmpty,
      s"stray /tmp/graft_* entries created by this JVM: " +
        strays.map(_.getPath).mkString(", "))
  }
}
