package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints one JSON line for the driver.
  * Results are fully materialized through the noop sink — `count()`
  * would let Catalyst prune the per-row compute we're measuring.
  *
  * Numbers from a contended host are worse than no numbers (round 4
  * recorded phantom 13× regressions from a busy machine), so the run
  * defends itself four ways: an exclusive lock file serializes
  * concurrent Bench JVMs, the timed section waits for system load to
  * drain first, TWO fixed canaries timed at start and end — a
  * read+aggregate and a tiny table create+insert+drop (write-path IO
  * contention is invisible to a read canary) — and the read canary
  * re-timed every ~25 queries mid-run (an endpoint pair is blind to a
  * burst that dies before the end canary). Since r15 a third,
  * WIDE-STAGE canary (32-task map + 32-partition shuffle + reduce)
  * catches contention that only bites multi-core stages, and a sweep
  * whose start load exceeds ~cpus/10 is rejected outright — r14's
  * contaminated driver sweep (load 5.98, wide queries 40-102× off,
  * narrow canaries clean) would self-stamp invalid under both. Any
  * canary drifting >1.5× stamps `"valid":false` on the emitted JSON.
  */
object Bench {

  /** Load gate (r14 verdict): the idle-wait gives up after its
    * deadline and previously still stamped valid — r14's 623.9 s
    * driver sweep started at load 5.98 on 32 cpus and self-certified
    * while carrying 40-102× movers on wide stages. A sweep that
    * STARTS contended is contaminated regardless of what the
    * canaries later say; ~3 on 32 cpus is the adjudicated threshold
    * (max(3, cpus/10) so small-cpu dev hosts keep a usable floor).
    */
  def loadGateOk(loadAtStart: Double, cpus: Double): Boolean =
    loadAtStart <= math.max(3.0, cpus / 10.0)

  /** Canary validity: every endpoint drift inside the SYMMETRIC
    * [0.5, 1.5] band (an end canary far BELOW its start floor
    * certifies the floor itself was degraded), every mid-run maximum
    * under 1.5× its start floor.
    */
  def driftsOk(endpointDrifts: Seq[Double], midMaxDrifts: Seq[Double]): Boolean =
    endpointDrifts.forall(d => d <= 1.5 && d >= 0.5) &&
      midMaxDrifts.forall(_ <= 1.5)

  /** Replication rule (r15 verdict item 3): a single sweep can trip a
    * marginal canary bound on an honest host — every r15 sweep did,
    * each on a DIFFERENT marginal canary, while the three agreed at
    * per-query median 1.00. Two same-tree sweeps whose per-query
    * ratios sit this close are better contamination evidence than one
    * lucky individual stamp, so a SET of ≥2 sweeps is valid when every
    * pair agrees: per-query median ratio within [1/1.15, 1.15] and at
    * least 90% of common queries within the canary band [1/1.5, 1.5].
    * (A contaminated sweep cannot pass: contention moves a contiguous
    * block of queries 2-30×, which both the median and the 90% rule
    * catch.) Each sweep keeps its own stamp; the set-level verdict is
    * emitted alongside, never instead.
    */
  def replicationOk(a: Map[String, Double], b: Map[String, Double]): Boolean = {
    val common = a.keySet.intersect(b.keySet).toSeq
      .filter(k => a(k) > 0 && b(k) > 0)
    if (common.size < 50) return false // too few points to certify
    val ratios = common.map(k => a(k) / b(k)).sorted
    val median = ratios(ratios.size / 2)
    val inBand = ratios.count(r => r >= 1.0 / 1.5 && r <= 1.5)
    median >= 1.0 / 1.15 && median <= 1.15 &&
      inBand.toDouble / ratios.size >= 0.9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    // Serialize whole-bench execution across processes: concurrent JVMs
    // (sbt test, a second bench) corrupt timings. Blocks until the lock
    // is free rather than failing, so a queued bench still runs.
    val lockCh = java.nio.channels.FileChannel.open(
      java.nio.file.Paths.get(sys.props.getOrElse("user.dir", "."), ".bench.lock"),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.WRITE)
    val lock = lockCh.lock()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warmup on the smallest sf (not timed): the join
    // pipeline (entry) plus the text/dedup pipeline, so the first
    // timed query of each family measures steady state, not first-ever
    // whole-stage-codegen compilation. The warmup dir derives from the
    // benched dir (sibling sf0.001 when present, else the benched sf
    // itself) so the warmup can't silently no-op on hosts laid out
    // differently from ours and skew the first timed query.
    val warmDir = {
      val sibling = java.nio.file.Paths.get(sfDir).resolveSibling("sf0.001")
      if (java.nio.file.Files.isDirectory(sibling)) sibling.toString else sfDir
    }
    Seq(
      () => SparkEntry.entry(spark),
      () => graft.operators.Dedup.dedupNgramJaccard(spark, warmDir))
      .foreach { q =>
        try q().write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] warmup query skipped: ${e.getMessage}")
        }
      }

    // Wait (bounded) for other load on the host to drain before timing
    // anything: a correctness runner or stray JVM sharing the cores
    // shows up as phantom plan regressions.
    def loadAvg(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0).toDouble
      catch { case _: Throwable => 0.0 }
    val loadGate = cpus.toDouble / 4
    val idleDeadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
    while (loadAvg() > loadGate && System.nanoTime() < idleDeadline) Thread.sleep(5000)
    val loadAtStart = loadAvg()

    // Contention canary: one fixed read+aggregate timed before and after
    // the suite. The plans never change between the two runs, so any
    // END-side slowdown is the environment, not the code. Drift BELOW 1
    // is expected and benign — the JVM keeps JIT-compiling through the
    // suite, so the end canary runs closer to steady state; start-side
    // contention is covered by the load gate + load_at_start instead.
    def canary(): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count()
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // Write-path canary: the read canary misses filesystem/IO
    // contention on table BUILDS (round 9 saw ~19 s phantom outliers
    // on lake_history/lake_insert under canary-valid reads). A tiny
    // create+insert+drop probes the same syscall path the lake_*
    // write-path queries take; >1.5× drift across the run invalidates.
    def writeCanary(): Double = {
      val dir = java.nio.file.Paths.get(
        "target", s"bench-wcanary-${java.util.UUID.randomUUID()}")
      val t0 = System.nanoTime()
      val t = graft.lake.GraftTable.create(spark, dir.toString,
        spark.range(1000).selectExpr("id AS k", "id * 2 AS v"))
      t.append(spark.range(100).selectExpr("id AS k", "id AS v"))
      val walk = java.nio.file.Files.walk(dir)
      val all = try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq
      } finally walk.close()
      all.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
      (System.nanoTime() - t0) / 1e9
    }
    // Wide-stage canary (r14 verdict): the read/write canaries are
    // effectively single-task probes, blind to contention that only
    // bites SHUFFLE-WIDE stages (r14's driver sweep carried 40-102×
    // movers on wide queries under CLEAN narrow canaries — the
    // contending load stole cores, which a 1-task probe never misses
    // them). A fixed 32-task map + 32-partition shuffle + reduce
    // occupies every core in both stages, so any core-stealing burst
    // shows up here like it does in the wide queries.
    def wideCanary(): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      spark.range(0, 8000000L, 1, 32)
        .selectExpr("id % 100000 AS k", "id AS v")
        .groupBy("k")
        .agg(org.apache.spark.sql.functions.sum("v").as("s"),
          org.apache.spark.sql.functions.count("*").as("c"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    canary(); canary() // untimed: codegen + page-cache warm for the canary shape
    val canaryStart = math.min(canary(), canary())
    writeCanary() // untimed warm: codegen for the tiny build's plan
    val wcanaryStart = math.min(writeCanary(), writeCanary())
    wideCanary() // untimed warm
    val xcanaryStart = math.min(wideCanary(), wideCanary())

    // Hygiene: a cache-heavy query must not inflate its neighbors'
    // numbers (GC/memory pressure looked like regressions in earlier
    // rounds), so every measurement starts from a clean cache; and each
    // query runs twice with the min reported, so one-off JIT/GC hiccups
    // don't read as plan regressions.
    //
    // Mid-run canaries: the start/end pair is blind to a load burst
    // that dies BEFORE the end canary runs (round 10's driver artifact
    // carried a 6-29x contiguous block under two valid endpoint
    // canaries). Re-time the read canary every ~25 queries AND the
    // write canary every ~50 (a write-IO burst is invisible to a read
    // probe — round 11's mid-run sweep proved it: a 2-3x lake_* block
    // under clean read canaries, gone on targeted re-run); any
    // interval drifting >1.5x over its start floor invalidates.
    val midSamples = scala.collection.mutable.ArrayBuffer[Double]()
    val midWSamples = scala.collection.mutable.ArrayBuffer[Double]()
    val midXSamples = scala.collection.mutable.ArrayBuffer[Double]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).zipWithIndex
      .map { case ((name, fn), idx) =>
      if (idx > 0 && idx % 25 == 0)
        midSamples += math.min(canary(), canary())
      if (idx > 0 && idx % 50 == 0) {
        midWSamples += math.min(writeCanary(), writeCanary())
        midXSamples += math.min(wideCanary(), wideCanary())
      }
      def once(): Double = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          return -1.0
        }
        (System.nanoTime() - t0) / 1e9
      }
      val a = once()
      // Adaptive third sample (r13: the host band dominates sub-second
      // single-shot timings — three same-tree sweeps moved DIFFERENT
      // untouched queries 1.5-18x each). When the pair disagrees >1.4x
      // on a short query, the two runs straddled a burst; one more
      // sample keeps the burst out of the artifact instead of relying
      // on the canaries to reject the whole sweep after the fact.
      val t = if (a < 0) a else {
        val b = once()
        if (b < 0) a else {
          val m = math.min(a, b)
          if (m < 2.0 && math.max(a, b) > 1.4 * m) math.min(m, once()) else m
        }
      }
      name -> t
    }
    val canaryEnd = math.min(canary(), canary())
    val wcanaryEnd = math.min(writeCanary(), writeCanary())
    val xcanaryEnd = math.min(wideCanary(), wideCanary())
    spark.catalog.clearCache()
    val drift = canaryEnd / math.max(canaryStart, 1e-9)
    val wdrift = wcanaryEnd / math.max(wcanaryStart, 1e-9)
    val xdrift = xcanaryEnd / math.max(xcanaryStart, 1e-9)
    val midMaxDrift =
      if (midSamples.isEmpty) 1.0
      else midSamples.max / math.max(canaryStart, 1e-9)
    val midWMaxDrift =
      if (midWSamples.isEmpty) 1.0
      else midWSamples.max / math.max(wcanaryStart, 1e-9)
    val midXMaxDrift =
      if (midXSamples.isEmpty) 1.0
      else midXSamples.max / math.max(xcanaryStart, 1e-9)
    // SYMMETRIC endpoint bounds (r14): every mid/end comparison is
    // relative to the START floor, so a sweep that STARTS inside a
    // decaying IO storm (post-test-suite debris inflated the write
    // canary floor 5x; everything then "improved") read as valid while
    // being ~1.5x contaminated. An end canary far BELOW its start
    // floor certifies the floor itself was degraded — reject it. The
    // lower bound leaves room for benign JIT warming (~0.7-1.0).
    val loadOk = Bench.loadGateOk(loadAtStart, cpus.toDouble)
    val valid = loadOk && Bench.driftsOk(
      Seq(drift, wdrift, xdrift),
      Seq(midMaxDrift, midWMaxDrift, midXMaxDrift))
    val qs = results.map { case (k, v) => "\"" + k + f"""":${v}%.3f""" }
      .mkString("{", ",", "}")
    val mids = midSamples.map(v => f"$v%.3f").mkString("[", ",", "]")
    val midws = midWSamples.map(v => f"$v%.3f").mkString("[", ",", "]")
    val midxs = midXSamples.map(v => f"$v%.3f").mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val json = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","canary_start_sec":$canaryStart%.3f,"canary_end_sec":$canaryEnd%.3f,"canary_drift":$drift%.2f,"canary_mid_sec":$mids,"canary_mid_max_drift":$midMaxDrift%.2f,"wcanary_start_sec":$wcanaryStart%.3f,"wcanary_end_sec":$wcanaryEnd%.3f,"wcanary_drift":$wdrift%.2f,"wcanary_mid_sec":$midws,"wcanary_mid_max_drift":$midWMaxDrift%.2f,"xcanary_start_sec":$xcanaryStart%.3f,"xcanary_end_sec":$xcanaryEnd%.3f,"xcanary_drift":$xdrift%.2f,"xcanary_mid_sec":$midxs,"xcanary_mid_max_drift":$midXMaxDrift%.2f,"load_at_start":$loadAtStart%.2f,"load_ok":$loadOk,"valid":$valid}"""
    // the driver's stdout tail-capture has truncated the leading ~18
    // query keys in past rounds — persist the full line so the artifact
    // is always self-contained. Written twice: target/ for tooling and
    // BENCH_LOCAL.json at the repo root (NOT gitignored) so a valid run
    // can be committed as evidence even when the log capture truncates.
    Seq(java.nio.file.Paths.get("target", "bench.json"),
        java.nio.file.Paths.get("BENCH_LOCAL.json")).foreach { p =>
      try java.nio.file.Files.write(p,
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case e: Throwable =>
        System.err.println(s"[bench] could not write $p: ${e.getMessage}")
      }
    }
    lock.release(); lockCh.close()
    spark.stop()
    // marker line LAST (r11 verdict): the driver's tail-window capture
    // starts mid-stream, so the marker must be the final stdout line.
    // r12 showed the window is BYTE-limited too — the ~6 KB full line
    // overflowed it and its marker prefix was cut mid-JSON — so after
    // the full line a COMPACT marker (aggregates only, no per-query
    // map, <400 bytes) prints as the true last line: whichever intact
    // marker the capture window holds parses. Per-query data is always
    // in the committed BENCH_LOCAL.json either way.
    val compact = f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"sf":"$sfDir","canary_drift":$drift%.2f,"canary_mid_max_drift":$midMaxDrift%.2f,"wcanary_drift":$wdrift%.2f,"wcanary_mid_max_drift":$midWMaxDrift%.2f,"xcanary_drift":$xdrift%.2f,"xcanary_mid_max_drift":$midXMaxDrift%.2f,"load_at_start":$loadAtStart%.2f,"load_ok":$loadOk,"valid":$valid}"""
    println(s"BENCH_RESULT_JSON: $json")
    println(s"BENCH_RESULT_JSON: $compact")
  }
}
