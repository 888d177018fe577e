package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to the full machine (brief: local[32]) when the driver
    // doesn't pin a core count
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // Heap-proofing (round-8 finding, SCALE.md "heap contamination"):
      // Spark frees broadcast/shuffle/checkpoint state via weak references,
      // so cleanup only happens when the driver GCs. At a huge heap
      // (SPARK_DRIVER_MEM >> 8g) full GCs are rare, state from hundreds of
      // prior query runs accumulates, and late-alphabet queries slow 10-100x.
      // periodicGC forces a driver GC on a wall-clock cadence so ContextCleaner
      // keeps draining regardless of heap size (default is 30min — far longer
      // than this whole bench).
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb session/codegen warm-up outside the first query's timing
    spark.range(1000).selectExpr("sum(id)").collect()
    // optional comma-separated filter for timing individual queries
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.filter { case (k, _) => names.contains(k) })
    // MEDIAN of N runs (default 3) in FIXED (sorted-name) order —
    // round-2 showed single-shot timings of untouched queries moving
    // 2-3x between rounds (GC / Map-iteration-order / JIT effects);
    // the median over a deterministic order is robust to one bad run
    // without hiding a consistent regression the way min can.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    def loadAvg(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split(" ").take(3).mkString("[", ",", "]")
      catch { case _: Throwable => "null" }
    val loadBefore = loadAvg()
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to runs).flatMap { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case _: Throwable => None } // failed run: no timing
      }.sorted
      // Per-query GC (outside the timed section): promptly enqueues the
      // weak refs ContextCleaner drains, so no query inherits the previous
      // queries' broadcast/shuffle state. Belt to periodicGC's suspenders —
      // together they make the numbers heap-size-independent.
      System.gc()
      // ...and drop persisted blocks (localCheckpoint/cache) the previous
      // query materialized: ContextCleaner's weak-ref path is ASYNC and can
      // lag, leaving checkpoint-heavy queries' storage blocks (cur3/x7
      // hold ~0.5 GB each at sf1) resident in unified memory while later
      // queries run. Every query builds its frames from scratch, so
      // inter-query persisted state is garbage by construction here —
      // dropping it synchronously costs nothing and removes one suite-
      // order dependence (SCALE.md round-9 environment notes).
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      // all runs failed -> explicit -1 sentinel, never a time-to-throw
      name -> (if (times.nonEmpty) times else Seq(-1.0))
    }
    def med(ts: Seq[Double]) = ts(ts.length / 2)
    // Environment block: a uniform cross-round drift on identical code is
    // only diagnosable if the run records the machine state it saw.
    // loadavg is sampled BEFORE and AFTER the timed section — a non-idle
    // "before" or a big jump flags background contention on the box.
    val rt = Runtime.getRuntime
    val env =
      s"""{"load_before":$loadBefore,"load_after":${loadAvg()},""" +
        s""""heap_max_mb":${rt.maxMemory() / (1 << 20)},""" +
        s""""procs_online":${rt.availableProcessors()},""" +
        s""""java":"${System.getProperty("java.version")}",""" +
        s""""spark":"${spark.version}"}"""
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + med(v) }
      .mkString("{", ",", "}")
    // per-query min/max spread alongside the median, so a 1.3x move can
    // be told from noise without re-running (a median inside last round's
    // [min,max] band is noise; outside it is a real shift)
    val spread = results.map { case (k, v) =>
      s"\"" + k + "\":[" + v.head + "," + med(v) + "," + v.last + "]"
    }.mkString("{", ",", "}")
    val total = results.map(r => med(r._2)).sum
    // self-documenting provenance: BENCH artifacts produced before this
    // guard existed are heap-size-sensitive (see SCALE.md, "heap
    // contamination" — BENCH_r08.json at 89 GiB); artifacts carrying
    // this field ran with GC-triggered cleaner draining forced on
    val guard = """"gc_guard":"periodicGC=30s + per-query System.gc() (SCALE.md heap-contamination finding)""""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spread,"runs":$runs,"sf":"$sfDir",$guard,"env":$env}""")
    spark.stop()
  }
}
