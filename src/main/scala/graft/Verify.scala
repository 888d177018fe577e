package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Per-query wall-clock cap: one pathological query must not stall the
    // whole correctness dump. Cancellation via Spark job groups.
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT", "600").toLong
    import java.util.concurrent.{Executors, TimeUnit, TimeoutException}
    val pool = Executors.newCachedThreadPool()
    // optional comma-separated filter (local iteration only — the driver
    // always dumps the full surface)
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY").map(_.split(",").toSet)
    val queries = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.filter { case (k, _) => names.contains(k) })
    // Failure LEDGER (round-11 finding): a query that throws before its
    // parquet write simply has no output dir, and the driver's
    // correctness file then records a SMALLER DENOMINATOR instead of a
    // failure — 9 broken gates read as "112/112 green". Every failure
    // (error or timeout) is therefore recorded here and dumped as an
    // explicit artifact next to outDir, so a regression is always
    // visible evidence, never a silent shrink.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    queries.foreach { case (name, fn) =>
      val task = pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = {
          spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
        }
      })
      try task.get(timeoutSec, TimeUnit.SECONDS)
      catch {
        case _: TimeoutException =>
          spark.sparkContext.cancelJobGroup(name)
          task.cancel(true)
          System.err.println(s"[verify] $name timed out after ${timeoutSec}s")
          errors(name) = s"timeout after ${timeoutSec}s"
        case e: Throwable =>
          val msg = Option(e.getCause).getOrElse(e).getMessage
          System.err.println(s"[verify] $name failed: $msg")
          errors(name) = Option(msg).getOrElse(e.getClass.getName)
      }
    }
    // aux tables for hash-importing oracles (see queries.OracleAux):
    // written after the query dumps so a pathological aux build can't
    // starve the main gate; failures degrade those oracles, not the run.
    // A SIBLING of outDir, not inside it — the driver enumerates outDir's
    // children as query results, and the aux dump is not a query.
    val auxDir = new java.io.File(outDir).getAbsolutePath.stripSuffix("/") + "_aux"
    graft.queries.OracleAux.tables.foreach { case (name, fn) =>
      val task = pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = {
          spark.sparkContext.setJobGroup(s"aux_$name", name, interruptOnCancel = true)
          fn(spark, sfDir).write.mode("overwrite").parquet(s"$auxDir/$name")
        }
      })
      try task.get(timeoutSec, TimeUnit.SECONDS)
      catch {
        case _: TimeoutException =>
          spark.sparkContext.cancelJobGroup(s"aux_$name")
          task.cancel(true)
          System.err.println(s"[verify] aux $name timed out after ${timeoutSec}s")
          errors(s"aux_$name") = s"timeout after ${timeoutSec}s"
        case e: Throwable =>
          val msg = Option(e.getCause).getOrElse(e).getMessage
          System.err.println(s"[verify] aux $name failed: $msg")
          errors(s"aux_$name") = Option(msg).getOrElse(e.getClass.getName)
      }
    }
    pool.shutdownNow()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace(graft.queries.OracleAux.Placeholder, auxDir))}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // the failure ledger — a SIBLING file like the aux dir (the driver
    // enumerates outDir's children as query results; an extra file
    // inside could be misread as one). Written even when empty: "{}"
    // proves the ledger ran, distinguishing 0 failures from no ledger.
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(
      new java.io.File(outDir).getAbsolutePath.stripSuffix("/") + "_errors.json"), errJson)
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} quer${if (errors.size == 1) "y" else "ies"} failed: ${errors.keys.mkString(", ")}")
    spark.stop()
  }
}
