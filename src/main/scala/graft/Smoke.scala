package graft

/** Smoke main mirroring the driver's t1 check: run SparkEntry.entry on
  * sf0.001 and require rows > 0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.get()
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"[smoke] entry returned ${rows.length} rows; schema=${df.schema.simpleString}")
    rows.foreach(r => println(s"[smoke] $r"))
    assert(rows.nonEmpty, "entry must return rows")
    spark.stop()
  }
}
