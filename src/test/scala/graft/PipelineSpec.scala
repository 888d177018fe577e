package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Pipeline
import graft.pipeline.Pipeline._

/** Pipeline runner: dependency order, skip-on-empty short-circuit,
  * error notification, memoized shared upstream stages. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("stages run in dependency order; shared upstream memoized") {
    var builds = 0
    var sunk: Seq[String] = Nil
    val r = new Runner()
      .add(Stage("dim", Nil, { _ => builds += 1; Seq((1, "c:1")).toDF("sk", "nk") },
        df => sunk :+= "dim"))
      .add(Stage("fact_a", Seq("dim"), { f => f("dim").select("sk") }, _ => sunk :+= "fact_a"))
      .add(Stage("fact_b", Seq("dim"), { f => f("dim").select("nk") }, _ => sunk :+= "fact_b"))
      .run()
    assert(builds == 1)
    assert(r.values.forall(_ == Completed()))
    assert(sunk.head == "dim" && sunk.toSet == Set("dim", "fact_a", "fact_b"))
  }

  test("empty input skips the stage and its dependents") {
    var sinkRan = false
    val r = new Runner()
      .add(Stage("src", Nil, { _ => Seq.empty[(Int, String)].toDF("a", "b") }))
      .add(Stage("down", Seq("src"), { f => f("src") }, _ => sinkRan = true))
      .run()
    assert(r("src") == Skipped && r("down") == Skipped && !sinkRan)
  }

  test("failure notifies and skips dependents") {
    var notified: Option[String] = None
    val r = new Runner((name, _) => notified = Some(name))
      .add(Stage("boom", Nil, { _ => throw new RuntimeException("x") }))
      .add(Stage("down", Seq("boom"), { f => f("boom") }))
      .run()
    assert(r("boom").isInstanceOf[Errored] && r("down") == Skipped)
    assert(notified.contains("boom"))
  }
}
