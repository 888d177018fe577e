package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the versioned registry snapshot `tools/query_names.txt` to
  * [[SparkEntry.queries]] (r15 advice): the two-half bench capture
  * derives its query lists from that file and the merge script
  * validates the merged artifact's union against it, so a drifted
  * snapshot would silently drop queries from bench artifacts. This
  * spec makes `sbt test` the sync point — add a query, regenerate the
  * file (sorted, one name per line). */
class QueryRegistrySpec extends AnyFunSuite {

  test("tools/query_names.txt == SparkEntry.queries keys, sorted") {
    val path = Paths.get("tools/query_names.txt")
    assert(Files.exists(path), s"missing $path — regenerate from SparkEntry.queries")
    val onDisk = Files.readAllLines(path).asScala.map(_.trim).filter(_.nonEmpty).toSeq
    val expected = SparkEntry.queries.keys.toSeq.sorted
    assert(onDisk == expected,
      s"tools/query_names.txt is stale: missing=${expected.diff(onDisk)} " +
        s"extra=${onDisk.diff(expected)} (or unsorted)")
  }

  test("every query has an oracle entry or is a documented rows-only gate") {
    // oracleSql ⊆ queries — a dangling oracle name would make the
    // driver compare against a query that never dumps
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracleSql names without a query: $dangling")
  }
}
