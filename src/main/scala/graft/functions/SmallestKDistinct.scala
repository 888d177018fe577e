package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded "k smallest distinct values" aggregate.
  *
  * The reference's profiler samples `SELECT DISTINCT col LIMIT 5` per
  * column per table (`data_profiling_function.sql:57-69`) — one extra
  * query per column. At 100 TB that is k full passes. This aggregator
  * computes the sample for every column in ONE pass with O(k) state per
  * column: the buffer is a sorted, deduplicated, capped vector, so memory
  * is bounded regardless of column cardinality (unlike `collect_set`).
  * We make the reference's unordered LIMIT 5 deterministic by defining the
  * sample as the k *smallest* distinct values.
  */
class SmallestKDistinct(k: Int) extends Aggregator[String, Seq[String], Seq[String]] {
  override def zero: Seq[String] = Vector.empty

  private def insert(buf: Seq[String], v: String): Seq[String] = {
    if (v == null) buf
    else buf.search(v)(Ordering.String) match {
      case scala.collection.Searching.Found(_) => buf
      case scala.collection.Searching.InsertionPoint(p) =>
        if (p >= k) buf
        else ((buf.take(p) :+ v) ++ buf.drop(p)).take(k)
    }
  }

  override def reduce(buf: Seq[String], v: String): Seq[String] = insert(buf, v)
  override def merge(a: Seq[String], b: Seq[String]): Seq[String] =
    b.foldLeft(a)(insert)
  override def finish(r: Seq[String]): Seq[String] = r
  override def bufferEncoder: Encoder[Seq[String]] = SmallestKDistinct.SeqStringEnc
  override def outputEncoder: Encoder[Seq[String]] = SmallestKDistinct.SeqStringEnc
}

object SmallestKDistinct {
  /** Built once per JVM: ScalaAggregator re-reads the encoders per task,
    * and a fresh ExpressionEncoder[T]() pays a Scala-reflection pass
    * under the process-global ScalaSubtypeLock — serializing concurrent
    * aggregate tasks (see Dedup.MinhashArrayAgg, r20). */
  private[SmallestKDistinct] val SeqStringEnc: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()

  /** Column form: smallest k distinct values of `c` (strings). */
  def apply(c: Column, k: Int): Column = udaf(new SmallestKDistinct(k)).apply(c)
}
