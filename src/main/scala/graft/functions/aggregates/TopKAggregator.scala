package graft.functions.aggregates

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** `topk(col[, k])` — most frequent values with counts.
  *
  * Reference: `TopKAggregation.java:79` (datasketches FrequentItems).
  * Here: a space-bounded Misra-Gries style summary as a typed
  * [[Aggregator]] — Spark runs it partial (per-partition `reduce`) then
  * final (`merge`), exactly the reference's ITER_PARTIAL → PARTIAL_FINAL
  * split (`expression/symbol/AggregateMode.java:35-47`).
  *
  * Counts are exact while distinct values ≤ `capacity` (default 8192);
  * beyond that it degrades gracefully to approximate heavy-hitters, which is
  * the same contract as the reference's sketch. Capacity bounds executor
  * memory at 100 TB scale regardless of column cardinality.
  */
case class TopKEntry(value: String, cnt: Long)

class TopKAggregator(k: Int, capacity: Int = 8192)
    extends Aggregator[String, mutable.Map[String, Long], Array[TopKEntry]] {

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  private def prune(m: mutable.Map[String, Long]): Unit =
    if (m.size > capacity) {
      // Misra-Gries decrement: subtract the smallest count from everyone.
      val floor = m.valuesIterator.min
      m.filterInPlace((_, c) => c > floor)
      m.mapValuesInPlace((_, c) => c - floor)
    }

  override def reduce(b: mutable.Map[String, Long], a: String): mutable.Map[String, Long] = {
    if (a != null) { b.update(a, b.getOrElse(a, 0L) + 1L); prune(b) }
    b
  }

  override def merge(b1: mutable.Map[String, Long], b2: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    for ((v, c) <- b2) b1.update(v, b1.getOrElse(v, 0L) + c)
    prune(b1)
    b1
  }

  override def finish(m: mutable.Map[String, Long]): Array[TopKEntry] =
    m.toArray.sortBy { case (v, c) => (-c, v) }.take(k).map { case (v, c) => TopKEntry(v, c) }

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    implicitly[Encoder[mutable.Map[String, Long]]](Encoders.kryo[mutable.Map[String, Long]])
  override def outputEncoder: Encoder[Array[TopKEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[TopKEntry]]()
}
