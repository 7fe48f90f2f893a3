package graft.functions.aggregates

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable.ArrayBuffer

/** `lttb(ts, value, buckets)` — Largest-Triangle-Three-Buckets time-series
  * downsampling (reference:
  * `extensions/functions/src/main/java/io/crate/window/LTTBAggregation.java:53`,
  * after Steinarsson 2013 — public algorithm).
  *
  * Semantics require the full (ts, value) series per group, so the buffer
  * collects points and `finish` sorts + downsamples. Scale guidance: group by
  * a series key (e.g. device-day) so each group's points fit one executor —
  * the same constraint the reference has (it materializes the window frame).
  */
case class TsPoint(ts: Long, value: Double)

class LttbAggregator(buckets: Int)
    extends Aggregator[TsPoint, ArrayBuffer[TsPoint], Array[TsPoint]] {

  override def zero: ArrayBuffer[TsPoint] = ArrayBuffer.empty

  override def reduce(b: ArrayBuffer[TsPoint], p: TsPoint): ArrayBuffer[TsPoint] = { b += p; b }

  override def merge(a: ArrayBuffer[TsPoint], b: ArrayBuffer[TsPoint]): ArrayBuffer[TsPoint] = { a ++= b; a }

  override def finish(buf: ArrayBuffer[TsPoint]): Array[TsPoint] = {
    val pts = buf.toArray.sortBy(p => (p.ts, p.value))
    lttb(pts, buckets)
  }

  /** Classic LTTB: keep first/last, pick per-bucket the point forming the
    * largest triangle with the previously selected point and the next
    * bucket's average. */
  def lttb(pts: Array[TsPoint], threshold: Int): Array[TsPoint] = {
    val n = pts.length
    if (threshold >= n || threshold < 3) return pts
    val out = new ArrayBuffer[TsPoint](threshold)
    val every = (n - 2).toDouble / (threshold - 2)
    var a = 0
    out += pts(0)
    var i = 0
    while (i < threshold - 2) {
      val rangeStart = math.floor((i + 1) * every).toInt + 1
      val rangeEnd = math.min(math.floor((i + 2) * every).toInt + 1, n)
      var avgTs = 0.0; var avgV = 0.0
      var j = rangeStart
      while (j < rangeEnd) { avgTs += pts(j).ts; avgV += pts(j).value; j += 1 }
      val cnt = math.max(rangeEnd - rangeStart, 1)
      avgTs /= cnt; avgV /= cnt

      val bucketStart = math.floor(i * every).toInt + 1
      val bucketEnd = math.min(math.floor((i + 1) * every).toInt + 1, n)
      val pa = pts(a)
      var maxArea = -1.0; var maxIdx = bucketStart
      j = bucketStart
      while (j < bucketEnd) {
        val area = math.abs(
          (pa.ts - avgTs) * (pts(j).value - pa.value) -
            (pa.ts - pts(j).ts) * (avgV - pa.value)) * 0.5
        if (area > maxArea) { maxArea = area; maxIdx = j }
        j += 1
      }
      out += pts(maxIdx)
      a = maxIdx
      i += 1
    }
    out += pts(n - 1)
    out.toArray
  }

  override def bufferEncoder: Encoder[ArrayBuffer[TsPoint]] = Encoders.kryo[ArrayBuffer[TsPoint]]
  override def outputEncoder: Encoder[Array[TsPoint]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[TsPoint]]()
}
