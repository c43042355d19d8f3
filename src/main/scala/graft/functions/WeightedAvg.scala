package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregator (§2.11 UDAF surface): weighted average via an
  * `Aggregator[(value, weight), buffer, Double]` — the buffer is a pure
  * case class, merge is associative, so Spark runs it partial+final like
  * any built-in aggregate (map-side combine at scale).
  */
final case class WeightedAvgBuf(sum: Double, weight: Double)

object WeightedAvg extends Aggregator[(Double, Double), WeightedAvgBuf, Double] {
  type Buf = WeightedAvgBuf
  private def Buf(s: Double, w: Double): Buf = WeightedAvgBuf(s, w)

  override def zero: Buf = Buf(0.0, 0.0)
  override def reduce(b: Buf, in: (Double, Double)): Buf =
    Buf(b.sum + in._1 * in._2, b.weight + in._2)
  override def merge(a: Buf, b: Buf): Buf =
    Buf(a.sum + b.sum, a.weight + b.weight)
  override def finish(b: Buf): Double =
    if (b.weight == 0.0) Double.NaN else b.sum / b.weight
  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Register as the 2-arg SQL function `weighted_avg(value, weight)`. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("weighted_avg", udaf(this))
}
