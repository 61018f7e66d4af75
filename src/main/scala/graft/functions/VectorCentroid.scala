package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (`Aggregator`): element-wise mean of quantized embedding
  * vectors — the centroid/prototype computation of a k-means step or
  * per-class embedding prototype. Buffer is (elementwise long sums, count):
  * exact integer partial aggregation, merge-associative, so the result is
  * engine- and order-independent; only the final division is floating
  * point (deterministic on exact inputs).
  *
  * This is the `Aggregator[IN, BUF, OUT]` surface of the engine — the
  * reference needs no custom aggregates (SURVEY.md §2.7), so this lives in
  * the extension tier alongside the similarity operators.
  */
object VectorCentroid extends Aggregator[Seq[Long], (Array[Long], Long), Seq[Double]] {

  override def zero: (Array[Long], Long) = (Array.empty[Long], 0L)

  override def reduce(b: (Array[Long], Long), v: Seq[Long]): (Array[Long], Long) = {
    val sums = if (b._1.isEmpty) new Array[Long](v.length) else b._1
    var i = 0
    while (i < v.length && i < sums.length) { sums(i) += v(i); i += 1 }
    (sums, b._2 + 1)
  }

  override def merge(a: (Array[Long], Long), b: (Array[Long], Long)): (Array[Long], Long) = {
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      var i = 0
      while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
  }

  override def finish(r: (Array[Long], Long)): Seq[Double] =
    if (r._2 == 0) Seq.empty else r._1.toSeq.map(_.toDouble / r._2)

  override def bufferEncoder: Encoder[(Array[Long], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Long], Long)]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
