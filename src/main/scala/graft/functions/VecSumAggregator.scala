package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise vector-sum UDAF: Array[Float] column → Array[Double].
  *
  * Exhibit of the typed `Aggregator[IN, BUF, OUT]` extension surface
  * (SURVEY.md §2.11). Merge is associative and commutative, so Spark
  * runs it as partial (map-side) + final aggregation — the same
  * two-phase shape as a builtin sum, shuffling one fixed-size buffer per
  * group rather than the raw vectors. At 100 TB with a bounded label
  * domain that is a constant-size shuffle.
  */
class VecSumAggregator(dim: Int)
    extends Aggregator[Array[Float], Array[Double], Array[Double]] {

  override def zero: Array[Double] = new Array[Double](dim)

  override def reduce(buf: Array[Double], v: Array[Float]): Array[Double] = {
    var i = 0
    while (i < dim && i < v.length) { buf(i) += v(i); i += 1 }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < dim) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Double]): Array[Double] = buf

  override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder()
}

/** Integer micro-unit variant of [[VecSumAggregator]]: each component
  * is quantized map-side to `floor(x * 1e6)` (exact double arithmetic —
  * float widened first, so any engine computes the identical value) and
  * accumulated as a BIGINT. Integer addition is order-independent, so
  * unlike the float variant this one is DuckDB-oracle-checkable while
  * still exercising the identical typed-Aggregator merge surface and
  * two-phase plan shape. */
class VecSumMicroAggregator(dim: Int)
    extends Aggregator[Array[Float], Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](dim)

  override def reduce(buf: Array[Long], v: Array[Float]): Array[Long] = {
    var i = 0
    while (i < dim && i < v.length) {
      buf(i) += math.floor(v(i).toDouble * 1e6).toLong; i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < dim) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}
