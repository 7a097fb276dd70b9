package graft.functions

import org.apache.spark.sql.{Encoder, TypedColumn}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Per-group top-k as a bounded aggregation — the scale alternative to the
  * `row_number() <= k` window formulation. A window function must shuffle and
  * SORT every row of every group; this Aggregator carries at most k elements
  * per group (sorted array buffer), reduces and merges in O(k), and map-side
  * combine applies — so the shuffle carries k rows per group per map task
  * instead of the whole group. Results are identical to the window form under
  * the same deterministic ordering (score DESC, id ASC tie-break); proven
  * against the same DuckDB oracle as the window query.
  */
final class TopK(k: Int)
    extends Aggregator[(Double, Long), Array[(Double, Long)], Array[(Double, Long)]]
    with Serializable {
  require(k >= 1)

  private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2) // "smaller" = ranks earlier

  def zero: Array[(Double, Long)] = Array.empty

  def reduce(buf: Array[(Double, Long)], v: (Double, Long)): Array[(Double, Long)] = {
    if (buf.length >= k && !lt(v, buf(buf.length - 1))) buf
    else {
      var ins = 0
      while (ins < buf.length && lt(buf(ins), v)) ins += 1
      val n = math.min(buf.length + 1, k)
      val out = new Array[(Double, Long)](n)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = v
      System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
      out
    }
  }

  def merge(x: Array[(Double, Long)], y: Array[(Double, Long)]): Array[(Double, Long)] = {
    val out = new Array[(Double, Long)](math.min(x.length + y.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length) {
      out(o) =
        if (j >= y.length || (i < x.length && lt(x(i), y(j)))) { val v = x(i); i += 1; v }
        else { val v = y(j); j += 1; v }
      o += 1
    }
    out
  }

  def finish(buf: Array[(Double, Long)]): Array[(Double, Long)] = buf

  def bufferEncoder: Encoder[Array[(Double, Long)]] =
    ExpressionEncoder[Array[(Double, Long)]]()
  def outputEncoder: Encoder[Array[(Double, Long)]] =
    ExpressionEncoder[Array[(Double, Long)]]()

  def column: TypedColumn[(Double, Long), Array[(Double, Long)]] =
    this.toColumn.name("topk")
}
