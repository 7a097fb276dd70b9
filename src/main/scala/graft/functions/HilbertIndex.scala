package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen'd Hilbert-curve index of two nonnegative grid coordinates
  * on a 2^bits × 2^bits grid — the distance along the Hilbert space-filling
  * curve (the classic iterative xy→d transform: per bit level, quadrant
  * digit `(3·rx) ⊕ ry` plus the reflect/swap rotation of the frame).
  *
  * Why an expression and not composed built-ins: the transform threads
  * (x, y, d) STATE through `bits` conditional rounds, so a Column-expression
  * unrolling re-references each round's x and y several times and the tree
  * (and the generated code, once projections collapse) grows ~4× per round —
  * 4^16 at the 16-bit grid. As a Catalyst expression it is an O(bits) loop
  * inside whole-stage codegen, exactly like the interpreted-vs-native story
  * of [[DotProductExpression]]. The DuckDB oracle replays the identical
  * rounds as a recursive CTE (state per row per level, linear work).
  *
  * Hilbert vs Morton for clustering layout: both bound every dimension
  * within a file, but Morton's curve takes long jumps at quadrant
  * boundaries (bit carries), while the Hilbert curve is CONTIGUOUS — every
  * step moves one cell — so equal-size curve ranges tile into tighter
  * boxes and a min/max-pruned band predicate touches fewer files (measured
  * in `ZOrderSpec` / the `q_zorder_prune` vs `q_hilbert_prune` gates).
  *
  * Inputs must already be grid-scaled to `[0, 2^bits)` (see
  * `ZOrder.gridCoord`); bits ≤ 31 keeps d = gx·gy digits < 2^62 — raw Java
  * long arithmetic in the generated code, no ANSI overflow surface.
  */
// ImplicitCastInputTypes (vs plain ExpectsInputTypes) so SQL integer
// literals coerce to the long inputs — hilbert_index(0, 3, 2) just works
case class HilbertIndexExpression(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ImplicitCastInputTypes {

  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def dataType: DataType = LongType
  // covariant return: AbstractDataType is private[sql], DataType suffices
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long]
    var y = b.asInstanceOf[Long]
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      s"""
         |long $x = $a;
         |long $y = $b;
         |long $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) {
         |      $x = $s - 1 - $x;
         |      $y = $s - 1 - $y;
         |    }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndexExpression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hilbert_index"
}

object HilbertIndexExpression {
  /** Column API: Hilbert curve distance of two grid coordinates. */
  def hilbertIndex(gx: Column, gy: Column, bits: Int): Column =
    ColumnBridge.column(HilbertIndexExpression(
      ColumnBridge.expression(gx), ColumnBridge.expression(gy), bits))
}
