package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst window aggregate for the exponentially-weighted mean
  * (Polars `ewm_mean(half_life=h, adjust=True, ignore_nulls=False)`
  * semantics — the reference's smoother, factor_model_flow.py:87).
  *
  * Why a custom expression (SURVEY §7.3's "candidate later work", done):
  * the pure-built-in closed form cum(x·w^-rn)/cum(w^-rn) overflows double
  * once rn ≳ 1023·halfLife rows per key, and the mapPartitions streaming
  * form leaves the SQL/Column world. As an [[AggregateWindowFunction]] the
  * recurrence
  *   num' = decay·num + x   (x null → + 0)
  *   den' = decay·den + 1   (x null → + 0)
  *   ewm  = num / den       (den = 0 → null)
  * runs over the standard running frame (UNBOUNDED PRECEDING..CURRENT ROW)
  * with O(1) state, no overflow for any series length, and it composes
  * with ordinary `Window.partitionBy(...).orderBy(...)` specs — the update
  * and evaluate expressions are pure Catalyst expression trees, so the
  * window evaluator executes them without interpretation overhead.
  */
case class EwmMeanExpr(child: Expression, halfLife: Expression)
    extends AggregateWindowFunction {

  override def children: Seq[Expression] = Seq(child, halfLife)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "ewm_mean"

  private def decay: Expression = {
    require(halfLife.foldable, "ewm_mean: half_life must be a constant")
    val hl = halfLife.eval() match {
      case d: java.lang.Double => d.doubleValue()
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case n: java.lang.Number => n.doubleValue()
      case other => throw new IllegalArgumentException(
        s"ewm_mean: half_life must be numeric, got $other")
    }
    Literal(math.pow(2.0, -1.0 / hl))
  }

  private lazy val num = AttributeReference("num", DoubleType, nullable = false)()
  private lazy val den = AttributeReference("den", DoubleType, nullable = false)()
  override def aggBufferAttributes: Seq[AttributeReference] = Seq(num, den)
  override val initialValues: Seq[Expression] = Seq(Literal(0.0), Literal(0.0))

  override lazy val updateExpressions: Seq[Expression] = {
    val x = Cast(child, DoubleType)
    Seq(
      Add(Multiply(num, decay), If(IsNull(x), Literal(0.0), x)),
      Add(Multiply(den, decay), If(IsNull(x), Literal(0.0), Literal(1.0))))
  }

  override lazy val evaluateExpression: Expression =
    If(GreaterThan(den, Literal(0.0)), Divide(num, den), Literal(null, DoubleType))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): EwmMeanExpr =
    copy(child = newChildren(0), halfLife = newChildren(1))
}
