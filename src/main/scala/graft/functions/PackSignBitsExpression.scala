package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Pack an `array<long>` of signed majority counters into one 64-bit
  * signature: bit b is set iff counts[b] > 0 (null elements unset).
  * The SimHash bit-packing step ([[graft.dedup.Dedup.simhashSignatures]]).
  *
  * Why an Expression and not `(0 until 64).map(when(s_b > 0, 1L << b))
  * .reduce(bitwiseOR)`: that reduce is ONE 64-level nested expression
  * tree, and Spark's codegen cannot split a single expression across
  * methods — fused into the final HashAggregate's generated method it
  * pushed the unit to 8,379 bytecodes, past HotSpot's 8,000-bytecode
  * DontCompileHugeMethods cliff, so the per-group merge ran INTERPRETED
  * (caught by the round-16 PLANS.md codegen-size audit; the class
  * BASELINE round-15 addendum 5 convicted on the brute-truth path). As
  * a loop over an array input the packing is ~30 bytecodes, and the
  * CreateArray feeding it evaluates its 64 elements through codegen's
  * own expression splitter — every generated method stays far under
  * the cliff. */
case class PackSignBits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pack_sign_bits needs an array<long> input, got $t")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "pack_sign_bits"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), 64)
    var sig = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && x.getLong(i) > 0L) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), 64);
         |long $sig = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && $a.getLong($i) > 0L) {
         |    $sig |= (1L << $i);
         |  }
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PackSignBits =
    copy(child = newChild)
}
