package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** `vec_dot(a, b)` — the embedding dot product as a native Catalyst
  * expression with whole-stage codegen.
  *
  * Spark's higher-order functions (`zip_with`, `aggregate`) are
  * `CodegenFallback`: every row pays interpreted lambda dispatch and
  * per-element boxing. That is THE hot loop of the similarity/dedup
  * family — a verify pass scores |candidates| × dim multiply-adds —
  * so the native form compiles to a tight primitive loop inside the
  * enclosing stage instead (no boxing, no virtual calls, vectorizable
  * by C2).
  *
  * Semantics are EXACTLY the HOF formulation it replaces
  * (`aggregate(zip_with(a, b, (x, y) => double(x) * double(y)), 0.0, +)`),
  * bit-for-bit:
  *   - strict left-to-right double accumulation from 0.0;
  *   - inputs implicit-cast to `array<double>` (float→double widening is
  *     value-exact, so parquet float embeddings score identically);
  *   - a null element, or a length mismatch (zip_with pads the shorter
  *     side with nulls), poisons the result to NULL.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // null elements / length mismatch
  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

object VecDot {
  private[functions] val descriptor = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
    (children: Seq[Expression]) => VecDot(children(0), children(1)))
}

/** `vec_dist2(a, b)` — squared euclidean distance, the assignment
  * kernel of the IVF/k-means family. Same contract as [[VecDot]]:
  * left-to-right `(aᵢ−bᵢ)²` accumulation from 0.0, exact double
  * widening, null/length-mismatch poisoning — bit-equal to the
  * `aggregate(zip_with(a, b, (x,y) => (x−y)·(x−y)), 0.0, +)` HOF form
  * it replaces, minus the interpreted-lambda dispatch.
  */
case class VecDist2(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val dv = x.getDouble(i) - y.getDouble(i)
      acc += dv * dv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val dv = ctx.freshName("dv")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $dv = $a.getDouble($i) - $b.getDouble($i);
         |    $acc += $dv * $dv;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDist2 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dist2"
}

object VecDist2 {
  private[functions] val descriptor = (
    FunctionIdentifier("vec_dist2"),
    new ExpressionInfo(classOf[VecDist2].getName, "vec_dist2"),
    (children: Seq[Expression]) => VecDist2(children(0), children(1)))
}

/** `vec_idot(a, b)` — INTEGER dot product over `array<bigint>`, the
  * scoring kernel of the int8-quantized search family. Same contract
  * family as [[VecDot]] (strict left-to-right accumulation from 0,
  * null-element / length-mismatch poisoning), but in exact int64
  * arithmetic: quantized components are |v| ≤ 127, so a dot of any
  * realistic dimension is far below 2^63 — no overflow, no rounding,
  * and the result is bit-identical to the
  * `aggregate(zip_with(a, b, _*_), 0L, _+_)` HOF form it replaces,
  * minus the interpreted-lambda dispatch and per-element boxing.
  *
  * Overflow contract (deliberate): the accumulation uses RAW int64
  * `*`/`+`, which WRAPS on adversarial non-quantized inputs — the
  * same behavior as the HOF fold in legacy mode, but NOT under
  * `spark.sql.ansi.enabled`, where the HOF raises
  * ARITHMETIC_OVERFLOW. The bit-identical claim is therefore scoped
  * to inputs where every partial sum stays in int64 (any |v| ≤ 2^27
  * at dims ≤ 2^7 — vastly beyond the int8 range this kernel is
  * for). Checked `Math.multiplyExact`/`addExact` was measured at ~2×
  * on the quantized-search queries (the overflow branch defeats the
  * vectorized reduction), so the exact variant is intentionally NOT
  * used — this scoring kernel exists for exactly that loop.
  */
case class VecIDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecIDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_idot"
}

object VecIDot {
  private[functions] val descriptor = (
    FunctionIdentifier("vec_idot"),
    new ExpressionInfo(classOf[VecIDot].getName, "vec_idot"),
    (children: Seq[Expression]) => VecIDot(children(0), children(1)))
}
