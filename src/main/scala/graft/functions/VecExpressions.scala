package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Native Catalyst expression for embedding similarity: cosine over two
 * `array<float>` columns in one fused primitive loop.
 *
 * Why an Expression and not a HOF/UDF: the `aggregate(zip_with(...))`
 * formulation builds an intermediate product array per pair and walks it
 * with interpreted lambda calls (HOFs never enter whole-stage codegen);
 * a Scala UDF would add serialization at the boundary. This expression
 * participates in codegen (`doGenCode` emits the loop straight into the
 * generated consume path), so the ANN rerank inner loop runs as primitive
 * Java — no boxing, no intermediate arrays.
 *
 * Semantics mirror the HOF formula bit-for-bit on every NON-degenerate
 * input so the DuckDB oracles are unaffected: mismatched dimensions
 * yield NULL (zip_with pads the shorter array with nulls, poisoning the
 * HOF sum), all accumulation in Double in index order,
 * `dot / (sqrt(na) * sqrt(nb))`. A null array OR a null element
 * anywhere yields NULL. One DELIBERATE divergence (pinned in VecSpec):
 * zero vectors return NaN here — total function — while the HOF
 * formulation THROWS DIVIDE_BY_ZERO under the session's ANSI default.
 */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    if (nx != ny) return null
    // ONE fused pass: the three accumulators sum independently in index
    // order, so fusing is bit-identical to the three-loop form while
    // halving the memory traffic of the ANN rerank inner loop
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < nx) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val bad = ctx.freshName("bad")
      // every temporary through freshName — a bare local would collide
      // with an enclosing generated scope and fail Janino compilation
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
        final int $nx = $a.numElements();
        final int $ny = $b.numElements();
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        boolean $bad = $nx != $ny;
        for (int $i = 0; $i < $nx && !$bad; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; }
          else {
            final double $xv = (double) $a.getFloat($i);
            final double $yv = (double) $b.getFloat($i);
            $dot += $xv * $yv;
            $na += $xv * $xv;
            $nb += $yv * $yv;
          }
        }
        if ($bad) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Session registration for the vector expressions (the
 * SparkSessionExtensions.injectFunction path, minus the extension jar:
 * idempotent per session, callable from any query entry point). */
object Vec {
  val CosineName = "graft_cosine"

  /** One builder shared by the programmatic path (register) and the
   * SparkSessionExtensions path (graft.GraftExtensions) so the two can
   * never diverge. */
  val cosineBuilder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, s"$CosineName expects 2 arguments")
    CosineSim(args.head, args(1))
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(CosineName))) {
      reg.createOrReplaceTempFunction(CosineName, cosineBuilder, "built-in")
    }
  }
}
