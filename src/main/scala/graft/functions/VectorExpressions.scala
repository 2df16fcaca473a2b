package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Cosine similarity between two `array<float>` embedding vectors.
  *
  * Hot-path scalar for the similarity-search / embedding-dedup operators.
  * A native Catalyst expression with `doGenCode` (stays inside whole-stage
  * codegen, no intermediate arrays) rather than a Scala UDF or a
  * `zip_with`+`aggregate` composition — the latter allocates per-row.
  *
  * The reference engine has no vector ops (bounded relational only,
  * SURVEY.md §1); this is part of the training-data-pipeline extension
  * surface. Returns 0.0 when either vector has zero norm.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<float>, array<float>), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / math.sqrt(nx * ny)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName: two cosine_sim calls in one projection must not collide
      // when nullSafeCodeGen inlines the block unbraced.
      val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
      int $n = java.lang.Math.min($a.numElements(), $b.numElements());
      double $dot = 0.0, $nx = 0.0, $ny = 0.0;
      for (int $i = 0; $i < $n; $i++) {
        double $xi = (double) $a.getFloat($i);
        double $yi = (double) $b.getFloat($i);
        $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
      }
      ${ev.value} = ($nx == 0.0 || $ny == 0.0) ? 0.0 : $dot / java.lang.Math.sqrt($nx * $ny);
    """})

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Packed sign-bit signature of `nPlanes` deterministic pseudo-random
  * hyperplane dot products over an `array<float>` embedding: bit p is
  * set iff dot(x, w(·,p)) > 0, with the integer-exact component family
  * w(i,p) = (((i+1)·(p+7)·2654435761) mod 1000003 − 500001) / 500001 —
  * exactly the arithmetic the DuckDB oracle unrolls, so signatures are
  * bit-identical across engines.
  *
  * One codegen'd pass: nPlanes·dim fused multiply-adds per row and no
  * allocation. The `transform(sequence(...))` + `zip_with`/`aggregate`
  * composition this replaces materialized a 64-element plane vector per
  * row PER PLANE and evaluated the fold through interpreted lambda
  * dispatch — ~8× wall-clock on the 32-plane banded path, and the gap
  * widens with corpus size since this is the per-row scan cost of every
  * LSH index/mining operator.
  */
case class HyperplaneSig(child: Expression, nPlanes: Int)
    extends UnaryExpression {

  require(nPlanes >= 1 && nPlanes <= 63,
    s"hyperplane_sig: nPlanes must be in [1, 63], got $nPlanes")

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_sig expects array<float>, got ${other.sql}")
    }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        val w = (((i + 1).toLong * (p + 7) * 2654435761L) % 1000003L
          - 500001L).toDouble / 500001.0
        dot += x.getFloat(i).toDouble * w
        i += 1
      }
      if (dot > 0.0) sig |= 1L << p
      p += 1
    }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val sig = ctx.freshName("sig")
      val p = ctx.freshName("p"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val w = ctx.freshName("w")
      s"""
      int $n = $a.numElements();
      long $sig = 0L;
      for (int $p = 0; $p < $nPlanes; $p++) {
        double $dot = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $w = (double) ((((long) ($i + 1)) * ($p + 7) * 2654435761L)
            % 1000003L - 500001L) / 500001.0;
          $dot += ((double) $a.getFloat($i)) * $w;
        }
        if ($dot > 0.0) $sig |= 1L << $p;
      }
      ${ev.value} = $sig;
    """})

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
