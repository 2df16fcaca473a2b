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

/** Exact integer squared-L2 distance between two `array<bigint>`
  * quantized vectors: Σ (aᵢ − bᵢ)², a single codegen'd loop.
  *
  * Replaces the `aggregate(zip_with(...))` composition `ivfIntDist`
  * shipped with through round 14: higher-order functions are
  * CodegenFallback in Spark — every distance evaluation allocated an
  * intermediate 64-element array and walked two interpreted lambda
  * dispatches per element. That interpreted cost IS the IVF build:
  * the sampled trainer alone evaluates 3·256·K² distances (1.5·10⁸ at
  * sf10) and measured 360 s — dominating the index build after round
  * 15's two-level routing removed the N×K assignment wall. Same
  * integer arithmetic bit-for-bit (inputs are ±1000-bounded
  * quantizations, so Σ diff² ≤ 64·4·10⁶ — nowhere near int64), so
  * every DuckDB twin (`list_sum(list_transform(range(64), …))`) is
  * unchanged.
  *
  * Callers feed fixed-dimension arrays (both sides are 64-dim
  * quantized vectors by construction). Round 16: a length mismatch or
  * a null element returns NULL — the semantics of the replaced
  * `aggregate(zip_with(...))` form — so a malformed vector surfaces as
  * a null downstream instead of a silently wrong distance. The
  * per-element null checks are emitted only when the static
  * `containsNull` flag says nulls are possible; the length check is
  * one comparison per row.
  */
case class IntL2Dist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  private def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, cn) => cn
    case _                => true
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"int_l2 expects (array<bigint>, array<bigint>), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val checkNulls = elemNullable(left) || elemNullable(right)
    var s = 0L; var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      val d = x.getLong(i) - y.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val s = ctx.freshName("s")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      val bad = ctx.freshName("bad")
      val nullCheck =
        if (elemNullable(left) || elemNullable(right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }"
        else ""
      s"""
      int $n = $a.numElements();
      if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
        long $s = 0L; boolean $bad = false;
        for (int $i = 0; $i < $n; $i++) {
          $nullCheck
          long $d = $a.getLong($i) - $b.getLong($i);
          $s += $d * $d;
        }
        if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
      }
    """})

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** IVF cell argmin: the centroid id minimizing exact integer squared-L2
  * distance to `vec`, ties to the SMALLER cid — over a centroid table
  * carried as one broadcast `array<struct<cid:bigint, cv:array<bigint>>>`
  * value, one codegen'd loop per row.
  *
  * This is the assignment step's true shape: K is bounded (√N sizing,
  * ≤ ~thousands) while N is the corpus, so materializing an N×K join
  * and collapsing it back through a hash aggregate whose GROUPING KEY
  * is the 64-long vector (the round-14 `ivfAssign`) pays row-copy and
  * array-hash costs ∝ N·K for what is per-row scalar arithmetic. With
  * the centroids as ONE broadcast array value, each Lloyd round / cell
  * assignment is a linear whole-stage-codegen projection: K·dim fused
  * ops per row, no join fan-out, no shuffle, no array-key hashing.
  * Identical arithmetic to the struct-MIN form ((dist, cid)
  * lexicographic minimum, exact int64), so every DuckDB row_number
  * twin is unchanged. Returns null for a null vector, an empty
  * centroid array (callers filter, matching the join form's implicit
  * drop), or — round 16, matching [[IntL2Dist]] — any dimension
  * mismatch / null element between the vector and a candidate: a
  * malformed input poisons the whole argmin to null rather than
  * silently ranking against a truncated distance. Null/length checks
  * beyond the one per-candidate comparison are gated on the static
  * `containsNull` flags.
  */
case class IvfArgmin(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _),
            ArrayType(StructType(Array(a, b)), _)) =>
        a.dataType == LongType && b.dataType == ArrayType(LongType, false) ||
          a.dataType == LongType && b.dataType == ArrayType(LongType, true)
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"ivf_argmin expects (array<bigint>, array<struct<bigint, array<bigint>>>), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def nullable: Boolean = true

  private def qvElemNullable: Boolean = left.dataType match {
    case ArrayType(_, cn) => cn
    case _                => true
  }
  private def centStructNullable: Boolean = right.dataType match {
    case ArrayType(_, cn) => cn
    case _                => true
  }
  private def centFieldNullable: Boolean = right.dataType match {
    case ArrayType(StructType(fs), _) if fs.length == 2 =>
      fs(0).nullable || fs(1).nullable
    case _ => true
  }
  private def cvElemNullable: Boolean = right.dataType match {
    case ArrayType(StructType(fs), _) if fs.length == 2 =>
      fs(1).dataType match {
        case ArrayType(_, cn) => cn
        case _                => true
      }
    case _ => true
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val qv = a.asInstanceOf[ArrayData]
    val carr = b.asInstanceOf[ArrayData]
    val k = carr.numElements()
    if (k == 0) return null
    val nq = qv.numElements()
    val checkElems = qvElemNullable || cvElemNullable
    var bestDist = Long.MaxValue; var bestCid = Long.MaxValue
    var j = 0
    while (j < k) {
      if (centStructNullable && carr.isNullAt(j)) return null
      val row = carr.getStruct(j, 2)
      if (centFieldNullable && (row.isNullAt(0) || row.isNullAt(1)))
        return null
      val cid = row.getLong(0)
      val cv = row.getArray(1)
      if (cv.numElements() != nq) return null
      var s = 0L; var i = 0
      while (i < nq) {
        if (checkElems && (qv.isNullAt(i) || cv.isNullAt(i))) return null
        val d = qv.getLong(i) - cv.getLong(i)
        s += d * d
        i += 1
      }
      if (s < bestDist || (s == bestDist && cid < bestCid)) {
        bestDist = s; bestCid = cid
      }
      j += 1
    }
    bestCid
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val k = ctx.freshName("k"); val j = ctx.freshName("j")
      val row = ctx.freshName("row"); val cid = ctx.freshName("cid")
      val cv = ctx.freshName("cv"); val nq = ctx.freshName("nq")
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      val d = ctx.freshName("d"); val bad = ctx.freshName("bad")
      val bd = ctx.freshName("bestDist"); val bc = ctx.freshName("bestCid")
      val structCheck =
        if (centStructNullable)
          s"if ($b.isNullAt($j)) { $bad = true; break; }"
        else ""
      val fieldCheck =
        if (centFieldNullable)
          s"if ($row.isNullAt(0) || $row.isNullAt(1)) { $bad = true; break; }"
        else ""
      val elemCheck =
        if (qvElemNullable || cvElemNullable)
          s"if ($a.isNullAt($i) || $cv.isNullAt($i)) { $bad = true; break; }"
        else ""
      s"""
      int $k = $b.numElements();
      if ($k == 0) { ${ev.isNull} = true; } else {
        int $nq = $a.numElements();
        long $bd = Long.MAX_VALUE; long $bc = Long.MAX_VALUE;
        boolean $bad = false;
        for (int $j = 0; $j < $k; $j++) {
          $structCheck
          InternalRow $row = $b.getStruct($j, 2);
          $fieldCheck
          long $cid = $row.getLong(0);
          ArrayData $cv = $row.getArray(1);
          if ($cv.numElements() != $nq) { $bad = true; break; }
          long $s = 0L;
          for (int $i = 0; $i < $nq; $i++) {
            $elemCheck
            long $d = $a.getLong($i) - $cv.getLong($i);
            $s += $d * $d;
          }
          if ($bad) break;
          if ($s < $bd || ($s == $bd && $cid < $bc)) { $bd = $s; $bc = $cid; }
        }
        if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $bc; }
      }
    """})

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
