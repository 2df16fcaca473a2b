package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `tok_hashes(text)` — the whole per-token hashing stage of the dedup
  * pipeline fused into ONE expression: split on single spaces (identical
  * to `split(text, " ")`, trailing/empty tokens kept) and hash every
  * token with the cross-engine md5-prefix hash
  * `conv(substring(md5(tok), 1, 15), 16, 10) % (2^31 − 1)`.
  *
  * Bit-identical to the composed form (`transform(split(...), t =>
  * conv(substring(md5(t), 1, 15), 16, 10) % P)`) — pinned by a
  * ScalaCheck property in `FunctionsSpec` over unicode corpora — but
  * skips its three per-token string materializations (the 32-char hex
  * rendering, the substring copy, and conv's string→long parse), digesting
  * the token's UTF-8 bytes in place instead: the first 60 bits of the md5
  * state are taken directly from the digest bytes. This is the per-row
  * scan cost of every MinHash/LSH/Jaccard operator (one md5 per token
  * over the whole corpus), the same fuse-the-scan-stage argument as
  * [[HyperplaneSig]].
  *
  * UTF-8 note: the split byte 0x20 can never appear inside a multi-byte
  * sequence, so byte-level splitting equals Java's char-level
  * `split(" ", -1)` on any valid UTF-8 input.
  */
case class TokHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"tok_hashes expects string, got ${other.sql}")
    }

  override def nullSafeEval(a: Any): Any =
    TokHashes.compute(a.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokHashes.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** `shingle_hashes(text, k)` — the shingle-grain twin of [[TokHashes]]:
  * md5-prefix hashes of every k-token shingle (tokens joined by a single
  * space), empty when the text has fewer than k tokens — exactly the
  * DuckDB oracle's `list_transform(range(len(toks) − k + 1), ...)`
  * semantics. Unlike the token grain, shingle fingerprints are the RAW
  * 60-bit fold (`('0x' || substr(md5(x),1,15))::BIGINT` in DuckDB, no
  * `% P`): window cardinality at 100 TB exceeds 2^31 by orders of
  * magnitude, so the 31-bit reduction would saturate (round-17 fix;
  * the MinHash `% P` domain is token-grain-only).
  * Each shingle digest streams the token byte spans plus
  * separator spaces straight into the digest — no joined string, no hex
  * rendering, no conv parse. This is the d04/d16 corpus-scan stage (one
  * md5 over ~k tokens of bytes per position).
  */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1 && k <= 64, s"shingle_hashes: k must be in [1, 64], got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hashes expects string, got ${other.sql}")
    }

  override def nullSafeEval(a: Any): Any =
    TokHashes.computeShingles(a.asInstanceOf[UTF8String], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokHashes.computeShingles($c, $k)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** `inter_count(a, b)` — |a ∩ b| over two `array<bigint>` columns with
  * SET semantics, fused into one codegen'd pass (round 16, guide §4):
  * exactly `size(array_intersect(a, b))` — the Jaccard numerator every
  * pair-verification stage computes per candidate pair — without
  * materializing the intersection ARRAY and without ArrayIntersect's
  * boxed per-element hash set. One primitive open-addressing table is
  * built from b (distinct-insert), then a's elements probe it with
  * remove-on-hit, so duplicates on either side count once — the
  * array_intersect contract — including its null-element rule (a null
  * in BOTH arrays counts once), so the swap is semantics-free on any
  * input. Per-element null checks are emitted only when the static
  * containsNull flag says nulls are possible (the IntL2Dist discipline;
  * every engine lineage is tok_hashes / shingle_hashes / array_distinct
  * / collect_set with containsNull=false — the checks exist for
  * artifact-read columns whose parquet schema round-trip widens the
  * flag).
  */
case class IntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = LongType

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
      s"inter_count expects (array<bigint>, array<bigint>), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectCount.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], elemNullable(left), elemNullable(right))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.IntersectCount.compute($a, $b, " +
        s"${elemNullable(left)}, ${elemNullable(right)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IntersectCount {
  /** Murmur-style avalanche to a non-negative long — spreads the
    * md5-folded token hashes across the table. */
  private def scramble(v: Long): Long = {
    val h = v * -7046029254386353131L
    (h ^ (h >>> 32)) & Long.MaxValue
  }

  /** Called from both interpreted eval and generated code. Open
    * addressing with linear probing at load factor ≤ 0.5; slot states:
    * 0 = empty, 1 = present, 2 = already counted (so duplicates on
    * either side count once — array_intersect's distinct semantics).
    * chkA/chkB are compile-time constants in generated code (the static
    * containsNull flags), so the null branches vanish under JIT on the
    * null-free lineages. A null element present in both arrays counts
    * once — array_intersect's rule. */
  def compute(a: ArrayData, b: ArrayData,
              chkA: Boolean, chkB: Boolean): Long = {
    val n = b.numElements()
    val m = a.numElements()
    if (n == 0 || m == 0) return 0L
    // Capacity math in Long: `n << 1` on Int overflows negative for
    // n ≥ 2^30, leaving a 4-slot table and an infinite probe loop
    // (unreachable for realistic arrays — 2^30 longs is an 8 GiB cell —
    // but fail loudly rather than hang; ADVICE r16 hardening).
    require(n < (1 << 30),
      s"inter_count: array of $n elements exceeds the 2^30 table bound")
    var capL = 4L
    while (capL < 2L * n) capL <<= 1
    val cap = capL.toInt
    val mask = cap - 1
    val keys = new Array[Long](cap)
    val state = new Array[Byte](cap)
    var bHasNull = false
    var i = 0
    while (i < n) {
      if (chkB && b.isNullAt(i)) bHasNull = true
      else {
        val v = b.getLong(i)
        var j = (scramble(v) & mask).toInt
        while (state(j) != 0 && keys(j) != v) j = (j + 1) & mask
        if (state(j) == 0) { state(j) = 1; keys(j) = v }
      }
      i += 1
    }
    var cnt = 0L
    var nullCounted = false
    i = 0
    while (i < m) {
      if (chkA && a.isNullAt(i)) {
        if (bHasNull && !nullCounted) { nullCounted = true; cnt += 1 }
      } else {
        val v = a.getLong(i)
        var j = (scramble(v) & mask).toInt
        while (state(j) != 0 && keys(j) != v) j = (j + 1) & mask
        if (state(j) == 1) { state(j) = 2; cnt += 1 }
      }
      i += 1
    }
    cnt
  }
}

/** `simhash16(hashes)` — the 16-bit SimHash bit-majority vote over an
  * `array<bigint>` of token hashes, fused into one codegen'd loop
  * (round 16, guide §4): for each bit j, vote +1 per element with bit j
  * set and −1 otherwise; the result sets bit j iff the vote is
  * positive. Bit-identical to the `(0 until 16).map(j => aggregate(th,
  * ...))` higher-order composition it replaces — that form dispatched
  * 16 interpreted lambda folds per ROW (16·|tokens| interpreted ops —
  * the d16 signature pass and the streaming near-dedup's per-doc cost);
  * this walks the array once, accumulating all 16 votes. Null elements
  * cannot occur (`tok_hashes` declares containsNull=false). A null
  * array yields NULL — note this DIFFERS from the replaced HOF
  * composition, whose when(...).otherwise(0) sum gave 0 for a null
  * array: a null-TEXT doc now keys on NULL instead of sharing key 0
  * with real all-zero-vote docs (strictly a better dedup key; every
  * batch consumer filters `text IS NOT NULL` upstream, so only
  * StreamOps.nearDedupStream can observe it). StreamingSpec pins the
  * row-wise result equal to d05's distributed groupBy simhash.
  */
case class Simhash16(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, false) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash16 expects array<bigint> (containsNull=false), " +
            s"got ${other.sql}")
    }

  override def nullSafeEval(a: Any): Any =
    Simhash16.compute(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Simhash16.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object Simhash16 {
  /** Called from both interpreted eval and generated code. */
  def compute(th: ArrayData): Long = {
    val n = th.numElements()
    // votes(j) = Σ ±1 over elements for bit j; start at −n and add 2 per
    // set bit — equivalent and branch-free per element.
    val votes = new Array[Int](16)
    var i = 0
    while (i < n) {
      val h = th.getLong(i)
      var j = 0
      while (j < 16) {
        if (((h >> j) & 1L) == 1L) votes(j) += 2
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 16) {
      if (votes(j) - n > 0) sig |= 1L << j
      j += 1
    }
    sig
  }
}

object TokHashes {
  private val P = 2147483647L // 2^31 - 1, the shared token-hash modulus
  private val Space = Array[Byte](0x20)

  private val mdLocal =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
  private val bufLocal = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }

  /** First 60 digest bits — conv(substring(md5,1,15),16,10), always
    * non-negative, fits BIGINT in both engines. Round 17: this raw
    * fold is the WINDOW/SHINGLE fingerprint space. The previous
    * `% P` reduction (31 bits) only exists for the TOKEN grain, where
    * the MinHash affine permutations need values < P and the vocab is
    * ≪ 2^31; at the 100 TB window cardinality (~10^11–10^13) a 31-bit
    * space saturates and every dup-span/contamination mark becomes
    * birthday noise, while 60 bits keep expected collisions ≈ 0
    * (~10^-6 at 10^12 windows). */
  private def fold60(h: Array[Byte]): Long = {
    var v = 0L
    var j = 0
    while (j < 7) { v = (v << 8) | (h(j) & 0xffL); j += 1 }
    (v << 4) | ((h(7) & 0xffL) >>> 4)
  }

  def computeShingles(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    val md = mdLocal.get()
    val h = bufLocal.get()
    // token spans: starts(t) .. ends(t) (exclusive)
    var nTokens = 1
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) nTokens += 1
      i += 1
    }
    val starts = new Array[Int](nTokens)
    val ends = new Array[Int](nTokens)
    var tok = 0
    starts(0) = 0
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) {
        ends(tok) = i; tok += 1; starts(tok) = i + 1
      }
      i += 1
    }
    ends(tok) = bytes.length
    if (nTokens < k) return ArrayData.toArrayData(Array.emptyLongArray)
    val out = new Array[Long](nTokens - k + 1)
    var p = 0
    while (p <= nTokens - k) {
      md.reset()
      var t = p
      while (t < p + k) {
        if (t > p) md.update(Space, 0, 1)
        md.update(bytes, starts(t), ends(t) - starts(t))
        t += 1
      }
      md.digest(h, 0, 16)
      out(p) = fold60(h)
      p += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Called from both interpreted eval and generated code. */
  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val md = mdLocal.get()
    val h = bufLocal.get() // digest into a reused buffer: one less
                           // allocation per token on the corpus scan
    var nTokens = 1
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) nTokens += 1
      i += 1
    }
    val out = new Array[Long](nTokens)
    var tok = 0
    var start = 0
    i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == 0x20) {
        md.reset()
        md.update(bytes, start, i - start)
        md.digest(h, 0, 16)
        out(tok) = fold60(h) % P // token grain: the MinHash domain
        tok += 1
        start = i + 1
      }
      i += 1
    }
    ArrayData.toArrayData(out)
  }
}
