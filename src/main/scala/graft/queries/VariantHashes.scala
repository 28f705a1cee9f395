package graft.queries

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `variant_hashes(name, k)` — the FastSS deletion neighborhood as
  * NATIVE 64-bit hashes: the distinct fingerprints of the string
  * itself, every 1-deletion, and (k = 2) every 2-deletion, without
  * ever materializing a variant string.
  *
  * The naive formulation (`transform(sequence(...), i -> concat(
  * substring...))` + `array_distinct` + a hash) allocates
  * 1 + L + L(L−1)/2 substrings-and-concats per row and then compares
  * them pairwise to dedupe — measured at sf0.1 it was the single
  * largest CPU term of the fuzzy-join plan (the variant index is
  * (L²/2)·n rows). Here each variant's fingerprint is assembled in
  * O(L) long multiplies from prefix Horner hashes (content-only, so
  * EQUAL VARIANT STRINGS GET EQUAL HASHES regardless of which
  * positions were deleted — the bucketing semantics are exactly
  * "group by variant string", same as before), finalized with a
  * murmur64 mix, and deduped by sorting the long array. Total cost
  * O(L²) multiplies and ONE long-array allocation per row, with no
  * string churn — and the kernel lives inside whole-stage codegen
  * via the [[ZorderKey]] static-kernel pattern.
  *
  * 64-bit collisions (2⁻⁶⁴ per bucket pair) are the same modeling
  * assumption the previous 60-bit md5-prefix key made; the fuzzy-join
  * oracles are naive O(n²) sweeps, so the hash never needs to agree
  * with another engine.
  */
case class VariantHashes(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"variant_hashes expects a string, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "variant_hashes"

  override protected def nullSafeEval(v: Any): Any =
    VariantHashes.hashes(v.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.queries.VariantHashes.hashes($v, $k);")

  override protected def withNewChildInternal(newChild: Expression): VariantHashes =
    copy(child = newChild)
}

object VariantHashes {

  private val B = 0x9E3779B97F4A7C15L // odd golden-ratio multiplier

  private def fmix64(v: Long): Long = {
    var x = v
    x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL
    x ^= x >>> 33; x *= 0xC4CEB9FE1A85EC53L
    x ^= x >>> 33
    x
  }

  /** Static kernel shared by eval and generated code. */
  def hashes(s: UTF8String, k: Int): ArrayData =
    new GenericArrayData(hashArray(s, k))

  /** The sorted, deduped fingerprint array itself — shared with
    * [[MinSharedVariantHash]], which intersects two of these. */
  def hashArray(s: UTF8String, k: Int): Array[Long] = {
    val str = s.toString
    // code points, so the neighborhood agrees with boundedLev /
    // levenshtein beyond the BMP
    val c: Array[Int] =
      if (noSurrogates(str)) null else str.codePoints().toArray
    val n = if (c == null) str.length else c.length
    def cp(i: Int): Long =
      (if (c == null) str.charAt(i).toLong else c(i).toLong) + 1L
    // prefix Horner hashes and powers of B: seg(a, b) recovers the
    // content-only hash of s[a, b) for any slice
    val p = new Array[Long](n + 1)
    val pw = new Array[Long](n + 1)
    pw(0) = 1L
    var i = 0
    while (i < n) {
      p(i + 1) = p(i) * B + cp(i)
      pw(i + 1) = pw(i) * B
      i += 1
    }
    def seg(a: Int, b: Int): Long = p(b) - p(a) * pw(b - a)
    val total = 1 + n + (if (k >= 2 && n >= 2) n * (n - 1) / 2 else 0)
    val out = new Array[Long](total)
    var w = 0
    out(w) = fmix64(p(n) ^ (n.toLong * 0x632BE59BD9B4E019L)); w += 1
    i = 0
    while (i < n) { // delete position i
      val h = seg(0, i) * pw(n - i - 1) + seg(i + 1, n)
      out(w) = fmix64(h ^ ((n - 1).toLong * 0x632BE59BD9B4E019L)); w += 1
      i += 1
    }
    if (k >= 2 && n >= 2) {
      i = 0
      while (i < n - 1) {
        var j = i + 1
        while (j < n) { // delete positions i < j
          val h = (seg(0, i) * pw(j - i - 1) + seg(i + 1, j)) * pw(n - j - 1) +
            seg(j + 1, n)
          out(w) = fmix64(h ^ ((n - 2).toLong * 0x632BE59BD9B4E019L)); w += 1
          j += 1
        }
        i += 1
      }
    }
    // dedupe (adjacent equal characters make distinct deletions yield
    // the same variant string, hence the same fingerprint)
    java.util.Arrays.sort(out)
    var uniq = if (total > 0) 1 else 0
    i = 1
    while (i < total) {
      if (out(i) != out(i - 1)) { out(uniq) = out(i); uniq += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(out, uniq)
  }

  /** Minimum common fingerprint of two SORTED unique long arrays —
    * one merge walk. [[java.lang.Long.MIN_VALUE]] when disjoint
    * (callers only evaluate this on pairs that share a bucket, where
    * the FastSS theorem guarantees a common variant; MIN_VALUE is a
    * loud no-match sentinel rather than a silent drop because sorted
    * order makes the true minimum always ≥ the first element). */
  def minSharedOf(a: Array[Long], b: Array[Long]): Long = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) return a(i)
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    java.lang.Long.MIN_VALUE
  }

  /** Per-thread LRU memo of name → fingerprint array. The canonical-
    * bucket filter evaluates [[minShared]] once per CANDIDATE pair,
    * and within a bucket every member recurs in ~df pairs — without
    * the memo each evaluation re-runs two O(L²) kernels (several
    * short-lived array allocations plus a sort each), which at tens
    * of millions of candidates is pure GC churn (measured: the d2
    * self-join went 6 s → 30 s when the filter ran uncached). The
    * cache is bounded by BYTES, not entry count: a k=2 neighborhood
    * is ~L²/2 fingerprints, so one 128-char name retains ~66 KB —
    * an entry-count bound that is safe for short names OOMs an
    * executor on an address/title corpus (16384 × 66 KB × threads is
    * multi-GB of retained ThreadLocal state). 24 MB per task thread
    * holds ~16k short names or ~370 max-length ones; the hash-join
    * probe stream interleaves buckets, so on corpora whose
    * per-partition working set exceeds the budget, cost degrades
    * gracefully to one O(L²) kernel per surviving candidate. Keyed
    * by String COPY, never by UTF8String — codegen reuses the
    * backing buffers row to row. */
  private val FpCacheBudgetBytes = 24L << 20
  private final class FpCache
    extends java.util.LinkedHashMap[String, Array[Long]](1024, 0.75f, true) {
    var bytes: Long = 0L
  }
  // 2 bytes/char + 8 bytes/long, plus ~160 B of fixed retained heap
  // per entry: LinkedHashMap.Entry (~48 B), the String object + its
  // value-array header (~56 B), the long[] header (~16 B), and an
  // amortized hash-table slot — undercounting the overhead would let
  // a short-name corpus retain well past the stated budget
  private def entryCost(key: String, a: Array[Long]): Long =
    160L + key.length * 2L + a.length * 8L
  private val fpCache: ThreadLocal[FpCache] =
    ThreadLocal.withInitial(() => new FpCache)

  /** Test hook: the calling thread's current cache accounting. */
  private[graft] def fpCacheBytesForTest: Long = fpCache.get.bytes
  private[graft] def fpCacheEntriesForTest: Int = fpCache.get.size()

  private def cachedHashArray(s: UTF8String, k: Int): Array[Long] = {
    // k is part of the key (k=1 and k=2 neighborhoods differ)
    val key = k.toString + s.toString
    val m = fpCache.get
    var a = m.get(key)
    if (a == null) {
      a = hashArray(s, k)
      m.put(key, a)
      m.bytes += entryCost(key, a)
      if (m.bytes > FpCacheBudgetBytes) {
        // access-order iteration starts at the least recently used
        val it = m.entrySet().iterator()
        while (m.bytes > FpCacheBudgetBytes && it.hasNext) {
          val e = it.next()
          m.bytes -= entryCost(e.getKey, e.getValue)
          it.remove()
        }
      }
    }
    a
  }

  /** Static kernel for [[MinSharedVariantHash]]. */
  def minShared(a: UTF8String, b: UTF8String, k: Int): Long =
    minSharedOf(cachedHashArray(a, k), cachedHashArray(b, k))

  private def noSurrogates(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (Character.isSurrogate(s.charAt(i))) return false
      i += 1
    }
    true
  }

  /** Validates the `k` argument at registration time: it must be a
    * foldable non-null numeric in {1, 2} — a column, NULL, or k ≥ 3
    * previously surfaced as an NPE/ClassCastException at plan time
    * (and k ≥ 3 would silently compute only the 2-deletion
    * neighborhood, since the kernel enumerates at most 2 deletions). */
  private[graft] def foldableK(children: Seq[Expression], fn: String): Int = {
    val kExpr = children(1)
    require(kExpr.foldable,
      s"$fn: k must be a literal, got ${kExpr.sql}")
    val v = kExpr.eval()
    require(v != null, s"$fn: k must not be NULL")
    val k = v match {
      case n: Number => n.intValue
      case other => throw new IllegalArgumentException(
        s"$fn: k must be numeric, got $other")
    }
    require(k == 1 || k == 2,
      s"$fn: k must be 1 or 2 (deletion neighborhoods beyond 2 are " +
        s"not enumerated), got $k")
    k
  }

  def builder(children: Seq[Expression]): Expression = {
    require(children.size == 2,
      s"variant_hashes(name, k) takes 2 arguments, got ${children.size}")
    VariantHashes(children.head, foldableK(children, "variant_hashes"))
  }
}

/** `min_shared_variant_hash(a, b, k)` — the MINIMUM fingerprint the
  * two strings' deletion neighborhoods share ([[Long.MinValue]] when
  * disjoint). The fuzzy join's exactly-once emission rule: a pair
  * within distance k shares ≥ 1 variant bucket (FastSS), and every
  * shared bucket sees the pair as a candidate — so emitting ONLY
  * from the bucket equal to this minimum makes each pair's emission
  * unique across the whole plan (light and heavy tier alike), which
  * removes the multi-million-row dedup shuffle the per-bucket
  * emission otherwise needs. Costs two O(L²) kernel evaluations per
  * checked pair — run it AFTER the bounded levenshtein filter. */
case class MinSharedVariantHash(left: Expression, right: Expression, k: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"min_shared_variant_hash expects two strings, got ${l.sql}, ${r.sql}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "min_shared_variant_hash"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VariantHashes.minShared(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.queries.VariantHashes.minShared($a, $b, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinSharedVariantHash =
    copy(left = newLeft, right = newRight)
}

object MinSharedVariantHash {
  def builder(children: Seq[Expression]): Expression = {
    require(children.size == 3,
      s"min_shared_variant_hash(a, b, k) takes 3 arguments, got ${children.size}")
    MinSharedVariantHash(children.head, children(1),
      VariantHashes.foldableK(
        Seq(children.head, children(2)), "min_shared_variant_hash"))
  }
}

/** `bounded_lev(a, b, k)` — exact Levenshtein distance when ≤ k, else
  * −1, backed by [[FuzzyJoin.boundedLev]] (prefix/suffix stripping +
  * thread-local DP rows + k-band early abandon). The built-in
  * `levenshtein(a, b, k)` was measured at ~5 µs per call on 18-char
  * linkage keys — per-call allocation dominated — which at tens of
  * millions of candidate pairs was the single largest CPU term of the
  * fuzzy-join plans; this kernel runs the same contract at ~0.1 µs. */
case class BoundedLevExpr(left: Expression, right: Expression, k: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bounded_lev expects two strings, got ${l.sql}, ${r.sql}")
    }

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "bounded_lev"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    FuzzyJoin.boundedLev(
      a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.queries.FuzzyJoin.boundedLev(" +
        s"$a.toString(), $b.toString(), $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedLevExpr =
    copy(left = newLeft, right = newRight)
}

object BoundedLevExpr {
  def builder(children: Seq[Expression]): Expression = {
    require(children.size == 3,
      s"bounded_lev(a, b, k) takes 3 arguments, got ${children.size}")
    val kExpr = children(2)
    require(kExpr.foldable, s"bounded_lev: k must be a literal, got ${kExpr.sql}")
    val v = kExpr.eval()
    require(v != null, "bounded_lev: k must not be NULL")
    val k = v.asInstanceOf[Number].intValue
    require(k >= 0, s"bounded_lev: k must be >= 0, got $k")
    BoundedLevExpr(children.head, children(1), k)
  }
}
