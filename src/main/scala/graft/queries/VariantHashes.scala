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
  def hashes(s: UTF8String, k: Int): ArrayData = {
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
    new GenericArrayData(java.util.Arrays.copyOf(out, uniq))
  }

  private def noSurrogates(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (Character.isSurrogate(s.charAt(i))) return false
      i += 1
    }
    true
  }

  def builder(children: Seq[Expression]): Expression = {
    require(children.size == 2,
      s"variant_hashes(name, k) takes 2 arguments, got ${children.size}")
    VariantHashes(children.head,
      children(1).eval().asInstanceOf[Number].intValue)
  }
}
