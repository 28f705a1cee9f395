package graft.queries

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding APPLY as a native expression:
  * `bpe_encode(text, merges)` splits `text` into code-point tokens and
  * applies each merge rule in order; rule k merges every adjacent
  * token pair `(a_k, b_k)` left-to-right in one scan (after a merge
  * the scan continues past the merged pair — standard BPE apply
  * semantics, equal to ONE non-overlapping string replace of
  * `|a||b|` -> `|ab|` over the each-token-wrapped string, which is
  * exactly how the DuckDB oracle computes it; PropertiesSpec pins the
  * equivalence on random inputs). Each rule is a string `"a b"` — two
  * space-free operands separated by one space; the merged token is
  * their concatenation.
  *
  * Real tokenization is per-row compute over a scan — the expression
  * is codegen'd (one static call, no HOF lambda dispatch) so the
  * projection stays inside whole-stage codegen, and the merge table
  * argument is parsed ONCE per plan when foldable (the learned-vocab
  * literal), not per row. At 100 TB this runs embarrassingly parallel
  * with zero data movement, like the rest of the text family.
  *
  * No reference counterpart (the reference stops at SQL transforms);
  * this extends the engine for LLM training-data work where exact
  * token counts gate packing and cost estimates.
  */
case class BpeEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bpe_encode expects (string, array<string>), got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  /** The merge table is a literal in every real plan (learned once,
    * passed as `lit(...)`): parse it a single time at plan build. */
  @transient private lazy val foldedRules: Array[Array[String]] =
    if (right.foldable) {
      val v = right.eval(null)
      if (v == null) null else BpeEncode.parseRules(v.asInstanceOf[ArrayData])
    } else null

  override protected def nullSafeEval(t: Any, m: Any): Any = {
    val rules =
      if (foldedRules != null) foldedRules
      else BpeEncode.parseRules(m.asInstanceOf[ArrayData])
    BpeEncode.encode(t.asInstanceOf[UTF8String], rules)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, m) => {
      val rulesTerm =
        if (foldedRules != null)
          ctx.addReferenceObj("bpeRules", foldedRules, "java.lang.String[][]")
        else s"graft.queries.BpeEncode.parseRules($m)"
      s"${ev.value} = graft.queries.BpeEncode.encode($t, $rulesTerm);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeEncode =
    copy(left = newLeft, right = newRight)
}

object BpeEncode {

  /** `"a b"` -> `[a, b]`; operands are space-free by contract (the
    * learner never emits space operands), so the FIRST space is the
    * separator and anything after a second space is malformed. */
  def parseRules(m: ArrayData): Array[Array[String]] = {
    val n = m.numElements()
    val out = new Array[Array[String]](n)
    var i = 0
    while (i < n) {
      val rule = m.getUTF8String(i).toString
      val sp = rule.indexOf(' ')
      require(sp > 0 && sp < rule.length - 1 &&
        rule.indexOf(' ', sp + 1) < 0,
        s"malformed bpe merge rule '$rule' (want 'a b')")
      out(i) = Array(rule.substring(0, sp), rule.substring(sp + 1))
      i += 1
    }
    out
  }

  /** Static kernel shared by eval and generated code. Every BPE token
    * is a CONTIGUOUS span of the source text (char tokens are, and
    * merging adjacent tokens concatenates adjacent spans), so tokens
    * live as (start, end) index pairs: each rule pass is two cursors
    * over two int arrays with `regionMatches` operand tests — zero
    * allocation until the final materialization. The length check
    * rejects most candidates before any char compare. Code-point
    * split keeps surrogate pairs whole (the normalized corpus is
    * ASCII but the expression must not corrupt arbitrary input). */
  def encode(text: UTF8String, rules: Array[Array[String]]): ArrayData = {
    val s = text.toString
    val len = s.length
    val starts = new Array[Int](len)
    val ends = new Array[Int](len)
    var n = 0
    var ci = 0
    while (ci < len) {
      val w = Character.charCount(s.codePointAt(ci))
      starts(n) = ci
      ends(n) = ci + w
      n += 1
      ci += w
    }
    var r = 0
    while (r < rules.length) {
      val a = rules(r)(0)
      val b = rules(r)(1)
      val la = a.length
      val lb = b.length
      var read = 0
      var write = 0
      while (read < n) {
        if (read + 1 < n &&
            ends(read) - starts(read) == la &&
            ends(read + 1) - starts(read + 1) == lb &&
            s.regionMatches(starts(read), a, 0, la) &&
            s.regionMatches(starts(read + 1), b, 0, lb)) {
          // adjacent list entries are always adjacent source spans,
          // so the merged token is the single widened span
          starts(write) = starts(read)
          ends(write) = ends(read + 1)
          read += 2
        } else {
          starts(write) = starts(read)
          ends(write) = ends(read)
          read += 1
        }
        write += 1
      }
      n = write
      r += 1
    }
    val out = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      out(i) = UTF8String.fromString(s.substring(starts(i), ends(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  def builder(children: Seq[Expression]): Expression = {
    require(children.size == 2,
      s"bpe_encode(text, merges) takes 2 arguments, got ${children.size}")
    BpeEncode(children.head, children(1))
  }
}
