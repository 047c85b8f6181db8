package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd whole-word containment — the word finder's hot
  * predicate (usr_functions.c:149-186 semantics: case-SENSITIVE match,
  * a word boundary is start/end-of-line or any char outside
  * `[0-9A-Za-z]`, underscore included as a boundary).
  *
  * The regex form (`rlike` with explicit lookarounds,
  * TextJobs.wholeWordPattern) walks java.util.regex's NFA and allocates
  * a Matcher per row; this expression emits a tight byte-scan loop into
  * whole-stage codegen instead. Byte-level matching is exact for UTF-8:
  * the needle's byte string can only match at char starts (UTF-8 is
  * self-synchronizing), and every continuation/multibyte byte is >= 0x80
  * so the ASCII-only boundary test classifies it as a boundary — the
  * same answer the char-level regex gives.
  *
  * Null text or null word yields null (matching `rlike`); an EMPTY word
  * matches nothing (the reference driver rejects empty words up front,
  * main.c finder contract — `rlike` with an empty quoted pattern would
  * instead match every line with any boundary position, a foot-gun this
  * expression removes).
  */
case class WholeWordContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_word_match expects (string, string), got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def nullSafeEval(t: Any, w: Any): Any =
    WholeWordContains.containsWord(
      t.asInstanceOf[UTF8String].getBytes, w.asInstanceOf[UTF8String].getBytes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, w) => {
      val cls = WholeWordContains.getClass.getName // object class w/ MODULE$
      s"${ev.value} = $cls.MODULE$$.containsWord($t.getBytes(), $w.getBytes());"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WholeWordContains =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_word_match"
}

object WholeWordContains {
  @inline private def isAlnum(b: Byte): Boolean =
    (b >= '0' && b <= '9') || (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')

  /** Byte-level whole-word scan; shared by interpreted eval and the
    * generated code (one static-ish call per row, loop inside — the
    * JIT inlines it; what matters is no Matcher allocation and no NFA).
    */
  def containsWord(tb: Array[Byte], wb: Array[Byte]): Boolean = {
    val wn = wb.length
    val tn = tb.length
    if (wn == 0 || wn > tn) return false
    val first = wb(0)
    var i = 0
    val last = tn - wn
    while (i <= last) {
      if (tb(i) == first) {
        var j = 1
        while (j < wn && tb(i + j) == wb(j)) j += 1
        if (j == wn &&
            (i == 0 || !isAlnum(tb(i - 1))) &&
            (i + wn == tn || !isAlnum(tb(i + wn)))) return true
      }
      i += 1
    }
    false
  }
}
