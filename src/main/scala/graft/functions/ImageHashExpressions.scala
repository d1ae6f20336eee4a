package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.types._

/** `graft_dhash(binary, int, int) -> bigint`: the 9×8 difference hash of
  * an 8-bit image plane — nearest-neighbor grid sample, bit (j·8+i) set
  * when grid(i,j) > grid(i+1,j). Bit-identical to the declarative form
  * in `Multimodal.dHash` (asserted in ExtSpec), but the declarative tree
  * is ~200 nodes of hex/substr/conv per row whose per-plan Janino
  * compile DOMINATED the image gates (lambda-free but huge: ~1.5-2 s per
  * distinct plan against microseconds of row work); this expression
  * generates ONE static call, so the image pipelines keep whole-stage
  * codegen without paying the tree. Empty plane → 0L; null input → null
  * (callers that need the declarative form's null→0 coalesce on top —
  * `Multimodal.dHashAuto` does).
  */
object DHash64 {
  /** Long arithmetic throughout: j·height and sy·width+sx stay exact for
    * any int geometry, matching the declarative form's double-exact
    * floor-division (both reduce to integer division on non-negatives).
    */
  def compute(plane: Array[Byte], width: Int, height: Int): Long = {
    val n = plane.length
    if (n == 0) return 0L
    var out = 0L
    var j = 0
    while (j < 8) {
      val sy = j.toLong * height / 8
      var i = 0
      var prevIdx = (sy * width) % n // i = 0 -> sx = 0
      var prev = plane(prevIdx.toInt) & 0xff
      while (i < 8) {
        val sx = (i + 1).toLong * width / 9
        val idx = (sy * width + sx) % n
        val next = plane(idx.toInt) & 0xff
        if (prev > next) out |= 1L << (j * 8 + i)
        prev = next
        i += 1
      }
      j += 1
    }
    out
  }
}

case class DHash64(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_dhash expects (binary, int, int), got $other")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dhash"

  override protected def nullSafeEval(m: Any, w: Any, h: Any): Any =
    DHash64.compute(m.asInstanceOf[Array[Byte]],
      w.asInstanceOf[Int], h.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (m, w, h) =>
      s"${ev.value} = graft.functions.DHash64.compute($m, $w, $h);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): DHash64 =
    copy(first = newFirst, second = newSecond, third = newThird)
}
