package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_dhash(binary, int, int) -> bigint`: the 9×8 difference hash of
  * an 8-bit image plane — nearest-neighbor grid sample, bit (j·8+i) set
  * when grid(i,j) > grid(i+1,j). Bit-identical to the declarative form
  * in `Multimodal.dHash` (asserted in ExtSpec), but the declarative tree
  * is ~200 nodes of hex/substr/conv per row whose per-plan Janino
  * compile DOMINATED the image gates (lambda-free but huge: ~1.5-2 s per
  * distinct plan against microseconds of row work); this expression
  * generates ONE static call, so the image pipelines keep whole-stage
  * codegen without paying the tree. Empty plane → 0L; null input OR
  * non-positive width/height → null (degenerate geometry must NOT
  * collapse onto hash 0 — all such rows would become mutual hamming-0
  * "duplicates" and dedup stages would silently drop all but one).
  */
object DHash64 {
  /** Long arithmetic throughout: j·height and sy·width+sx stay exact for
    * any int geometry, matching the declarative form's double-exact
    * floor-division (both reduce to integer division on non-negatives;
    * floorMod keeps the two forms aligned even on adversarial inputs
    * that slip past the expression-level geometry guard).
    */
  def compute(plane: Array[Byte], width: Int, height: Int): Long = {
    val n = plane.length
    if (n == 0) return 0L
    var out = 0L
    var j = 0
    while (j < 8) {
      val sy = j.toLong * height / 8
      var i = 0
      var prevIdx = Math.floorMod(sy * width, n.toLong) // i = 0 -> sx = 0
      var prev = plane(prevIdx.toInt) & 0xff
      while (i < 8) {
        val sx = (i + 1).toLong * width / 9
        val idx = Math.floorMod(sy * width + sx, n.toLong)
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
  override def nullable: Boolean = true // null on non-positive geometry
  override def prettyName: String = "graft_dhash"

  override protected def nullSafeEval(m: Any, w: Any, h: Any): Any = {
    val (wi, hi) = (w.asInstanceOf[Int], h.asInstanceOf[Int])
    if (wi <= 0 || hi <= 0) null
    else DHash64.compute(m.asInstanceOf[Array[Byte]], wi, hi)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (m, w, h) =>
      s"""
         |if ($w <= 0 || $h <= 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.DHash64.compute($m, $w, $h);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): DHash64 =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** External-type result of the pixel-aware dHash (the UDF-fallback and
  * test-visible shape): `sh` the 64-bit hash, `kind` the regime that
  * produced it — "pixels" (decoded PNG/JPEG/GIF/BMP grayscale plane) or
  * "payload" (opaque bytes, the [[DHash64]] semantics).
  */
final case class PxHash(sh: Long, kind: String)

/** `graft_dhash_px(binary, int, int) -> struct<sh: bigint, kind: string>`:
  * the PIXEL-AWARE perceptual dHash. When the payload decodes as PNG
  * (inflate + scanline unfilter) or JPEG (ImageIO) the hash is computed
  * over the decoded BT.601 grayscale plane with 9×8 AREA-MEAN
  * downsampling — so two different ENCODINGS of the same picture (the
  * single most common image-dup class in a crawl: re-filtered or
  * re-deflated PNG, re-compressed JPEG) hash identically or a few bits
  * apart. Non-decodable payloads fall back to [[DHash64]] over the raw
  * bytes with the caller-provided geometry — byte-identical to
  * `graft_dhash`, so existing stores built on fake/opaque payloads keep
  * their signatures. `kind` records the regime per row (the decode-census
  * discipline: at corpus scale "how many images actually got perceptual
  * treatment" must be a queryable number).
  *
  * Null contract: null media -> null; payload regime with non-positive
  * geometry -> null (degenerate rows must not cluster at one hash —
  * callers pass `coalesce(width, 0)` so a null metadata column lands
  * here rather than nulling out a decodable PNG whose real geometry
  * comes from its own header).
  *
  * Cell comparison is INTEGER cross-multiplication (sum_a·n_b >
  * sum_b·n_a), never a float mean, so every bit is restatable in plain
  * SQL — the `ext_image_dhash_px` oracle replays the decode arithmetic
  * from stored-deflate PNG bytes in DuckDB. Exact for any plane under
  * the 2^24-pixel decode cap (sum < 2^32, n < 2^24, product < 2^56).
  */
object DHashPixels {
  private val KindPixels = "pixels"
  private val KindPayload = "payload"

  val schema: StructType = StructType(Seq(
    StructField("sh", LongType, nullable = false),
    StructField("kind", StringType, nullable = false)))

  /** dHash over a decoded w×h grayscale plane: means over the 9×8 area
    * grid (cell [i·w/9, (i+1)·w/9) × [j·h/8, (j+1)·h/8), widened to at
    * least one pixel for tiny planes), bit (j·8+i) set when
    * mean(i,j) > mean(i+1,j).
    */
  def computeGrid(plane: Array[Byte], w: Int, h: Int): Long = {
    val sums = new Array[Long](72) // 9 cols x 8 rows
    val areas = new Array[Long](72)
    var j = 0
    while (j < 8) {
      val y0 = j * h / 8
      var y1 = (j + 1) * h / 8
      if (y1 <= y0) y1 = y0 + 1
      var i = 0
      while (i < 9) {
        val x0 = i * w / 9
        var x1 = (i + 1) * w / 9
        if (x1 <= x0) x1 = x0 + 1
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += plane(y * w + x) & 0xff; x += 1 }
          y += 1
        }
        sums(j * 9 + i) = s
        areas(j * 9 + i) = (y1 - y0).toLong * (x1 - x0)
        i += 1
      }
      j += 1
    }
    var out = 0L
    j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) {
        val a = j * 9 + i
        // mean_a > mean_b  <=>  sum_a * n_b > sum_b * n_a (exact)
        if (sums(a) * areas(a + 1) > sums(a + 1) * areas(a))
          out |= 1L << (j * 8 + i)
        i += 1
      }
      j += 1
    }
    out
  }

  /** External-type form (UDF fallback + tests): None means null. */
  def computeExternal(media: Array[Byte], width: Int, height: Int): Option[PxHash] = {
    if (media == null) return None
    graft.ext.Multimodal.ContainerCodec.grayPlane(media) match {
      case Some((plane, w, h)) => Some(PxHash(computeGrid(plane, w, h), KindPixels))
      case None =>
        if (width <= 0 || height <= 0) None
        else Some(PxHash(DHash64.compute(media, width, height), KindPayload))
    }
  }

  /** Internal-type form the expression calls: null means null struct. */
  def compute(media: Array[Byte], width: Int, height: Int): InternalRow =
    computeExternal(media, width, height) match {
      case Some(PxHash(sh, kind)) =>
        new GenericInternalRow(Array[Any](sh, UTF8String.fromString(kind)))
      case None => null
    }
}

case class DHashPixels(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_dhash_px expects (binary, int, int), got $other")
    }
  override def dataType: DataType = DHashPixels.schema
  override def nullable: Boolean = true // null on degenerate payload rows
  override def prettyName: String = "graft_dhash_px"

  override protected def nullSafeEval(m: Any, w: Any, h: Any): Any =
    DHashPixels.compute(m.asInstanceOf[Array[Byte]],
      w.asInstanceOf[Int], h.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (m, w, h) => {
      val row = ctx.freshName("pxRow")
      s"""
         |InternalRow $row = graft.functions.DHashPixels.compute($m, $w, $h);
         |if ($row == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $row;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): DHashPixels =
    copy(first = newFirst, second = newSecond, third = newThird)
}
