package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Single-pass text-hash expressions for the dedup family (SURVEY §2.11).
  *
  * Both replace an explode → wide-aggregate pipeline (one shuffle plus 32
  * or 64 aggregate expressions per exploded row) with ONE map-side array
  * traversal per document — the custom-Expression tier of the preference
  * order: at sf0.1 the explode form of simhash spent ~6 s shuffling 1.5 M
  * exploded token rows that a fused loop handles in well under a second,
  * and at 100 TB the removed shuffle is the difference between a scan-rate
  * operator and a job-dominating exchange.
  */

/** `graft_simhash(array<long>) -> long`: 64-bit SimHash over pre-hashed
  * tokens — per-bit ±1 majority vote, bit set iff the vote sum is
  * positive. Bit-identical to the declarative forms in `Dedup.simhash`
  * (unrolled Column expression) and the explode+sum aggregate (asserted in
  * ExtSpec), with one traversal of the token array instead of 64.
  * Empty array → 0L (every vote ties at 0, no bit set); null → null.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects array<bigint>, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    while (i < a.numElements()) {
      val h = a.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $counts[$b] += (((${h} >>> $b) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($counts[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object MinHashSignature {
  /** Per-permutation seed spread (golden-ratio multiplier) and the
    * murmur3 fmix64 avalanche — both public-domain constants. Each
    * "permutation" j is `fmix64(h ^ seed(j))`: independent enough for
    * MinHash's collision-probability estimate, one multiply-xor chain per
    * (element, permutation).
    */
  final val Golden = 0x9E3779B97F4A7C15L

  @inline def mix(v: Long): Long = {
    var h = v
    h ^= h >>> 33
    h *= 0xFF51AFD7ED558CCDL
    h ^= h >>> 33
    h *= 0xC4CEB9FE1A85EC53L
    h ^= h >>> 33
    h
  }
}

/** `graft_isect(array<long>, array<long>) -> int`: intersection size of two
  * SORTED-DISTINCT long arrays by merge walk — O(n+m) with zero
  * allocation, vs the hash-set build `array_intersect` pays per pair.
  * Callers must pre-sort (`sort_array(array_distinct(...))`, done once per
  * row); counts are then identical to `size(array_intersect(a, b))`, so
  * swapping implementations never changes a Jaccard. Union size follows
  * as |a| + |b| - intersection.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_isect expects (array<bigint>, array<bigint>), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_isect"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  long $x = $a.getLong($i); long $y = $b.getLong($j);
         |  if ($x == $y) { $c++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

/** `graft_rplsh(array<double>, nBits) -> long`: random-hyperplane LSH
  * (signed random projection) for cosine similarity — bit b is the sign
  * of the projection of the vector onto the b-th pseudo-random Rademacher
  * (±1) hyperplane, where dim i's ±1 pattern across all 64 bits comes
  * from `fmix64((i+1) * Golden)`. P(bit differs) = angle/π, so Hamming
  * distance estimates the angle and the SimHash chunk-blocking machinery
  * applies unchanged to embedding near-dup search. One traversal of the
  * vector, 64 accumulators; nBits <= 64 (one mixed long per dimension).
  */
case class RandomHyperplaneHash(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_rplsh expects (array<double>, foldable int), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rplsh"

  override protected def nullSafeEval(arr: Any, nb: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val n = nb.asInstanceOf[Int]
    val acc = new Array[Double](n)
    var i = 0
    while (i < a.numElements()) {
      val v = a.getDouble(i)
      val bits = MinHashSignature.mix((i + 1) * MinHashSignature.Golden)
      var b = 0
      while (b < n) {
        if (((bits >>> b) & 1L) == 1L) acc(b) += v else acc(b) -= v
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < n) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, n) => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val v = ctx.freshName("v")
      val bits = ctx.freshName("bits")
      val out = ctx.freshName("out")
      val golden = s"${MinHashSignature.Golden}L"
      s"""
         |double[] $acc = new double[$n];
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $v = $a.getDouble($i);
         |  long $bits = ($i + 1) * $golden;
         |  $bits ^= $bits >>> 33; $bits *= 0xFF51AFD7ED558CCDL;
         |  $bits ^= $bits >>> 33; $bits *= 0xC4CEB9FE1A85EC53L;
         |  $bits ^= $bits >>> 33;
         |  for (int $b = 0; $b < $n; $b++) {
         |    $acc[$b] += ((($bits >>> $b) & 1L) == 1L) ? $v : -$v;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < $n; $b++) {
         |  if ($acc[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RandomHyperplaneHash =
    copy(left = newLeft, right = newRight)
}

/** `graft_minhash(array<long>, n) -> array<long>`: MinHash signature over
  * a pre-hashed shingle set — sig[j] = min over elements of
  * `fmix64(elem ^ (Golden * (j+1)))`. One pass per permutation over the
  * long array, no explode, no shuffle; map-side at scan speed.
  * Empty array → all Long.MaxValue (matches "min over nothing" and can
  * only bucket with other empty docs); null → null. `n` must be a
  * foldable positive integer.
  */
case class MinHashSignature(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_minhash expects (array<bigint>, foldable int), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(arr: Any, nh: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val n = nh.asInstanceOf[Int]
    val sig = new Array[Long](n)
    var j = 0
    while (j < n) {
      var m = Long.MaxValue
      val seed = MinHashSignature.Golden * (j + 1)
      var i = 0
      while (i < a.numElements()) {
        val v = MinHashSignature.mix(a.getLong(i) ^ seed)
        if (v < m) m = v
        i += 1
      }
      sig(j) = m
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, n) => {
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val seed = ctx.freshName("seed")
      val v = ctx.freshName("v")
      val golden = s"${MinHashSignature.Golden}L"
      s"""
         |long[] $sig = new long[$n];
         |for (int $j = 0; $j < $n; $j++) {
         |  long $m = Long.MAX_VALUE;
         |  long $seed = $golden * ($j + 1);
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    long $v = $a.getLong($i) ^ $seed;
         |    $v ^= $v >>> 33; $v *= 0xFF51AFD7ED558CCDL;
         |    $v ^= $v >>> 33; $v *= 0xC4CEB9FE1A85EC53L;
         |    $v ^= $v >>> 33;
         |    if ($v < $m) $m = $v;
         |  }
         |  $sig[$j] = $m;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSignature =
    copy(left = newLeft, right = newRight)
}

/** JVM-static zlib helper shared by the interpreted and codegen paths of
  * [[DeflateRatio]] (the generated Java calls the static forwarder).
  * Deterministic for a fixed JDK's bundled zlib at a fixed level — the
  * spec gate therefore compares the EXPRESSION against this same helper
  * run driver-side, not against frozen byte counts.
  */
object DeflateRatioHelper {
  final val Level = 6

  def compressedLen(b: Array[Byte]): Long = {
    val d = new java.util.zip.Deflater(Level, /*nowrap=*/ true)
    try {
      d.setInput(b); d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  def ratioOf(s: org.apache.spark.unsafe.types.UTF8String): Double = {
    val b = s.getBytes
    compressedLen(b).toDouble / math.max(b.length, 1)
  }
}

/** `graft_deflate_ratio(string) -> double`: zlib-compressed size over raw
  * UTF-8 size — the published repetitiveness/quality signal (highly
  * repetitive boilerplate compresses far below natural prose, and random
  * noise barely compresses at all). Per-row byte work no Column algebra
  * can express, so this is the custom-Expression tier: one fused pass,
  * no UDF serialization, stays inside whole-stage codegen. null → null;
  * empty string → ratio over a 1-byte floor (> 1, callers length-filter
  * first).
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_deflate_ratio expects string, got ${other.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_deflate_ratio"

  override protected def nullSafeEval(input: Any): Any =
    DeflateRatioHelper.ratioOf(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DeflateRatioHelper.ratioOf($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

/** Static helper for [[NfcNormalize]] (generated code calls the
  * forwarder). NFC via `java.text.Normalizer` — pure JVM, locale-free,
  * deterministic for a fixed JDK's Unicode tables.
  */
object NfcNormalizeHelper {
  def nfc(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))
}

/** `graft_nfc(string) -> string`: Unicode NFC normalization — the first
  * step of every published text-dedup recipe (CCNet-class pipelines
  * normalize before hashing, or visually-identical strings hash apart:
  * 'é' composed vs 'e'+combining-acute). Spark ships no NFC function,
  * so this is the custom-Expression tier: java.text.Normalizer behind a
  * codegen'd call, null-safe, no UDF on the hot path.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects string, got ${other.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalizeHelper.nfc(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalizeHelper.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Catalyst OPTIMIZER RULE for the graft expression algebra — the
  * Rule[LogicalPlan] tier of the extension preference order (expressions
  * for scalar work, rules for plan-level simplification): NFC is
  * idempotent, so `graft_nfc(graft_nfc(x))` collapses to one
  * application. The nesting arises naturally when layered pipelines
  * each defensively normalize (TextAnalysis.normalize over an already-
  * normalized store column) — without the rule every row pays the
  * Normalizer twice. Registered via GraftExtensions
  * (injectOptimizerRule), asserted plan-level AND value-level in
  * GraftRulesSpec.
  */
object CollapseIdempotentNfc
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  override def apply(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    plan.transformAllExpressions {
      case NfcNormalize(inner @ NfcNormalize(_)) => inner
    }
}
