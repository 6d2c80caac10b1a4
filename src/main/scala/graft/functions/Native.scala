package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hot vector math.
  *
  * The Column-only formulation (`aggregate(zip_with(...))`, see
  * Dedup.cosineCol) is correct but runs the higher-order-function
  * interpreter per element — three lambda invocations and two array
  * allocations per pair. Inside an all-pairs near-dup join that is THE
  * inner loop, so it gets a real `Expression` with whole-stage codegen:
  * one fused pass over both arrays, no allocation.
  *
  * Bit-compatibility contract: accumulates dot/na/nb in index order and
  * computes `dot / sqrt(na) / sqrt(nb)` — operation-for-operation the
  * same as Dedup.cosineCol, so swapping the implementations cannot move
  * a rounded-4-decimals result (asserted in PipelineOpsSpec).
  */
object Native {

  /** Codegen'd cosine similarity between two float/double array columns. */
  def cosine(a: Column, b: Column): Column =
    ColumnShim.column(CosineSimilarity(
      ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Codegen'd single-pass analyzer tokenization (see [[Tokenize]]). */
  def tokenize(c: Column): Column =
    ColumnShim.column(Tokenize(ColumnShim.expression(c)))

  /** Codegen'd per-posting position packing (see [[EncodePositions]]). */
  def encodePositions(c: Column): Column =
    ColumnShim.column(EncodePositions(ColumnShim.expression(c)))

  /** Codegen'd wraparound `a·x + b` hash mix (see [[MixHash]]). */
  def mixHash(c: Column, a: Long, b: Long): Column =
    ColumnShim.column(MixHash(ColumnShim.expression(c), a, b))

  /** Codegen'd fused SQ8 cosine: cos(q, mn + code·step) without
    * materializing the dequantized vector (see [[Sq8Cosine]]). */
  def sq8Cosine(q: Column, code: Column,
                mns: Array[Double], steps: Array[Double]): Column =
    ColumnShim.column(Sq8Cosine(
      ColumnShim.expression(q), ColumnShim.expression(code), mns, steps))

  /** Codegen'd per-document term-frequency map (see [[TokenCounts]]):
    * array<struct<term, tf>> computed row-locally in one tokenize pass. */
  def tokenCounts(c: Column): Column =
    ColumnShim.column(TokenCounts(ColumnShim.expression(c)))

  /** Positional variant: array<struct<term, tf, positions>> (see
    * [[TokenCountsPos]]). */
  def tokenCountsPos(c: Column): Column =
    ColumnShim.column(TokenCountsPos(ColumnShim.expression(c)))
}

/** Wraparound-multiply hash mix `a·x + b (mod 2⁶⁴)` — the classic
  * universal-family permutation for MinHash (`a` odd ⇒ bijection). A
  * Column `*` would raise under ANSI overflow checking; this expression
  * compiles to one Java multiply-add (silent wraparound is exactly the
  * mod-2⁶⁴ semantics wanted), keeping the 128-function signature
  * aggregation at ~1 cycle per function per row instead of a full
  * xxhash64 each. */
case class MixHash(child: Expression, a: Long, b: Long)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    a * input.asInstanceOf[Long] + b

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${a}L * $c + ${b}L;")

  override protected def withNewChildInternal(newChild: Expression): MixHash =
    copy(child = newChild)

  override def prettyName: String = "graft_mix_hash"
}

/** Static kernel behind [[EncodePositions]] (called from generated code). */
object PositionCodecKernel {
  def encode(a: ArrayData): Array[Byte] =
    Codec.encodePositions(a.toLongArray())
}

/** `array<bigint>` (strictly increasing token positions) → `binary`:
  * varint(count) + delta varints via [[Codec.encodePositions]]. Runs in
  * the index build's stage-4 projection BEFORE the (term, salt) exchange
  * so positional builds ship ~1 byte/position instead of a boxed
  * 8-byte-per-element UnsafeRow array (VERDICT r3 #1: positional build
  * paid a 2.4× unpacked exchange). Kernel shared by eval and codegen. */
case class EncodePositions(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with Serializable {

  // containsNull=true accepted: the tf table's parquet round-trip marks
  // elements nullable though the build never writes a null position
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = BinaryType

  override def nullSafeEval(input: Any): Any =
    PositionCodecKernel.encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PositionCodecKernel.encode($c);")

  override protected def withNewChildInternal(newChild: Expression): EncodePositions =
    copy(child = newChild)

  override def prettyName: String = "graft_encode_positions"
}

/** Single-pass kernel behind [[Tokenize]]: lowercase once (UTF8String's
  * own ASCII fast path), then one byte scan emitting zero-copy token
  * slices. Byte-level run detection over the LOWERED utf-8 bytes is
  * exactly codepoint-level `[^a-z0-9]+` splitting: every byte of a
  * multi-byte codepoint is ≥ 0x80, so no non-ASCII codepoint can leak
  * into (or split) an ASCII [a-z0-9] run. Declared as a plain object so
  * the generated Java calls the static forwarder directly. */
object TokenizerKernel {

  @inline private def isTok(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  def tokenize(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val lowered = s.toLowerCase
    val b = lowered.getBytes
    val n = b.length
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    var i = 0
    while (i < n) {
      while (i < n && !isTok(b(i))) i += 1
      val start = i
      while (i < n && isTok(b(i))) i += 1
      if (i > start)
        out += org.apache.spark.unsafe.types.UTF8String.fromBytes(b, start, i - start)
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** Kernel behind [[TokenCounts]]/[[TokenCountsPos]]: the
  * [[TokenizerKernel]] byte scan, with each token folded into a
  * first-occurrence-ordered (term → tf [, positions]) table instead of
  * an output array — the per-DOCUMENT term-frequency aggregation
  * computed row-locally. This is what lets the index build's stage 1
  * skip its (docID, term) grouping SHUFFLE entirely: every token of a
  * document lives in one source row, so grouping by (docID, term) never
  * needed an exchange — the 93M-row/3.6 GB stage-1 shuffle was pure
  * overhead (VERDICT r4 #2: the build's 2→8-core scaling was
  * bus-bound, and stage 1 was the dominant byte mover).
  * Token-for-token identical to grouping the [[TokenizerKernel]] output
  * by construction (same scan, same slices); positions are emitted in
  * scan order, i.e. already sorted ascending. */
object TokenCountsKernel {

  @inline private def isTok(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  def counts(s: org.apache.spark.unsafe.types.UTF8String,
             withPositions: Boolean)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val lowered = s.toLowerCase
    val b = lowered.getBytes
    val n = b.length
    val order = new scala.collection.mutable.ArrayBuffer[
      org.apache.spark.unsafe.types.UTF8String](8)
    val tfs = new scala.collection.mutable.ArrayBuffer[Long](8)
    val poss =
      if (withPositions)
        new scala.collection.mutable.ArrayBuffer[
          scala.collection.mutable.ArrayBuffer[Long]](8)
      else null
    val idx = new java.util.HashMap[
      org.apache.spark.unsafe.types.UTF8String, Integer]()
    var i = 0
    var tokIdx = 0L
    while (i < n) {
      while (i < n && !isTok(b(i))) i += 1
      val start = i
      while (i < n && isTok(b(i))) i += 1
      if (i > start) {
        val t = org.apache.spark.unsafe.types.UTF8String
          .fromBytes(b, start, i - start)
        val id = idx.get(t)
        if (id == null) {
          idx.put(t, order.length)
          order += t
          tfs += 1L
          if (poss != null) {
            val pb = new scala.collection.mutable.ArrayBuffer[Long](4)
            pb += tokIdx
            poss += pb
          }
        } else {
          tfs(id) += 1L
          if (poss != null) poss(id) += tokIdx
        }
        tokIdx += 1L
      }
    }
    val out = new Array[Any](order.length)
    var j = 0
    while (j < order.length) {
      out(j) =
        if (poss == null) new GenericInternalRow(Array[Any](order(j), tfs(j)))
        else new GenericInternalRow(Array[Any](order(j), tfs(j),
          new GenericArrayData(poss(j).toArray)))
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Per-document term frequencies as ONE native expression:
  * `array<struct<term: string, tf: bigint>>` in first-occurrence order.
  * `explode` + a struct projection turns it into the (docID, term, tf)
  * frame — with NO grouping exchange (see [[TokenCountsKernel]]). */
case class TokenCounts(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TokenCountsKernel.counts(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      withPositions = false)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenCountsKernel.counts($c, false);")

  override protected def withNewChildInternal(newChild: Expression): TokenCounts =
    copy(child = newChild)

  override def prettyName: String = "graft_token_counts"
}

/** Positional variant of [[TokenCounts]]:
  * `array<struct<term, tf, positions: array<bigint>>>` — positions are
  * the 0-based token indexes of the term, ascending by construction. */
case class TokenCountsPos(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false),
      StructField("positions",
        ArrayType(LongType, containsNull = false), nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TokenCountsKernel.counts(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      withPositions = true)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenCountsKernel.counts($c, true);")

  override protected def withNewChildInternal(newChild: Expression): TokenCountsPos =
    copy(child = newChild)

  override def prettyName: String = "graft_token_counts_pos"
}

/** The analyzer chain `filter(split(lower(s), "[^a-z0-9]+"), _ != '')`
  * fused into ONE native expression. The built-in formulation is three
  * codegen'd passes — a full lowered copy, a regex-engine split
  * allocating a String per fragment (empties included), and a
  * higher-order filter re-walking the array — executed once per
  * document per build; tokenization dominates the index build's tf
  * stage, so it gets the charter's tier-(b) treatment (native Expression
  * with doGenCode) like [[CosineSimilarity]].
  *
  * Semantics contract: bit-identical output to
  * `Analyzer.tokensColBuiltin` on ALL inputs — same lowercase call
  * (UTF8String.toLowerCase, which is what `lower()` executes under the
  * default UTF8_BINARY collation) and a byte-run scan equivalent to the
  * regex (see [[TokenizerKernel]]); asserted property-style in
  * AnalyzerSpec including non-ASCII edge cases (Kelvin sign U+212A
  * lowers INTO 'k' and must join a token, exactly as the regex path). */
case class Tokenize(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TokenizerKernel.tokenize(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenizerKernel.tokenize($c);")

  override protected def withNewChildInternal(newChild: Expression): Tokenize =
    copy(child = newChild)

  override def prettyName: String = "graft_tokenize"
}

/** cos(a, b) = Σaᵢbᵢ / √Σaᵢ² / √Σbᵢ², null if either side is null, if
  * the lengths differ, or if any element is null — exactly matching the
  * higher-order-function formulation (`zip_with` pads a length mismatch
  * with nulls and a null element poisons the aggregate), so the two
  * implementations agree on ALL inputs, not just well-formed ones
  * (ADVICE r1). Element access is unrolled by element type at codegen
  * time; element null checks compile away when containsNull=false. */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression with Serializable {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> arguments, " +
        s"got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def elemMayBeNull(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val af = elemIsFloat(left)
    val bf = elemIsFloat(right)
    val n = a.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x: Double = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y: Double = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / math.sqrt(na) / math.sqrt(nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val bGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val nullCheck =
        if (elemMayBeNull(left) || elemMayBeNull(right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    double $x = (double) $a.$aGet($i);
         |    double $y = (double) $b.$bGet($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / java.lang.Math.sqrt($na) / java.lang.Math.sqrt($nb);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_cosine"
}

/** Fused scalar-quantized cosine: `cos(q, d)` where
  * `d_j = mn_j + code_j · step_j`, computed in ONE pass over the int
  * codes without materializing the dequantized array. The composed
  * formulation (`transform(code, (c,i) => element_at(mns,i+1) +
  * c·element_at(steps,i+1))` then [[CosineSimilarity]]) allocates a
  * dim-wide double array per corpus row and walks two literal arrays
  * through element_at per element — in the SQ8 approximate scan that is
  * THE inner loop over every (query, corpus) pair, so it gets the same
  * tier-(b) treatment as [[CosineSimilarity]].
  *
  * Bit-compatibility contract: per element computes
  * `d = mn[i] + (double) code[i] * step[i]` and accumulates dot/nq/nd in
  * index order, finishing `dot / sqrt(nq) / sqrt(nd)` — operation-for-
  * operation the dequant-HOF + [[CosineSimilarity]] composition, so
  * swapping implementations cannot move a rounded-4-decimals result
  * (asserted in PipelineOpsSpec). Null if either array is null, the
  * lengths disagree with each other or the grid, or any element is null
  * (the composed path yields null in each of those cases too). */
case class Sq8Cosine(left: Expression, right: Expression,
                     mns: Array[Double], steps: Array[Double])
  extends BinaryExpression with Serializable {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(IntegerType, _))
      if mns.length == steps.length => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<int>) arguments and an " +
        s"aligned grid, got ${left.dataType.catalogString}, " +
        s"${right.dataType.catalogString}, grid ${mns.length}/${steps.length}")
  }

  override def dataType: DataType = DoubleType

  private def elemMayBeNull(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(l: Any, r: Any): Any = {
    val q = l.asInstanceOf[ArrayData]
    val c = r.asInstanceOf[ArrayData]
    val n = q.numElements()
    if (n != c.numElements() || n != mns.length) return null
    var dot = 0.0
    var nq = 0.0
    var nd = 0.0
    var i = 0
    while (i < n) {
      if (q.isNullAt(i) || c.isNullAt(i)) return null
      val x = q.getDouble(i)
      val d = mns(i) + c.getInt(i).toDouble * steps(i)
      dot += x * d
      nq += x * x
      nd += d * d
      i += 1
    }
    dot / math.sqrt(nq) / math.sqrt(nd)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mnsRef = ctx.addReferenceObj("mns", mns, "double[]")
    val stepsRef = ctx.addReferenceObj("steps", steps, "double[]")
    nullSafeCodeGen(ctx, ev, (q, c) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nq = ctx.freshName("nq")
      val nd = ctx.freshName("nd")
      val x = ctx.freshName("x")
      val d = ctx.freshName("d")
      val nullCheck =
        if (elemMayBeNull(left) || elemMayBeNull(right))
          s"if ($q.isNullAt($i) || $c.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $q.numElements();
         |if ($n != $c.numElements() || $n != $mnsRef.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $nq = 0.0; double $nd = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    double $x = $q.getDouble($i);
         |    double $d = $mnsRef[$i] + (double) $c.getInt($i) * $stepsRef[$i];
         |    $dot += $x * $d; $nq += $x * $x; $nd += $d * $d;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / java.lang.Math.sqrt($nq) / java.lang.Math.sqrt($nd);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Sq8Cosine =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sq8_cosine"
}
