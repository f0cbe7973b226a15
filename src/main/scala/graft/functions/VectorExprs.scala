// Custom Catalyst expressions live under org.apache.spark.sql so they can
// use the private[sql] expression-building surface (ExpressionUtils,
// AbstractDataType) — the same placement Spark's own extension libraries
// use. Engine code accesses them only through the stable facade below.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native vector expressions (SURVEY.md §3: custom Catalyst Expression
  * over UDF over anything else).
  *
  * Spark's higher-order functions (`aggregate`/`zip_with`) are
  * CodegenFallback: each row pays interpreted-lambda overhead, and the
  * enclosing operator falls out of whole-stage codegen — benchmarked ~150x
  * slower than DuckDB's native list_dot_product on the all-pairs cosine
  * sweep. [[DotProduct]] generates a tight primitive double loop instead,
  * keeping the whole pipeline inside codegen. Semantics are the same
  * strict sequential left fold, so results are bit-identical to the HOF
  * formulation and to DuckDB's list_dot_product.
  */
object VectorExprs {
  /** Distributed bloom-filter build over xxhash64 of `c` — Spark's own
    * BloomFilterAggregate (the runtime-filter machinery), exposed as a
    * Column so an engine query can build a semi-join prefilter as ONE
    * map-combined aggregate: each task folds its rows into a fixed-size
    * bit array, partials OR together, and only `numBits/8` bytes ever
    * reach the driver regardless of corpus size. */
  def bloomAgg(c: Column, estimatedItems: Long, numBits: Long): Column = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    ExpressionUtils.column(new BloomFilterAggregate(
      new XxHash64(Seq(ExpressionUtils.expression(c))),
      Literal(estimatedItems), Literal(numBits)).toAggregateExpression())
  }

  /** might_contain(bloomBytes, xxhash64(c)) — the probe side of
    * [[bloomAgg]], planted as a literal so the whole prefilter stays in
    * whole-stage codegen (BloomFilterMightContain requires a constant
    * or scalar-subquery filter; the byte array is fixed-size by
    * construction). */
  def bloomMightContain(bloomBytes: Array[Byte], c: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    ExpressionUtils.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType),
      new XxHash64(Seq(ExpressionUtils.expression(c)))))
  }

  /** dot(a, b) over array<double> as a codegen'd primitive loop. Arrays
    * must be null-free (embedding columns are); lengths are clamped to the
    * shorter side. */
  def dotp(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Bridge to the private[sql] Column↔Expression conversion, for engine
    * code outside the sql package (e.g. lineage analysis over Columns). */
  def expressionOf(c: Column): Expression = ExpressionUtils.expression(c)

  /** Symmetric int8 quantization of an embedding: byte_i =
    * floor(v_i * (127 / max|v|) + 0.5), packed little-endian into BINARY
    * — 1/8 the bytes of array<double> (the difference between scanning
    * 100 TB and 12.5 TB for an ANN sweep). Cosine is scale-invariant, so
    * quantized similarity search needs no dequantization at all; for
    * value reconstruction store [[int8Scale]] alongside. Deterministic
    * (pure IEEE ops), so any engine reproduces identical bytes. */
  def quantizeInt8(v: Column): Column =
    ExpressionUtils.column(QuantizeInt8(ExpressionUtils.expression(v)))

  /** The quantization scale 127 / max|v| (0 for a zero vector):
    * dequantize as q_i / scale. */
  def int8Scale(v: Column): Column =
    ExpressionUtils.column(Int8Scale(ExpressionUtils.expression(v)))

  /** Exact integer dot product of two packed int8 vectors (sum of signed
    * byte products, as long) — the quantized-cosine kernel. */
  def dotInt8(a: Column, b: Column): Column =
    ExpressionUtils.column(DotInt8(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** (qv, scale) in one kernel — one max-abs pass instead of the two
    * that separate [[quantizeInt8]]/[[int8Scale]] projections would run
    * (distinct expression classes, so codegen cannot CSE across them). */
  def quantizeInt8Pair(v: Column): Column =
    ExpressionUtils.column(QuantizeInt8Pair(ExpressionUtils.expression(v)))

  /** Elementwise vector difference a - b (clamped to the shorter length)
    * — the residual step of IVF-PQ: r = v - centroid, fed straight into
    * [[quantizeInt8Pair]]. Codegen'd primitive loop; null-free input
    * contract like the other kernels. */
  def subVec(a: Column, b: Column): Column =
    ExpressionUtils.column(SubVec(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Inverse of [[quantizeInt8]]: byte_i / scale as array<double> (all
    * zeros when scale == 0, the zero-vector sentinel — avoids 0/0 NaN).
    * Pure IEEE division, so reconstruction is deterministic in any
    * engine. */
  def dequantizeInt8(qv: Column, scale: Column): Column =
    ExpressionUtils.column(DequantizeInt8(
      ExpressionUtils.expression(qv), ExpressionUtils.expression(scale)))

  /** md5Long(s, start, len): the hex nibbles [start, start+len) of
    * md5(s) as a long — bit-identical to
    * `conv(substring(md5(s), start, len), 16, 10).cast(LongType)` (and
    * to DuckDB's `('0x'||substr(md5(s),start,len))::BIGINT`), which is
    * the engine's standard portable hash. That chain materializes a
    * 32-char hex string, slices it, and PARSES it back per row — pure
    * allocation/parse overhead on paths that hash tens of millions of
    * shingles/tokens per pass. This kernel digests the raw UTF-8 bytes
    * and assembles the nibbles directly (one thread-local MessageDigest,
    * zero intermediate strings). start is 1-based like substring;
    * len <= 15 keeps the value positive. */
  def md5Long(s: Column, start: Int, len: Int): Column =
    ExpressionUtils.column(Md5NibblesLong(ExpressionUtils.expression(s), start, len))

  /** Order-preserving bits of a double as a signed long (the classic
    * sortable-bits trick: flip all non-sign bits of negatives so signed
    * long comparison reproduces IEEE total order, NaN above +Inf —
    * Spark's own double ordering). High bits of the result are a
    * monotone fixed-range bucketing of the ENTIRE double line, which is
    * what lets quantile selection histogram values without a min/max
    * pre-pass: no data-dependent bucket bounds, no broadcast-stats join,
    * one fewer corpus scan. */
  def sortableBits(v: Column): Column =
    ExpressionUtils.column(SortableDoubleBits(ExpressionUtils.expression(v)))

  /** termCounts(text): per-document term frequencies as
    * array<struct<term, tf>> in ONE pass over the string — the tf stage
    * of tfidf-shaped pipelines as a per-ROW kernel. A document is one
    * row, so its term histogram never needed a corpus-wide
    * groupBy(doc_id, term): that shuffle moves every token's STRING
    * across the wire only to land back on rows that were already
    * together. This kernel splits on ' ' (identical semantics to
    * split+filter≠'' and DuckDB's string_split), counts into a small
    * open hash map, and emits first-occurrence order (deterministic).
    * Eval-based (the per-row work amortizes the interpreted call;
    * string-map codegen would be all boilerplate, no loop win). */
  def termCounts(s: Column): Column =
    ExpressionUtils.column(TermCounts(ExpressionUtils.expression(s)))

  /** distinctTermHashes(text): xxhash64 of every DISTINCT non-empty term
    * as array<long> in ONE pass — the df side of tfidf-shaped pipelines.
    * A document-frequency aggregate needs only (term-hash) per
    * (doc, distinct term): materializing the term STRINGS and tf counts
    * ([[termCounts]] + explode + xxhash64) just to throw both away pays
    * struct allocation, UTF8String slices, and a per-term hash of a
    * re-materialized string. This kernel hashes each word's byte span
    * in place (XXH64 seed 42 — bit-identical to xxhash64(term) of the
    * split term by the same byte-range identity shingle3Md5Long uses),
    * dedups in a primitive open-addressing set, and emits
    * first-occurrence order. */
  def distinctTermHashes(s: Column): Column =
    ExpressionUtils.column(DistinctTermHashes(ExpressionUtils.expression(s)))

  /** shingle3Md5Long(text, start, len): md5-prefix longs of every word
    * 3-gram of `text` as array<long>, in ONE pass with ZERO per-shingle
    * allocation. The key identity: splitting on a single space and
    * re-joining consecutive words with single spaces reconstructs the
    * ORIGINAL byte range (space is 0x20, never a UTF-8 continuation
    * byte), so shingle i is literally text[wordStart(i), wordEnd(i+2))
    * and the digest runs over the source bytes directly — bit-identical
    * to md5(concat_ws(' ', w[i], w[i+1], w[i+2])) and to the DuckDB
    * oracle's string_split chain, without materializing the zip structs,
    * the joined strings, or the tall text column the previous
    * explode+concat_ws+md5 pipeline allocated per shingle. */
  def shingle3Md5Long(text: Column, start: Int, len: Int): Column =
    ExpressionUtils.column(Shingle3Md5Long(ExpressionUtils.expression(text), start, len))

  /** winnowFps(text, w, start, len): distinct sliding-window minima of
    * the word-3-gram md5-prefix hashes (winnowing fingerprints) in ONE
    * pass — bit-equal to array_distinct over the HOF window-min of
    * [[shingle3Md5Long]] (spec-pinned), without the per-window slice
    * allocations. */
  def winnowFps(text: Column, w: Int, start: Int, len: Int): Column =
    ExpressionUtils.column(WinnowFps(ExpressionUtils.expression(text), w, start, len))

  /** bigramHashes(text): (k1, k12) XXH64 key pairs for every adjacent
    * word pair, zero string allocation — see [[BigramXxh64]]. */
  def bigramHashes(text: Column): Column =
    ExpressionUtils.column(BigramKeyPairs(ExpressionUtils.expression(text)))

  /** minhashSigs(text, a, b, p): the k-value MinHash signature of the
    * word-3-gram shingle set as array<long>, in ONE pass per row — the
    * per-row-kernel form of the signature aggregation (the tf-idf
    * termCounts lesson applied to MinHash): a document is one row, so
    * its signature never needed a corpus-wide explode + groupBy. NULL
    * (dropped by posexplode) when the doc has <3 words, matching the
    * aggregate path where such docs have no tall rows. Bit-identical to
    * min((a_j·((md5-prefix % p)) + b_j) % p) over the exploded shingle
    * table — and to the DuckDB oracle's list_min formulation. */
  def minhashSigs(text: Column, a: Seq[Long], b: Seq[Long], p: Long): Column =
    ExpressionUtils.column(MinhashSigs(ExpressionUtils.expression(text), a, b, p))

  /** lshBuckets(v, planes, nTables, nPlanes): all L hyperplane-LSH
    * bucket ids of a vector as array<int>, one tight loop per row —
    * the per-row-kernel form of the 144-plane-dot expression tree the
    * multi-table path needs. The declarative tree (nTables·nPlanes
    * separate dot(v, literal-plane) sub-expressions) generates a method
    * past the JIT/codegen size limits and falls back to per-expression
    * interpretation (~500 µs/row measured — the dominant stage of
    * ann_lsh_multi); this kernel is the same sequential multiply-add
    * order, so every sign (and thus every bucket id) is bit-identical
    * to the expression form AND to the DuckDB oracle's
    * list_dot_product. `planes` is the flattened [t·nPlanes+p][dim]
    * ±1 weight table. */
  def lshBuckets(v: Column, planes: Seq[Double], nTables: Int,
                 nPlanes: Int): Column =
    ExpressionUtils.column(
      LshBuckets(ExpressionUtils.expression(v), planes, nTables, nPlanes))

  /** simhash64(text): the 64-bit SimHash signature as [lo32, hi32] in one
    * pass per row — per-token md5, ±1 bit votes in a 64-slot local
    * array, majority pack. Replaces the tall token explode + 64
    * sum-aggregate groupBy (the signature was always a per-ROW value).
    * Token semantics mirror split(text, ' ') with limit -1: empty tokens
    * (consecutive/leading/trailing spaces) vote too, exactly as the
    * exploded formulation counts them. Bit-identical to the aggregate
    * path and the DuckDB oracle. */
  def simhash64(text: Column): Column =
    ExpressionUtils.column(Simhash64(ExpressionUtils.expression(text)))

  /** bigramXxh64(text): the chained-xxhash64 identity of every adjacent
    * word pair as array<long>, one pass per row. Element i equals
    * xxhash64(w[i], w[i+1]) exactly — Spark's two-child fold
    * XXH64(w[i+1], XXH64(w[i], 42)) over the same bytes — so consumers
    * that shuffle bigram identities (fluency's corpus rarity count) drop
    * the arrays_zip struct explode without changing a single output
    * bit. Split semantics mirror split(text, ' ') limit -1 (empty words
    * pair too). NULL when the doc has <2 words, so explode drops it like
    * the zip filter did. */
  def bigramXxh64(text: Column): Column =
    ExpressionUtils.column(BigramXxh64(ExpressionUtils.expression(text)))

  /** signPack(v, start): one 32-bit half of the 1-bit sign quantization
    * — bit b (of the result's low 32) set iff v[start+b] > 0.0 — as a
    * codegen'd primitive loop. Replaces the
    * `aggregate(transform(sequence(...)))` HOF pack, which is
    * CodegenFallback (interpreted lambda per row, enclosing operator
    * drops out of whole-stage codegen) on the one scan that IS the
    * Hamming-ANN workload at 100 TB. Bit-equal to the HOF fold by
    * construction: distinct powers of two sum == or; out-of-range and
    * NULL elements contribute 0 exactly as IF(NULL > 0D, ..) takes the
    * else branch (spec-pinned in OperatorsSpec). */
  def signPack(v: Column, start: Int): Column =
    ExpressionUtils.column(SignPack(ExpressionUtils.expression(v), start))

  /** nearestCell(v, n2, cents): IVF coarse-quantizer assignment as one
    * codegen'd argmin loop. `cents` is array<struct<label, cvec, c2>>
    * (attached per-row from a broadcast single-row DataFrame), and the
    * result is the label minimizing d2 = n2 - 2*dot(v,cvec) + c2 with
    * ties to the smallest label — the same d2 operation order and
    * (d2, label) tie-break as the literal-folded array_min path, so the
    * two assignment paths are bit-identical. Unlike a min(struct)
    * aggregation (SortAggregate: struct buffers aren't hash-aggregable,
    * so Spark would sort all N x nlist candidate rows) or a literal fold
    * (64 KB codegen ceiling), this is O(nlist*dim) register arithmetic
    * per row with nothing materialized and no shuffle at all. */
  def nearestCell(v: Column, n2: Column, cents: Column): Column =
    ExpressionUtils.column(NearestCell(
      ExpressionUtils.expression(v), ExpressionUtils.expression(n2),
      ExpressionUtils.expression(cents)))

  /** collectSortedCapped(e, cap): sorted collect_list over a LONG column
    * whose AGGREGATION BUFFER is hard-bounded at cap+1 entries — the
    * skew-safe form of `array_sort(collect_list(e))` + a post-filter
    * `size(..) <= cap`. A plain collect_list materializes every value of
    * a hot key in one buffer BEFORE any size predicate can run (the
    * predicate is post-aggregation), so a key shared by 1% of a 100 TB
    * corpus is an executor OOM; this aggregate stops appending at cap+1
    * (update and merge both), which is exactly enough to distinguish
    * "over the cap" (size = cap+1 rows, for the caller's filter to drop)
    * from a completable group (size <= cap, emitted sorted). Groups at or
    * under the cap produce bit-identical output to the unbounded
    * formulation; over-cap groups surface as a cap+1-sized array whose
    * CONTENT is partition-order-dependent — callers must drop them (the
    * occupancy-cap contract every dd_* consumer already has). */
  def collectSortedCapped(e: Column, cap: Int): Column =
    ExpressionUtils.column(CollectSortedCappedLong(
      ExpressionUtils.expression(e), cap).toAggregateExpression())
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Symmetric int8 pack — see [[VectorExprs.quantizeInt8]]. */
case class QuantizeInt8(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_quantize_int8"

  override protected def nullSafeEval(vAny: Any): Any = {
    val v = vAny.asInstanceOf[ArrayData]
    val n = v.numElements()
    var m = 0.0
    var i = 0
    while (i < n) { val a = math.abs(v.getDouble(i)); if (a > m) m = a; i += 1 }
    val scale = if (m == 0.0) 0.0 else 127.0 / m
    val out = new Array[Byte](n)
    i = 0
    while (i < n) {
      out(i) = math.floor(v.getDouble(i) * scale + 0.5).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val a = ctx.freshName("a")
      val scale = ctx.freshName("scale")
      val out = ctx.freshName("out")
      s"""
         |int $n = $v.numElements();
         |double $m = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $a = java.lang.Math.abs($v.getDouble($i));
         |  if ($a > $m) { $m = $a; }
         |}
         |double $scale = ($m == 0.0) ? 0.0 : (127.0 / $m);
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = (byte) java.lang.Math.floor($v.getDouble($i) * $scale + 0.5);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}

/** Fused (qv, scale) quantization — see [[VectorExprs.quantizeInt8Pair]].
  * Same null-free input contract as the other vector kernels. */
case class QuantizeInt8Pair(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = StructType(Seq(
    StructField("qv", BinaryType, nullable = false),
    StructField("scale", DoubleType, nullable = false)))
  override def prettyName: String = "graft_quantize_int8_pair"

  override protected def nullSafeEval(vAny: Any): Any = {
    val v = vAny.asInstanceOf[ArrayData]
    val n = v.numElements()
    var m = 0.0
    var i = 0
    while (i < n) { val a = math.abs(v.getDouble(i)); if (a > m) m = a; i += 1 }
    val scale = if (m == 0.0) 0.0 else 127.0 / m
    val out = new Array[Byte](n)
    i = 0
    while (i < n) {
      out(i) = math.floor(v.getDouble(i) * scale + 0.5).toByte
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](out, scale))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val a = ctx.freshName("a")
      val scale = ctx.freshName("scale")
      val out = ctx.freshName("out")
      s"""
         |int $n = $v.numElements();
         |double $m = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $a = java.lang.Math.abs($v.getDouble($i));
         |  if ($a > $m) { $m = $a; }
         |}
         |double $scale = ($m == 0.0) ? 0.0 : (127.0 / $m);
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = (byte) java.lang.Math.floor($v.getDouble($i) * $scale + 0.5);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { $out, java.lang.Double.valueOf($scale) });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8Pair =
    copy(child = newChild)
}

/** Quantization scale — see [[VectorExprs.int8Scale]]. */
case class Int8Scale(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_int8_scale"

  override protected def nullSafeEval(vAny: Any): Any = {
    val v = vAny.asInstanceOf[ArrayData]
    val n = v.numElements()
    var m = 0.0
    var i = 0
    while (i < n) { val a = math.abs(v.getDouble(i)); if (a > m) m = a; i += 1 }
    if (m == 0.0) 0.0 else 127.0 / m
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val a = ctx.freshName("a")
      s"""
         |int $n = $v.numElements();
         |double $m = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $a = java.lang.Math.abs($v.getDouble($i));
         |  if ($a > $m) { $m = $a; }
         |}
         |${ev.value} = ($m == 0.0) ? 0.0 : (127.0 / $m);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Int8Scale =
    copy(child = newChild)
}

/** Exact signed-byte dot product — see [[VectorExprs.dotInt8]]. */
case class DotInt8(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_int8"

  override protected def nullSafeEval(aAny: Any, bAny: Any): Any = {
    val a = aAny.asInstanceOf[Array[Byte]]
    val b = bAny.asInstanceOf[Array[Byte]]
    val n = math.min(a.length, b.length)
    var acc = 0L
    var i = 0
    while (i < n) { acc += a(i).toLong * b(i).toLong; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length);
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((long) $a[$i]) * ((long) $b[$i]);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotInt8 =
    copy(left = newLeft, right = newRight)
}

/** Elementwise difference — see [[VectorExprs.subVec]]. */
case class SubVec(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_sub_vec"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = x.getDouble(i) - y.getDouble(i); i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $a.getDouble($i) - $b.getDouble($i);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SubVec =
    copy(left = newLeft, right = newRight)
}

/** int8 reconstruction — see [[VectorExprs.dequantizeInt8]]. */
case class DequantizeInt8(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_dequantize_int8"

  override protected def nullSafeEval(qAny: Any, sAny: Any): Any = {
    val q = qAny.asInstanceOf[Array[Byte]]
    val scale = sAny.asInstanceOf[Double]
    val out = new Array[Double](q.length)
    if (scale != 0.0) {
      var i = 0
      while (i < q.length) { out(i) = q(i) / scale; i += 1 }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, s) => {
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |double[] $out = new double[$q.length];
         |if ($s != 0.0) {
         |  for (int $i = 0; $i < $q.length; $i++) {
         |    $out[$i] = ((double) $q[$i]) / $s;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DequantizeInt8 =
    copy(left = newLeft, right = newRight)
}

/** Direct md5-nibble-range hash — see [[VectorExprs.md5Long]]. */
case class Md5NibblesLong(child: Expression, start: Int, len: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(start >= 1 && len >= 1 && len <= 15 && start - 1 + len <= 32,
    s"md5Long nibble range out of bounds: start=$start len=$len")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_long"

  override protected def nullSafeEval(sAny: Any): Any = {
    val bytes = sAny.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    Md5NibblesLong.md5Nibbles(bytes, 0, bytes.length, start, len)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val d = ctx.freshName("d")
      s"""
         |byte[] $d = $s.getBytes();
         |${ev.value} = org.apache.spark.sql.graft.Md5NibblesLong.md5Nibbles(
         |  $d, 0, $d.length, $start, $len);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Md5NibblesLong =
    copy(child = newChild)
}

object Md5NibblesLong {
  /** Accumulate hex nibbles [start, start+len) (1-based) of a digest. */
  def nibbles(d: Array[Byte], start: Int, len: Int): Long = {
    var acc = 0L
    var i = start - 1
    val end = start - 1 + len
    while (i < end) {
      val b = d(i >> 1) & 0xff
      val nib = if ((i & 1) == 0) b >> 4 else b & 0xf
      acc = (acc << 4) | nib
      i += 1
    }
    acc
  }

  // ---- zero-allocation MD5 (RFC 1321) ----------------------------------
  // The shingle/token kernels digest tens of millions of SHORT strings
  // per pass; MessageDigest pays a virtual update + a 16-byte digest
  // allocation + internal buffer copy per call. Any input <= 55 bytes is
  // ONE padded MD5 block, so the compression function can run straight
  // off the source bytes into four ints — no allocation, no copies.
  // Bit-identical to MessageDigest by construction (same RFC constants;
  // spec-pinned against MessageDigest over random inputs incl. the
  // boundary lengths 0/55/56). Longer inputs fall back to MessageDigest.

  /** Round constants K_i = floor(|sin(i+1)| * 2^32) — the RFC 1321 table
    * verbatim (hardcoded, not recomputed: a 1-ulp libm difference would
    * corrupt every hash). */
  private val K: Array[Int] = Array(
    0xd76aa478L, 0xe8c7b756L, 0x242070dbL, 0xc1bdceeeL,
    0xf57c0fafL, 0x4787c62aL, 0xa8304613L, 0xfd469501L,
    0x698098d8L, 0x8b44f7afL, 0xffff5bb1L, 0x895cd7beL,
    0x6b901122L, 0xfd987193L, 0xa679438eL, 0x49b40821L,
    0xf61e2562L, 0xc040b340L, 0x265e5a51L, 0xe9b6c7aaL,
    0xd62f105dL, 0x02441453L, 0xd8a1e681L, 0xe7d3fbc8L,
    0x21e1cde6L, 0xc33707d6L, 0xf4d50d87L, 0x455a14edL,
    0xa9e3e905L, 0xfcefa3f8L, 0x676f02d9L, 0x8d2a4c8aL,
    0xfffa3942L, 0x8771f681L, 0x6d9d6122L, 0xfde5380cL,
    0xa4beea44L, 0x4bdecfa9L, 0xf6bb4b60L, 0xbebfbc70L,
    0x289b7ec6L, 0xeaa127faL, 0xd4ef3085L, 0x04881d05L,
    0xd9d4d039L, 0xe6db99e5L, 0x1fa27cf8L, 0xc4ac5665L,
    0xf4292244L, 0x432aff97L, 0xab9423a7L, 0xfc93a039L,
    0x655b59c3L, 0x8f0ccc92L, 0xffeff47dL, 0x85845dd1L,
    0x6fa87e4fL, 0xfe2ce6e0L, 0xa3014314L, 0x4e0811a1L,
    0xf7537e82L, 0xbd3af235L, 0x2ad7d2bbL, 0xeb86d391L).map(_.toInt)

  private val S: Array[Int] = Array(
    7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
    5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20,
    4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
    6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21)

  private val A0 = 0x67452301
  private val B0 = 0xefcdab89L.toInt
  private val C0 = 0x98badcfeL.toInt
  private val D0 = 0x10325476

  private val blockTL = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](16)
  }
  private val wordsTL = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](4)
  }
  private val mdTL = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** md5(bytes[off, off+len)) as the four little-endian state words,
    * written into `out(0..3)` (digest byte i = (out(i>>2) >>> 8*(i&3))
    * & 0xff). Single-block fast path for len <= 55. */
  def md5Words(bytes: Array[Byte], off: Int, len: Int, out: Array[Int]): Unit = {
    if (len > 55) {
      val digest = mdTL.get()
      digest.reset()
      digest.update(bytes, off, len)
      val d = digest.digest()
      var w = 0
      while (w < 4) {
        out(w) = (d(4 * w) & 0xff) | ((d(4 * w + 1) & 0xff) << 8) |
          ((d(4 * w + 2) & 0xff) << 16) | ((d(4 * w + 3) & 0xff) << 24)
        w += 1
      }
      return
    }
    val m = blockTL.get()
    java.util.Arrays.fill(m, 0)
    var j = 0
    while (j < len) {
      m(j >> 2) |= (bytes(off + j) & 0xff) << ((j & 3) << 3)
      j += 1
    }
    m(len >> 2) |= 0x80 << ((len & 3) << 3)
    m(14) = len << 3
    var a = A0; var b = B0; var c = C0; var d = D0
    var i = 0
    while (i < 16) {
      val f = (b & c) | (~b & d)
      val tmp = d; d = c; c = b
      b = b + Integer.rotateLeft(a + f + K(i) + m(i), S(i))
      a = tmp
      i += 1
    }
    while (i < 32) {
      val f = (d & b) | (~d & c)
      val tmp = d; d = c; c = b
      b = b + Integer.rotateLeft(a + f + K(i) + m((5 * i + 1) & 15), S(i))
      a = tmp
      i += 1
    }
    while (i < 48) {
      val f = b ^ c ^ d
      val tmp = d; d = c; c = b
      b = b + Integer.rotateLeft(a + f + K(i) + m((3 * i + 5) & 15), S(i))
      a = tmp
      i += 1
    }
    while (i < 64) {
      val f = c ^ (b | ~d)
      val tmp = d; d = c; c = b
      b = b + Integer.rotateLeft(a + f + K(i) + m((7 * i) & 15), S(i))
      a = tmp
      i += 1
    }
    out(0) = a + A0; out(1) = b + B0; out(2) = c + C0; out(3) = d + D0
  }

  /** Hex nibbles [start, start+len) (1-based) straight off the state
    * words — same values [[nibbles]] reads from the digest bytes. */
  def nibblesOfWords(w: Array[Int], start: Int, len: Int): Long = {
    var acc = 0L
    var i = start - 1
    val end = start - 1 + len
    while (i < end) {
      val byteIdx = i >> 1
      val b = (w(byteIdx >> 2) >>> ((byteIdx & 3) << 3)) & 0xff
      val nib = if ((i & 1) == 0) b >> 4 else b & 0xf
      acc = (acc << 4) | nib
      i += 1
    }
    acc
  }

  /** nibbles [start, start+nibLen) of md5(bytes[off, off+len)) — the
    * one-call form every kernel uses. */
  def md5Nibbles(bytes: Array[Byte], off: Int, len: Int,
                 start: Int, nibLen: Int): Long = {
    val w = wordsTL.get()
    md5Words(bytes, off, len, w)
    nibblesOfWords(w, start, nibLen)
  }
}

/** Monotone double→long bit map — see [[VectorExprs.sortableBits]].
  * doubleToLongBits (canonical NaN) keeps every NaN payload on one
  * bucket; -0.0 maps just below +0.0 (numerically equal — value
  * extraction is unaffected). */
case class SortableDoubleBits(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sortable_double_bits"

  override protected def nullSafeEval(vAny: Any): Any = {
    val b = java.lang.Double.doubleToLongBits(vAny.asInstanceOf[Double])
    b ^ ((b >> 63) & 0x7fffffffffffffffL)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val b = ctx.freshName("b")
      s"""
         |long $b = java.lang.Double.doubleToLongBits($v);
         |${ev.value} = $b ^ (($b >> 63) & 0x7fffffffffffffffL);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): SortableDoubleBits =
    copy(child = newChild)
}

/** Argmin over centroid cells — see [[VectorExprs.nearestCell]]. Children:
  * vector array<double>, its self-dot n2, and the centroid table as
  * array<struct<label: bigint, cvec: array<double>, c2: double>>. Returns
  * the winning label.
  *
  * Declared non-nullable (empty-quantizer input returns label 0): the
  * centroid array comes from aggregating the corpus itself, so it is
  * empty only when the corpus is — and a nullable join key here would
  * make the downstream cell equi-join push an
  * `isnotnull(graft_nearest_cell(...))` condition INTO the broadcast
  * nested-loop join that attaches the quantizer, evaluating the argmin
  * twice per row and (worse) knocking the join out of whole-stage
  * codegen, which re-serializes the multi-hundred-KB centroid column at
  * every operator boundary per corpus row (measured ~1000x).
  *
  * Non-nullable output with nullable children means codegen emits NO
  * null guards: inputs must be null-free ([[DotProduct]]'s contract) —
  * callers filter null vectors first (assignCellsBroadcast does). */
case class NearestCell(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), DoubleType, ArrayType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_nearest_cell"

  override protected def nullSafeEval(vAny: Any, n2Any: Any, cAny: Any): Any = {
    val v = vAny.asInstanceOf[ArrayData]
    val n2 = n2Any.asInstanceOf[Double]
    val cents = cAny.asInstanceOf[ArrayData]
    val m = cents.numElements()
    var best = Double.PositiveInfinity
    var bestLbl = 0L
    var found = false
    var j = 0
    while (j < m) {
      val cell = cents.getStruct(j, 3)
      // skip malformed entries (null struct / null cvec) instead of
      // NPEing: the operator layer never produces them, but the SQL
      // surface can hand in arbitrary arrays
      if (cell == null || cell.isNullAt(1)) { j += 1 }
      else {
      val cv = cell.getArray(1)
      val n = math.min(v.numElements(), cv.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) { acc += v.getDouble(i) * cv.getDouble(i); i += 1 }
      val d2 = n2 - 2.0 * acc + cell.getDouble(2)
      val lbl = cell.getLong(0)
      // Double.compare, not < : Spark's double ordering (NaN greater
      // than everything, -0.0 < 0.0) — the same ordering array_min uses
      // on the literal path, so a NaN/Inf component cannot make the two
      // assignment paths diverge or go order-dependent
      val cmp = java.lang.Double.compare(d2, best)
      if (!found || cmp < 0 || (cmp == 0 && lbl < bestLbl)) {
        best = d2; bestLbl = lbl; found = true
      }
      j += 1
      }
    }
    bestLbl
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, n2, cents) => {
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d2 = ctx.freshName("d2")
      val lbl = ctx.freshName("lbl")
      val best = ctx.freshName("best")
      val bestLbl = ctx.freshName("bestLbl")
      val found = ctx.freshName("found")
      val cell = ctx.freshName("cell")
      val cv = ctx.freshName("cv")
      val cmp = ctx.freshName("cmp")
      s"""
         |int $m = $cents.numElements();
         |double $best = Double.POSITIVE_INFINITY;
         |long $bestLbl = 0L;
         |boolean $found = false;
         |for (int $j = 0; $j < $m; $j++) {
         |  InternalRow $cell = $cents.getStruct($j, 3);
         |  if ($cell == null || $cell.isNullAt(1)) { continue; }
         |  org.apache.spark.sql.catalyst.util.ArrayData $cv = $cell.getArray(1);
         |  int $n = java.lang.Math.min($v.numElements(), $cv.numElements());
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $v.getDouble($i) * $cv.getDouble($i);
         |  }
         |  double $d2 = $n2 - 2.0 * $acc + $cell.getDouble(2);
         |  long $lbl = $cell.getLong(0);
         |  int ${cmp} = java.lang.Double.compare($d2, $best);
         |  if (!$found || ${cmp} < 0 || (${cmp} == 0 && $lbl < $bestLbl)) {
         |    $best = $d2; $bestLbl = $lbl; $found = true;
         |  }
         |}
         |${ev.value} = $bestLbl;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): NearestCell =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Per-row term-frequency histogram — see [[VectorExprs.termCounts]].
  * Eval-based by design: the per-row work (full string scan + hash map)
  * amortizes the interpreted-call overhead that makes per-ELEMENT
  * CodegenFallback HOFs slow, and the surrounding operators (Generate /
  * aggregate) are not whole-stage-codegen-critical here. */
case class TermCounts(child: Expression)
    extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_term_counts"

  override protected def nullSafeEval(sAny: Any): Any = {
    // clone: output UTF8String slices must not alias the scan's reusable
    // row buffer (vectorized parquet readers recycle backing arrays)
    val bytes = sAny.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .clone().getBytes
    val n = bytes.length
    val m = new java.util.LinkedHashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Long]()
    var i = 0
    while (i <= n) {
      var j = i
      while (j < n && bytes(j) != ' ') j += 1
      if (j > i) { // empty tokens (consecutive spaces) are filtered
        val t = org.apache.spark.unsafe.types.UTF8String.fromBytes(bytes, i, j - i)
        val c = m.get(t)
        m.put(t, if (c == null) 1L else c.longValue() + 1L)
      }
      i = j + 1
    }
    val arr = new Array[Any](m.size())
    val it = m.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      arr(k) = org.apache.spark.sql.catalyst.InternalRow(e.getKey, e.getValue.longValue())
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): TermCounts =
    copy(child = newChild)
}

/** Distinct-term xxhash64 values in one pass — see
  * [[VectorExprs.distinctTermHashes]]. Eval-based (the TermCounts
  * rationale). Hashes each word's byte span directly out of the input
  * buffer (no slice objects); dedup is a primitive open-addressing long
  * set sized to the doc's word count, with a side flag for the one hash
  * value (0) the empty-bucket sentinel can't represent. */
case class DistinctTermHashes(child: Expression)
    extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_distinct_term_hashes"

  override protected def nullSafeEval(sAny: Any): Any = {
    val bytes = sAny.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .getBytes
    val n = bytes.length
    val base = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
    // pass 1: word count bounds the dedup table size
    var words = 0
    var i = 0
    while (i <= n) {
      var j = i
      while (j < n && bytes(j) != ' ') j += 1
      if (j > i) words += 1
      i = j + 1
    }
    if (words == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[Long](0))
    var bits = 3
    while ((1 << bits) < words * 2) bits += 1
    val cap = 1 << bits
    val mask = cap - 1
    val table = new Array[Long](cap) // 0 = empty
    val out = new Array[Long](words) // first-occurrence order
    var k = 0
    var sawZero = false
    i = 0
    while (i <= n) {
      var j = i
      while (j < n && bytes(j) != ' ') j += 1
      if (j > i) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(bytes, base + i, j - i, 42L)
        if (h == 0L) {
          if (!sawZero) { sawZero = true; out(k) = 0L; k += 1 }
        } else {
          var idx = ((h * 0x9E3779B97F4A7C15L) >>> (64 - bits)).toInt & mask
          var continue = true
          while (continue) {
            val v = table(idx)
            if (v == 0L) {
              table(idx) = h; out(k) = h; k += 1; continue = false
            } else if (v == h) continue = false
            else idx = (idx + 1) & mask
          }
        }
      }
      i = j + 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(out, k))
  }

  override protected def withNewChildInternal(newChild: Expression): DistinctTermHashes =
    copy(child = newChild)
}

/** Word-3-gram md5-prefix hashes in one pass — see
  * [[VectorExprs.shingle3Md5Long]]. Split semantics mirror Spark's
  * split(text, " ") with limit -1: empty words (consecutive/trailing
  * spaces) are words; a 3-gram exists for every i with i+2 < nWords.
  * Eval-based: the per-row work (full scan + one digest per shingle)
  * amortizes the interpreted call. */
case class Shingle3Md5Long(child: Expression, start: Int, len: Int)
    extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(start >= 1 && len >= 1 && len <= 15 && start - 1 + len <= 32,
    s"shingle3Md5Long nibble range out of bounds: start=$start len=$len")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle3_md5_long"

  override protected def nullSafeEval(sAny: Any): Any = {
    val bytes = sAny.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val out = Shingle3Md5Long.shingleHashes(bytes, start, len)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Shingle3Md5Long =
    copy(child = newChild)
}

object Shingle3Md5Long {
  /** Word-3-gram MD5-nibble hashes of a space-tokenized byte string —
    * the ONE shingle-hash definition shared by the [[Shingle3Md5Long]]
    * expression and the fused per-partition kernels (Dedup
    * snapshotOverlap), so every consumer sees bit-identical shingle
    * identities. */
  def shingleHashes(bytes: Array[Byte], start: Int, len: Int): Array[Long] = {
    val n = bytes.length
    var spaces = 0
    var i = 0
    while (i < n) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val nWords = spaces + 1
    val nsh = math.max(0, nWords - 2)
    val out = new Array[Long](nsh)
    if (nsh > 0) {
      val wStart = new Array[Int](nWords)
      val wEnd = new Array[Int](nWords)
      var w = 0
      i = 0
      while (i < n) {
        if (bytes(i) == ' ') { wEnd(w) = i; w += 1; wStart(w) = i + 1 }
        i += 1
      }
      wEnd(w) = n
      var k = 0
      while (k < nsh) {
        val off = wStart(k)
        out(k) = Md5NibblesLong.md5Nibbles(bytes, off, wEnd(k + 2) - off,
          start, len)
        k += 1
      }
    }
    out
  }
}

/** Word-bigram hash pairs in one pass: for every adjacent word pair,
  * (k1, k12) where k1 = XXH64 of w1's bytes and k12 = XXH64 of the
  * contiguous "w1 w2" byte range (the Shingle3Md5Long identity: single-
  * space re-joins reconstruct the source bytes) — the de-texted keys an
  * n-gram LM joins on, with ZERO string allocation. Keys are consistent
  * only within the engine (both the count tables and the scoring stream
  * use this kernel); the oracle joins the actual strings — results can
  * differ only on an XXH64 collision among distinct bigrams (~2^-64 per
  * pair). Split semantics mirror split(text, ' ') with limit -1. */
case class BigramKeyPairs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("k1", LongType, nullable = false),
      StructField("k12", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_bigram_key_pairs"

  override protected def nullSafeEval(sAny: Any): Any = {
    val s = sAny.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val packed = BigramKeyPairs.keyPairsInterleaved(s.getBytes)
    val nb = packed.length / 2
    val out = new Array[Any](nb)
    var k = 0
    while (k < nb) {
      out(k) = org.apache.spark.sql.catalyst.InternalRow(
        packed(2 * k), packed(2 * k + 1))
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): BigramKeyPairs =
    copy(child = newChild)
}

object BigramKeyPairs {
  /** Interleaved [k1_0, k12_0, k1_1, k12_1, …] unigram/bigram xxh64 key
    * pairs — the ONE definition shared by the [[BigramKeyPairs]]
    * expression and the fused train-count kernel (TextAnalysis
    * lmScore). Empty for fewer than two words. */
  def keyPairsInterleaved(bytes: Array[Byte]): Array[Long] = {
    val n = bytes.length
    var spaces = 0
    var i = 0
    while (i < n) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val nWords = spaces + 1
    val nb = math.max(0, nWords - 1)
    if (nb == 0) return Array.emptyLongArray
    val wStart = new Array[Int](nWords)
    val wEnd = new Array[Int](nWords)
    var wi = 0
    i = 0
    while (i < n) {
      if (bytes(i) == ' ') { wEnd(wi) = i; wi += 1; wStart(wi) = i + 1 }
      i += 1
    }
    wEnd(wi) = n
    val base = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
    val out = new Array[Long](nb * 2)
    var k = 0
    while (k < nb) {
      out(2 * k) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, base + wStart(k), wEnd(k) - wStart(k), 42L)
      out(2 * k + 1) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, base + wStart(k), wEnd(k + 1) - wStart(k), 42L)
      k += 1
    }
    out
  }
}

/** Winnowing fingerprint selection in one pass — the distinct sliding-
  * window minima of the word-3-gram md5-prefix hashes: exactly
  * array_distinct(transform(sequence(0, n-w), j -> array_min(slice(g,
  * j+1, w)))) over [[Shingle3Md5Long]]'s output (short docs: the single
  * global min), but with the gram hashing, the O(n) monotonic-deque
  * window minimum, and the distinct fold fused into one scan with no
  * intermediate arrays. The HOF formulation it replaces is
  * CodegenFallback per ELEMENT (a fresh slice array per window);
  * measured 11.0 s → 6.1 s on the x100 winnow. Eval-based — the
  * TermCounts rationale. */
case class WinnowFps(child: Expression, w: Int, start: Int, len: Int)
    extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(w >= 1, "winnowFps: window must be >= 1")
  require(start >= 1 && len >= 1 && len <= 15 && start - 1 + len <= 32,
    s"winnowFps nibble range out of bounds: start=$start len=$len")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_fps"

  override protected def nullSafeEval(sAny: Any): Any = {
    val bytes = sAny.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val n = bytes.length
    var spaces = 0
    var i = 0
    while (i < n) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val nWords = spaces + 1
    val nsh = math.max(0, nWords - 2)
    if (nsh == 0)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyLongArray)
    val wStart = new Array[Int](nWords)
    val wEnd = new Array[Int](nWords)
    var wi = 0
    i = 0
    while (i < n) {
      if (bytes(i) == ' ') { wEnd(wi) = i; wi += 1; wStart(wi) = i + 1 }
      i += 1
    }
    wEnd(wi) = n
    val g = new Array[Long](nsh)
    var k = 0
    while (k < nsh) {
      val off = wStart(k)
      g(k) = Md5NibblesLong.md5Nibbles(bytes, off, wEnd(k + 2) - off,
        start, len)
      k += 1
    }
    if (nsh < w) {
      var m = g(0)
      var j = 1
      while (j < nsh) { if (g(j) < m) m = g(j); j += 1 }
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array(m))
    }
    // monotonic deque of candidate indices; emit each window's min once
    // (first-occurrence distinct via a small open-addressing probe set)
    val deque = new Array[Int](nsh)
    var head = 0
    var tail = 0 // exclusive
    val out = new Array[Long](nsh - w + 1)
    var nOut = 0
    val seen = new java.util.HashSet[java.lang.Long]()
    var j = 0
    while (j < nsh) {
      while (tail > head && g(deque(tail - 1)) >= g(j)) tail -= 1
      deque(tail) = j; tail += 1
      if (deque(head) <= j - w) head += 1
      if (j >= w - 1) {
        val m = g(deque(head))
        if (seen.add(m)) { out(nOut) = m; nOut += 1 }
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(out, nOut))
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

/** All multi-table LSH bucket ids in one pass — see
  * [[VectorExprs.lshBuckets]]. Eval-based (the TermCounts rationale:
  * the per-row loop amortizes the interpreted call; the equivalent
  * expression tree is what outgrew codegen in the first place).
  * Sequential multiply-add per plane keeps the sign — hence the bucket —
  * bit-identical to dot(v, plane) and the oracle's list_dot_product.
  * NULL input returns NULL (inherited UnaryExpression null-propagation),
  * so a downstream `posexplode` DROPS null-embedding rows entirely —
  * unlike the replaced per-plane `when(dot > 0, …).otherwise(0)` tree,
  * which mapped a NULL vector to bucket 0 in every table. The embeddings
  * tables have no null vectors, so the two are observably identical
  * there; callers with nullable embeddings must filter or assert
  * upstream if they need the old bucket-0 placement. */
case class LshBuckets(child: Expression, planes: Seq[Double],
                      nTables: Int, nPlanes: Int)
    extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(nTables > 0 && nPlanes > 0 && nPlanes <= 31,
    "lshBuckets: bucket ids are packed sign bits in a positive int")
  require(planes.length % (nTables * nPlanes) == 0 && planes.nonEmpty,
    "lshBuckets: |planes| must be nTables*nPlanes*dim")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_lsh_buckets"

  @transient private lazy val w: Array[Double] = planes.toArray
  @transient private lazy val dim: Int = planes.length / (nTables * nPlanes)

  override protected def nullSafeEval(vAny: Any): Any = {
    val arr = vAny.asInstanceOf[ArrayData].toDoubleArray()
    val n = math.min(dim, arr.length)
    val out = new Array[Int](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0
      var p = 0
      while (p < nPlanes) {
        val base = (t * nPlanes + p) * dim
        var s = 0.0
        var d = 0
        while (d < n) { s += arr(d) * w(base + d); d += 1 }
        if (s > 0) bucket |= 1 << p
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): LshBuckets = copy(child = newChild)
}

/** k MinHash signature values in one pass — see
  * [[VectorExprs.minhashSigs]]. For each word-3-gram shingle (the exact
  * [[Shingle3Md5Long]] byte-range scan), h = md5-prefix-8-nibbles % p,
  * and sig_j = min over shingles of (a_j·h + b_j) % p. The running mins
  * live in a k-slot local array, so the corpus-wide tall table the
  * groupBy formulation shuffles (one row per shingle, k modular maps
  * re-evaluated inside a hash-aggregate) never exists: signatures are a
  * per-ROW projection, zero exchange. Returns NULL for docs with no
  * shingle (<3 words) so `posexplode` drops them — identical to the
  * aggregate path, where such docs simply have no tall rows. */
case class MinhashSigs(child: Expression, a: Seq[Long], b: Seq[Long], p: Long)
    extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(a.nonEmpty && a.length == b.length, "minhashSigs: |a| must equal |b|")
  require(p > 0 && p <= (1L << 31), "minhashSigs: p must fit 31 bits (overflow-free products)")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sigs"

  @transient private lazy val aArr = a.toArray
  @transient private lazy val bArr = b.toArray

  override protected def nullSafeEval(sAny: Any): Any = {
    val bytes = sAny.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val n = bytes.length
    var spaces = 0
    var i = 0
    while (i < n) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val nWords = spaces + 1
    val nsh = nWords - 2
    if (nsh <= 0) return null
    val k = aArr.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val wStart = new Array[Int](nWords)
    val wEnd = new Array[Int](nWords)
    var w = 0
    i = 0
    while (i < n) {
      if (bytes(i) == ' ') { wEnd(w) = i; w += 1; wStart(w) = i + 1 }
      i += 1
    }
    wEnd(w) = n
    var s = 0
    while (s < nsh) {
      val off = wStart(s)
      val h = Md5NibblesLong.md5Nibbles(bytes, off, wEnd(s + 2) - off, 1, 8) % p
      var j = 0
      while (j < k) {
        val v = (aArr(j) * h + bArr(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)
}

/** 64-bit SimHash in one pass — see [[VectorExprs.simhash64]]. Each
  * space-delimited token (empty tokens included, mirroring
  * split(text, ' ')) contributes ±1 votes to 64 bit slots from its md5:
  * bits 0-31 from nibbles 1-8 (lo), 32-63 from nibbles 9-16 (hi); the
  * packed signature sets bit b iff its vote sum is > 0. Returns
  * [lo32, hi32] as array<long> — the exact columns the aggregate
  * formulation produced. */
case class Simhash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(sAny: Any): Any = {
    val bytes = sAny.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val n = bytes.length
    val votes = new Array[Int](64)
    val words = new Array[Int](4)
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        Md5NibblesLong.md5Words(bytes, start, i - start, words)
        val lo = Md5NibblesLong.nibblesOfWords(words, 1, 8)
        val hi = Md5NibblesLong.nibblesOfWords(words, 9, 8)
        var b = 0
        while (b < 32) {
          if (((lo >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          if (((hi >>> b) & 1L) == 1L) votes(32 + b) += 1 else votes(32 + b) -= 1
          b += 1
        }
        start = i + 1
      }
      i += 1
    }
    var lo = 0L
    var hi = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) lo |= (1L << b)
      if (votes(32 + b) > 0) hi |= (1L << b)
      b += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array(lo, hi))
  }

  override protected def withNewChildInternal(newChild: Expression): Simhash64 =
    copy(child = newChild)
}

/** 1-bit sign quantization pack — see [[VectorExprs.signPack]]. */
case class SignPack(child: Expression, start: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sign_pack"

  override protected def nullSafeEval(vAny: Any): Any = {
    val v = vAny.asInstanceOf[ArrayData]
    val n = v.numElements()
    var acc = 0L
    var b = 0
    while (b < 32) {
      val i = start + b
      if (i < n && !v.isNullAt(i) && v.getDouble(i) > 0.0) acc |= (1L << b)
      b += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $v.numElements();
         |long $acc = 0L;
         |for (int $b = 0; $b < 32; $b++) {
         |  int $i = $start + $b;
         |  if ($i < $n && !$v.isNullAt($i) && $v.getDouble($i) > 0.0) {
         |    $acc |= (1L << $b);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignPack =
    copy(child = newChild)
}

/** Chained-xxhash64 word-bigram identities in one pass — see
  * [[VectorExprs.bigramXxh64]]. Uses the same XXH64 byte hash Spark's
  * xxhash64 expression applies per child (seed 42, previous hash as the
  * next seed), over the word's source bytes in place. */
case class BigramXxh64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bigram_xxh64"

  override protected def nullSafeEval(sAny: Any): Any = {
    val bytes = sAny.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val out = BigramXxh64.bigramHashes(bytes)
    if (out == null) null
    else org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def withNewChildInternal(newChild: Expression): BigramXxh64 =
    copy(child = newChild)
}

object BigramXxh64 {
  /** Chained-xxhash bigram identities of a space-tokenized byte string —
    * the ONE bigram-hash definition shared by the [[BigramXxh64]]
    * expression and the fused per-partition kernels (TextAnalysis
    * fluency). Null for fewer than two words. */
  def bigramHashes(bytes: Array[Byte]): Array[Long] = {
    val n = bytes.length
    var spaces = 0
    var i = 0
    while (i < n) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val nWords = spaces + 1
    if (nWords < 2) return null
    val wStart = new Array[Int](nWords)
    val wEnd = new Array[Int](nWords)
    var w = 0
    i = 0
    while (i < n) {
      if (bytes(i) == ' ') { wEnd(w) = i; w += 1; wStart(w) = i + 1 }
      i += 1
    }
    wEnd(w) = n
    // the exact code path XxHash64Function takes for StringType children
    def h(word: Int, seed: Long): Long =
      org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
        org.apache.spark.unsafe.types.UTF8String.fromBytes(
          bytes, wStart(word), wEnd(word) - wStart(word)), seed)
    val out = new Array[Long](nWords - 1)
    var k = 0
    while (k < nWords - 1) {
      out(k) = h(k + 1, h(k, 42L))
      k += 1
    }
    out
  }
}

object CollectSortedCappedLong {
  /** Mutable long-array buffer; `n` is the logical size. Growth stops at
    * cap+1 entries, so buffer memory is O(cap) regardless of group size. */
  final class Buf(var arr: Array[Long], var n: Int)
}

/** Skew-bounded sorted collect over LongType — see
  * [[VectorExprs.collectSortedCapped]] for the contract. */
case class CollectSortedCappedLong(
    child: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[CollectSortedCappedLong.Buf]
    with ExpectsInputTypes {
  require(cap >= 1, "collectSortedCapped: cap must be >= 1")
  import CollectSortedCappedLong.Buf

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_collect_sorted_capped"

  override def createAggregationBuffer(): Buf =
    new Buf(new Array[Long](8), 0)

  private def append(b: Buf, v: Long): Unit = {
    // stop at cap+1: one extra entry marks "over the cap", nothing more
    if (b.n <= cap) {
      if (b.n == b.arr.length)
        b.arr = java.util.Arrays.copyOf(b.arr, math.min(b.arr.length * 2, cap + 1))
      b.arr(b.n) = v
      b.n += 1
    }
  }

  override def update(b: Buf, input: org.apache.spark.sql.catalyst.InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) append(b, v.asInstanceOf[Long])
    b
  }

  override def merge(b: Buf, o: Buf): Buf = {
    var i = 0
    while (i < o.n && b.n <= cap) { append(b, o.arr(i)); i += 1 }
    b
  }

  override def eval(b: Buf): Any = {
    val out = java.util.Arrays.copyOf(b.arr, b.n)
    // over-cap groups are dropped by the caller's size filter — their
    // (truncated, order-dependent) content never reaches an output
    if (b.n <= cap) java.util.Arrays.sort(out)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override def serialize(b: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * b.n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putLong(b.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val n = bb.getInt()
    val arr = new Array[Long](math.max(n, 1))
    var i = 0
    while (i < n) { arr(i) = bb.getLong(); i += 1 }
    new Buf(arr, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectSortedCappedLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectSortedCappedLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CollectSortedCappedLong =
    copy(child = newChildren.head)
}
