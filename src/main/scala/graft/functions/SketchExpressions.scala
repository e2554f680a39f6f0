package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash signature of a shingle set: for each of `k` seeded hash
  * functions, the minimum hash over the distinct shingles. Jaccard(A,B) is
  * estimated by the fraction of matching signature positions; banding the
  * signature gives LSH candidate buckets (dedup at 10^9-document scale
  * without O(n^2) pairs).
  *
  * One pass over the shingle array per row, all k mins updated in place —
  * a native expression instead of k array-transform steps.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got ${dt.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.sig(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.sig($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  /** Each shingle's bytes are hashed ONCE; the k per-position values are
    * derived from that base hash with a splitmix64 mix per position
    * (h_j = mix(base + (j+1)·golden)). Cost per shingle is L + 6k ops
    * instead of the k·L of re-hashing per position — the round-1 kernel
    * re-walked every shingle 64 times and dedup_minhash paid 39% of the
    * whole bench suite for it.
    */
  def sig(shingles: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill[Long](k)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val base = Fingerprint64.hash64(shingles.getUTF8String(i))
        var j = 0
        while (j < k) {
          val h = Fingerprint64.mix(base + (j + 1) * 0x9E3779B97F4A7C15L)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(mins)
  }
}

/** Distinct word n-gram shingles from an ALREADY-TOKENIZED array<string>,
  * in one kernel pass: byte-identical to the
  * `array_distinct(transform(sequence(...), i -> concat_ws(" ", t[i], ...)))`
  * expression stack it replaces (UTF8String.concatWs is what concat_ws
  * lowers to), but without the per-shingle sequence/transform/array
  * allocations — the stack version dominated the shared shingle-frame
  * cache build (~10 s of a 64 s bench suite at sf0.1). Tokenization stays
  * Spark's `split` so the oracle-mirrored semantics are untouched.
  * Under n tokens -> empty array (matching the `when(size >= n)` guard).
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires array<string>, got ${dt.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    WordShingles.shingles(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object WordShingles {
  private val Space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  def shingles(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    // insertion-ordered distinct, like array_distinct (first wins)
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
      seen.add(org.apache.spark.unsafe.types.UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}

/** `nSigs` independent 64-bit SimHashes of a token array in ONE pass: each
  * token's bytes are hashed once, then per signature a splitmix64 mix of the
  * base derives that signature's 64 vote bits. Returns array<long> of length
  * nSigs — the multi-signature LSH source for near-dup banding (16-bit bands
  * sliced from the concatenated signatures).
  */
case class SimHashMulti(child: Expression, nSigs: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"simhash_multi requires array<string>, got ${dt.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHashMulti.sigs(input.asInstanceOf[ArrayData], nSigs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashMulti.sigs($c, $nSigs)")

  override protected def withNewChildInternal(newChild: Expression): SimHashMulti =
    copy(child = newChild)

  override def prettyName: String = "simhash_multi"
}

object SimHashMulti {
  def sigs(tokens: ArrayData, nSigs: Int): ArrayData = {
    val votes = new Array[Int](nSigs * 64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val base = Fingerprint64.hash64(tokens.getUTF8String(i))
        var sgi = 0
        while (sgi < nSigs) {
          val h = Fingerprint64.mix(base + (sgi + 1) * 0x9E3779B97F4A7C15L)
          val off = sgi * 64
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(off + b) += 1 else votes(off + b) -= 1
            b += 1
          }
          sgi += 1
        }
      }
      i += 1
    }
    val out = new Array[Long](nSigs)
    var sgi = 0
    while (sgi < nSigs) {
      var sig = 0L
      val off = sgi * 64
      var b = 0
      while (b < 64) {
        if (votes(off + b) > 0) sig |= (1L << b)
        b += 1
      }
      out(sgi) = sig
      sgi += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** 64-bit SimHash over a token array: each token's 64-bit hash votes +1/-1
  * per bit position; the sign of each tally forms the fingerprint. Near-dup
  * detection = Hamming distance on the resulting long (bit_count(a XOR b)).
  */
case class SimHash64(child: Expression, seed: Long = 0L) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${dt.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash64.simhash(input.asInstanceOf[ArrayData], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.simhash($c, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

/** Random-hyperplane (signed random projection) signature of a float
  * vector: bit p = sign(sum_d vec[d] * u(seed,p,d)) with u a deterministic
  * Rademacher (+1/-1) sequence derived from splitmix64 — the LSH bucketing
  * primitive for cosine similarity search (two vectors with high cosine get
  * equal signatures with high probability). nBits <= 64, packed in a long.
  */
case class RpSign(child: Expression, nBits: Int, seed: Long) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"rp_sign requires array<float>, got ${dt.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    RpSign.sign(input.asInstanceOf[ArrayData], nBits, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RpSign.sign($c, $nBits, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): RpSign =
    copy(child = newChild)

  override def prettyName: String = "rp_sign"
}

object RpSign {
  def mixPublic(z: Long): Long = mix(z)

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def sign(vec: ArrayData, nBits: Int, seed: Long): Long = {
    val n = vec.numElements()
    var out = 0L
    var p = 0
    while (p < nBits) {
      var dot = 0.0
      var d = 0
      while (d < n) {
        val u = if ((mix(seed * 1000003L + p * 131071L + d) & 1L) == 0L) 1.0 else -1.0
        dot += vec.getFloat(d) * u
        d += 1
      }
      if (dot >= 0) out |= (1L << p)
      p += 1
    }
    out
  }
}

/** Rademacher random projection of a float vector to `outDims` dimensions
  * (deterministic, seed-derived +-1 matrix, scaled 1/sqrt(outDims)) — the
  * coarse-quantization half of the approximate nearest-neighbor path: score
  * all candidates in the cheap projected space, exact-rerank only the top
  * fraction. Isotropic embeddings (no cluster structure) make bucket-style
  * LSH unrecallable; projection+rerank trades a tunable candidate depth for
  * a ~dims/outDims flop and IO reduction instead.
  */
case class RpProject(child: Expression, outDims: Int, seed: Long) extends UnaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"rp_project requires array<float>, got ${dt.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    RpProject.project(input.asInstanceOf[ArrayData], outDims, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RpProject.project($c, $outDims, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): RpProject =
    copy(child = newChild)

  override def prettyName: String = "rp_project"
}

object RpProject {
  def project(vec: ArrayData, outDims: Int, seed: Long): ArrayData = {
    val n = vec.numElements()
    val out = new Array[Float](outDims)
    val scale = (1.0 / math.sqrt(outDims)).toFloat
    var p = 0
    while (p < outDims) {
      var acc = 0.0f
      var d = 0
      while (d < n) {
        val u = if ((RpSign.mixPublic(seed * 1000003L + p * 131071L + d) & 1L) == 0L) 1.0f else -1.0f
        acc += vec.getFloat(d) * u
        d += 1
      }
      out(p) = acc * scale
      p += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}

object SimHash64 {
  def simhash(tokens: ArrayData, seed: Long): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = Fingerprint64.hash64Seeded(tokens.getUTF8String(i), seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Encoded band keys of a multi-signature simhash: for signature si and
  * band slot b (bandBits wide), emit (globalBand << bandBits) | key as ONE
  * long. The banding explode previously composed `transform(sequence(...))`
  * higher-order functions — CodegenFallback, so the projection building
  * 36 rows/doc (and 612/doc on the probe side) ran interpreted AND fell
  * out of whole-stage codegen; the encoded single-long key also replaces a
  * two-column (band, key) join key.
  */
case class SimHashBandKeys(child: Expression, bandBits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"simhash_band_keys requires array<long>, got ${dt.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHashBandKeys.keys(input.asInstanceOf[ArrayData], bandBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashBandKeys.keys($c, $bandBits)")

  override protected def withNewChildInternal(newChild: Expression): SimHashBandKeys =
    copy(child = newChild)

  override def prettyName: String = "simhash_band_keys"
}

object SimHashBandKeys {
  def keys(sigs: ArrayData, bandBits: Int): ArrayData = {
    val perSig = 64 / bandBits
    val mask = (1L << bandBits) - 1
    val nSigs = sigs.numElements()
    val out = new Array[Long](nSigs * perSig)
    var si = 0
    var band = 0
    while (si < nSigs) {
      val sig = sigs.getLong(si)
      var slot = 0
      while (slot < perSig) {
        out(band) = (band.toLong << bandBits) | ((sig >>> (slot * bandBits)) & mask)
        band += 1
        slot += 1
      }
      si += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Multi-probe variant of [[SimHashBandKeys]]: every band key XOR'd with
  * each mask of band-Hamming <= 1 (bandBits + 1 masks), so the equi-join
  * of exact keys against probe keys catches every pair whose band keys
  * differ in at most one bit.
  */
case class SimHashProbeKeys(child: Expression, bandBits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"simhash_probe_keys requires array<long>, got ${dt.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHashProbeKeys.keys(input.asInstanceOf[ArrayData], bandBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashProbeKeys.keys($c, $bandBits)")

  override protected def withNewChildInternal(newChild: Expression): SimHashProbeKeys =
    copy(child = newChild)

  override def prettyName: String = "simhash_probe_keys"
}

object SimHashProbeKeys {
  def keys(sigs: ArrayData, bandBits: Int): ArrayData = {
    val perSig = 64 / bandBits
    val mask = (1L << bandBits) - 1
    val nMasks = bandBits + 1
    val nSigs = sigs.numElements()
    val out = new Array[Long](nSigs * perSig * nMasks)
    var si = 0
    var band = 0
    var o = 0
    while (si < nSigs) {
      val sig = sigs.getLong(si)
      var slot = 0
      while (slot < perSig) {
        val key = (sig >>> (slot * bandBits)) & mask
        val enc = band.toLong << bandBits
        out(o) = enc | key
        o += 1
        var b = 0
        while (b < bandBits) {
          out(o) = enc | (key ^ (1L << b))
          o += 1
          b += 1
        }
        band += 1
        slot += 1
      }
      si += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** One hashed long per MinHash band (the `rows`-wide signature slice mixed
  * with a band-dependent seed): replaces the `slice()` array-valued join
  * key — a 64-bit collision can only ADD a candidate pair, and every
  * candidate is exact-verified downstream, so the result set is unchanged
  * while the LSH join runs on a primitive key.
  */
case class MinHashBandKeys(child: Expression, bands: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_band_keys requires array<long>, got ${dt.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashBandKeys.keys(input.asInstanceOf[ArrayData], bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashBandKeys.keys($c, $bands)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys =
    copy(child = newChild)

  override def prettyName: String = "minhash_band_keys"
}

object MinHashBandKeys {
  def keys(sig: ArrayData, bands: Int): ArrayData = {
    val n = sig.numElements()
    val rows = n / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0x9E3779B97F4A7C15L * (b + 1)
      var r = 0
      while (r < rows) {
        h = Fingerprint64.mix(h ^ sig.getLong(b * rows + r))
        r += 1
      }
      out(b) = h
      b += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Total Hamming distance between two equal-length array<long> signatures
  * (sum of per-word popcounts of the XOR) — the simhash prefilter as one
  * codegen'd call; the `aggregate(zip_with(..., bit_count(...)))`
  * composition it replaces is a higher-order-function tree, which is
  * CodegenFallback and excluded its projection from whole-stage codegen.
  */
case class HammingTotal(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = IntegerType

  // containsNull inputs are rejected at ANALYSIS time: getLong would read a
  // null slot as 0 and silently mis-measure. Inputs are always sketch
  // outputs (minhash_sig / simhash_multi), which declare containsNull=false.
  private def ok(dt: DataType) = dt match {
    case ArrayType(LongType, containsNull) => !containsNull
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "hamming_total requires two array<long containsNull=false> arguments " +
        "(sketch signatures; null slots have no Hamming semantics)")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HammingTotal.dist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HammingTotal.dist($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): HammingTotal = copy(left = l, right = r)

  override def prettyName: String = "hamming_total"
}

object HammingTotal {
  def dist(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    // signatures are fixed-length by construction; a mismatch is a caller
    // bug that the old math.min truncation would have silently absorbed
    require(b.numElements() == n,
      s"hamming_total: signature lengths differ ($n vs ${b.numElements()})")
    var d = 0
    var i = 0
    while (i < n) {
      d += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    d
  }
}

/** Count of equal positions between two array<long> signatures — the
  * MinHash prefilter (estimated-Jaccard bar) as one codegen'd call,
  * replacing a `size(filter(zip_with(...)))` CodegenFallback tree.
  */
case class MatchCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = IntegerType

  // same analysis-time containsNull rejection as HammingTotal: a null slot
  // read as 0 could spuriously "match" and inflate the estimated Jaccard
  private def ok(dt: DataType) = dt match {
    case ArrayType(LongType, containsNull) => !containsNull
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "match_count requires two array<long containsNull=false> arguments " +
        "(sketch signatures; null slots have no match semantics)")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    MatchCount.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.MatchCount.count($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): MatchCount = copy(left = l, right = r)

  override def prettyName: String = "match_count"
}

object MatchCount {
  def count(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"match_count: signature lengths differ ($n vs ${b.numElements()})")
    var c = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }
}
