package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** One-pass vector kernels for the similarity operators.
  *
  * The higher-order-function formulations (`aggregate(zip_with(...))`) never
  * enter whole-stage codegen — lambda bodies are interpreted per element —
  * and the hyperplane signature additionally made nPlanes separate passes
  * over each vector (the round-1 q_ann_lsh hot spot, 3.6 s vs 0.4 s for the
  * comparable simhash plan). These expressions are compiled single passes,
  * mirroring [[MinHashSignature]].
  *
  * Numeric discipline: accumulate in double, strictly in index order, so
  * results are bit-identical to the sequential HOF formulation they replace
  * (and to a DuckDB oracle computing the same dot/norm shape over DOUBLE[]).
  * Array elements are assumed non-null (embedding vectors); mismatched
  * lengths yield SQL NULL, matching `zip_with`'s null-padding behavior.
  */
object VectorKernelsImpl {

  @inline private def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** cosine = dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))) — boxed so a
    * length mismatch can return SQL NULL. */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = elem(a, i, aFloat)
      val y = elem(b, i, bFloat)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** JVM-wide cache of the deterministic hyperplane sign matrix
    * sign_p(d) = +1 if xxhash64(d, xxhash64(p, 42)) is even else -1.
    * Executors regenerate it locally (zero broadcast, a few KB); growing it
    * is idempotent — values only depend on (p, d) — so the hot path reads
    * the volatile reference lock-free and the signature kernels become pure
    * multiply-adds instead of 2 hash calls per plane×dim per ROW (at 128
    * planes × d=64 that was ~16 k hashes per input row). */
  private object SignCache {
    @volatile private var signs: Array[Array[Byte]] = Array.empty
    def get(nPlanes: Int, nDims: Int): Array[Array[Byte]] = {
      val s = signs
      if (s.length >= nPlanes && (nPlanes == 0 || s(0).length >= nDims)) s
      else synchronized {
        val cur = signs
        if (cur.length >= nPlanes && (nPlanes == 0 || cur(0).length >= nDims)) cur
        else {
          val np = math.max(nPlanes, cur.length)
          val nd = math.max(nDims, if (cur.isEmpty) 0 else cur(0).length)
          val grown = Array.tabulate(np) { p =>
            val hp = XXH64.hashInt(p, 42L) // xxhash64's default seed
            Array.tabulate(nd)(d => if (XXH64.hashInt(d, hp) % 2 == 0) 1.toByte else -1.toByte)
          }
          signs = grown
          grown
        }
      }
    }
  }

  /** nPlanes-bit sign signature: bit p set iff Σ_d emb[d]·sign_p(d) > 0,
    * with sign_p from the cached deterministic hyperplane family. */
  def hyperplaneSig(emb: ArrayData, nPlanes: Int, isFloat: Boolean): Long = {
    val n = emb.numElements()
    val signs = SignCache.get(nPlanes, n)
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      val sp = signs(p)
      var proj = 0.0
      var d = 0
      while (d < n) {
        val x = elem(emb, d, isFloat)
        proj += (if (sp(d) > 0) x else -x)
        d += 1
      }
      if (proj > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** `bands` independent LSH band keys, each a `bits`-bit sign signature over
    * its own hyperplane family (global plane indices [b·bits, (b+1)·bits) —
    * the same plane family as [[hyperplaneSig]], so for bands·bits ≤ 64 band
    * b here equals bit-slice b of the single signature). True multi-table
    * LSH: total planes = bands·bits may exceed 64, which is what makes
    * ≥16-bit band keys affordable without collapsing recall — each band is
    * an independent 2^bits-bucket hash table, not a slice of one table. */
  def hyperplaneBands(emb: ArrayData, bits: Int, bands: Int, isFloat: Boolean): ArrayData = {
    val n = emb.numElements()
    val signs = SignCache.get(bands * bits, n)
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var sig = 0L
      var i = 0
      while (i < bits) {
        val sp = signs(b * bits + i)
        var proj = 0.0
        var d = 0
        while (d < n) {
          val x = elem(emb, d, isFloat)
          proj += (if (sp(d) > 0) x else -x)
          d += 1
        }
        if (proj > 0) sig |= (1L << i)
        i += 1
      }
      out(b) = sig
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Ids of the `nProbe` centroids nearest (squared L2) to `emb`, ordered by
    * (distance asc, id asc) — the IVF coarse-quantizer assignment as one
    * projection over a plan-constant centroid matrix (no join, no window). */
  def nearestCentroids(emb: ArrayData, centroids: Array[Array[Double]],
      nProbe: Int, isFloat: Boolean): ArrayData = {
    val k = centroids.length
    val m = math.min(nProbe, k)
    val bestD = new Array[Double](m)
    val bestI = new Array[Int](m)
    java.util.Arrays.fill(bestD, Double.PositiveInfinity)
    java.util.Arrays.fill(bestI, Int.MaxValue)
    val n = emb.numElements()
    var c = 0
    while (c < k) {
      val cent = centroids(c)
      var d2 = 0.0
      var i = 0
      val lim = math.min(n, cent.length)
      while (i < lim) {
        val diff = elem(emb, i, isFloat) - cent(i)
        d2 += diff * diff
        i += 1
      }
      // insertion into the top-m list, ties broken by lower centroid id
      if (d2 < bestD(m - 1) || (d2 == bestD(m - 1) && c < bestI(m - 1))) {
        var j = m - 1
        while (j > 0 && (d2 < bestD(j - 1) || (d2 == bestD(j - 1) && c < bestI(j - 1)))) {
          bestD(j) = bestD(j - 1); bestI(j) = bestI(j - 1); j -= 1
        }
        bestD(j) = d2; bestI(j) = c
      }
      c += 1
    }
    new GenericArrayData(bestI.map(Int.box(_): Any))
  }
}

private[functions] object VectorKernels {
  def checkVec(dt: DataType, fname: String): TypeCheckResult = dt match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fname requires array<float> or array<double>, got $other")
  }
  def isFloat(dt: DataType): Boolean =
    dt.asInstanceOf[ArrayType].elementType == FloatType
}

/** `cosine_sim(array<float|double>, array<float|double>)` → double. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = VectorKernels.checkVec(left.dataType, "cosine_sim")
    if (l.isFailure) l else VectorKernels.checkVec(right.dataType, "cosine_sim")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  private lazy val lFloat = VectorKernels.isFloat(left.dataType)
  private lazy val rFloat = VectorKernels.isFloat(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernelsImpl.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lFloat, rFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("cos")
      s"""
         |java.lang.Double $boxed = graft.functions.VectorKernelsImpl.cosine($a, $b, $lFloat, $rFloat);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** `hyperplane_sig(array<float|double>, nPlanes)` → bigint: random-hyperplane
  * LSH sign signature (Charikar sketch), one compiled pass over the vector. */
case class HyperplaneSig(child: Expression, nPlanes: Int) extends UnaryExpression {
  require(nPlanes > 0 && nPlanes <= 64, s"nPlanes out of range: $nPlanes")

  override def checkInputDataTypes(): TypeCheckResult =
    VectorKernels.checkVec(child.dataType, "hyperplane_sig")

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  private lazy val isFloat = VectorKernels.isFloat(child.dataType)

  override def nullSafeEval(v: Any): Any =
    VectorKernelsImpl.hyperplaneSig(v.asInstanceOf[ArrayData], nPlanes, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorKernelsImpl.hyperplaneSig($c, $nPlanes, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

/** `hyperplane_bands(array<float|double>, bits, bands)` → array<bigint>:
  * `bands` independent random-hyperplane band keys of `bits` bits each —
  * multi-table LSH signatures in one compiled pass (total planes bands·bits,
  * unbounded by the single-long limit of [[HyperplaneSig]]). */
case class HyperplaneBands(child: Expression, bits: Int, bands: Int) extends UnaryExpression {
  require(bits > 0 && bits <= 64, s"bits out of range: $bits")
  require(bands > 0, s"bands out of range: $bands")

  override def checkInputDataTypes(): TypeCheckResult =
    VectorKernels.checkVec(child.dataType, "hyperplane_bands")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_bands"

  private lazy val isFloat = VectorKernels.isFloat(child.dataType)

  override def nullSafeEval(v: Any): Any =
    VectorKernelsImpl.hyperplaneBands(v.asInstanceOf[ArrayData], bits, bands, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorKernelsImpl.hyperplaneBands($c, $bits, $bands, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
    copy(child = newChild)
}

/** `nearest_centroids(embedding)` → array<int> of the nProbe nearest centroid
  * ids. The centroid matrix is a plan constant (the IVF model is O(nLists)
  * doubles), shipped to executors inside the serialized expression — the
  * broadcast-free analog of `crossJoin(broadcast(centroids)) + row_number`. */
case class NearestCentroids(child: Expression, centroids: Array[Array[Double]],
    nProbe: Int) extends UnaryExpression {
  require(nProbe > 0, s"nProbe out of range: $nProbe")
  require(centroids.nonEmpty, "empty centroid matrix")

  override def checkInputDataTypes(): TypeCheckResult =
    VectorKernels.checkVec(child.dataType, "nearest_centroids")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  private lazy val isFloat = VectorKernels.isFloat(child.dataType)

  override def nullSafeEval(v: Any): Any =
    VectorKernelsImpl.nearestCentroids(v.asInstanceOf[ArrayData], centroids, nProbe, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorKernelsImpl.nearestCentroids($c, $ref, $nProbe, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

object VectorFunctions {
  def cosine_sim(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))
  def hyperplane_sig(emb: Column, nPlanes: Int): Column =
    Bridge.column(HyperplaneSig(Bridge.expression(emb), nPlanes))
  def hyperplane_bands(emb: Column, bits: Int, bands: Int): Column =
    Bridge.column(HyperplaneBands(Bridge.expression(emb), bits, bands))
  def nearest_centroids(emb: Column, centroids: Array[Array[Double]], nProbe: Int): Column =
    Bridge.column(NearestCentroids(Bridge.expression(emb), centroids, nProbe))
}
