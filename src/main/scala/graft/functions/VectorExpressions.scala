package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/**
 * Native Catalyst dot product over two double arrays, with whole-stage
 * codegen (doGenCode) — the hot inner loop of every cosine-similarity
 * operator. Accumulates strictly left-to-right so results are
 * bit-identical to a sequential fold (`aggregate(zip_with(...))`, or
 * DuckDB's `list_reduce`) — the engine/oracle determinism contract.
 *
 * Versus the higher-order-function formulation this avoids the
 * intermediate zipped array allocation and lambda interpretation
 * entirely: one fused loop over the unsafe array data.
 */
case class DotProductD(left: Expression, right: Expression)
  extends BinaryExpression {

  // Callers (VectorFunctions.vecDot / the SQL registration) guarantee
  // array<double> inputs; no ExpectsInputTypes (private[sql]).
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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // fresh names: several DotProductD instances can land in ONE generated
    // function (e.g. cosine = dot/(sqrt(dot)*sqrt(dot)) in a predicate)
    val n = ctx.freshName("dotN")
    val acc = ctx.freshName("dotAcc")
    val i = ctx.freshName("dotI")
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * Full MinHash signature in one native pass: for an array of element
 * hashes, returns [min_i((a_i*h + b_i) mod p)] for i in 0..k-1 — one
 * fused loop instead of k separate transform+array_min expression
 * trees (which codegen k lambdas and k array copies).
 * Permutation family must match [[graft.operators.Dedup]] (a=2i+1,
 * b=97+31i) so the DuckDB oracle reproduces it.
 */
case class MinHashSig(child: Expression, numHashes: Int, p: Long)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < numHashes) {
        val v = ((2L * i + 1) * h + (97L + 31L * i)) % p
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mins = ctx.freshName("mhMins")
    val j = ctx.freshName("mhJ")
    val i = ctx.freshName("mhI")
    val h = ctx.freshName("mhH")
    val v = ctx.freshName("mhV")
    val n = ctx.freshName("mhN")
    nullSafeCodeGen(ctx, ev, x =>
      s"""
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $n = $x.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $x.getLong($j);
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $v = ((2L * $i + 1) * $h + (97L + 31L * $i)) % ${p}L;
         |    if ($v < $mins[$i]) $mins[$i] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Deterministic integer hyperplane weights shared by every LSH family
  * (Similarity.planeWeight delegates here; OracleSqlGen bakes the same
  * integers into the DuckDB SQL; BandCodes loops over the same table). */
object PlaneWeights {
  /** Murmur-style finalizer mix → weight in [-3, 3]. (A plain linear
    * form like (p*73 + j*131) % 7 collapses mod 7 and yields only 7
    * distinct planes — the mix keeps every (p, j) independent.) */
  def weight(p: Int, j: Int): Int = {
    var h = p * 0x9E3779B1 + j * 0x85EBCA77
    h ^= h >>> 16
    h *= 0xC2B2AE35
    h ^= h >>> 13
    (((h.toLong & 0xFFFFFFFFL) % 7) - 3).toInt
  }

  /** Plane-major weight table for planes [0, nPlanes) × dims [0, nDims). */
  def table(nPlanes: Int, nDims: Int): Array[Array[Int]] =
    Array.tabulate(nPlanes, nDims)(weight)
}

/**
 * All banded hyperplane sign codes of a double vector in ONE native
 * pass: band b's code sets bit k iff dot(v, plane[b*nRows+k]) > 0, the
 * dot accumulated strictly left-to-right (oracle bit-parity). A single
 * fused loop replaces nBands*nRows Catalyst sum trees of 64 terms each —
 * those trees exceed the JVM method limit, kill whole-stage codegen for
 * the enclosing stage, and run interpreted (measured ~10× slower).
 */
case class BandCodes(child: Expression, nBands: Int, nRows: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType, false)
  override def prettyName: String = "graft_band_codes"

  @transient private lazy val weights: Array[Array[Int]] =
    PlaneWeights.table(nBands * nRows, 64)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), 64)
    val out = new Array[Int](nBands)
    var b = 0
    while (b < nBands) {
      var code = 0
      var k = 0
      while (k < nRows) {
        val w = weights(b * nRows + k)
        var acc = 0.0
        var j = 0
        while (j < n) { acc += v.getDouble(j) * w(j); j += 1 }
        if (acc > 0) code |= (1 << k)
        k += 1
      }
      out(b) = code
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("bandWeights", weights, "int[][]")
    val out = ctx.freshName("bcOut")
    val n = ctx.freshName("bcN")
    val b = ctx.freshName("bcB")
    val k = ctx.freshName("bcK")
    val j = ctx.freshName("bcJ")
    val w = ctx.freshName("bcW")
    val acc = ctx.freshName("bcAcc")
    val code = ctx.freshName("bcCode")
    nullSafeCodeGen(ctx, ev, x =>
      s"""
         |int[] $out = new int[$nBands];
         |int $n = java.lang.Math.min($x.numElements(), 64);
         |for (int $b = 0; $b < $nBands; $b++) {
         |  int $code = 0;
         |  for (int $k = 0; $k < $nRows; $k++) {
         |    int[] $w = $wRef[$b * $nRows + $k];
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $n; $j++) { $acc += $x.getDouble($j) * $w[$j]; }
         |    if ($acc > 0) $code |= (1 << $k);
         |  }
         |  $out[$b] = $code;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  /** Column API for [[DotProductD]]. */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductD(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column API for [[MinHashSig]]. */
  def minhashSig(hashes: Column, numHashes: Int, p: Long): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(hashes), numHashes, p))

  /** Column API for [[BandCodes]]. */
  def bandCodes(v: Column, nBands: Int, nRows: Int): Column =
    ColumnBridge.column(BandCodes(ColumnBridge.expression(v), nBands, nRows))
}
