package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native codegen vector arithmetic for the embedding similarity family.
  *
  * The `zip_with`/`aggregate` higher-order formulation of a dot product
  * does not participate in whole-stage codegen (each lambda element is an
  * interpreted expression eval), and at ~n·|probes| scored pairs it
  * dominated the embedding benchmarks. These expressions are the same
  * pattern as [[PartialRatioSimExpr]]: plain loops inside generated code,
  * null handling inherited from Unary/BinaryExpression.
  *
  * Bit parity: [[DotFExpr]] folds left-to-right from 0.0 over
  * `(double) a(i) * (double) b(i)` — exactly the sequence of the HOF
  * formulation — so swapping it into an oracle-hash-matched query cannot
  * move a rounded result. Property-tested in VectorExprsSpec.
  */
object VectorExprs {

  private[graft] def isVec(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  /** Element accessor snippet for float-or-double array codegen. */
  private[graft] def getElem(arr: String, i: String, dt: DataType): String =
    dt match {
      case ArrayType(FloatType, _) => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }

  private[graft] def elemAt(arr: ArrayData, i: Int, dt: DataType): Double =
    dt match {
      case ArrayType(FloatType, _) => arr.getFloat(i).toDouble
      case _ => arr.getDouble(i)
    }
}

/** `dot_f(array<float|double>, array<float|double>) -> double`.
  *
  * Null iff: either input null, lengths differ, or any paired element is
  * null — the exact null surface of
  * `aggregate(zip_with(a, b, (x, y) => x*y), 0.0, _+_)` (zip_with pads the
  * shorter array with nulls; a null product poisons the whole fold).
  */
case class DotFExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorExprs.isVec(left.dataType) && VectorExprs.isVec(right.dataType)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"dot_f requires array<float|double> inputs, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // length mismatch -> null even for non-null inputs
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_f"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val la = a.asInstanceOf[ArrayData]
    val lb = b.asInstanceOf[ArrayData]
    val n = la.numElements()
    if (n != lb.numElements()) {
      null
    } else {
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (la.isNullAt(i) || lb.isNullAt(i)) return null
        acc += VectorExprs.elemAt(la, i, left.dataType) *
          VectorExprs.elemAt(lb, i, right.dataType)
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val ga = VectorExprs.getElem(a, i, left.dataType)
      val gb = VectorExprs.getElem(b, i, right.dataType)
      val nullA = left.dataType.asInstanceOf[ArrayType].containsNull
      val nullB = right.dataType.asInstanceOf[ArrayType].containsNull
      val elemNullCheck =
        if (nullA || nullB) {
          val checks = Seq(
            if (nullA) Some(s"$a.isNullAt($i)") else None,
            if (nullB) Some(s"$b.isNullAt($i)") else None).flatten.mkString(" || ")
          s"""if ($checks) { ${ev.isNull} = true; break; }"""
        } else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $elemNullCheck
         |    $acc += $ga * $gb;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotFExpr {
  /** Column API for the native dot product. */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(DotFExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

/** Sparse-sign-projection fingerprint:
  * `sparse_sign_sketch(array<float|double>) -> array<long>` (⌈h/64⌉
  * words, bit j set iff Σ_t signs(j)(t) · emb(indices(j)(t)) >= 0).
  *
  * Planes are very sparse ±1 projections (Achlioptas 2003; Li, Hastie &
  * Church 2006): each of the `h` bits reads only `s` coordinates, so
  * sketching costs h·s additions per row instead of h·dim multiplies —
  * the index-build pass over a 100 TB corpus is the dominant sketch cost
  * and this keeps it ~dim/s times cheaper than dense Gaussian planes at
  * (measured — see EmbeddingsSpec) indistinguishable recall.
  *
  * A null embedding, a null element, or a row narrower than the planes
  * THROWS instead of silently mapping to sketch 0 — same contract as
  * [[graft.operators.Embeddings.signSketch]]: a shared degenerate
  * fingerprint would silently turn every hamming probe into a full scan.
  *
  * The plane config is structural (`Seq`s, not `Array`s) so expression
  * equality and canonicalization see value semantics.
  */
case class SparseSignSketchExpr(
    child: Expression,
    indices: Seq[Seq[Int]],
    signs: Seq[Seq[Double]]) extends UnaryExpression {

  require(indices.nonEmpty && indices.size == signs.size &&
    indices.indices.forall(j => indices(j).size == signs(j).size),
    "sparse_sign_sketch: indices/signs shape mismatch")

  private def h: Int = indices.size
  private def words: Int = (h + 63) / 64

  // flat (bit-major) copies for the hot loop; transient — rebuilt per task
  @transient private lazy val flatIdx: Array[Int] = indices.flatten.toArray
  @transient private lazy val flatSgn: Array[Double] = signs.flatten.toArray
  @transient private lazy val bitOff: Array[Int] =
    indices.scanLeft(0)(_ + _.size).toArray

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorExprs.isVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sparse_sign_sketch requires array<float|double>, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sparse_sign_sketch"

  override protected def nullSafeEval(e: Any): Any = {
    val emb = e.asInstanceOf[ArrayData]
    val isFloat = child.dataType == ArrayType(FloatType, true) ||
      child.dataType == ArrayType(FloatType, false)
    new GenericArrayData(
      graft.functions.VectorOps.sparseSketch(emb, flatIdx, flatSgn, bitOff, h, isFloat))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idxRef = ctx.addReferenceObj("flatIdx", flatIdx, "int[]")
    val sgnRef = ctx.addReferenceObj("flatSgn", flatSgn, "double[]")
    val offRef = ctx.addReferenceObj("bitOff", bitOff, "int[]")
    val isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    nullSafeCodeGen(ctx, ev, e => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.VectorOps.sparseSketch(
         |    $e, $idxRef, $sgnRef, $offRef, $h, $isFloat));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // the default case-class rendering prints all h index/sign vectors into
  // every plan node that mentions the expression — megabyte plan strings
  // and truncated explains; equality/canonicalization still use the full
  // structural fields
  override def toString: String =
    s"sparse_sign_sketch($child, h=$h, s=${signs.headOption.fold(0)(_.size)})"
  override def sql: String = s"sparse_sign_sketch(${child.sql})"
}

object SparseSignSketchExpr {
  def sketch(emb: Column, indices: Seq[Seq[Int]], signs: Seq[Seq[Double]]): Column =
    ExpressionUtils.column(SparseSignSketchExpr(
      ExpressionUtils.expression(emb), indices, signs))
}

/** `hamming_dist(array<long>, array<long>) -> int` — popcount of the
  * XOR, word-wise. Mismatched word counts THROW (two sketches from
  * different configs is a caller bug, never data).
  */
case class HammingDistExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"hamming_dist requires array<bigint> inputs, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hamming_dist"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.VectorOps.hamming(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.hamming($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HammingDistExpr {
  def hamming(a: Column, b: Column): Column =
    ExpressionUtils.column(HammingDistExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
