package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native product-quantization code assignment (SURVEY.md §2.4 d51):
  * for each of `m` subspaces, the index of the nearest codeword by
  * squared L2 over the lattice coordinates, ties to the lowest index.
  *
  * Why an Expression: assignment is m·k·subDim multiply-adds per row
  * (256 distance terms at the shipped 16×16×4) and sits inside both
  * the training loop (once per Lloyd round) and the encode pass — as
  * `transform`/`aggregate`/`zip_with` lambdas it runs interpreted and
  * allocates per subspace (the d51 entry measured 4.9 s at sf0.1,
  * dominated by exactly this, the same disease the r4 study found in
  * interpreted shingles). Here it is one fused codegen loop over a
  * codebook that rides along as a reference object; the eval path
  * matches bit-for-bit.
  *
  * The codebook is passed FLATTENED (cb[j][c][p] at ((j·k)+c)·subDim+p)
  * as an array literal, so the expression stays registrable through the
  * standard FunctionRegistry builder (literal-argument discipline of
  * minhash_sig/winnow/shingle_hashes).
  */
case class PqAssignCodes(child: Expression, flatCb: Seq[Long], m: Int, k: Int)
    extends UnaryExpression {

  require(m >= 1 && k >= 1 && flatCb.nonEmpty && flatCb.length % (m * k) == 0,
    s"flat codebook of ${flatCb.length} does not factor into m=$m k=$k subspaces")
  private val subDim: Int = flatCb.length / (m * k)
  @transient private lazy val cbArr: Array[Long] = flatCb.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> lattice coordinates, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"

  override def nullSafeEval(input: Any): Any = {
    val q = input.asInstanceOf[ArrayData]
    // UnsafeArrayData.getLong does NOT bounds-check: a short/ragged
    // vector would silently read adjacent row memory and poison the
    // codes — fail loudly instead
    if (q.numElements() != m * subDim)
      throw new IllegalArgumentException(
        s"pq_codes: vector has ${q.numElements()} dims, codebook expects ${m * subDim}")
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = Long.MaxValue
      var bi = 0
      val qo = j * subDim
      val co = j * k * subDim
      var c = 0
      while (c < k) {
        var d = 0L
        var p = 0
        while (p < subDim) {
          val t = q.getLong(qo + p) - cbArr(co + c * subDim + p)
          d += t * t
          p += 1
        }
        if (d < best) { best = d; bi = c }
        c += 1
      }
      codes(j) = bi
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cbRef = ctx.addReferenceObj("pqCodebook", cbArr, "long[]")
      val codes = ctx.freshName("codes")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val p = ctx.freshName("p")
      val best = ctx.freshName("best")
      val bi = ctx.freshName("bi")
      val qo = ctx.freshName("qo")
      val co = ctx.freshName("co")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      s"""
         |if ($a.numElements() != ${m * subDim}) {
         |  throw new IllegalArgumentException(
         |    "pq_codes: vector has " + $a.numElements() +
         |    " dims, codebook expects ${m * subDim}");
         |}
         |final int[] $codes = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  long $best = Long.MAX_VALUE;
         |  int $bi = 0;
         |  final int $qo = $j * $subDim;
         |  final int $co = $j * $k * $subDim;
         |  for (int $c = 0; $c < $k; $c++) {
         |    long $d = 0L;
         |    for (int $p = 0; $p < $subDim; $p++) {
         |      final long $t = $a.getLong($qo + $p) - $cbRef[$co + $c * $subDim + $p];
         |      $d += $t * $t;
         |    }
         |    if ($d < $best) { $best = $d; $bi = $c; }
         |  }
         |  $codes[$j] = $bi;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
