package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for cosine similarity over two
  * `array<double>` columns, WITH whole-stage codegen (`doGenCode` emits
  * a primitive double loop) — the (b)-tier extension point: faster than
  * a Scala UDF (no boxing, no serialization boundary) and usable from
  * SQL once registered (see [[GraftFunctions.register]]).
  *
  * Null semantics: null if either side is null (`nullIntolerant`);
  * mismatched lengths compare the common prefix; zero vectors yield NaN
  * (same as dividing by a zero norm anywhere else).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / math.sqrt(na * nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double xv = $a.getDouble($i);
         |  double yv = $b.getDouble($i);
         |  $dot += xv * yv; $na += xv * xv; $nb += yv * yv;
         |}
         |${ev.value} = $dot / java.lang.Math.sqrt($na * $nb);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Native codegen squared euclidean distance over two `array<double>`
  * columns — [[CosineSimilarity]]'s L2 sibling (PQ/IVF quantizers rank
  * by L2, so their exact baselines must too). The sum folds in
  * ascending dimension order, the same order DuckDB's
  * `list_sum(list_transform(...))` folds, so the raw double is
  * bit-equal across engines (the IvfSearch.sqDist contract, as a
  * codegen Column). Mismatched lengths compare the common prefix;
  * null if either side is null.
  */
case class SquaredL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "squared_l2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double dv = $a.getDouble($i) - $b.getDouble($i);
         |  $s += dv * dv;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredL2 =
    copy(left = newLeft, right = newRight)
}

/** Column wrappers + SQL registration for graft's native expressions.
  *
  * Spark 4 made the Column-from-Expression constructors private[sql], so
  * the public path is FunctionRegistry + `call_function` — which also
  * makes the expression SQL-callable for free
  * (`SELECT cosine_similarity(a.embedding, b.embedding) ...`).
  */
object GraftFunctions {

  /** Register SQL-callable names on a session (idempotent). Skips the
    * re-registration when the names are already present so the hot-path
    * Column wrappers below don't spam `SimpleFunctionRegistry ...
    * replaced a previously registered function` warnings on every
    * query construction.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    if (spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("squared_l2"))) return
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity",
      exprs => CosineSimilarity(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain",
      exprs => BloomMightContain(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "squared_l2",
      exprs => SquaredL2(exprs(0), exprs(1)),
      "built-in")
  }

  /** Native codegen squared L2 as a Column function; registers on the
    * active session on first use.
    */
  def squared_l2(a: Column, b: Column): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession.foreach(register)
    org.apache.spark.sql.functions.call_function("squared_l2", a, b)
  }

  /** Native codegen cosine similarity as a Column function; registers on
    * the active session on first use.
    */
  def cosine_similarity(a: Column, b: Column): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession.foreach(register)
    org.apache.spark.sql.functions.call_function("cosine_similarity", a, b)
  }

  /** Native codegen bloom probe as a Column function (see
    * [[BloomMightContain]]); registers on the active session on first
    * use. `bloomBytes` must be a binary literal (`lit(serialized)`).
    */
  def bloom_might_contain(bloomBytes: Column, value: Column): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession.foreach(register)
    org.apache.spark.sql.functions.call_function("bloom_might_contain", bloomBytes, value)
  }

  /** Column form of [[TextHashing.round4]] — round half away from zero
    * at 4 dp via the floor trick, as built-in codegen'd functions
    * performing the IDENTICAL double operations as the scalar helper,
    * so a typed-map stage and a Column stage can never disagree on a
    * rounded score. (Spark's `round(c, 4)` is BigDecimal HALF_UP on
    * the exact binary value — one ulp-step off at representation
    * boundaries.) `floor` yields LongType, exact for |x| < 2^53/1e4.
    */
  def round4(c: Column): Column = {
    import org.apache.spark.sql.functions.{abs, floor, lit, signum}
    signum(c) * floor(abs(c) * lit(1e4) + lit(0.5)) / lit(1e4)
  }

  /** 6-dp sibling of [[round4]] — the pre-round half of the repo's
    * round6-then-round4 two-step for cross-engine float aggregates
    * (sum TERMS identical, fold order not: the 6-dp floor absorbs the
    * ulp drift before a 4-dp emit can flip on a .00005 boundary).
    */
  def round6(c: Column): Column = {
    import org.apache.spark.sql.functions.{abs, floor, lit, signum}
    signum(c) * floor(abs(c) * lit(1e6) + lit(0.5)) / lit(1e6)
  }
}
