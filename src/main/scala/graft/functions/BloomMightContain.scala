package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst predicate probing a pre-built Bloom filter sketch
  * (`org.apache.spark.util.sketch.BloomFilter`, the public sketch behind
  * `DataFrameStatFunctions.bloomFilter`): `bloom_might_contain(bloom,
  * xxhash64(x))` — false means DEFINITELY absent, true means probably
  * present (fpp-bounded). The (b)-tier extension point, like
  * [[CosineSimilarity]]: codegen'd (no UDF boxing/serialization), stays
  * inside whole-stage codegen, so a corpus-scale prefilter scan keeps
  * one fused stage.
  *
  * The sketch arrives as a FOLDABLE binary argument (the serialized
  * filter embedded as a literal in the plan, broadcast to executors
  * with the task binary) and is deserialized ONCE per
  * partition/codegen-object, not per row.
  *
  * Why not Spark's internal `BloomFilterMightContain`: that expression
  * is a runtime-filter implementation detail wired to
  * `BloomFilterAggregate`'s binary layout and is not constructible
  * through any public API; this one works with the PUBLIC sketch the
  * `df.stat.bloomFilter` builder returns.
  */
case class BloomMightContain(bloomBytes: Expression, value: Expression)
    extends BinaryExpression {

  override def left: Expression = bloomBytes
  override def right: Expression = value

  override def checkInputDataTypes(): TypeCheckResult =
    if (!bloomBytes.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable (literal) serialized bloom filter")
    else if (bloomBytes.dataType != BinaryType || value.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, bigint), " +
          s"got ${bloomBytes.dataType.simpleString} and ${value.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomMightContain.deserialize(
      bloomBytes.eval(null).asInstanceOf[Array[Byte]])

  override def nullSafeEval(bytes: Any, v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // a foldable NULL sketch passes checkInputDataTypes; parity with the
    // null-intolerant interpreted path is a constant-null result, not an
    // NPE from forcing the lazy deserialize at codegen time
    if (bloomBytes.eval(null) == null) {
      ExprCode.forNullValue(dataType)
    } else {
      // deserialize once at codegen time and ship the OBJECT as a codegen
      // reference — per-row work is a direct sketch probe, no byte parsing
      val bloomRef = ctx.addReferenceObj("bloomFilter", bloom,
        classOf[BloomFilter].getName)
      nullSafeCodeGen(ctx, ev, (_, v) =>
        s"${ev.value} = $bloomRef.mightContainLong($v);")
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(bloomBytes = newLeft, value = newRight)
}

object BloomMightContain {

  def serialize(bf: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  def deserialize(bytes: Array[Byte]): BloomFilter = {
    require(bytes != null && bytes.nonEmpty,
      "bloom_might_contain: empty serialized bloom filter")
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }
}
