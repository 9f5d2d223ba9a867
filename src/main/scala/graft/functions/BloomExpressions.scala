package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as a native codegen'd expression.
  *
  * The scale pattern it serves: dedup-against-a-reference-corpus. At
  * 100 TB, anti-joining every incoming document against a trillion-row
  * "already seen" set shuffles both sides; a Bloom filter built on the
  * reference (distributed aggregate, OR-merged bits; the driver holds
  * only the final bitset) and shipped to every task turns that into a
  * scan-local prefilter, and only the tiny might-contain remainder pays
  * the exact confirm join. Same role as the reference engine's runtime
  * filters pushed into scans
  * (reference: flink-table-planner-blink runtime filter rules; Spark's
  * own InjectRuntimeFilter applies the identical idea to join keys).
  */
object BloomExpressions {

  /** Register SQL names in the session's FunctionRegistry; idempotent.
    * (The Column constructor is private[sql] in Spark 4, so the public
    * path to a custom Expression is registry + call_function.)
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "bloom_might_contain",
      es => BloomMightContain(es(0), es(1).eval().asInstanceOf[Array[Byte]]),
      "built-in"
    )
  }

  /** Column wrapper: test `c` (string) against a driver-built filter. */
  def bloom_might_contain(c: Column, filter: BloomFilter): Column =
    org.apache.spark.sql.functions.call_function(
      "bloom_might_contain",
      c,
      org.apache.spark.sql.functions.lit(serialize(filter))
    )

  def serialize(filter: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    filter.writeTo(out)
    out.toByteArray
  }

  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
}

/** mightContain(text) against a serialized Bloom filter literal. The
  * filter travels as bytes (portable serialization via writeTo/readFrom
  * rather than Java serialization of the impl class) and is rebuilt
  * lazily once per executor. Membership bytes match the builder side:
  * `Dataset.stat.bloomFilter` puts strings as UTF-8 (putString ==
  * putBinary(utf8 bytes)), and UTF8String.getBytes yields exactly those
  * bytes — asserted by BloomPrefilterSpec.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain expects a string column, got $other")
    }

  @transient private lazy val filter: BloomFilter =
    BloomExpressions.deserialize(bloomBytes)

  /** Kernel shared by interpreted eval and generated code. */
  def contains(s: UTF8String): Boolean = filter.mightContainBinary(s.getBytes)

  override def nullSafeEval(input: Any): Any =
    java.lang.Boolean.valueOf(contains(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the expression itself (serializable: bytes + lazy
    // filter), not the BloomFilter impl, so executor-side codegen
    // deserialization never depends on the sketch class's Java
    // serialization format
    val ref = ctx.addReferenceObj("bloomExpr", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.contains($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
