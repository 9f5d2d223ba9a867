package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot inner loops of the
  * dedup/similarity operators. The declarative formulations
  * (aggregate/zip_with folds) are interpreted per element — fine for
  * correctness baselines, ~50x too slow for a 100 TB pass. These run
  * as tight JVM loops over ArrayData, and all four participate in
  * whole-stage codegen: the generated code calls the statically
  * compiled kernel below (one JIT-compiled method call per row), so a
  * projection containing them never falls back to interpreted
  * per-expression eval.
  */
object SketchExpressions {

  /** Register SQL names in the session's FunctionRegistry; idempotent.
    * (The Column constructor is private[sql] in Spark 4, so the public
    * path to a custom Expression is registry + call_function.)
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("dot_product", es => DotProduct(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("minhash_signature", es => MinHashSignature(es.head), "built-in")
    reg.createOrReplaceTempFunction("simhash64", es => SimHash64(es.head), "built-in")
    reg.createOrReplaceTempFunction("word_shingles", es => WordShingles(es.head), "built-in")
    reg.createOrReplaceTempFunction("struct_term_sum", es => StructTermSum(es.head), "built-in")
    reg.createOrReplaceTempFunction(
      "hyperplane_buckets",
      es => HyperplaneBuckets(
        es(0),
        es(1).eval().asInstanceOf[Int],
        es(2).eval().asInstanceOf[Int],
        es(3).eval().asInstanceOf[Int]
      ),
      "built-in"
    )
  }

  /** Column API wrappers (require register() on the session first). */
  def dot_product(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("dot_product", a, b)
  def minhash_signature(shingles: Column): Column =
    org.apache.spark.sql.functions.call_function("minhash_signature", shingles)
  def simhash64(words: Column): Column =
    org.apache.spark.sql.functions.call_function("simhash64", words)
  def word_shingles(text: Column): Column =
    org.apache.spark.sql.functions.call_function("word_shingles", text)
  def struct_term_sum(sortedStructs: Column): Column =
    org.apache.spark.sql.functions.call_function("struct_term_sum", sortedStructs)
  def hyperplane_buckets(v: Column, planes: Int, dim: Int, numTables: Int): Column =
    org.apache.spark.sql.functions.call_function(
      "hyperplane_buckets",
      v,
      org.apache.spark.sql.functions.lit(planes),
      org.apache.spark.sql.functions.lit(dim),
      org.apache.spark.sql.functions.lit(numTables)
    )
}

/** Sequential-order dot product of two double arrays, with whole-stage
  * codegen. Matches the fold order of functions.aggregate and DuckDB's
  * list_inner_product bit-for-bit.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects two array<double>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $a.getDouble($i) * $b.getDouble($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** 64-slot MinHash signature of a shingle array: h_i(x) = (a_i·m(x) +
  * b_i) mod (2^31−1) with m = murmur3 (Spark's hash() seed 42).
  * Coefficients come from a fixed LCG so results are stable across
  * JVMs/sessions.
  */
case class MinHashSignature(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinHashSignature.compute($a);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashSignature {
  val NumHashes = 64
  val P = 2147483647L // 2^31 - 1
  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => (x * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue)
  val As: Array[Long] = lcg(42L).map(x => (x % (P - 1)) + 1).take(NumHashes).toArray
  val Bs: Array[Long] = lcg(7L).map(_ % P).take(NumHashes).toArray

  /** The kernel: statically compiled, called from both interpreted
    * eval and generated code.
    */
  def compute(arr: ArrayData): ArrayData = {
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      val s = arr.getUTF8String(j)
      val h = java.lang.Math.floorMod(
        Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42).toLong,
        P
      )
      var i = 0
      while (i < NumHashes) {
        val v = java.lang.Math.floorMod(As(i) * h + Bs(i), P)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }
}

/** Distinct 3-word shingles of a whitespace-tokenized text, as one
  * tight loop (the declarative transform/sequence/concat_ws/
  * array_distinct tree is ~10x slower). Semantics match DuckDB's
  * `[array_to_string(words[i:i+2],' ') for i in range(1,len(words)-1)]`
  * with string_split tokenization: empty tokens are kept, docs under 3
  * words yield an empty array.
  */
case class WordShingles(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WordShingles.compute($a);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object WordShingles {
  /** The kernel: statically compiled, called from both interpreted
    * eval and generated code.
    */
  def compute(text: UTF8String): ArrayData = {
    val words = text.toString.split(" ", -1)
    if (words.length < 3) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i + 2 < words.length) {
        seen.add(words(i) + " " + words(i + 1) + " " + words(i + 2))
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) {
        out(j) = UTF8String.fromString(it.next())
        j += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** All `numTables` random-hyperplane LSH bucket codes of a vector in
  * one tight loop: bit p of table t's code is the sign of the dot
  * product with a deterministic ±1 hyperplane. Replaces a literal
  * expression tree of numTables × planes × dim coefficients (the
  * declarative form costs seconds of codegen compilation alone and
  * evaluates the coefficient branches per row).
  */
case class HyperplaneBuckets(child: Expression, planes: Int, dim: Int, numTables: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    HyperplaneBuckets.compute(input.asInstanceOf[ArrayData], planes, dim, numTables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HyperplaneBuckets.compute($a, $planes, $dim, $numTables);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object HyperplaneBuckets {
  /** The kernel: statically compiled, called from both interpreted
    * eval and generated code. The ±1 coefficient for (table t, plane
    * p, dim d) is a fixed bit-mix — stable across JVMs and sessions.
    */
  def compute(v: ArrayData, planes: Int, dim: Int, numTables: Int): ArrayData = {
    val n = math.min(dim, v.numElements())
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var code = 0L
      var p = 0
      while (p < planes) {
        var s = 0.0
        var d = 0
        while (d < n) {
          val bit = ((t * 40503L + p) * 1315423911L + d * 2654435761L) >>> 7 & 1L
          s += (if (bit == 1L) v.getDouble(d) else -v.getDouble(d))
          d += 1
        }
        if (s >= 0) code |= (1L << p)
        p += 1
      }
      out(t) = code
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** 64-bit SimHash of a token array (multiset-weighted sign sketch),
  * murmur3-based with two 32-bit halves per token.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SimHash64.compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHash64.compute($a);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHash64 {
  /** The kernel: statically compiled, called from both interpreted
    * eval and generated code.
    */
  def compute(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      val s = arr.getUTF8String(j)
      val lo = Murmur3_x86_32
        .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42)
        .toLong & 0xffffffffL
      val hi = Murmur3_x86_32
        .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 1042)
        .toLong & 0xffffffffL
      val h = (hi << 32) | lo
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }
}

/** Sequential sum of the LAST struct field (double) over an array of
  * structs, in array order — the native kernel behind the module-wide
  * sorted-fold determinism discipline (bm25 / nb_classify / bigram /
  * dsir score folds: `struct_term_sum(sort_array(collect_list(
  * struct(key…, term))))`). Bit-identical to the interpreted
  * `aggregate(…, 0.0, (acc, x) => acc + x.term)` fold it replaces
  * FOR NON-NULL TERMS — the only shape current callers produce
  * (every fold feeds `collect_list`, which drops null structs, over
  * terms built from non-null aggregates). On a null element or null
  * term field this kernel SKIPS it, where the interpreted fold would
  * propagate null (`acc + null => null`) — revisit if a caller ever
  * folds nullable terms. Runs as one tight
  * JIT'd loop inside whole-stage codegen instead of a per-element
  * interpreted closure — the same ~10–50x hot-loop gap the other
  * kernels in this file exist for.
  */
case class StructTermSum(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType

  private lazy val numFields: Int = child.dataType match {
    case ArrayType(st: StructType, _) => st.length
    case _ => 0
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(st: StructType, _) if st.nonEmpty && st.last.dataType == DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"struct_term_sum expects array<struct<..., term: double>>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nf = numFields
    var s = 0.0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, nf)
        if (!row.isNullAt(nf - 1)) s += row.getDouble(nf - 1)
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val row = ctx.freshName("row")
      s"""
         |int $n = $a.numElements();
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    org.apache.spark.sql.catalyst.InternalRow $row = $a.getStruct($i, $numFields);
         |    if (!$row.isNullAt(${numFields - 1})) {
         |      ${ev.value} += $row.getDouble(${numFields - 1});
         |    }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
