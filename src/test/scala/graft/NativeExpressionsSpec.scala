package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.NativeExpressions

import graft.functions.{CanonicalJson, TextHashes}
import graft.transform.SolrTransform

/** Native Catalyst expressions must agree with the compiled reference
  * implementations and survive whole-stage codegen. */
class NativeExpressionsSpec extends AnyFunSuite with SparkSpec {

  test("simhash expression equals the compiled function, inside codegen") {
    import spark.implicits._
    val texts = Seq("hello world foo bar", "", "a", "x y z w v u t s r q")
    // repartition keeps Catalyst from constant-folding the local relation,
    // so the expression actually runs in an executor codegen stage
    val df = texts.toDF("text").repartition(2)
      .select(col("text"), NativeExpressions.simhash32Col(col("text")).as("sh"))
      .filter(col("sh") >= 0 || col("sh") < 0) // keep expression under a filter too
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    texts.foreach { t => assert(got(t) == TextHashes.simhash32(t), s"for '$t'") }
    // plan stays in whole-stage codegen: the `*(n)` stage marker wraps the
    // project containing our expression, with no udf/python wrapper node
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("graft_simhash32"), plan)
    assert(!plan.contains("BatchEval") && !plan.toLowerCase.contains("scalaudf"))
  }

  test("simhash60 expression: 60-bit range, low-32 parity with simhash32 family") {
    import spark.implicits._
    val texts = Seq("hello world foo bar", "", "a", "the quick brown fox jumps")
    val got = texts.toDF("text").repartition(2)
      .select(col("text"), NativeExpressions.simhash60Col(col("text")).as("sh"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    texts.foreach { t =>
      val v = got(t)
      assert(v == TextHashes.simhash60(t), s"for '$t'")
      assert(v >= 0 && v < (1L << 60), s"out of 60-bit range for '$t'")
      // same coefficient family: the low 32 bit-planes match simhash32
      assert((v & 0xffffffffL) == TextHashes.simhash32(t), s"low-32 parity for '$t'")
    }
  }

  test("native functions register into SQL") {
    import spark.implicits._
    NativeExpressions.register(spark)
    Seq("a b c").toDF("text").createOrReplaceTempView("nx_docs")
    val row = spark.sql(
      "SELECT graft_simhash32(text) AS sh, graft_canonical_checksum('{\"a\": 1}') AS cks FROM nx_docs")
      .collect().head
    assert(row.getLong(0) == TextHashes.simhash32("a b c"))
    assert(row.getString(1) == CanonicalJson.checksumOf(SolrTransform.parse("""{"a": 1}""")))
  }

  test("dot product expression matches the compiled loop, stays in " +
    "codegen, handles nulls and ragged lengths") {
    import spark.implicits._
    NativeExpressions.register(spark)
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.1, 0.2), Array(0.3, 0.4, 9.9))) // ragged: min-length contract
      .toDF("a", "b")
    val got = df.select(NativeExpressions.dotCol(col("a"), col("b")).as("d"))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(32.0, 0.1 * 0.3 + 0.2 * 0.4))
    // SQL registration
    df.createOrReplaceTempView("nx_vecs")
    assert(spark.sql("SELECT graft_dot(a, b) FROM nx_vecs").collect()
      .head.getDouble(0) == 32.0)
    // null propagation (BinaryExpression null-safe contract)
    val withNull = Seq((Some(Array(1.0)), Option.empty[Array[Double]]))
      .toDF("a", "b")
    assert(withNull.select(NativeExpressions.dotCol(col("a"), col("b")))
      .collect().head.isNullAt(0))
  }

  test("canonical checksum expression equals CanonicalJson.checksumOf") {
    import spark.implicits._
    val docs = Seq(
      """{"b": 1, "a": [1.5, 0.2], "x_mtime": "drop", "t": true}""",
      """{"only": "field"}""")
    val got = docs.toDF("doc")
      .select(col("doc"), NativeExpressions.canonicalChecksumCol(col("doc")).as("cks"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    docs.foreach { d =>
      assert(got(d) == CanonicalJson.checksumOf(SolrTransform.parse(d)), s"for $d")
    }
    // null flows through as null (UnaryExpression null semantics)
    val n = Seq[Option[String]](None).toDF("doc")
      .select(NativeExpressions.canonicalChecksumCol(col("doc"))).collect()
    assert(n.head.isNullAt(0))
  }
}
