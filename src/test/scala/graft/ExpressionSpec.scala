package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.queries.Qutil

/** Native CosineSim expression: equivalence with the HOF composition and
  * SQL-registry availability. */
class ExpressionSpec extends SparkSpec {

  test("cosine_sim is BIT-identical to the HOF cosine (drop-in swap, zero drift)") {
    // Stronger than approximate agreement: the native fused loop adds each
    // accumulator's terms in the same index order as the three HOF folds,
    // so every IEEE intermediate matches and the swap is exact — meaning
    // the catalog's oracled queries could adopt the codegen'd expression
    // at deployment without invalidating a single golden or oracle hash.
    GraftFunctions.registerAll(spark)
    val e = Tables.embeddings(spark, sf).limit(200)
    val q = Tables.embeddings(spark, sf).where(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    val both = e.crossJoin(broadcast(q))
      .select(col("vec_id"),
        call_function("cosine_sim", col("embedding"), col("qv")).as("native"),
        Qutil.cosineD(col("embedding"), col("qv")).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"vec ${r.getLong(0)}: native=${r.getDouble(1)} hof=${r.getDouble(2)}")
    }
  }

  test("cosine_sim callable from SQL after registration") {
    GraftFunctions.registerAll(spark)
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb_expr_test")
    val r = spark.sql(
      """SELECT cosine_sim(a.embedding, b.embedding) AS c
        |FROM emb_expr_test a JOIN emb_expr_test b ON a.vec_id = 0 AND b.vec_id = 0
        |""".stripMargin).head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12, "self-similarity must be 1")
  }

  test("cosine_sim survives whole-stage codegen (no fallback errors) and nulls") {
    GraftFunctions.registerAll(spark)
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 2.0f), Array(1.0f, 2.0f)),
      (2L, Array(0.0f, 0.0f), Array(1.0f, 2.0f))
    ).toDF("id", "a", "b")
      .select(col("id"), call_function("cosine_sim", col("a"), col("b")).as("c"))
    val rows = df.orderBy("id").collect()
    assert(math.abs(rows(0).getDouble(1) - 1.0) < 1e-12)
    assert(rows(1).isNullAt(1), "zero-norm vector must yield NULL")
  }
}
