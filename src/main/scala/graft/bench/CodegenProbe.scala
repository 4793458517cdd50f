package graft.bench
import org.apache.spark.sql.SparkSession
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    spark.range(3).selectExpr("array(cast(id as double), 1.0d) as a", "array(1.0d, 2.0d) as b")
      .createOrReplaceTempView("v")
    val df = spark.sql("SELECT cosine_similarity(a, b) AS s FROM v")
    df.show()
    val gen = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    println("HAS_NATIVE_LOOP=" + gen.contains(".getDouble("))
    println("FALLBACK=" + gen.contains("CosineSimilarity.nullSafeEval"))

    // bloom probe: the sketch must be probed via the codegen reference
    // object (mightContainLong direct call), not an eval fallback
    val bf = spark.range(100).selectExpr("xxhash64(cast(id as string)) h")
      .stat.bloomFilter("h", 100L, 0.01)
    val bytes = graft.functions.BloomMightContain.serialize(bf)
    val probe = spark.range(10).selectExpr("cast(id as string) s")
      .select(graft.functions.GraftFunctions.bloom_might_contain(
        org.apache.spark.sql.functions.lit(bytes),
        org.apache.spark.sql.functions.xxhash64(
          org.apache.spark.sql.functions.col("s"))).as("hit"))
    probe.show()
    val bgen = org.apache.spark.sql.execution.debug.codegenString(probe.queryExecution.executedPlan)
    println("BLOOM_NATIVE=" + bgen.contains(".mightContainLong("))
    println("BLOOM_FALLBACK=" + bgen.contains("BloomMightContain.nullSafeEval"))

    // salted skew join: hot key spread over salt sub-keys, same result
    import spark.implicits._
    val left = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, i)).toDF("k", "p")
    val right = (1L to 2000L).map(k => (k, s"d$k")).toDF("rk", "d")
    val salted = graft.operators.SkewJoin.saltedInner(left, right, "k", "rk", 8)
    println("SALTED_COUNT=" + salted.count() +
      " PLAIN_COUNT=" + left.join(right, $"k" === $"rk").count())
    spark.stop()
  }
}
