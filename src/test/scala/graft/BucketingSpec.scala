package graft

import org.apache.spark.sql.functions._

/** Co-located join via bucketing (SURVEY §1.4/§4: the reference's secondary
  * indexes become partitioning + bucketing in the Spark layout). A fact
  * table bucketed on its join key joins a same-bucketed dimension with NO
  * shuffle exchange — the property that makes repeated key joins viable at
  * 100 TB, pinned here on the executed plan. */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key tables sort-merge join without a shuffle") {
    val warehouse = java.nio.file.Files.createTempDirectory("graft_buckets")
    Tables.orders(spark, sfTiny).write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$warehouse/orders_bucketed")
      .saveAsTable("orders_bucketed")
    Tables.customer(spark, sfTiny).write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$warehouse/customer_bucketed")
      .saveAsTable("customer_bucketed")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_bucketed")
        .join(spark.table("customer_bucketed"),
          col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_name")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() ==
        Tables.orders(spark, sfTiny).join(Tables.customer(spark, sfTiny),
          col("o_custkey") === col("c_custkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS customer_bucketed")
    }
  }
}
