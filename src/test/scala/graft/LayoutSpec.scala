package graft

import graft.operators.Layout
import graft.tables.Tables
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: writing both join sides bucketed on the join key must make
  * the repeated join shuffle-free (no Exchange in the plan) — the layout
  * strategy a 100 TB fact table relies on.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("same-bucketed tables sort-merge join with zero Exchange") {
    Layout.writeBucketed(
      Tables.load(spark, TestSpark.sf0001, "lineitem"), "li_bucketed", "l_orderkey", 8)
    Layout.writeBucketed(
      Tables.load(spark, TestSpark.sf0001, "orders"), "o_bucketed", "o_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the shuffle (or its absence) is visible
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Layout.bucketedJoin(spark, "li_bucketed", "o_bucketed",
        "l_orderkey", "o_orderkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles: $plan")
      // and it computes the same result as the plain join
      val plain = Tables.load(spark, TestSpark.sf0001, "lineitem")
        .join(Tables.load(spark, TestSpark.sf0001, "orders"),
          org.apache.spark.sql.functions.col("l_orderkey") ===
            org.apache.spark.sql.functions.col("o_orderkey"))
      assert(joined.count() === plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
