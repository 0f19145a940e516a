package graft

import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Evidence for SCALE.md's co-located-join claim: writing both sides
  * bucketed on the join key removes the per-query shuffle entirely — the
  * scan itself is the partitioning. At 100 TB this is the difference
  * between re-shuffling the fact table on every join and paying the
  * shuffle once at write time.
  */
class BucketingSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("bucketed-by-key tables join and aggregate with zero Exchange") {
    // tables land in the session's default warehouse (./spark-warehouse,
    // gitignored); DROP TABLE below removes the files
    val ev = Tables.events(spark, d).select(col("event_id"), col("user_id"), col("value"))
    ev.write.bucketBy(4, "user_id").mode("overwrite").saveAsTable("bspec_a")
    ev.write.bucketBy(4, "user_id").mode("overwrite").saveAsTable("bspec_b")
    try {
      val joined = spark.table("bspec_a").groupBy(col("user_id")).agg(count(lit(1)).as("na"))
        .join(spark.table("bspec_b").groupBy(col("user_id")).agg(sum(col("value")).as("vb")),
          "user_id")
      val p = joined.queryExecution.executedPlan.toString
      // both aggregations AND the join ride the bucketing: no shuffle anywhere
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$p")
      assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"),
        s"scan should report bucketed reading:\n$p")
      // and the result matches the unbucketed computation
      val expected = ev.groupBy(col("user_id")).agg(count(lit(1)).as("na"))
        .join(ev.groupBy(col("user_id")).agg(sum(col("value")).as("vb")), "user_id")
      assert(joined.orderBy(col("user_id")).collect().toSeq ===
        expected.orderBy(col("user_id")).collect().toSeq)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bspec_a")
      spark.sql("DROP TABLE IF EXISTS bspec_b")
    }
  }
}
