package graft

/** Throwaway diagnostic: print a gate's NORMALIZED plan string so two JVM
  * runs can be diffed for fingerprint instability. Not part of the
  * library surface.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val gate = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val df = SparkEntry.queries(gate)(spark, sfDir)
    println("=== NORMALIZED PLAN START ===")
    println(PlanFingerprint.normalize(PlanFingerprint.planString(df)))
    println("=== NORMALIZED PLAN END ===")
    spark.stop()
  }
}
