package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver star schema (`TESTDATA.md`, `FIXTURES.md` §2).
  *
  * Each table is one parquet file; at 100 TB these would be partitioned
  * directories — the loaders take a dir so the same code serves both. All
  * downstream queries select only the columns they need, so parquet column
  * pruning keeps scans minimal regardless of table width.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects by
    * default. Read it as a long (legacy conf), keep the exact nanos in
    * `ts_ns` (for tie-free ordering), and expose `ts` as a micros-precision
    * TimestampType for date_trunc/event-time work. Integer `div`, not `/`:
    * epoch-nanos overflow double precision.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts_ns", org.apache.spark.sql.functions.col("ts"))
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
