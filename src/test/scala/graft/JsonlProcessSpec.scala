package graft

import org.apache.spark.sql.functions._
import graft.process.JsonlProcess

/** A13-A15: schema filter + deterministic dictionary obfuscation. */
class JsonlProcessSpec extends SparkSpec {

  import spark.implicits._

  private def df = Seq(
    ("20220101_000001_00001_aaaaa", "alice", "webapp"),
    ("20220101_000002_00002_bbbbb", "bob", null),
    ("20220101_000003_00003_ccccc", "alice", "etl"),
    ("20220101_000004_00004_ddddd", "carol", "webapp"))
    .toDF("query_id", "user", "source_app")

  test("obfuscation is first-seen-ordered, stable, and injective") {
    val out = JsonlProcess.renameUsers(df)
      .select("query_id", "user").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("20220101_000001_00001_aaaaa") === "user0") // alice first seen
    assert(out("20220101_000002_00002_bbbbb") === "user1")
    assert(out("20220101_000003_00003_ccccc") === "user0") // stable: same input → same token
    assert(out("20220101_000004_00004_ddddd") === "user2")
    // injective: distinct inputs → distinct tokens
    assert(out.values.toSet.size === 3)
    // running twice produces the same mapping (determinism)
    val again = JsonlProcess.renameUsers(df)
      .select("query_id", "user").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(again === out)
  }

  test("filter keeps matches, includeAbsent keeps nulls") {
    assert(JsonlProcess.filterByColumn(df, "source_app", "webapp").count() === 3)
    assert(JsonlProcess.filterByColumn(df, "source_app", "webapp",
      includeAbsent = false).count() === 2)
  }

  test("array obfuscation shares one dictionary across rows, keeps order") {
    val d = Seq(
      ("20220101_000001_00001_aaaaa", Seq("p_2022", "p_2023")),
      ("20220101_000002_00002_bbbbb", Seq("p_2023", "", "p_2024", "p_2022")),
      ("20220101_000003_00003_ccccc", Seq.empty[String]),
      ("20220101_000004_00004_ddddd", null: Seq[String]))
      .toDF("query_id", "partition_ids")
    val rows = JsonlProcess.obfuscateArrayColumn(d, "partition_ids", "partition")
      .orderBy("query_id").collect()
    val out = rows.map(r => Option(r.getSeq[String](1)).map(_.toList))
    // p_2022 seen first (row1 pos0) → partition0; p_2023 → partition1; p_2024 → partition2
    assert(out(0) === Some(List("partition0", "partition1")))
    // '' keeps its position unmapped (NameObfuscator's guard)
    assert(out(1) === Some(List("partition1", "", "partition2", "partition0")))
    assert(out(2) === Some(Nil)) // empty stays empty
    assert(out(3) === None) // null stays null
  }

  test("removeQuery blanks the text") {
    val d2 = df.withColumn("query", lit("SELECT secret FROM t"))
    assert(JsonlProcess.removeQuery(d2).select("query").distinct().collect()
      .map(_.getString(0)).toSeq === Seq(""))
  }
}
