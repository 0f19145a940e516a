package graft

import java.nio.file.{Files, Paths}
import graft.process.RawProcess
import graft.process.RawProcess.Options

/** Raw-JSON obfuscation: `jsonl_process.py` key-based semantics over the
  * nested documents, pre-flatten — the parity path for `rows`-clearing and
  * schema/catalog renames that the normalized-summary [[graft.process.JsonlProcess]]
  * cannot carry (its two documented divergences).
  */
class RawProcessSpec extends SparkSpec {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  // three QueryInfo-shaped docs; file names sort a1 < b2 < c3 < d4, which
  // fixes the reference's sequential first-seen token order
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-raw").toString
    Files.write(Paths.get(d, "a1.json"),
      """{"queryId":"q1","query":"SELECT secret FROM web.logs",
        |"session":{"user":"alice","principal":"alice@corp"},
        |"inputs":[{"connectorId":"hive","schema":"web","table":"logs"}],
        |"outputStage":{"plan":{"root":{"@type":"values","rows":[["1","2"]],
        |  "sources":[{"table":{"connectorHandle":
        |    {"catalogName":"hive","schemaName":"web","tableName":"logs"}}}]}}},
        |"partitionIds":["p_2022","","p_2023"]}""".stripMargin
        .replaceAll("\n", "").getBytes)
    Files.write(Paths.get(d, "b2.json"),
      """{"queryId":"q2","query":"SELECT 1",
        |"session":{"user":"bob","principal":"alice@corp"},
        |"inputs":[{"connectorId":"hive","schema":"sales","table":"orders"}],
        |"outputStage":{"plan":{"root":{"@type":"scan",
        |  "table":{"connectorHandle":{"catalogName":"iceberg","schemaName":"web"}},
        |  "location":"s3://secret/bucket"}}}}""".stripMargin
        .replaceAll("\n", "").getBytes)
    Files.write(Paths.get(d, "c3.json"),
      """{"queryId":"q3","query":"SHOW CATALOGS",
        |"session":{"user":"alice"},
        |"inputs":[{"connectorId":"iceberg","table":"t"}]}""".stripMargin
        .replaceAll("\n", "").getBytes)
    Files.write(Paths.get(d, "d4.json"), "this is not json".getBytes)
    d
  }

  private def run(opts: Options): Map[String, com.fasterxml.jackson.databind.JsonNode] =
    RawProcess.process(spark, dir, opts).collect()
      .map(mapper.readTree)
      .map(n => n.get("queryId").asText() -> n).toMap

  test("unparseable documents drop; parseable ones survive untouched by default") {
    val out = run(Options())
    assert(out.keySet === Set("q1", "q2", "q3"))
    assert(out("q1").get("query").asText() === "SELECT secret FROM web.logs")
  }

  test("--fail-on-error aborts on the unparseable document instead of dropping it") {
    // jsonl_process.py:106 — d4.json is not JSON, so the run must throw
    val e = intercept[org.apache.spark.SparkException] {
      run(Options(failOnError = true))
    }
    assert(e.getMessage != null)
  }

  test("--remove-query blanks query AND nested rows keys (the raw-only carrier)") {
    val out = run(Options(removeQuery = true))
    assert(out("q1").get("query").asText() === "")
    val root = out("q1").get("outputStage").get("plan").get("root")
    assert(root.get("rows").isTextual && root.get("rows").asText() === "")
    // untouched siblings survive
    assert(root.get("@type").asText() === "values")
  }

  test("--rename-schemas shares ONE dictionary across schema and schemaName keys") {
    val out = run(Options(renameSchemas = true))
    // first-seen across sorted paths: a1's schema=web → schema0 (its
    // schemaName=web reuses it), b2's schema=sales → schema1
    assert(out("q1").get("inputs").get(0).get("schema").asText() === "schema0")
    val handle = out("q1").get("outputStage").get("plan").get("root")
      .get("sources").get(0).get("table").get("connectorHandle")
    assert(handle.get("schemaName").asText() === "schema0")
    assert(out("q2").get("inputs").get(0).get("schema").asText() === "schema1")
    assert(out("q2").get("outputStage").get("plan").get("root")
      .get("table").get("connectorHandle").get("schemaName").asText() === "schema0")
    // non-schema keys untouched
    assert(out("q1").get("inputs").get(0).get("table").asText() === "logs")
  }

  test("--rename-user shares one dictionary across user and principal") {
    val out = run(Options(renameUser = true))
    // a1 walk: user=alice → user0, then principal=alice@corp → user1;
    // b2: user=bob → user2, principal=alice@corp reuses user1
    assert(out("q1").get("session").get("user").asText() === "user0")
    assert(out("q1").get("session").get("principal").asText() === "user1")
    assert(out("q2").get("session").get("user").asText() === "user2")
    assert(out("q2").get("session").get("principal").asText() === "user1")
    assert(out("q3").get("session").get("user").asText() === "user0")
  }

  test("--rename-catalogs and --remove-locations work at any depth") {
    val out = run(Options(renameCatalogs = true, removeLocations = true))
    // only `catalogName` keys rename (`jsonl_process.py:134-136`) — the
    // reference leaves inputs' `connectorId` untouched, so raw mode does too
    assert(out("q1").get("outputStage").get("plan").get("root")
      .get("sources").get(0).get("table").get("connectorHandle")
      .get("catalogName").asText() === "catalog0")
    assert(out("q2").get("outputStage").get("plan").get("root")
      .get("table").get("connectorHandle").get("catalogName").asText() === "catalog1")
    assert(out("q1").get("inputs").get(0).get("connectorId").asText() === "hive")
    assert(out("q2").get("outputStage").get("plan").get("root")
      .get("location").asText() === "")
  }

  test("--rename-partitions obfuscates list elements, '' keeps its slot") {
    val out = run(Options(renamePartitions = true))
    val parts = out("q1").get("partitionIds")
    assert(parts.get(0).asText() === "partition0")
    assert(parts.get(1).asText() === "")
    assert(parts.get(2).asText() === "partition1")
  }

  test("--filter-schema keeps matches at any depth plus schema-free docs") {
    // q1 matches via inputs.schema; q2 only via the nested schemaName
    // (lookup recurses); q3 carries NO schema occurrence → include-absent
    val keep = run(Options(filterSchema = Some("web")))
    assert(keep.keySet === Set("q1", "q2", "q3"))
    val sales = run(Options(filterSchema = Some("sales")))
    assert(sales.keySet === Set("q2", "q3"))
    val none = run(Options(filterSchema = Some("nope")))
    assert(none.keySet === Set("q3"))
  }

  test("filtered docs do not consume dictionary tokens") {
    // with --filter-schema sales, a1 (web) drops — so b2's sales schema is
    // the FIRST seen name and takes token schema0
    val out = run(Options(renameSchemas = true, filterSchema = Some("sales")))
    assert(out("q2").get("inputs").get(0).get("schema").asText() === "schema0")
  }

  test("--limit keeps the first N documents in path order") {
    val out = run(Options(limit = Some(2)))
    assert(out.keySet === Set("q1", "q2"))
  }

  test("dictionary collect is bounded by spark.graft.maxDictNames (round 13)") {
    // the raw path routes its first-occurrence collect through the SAME
    // bounded helper as the normalized path (JsonlProcess.collectBounded):
    // the schema dictionary here has 2 names (web, sales), so a bound of 1
    // must fail loudly with the raw-path escape hint, and a bound of 2
    // must pass and produce the identical tokens as the unguarded run
    try {
      spark.conf.set("spark.graft.maxDictNames", "1")
      val e = intercept[IllegalArgumentException] {
        run(Options(renameSchemas = true))
      }
      assert(e.getMessage.contains("raw obfuscation dictionary"))
      assert(e.getMessage.contains("--hash-tokens"))

      spark.conf.set("spark.graft.maxDictNames", "2")
      val ok = run(Options(renameSchemas = true))
      assert(ok("q1").get("inputs").get(0).get("schema").asText() === "schema0")
      assert(ok("q2").get("inputs").get(0).get("schema").asText() === "schema1")
    } finally spark.conf.unset("spark.graft.maxDictNames")
  }
}
