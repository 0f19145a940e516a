package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract's shape: every judged query ships a DuckDB oracle,
  * so the correctness gate can never silently downgrade to a rows-only
  * check — and tools/compare.py's parity sweep (oracle ⇒ result present)
  * holds against the same registry.
  */
class RegistrySpec extends AnyFunSuite {

  test("every registered query has an oracle and names are unique") {
    val queries = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    assert((queries -- oracles).isEmpty,
      s"queries missing oracles: ${(queries -- oracles).toSeq.sorted}")
    assert((oracles -- queries).isEmpty)
    // the registry only grows — keep this floor EQUAL to the current
    // size when adding gates (no number in this comment to drift), so
    // the guard never carries slack a later removal could hide in
    assert(queries.size >= 181, s"registry shrank to ${queries.size}")
  }

  test("every registered query classifies into a bench warmup family") {
    // Bench.families throws on an unrecognized name prefix; running it
    // over the full registry here means a new gate family gets classified
    // deliberately at test time, not discovered as a cold-start outlier
    // in the round's bench numbers
    SparkEntry.queries.keySet.foreach(n => Bench.families(n))
  }

  test("oracle SQL references only the driver's tables or the gate fixture") {
    // every oracle runs in DuckDB with exactly the sf tables + the
    // committed fixture parquet registered — a stray table name would die
    // at driver time, far from its author
    val known = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val froms = "(?i)\\bFROM\\s+([a-z_][a-z0-9_]*)\\b".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      // both CTE spellings: `name AS (` and `name(col, ...) AS (`
      val ctes = "(?i)\\b([a-z_][a-z0-9_]*)\\s*(?:\\([^)]*\\))?\\s+AS\\s*\\(".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val unknown = froms -- known -- ctes --
        Set("read_parquet", "generate_series", "unnest", "glob")
      // subquery/alias tokens after FROM ( are not captured by the regex,
      // so anything left is a genuine free table reference
      assert(unknown.isEmpty, s"$name references unknown tables: $unknown")
    }
  }
}
