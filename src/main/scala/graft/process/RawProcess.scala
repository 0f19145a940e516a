package graft.process

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode, TextNode}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, input_file_name}
import scala.jdk.CollectionConverters._

/** Raw-JSON obfuscation: the reference `jsonl_process.py` semantics applied
  * BEFORE any flatten, over the raw nested QueryInfo documents themselves
  * (the normalized-summary path is [[JsonlProcess]]; this variant closes its
  * two documented divergences — `rows`-key clearing and 2-part table-name
  * segment renames — because raw-mode renames by KEY, the way the
  * reference's `nested_alter` does, so no name ever needs splitting).
  *
  * Semantics mirrored from the reference (`jsonl_process.py:79-150` +
  * the `nested_lookup` library it drives):
  *   - `nested_alter(doc, key, cb)`: every occurrence of `key` at any depth
  *     has its value REPLACED by `cb(str(value))`; replaced values are not
  *     recursed into (the library's alter takes the `elif` branch).
  *   - Keys are processed in obfuscator-dict insertion order: query, rows,
  *     schema, schemaName, catalogName, location/targetPath/writePath,
  *     user, principal, partitionIds — each altering the already-mutated
  *     document.
  *   - `NameObfuscator`: one shared dictionary per group (schema+schemaName
  *     share; user+principal share), `prefixN` tokens in first-seen order,
  *     `''` passes through.
  *   - `filter_line` (`--filter-schema`): lookup DOES recurse into matched
  *     values; keep = no key occurrence anywhere, or any occurrence equal
  *     to the filter value.
  *
  * Distribution model (the reference is a sequential in-memory loop): a
  * RECORD pass runs the full alter walk per document, emitting every
  * would-be-tokenized name with its (path, occurrence) position; a
  * min-position aggregate + driver sort assigns the sequential tokens the
  * reference would produce scanning files in sorted-path order (extract's
  * order, `extract.py:179-183`). The APPLY pass re-runs the same walk with
  * the dictionaries broadcast. Dictionaries are driver-sized by nature —
  * the reference holds the same maps in memory. Per-document work is
  * arbitrary nested JSON with no schema, which Catalyst columns genuinely
  * cannot express — the mapPartitions-last-resort case; both passes fan
  * out per file.
  */
object RawProcess {

  /** CLI-flag mirror (`jsonl_process.py:105-150`). */
  case class Options(
      removeQuery: Boolean = false,
      renameSchemas: Boolean = false,
      renameCatalogs: Boolean = false,
      removeLocations: Boolean = false,
      renameUser: Boolean = false,
      renamePartitions: Boolean = false,
      filterSchema: Option[String] = None,
      limit: Option[Int] = None,
      // --fail-on-error (jsonl_process.py:106): abort the whole run on
      // the first unparseable document instead of the default drop
      failOnError: Boolean = false)

  /** Obfuscator groups: id → (token prefix, keys in reference dict order). */
  private val groups: Seq[(String, String, Seq[String])] = Seq(
    ("schema", "schema", Seq("schema", "schemaName")),
    ("catalog", "catalog", Seq("catalogName")),
    ("user", "user", Seq("user", "principal")),
    ("partition", "partition", Seq("partitionIds")))

  private def activeGroups(o: Options): Seq[(String, String, Seq[String])] =
    groups.filter {
      case ("schema", _, _) => o.renameSchemas
      case ("catalog", _, _) => o.renameCatalogs
      case ("user", _, _) => o.renameUser
      case ("partition", _, _) => o.renamePartitions
    }

  /** The full key → action list in the reference's insertion order. An
    * action either blanks the value or renames it through a group's
    * obfuscator; `list = true` marks the ListObfuscator case
    * (element-wise through the shared dictionary).
    */
  private case class KeyAction(key: String, group: Option[String], list: Boolean)

  private def keyActions(o: Options): Seq[KeyAction] = {
    val b = Seq.newBuilder[KeyAction]
    if (o.removeQuery) {
      b += KeyAction("query", None, list = false)
      b += KeyAction("rows", None, list = false)
    }
    if (o.renameSchemas) {
      b += KeyAction("schema", Some("schema"), list = false)
      b += KeyAction("schemaName", Some("schema"), list = false)
    }
    if (o.renameCatalogs) b += KeyAction("catalogName", Some("catalog"), list = false)
    if (o.removeLocations) {
      b += KeyAction("location", None, list = false)
      b += KeyAction("targetPath", None, list = false)
      b += KeyAction("writePath", None, list = false)
    }
    if (o.renameUser) {
      b += KeyAction("user", Some("user"), list = false)
      b += KeyAction("principal", Some("user"), list = false)
    }
    if (o.renamePartitions) b += KeyAction("partitionIds", Some("partition"), list = true)
    b.result()
  }

  /** The reference's `str(value)` conversion before each callback: strings
    * pass through; other scalars/containers render compactly (the Python
    * formatting of a non-string carrier is not reproduced byte-for-byte —
    * QueryInfo carries these keys as strings; documented divergence for
    * exotic payloads, same injectivity).
    */
  private def asName(n: JsonNode): String =
    if (n.isTextual) n.asText() else n.toString

  /** One alter walk over a parsed document. `rename` resolves (group,
    * name) → replacement (recording mode assigns placeholder + records;
    * apply mode consults the broadcast dictionary). Mirrors
    * `_nested_alter`: dicts check each field — matched fields are replaced
    * and NOT recursed into; unmatched container values recurse; lists
    * recurse element-wise. Each key of the action list walks the document
    * in turn, seeing the previous keys' mutations.
    */
  private def alterAll(root: JsonNode, actions: Seq[KeyAction],
      rename: (String, String) => String): Unit = {
    def walk(node: JsonNode, a: KeyAction): Unit = node match {
      case obj: ObjectNode =>
        obj.fieldNames().asScala.toSeq.foreach { f =>
          val v = obj.get(f)
          if (f == a.key) {
            // ObjectNode.replace, never the generic set(): scalac infers
            // set's T from a discarded-value position as Nothing and the
            // inserted cast throws at runtime
            a.group match {
              case None => obj.replace(f, TextNode.valueOf(""))
              case Some(g) if a.list =>
                // ListObfuscator: element-wise through the shared dict; a
                // non-list value is a hard error in the reference
                // (`jsonl_process.py:73-74`)
                require(v.isArray, s"list obfuscator on non-list key '${a.key}'")
                val arr = v.asInstanceOf[ArrayNode]
                (0 until arr.size()).foreach { i =>
                  val name = asName(arr.get(i))
                  arr.set(i, TextNode.valueOf(
                    if (name.isEmpty) "" else rename(g, name)))
                }
              case Some(g) =>
                val name = asName(v)
                obj.replace(f, TextNode.valueOf(
                  if (name.isEmpty) "" else rename(g, name)))
            }
          } else if (v.isContainerNode) walk(v, a)
        }
      case arr: ArrayNode => arr.asScala.foreach(walk(_, a))
      case _ =>
    }
    actions.foreach(a => walk(root, a))
  }

  /** `nested_lookup` twin for `filter_line`: every value of `key` at any
    * depth, RECURSING into matched values too (lookup, unlike alter, does).
    */
  private[process] def lookupValues(root: JsonNode, key: String): Seq[JsonNode] = {
    val out = Seq.newBuilder[JsonNode]
    def walk(node: JsonNode): Unit = node match {
      case obj: ObjectNode =>
        obj.fields().asScala.foreach { e =>
          if (e.getKey == key) out += e.getValue
          walk(e.getValue)
        }
      case arr: ArrayNode => arr.asScala.foreach(walk)
      case _ =>
    }
    walk(root)
    out.result()
  }

  /** `filter_line({schema: v, schemaName: v}, or_and=True,
    * include_absent=True)` (`jsonl_process.py:37-50,173`).
    */
  private[process] def keepForSchema(root: JsonNode, schema: String): Boolean = {
    val occ = Seq("schema", "schemaName").map(lookupValues(root, _))
    occ.forall(_.isEmpty) ||
      occ.exists(_.exists(v => v.isTextual && v.asText() == schema))
  }

  // ---- pipeline --------------------------------------------------------

  private val mapper = new ObjectMapper()

  /** One raw document per file under `inputDir` (`*.json` / `*.json.gz`),
    * path-ordered like the reference's sorted file scan. Unparseable
    * documents drop, mirroring its per-line exception skip
    * (`jsonl_process.py:181-184`).
    */
  def readRaw(spark: SparkSession, inputDir: String,
      limit: Option[Int] = None): Dataset[(String, String)] = {
    import spark.implicits._
    val files = spark.read
      .option("wholetext", "true")
      .option("pathGlobFilter", "*.json*")
      .text(inputDir)
      .select(input_file_name().as("path"), col("value"))
      .as[(String, String)]
    limit.map(n => files.orderBy("path").limit(n)).getOrElse(files)
  }

  /** Pass 1: the shared first-seen dictionaries, one per active rename
    * group. The record walk IS the alter walk (same mutations, placeholder
    * tokens), so occurrences hidden by earlier key replacements — e.g. a
    * name nested inside an already-blanked `rows` value — are skipped
    * exactly as the sequential reference skips them.
    */
  def buildDictionaries(docs: Dataset[(String, String)],
      opts: Options): Map[String, Map[String, String]] = {
    val active = activeGroups(opts)
    if (active.isEmpty) return Map.empty
    val actions = keyActions(opts)
    import docs.sparkSession.implicits._
    // (group, name, path, occurrence idx within the doc's walk)
    val occurrences = docs.flatMap { case (path, json) =>
      try {
        val root = mapper.readTree(json)
        if (!opts.filterSchema.forall(keepForSchema(root, _))) Seq.empty
        else {
          val seen = collection.mutable.ArrayBuffer.empty[(String, String)]
          alterAll(root, actions, (g, name) => { seen += ((g, name)); "" })
          seen.zipWithIndex.map { case ((g, n), i) => (g, n, path, i) }.toSeq
        }
      } catch {
        case e: Exception =>
          if (opts.failOnError) throw e // --fail-on-error: abort the run
          Seq.empty
      }
    }.toDF("group", "name", "path", "occ")
    // first occurrence per (group, name) across the corpus, then the
    // reference's sequential numbering = rank of that first occurrence.
    // Round 13: the collect goes through the ONE shared bounded helper
    // (JsonlProcess.collectBounded) — same driver-OOM guard the
    // normalized path got in round 12, same `spark.graft.maxDictNames`
    // knob. The bound covers all rename groups' rows together: it is a
    // driver-memory guard and this is the single collect carrying them.
    val firsts = JsonlProcess.collectBounded(
      occurrences
        .groupBy(col("group"), col("name"))
        .agg(org.apache.spark.sql.functions.min(
          org.apache.spark.sql.functions.struct(col("path"), col("occ"))).as("first")),
      JsonlProcess.maxDictNames(docs.sparkSession),
      "raw obfuscation dictionary (all rename groups)",
      escape = "Switch to the normalized path's --hash-tokens " +
        "(extract + `process ... --hash-tokens`: pure-function tokens, " +
        "no driver-held dictionary)")
    val prefixOf = active.map { case (id, prefix, _) => id -> prefix }.toMap
    firsts.groupBy(_.getString(0)).map { case (g, rows) =>
      g -> rows
        .map(r => (r.getString(1), r.getStruct(2).getString(0), r.getStruct(2).getInt(1)))
        .sortBy { case (_, path, occ) => (path, occ) }
        .zipWithIndex
        .map { case ((name, _, _), i) => name -> s"${prefixOf(g)}$i" }
        .toMap
    }
  }

  /** Pass 2: filter + alter every document through the broadcast
    * dictionaries; emits compact single-line JSON (the jsonl contract).
    * A name missing from its dictionary passes through unchanged — it can
    * only be one whose first occurrence was filtered or hidden the same
    * way in BOTH passes, so the walks agree.
    */
  def transform(docs: Dataset[(String, String)], opts: Options,
      dicts: Map[String, Map[String, String]]): Dataset[String] = {
    import docs.sparkSession.implicits._
    val actions = keyActions(opts)
    val bc = docs.sparkSession.sparkContext.broadcast(dicts)
    docs.map(_._2).mapPartitions { it =>
      val d = bc.value
      it.flatMap { json =>
        try {
          val root = mapper.readTree(json)
          if (!opts.filterSchema.forall(keepForSchema(root, _))) None
          else {
            alterAll(root, actions,
              (g, name) => d.get(g).flatMap(_.get(name)).getOrElse(name))
            Some(mapper.writeValueAsString(root))
          }
        } catch {
          case e: Exception =>
            if (opts.failOnError) throw e // --fail-on-error: abort the run
            None
        }
      }
    }
  }

  /** End-to-end: read → dictionaries → transform. */
  def process(spark: SparkSession, inputDir: String, opts: Options): Dataset[String] = {
    val docs = readRaw(spark, inputDir, opts.limit)
    transform(docs, opts, buildDictionaries(docs, opts))
  }
}
