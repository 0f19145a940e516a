package graft.ingest

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.model._
import scala.jdk.CollectionConverters._
import scala.collection.mutable.ArrayBuffer

/** Presto/Trino QueryInfo JSON → [[QuerySummary]] (SURVEY §1, §2.A5-A10).
  *
  * Pure Scala (Jackson, bundled with Spark) — invoked per file inside
  * `mapPartitions`, so parsing distributes across executors. The recursive
  * heterogeneous structures (plan trees `extract.py:94-99`, task trees
  * `extract.py:102-120`, node children `analyze.py:1007-1025`) are flattened
  * here, once, into relational rows; all downstream analyzers are then plain
  * Spark joins/aggregations.
  *
  * Faithfulness notes vs the reference:
  *  - `0`-falsy coalescing chains are replicated (a parsed 0.0 falls through
  *    to the next candidate, `extract.py:72-74,150-154`).
  *  - varada internal queries are dropped (`extract.py:127-129`), as are
  *    records missing required stats keys (`extract.py:168-169`).
  *  - unknown node types missing a `source` child are treated as leaves
  *    (the reference raises, `analyze.py:1019-1022`; we degrade per-node).
  */
object QueryInfoParser {

  private val mapper = new ObjectMapper()

  /** Signals a record that must be dropped — the JVM analog of the
    * reference's ValueError/KeyError paths (`extract.py:168-169,204-205`).
    * Caught once in [[parse]]; never escapes into the Spark task.
    */
  private final class DropRecord extends Exception

  // NumberFormatException (e.g. Trino's "1.5PB": "PB" is absent from the
  // reference's table so "1.5P" reaches the float parse) → drop the record,
  // exactly like the reference's per-file ValueError catch.
  private def parseUnits(s: String, units: Seq[(String, Double)]): Option[Double] =
    if (s == null) None
    else try units.collectFirst {
      case (suffix, factor) if s.endsWith(suffix) =>
        s.dropRight(suffix.length).toDouble * factor
    }.orElse(Some(s.toDouble))
    catch { case _: NumberFormatException => throw new DropRecord }

  def parseTime(s: String): Option[Double] = parseUnits(s, graft.parse.Units.timeFactors)
  def parseSize(s: String): Option[Double] = parseUnits(s, graft.parse.Units.sizeFactors)

  private def textOpt(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filterNot(_.isNull).map(_.asText)
  private def timeOpt(n: JsonNode, field: String): Option[Double] =
    textOpt(n, field).flatMap(parseTime)
  private def sizeOpt(n: JsonNode, field: String): Option[Double] =
    textOpt(n, field).flatMap(parseSize)
  private def longOpt(n: JsonNode, field: String): Option[Long] =
    Option(n.get(field)).filterNot(_.isNull).map(_.asLong)

  // required-key accessors: the reference indexes these fields directly, so
  // a missing key is a KeyError → record dropped (`extract.py:168-169`).
  // Present-but-null still parses to None, matching parse_units(None).
  private def require(n: JsonNode, field: String): Unit =
    if (!n.has(field)) throw new DropRecord
  private def reqText(n: JsonNode, field: String): String =
    { require(n, field); textOpt(n, field).getOrElse(throw new DropRecord) }
  private def reqTime(n: JsonNode, field: String): Option[Double] =
    { require(n, field); timeOpt(n, field) }
  private def reqSize(n: JsonNode, field: String): Option[Double] =
    { require(n, field); sizeOpt(n, field) }
  private def reqLong(n: JsonNode, field: String): Option[Long] =
    { require(n, field); longOpt(n, field) }

  /** Python-style `or`: a 0.0 (falsy) result falls through to `b`. */
  private def orFalsy(a: Option[Double], b: => Option[Double]): Option[Double] =
    a.filter(_ != 0.0).orElse(b)

  /** node `@type` FQCN → short lowercase type (`analyze.py:999-1004`). */
  def nodeType(atType: String): String = {
    val m = "\\.(\\w+)Node$".r.findFirstMatchIn(atType)
    m.map(_.group(1)).getOrElse(atType).toLowerCase
  }

  private val leafTypes = Set("remotesource", "tablescan", "metadatadelete",
    "values", "tabledelete", "refreshmaterializedview")

  private def children(node: JsonNode, typ: String): Seq[JsonNode] = typ match {
    case "exchange" =>
      Option(node.get("sources")).map(_.elements.asScala.toSeq).getOrElse(Nil)
    case "join" =>
      Seq(node.get("left"), node.get("right")).filter(_ != null)
    case t if leafTypes(t) => Nil
    case _ => Option(node.get("source")).filterNot(_.isNull).toSeq
  }

  /** Table-name resolution across the five connector-handle shapes
    * (`analyze.py:564-584`).
    */
  def tableName(scanNode: JsonNode): Option[String] =
    for {
      table <- Option(scanNode.get("table"))
      handle <- Option(table.get("connectorHandle"))
    } yield {
      var schemaName: Option[String] = None
      var tblName: Option[String] = None
      Option(handle.get("schemaTableName")) match {
        case Some(stn) =>
          schemaName = textOpt(stn, "schema")
          tblName = textOpt(stn, "table")
        case None =>
          schemaName = textOpt(handle, "schemaName")
          val t = Option(handle.get("tableName")).orElse(Option(handle.get("table")))
          t match {
            case Some(tn) if tn.isObject => // JMX carries schema info here
              schemaName = textOpt(tn, "schema")
              tblName = textOpt(tn, "table")
            case Some(tn) => tblName = Some(tn.asText)
            case None => // MemoryTableHandle in PrestoSQL 306+
              if (textOpt(handle, "id").exists(_.nonEmpty))
                tblName = Some(s"${textOpt(handle, "@type").getOrElse("")}:${handle.get("id").asText}")
          }
      }
      val connectorId = textOpt(table, "connectorId")
        .orElse(textOpt(table, "catalogHandle"))
        .orElse(textOpt(table, "catalogName"))
      Seq(connectorId, schemaName, tblName).flatten.mkString(".")
    }

  /** Preorder DFS flatten of one fragment's plan tree. */
  private def flattenPlan(fragmentId: String, fragmentIdx: Int, root: JsonNode): Seq[PlanNode] = {
    val out = ArrayBuffer.empty[PlanNode]
    var order = 0
    def visit(node: JsonNode, parent: Option[String], depth: Int): (Int, Option[String]) = {
      val typ = nodeType(Option(node.get("@type")).map(_.asText).getOrElse(""))
      val id = textOpt(node, "id").getOrElse("")
      val myOrder = order
      order += 1
      val tbl = if (typ == "tablescan") tableName(node) else None
      val idx = out.length
      out += null // placeholder; subtree_end/deepest_table known after children
      var deepest: Option[String] = tbl
      children(node, typ).foreach { c =>
        val (_, childDeepest) = visit(c, Some(id), depth + 1)
        // preorder: the LAST descendant visited is the reference's
        // last_element(iter_nodes(node)) — its table wins (analyze.py:558-561)
        childDeepest.foreach(t => deepest = Some(t))
      }
      val isJoin = typ.endsWith("join")
      out(idx) = PlanNode(
        fragment_id = fragmentId,
        fragment_idx = fragmentIdx,
        node_id = id,
        node_type = typ,
        parent_id = parent,
        depth = depth,
        dfs_order = myOrder,
        subtree_end = order - 1,
        table_name = tbl,
        deepest_table = deepest,
        join_type = if (isJoin) textOpt(node, "type") else None,
        join_distribution = if (isJoin) textOpt(node, "distributionType") else None,
        has_criteria = if (isJoin)
          Some(Option(node.get("criteria")).exists(c => c.isArray && c.size > 0))
        else None)
      (order - 1, deepest)
    }
    visit(root, None, 0)
    out.toSeq
  }

  /** `iter_plans`: DFS over outputStage.subStages*, one plan per stage. */
  private def iterPlans(stage: JsonNode): Seq[(String, JsonNode)] = {
    val here = Option(stage.get("plan")).filterNot(_.isNull).map { p =>
      (textOpt(p, "id").getOrElse(""), p.get("root"))
    }.toSeq
    val subs = Option(stage.get("subStages")).map(_.elements.asScala.toSeq).getOrElse(Nil)
    here ++ subs.flatMap(iterPlans)
  }

  /** `build_tasks_in_substages`: mirror the substage tree, keep 3 parsed
    * task-stat fields + status; `stage_path` encodes tree position.
    */
  private def flattenTasks(stage: JsonNode, path: String = ""): Seq[TaskStat] = {
    val subs = Option(stage.get("subStages")).map(_.elements.asScala.toSeq).getOrElse(Nil)
    subs.zipWithIndex.flatMap { case (sub, i) =>
      val p = if (path.isEmpty) i.toString else s"$path.$i"
      val tasks = Option(sub.get("tasks")).map(_.elements.asScala.toSeq).getOrElse(Nil)
      val here = tasks.map { task =>
        val st = Option(task.get("stats")).getOrElse(mapper.createObjectNode)
        val status = Option(task.get("taskStatus")).getOrElse(mapper.createObjectNode)
        TaskStat(
          stage_path = p,
          task_id = textOpt(status, "taskId").getOrElse(""),
          state = textOpt(status, "state").getOrElse(""),
          scheduled_time = timeOpt(st, "totalScheduledTime"),
          cpu_time = timeOpt(st, "totalCpuTime"),
          blocked_time = timeOpt(st, "totalBlockedTime"))
      }
      here ++ flattenTasks(sub, p)
    }
  }

  /** `get_operators` (`extract.py:66-91`); a malformed element drops the
    * whole record, matching the reference's raise-on-KeyError (the raise
    * happens inside summary()'s try, so the record — not the job — dies).
    * `inputDataSize` is only required when the raw-or-input chain comes up
    * falsy, mirroring Python's lazy `or` evaluation.
    */
  private def operators(summaries: Seq[JsonNode]): Seq[OperatorStat] =
    summaries.map { s =>
      OperatorStat(
        node_id = reqText(s, "planNodeId"),
        operator_type = reqText(s, "operatorType"),
        input_size = orFalsy(
          textOpt(s, "rawInputDataSize").orElse(textOpt(s, "inputDataSize")).flatMap(parseSize),
          reqSize(s, "inputDataSize")),
        output_size = reqSize(s, "outputDataSize"),
        network_size = sizeOpt(s, "internalNetworkInputDataSize"),
        peak_mem =
          if (s.has("peakTotalMemoryReservation")) sizeOpt(s, "peakTotalMemoryReservation")
          else Some(0.0),
        input_rows = Some(longOpt(s, "rawInputPositions").filter(_ != 0L)
          .orElse(longOpt(s, "inputPositions")).getOrElse(0L)),
        output_rows = reqLong(s, "outputPositions"),
        network_rows = longOpt(s, "internalNetworkInputPositions"),
        input_cpu = reqTime(s, "addInputCpu"),
        output_cpu = reqTime(s, "getOutputCpu"),
        finish_cpu = reqTime(s, "finishCpu"),
        input_wall = reqTime(s, "addInputWall"),
        output_wall = reqTime(s, "getOutputWall"),
        finish_wall = reqTime(s, "finishWall"),
        blocked_wall = reqTime(s, "blockedWall"))
    }

  /** One QueryInfo document → summary record; None = dropped (internal
    * query, corrupt JSON, malformed numbers, or missing required keys —
    * the reference's ValueError/KeyError drop paths).
    */
  def parse(json: String): Option[QuerySummary] =
    try {
      val root = mapper.readTree(json) // corrupt file: drop (extract.py:204-205)
      if (root == null || !root.isObject) return None

      val session = Option(root.get("session")).getOrElse(return None)
      val stats = Option(root.get("queryStats")).getOrElse(return None)

      val internal = Option(session.get("catalogProperties"))
        .flatMap(cp => Option(cp.get("varada")))
        .flatMap(v => textOpt(v, "internal_query"))
      if (internal.contains("true")) return None

      val stage = Option(root.get("outputStage")).filterNot(_.isNull)
      val planNodes = stage.map { st =>
        iterPlans(st).zipWithIndex.flatMap { case ((fid, r), idx) =>
          if (r == null) Nil else flattenPlan(fid, idx, r)
        }
      }.getOrElse(Nil)
      val tasks = stage.map(flattenTasks(_, "")).getOrElse(Nil)

      require(root, "inputs") // j["inputs"], extract.py:163
      Some(QuerySummary(
        query = reqText(root, "query"),
        query_id = reqText(root, "queryId"),
        user = reqText(session, "user"),
        state = reqText(root, "state"),
        error_code = Option(root.get("errorCode")).filterNot(_.isNull).map(_.toString),
        update = textOpt(root, "updateType"),
        elapsed_time = reqTime(stats, "elapsedTime"),
        cpu_time = reqTime(stats, "totalCpuTime"),
        scheduled_time = reqTime(stats, "totalScheduledTime"),
        blocked_time = reqTime(stats, "totalBlockedTime"),
        input_size = Some(orFalsy(reqSize(stats, "rawInputDataSize"),
          sizeOpt(stats, "inputDataSize")).getOrElse(0.0)),
        output_size = reqSize(stats, "outputDataSize"),
        network_size = sizeOpt(stats, "internalNetworkInputDataSize"),
        peak_mem = reqSize(stats, "peakTotalMemoryReservation"),
        written_size = sizeOpt(stats, "rawWrittenDataSize"),
        input_rows = reqLong(stats, "rawInputPositions"),
        output_rows = reqLong(stats, "outputPositions"),
        network_rows = longOpt(stats, "internalNetworkInputPositions"),
        inputs = Option(root.get("inputs")).filterNot(_.isNull)
          .map(_.elements.asScala.map(_.toString).toSeq).getOrElse(Nil),
        operators = operators(Option(stats.get("operatorSummaries"))
          .map(_.elements.asScala.toSeq).getOrElse(Nil)),
        plan_nodes = planNodes,
        tasks = tasks))
    } catch {
      case _: DropRecord => None
      case _: com.fasterxml.jackson.core.JacksonException => None
    }
}
