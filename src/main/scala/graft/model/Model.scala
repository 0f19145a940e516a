package graft.model

/** Canonical summary-record model (SURVEY §1; reference `extract.py:139-167`).
  *
  * One `QuerySummary` per query. The recursive, heterogeneous structures the
  * reference keeps lazy (plan trees `extract.py:94-99`, task trees
  * `extract.py:102-120`) are flattened once at ingest into relational rows
  * (`PlanNode`, `TaskStat`) — every downstream analyzer then becomes a plain
  * join/aggregate instead of a tree walk, and the whole pipeline distributes.
  */
final case class OperatorStat(
    node_id: String,
    operator_type: String,
    input_size: Option[Double],
    output_size: Option[Double],
    network_size: Option[Double],
    peak_mem: Option[Double],
    input_rows: Option[Long],
    output_rows: Option[Long],
    network_rows: Option[Long],
    input_cpu: Option[Double],
    output_cpu: Option[Double],
    finish_cpu: Option[Double],
    input_wall: Option[Double],
    output_wall: Option[Double],
    finish_wall: Option[Double],
    blocked_wall: Option[Double])

/** One plan node, flattened from the recursive `fragments[].root` tree.
  * `dfs_order` is the preorder position within the fragment (the reference's
  * `iter_nodes` yield order, `analyze.py:1007-1025`); `deepest` descendant =
  * max dfs_order in subtree (A22). Join fields are null for non-joins;
  * `table_name` is resolved across all five connector-handle variants (A21).
  */
final case class PlanNode(
    fragment_id: String,
    fragment_idx: Int,
    node_id: String,
    node_type: String,
    parent_id: Option[String],
    depth: Int,
    dfs_order: Int,
    subtree_end: Int,
    table_name: Option[String],
    deepest_table: Option[String],
    join_type: Option[String],
    join_distribution: Option[String],
    has_criteria: Option[Boolean])

final case class TaskStat(
    stage_path: String,
    task_id: String,
    state: String,
    scheduled_time: Option[Double],
    cpu_time: Option[Double],
    blocked_time: Option[Double])

final case class QuerySummary(
    query: String,
    query_id: String,
    user: String,
    state: String,
    error_code: Option[String],
    update: Option[String],
    elapsed_time: Option[Double],
    cpu_time: Option[Double],
    scheduled_time: Option[Double],
    blocked_time: Option[Double],
    input_size: Option[Double],
    output_size: Option[Double],
    network_size: Option[Double],
    peak_mem: Option[Double],
    written_size: Option[Double],
    input_rows: Option[Long],
    output_rows: Option[Long],
    network_rows: Option[Long],
    inputs: Seq[String],
    operators: Seq[OperatorStat],
    plan_nodes: Seq[PlanNode],
    tasks: Seq[TaskStat])
