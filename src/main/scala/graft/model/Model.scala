package graft.model

import java.sql.Timestamp

/** Typed data model for the reference's five entities (SURVEY.md §1.1,
  * shapes from FIXTURES.md §B; schema authorities cited per type).
  * Schema-on-write: producers in this engine always emit these shapes;
  * readers get compile-time field checks via `Dataset[T]`.
  */

/** One phase of a plan (ref `commands/nova.md:290-373`). */
case class Phase(
    n: Int,
    title: String,
    files: Seq[String],
    complexity: String, // High (Architecture) | High (Implementation) | Medium | Low
    agent: String,      // executor routing target (ref `commands/pulsar.md:114-137`)
    dependsOn: Seq[Int])

/** A plan document, flattened (ref `commands/nova.md:269,290-373`). */
case class Plan(
    id: String,
    project: String,
    planType: String,      // feature | bug | refactor | chore | docs
    status: String,        // queued | active | completed
    executionMode: String, // background | interactive
    createdAt: Timestamp,
    threadId: Option[String],
    phases: Seq[Phase])

/** Plan-index entry — the "catalog table" (ref `commands/nova.md:473-491`). */
case class BoardEntry(
    id: String,
    title: String,
    project: String,
    projectPath: String,
    planType: String,
    status: String,
    executionMode: String,
    path: String,
    createdAt: Timestamp,
    phases: Int,
    parallelGroups: Int)

/** Per-phase status record, event-sourced (ref `commands/pulsar.md:335-345`,
  * writer `hooks/status-tracker.sh:158-185`). */
case class PhaseStatus(
    task_id: String,
    project: String,
    plan_id: String,
    phase: Int,
    thread_id: Option[String],
    status: String, // starting | running | completed | failed
    tool_count: Int,
    last_tool: Option[String],
    last_file: Option[String],
    updated_at: Timestamp,
    started_at: Timestamp,
    completed_at: Option[Timestamp])

/** Work-claim record (ref `commands/pulsar.md:192-201`; claim CAS
  * `hooks/session-start.sh:60-67`). */
case class Marker(
    session_id: String,
    project: String,
    plan_id: String,
    phase: Int,
    thread_id: Option[String],
    pid: Option[Long],
    created_by: String,
    created_at: Timestamp)

/** A tool-use event flowing into the status state machine (the
  * PostToolUse hook payload distilled — ref `hooks/status-tracker.sh:
  * 17-123`). */
case class ToolEvent(
    plan_id: String,
    phase: Int,
    project: String,
    tool: String,
    file: Option[String],
    kind: String, // start | tool | stop_completed | stop_failed
    at: Timestamp)

/** Rolling aggregate emitted by the watcher (ref `agents/orbiter.md:
  * 198-242`). */
case class PulsePhase(
    phase: Int,
    status: String,
    tool_count: Int,
    last_tool: Option[String],
    updated_at: Timestamp,
    stalled: Boolean)

case class PulseRound(
    plan_id: String,
    project: String,
    round: Int,
    phases: Seq[PulsePhase])
