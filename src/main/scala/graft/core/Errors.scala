package graft.core

/** Error taxonomy, mirroring the reference's CompactionError ADT
  * (core/src/error/mod.rs:19-43): Io, Config, Execution, Iceberg,
  * DataFusion, CompactionValidator, Unexpected. The engine-specific kinds
  * map to Spark/commit-layer equivalents. Only `DataInvalid`/`Unexpected`
  * kinds are retryable at commit time
  * (core/src/compaction/mod.rs:595-613).
  */
sealed abstract class CompactionError(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause) {
  def retryable: Boolean = false
}

object CompactionError {
  final case class Io(msg: String, cause: Throwable = null)
      extends CompactionError(msg, cause)
  final case class Config(msg: String) extends CompactionError(msg)
  final case class Execution(msg: String, cause: Throwable = null)
      extends CompactionError(msg, cause)
  /** Commit-layer conflict (e.g. CAS lost, snapshot moved) — retryable,
    * analogous to the reference's retry on DataInvalid kind. */
  final case class CommitConflict(msg: String) extends CompactionError(msg) {
    override def retryable: Boolean = true
  }
  /** Schema changed between plan and commit — NOT retryable; the plan is
    * stale (reference: core/src/compaction/mod.rs:530-541 aborts). */
  final case class SchemaDrift(msg: String) extends CompactionError(msg)
  /** Files this rewrite removes are no longer in the current snapshot —
    * NOT retryable: staleness is permanent (a reload can never bring the
    * files back), so the commit aborts immediately with the real cause
    * instead of sleeping through the backoff. Iceberg's RewriteFiles
    * fails the same way via ValidationException. */
  final case class StaleRewrite(msg: String) extends CompactionError(msg)
  final case class Validation(msg: String) extends CompactionError(msg)
  final case class Unexpected(msg: String, cause: Throwable = null)
      extends CompactionError(msg, cause) {
    override def retryable: Boolean = true
  }
  /** A changelog interval containing no data-bearing snapshot anywhere:
    * zero changes by definition, but no schema exists to shape an empty
    * frame with. A TYPED case so callers that only need "nothing
    * changed" (materialized-view refresh) dispatch on the class, not on
    * message text. */
  final case class EmptyInterval(msg: String) extends CompactionError(msg)
}
