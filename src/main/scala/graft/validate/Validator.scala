package graft.validate

import graft.core.CompactionError
import org.apache.spark.sql.DataFrame

/** Post-compaction validation — reference V1 (`CompactionValidator`,
  * core/src/compaction/validator.rs:36-166): re-scan the input through the
  * same merge-on-read path and the output files, and compare TOTAL ROW
  * COUNTS; error on mismatch. Runs only when
  * `enableValidateCompaction` (2x read cost).
  *
  * `strict` upgrades the check to full multiset equality via two
  * `exceptAll` probes — a stronger oracle than the reference's count
  * compare (SURVEY §7.2 step 6). At 100 TB use counts (one pass, no
  * shuffle); strict mode shuffles both sides on all columns — reserve it
  * for sampled audits.
  */
object Validator {
  final case class Result(inputRows: Long, outputRows: Long, valid: Boolean)

  def validate(inputLive: DataFrame, output: DataFrame, strict: Boolean = false): Result = {
    val in = inputLive.count()
    val out = output.count()
    if (in != out)
      throw CompactionError.Validation(
        s"row count mismatch after compaction: input=$in output=$out")
    if (strict) {
      val missing = inputLive.exceptAll(output).count()
      val extra = output.exceptAll(inputLive).count()
      if (missing != 0 || extra != 0)
        throw CompactionError.Validation(
          s"content mismatch after compaction: missing=$missing extra=$extra")
    }
    Result(in, out, valid = true)
  }
}
