package graft.operators

/** Size-targeted file-rolling policy (reference W2:
  * core/src/executor/iceberg_writer/rolling_iceberg_writer.rs:75-95).
  *
  * Decide whether to close the current output file and open a new one
  * before writing a batch of `inputSize` bytes, given `currentWrittenSize`
  * bytes already in the file and a `targetFileSize`:
  *
  *  - never roll while the current file is under 10% of target (avoids
  *    tiny files when a huge batch arrives first);
  *  - roll if current+input would exceed 1.5x target;
  *  - roll if current+input would exceed target AND the current file is
  *    already past 70% of target.
  *
  * Thresholds use integer division exactly like the reference
  * (target*3/2, target*7/10) so the ported truth table matches bit-for-bit.
  */
object RollingPolicy {
  def needBuildNewFile(
      currentWrittenSize: Long,
      inputSize: Long,
      targetFileSize: Long
  ): Boolean = {
    if (currentWrittenSize < targetFileSize / 10) false
    else if (currentWrittenSize + inputSize > targetFileSize * 3 / 2) true
    else if (currentWrittenSize + inputSize > targetFileSize &&
      currentWrittenSize > targetFileSize * 7 / 10) true
    else false
  }
}
