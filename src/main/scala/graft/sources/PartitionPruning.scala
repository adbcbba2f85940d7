package graft.sources

import graft.core.{PartitionKey, PartitionTransform}
import graft.txn.FileEntry
import org.apache.spark.sql.types._

/** Transform-aware partition pruning for PARTITIONED tables: evaluate
  * the table's partition transforms over filter LITERALS and keep only
  * the files whose name-encoded partition value can match — zero IO
  * (no footer reads), and it prunes shapes footer stats cannot: an
  * `id = 7` point lookup on a `bucket(16, id)` table hashes 7 once and
  * reads ONE bucket's files instead of all 16 (each bucket's id
  * min/max spans the whole domain, so stats keep everything).
  *
  * The same mechanism serves runtime (join-driven) `In` sets — a
  * selective dimension join prunes the fact table's buckets before
  * tasks launch. This is the Iceberg bucket-transform pruning story,
  * re-expressed over the engine's md5 transforms.
  *
  * Conservative everywhere: files without the fanout name prefix
  * (pre-partitioning appends, compaction output) and columns without a
  * transform keep all files; all-pruned yields an empty data set (the
  * readers resolve the schema from the snapshot).
  */
object PartitionPruning {

  /** Keep the data files whose partition fields can satisfy
    * `candidates` (column → the exact values the filters allow).
    * Delete files pass through. Single-spec form (never-evolved
    * tables). */
  def prune(
      files: Seq[FileEntry],
      spec: Seq[PartitionTransform],
      candidates: Map[String, Seq[Any]],
      colTypes: Map[String, DataType]): Seq[FileEntry] =
    prunePerFile(files, _ => spec, candidates, colTypes)

  /** Per-file-spec form for SPEC-EVOLVED tables: each data file is
    * judged under ITS OWN spec ([[graft.core.PartitionSpecCodec
    * .specForFile]]) — the ordinal `c_bucket=3` means a different value
    * set under bucket(4) than under bucket(8), so evaluating every file
    * under the current spec would silently drop matching rows. Expected
    * value sets are computed once per DISTINCT spec, not per file. */
  def prunePerFile(
      files: Seq[FileEntry],
      specFor: FileEntry => Seq[PartitionTransform],
      candidates: Map[String, Seq[Any]],
      colTypes: Map[String, DataType]): Seq[FileEntry] = {
    if (candidates.isEmpty) return files
    // expected rendered values per partition FIELD name, per spec
    def expectedOf(spec: Seq[PartitionTransform]): Seq[(String, Set[String])] =
      spec.flatMap { t =>
        (candidates.get(t.source), colTypes.get(t.source)) match {
          case (Some(vs), Some(dt)) =>
            val rendered = vs.flatMap(coerce(_, dt))
              .map(v => PartitionKey.sanitize(t.render(t.eval(v, dt))))
            // a candidate we could not coerce makes the set non-exhaustive
            if (rendered.size == vs.size) Some(t.fieldName -> rendered.toSet)
            else None
          case _ => None
        }
      }
    val bySpec = scala.collection.mutable.Map
      .empty[Seq[graft.core.PartitionTransform], Seq[(String, Set[String])]]
    val (data, deletes) = files.partition(_.content == "data")
    val kept = data.filter { f =>
      val spec = specFor(f)
      if (spec.isEmpty) true
      else {
        val expected = bySpec.getOrElseUpdate(spec, expectedOf(spec))
        expected.isEmpty || {
          val fields = PartitionKey.parse(f.path)
          fields.isEmpty || expected.forall { case (name, ok) =>
            fields.get(name).forall(ok.contains)
          }
        }
      }
    }
    kept ++ deletes
  }

  /** Prune by ALREADY-TRANSFORMED partition-field values: keep the data
    * files whose name-encoded partition field is among `fieldCandidates`
    * (partition FIELD name → allowed rendered values, e.g.
    * `band_key_bucket -> {"0","3"}`). This is the scale path for probes
    * whose candidate SOURCE values are data-dependent and unbounded (a
    * dedup batch probes B×numBands band keys — too many to collect) but
    * whose TRANSFORMED values are bounded by the layout (≤ N bucket
    * ids): the caller evaluates the transform distributively over the
    * probe, collects the ≤ N distinct partition values, and prunes here
    * with zero IO. Conservative rules: files without a parsed partition
    * prefix (refresh deltas, pre-layout appends) and fields absent from
    * a file's prefix keep the file; delete files pass through; and —
    * because the candidate VALUES were computed under one specific spec
    * — only files `prunable` says were written under that same spec are
    * judged at all (on a spec-EVOLVED table, `band_key_bucket=4` means
    * a different value set under bucket(8) than under bucket(16), so an
    * old-spec file must be kept, exactly [[prunePerFile]]'s per-file
    * rationale). */
  def pruneByFieldValues(
      files: Seq[FileEntry],
      fieldCandidates: Map[String, Set[String]],
      /** true iff this file's own partition spec is the one the
        * candidates were computed under — others are kept unjudged. */
      prunable: FileEntry => Boolean = _ => true): Seq[FileEntry] = {
    if (fieldCandidates.isEmpty) return files
    val (data, deletes) = files.partition(_.content == "data")
    val kept = data.filter { f =>
      !prunable(f) || {
        val fields = PartitionKey.parse(f.path)
        fields.isEmpty || fieldCandidates.forall { case (name, ok) =>
          fields.get(name).forall(ok.contains)
        }
      }
    }
    kept ++ deletes
  }

  /** Literal → the column's JVM type ([[PartitionTransform.eval]]'s
    * convention); None = unsupported literal shape (prune nothing). */
  private def coerce(v: Any, dt: DataType): Option[Any] = (v, dt) match {
    case (null, _)                   => Some(null)
    case (x: Long, LongType)         => Some(x)
    case (x: Int, LongType)          => Some(x.toLong)
    case (x: Short, LongType)        => Some(x.toLong)
    case (x: Int, IntegerType)       => Some(x)
    case (x: Short, IntegerType)     => Some(x.toInt)
    case (x: Long, IntegerType) if x == x.toInt.toLong => Some(x.toInt)
    case (s: String, StringType)     => Some(s)
    // dates normalize to epoch days — the eval/render convention of
    // [[graft.core.DayTransform]] and identity over DATE columns
    case (d: java.sql.Date, DateType) => Some(
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d))
    case (d: java.time.LocalDate, DateType) => Some(d.toEpochDay.toInt)
    case (x: Int, DateType)          => Some(x)
    case _                           => None
  }
}
