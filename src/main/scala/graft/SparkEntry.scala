package graft

import graft.queries.{AnalyticsQueries, CompactionE2EQuery, CorpusPipelineQuery, JoinQueries, MorQueries, PipelineQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the full merge-on-read chain (position + two equality delete
    * tables) — the reference's core computation. */
  def entry(spark: SparkSession): DataFrame =
    MorQueries.morFull(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * LLM-data-pipeline operators (dedup, similarity, text analysis,
    * multimodal). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    MorQueries.queries ++ PipelineQueries.queries ++
      AnalyticsQueries.queries ++ JoinQueries.queries +
      ("compaction_e2e" -> (CompactionE2EQuery.run _)) +
      ("compaction_bucket" -> (CompactionE2EQuery.runBucket _)) +
      ("compaction_incremental" -> (CompactionE2EQuery.runIncremental _)) +
      ("table_lifecycle" -> (graft.queries.TableLifecycleQuery.run _)) +
      ("table_lifecycle_iceberg" -> (graft.queries.TableLifecycleQuery.runIceberg _)) +
      ("mor_filtered" -> (graft.queries.TableLifecycleQuery.runFiltered _)) +
      ("mor_pruned" -> (graft.queries.TableLifecycleQuery.runPruned _)) +
      ("time_travel" -> (graft.queries.TableLifecycleQuery.runTimeTravel _)) +
      ("snapshot_diff" -> (graft.queries.TableLifecycleQuery.runDiff _)) +
      ("upsert_mor" -> (graft.queries.TableLifecycleQuery.runUpsert _)) +
      ("schema_evolution" -> (graft.queries.TableLifecycleQuery.runEvolution _)) +
      ("schema_evolution_iceberg" -> (graft.queries.TableLifecycleQuery.runEvolutionIceberg _)) +
      ("delete_convert" -> (graft.queries.TableLifecycleQuery.runDeleteConvert _)) +
      ("stream_tail" -> (graft.queries.StreamTailQuery.run _)) +
      ("mor_dsv2" -> (graft.queries.TableLifecycleQuery.runDsv2 _)) +
      ("dsv2_roundtrip" -> (graft.queries.Dsv2RoundtripQuery.run _)) +
      ("sql_catalog_crud" -> (graft.queries.SqlCatalogQuery.run _)) +
      ("sql_merge_cow" -> (graft.queries.SqlCatalogQuery.runMerge _)) +
      ("sql_merge_mor" -> (graft.queries.SqlCatalogQuery.runMergeMor _)) +
      ("sql_merge_dv" -> (graft.queries.SqlCatalogQuery.runMergeDv _)) +
      ("stream_tail_dv" -> (graft.queries.StreamTailQuery.runDv _)) +
      ("stream_dedup" -> (graft.queries.StreamTailQuery.runDedup _)) +
      ("stream_join" -> (graft.queries.StreamTailQuery.runJoin _)) +
      ("stream_upsert" -> (graft.queries.UpsertStreamQuery.run _)) +
      ("sql_partitioned" -> (graft.queries.SqlCatalogQuery.runPartitioned _)) +
      ("compaction_partial" -> (graft.queries.SqlCatalogQuery.runPartialCompaction _)) +
      ("sql_constraints" -> (graft.queries.SqlCatalogQuery.runConstraints _)) +
      ("sql_overwrite_dynamic" -> (graft.queries.SqlCatalogQuery.runInsertOverwriteDynamic _)) +
      ("sql_partition_evolution" -> (graft.queries.SqlCatalogQuery.runPartitionEvolution _)) +
      ("sql_wap" -> (graft.queries.SqlCatalogQuery.runWap _)) +
      ("sql_branch" -> (graft.queries.SqlCatalogQuery.runBranch _)) +
      ("cdc_changelog" -> (graft.queries.ChangelogQuery.run _)) +
      ("cdc_net_changes" -> (graft.queries.ChangelogQuery.runNet _)) +
      ("cdc_replicate" -> (graft.queries.ChangelogQuery.runReplicate _)) +
      ("cdc_updates" -> (graft.queries.ChangelogQuery.runUpdates _)) +
      ("stream_changelog" -> (graft.queries.StreamTailQuery.runChangelog _)) +
      ("stream_autocompact" -> (graft.queries.AutoCompactQuery.run _)) +
      ("mv_incremental" -> (graft.queries.MaterializedViewQuery.run _)) +
      ("mv_rollup" -> (graft.queries.MaterializedViewQuery.runRollup _)) +
      ("mv_avg" -> (graft.queries.MaterializedViewQuery.runAvg _)) +
      ("mv_count_distinct" -> (graft.queries.MaterializedViewQuery.runCountDistinct _)) +
      ("mv_stream" -> (graft.queries.MaterializedViewQuery.runStream _)) +
      ("mv_minmax" -> (graft.queries.MaterializedViewQuery.runMinMax _)) +
      ("mv_join" -> (graft.queries.MaterializedViewQuery.runStar _)) +
      ("mv_join_rewrite" -> (graft.queries.MaterializedViewQuery.runStarRewrite _)) +
      ("mv_join_live" -> (graft.queries.MaterializedViewQuery.runLiveJoin _)) +
      ("mv_join_live_rewrite" -> (graft.queries.MaterializedViewQuery.runLiveJoinRewrite _)) +
      ("sql_bloom" -> (graft.queries.SqlCatalogQuery.runBloom _)) +
      ("sql_decimal" -> (graft.queries.SqlCatalogQuery.runDecimal _)) +
      ("sql_nested" -> (graft.queries.SqlCatalogQuery.runNested _)) +
      ("sql_column_defaults" -> (graft.queries.SqlCatalogQuery.runColumnDefaults _)) +
      ("sql_widen_type" -> (graft.queries.SqlCatalogQuery.runWidenType _)) +
      ("sql_view" -> (graft.queries.SqlCatalogQuery.runView _)) +
      ("sql_agg_meta" -> (graft.queries.SqlCatalogQuery.runAggMeta _)) +
      ("sql_agg_meta_group" -> (graft.queries.SqlCatalogQuery.runAggMetaGroup _)) +
      ("sql_write_order" -> (graft.queries.SqlCatalogQuery.runWriteOrder _)) +
      ("sql_dv" -> (graft.queries.SqlCatalogQuery.runDv _)) +
      ("sql_string_prune" -> (graft.queries.SqlCatalogQuery.runStringPrune _)) +
      ("spj_join" -> (graft.queries.SqlCatalogQuery.runSpjJoin _)) +
      ("spj_sorted_join" -> (graft.queries.SqlCatalogQuery.runSortedJoin _)) +
      ("sql_topn" -> (graft.queries.SqlCatalogQuery.runTopN _)) +
      ("sql_ctas" -> (graft.queries.SqlCatalogQuery.runCtas _)) +
      ("sql_ctas_iceberg" -> (graft.queries.SqlCatalogQuery.runCtasIceberg _)) +
      ("corpus_clean" -> (CorpusPipelineQuery.run _)) +
      ("corpus_curate" -> (CorpusPipelineQuery.runCurate _)) +
      ("corpus_curate_v2" -> (CorpusPipelineQuery.runCurateV2 _)) +
      ("corpus_clean_cc" -> (CorpusPipelineQuery.runCC _)) +
      ("corpus_to_shards" -> (CorpusPipelineQuery.runToShards _))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    MorQueries.oracles ++ PipelineQueries.oracles ++
      AnalyticsQueries.oracles ++ JoinQueries.oracles +
      ("compaction_e2e" -> CompactionE2EQuery.oracle) +
      ("compaction_bucket" -> CompactionE2EQuery.bucketOracle) +
      ("compaction_incremental" -> CompactionE2EQuery.incrementalOracle) +
      ("table_lifecycle" -> graft.queries.TableLifecycleQuery.oracle) +
      ("table_lifecycle_iceberg" -> graft.queries.TableLifecycleQuery.oracle) +
      ("mor_filtered" -> graft.queries.TableLifecycleQuery.filteredOracle) +
      ("mor_pruned" -> graft.queries.TableLifecycleQuery.prunedOracle) +
      ("time_travel" -> graft.queries.TableLifecycleQuery.timeTravelOracle) +
      ("snapshot_diff" -> graft.queries.TableLifecycleQuery.diffOracle) +
      ("upsert_mor" -> graft.queries.TableLifecycleQuery.upsertOracle) +
      ("schema_evolution" -> graft.queries.TableLifecycleQuery.evolutionOracle) +
      ("schema_evolution_iceberg" -> graft.queries.TableLifecycleQuery.evolutionOracle) +
      ("delete_convert" -> graft.queries.TableLifecycleQuery.deleteConvertOracle) +
      ("stream_tail" -> graft.queries.StreamTailQuery.oracle) +
      ("mor_dsv2" -> graft.queries.TableLifecycleQuery.oracle) +
      ("dsv2_roundtrip" -> graft.queries.Dsv2RoundtripQuery.oracle) +
      ("sql_catalog_crud" -> graft.queries.SqlCatalogQuery.oracle) +
      ("sql_merge_cow" -> graft.queries.SqlCatalogQuery.mergeOracle) +
      ("sql_merge_mor" -> graft.queries.SqlCatalogQuery.mergeOracle) +
      ("sql_merge_dv" -> graft.queries.SqlCatalogQuery.mergeOracle) +
      ("stream_tail_dv" -> graft.queries.StreamTailQuery.dvOracle) +
      ("stream_dedup" -> graft.queries.StreamTailQuery.dedupOracle) +
      ("stream_join" -> graft.queries.StreamTailQuery.joinOracle) +
      ("stream_upsert" -> graft.queries.UpsertStreamQuery.oracle) +
      ("sql_partitioned" -> graft.queries.SqlCatalogQuery.partitionedOracle) +
      ("compaction_partial" -> graft.queries.SqlCatalogQuery.partialCompactionOracle) +
      ("sql_constraints" -> graft.queries.SqlCatalogQuery.constraintsOracle) +
      ("sql_overwrite_dynamic" -> graft.queries.SqlCatalogQuery.insertOverwriteDynamicOracle) +
      ("sql_partition_evolution" -> graft.queries.SqlCatalogQuery.partitionEvolutionOracle) +
      ("sql_wap" -> graft.queries.SqlCatalogQuery.wapOracle) +
      ("sql_branch" -> graft.queries.SqlCatalogQuery.branchOracle) +
      ("cdc_changelog" -> graft.queries.ChangelogQuery.oracle) +
      ("cdc_net_changes" -> graft.queries.ChangelogQuery.netOracle) +
      ("cdc_replicate" -> graft.queries.ChangelogQuery.replicateOracle) +
      ("cdc_updates" -> graft.queries.ChangelogQuery.updatesOracle) +
      ("stream_changelog" -> graft.queries.StreamTailQuery.changelogOracle) +
      ("stream_autocompact" -> graft.queries.AutoCompactQuery.oracle) +
      ("mv_incremental" -> graft.queries.MaterializedViewQuery.oracle) +
      ("mv_rollup" -> graft.queries.MaterializedViewQuery.rollupOracle) +
      ("mv_avg" -> graft.queries.MaterializedViewQuery.avgOracle) +
      ("mv_count_distinct" -> graft.queries.MaterializedViewQuery.countDistinctOracle) +
      ("mv_stream" -> graft.queries.MaterializedViewQuery.streamOracle) +
      ("mv_minmax" -> graft.queries.MaterializedViewQuery.minMaxOracle) +
      ("mv_join" -> graft.queries.MaterializedViewQuery.starOracle) +
      ("mv_join_rewrite" -> graft.queries.MaterializedViewQuery.starRewriteOracle) +
      ("mv_join_live" -> graft.queries.MaterializedViewQuery.liveJoinOracle) +
      ("mv_join_live_rewrite" -> graft.queries.MaterializedViewQuery.liveJoinOracle) +
      ("sql_bloom" -> graft.queries.SqlCatalogQuery.bloomOracle) +
      ("sql_decimal" -> graft.queries.SqlCatalogQuery.decimalOracle) +
      ("sql_nested" -> graft.queries.SqlCatalogQuery.nestedOracle) +
      ("sql_column_defaults" -> graft.queries.SqlCatalogQuery.columnDefaultsOracle) +
      ("sql_widen_type" -> graft.queries.SqlCatalogQuery.widenTypeOracle) +
      ("sql_view" -> graft.queries.SqlCatalogQuery.viewOracle) +
      ("sql_agg_meta" -> graft.queries.SqlCatalogQuery.aggMetaOracle) +
      ("sql_agg_meta_group" -> graft.queries.SqlCatalogQuery.aggMetaGroupOracle) +
      ("sql_write_order" -> graft.queries.SqlCatalogQuery.writeOrderOracle) +
      ("sql_dv" -> graft.queries.SqlCatalogQuery.dvOracle) +
      ("sql_string_prune" -> graft.queries.SqlCatalogQuery.stringPruneOracle) +
      ("spj_join" -> graft.queries.SqlCatalogQuery.spjJoinOracle) +
      ("spj_sorted_join" -> graft.queries.SqlCatalogQuery.sortedJoinOracle) +
      ("sql_topn" -> graft.queries.SqlCatalogQuery.topNOracle) +
      ("sql_ctas" -> graft.queries.SqlCatalogQuery.ctasOracle) +
      ("sql_ctas_iceberg" -> graft.queries.SqlCatalogQuery.ctasOracle) +
      ("corpus_clean" -> CorpusPipelineQuery.oracle) +
      ("corpus_curate" -> CorpusPipelineQuery.curateOracle) +
      ("corpus_curate_v2" -> CorpusPipelineQuery.curateV2Oracle) +
      ("corpus_clean_cc" -> CorpusPipelineQuery.ccOracle) +
      ("corpus_to_shards" -> CorpusPipelineQuery.toShardsOracle)
}
