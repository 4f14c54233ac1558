package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators.{Analytics, Ann, Dedup, Multimodal, Reports, Skew, TextAnalysis}
import graft.etl.StarSchema

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    StarSchema.factSales(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> ((s, d) => Analytics.q1PricingSummary(s, d)),
    "q3_top_orders" -> ((s, d) => Analytics.q3TopOrders(s, d)),
    "q5_region_volume" -> ((s, d) => Analytics.q5RegionVolume(s, d)),
    "window_running_total" -> ((s, d) => Analytics.windowRunningTotal(s, d)),
    "window_moving_avg" -> ((s, d) => Analytics.windowMovingAvg(s, d)),
    "ntile_buckets" -> ((s, d) => Analytics.ntileBuckets(s, d)),
    "topk_per_group" -> ((s, d) => Analytics.topkPerGroup(s, d)),
    "topk_per_group_agg" -> ((s, d) => Analytics.topkPerGroupAgg(s, d)),
    "sessionize" -> ((s, d) => Analytics.sessionize(s, d)),
    "stg_events" -> ((s, d) => StarSchema.stgEvents(s, d)),
    "stg_date_range" -> ((s, d) => StarSchema.stgDateRange(s, d)),
    "dim_date" -> ((s, d) => StarSchema.dimDate(s, d)),
    "dim_customer" -> ((s, d) => StarSchema.dimCustomer(s, d)),
    "dim_product" -> ((s, d) => StarSchema.dimProduct(s, d)),
    "dim_session_context" -> ((s, d) => StarSchema.dimSessionContext(s, d)),
    "dim_location" -> ((s, d) => StarSchema.dimLocation(s, d)),
    "scd2_history" -> ((s, d) => StarSchema.scd2History(s, d)),
    "fact_sales" -> ((s, d) => StarSchema.factSales(s, d)),
    "lookup_enrich" -> ((s, d) => StarSchema.lookupEnrich(s, d)),
    "range_band_join" -> ((s, d) => StarSchema.rangeBandJoin(s, d)),
    "parse_price" -> ((s, d) => StarSchema.parsePriceQuery(s, d)),
    "parse_rating" -> ((s, d) => StarSchema.parseRatingQuery(s, d)),
    "text_quality" -> ((s, d) => TextAnalysis.textQuality(s, d)),
    "text_langid" -> ((s, d) => TextAnalysis.textLangId(s, d)),
    "text_tokencount" -> ((s, d) => TextAnalysis.textTokenCount(s, d)),
    "text_fingerprint" -> ((s, d) => TextAnalysis.textFingerprint(s, d)),
    "train_test_split" -> ((s, d) => TextAnalysis.trainTestSplit(s, d)),
    "dedup_exact" -> ((s, d) => Dedup.dedupExact(s, d)),
    "dedup_ngram_jaccard" -> ((s, d) => Dedup.dedupNgramJaccard(s, d)),
    "dedup_minhash_lsh" -> ((s, d) => Dedup.dedupMinHashLsh(s, d)),
    "dedup_simhash" -> ((s, d) => Dedup.dedupSimHash(s, d)),
    "ann_topk_bruteforce" -> ((s, d) => Ann.annTopkBruteforce(s, d)),
    "ann_lsh_topk" -> ((s, d) => Ann.annLshTopk(s, d)),
    "dedup_embedding_cosine" -> ((s, d) => Ann.dedupEmbeddingCosine(s, d)),
    "multimodal_meta" -> ((s, d) => Multimodal.multimodalMeta(s, d)),
    "rollup_sales" -> ((s, d) => Reports.rollupSales(s, d)),
    "quantile_profile" -> ((s, d) => Reports.quantileProfile(s, d)),
    "asof_event_order" -> ((s, d) => Reports.asofEventOrder(s, d)),
    "json_flatten" -> ((s, d) => Reports.jsonFlatten(s, d)),
    "pivot_revenue" -> ((s, d) => Reports.pivotRevenue(s, d)),
    "set_ops" -> ((s, d) => Reports.setOps(s, d)),
    "dedup_clusters" -> ((s, d) => Dedup.dedupClusters(s, d)),
    "salted_agg" -> ((s, d) => Skew.saltedAgg(s, d)),
    "distinct_counts" -> ((s, d) => Skew.distinctCounts(s, d)),
    "category_levels" -> ((s, d) => StarSchema.categoryLevels(s, d)),
    "embedding_centroids" -> ((s, d) => Ann.embeddingCentroids(s, d)),
    "data_quality_summary" -> ((s, d) => graft.etl.QualityChecks.dataQualitySummary(s, d))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> Analytics.q1Sql,
    "q3_top_orders" -> Analytics.q3Sql,
    "q5_region_volume" -> Analytics.q5Sql,
    "window_running_total" -> Analytics.windowRunningTotalSql,
    "window_moving_avg" -> Analytics.windowMovingAvgSql,
    "ntile_buckets" -> Analytics.ntileBucketsSql,
    "topk_per_group" -> Analytics.topkPerGroupSql,
    "topk_per_group_agg" -> Analytics.topkPerGroupAggSql,
    "sessionize" -> Analytics.sessionizeSql,
    "stg_events" -> StarSchema.stgEventsSql,
    "stg_date_range" -> StarSchema.stgDateRangeSql,
    "dim_date" -> StarSchema.dimDateSql,
    "dim_customer" -> StarSchema.dimCustomerSql,
    "dim_product" -> StarSchema.dimProductSql,
    "dim_session_context" -> StarSchema.dimSessionContextSql,
    "dim_location" -> StarSchema.dimLocationSql,
    "scd2_history" -> StarSchema.scd2HistorySql,
    "fact_sales" -> StarSchema.factSalesSql,
    "lookup_enrich" -> StarSchema.lookupEnrichSql,
    "range_band_join" -> StarSchema.rangeBandJoinSql,
    "parse_price" -> StarSchema.parsePriceSql,
    "parse_rating" -> StarSchema.parseRatingSql,
    "text_quality" -> TextAnalysis.textQualitySql,
    "text_langid" -> TextAnalysis.textLangIdSql,
    "text_tokencount" -> TextAnalysis.textTokenCountSql,
    "text_fingerprint" -> TextAnalysis.textFingerprintSql,
    "train_test_split" -> TextAnalysis.trainTestSplitSql,
    "dedup_exact" -> Dedup.dedupExactSql,
    "dedup_ngram_jaccard" -> Dedup.dedupNgramJaccardSql,
    "dedup_minhash_lsh" -> Dedup.dedupMinHashLshSql,
    "dedup_simhash" -> Dedup.dedupSimHashSql,
    "dedup_clusters" -> Dedup.dedupClustersSql,
    "ann_topk_bruteforce" -> Ann.annTopkBruteforceSql,
    "dedup_embedding_cosine" -> Ann.dedupEmbeddingCosineSql,
    "embedding_centroids" -> Ann.embeddingCentroidsSql,
    "multimodal_meta" -> Multimodal.multimodalMetaSql,
    "rollup_sales" -> Reports.rollupSalesSql,
    "quantile_profile" -> Reports.quantileProfileSql,
    "asof_event_order" -> Reports.asofEventOrderSql,
    "json_flatten" -> Reports.jsonFlattenSql,
    "pivot_revenue" -> Reports.pivotRevenueSql,
    "set_ops" -> Reports.setOpsSql,
    "salted_agg" -> Skew.saltedAggSql,
    "distinct_counts" -> Skew.distinctCountsSql,
    "category_levels" -> StarSchema.categoryLevelsSql,
    "data_quality_summary" -> graft.etl.QualityChecks.dataQualitySummarySql
  )
}
