package graft

import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Oracle-authoring lints, born from the one red row of round 9:
  * `data_shard_assign` was value-identical in both engines but
  * hash-failed the driver because `SUM(n_chars)` let DuckDB promote to
  * HUGEINT while Spark kept BIGINT. The repo's authoring convention —
  * every cross-engine aggregate carries an explicit CAST — is enforced
  * two ways:
  *
  *  1. scripts/local_check.py is dtype-strict (any non-datetime pandas
  *     dtype inequality fails locally, mirroring the driver's hash);
  *  2. this spec lints the shapes a dtype drift would enter through:
  *     an uncast `SUM(...) AS alias` in the oracle SQL, and the set of
  *     DOUBLE-typed output columns (each of which relies on both
  *     engines running the same IEEE chain — so a new one must be a
  *     deliberate decision, not an accidental uncast division).
  */
class OracleLintSpec extends SparkSpec {

  /** CTE-internal uncast SUM aliases whose every consumer re-casts at
    * the output boundary (verified by the dtype-strict gate); listed
    * so NEW uncast sums still fail the lint.
    */
  private val uncastSumAllowed: Map[String, String] = Map(
    "corpus_curation_e2e" ->
      ("n_kept / kept_chars / n_pii_docs are CTE-internal CASE-sums; the " +
        "final SELECT re-casts each (CAST(... AS BIGINT)) before emitting"),
    // the two below surfaced when the lint became paren-balance-aware
    // (the old [^()]* argument class never matched their nested-paren
    // sums) — both are already-exact DECIMAL sums whose consumers
    // re-cast at the output boundary, the same shape as above
    "q_purchase_anomaly_days" ->
      ("var_num is a CTE-internal DECIMAL(18,0)² sum; outputs are " +
        "CAST(var_num AS DOUBLE) inside z and a BOOLEAN comparison"),
    "q15_top_supplier" ->
      ("r is a CTE-internal DECIMAL(28,6) sum; the final SELECT emits " +
        "CAST(r AS DOUBLE) AS total_revenue"))

  /** Every `SUM(<balanced arg>) AS alias` in `sql`, with whether a
    * `CAST(` (any whitespace) immediately encloses the SUM. A
    * paren-balance walk, not a regex argument class: `[^()]*` cannot
    * match `SUM(a * (b + c)) AS x`, so the exact r9 bug class could
    * re-enter through any sum over a parenthesized expression — and a
    * `CAST( SUM` with a space defeated the old lookbehind into a false
    * positive.
    */
  private def sumAliases(sql: String): List[(String, Boolean)] = {
    val out = scala.collection.mutable.ListBuffer.empty[(String, Boolean)]
    for (m <- """(?i)\bSUM\s*\(""".r.findAllMatchIn(sql)) {
      var i = m.end; var depth = 1
      while (i < sql.length && depth > 0) {
        val c = sql.charAt(i)
        if (c == '(') depth += 1 else if (c == ')') depth -= 1
        i += 1
      }
      if (depth == 0) {
        // cast-wrapped sums are followed by the cast TYPE (`AS BIGINT)`),
        // which the castWrapped flag filters out
        """(?is)^\s+AS\s+(\w+)""".r.findFirstMatchIn(sql.substring(i)).foreach {
          am =>
            val castWrapped = """(?is)\bCAST\s*\(\s*$""".r
              .findFirstIn(sql.substring(math.max(0, m.start - 16), m.start))
              .isDefined
            out += ((am.group(1), castWrapped))
        }
      }
    }
    out.toList
  }

  test("every aliased SUM in oracle SQL is CAST-wrapped (r9 shard_assign bug class)") {
    // the exact r9 shape: SUM(...) AS alias with no enclosing CAST —
    // DuckDB promotes integer SUM to HUGEINT, Spark stays BIGINT, and
    // the driver hash diverges on identical values
    val offenders = SparkEntry.oracleSql.toSeq.flatMap { case (name, sql) =>
      val hits = sumAliases(sql).collect { case (alias, false) => alias }
      if (hits.nonEmpty && !uncastSumAllowed.contains(name))
        Some(s"$name: uncast SUM AS ${hits.mkString(", ")}")
      else None
    }
    assert(offenders.isEmpty,
      s"wrap in CAST(SUM(...) AS BIGINT/DOUBLE) or allowlist with a reason:\n  " +
        offenders.mkString("\n  "))
    // prune stale allowlist entries
    val stale = uncastSumAllowed.keys.filterNot(n =>
      SparkEntry.oracleSql.get(n).exists(sql =>
        sumAliases(sql).exists(!_._2)))
    assert(stale.isEmpty, s"allowlist entries no longer needed: ${stale.mkString(", ")}")
    // the scanner itself: nested parens flagged, spaced CAST not
    assert(sumAliases("SELECT SUM(a * (b + c)) AS x FROM t") == List(("x", false)))
    assert(sumAliases("SELECT CAST( SUM(a * (b + c)) AS BIGINT) AS x FROM t")
      == List(("BIGINT", true)))
  }

  test("LM gate conventions pinned: keep threshold 11.0 and the integer log₂") {
    // the CCNet-style gate is oracle-exact BECAUSE the surprise is a
    // pure integer log₂ (`length(bin(x))` ≡ `length(format('{:b}',x))`)
    // and the keep threshold is the pinned 11.0 — an edit that changes
    // either silently changes what the filter keeps
    for (n <- Seq("text_lm_perplexity", "text_lm_perplexity_bounded")) {
      val sql = SparkEntry.oracleSql(n)
      assert(sql.contains("<= 11.0"), s"$n: keep threshold must stay 11.0")
      assert(sql.contains("length(format('{:b}'"),
        s"$n: surprise must stay the integer log₂ (no float log)")
    }
    for (n <- Seq("text_lm_buckets", "text_lm_buckets_ranged"))
      assert(SparkEntry.oracleSql(n).contains("length(format('{:b}'"),
        s"$n: bucket scores must stay the integer log₂")
  }

  /** Every DOUBLE/FLOAT output column, pinned. These are the columns
    * whose cross-engine agreement rests on both engines evaluating the
    * same IEEE-754 chain in the same order (safe: double ops are
    * deterministic given the same expression shape). A column showing
    * up here UNPINNED usually means an integer-exact contract silently
    * became a float (e.g. an uncast division) — decide deliberately,
    * then pin it.
    */
  private val doubleColumnsPinned: Map[String, Set[String]] = Map(
    "ann_bruteforce_cosine" -> Set("cos_sim"),
    "ann_ivf_cosine" -> Set("cos_sim"),
    "ann_ivf_pq" -> Set("cos_sim", "q_cos_sim", "recon_err"),
    "ann_knn_graph" -> Set("cos_sim"),
    "ann_lsh_cosine" -> Set("cos_sim"),
    "cdc_apply_upsert_delete" -> Set("value"),
    "cdc_cas" -> Set("value"),
    "cdc_deadlines" -> Set("value"),
    "cdc_dlq_replay" -> Set("value"),
    "cdc_incremental_apply" -> Set("value"),
    "cdc_latest_by_key" -> Set("value"),
    "cdc_merge_conflicts" -> Set("value", "before_value", "target_value", "resolved_value"),
    "cdc_stage_filter_applied" -> Set("value"),
    "cdc_stage_retire" -> Set("value"),
    "cdc_state_at" -> Set("value"),
    "cdc_stream_apply" -> Set("value"),
    "cdc_unique_by_time_key" -> Set("value"),
    "data_budget_cut" -> Set("quality_score"),
    "data_decontamination_semantic" -> Set("max_cos"),
    "data_mix_plan" -> Set("share", "sample_rate"),
    "data_mix_weights" -> Set("share"),
    "data_shard_assign" -> Set("skew"),
    "data_snapshot_drift" -> Set("share_a", "share_b", "drift_num", "tv_distance"),
    "data_vocab_coverage" -> Set("oov_rate"),
    "dedup_embedding_cosine" -> Set("cos_sim"),
    "dedup_embedding_incremental" -> Set("cos_sim"),
    "dedup_incremental" -> Set("jaccard"),
    "dedup_minhash_lsh" -> Set("jaccard"),
    "dedup_ngram_coverage" -> Set("coverage"),
    "dedup_ngram_jaccard" -> Set("jaccard"),
    "dedup_simhash" -> Set("jaccard"),
    "embedding_dim_stats" -> Set("min_v", "max_v", "mean_q"),
    "embedding_knn_join" -> Set("cos_sim"),
    "embedding_label_coherence" -> Set("cos_to_centroid"),
    "embedding_quantize_int8" -> Set("lo", "hi", "scale", "max_err"),
    "multimodal_pipeline" -> Set("f0"),
    "q10_returned_items" -> Set("revenue"),
    "q14_promo_revenue" -> Set("promo_revenue_pct", "total_revenue"),
    "q15_top_supplier" -> Set("total_revenue"),
    "q17_small_quantity" -> Set("avg_yearly"),
    "q18_large_orders" -> Set("total_qty"),
    "q19_discounted_revenue" -> Set("revenue"),
    "q1_pricing_summary" -> Set("sum_qty", "sum_base_price", "sum_disc_price",
      "sum_charge", "avg_qty", "avg_price"),
    "q22_sales_opportunity" -> Set("totacctbal"),
    "q3_shipping_priority" -> Set("revenue"),
    "q5_local_supplier" -> Set("revenue"),
    "q6_revenue_forecast" -> Set("revenue"),
    "q7_volume_shipping" -> Set("revenue"),
    "q8_market_share" -> Set("mkt_share", "total_volume"),
    "q9_product_profit" -> Set("sum_profit"),
    "q_cohort_retention" -> Set("retention"),
    "q_funnel_windowed" -> Set("click_rate", "purchase_rate"),
    "q_purchase_anomaly_days" -> Set("z"),
    "sketch_distinct_kmv" -> Set("est", "rel_err"),
    "sketch_heavy_hitters" -> Set("share"),
    "data_quantiles_exact" -> Set("q"),
    // q is the quantile label; est/exact/err stay integer-exact BIGINTs
    "sketch_quantiles_sampled" -> Set("q"),
    "text_bpe_apply" -> Set("tokens_per_word"),
    "text_code_detect" -> Set("brace_ratio"),
    "text_gopher_filters" -> Set("mean_word_len", "symbol_word_ratio", "alpha_word_ratio"),
    "text_quality_score" -> Set("punct_ratio", "digit_ratio", "stopword_ratio",
      "mean_token_len", "quality_score"),
    "text_repetition" -> Set("distinct_ratio", "top_token_frac", "top_bigram_frac"),
    "text_tfidf_top_terms" -> Set("score"),
    "text_lm_perplexity" -> Set("mean_bits"),
    "text_lm_perplexity_bounded" -> Set("mean_bits"),
    "text_lm_buckets" -> Set("lo_bits", "hi_bits"),
    "text_lm_buckets_ranged" -> Set("lo_bits", "hi_bits"),
    "ann_recall_audit" -> Set("recall"))

  test("DOUBLE-typed output columns match the pinned allowlist") {
    val diffs = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val actual = fn(spark, sfDir).schema.fields.collect {
        case f if f.dataType == DoubleType || f.dataType == FloatType => f.name
      }.toSet
      val pinned = doubleColumnsPinned.getOrElse(name, Set.empty)
      if (actual != pinned)
        Some(s"$name: actual=${actual.toSeq.sorted.mkString(",")} " +
          s"pinned=${pinned.toSeq.sorted.mkString(",")}")
      else None
    }
    assert(diffs.isEmpty, s"float-column drift:\n  ${diffs.mkString("\n  ")}")
  }
}
