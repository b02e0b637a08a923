package graft

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Scale-up probe: replicate the sf0.1 fixtures K× with shifted keys into
  * a temp dir (multi-file output — unlike the single-row-group fixtures,
  * scans parallelize), then time headline queries at 1× vs K× to verify
  * near-linear scaling of the plans. Results go to SCALING.md.
  *
  * Key shifting keeps ID-join fan-outs realistic: each replica's orderkeys
  * / doc_ids / vec_ids are offset so replicas don't collapse into the same
  * key-join groups. It does NOT change text/embedding CONTENT, so the
  * similarity family (q25/q26/q27b/q30) still sees every replica as a
  * duplicate of the original and candidate pairs grow ~K² — that
  * super-linear growth is the duplicate density of a replicated corpus,
  * not a plan failure (SCALING.md discusses the measured effect).
  */
object ScaleProbe {

  private val headline = Seq(
    "q01_pricing_summary", "q02_revenue_by_region", "q03_top_orders",
    "q08_running_total", "q25_dedup_exact", "q26_minhash_lsh",
    "q27b_simhash_neardup", "q30_ann_bucketed", "q48_hash_split",
    "q49_repetition", "q53_tfidf_topk", "q57_boilerplate_chunks",
    "q61_sequence_packing", "q62_heavy_hitters", "q65_lm_score",
    "q68_range_join", "q85_funnel", "q91_inverted_index",
    "q95_moving_window", "q110_span_dedup", "q111_bm25_topk",
    "q112_packed_spans", "q116_epoch_shuffle", "q118_vocab_overlap",
    "q120_token_encode", "q124_curriculum_rank", "q125_cluster_purity",
    "q126_distinctive_tokens", "q127_seq_assembly", "q129_doc_repetition",
    "q130_shard_plan", "q138_bpe_encode", "q139_dup_pagerank",
    "q141_domain_affinity", "q143_nb_confusion", "q146_novelty_curve",
    "q148_ks_drift", "q150_class_tokens", "q151_mega_pack",
    "q152_mega_assembly", "q154_bucketed_batches",
    "q157_winnow_fingerprints", "q158_winnow_candidates",
    "q159_containment", "q162_simhash_idf", "q164_jaro_linkage",
    "q165_mad_outliers", "q166_power_pca", "q167_anisotropy",
    "q168_decayed_engagement", "q169_temporal_split",
    "q170_quantile_bands", "q171_rolling_dau", "q172_entity_resolution",
    "q173_hilbert_curve", "q174_semantic_decontamination",
    "q175_overlap_join", "q176_triangle_stats", "q177_content_diff",
    "q178_luhn_cards", "q179_zipf_card", "q180_unigram_segment",
    "q182_attribution", "q183_join_blowup",
    "q184_chi2_card", "q185_seasonal_anomaly", "q186_conversion_lag", "q187_sorted_neighbors",
    "q188_churn_lifetable", "q189_rake_weights", "q190_burstiness",
    "q191_cell_repeat", "q192_codetable_drift", "q193_kcenter_coreset",
    "q194_contamination_report", "q195_tiered_rating",
    "q196_market_basket", "q197_hamming_radius", "q198_autocorrelation",
    "q199_kfold_split", "q200_wordpiece_merges", "q201_reciprocal_match",
    "q202_top_paths", "q203_lpa_communities", "q204_scd2_audit",
    "q205_doc_surprise", "q206_frame_dedup", "q208_cluster_histogram",
    "q209_referential_audit", "q210_user_entropy",
    "q211_weighted_quantiles", "q212_duplicate_suppression",
    "q213_pareto_card", "q214_kcore", "q215_time_weighted_avg",
    "q216_changepoint", "q217_gini_card", "q218_revenue_reconciliation",
    "q219_prepaid_balance", "q220_out_of_order", "q221_temporal_drift",
    "q222_benford_card", "q223_cohort_ltv", "q224_fulfillment_lag",
    "q225_leg_assembly", "q226_timeband_rating", "q227_edge_embeddedness",
    "q228_golden_record", "q229_ar_aging", "q230_hard_negatives",
    "q231_interconnect_netting", "q232_tax_cascade",
    "q233_marginal_rating", "q234_km_survival", "q235_bucket_occupancy",
    "q236_transition_entropy", "q237_lsh_calibration",
    "q238_dwell_time", "q239_invoice_run", "q240_rank_auc", "q241_spearman",
    "q242_components_star", "q243_kruskal_wallis", "q244_rerate_diff",
    "q245_crosscorr_lags", "q246_velocity_flags", "q247_signed_rank",
    "q248_proration", "q249_rev_recognition", "q250_dunning_fifo",
    "q251_friedman", "q252_bootstrap_ci", "q253_source_overlap",
    "q254_commitment_trueup", "q255_reliability_card",
    "q256_prefix_routing", "q257_trunk_peak", "q258_asr_card",
    "q259_priority_sample", "q260_erlang_capacity", "q261_profile_drift",
    "q262_waterfill_mix",
    "q263_msisdn_normalize", "q264_number_guiding", "q265_late_corrections",
    "q266_lcr_plan", "q267_route_margin", "q268_range_utilization",
    "q269_volume_rating", "q270_kendall_tau", "q271_chunk_overlap",
    "q272_ported_guiding", "q273_boilerplate_chunks",
    "q274_increment_rating", "q275_trend_card", "q276_wangiri_card",
    "q277_community_card", "q278_feed_gaps", "q279_versioned_guiding",
    "q280_mixed_width_guiding", "q281_rerate_delta",
    "q282_guiding_version_diff", "q283_msisdn_pseudonymize",
    "q284_cuped_experiment", "q285_theil_sen", "q286_redial_card",
    "q287_ses_forecast",
    "q288_versioned_rating", "q289_incremental_semdedup",
    "q290_k_anonymity", "q291_activity_streaks",
    "q292_porting_flow_matrix", "q293_sla_credits",
    "q294_erlang_staffing", "q295_l_diversity",
    "q296_readability", "q297_bh_fdr",
    "q298_rfm_segments", "q299_holt_forecast", "q300_cusum_shift",
    "q301_vocab_growth", "q302_ndcg_eval",
    "q303_hits_roles", "q304_gains_deciles", "q305_purchase_regularity",
    "q306_gopher_gate", "q307_plan_fragmentation", "q308_bot_cadence",
    "q310_holt_winters", "q311_signal_kappa_neg", "q312_semdedup_rebuild",
    "q313_topology_lineage", "q314_mcnemar", "q315_tv_drift",
    "q316_t_closeness", "q317_simbox_card", "q318_fleiss_kappa",
    "q319_qv_error_card", "q320_bundle_rating", "q321_forecast_backtest",
    "q322_incremental_tv_drift",
    "q323_drift_log_audit", "q324_cochran_q", "q325_kendall_tau_series",
    "q326_mann_kendall", "q327_seasonal_backtest",
    "q328_average_precision", "q329_brier_decomposition",
    "q330_nelson_aalen", "q331_cramers_v2", "q332_irsf_screen",
    "q333_ewma_chart", "q334_isotonic_calibration", "q335_pr_curve",
    "q336_threshold_pick", "q337_calibrated_reliability", "q338_ks_gate",
    "q339_chi2_gate", "q340_forecast_interval",
    "q341_url_canonical", "q342_url_dedup", "q343_domain_cap",
    "q344_monitor_card", "q345_crawl_funnel", "q346_domain_mix_card",
    "q347_mood_median", "q348_logrank_test", "q349_winsorized_mean",
    "q350_url_shape_card", "q351_rmst", "q352_mannwhitney_gate",
    "q353_smd_card", "q354_welch_gate", "q355_ljung_box",
    "q356_holm_screen", "q357_robots_screen", "q358_politeness_card",
    "q359_brown_forsythe", "q360_friedman", "q361_fetch_funnel")

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val k = sys.env.getOrElse("SPARK_GRAFT_SCALE_K", "10").toInt
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale")
    val spark = core.GraftSession.builder("local[32]", 32).getOrCreate()

    // --- replicate with shifted keys ------------------------------------
    def replicate(name: String, keyCols: Seq[String], shift: Long,
        tsCol: Option[String] = None): Unit = {
      val base = spark.read.parquet(s"$srcDir/$name.parquet")
      val out = (0 until k).map { i =>
        val keyed = keyCols.foldLeft(base) { (df, c) =>
          df.withColumn(c, col(c) + lit(i * shift))
        }
        // temporal tables EXTEND the timeline (one fixture span per
        // replica) instead of densifying it: a real event corpus grows
        // by covering more time, and range-join pair volume then grows
        // linearly, not K² — densified replicas would conflate "more
        // data" with "more concurrency". The fixture's ts arrives either
        // as raw nanos (legacy TIMESTAMP(NANOS) read as long) or as a
        // plain timestamp (current micros fixtures) — shift accordingly.
        tsCol.fold(keyed) { c =>
          if (keyed.schema(c).dataType == org.apache.spark.sql.types.LongType)
            keyed.withColumn(c, col(c) + lit(i * 31L * 86400L * 1000000000L))
          else
            keyed.withColumn(c, col(c) + expr(s"make_dt_interval(${i * 31}, 0, 0, 0)"))
        }
      }.reduce(_ union _)
      out.repartition(32).write.mode(SaveMode.Overwrite).parquet(s"$outDir/$name.parquet")
    }
    // dims stay 1x; facts and corpus tables replicate with shifted keys.
    // SPARK_GRAFT_SCALE_REUSE=1 skips re-replication when the K× copy
    // from a previous probe run is still on disk (the copy is ~8 min of
    // the run; the measurements are the point).
    val reuse = sys.env.get("SPARK_GRAFT_SCALE_REUSE").contains("1") &&
      new java.io.File(s"$outDir/embeddings.parquet").exists()
    if (!reuse) {
      Seq("region", "nation", "customer", "supplier", "part").foreach { n =>
        spark.read.parquet(s"$srcDir/$n.parquet")
          .write.mode(SaveMode.Overwrite).parquet(s"$outDir/$n.parquet")
      }
      replicate("orders", Seq("o_orderkey"), 10000000L)
      replicate("lineitem", Seq("l_orderkey"), 10000000L)
      replicate("events", Seq("event_id"), 100000000L, tsCol = Some("ts"))
      replicate("documents", Seq("doc_id"), 1000000L)
      replicate("embeddings", Seq("vec_id"), 1000000L)
    }

    // SPARK_GRAFT_SCALE_MODE: "headline", "sim", or unset for both
    val mode = sys.env.getOrElse("SPARK_GRAFT_SCALE_MODE", "all")
    // dev-loop filter mirroring Bench/Verify: SPARK_GRAFT_PROBE_ONLY=q141_…
    // probes just those headline queries; unset runs the full sweep
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)

    // --- time 1x vs Kx --------------------------------------------------
    if (mode != "sim") {
      println(s"query,t1x_sec,t${k}x_sec,ratio")
      headline.filter(n => only.forall(_.contains(n))).foreach { name =>
        val q = queries.Registry.byName(name)
        noop(q.build(spark, srcDir)) // warm
        val t1 = Seq.fill(3)(time(noop(q.build(spark, srcDir)))).min
        noop(q.build(spark, outDir))
        val tk = Seq.fill(3)(time(noop(q.build(spark, outDir)))).min
        println(f"$name,$t1%.3f,$tk%.3f,${tk / t1}%.2f")
      }
    }

    // --- scaled-knob similarity probe (q76/q80/q82 shapes, round 5) -----
    // Under K× replication the oracle fixtures' pinned knobs (cells=4,
    // %20 corpus-sample queries) make work grow ~K² BY CONSTRUCTION —
    // a probe run that way measures the fixture's constants, not the
    // plan. Production scales IVF/semdedup cells ~√n and bounds the
    // query set (the explicit-query API), so the probe applies those
    // rules at each scale and reports the knob values with the ratio.
    if (mode != "headline") {
      import queries.VectorQ
      def emb(dir: String) = core.Tables.load(spark, dir, "embeddings")
      val cellsOf = collection.mutable.Map[String, Int]()
      def cellsFor(dir: String): Int = cellsOf.getOrElseUpdate(dir,
        math.max(4, math.round(math.sqrt(emb(dir).count().toDouble)).toInt))
      // a FIXED 100-vector query batch at every scale — a search/eval
      // workload does not grow because the corpus did
      def queriesFor(dir: String) = emb(dir).orderBy(col("vec_id")).limit(100)
        .select((col("vec_id") + 100000000L).as("query_id"), col("embedding"))
      // q312 regime contrast: the bulk wave's deltaPairs at a given cell
      // count (centroids = lowest `cells` ids, the store seed rule),
      // in-memory history — the pair-work term alone, no store I/O
      def semDedupWave(dir: String, cells: Int): DataFrame = {
        val v = emb(dir).select(col("vec_id"), col("embedding"))
          .withColumn("nrm",
            graft.functions.VectorFunctions.vec_norm2(col("embedding")))
          .localCheckpoint()
        val mm = v.agg(min(col("vec_id")), max(col("vec_id"))).head
        val q4Id = mm.getLong(0) + (mm.getLong(1) - mm.getLong(0) + 1) / 4
        val seeds = v.orderBy(col("vec_id")).limit(cells)
          .select(col("vec_id").as("cluster"),
            expr("transform(embedding, x -> CAST(x AS DOUBLE))")
              .as("centroid"))
        val hist = VectorQ.assignToCentroids(
          v.filter(col("vec_id") < q4Id), seeds)
        graft.etl.IncrementalSemDedup.deltaPairs(
          v.filter(col("vec_id") >= q4Id)
            .select(col("vec_id"), col("embedding")),
          seeds, hist)
      }
      val sim: Seq[(String, String => DataFrame, String => String)] = Seq(
        ("q76_semdedup_scaled",
          dir => VectorQ.semDedup(emb(dir), cells = cellsFor(dir)),
          dir => s"cells=${cellsFor(dir)}"),
        ("q80_pq_scaled",
          dir => VectorQ.annPq(emb(dir), queriesFor(dir), 4, 16, 3, trained = false),
          _ => "subs=4;codes=16;queries=100"),
        ("q82_ivfpq_scaled",
          dir => {
            val cents = VectorQ.kmeansCentroids(emb(dir), cells = cellsFor(dir), iters = 0)
            VectorQ.annIvfPq(emb(dir), cents, queriesFor(dir), 4, 16, 3, 2, trained = false)
          },
          dir => s"cells=${cellsFor(dir)};nprobe=2;codes=16;queries=100"),
        // q174 with the PRODUCTION eval-set shape: a FIXED eval table
        // (always the 1× corpus's first 100 vectors) while the train
        // corpus scales K×. The oracle fixture's %40 eval sample grows
        // WITH the corpus — correct for a hash-match, but its K× probe
        // then measures eval·corpus coupling (3.43 in round 6), not the
        // plan. A real benchmark suite does not grow because training
        // data did; with eval pinned, candidate work scales only with
        // per-bucket corpus density.
        ("q174_decon_scaled",
          dir => VectorQ.semanticDecontamination(emb(dir), queriesFor(srcDir)),
          _ => "eval=100(fixed);bits=3;probeH=1;thr=0.9"),
        // q148 with a CONTINUOUS planted metric: the fixture's n_chars
        // has a few hundred distinct values, so the round-6 probe never
        // exercised the case the bucket-offset rewrite exists for —
        // distinct values ≈ rows. The planted metric (a Knuth-hash of
        // doc_id, ~unique per doc) makes the per-value table data-sized;
        // the prefix sums must still spread over per-bucket windows.
        ("q148_continuous_scaled",
          dir => queries.AnalyticsQ.ksDrift(
            core.Tables.load(spark, dir, "documents"),
            expr("CAST(doc_id * 2654435761 AS BIGINT) % 1000000007"),
            "src0", "src1", bucketWidth = 1000000L),
          _ => "metric=hash(doc_id);distinct~rows;bw=1e6"),
        // q194 with a FIXED eval set (always the 1× corpus's benchmark
        // sample) while train scales K× — the q174 scaled-knob
        // principle; the headline q194 probe couples eval size AND
        // duplicate density to K (its %11 eval grows with the corpus
        // and every replica duplicates it)
        // q207's brute-force eval card with a FIXED query batch: the
        // headline fixture's %20 query sample grows with the corpus and
        // the pair volume with their product — an eval workload doesn't.
        ("q207_fixed_eval_scaled",
          dir => queries.VectorQ.truncationAgreement(emb(dir),
            queriesFor(srcDir)),
          _ => "queries=100(fixed);prefix=16"),
        ("q194_fixed_eval_scaled",
          dir => {
            val evalDocs = core.Tables.load(spark, srcDir, "documents")
              .filter(col("doc_id") % 11 === 5).limit(100)
            queries.TextQ.contaminationReport(
              core.Tables.load(spark, dir, "documents"), evalDocs)
          },
          _ => "eval=100(fixed);width=5;jac=0.5;win=8"),
        // q312's regime contrast, store I/O excluded: the BULK wave's
        // deltaPairs (last 3/4 of the corpus against the first 1/4 as
        // history + itself) under FIXED 4 cells vs under √n cells —
        // the isolated pair-work term the rebuild contract is about
        // (the headline q312 row times the whole lifecycle, ~10 parquet
        // jobs of fixed I/O around it).
        ("q312_bulkwave_fixed4",
          dir => semDedupWave(dir, 4),
          _ => "cells=4(fixed);wave=3n/4"),
        ("q312_bulkwave_sqrtn",
          dir => semDedupWave(dir, cellsFor(dir)),
          dir => s"cells=${cellsFor(dir)};wave=3n/4"))
      println(s"simprobe,knobs_1x,knobs_${k}x,t1x_sec,t${k}x_sec,ratio")
      sim.filter { case (name, _, _) => only.forall(_.contains(name)) }
        .foreach { case (name, build, knob) =>
        noop(build(srcDir))
        val t1 = Seq.fill(3)(time(noop(build(srcDir)))).min
        noop(build(outDir))
        val tk = Seq.fill(3)(time(noop(build(outDir)))).min
        println(f"$name,${knob(srcDir)},${knob(outDir)},$t1%.3f,$tk%.3f,${tk / t1}%.2f")
      }
    }
    spark.stop()
  }
}
