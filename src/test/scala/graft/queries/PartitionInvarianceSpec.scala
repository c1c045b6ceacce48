package graft.queries

import graft.SparkSuite

/** Measures the pack's core float-discipline claim instead of arguing
  * it: every query whose output carries doubles derives them from
  * exact integer partials (or a single terminal division/sqrt chain),
  * so results must be BIT-identical under a different shuffle
  * partitioning and input split size — the two knobs that reorder
  * Spark's partial-aggregate merges. A raw double sum would flip last
  * ulps here and fail this spec before it ever hash-drifted against
  * the driver's oracle.
  */
class PartitionInvarianceSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  // float-bearing representatives across the families; integer-only
  // queries are invariant trivially, these are the ones with a story
  private val queries = Seq(
    "q_text_bm25", "q_text_perplexity", "q_events_twa", "q_agg_corr",
    "q_events_anomaly", "q_text_tfidf", "q_hybrid_rrf",
    "q_sim_standardize",
    // round-11 sketch/dedup wave: HLL's raw-estimate division,
    // containment's C ratio, attribution's credit rollup, the
    // transition matrix's row probabilities
    "q_agg_hll", "q_text_containment", "q_events_attribution",
    "q_events_transitions",
    // this round's wave: IVM's terminal avg division, RFM's monetary
    // rollup, the histogram's per-bin extents, SQ8 recall's /3
    "q_agg_incremental", "q_events_rfm", "q_agg_histogram",
    "q_sim_recall_sq8",
    // round-12 wave: the Legendre-transform grids (pure double
    // arithmetic over literal rows — invariance pins the log-sum-exp
    // grouping too), KN's 1e-4-integer score sums with a terminal
    // division, novelty's type-count ratio
    "q_thermo_legendre", "q_thermo_atp", "q_text_kneser_ney",
    "q_text_novelty",
    // round-12 wave 2: entropy's per-term ln rounding, centroid
    // drift's terminal cosine, the audio roundtrip's RMS sqrt, the
    // kNN graph's window over exact integer distances
    "q_events_entropy", "q_sim_centroid_drift", "q_multimodal_audio",
    "q_sim_knn_graph", "q_agg_pmi",
    // CUPED: θ/ρ²/adjusted means are double chains over exact
    // integer sufficient statistics — order-free by construction
    "q_events_cuped",
    // bootstrap: replicate means are one double division over exact
    // integer (weight × cents) partials; the CI bounds are order
    // statistics of those means, so partitioning cannot move them
    "q_events_bootstrap",
    // domain cap: the kept set hangs on a per-row double quality score
    // and a doc_id tie-break — per-row math is partition-free, so the
    // ranked cut (and the integer char rollups) cannot move
    "q_text_domain_cap",
    // bootstrap diff: replicate diffs are differences of two exact-
    // integer-partial divisions; the CI is their order statistics
    "q_events_bootstrap_diff",
    // catalog-scale mass search: every hit hangs on a DOUBLE window
    // comparison ((mz-ion)/mult ± ppm vs the mass column) — per-row
    // math is partition-free and the rollups are integer, so the hit
    // set cannot move under re-partitioning
    "q_mass_search_scale",
    // round-14 wave: every image/path query is integer-exact by
    // design, but the pHash median threshold, the LSH candidate set,
    // and the path enumeration's per-round frontier all pass through
    // shuffles — invariance pins that no partition-order dependence
    // crept into the kernels or the collect_list sort
    "q_multimodal_phash", "q_multimodal_neardup", "q_path_enum",
    "q_multimodal_audiohash",
    // round-15 wave: the video box walk and the audio landmark path
    // are integer-exact per row, but the landmark LSH self-join, the
    // aligned-offset verify, the peak-rank window, and the sample-
    // table extraction all pass through shuffles/collect_list sorts
    "q_multimodal_video", "q_multimodal_audiofp",
    "q_multimodal_audiodup", "q_multimodal_mp4frames",
    // the video dedup's sid-band self-join, aligned-offset verify,
    // and the n_frames derivation all cross shuffles, as do the video
    // funnel's per-clip rollup and keep-smallest anti-join
    "q_multimodal_videodup", "q_pipeline_video",
    // cross-modal CC: label propagation, the shared-bucket modality
    // rollup, and the member-list sort all cross shuffles
    "q_pipeline_pairs",
    // the audio funnel's sample regroup, landmark-band self-join, and
    // keep-smallest anti-join all cross shuffles
    "q_pipeline_audio",
    // the container-metadata walks are per-row, but the (source, fmt)
    // rollup merges integer partials across shuffles
    "q_multimodal_audiomd", "q_multimodal_mp4sync",
    "q_multimodal_thumbnail", "q_multimodal_subtitles",
    "q_multimodal_mp4audio")

  // queries whose hit geometry is empty at sf0.001 run one SF up
  private val sfOverride = Map("q_mass_search_scale" -> "/root/testdata/sf0.01")

  private def rows(name: String): Seq[String] = {
    val df = graft.SparkEntry.queries(name)(
      spark, sfOverride.getOrElse(name, sfDir))
    df.collect().map(_.toString).sorted.toSeq
  }

  for (q <- queries)
    test(s"$q is bit-identical under different partitioning") {
      val base = rows(q)
      assert(base.nonEmpty)
      val conf = spark.conf
      val prevShuffle = conf.get("spark.sql.shuffle.partitions")
      val prevSplit = conf.get("spark.sql.files.maxPartitionBytes")
      try {
        // different reduce fan-in AND different scan split count:
        // both reorder partial merges
        conf.set("spark.sql.shuffle.partitions", "7")
        conf.set("spark.sql.files.maxPartitionBytes", "65536")
        assert(rows(q) === base,
          s"$q result depends on partitioning — a float partial is " +
            "leaking into a commutative merge")
      } finally {
        conf.set("spark.sql.shuffle.partitions", prevShuffle)
        conf.set("spark.sql.files.maxPartitionBytes", prevSplit)
      }
    }
}
