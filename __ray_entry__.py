"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship address-view pipeline on the deterministic
synthetic corpus (plus a testdata smoke aggregate); ``queries()`` exposes one
callable per implemented operator family (SURVEY.md §2 + the training-data
ops); ``oracle_sql()`` pairs each SQL-expressible query with DuckDB SQL over
the same parquet tables, matching column names exactly. Geospatial pipeline
queries run over the engine's own synthesized interleaved-doc corpus
(BASELINE.json input_hint; no external data) and are rows-only checks.

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from typing import Any

FIXTURE_BLOCKS = 60  # deterministic corpus size for geospatial queries


def _parts_for(n_blocks: int) -> int:
    """Partition count follows the DATA, not the cluster: one partition per
    ~1.5k fixture blocks, floored at 8 for parallelism (same rule bench.py
    uses; at fixture scale this resolves to 8)."""
    return max(8, n_blocks // 1500)


@functools.lru_cache(maxsize=2)
def _fixture_layer_tables(n_blocks: int = FIXTURE_BLOCKS):
    """Layers pinned as DRIVER-HELD Arrow tables (tiny at fixture scale).

    Caching the lazy layer Datasets themselves is fragile across a long
    session: their block objects can be evicted/lose ownership after
    enough unrelated Ray work ("owner is unknown" — observed in the full
    pytest sweep when the driver-contract tests built the cache ~30 min
    before the minimal-corpus sweep reused it). Driver-held tables cannot
    expire, and re-wrapping them per access costs one ray.put of a few
    hundred rows."""
    import ray

    from osmi_addresses_ray.pipelines.address_view import build_layers
    from osmi_addresses_ray.sources.fixture import fixture_docs

    layers = build_layers(fixture_docs(n_blocks), num_parts=_parts_for(n_blocks))
    import pyarrow as pa

    out = {}
    for name, ds in layers.items():
        tabs = ray.get(ds.to_arrow_refs())
        if tabs:
            out[name] = pa.concat_tables(tabs, promote_options="default")
        else:
            s = ds.schema()
            s = getattr(s, "base_schema", s)
            out[name] = s.empty_table() if s is not None else pa.table({})
    return out


def _fixture_layers(n_blocks: int = FIXTURE_BLOCKS):
    """name → Dataset over the cached driver-held layer tables (fresh
    object-store copies per access — always owned by this driver)."""
    import ray
    import ray.data as rd

    tables = _fixture_layer_tables(n_blocks)
    # from_arrow_refs, not from_arrow: from_arrow drops a 0-row table's
    # schema (buildings is legitimately empty)
    return {
        name: rd.from_arrow_refs([ray.put(t)]) for name, t in tables.items()
    }


def entry() -> Any:
    """Flagship pipeline (address view over interleaved docs) + a testdata
    smoke aggregate; returns the nodes_with_addresses layer as pandas."""
    from osmi_addresses_ray.pipelines.relational import q1_pricing_summary

    q1_pricing_summary("/root/testdata/sf0.001")  # smoke: testdata readable
    layers = _fixture_layers()
    return layers["osmi_addresses_nodes_with_addresses"].to_pandas()


@functools.lru_cache(maxsize=2)
def _fixture_oracle(n_blocks: int = FIXTURE_BLOCKS):
    """Naive single-threaded recomputation of all layers over the same
    deterministic corpus (osmi_addresses_ray/oracle/layers.py)."""
    from osmi_addresses_ray.oracle.layers import oracle_layers
    from osmi_addresses_ray.sources.fixture import fixture_table

    return oracle_layers(fixture_table(n_blocks))


def _sorted_df(df):
    return df.sort_values(list(df.columns), kind="stable", na_position="last").reset_index(
        drop=True
    )


def _layer_query(name: str) -> Callable[[str], Any]:
    def run(sf_dir: str):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from osmi_addresses_ray.oracle import ORACLE_DIR, oracle_path
        from osmi_addresses_ray.schemas import LAYER_SCHEMAS

        import os

        df = _sorted_df(_fixture_layers()[name].to_pandas())
        odf = _sorted_df(_fixture_oracle()[name])
        os.makedirs(ORACLE_DIR, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(odf, schema=LAYER_SCHEMAS[name], preserve_index=False),
            oracle_path(name),
        )
        return df

    return run


def queries() -> dict[str, Callable[[str], Any]]:
    from osmi_addresses_ray.pipelines import (
        dedup,
        graph,
        sketches,
        relational,
        similarity,
        textstats,
        timeseries,
    )

    q: dict[str, Callable[[str], Any]] = {
        # relational operator family (SQL-checked)
        "q1_pricing_summary": relational.q1_pricing_summary,
        "q_filter_high_value": relational.q_filter_high_value,
        "q_join_orders_customers": relational.q_join_orders_customers,
        "q_top_orders": relational.q_top_orders,
        "q_supplier_part_join": relational.q_supplier_part_join,
        "q_distinct_event_types": relational.q_distinct_event_types,
        "q_events_hourly": relational.q_events_hourly,
        "q_nation_region_join": relational.q_nation_region_join,
        "q_customer_order_counts": relational.q_customer_order_counts,
        "q_price_quantiles": relational.q_price_quantiles,
        "q_top_orders_per_customer": relational.q_top_orders_per_customer,
        "q_bloom_semijoin": relational.q_bloom_semijoin,
        "q_anti_join_orders": relational.q_anti_join_orders,
        "q_events_rollup": relational.q_events_rollup,
        "q_user_top_event_type": relational.q_user_top_event_type,
        "q_orders_above_cust_avg": relational.q_orders_above_cust_avg,
        "q_events_pivot": relational.q_events_pivot,
        "q_revenue_by_nation": relational.q_revenue_by_nation,
        "q_order_percent_rank": relational.q_order_percent_rank,
        "q_price_outliers": relational.q_price_outliers,
        "q_distinct_users_per_type": relational.q_distinct_users_per_type,
        "q_price_quantiles_cont": relational.q_price_quantiles_cont,
        "q_order_list_per_customer": relational.q_order_list_per_customer,
        "q_events_cube": relational.q_events_cube,
        "q_first_last_order": relational.q_first_last_order,
        "q_ntile_orders": relational.q_ntile_orders,
        "q_dense_rank_customers": relational.q_dense_rank_customers,
        "q_mad_priority": relational.q_mad_priority,
        "q_zscore_orders": relational.q_zscore_orders,
        "q_trimmed_mean": relational.q_trimmed_mean,
        "q_group_moments": relational.q_group_moments,
        "benford_audit": relational.benford_audit,
        "assoc_rules": relational.assoc_rules,
        "soundex_parts": relational.soundex_parts,
        "bloom_fpr_audit": relational.bloom_fpr_audit,
        "trade_gravity": relational.trade_gravity,
        "fd_profile": relational.fd_profile,
        "q_full_outer_hours": relational.q_full_outer_hours,
        "q_weighted_quantiles": relational.q_weighted_quantiles,
        "q_props_extract": relational.q_props_extract,
        "theil_sen_trend": relational.theil_sen_trend,
        "pareto_orders": relational.pareto_orders,
        "weighted_sample": relational.weighted_sample,
        "embedding_covariance": similarity.embedding_covariance,
        # time-series custom operators (SQL-checked): one hash exchange on
        # user_id, vectorized per-partition sweeps (pipelines/timeseries.py)
        "asof_click_view": timeseries.asof_join_events,
        "conversion_lag_quantiles": timeseries.conversion_lag_quantiles,
        "session_windows": timeseries.session_windows,
        "session_paths": timeseries.session_paths,
        "sliding_window_counts": timeseries.sliding_window_counts,
        "sliding_distinct_users": timeseries.sliding_distinct_users,
        "km_survival": timeseries.km_survival,
        "allen_interval_mix": timeseries.allen_interval_mix,
        "xcorr_types": timeseries.xcorr_types,
        "periodicity_detect": timeseries.periodicity_detect,
        "mann_kendall": timeseries.mann_kendall,
        "pettitt_changepoint": timeseries.pettitt_changepoint,
        "range_join_shipments": timeseries.range_join_shipments,
        "running_totals": timeseries.running_totals,
        "streaming_watermark_counts": timeseries.streaming_watermark_counts,
        "q_user_set_ops": timeseries.q_user_set_ops,
        "q_event_gaps": timeseries.q_event_gaps,
        "funnel_stage_counts": timeseries.funnel_stage_counts,
        "q_event_trend": timeseries.q_event_trend,
        "retention_cohorts": timeseries.retention_cohorts,
        "moving_avg_user": timeseries.moving_avg_user,
        "event_type_cooccurrence": timeseries.event_type_cooccurrence,
        # training-data ops over documents/embeddings
        "dedup_exact_docs": dedup.exact_dedup_docs,
        "dedup_incremental": dedup.dedup_incremental_docs,
        "token_counts": textstats.token_counts,
        "quality_scores": textstats.quality_scores,
        "knn_bruteforce": similarity.knn_bruteforce,
        "knn_range": similarity.knn_range,
        "ts_autocorr_stats": timeseries.ts_autocorr_stats,
        "knn_batch": similarity.knn_batch,
        "hard_negatives": similarity.hard_negatives,
        "lang_id": textstats.lang_id,
        "fingerprints": textstats.fingerprints,
        "winnow_fingerprints": textstats.winnow_fingerprints,
        "cdc_chunks": textstats.cdc_chunks,
        "temperature_mix": textstats.temperature_mix,
        "top_tokens": textstats.top_tokens,
        "heavy_hitters": textstats.heavy_hitters,
        "bm25_search": textstats.bm25_search,
        "hybrid_search_rrf": similarity.hybrid_search_rrf,
        "vocab_growth": textstats.vocab_growth,
        "scrub_dup_ngrams": textstats.scrub_dup_ngrams,
        "pagerank_trade": graph.pagerank_trade,
        "hits_trade": graph.hits_trade,
        "triangle_counts": graph.triangle_counts,
        "butterfly_counts": graph.butterfly_counts,
        "degree_assortativity": graph.degree_assortativity,
        "bfs_hops": graph.bfs_hops,
        "ra_links": graph.ra_links,
        "snm_pairs": dedup.snm_pairs,
        "pack_sequences": textstats.pack_sequences,
        "span_corruption": textstats.span_corruption,
        "gopher_quality_filter": textstats.gopher_quality_filter,
        "event_spikes": timeseries.event_spikes,
        "cusum_changepoints": timeseries.cusum_changepoints,
        "resample_locf": timeseries.resample_locf,
        "resample_lerp": timeseries.resample_lerp,
        "interval_coverage": timeseries.interval_coverage,
        "event_transitions": timeseries.event_transitions,
        "scd2_intervals": timeseries.scd2_intervals,
        "ols_trend": timeseries.ols_trend,
        "dtw_pairs": timeseries.dtw_pairs,
        "throttle_events": timeseries.throttle_events,
        "ema_user_value": timeseries.ema_user_value,
        "k_anonymity_audit": timeseries.k_anonymity_audit,
        "curate_corpus": textstats.curate_corpus,
        "shard_assignment": textstats.shard_assignment,
        "tfidf_top_terms": textstats.tfidf_top_terms,
        "chunk_documents": textstats.chunk_documents,
        "token_counts_bpe": textstats.token_counts_bpe,
        "training_mixture": textstats.training_mixture,
        "top_bigrams": textstats.top_bigrams,
        "collocations": textstats.collocations,
        "rake_keywords": textstats.rake_keywords,
        "zipf_coverage": textstats.zipf_coverage,
        "phrase_search": textstats.phrase_search,
        "bigram_lift": textstats.bigram_lift,
        "stratified_sample": textstats.stratified_sample,
        "scrub_pii": textstats.scrub_pii,
        "decontaminate_docs": textstats.decontaminate_docs,
        "frequent_ngrams": textstats.frequent_ngrams,
        "search_docs_all_terms": textstats.search_docs_all_terms,
        "search_docs_indexed": textstats.search_docs_indexed,
        "duplicate_spans": textstats.duplicate_spans,
        "ngram_novelty": textstats.ngram_novelty,
        "lang_confusion": textstats.lang_confusion,
        "q_left_join_nulls": relational.q_left_join_nulls,
        "doc_repetition": textstats.doc_repetition,
        "token_entropy": textstats.token_entropy,
        "dsir_weights": textstats.dsir_weights,
        "ccnet_buckets": textstats.ccnet_buckets,
        # sketch/ANN ops checked against naive pure-Python oracles written to
        # /tmp/graft_oracle (see osmi_addresses_ray.oracle): the query runs
        # the distributed pipeline AND recomputes the spec single-threaded;
        # the paired oracle_sql() reads the recomputation back via DuckDB
        "simhash_docs": _with_oracle(
            "simhash_docs", dedup.simhash_docs, "simhash_oracle", "documents"
        ),
        # exact-recall near-dup pairs (pigeonhole banding + xor-popcount
        # verify); oracle = naive O(n²) hamming sweep over independently
        # recomputed signatures
        "simhash_pairs": _with_oracle(
            "simhash_pairs", dedup.simhash_pairs, "simhash_pairs_oracle", "documents"
        ),
        "lsh_calibration": _with_oracle(
            "lsh_calibration", dedup.lsh_calibration, "lsh_calibration_oracle", "documents"
        ),
        "minhash_lsh_pairs": _with_oracle(
            "minhash_lsh_pairs", dedup.minhash_lsh_pairs, "minhash_pairs_oracle", "documents"
        ),
        "ssjoin_prefix": dedup.ssjoin_prefix,
        "ngram_jaccard_dedup": _with_oracle(
            "ngram_jaccard_dedup", dedup.ngram_jaccard_dedup, "ngram_dedup_oracle", "documents"
        ),
        "knn_ivf": _with_oracle(
            "knn_ivf", lambda sf_dir: similarity.knn_ivf(sf_dir)[0], "knn_ivf_oracle",
            "embeddings",
        ),
        "knn_hyperplane": _with_oracle(
            "knn_hyperplane", similarity.knn_hyperplane, "knn_hyperplane_oracle",
            "embeddings",
        ),
        # first-class k-means: driver-side seeded training on the fixed
        # sample, distributed ordered-fold argmax assignment
        "kmeans_assign": _with_oracle(
            "kmeans_assign", similarity.kmeans_assign, "kmeans_assign_oracle",
            "embeddings",
        ),
        # SemDeDup: cluster-keyed exchange with map-side assignment, per-
        # cluster pairwise prune in vec_id order (first-in-id kept)
        "semdedup": _with_oracle(
            "semdedup", similarity.semdedup, "semdedup_oracle", "embeddings"
        ),
        # k-core: iterative degree peel to fixpoint, two chained exchanges
        # per round (kill notices keyed on the surviving endpoint)
        "kcore_nodes": _with_oracle(
            "kcore_nodes", graph.kcore_nodes, "kcore_oracle", "lineitem"
        ),
        # KLL quantile sketch: per-partition compactor ladders, driver
        # merge; output pairs estimate with exact rank error
        "ams_f2": sketches.ams_f2,
        "kll_quantiles": _with_oracle(
            "kll_quantiles", sketches.kll_quantiles, "kll_oracle", "events"
        ),
        # product quantization: seeded driver-sample codebooks, distributed
        # encode; oracle = per-row scalar distance folds (same float spec)
        "pq_codes": _with_oracle(
            "pq_codes", similarity.pq_codes, "pq_codes_oracle", "embeddings"
        ),
        "pq_adc_search": _with_oracle(
            "pq_adc_search", similarity.pq_adc_search, "pq_adc_oracle", "embeddings"
        ),
        # PCA pc1: integer-moment exchange + driver power iteration (ordered
        # scalar folds) + broadcast projection pass
        "pca_project": _with_oracle(
            "pca_project", similarity.pca_project, "pca_project_oracle", "embeddings"
        ),
        # BPE trainer: word-histogram exchange, driver merge loop (the
        # production trainer shape — corpus size changes counts, not work)
        "bpe_merges": _with_oracle(
            "bpe_merges", textstats.bpe_merges, "bpe_merges_oracle", "documents"
        ),
        # tokenizer application: trained merge table broadcast, unique-word
        # encode per batch (vocab-bounded work), O(tokens) lookup
        "bpe_encode": _with_oracle(
            "bpe_encode", textstats.bpe_encode, "bpe_encode_oracle", "documents"
        ),
        # greedy k-center coreset (Gonzalez traversal): k rounds of
        # broadcast-centers + per-block (max, min-id) partials
        "kcenter_coreset": _with_oracle(
            "kcenter_coreset", similarity.kcenter_coreset, "kcenter_oracle", "embeddings"
        ),
        "embedding_cosine_dedup": _with_oracle(
            "embedding_cosine_dedup", similarity.embedding_cosine_dedup, "emb_dedup_oracle",
            "embeddings",
        ),
        # additive count-min grid (sum tree — batch-boundary invariant);
        # oracle = scalar python-int recomputation incl. exact probe counts
        "cms_token_counts": _with_oracle(
            "cms_token_counts", sketches.cms_token_counts, "cms_token_counts_oracle",
            "documents",
        ),
        # mergeable HLL registers (elementwise-max tree); oracle = scalar
        # python-int recomputation of the same register spec
        "hll_distinct_users": _with_oracle(
            "hll_distinct_users", sketches.hll_distinct_users, "hll_distinct_oracle", "events"
        ),
        # verified LSH pairs → distributed connected components → per-doc
        # representative; oracle = naive union-find over the same pair spec
        "dedup_clusters": _with_oracle(
            "dedup_clusters", dedup.dedup_clusters, "dedup_clusters_oracle", "documents"
        ),
        # rows-only (stubbed decode / engine-corpus inputs)
        "media_features": _media_features_query,
        "media_resize": _media_resize_query,
        "media_audio_features": _media_audio_query,
        "media_frame_sample": _media_frames_query,
        "media_scene_cuts": _media_cuts_query,
        "media_dhash": _media_dhash_query,
        "media_sobel": _media_sobel_query,
        "media_orient_hist": _media_orient_query,
        "media_hist_eq": _media_hist_eq_query,
        "media_palette": _media_palette_query,
        "media_otsu": _media_otsu_query,
        "media_crest": _media_crest_query,
        "media_audio_windows": _media_audio_windows_query,
        "media_pitch": _media_pitch_query,
        "media_onsets": _media_onsets_query,
        "media_blobs": _media_blobs_query,
        "dhash_pairs": _dhash_pairs_query,
        "image_dup_clusters": _image_clusters_query,
        "polygon_dissolve": _polygon_dissolve_query,
        "media_quadtree": _media_quadtree_query,
        "media_motion": _media_motion_query,
        "media_zcr": _media_zcr_query,
        "media_resample_audio": _media_resample_query,
        "geohash_cells": _geohash_query,
        "hilbert_keys": _hilbert_query,
        "quad_cells": _quad_cells_query,
        "quad_rollup": _quad_rollup_query,
        "knn_recall": _knn_recall_query,
        "pip_entrances_in_buildings": _pip_query,
        # geodesic length operator: engine kernel vs DuckDB recomputing the
        # haversine from raw coordinates (true SQL oracle)
        "geodesic_lengths": _geodesic_query,
        # raster ↔ vector family (north_rule)
        "rasterize_nwa": _rasterize_query,
        "zonal_entrances_per_building": _zonal_query,
        "polygonize_nwa": _polygonize_query,
        "tile_pyramid_nwa": _pyramid_query,
        "kernel_smooth_nwa": _smooth_query,
        # extra geospatial operators (pipelines/geo_ops.py)
        "spatial_radius_join": _radius_join_query,
        "idw_surface": _idw_query,
        "spatial_knn_join": _knn_join_query,
        "bbox_overlap_join": _bbox_overlap_query,
        "spatial_clusters": _clusters_query,
        "dbscan_clusters": _dbscan_query,
        "street_route_dist": _route_dist_query,
        "street_components": _street_cc_query,
        "street_chains": _street_chains_query,
        "isochrone_counts": _isochrone_query,
        "str_pack_nwa": _str_pack_query,
        "hilbert_locality": _hilbert_locality_query,
        "spatial_sample_nwa": _spatial_sample_query,
        "addr_completeness": _addr_completeness_query,
        "areal_interpolation": _areal_interp_query,
        "moran_i": _moran_query,
        "ripley_k": _ripley_query,
        "hex_bins": _hex_bin_query,
        "traj_speed_outliers": _speed_outliers_query,
        "way_sinuosity": _sinuosity_query,
        "route_circuity": _circuity_query,
        "network_voronoi": _voronoi_query,
        "street_mst": _mst_query,
        "street_mis": _mis_query,
        "street_lpa": _street_lpa_query,
        "street_bipartite": _street_bipartite_query,
        "segment_bearing_rose": _bearing_rose_query,
        "turn_classes": _turns_query,
        "od_flows": _od_query,
        "staypoints": _staypoints_query,
        "hausdorff_pairs": _hausdorff_query,
        "frechet_pairs": _frechet_query,
        "edr_pairs": _edr_query,
        "polygon_audit": _polygon_audit_query,
        "polygon_relate": _polygon_relate_query,
        "geofence_transitions": _geofence_query,
        "comovement_pairs": _comovement_query,
        "map_match_accuracy": _mm_accuracy_query,
        "hotspot_cells": _hotspot_query,
        "line_simplify": _line_simplify_query,
        "vw_simplify": _vw_simplify_query,
        "map_match_trajectories": _map_match_query,
        "convex_hull_cells": _hulls_query,
        "segment_crossings": _segment_xing_query,
        "media_histogram": _media_hist_query,
        "fuzzy_name_pairs": _fuzzy_names_query,
    }
    # geospatial layers over the synthesized interleaved-doc corpus (rows-only)
    for layer in (
        "osmi_addresses_connection_line",
        "osmi_addresses_nearest_points",
        "osmi_addresses_nearest_roads",
        "osmi_addresses_nearest_areas",
        "osmi_addresses_interpolation",
        "osmi_addresses_nodes_with_addresses",
        "osmi_addresses_ways_with_addresses",
        "osmi_addresses_addrx_on_nonclosed_way",
        "osmi_addresses_entrances",
        "osmi_addresses_ways_with_postal_code",
    ):
        q[layer] = _layer_query(layer)
    return q


def _with_oracle(name: str, ray_fn, oracle_fn_name: str, tag_table: str):
    """Run the distributed query, then write the independent naive-oracle
    recomputation to the input-tagged parquet path its oracle_sql() reads.

    These oracles depend on the input corpus, so the parquet is namespaced
    by the base table's row count (``tag=<n>`` hive dir) and the paired SQL
    selects the tag matching the views the driver registered — a run at one
    sf can never poison a later SQL-first evaluation at another sf."""

    def run(sf_dir: str):
        from osmi_addresses_ray.oracle import content_tag, llm_ops, write_oracle_tagged

        res = ray_fn(sf_dir)
        write_oracle_tagged(
            name, getattr(llm_ops, oracle_fn_name)(sf_dir), content_tag(sf_dir, tag_table)
        )
        return res

    return run


def _explode_features(df):
    """feature list<float32> → 16 float64 columns (exact widening) so the
    result is hash-comparable without nested types."""
    import numpy as np
    import pandas as pd

    out = df[["doc_id", "media_ref", "width", "height"]].copy()
    feats = np.stack(df["feature"].to_numpy()).astype(np.float64) if len(df) else (
        np.empty((0, 16))
    )
    for i in range(16):
        out[f"f{i:02d}"] = feats[:, i]
    return out


def _media_features_query(sf_dir: str):
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.layers import oracle_media_features
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.multimodal import media_features

    df = media_features(fixture_docs(FIXTURE_BLOCKS)).to_pandas().sort_values(
        ["doc_id", "media_ref"]
    ).reset_index(drop=True)
    write_oracle(
        "media_features", _explode_features(oracle_media_features(fixture_table(FIXTURE_BLOCKS)))
    )
    return _explode_features(df)


def _media_resize_query(sf_dir: str):
    """Actor-pool nearest-neighbor thumbnails over the fixture corpus; the
    oracle recomputes the integer pixel summaries straight from the
    synthesized pixels (codec-bypassing, so a decoder bug fails the gate)."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.layers import oracle_media_resize
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.multimodal import media_resize

    df = (
        media_resize(fixture_docs(FIXTURE_BLOCKS))
        .to_pandas()
        .sort_values(["doc_id", "media_ref"])
        .reset_index(drop=True)
    )
    write_oracle("media_resize", oracle_media_resize(fixture_table(FIXTURE_BLOCKS)))
    return df


def _geohash_query(sf_dir: str):
    """Geohash-7 cell assignment for every address point (tiling key used
    for cell-shuffle co-location); oracle = scalar integer interval-halving
    over the independently recomputed layer."""
    import pyarrow as pa

    from osmi_addresses_ray.functions.geohash import geohash_encode
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.layers import oracle_geohash

    nwa = _fixture_layers()["osmi_addresses_nodes_with_addresses"]

    def f(t: pa.Table) -> pa.Table:
        gh = geohash_encode(
            t["lon"].to_numpy(zero_copy_only=False), t["lat"].to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "node_id": t["node_id"],
                "ip_id": t["ip_id"],
                "lon": t["lon"],
                "lat": t["lat"],
                "geohash": pa.array(gh, pa.string()),
            }
        )

    df = (
        nwa.map_batches(f, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["node_id", "ip_id", "lon", "lat"])
        .reset_index(drop=True)
    )
    write_oracle(
        "geohash_cells", oracle_geohash(_fixture_oracle()["osmi_addresses_nodes_with_addresses"])
    )
    return df


def _knn_recall_query(sf_dir: str):
    """Recall@10 of the hyperplane-LSH kNN against the exact brute-force
    top-10 — ANN quality as a first-class, oracle-checked metric. The
    callable runs BOTH pipelines (writing the LSH side's tagged oracle);
    the paired SQL joins the exact-cosine SQL against that tagged parquet."""
    import pandas as pd

    from osmi_addresses_ray.pipelines import similarity

    hp = _with_oracle(
        "knn_hyperplane", similarity.knn_hyperplane, "knn_hyperplane_oracle", "embeddings"
    )(sf_dir)
    bf = similarity.knn_bruteforce(sf_dir)
    hits = len(set(bf["vec_id"]) & set(hp["vec_id"]))
    import numpy as np

    return pd.DataFrame(
        [{"k": np.int64(10), "n_hits": np.int64(hits),
          "recall": float(np.round(hits / 10.0, 6))}]
    )


def _quad_cells_query(sf_dir: str):
    """Cube-sphere quadtree cell ids (S2-style) for every address point at
    levels 12 and 8 (coarse = prefix shift); oracle = scalar python-int
    Hilbert fold + scalar face/st spec over shared trig primitives."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.layers import oracle_quad_cells
    from osmi_addresses_ray.pipelines.geo_ops import quad_cells_table

    df = quad_cells_table(_fixture_layers()["osmi_addresses_nodes_with_addresses"])
    write_oracle(
        "quad_cells", oracle_quad_cells(_fixture_oracle()["osmi_addresses_nodes_with_addresses"])
    )
    return df


def _quad_rollup_query(sf_dir: str):
    """Hierarchical per-cell counts: fine-level grouped exchange, coarse
    level derived by the pure id shift; oracle = scalar dict rollup."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.layers import oracle_quad_rollup
    from osmi_addresses_ray.pipelines.geo_ops import quad_rollup

    df = quad_rollup(_fixture_layers()["osmi_addresses_nodes_with_addresses"])
    write_oracle(
        "quad_rollup", oracle_quad_rollup(_fixture_oracle()["osmi_addresses_nodes_with_addresses"])
    )
    return df


def _media_audio_query(sf_dir: str):
    """REAL audio decode boundary (RIFF/WAVE PCM16 — no codec lib needed);
    exact integer features; oracle computed from raw PCM bypassing RIFF."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.layers import oracle_audio_features
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.multimodal import audio_features

    df = (
        audio_features(fixture_docs(FIXTURE_BLOCKS))
        .to_pandas()
        .sort_values(["doc_id", "media_ref"])
        .reset_index(drop=True)
    )
    write_oracle("media_audio_features", oracle_audio_features(fixture_table(FIXTURE_BLOCKS)))
    return df


def _media_frames_query(sf_dir: str):
    """Video frame-sampling stage (every 2nd frame of the frame-stack
    container); integer pixel summaries; container-bypassing oracle."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.layers import oracle_video_frame_sample
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.multimodal import video_frame_sample

    df = (
        video_frame_sample(fixture_docs(FIXTURE_BLOCKS))
        .to_pandas()
        .sort_values(["doc_id", "media_ref"])
        .reset_index(drop=True)
    )
    write_oracle(
        "media_frame_sample", oracle_video_frame_sample(fixture_table(FIXTURE_BLOCKS))
    )
    return df


def _media_resample_query(sf_dir: str):
    """2:1 integer PCM decimation over real WAV decode; scalar floor-division
    oracle from the raw sample spec."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.layers import oracle_audio_resample
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.multimodal import media_resample_audio

    df = (
        media_resample_audio(fixture_docs(FIXTURE_BLOCKS))
        .to_pandas()
        .sort_values(["doc_id", "media_ref"])
        .reset_index(drop=True)
    )
    write_oracle("media_resample_audio", oracle_audio_resample(fixture_table(FIXTURE_BLOCKS)))
    return df


def _media_dhash_query(sf_dir: str):
    """Perceptual dHash per image (integer cross-multiplied brightness
    bits); scalar per-pixel-loop oracle over the raw pixel spec."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.layers import oracle_media_dhash
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.multimodal import media_dhash

    df = (
        media_dhash(fixture_docs(FIXTURE_BLOCKS))
        .to_pandas()
        .sort_values(["doc_id", "media_ref"])
        .reset_index(drop=True)
    )
    write_oracle("media_dhash", oracle_media_dhash(fixture_table(FIXTURE_BLOCKS)))
    return df


def _media_sobel_query(sf_dir: str):
    """Sobel edge statistics over real decoded pixels (integer 3×3 gradient,
    mag² threshold); scalar per-pixel-loop oracle over the raw pixel spec."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.layers import oracle_media_sobel
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.multimodal import media_sobel

    df = (
        media_sobel(fixture_docs(FIXTURE_BLOCKS))
        .to_pandas()
        .sort_values(["doc_id", "media_ref"])
        .reset_index(drop=True)
    )
    write_oracle("media_sobel", oracle_media_sobel(fixture_table(FIXTURE_BLOCKS)))
    return df


def _media_orient_query(sf_dir: str):
    """Edge-orientation octant histogram (HOG-lite) over real decoded
    pixels; scalar per-pixel ladder oracle over the raw pixel spec."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.layers import oracle_media_orient_hist
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.multimodal import media_orient_hist

    df = (
        media_orient_hist(fixture_docs(FIXTURE_BLOCKS))
        .to_pandas()
        .sort_values(["doc_id", "media_ref"])
        .reset_index(drop=True)
    )
    write_oracle(
        "media_orient_hist", oracle_media_orient_hist(fixture_table(FIXTURE_BLOCKS))
    )
    return df


def _media_hist_eq_query(sf_dir: str):
    """Histogram equalization over real decoded pixels; scalar
    dict-histogram + running-cdf oracle over the raw pixel spec."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.layers import oracle_media_hist_eq
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.multimodal import media_hist_eq

    df = (
        media_hist_eq(fixture_docs(FIXTURE_BLOCKS))
        .to_pandas()
        .sort_values(["doc_id", "media_ref"])
        .reset_index(drop=True)
    )
    write_oracle(
        "media_hist_eq", oracle_media_hist_eq(fixture_table(FIXTURE_BLOCKS))
    )
    return df


def _media_palette_query(sf_dir: str):
    """8-corner palette quantization over real decoded pixels; scalar
    per-pixel L1-min oracle over the raw pixel spec."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.layers import oracle_media_palette
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.multimodal import media_palette

    df = (
        media_palette(fixture_docs(FIXTURE_BLOCKS))
        .to_pandas()
        .sort_values(["doc_id", "media_ref"])
        .reset_index(drop=True)
    )
    write_oracle(
        "media_palette", oracle_media_palette(fixture_table(FIXTURE_BLOCKS))
    )
    return df


def _media_otsu_query(sf_dir: str):
    """Otsu binarization over real decoded pixels; scalar Fraction-compare
    oracle over the raw pixel spec."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.layers import oracle_media_otsu
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.multimodal import media_otsu

    df = (
        media_otsu(fixture_docs(FIXTURE_BLOCKS))
        .to_pandas()
        .sort_values(["doc_id", "media_ref"])
        .reset_index(drop=True)
    )
    write_oracle(
        "media_otsu", oracle_media_otsu(fixture_table(FIXTURE_BLOCKS))
    )
    return df


def _media_crest_query(sf_dir: str):
    """Crest-factor audit over real decoded PCM16; scalar per-sample
    oracle over the raw sample spec."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.layers import oracle_media_crest
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.multimodal import media_crest

    df = (
        media_crest(fixture_docs(FIXTURE_BLOCKS))
        .to_pandas()
        .sort_values(["doc_id", "media_ref"])
        .reset_index(drop=True)
    )
    write_oracle(
        "media_crest", oracle_media_crest(fixture_table(FIXTURE_BLOCKS))
    )
    return df


def _media_zcr_query(sf_dir: str):
    """Zero-crossing-rate windows + voiced-window gate over real decoded
    PCM16; scalar per-sample-loop oracle over the raw sample spec."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.layers import oracle_audio_zcr
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.multimodal import audio_zcr

    df = (
        audio_zcr(fixture_docs(FIXTURE_BLOCKS))
        .to_pandas()
        .sort_values(["doc_id", "media_ref"])
        .reset_index(drop=True)
    )
    write_oracle("media_zcr", oracle_audio_zcr(fixture_table(FIXTURE_BLOCKS)))
    return df


def _media_motion_query(sf_dir: str):
    """Block-matching motion estimation (8x8 blocks, +-2 exhaustive SAD
    search) between consecutive decoded frames; scalar per-pixel-loop
    oracle over the raw frame spec."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.layers import oracle_media_motion
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.multimodal import media_motion

    df = (
        media_motion(fixture_docs(FIXTURE_BLOCKS))
        .to_pandas()
        .sort_values(["doc_id", "media_ref"])
        .reset_index(drop=True)
    )
    write_oracle("media_motion", oracle_media_motion(fixture_table(FIXTURE_BLOCKS)))
    return df


def _media_audio_windows_query(sf_dir: str):
    """Windowed audio-energy profile (VAD primitive) over real decoded
    PCM16; scalar per-window-loop oracle over the raw sample spec."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.layers import oracle_audio_windows
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.multimodal import audio_windows

    df = (
        audio_windows(fixture_docs(FIXTURE_BLOCKS))
        .to_pandas()
        .sort_values(["doc_id", "media_ref"])
        .reset_index(drop=True)
    )
    write_oracle("media_audio_windows", oracle_audio_windows(fixture_table(FIXTURE_BLOCKS)))
    return df


def _media_pitch_query(sf_dir: str):
    """Autocorrelation pitch (fundamental-frequency primitive) over real
    decoded PCM16; per-lag integer-dot oracle over the raw sample spec."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.layers import oracle_audio_pitch
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.multimodal import audio_pitch

    df = (
        audio_pitch(fixture_docs(FIXTURE_BLOCKS))
        .to_pandas()
        .sort_values(["doc_id", "media_ref"])
        .reset_index(drop=True)
    )
    write_oracle("media_pitch", oracle_audio_pitch(fixture_table(FIXTURE_BLOCKS)))
    return df


def _media_onsets_query(sf_dir: str):
    """Onset detection (attack/transient primitive) over real decoded
    PCM16; scalar per-window-loop oracle over the raw sample spec."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.layers import oracle_audio_onsets
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.multimodal import audio_onsets

    df = (
        audio_onsets(fixture_docs(FIXTURE_BLOCKS))
        .to_pandas()
        .sort_values(["doc_id", "media_ref"])
        .reset_index(drop=True)
    )
    write_oracle("media_onsets", oracle_audio_onsets(fixture_table(FIXTURE_BLOCKS)))
    return df


def _media_blobs_query(sf_dir: str):
    """Connected-component blob labeling (region primitive) over real
    decoded pixels; scalar BFS flood-fill oracle over the raw pixel spec."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.layers import oracle_media_blobs
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.multimodal import media_blobs

    df = (
        media_blobs(fixture_docs(FIXTURE_BLOCKS))
        .to_pandas()
        .sort_values(["doc_id", "media_ref"])
        .reset_index(drop=True)
    )
    write_oracle("media_blobs", oracle_media_blobs(fixture_table(FIXTURE_BLOCKS)))
    return df


def _image_clusters_query(sf_dir: str):
    """Near-dup image clusters (dHash pairs closed by distributed CC);
    oracle = scalar union-find over the independent pair replay."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.layers import oracle_image_dup_clusters
    from osmi_addresses_ray.stages.multimodal import image_dup_clusters

    df = image_dup_clusters(120, num_parts=8)
    write_oracle("image_dup_clusters", oracle_image_dup_clusters(120))
    return df


def _polygon_dissolve_query(sf_dir: str):
    """GIS dissolve (merge edge-adjacent same-zone parcels) over the
    deterministic hash-grid corpus; TRUE SQL oracle: the same plain-
    arithmetic synthesis + recursive min-label closure + grouped sums."""
    from osmi_addresses_ray.pipelines.geo_ops import polygon_dissolve

    return polygon_dissolve(48, num_parts=8)


def _dhash_pairs_query(sf_dir: str):
    """Near-dup image pairs by exact 4-band dHash pigeonhole (Hamming ≤ 3);
    oracle = naive O(n²) Hamming sweep over independently recomputed scalar
    dHashes of the same planted-variant corpus."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.layers import oracle_dhash_pairs
    from osmi_addresses_ray.stages.multimodal import dhash_pairs

    df = dhash_pairs(120, num_parts=8)
    write_oracle("dhash_pairs", oracle_dhash_pairs(120))
    return df


def _media_quadtree_query(sf_dir: str):
    """Quadtree uniformity decomposition (structure/compressibility
    signal) over real decoded pixels; scalar-loop oracle."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.layers import oracle_media_quadtree
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.multimodal import media_quadtree

    df = (
        media_quadtree(fixture_docs(FIXTURE_BLOCKS))
        .to_pandas()
        .sort_values(["doc_id", "media_ref"])
        .reset_index(drop=True)
    )
    write_oracle("media_quadtree", oracle_media_quadtree(fixture_table(FIXTURE_BLOCKS)))
    return df


def _media_cuts_query(sf_dir: str):
    """Histogram-difference shot-boundary detection over the frame-stack
    container; exact integer distances; container-bypassing scalar oracle."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.layers import oracle_scene_cuts
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.multimodal import video_scene_cuts

    df = (
        video_scene_cuts(fixture_docs(FIXTURE_BLOCKS))
        .to_pandas()
        .sort_values(["doc_id", "media_ref"])
        .reset_index(drop=True)
    )
    write_oracle("media_scene_cuts", oracle_scene_cuts(fixture_table(FIXTURE_BLOCKS)))
    return df


def _hilbert_query(sf_dir: str):
    """Hilbert-curve sort key per address point (the locality-preserving
    layout order); oracle = classic scalar xy2d loop."""
    import pyarrow as pa

    from osmi_addresses_ray.functions.geohash import hilbert_d
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.layers import oracle_hilbert

    nwa = _fixture_layers()["osmi_addresses_nodes_with_addresses"]

    def f(t: pa.Table) -> pa.Table:
        d = hilbert_d(
            t["lon"].to_numpy(zero_copy_only=False), t["lat"].to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "node_id": t["node_id"],
                "ip_id": t["ip_id"],
                "lon": t["lon"],
                "lat": t["lat"],
                "hilbert_d": pa.array(d, pa.int64()),
            }
        )

    df = (
        nwa.map_batches(f, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["node_id", "ip_id", "lon", "lat"])
        .reset_index(drop=True)
    )
    write_oracle(
        "hilbert_keys", oracle_hilbert(_fixture_oracle()["osmi_addresses_nodes_with_addresses"])
    )
    return df


def _pip_query(sf_dir: str):
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.layers import oracle_pip
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.contains import entrances_in_buildings
    from osmi_addresses_ray.stages.parse import parse_docs

    import pandas as pd

    parsed = parse_docs(fixture_docs(FIXTURE_BLOCKS))
    ways_geo = assemble_ways(parsed, num_parts=_parts_for(FIXTURE_BLOCKS))
    df = entrances_in_buildings(
        parsed, ways_geo, num_parts=_parts_for(FIXTURE_BLOCKS)
    ).to_pandas()
    if df.empty:
        df = pd.DataFrame(
            {"point_id": pd.Series([], dtype="int64"), "poly_id": pd.Series([], dtype="int64")}
        )
    write_oracle("pip_entrances_in_buildings", oracle_pip(fixture_table(FIXTURE_BLOCKS)))
    return df.sort_values(["point_id", "poly_id"]).reset_index(drop=True)


def _geodesic_query(sf_dir: str):
    """Great-circle length of every postal-code way in the fixture corpus,
    computed by the engine's vectorized kernel over ways_geo. The oracle side
    recomputes the haversine in DuckDB from a (way_id, xs, ys) parquet
    written by the INDEPENDENT naive parser (oracle/layers.parse_entities)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from osmi_addresses_ray.constants import tag_col
    from osmi_addresses_ray.functions.geo_ref import geodesic_lengths
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.layers import parse_entities
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    parsed = parse_docs(fixture_docs(FIXTURE_BLOCKS)).drop_columns(["spans"])
    ways_geo = assemble_ways(parsed, num_parts=_parts_for(FIXTURE_BLOCKS))

    def lens(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = t.filter(pc.and_(pc.is_valid(t[tag_col("postal_code")]), t["nonzero"]))
        xs = s["xs"].combine_chunks() if isinstance(s["xs"], pa.ChunkedArray) else s["xs"]
        ys = s["ys"].combine_chunks() if isinstance(s["ys"], pa.ChunkedArray) else s["ys"]
        offs = np.asarray(xs.offsets, np.int64)
        offs = offs - offs[0]
        ls = geodesic_lengths(
            np.asarray(xs.flatten(), np.float64), np.asarray(ys.flatten(), np.float64), offs
        )
        return pa.table(
            {
                "way_id": s["way_id"].combine_chunks(),
                "length_m": pa.array(np.round(ls, 6)),
            }
        )

    df = (
        ways_geo.map_batches(lens, batch_format="pyarrow")
        .to_pandas()
        .sort_values("way_id")
        .reset_index(drop=True)
    )

    # independent naive path → raw coordinates parquet for the SQL oracle
    ents = parse_entities(fixture_table(FIXTURE_BLOCKS))
    nodes = {e["id"]: e for e in ents if e["etype"] == "node"}
    rows = []
    for e in ents:
        if e["etype"] != "way" or "postal_code" not in e["tags"]:
            continue
        if len(e["refs"]) < 2 or any(r not in nodes for r in e["refs"]):
            continue
        xs = [nodes[r]["lon"] for r in e["refs"]]
        ys = [nodes[r]["lat"] for r in e["refs"]]
        if not any(x != xs[0] or y != ys[0] for x, y in zip(xs, ys)):
            continue
        rows.append({"way_id": e["id"], "xs": xs, "ys": ys})
    write_oracle("geodesic_lengths", pd.DataFrame(rows, columns=["way_id", "xs", "ys"]))
    return df


_RASTER_X0, _RASTER_Y0, _RASTER_RES = 8.0, 47.0, 0.0005


def _rasterize_query(sf_dir: str):
    """Vector→raster: the fixture nwa points binned at 0.0005°. The SQL side
    recomputes the 2-D histogram in DuckDB from the INDEPENDENT naive-oracle
    point set (true SQL oracle)."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.pipelines.raster import rasterize_points

    out = (
        rasterize_points(
            _fixture_layers()["osmi_addresses_nodes_with_addresses"],
            x0=_RASTER_X0, y0=_RASTER_Y0, res=_RASTER_RES,
        )
        .to_pandas()[["ix", "iy", "n"]]
        .sort_values(["ix", "iy"])
        .reset_index(drop=True)
    )
    write_oracle(
        "rasterize_nwa_src",
        _fixture_oracle()["osmi_addresses_nodes_with_addresses"][["lon", "lat"]],
    )
    return out


def _smooth_query(sf_dir: str):
    """Sparse 3x3 kernel smoothing over the rasterized nwa layer; TRUE SQL
    oracle: DuckDB histogram x offset cross-join over the independent
    point set."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.pipelines.raster import kernel_smooth, rasterize_points

    raster = rasterize_points(
        _fixture_layers()["osmi_addresses_nodes_with_addresses"],
        x0=_RASTER_X0, y0=_RASTER_Y0, res=_RASTER_RES,
    )
    out = kernel_smooth(raster, num_parts=4)
    write_oracle(
        "rasterize_nwa_src",
        _fixture_oracle()["osmi_addresses_nodes_with_addresses"][["lon", "lat"]],
    )
    return out


def _pyramid_query(sf_dir: str):
    """Map-tile zoom pyramid over the rasterized nwa layer; SQL recomputes
    all three zoom levels from the independent naive-oracle point set
    (true SQL oracle — repeated floor-halving + regrouping)."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.pipelines.raster import rasterize_points, tile_pyramid

    out = tile_pyramid(
        rasterize_points(
            _fixture_layers()["osmi_addresses_nodes_with_addresses"],
            x0=_RASTER_X0, y0=_RASTER_Y0, res=_RASTER_RES,
        )
    )
    write_oracle(
        "tile_pyramid_src",
        _fixture_oracle()["osmi_addresses_nodes_with_addresses"][["lon", "lat"]],
    )
    return out


def _media_hist_query(sf_dir: str):
    """Per-image color histograms from REAL decoded pixels (actor pool);
    oracle recomputes the exact bucket counts from the synthesized pixels,
    bypassing the codecs."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.layers import oracle_media_histogram
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.multimodal import media_histogram

    df = (
        media_histogram(fixture_docs(FIXTURE_BLOCKS))
        .to_pandas()
        .sort_values(["doc_id", "media_ref"])
        .reset_index(drop=True)
    )
    write_oracle("media_histogram", oracle_media_histogram(fixture_table(FIXTURE_BLOCKS)))
    return df


def _fuzzy_names_query(sf_dir: str):
    """Edit-distance ≤ 1 street-name self-join (SymSpell deletion banding);
    TRUE SQL oracle: DuckDB levenshtein over the O(n²) self-join of the
    independently recomputed name set."""
    import pyarrow as pa

    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.pipelines.dedup import fuzzy_name_pairs

    nwa = _fixture_layers()["osmi_addresses_nodes_with_addresses"]

    def names(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = t.filter(pc.is_valid(t["street"]))
        return pa.table({"name": s["street"]})

    out = (
        fuzzy_name_pairs(
            nwa.map_batches(names, batch_format="pyarrow"),
            num_parts=_parts_for(FIXTURE_BLOCKS),
        )
        .to_pandas()
        .sort_values(["name_a", "name_b"])
        .reset_index(drop=True)
    )
    write_oracle(
        "fuzzy_names_src",
        _fixture_oracle()["osmi_addresses_nodes_with_addresses"][["street"]],
    )
    return out


def _write_spatial_src():
    """Independent point source for the radius-join family: the naive-oracle
    nwa rows; the SQL side derives (pid, ix, iy) itself (COALESCE + 1e-7
    quantization), so everything past the raw layer is recomputed in DuckDB."""
    from osmi_addresses_ray.oracle import write_oracle

    write_oracle(
        "spatial_radius_src",
        _fixture_oracle()["osmi_addresses_nodes_with_addresses"][
            ["node_id", "way_id", "is_ip", "lon", "lat"]
        ],
    )


def _write_idw_src():
    """Independent point source for the IDW surface: naive-oracle nwa rows
    incl. houseno; the SQL side re-derives quantization, the atoi prefix
    and the grid itself."""
    from osmi_addresses_ray.oracle import write_oracle

    write_oracle(
        "idw_src",
        _fixture_oracle()["osmi_addresses_nodes_with_addresses"][
            ["node_id", "way_id", "is_ip", "lon", "lat", "houseno"]
        ],
    )


def _idw_query(sf_dir: str):
    """IDW housenumber surface over occupied grid cells (one cell-keyed
    exchange, exact fixed-point integer terms); TRUE SQL oracle: DuckDB
    O(cells × points) join with the same integer floor-division terms."""
    from osmi_addresses_ray.pipelines.geo_ops import idw_grid

    out = idw_grid(
        _fixture_layers()["osmi_addresses_nodes_with_addresses"],
        num_parts=_parts_for(FIXTURE_BLOCKS),
    )
    _write_idw_src()
    return out


def _radius_join_query(sf_dir: str):
    """Exact radius self-join over fixture address points (cell-bucketed,
    one hash exchange); TRUE SQL oracle: DuckDB O(n²) self-join with the
    same integer-exact distance filter."""
    from osmi_addresses_ray.pipelines.geo_ops import spatial_radius_join

    out = spatial_radius_join(
        _fixture_layers()["osmi_addresses_nodes_with_addresses"],
        num_parts=_parts_for(FIXTURE_BLOCKS),
    )
    _write_spatial_src()
    return out


def _bbox_overlap_query(sf_dir: str):
    """Grid-partitioned rectangle join (building bboxes × highway bboxes)
    with reference-point exactly-once emission; TRUE SQL oracle: DuckDB
    O(n²) inequality join over the independently recomputed bbox table."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.geo_ops import oracle_way_bboxes
    from osmi_addresses_ray.pipelines.geo_ops import bbox_overlap_join
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    parsed = parse_docs(fixture_docs(FIXTURE_BLOCKS)).drop_columns(["spans"])
    ways_geo = assemble_ways(parsed, num_parts=_parts_for(FIXTURE_BLOCKS))
    out = bbox_overlap_join(ways_geo, num_parts=_parts_for(FIXTURE_BLOCKS))
    write_oracle("way_bboxes_src", oracle_way_bboxes(fixture_table(FIXTURE_BLOCKS)))
    return out


def _knn_join_query(sf_dir: str):
    """Exact k-nearest-neighbour self-join over fixture address points
    (grid-doubling rounds, full candidate side, one cell-keyed exchange per
    round); TRUE SQL oracle: DuckDB O(n²) self-join + row_number window."""
    from osmi_addresses_ray.pipelines.geo_ops import spatial_knn_join

    out = spatial_knn_join(
        _fixture_layers()["osmi_addresses_nodes_with_addresses"],
        num_parts=_parts_for(FIXTURE_BLOCKS),
    )
    _write_spatial_src()
    return out


def _clusters_query(sf_dir: str):
    """Single-linkage radius clustering (radius graph → star-contraction
    connected components); TRUE SQL oracle: recursive-CTE reachability with
    MIN(label) per node."""
    from osmi_addresses_ray.pipelines.geo_ops import spatial_clusters

    out = spatial_clusters(
        _fixture_layers()["osmi_addresses_nodes_with_addresses"],
        num_parts=_parts_for(FIXTURE_BLOCKS),
    )
    _write_spatial_src()
    return out


def _route_dist_query(sf_dir: str):
    """Multi-source weighted shortest paths over the fixture street graph
    (min-plus pregel to TRUE fixpoint); oracle = scalar heapq Dijkstra —
    algorithm-diverse from the engine's relaxation rounds."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.geo_ops import oracle_street_route_dist
    from osmi_addresses_ray.pipelines.geo_ops import street_route_dist
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    parsed = parse_docs(fixture_docs(FIXTURE_BLOCKS)).drop_columns(["spans"])
    ways_geo = assemble_ways(parsed, num_parts=_parts_for(FIXTURE_BLOCKS))
    out = street_route_dist(ways_geo, num_parts=_parts_for(FIXTURE_BLOCKS))
    write_oracle("street_route_dist", oracle_street_route_dist(fixture_table(FIXTURE_BLOCKS)))
    return out


def _bearing_rose_query(sf_dir: str):
    """Per-way 45°-octant bearing rose (integer sign/compare ladder, no
    trig); TRUE SQL oracle: identical CASE ladder over independent segments."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.geo_ops import oracle_highway_segments
    from osmi_addresses_ray.pipelines.geo_ops import segment_bearing_rose
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    parsed = parse_docs(fixture_docs(FIXTURE_BLOCKS)).drop_columns(["spans"])
    ways_geo = assemble_ways(parsed, num_parts=_parts_for(FIXTURE_BLOCKS))
    out = segment_bearing_rose(ways_geo, num_parts=_parts_for(FIXTURE_BLOCKS))
    write_oracle("way_segments_src", oracle_highway_segments(fixture_table(FIXTURE_BLOCKS)))
    return out


def _polygon_audit_query(sf_dir: str):
    """Per-closed-way shape audit (shoelace area2, winding, convexity,
    bbox); TRUE SQL oracle: identical anchored window arithmetic over the
    independent closed-ring vertex lists."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.geo_ops import oracle_closed_way_points
    from osmi_addresses_ray.pipelines.geo_ops import polygon_audit
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    parsed = parse_docs(fixture_docs(FIXTURE_BLOCKS)).drop_columns(["spans"])
    ways_geo = assemble_ways(parsed, num_parts=_parts_for(FIXTURE_BLOCKS))
    out = polygon_audit(ways_geo)
    write_oracle(
        "closed_way_points_src", oracle_closed_way_points(fixture_table(FIXTURE_BLOCKS))
    )
    return out


def _polygon_relate_query(sf_dir: str):
    """DE-9IM-style exact relate over bbox-overlapping closed-ring pairs;
    TRUE SQL oracle: identical integer orientation / on-segment /
    crossing-parity predicates in HUGEINT over the independent ring lists."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.geo_ops import oracle_relate_rings
    from osmi_addresses_ray.pipelines.geo_ops import polygon_relate, relate_augment
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    parsed = parse_docs(fixture_docs(FIXTURE_BLOCKS)).drop_columns(["spans"])
    ways_geo = relate_augment(
        assemble_ways(parsed, num_parts=_parts_for(FIXTURE_BLOCKS))
    )
    out = polygon_relate(ways_geo, num_parts=_parts_for(FIXTURE_BLOCKS))
    write_oracle(
        "relate_rings_src", oracle_relate_rings(fixture_table(FIXTURE_BLOCKS))
    )
    return out


def _geofence_query(sf_dir: str):
    """Geofence entry/exit events (dilated building bboxes × dwell
    trajectories); TRUE SQL oracle: BETWEEN containment join + lag/lead
    window run detection over the independent dwell points and bboxes."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.geo_ops import oracle_dwell_points, oracle_way_bboxes
    from osmi_addresses_ray.pipelines.geo_ops import geofence_transitions
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    parsed = parse_docs(fixture_docs(FIXTURE_BLOCKS)).drop_columns(["spans"])
    ways_geo = assemble_ways(parsed, num_parts=_parts_for(FIXTURE_BLOCKS))
    out = geofence_transitions(ways_geo, num_parts=_parts_for(FIXTURE_BLOCKS))
    write_oracle("dwell_points_src", oracle_dwell_points(fixture_table(FIXTURE_BLOCKS)))
    write_oracle("way_bboxes_src", oracle_way_bboxes(fixture_table(FIXTURE_BLOCKS)))
    return out


def _street_cc_query(sf_dir: str):
    """Connected components of the street graph via star contraction; TRUE
    SQL oracle: recursive-CTE min-label closure over the independent edges."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.geo_ops import oracle_street_edges
    from osmi_addresses_ray.pipelines.geo_ops import street_components
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    parsed = parse_docs(fixture_docs(FIXTURE_BLOCKS)).drop_columns(["spans"])
    ways_geo = assemble_ways(parsed, num_parts=_parts_for(FIXTURE_BLOCKS))
    out = street_components(ways_geo, num_parts=_parts_for(FIXTURE_BLOCKS))
    write_oracle("street_edges_src", oracle_street_edges(fixture_table(FIXTURE_BLOCKS)))
    return out


def _street_lpa_query(sf_dir: str):
    """Synchronous label-propagation communities (4 rounds, min-label
    ties); TRUE SQL oracle: recursive CTE replaying the rounds with a
    GROUP BY + QUALIFY mode over the independent edges."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.geo_ops import oracle_street_edges
    from osmi_addresses_ray.pipelines.geo_ops import street_lpa
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    parsed = parse_docs(fixture_docs(FIXTURE_BLOCKS)).drop_columns(["spans"])
    ways_geo = assemble_ways(parsed, num_parts=_parts_for(FIXTURE_BLOCKS))
    out = street_lpa(ways_geo, rounds=4, num_parts=_parts_for(FIXTURE_BLOCKS))
    write_oracle("street_edges_src", oracle_street_edges(fixture_table(FIXTURE_BLOCKS)))
    return out


def _street_bipartite_query(sf_dir: str):
    """Bipartiteness audit (hop-parity 2-coloring + odd-cycle conflicts);
    TRUE SQL oracle: min-label component closure + bounded recursive BFS
    + parity edge join over the independent edges."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.geo_ops import oracle_street_edges
    from osmi_addresses_ray.pipelines.geo_ops import street_bipartite
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    parsed = parse_docs(fixture_docs(FIXTURE_BLOCKS)).drop_columns(["spans"])
    ways_geo = assemble_ways(parsed, num_parts=_parts_for(FIXTURE_BLOCKS))
    out = street_bipartite(ways_geo, num_parts=_parts_for(FIXTURE_BLOCKS))
    write_oracle("street_edges_src", oracle_street_edges(fixture_table(FIXTURE_BLOCKS)))
    return out


def _street_chains_query(sf_dir: str):
    """Degree-2 chain contraction of the street graph (line merging); TRUE
    SQL oracle: degree counts + recursive-CTE component closure + grouping
    over the independently parsed highway segments."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.geo_ops import oracle_highway_segments
    from osmi_addresses_ray.pipelines.geo_ops import street_chains
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    parsed = parse_docs(fixture_docs(FIXTURE_BLOCKS)).drop_columns(["spans"])
    ways_geo = assemble_ways(parsed, num_parts=_parts_for(FIXTURE_BLOCKS))
    out = street_chains(ways_geo, num_parts=_parts_for(FIXTURE_BLOCKS))
    write_oracle(
        "way_segments_src", oracle_highway_segments(fixture_table(FIXTURE_BLOCKS))
    )
    return out


def _isochrone_query(sf_dir: str):
    """Budget-bounded reachability per seed (service-area primitive); TRUE
    SQL oracle: recursive-CTE Bellman-Ford with the same cap over the
    independently parsed highway segments."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.geo_ops import oracle_highway_segments
    from osmi_addresses_ray.pipelines.geo_ops import isochrone_counts
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    parsed = parse_docs(fixture_docs(FIXTURE_BLOCKS)).drop_columns(["spans"])
    ways_geo = assemble_ways(parsed, num_parts=_parts_for(FIXTURE_BLOCKS))
    out = isochrone_counts(ways_geo, num_parts=_parts_for(FIXTURE_BLOCKS))
    write_oracle(
        "way_segments_src", oracle_highway_segments(fixture_table(FIXTURE_BLOCKS))
    )
    return out


def _turns_query(sf_dir: str):
    """Exact-integer turn classification along the synthesized trajectories
    (cross/dot sign octants — no atan2). TRUE SQL oracle: DuckDB LAG/LEAD
    window over the independently synthesized trajectory points."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.geo_ops import oracle_traj_points
    from osmi_addresses_ray.pipelines.geo_ops import turn_classes
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    parsed = parse_docs(fixture_docs(FIXTURE_BLOCKS)).drop_columns(["spans"])
    ways_geo = assemble_ways(parsed, num_parts=_parts_for(FIXTURE_BLOCKS))
    out = turn_classes(ways_geo, num_parts=_parts_for(FIXTURE_BLOCKS))
    write_oracle("traj_points_src", oracle_traj_points(fixture_table(FIXTURE_BLOCKS)))
    return out


def _speed_outliers_query(sf_dir: str):
    """Per-trajectory displacement median + jump-outlier counts; TRUE SQL
    oracle: lag() diffs + quantile_disc over the independent points."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.geo_ops import oracle_traj_points
    from osmi_addresses_ray.pipelines.geo_ops import traj_speed_outliers
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    parsed = parse_docs(fixture_docs(FIXTURE_BLOCKS)).drop_columns(["spans"])
    ways_geo = assemble_ways(parsed, num_parts=_parts_for(FIXTURE_BLOCKS))
    out = traj_speed_outliers(ways_geo, num_parts=_parts_for(FIXTURE_BLOCKS))
    write_oracle("traj_points_src", oracle_traj_points(fixture_table(FIXTURE_BLOCKS)))
    return out


def _sinuosity_query(sf_dir: str):
    """Per-way L1 sinuosity classes; TRUE SQL oracle: grouped segment sums
    + min/max_by endpoints over the independently parsed segments."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.geo_ops import oracle_highway_segments
    from osmi_addresses_ray.pipelines.geo_ops import way_sinuosity
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    parsed = parse_docs(fixture_docs(FIXTURE_BLOCKS)).drop_columns(["spans"])
    ways_geo = assemble_ways(parsed, num_parts=_parts_for(FIXTURE_BLOCKS))
    out = way_sinuosity(ways_geo)
    write_oracle(
        "way_segments_src", oracle_highway_segments(fixture_table(FIXTURE_BLOCKS))
    )
    return out


def _circuity_query(sf_dir: str):
    """Circuity buckets over the SSSP output; oracle = the same
    unpack/bucket arithmetic over the independent Dijkstra parquet."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.geo_ops import oracle_street_route_dist
    from osmi_addresses_ray.pipelines.geo_ops import route_circuity
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    parsed = parse_docs(fixture_docs(FIXTURE_BLOCKS)).drop_columns(["spans"])
    ways_geo = assemble_ways(parsed, num_parts=_parts_for(FIXTURE_BLOCKS))
    out = route_circuity(ways_geo, num_parts=_parts_for(FIXTURE_BLOCKS))
    write_oracle("street_route_dist", oracle_street_route_dist(fixture_table(FIXTURE_BLOCKS)))
    return out


def _voronoi_query(sf_dir: str):
    """Nearest-facility allocation over the street graph; TRUE SQL oracle:
    per-node argmin (dist, src) over the independent Dijkstra parquet."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.geo_ops import oracle_street_route_dist
    from osmi_addresses_ray.pipelines.geo_ops import network_voronoi
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    parsed = parse_docs(fixture_docs(FIXTURE_BLOCKS)).drop_columns(["spans"])
    ways_geo = assemble_ways(parsed, num_parts=_parts_for(FIXTURE_BLOCKS))
    out = network_voronoi(ways_geo, num_parts=_parts_for(FIXTURE_BLOCKS))
    write_oracle("street_route_dist", oracle_street_route_dist(fixture_table(FIXTURE_BLOCKS)))
    return out


def _mst_query(sf_dir: str):
    """Minimum spanning forest of the street graph (Boruvka); oracle =
    scalar Kruskal under the same (w, a, b) total order."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.geo_ops import oracle_street_mst
    from osmi_addresses_ray.pipelines.geo_ops import street_mst
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    parsed = parse_docs(fixture_docs(FIXTURE_BLOCKS)).drop_columns(["spans"])
    ways_geo = assemble_ways(parsed, num_parts=_parts_for(FIXTURE_BLOCKS))
    out = street_mst(ways_geo, num_parts=_parts_for(FIXTURE_BLOCKS))
    write_oracle("street_mst", oracle_street_mst(fixture_table(FIXTURE_BLOCKS)))
    return out


def _mis_query(sf_dir: str):
    """Maximal independent set (Luby, fixed hash priorities); oracle =
    scalar greedy insertion in the same (priority, id) order."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.geo_ops import oracle_street_mis
    from osmi_addresses_ray.pipelines.geo_ops import street_mis
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    parsed = parse_docs(fixture_docs(FIXTURE_BLOCKS)).drop_columns(["spans"])
    ways_geo = assemble_ways(parsed, num_parts=_parts_for(FIXTURE_BLOCKS))
    out = street_mis(ways_geo, num_parts=_parts_for(FIXTURE_BLOCKS))
    write_oracle("street_mis", oracle_street_mis(fixture_table(FIXTURE_BLOCKS)))
    return out


def _staypoints_query(sf_dir: str):
    """Stay-point detection over dwell-patterned trajectories; TRUE SQL
    oracle: recursive-CTE anchor walk over the independent dwell points."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.geo_ops import oracle_dwell_points
    from osmi_addresses_ray.pipelines.geo_ops import staypoints
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    parsed = parse_docs(fixture_docs(FIXTURE_BLOCKS)).drop_columns(["spans"])
    ways_geo = assemble_ways(parsed, num_parts=_parts_for(FIXTURE_BLOCKS))
    out = staypoints(ways_geo, num_parts=_parts_for(FIXTURE_BLOCKS))
    write_oracle("dwell_points_src", oracle_dwell_points(fixture_table(FIXTURE_BLOCKS)))
    return out


def _hausdorff_query(sf_dir: str):
    """Origin-cell-bucketed pairwise trajectory Hausdorff²; TRUE SQL oracle:
    nested max-of-min aggregation over the independent dwell points."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.geo_ops import oracle_dwell_points
    from osmi_addresses_ray.pipelines.geo_ops import hausdorff_pairs
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    parsed = parse_docs(fixture_docs(FIXTURE_BLOCKS)).drop_columns(["spans"])
    ways_geo = assemble_ways(parsed, num_parts=_parts_for(FIXTURE_BLOCKS))
    out = hausdorff_pairs(ways_geo, num_parts=_parts_for(FIXTURE_BLOCKS))
    write_oracle("dwell_points_src", oracle_dwell_points(fixture_table(FIXTURE_BLOCKS)))
    return out


def _frechet_query(sf_dir: str):
    """Origin-cell-bucketed pairwise discrete Fréchet² (order-aware sibling
    of Hausdorff); TRUE SQL oracle: recursive-CTE minimax DP over
    anti-diagonals of the independent dwell points."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.geo_ops import oracle_dwell_points
    from osmi_addresses_ray.pipelines.geo_ops import frechet_pairs
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    parsed = parse_docs(fixture_docs(FIXTURE_BLOCKS)).drop_columns(["spans"])
    ways_geo = assemble_ways(parsed, num_parts=_parts_for(FIXTURE_BLOCKS))
    out = frechet_pairs(ways_geo, num_parts=_parts_for(FIXTURE_BLOCKS))
    write_oracle("dwell_points_src", oracle_dwell_points(fixture_table(FIXTURE_BLOCKS)))
    return out


def _edr_query(sf_dir: str):
    """Origin-cell-bucketed pairwise EDR (noise-robust edit distance on
    real sequences); TRUE SQL oracle: recursive-CTE min-of-preds DP with
    per-move costs over the independent dwell points."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.geo_ops import oracle_dwell_points
    from osmi_addresses_ray.pipelines.geo_ops import edr_pairs
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    parsed = parse_docs(fixture_docs(FIXTURE_BLOCKS)).drop_columns(["spans"])
    ways_geo = assemble_ways(parsed, num_parts=_parts_for(FIXTURE_BLOCKS))
    out = edr_pairs(ways_geo, num_parts=_parts_for(FIXTURE_BLOCKS))
    write_oracle("dwell_points_src", oracle_dwell_points(fixture_table(FIXTURE_BLOCKS)))
    return out


def _comovement_query(sf_dir: str):
    """Step-aligned co-movement pairs (convoy primitive); TRUE SQL oracle:
    step-equality self-join + HAVING over the independent dwell points."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.geo_ops import oracle_dwell_points
    from osmi_addresses_ray.pipelines.geo_ops import comovement_pairs
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    parsed = parse_docs(fixture_docs(FIXTURE_BLOCKS)).drop_columns(["spans"])
    ways_geo = assemble_ways(parsed, num_parts=_parts_for(FIXTURE_BLOCKS))
    out = comovement_pairs(ways_geo, num_parts=_parts_for(FIXTURE_BLOCKS))
    write_oracle("dwell_points_src", oracle_dwell_points(fixture_table(FIXTURE_BLOCKS)))
    return out


def _hotspot_query(sf_dir: str):
    """Hotspot cells (integer-exact Getis-Ord core); TRUE SQL oracle:
    neighbour self-join + cross-multiplied threshold over the independent
    point source."""
    from osmi_addresses_ray.pipelines.geo_ops import hotspot_nwa

    out = hotspot_nwa(
        _fixture_layers()["osmi_addresses_nodes_with_addresses"],
        num_parts=_parts_for(FIXTURE_BLOCKS),
    )
    _write_spatial_src()
    return out


def _str_pack_query(sf_dir: str):
    """STR R-tree bulk-load leaf packing of the address points; TRUE SQL
    oracle: two row_number windows + integer division over the independent
    point source."""
    from osmi_addresses_ray.pipelines.geo_ops import str_pack_nwa

    out = str_pack_nwa(
        _fixture_layers()["osmi_addresses_nodes_with_addresses"],
        num_parts=_parts_for(FIXTURE_BLOCKS),
    )
    _write_spatial_src()
    return out


def _areal_interp_query(sf_dir: str):
    """Areal interpolation (proportional-overlap zonal reallocation);
    TRUE SQL oracle: the same min-anchored grid + 9/3/3/1 quadrant VALUES
    expansion over the independent point source."""
    from osmi_addresses_ray.pipelines.geo_ops import areal_interp_nwa

    out = areal_interp_nwa(
        _fixture_layers()["osmi_addresses_nodes_with_addresses"],
        num_parts=_parts_for(FIXTURE_BLOCKS),
    )
    _write_spatial_src()
    return out


def _moran_query(sf_dir: str):
    """Moran's I sufficient statistics (rook adjacency over occupied 0.001°
    cells); TRUE SQL oracle: the same z = n·C − T scaling via a cell
    self-join over the independent point source."""
    from osmi_addresses_ray.pipelines.geo_ops import moran_nwa

    out = moran_nwa(
        _fixture_layers()["osmi_addresses_nodes_with_addresses"],
        num_parts=_parts_for(FIXTURE_BLOCKS),
    )
    _write_spatial_src()
    return out


def _hex_bin_query(sf_dir: str):
    """Densest hexagonal bins (exact integer nearest-lattice-center
    assignment); TRUE SQL oracle: the same 4-candidate ladder via a VALUES
    cross join + QUALIFY argmin over the independent point source."""
    from osmi_addresses_ray.pipelines.geo_ops import hex_bin_nwa

    out = hex_bin_nwa(
        _fixture_layers()["osmi_addresses_nodes_with_addresses"],
        num_parts=_parts_for(FIXTURE_BLOCKS),
    )
    _write_spatial_src()
    return out


def _ripley_query(sf_dir: str):
    """Ripley's K cumulative pair counts at 4 ring radii; TRUE SQL oracle:
    brute-force pair join bucketed by the same r² ladder over the
    independent point source."""
    from osmi_addresses_ray.pipelines.geo_ops import ripley_k_nwa

    out = ripley_k_nwa(
        _fixture_layers()["osmi_addresses_nodes_with_addresses"],
        num_parts=_parts_for(FIXTURE_BLOCKS),
    )
    _write_spatial_src()
    return out


def _hilbert_locality_query(sf_dir: str):
    """Hilbert-curve linearization + locality audit vs row-major order;
    TRUE SQL oracle: recursive-CTE xy→d rotate-and-fold walk (16 levels)
    + lag windows over the independent point source."""
    from osmi_addresses_ray.pipelines.geo_ops import hilbert_locality_nwa

    out = hilbert_locality_nwa(
        _fixture_layers()["osmi_addresses_nodes_with_addresses"],
        num_parts=_parts_for(FIXTURE_BLOCKS),
    )
    _write_spatial_src()
    return out


def _spatial_sample_query(sf_dir: str):
    """Spatially-stratified deterministic sample (per-cell top-k by
    multiplicative hash); TRUE SQL oracle: the same integer hash expression
    + row_number over the independent point source."""
    from osmi_addresses_ray.pipelines.geo_ops import spatial_sample_nwa

    out = spatial_sample_nwa(
        _fixture_layers()["osmi_addresses_nodes_with_addresses"],
        num_parts=_parts_for(FIXTURE_BLOCKS),
    )
    _write_spatial_src()
    return out


def _addr_completeness_query(sf_dir: str):
    """Per-postcode address-field completeness audit; TRUE SQL oracle: the
    same CASE ladder over the independent naive-oracle layer rows."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.pipelines.geo_ops import addr_completeness

    out = addr_completeness(
        _fixture_layers()["osmi_addresses_nodes_with_addresses"],
        num_parts=_parts_for(FIXTURE_BLOCKS),
    )
    write_oracle(
        "addr_fields_src",
        _fixture_oracle()["osmi_addresses_nodes_with_addresses"][
            ["street", "houseno", "postcode", "city", "country", "place"]
        ],
    )
    return out


def _od_query(sf_dir: str):
    """OD-matrix flows; TRUE SQL oracle: first/last per trajectory via
    window min/max over the independent trajectory points."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.geo_ops import oracle_traj_points
    from osmi_addresses_ray.pipelines.geo_ops import od_flows
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    parsed = parse_docs(fixture_docs(FIXTURE_BLOCKS)).drop_columns(["spans"])
    ways_geo = assemble_ways(parsed, num_parts=_parts_for(FIXTURE_BLOCKS))
    out = od_flows(ways_geo, num_parts=_parts_for(FIXTURE_BLOCKS))
    write_oracle("traj_points_src", oracle_traj_points(fixture_table(FIXTURE_BLOCKS)))
    return out


def _mm_accuracy_query(sf_dir: str):
    """Map-matching accuracy metric; SQL recomputes the share from the
    scalar-DP oracle parquet (the knn_recall composed-metric family)."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.geo_ops import oracle_map_match
    from osmi_addresses_ray.pipelines.geo_ops import map_match_accuracy
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    parsed = parse_docs(fixture_docs(FIXTURE_BLOCKS)).drop_columns(["spans"])
    ways_geo = assemble_ways(parsed, num_parts=_parts_for(FIXTURE_BLOCKS))
    out = map_match_accuracy(ways_geo, num_parts=_parts_for(FIXTURE_BLOCKS))
    write_oracle("map_match", oracle_map_match(fixture_table(FIXTURE_BLOCKS)))
    return out


def _dbscan_query(sf_dir: str):
    """DBSCAN with deterministic min-pid labels; TRUE SQL oracle: neighbour
    counting + recursive-CTE core reachability + border min-label, all
    recomputed in DuckDB from the independent point source."""
    from osmi_addresses_ray.pipelines.geo_ops import dbscan_nwa

    out = dbscan_nwa(
        _fixture_layers()["osmi_addresses_nodes_with_addresses"],
        num_parts=_parts_for(FIXTURE_BLOCKS),
    )
    _write_spatial_src()
    return out


def _map_match_query(sf_dir: str):
    """HMM map matching (Newson & Krumm 2009 shape, exact-integer min-sum
    Viterbi) of synthesized noisy trajectories onto the fixture street
    network; oracle = scalar python-int candidate sweep + DP in
    oracle/geo_ops.oracle_map_match (no numpy, no engine imports)."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.geo_ops import oracle_map_match
    from osmi_addresses_ray.pipelines.geo_ops import map_match
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    parsed = parse_docs(fixture_docs(FIXTURE_BLOCKS)).drop_columns(["spans"])
    ways_geo = assemble_ways(parsed, num_parts=_parts_for(FIXTURE_BLOCKS))
    out = map_match(ways_geo, num_parts=_parts_for(FIXTURE_BLOCKS))
    write_oracle("map_match", oracle_map_match(fixture_table(FIXTURE_BLOCKS)))
    return out


def _line_simplify_query(sf_dir: str):
    """Douglas–Peucker way simplification with exact integer rational
    comparisons; oracle = an independent RECURSIVE scalar DP over the
    naive-parsed ways."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.geo_ops import oracle_line_simplify
    from osmi_addresses_ray.pipelines.geo_ops import SIMPLIFY_EPS, line_simplify
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    parsed = parse_docs(fixture_docs(FIXTURE_BLOCKS)).drop_columns(["spans"])
    ways_geo = assemble_ways(parsed, num_parts=_parts_for(FIXTURE_BLOCKS))
    out = line_simplify(ways_geo)
    write_oracle(
        "line_simplify", oracle_line_simplify(fixture_table(FIXTURE_BLOCKS), SIMPLIFY_EPS)
    )
    return out


def _vw_simplify_query(sf_dir: str):
    """Visvalingam–Whyatt way simplification (min effective-area removal,
    exact int64 cross products); oracle = independent scalar remove-min
    list replay over the naive-parsed ways."""
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.geo_ops import oracle_vw_simplify
    from osmi_addresses_ray.pipelines.geo_ops import VW_MIN_AREA2, vw_line_simplify
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    parsed = parse_docs(fixture_docs(FIXTURE_BLOCKS)).drop_columns(["spans"])
    ways_geo = assemble_ways(parsed, num_parts=_parts_for(FIXTURE_BLOCKS))
    out = vw_line_simplify(ways_geo)
    write_oracle(
        "vw_simplify", oracle_vw_simplify(fixture_table(FIXTURE_BLOCKS), VW_MIN_AREA2)
    )
    return out


def _hulls_query(sf_dir: str):
    """Per-cell convex hull summaries (mergeable hull-of-hulls combiner);
    oracle = scalar python-int monotone chain over the independent point
    derivation."""
    import numpy as np

    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.geo_ops import oracle_convex_hulls
    from osmi_addresses_ray.pipelines.geo_ops import (
        HULL_CELL_UNITS,
        QUANT,
        _CENTROID_PID_BASE,
        convex_hull_cells,
    )

    out = convex_hull_cells(
        _fixture_layers()["osmi_addresses_nodes_with_addresses"],
        num_parts=_parts_for(FIXTURE_BLOCKS),
    )
    onwa = _fixture_oracle()["osmi_addresses_nodes_with_addresses"]
    onwa = onwa[onwa["is_ip"] == 0]
    pts = (
        onwa.assign(
            pid=np.where(
                onwa["node_id"].isna(),
                _CENTROID_PID_BASE + onwa["way_id"],
                onwa["node_id"],
            ).astype("int64"),
            ix=np.round(onwa["lon"] * QUANT).astype("int64"),
            iy=np.round(onwa["lat"] * QUANT).astype("int64"),
        )[["pid", "ix", "iy"]]
        .drop_duplicates()
    )
    write_oracle("convex_hull_cells", oracle_convex_hulls(pts, HULL_CELL_UNITS))
    return out


def _segment_xing_query(sf_dir: str):
    """Exact segment-intersection join (map-overlay primitive): mapped way
    segments ∪ per-address service-drop chords, all properly-crossing pairs
    emitted once from a cell-bucketed sweep. TRUE SQL oracle: DuckDB O(n²)
    self-join over the independently derived segment union with the same
    strict int orientation predicate (HUGEINT — overflow-safe by width where
    the engine uses a guarded int64)."""
    import numpy as np

    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.geo_ops import oracle_overlay_segments
    from osmi_addresses_ray.pipelines.geo_ops import (
        DROP_UNITS,
        QUANT,
        _CENTROID_PID_BASE,
        crossing_overlay,
    )
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    parsed = parse_docs(fixture_docs(FIXTURE_BLOCKS)).drop_columns(["spans"])
    ways_geo = assemble_ways(parsed, num_parts=_parts_for(FIXTURE_BLOCKS))
    out = crossing_overlay(
        _fixture_layers()["osmi_addresses_nodes_with_addresses"],
        ways_geo,
        num_parts=_parts_for(FIXTURE_BLOCKS),
    )
    onwa = _fixture_oracle()["osmi_addresses_nodes_with_addresses"]
    onwa = onwa[onwa["is_ip"] == 0]
    pts = (
        onwa.assign(
            pid=np.where(
                onwa["node_id"].isna(),
                _CENTROID_PID_BASE + onwa["way_id"],
                onwa["node_id"],
            ).astype("int64"),
            ix=np.round(onwa["lon"] * QUANT).astype("int64"),
            iy=np.round(onwa["lat"] * QUANT).astype("int64"),
        )[["pid", "ix", "iy"]]
        .drop_duplicates()
    )
    write_oracle(
        "segments_src",
        oracle_overlay_segments(fixture_table(FIXTURE_BLOCKS), pts, DROP_UNITS),
    )
    return out


def _zonal_query(sf_dir: str):
    """Zonal statistics: entrance points per building polygon. SQL recounts
    from the independent PIP oracle pairs (true SQL oracle)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from osmi_addresses_ray.constants import tag_col
    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.layers import oracle_pip
    from osmi_addresses_ray.pipelines.raster import zonal_stats
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    parsed = parse_docs(fixture_docs(FIXTURE_BLOCKS))
    ways_geo = assemble_ways(parsed, num_parts=_parts_for(FIXTURE_BLOCKS))

    def pts(t: pa.Table) -> pa.Table:
        is_node = pc.equal(t["etype"], "node")
        ent = pc.or_(
            pc.is_valid(t[tag_col("entrance")]),
            pc.fill_null(pc.equal(t[tag_col("building")], "entrance"), False),
        )
        s = t.filter(pc.and_(is_node, ent))
        return pa.table(
            {
                "point_id": s["osm_id"].combine_chunks(),
                "lon": s["lon"].combine_chunks(),
                "lat": s["lat"].combine_chunks(),
            }
        )

    def polys(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(pc.is_valid(t[tag_col("building")]), t["is_closed"]), t["nonzero"]
        )
        s = t.filter(keep)
        return pa.table(
            {
                "poly_id": s["way_id"].combine_chunks(),
                "xs": s["xs"].combine_chunks(),
                "ys": s["ys"].combine_chunks(),
            }
        )

    out = (
        zonal_stats(
            parsed.map_batches(pts, batch_format="pyarrow"),
            ways_geo.map_batches(polys, batch_format="pyarrow"),
            num_parts=_parts_for(FIXTURE_BLOCKS),
        )
        .to_pandas()
        .sort_values("poly_id")
        .reset_index(drop=True)
    )
    write_oracle("zonal_src", oracle_pip(fixture_table(FIXTURE_BLOCKS)))
    return out


def _polygonize_query(sf_dir: str):
    """Raster→vector: 4-connected components of the nwa raster. Oracle =
    naive BFS flood fill over the independently-computed point raster."""
    import numpy as np

    from osmi_addresses_ray.oracle import write_oracle
    from osmi_addresses_ray.oracle.raster_ops import label_components, rasterize_cells
    from osmi_addresses_ray.pipelines.raster import polygonize, rasterize_points

    raster = rasterize_points(
        _fixture_layers()["osmi_addresses_nodes_with_addresses"],
        x0=_RASTER_X0, y0=_RASTER_Y0, res=_RASTER_RES,
    )
    cells, _comps = polygonize(raster, threshold=1, x0=_RASTER_X0, y0=_RASTER_Y0, res=_RASTER_RES)
    out = cells.to_pandas().sort_values(["ix", "iy"]).reset_index(drop=True)

    nwa = _fixture_oracle()["osmi_addresses_nodes_with_addresses"]
    ix, iy = rasterize_cells(
        nwa["lon"].to_numpy(), nwa["lat"].to_numpy(), _RASTER_X0, _RASTER_Y0, _RASTER_RES
    )
    uniq = sorted(set(zip(ix.tolist(), iy.tolist())))
    odf = label_components(uniq).sort_values(["ix", "iy"]).reset_index(drop=True)
    write_oracle("polygonize_nwa", odf)
    return out


def _fdiv(x, d) -> str:
    """DuckDB floor-division matching numpy/python `//` on NEGATIVE
    dividends: DuckDB's `//` truncates toward zero (-7//2 = -3) while the
    engine floors (-4). Subtracting the non-negative remainder first makes
    truncation equal floor, exactly, in pure integer arithmetic at any
    magnitude (no double round-trip). `d` must be a positive expression."""
    return f"((({x}) - (((({x}) % ({d})) + ({d})) % ({d}))) // ({d}))"


# hex_bins lattice expressions, composed once so the row index, parity test
# and column index all share the SAME floor-division row (negative iy safe)
_HEX_R = f"({_fdiv('iy', 8660)} + dr)"
_HEX_PAR = f"((({_HEX_R}) % 2) + 2) % 2 = 1"
_HEX_OFF = f"CASE WHEN {_HEX_PAR} THEN 5000 ELSE 0 END"
_HEX_Q = f"({_fdiv('ix - (' + _HEX_OFF + ')', 10000)} + dq)"


def oracle_sql() -> dict[str, str]:
    return {
        # chained exact quantiles: both med and mad are REAL data values
        # (quantile_disc rule), so the hash match needs no float tolerance
        # robust means from exact integer cents: t = n // 10, trimmed =
        # ranks (t, n-t], winsorized clamps the tails to the boundary ranks;
        # ONE final division each + round(6) is bit-identical
        # Theil-Sen: median pairwise slope over the cap lowest-orderkey
        # orders per nation; same-day pairs excluded; ONE IEEE division
        # per slope and DuckDB's own median fold
        "theil_sen_trend": """
            WITH o AS (SELECT o_orderkey, o_custkey,
                              datediff('day', DATE '1970-01-01',
                                       o_orderdate)::BIGINT AS x,
                              CAST(floor(o_totalprice * 100 + 0.5)
                                   AS BIGINT) AS y
                       FROM orders),
            n AS (SELECT o.o_orderkey AS ok, c.c_nationkey AS nk, x, y
                  FROM o JOIN customer c ON o.o_custkey = c.c_custkey),
            r AS (SELECT *, row_number() OVER (PARTITION BY nk
                                               ORDER BY ok) AS rn FROM n),
            s AS (SELECT * FROM r WHERE rn <= 500),
            p AS (SELECT a.nk,
                         (b.y - a.y)::DOUBLE / (b.x - a.x)::DOUBLE AS slope
                  FROM s a JOIN s b
                    ON a.nk = b.nk AND a.ok < b.ok AND a.x != b.x)
            SELECT nk AS nationkey, count(*)::BIGINT AS n_pairs,
                   median(slope) AS slope
            FROM p GROUP BY nk ORDER BY nationkey
        """,
        # Efraimidis-Spirakis weighted sampling, integer analogue: priority =
        # min of w multiplicative-hash draws (more weight -> stochastically
        # smaller min); per-ROW list expression because the synthetic
        # lineitem has duplicate (orderkey, linenumber) keys — duplicates
        # are identical rows, so the LIMIT boundary stays deterministic
        "weighted_sample": """
            WITH w AS (SELECT l_orderkey, l_linenumber::BIGINT AS l_linenumber,
                              least(l_quantity::BIGINT, 64) AS wt,
                              (l_orderkey*8 + l_linenumber) % 1000003 AS keymod
                       FROM lineitem),
            p AS (SELECT l_orderkey, l_linenumber, wt,
                         list_min(list_transform(range(0, wt),
                             j -> ((((keymod + j*10007 + 1) * 2654435761)
                                    % 4294967296 % 999983) * 2654435761)
                                  % 4294967296)) AS priority
                  FROM w)
            SELECT l_orderkey, l_linenumber, wt, priority FROM p
            ORDER BY priority, l_orderkey, l_linenumber LIMIT 200
        """,
        # JSON field extraction: one shared regexp spec, exact integer
        # aggregates; groups with no numeric k pin min/max to 0
        "q_props_extract": """
            WITH t AS (SELECT event_type,
                              TRY_CAST(regexp_extract(props,
                                  '"k"\\s*:\\s*(-?[0-9]+)', 1) AS BIGINT) AS k
                       FROM events)
            SELECT event_type,
                   count(*)::BIGINT AS n,
                   count(*) FILTER (k IS NULL)::BIGINT AS n_missing,
                   COALESCE(sum(k), 0)::BIGINT AS sum_k,
                   COALESCE(min(k), 0)::BIGINT AS min_k,
                   COALESCE(max(k), 0)::BIGINT AS max_k
            FROM t GROUP BY event_type ORDER BY event_type
        """,
        # weighted exact quantiles: distinct-value cumulative weights, exact
        # cross-multiplied threshold (100·cum >= q·W), all integer cents
        "q_weighted_quantiles": """
            WITH t AS (SELECT l_returnflag AS rf,
                              CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c,
                              CAST(l_quantity AS BIGINT) AS w
                       FROM lineitem),
            d AS (SELECT rf, c, sum(w)::BIGINT AS w FROM t GROUP BY rf, c),
            cw AS (SELECT rf, c,
                          (sum(w) OVER (PARTITION BY rf ORDER BY c))::BIGINT AS cum
                   FROM d),
            tot AS (SELECT rf, sum(w)::BIGINT AS tw FROM d GROUP BY rf)
            SELECT tot.rf AS l_returnflag, tot.tw AS total_w,
                   (SELECT min(c) FROM cw WHERE cw.rf = tot.rf
                       AND 100 * cw.cum >= 25 * tot.tw)::BIGINT AS p25,
                   (SELECT min(c) FROM cw WHERE cw.rf = tot.rf
                       AND 100 * cw.cum >= 50 * tot.tw)::BIGINT AS p50,
                   (SELECT min(c) FROM cw WHERE cw.rf = tot.rf
                       AND 100 * cw.cum >= 75 * tot.tw)::BIGINT AS p75,
                   (SELECT min(c) FROM cw WHERE cw.rf = tot.rf
                       AND 100 * cw.cum >= 90 * tot.tw)::BIGINT AS p90,
                   (SELECT min(c) FROM cw WHERE cw.rf = tot.rf
                       AND 100 * cw.cum >= 99 * tot.tw)::BIGINT AS p99
            FROM tot ORDER BY l_returnflag
        """,
        "q_trimmed_mean": """
            WITH v AS (SELECT l_returnflag AS f,
                              CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS c
                       FROM lineitem),
            r AS (SELECT f, c,
                         row_number() OVER (PARTITION BY f ORDER BY c) AS rnk,
                         count(*) OVER (PARTITION BY f) AS n
                  FROM v),
            a AS (SELECT f, max(n) AS n,
                         sum(CASE WHEN rnk > n // 10 AND rnk <= n - n // 10
                                  THEN c END)::BIGINT AS tsum,
                         sum(CASE WHEN rnk > n // 10 AND rnk <= n - n // 10
                                  THEN 1 ELSE 0 END)::BIGINT AS tkept,
                         max(CASE WHEN rnk = n // 10 + 1 THEN c END) AS v_lo,
                         max(CASE WHEN rnk = n - n // 10 THEN c END) AS v_hi
                  FROM r GROUP BY f)
            SELECT f AS l_returnflag, n,
                   round(tsum / (100.0 * tkept), 6) AS trimmed_mean,
                   round((tsum + (n // 10) * v_lo + (n // 10) * v_hi)
                         / (100.0 * n), 6) AS winsorized_mean
            FROM a ORDER BY 1
        """,
        # grouped z-score normalization: exact integer cents in, ONE double
        # division per moment, 4-decimal rounding (sum-order drift ~1e-13);
        # degenerate groups (sd < 1e-9) emit 0.0 on both sides
        # full outer join of the two hourly series; -1 marks the absent side
        "q_full_outer_hours": """
            WITH c AS (SELECT date_trunc('hour', ts) AS hr, count(*)::BIGINT AS n
                       FROM events WHERE event_type = 'click' GROUP BY 1),
            v AS (SELECT date_trunc('hour', ts) AS hr, count(*)::BIGINT AS n
                  FROM events WHERE event_type = 'view' GROUP BY 1)
            SELECT coalesce(c.hr, v.hr) AS hr,
                   coalesce(c.n, -1)::BIGINT AS n_click,
                   coalesce(v.n, -1)::BIGINT AS n_view
            FROM c FULL OUTER JOIN v ON c.hr = v.hr
            ORDER BY hr
        """,
        # exact integer sufficient statistics per group (moments to order 4
        # of quantity + the quantity·centi-discount cross-moment)
        "q_group_moments": """
            SELECT l_returnflag,
                   count(*)::BIGINT AS n,
                   sum(q)::BIGINT AS s1,
                   sum(q * q)::BIGINT AS s2,
                   sum(q * q * q)::BIGINT AS s3,
                   sum(q * q * q * q)::BIGINT AS s4,
                   sum(q * d)::BIGINT AS sqd
            FROM (SELECT l_returnflag,
                         CAST(l_quantity AS BIGINT) AS q,
                         CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d
                  FROM lineitem)
            GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        # FD profile: per candidate X -> Y, distinct determinants and the
        # count mapping to >= 2 distinct dependents (0 violations = holds)
        "fd_profile": """
            WITH c1 AS (SELECT 'lineitem.l_orderkey' AS det,
                               'lineitem.l_suppkey' AS dep,
                               count(*)::BIGINT AS n_keys,
                               sum(CASE WHEN d >= 2 THEN 1 ELSE 0 END)::BIGINT
                                   AS n_violations
                        FROM (SELECT l_orderkey,
                                     count(DISTINCT l_suppkey)::BIGINT AS d
                              FROM lineitem GROUP BY 1)),
            c2 AS (SELECT 'lineitem.l_partkey', 'lineitem.l_suppkey',
                          count(*)::BIGINT,
                          sum(CASE WHEN d >= 2 THEN 1 ELSE 0 END)::BIGINT
                   FROM (SELECT l_partkey,
                                count(DISTINCT l_suppkey)::BIGINT AS d
                         FROM lineitem GROUP BY 1)),
            c3 AS (SELECT 'lineitem.l_suppkey', 'lineitem.l_partkey',
                          count(*)::BIGINT,
                          sum(CASE WHEN d >= 2 THEN 1 ELSE 0 END)::BIGINT
                   FROM (SELECT l_suppkey,
                                count(DISTINCT l_partkey)::BIGINT AS d
                         FROM lineitem GROUP BY 1)),
            c4 AS (SELECT 'orders.o_custkey', 'orders.o_orderpriority',
                          count(*)::BIGINT,
                          sum(CASE WHEN d >= 2 THEN 1 ELSE 0 END)::BIGINT
                   FROM (SELECT o_custkey,
                                count(DISTINCT o_orderpriority)::BIGINT AS d
                         FROM orders GROUP BY 1)),
            c5 AS (SELECT 'orders.o_orderkey', 'orders.o_custkey',
                          count(*)::BIGINT,
                          sum(CASE WHEN d >= 2 THEN 1 ELSE 0 END)::BIGINT
                   FROM (SELECT o_orderkey,
                                count(DISTINCT o_custkey)::BIGINT AS d
                         FROM orders GROUP BY 1)),
            allc AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2
                     UNION ALL SELECT * FROM c3 UNION ALL SELECT * FROM c4
                     UNION ALL SELECT * FROM c5)
            SELECT det, dep, n_keys, n_violations,
                   (CASE WHEN n_violations = 0 THEN 1 ELSE 0 END)::BIGINT
                       AS holds
            FROM allc ORDER BY det, dep
        """,
        # gravity-model trade flows: exact centicent revenue
        # price_cents*(100-disc_pct) per nation pair + row/col/grand totals
        "trade_gravity": """
            WITH rev AS (
                SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
                       sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                           * (100 - CAST(floor(l_discount * 100 + 0.5)
                                         AS BIGINT)))::BIGINT AS obs_cc
                FROM lineitem l
                JOIN orders o ON o.o_orderkey = l.l_orderkey
                JOIN customer c ON c.c_custkey = o.o_custkey
                JOIN nation cn ON cn.n_nationkey = c.c_nationkey
                JOIN supplier s ON s.s_suppkey = l.l_suppkey
                JOIN nation sn ON sn.n_nationkey = s.s_nationkey
                GROUP BY 1, 2),
            r AS (SELECT cust_nation, sum(obs_cc)::BIGINT AS row_cc
                  FROM rev GROUP BY 1),
            c2 AS (SELECT supp_nation, sum(obs_cc)::BIGINT AS col_cc
                   FROM rev GROUP BY 1),
            t AS (SELECT sum(obs_cc)::BIGINT AS total_cc FROM rev)
            SELECT rev.cust_nation, rev.supp_nation, rev.obs_cc,
                   r.row_cc, c2.col_cc, t.total_cc
            FROM rev JOIN r USING (cust_nation)
                     JOIN c2 USING (supp_nation) CROSS JOIN t
            ORDER BY cust_nation, supp_nation
        """,
        # bloom FPR audit: the exact splitmix64 + Kirsch-Mitzenmacher spec
        # replayed in HUGEINT mod-2^64 arithmetic; a probe passes iff all 4
        # of its bit indexes appear in the member-generated index set
        "bloom_fpr_audit": """
            WITH members AS (SELECT DISTINCT o_custkey AS k FROM orders),
            probes AS (SELECT c_custkey AS k FROM customer),
            ks AS (SELECT DISTINCT k FROM
                   (SELECT k FROM members UNION ALL SELECT k FROM probes)),
            z0 AS (SELECT k, (k::HUGEINT + 11400714819323198485::HUGEINT)
                             % 18446744073709551616::HUGEINT AS x FROM ks),
            -- a*b mod 2^64 split into 32-bit halves (a 64x64 HUGEINT
            -- multiply overflows INT128): ((a_hi*b mod 2^32)<<32 + a_lo*b)
            y1 AS (SELECT k, xor(x::UBIGINT, (x // 1073741824)::UBIGINT)
                             ::HUGEINT AS a FROM z0),
            z1 AS (SELECT k,
                          (((a // 4294967296) * 13787848793156543929::HUGEINT
                            % 4294967296) * 4294967296
                           + (a % 4294967296) * 13787848793156543929::HUGEINT)
                          % 18446744073709551616::HUGEINT AS x FROM y1),
            y2 AS (SELECT k, xor(x::UBIGINT, (x // 134217728)::UBIGINT)
                             ::HUGEINT AS a FROM z1),
            z2 AS (SELECT k,
                          (((a // 4294967296) * 10723151780598845931::HUGEINT
                            % 4294967296) * 4294967296
                           + (a % 4294967296) * 10723151780598845931::HUGEINT)
                          % 18446744073709551616::HUGEINT AS x FROM y2),
            z3 AS (SELECT k, xor(x::UBIGINT, (x // 2147483648)::UBIGINT)
                             ::HUGEINT AS z FROM z2),
            h AS (SELECT k, (z % 4294967296)::BIGINT AS h1,
                         ((z // 4294967296) - ((z // 4294967296) % 2) + 1)
                             ::BIGINT AS h2
                  FROM z3),
            i AS (SELECT unnest(range(0, 4))::BIGINT AS i),
            idx AS (SELECT h.k, ((h.h1 + i.i * h.h2) % 1048576) AS idx
                    FROM h CROSS JOIN i),
            bits AS (SELECT DISTINCT idx.idx
                     FROM idx JOIN members m ON m.k = idx.k),
            pass AS (SELECT p.k
                     FROM probes p JOIN idx ON idx.k = p.k
                     LEFT JOIN bits b ON b.idx = idx.idx
                     GROUP BY p.k HAVING count(b.idx) = 4)
            SELECT 1048576::BIGINT AS m_bits, 4::BIGINT AS k_hashes,
                   (SELECT count(*) FROM probes)::BIGINT AS n_probes,
                   (SELECT count(*) FROM members)::BIGINT AS n_members,
                   (SELECT count(*) FROM pass)::BIGINT AS n_pass,
                   ((SELECT count(*) FROM pass)
                    - (SELECT count(*) FROM members))::BIGINT AS n_fp,
                   (SELECT count(*) FROM bits)::BIGINT AS bits_set
        """,
        # full American Soundex as a recursive character state machine:
        # prev carries the last letter's code (h/w transparent via d = -1,
        # vowels reset to 0), digits append iff 1..6 and ≠ prev, pad to 4
        "soundex_parts": """
            WITH RECURSIVE words AS (
                SELECT lower(split_part(p_name, ' ', 1)) AS w FROM part
            ),
            u AS (SELECT DISTINCT w FROM words WHERE length(w) > 0),
            rec(w, pos, prev, acc) AS (
                SELECT w, 1,
                       CASE WHEN substr(w, 1, 1) IN ('b','f','p','v') THEN 1
                            WHEN substr(w, 1, 1) IN
                                 ('c','g','j','k','q','s','x','z') THEN 2
                            WHEN substr(w, 1, 1) IN ('d','t') THEN 3
                            WHEN substr(w, 1, 1) = 'l' THEN 4
                            WHEN substr(w, 1, 1) IN ('m','n') THEN 5
                            WHEN substr(w, 1, 1) = 'r' THEN 6
                            WHEN substr(w, 1, 1) IN ('h','w') THEN -1
                            ELSE 0 END,
                       upper(substr(w, 1, 1))
                FROM u
                UNION ALL
                SELECT w, pos + 1,
                       CASE WHEN d = -1 THEN prev ELSE d END,
                       CASE WHEN d >= 1 AND d <> prev AND length(acc) < 4
                            THEN acc || CAST(d AS VARCHAR) ELSE acc END
                FROM (
                    SELECT r.w, r.pos, r.prev, r.acc,
                           CASE WHEN c IN ('b','f','p','v') THEN 1
                                WHEN c IN ('c','g','j','k','q','s','x','z')
                                     THEN 2
                                WHEN c IN ('d','t') THEN 3
                                WHEN c = 'l' THEN 4
                                WHEN c IN ('m','n') THEN 5
                                WHEN c = 'r' THEN 6
                                WHEN c IN ('h','w') THEN -1
                                ELSE 0 END AS d
                    FROM (SELECT rec.*, substr(rec.w, rec.pos + 1, 1) AS c
                          FROM rec WHERE rec.pos < length(rec.w)) r
                )
            ),
            enc AS (SELECT w, substr(acc || '000', 1, 4) AS soundex
                    FROM rec
                    QUALIFY row_number() OVER (PARTITION BY w
                                               ORDER BY pos DESC) = 1)
            SELECT e.soundex, count(*)::BIGINT AS n
            FROM words JOIN enc e USING (w)
            GROUP BY 1 ORDER BY 1
        """,
        # market-basket pair supports: orders as baskets, distinct parts as
        # items; exact supports, boundary ties by (part_a, part_b)
        "assoc_rules": """
            WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                        FROM lineitem),
            n AS (SELECT count(DISTINCT o)::BIGINT AS n_orders FROM op),
            sup AS (SELECT p, count(*)::BIGINT AS s FROM op GROUP BY p),
            pairs AS (SELECT a.p AS pa, b.p AS pb, count(*)::BIGINT AS s_ab
                      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
                      GROUP BY 1, 2)
            SELECT pa AS part_a, pb AS part_b, s_ab AS support_ab,
                   sa.s AS support_a, sb.s AS support_b, n.n_orders
            FROM pairs JOIN sup sa ON sa.p = pa
                       JOIN sup sb ON sb.p = pb CROSS JOIN n
            ORDER BY s_ab DESC, pa, pb LIMIT 25
        """,
        # Benford first-digit audit: leading digit of integer cents via
        # VARCHAR substr (cents > 0 always has a nonzero lead digit); the
        # expected ppm shares are the SAME fixed round(log10(1+1/d)*1e6)
        # literals the engine compiles in — no log evaluated at query time
        "benford_audit": """
            WITH c AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                              AS cents
                       FROM orders),
            d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
                         AS digit
                  FROM c WHERE cents > 0),
            h AS (SELECT digit, count(*)::BIGINT AS n FROM d GROUP BY digit),
            e(digit, exp_ppm) AS (VALUES (1, 301030), (2, 176091), (3, 124939),
                                         (4, 96910), (5, 79181), (6, 66947),
                                         (7, 57992), (8, 51153), (9, 45757)),
            t AS (SELECT sum(n)::BIGINT AS total FROM h)
            SELECT h.digit, h.n, e.exp_ppm::BIGINT AS exp_ppm,
                   (h.n * 1000000 // t.total)::BIGINT AS obs_ppm,
                   abs(h.n * 1000000 // t.total - e.exp_ppm)::BIGINT AS dev_ppm
            FROM h JOIN e ON e.digit = h.digit CROSS JOIN t
            ORDER BY h.digit
        """,
        "q_zscore_orders": """
            WITH v AS (SELECT o_orderkey, o_orderpriority,
                              CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                                  / 100.0 AS val
                       FROM orders),
            g AS (SELECT o_orderpriority, count(*)::BIGINT AS n,
                         sum(val) AS s, sum(val * val) AS ss
                  FROM v GROUP BY 1),
            m AS (SELECT o_orderpriority, s / n AS mean,
                         sqrt(greatest(ss / n - (s / n) * (s / n), 0.0)) AS sd
                  FROM g)
            SELECT v.o_orderkey, v.o_orderpriority,
                   CASE WHEN m.sd < 1e-9 THEN 0.0
                        ELSE round((v.val - m.mean) / m.sd, 4) + 0.0 END AS z
            FROM v JOIN m USING (o_orderpriority)
            ORDER BY v.o_orderkey
        """,
        "q_mad_priority": """
            WITH m AS (
                SELECT o_orderpriority, quantile_disc(o_totalprice, 0.5) AS med
                FROM orders GROUP BY o_orderpriority)
            SELECT o.o_orderpriority,
                   max(m.med) AS med,
                   quantile_disc(abs(o.o_totalprice - m.med), 0.5) AS mad
            FROM orders o JOIN m USING (o_orderpriority)
            GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
        """,
        # 2-D skyline (maximize price, minimize date); a row survives iff no
        # other row weakly dominates it with one strict inequality
        "pareto_orders": """
            SELECT o_orderkey, o_totalprice, o_orderdate FROM orders o
            WHERE NOT EXISTS (
                SELECT 1 FROM orders d
                WHERE d.o_totalprice >= o.o_totalprice
                  AND d.o_orderdate <= o.o_orderdate
                  AND (d.o_totalprice > o.o_totalprice
                       OR d.o_orderdate < o.o_orderdate))
            ORDER BY o_orderkey
        """,
        # exact-integer second moments: both sides quantize with the SAME
        # sign-safe fixed-point rule, so integer sums match bit-for-bit in
        # any addition order (1-based subscripts on both sides)
        "embedding_covariance": """
            WITH q AS (
                SELECT vec_id,
                       generate_subscripts(embedding, 1) AS i,
                       CAST(floor(unnest(embedding)::DOUBLE * 1000000.0 + 0.5)
                            AS BIGINT) AS qx
                FROM embeddings)
            SELECT a.i::BIGINT AS i, b.i::BIGINT AS j,
                   count(*)::BIGINT AS n,
                   sum(a.qx)::BIGINT AS sum_qi,
                   sum(b.qx)::BIGINT AS sum_qj,
                   sum(a.qx * b.qx)::BIGINT AS sum_qiqj
            FROM q a JOIN q b USING (vec_id)
            GROUP BY a.i, b.i ORDER BY i, j
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty,
                   round(sum(l_extendedprice), 4) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate < TIMESTAMP '1998-09-01'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q_filter_high_value": """
            SELECT o_orderkey, o_totalprice, o_orderstatus
            FROM orders WHERE o_totalprice > 400000.0
            ORDER BY o_orderkey
        """,
        "q_join_orders_customers": """
            SELECT c_mktsegment,
                   round(sum(o_totalprice), 4) AS revenue,
                   count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
        "q_top_orders": """
            SELECT o_orderkey, o_totalprice, o_orderdate
            FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC
            LIMIT 10
        """,
        "q_supplier_part_join": """
            SELECT p_brand,
                   round(sum(l_extendedprice), 4) AS revenue,
                   count(*) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand ORDER BY p_brand
        """,
        "q_distinct_event_types": """
            SELECT DISTINCT event_type FROM events ORDER BY event_type
        """,
        "q_events_hourly": """
            SELECT event_type,
                   date_trunc('hour', ts) AS window_start,
                   count(*) AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM events
            GROUP BY event_type, date_trunc('hour', ts)
            ORDER BY event_type, window_start
        """,
        "q_nation_region_join": """
            SELECT n_nationkey, n_name, n_regionkey, r_name
            FROM nation JOIN region ON n_regionkey = r_regionkey
            ORDER BY n_nationkey
        """,
        # as-of join: latest 'view' of the same user with view.ts <= click.ts
        # (inner; ties on ts -> larger event_id). The window formulation is
        # deliberately ASOF-free so the tie-break is explicit and matches the
        # engine's lexsort bit-for-bit.
        "asof_click_view": """
            WITH c AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'click'),
                 v AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'view'),
                 j AS (SELECT c.event_id, c.user_id, c.ts,
                              v.event_id AS view_event_id, v.ts AS view_ts,
                              epoch_us(c.ts) - epoch_us(v.ts) AS lag_us,
                              ROW_NUMBER() OVER (
                                  PARTITION BY c.event_id
                                  ORDER BY v.ts DESC, v.event_id DESC) AS rn
                       FROM c JOIN v
                         ON c.user_id = v.user_id AND v.ts <= c.ts)
            SELECT event_id, user_id, ts, view_event_id, view_ts, lag_us
            FROM j WHERE rn = 1 ORDER BY event_id
        """,
        # conversion-lag order statistics: the asof window SQL composed
        # with quantile_disc (same ceil(p*n)-1 element the binned path picks)
        "conversion_lag_quantiles": """
            WITH c AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'click'),
                 v AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'view'),
                 j AS (SELECT c.event_id,
                              epoch_us(c.ts) - epoch_us(v.ts) AS lag_us,
                              ROW_NUMBER() OVER (
                                  PARTITION BY c.event_id
                                  ORDER BY v.ts DESC, v.event_id DESC) AS rn
                       FROM c JOIN v
                         ON c.user_id = v.user_id AND v.ts <= c.ts),
                 l AS (SELECT lag_us FROM j WHERE rn = 1)
            SELECT count(*)::BIGINT AS n,
                   quantile_disc(lag_us, 0.25)::BIGINT AS p25,
                   quantile_disc(lag_us, 0.5)::BIGINT AS p50,
                   quantile_disc(lag_us, 0.75)::BIGINT AS p75,
                   quantile_disc(lag_us, 0.9)::BIGINT AS p90,
                   max(lag_us)::BIGINT AS max_lag
            FROM l
        """,
        # gap-based session windows (gap > 30 min starts a new session);
        # per-user 1-based session index, ordering ties broken by event_id
        "session_windows": """
            WITH o AS (
                SELECT user_id, event_id, ts, value,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                    > 30 * 60 * 1000000
                            THEN 1 ELSE 0 END AS brk
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            s AS (
                SELECT user_id, ts, value,
                       SUM(brk) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sid
                FROM o
            )
            SELECT user_id, sid::BIGINT AS session_id,
                   min(ts) AS session_start, max(ts) AS session_end,
                   count(*)::BIGINT AS n_events,
                   round(sum(value), 6) AS sum_value
            FROM s GROUP BY user_id, sid ORDER BY user_id, session_id
        """,
        # sessionized journey strings: same break rule as session_windows,
        # ordered string agg per session
        "session_paths": """
            WITH o AS (
                SELECT user_id, event_id, ts, event_type,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                    > 30 * 60 * 1000000
                            THEN 1 ELSE 0 END AS brk
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            s AS (
                SELECT user_id, event_id, ts, event_type,
                       SUM(brk) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sid
                FROM o
            )
            SELECT user_id, sid::BIGINT AS session_id,
                   string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
                   count(*)::BIGINT AS n_events
            FROM s GROUP BY user_id, sid ORDER BY user_id, session_id
        """,
        # closed RANGE frame: equal-ts peers and the boundary instant are in
        # the window on BOTH sides (searchsorted left/right mirrors RANGE)
        "sliding_window_counts": """
            SELECT event_id,
                   count(*) OVER w::BIGINT AS n_window,
                   round(sum(value) OVER w, 6) AS sum_window
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 60 MINUTE PRECEDING
                                   AND CURRENT ROW)
            ORDER BY event_id
        """,
        "q_customer_order_counts": """
            SELECT o_custkey,
                   count(*) AS n_orders,
                   round(sum(o_totalprice), 4) AS total
            FROM orders GROUP BY o_custkey ORDER BY o_custkey
        """,
        # Allen's 13 interval relations over per-(user, type) activity
        # spans: the CASE ladder is evaluated top-down exactly like the
        # engine's np.select, so degenerate point/shared-endpoint intervals
        # classify identically on both sides
        "allen_interval_mix": """
            WITH spans AS (
                SELECT user_id, event_type,
                       epoch_us(min(ts)) AS s, epoch_us(max(ts)) AS e
                FROM events GROUP BY user_id, event_type
            ),
            p AS (
                SELECT a.event_type AS type_a, b.event_type AS type_b,
                       a.s AS s1, a.e AS e1, b.s AS s2, b.e AS e2
                FROM spans a JOIN spans b
                  ON a.user_id = b.user_id AND a.event_type < b.event_type
            )
            SELECT type_a, type_b,
                   CASE WHEN e1 < s2 THEN 'before'
                        WHEN s1 > e2 THEN 'after'
                        WHEN s1 = s2 AND e1 = e2 THEN 'equals'
                        WHEN e1 = s2 THEN 'meets'
                        WHEN s1 = e2 THEN 'met_by'
                        WHEN s1 = s2 AND e1 < e2 THEN 'starts'
                        WHEN s1 = s2 THEN 'started_by'
                        WHEN e1 = e2 AND s1 > s2 THEN 'finishes'
                        WHEN e1 = e2 THEN 'finished_by'
                        WHEN s1 > s2 AND e1 < e2 THEN 'during'
                        WHEN s1 < s2 AND e1 > e2 THEN 'contains'
                        WHEN s1 < s2 THEN 'overlaps'
                        ELSE 'overlapped_by' END AS relation,
                   count(*)::BIGINT AS n_pairs
            FROM p GROUP BY type_a, type_b, relation
            ORDER BY type_a, type_b, relation
        """,
        # cross-correlation sufficient stats between the top-2 event types'
        # dense hourly series: absent hours are zeros via the generate_series
        # grid; all sums are exact BIGINT, lags 0..23 where overlap exists
        "xcorr_types": """
            WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr,
                              count(*)::BIGINT AS n
                       FROM events GROUP BY 1, 2),
            top2 AS (SELECT event_type,
                            row_number() OVER (ORDER BY sum(n) DESC, event_type) AS rk
                     FROM h GROUP BY event_type QUALIFY rk <= 2),
            b AS (SELECT min(hr) AS lo, max(hr) AS hi FROM h),
            grid AS (SELECT date_diff('hour', b.lo, g.hr)::BIGINT AS t
                     FROM b, unnest(generate_series(
                         (SELECT lo FROM b), (SELECT hi FROM b),
                         INTERVAL 1 HOUR)) AS g(hr)),
            xs AS (SELECT date_diff('hour', b.lo, h.hr)::BIGINT AS t, h.n
                   FROM h JOIN top2 USING (event_type) CROSS JOIN b
                   WHERE top2.rk = 1),
            ys AS (SELECT date_diff('hour', b.lo, h.hr)::BIGINT AS t, h.n
                   FROM h JOIN top2 USING (event_type) CROSS JOIN b
                   WHERE top2.rk = 2),
            xd AS (SELECT g.t, coalesce(xs.n, 0)::BIGINT AS x
                   FROM grid g LEFT JOIN xs ON xs.t = g.t),
            yd AS (SELECT g.t, coalesce(ys.n, 0)::BIGINT AS y
                   FROM grid g LEFT JOIN ys ON ys.t = g.t),
            lags AS (SELECT unnest(range(0, 24))::BIGINT AS lag)
            SELECT l.lag,
                   (SELECT event_type FROM top2 WHERE rk = 1) AS type_a,
                   (SELECT event_type FROM top2 WHERE rk = 2) AS type_b,
                   count(*)::BIGINT AS n,
                   sum(x * y)::BIGINT AS sxy,
                   sum(x)::BIGINT AS sx,
                   sum(y)::BIGINT AS sy,
                   sum(x * x)::BIGINT AS sxx,
                   sum(y * y)::BIGINT AS syy
            FROM lags l JOIN xd ON true JOIN yd ON yd.t = xd.t + l.lag
            GROUP BY l.lag ORDER BY l.lag
        """,
        # epoch-folding periodicity: per type, fold the dense hourly grid
        # at each p into p phase sums over q = m//p complete cycles; argmax
        # of the exact integer key (ΣS²·1e6)//q, ties to the smallest p
        "periodicity_detect": """
            WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr,
                              count(*)::BIGINT AS n
                       FROM events GROUP BY 1, 2),
            b AS (SELECT event_type, min(hr) AS lo,
                         date_diff('hour', min(hr), max(hr))::BIGINT + 1 AS m
                  FROM h GROUP BY 1),
            grid AS (SELECT b.event_type,
                            date_diff('hour', b.lo, g.hr)::BIGINT AS t,
                            b.m
                     FROM b, unnest(generate_series(
                         b.lo, b.lo + to_hours(b.m - 1),
                         INTERVAL 1 HOUR)) AS g(hr)),
            xs AS (SELECT g.event_type, g.t, g.m,
                          coalesce(h2.n, 0)::BIGINT AS x
                   FROM grid g
                   LEFT JOIN (SELECT event_type,
                                     date_diff('hour', b.lo, h.hr)::BIGINT AS t,
                                     n
                              FROM h JOIN b USING (event_type)) h2
                     ON h2.event_type = g.event_type AND h2.t = g.t),
            p AS (SELECT unnest(range(2, 25))::BIGINT AS p),
            fold AS (SELECT xs.event_type, p.p, xs.m,
                            xs.t % p.p AS phase,
                            sum(xs.x)::HUGEINT AS s
                     FROM xs CROSS JOIN p
                     WHERE xs.m // p.p >= 2 AND xs.t < p.p * (xs.m // p.p)
                     GROUP BY 1, 2, 3, 4),
            score AS (SELECT event_type, p, m,
                             (sum(s * s) * 1000000 // (m // p)) AS key
                      FROM fold GROUP BY 1, 2, 3)
            SELECT event_type, p::BIGINT AS best_p, key::BIGINT AS score_key,
                   m::BIGINT AS n_hours
            FROM score
            QUALIFY row_number() OVER (PARTITION BY event_type
                                       ORDER BY key DESC, p) = 1
            ORDER BY event_type
        """,
        # Pettitt: each sign pair (i<j) contributes to every split t in
        # [i, j-1] -- difference rows at t=i (+s) and t=j (-s), cumulative
        # window sum gives U_t; earliest argmax of |U_t| over t <= m-2
        "pettitt_changepoint": """
            WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr,
                              count(*)::BIGINT AS n
                       FROM events GROUP BY 1, 2),
            b AS (SELECT event_type, min(hr) AS lo,
                         date_diff('hour', min(hr), max(hr))::BIGINT + 1 AS m
                  FROM h GROUP BY 1),
            grid AS (SELECT b.event_type,
                            date_diff('hour', b.lo, g.hr)::BIGINT AS t,
                            b.m
                     FROM b, unnest(generate_series(
                         b.lo, b.lo + to_hours(b.m - 1),
                         INTERVAL 1 HOUR)) AS g(hr)),
            xs AS (SELECT g.event_type, g.t, g.m,
                          coalesce(h2.n, 0)::BIGINT AS x
                   FROM grid g
                   LEFT JOIN (SELECT event_type,
                                     date_diff('hour', b.lo, h.hr)::BIGINT AS t,
                                     n
                              FROM h JOIN b USING (event_type)) h2
                     ON h2.event_type = g.event_type AND h2.t = g.t),
            prs AS (SELECT a.event_type,
                           a.t AS i, b2.t AS j,
                           CASE WHEN b2.x > a.x THEN 1
                                WHEN b2.x < a.x THEN -1 ELSE 0 END AS s
                    FROM xs a JOIN xs b2
                      ON b2.event_type = a.event_type AND b2.t > a.t),
            d AS (SELECT event_type, t, sum(s)::BIGINT AS ds FROM (
                      SELECT event_type, i AS t, s FROM prs
                      UNION ALL
                      SELECT event_type, j AS t, -s FROM prs)
                  GROUP BY 1, 2),
            u AS (SELECT g.event_type, g.t, g.m,
                         sum(coalesce(d.ds, 0)) OVER (
                             PARTITION BY g.event_type ORDER BY g.t)::BIGINT
                             AS u
                  FROM grid g LEFT JOIN d
                    ON d.event_type = g.event_type AND d.t = g.t)
            SELECT event_type, m AS n_hours, t AS t_star, u AS u_stat
            FROM u WHERE m >= 2 AND t <= m - 2
            QUALIFY row_number() OVER (PARTITION BY event_type
                                       ORDER BY abs(u) DESC, t) = 1
            ORDER BY event_type
        """,
        # Mann–Kendall: S by the O(m²) sign pair join (the oracle's job —
        # the engine uses a Fenwick fold), tie term over equal-value groups
        "mann_kendall": """
            WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr,
                              count(*)::BIGINT AS n
                       FROM events GROUP BY 1, 2),
            b AS (SELECT event_type, min(hr) AS lo,
                         date_diff('hour', min(hr), max(hr))::BIGINT + 1 AS m
                  FROM h GROUP BY 1),
            grid AS (SELECT b.event_type,
                            date_diff('hour', b.lo, g.hr)::BIGINT AS t,
                            b.m
                     FROM b, unnest(generate_series(
                         b.lo, b.lo + to_hours(b.m - 1),
                         INTERVAL 1 HOUR)) AS g(hr)),
            xs AS (SELECT g.event_type, g.t, g.m,
                          coalesce(h2.n, 0)::BIGINT AS x
                   FROM grid g
                   LEFT JOIN (SELECT event_type,
                                     date_diff('hour', b.lo, h.hr)::BIGINT AS t,
                                     n
                              FROM h JOIN b USING (event_type)) h2
                     ON h2.event_type = g.event_type AND h2.t = g.t),
            s AS (SELECT a.event_type,
                         sum(CASE WHEN b2.x > a.x THEN 1
                                  WHEN b2.x < a.x THEN -1 ELSE 0 END)::BIGINT
                             AS s_stat
                  FROM xs a JOIN xs b2
                    ON b2.event_type = a.event_type AND b2.t > a.t
                  GROUP BY 1),
            ties AS (SELECT event_type,
                            sum(c * (c - 1) * (2 * c + 5))::BIGINT AS tie_term
                     FROM (SELECT event_type, x, count(*)::BIGINT AS c
                           FROM xs GROUP BY 1, 2)
                     WHERE c > 1 GROUP BY 1)
            SELECT b.event_type, b.m AS n_hours,
                   coalesce(s.s_stat, 0)::BIGINT AS s_stat,
                   coalesce(ties.tie_term, 0)::BIGINT AS tie_term
            FROM b LEFT JOIN s USING (event_type)
                   LEFT JOIN ties USING (event_type)
            ORDER BY b.event_type
        """,
        # Kaplan–Meier in fixed-point integers: the sequential product is a
        # recursive CTE stepping one death time per iteration; HUGEINT keeps
        # s * n_risk exact at any user count
        "km_survival": """
            WITH RECURSIVE ev AS (
                SELECT user_id, epoch_us(min(ts)) AS f, epoch_us(max(ts)) AS l
                FROM events GROUP BY user_id
            ),
            life AS (
                SELECT (l - f) // 3600000000 AS t,
                       (l < (SELECT max(l) FROM ev) - 7 * 86400000000) AS died
                FROM ev
            ),
            d AS (
                SELECT t, count(*) AS n_deaths FROM life WHERE died GROUP BY t
            ),
            r AS (
                SELECT d.t, d.n_deaths,
                       (SELECT count(*) FROM life WHERE life.t >= d.t) AS n_risk,
                       row_number() OVER (ORDER BY d.t) AS rn
                FROM d
            ),
            km AS (
                SELECT rn, t, n_deaths, n_risk,
                       (1000000000::HUGEINT * (n_risk - n_deaths)) // n_risk AS s
                FROM r WHERE rn = 1
                UNION ALL
                SELECT r.rn, r.t, r.n_deaths, r.n_risk,
                       (km.s * (r.n_risk - r.n_deaths)) // r.n_risk
                FROM km JOIN r ON r.rn = km.rn + 1
            )
            SELECT t AS t_hours, n_risk::BIGINT AS n_risk,
                   n_deaths::BIGINT AS n_deaths, s::BIGINT AS survival_e9
            FROM km ORDER BY t_hours
        """,
        # TRUE sliding count(DISTINCT): checkpoint x window-membership join
        # recomputes every trailing-24h distinct set from scratch — the
        # engine's merged-interval delta sweep must agree exactly
        "sliding_distinct_users": """
            WITH b AS (
                SELECT (epoch_us(min(ts)) + 3599999999) // 3600000000 AS klo,
                       epoch_us(max(ts)) // 3600000000 AS khi
                FROM events
            ),
            hours AS (
                SELECT unnest(range(klo, khi + 1)) AS k FROM b WHERE khi >= klo
            )
            SELECT make_timestamp(k * 3600000000) AS hour_ts,
                   (SELECT count(DISTINCT e.user_id) FROM events e
                     WHERE epoch_us(e.ts) <= k * 3600000000
                       AND epoch_us(e.ts) > k * 3600000000 - 86400000000
                   )::BIGINT AS n_active
            FROM hours ORDER BY hour_ts
        """,
        # exact discrete quantiles — engine uses the same index rule as
        # DuckDB quantile_disc (value at max(0, ceil(p*n)-1) of the sorted
        # column), computed from a merged (key, value, count) histogram
        "q_price_quantiles": """
            SELECT l_returnflag,
                   quantile_disc(l_extendedprice, 0.25) AS p25,
                   quantile_disc(l_extendedprice, 0.50) AS p50,
                   quantile_disc(l_extendedprice, 0.75) AS p75,
                   quantile_disc(l_extendedprice, 0.90) AS p90,
                   quantile_disc(l_extendedprice, 0.99) AS p99
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        # grouped top-k (window-function shape): ties on o_totalprice break
        # by o_orderkey ascending in BOTH engine and SQL
        "q_top_orders_per_customer": """
            SELECT o_custkey, o_totalprice, o_orderkey, rank FROM (
                SELECT o_custkey, o_totalprice, o_orderkey,
                       ROW_NUMBER() OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey) AS rank
                FROM orders)
            WHERE rank <= 3 ORDER BY o_custkey, rank
        """,
        # bloom-prefiltered EXACT semi-join — the bloom only shrinks the
        # exchange; survivors are verified against true build keys
        "q_bloom_semijoin": """
            SELECT o_orderkey, o_totalprice FROM orders
            WHERE EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
            ORDER BY o_orderkey
        """,
        # exact grouped COUNT(DISTINCT) — the exact counterpart of the HLL
        # sketch query
        "q_distinct_users_per_type": """
            SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        # interpolated quantiles; engine mirrors DuckDB's lo*(1-f)+hi*f
        # interpolation expression exactly
        "q_price_quantiles_cont": """
            SELECT l_returnflag,
                   quantile_cont(l_extendedprice, 0.25) AS p25,
                   quantile_cont(l_extendedprice, 0.50) AS p50,
                   quantile_cont(l_extendedprice, 0.75) AS p75
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        # threshold filter composed on the binned exact quantiles; the p99
        # cut is a real order statistic (a data value), so the compare is
        # float-equality-safe
        "q_price_outliers": """
            WITH q AS (SELECT l_returnflag AS f,
                              quantile_disc(l_extendedprice, 0.99) AS p99
                       FROM lineitem GROUP BY l_returnflag)
            SELECT l_orderkey, l_returnflag, l_extendedprice
            FROM lineitem JOIN q ON l_returnflag = q.f
            WHERE l_extendedprice > q.p99
            ORDER BY l_orderkey, l_returnflag, l_extendedprice
        """,
        # RANK-tie percent_rank; (rank-1)/(n-1) is the same IEEE division on
        # both sides, so the doubles are bit-identical without rounding
        "q_order_percent_rank": """
            SELECT o_orderkey, o_custkey,
                   percent_rank() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice) AS pct_rank
            FROM orders ORDER BY o_orderkey
        """,
        # ordered string aggregation (total order -> deterministic string)
        "q_order_list_per_customer": """
            SELECT o_custkey,
                   string_agg(o_orderkey::VARCHAR, ',' ORDER BY o_orderkey)
                       AS order_keys,
                   count(*) AS n_orders
            FROM orders GROUP BY o_custkey ORDER BY o_custkey
        """,
        # conditional aggregation (pivot): indicator columns built in-batch,
        # pivot = plain grouped sum
        "q_events_pivot": """
            SELECT date_trunc('hour', ts) AS window_start,
                   (count(*) FILTER (WHERE event_type = 'click'))::BIGINT
                       AS n_click,
                   (count(*) FILTER (WHERE event_type = 'purchase'))::BIGINT
                       AS n_purchase,
                   (count(*) FILTER (WHERE event_type = 'view'))::BIGINT
                       AS n_view
            FROM events GROUP BY 1 ORDER BY 1
        """,
        # 3-table chain: both dimension hops broadcast, fact reduced before
        # its only exchange
        "q_revenue_by_nation": """
            SELECT n_name,
                   round(sum(o_totalprice), 4) AS revenue,
                   count(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name
        """,
        # grouped argmax (mode); count ties break by event_type ascending
        "q_user_top_event_type": """
            SELECT user_id, event_type, cnt FROM (
                SELECT user_id, event_type, count(*)::BIGINT AS cnt,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY count(*) DESC, event_type) AS rn
                FROM events GROUP BY user_id, event_type)
            WHERE rn = 1 ORDER BY user_id
        """,
        # correlated scalar subquery: aggregate once, broadcast per-key
        # scalars, filter the fact side map-side. price > avg is evaluated
        # as EXACT integers (price_cents*n > sum_cents): a float mean's
        # summation order differs between the engine's batch partials and
        # SQL's sequential fold, flipping equal-priced groups by 1 ulp
        "q_orders_above_cust_avg": """
            WITH c AS (SELECT o_orderkey, o_custkey, o_totalprice,
                              CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                                  AS cents
                       FROM orders),
                 s AS (SELECT o_custkey AS k, sum(cents) AS sum_cents,
                              count(*) AS n
                       FROM c GROUP BY o_custkey)
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM c JOIN s ON c.o_custkey = s.k
            WHERE c.cents * s.n > s.sum_cents ORDER BY o_orderkey
        """,
        # three-level rollup; engine derives coarse levels from the merged
        # finest-grain aggregate, SQL uses native ROLLUP
        "q_events_rollup": """
            SELECT event_type,
                   date_trunc('hour', ts) AS window_start,
                   count(*) AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM events
            GROUP BY ROLLUP (event_type, date_trunc('hour', ts))
            ORDER BY event_type NULLS LAST, window_start NULLS LAST
        """,
        # exact-integer regression sums; the two divisions are single IEEE
        # ops mirrored by the engine (never regr_slope's float accumulator)
        "q_event_trend": """
            WITH d AS (
                SELECT event_type, date_trunc('day', ts) AS day,
                       count(*)::BIGINT AS y
                FROM events GROUP BY 1, 2),
            s AS (
                SELECT event_type,
                       count(*)::BIGINT AS n,
                       sum(datediff('day', DATE '1970-01-01', day))::BIGINT AS sx,
                       sum(y)::BIGINT AS sy,
                       sum(datediff('day', DATE '1970-01-01', day) * y)::BIGINT AS sxy,
                       sum(datediff('day', DATE '1970-01-01', day)
                           * datediff('day', DATE '1970-01-01', day))::BIGINT AS sxx
                FROM d GROUP BY 1)
            SELECT event_type,
                   n AS n_days,
                   round(CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                        ELSE (n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE)
                   END, 6) AS slope,
                   round(CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                        ELSE (sy - ((n * sxy - sx * sy)
                                    / CAST(n * sxx - sx * sx AS DOUBLE)) * sx) / n
                   END, 6) AS intercept
            FROM s ORDER BY event_type
        """,
        "q_events_cube": """
            SELECT event_type,
                   date_trunc('day', ts) AS day,
                   count(*) AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM events
            GROUP BY CUBE (event_type, date_trunc('day', ts))
            ORDER BY event_type NULLS LAST, day NULLS LAST
        """,
        # grouped argmin/argmax: first/last order per customer by
        # (o_orderdate, o_orderkey)
        "q_first_last_order": """
            WITH x AS (
                SELECT o_custkey, o_orderkey,
                       row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey) AS rn_a,
                       row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn_d,
                       count(*) OVER (PARTITION BY o_custkey) AS n
                FROM orders)
            SELECT o_custkey,
                   max(CASE WHEN rn_a = 1 THEN o_orderkey END)::BIGINT AS first_orderkey,
                   max(CASE WHEN rn_d = 1 THEN o_orderkey END)::BIGINT AS last_orderkey,
                   max(n)::BIGINT AS n_orders
            FROM x GROUP BY o_custkey ORDER BY o_custkey
        """,
        # anti-join: exact complement of q_bloom_semijoin (no bloom here — a
        # false positive would DROP a true result, so the full probe side
        # takes the exchange)
        "q_anti_join_orders": """
            SELECT o_orderkey, o_totalprice FROM orders
            WHERE NOT EXISTS (SELECT 1 FROM lineitem
                              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
            ORDER BY o_orderkey
        """,
        # overlapping token windows (LLM-ingest chunking); chunk starts are
        # range(0, n_tokens, 24), window = 32 tokens, text = tokens joined
        # by one space (the family's normalized tokenization)
        "chunk_documents": """
            WITH t AS (SELECT doc_id,
                              regexp_extract_all(text, '[A-Za-z0-9_]+') AS toks
                       FROM documents),
            w AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
            c AS (SELECT doc_id, toks, n,
                         unnest(range(0, n, 24)) AS start_tok FROM w)
            SELECT doc_id,
                   (start_tok // 24)::BIGINT AS chunk_id,
                   start_tok::BIGINT AS start_tok,
                   least(32, n - start_tok)::BIGINT AS n_tokens,
                   array_to_string(toks[start_tok+1 : least(start_tok+32, n)], ' ')
                       AS chunk_text
            FROM c ORDER BY doc_id, chunk_id
        """,
        # distributed prefix scan: per-hour-bucket local cumsums + driver
        # exclusive scan of bucket totals. Totals are exact integer cents
        # (floor(v*100+0.5) — the same IEEE ops both sides) because a float
        # running sum is association-sensitive across engines
        "running_totals": """
            SELECT event_id,
                   (count(*) OVER w)::BIGINT AS running_n,
                   (sum(CAST(floor(value*100 + 0.5) AS BIGINT)) OVER w)::BIGINT
                       AS running_cents
            FROM events
            WINDOW w AS (ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
            ORDER BY event_id
        """,
        # set algebra (INTERSECT/EXCEPT) via one-pass indicator partials
        "q_user_set_ops": """
            SELECT 'both' AS set_op, user_id FROM
              (SELECT user_id FROM events WHERE event_type = 'click'
               INTERSECT
               SELECT user_id FROM events WHERE event_type = 'purchase')
            UNION ALL
            SELECT 'click_only', user_id FROM
              (SELECT user_id FROM events WHERE event_type = 'click'
               EXCEPT
               SELECT user_id FROM events WHERE event_type = 'purchase')
            ORDER BY set_op, user_id
        """,
        # LAG window: gap to the same user's previous event (first = NULL)
        "q_event_gaps": """
            SELECT event_id, user_id,
                   (epoch_us(ts) - epoch_us(lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)))::BIGINT
                       AS gap_us
            FROM events ORDER BY event_id
        """,
        # first-touch ordered funnel: every stage anchors at its minimum
        # qualifying ts, strictly after the previous stage's anchor
        "funnel_stage_counts": """
            WITH t1 AS (SELECT user_id, min(ts) AS t1 FROM events
                        WHERE event_type = 'view' GROUP BY 1),
            t2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
                   JOIN t1 USING (user_id)
                   WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY 1),
            t3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
                   JOIN t2 USING (user_id)
                   WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY 1)
            SELECT * FROM (
                SELECT '1_view' AS stage, count(*)::BIGINT AS n_users FROM t1
                UNION ALL SELECT '2_click', count(*)::BIGINT FROM t2
                UNION ALL SELECT '3_purchase', count(*)::BIGINT FROM t3)
            ORDER BY stage
        """,
        # cohort = day of a user's first event; one row per (cohort, offset)
        "retention_cohorts": """
            WITH f AS (SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
                       FROM events GROUP BY 1),
            a AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
            j AS (SELECT f.cohort_day,
                         datediff('day', f.cohort_day, a.day) AS day_offset
                  FROM a JOIN f USING (user_id))
            SELECT cohort_day, day_offset::BIGINT AS day_offset,
                   count(*)::BIGINT AS n_users
            FROM j GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # trailing 3-row moving average in EXACT integer cents (the
        # running_totals float rule): one division on both sides
        "moving_avg_user": """
            SELECT event_id, user_id, ts,
                   round(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w
                         / (100.0 * count(*) OVER w), 6) AS mov_avg
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
            ORDER BY event_id
        """,
        # unordered event-type pairs per user (market-basket shape)
        "event_type_cooccurrence": """
            WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   count(*)::BIGINT AS n_users
            FROM d a JOIN d b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "q_ntile_orders": """
            SELECT o_orderkey, o_totalprice,
                   ntile(4) OVER (ORDER BY o_totalprice DESC, o_orderkey)::BIGINT
                       AS bucket
            FROM orders ORDER BY o_orderkey
        """,
        "q_dense_rank_customers": """
            WITH c AS (SELECT o_custkey, count(*)::BIGINT AS n_orders
                       FROM orders GROUP BY 1)
            SELECT o_custkey, n_orders,
                   dense_rank() OVER (ORDER BY n_orders DESC)::BIGINT AS drank
            FROM c ORDER BY o_custkey
        """,
        # streaming-watermark replay: arrival = injective hash permutation of
        # event_id (insertion order is already time-sorted in testdata, which
        # would make the late path unfalsifiable); watermark = running max ts
        # over prior arrivals via the same distributed max-scan shape as
        # running_totals
        "streaming_watermark_counts": """
            WITH w AS (
                SELECT ts,
                       max(ts) OVER (ORDER BY ((event_id % 2147483648)
                                               * 2654435761) % 4294967296,
                                              event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND 1 PRECEDING) AS wm
                FROM events)
            SELECT date_trunc('hour', ts) AS window_start,
                   count(*) AS n_events,
                   (count(*) FILTER (WHERE wm IS NOT NULL
                                     AND ts < wm - INTERVAL 30 MINUTE))::BIGINT
                       AS n_late
            FROM w GROUP BY 1 ORDER BY 1
        """,
        # pure inequality (range) join — LEFT so zero-shipment orders stay
        "range_join_shipments": """
            SELECT o.o_orderkey,
                   count(l.l_shipdate)::BIGINT AS n_shipments,
                   round(coalesce(sum(l.l_quantity), 0), 4) AS sum_qty
            FROM orders o LEFT JOIN lineitem l
              ON l.l_shipdate >= o.o_orderdate
             AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
            GROUP BY o.o_orderkey ORDER BY o.o_orderkey
        """,
        "dedup_exact_docs": """
            SELECT min(doc_id) AS doc_id, text
            FROM documents GROUP BY text ORDER BY doc_id
        """,
        # increments through persisted state must reproduce the one-shot
        # dedup exactly (the keep-min rule crosses increments in doc_id
        # order — the ingest-log contract)
        "dedup_incremental": """
            SELECT min(doc_id) AS doc_id, text
            FROM documents GROUP BY text ORDER BY doc_id
        """,
        "token_counts": """
            SELECT doc_id,
                   len(regexp_extract_all(text, '[A-Za-z0-9_]+'))::BIGINT AS n_tokens,
                   length(text)::BIGINT AS n_chars
            FROM documents ORDER BY doc_id
        """,
        # per-doc token repetition profile (exact integers; the duplicate-
        # token / modal-token quality gates divide these downstream)
        "doc_repetition": """
            WITH t AS (SELECT doc_id,
                              unnest(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS tok
                       FROM documents),
            c AS (SELECT doc_id, tok, count(*) AS cnt FROM t GROUP BY doc_id, tok)
            SELECT d.doc_id,
                   coalesce(sum(c.cnt), 0)::BIGINT AS n_tokens,
                   count(c.tok)::BIGINT AS n_distinct,
                   coalesce(max(c.cnt), 0)::BIGINT AS top_count
            FROM documents d LEFT JOIN c ON d.doc_id = c.doc_id
            GROUP BY d.doc_id ORDER BY d.doc_id
        """,
        # Shannon entropy (bits) over the lowercased token histogram +
        # exact-integer Simpson numerator. Entropy rounds to FOUR decimals:
        # numpy vs DuckDB log2 may differ 1 ulp per term, a <=1e-12 total
        # disagreement cannot flip a 1e-4 rounding; + 0.0 normalizes -0.0
        "token_entropy": """
            WITH t AS (SELECT doc_id,
                              lower(unnest(regexp_extract_all(text, '[A-Za-z0-9_]+')))
                                  AS tk
                       FROM documents),
            c AS (SELECT doc_id, tk, count(*)::BIGINT AS c FROM t GROUP BY 1, 2),
            a AS (SELECT doc_id, sum(c)::BIGINT AS n,
                         sum(c * c)::BIGINT AS simpson_num,
                         sum(c * log2(c)) AS s
                  FROM c GROUP BY 1)
            SELECT d.doc_id,
                   coalesce(a.n, 0)::BIGINT AS n_tokens,
                   coalesce(a.simpson_num, 0)::BIGINT AS simpson_num,
                   coalesce(round(log2(a.n) - a.s / a.n, 4) + 0.0, 0.0) AS entropy
            FROM documents d LEFT JOIN a USING (doc_id)
            ORDER BY d.doc_id
        """,
        # DSIR importance weights (Xie et al. 2023): add-1-smoothed unigram
        # log-ratio of the target domain (source = 'src0') vs the raw corpus;
        # same 4-decimal libm-parity rounding as token_entropy
        "dsir_weights": """
            WITH tt AS (SELECT d.doc_id, (d.source = 'src0') AS tgt,
                               lower(unnest(regexp_extract_all(d.text,
                                     '[A-Za-z0-9_]+'))) AS tk
                        FROM documents d),
            v AS (SELECT tk, count(*)::BIGINT AS cr,
                         sum(CASE WHEN tgt THEN 1 ELSE 0 END)::BIGINT AS ct
                  FROM tt GROUP BY 1),
            tot AS (SELECT sum(cr)::BIGINT AS tr, sum(ct)::BIGINT AS tg,
                           count(*)::BIGINT AS vv FROM v),
            c AS (SELECT doc_id, tk, count(*)::BIGINT AS c FROM tt GROUP BY 1, 2),
            s AS (SELECT c.doc_id, sum(c.c)::BIGINT AS n,
                         sum(c.c * (ln(v.ct + 1) - ln(v.cr + 1))) AS s
                  FROM c JOIN v USING (tk) GROUP BY 1)
            SELECT d.doc_id,
                   coalesce(s.n, 0)::BIGINT AS n_tokens,
                   coalesce(round(s.s + s.n * (ln(tot.tr + tot.vv)
                                               - ln(tot.tg + tot.vv)), 4) + 0.0,
                            0.0) AS dsir_logw
            FROM documents d LEFT JOIN s USING (doc_id), tot
            ORDER BY d.doc_id
        """,
        # CC-Net perplexity buckets: unigram LM on the doc_id%7 held split,
        # 4-decimal logpp (libm-parity rule), tertile thresholds as EXPLICIT
        # order statistics at ranks ceil(n/3), ceil(2n/3)
        "ccnet_buckets": """
            WITH t AS (SELECT doc_id,
                              lower(unnest(regexp_extract_all(text,
                                    '[A-Za-z0-9_]+'))) AS tk
                       FROM documents),
            tr AS (SELECT tk, count(*)::BIGINT AS c FROM t
                   WHERE doc_id % 7 = 0 GROUP BY 1),
            tot AS (SELECT coalesce(sum(c), 0)::BIGINT AS tt,
                           count(*)::BIGINT AS vv FROM tr),
            c AS (SELECT doc_id, tk, count(*)::BIGINT AS c FROM t GROUP BY 1, 2),
            s AS (SELECT c.doc_id, sum(c.c)::BIGINT AS n,
                         sum(c.c * ln(coalesce(tr.c, 0) + 1)) AS sl
                  FROM c LEFT JOIN tr USING (tk) GROUP BY 1),
            p AS (SELECT d.doc_id, coalesce(s.n, 0)::BIGINT AS n_tokens,
                         coalesce(round(ln(tot.tt + tot.vv) - s.sl / s.n, 4)
                                  + 0.0, 0.0) AS logpp
                  FROM documents d LEFT JOIN s USING (doc_id), tot),
            r AS (SELECT logpp, row_number() OVER (ORDER BY logpp) AS rnk,
                         count(*) OVER () AS n
                  FROM p),
            q AS (SELECT max(CASE WHEN rnk = CAST(ceil(n / 3.0) AS BIGINT)
                                  THEN logpp END) AS t1,
                         max(CASE WHEN rnk = CAST(ceil(2 * n / 3.0) AS BIGINT)
                                  THEN logpp END) AS t2
                  FROM r)
            SELECT p.doc_id, p.n_tokens, p.logpp,
                   CASE WHEN p.logpp <= q.t1 THEN 'head'
                        WHEN p.logpp <= q.t2 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM p, q ORDER BY p.doc_id
        """,
        "quality_scores": """
            SELECT doc_id,
                   len(regexp_extract_all(text, '[A-Za-z0-9_]+'))::BIGINT AS n_tokens,
                   round(len(regexp_extract_all(text, '[.,;:!?]'))
                         / greatest(length(text), 1)::DOUBLE, 6) AS punct_ratio,
                   round(coalesce(list_avg(list_transform(
                         regexp_extract_all(text, '[A-Za-z0-9_]+'),
                         x -> length(x)::DOUBLE)), 0.0), 6) AS mean_word_len
            FROM documents ORDER BY doc_id
        """,
        # per-doc argmax TF-IDF term; idf is the RAW ratio (N+1)/(df+1), not
        # log-scaled — exact integer product + one IEEE division is
        # bit-identical across numpy and DuckDB where ln() is not (libm
        # implementations differ by 1 ulp); ties on score break by token
        "tfidf_top_terms": """
            WITH tok AS (
                SELECT doc_id,
                       lower(unnest(regexp_extract_all(text, '[A-Za-z0-9_]+')))
                           AS token
                FROM documents),
            tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf
                   FROM tok GROUP BY doc_id, token),
            dfreq AS (SELECT token, count(DISTINCT doc_id)::BIGINT AS df
                      FROM tok GROUP BY token),
            n AS (SELECT count(*)::BIGINT AS n FROM documents),
            s AS (SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
                         (tf.tf * (n.n + 1))::DOUBLE / (dfreq.df + 1)::DOUBLE
                             AS score
                  FROM tf JOIN dfreq USING (token) CROSS JOIN n),
            r AS (SELECT *, ROW_NUMBER() OVER (
                      PARTITION BY doc_id
                      ORDER BY score DESC, token) AS rn FROM s)
            SELECT doc_id, token, tf, df, score
            FROM r WHERE rn = 1 ORDER BY doc_id
        """,
        # weighted deterministic mixture (docs w=2, chunks w=1): integer
        # priority key = hash(id) // weight, smallest-n via partial top-k;
        # operands reduced mod 2^31 so the BIGINT math never overflows
        "training_mixture": """
            WITH d AS (SELECT 'docs' AS source, doc_id, (-1)::BIGINT AS chunk_id,
                              text,
                              ((((doc_id % 2147483648) * 2654435761)
                                % 4294967296) // 2)::BIGINT AS mix_key
                       FROM documents),
            t AS (SELECT doc_id, regexp_extract_all(text, '[A-Za-z0-9_]+') AS toks
                  FROM documents),
            w AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
            c0 AS (SELECT doc_id, toks, n, unnest(range(0, n, 24)) AS start_tok
                   FROM w),
            c AS (SELECT 'chunk' AS source, doc_id,
                         (start_tok // 24)::BIGINT AS chunk_id,
                         array_to_string(toks[start_tok+1 : least(start_tok+32, n)],
                                         ' ') AS text,
                         ((((doc_id*1000003 + start_tok // 24) % 2147483648)
                           * 2654435761) % 4294967296)::BIGINT AS mix_key
                  FROM c0),
            u AS (SELECT * FROM d UNION ALL SELECT * FROM c)
            SELECT source, doc_id, chunk_id, text, mix_key FROM u
            ORDER BY mix_key, source, doc_id, chunk_id LIMIT 300
        """,
        # BPE-ish pre-tokenizer counts — the SAME RE2 pattern runs in Arrow's
        # count_substring_regex and DuckDB's regexp_extract_all (doubled
        # quotes are SQL escaping of the literal apostrophe)
        "token_counts_bpe": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text,
                       '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9'']+|\s+'))::BIGINT
                       AS n_bpe_tokens
            FROM documents ORDER BY doc_id
        """,
        # bigram LIFT = cnt(xy)*N / (cnt(x)*cnt(y)) — the log-free PMI
        # analogue: integer products + ONE division are bit-identical in SQL
        "bigram_lift": """
            WITH toks AS (SELECT unnest(regexp_extract_all(
                              lower(text), '[A-Za-z0-9_]+')) AS token
                          FROM documents),
            u AS (SELECT token, count(*)::BIGINT AS cnt FROM toks GROUP BY token),
            n AS (SELECT count(*)::BIGINT AS n FROM toks),
            t2 AS (SELECT doc_id, list_transform(
                       regexp_extract_all(lower(text), '[A-Za-z0-9_]+'),
                       x -> x) AS ws
                   FROM documents),
            p AS (SELECT unnest(list_transform(range(1, len(ws)),
                                               i -> ws[i] || ' ' || ws[i+1]))
                      AS bigram
                  FROM t2),
            b AS (SELECT bigram, count(*)::BIGINT AS cnt FROM p
                  GROUP BY bigram HAVING count(*) >= 5),
            s AS (SELECT b.bigram, b.cnt,
                         (b.cnt * n.n)::DOUBLE / (ux.cnt * uy.cnt)::DOUBLE
                             AS lift
                  FROM b CROSS JOIN n
                  JOIN u ux ON ux.token = split_part(b.bigram, ' ', 1)
                  JOIN u uy ON uy.token = split_part(b.bigram, ' ', 2))
            SELECT bigram, cnt, lift FROM s
            ORDER BY lift DESC, bigram LIMIT 20
        """,
        # adjacent-token pair frequencies (combiner per batch, like top_tokens)
        "top_bigrams": """
            WITH t AS (SELECT doc_id,
                              list_transform(
                                  regexp_extract_all(lower(text), '[A-Za-z0-9_]+'),
                                  x -> x) AS ws
                       FROM documents),
            p AS (SELECT unnest(list_transform(range(1, len(ws)),
                                               i -> ws[i] || ' ' || ws[i+1]))
                      AS bigram
                  FROM t)
            SELECT bigram, count(*)::BIGINT AS cnt
            FROM p GROUP BY bigram
            ORDER BY cnt DESC, bigram LIMIT 50
        """,
        # Zipf coverage: descending-count histogram walk; targets are exact
        # ceilings (covered >= ceil(f*total)), partial blocks by ceil div
        "zipf_coverage": """
            WITH toks AS (SELECT unnest(regexp_extract_all(lower(text),
                                 '[A-Za-z0-9_]+')) AS t
                          FROM documents),
            cnt AS (SELECT t, count(*)::BIGINT AS c FROM toks GROUP BY t),
            hist AS (SELECT c, count(*)::BIGINT AS n_types
                     FROM cnt GROUP BY c),
            tot AS (SELECT sum(c * n_types)::BIGINT AS total,
                           sum(n_types)::BIGINT AS n_types FROM hist),
            w AS (SELECT c, n_types,
                         sum(c * n_types) OVER (ORDER BY c DESC) AS cum,
                         sum(c * n_types) OVER (ORDER BY c DESC)
                             - c * n_types AS cumb,
                         sum(n_types) OVER (ORDER BY c DESC)
                             - n_types AS kb
                  FROM hist),
            k50 AS (SELECT kb + (((tot.total + 1) // 2 - cumb) + c - 1) // c
                           AS k
                    FROM w, tot WHERE cum >= (tot.total + 1) // 2
                    ORDER BY c DESC LIMIT 1),
            k90 AS (SELECT kb + (((9 * tot.total + 9) // 10 - cumb) + c - 1)
                           // c AS k
                    FROM w, tot WHERE cum >= (9 * tot.total + 9) // 10
                    ORDER BY c DESC LIMIT 1)
            SELECT tot.total AS n_tokens, tot.n_types,
                   (SELECT k FROM k50)::BIGINT AS k50,
                   (SELECT k FROM k90)::BIGINT AS k90
            FROM tot
        """,
        # RAKE word-level: phrases = gaps-and-islands of non-stopword
        # tokens (pos - row_number per (doc, stop)); deg joins each word
        # occurrence to its phrase length; exact (deg*1e6)//freq ranking
        "rake_keywords": """
            WITH t AS (SELECT doc_id,
                              regexp_extract_all(lower(text),
                                                 '[A-Za-z0-9_]+') AS toks
                       FROM documents),
            e AS (SELECT doc_id,
                         unnest(range(1, len(toks) + 1)) AS pos,
                         unnest(toks) AS w
                  FROM t WHERE len(toks) > 0),
            f AS (SELECT doc_id, pos, w,
                         CASE WHEN w IN ('the','and','of','to','a','in',
                                         'is','it','that','with')
                              THEN 1 ELSE 0 END AS stop
                  FROM e),
            g AS (SELECT doc_id, pos, w, stop,
                         pos - row_number() OVER (PARTITION BY doc_id, stop
                                                  ORDER BY pos) AS grp
                  FROM f),
            ph AS (SELECT doc_id, grp, count(*)::BIGINT AS plen
                   FROM g WHERE stop = 0 GROUP BY 1, 2),
            ws AS (SELECT g.w, count(*)::BIGINT AS freq,
                          sum(ph.plen)::BIGINT AS deg
                   FROM g JOIN ph ON ph.doc_id = g.doc_id AND ph.grp = g.grp
                   WHERE g.stop = 0 GROUP BY 1)
            SELECT w AS word, freq, deg,
                   (deg * 1000000 // freq)::BIGINT AS score_key
            FROM ws ORDER BY score_key DESC, word LIMIT 25
        """,
        "collocations": """
            WITH ws AS (SELECT regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS w
                        FROM documents),
            top1 AS (SELECT token FROM (
                        SELECT unnest(w) AS token FROM ws)
                     GROUP BY token ORDER BY count(*) DESC, token LIMIT 1),
            nb AS (SELECT unnest(flatten(list_transform(
                       range(1, len(w) + 1),
                       i -> CASE WHEN w[i] = top1.token
                            THEN list_transform(
                                list_filter(range(greatest(1, i - 3),
                                                  least(len(w), i + 3) + 1),
                                            j -> j != i),
                                j -> w[j])
                            ELSE []::VARCHAR[] END))) AS word
                   FROM ws, top1)
            SELECT word, count(*)::BIGINT AS cnt
            FROM nb GROUP BY word ORDER BY cnt DESC, word LIMIT 40
        """,
        "phrase_search": """
            WITH ws AS (SELECT doc_id,
                               regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS w
                        FROM documents),
            tb AS (SELECT bigram FROM (
                      SELECT unnest(list_transform(range(1, len(w)),
                                    i -> w[i] || ' ' || w[i+1])) AS bigram
                      FROM ws)
                   GROUP BY bigram ORDER BY count(*) DESC, bigram LIMIT 1),
            m AS (SELECT doc_id,
                         len(list_filter(range(1, len(w)),
                             i -> w[i] || ' ' || w[i+1] = tb.bigram))::BIGINT AS n_occ
                  FROM ws, tb)
            SELECT doc_id, n_occ FROM m WHERE n_occ > 0 ORDER BY doc_id
        """,
        "top_tokens": """
            SELECT token, count(*)::BIGINT AS cnt
            FROM (SELECT lower(unnest(regexp_extract_all(text, '[A-Za-z0-9_]+')))
                      AS token
                  FROM documents)
            GROUP BY token
            ORDER BY cnt DESC, token
            LIMIT 100
        """,
        # LPT round-robin shard layout: rank by (n_tokens DESC, doc_id)
        "shard_assignment": """
            WITH t AS (SELECT doc_id,
                              len(regexp_extract_all(lower(text), '[A-Za-z0-9_]+'))::BIGINT AS n_tokens
                       FROM documents)
            SELECT doc_id, n_tokens,
                   (row_number() OVER (ORDER BY n_tokens DESC, doc_id) - 1)::BIGINT AS rank,
                   ((row_number() OVER (ORDER BY n_tokens DESC, doc_id) - 1) % 16)::BIGINT AS shard
            FROM t ORDER BY doc_id
        """,
        # the full curation chain: gopher gate -> exact dedup -> scrub, as
        # one chained-CTE restatement of the three verified stage oracles
        "curate_corpus": """
            WITH t AS (SELECT doc_id, text,
                              regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS ws
                       FROM documents),
            tc AS (SELECT doc_id, ws[j] AS w
                   FROM t, LATERAL (SELECT unnest(generate_series(1, len(ws))) AS j)),
            tops AS (SELECT doc_id, MAX(c)::BIGINT AS top_count FROM
                       (SELECT doc_id, w, count(*) AS c FROM tc GROUP BY doc_id, w)
                     GROUP BY doc_id),
            base AS (SELECT doc_id, len(ws)::BIGINT AS n,
                            COALESCE(list_sum(list_transform(ws, x -> length(x))), 0)::BIGINT AS chars,
                            len(list_distinct(ws))::BIGINT AS nd,
                            len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))::BIGINT AS nal
                     FROM t),
            g AS (SELECT base.doc_id FROM base LEFT JOIN tops USING (doc_id)
                  WHERE n >= 50 AND n <= 100000
                    AND 3 * n <= chars AND chars <= 10 * n
                    AND 10 * (n - nd) <= 8 * n
                    AND 5 * COALESCE(top_count, 0) <= n
                    AND 5 * nal >= 4 * n),
            d AS (SELECT min(doc_id) AS doc_id
                  FROM documents JOIN g USING (doc_id) GROUP BY documents.text),
            t2 AS (SELECT t.doc_id, t.ws FROM t JOIN d USING (doc_id)),
            s AS (SELECT doc_id, i, array_to_string(ws[i:i+7], ' ') AS gram
                  FROM t2, LATERAL (SELECT unnest(generate_series(1, greatest(len(ws) - 7, 0))) AS i)),
            bad AS (SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM s)
                    GROUP BY gram HAVING count(*) > 1),
            cov AS (SELECT DISTINCT s.doc_id, s.i + o AS pos
                    FROM s JOIN bad USING (gram),
                         LATERAL (SELECT unnest(generate_series(0, 7)) AS o)),
            toks AS (SELECT doc_id, j, ws[j] AS w
                     FROM t2, LATERAL (SELECT unnest(generate_series(1, len(ws))) AS j)),
            kept AS (SELECT toks.doc_id,
                            string_agg(w, ' ' ORDER BY j) AS text_clean,
                            count(*)::BIGINT AS n_kept
                     FROM toks LEFT JOIN cov
                       ON toks.doc_id = cov.doc_id AND toks.j = cov.pos
                     WHERE cov.pos IS NULL GROUP BY toks.doc_id)
            SELECT t2.doc_id,
                   COALESCE(kept.text_clean, '') AS text_clean,
                   COALESCE(kept.n_kept, 0)::BIGINT AS n_kept,
                   (len(t2.ws) - COALESCE(kept.n_kept, 0))::BIGINT AS n_removed
            FROM t2 LEFT JOIN kept USING (doc_id)
            ORDER BY doc_id
        """,
        # spike hours by exact integer cross-multiplication (1.5x mean gate)
        "event_spikes": """
            WITH h AS (SELECT date_trunc('hour', ts) AS hr, count(*)::BIGINT AS n
                       FROM events GROUP BY hr),
            s AS (SELECT count(*)::BIGINT AS nh, sum(n)::BIGINT AS tot FROM h)
            SELECT hr, n FROM h, s WHERE 2 * n * s.nh > 3 * s.tot
            ORDER BY hr
        """,
        # CUSUM change point per event type: integer-scaled |m·P_k − k·X|
        # argmax over the hourly series, earliest hour on score ties
        "cusum_changepoints": """
            WITH hc AS (SELECT event_type, date_trunc('hour', ts) AS hr,
                               count(*)::BIGINT AS c
                        FROM events GROUP BY 1, 2),
            w AS (SELECT event_type, hr,
                         sum(c) OVER (PARTITION BY event_type ORDER BY hr)
                             ::BIGINT AS p,
                         row_number() OVER (PARTITION BY event_type
                                            ORDER BY hr)::BIGINT AS k,
                         count(*) OVER (PARTITION BY event_type)
                             ::BIGINT AS m,
                         sum(c) OVER (PARTITION BY event_type)::BIGINT AS x
                  FROM hc),
            s AS (SELECT event_type, hr, abs(m * p - k * x)::BIGINT AS score,
                         m, x,
                         row_number() OVER (
                             PARTITION BY event_type
                             ORDER BY abs(m * p - k * x) DESC, hr) AS rn
                  FROM w)
            SELECT event_type, hr AS cp_hr, score, m AS n_hours, x AS n_events
            FROM s WHERE rn = 1 ORDER BY event_type
        """,
        # hourly LOCF grid: ceil-hour start guarantees a carry source; ties
        # at one timestamp resolve to the highest event_id (arg_max)
        "resample_locf": """
            WITH ev AS (SELECT user_id, ts, event_id, value
                        FROM events WHERE user_id % 31 = 0),
            ded AS (SELECT user_id, ts, arg_max(value, event_id) AS value
                    FROM ev GROUP BY user_id, ts),
            b AS (SELECT user_id,
                         date_trunc('hour', min(ts) + INTERVAL 1 HOUR
                                    - INTERVAL 1 MICROSECOND) AS h0,
                         date_trunc('hour', max(ts)) AS h1
                  FROM ev GROUP BY user_id),
            grid AS (SELECT user_id,
                            unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS gt
                     FROM b WHERE h0 <= h1)
            SELECT grid.user_id AS user_id, gt, ded.value AS value
            FROM grid ASOF JOIN ded
              ON grid.user_id = ded.user_id AND grid.gt >= ded.ts
            ORDER BY user_id, gt
        """,
        # Markov transition counts: LAG window pairs, exact counts, one
        # IEEE division for the conditional probability
        # k-anonymity / l-diversity audit: exact counts, integer flags
        "k_anonymity_audit": """
            WITH q AS (SELECT event_type, hour(ts)::BIGINT AS hour,
                              (CAST(floor(value*100 + 0.5) AS BIGINT) // 1000)
                                  AS bucket,
                              user_id
                       FROM events),
            a AS (SELECT event_type, hour, bucket,
                         count(*)::BIGINT AS n_rows,
                         count(DISTINCT user_id)::BIGINT AS n_users
                  FROM q GROUP BY 1, 2, 3)
            SELECT event_type, hour, bucket, n_rows, n_users,
                   (CASE WHEN n_rows < 5 THEN 1 ELSE 0 END)::BIGINT AS k_violation,
                   (CASE WHEN n_users < 3 THEN 1 ELSE 0 END)::BIGINT AS l_violation
            FROM a ORDER BY event_type, hour, bucket
        """,
        # truncated dyadic EMA: every weight 2^(31-j) is exact, num/den are
        # exact int64, ema is ONE IEEE division — bit-equal by construction
        "ema_user_value": """
            WITH v AS (SELECT user_id, ts, event_id,
                              CAST(floor(value*100 + 0.5) AS BIGINT) AS cents,
                              row_number() OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id) AS rn
                       FROM events),
            j AS (SELECT a.user_id, a.ts, a.event_id, a.cents,
                         sum(b.cents
                             * (1::BIGINT << (31 - (a.rn - b.rn))))::BIGINT AS num,
                         ((1::BIGINT << 32)
                          - (1::BIGINT << (31 - least(a.rn - 1, 31))))::BIGINT AS den
                  FROM v a JOIN v b
                    ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 31 AND a.rn
                  GROUP BY 1, 2, 3, 4, a.rn)
            SELECT user_id, event_id, ts, cents, num, den,
                   num::DOUBLE / den::DOUBLE AS ema
            FROM j ORDER BY user_id, ts, event_id
        """,
        "event_transitions": """
            WITH s AS (SELECT user_id, event_type,
                              lead(event_type) OVER (
                                  PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nxt
                       FROM events),
            c AS (SELECT event_type AS from_type, nxt AS to_type,
                         count(*)::BIGINT AS n
                  FROM s WHERE nxt IS NOT NULL
                  GROUP BY from_type, to_type),
            tot AS (SELECT from_type, sum(n)::BIGINT AS t FROM c
                    GROUP BY from_type)
            SELECT c.from_type, c.to_type, c.n,
                   c.n::DOUBLE / tot.t::DOUBLE AS prob
            FROM c JOIN tot USING (from_type)
            ORDER BY from_type, to_type
        """,
        # exact OLS per event type: integer sufficient stats (hours since
        # 2024-01-01 x integer cents), HUGEINT closed-form combine, one
        # double division per coefficient (bit-equal to the python-int path)
        "ols_trend": """
            WITH b AS (SELECT event_type,
                              (epoch_us(ts) // 3600000000 - 473352)::BIGINT AS x,
                              CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
                       FROM events),
            g AS (SELECT event_type, count(*)::BIGINT n, sum(x)::BIGINT sx,
                         sum(y)::BIGINT sy, sum(x * y)::BIGINT sxy,
                         sum(x * x)::BIGINT sxx
                  FROM b GROUP BY event_type),
            s AS (SELECT *, CASE WHEN den = 0 THEN 0.0
                                 ELSE num::DOUBLE / den::DOUBLE END AS slope
                  FROM (SELECT *,
                               n::HUGEINT * sxy::HUGEINT
                               - sx::HUGEINT * sy::HUGEINT AS num,
                               n::HUGEINT * sxx::HUGEINT
                               - sx::HUGEINT * sx::HUGEINT AS den
                        FROM g))
            SELECT event_type, n, sx, sy, sxy, sxx, slope,
                   (sy::DOUBLE - slope * sx::DOUBLE) / n::DOUBLE AS intercept
            FROM s ORDER BY event_type
        """,
        # DTW between top-16 users' 24-point hour-of-day profiles: the
        # frechet_pairs recursive two-layer diagonal walk with + for max
        "dtw_pairs": """
            WITH RECURSIVE
            c AS (SELECT user_id, hour(ts)::BIGINT AS h, count(*)::BIGINT AS n
                  FROM events GROUP BY 1, 2),
            tk AS (SELECT user_id
                   FROM (SELECT user_id, sum(n) AS tot FROM c GROUP BY 1)
                   ORDER BY tot DESC, user_id LIMIT 16),
            hrs AS (SELECT unnest(range(0, 24))::BIGINT AS h),
            p AS (SELECT tk.user_id, hrs.h, COALESCE(c.n, 0)::BIGINT AS n
                  FROM tk CROSS JOIN hrs
                  LEFT JOIN c ON c.user_id = tk.user_id AND c.h = hrs.h),
            pairs AS (SELECT a.user_id AS ua, b.user_id AS ub
                      FROM tk a JOIN tk b ON a.user_id < b.user_id),
            dmat AS (SELECT pr.ua, pr.ub, pa.h AS i, pb.h AS j,
                            abs(pa.n - pb.n) AS d
                     FROM pairs pr
                     JOIN p pa ON pa.user_id = pr.ua
                     JOIN p pb ON pb.user_id = pr.ub),
            walk(ua, ub, i, j, layer, val) AS (
                SELECT ua, ub, 0::BIGINT, 0::BIGINT, 1, d
                FROM dmat WHERE i = 0 AND j = 0
              UNION ALL
                SELECT * FROM (
                  WITH nxt AS (
                    SELECT w.ua, w.ub, w.i + mv.dx AS i, w.j + mv.dy AS j,
                           min(w.val) AS pv
                    FROM walk w
                    JOIN (VALUES (1, 1, 0), (1, 0, 1), (0, 1, 1))
                         mv(layer, dx, dy) ON mv.layer = w.layer
                    GROUP BY 1, 2, 3, 4)
                  SELECT n.ua, n.ub, n.i, n.j, 1 AS layer, d.d + n.pv AS val
                  FROM nxt n JOIN dmat d ON d.ua = n.ua AND d.ub = n.ub
                                        AND d.i = n.i AND d.j = n.j
                  UNION ALL
                  SELECT ua, ub, i, j, 0 AS layer, val
                  FROM walk WHERE layer = 1
                )
            )
            SELECT ua AS user_a, ub AS user_b, val::BIGINT AS dtw
            FROM walk WHERE layer = 1 AND i = 23 AND j = 23
            ORDER BY user_a, user_b
        """,
        # throttle: recursive CTE advances every (user, type) partition one
        # EMISSION per iteration (suppression chains off emitted events, so
        # lag() can't express it); n_suppressed via tuple-compare counts
        "throttle_events": """
            WITH RECURSIVE
            ev AS (SELECT user_id, event_type, ts, event_id FROM events),
            seed AS (SELECT user_id, event_type, ts, event_id
                     FROM (SELECT *, row_number() OVER (
                               PARTITION BY user_id, event_type
                               ORDER BY ts, event_id) AS rn FROM ev)
                     WHERE rn = 1),
            walk(user_id, event_type, ts, event_id) AS (
                SELECT * FROM seed
              UNION ALL
                SELECT user_id, event_type, ts, event_id FROM (
                  SELECT e.user_id, e.event_type, e.ts, e.event_id,
                         row_number() OVER (
                             PARTITION BY e.user_id, e.event_type
                             ORDER BY e.ts, e.event_id) AS rn
                  FROM walk w
                  JOIN ev e ON e.user_id = w.user_id
                           AND e.event_type = w.event_type
                           AND e.ts >= w.ts + INTERVAL 10 MINUTE
                ) WHERE rn = 1
            )
            SELECT w.user_id, w.event_type, w.ts, w.event_id,
                   (SELECT count(*) FROM ev e
                    WHERE e.user_id = w.user_id
                      AND e.event_type = w.event_type
                      AND (e.ts, e.event_id) > (w.ts, w.event_id)
                      AND (w.nxt_ts IS NULL
                           OR (e.ts, e.event_id) < (w.nxt_ts, w.nxt_id)))
                       ::BIGINT AS n_suppressed
            FROM (SELECT *, lead(ts) OVER win AS nxt_ts,
                         lead(event_id) OVER win AS nxt_id
                  FROM walk
                  WINDOW win AS (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id)) w
            ORDER BY user_id, event_type, ts, event_id
        """,
        # SCD-2 compaction: lag() run breaks -> cumulative run id -> group
        # -> lead() of the run start as valid_to (NULL on each user's last run)
        "scd2_intervals": """
            WITH o AS (SELECT user_id, event_type, ts, event_id,
                              CASE WHEN lag(event_type) OVER w IS NULL
                                        OR lag(event_type) OVER w <> event_type
                                   THEN 1 ELSE 0 END AS brk
                       FROM events
                       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            r AS (SELECT user_id, event_type, ts,
                         SUM(brk) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS rid
                  FROM o),
            g AS (SELECT user_id, rid, min(event_type) AS event_type,
                         min(ts) AS valid_from, count(*)::BIGINT AS n_events
                  FROM r GROUP BY user_id, rid)
            SELECT user_id, event_type, valid_from,
                   lead(valid_from) OVER (PARTITION BY user_id
                                          ORDER BY rid) AS valid_to,
                   n_events
            FROM g ORDER BY user_id, valid_from, event_type
        """,
        # interval-union coverage: gaps-and-islands over fixed 10-min spans;
        # exact-abutment merges (strict > starts a new island)
        "interval_coverage": """
            WITH t AS (SELECT user_id, event_id, ts,
                              ts + INTERVAL 10 MINUTE AS e
                       FROM events),
            w AS (SELECT user_id, ts, e,
                         max(e) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS prev_max,
                         event_id
                  FROM t),
            isl AS (SELECT *,
                           (CASE WHEN prev_max IS NULL OR ts > prev_max
                                 THEN 1 ELSE 0 END) AS st
                    FROM w),
            num AS (SELECT *,
                           sum(st) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS isl_id
                    FROM isl),
            agg AS (SELECT user_id, isl_id,
                           epoch_us(max(e) - min(ts))::BIGINT AS len
                    FROM num GROUP BY user_id, isl_id)
            SELECT user_id, count(*)::BIGINT AS n_islands,
                   sum(len)::BIGINT AS covered_us
            FROM agg GROUP BY user_id ORDER BY user_id
        """,
        # hourly linear-interpolation grid: same grid/tie rules as LOCF;
        # the lerp's IEEE op order matches the engine exactly (µs ints →
        # DOUBLE, one divide, one multiply, one add)
        "resample_lerp": """
            WITH ev AS (SELECT user_id, ts, event_id, value
                        FROM events WHERE user_id % 31 = 0),
            ded AS (SELECT user_id, ts, arg_max(value, event_id) AS value
                    FROM ev GROUP BY user_id, ts),
            b AS (SELECT user_id,
                         date_trunc('hour', min(ts) + INTERVAL 1 HOUR
                                    - INTERVAL 1 MICROSECOND) AS h0,
                         date_trunc('hour', max(ts)) AS h1
                  FROM ev GROUP BY user_id),
            grid AS (SELECT user_id,
                            unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS gt
                     FROM b WHERE h0 <= h1),
            prev AS (SELECT grid.user_id AS user_id, gt, ded.ts AS t0,
                            ded.value AS v0
                     FROM grid ASOF JOIN ded
                       ON grid.user_id = ded.user_id AND grid.gt >= ded.ts),
            nxt AS (SELECT grid.user_id AS user_id, gt, ded.ts AS t1,
                           ded.value AS v1
                    FROM grid ASOF LEFT JOIN ded
                      ON grid.user_id = ded.user_id AND grid.gt < ded.ts)
            SELECT p.user_id AS user_id, p.gt AS gt,
                   CASE WHEN n.t1 IS NULL OR p.t0 = p.gt THEN p.v0
                        ELSE p.v0 + (n.v1 - p.v0)
                             * (epoch_us(p.gt - p.t0)::DOUBLE
                                / epoch_us(n.t1 - p.t0)::DOUBLE)
                   END AS value
            FROM prev p JOIN nxt n ON p.user_id = n.user_id AND p.gt = n.gt
            ORDER BY user_id, gt
        """,
        # Gopher gates as exact integer comparisons (see engine docstring)
        "gopher_quality_filter": """
            WITH t AS (SELECT doc_id,
                              regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS ws
                       FROM documents),
            tc AS (SELECT doc_id, j, ws[j] AS w
                   FROM t, LATERAL (SELECT unnest(generate_series(1, len(ws))) AS j)),
            tops AS (SELECT doc_id, MAX(c)::BIGINT AS top_count FROM
                       (SELECT doc_id, w, count(*) AS c FROM tc GROUP BY doc_id, w)
                     GROUP BY doc_id),
            base AS (SELECT doc_id,
                            len(ws)::BIGINT AS n_tokens,
                            COALESCE(list_sum(list_transform(ws, x -> length(x))), 0)::BIGINT AS sum_tok_chars,
                            len(list_distinct(ws))::BIGINT AS n_distinct,
                            len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))::BIGINT AS n_alpha
                     FROM t)
            SELECT base.doc_id, n_tokens, sum_tok_chars, n_distinct,
                   COALESCE(tops.top_count, 0)::BIGINT AS top_count, n_alpha,
                   (CASE WHEN n_tokens >= 50 AND n_tokens <= 100000
                          AND 3 * n_tokens <= sum_tok_chars
                          AND sum_tok_chars <= 10 * n_tokens
                          AND 10 * (n_tokens - n_distinct) <= 8 * n_tokens
                          AND 5 * COALESCE(tops.top_count, 0) <= n_tokens
                          AND 5 * n_alpha >= 4 * n_tokens
                         THEN 1 ELSE 0 END)::BIGINT AS passes
            FROM base LEFT JOIN tops USING (doc_id)
            ORDER BY doc_id
        """,
        # T5 denoising layout: arithmetic mask rule + gaps-and-islands spans
        "span_corruption": """
            WITH t AS (SELECT doc_id,
                              regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS ws
                       FROM documents),
            toks AS (SELECT doc_id, j, ws[j] AS w,
                            ((doc_id * 1000003 + (j - 1) * 10007) % 5 = 0) AS m
                     FROM t, LATERAL (SELECT unnest(generate_series(1, len(ws))) AS j)),
            f AS (SELECT *, (m AND NOT COALESCE(
                         LAG(m) OVER (PARTITION BY doc_id ORDER BY j), FALSE)) AS fst
                  FROM toks),
            k AS (SELECT *, (SUM(CASE WHEN fst THEN 1 ELSE 0 END)
                                 OVER (PARTITION BY doc_id ORDER BY j) - 1) AS sid
                  FROM f),
            agg AS (SELECT doc_id,
                           string_agg(CASE WHEN NOT m THEN w
                                           WHEN fst THEN '<extra_id_' || sid || '>'
                                      END, ' ' ORDER BY j) AS inputs,
                           string_agg(CASE WHEN m THEN
                                        (CASE WHEN fst THEN '<extra_id_' || sid || '> ' || w
                                              ELSE w END)
                                      END, ' ' ORDER BY j) AS targets,
                           SUM(CASE WHEN m THEN 1 ELSE 0 END)::BIGINT AS n_masked
                    FROM k GROUP BY doc_id)
            SELECT d.doc_id,
                   COALESCE(agg.inputs, '') AS inputs,
                   COALESCE(agg.targets, '') AS targets,
                   COALESCE(agg.n_masked, 0)::BIGINT AS n_masked
            FROM (SELECT doc_id FROM documents) d
            LEFT JOIN agg USING (doc_id)
            ORDER BY doc_id
        """,
        # causal-LM packing layout: pure integer window cumsum — exact
        "pack_sequences": """
            WITH t AS (SELECT doc_id,
                              len(regexp_extract_all(lower(text), '[A-Za-z0-9_]+'))::BIGINT AS n_tokens
                       FROM documents),
            s AS (SELECT doc_id, n_tokens,
                         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS tok_start
                  FROM t)
            SELECT doc_id, tok_start, n_tokens,
                   (tok_start // 512)::BIGINT AS bin_start,
                   ((CASE WHEN n_tokens = 0 THEN tok_start
                          ELSE tok_start + n_tokens - 1 END) // 512)::BIGINT AS bin_end
            FROM s ORDER BY doc_id
        """,
        # sorted-neighborhood candidates: rn window over the (key, doc_id)
        # total order; verification is the exact integer test 2·|∩| ≥ |∪|
        "snm_pairs": """
            WITH t AS (SELECT doc_id, substr(lower(text), 1, 24) AS k,
                              list_distinct(regexp_extract_all(lower(text), '[A-Za-z0-9_]+')) AS ws
                       FROM documents),
            r AS (SELECT doc_id, k, ws,
                         row_number() OVER (ORDER BY k, doc_id) AS rn
                  FROM t),
            p AS (SELECT a.doc_id AS da, b.doc_id AS db, a.ws AS wa, b.ws AS wb
                  FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 3),
            j AS (SELECT least(da, db)::BIGINT AS doc_a,
                         greatest(da, db)::BIGINT AS doc_b,
                         len(list_intersect(wa, wb))::BIGINT AS inter,
                         (len(wa) + len(wb) - len(list_intersect(wa, wb)))::BIGINT AS uni
                  FROM p)
            SELECT doc_a, doc_b, inter, uni FROM j
            WHERE uni > 0 AND 2 * inter >= uni
            ORDER BY doc_a, doc_b
        """,
        # degree-ordered wedge triangle counting: TRUE SQL 3-way self-join
        # over the distinct co-supplier edge set (exact integers)
        "triangle_counts": """
            WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
            e AS (SELECT DISTINCT a.l_suppkey AS sa, b.l_suppkey AS sb
                  FROM ps a JOIN ps b
                    ON a.l_partkey = b.l_partkey
                   AND a.l_suppkey < b.l_suppkey),
            t AS (SELECT e1.sa AS x, e1.sb AS y, e2.sb AS z
                  FROM e e1
                  JOIN e e2 ON e2.sa = e1.sb
                  JOIN e e3 ON e3.sa = e1.sa AND e3.sb = e2.sb),
            n AS (SELECT unnest([x, y, z]) AS s_suppkey FROM t)
            SELECT s_suppkey, count(*)::BIGINT AS n_triangles
            FROM n GROUP BY 1 ORDER BY 1
        """,
        # HITS (iters=2) in exact unnormalized integers: a₁ = indegree
        # (h₀ ≡ 1), then h₁ = Σ a₁, a₂ = Σ h₁, h₂ = Σ a₂ over the distinct
        # customer→supplier edge set; HUGEINT keeps the growing sums exact
        "hits_trade": """
            WITH e AS (
                SELECT DISTINCT o_custkey AS u, l_suppkey AS v
                FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            ),
            a1 AS (SELECT v, count(*)::HUGEINT AS s FROM e GROUP BY v),
            h1 AS (SELECT u, sum(a1.s)::HUGEINT AS s FROM e JOIN a1 USING (v)
                   GROUP BY u),
            a2 AS (SELECT v, sum(h1.s)::HUGEINT AS s FROM e JOIN h1 USING (u)
                   GROUP BY v),
            h2 AS (SELECT u, sum(a2.s)::HUGEINT AS s FROM e JOIN a2 USING (v)
                   GROUP BY u),
            ranked AS (
                SELECT 'authority' AS role, v AS node_id, s,
                       row_number() OVER (ORDER BY s DESC, v) AS rank FROM a2
                UNION ALL
                SELECT 'hub', u, s,
                       row_number() OVER (ORDER BY s DESC, u) FROM h2
            )
            SELECT role, node_id, s::BIGINT AS score, rank::BIGINT AS rank
            FROM ranked WHERE rank <= 20 ORDER BY role, rank
        """,
        # butterflies: pair co-supply counts via self-join, then the exact
        # closed form C(cp,2) summed per endpoint; zero-rows kept via the
        # supplier left join
        "butterfly_counts": """
            WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
            pr AS (SELECT a.l_suppkey AS sa, b.l_suppkey AS sb,
                          count(*)::BIGINT AS cp
                   FROM ps a JOIN ps b
                     ON a.l_partkey = b.l_partkey
                    AND a.l_suppkey < b.l_suppkey
                   GROUP BY 1, 2),
            contrib AS (SELECT sa AS s, cp * (cp - 1) // 2 AS bf FROM pr
                        UNION ALL
                        SELECT sb AS s, cp * (cp - 1) // 2 AS bf FROM pr)
            SELECT su.s_suppkey, COALESCE(sum(c.bf), 0)::BIGINT AS butterflies
            FROM supplier su LEFT JOIN contrib c ON c.s = su.s_suppkey
            GROUP BY 1 ORDER BY 1
        """,
        # degree assortativity: exact integer sufficient stats over the
        # directed edge list, HUGEINT combine, one double div by one sqrt
        "degree_assortativity": """
            WITH e0 AS (SELECT DISTINCT o_custkey AS a, 1000000 + l_suppkey AS b
                        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
            ed AS (SELECT a AS src, b AS dst FROM e0
                   UNION ALL SELECT b AS src, a AS dst FROM e0),
            dg AS (SELECT src AS node, count(*)::BIGINT AS deg
                   FROM ed GROUP BY 1),
            xy AS (SELECT da.deg AS x, db.deg AS y
                   FROM ed JOIN dg da ON da.node = ed.src
                           JOIN dg db ON db.node = ed.dst),
            g AS (SELECT count(*)::BIGINT m, sum(x)::BIGINT sx,
                         sum(y)::BIGINT sy, sum(x * y)::BIGINT sxy,
                         sum(x * x)::BIGINT sxx, sum(y * y)::BIGINT syy
                  FROM xy)
            SELECT m, sx, sy, sxy, sxx, syy,
                   CASE WHEN (m::HUGEINT * sxx::HUGEINT
                              - sx::HUGEINT * sx::HUGEINT) = 0
                          OR (m::HUGEINT * syy::HUGEINT
                              - sy::HUGEINT * sy::HUGEINT) = 0
                        THEN 0.0
                        ELSE (m::HUGEINT * sxy::HUGEINT
                              - sx::HUGEINT * sy::HUGEINT)::DOUBLE
                             / sqrt(((m::HUGEINT * sxx::HUGEINT
                                      - sx::HUGEINT * sx::HUGEINT)
                                     * (m::HUGEINT * syy::HUGEINT
                                        - sy::HUGEINT * sy::HUGEINT))::DOUBLE)
                   END AS r
            FROM g
        """,
        # exact scaled-integer PageRank (d=17/20, floor division) — integer
        # sums are order-free, so the unrolled SQL is bit-equal to the engine
        # multi-source BFS: recursive frontier CTE; UNION dedups (node, hops)
        # rows so each node expands at most once per hop level
        "bfs_hops": """
            WITH RECURSIVE edges AS (
              SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
              FROM orders JOIN lineitem ON l_orderkey = o_orderkey
              UNION
              SELECT DISTINCT l_suppkey + 1000000 AS src, o_custkey AS dst
              FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            ),
            bfs(node_id, hops) AS (
              SELECT c_custkey, 0 FROM customer WHERE c_custkey % 97 = 0
              UNION
              SELECT e.dst, b.hops + 1 FROM bfs b
              JOIN edges e ON e.src = b.node_id
              WHERE b.hops < 4
            )
            SELECT node_id, min(hops)::BIGINT AS hops FROM bfs
            GROUP BY node_id ORDER BY node_id
        """,
        "pagerank_trade": """
            WITH e0 AS (SELECT DISTINCT o_custkey AS a, l_suppkey AS b
                        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
            edges AS (SELECT a AS src, 1000000 + b AS dst FROM e0
                      UNION ALL SELECT 1000000 + b AS src, a AS dst FROM e0),
            deg AS (SELECT src, count(*)::BIGINT AS outdeg FROM edges GROUP BY src),
            nodes AS (SELECT DISTINCT src AS node FROM edges),
            r0 AS (SELECT node, 1000000000000::BIGINT AS r FROM nodes),
            r1 AS (SELECT n.node,
                          (150000000000 + COALESCE(SUM((17 * r.r) // (20 * d.outdeg)), 0))::BIGINT AS r
                   FROM nodes n
                   LEFT JOIN edges e ON e.dst = n.node
                   LEFT JOIN r0 r ON r.node = e.src
                   LEFT JOIN deg d ON d.src = e.src
                   GROUP BY n.node),
            r2 AS (SELECT n.node,
                          (150000000000 + COALESCE(SUM((17 * r.r) // (20 * d.outdeg)), 0))::BIGINT AS r
                   FROM nodes n
                   LEFT JOIN edges e ON e.dst = n.node
                   LEFT JOIN r1 r ON r.node = e.src
                   LEFT JOIN deg d ON d.src = e.src
                   GROUP BY n.node),
            r3 AS (SELECT n.node,
                          (150000000000 + COALESCE(SUM((17 * r.r) // (20 * d.outdeg)), 0))::BIGINT AS r
                   FROM nodes n
                   LEFT JOIN edges e ON e.dst = n.node
                   LEFT JOIN r2 r ON r.node = e.src
                   LEFT JOIN deg d ON d.src = e.src
                   GROUP BY n.node),
            r4 AS (SELECT n.node,
                          (150000000000 + COALESCE(SUM((17 * r.r) // (20 * d.outdeg)), 0))::BIGINT AS r
                   FROM nodes n
                   LEFT JOIN edges e ON e.dst = n.node
                   LEFT JOIN r3 r ON r.node = e.src
                   LEFT JOIN deg d ON d.src = e.src
                   GROUP BY n.node),
            r5 AS (SELECT n.node,
                          (150000000000 + COALESCE(SUM((17 * r.r) // (20 * d.outdeg)), 0))::BIGINT AS r
                   FROM nodes n
                   LEFT JOIN edges e ON e.dst = n.node
                   LEFT JOIN r4 r ON r.node = e.src
                   LEFT JOIN deg d ON d.src = e.src
                   GROUP BY n.node)
            SELECT node AS node_id, r AS pr FROM r5
            ORDER BY pr DESC, node_id LIMIT 25
        """,
        # resource-allocation link prediction (Zhou+ 2009): RA kept as the
        # order-free scaled integer Σ 10^12 // S_z; jaccard is ONE IEEE
        # division of exact int64s — bit-equal without tolerance
        "ra_links": """
            WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
            pdeg AS (SELECT l_partkey, count(*)::BIGINT AS s FROM ps GROUP BY 1),
            sdeg AS (SELECT l_suppkey, count(*)::BIGINT AS d FROM ps GROUP BY 1),
            pairs AS (SELECT a.l_suppkey sa, b.l_suppkey sb, p.s
                      FROM ps a
                      JOIN ps b ON a.l_partkey = b.l_partkey
                               AND a.l_suppkey < b.l_suppkey
                      JOIN pdeg p ON p.l_partkey = a.l_partkey),
            agg AS (SELECT sa, sb, count(*)::BIGINT AS n_common,
                           sum(1000000000000 // s)::BIGINT AS ra_int
                    FROM pairs GROUP BY 1, 2)
            SELECT sa, sb, n_common, ra_int,
                   n_common::DOUBLE / (da.d + db.d - n_common)::DOUBLE AS jaccard
            FROM agg
            JOIN sdeg da ON da.l_suppkey = sa
            JOIN sdeg db ON db.l_suppkey = sb
            ORDER BY ra_int DESC, sa, sb LIMIT 50
        """,
        "scrub_dup_ngrams": """
            WITH t AS (SELECT doc_id,
                              regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS ws
                       FROM documents),
            s AS (SELECT doc_id, i, array_to_string(ws[i:i+7], ' ') AS gram
                  FROM t, LATERAL (SELECT unnest(generate_series(1, greatest(len(ws) - 7, 0))) AS i)),
            bad AS (SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM s)
                    GROUP BY gram HAVING count(*) > 1),
            cov AS (SELECT DISTINCT s.doc_id, s.i + o AS pos
                    FROM s JOIN bad USING (gram),
                         LATERAL (SELECT unnest(generate_series(0, 7)) AS o)),
            toks AS (SELECT doc_id, j, ws[j] AS w
                     FROM t, LATERAL (SELECT unnest(generate_series(1, len(ws))) AS j)),
            kept AS (SELECT toks.doc_id,
                            string_agg(w, ' ' ORDER BY j) AS text_clean,
                            count(*)::BIGINT AS n_kept
                     FROM toks LEFT JOIN cov
                       ON toks.doc_id = cov.doc_id AND toks.j = cov.pos
                     WHERE cov.pos IS NULL GROUP BY toks.doc_id)
            SELECT t.doc_id,
                   COALESCE(kept.text_clean, '') AS text_clean,
                   COALESCE(kept.n_kept, 0)::BIGINT AS n_kept,
                   (len(ws) - COALESCE(kept.n_kept, 0))::BIGINT AS n_removed
            FROM t LEFT JOIN kept USING (doc_id)
            ORDER BY doc_id
        """,
        "bm25_search": """
            WITH toks AS (
                SELECT doc_id,
                       lower(unnest(regexp_extract_all(text, '[A-Za-z0-9_]+')))
                           AS token
                FROM documents),
            dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY doc_id),
            st AS (SELECT (SELECT count(*) FROM documents)::BIGINT n_docs,
                          (SELECT count(*) FROM toks)::BIGINT total),
            tf AS (SELECT doc_id, token, count(*)::BIGINT tf FROM toks
                   WHERE token IN ('join', 'scan', 'dup') GROUP BY doc_id, token),
            df AS (SELECT token, count(DISTINCT doc_id)::BIGINT df FROM toks
                   WHERE token IN ('join', 'scan', 'dup') GROUP BY token),
            -- parenthesization mirrors the engine op-for-op (bit-parity)
            w AS (SELECT tf.doc_id, tf.token,
                   (((st.n_docs - df.df)::DOUBLE + 0.5) / (df.df::DOUBLE + 0.5))
                   * ((tf.tf::DOUBLE * 2.2) / (tf.tf::DOUBLE
                       + 1.2 * (0.25 + 0.75 * (dl.dl::DOUBLE
                                               / (st.total::DOUBLE / st.n_docs::DOUBLE)))))
                       AS w
                  FROM tf JOIN dl USING (doc_id), st
                       JOIN df ON tf.token = df.token),
            p AS (SELECT doc_id,
                   (COALESCE(MAX(CASE WHEN token = 'join' THEN w END), 0)
                    + COALESCE(MAX(CASE WHEN token = 'scan' THEN w END), 0))
                    + COALESCE(MAX(CASE WHEN token = 'dup' THEN w END), 0) AS score
                  FROM w GROUP BY doc_id)
            SELECT doc_id, score FROM p WHERE score > 0
            ORDER BY score DESC, doc_id
            LIMIT 15
        """,
        # hybrid retrieval: RRF over the BM25 top-50 (lexical leg, the
        # bm25_search fold verbatim) and the cosine-kNN top-50 (semantic
        # leg, the knn_bruteforce ordered fold); absent-from-a-leg is rank
        # 0, fused score = 1/(60+lex) + 1/(60+sem) in that exact order
        "hybrid_search_rrf": """
            WITH toks AS (
                SELECT doc_id,
                       lower(unnest(regexp_extract_all(text, '[A-Za-z0-9_]+')))
                           AS token
                FROM documents),
            dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY doc_id),
            st AS (SELECT (SELECT count(*) FROM documents)::BIGINT n_docs,
                          (SELECT count(*) FROM toks)::BIGINT total),
            tf AS (SELECT doc_id, token, count(*)::BIGINT tf FROM toks
                   WHERE token IN ('join', 'scan', 'dup') GROUP BY doc_id, token),
            df AS (SELECT token, count(DISTINCT doc_id)::BIGINT df FROM toks
                   WHERE token IN ('join', 'scan', 'dup') GROUP BY token),
            w AS (SELECT tf.doc_id, tf.token,
                   (((st.n_docs - df.df)::DOUBLE + 0.5) / (df.df::DOUBLE + 0.5))
                   * ((tf.tf::DOUBLE * 2.2) / (tf.tf::DOUBLE
                       + 1.2 * (0.25 + 0.75 * (dl.dl::DOUBLE
                                               / (st.total::DOUBLE / st.n_docs::DOUBLE)))))
                       AS w
                  FROM tf JOIN dl USING (doc_id), st
                       JOIN df ON tf.token = df.token),
            p AS (SELECT doc_id,
                   (COALESCE(MAX(CASE WHEN token = 'join' THEN w END), 0)
                    + COALESCE(MAX(CASE WHEN token = 'scan' THEN w END), 0))
                    + COALESCE(MAX(CASE WHEN token = 'dup' THEN w END), 0) AS score
                  FROM w GROUP BY doc_id),
            lex AS (SELECT doc_id,
                           row_number() OVER (ORDER BY score DESC, doc_id)
                               AS lex_rank
                    FROM (SELECT doc_id, score FROM p WHERE score > 0
                          ORDER BY score DESC, doc_id LIMIT 50)),
            q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
            cs AS (SELECT vec_id AS doc_id,
                   round(
                       list_reduce(list_transform(range(1, len(embedding)+1), i -> embedding[i]::DOUBLE * qe[i]::DOUBLE), (x, y) -> x + y)
                       / sqrt(list_reduce(list_transform(range(1, len(embedding)+1), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (x, y) -> x + y)
                              * list_reduce(list_transform(range(1, len(qe)+1), i -> qe[i]::DOUBLE * qe[i]::DOUBLE), (x, y) -> x + y)), 6) AS cosine
                   FROM embeddings, q
                   WHERE vec_id <> 0),
            sem AS (SELECT doc_id,
                           row_number() OVER (ORDER BY cosine DESC, doc_id)
                               AS sem_rank
                    FROM (SELECT doc_id, cosine FROM cs
                          ORDER BY cosine DESC, doc_id LIMIT 50)),
            f AS (SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
                         COALESCE(l.lex_rank, 0)::BIGINT AS lex_rank,
                         COALESCE(s.sem_rank, 0)::BIGINT AS sem_rank
                  FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id)
            SELECT doc_id, lex_rank, sem_rank,
                   (CASE WHEN lex_rank > 0 THEN 1.0 / (60 + lex_rank)
                         ELSE 0.0 END
                    + CASE WHEN sem_rank > 0 THEN 1.0 / (60 + sem_rank)
                           ELSE 0.0 END) AS rrf
            FROM f ORDER BY rrf DESC, doc_id LIMIT 10
        """,
        # Heaps-law vocabulary growth: each type attributed to its
        # min-doc_id first appearance, regrouped per doc, window cumsums
        "vocab_growth": """
            WITH toks AS (
                SELECT doc_id,
                       lower(unnest(regexp_extract_all(text, '[A-Za-z0-9_]+')))
                           AS token
                FROM documents),
            f AS (SELECT token, min(doc_id) AS doc_id FROM toks GROUP BY token),
            nt AS (SELECT doc_id, count(*)::BIGINT AS new_types
                   FROM f GROUP BY doc_id),
            dt AS (SELECT doc_id, count(*)::BIGINT AS doc_tokens
                   FROM toks GROUP BY doc_id)
            SELECT d.doc_id,
                   COALESCE(nt.new_types, 0)::BIGINT AS new_types,
                   (sum(COALESCE(nt.new_types, 0)) OVER w)::BIGINT AS cum_types,
                   COALESCE(dt.doc_tokens, 0)::BIGINT AS doc_tokens,
                   (sum(COALESCE(dt.doc_tokens, 0)) OVER w)::BIGINT AS cum_tokens
            FROM documents d
            LEFT JOIN nt USING (doc_id) LEFT JOIN dt USING (doc_id)
            WINDOW w AS (ORDER BY d.doc_id ROWS UNBOUNDED PRECEDING)
            ORDER BY d.doc_id
        """,
        "heavy_hitters": """
            WITH toks AS (
                SELECT lower(unnest(regexp_extract_all(text, '[A-Za-z0-9_]+')))
                    AS token
                FROM documents),
            c AS (SELECT token, count(*)::BIGINT AS cnt FROM toks GROUP BY token),
            t AS (SELECT count(*)::BIGINT AS total FROM toks)
            SELECT token, cnt FROM c, t
            WHERE cnt * 200 > total
            ORDER BY cnt DESC, token
        """,
        # benchmark decontamination: 5-token-window overlap vs the
        # deterministic doc_id%83 benchmark subset; n_overlap counts the
        # doc's DISTINCT grams hitting the benchmark set
        "decontaminate_docs": """
            WITH t AS (SELECT doc_id,
                              regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS ws
                       FROM documents),
            g0 AS (SELECT doc_id,
                          unnest(list_transform(range(1, len(ws) - 3),
                                 i -> array_to_string(ws[i : i + 4], ' '))) AS gram
                   FROM t WHERE len(ws) >= 5),
            g AS (SELECT DISTINCT doc_id, gram FROM g0),
            b AS (SELECT DISTINCT gram FROM g WHERE doc_id % 83 = 0),
            h AS (SELECT g.doc_id, count(*)::BIGINT AS n_overlap
                  FROM g JOIN b USING (gram) GROUP BY g.doc_id)
            SELECT d.doc_id,
                   coalesce(h.n_overlap, 0)::BIGINT AS n_overlap,
                   (coalesce(h.n_overlap, 0) > 0)::BIGINT AS contaminated
            FROM documents d LEFT JOIN h USING (doc_id)
            ORDER BY doc_id
        """,
        # boilerplate detection: 5-grams by document frequency (ties by gram)
        "frequent_ngrams": """
            WITH t AS (SELECT doc_id,
                              regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS ws
                       FROM documents),
            g0 AS (SELECT doc_id,
                          unnest(list_transform(range(1, len(ws) - 3),
                                 i -> array_to_string(ws[i : i + 4], ' '))) AS gram
                   FROM t WHERE len(ws) >= 5),
            g AS (SELECT DISTINCT doc_id, gram FROM g0)
            SELECT gram, count(*)::BIGINT AS df
            FROM g GROUP BY gram HAVING count(*) >= 2
            ORDER BY df DESC, gram LIMIT 50
        """,
        # boolean AND search over the token stream (inverted-index probe)
        "search_docs_all_terms": """
            WITH t AS (SELECT doc_id,
                              regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS ws
                       FROM documents),
            c AS (SELECT doc_id,
                         len(list_filter(ws, x -> x = 'merge'))  AS c1,
                         len(list_filter(ws, x -> x = 'window')) AS c2,
                         len(list_filter(ws, x -> x = 'batch'))  AS c3
                  FROM t)
            SELECT doc_id, (c1 + c2 + c3)::BIGINT AS n_occurrences
            FROM c WHERE c1 > 0 AND c2 > 0 AND c3 > 0
            ORDER BY doc_id
        """,
        # exact duplicate-span profile: distinct 8-token windows a doc
        # shares verbatim with any other doc (shingle slice is inclusive:
        # ws[i:i+7] = 8 tokens)
        # per-doc n-gram novelty: windows whose corpus-min doc_id is this doc
        "ngram_novelty": """
            WITH s AS (
                SELECT DISTINCT doc_id, array_to_string(ws[i:i+7], ' ') AS gram
                FROM (SELECT doc_id,
                             regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS ws
                      FROM documents),
                     LATERAL (SELECT unnest(generate_series(1, greatest(len(ws) - 7, 0))) AS i)
            ),
            f AS (SELECT gram, min(doc_id) AS first_doc FROM s GROUP BY gram),
            tot AS (SELECT doc_id, count(*)::BIGINT AS n_grams FROM s GROUP BY doc_id),
            nov AS (SELECT first_doc AS doc_id, count(*)::BIGINT AS n_novel
                    FROM f GROUP BY first_doc)
            SELECT tot.doc_id, tot.n_grams,
                   coalesce(nov.n_novel, 0)::BIGINT AS n_novel
            FROM tot LEFT JOIN nov USING (doc_id) ORDER BY doc_id
        """,
        "duplicate_spans": """
            WITH s AS (
                SELECT DISTINCT doc_id, array_to_string(ws[i:i+7], ' ') AS gram
                FROM (SELECT doc_id,
                             regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS ws
                      FROM documents),
                     LATERAL (SELECT unnest(generate_series(1, greatest(len(ws) - 7, 0))) AS i)
            ), df AS (SELECT gram, count(*) AS c FROM s GROUP BY gram)
            SELECT s.doc_id, count(*)::BIGINT AS n_dup_spans
            FROM s JOIN df USING (gram) WHERE df.c > 1
            GROUP BY s.doc_id ORDER BY doc_id
        """,
        # the inverted-index probe must return exactly what the full scan
        # returns — same oracle, independent access path
        "search_docs_indexed": """
            WITH t AS (SELECT doc_id,
                              regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS ws
                       FROM documents),
            c AS (SELECT doc_id,
                         len(list_filter(ws, x -> x = 'merge'))  AS c1,
                         len(list_filter(ws, x -> x = 'window')) AS c2,
                         len(list_filter(ws, x -> x = 'batch'))  AS c3
                  FROM t)
            SELECT doc_id, (c1 + c2 + c3)::BIGINT AS n_occurrences
            FROM c WHERE c1 > 0 AND c2 > 0 AND c3 > 0
            ORDER BY doc_id
        """,
        # deterministic per-language sample: the rank hash is plain BIGINT
        # arithmetic so the oracle is the SAME expression, not a hash library
        "stratified_sample": """
            SELECT doc_id, lang, rn::BIGINT AS rn FROM (
                SELECT doc_id, lang,
                       row_number() OVER (
                           PARTITION BY lang
                           ORDER BY (doc_id % 1000003) * 2654435761 % 4294967296,
                                    doc_id) AS rn
                FROM documents)
            WHERE rn <= 20
            ORDER BY lang, rn
        """,
        # both sides are RE2 (Arrow replace_substring_regex / DuckDB
        # regexp_replace), so the same patterns run verbatim
        "scrub_pii": """
            SELECT doc_id,
                   regexp_replace(
                       regexp_replace(text, '[A-Za-z0-9_.]+@[A-Za-z0-9_.]+',
                                      '<email>', 'g'),
                       '[0-9]{6,}', '<num>', 'g') AS clean_text,
                   (len(regexp_extract_all(text, '[A-Za-z0-9_.]+@[A-Za-z0-9_.]+'))
                    + len(regexp_extract_all(
                          regexp_replace(text, '[A-Za-z0-9_.]+@[A-Za-z0-9_.]+',
                                         '<email>', 'g'),
                          '[0-9]{6,}')))::BIGINT AS n_masked
            FROM documents ORDER BY doc_id
        """,
        # cosine as an explicitly ORDERED double fold (list_reduce is
        # sequential) — bit-identical to the engine's dim-ordered numpy fold;
        # list_cosine_similarity's internal float32 reduction is ~1 ulp off
        # and flips the 6th decimal on real rows
        # range similarity search: rounded-cosine threshold, no LIMIT
        "knn_range": """
            WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
            SELECT vec_id, cosine FROM (
                SELECT vec_id,
                       round(
                           list_reduce(list_transform(range(1, len(embedding)+1), i -> embedding[i]::DOUBLE * qe[i]::DOUBLE), (x, y) -> x + y)
                           / sqrt(list_reduce(list_transform(range(1, len(embedding)+1), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (x, y) -> x + y)
                                  * list_reduce(list_transform(range(1, len(qe)+1), i -> qe[i]::DOUBLE * qe[i]::DOUBLE), (x, y) -> x + y)), 6) AS cosine
                FROM embeddings, q
                WHERE vec_id <> 0
            ) WHERE cosine >= 0.3
            ORDER BY cosine DESC, vec_id ASC
        """,
        # lag-1 autocorrelation sufficient statistics over hourly counts
        "ts_autocorr_stats": """
            WITH hc AS (SELECT event_type, date_trunc('hour', ts) AS hr,
                               count(*)::BIGINT AS c
                        FROM events GROUP BY 1, 2),
            lagd AS (SELECT event_type, c AS x,
                            lead(c) OVER (PARTITION BY event_type
                                          ORDER BY hr) AS y
                     FROM hc)
            SELECT event_type, count(*)::BIGINT AS n_pairs,
                   sum(x * y)::BIGINT AS sxy,
                   sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
                   sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy
            FROM lagd WHERE y IS NOT NULL
            GROUP BY event_type ORDER BY event_type
        """,
        "knn_bruteforce": """
            WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   round(
                       list_reduce(list_transform(range(1, len(embedding)+1), i -> embedding[i]::DOUBLE * qe[i]::DOUBLE), (x, y) -> x + y)
                       / sqrt(list_reduce(list_transform(range(1, len(embedding)+1), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (x, y) -> x + y)
                              * list_reduce(list_transform(range(1, len(qe)+1), i -> qe[i]::DOUBLE * qe[i]::DOUBLE), (x, y) -> x + y)), 6) AS cosine
            FROM embeddings, q
            WHERE vec_id <> 0
            ORDER BY cosine DESC, vec_id ASC
            LIMIT 10
        """,
        # batched exact top-k: 8 query vectors against the corpus; ties on
        # the rounded cosine break by vec_id in BOTH engine and SQL
        "knn_batch": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                       FROM embeddings WHERE vec_id IN (0,1,2,3,4,5,6,7)),
                 s AS (SELECT q.query_id, e.vec_id,
                              round(
                              list_reduce(list_transform(range(1, len(e.embedding)+1), i -> e.embedding[i]::DOUBLE * q.qe[i]::DOUBLE), (x, y) -> x + y)
                              / sqrt(list_reduce(list_transform(range(1, len(e.embedding)+1), i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE), (x, y) -> x + y)
                                     * list_reduce(list_transform(range(1, len(q.qe)+1), i -> q.qe[i]::DOUBLE * q.qe[i]::DOUBLE), (x, y) -> x + y)), 6)
                                  AS cosine
                       FROM q CROSS JOIN embeddings e
                       WHERE e.vec_id <> q.query_id),
                 r AS (SELECT *, ROW_NUMBER() OVER (
                           PARTITION BY query_id
                           ORDER BY cosine DESC, vec_id) AS rank
                       FROM s)
            SELECT query_id, vec_id, cosine, rank
            FROM r WHERE rank <= 10 ORDER BY query_id, rank
        """,
        # contrastive hard-negative mining: knn_batch's ordered-fold cosine
        # restricted to DIFFERENT-label corpus rows (self excluded by label)
        "hard_negatives": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe, label AS qlab
                       FROM embeddings WHERE vec_id IN (0,1,2,3,4,5,6,7)),
                 s AS (SELECT q.query_id, e.vec_id,
                              round(
                              list_reduce(list_transform(range(1, len(e.embedding)+1), i -> e.embedding[i]::DOUBLE * q.qe[i]::DOUBLE), (x, y) -> x + y)
                              / sqrt(list_reduce(list_transform(range(1, len(e.embedding)+1), i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE), (x, y) -> x + y)
                                     * list_reduce(list_transform(range(1, len(q.qe)+1), i -> q.qe[i]::DOUBLE * q.qe[i]::DOUBLE), (x, y) -> x + y)), 6)
                                  AS cosine
                       FROM q CROSS JOIN embeddings e
                       WHERE e.label <> q.qlab),
                 r AS (SELECT *, ROW_NUMBER() OVER (
                           PARTITION BY query_id
                           ORDER BY cosine DESC, vec_id) AS rank
                       FROM s)
            SELECT query_id, vec_id, cosine, rank
            FROM r WHERE rank <= 5 ORDER BY query_id, rank
        """,
        # stopword-count argmax; tie-break = lexicographically largest code
        "lang_id": """
            WITH s AS (
              SELECT doc_id,
                     list_transform(regexp_extract_all(lower(text), '[A-Za-z0-9_]+'),
                                    x -> x) AS ws
              FROM documents
            ), c AS (
              SELECT doc_id,
                len(list_filter(ws, x -> x IN ('the','and','of','to','a','in','is','it','that','with'))) AS s_en,
                len(list_filter(ws, x -> x IN ('der','die','das','und','ist','nicht','ein','mit','für','auf'))) AS s_de,
                len(list_filter(ws, x -> x IN ('le','la','les','et','est','un','une','dans','pour','que'))) AS s_fr
              FROM s)
            SELECT doc_id,
                   CASE WHEN greatest(s_en, s_de, s_fr) = 0 THEN 'und'
                        WHEN s_fr >= s_en AND s_fr >= s_de THEN 'fr'
                        WHEN s_en >= s_de THEN 'en'
                        ELSE 'de' END AS lang_pred
            FROM c ORDER BY doc_id
        """,
        # truth-label × lang_id-prediction confusion matrix (same stopword
        # CASE spec as the lang_id oracle, grouped per pair)
        "lang_confusion": """
            WITH s AS (
              SELECT doc_id, lang,
                     regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS ws
              FROM documents
            ), c AS (
              SELECT doc_id, lang,
                len(list_filter(ws, x -> x IN ('the','and','of','to','a','in','is','it','that','with'))) AS s_en,
                len(list_filter(ws, x -> x IN ('der','die','das','und','ist','nicht','ein','mit','für','auf'))) AS s_de,
                len(list_filter(ws, x -> x IN ('le','la','les','et','est','un','une','dans','pour','que'))) AS s_fr
              FROM s
            ), p AS (
              SELECT lang,
                     CASE WHEN greatest(s_en, s_de, s_fr) = 0 THEN 'und'
                          WHEN s_fr >= s_en AND s_fr >= s_de THEN 'fr'
                          WHEN s_en >= s_de THEN 'en'
                          ELSE 'de' END AS lang_pred
              FROM c)
            SELECT lang, lang_pred, count(*)::BIGINT AS n
            FROM p GROUP BY lang, lang_pred ORDER BY lang, lang_pred
        """,
        # left outer join: customers with no orders keep a zero-defaulted row
        "q_left_join_nulls": """
            SELECT c_custkey,
                   count(o_orderkey)::BIGINT AS n_orders,
                   round(coalesce(sum(o_totalprice), 0), 4) AS total_spent
            FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY c_custkey ORDER BY c_custkey
        """,
        # fingerprint = sum(i * fnv1a64(token_i)) mod 2^64, i 1-based;
        # HUGEINT arithmetic reproduces the engine's uint64 wraparound exactly
        "fingerprints": """
            SELECT doc_id,
                   (coalesce(list_sum(list_transform(
                       regexp_extract_all(lower(text), '[A-Za-z0-9_]+'),
                       (t, i) -> (i::HUGEINT * list_reduce(
                           [14695981039346656037::HUGEINT] ||
                           list_transform(range(1, length(t)+1), j -> ascii(t[j])::HUGEINT),
                           (acc, b) -> (xor(acc::UBIGINT, b::UBIGINT)::HUGEINT
                                        * 1099511628211::HUGEINT)
                                       % 18446744073709551616::HUGEINT
                       )) % 18446744073709551616::HUGEINT
                   )), 0)::HUGEINT % 18446744073709551616::HUGEINT)::UBIGINT AS fingerprint
            FROM documents ORDER BY doc_id
        """,
        # exact prefix-filter set-similarity join (J >= 1/2): the SAME
        # canonical (freq, token) order, prefix rule sz - ceil(sz/2) + 1,
        # both-prefix candidates + size filter, exact intersect verify
        "ssjoin_prefix": """
            WITH dt AS (SELECT DISTINCT doc, t FROM (
                     SELECT doc_id AS doc,
                            unnest(regexp_extract_all(lower(text),
                                   '[A-Za-z0-9_]+')) AS t
                     FROM documents)),
            sz AS (SELECT doc, count(*)::BIGINT AS sz FROM dt GROUP BY doc),
            gf AS (SELECT t, count(*)::BIGINT AS f FROM dt GROUP BY t),
            ordr AS (SELECT dt.doc, dt.t,
                            row_number() OVER (PARTITION BY dt.doc
                                               ORDER BY gf.f, dt.t) AS rnk
                     FROM dt JOIN gf USING (t)),
            pref AS (SELECT o.doc, o.t, s.sz
                     FROM ordr o JOIN sz s USING (doc)
                     WHERE o.rnk <= s.sz - (s.sz + 1) // 2 + 1),
            cand AS (SELECT DISTINCT a.doc AS da, b.doc AS db
                     FROM pref a JOIN pref b
                       ON a.t = b.t AND a.doc < b.doc
                     WHERE 2 * least(a.sz, b.sz) >= greatest(a.sz, b.sz)),
            i AS (SELECT c.da, c.db, count(*)::BIGINT AS inter
                  FROM cand c
                  JOIN dt ta ON ta.doc = c.da
                  JOIN dt tb ON tb.doc = c.db AND tb.t = ta.t
                  GROUP BY 1, 2)
            SELECT c.da AS doc_a, c.db AS doc_b, i.inter,
                   (sa.sz + sb.sz - i.inter)::BIGINT AS union_
            FROM cand c JOIN i ON i.da = c.da AND i.db = c.db
            JOIN sz sa ON sa.doc = c.da JOIN sz sb ON sb.doc = c.db
            WHERE 2 * i.inter >= sa.sz + sb.sz - i.inter
            ORDER BY doc_a, doc_b
        """,
        # AMS F2 sketch vs exact second moment: signs are bits 0..15 of the
        # SAME full-length FNV-1a 64 the fingerprint family uses (HUGEINT
        # wraparound arithmetic); z per replica is a plain integer sum over
        # token occurrences, exact F2 = sum of squared type counts
        "ams_f2": """
            WITH toks AS (SELECT unnest(regexp_extract_all(lower(text),
                                 '[A-Za-z0-9_]+')) AS t
                          FROM documents),
            h AS (SELECT list_reduce(
                      [14695981039346656037::HUGEINT] ||
                      list_transform(range(1, length(t)+1), j -> ascii(t[j])::HUGEINT),
                      (acc, b) -> (xor(acc::UBIGINT, b::UBIGINT)::HUGEINT
                                   * 1099511628211::HUGEINT)
                                  % 18446744073709551616::HUGEINT
                  ) AS h64 FROM toks),
            b(i, d) AS (VALUES (0, 1), (1, 2), (2, 4), (3, 8), (4, 16),
                               (5, 32), (6, 64), (7, 128), (8, 256), (9, 512),
                               (10, 1024), (11, 2048), (12, 4096), (13, 8192),
                               (14, 16384), (15, 32768)),
            z AS (SELECT b.i::BIGINT AS i,
                         sum(1 - 2 * ((h.h64 // b.d::HUGEINT) % 2))::BIGINT AS z
                  FROM h CROSS JOIN b GROUP BY b.i),
            f AS (SELECT sum(c * c)::BIGINT AS f2
                  FROM (SELECT count(*)::BIGINT AS c FROM toks GROUP BY t))
            SELECT z.i, z.z, (z.z * z.z)::BIGINT AS z2, f.f2
            FROM z CROSS JOIN f ORDER BY z.i
        """,
        # winnowing (Schleimer+ 2003): same FNV subexpression as
        # `fingerprints`, gram/window/tie rules packed into ONE integer MIN
        # (key = g·2^20 + (2^20−1−pos) → min == (min g, rightmost pos))
        "winnow_fingerprints": """
            WITH t AS (SELECT doc_id,
                              regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS toks
                       FROM documents),
            h AS (SELECT doc_id, list_transform(toks, t -> (list_reduce(
                      [14695981039346656037::HUGEINT] ||
                      list_transform(range(1, length(t)+1), j -> ascii(t[j])::HUGEINT),
                      (acc, b) -> (xor(acc::UBIGINT, b::UBIGINT)::HUGEINT
                                   * 1099511628211::HUGEINT)
                                  % 18446744073709551616::HUGEINT
                  ) % 4294967296)::BIGINT) AS hs, len(toks) AS n
                  FROM t WHERE len(toks) >= 3),
            g AS (SELECT doc_id,
                         unnest(list_transform(range(1, n - 1),
                             i -> (3*hs[i] + 5*hs[i+1] + 7*hs[i+2]) % 4294967296)) AS gh,
                         unnest(range(0, n - 2)) AS pos
                  FROM h),
            k AS (SELECT doc_id, pos, gh * 1048576 + (1048575 - pos) AS key FROM g),
            w AS (SELECT doc_id, pos,
                         min(key) OVER (PARTITION BY doc_id ORDER BY pos
                                        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS sel,
                         max(pos) OVER (PARTITION BY doc_id) AS maxpos FROM k),
            s AS (SELECT DISTINCT doc_id, (1048575 - (sel % 1048576)) AS pos,
                         sel // 1048576 AS fp
                  FROM w WHERE pos >= 3 OR pos = maxpos)
            SELECT doc_id, pos::BIGINT AS pos, fp::BIGINT AS fp
            FROM s ORDER BY doc_id, pos
        """,
        # τ=1/2 temperature mixing: exact isqrt quotas (float sqrt corrected
        # at perfect-square boundaries), house hash ranks within source
        "temperature_mix": """
            WITH n AS (SELECT source, count(*)::BIGINT AS n
                       FROM documents GROUP BY source),
            q AS (SELECT source, n, floor(sqrt(n::DOUBLE))::BIGINT AS q0 FROM n),
            qq AS (SELECT source,
                          (CASE WHEN (q0+1)*(q0+1) <= n THEN q0+1
                                WHEN q0*q0 > n THEN q0-1 ELSE q0 END) AS quota
                   FROM q),
            r AS (SELECT source, doc_id,
                         row_number() OVER (PARTITION BY source
                             ORDER BY (doc_id % 1000003) * 2654435761
                                      % 4294967296, doc_id) AS rn
                  FROM documents)
            SELECT r.source, r.doc_id, r.rn::BIGINT AS rn
            FROM r JOIN qq USING (source) WHERE r.rn <= qq.quota
            ORDER BY source, rn
        """,
        # content-defined chunking (LBFS rule): window polynomial and chunk
        # Horner fold both mod 2^64 in HUGEINT — bit-equal to the engine's
        # native uint64 wraparound
        "cdc_chunks": """
            WITH d AS (SELECT doc_id, length(text) AS n,
                              list_transform(range(1, length(text)+1),
                                             i -> ascii(text[i])::HUGEINT) AS cl
                       FROM documents WHERE length(text) > 0),
            cuts AS (SELECT doc_id, n, cl,
                            [0] || list_filter(range(8, n+1), i ->
                                list_reduce(
                                    list_transform(range(i-7, i+1), x -> cl[x]),
                                    (a, c) -> (a*263 + c)
                                              % 18446744073709551616::HUGEINT)
                                % 64 = 0) AS cutpos
                     FROM d),
            spans0 AS (SELECT doc_id, n, cl, unnest(cutpos) AS c0 FROM cuts),
            spans AS (SELECT doc_id, n, cl, c0 + 1 AS s,
                             coalesce(lead(c0) OVER (PARTITION BY doc_id
                                                     ORDER BY c0), n) AS e
                      FROM spans0),
            r AS (SELECT doc_id, s, e, cl,
                         row_number() OVER (PARTITION BY doc_id ORDER BY s) - 1
                             AS chunk_id
                  FROM spans WHERE e >= s)
            SELECT doc_id, chunk_id::BIGINT AS chunk_id, (s - 1)::BIGINT AS start,
                   (e - s + 1)::BIGINT AS len,
                   list_reduce(cl[s:e],
                               (a, c) -> (a*263 + c)
                                         % 18446744073709551616::HUGEINT)::UBIGINT
                       AS chunk_hash
            FROM r ORDER BY doc_id, chunk_id
        """,
    } | _naive_oracle_sql() | _composed_oracle_sql()


def _composed_oracle_sql() -> dict[str, str]:
    """Oracle entries composed from other entries' SQL text."""
    from osmi_addresses_ray.oracle import read_tagged_sql

    bf = """
            WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   round(
                       list_reduce(list_transform(range(1, len(embedding)+1), i -> embedding[i]::DOUBLE * qe[i]::DOUBLE), (x, y) -> x + y)
                       / sqrt(list_reduce(list_transform(range(1, len(embedding)+1), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), (x, y) -> x + y)
                              * list_reduce(list_transform(range(1, len(qe)+1), i -> qe[i]::DOUBLE * qe[i]::DOUBLE), (x, y) -> x + y)), 6) AS cosine
            FROM embeddings, q
            WHERE vec_id <> 0
            ORDER BY cosine DESC, vec_id ASC
            LIMIT 10
    """
    hp = read_tagged_sql("knn_hyperplane", "cosine DESC, vec_id", "embeddings")
    return {
        # recall@10 of the LSH top-10 against the exact top-10: the exact
        # side is the true-SQL cosine, the LSH side is its tagged oracle
        "knn_recall": f"""
            WITH bf AS ({bf}), hp AS ({hp})
            SELECT 10::BIGINT AS k, count(*)::BIGINT AS n_hits,
                   round(count(*) / 10.0, 6) AS recall
            FROM bf JOIN hp USING (vec_id)
        """,
    }


def _ensure_default_oracles() -> None:
    """First-run safety: if the driver evaluates oracle SQL before the paired
    query callable has ever run on this machine, the read_parquet paths must
    still exist. Fixture-based oracles are sf-independent; the sf-table ones
    are seeded at the driver's documented correctness scale (sf0.01). Files
    are only written when MISSING — each query callable rewrites its oracle
    for the sf it actually ran at, which is the normal (query-then-SQL)
    path. A version stamp guards the persistent /tmp dir: oracle files
    written by an older code version are cleared first, so SQL-first
    evaluation never reads an oracle inconsistent with the current engine."""
    import os

    from osmi_addresses_ray.oracle import invalidate_stale_oracles, oracle_path

    invalidate_stale_oracles()
    probe = oracle_path("osmi_addresses_entrances")
    if not os.path.exists(probe):
        q = queries()
        for name in (
            "osmi_addresses_entrances",  # writing any layer writes its own file
            "media_features",
            "media_resize",
            "media_audio_features",
            "media_frame_sample",
            "media_scene_cuts",
            "media_dhash",
            "media_sobel",
            "media_audio_windows",
            "media_pitch",
            "media_onsets",
            "media_blobs",
            "media_quadtree",
            "media_motion",
            "media_zcr",
            "media_resample_audio",
            "geohash_cells",
            "hilbert_keys",
            "quad_cells",
            "quad_rollup",
            "pip_entrances_in_buildings",
            "geodesic_lengths",
            "rasterize_nwa",
            "zonal_entrances_per_building",
            "polygonize_nwa",
            "spatial_radius_join",
            "idw_surface",
            "line_simplify",
            "convex_hull_cells",
            "media_histogram",
            "fuzzy_name_pairs",
            "staypoints",
            "hausdorff_pairs",
        ):
            try:
                q[name]("/root/testdata/sf0.01")
            except Exception:
                pass
        for layer in (
            "osmi_addresses_connection_line", "osmi_addresses_nearest_points",
            "osmi_addresses_nearest_roads", "osmi_addresses_nearest_areas",
            "osmi_addresses_interpolation", "osmi_addresses_nodes_with_addresses",
            "osmi_addresses_ways_with_addresses", "osmi_addresses_addrx_on_nonclosed_way",
            "osmi_addresses_ways_with_postal_code",
        ):
            if not os.path.exists(oracle_path(layer)):
                try:
                    q[layer]("/root/testdata/sf0.01")
                except Exception:
                    pass
    from osmi_addresses_ray.oracle import content_tag, tagged_dir

    for name, tag_table in (
        ("simhash_docs", "documents"),
        ("minhash_lsh_pairs", "documents"),
        ("lsh_calibration", "documents"),
        ("ngram_jaccard_dedup", "documents"),
        ("knn_ivf", "embeddings"),
        ("knn_hyperplane", "embeddings"),
        ("embedding_cosine_dedup", "embeddings"),
        ("kmeans_assign", "embeddings"),
        ("semdedup", "embeddings"),
        ("kcore_nodes", "lineitem"),
        ("kll_quantiles", "events"),
        ("pq_codes", "embeddings"),
        ("pq_adc_search", "embeddings"),
        ("pca_project", "embeddings"),
        ("bpe_merges", "documents"),
        ("bpe_encode", "documents"),
        ("kcenter_coreset", "embeddings"),
        ("dedup_clusters", "documents"),
        ("hll_distinct_users", "events"),
        ("cms_token_counts", "documents"),
    ):
        # seed the driver's documented correctness scale (sf0.01) plus the
        # test-suite scale, so SQL-first evaluation right after a code-version
        # invalidation finds the matching tag partition at either scale
        for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.001"):
            try:
                tag = content_tag(sf_dir, tag_table)
            except Exception:
                continue
            if not os.path.isdir(tagged_dir(name, tag)):
                try:
                    queries()[name](sf_dir)
                except Exception:
                    pass


def _naive_oracle_sql() -> dict[str, str]:
    """Oracle entries backed by the pure-Python recomputation parquet (the
    query callable writes it; DuckDB reads it back and the driver
    hash-compares). See osmi_addresses_ray/oracle/llm_ops.py for the specs."""
    from osmi_addresses_ray.oracle import oracle_path, read_parquet_sql, read_tagged_sql

    _ensure_default_oracles()

    out = {
        "simhash_docs": read_tagged_sql("simhash_docs", "doc_id", "documents"),
        "simhash_pairs": read_tagged_sql("simhash_pairs", "doc_a, doc_b", "documents"),
        "minhash_lsh_pairs": read_tagged_sql("minhash_lsh_pairs", "doc_a, doc_b", "documents"),
        "lsh_calibration": read_tagged_sql("lsh_calibration", "bin", "documents"),
        "ngram_jaccard_dedup": read_tagged_sql("ngram_jaccard_dedup", "doc_id", "documents"),
        "knn_ivf": read_tagged_sql("knn_ivf", "cosine DESC, vec_id", "embeddings"),
        "knn_hyperplane": read_tagged_sql(
            "knn_hyperplane", "cosine DESC, vec_id", "embeddings"
        ),
        "embedding_cosine_dedup": read_tagged_sql(
            "embedding_cosine_dedup", "vec_a, vec_b", "embeddings"
        ),
        "kmeans_assign": read_tagged_sql("kmeans_assign", "vec_id", "embeddings"),
        "semdedup": read_tagged_sql("semdedup", "vec_id", "embeddings"),
        "kcore_nodes": read_tagged_sql("kcore_nodes", "node_id", "lineitem"),
        "kll_quantiles": read_tagged_sql("kll_quantiles", "q100", "events"),
        "pq_codes": read_tagged_sql("pq_codes", "vec_id, m", "embeddings"),
        "pq_adc_search": read_tagged_sql("pq_adc_search", "adc_dist, vec_id", "embeddings"),
        "pca_project": read_tagged_sql("pca_project", "vec_id", "embeddings"),
        "bpe_merges": read_tagged_sql("bpe_merges", "rank", "documents"),
        "bpe_encode": read_tagged_sql("bpe_encode", "doc_id", "documents"),
        "kcenter_coreset": read_tagged_sql("kcenter_coreset", "round", "embeddings"),
        "dedup_clusters": read_tagged_sql("dedup_clusters", "doc_id", "documents"),
        "hll_distinct_users": read_tagged_sql("hll_distinct_users", "col_name", "events"),
        "cms_token_counts": read_tagged_sql("cms_token_counts", "token", "documents"),
        "media_features": read_parquet_sql("media_features", "ALL"),
        "media_resize": read_parquet_sql("media_resize", "doc_id, media_ref"),
        "media_audio_features": read_parquet_sql("media_audio_features", "doc_id, media_ref"),
        "media_frame_sample": read_parquet_sql("media_frame_sample", "doc_id, media_ref"),
        "media_scene_cuts": read_parquet_sql("media_scene_cuts", "doc_id, media_ref"),
        "media_dhash": read_parquet_sql("media_dhash", "doc_id, media_ref"),
        "dhash_pairs": read_parquet_sql("dhash_pairs", "ref_a, ref_b"),
        "image_dup_clusters": read_parquet_sql("image_dup_clusters", "cluster, ref"),
        # dissolve: identical hash-grid synthesis in plain SQL arithmetic,
        # recursive min-label closure over same-zone adjacency, exact
        # perimeter 4n - 2*internal
        "polygon_dissolve": """
WITH RECURSIVE
cells AS (SELECT a.i, b.j, a.i * 4096 + b.j AS k
          FROM range(0, 48) a(i), range(0, 48) b(j)),
hp AS (SELECT i, j, (k % 1000003) * 2654435761 % 4294967296 AS h FROM cells),
parc AS (SELECT i, j, i * 48 + j AS pid, (h // 10) % 4 AS zone
         FROM hp WHERE h % 10 < 8),
adj AS (SELECT a.pid AS u, b.pid AS v
        FROM parc a JOIN parc b
          ON ((b.i = a.i AND b.j = a.j + 1) OR (b.i = a.i + 1 AND b.j = a.j))
         AND a.zone = b.zone),
sym AS (SELECT u, v FROM adj UNION ALL SELECT v, u FROM adj),
r AS (SELECT pid AS node, pid AS lab FROM parc
      UNION
      SELECT sym.v AS node, r.lab FROM r JOIN sym ON sym.u = r.node),
comp AS (SELECT node AS pid, min(lab) AS region FROM r GROUP BY node),
internal AS (SELECT c.region, count(*)::BIGINT AS n_int
             FROM adj JOIN comp c ON adj.u = c.pid GROUP BY c.region)
SELECT c.region::BIGINT AS region, min(p.zone)::BIGINT AS zone,
       count(*)::BIGINT AS n_parcels,
       (4 * count(*) - 2 * coalesce(min(i.n_int), 0))::BIGINT AS perimeter
FROM parc p JOIN comp c ON p.pid = c.pid
LEFT JOIN internal i ON i.region = c.region
GROUP BY c.region ORDER BY region
""",
        "media_sobel": read_parquet_sql("media_sobel", "doc_id, media_ref"),
        "media_orient_hist": read_parquet_sql("media_orient_hist", "doc_id, media_ref"),
        "media_hist_eq": read_parquet_sql("media_hist_eq", "doc_id, media_ref"),
        "media_palette": read_parquet_sql("media_palette", "doc_id, media_ref"),
        "media_otsu": read_parquet_sql("media_otsu", "doc_id, media_ref"),
        "media_crest": read_parquet_sql("media_crest", "doc_id, media_ref"),
        "media_audio_windows": read_parquet_sql("media_audio_windows", "doc_id, media_ref"),
        "media_pitch": read_parquet_sql("media_pitch", "doc_id, media_ref"),
        "media_onsets": read_parquet_sql("media_onsets", "doc_id, media_ref"),
        "media_blobs": read_parquet_sql("media_blobs", "doc_id, media_ref"),
        "media_quadtree": read_parquet_sql("media_quadtree", "doc_id, media_ref"),
        "media_motion": read_parquet_sql("media_motion", "doc_id, media_ref"),
        "media_zcr": read_parquet_sql("media_zcr", "doc_id, media_ref"),
        "media_resample_audio": read_parquet_sql("media_resample_audio", "doc_id, media_ref"),
        "geohash_cells": read_parquet_sql("geohash_cells", "node_id, ip_id, lon, lat"),
        "hilbert_keys": read_parquet_sql("hilbert_keys", "node_id, ip_id, lon, lat"),
        "quad_cells": read_parquet_sql("quad_cells", "node_id, ip_id, lon, lat"),
        "quad_rollup": read_parquet_sql("quad_rollup", "cell_l8"),
        # true SQL recomputation of the great-circle kernel: haversine
        # (atan2 form) on sphere R=(2a+b)/3 over raw per-way coordinates
        "geodesic_lengths": f"""
            SELECT way_id,
                   round(list_sum(list_transform(range(1, len(xs)), i ->
                       2.0 * atan2(
                           sqrt(
                               pow(sin(radians(ys[i+1] - ys[i]) / 2.0), 2)
                               + cos(radians(ys[i])) * cos(radians(ys[i+1]))
                                 * pow(sin(radians(xs[i+1] - xs[i]) / 2.0), 2)
                           ),
                           sqrt(1.0 - (
                               pow(sin(radians(ys[i+1] - ys[i]) / 2.0), 2)
                               + cos(radians(ys[i])) * cos(radians(ys[i+1]))
                                 * pow(sin(radians(xs[i+1] - xs[i]) / 2.0), 2)
                           ))
                       ) * ((2.0 * 6378137.0 + 6356752.314245179) / 3.0)
                   )), 6) AS length_m
            FROM read_parquet('{oracle_path('geodesic_lengths')}')
            ORDER BY way_id
        """,
        "pip_entrances_in_buildings": read_parquet_sql(
            "pip_entrances_in_buildings", "point_id, poly_id"
        ),
        # 2-D histogram recomputed in DuckDB from the independent point set
        "rasterize_nwa": f"""
            SELECT floor((lon - {_RASTER_X0!r}) / {_RASTER_RES!r})::BIGINT AS ix,
                   floor((lat - {_RASTER_Y0!r}) / {_RASTER_RES!r})::BIGINT AS iy,
                   count(*)::BIGINT AS n
            FROM read_parquet('{oracle_path('rasterize_nwa_src')}')
            GROUP BY 1, 2 ORDER BY ix, iy
        """,
        # 3x3 box smoothing: histogram x offsets cross-join, regrouped
        "kernel_smooth_nwa": f"""
            WITH r AS (
                SELECT floor((lon - {_RASTER_X0!r}) / {_RASTER_RES!r})::BIGINT AS ix,
                       floor((lat - {_RASTER_Y0!r}) / {_RASTER_RES!r})::BIGINT AS iy,
                       count(*)::BIGINT AS n
                FROM read_parquet('{oracle_path('rasterize_nwa_src')}')
                GROUP BY 1, 2
            ),
            o AS (SELECT a.dx, b.dy
                  FROM (VALUES (-1), (0), (1)) a(dx),
                       (VALUES (-1), (0), (1)) b(dy))
            SELECT r.ix + o.dx AS ix, r.iy + o.dy AS iy, sum(r.n)::BIGINT AS sm
            FROM r CROSS JOIN o
            GROUP BY 1, 2 ORDER BY ix, iy
        """,
        # zone counts recomputed from the independent PIP pairs
        "zonal_entrances_per_building": f"""
            SELECT poly_id, count(*)::BIGINT AS n_points
            FROM read_parquet('{oracle_path('zonal_src')}')
            GROUP BY poly_id ORDER BY poly_id
        """,
        "polygonize_nwa": read_parquet_sql("polygonize_nwa", "ix, iy"),
        # TRUE SQL radius self-join: DuckDB derives the integer point set
        # from the independent nwa recomputation and does the O(n²) sweep
        # with the identical exact-integer distance filter
        "segment_crossings": f"""
            WITH s AS (SELECT * FROM read_parquet('{oracle_path('segments_src')}')),
            o AS (
             SELECT a.way_id wa, a.seg_idx sa, b.way_id wb, b.seg_idx sb,
              ((a.bx-a.ax)::HUGEINT*(b.ay-a.ay)::HUGEINT
               - (a.by-a.ay)::HUGEINT*(b.ax-a.ax)::HUGEINT) o1,
              ((a.bx-a.ax)::HUGEINT*(b.by-a.ay)::HUGEINT
               - (a.by-a.ay)::HUGEINT*(b.bx-a.ax)::HUGEINT) o2,
              ((b.bx-b.ax)::HUGEINT*(a.ay-b.ay)::HUGEINT
               - (b.by-b.ay)::HUGEINT*(a.ax-b.ax)::HUGEINT) o3,
              ((b.bx-b.ax)::HUGEINT*(a.by-b.ay)::HUGEINT
               - (b.by-b.ay)::HUGEINT*(a.bx-b.ax)::HUGEINT) o4
             FROM s a JOIN s b ON a.way_id < b.way_id)
            SELECT wa AS way_a, sa AS seg_a, wb AS way_b, sb AS seg_b
            FROM o
            WHERE ((o1 > 0 AND o2 < 0) OR (o1 < 0 AND o2 > 0))
              AND ((o3 > 0 AND o4 < 0) OR (o3 < 0 AND o4 > 0))
            ORDER BY 1, 2, 3, 4
        """,
        "spatial_radius_join": f"""
            WITH pts AS (
                SELECT DISTINCT
                       CAST(COALESCE(node_id, 10000000 + way_id) AS BIGINT) AS pid,
                       CAST(round(lon * 10000000) AS BIGINT) AS ix,
                       CAST(round(lat * 10000000) AS BIGINT) AS iy
                FROM read_parquet('{oracle_path('spatial_radius_src')}')
                WHERE is_ip = 0
            )
            SELECT a.pid AS id_a, b.pid AS id_b,
                   (a.ix - b.ix) * (a.ix - b.ix)
                   + (a.iy - b.iy) * (a.iy - b.iy) AS dist2
            FROM pts a JOIN pts b ON a.pid < b.pid
            WHERE (a.ix - b.ix) * (a.ix - b.ix)
                  + (a.iy - b.iy) * (a.iy - b.iy) <= 100000000
            ORDER BY id_a, id_b
        """,
        # TRUE SQL IDW surface: O(cells × points) join over the independent
        # nwa source; fixed-point integer terms — bit-equal to the engine's
        # cell-keyed exchange whatever the partitioning
        "idw_surface": f"""
            WITH pts AS (
                SELECT CAST(round(lon * 10000000) AS BIGINT) AS ix,
                       CAST(round(lat * 10000000) AS BIGINT) AS iy,
                       TRY_CAST(regexp_extract(houseno,
                           '^\\s*([+-]?[0-9]+)', 1) AS BIGINT) AS v
                FROM read_parquet('{oracle_path('idw_src')}')
                WHERE is_ip = 0
            ),
            p2 AS (SELECT * FROM pts WHERE v IS NOT NULL AND v > 0),
            g AS (SELECT DISTINCT {_fdiv('ix', 10000)} AS cx,
                                  {_fdiv('iy', 10000)} AS cy FROM p2),
            c AS (SELECT g.cx, g.cy, p.v,
                         (p.ix - (g.cx*10000+5000))*(p.ix - (g.cx*10000+5000))
                       + (p.iy - (g.cy*10000+5000))*(p.iy - (g.cy*10000+5000)) AS d2
                  FROM g, p2 p),
            f AS (SELECT * FROM c WHERE d2 > 0 AND d2 <= 100000000)
            SELECT cx AS cell_x, cy AS cell_y, count(*)::BIGINT AS n_pts,
                   sum((v * 1000000000000) // d2)::BIGINT AS num,
                   sum(1000000000000 // d2)::BIGINT AS den,
                   sum((v * 1000000000000) // d2)::BIGINT::DOUBLE
                     / sum(1000000000000 // d2)::BIGINT::DOUBLE AS idw
            FROM f GROUP BY cx, cy ORDER BY cell_x, cell_y
        """,
        # TRUE SQL rectangle join: O(n²) inequality join over the
        # independently recomputed way-bbox table, exact integer areas;
        # the building side carries the 40000-unit candidate pad
        "bbox_overlap_join": f"""
            WITH r AS (SELECT * FROM read_parquet('{oracle_path('way_bboxes_src')}')),
            a AS (SELECT way_id, x0 - 40000 AS x0, x1 + 40000 AS x1,
                         y0 - 40000 AS y0, y1 + 40000 AS y1
                  FROM r WHERE kind = 'building'),
            b AS (SELECT way_id, x0, x1, y0, y1 FROM r WHERE kind = 'highway')
            SELECT a.way_id AS building_id, b.way_id AS highway_id,
                   (least(a.x1, b.x1) - greatest(a.x0, b.x0))
                   * (least(a.y1, b.y1) - greatest(a.y0, b.y0)) AS overlap_area
            FROM a JOIN b
              ON a.x0 <= b.x1 AND b.x0 <= a.x1
             AND a.y0 <= b.y1 AND b.y0 <= a.y1
            ORDER BY 1, 2
        """,
        # TRUE SQL exact kNN: O(n²) self-join + row_number window over the
        # same independently recomputed point set
        "spatial_knn_join": f"""
            WITH pts AS (
                SELECT DISTINCT
                       CAST(COALESCE(node_id, 10000000 + way_id) AS BIGINT) AS pid,
                       CAST(round(lon * 10000000) AS BIGINT) AS ix,
                       CAST(round(lat * 10000000) AS BIGINT) AS iy
                FROM read_parquet('{oracle_path('spatial_radius_src')}')
                WHERE is_ip = 0
            ),
            d AS (SELECT a.pid AS pid, b.pid AS neighbor_id,
                         (a.ix - b.ix) * (a.ix - b.ix)
                         + (a.iy - b.iy) * (a.iy - b.iy) AS dist2
                  FROM pts a JOIN pts b ON a.pid <> b.pid),
            r AS (SELECT pid, neighbor_id, dist2,
                         row_number() OVER (
                             PARTITION BY pid ORDER BY dist2, neighbor_id) AS rnk
                  FROM d)
            SELECT pid, neighbor_id, rnk::BIGINT AS rnk, dist2
            FROM r WHERE rnk <= 3 ORDER BY pid, rnk
        """,
        # TRUE SQL connected components: recursive-CTE reachability over the
        # radius graph, component label = MIN reachable pid
        "spatial_clusters": f"""
            WITH RECURSIVE pts AS (
                SELECT DISTINCT
                       CAST(COALESCE(node_id, 10000000 + way_id) AS BIGINT) AS pid,
                       CAST(round(lon * 10000000) AS BIGINT) AS ix,
                       CAST(round(lat * 10000000) AS BIGINT) AS iy
                FROM read_parquet('{oracle_path('spatial_radius_src')}')
                WHERE is_ip = 0
            ),
            edges AS (
                SELECT a.pid AS u, b.pid AS v
                FROM pts a JOIN pts b ON a.pid <> b.pid
                WHERE (a.ix - b.ix) * (a.ix - b.ix)
                      + (a.iy - b.iy) * (a.iy - b.iy) <= 100000000
            ),
            reach(a, b) AS (
                SELECT pid, pid FROM pts
                UNION
                SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u
            )
            SELECT a AS pid, MIN(b) AS cluster_id FROM reach GROUP BY a
            ORDER BY pid
        """,
        # DBSCAN recomputed whole in SQL: |N_eps| ≥ 5 counting self → cores;
        # recursive reachability over core–core edges labels components by
        # MIN pid; borders take MIN core-neighbour label; noise = -1
        "dbscan_clusters": f"""
            WITH RECURSIVE pts AS (
                SELECT DISTINCT
                       CAST(COALESCE(node_id, 10000000 + way_id) AS BIGINT) AS pid,
                       CAST(round(lon * 10000000) AS BIGINT) AS ix,
                       CAST(round(lat * 10000000) AS BIGINT) AS iy
                FROM read_parquet('{oracle_path('spatial_radius_src')}')
                WHERE is_ip = 0
            ),
            edges AS (
                SELECT a.pid AS u, b.pid AS v
                FROM pts a JOIN pts b ON a.pid <> b.pid
                WHERE (a.ix - b.ix) * (a.ix - b.ix)
                      + (a.iy - b.iy) * (a.iy - b.iy) <= 100000000
            ),
            core AS (SELECT u AS pid FROM edges GROUP BY u
                     HAVING count(*) + 1 >= 5),
            ce AS (SELECT u, v FROM edges
                   WHERE u IN (SELECT pid FROM core)
                     AND v IN (SELECT pid FROM core)),
            reach(a, b) AS (
                SELECT pid, pid FROM core
                UNION
                SELECT r.a, e.v FROM reach r JOIN ce e ON r.b = e.u
            ),
            comp AS (SELECT a AS pid, MIN(b) AS label FROM reach GROUP BY a),
            bord AS (SELECT e.u AS pid, MIN(c.label) AS label
                     FROM edges e JOIN comp c ON c.pid = e.v
                     WHERE e.u NOT IN (SELECT pid FROM core)
                     GROUP BY e.u)
            SELECT p.pid,
                   (CASE WHEN cm.pid IS NOT NULL THEN 0
                         WHEN bd.pid IS NOT NULL THEN 1
                         ELSE 2 END)::BIGINT AS role,
                   COALESCE(cm.label, bd.label, -1)::BIGINT AS label
            FROM pts p
            LEFT JOIN comp cm ON cm.pid = p.pid
            LEFT JOIN bord bd ON bd.pid = p.pid
            ORDER BY p.pid
        """,
        "line_simplify": read_parquet_sql("line_simplify", "way_id, seq"),
        "vw_simplify": read_parquet_sql("vw_simplify", "way_id, seq"),
        "street_route_dist": read_parquet_sql("street_route_dist", "src, node"),
        # bearing rose: the identical integer sign/compare CASE ladder over
        # independently parsed street segments (ties fall off the diagonal)
        "segment_bearing_rose": f"""
            WITH seg AS (SELECT way_id, bx - ax AS dx, by - ay AS dy
                         FROM read_parquet('{oracle_path('way_segments_src')}')
                         WHERE bx != ax OR by != ay)
            SELECT way_id,
                   (CASE
                      WHEN dx >= 0 AND dy >= 0 THEN
                           CASE WHEN abs(dy) > abs(dx) THEN 1 ELSE 0 END
                      WHEN dx < 0 AND dy >= 0 THEN
                           CASE WHEN abs(dy) > abs(dx) THEN 2 ELSE 3 END
                      WHEN dx < 0 AND dy < 0 THEN
                           CASE WHEN abs(dy) > abs(dx) THEN 5 ELSE 4 END
                      ELSE CASE WHEN abs(dy) > abs(dx) THEN 6 ELSE 7 END
                    END)::BIGINT AS octant,
                   count(*)::BIGINT AS n
            FROM seg GROUP BY 1, 2 ORDER BY way_id, octant
        """,
        # connected components: recursive min-label closure over the
        # independently parsed (bidirectional) street edge set
        "street_components": f"""
            WITH RECURSIVE
            e AS (SELECT u, v
                  FROM read_parquet('{oracle_path('street_edges_src')}')),
            r AS (
                SELECT u AS node, u AS lab FROM (SELECT DISTINCT u FROM e)
                UNION
                SELECT e.v AS node, r.lab FROM r JOIN e ON e.u = r.node
            )
            SELECT node AS node_id, min(lab)::BIGINT AS comp
            FROM r GROUP BY node ORDER BY node
        """,
        # bipartiteness audit: min-label closure for components, bounded
        # recursive BFS for hop distances (dist+1 < |V| caps the cycle
        # blowup of the (node, dist) UNION), parity join counts conflicts
        "street_bipartite": f"""
            WITH RECURSIVE
            e AS (SELECT u, v
                  FROM read_parquet('{oracle_path('street_edges_src')}')),
            nodes AS (SELECT DISTINCT u AS node FROM e),
            nn AS (SELECT count(*)::BIGINT AS n FROM nodes),
            r AS (SELECT node, node AS lab FROM nodes
                  UNION
                  SELECT e.v, r.lab FROM r JOIN e ON e.u = r.node),
            comp AS (SELECT node, min(lab)::BIGINT AS comp
                     FROM r GROUP BY node),
            roots AS (SELECT DISTINCT comp AS node FROM comp),
            walk AS (SELECT node, 0::BIGINT AS dist FROM roots
                     UNION
                     SELECT e.v, w.dist + 1
                     FROM walk w JOIN e ON e.u = w.node CROSS JOIN nn
                     WHERE w.dist + 1 < nn.n),
            d AS (SELECT node, min(dist)::BIGINT AS dist
                  FROM walk GROUP BY node),
            col AS (SELECT node, dist % 2 AS color FROM d),
            ue AS (SELECT u, v FROM e WHERE u < v),
            ce AS (SELECT c.comp,
                          CASE WHEN ca.color = cb.color THEN 1 ELSE 0 END
                              AS conf
                   FROM ue JOIN col ca ON ca.node = ue.u
                           JOIN col cb ON cb.node = ue.v
                           JOIN comp c ON c.node = ue.u),
            en AS (SELECT comp, count(*)::BIGINT AS n_edges,
                          sum(conf)::BIGINT AS n_conflicts
                   FROM ce GROUP BY comp),
            cn AS (SELECT comp, count(*)::BIGINT AS n_nodes
                   FROM comp GROUP BY comp)
            SELECT cn.comp, cn.n_nodes,
                   coalesce(en.n_edges, 0)::BIGINT AS n_edges,
                   coalesce(en.n_conflicts, 0)::BIGINT AS n_conflicts,
                   (CASE WHEN coalesce(en.n_conflicts, 0) = 0
                         THEN 1 ELSE 0 END)::BIGINT AS bipartite
            FROM cn LEFT JOIN en USING (comp) ORDER BY cn.comp
        """,
        # synchronous LPA, 4 rounds: each iteration re-derives every node's
        # next label as the (count desc, label asc) mode of its neighbors'
        # current labels — GROUP BY + QUALIFY inside the recursive term
        "street_lpa": f"""
            WITH RECURSIVE
            e AS (SELECT u, v
                  FROM read_parquet('{oracle_path('street_edges_src')}')),
            lab(r, node, label) AS (
                SELECT 0::BIGINT, u, u FROM (SELECT DISTINCT u FROM e)
                UNION ALL
                SELECT * FROM (
                    SELECT lab.r + 1 AS r, e.v AS node, lab.label AS label
                    FROM lab JOIN e ON e.u = lab.node
                    WHERE lab.r < 4
                    GROUP BY 1, 2, 3
                    QUALIFY row_number() OVER (
                        PARTITION BY e.v
                        ORDER BY count(*) DESC, lab.label) = 1
                )
            )
            SELECT node, label FROM lab WHERE r = 4 ORDER BY node
        """,
        # degree-2 chain contraction: degree counts + recursive component
        # closure over the degree-2 subgraph + per-chain grouping; the
        # whole chain logic lives in SQL (no walk — chains are components)
        "street_chains": f"""
            WITH RECURSIVE
            seg AS (SELECT way_id, seg_idx AS seq,
                           ({_fdiv('ax', 10)} + 268435456) * 536870912
                               + ({_fdiv('ay', 10)} + 268435456) AS u,
                           ({_fdiv('bx', 10)} + 268435456) * 536870912
                               + ({_fdiv('by', 10)} + 268435456) AS v,
                           abs(bx - ax) + abs(by - ay) AS w
                    FROM read_parquet('{oracle_path('way_segments_src')}')),
            e AS (SELECT * FROM seg WHERE u <> v),
            deg AS (SELECT x AS node, count(*)::BIGINT AS deg
                    FROM (SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e)
                    GROUP BY 1),
            d2e AS (SELECT e.u, e.v FROM e
                    JOIN deg du ON du.node = e.u
                    JOIN deg dv ON dv.node = e.v
                    WHERE du.deg = 2 AND dv.deg = 2),
            d2v AS (SELECT node FROM deg WHERE deg = 2),
            r AS (SELECT node, node AS lab FROM d2v
                  UNION
                  SELECT CASE WHEN d.u = r.node THEN d.v ELSE d.u END, r.lab
                  FROM r JOIN d2e d ON d.u = r.node OR d.v = r.node),
            comp AS (SELECT node, min(lab) AS comp FROM r GROUP BY node),
            lab AS (SELECT e.*, du.deg AS deg_u, dv.deg AS deg_v
                    FROM e JOIN deg du ON du.node = e.u
                           JOIN deg dv ON dv.node = e.v),
            keyed AS (SELECT CASE WHEN deg_u = 2 THEN cu.comp
                                  WHEN deg_v = 2 THEN cv.comp
                                  ELSE -(way_id * 1000000 + seq) - 1
                             END AS chain,
                             u, v, w, deg_u, deg_v
                      FROM lab
                      LEFT JOIN comp cu ON cu.node = lab.u
                      LEFT JOIN comp cv ON cv.node = lab.v),
            g AS (SELECT chain, count(*)::BIGINT AS n_segments,
                         sum(w)::BIGINT AS total_len,
                         min(least(u, v))::BIGINT AS anchor
                  FROM keyed GROUP BY chain),
            j AS (SELECT chain, min(x)::BIGINT AS junc_a,
                         max(x)::BIGINT AS junc_b
                  FROM (SELECT chain, u AS x, deg_u AS d FROM keyed
                        UNION ALL SELECT chain, v, deg_v FROM keyed)
                  WHERE d <> 2 GROUP BY chain)
            SELECT g.anchor, COALESCE(j.junc_a, -1)::BIGINT AS junc_a,
                   COALESCE(j.junc_b, -1)::BIGINT AS junc_b,
                   g.n_segments, g.total_len
            FROM g LEFT JOIN j USING (chain)
            ORDER BY anchor, junc_a, junc_b, n_segments, total_len
        """,
        # isochrone: recursive Bellman-Ford with budget cap — per-round
        # GROUP BY min over (carry ∪ relax), UNION-dedup fixpoint; seeds =
        # the 8 smallest vertex ids, edges min-w-deduped both directions
        "isochrone_counts": f"""
            WITH RECURSIVE
            seg AS (SELECT ({_fdiv('ax', 10)} + 268435456) * 536870912
                               + ({_fdiv('ay', 10)} + 268435456) AS u,
                           ({_fdiv('bx', 10)} + 268435456) * 536870912
                               + ({_fdiv('by', 10)} + 268435456) AS v,
                           abs(bx - ax) + abs(by - ay) AS w
                    FROM read_parquet('{oracle_path('way_segments_src')}')),
            e0 AS (SELECT * FROM seg WHERE u <> v),
            e AS (SELECT u, v, min(w) AS w FROM (
                      SELECT u, v, w FROM e0
                      UNION ALL SELECT v AS u, u AS v, w FROM e0)
                  GROUP BY u, v),
            seeds AS (SELECT node FROM (SELECT DISTINCT u AS node FROM e)
                      ORDER BY node LIMIT 8),
            walk(src, node, dist) AS (
                SELECT node, node, 0::BIGINT FROM seeds
              UNION
                SELECT src, node, min(dist) FROM (
                  SELECT src, node, dist FROM walk
                  UNION ALL
                  SELECT w2.src, e.v AS node, w2.dist + e.w AS dist
                  FROM walk w2 JOIN e ON e.u = w2.node
                  WHERE w2.dist + e.w <= 40000
                ) GROUP BY src, node
            ),
            best AS (SELECT src, node, min(dist) AS dist
                     FROM walk GROUP BY src, node)
            SELECT src, count(*)::BIGINT AS n_reachable,
                   max(dist)::BIGINT AS max_dist, sum(dist)::BIGINT AS sum_dist
            FROM best GROUP BY src ORDER BY src
        """,
        # circuity: vid unpack (integer div/mod of the packed coordinate)
        # + the same min(10*dist // chord, 39) bucket over the Dijkstra rows
        "route_circuity": f"""
            WITH d AS (SELECT src, node, dist
                       FROM read_parquet('{oracle_path('street_route_dist')}')),
            u AS (SELECT src, dist,
                         abs((node // 536870912 - 268435456)
                             - (src // 536870912 - 268435456)) * 10
                         + abs((node % 536870912 - 268435456)
                               - (src % 536870912 - 268435456)) * 10 AS chord
                  FROM d),
            b AS (SELECT src,
                         CASE WHEN chord = 0 THEN -1
                              ELSE least(10 * dist // greatest(chord, 1), 39)
                         END AS bucket
                  FROM u)
            SELECT src, bucket, count(*)::BIGINT AS n
            FROM b GROUP BY src, bucket ORDER BY src, bucket
        """,
        # MIS: the greedy set verbatim (naive-oracle parquet; SQL re-sorts)
        "street_mis": f"""
            SELECT node, in_mis FROM read_parquet('{oracle_path('street_mis')}')
            ORDER BY node
        """,
        # MSF: the Kruskal edges verbatim (the naive-oracle parquet IS the
        # independent recomputation; SQL only re-sorts)
        "street_mst": f"""
            SELECT u, v, w FROM read_parquet('{oracle_path('street_mst')}')
            ORDER BY u, v
        """,
        # network Voronoi: per-node argmin over the Dijkstra pairs,
        # lexicographic (dist, src) with the smaller seed winning ties
        "network_voronoi": f"""
            WITH d AS (SELECT src, node, dist
                       FROM read_parquet('{oracle_path('street_route_dist')}')),
            r AS (SELECT node, src, dist,
                         row_number() OVER (PARTITION BY node
                                            ORDER BY dist, src) AS rn
                  FROM d)
            SELECT node, src AS seed, dist
            FROM r WHERE rn = 1 ORDER BY node
        """,
        # sinuosity: grouped L1 segment sums + first/last endpoints by
        # seg_idx, integer cross-multiplied 1.2x class threshold
        "way_sinuosity": f"""
            WITH s AS (SELECT way_id, seg_idx, ax, ay, bx, by
                       FROM read_parquet('{oracle_path('way_segments_src')}')),
            g AS (SELECT way_id,
                         sum(abs(bx - ax) + abs(by - ay))::BIGINT AS len_l1,
                         (abs(max_by(bx, seg_idx) - min_by(ax, seg_idx))
                          + abs(max_by(by, seg_idx) - min_by(ay, seg_idx)))
                             ::BIGINT AS chord_l1
                  FROM s GROUP BY way_id)
            SELECT way_id, len_l1, chord_l1,
                   CASE WHEN chord_l1 = 0 THEN 'loop'
                        WHEN 5 * len_l1 <= 6 * chord_l1 THEN 'straight'
                        ELSE 'curved' END AS sin_class
            FROM g ORDER BY way_id
        """,
        # speed outliers: lag() L1 diffs + quantile_disc lower median,
        # cross-multiplied outlier threshold
        "traj_speed_outliers": f"""
            WITH p AS (SELECT traj_id, step, px, py
                       FROM read_parquet('{oracle_path('traj_points_src')}')),
            d AS (SELECT traj_id,
                         abs(px - lag(px) OVER w) + abs(py - lag(py) OVER w)
                             AS d
                  FROM p WINDOW w AS (PARTITION BY traj_id ORDER BY step)),
            dd AS (SELECT traj_id, d FROM d WHERE d IS NOT NULL),
            m AS (SELECT traj_id, count(*)::BIGINT AS n_steps,
                         quantile_disc(d, 0.5)::BIGINT AS med_d,
                         max(d)::BIGINT AS max_d
                  FROM dd GROUP BY traj_id)
            SELECT m.traj_id, m.n_steps, m.med_d,
                   (SELECT count(*) FROM dd
                    WHERE dd.traj_id = m.traj_id
                      AND dd.d > 4 * m.med_d)::BIGINT AS n_outliers,
                   m.max_d
            FROM m ORDER BY m.traj_id
        """,
        # address completeness: the same presence CASE ladder in SQL
        "addr_completeness": f"""
            WITH r AS (
                SELECT COALESCE(postcode, '') AS pc,
                       CASE WHEN street IS NOT NULL AND street <> ''
                            THEN 1 ELSE 0 END AS p_street,
                       CASE WHEN houseno IS NOT NULL AND houseno <> ''
                            THEN 1 ELSE 0 END AS p_houseno,
                       CASE WHEN postcode IS NOT NULL AND postcode <> ''
                            THEN 1 ELSE 0 END AS p_postcode,
                       CASE WHEN city IS NOT NULL AND city <> ''
                            THEN 1 ELSE 0 END AS p_city,
                       CASE WHEN country IS NOT NULL AND country <> ''
                            THEN 1 ELSE 0 END AS p_country,
                       CASE WHEN place IS NOT NULL AND place <> ''
                            THEN 1 ELSE 0 END AS p_place
                FROM read_parquet('{oracle_path('addr_fields_src')}'))
            SELECT pc, count(*)::BIGINT AS n_rows,
                   sum(p_street + p_houseno + p_postcode + p_city
                       + p_country + p_place)::BIGINT AS sum_score,
                   sum(p_street)::BIGINT AS n_street,
                   sum(p_houseno)::BIGINT AS n_houseno,
                   sum(p_city)::BIGINT AS n_city,
                   sum(p_street * p_houseno * p_city)::BIGINT AS n_full
            FROM r GROUP BY pc ORDER BY pc
        """,
        # spatial stratified sample: same hash expression + row_number
        # areal interpolation: min-anchored 0.02° source grid, target grid
        # shifted S/4 → exact quadrant weights 9/3/3/1 (sixteenths); the
        # engine's two cell-keyed exchanges collapse to the same arithmetic
        "areal_interpolation": f"""
            WITH pts AS (
                SELECT DISTINCT
                       CAST(COALESCE(node_id, 10000000 + way_id) AS BIGINT) AS pid,
                       CAST(round(lon * 10000000) AS BIGINT) AS ix,
                       CAST(round(lat * 10000000) AS BIGINT) AS iy
                FROM read_parquet('{oracle_path('spatial_radius_src')}')
                WHERE is_ip = 0),
            ext AS (SELECT min(ix) AS mx, min(iy) AS my FROM pts),
            src AS (SELECT (ix - mx) // 200000 AS sx,
                           (iy - my) // 200000 AS sy,
                           count(*)::BIGINT AS c
                    FROM pts, ext GROUP BY 1, 2),
            q(dx, dy, w) AS (VALUES (0, 0, 9), (1, 0, 3), (0, 1, 3), (1, 1, 1))
            SELECT (sx + dx)::BIGINT AS tx, (sy + dy)::BIGINT AS ty,
                   sum(c * w)::BIGINT AS alloc_16,
                   count(*)::BIGINT AS n_src
            FROM src CROSS JOIN q GROUP BY 1, 2 ORDER BY tx, ty
        """,
        # hex binning: the same 4-candidate nearest-lattice-center ladder
        # ((W/2)² ≤ H² bounds the search to rows r0/r0+1), integer d², ties
        # (d², r, q); parity offset via ((r % 2) + 2) % 2 for negative rows
        "hex_bins": f"""
            WITH pts AS (
                SELECT DISTINCT
                       CAST(COALESCE(node_id, 10000000 + way_id) AS BIGINT) AS pid,
                       CAST(round(lon * 10000000) AS BIGINT) AS ix,
                       CAST(round(lat * 10000000) AS BIGINT) AS iy
                FROM read_parquet('{oracle_path('spatial_radius_src')}')
                WHERE is_ip = 0),
            drq(dr, dq) AS (VALUES (0, 0), (0, 1), (1, 0), (1, 1)),
            cand AS (
                SELECT pid, ix, iy,
                       {_HEX_R} AS r,
                       {_HEX_Q} AS q,
                       {_HEX_OFF} AS off
                FROM pts CROSS JOIN drq),
            best AS (
                SELECT pid, q, r
                FROM cand
                QUALIFY row_number() OVER (
                    PARTITION BY pid
                    ORDER BY (ix - (q * 10000 + off)) * (ix - (q * 10000 + off))
                             + (iy - r * 8660) * (iy - r * 8660),
                             r, q) = 1)
            SELECT q, r, count(*)::BIGINT AS n
            FROM best GROUP BY q, r
            ORDER BY n DESC, q, r LIMIT 25
        """,
        # Ripley's K: cumulative pair counts at r = k·5000 via the brute
        # self-join (the oracle's job — the engine buckets the cell-exchange
        # pairs); bbox area and n ride along for the consumer's K̂ division
        "ripley_k": f"""
            WITH pts AS (
                SELECT DISTINCT
                       CAST(COALESCE(node_id, 10000000 + way_id) AS BIGINT) AS pid,
                       CAST(round(lon * 10000000) AS BIGINT) AS ix,
                       CAST(round(lat * 10000000) AS BIGINT) AS iy
                FROM read_parquet('{oracle_path('spatial_radius_src')}')
                WHERE is_ip = 0),
            ext AS (SELECT count(*)::BIGINT AS n,
                           ((max(ix) - min(ix)) * (max(iy) - min(iy)))::BIGINT
                               AS area
                    FROM pts),
            d AS (SELECT (a.ix - b.ix) * (a.ix - b.ix)
                         + (a.iy - b.iy) * (a.iy - b.iy) AS d2
                  FROM pts a JOIN pts b ON a.pid < b.pid),
            ks AS (SELECT unnest(range(1, 5))::BIGINT AS k)
            SELECT ks.k, (ks.k * 5000)::BIGINT AS r,
                   (SELECT count(*) FROM d
                    WHERE d2 <= (ks.k * 5000) * (ks.k * 5000))::BIGINT AS n_pairs,
                   ext.n AS n_pts, ext.area AS bbox_area
            FROM ks, ext ORDER BY ks.k
        """,
        # Moran's I sufficient stats: z pre-scaled by C (z = n·C − T), rook
        # pairs by a +1 cell self-join counted in BOTH orders (×2); the one
        # division to an I value is the consumer's
        "moran_i": f"""
            WITH pts AS (
                SELECT DISTINCT
                       CAST(COALESCE(node_id, 10000000 + way_id) AS BIGINT) AS pid,
                       CAST(round(lon * 10000000) AS BIGINT) AS ix,
                       CAST(round(lat * 10000000) AS BIGINT) AS iy
                FROM read_parquet('{oracle_path('spatial_radius_src')}')
                WHERE is_ip = 0),
            cells AS (SELECT {_fdiv('ix', 10000)} AS cx,
                             {_fdiv('iy', 10000)} AS cy,
                             count(*)::BIGINT AS n
                      FROM pts GROUP BY 1, 2),
            s AS (SELECT count(*)::BIGINT AS c, sum(n)::BIGINT AS t FROM cells),
            z AS (SELECT cx, cy, (n * s.c - s.t)::HUGEINT AS z FROM cells, s),
            p AS (SELECT a.z AS za, b.z AS zb
                  FROM z a JOIN z b
                    ON (b.cx = a.cx + 1 AND b.cy = a.cy)
                    OR (b.cx = a.cx AND b.cy = a.cy + 1))
            SELECT (SELECT c FROM s) AS n_cells,
                   (SELECT 2 * count(*) FROM p)::BIGINT AS w_sum,
                   coalesce((SELECT 2 * sum(za * zb) FROM p), 0)::BIGINT AS num_zz,
                   (SELECT sum(z * z) FROM z)::BIGINT AS den_zz
        """,
        "spatial_sample_nwa": f"""
            WITH pts AS (
                SELECT DISTINCT
                       CAST(COALESCE(node_id, 10000000 + way_id) AS BIGINT) AS pid,
                       CAST(round(lon * 10000000) AS BIGINT) AS ix,
                       CAST(round(lat * 10000000) AS BIGINT) AS iy
                FROM read_parquet('{oracle_path('spatial_radius_src')}')
                WHERE is_ip = 0),
            c AS (SELECT pid, {_fdiv('ix', 100000)} AS cell_x,
                         {_fdiv('iy', 100000)} AS cell_y,
                         (pid % 1000003) * 2654435761 % 4294967296 AS h
                  FROM pts),
            r AS (SELECT *, row_number() OVER (PARTITION BY cell_x, cell_y
                                               ORDER BY h, pid) AS rn
                  FROM c)
            SELECT cell_x, cell_y, pid, rn::BIGINT AS rn
            FROM r WHERE rn <= 5 ORDER BY cell_x, cell_y, rn
        """,
        # STR bulk-load: two row_number windows + integer division; the
        # slab count uses the exact integer ceil-sqrt (floor-sqrt +
        # correction, immune to float sqrt rounding at perfect squares)
        # Hilbert xy→d as a recursive CTE: the classic rotate-and-fold loop,
        # one iteration per curve level (s = 2^15 … 1); the shift that fits
        # the extent into the 2^16 grid is scanned exactly like the engine's
        # bit_length rule; locality histogram = lag-window L1 jumps bucketed
        # by decimal digit count (length(::VARCHAR) — exact, no float log)
        "hilbert_locality": f"""
            WITH RECURSIVE pts AS (
                SELECT DISTINCT
                       CAST(COALESCE(node_id, 10000000 + way_id) AS BIGINT) AS pid,
                       CAST(round(lon * 10000000) AS BIGINT) AS ix,
                       CAST(round(lat * 10000000) AS BIGINT) AS iy
                FROM read_parquet('{oracle_path('spatial_radius_src')}')
                WHERE is_ip = 0),
            ext AS (SELECT min(ix) AS mx, min(iy) AS my,
                           greatest(max(ix) - min(ix), max(iy) - min(iy)) AS rng
                    FROM pts),
            sh AS (SELECT coalesce(
                       (SELECT min(t.s) FROM range(0, 40) t(s)
                        WHERE (SELECT rng FROM ext) < (1::BIGINT << (16 + t.s))),
                       0) AS s),
            norm AS (SELECT pid, ix, iy,
                            (ix - mx) >> (SELECT s FROM sh) AS x,
                            (iy - my) >> (SELECT s FROM sh) AS y
                     FROM pts, ext),
            hrec AS (
                SELECT pid, x, y, 0::BIGINT AS d, (1::BIGINT << 15) AS s
                FROM norm
                UNION ALL
                SELECT pid,
                       CASE WHEN (y & s) > 0 THEN x
                            WHEN (x & s) > 0 THEN s - 1 - y ELSE y END,
                       CASE WHEN (y & s) > 0 THEN y
                            WHEN (x & s) > 0 THEN s - 1 - x ELSE x END,
                       d + s * s * (CASE WHEN (x & s) > 0
                                         THEN CASE WHEN (y & s) > 0
                                              THEN 2 ELSE 3 END
                                         ELSE CASE WHEN (y & s) > 0
                                              THEN 1 ELSE 0 END END),
                       s >> 1
                FROM hrec WHERE s > 0),
            hd AS (SELECT pid, d FROM hrec WHERE s = 0),
            seq AS (
                SELECT 'hilbert' AS ordering, p.ix, p.iy,
                       lag(p.ix) OVER (ORDER BY hd.d, p.pid) AS px,
                       lag(p.iy) OVER (ORDER BY hd.d, p.pid) AS py
                FROM pts p JOIN hd ON p.pid = hd.pid
                UNION ALL
                SELECT 'row_major', ix, iy,
                       lag(ix) OVER (ORDER BY iy, ix, pid),
                       lag(iy) OVER (ORDER BY iy, ix, pid)
                FROM pts),
            jumps AS (
                SELECT ordering, abs(ix - px) + abs(iy - py) AS l1
                FROM seq WHERE px IS NOT NULL)
            SELECT ordering, length(l1::VARCHAR)::BIGINT AS bucket,
                   count(*)::BIGINT AS n_pairs, sum(l1)::BIGINT AS sum_l1
            FROM jumps GROUP BY ordering, bucket ORDER BY ordering, bucket
        """,
        "str_pack_nwa": f"""
            WITH pts AS (
                SELECT DISTINCT
                       CAST(COALESCE(node_id, 10000000 + way_id) AS BIGINT) AS pid,
                       CAST(round(lon * 10000000) AS BIGINT) AS ix,
                       CAST(round(lat * 10000000) AS BIGINT) AS iy
                FROM read_parquet('{oracle_path('spatial_radius_src')}')
                WHERE is_ip = 0),
            par AS (SELECT c, CASE WHEN s0 * s0 >= nl THEN s0 ELSE s0 + 1 END AS s
                    FROM (SELECT count(*)::BIGINT AS c,
                                 (count(*) + 15) // 16 AS nl,
                                 CAST(floor(sqrt(((count(*) + 15) // 16)::DOUBLE))
                                      AS BIGINT) AS s0
                          FROM pts)),
            par2 AS (SELECT (c + s - 1) // s AS slab_size FROM par),
            ranked AS (SELECT pid, ix, iy,
                              row_number() OVER (ORDER BY ix, iy, pid) - 1 AS r
                       FROM pts),
            slabbed AS (SELECT pid, ix, iy, r // slab_size AS slab
                        FROM ranked, par2),
            leafed AS (SELECT slab, ix, iy,
                              (row_number() OVER (PARTITION BY slab
                                                  ORDER BY iy, ix, pid) - 1) // 16
                                  AS leaf
                       FROM slabbed)
            SELECT slab, leaf, count(*)::BIGINT AS n_points,
                   min(ix)::BIGINT AS min_x, max(ix)::BIGINT AS max_x,
                   min(iy)::BIGINT AS min_y, max(iy)::BIGINT AS max_y
            FROM leafed GROUP BY slab, leaf ORDER BY slab, leaf
        """,
        # hotspot cells recomputed whole in SQL: 3×3 neighbour self-join,
        # cross-multiplied integer threshold, one double division
        "hotspot_cells": f"""
            WITH pts AS (
                SELECT DISTINCT
                       CAST(COALESCE(node_id, 10000000 + way_id) AS BIGINT) AS pid,
                       CAST(round(lon * 10000000) AS BIGINT) AS ix,
                       CAST(round(lat * 10000000) AS BIGINT) AS iy
                FROM read_parquet('{oracle_path('spatial_radius_src')}')
                WHERE is_ip = 0
            ),
            cells AS (SELECT {_fdiv('ix', 10000)} AS cx,
                             {_fdiv('iy', 10000)} AS cy,
                             count(*)::BIGINT AS n
                      FROM pts GROUP BY 1, 2),
            tot AS (SELECT sum(n)::BIGINT AS t, count(*)::BIGINT AS c FROM cells),
            nb AS (SELECT a.cx, a.cy, a.n, sum(b.n)::BIGINT AS nbr_sum
                   FROM cells a JOIN cells b
                     ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
                   GROUP BY 1, 2, 3)
            SELECT cx AS cell_x, cy AS cell_y, n, nbr_sum,
                   (CASE WHEN nbr_sum * c > 9 * t THEN 1 ELSE 0 END)::BIGINT AS hot,
                   (nbr_sum * c)::DOUBLE / (9 * t)::DOUBLE AS ratio
            FROM nb, tot ORDER BY cell_x, cell_y
        """,
        # OD flows recomputed whole in SQL (floor() handles negative cells
        # where // would truncate — both coords are positive here but the
        # spec is floor)
        "od_flows": f"""
            WITH p AS (SELECT traj_id, step, px, py
                       FROM read_parquet('{oracle_path('traj_points_src')}')),
            fl AS (SELECT traj_id,
                          min_by(px, step) AS ox, min_by(py, step) AS oy,
                          max_by(px, step) AS dx, max_by(py, step) AS dy
                   FROM p GROUP BY traj_id)
            SELECT floor(ox / 100000.0)::BIGINT AS o_x,
                   floor(oy / 100000.0)::BIGINT AS o_y,
                   floor(dx / 100000.0)::BIGINT AS d_x,
                   floor(dy / 100000.0)::BIGINT AS d_y,
                   count(*)::BIGINT AS n
            FROM fl GROUP BY 1, 2, 3, 4
            ORDER BY o_x, o_y, d_x, d_y
        """,
        "map_match_accuracy": f"""
            SELECT count(*)::BIGINT AS n_steps,
                   coalesce(sum(CASE WHEN traj_id = way_id THEN 1 ELSE 0 END), 0)::BIGINT
                       AS n_correct,
                   CASE WHEN count(*) = 0 THEN 0.0
                        ELSE sum(CASE WHEN traj_id = way_id THEN 1 ELSE 0 END)::DOUBLE
                             / count(*)::DOUBLE END AS accuracy
            FROM read_parquet('{oracle_path('map_match')}')
        """,
        # turn classes recomputed whole in SQL from the independent points
        "turn_classes": f"""
            WITH p AS (SELECT traj_id, step, px, py
                       FROM read_parquet('{oracle_path('traj_points_src')}')),
            t AS (SELECT traj_id, step, px, py,
                         lag(px) OVER w AS ax, lag(py) OVER w AS ay,
                         lead(px) OVER w AS bx, lead(py) OVER w AS by
                  FROM p WINDOW w AS (PARTITION BY traj_id ORDER BY step))
            SELECT traj_id, step,
                   CASE WHEN ((px-ax) = 0 AND (py-ay) = 0)
                          OR ((bx-px) = 0 AND (by-py) = 0) THEN 'stop'
                        WHEN (px-ax)*(by-py) - (py-ay)*(bx-px) > 0 THEN 'left'
                        WHEN (px-ax)*(by-py) - (py-ay)*(bx-px) < 0 THEN 'right'
                        WHEN (px-ax)*(bx-px) + (py-ay)*(by-py) > 0 THEN 'straight'
                        ELSE 'uturn' END AS turn
            FROM t WHERE ax IS NOT NULL AND bx IS NOT NULL
            ORDER BY traj_id, step
        """,
        # stay-point detection: recursive-CTE anchor walk (Li et al. scan)
        # over the independent dwell points; j = first step farther than R
        # from the anchor, dwell qualifies when it spans >= 2 steps
        "staypoints": f"""
            WITH RECURSIVE
            p AS (SELECT traj_id, step, px, py
                  FROM read_parquet('{oracle_path('dwell_points_src')}')),
            nn AS (SELECT traj_id, count(*)::BIGINT AS n FROM p GROUP BY 1),
            jt AS (SELECT a.traj_id, a.step AS i,
                          coalesce(min(CASE WHEN (b.px - a.px) * (b.px - a.px)
                                             + (b.py - a.py) * (b.py - a.py)
                                             > 1000000
                                        THEN b.step END), nn.n) AS j
                   FROM p a JOIN nn ON nn.traj_id = a.traj_id
                   LEFT JOIN p b ON b.traj_id = a.traj_id AND b.step > a.step
                   GROUP BY a.traj_id, a.step, nn.n),
            anch AS (
                SELECT traj_id, 0::BIGINT AS i FROM nn
                UNION
                SELECT anch.traj_id,
                       CASE WHEN jt.j - anch.i >= 2 THEN jt.j
                            ELSE anch.i + 1 END AS i
                FROM anch JOIN jt ON jt.traj_id = anch.traj_id
                                 AND jt.i = anch.i),
            sp AS (SELECT anch.traj_id, anch.i AS start_step,
                          jt.j - 1 AS end_step, jt.j - anch.i AS n_pts
                   FROM anch JOIN jt ON jt.traj_id = anch.traj_id
                                    AND jt.i = anch.i
                   WHERE jt.j - anch.i >= 2)
            SELECT sp.traj_id, sp.start_step::BIGINT AS start_step,
                   sp.end_step::BIGINT AS end_step, sp.n_pts::BIGINT AS n_pts,
                   {_fdiv('sum(p.px)', 'sp.n_pts')}::BIGINT AS sx,
                   {_fdiv('sum(p.py)', 'sp.n_pts')}::BIGINT AS sy
            FROM sp JOIN p ON p.traj_id = sp.traj_id
                          AND p.step BETWEEN sp.start_step AND sp.end_step
            GROUP BY sp.traj_id, sp.start_step, sp.end_step, sp.n_pts
            ORDER BY sp.traj_id, sp.start_step
        """,
        # geofence entry/exit: dilated-bbox containment join, then runs of
        # consecutive contained steps -> +1 at each run start, -1 at the
        # first step back outside (suppressed when the trajectory ends inside)
        "geofence_transitions": f"""
            WITH f AS (SELECT way_id AS fence_id,
                              x0 - 20000 AS x0, x1 + 20000 AS x1,
                              y0 - 20000 AS y0, y1 + 20000 AS y1
                       FROM read_parquet('{oracle_path('way_bboxes_src')}')
                       WHERE kind = 'building'),
            p AS (SELECT traj_id, step, px, py
                  FROM read_parquet('{oracle_path('dwell_points_src')}')),
            ms AS (SELECT traj_id, max(step) AS max_step FROM p GROUP BY 1),
            c AS (SELECT p.traj_id, f.fence_id, p.step
                  FROM p JOIN f ON p.px BETWEEN f.x0 AND f.x1
                               AND p.py BETWEEN f.y0 AND f.y1),
            runs AS (SELECT traj_id, fence_id, step,
                            step - lag(step) OVER w AS d,
                            lead(step) OVER w AS nxt
                     FROM c WINDOW w AS (PARTITION BY traj_id, fence_id
                                         ORDER BY step)),
            entries AS (SELECT traj_id, fence_id, step, 1 AS event
                        FROM runs WHERE d IS NULL OR d > 1),
            exits AS (SELECT r.traj_id, r.fence_id, r.step + 1 AS step,
                             -1 AS event
                      FROM runs r JOIN ms USING (traj_id)
                      WHERE (r.nxt IS NULL OR r.nxt > r.step + 1)
                        AND r.step + 1 <= ms.max_step)
            SELECT traj_id, fence_id, step::BIGINT AS step,
                   event::BIGINT AS event
            FROM (SELECT * FROM entries UNION ALL SELECT * FROM exits)
            ORDER BY traj_id, fence_id, step, event
        """,
        # polygon shape audit: anchored shoelace + turn-sign convexity via
        # window functions over the independent closed-ring vertex lists
        "polygon_audit": f"""
            WITH p AS (SELECT way_id, seq, ix, iy
                       FROM read_parquet('{oracle_path('closed_way_points_src')}')),
            a AS (SELECT way_id, seq,
                         ix - min(ix) OVER wf AS x, iy - min(iy) OVER wf AS y,
                         max(ix) OVER wf - min(ix) OVER wf AS bw,
                         max(iy) OVER wf - min(iy) OVER wf AS bh
                  FROM p WINDOW wf AS (PARTITION BY way_id)),
            e AS (SELECT way_id, seq, x, y, bw, bh,
                         lead(x) OVER w - x AS dx, lead(y) OVER w - y AS dy
                  FROM a WINDOW w AS (PARTITION BY way_id ORDER BY seq)),
            ee AS (SELECT * FROM e WHERE dx IS NOT NULL),
            t AS (SELECT way_id, count(*)::BIGINT AS n_vertices,
                         sum(x * dy - y * dx)::BIGINT AS area2,
                         any_value(bw) AS bw, any_value(bh) AS bh
                  FROM ee GROUP BY way_id),
            c AS (SELECT way_id,
                         dx * COALESCE(lead(dy) OVER w2, first_value(dy) OVER w2f)
                         - dy * COALESCE(lead(dx) OVER w2, first_value(dx) OVER w2f)
                         AS cr
                  FROM ee
                  WINDOW w2 AS (PARTITION BY way_id ORDER BY seq),
                         w2f AS (PARTITION BY way_id ORDER BY seq
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND UNBOUNDED FOLLOWING)),
            cc AS (SELECT way_id, min(cr) AS mn, max(cr) AS mx FROM c GROUP BY way_id)
            SELECT t.way_id, t.n_vertices, t.area2,
                   CASE WHEN t.area2 > 0 THEN 1 WHEN t.area2 < 0 THEN -1
                        ELSE 0 END::BIGINT AS winding,
                   CASE WHEN t.area2 <> 0 AND (cc.mn >= 0 OR cc.mx <= 0)
                        THEN 1 ELSE 0 END::BIGINT AS is_convex,
                   t.bw::BIGINT AS bbox_w, t.bh::BIGINT AS bbox_h
            FROM t JOIN cc USING (way_id) ORDER BY t.way_id
        """,
        # DE-9IM-style relate: the same exact integer predicates (HUGEINT)
        # over every bbox-overlapping ring pair — orientation sign table,
        # collinear on-segment, first-free-vertex crossing parity
        "polygon_relate": f"""
            WITH p AS (SELECT way_id, seq, ix, iy
                       FROM read_parquet('{oracle_path('relate_rings_src')}')),
            nmax AS (SELECT way_id, max(seq) AS last FROM p GROUP BY way_id),
            e AS (SELECT way_id, seq, ix::HUGEINT AS ax, iy::HUGEINT AS ay,
                         lead(ix) OVER w::HUGEINT AS bx,
                         lead(iy) OVER w::HUGEINT AS by
                  FROM p WINDOW w AS (PARTITION BY way_id ORDER BY seq)
                  QUALIFY bx IS NOT NULL),
            verts AS (SELECT p.way_id, p.seq, p.ix::HUGEINT AS vx,
                             p.iy::HUGEINT AS vy
                      FROM p JOIN nmax USING (way_id) WHERE p.seq < nmax.last),
            bb AS (SELECT way_id, min(ix) AS x0, max(ix) AS x1,
                          min(iy) AS y0, max(iy) AS y1 FROM p GROUP BY way_id),
            pairs AS (SELECT a.way_id AS wa, b.way_id AS wb FROM bb a
                      JOIN bb b ON a.way_id < b.way_id
                       AND a.x0 <= b.x1 AND b.x0 <= a.x1
                       AND a.y0 <= b.y1 AND b.y0 <= a.y1),
            cls AS (SELECT pr.wa, pr.wb,
               (ea.bx-ea.ax)*(eb.ay-ea.ay) - (ea.by-ea.ay)*(eb.ax-ea.ax) AS o1,
               (ea.bx-ea.ax)*(eb.by-ea.ay) - (ea.by-ea.ay)*(eb.bx-ea.ax) AS o2,
               (eb.bx-eb.ax)*(ea.ay-eb.ay) - (eb.by-eb.ay)*(ea.ax-eb.ax) AS o3,
               (eb.bx-eb.ax)*(ea.by-eb.ay) - (eb.by-eb.ay)*(ea.bx-eb.ax) AS o4,
               ea.ax AS a1x, ea.ay AS a1y, ea.bx AS a2x, ea.by AS a2y,
               eb.ax AS b1x, eb.ay AS b1y, eb.bx AS b2x, eb.by AS b2y
              FROM pairs pr JOIN e ea ON ea.way_id = pr.wa
                            JOIN e eb ON eb.way_id = pr.wb),
            cnt AS (SELECT wa, wb,
               sum(CASE WHEN ((o1>0 AND o2<0) OR (o1<0 AND o2>0))
                         AND ((o3>0 AND o4<0) OR (o3<0 AND o4>0))
                        THEN 1 ELSE 0 END)::BIGINT AS n_cross,
               sum(CASE WHEN NOT (((o1>0 AND o2<0) OR (o1<0 AND o2>0))
                              AND ((o3>0 AND o4<0) OR (o3<0 AND o4>0)))
                 AND ( (o1=0 AND b1x BETWEEN least(a1x,a2x) AND greatest(a1x,a2x)
                              AND b1y BETWEEN least(a1y,a2y) AND greatest(a1y,a2y))
                    OR (o2=0 AND b2x BETWEEN least(a1x,a2x) AND greatest(a1x,a2x)
                              AND b2y BETWEEN least(a1y,a2y) AND greatest(a1y,a2y))
                    OR (o3=0 AND a1x BETWEEN least(b1x,b2x) AND greatest(b1x,b2x)
                              AND a1y BETWEEN least(b1y,b2y) AND greatest(b1y,b2y))
                    OR (o4=0 AND a2x BETWEEN least(b1x,b2x) AND greatest(b1x,b2x)
                              AND a2y BETWEEN least(b1y,b2y) AND greatest(b1y,b2y)))
                        THEN 1 ELSE 0 END)::BIGINT AS n_touch
              FROM cls GROUP BY wa, wb),
            onba AS (SELECT pr.wa, pr.wb, v.seq FROM pairs pr
                     JOIN verts v ON v.way_id = pr.wa
                     WHERE EXISTS (SELECT 1 FROM e eb WHERE eb.way_id = pr.wb
                        AND (eb.bx-eb.ax)*(v.vy-eb.ay)
                            - (eb.by-eb.ay)*(v.vx-eb.ax) = 0
                        AND v.vx BETWEEN least(eb.ax,eb.bx) AND greatest(eb.ax,eb.bx)
                        AND v.vy BETWEEN least(eb.ay,eb.by) AND greatest(eb.ay,eb.by))),
            tva AS (SELECT pr.wa, pr.wb, min(v.seq) AS seq FROM pairs pr
                    JOIN verts v ON v.way_id = pr.wa
                    WHERE NOT EXISTS (SELECT 1 FROM onba o
                        WHERE o.wa = pr.wa AND o.wb = pr.wb AND o.seq = v.seq)
                    GROUP BY pr.wa, pr.wb),
            pipa AS (SELECT t.wa, t.wb,
                       (sum(CASE WHEN (eb.ay <= v.vy AND eb.by > v.vy
                              AND (eb.bx-eb.ax)*(v.vy-eb.ay)
                                  - (eb.by-eb.ay)*(v.vx-eb.ax) > 0)
                            OR (eb.by <= v.vy AND eb.ay > v.vy
                              AND (eb.bx-eb.ax)*(v.vy-eb.ay)
                                  - (eb.by-eb.ay)*(v.vx-eb.ax) < 0)
                            THEN 1 ELSE 0 END) % 2 = 1) AS a_in
                     FROM tva t
                     JOIN verts v ON v.way_id = t.wa AND v.seq = t.seq
                     JOIN e eb ON eb.way_id = t.wb
                     GROUP BY t.wa, t.wb),
            onbb AS (SELECT pr.wa, pr.wb, v.seq FROM pairs pr
                     JOIN verts v ON v.way_id = pr.wb
                     WHERE EXISTS (SELECT 1 FROM e ea WHERE ea.way_id = pr.wa
                        AND (ea.bx-ea.ax)*(v.vy-ea.ay)
                            - (ea.by-ea.ay)*(v.vx-ea.ax) = 0
                        AND v.vx BETWEEN least(ea.ax,ea.bx) AND greatest(ea.ax,ea.bx)
                        AND v.vy BETWEEN least(ea.ay,ea.by) AND greatest(ea.ay,ea.by))),
            tvb AS (SELECT pr.wa, pr.wb, min(v.seq) AS seq FROM pairs pr
                    JOIN verts v ON v.way_id = pr.wb
                    WHERE NOT EXISTS (SELECT 1 FROM onbb o
                        WHERE o.wa = pr.wa AND o.wb = pr.wb AND o.seq = v.seq)
                    GROUP BY pr.wa, pr.wb),
            pipb AS (SELECT t.wa, t.wb,
                       (sum(CASE WHEN (ea.ay <= v.vy AND ea.by > v.vy
                              AND (ea.bx-ea.ax)*(v.vy-ea.ay)
                                  - (ea.by-ea.ay)*(v.vx-ea.ax) > 0)
                            OR (ea.by <= v.vy AND ea.ay > v.vy
                              AND (ea.bx-ea.ax)*(v.vy-ea.ay)
                                  - (ea.by-ea.ay)*(v.vx-ea.ax) < 0)
                            THEN 1 ELSE 0 END) % 2 = 1) AS b_in
                     FROM tvb t
                     JOIN verts v ON v.way_id = t.wb AND v.seq = t.seq
                     JOIN e ea ON ea.way_id = t.wa
                     GROUP BY t.wa, t.wb)
            SELECT pr.wa AS way_a, pr.wb AS way_b,
                   cnt.n_cross, cnt.n_touch,
                   CASE WHEN cnt.n_cross > 0 THEN 'crosses'
                        WHEN COALESCE(pipa.a_in, false) THEN 'within'
                        WHEN COALESCE(pipb.b_in, false) THEN 'contains'
                        WHEN tva.seq IS NULL AND tvb.seq IS NULL
                             THEN 'boundary_equal'
                        WHEN cnt.n_touch > 0 THEN 'touches'
                        ELSE 'disjoint' END AS relation
            FROM pairs pr
            JOIN cnt ON cnt.wa = pr.wa AND cnt.wb = pr.wb
            LEFT JOIN tva ON tva.wa = pr.wa AND tva.wb = pr.wb
            LEFT JOIN tvb ON tvb.wa = pr.wa AND tvb.wb = pr.wb
            LEFT JOIN pipa ON pipa.wa = pr.wa AND pipa.wb = pr.wb
            LEFT JOIN pipb ON pipb.wa = pr.wa AND pipb.wb = pr.wb
            ORDER BY way_a, way_b
        """,
        # pairwise trajectory Hausdorff²: nested max-of-min over point pairs
        # for trajectories sharing the step-0 origin cell (od_flows zoning)
        "hausdorff_pairs": f"""
            WITH p AS (SELECT traj_id, step, px, py
                       FROM read_parquet('{oracle_path('dwell_points_src')}')),
            o AS (SELECT traj_id,
                         {_fdiv('min_by(px, step)', 100000)} AS cx,
                         {_fdiv('min_by(py, step)', 100000)} AS cy
                  FROM p GROUP BY 1),
            pairs AS (SELECT a.traj_id AS ta, b.traj_id AS tb, a.cx, a.cy
                      FROM o a JOIN o b ON a.cx = b.cx AND a.cy = b.cy
                                       AND a.traj_id < b.traj_id),
            dab AS (SELECT pr.ta, pr.tb, pa.step,
                           min((pa.px - pb.px) * (pa.px - pb.px)
                               + (pa.py - pb.py) * (pa.py - pb.py)) AS md
                    FROM pairs pr
                    JOIN p pa ON pa.traj_id = pr.ta
                    JOIN p pb ON pb.traj_id = pr.tb
                    GROUP BY pr.ta, pr.tb, pa.step),
            ha AS (SELECT ta, tb, max(md) AS h_ab FROM dab GROUP BY ta, tb),
            dba AS (SELECT pr.ta, pr.tb, pb.step,
                           min((pa.px - pb.px) * (pa.px - pb.px)
                               + (pa.py - pb.py) * (pa.py - pb.py)) AS md
                    FROM pairs pr
                    JOIN p pa ON pa.traj_id = pr.ta
                    JOIN p pb ON pb.traj_id = pr.tb
                    GROUP BY pr.ta, pr.tb, pb.step),
            hb AS (SELECT ta, tb, max(md) AS h_ba FROM dba GROUP BY ta, tb)
            SELECT pr.cx AS cell_x, pr.cy AS cell_y,
                   pr.ta AS traj_a, pr.tb AS traj_b,
                   greatest(ha.h_ab, hb.h_ba)::BIGINT AS h2
            FROM pairs pr
            JOIN ha ON ha.ta = pr.ta AND ha.tb = pr.tb
            JOIN hb ON hb.ta = pr.ta AND hb.tb = pr.tb
            ORDER BY cell_x, cell_y, traj_a, traj_b
        """,
        # discrete Fréchet²: minimax grid-path DP, one recursive iteration
        # per ANTI-DIAGONAL carrying two layers (k as layer 1, k-1 as layer
        # 0); min-of-preds = one moves-table join + GROUP BY, border cells
        # fall out (missing preds simply contribute nothing to the min)
        # EDR: same recursive anti-diagonal walk as frechet_pairs, but
        # min-of-preds with per-move costs — insert/delete +1, substitute
        # costs the L∞ match test at the TARGET cell; dp runs on the
        # (n+1)×(m+1) grid so borders emerge from the +1 chains
        "edr_pairs": f"""
            WITH RECURSIVE
            p AS (SELECT traj_id, step, px, py
                  FROM read_parquet('{oracle_path('dwell_points_src')}')),
            o AS (SELECT traj_id,
                         {_fdiv('min_by(px, step)', 100000)} AS cx,
                         {_fdiv('min_by(py, step)', 100000)} AS cy,
                         max(step) + 1 AS n
                  FROM p GROUP BY 1),
            pairs AS (SELECT a.traj_id AS ta, b.traj_id AS tb, a.cx, a.cy,
                             a.n AS na, b.n AS nb
                      FROM o a JOIN o b ON a.cx = b.cx AND a.cy = b.cy
                                       AND a.traj_id < b.traj_id),
            mt AS (SELECT pr.ta, pr.tb, pa.step + 1 AS i, pb.step + 1 AS j,
                          CASE WHEN abs(pa.px - pb.px) <= 20000
                                AND abs(pa.py - pb.py) <= 20000
                               THEN 0 ELSE 1 END AS mc
                   FROM pairs pr
                   JOIN p pa ON pa.traj_id = pr.ta
                   JOIN p pb ON pb.traj_id = pr.tb),
            walk(ta, tb, i, j, layer, val) AS (
                SELECT ta, tb, 0::BIGINT, 0::BIGINT, 1, 0::BIGINT FROM pairs
              UNION ALL
                SELECT * FROM (
                  WITH nxt AS (
                    SELECT w.ta, w.tb, w.i + mv.dx AS i, w.j + mv.dy AS j,
                           min(w.val + CASE WHEN mv.kind = 2 THEN 0
                                            ELSE 1 END) AS pv,
                           mv.kind
                    FROM walk w
                    JOIN (VALUES (1, 1, 0, 0), (1, 0, 1, 1), (0, 1, 1, 2))
                         mv(layer, dx, dy, kind) ON mv.layer = w.layer
                    GROUP BY 1, 2, 3, 4, 6)
                  SELECT n.ta, n.tb, n.i, n.j, 1 AS layer,
                         min(n.pv + CASE WHEN n.kind = 2
                                         THEN coalesce(m.mc, 0)
                                         ELSE 0 END) AS val
                  FROM nxt n
                  JOIN pairs pr2 ON pr2.ta = n.ta AND pr2.tb = n.tb
                  LEFT JOIN mt m ON m.ta = n.ta AND m.tb = n.tb
                                AND m.i = n.i AND m.j = n.j
                  WHERE n.i <= pr2.na AND n.j <= pr2.nb
                  GROUP BY 1, 2, 3, 4
                  UNION ALL
                  SELECT ta, tb, i, j, 0 AS layer, val
                  FROM walk WHERE layer = 1
                )
            )
            SELECT pr.cx AS cell_x, pr.cy AS cell_y,
                   w.ta AS traj_a, w.tb AS traj_b, w.val::BIGINT AS edr
            FROM walk w JOIN pairs pr ON pr.ta = w.ta AND pr.tb = w.tb
            WHERE w.layer = 1 AND w.i = pr.na AND w.j = pr.nb
            ORDER BY cell_x, cell_y, traj_a, traj_b
        """,
        "frechet_pairs": f"""
            WITH RECURSIVE
            p AS (SELECT traj_id, step, px, py
                  FROM read_parquet('{oracle_path('dwell_points_src')}')),
            o AS (SELECT traj_id,
                         {_fdiv('min_by(px, step)', 100000)} AS cx,
                         {_fdiv('min_by(py, step)', 100000)} AS cy,
                         max(step) AS last_step
                  FROM p GROUP BY 1),
            pairs AS (SELECT a.traj_id AS ta, b.traj_id AS tb, a.cx, a.cy,
                             a.last_step AS ia, b.last_step AS jb
                      FROM o a JOIN o b ON a.cx = b.cx AND a.cy = b.cy
                                       AND a.traj_id < b.traj_id),
            dmat AS (SELECT pr.ta, pr.tb, pa.step AS i, pb.step AS j,
                            (pa.px - pb.px) * (pa.px - pb.px)
                            + (pa.py - pb.py) * (pa.py - pb.py) AS d2
                     FROM pairs pr
                     JOIN p pa ON pa.traj_id = pr.ta
                     JOIN p pb ON pb.traj_id = pr.tb),
            walk(ta, tb, i, j, layer, val) AS (
                SELECT ta, tb, 0::BIGINT, 0::BIGINT, 1, d2
                FROM dmat WHERE i = 0 AND j = 0
              UNION ALL
                SELECT * FROM (
                  WITH nxt AS (
                    SELECT w.ta, w.tb, w.i + mv.dx AS i, w.j + mv.dy AS j,
                           min(w.val) AS pv
                    FROM walk w
                    JOIN (VALUES (1, 1, 0), (1, 0, 1), (0, 1, 1))
                         mv(layer, dx, dy) ON mv.layer = w.layer
                    GROUP BY 1, 2, 3, 4)
                  SELECT n.ta, n.tb, n.i, n.j, 1 AS layer,
                         greatest(d.d2, n.pv) AS val
                  FROM nxt n JOIN dmat d ON d.ta = n.ta AND d.tb = n.tb
                                        AND d.i = n.i AND d.j = n.j
                  UNION ALL
                  SELECT ta, tb, i, j, 0 AS layer, val
                  FROM walk WHERE layer = 1
                )
            )
            SELECT pr.cx AS cell_x, pr.cy AS cell_y,
                   w.ta AS traj_a, w.tb AS traj_b, w.val::BIGINT AS f2
            FROM walk w JOIN pairs pr ON pr.ta = w.ta AND pr.tb = w.tb
            WHERE w.layer = 1 AND w.i = pr.ia AND w.j = pr.jb
            ORDER BY cell_x, cell_y, traj_a, traj_b
        """,
        # co-movement: step-equality self-join (simultaneous proximity, the
        # convoy primitive) with inclusive radius² and a HAVING count floor
        "comovement_pairs": f"""
            WITH p AS (SELECT traj_id, step, px, py
                       FROM read_parquet('{oracle_path('dwell_points_src')}')),
            h AS (SELECT a.traj_id AS ta, b.traj_id AS tb,
                         (a.px - b.px) * (a.px - b.px)
                         + (a.py - b.py) * (a.py - b.py) AS d2
                  FROM p a JOIN p b ON a.step = b.step
                                   AND a.traj_id < b.traj_id)
            SELECT ta AS traj_a, tb AS traj_b,
                   count(*)::BIGINT AS n_close, min(d2)::BIGINT AS min_d2
            FROM h WHERE d2 <= 900000000
            GROUP BY ta, tb HAVING count(*) >= 2
            ORDER BY traj_a, traj_b
        """,
        "map_match_trajectories": read_parquet_sql("map_match", "traj_id, step"),
        "convex_hull_cells": read_parquet_sql("convex_hull_cells", "cell_x, cell_y"),
        "media_histogram": read_parquet_sql("media_histogram", "doc_id, media_ref"),
        # TRUE SQL fuzzy join: DuckDB levenshtein over the O(n²) self-join
        # of the independently recomputed street-name set
        "fuzzy_name_pairs": f"""
            WITH names AS (
                SELECT DISTINCT street AS name
                FROM read_parquet('{oracle_path('fuzzy_names_src')}')
                WHERE street IS NOT NULL
            )
            SELECT a.name AS name_a, b.name AS name_b,
                   levenshtein(a.name, b.name)::BIGINT AS dist
            FROM names a JOIN names b ON a.name < b.name
            WHERE levenshtein(a.name, b.name) <= 1
            ORDER BY name_a, name_b
        """,
        # zoom pyramid recomputed level-by-level from the independent point
        # set (floor-halving + regrouping; floor() handles negative indices
        # where DuckDB's // would truncate)
        "tile_pyramid_nwa": f"""
            WITH l0 AS (
                SELECT floor((lon - {_RASTER_X0!r}) / {_RASTER_RES!r})::BIGINT AS ix,
                       floor((lat - {_RASTER_Y0!r}) / {_RASTER_RES!r})::BIGINT AS iy,
                       count(*)::BIGINT AS n
                FROM read_parquet('{oracle_path('tile_pyramid_src')}')
                GROUP BY 1, 2),
            l1 AS (SELECT CAST(floor(ix / 2.0) AS BIGINT) AS ix,
                          CAST(floor(iy / 2.0) AS BIGINT) AS iy,
                          sum(n)::BIGINT AS n
                   FROM l0 GROUP BY 1, 2),
            l2 AS (SELECT CAST(floor(ix / 2.0) AS BIGINT) AS ix,
                          CAST(floor(iy / 2.0) AS BIGINT) AS iy,
                          sum(n)::BIGINT AS n
                   FROM l1 GROUP BY 1, 2)
            SELECT 0::BIGINT AS zoom, ix, iy, n FROM l0
            UNION ALL SELECT 1::BIGINT, ix, iy, n FROM l1
            UNION ALL SELECT 2::BIGINT, ix, iy, n FROM l2
            ORDER BY zoom, ix, iy
        """,
    }
    for layer in (
        "osmi_addresses_connection_line",
        "osmi_addresses_nearest_points",
        "osmi_addresses_nearest_roads",
        "osmi_addresses_nearest_areas",
        "osmi_addresses_interpolation",
        "osmi_addresses_nodes_with_addresses",
        "osmi_addresses_ways_with_addresses",
        "osmi_addresses_addrx_on_nonclosed_way",
        "osmi_addresses_entrances",
        "osmi_addresses_ways_with_postal_code",
    ):
        out[layer] = read_parquet_sql(layer, "ALL")
    return out
