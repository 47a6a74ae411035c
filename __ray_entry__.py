"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship transcript→KG pipeline at sf0.001.
``queries()`` exposes every implemented operator/pipeline from SURVEY.md §2
(KG pipeline surfaces, relational operator archetypes, text analysis,
dedup, similarity search). ``oracle_sql()`` pairs each SQL-expressible one
with DuckDB SQL over the same inputs (the transcript corpus is a
deterministic synthetic parquet — its absolute path is embedded in the
SQL; the testdata tables are the driver's pre-registered views).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF01 = "/root/testdata/sf0.01"

# regex literals shared with codepropertygraph_ray.schema (no quotes inside,
# so they embed safely in single-quoted SQL strings)
_M = r"@\[([^\]]{1,200})\]"
_F1 = r"@\[([^\]]{1,200})\] <([a-z_]{1,40})> @\[([^\]]{1,200})\]"
_NORM = "trim(regexp_replace(lower(%s), '[^a-z0-9]+', ' ', 'g'))"


def _transcripts_path() -> str:
    from codepropertygraph_ray.sources.transcripts import ensure_transcripts

    return ensure_transcripts(SF01)


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 → the triples Dataset."""
    from codepropertygraph_ray.pipelines import queries as q

    return q.triples("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from codepropertygraph_ray.functions import (
        asof,
        dedup,
        multimodal,
        relational,
        similarity,
        sketch,
        text,
    )
    from codepropertygraph_ray.pipelines import analytics
    from codepropertygraph_ray.pipelines import queries as kgq

    q = {
        # --- KG pipeline surfaces (the north-rule flagship) ---------------
        "kg_mentions": kgq.mentions,
        "kg_facts": kgq.facts,
        "kg_entity_keys": kgq.entity_keys,
        "kg_canonical_map": kgq.canonical_map,
        "kg_canonical_map_dist": kgq.canonical_map_distributed,
        "kg_triples": kgq.triples,
        "kg_entity_stats": kgq.entity_stats,
        "kg_conv_stats": kgq.conv_stats,
        "kg_tool_usage": kgq.tool_usage,
        "kg_external_entities": kgq.external_entities,
        "kg_next_turn_pairs": kgq.next_turn_pairs,
        "kg_node_label_counts": kgq.node_label_counts,
        "kg_reaching_mentions": kgq.reaching_mentions_pairs,
        "kg_fact_closure": kgq.fact_closure,
        "kg_dominators": kgq.dominators,
        "kg_cdg": kgq.cdg_pairs,
        "kg_reaches_closure": kgq.reaches_closure,
        "kg_reaches_cross": kgq.reaches_cross,
        "kg_reaches_paths": kgq.reaches_paths,
        "kg_reaches_paths_sem": kgq.reaches_paths_semantic,
        "kg_reaches_paths_sem_map": kgq.reaches_paths_semantic_mapped,
        "kg_reaches_paths_ap": kgq.reaches_paths_accesspath,
        "kg_bindings": kgq.bindings_inherited,
        "kg_overrides": kgq.binding_overrides,
        "kg_member_resolve": kgq.member_resolve,
        "kg_dump_context": kgq.dump_turn_context,
        "kg_dot_export": kgq.dot_export,
        "kg_dot_cfg": kgq.dot_export_cfg,
        "kg_dot_cdg": kgq.dot_export_cdg,
        "kg_dot_ddg": kgq.dot_export_ddg,
        "kg_dot_pdg": kgq.dot_export_pdg,
        "kg_dot_cpg14": kgq.dot_export_cpg14,
        # --- KG graph analytics (whole-graph query surface) ----------------
        "kg_entity_cooccurrence": analytics.entity_cooccurrence,
        "kg_entity_degree": analytics.entity_degree,
        "kg_triangles": analytics.triangle_count,
        "kg_entity_bfs": analytics.entity_bfs,
        "kg_pagerank": analytics.pagerank,
        "kg_entity_jaccard": analytics.entity_jaccard,
        "kg_entity_pmi": analytics.entity_pmi,
        "kg_entity_span": analytics.entity_span,
        "kg_fuzzy_keys": analytics.fuzzy_key_pairs,
        "kg_local_cc": analytics.entity_local_cc,
        "kg_kcore": analytics.kcore,
        "kg_assortativity": analytics.assortativity,
        "kg_scc": analytics.scc_capped,
        "kg_widest_path": analytics.widest_path,
        "kg_adamic_adar": analytics.adamic_adar,
        "kg_hits": analytics.hits,
        "kg_entity_salience": analytics.entity_salience,
        "kg_conv_jaccard": analytics.conv_jaccard,
        "kg_communities": analytics.communities,
        "kg_conv_groups": analytics.conv_groups,
        # --- relational operator archetypes (SURVEY.md §2 analogs) --------
        "rel_q1_pricing": relational.q1_pricing,
        "rel_nation_revenue": relational.nation_revenue,
        "rel_q3_unshipped": relational.q3_unshipped,
        "rel_parts_without_lineitems": relational.parts_without_lineitems,
        "rel_customers_with_orders": relational.customers_with_orders,
        "rel_distinct_part_types": relational.distinct_part_types,
        "rel_dedup_docs_exact": relational.dedup_docs_exact,
        "rel_orders_by_priority": relational.orders_by_priority,
        "rel_top_orders": relational.top_orders,
        "rel_events_hourly": relational.events_hourly,
        "rel_part_type_tokens": relational.part_type_tokens,
        "rel_events_extract_k": relational.events_extract_k,
        "rel_shipped_monthly": relational.shipped_monthly,
        "rel_asof_click_view": asof.asof_join_events,
        "rel_range_count": asof.range_count_events,
        "rel_funnel": relational.funnel_stages,
        "rel_session_overlap": asof.session_overlap_counts,
        "rel_sessionize": relational.sessionize_events,
        "rel_gap_fill": relational.gap_fill_hourly,
        "rel_skyline": relational.skyline_orders,
        "rel_first_last": relational.first_last_event,
        "rel_topk_per_customer": relational.topk_orders_per_customer,
        "rel_percent_rank": relational.percent_rank_orders,
        "rel_value_bands": relational.events_value_bands,
        "rel_rolling_avg": relational.rolling_avg_events,
        "rel_sliding_max": relational.sliding_max_events,
        "rel_lag_gaps": relational.lag_gaps,
        "rel_median_price": relational.median_price_by_priority,
        "rel_price_quantiles": relational.price_quantiles_by_priority,
        "rel_mode_event": relational.mode_event_per_user,
        "rel_sample_hash": relational.sample_orders_hash,
        "rel_sample_weighted": relational.sample_orders_weighted,
        "rel_shuffle_rank": relational.shuffle_rank_orders,
        "rel_bloom_antijoin": sketch.customers_without_events,
        "rel_pivot_events": relational.pivot_event_types,
        "rel_region_nations": relational.region_nation_list,
        "rel_rollup_revenue": relational.rollup_revenue,
        "rel_cube_revenue": relational.cube_revenue,
        "rel_above_avg": relational.orders_above_customer_avg,
        "rel_sample_stratified": relational.sample_stratified_events,
        "rel_hourly_active_users": relational.hourly_active_users,
        "rel_cumulative_users": relational.cumulative_new_users,
        "rel_retention_cohorts": relational.retention_cohorts,
        "rel_trend_slope": relational.trend_slope,
        "rel_transitions": relational.event_transitions,
        "rel_out_of_order": relational.out_of_order_events,
        "rel_unpivot": relational.unpivot_lineitem,
        "rel_division": relational.users_all_event_types,
        "rel_compact": relational.distinct_until_changed,
        "rel_interval_coverage": relational.interval_coverage,
        "rel_histogram": relational.histogram_prices,
        "rel_ntile": relational.ntile_orders,
        "rel_corr": relational.corr_qty_price,
        "agg_hll_users": sketch.hll_distinct_users,  # approximate — no SQL oracle
        "agg_cms_heavy": sketch.cms_heavy_users,  # approximate — no SQL oracle
        # --- training-data ops: text analysis -----------------------------
        "text_token_stats": text.token_stats,
        "text_bpe_tokens": text.bpe_token_count,
        "text_quality": text.quality_signals,
        "text_lang_id": text.lang_id,
        "text_bigrams": text.bigram_counts,
        "text_top_term": text.top_term,
        "text_contamination": text.contamination,
        "text_dataset_split": text.dataset_split,
        "text_redact": text.redact,
        "text_tfidf": text.tfidf_top_terms,
        "text_pack_chunks": text.pack_chunks,
        "text_repetition": text.repetition_stats,
        "text_unigram_logprob": text.unigram_logprob,
        "text_bigram_logprob": text.bigram_logprob,
        "text_char_entropy": text.char_entropy,
        "text_simhash": text.simhash64,
        "text_fingerprint": text.fingerprint,
        # --- training-data ops: dedup --------------------------------------
        "dedup_ngram_jaccard": dedup.ngram_jaccard_pairs,
        "dedup_minhash_lsh": dedup.minhash_lsh_pairs,
        "dedup_keep_list": dedup.dedup_keep_list,
        "dedup_simhash_pairs": dedup.simhash_pairs,
        "dedup_exact_spans": dedup.exact_span_stats,
        "dedup_dup_spans": dedup.dup_spans,
        "dedup_cut_text": dedup.cut_dup_spans,
        "kg_turn_dup_spans": dedup.turn_dup_span_stats,
        # --- training-data ops: similarity search --------------------------
        "sim_knn_bruteforce": similarity.knn_bruteforce,
        "sim_knn_lsh": similarity.knn_lsh,  # approximate — no SQL oracle
        "sim_knn_ivf": similarity.knn_ivf,  # approximate — no SQL oracle
        "sim_embedding_dups": similarity.embedding_dups,
        "sim_dup_groups": similarity.dup_groups,
        "sim_keep_list": similarity.dedup_keep_embeddings,
        "sim_dbscan": similarity.dbscan_embeddings,
        "sim_quantize_int8": similarity.quantize_int8,
        "sim_kmeans": similarity.kmeans_clusters,
        "sim_mutual_knn": similarity.mutual_knn,
        # --- multimodal plumbing (decode stub) -----------------------------
        "mm_media_features": multimodal.media_features,
        "mm_frame_features": multimodal.frame_features,
        "mm_media_stats": multimodal.media_stats,
        "mm_payload_dups": multimodal.payload_dup_groups,
        "mm_chunk_payloads": multimodal.chunk_payloads,
    }
    return _interleave_families(q)


def _interleave_families(q: dict) -> dict:
    """Round-robin the op families (key prefix before the first '_') so a
    PREFIX/SAMPLE of queries() still touches every family — the driver's
    correctness run samples ~50 entries, and grouped ordering left whole
    families (dedup_/sim_/text_/mm_) unsampled in round 3."""
    fams: dict[str, list] = {}
    for k in q:
        fams.setdefault(k.split("_", 1)[0], []).append(k)
    out: dict = {}
    lists = list(fams.values())
    i = 0
    while any(lists):
        for fam in lists:
            if i < len(fam):
                out[fam[i]] = q[fam[i]]
        i += 1
        if i > max(len(f) for f in lists):
            break
    return out


# ---------------------------------------------------------------------------
# oracle SQL
# ---------------------------------------------------------------------------


def _pagerank_chain(iters: int, damping: float) -> str:
    """Unrolled c{{i}}/r{{i}} CTE pairs for ``iters`` PageRank steps — generated
    from the SAME constants the Ray operator uses (PR_ITERS/PR_DAMPING), so
    tuning one side can never silently desync the gate. ``(1 - damping)``
    is spelled as the subtraction so both sides evaluate the identical IEEE
    expression tree."""
    parts = []
    for i in range(1, iters + 1):
        parts.append(f"""
          , c{i} AS (SELECT e.b AS n, sum(r{i - 1}.pr / od.deg) AS c
                 FROM e JOIN r{i - 1} ON r{i - 1}.n = e.a JOIN od ON od.a = e.a GROUP BY e.b),
          r{i} AS (SELECT nodes.n,
                        (1 - {damping!r}) / (SELECT cnt FROM nn) + {damping!r} * coalesce(c{i}.c, 0) AS pr
                 FROM nodes LEFT JOIN c{i} ON c{i}.n = nodes.n)""")
    return "".join(parts)


def _hits_chain(iters: int) -> str:
    """Unrolled ha{{i}}/hh{{i}} CTE pairs for ``iters`` HITS steps over the
    he edge list — generated from the SAME constant the Ray operator uses
    (HITS_ITERS). All-integer (hub≡1 init, no normalization), so the two
    sides must agree bit-exactly."""
    parts = []
    for i in range(1, iters + 1):
        parts.append(f"""
          , ha{i} AS (SELECT he.b AS n, sum(hh{i - 1}.h) AS a
                 FROM he JOIN hh{i - 1} ON hh{i - 1}.n = he.a GROUP BY he.b),
          hh{i} AS (SELECT he.a AS n, sum(ha{i}.a) AS h
                 FROM he JOIN ha{i} ON ha{i}.n = he.b GROUP BY he.a)""")
    return "".join(parts)


def _kmeans_chain(iters: int) -> str:
    """Unrolled km_a{{i}}/km_c{{i}} CTE pairs for ``iters`` Lloyd rounds plus
    the final labeling assignment km_a{{iters+1}} — generated from the SAME
    constants the Ray operator uses (KM_ITERS). All arithmetic is integer-
    valued (quantized coordinates, integer squared-L2, floor-div centroid
    means), so argmins agree bit-for-bit; assignment ties break on lowest
    cluster id on both sides."""
    parts = []
    for i in range(1, iters + 2):
        parts.append(f"""
          , km_a{i} AS (
            SELECT vec_id, cl FROM (
              SELECT x.vec_id, c.cl,
                     row_number() OVER (PARTITION BY x.vec_id ORDER BY
                       list_inner_product(CAST(x.v AS DOUBLE[]), CAST(x.v AS DOUBLE[]))
                       - 2 * list_inner_product(CAST(x.v AS DOUBLE[]), CAST(c.c AS DOUBLE[]))
                       + list_inner_product(CAST(c.c AS DOUBLE[]), CAST(c.c AS DOUBLE[])),
                       c.cl) AS rnk
              FROM km_x x CROSS JOIN km_c{i - 1} c)
            WHERE rnk = 1)""")
        if i <= iters:
            parts.append(f"""
          , km_c{i} AS (
            SELECT cl, list(u ORDER BY pos) AS c FROM (
              SELECT a.cl, e.pos,
                     CAST(floor(CAST(sum(e.val) AS DOUBLE) / count(*)) AS BIGINT) AS u
              FROM km_a{i} a JOIN km_el e USING (vec_id)
              GROUP BY a.cl, e.pos) GROUP BY cl)""")
    return "".join(parts)


def _kcore_chain(iters: int, k: int) -> str:
    """Unrolled kc_s{{i}} survivor-set CTEs for ``iters`` k-core peel
    rounds over the undirected kc_und edge list — generated from the SAME
    constants the Ray operator uses (KCORE_ITERS/KCORE_K). Peeling is
    monotone, so the Ray side's fixed-point early-exit equals this exact
    unroll on converged inputs and matches it step-for-step otherwise."""
    parts = []
    for i in range(1, iters + 1):
        parts.append(f"""
          , kc_s{i} AS (
            SELECT u.a AS n FROM kc_und u
            JOIN kc_s{i - 1} x ON u.a = x.n JOIN kc_s{i - 1} y ON u.b = y.n
            GROUP BY u.a HAVING count(*) >= {k})""")
    return "".join(parts)


def _widest_chain(depth: int, inf: int) -> str:
    """Unrolled wp_w{{i}} width-table CTEs for ``depth`` max-min
    relaxation rounds over wp_und — generated from the SAME constants the
    Ray operator uses (WIDEST_DEPTH/WIDEST_INF). All-integer arithmetic;
    the Ray side's monotone fixed-point early-exit equals this unroll."""
    parts = []
    for i in range(1, depth + 1):
        parts.append(f"""
          , wp_w{i} AS (
            SELECT n, max(c) AS w FROM (
              SELECT n, w AS c FROM wp_w{i - 1}
              UNION ALL
              SELECT u.b AS n, least(p.w, CAST(u.n_turns AS BIGINT)) AS c
              FROM wp_und u JOIN wp_w{i - 1} p ON p.n = u.a
            ) GROUP BY n)""")
    return "".join(parts)


def _kg_sql() -> dict[str, str]:
    from codepropertygraph_ray.pipelines.queries import (
        BIND_MAX_DEPTH,
        CROSS_DEPTH,
        REACHES_PATH_DEPTH,
        SEM_TOP_K,
    )
    from codepropertygraph_ray.pipelines.analytics import (
        BFS_MAX_DEPTH,
        JAC_ROUND,
        PMI_ROUND,
        PR_DAMPING,
        KCORE_ITERS,
        KCORE_K,
        AA_UNIT,
        HITS_ITERS,
        IDF_UNIT,
        CONV_JAC_DF_CAP,
        CONV_JAC_NUM,
        CONV_JAC_DEN,
        LPA_ITERS,
        SCC_DEPTH,
        WIDEST_DEPTH,
        WIDEST_INF,
        PR_ITERS,
        PR_ROUND,
    )

    P = _transcripts_path()  # a directory of part files
    t = f"read_parquet('{P}/*.parquet')"
    key = _NORM % "surface"

    mentions = f"""
      SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn_idx,
             CAST(unnest(generate_series(1, len(regexp_extract_all(text, '{_M}', 1)))) - 1 AS INTEGER) AS ordinal,
             unnest(regexp_extract_all(text, '{_M}', 1)) AS surface
      FROM {t}
    """
    mentions_keyed = f"SELECT conv_id, turn_idx, ordinal, surface, {key} AS key FROM ({mentions})"

    facts = f"""
      SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn_idx,
             CAST(unnest(generate_series(1, len(regexp_extract_all(text, '{_F1}', 1)))) - 1 AS INTEGER) AS ordinal,
             unnest(regexp_extract_all(text, '{_F1}', 1)) AS s_surface,
             unnest(regexp_extract_all(text, '{_F1}', 2)) AS pred,
             unnest(regexp_extract_all(text, '{_F1}', 3)) AS o_surface
      FROM {t}
    """
    facts_keyed = f"""
      SELECT conv_id, turn_idx, ordinal,
             {_NORM % 's_surface'} AS subj_key, pred,
             {_NORM % 'o_surface'} AS obj_key
      FROM ({facts})
    """

    canon = f"""
      WITH RECURSIVE
      mk AS (SELECT DISTINCT key FROM ({mentions_keyed})),
      ap AS (SELECT DISTINCT subj_key AS a, obj_key AS b
             FROM ({facts_keyed}) WHERE pred = 'alias_of'),
      e(a, b) AS (SELECT a, b FROM ap UNION SELECT b, a FROM ap),
      reach(node, r) AS (
        SELECT key, key FROM mk
        UNION
        SELECT reach.node, e.b FROM reach JOIN e ON e.a = reach.r
      )
      SELECT node AS key, min(r) AS canon FROM reach GROUP BY node
    """

    linked = f"""
      SELECT DISTINCT canon FROM (
        SELECT coalesce(cs.canon, f.subj_key) AS canon
        FROM ({facts_keyed}) f LEFT JOIN ({canon}) cs ON cs.key = f.subj_key
        UNION ALL
        SELECT coalesce(co.canon, f.obj_key) AS canon
        FROM ({facts_keyed}) f LEFT JOIN ({canon}) co ON co.key = f.obj_key
      )
    """

    triples_all = f"""
      SELECT coalesce(cs.canon, f.subj_key) AS subj, f.pred,
             coalesce(co.canon, f.obj_key) AS obj, f.conv_id, f.turn_idx
      FROM ({facts_keyed}) f
      LEFT JOIN ({canon}) cs ON cs.key = f.subj_key
      LEFT JOIN ({canon}) co ON co.key = f.obj_key
      WHERE f.pred <> 'alias_of'
    """
    triples = f"""
      SELECT subj, pred, obj,
             split_part(mink, '|', 1) AS conv_id,
             CAST(split_part(mink, '|', 2) AS INTEGER) AS turn_idx
      FROM (
        SELECT subj, pred, obj,
               min(conv_id || '|' || lpad(CAST(turn_idx AS VARCHAR), 9, '0')) AS mink
        FROM ({triples_all}) GROUP BY subj, pred, obj
      )
    """

    entity_stats = f"""
      SELECT c.canon,
             CAST(count(*) AS BIGINT) AS n_mentions,
             (l.canon IS NULL) AS is_external
      FROM ({mentions_keyed}) m
      JOIN ({canon}) c ON c.key = m.key
      LEFT JOIN ({linked}) l ON l.canon = c.canon
      GROUP BY c.canon, l.canon
    """

    # the canonical co-mention edge list (a < b) shared by the graph-
    # analytics oracles
    cooc = f"""
      WITH mc AS (SELECT DISTINCT m.conv_id, m.turn_idx, c.canon
                  FROM ({mentions_keyed}) m JOIN ({canon}) c ON c.key = m.key)
      SELECT a.canon AS canon_a, b.canon AS canon_b,
             CAST(count(*) AS BIGINT) AS n_turns
      FROM mc a JOIN mc b
        ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
       AND a.canon < b.canon
      GROUP BY a.canon, b.canon
    """

    # synchronous label propagation, LPA_ITERS rounds unrolled (same
    # construction as the fixed-iteration pagerank/HITS oracles): argmax
    # neighbor label with lexicographic-min tie-break via row_number
    lpa_cte = [
        "lpa_e AS MATERIALIZED (SELECT canon_a AS a, canon_b AS b "
        f"FROM ({cooc})),",
        "lpa_und(src, dst) AS (SELECT a, b FROM lpa_e "
        "UNION ALL SELECT b, a FROM lpa_e),",
        "lpa_l0 AS (SELECT DISTINCT dst AS node, dst AS lab FROM lpa_und),",
    ]
    for i in range(1, LPA_ITERS + 1):
        lpa_cte.append(
            f"lpa_v{i} AS (SELECT u.dst AS node, l.lab, count(*) AS c "
            f"FROM lpa_und u JOIN lpa_l{i - 1} l ON l.node = u.src "
            "GROUP BY 1, 2),"
        )
        lpa_cte.append(
            f"lpa_l{i} AS (SELECT node, lab FROM ("
            "SELECT node, lab, row_number() OVER (PARTITION BY node "
            f"ORDER BY c DESC, lab) AS rn FROM lpa_v{i}) WHERE rn = 1),"
        )
    lpa_sql = (
        "WITH " + " ".join(lpa_cte).rstrip(",")
        + f" SELECT node AS canon, lab AS community FROM lpa_l{LPA_ITERS}"
    )

    conv_jac = f"""
      WITH cj_cs AS MATERIALIZED (
        SELECT DISTINCT m.conv_id, c.canon
        FROM ({mentions_keyed}) m JOIN ({canon}) c ON c.key = m.key),
      cj_df AS (SELECT canon, count(*) AS df FROM cj_cs GROUP BY canon),
      cj_kept AS (SELECT cs.conv_id, cs.canon
                  FROM cj_cs cs JOIN cj_df d USING (canon)
                  WHERE d.df <= {CONV_JAC_DF_CAP}),
      cj_sz AS (SELECT conv_id, CAST(count(*) AS BIGINT) AS n
                FROM cj_kept GROUP BY conv_id),
      cj_pr AS (SELECT a.conv_id AS conv_a, b.conv_id AS conv_b,
                       CAST(count(*) AS BIGINT) AS n_common
                FROM cj_kept a JOIN cj_kept b
                  ON a.canon = b.canon AND a.conv_id < b.conv_id
                GROUP BY 1, 2)
      SELECT p.conv_a, p.conv_b, p.n_common,
             sa.n + sb.n - p.n_common AS n_union
      FROM cj_pr p
      JOIN cj_sz sa ON sa.conv_id = p.conv_a
      JOIN cj_sz sb ON sb.conv_id = p.conv_b
      WHERE p.n_common * {CONV_JAC_DEN}
            >= {CONV_JAC_NUM} * (sa.n + sb.n - p.n_common)
    """

    return {
        "kg_mentions": mentions_keyed,
        "kg_facts": facts_keyed,
        "kg_entity_keys": f"SELECT key, CAST(count(*) AS BIGINT) AS n_mentions FROM ({mentions_keyed}) GROUP BY key",
        "kg_canonical_map": canon,
        # same oracle: the forced distributed hash-min path must agree with
        # the recursive-CTE closure exactly (algorithm check, not a rerun)
        "kg_canonical_map_dist": canon,
        "kg_triples": triples,
        "kg_entity_stats": entity_stats,
        "kg_conv_stats": f"""
          SELECT tt.conv_id, tt.n_turns,
                 coalesce(m.n_mentions, 0) AS n_mentions,
                 coalesce(fx.n_facts, 0) AS n_facts
          FROM (SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns FROM {t} GROUP BY conv_id) tt
          LEFT JOIN (SELECT conv_id, CAST(count(*) AS BIGINT) AS n_mentions
                     FROM ({mentions_keyed}) GROUP BY conv_id) m ON m.conv_id = tt.conv_id
          LEFT JOIN (SELECT conv_id, CAST(count(*) AS BIGINT) AS n_facts
                     FROM ({facts_keyed}) GROUP BY conv_id) fx ON fx.conv_id = tt.conv_id
        """,
        "kg_tool_usage": f"""
          SELECT tool, CAST(count(*) AS BIGINT) AS n_turns FROM {t}
          WHERE role = 'tool' AND tool IS NOT NULL AND tool <> '' GROUP BY tool
        """,
        "kg_external_entities": f"SELECT canon FROM ({entity_stats}) WHERE is_external",
        "kg_next_turn_pairs": f"""
          SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn_idx, next_turn_idx FROM (
            SELECT conv_id, turn_idx,
                   CAST(lead(turn_idx) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS INTEGER) AS next_turn_idx
            FROM {t}
          ) WHERE next_turn_idx IS NOT NULL
        """,
        "kg_reaching_mentions": f"""
          SELECT conv_id, src_turn_idx, dst_turn_idx, variable FROM (
            SELECT conv_id, turn_idx AS src_turn_idx,
                   CAST(lead(turn_idx) OVER (
                     PARTITION BY conv_id, key ORDER BY turn_idx
                   ) AS INTEGER) AS dst_turn_idx,
                   key AS variable
            FROM (SELECT DISTINCT conv_id, turn_idx, key FROM ({mentions_keyed}))
          ) WHERE dst_turn_idx IS NOT NULL
        """,
        "kg_fact_closure": f"""
          WITH RECURSIVE
          tri AS (SELECT DISTINCT subj, obj FROM ({triples_all})),
          seed AS (SELECT min(subj) AS s FROM tri),
          fc_reach(name, d) AS (
            SELECT s, 0 FROM seed
            UNION
            SELECT tri.obj, fc_reach.d + 1 FROM fc_reach
            JOIN tri ON tri.subj = fc_reach.name WHERE fc_reach.d < 3
          )
          SELECT DISTINCT name AS full_name FROM fc_reach
        """,
        "kg_dump_context": f"""
          SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn_idx, role, text
          FROM {t}
          WHERE conv_id = 'conv-0000000' AND turn_idx BETWEEN 9 AND 11
        """,
        # dominators over the conversation reply graph (chain + user-skip
        # edges — an interval DAG): closed form m dom n ⟺ no skip edge
        # spans m with endpoint ≤ n; idom(n) = max such m. The Ray side
        # runs Cooper-Harvey-Kennedy per conversation; agreement checks
        # the algorithm (CfgDominatorPass.scala:15-60 analog).
        "kg_dominators": f"""
          WITH tt AS (SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn, role FROM {t}),
          sk AS (SELECT conv_id, turn AS a,
                        lead(turn) OVER (PARTITION BY conv_id ORDER BY turn) AS b
                 FROM tt WHERE role = 'user'),
          skips AS (SELECT conv_id, a, b FROM sk WHERE b IS NOT NULL AND b > a + 1),
          bm AS (SELECT tt.conv_id, tt.turn AS m, min(s.b) AS bmin
                 FROM tt LEFT JOIN skips s
                   ON s.conv_id = tt.conv_id AND s.a < tt.turn AND s.b > tt.turn
                 GROUP BY tt.conv_id, tt.turn)
          SELECT n.conv_id, n.turn AS turn_idx,
                 CAST(max(m.m) AS INTEGER) AS idom_turn_idx
          FROM tt n JOIN bm m ON m.conv_id = n.conv_id AND m.m < n.turn
          WHERE m.bmin IS NULL OR m.bmin > n.turn
          GROUP BY n.conv_id, n.turn
        """,
        # control dependence via Ferrante's definition with the interval-DAG
        # span predicate for post-dominance (CdgPass.scala:17-54 analog)
        "kg_cdg": f"""
          WITH tt AS (SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn, role FROM {t}),
          sk AS (SELECT conv_id, turn AS a,
                        lead(turn) OVER (PARTITION BY conv_id ORDER BY turn) AS b
                 FROM tt WHERE role = 'user'),
          skips AS (SELECT conv_id, a, b FROM sk WHERE b IS NOT NULL AND b > a + 1),
          chain AS (SELECT conv_id, turn AS a,
                           lead(turn) OVER (PARTITION BY conv_id ORDER BY turn) AS b
                    FROM tt),
          e AS (SELECT conv_id, a, b FROM chain WHERE b IS NOT NULL
                UNION SELECT conv_id, a, b FROM skips)
          SELECT DISTINCT e.conv_id, e.a AS controller, d.turn AS dependent
          FROM e JOIN tt d ON d.conv_id = e.conv_id AND d.turn >= e.b
          WHERE NOT EXISTS (SELECT 1 FROM skips k
                            WHERE k.conv_id = e.conv_id AND k.a >= e.b
                              AND k.a < d.turn AND k.b > d.turn)
            AND EXISTS (SELECT 1 FROM skips k2
                        WHERE k2.conv_id = e.conv_id AND k2.a >= e.a
                          AND k2.a < d.turn AND k2.b > d.turn)
        """,
        # bounded closure over the REACHES overlay — the `.reachableBy`
        # equivalent (Engine.scala:16-127 → frontier expansion over
        # REACHING_DEF edges, SURVEY.md §2.4)
        "kg_reaches_closure": f"""
          WITH RECURSIVE
          rp AS (
            SELECT conv_id, src_turn_idx, dst_turn_idx FROM (
              SELECT conv_id, turn_idx AS src_turn_idx,
                     CAST(lead(turn_idx) OVER (
                       PARTITION BY conv_id, key ORDER BY turn_idx
                     ) AS INTEGER) AS dst_turn_idx
              FROM (SELECT DISTINCT conv_id, turn_idx, key FROM ({mentions_keyed}))
            ) WHERE dst_turn_idx IS NOT NULL
          ),
          mine AS (SELECT CAST(src_turn_idx AS INTEGER) AS s,
                          CAST(dst_turn_idx AS INTEGER) AS d
                   FROM rp WHERE conv_id = 'conv-0000000'),
          seed AS (SELECT min(s) AS s0 FROM mine),
          rc(turn, depth) AS (
            SELECT s0, 0 FROM seed
            UNION
            SELECT mine.d, rc.depth + 1 FROM rc
            JOIN mine ON mine.s = rc.turn WHERE rc.depth < 3
          )
          SELECT DISTINCT CAST(turn AS INTEGER) AS turn_idx FROM rc
        """,
        # dataflow closure with ONE boundary expansion: intra-conversation
        # REACHES hops ∪ shared-entity hops into the other conversation's
        # earliest mention of the key (Engine.scala:70-125 param↔arg
        # task-spawning analog); depth-capped recursive CTE
        "kg_reaches_cross": f"""
          WITH RECURSIVE
          rcx_mt AS (SELECT DISTINCT conv_id, CAST(turn_idx AS INTEGER) AS turn, key
                     FROM ({mentions_keyed})),
          rcx_rp AS (
            SELECT conv_id, src_turn_idx, dst_turn_idx FROM (
              SELECT conv_id, turn AS src_turn_idx,
                     lead(turn) OVER (PARTITION BY conv_id, key ORDER BY turn)
                       AS dst_turn_idx
              FROM rcx_mt
            ) WHERE dst_turn_idx IS NOT NULL
          ),
          rcx_entry AS (SELECT key, conv_id, min(turn) AS turn
                        FROM rcx_mt GROUP BY key, conv_id),
          rcx_edges AS (
            SELECT conv_id AS c1, src_turn_idx AS t1,
                   conv_id AS c2, dst_turn_idx AS t2 FROM rcx_rp
            UNION
            SELECT m.conv_id, m.turn, e.conv_id, e.turn
            FROM rcx_mt m JOIN rcx_entry e
              ON e.key = m.key AND e.conv_id <> m.conv_id
          ),
          rcx_seed AS (SELECT min(src_turn_idx) AS s FROM rcx_rp
                       WHERE conv_id = 'conv-0000000'),
          rcx(conv_id, turn, depth) AS (
            SELECT 'conv-0000000', s, 0 FROM rcx_seed WHERE s IS NOT NULL
            UNION
            SELECT e.c2, e.t2, rcx.depth + 1
            FROM rcx JOIN rcx_edges e
              ON e.c1 = rcx.conv_id AND e.t1 = rcx.turn
            WHERE rcx.depth < {CROSS_DEPTH}
          )
          SELECT DISTINCT conv_id, CAST(turn AS INTEGER) AS turn_idx FROM rcx
        """,
        # PATH ENUMERATION over REACHES — the `.reachableByFlows` analog
        # (Engine.scala:16-127 returns node paths; ResultTable.scala:1-76):
        # every flow of length <= depth from each conversation's earliest
        # source turn, path accumulated as 'a->b->c'. rpp_ prefixes guard
        # against WITH-RECURSIVE name capture by nested snippet CTEs.
        "kg_reaches_paths": f"""
          WITH RECURSIVE
          rpp_raw AS (
            SELECT conv_id, src_turn_idx, dst_turn_idx FROM (
              SELECT conv_id, turn_idx AS src_turn_idx,
                     CAST(lead(turn_idx) OVER (
                       PARTITION BY conv_id, key ORDER BY turn_idx
                     ) AS INTEGER) AS dst_turn_idx
              FROM (SELECT DISTINCT conv_id, turn_idx, key FROM ({mentions_keyed}))
            ) WHERE dst_turn_idx IS NOT NULL
          ),
          rpp_e AS (SELECT DISTINCT conv_id, CAST(src_turn_idx AS INTEGER) AS es,
                           CAST(dst_turn_idx AS INTEGER) AS ed FROM rpp_raw),
          rpp_seeds AS (SELECT conv_id, min(es) AS s0 FROM rpp_e GROUP BY conv_id),
          rpp_paths(conv_id, start_turn, end_turn, depth, path) AS (
            SELECT e.conv_id, s.s0, e.ed, 1,
                   CAST(s.s0 AS VARCHAR) || '->' || CAST(e.ed AS VARCHAR)
            FROM rpp_seeds s JOIN rpp_e e
              ON e.conv_id = s.conv_id AND e.es = s.s0
            UNION ALL
            SELECT p.conv_id, p.start_turn, e.ed, p.depth + 1,
                   p.path || '->' || CAST(e.ed AS VARCHAR)
            FROM rpp_paths p JOIN rpp_e e
              ON e.conv_id = p.conv_id AND e.es = p.end_turn
            WHERE p.depth < {REACHES_PATH_DEPTH}
          )
          SELECT conv_id, CAST(start_turn AS INTEGER) AS start_turn,
                 CAST(end_turn AS INTEGER) AS end_turn,
                 CAST(depth AS INTEGER) AS depth, path
          FROM rpp_paths
        """,
        # semantics-filtered flow enumeration (Parser.scala:34-76 DSL +
        # Engine's per-call-site semantics): edges whose variable is the
        # corpus's most frequent reaching key (tie -> lexicographic min,
        # the generated kill rule) are removed before expansion
        "kg_reaches_paths_sem": f"""
          WITH RECURSIVE
          rps_raw AS MATERIALIZED (
            SELECT conv_id, key, src_turn_idx, dst_turn_idx FROM (
              SELECT conv_id, key, turn_idx AS src_turn_idx,
                     CAST(lead(turn_idx) OVER (
                       PARTITION BY conv_id, key ORDER BY turn_idx
                     ) AS INTEGER) AS dst_turn_idx
              FROM (SELECT DISTINCT conv_id, turn_idx, key FROM ({mentions_keyed}))
            ) WHERE dst_turn_idx IS NOT NULL
          ),
          rps_blocked AS (
            SELECT key FROM (SELECT key, count(*) AS n FROM rps_raw GROUP BY key)
            ORDER BY n DESC, key LIMIT {SEM_TOP_K}
          ),
          rps_e AS (SELECT DISTINCT conv_id, CAST(src_turn_idx AS INTEGER) AS es,
                           CAST(dst_turn_idx AS INTEGER) AS ed
                    FROM rps_raw
                    WHERE key NOT IN (SELECT key FROM rps_blocked)),
          rps_seeds AS (SELECT conv_id, min(es) AS s0 FROM rps_e GROUP BY conv_id),
          rps_paths(conv_id, start_turn, end_turn, depth, path) AS (
            SELECT e.conv_id, s.s0, e.ed, 1,
                   CAST(s.s0 AS VARCHAR) || '->' || CAST(e.ed AS VARCHAR)
            FROM rps_seeds s JOIN rps_e e
              ON e.conv_id = s.conv_id AND e.es = s.s0
            UNION ALL
            SELECT p.conv_id, p.start_turn, e.ed, p.depth + 1,
                   p.path || '->' || CAST(e.ed AS VARCHAR)
            FROM rps_paths p JOIN rps_e e
              ON e.conv_id = p.conv_id AND e.es = p.end_turn
            WHERE p.depth < {REACHES_PATH_DEPTH}
          )
          SELECT conv_id, CAST(start_turn AS INTEGER) AS start_turn,
                 CAST(end_turn AS INTEGER) AS end_turn,
                 CAST(depth AS INTEGER) AS depth, path
          FROM rps_paths
        """,
        # PER-ARGUMENT semantics mappings (Parser.scala:34-76
        # PassThroughMapping): top-K variables declared "0->0" — their hops
        # top-K variables declared "1->1": hops survive only where the
        # variable's min mention ordinal is 1 at BOTH endpoints
        "kg_reaches_paths_sem_map": f"""
          WITH RECURSIVE
          rsm_mt AS MATERIALIZED (
            SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn, key,
                   CAST(min(ordinal) AS BIGINT) AS p
            FROM ({mentions_keyed}) GROUP BY conv_id, turn_idx, key
          ),
          rsm_raw AS MATERIALIZED (
            SELECT conv_id, key, src_turn_idx, dst_turn_idx, p_src, p_dst FROM (
              SELECT conv_id, key, turn AS src_turn_idx, p AS p_src,
                     lead(turn) OVER (PARTITION BY conv_id, key ORDER BY turn)
                       AS dst_turn_idx,
                     lead(p) OVER (PARTITION BY conv_id, key ORDER BY turn)
                       AS p_dst
              FROM rsm_mt
            ) WHERE dst_turn_idx IS NOT NULL
          ),
          rsm_top AS (
            SELECT key FROM (SELECT key, count(*) AS n FROM rsm_raw GROUP BY key)
            ORDER BY n DESC, key LIMIT {SEM_TOP_K}
          ),
          rsm_e AS (
            SELECT DISTINCT conv_id, CAST(src_turn_idx AS INTEGER) AS es,
                   CAST(dst_turn_idx AS INTEGER) AS ed
            FROM rsm_raw
            WHERE key NOT IN (SELECT key FROM rsm_top)
               OR (p_src = 1 AND p_dst = 1)
          ),
          rsm_seeds AS (SELECT conv_id, min(es) AS s0 FROM rsm_e GROUP BY conv_id),
          rsm_paths(conv_id, start_turn, end_turn, depth, path) AS (
            SELECT e.conv_id, s.s0, e.ed, 1,
                   CAST(s.s0 AS VARCHAR) || '->' || CAST(e.ed AS VARCHAR)
            FROM rsm_seeds s JOIN rsm_e e
              ON e.conv_id = s.conv_id AND e.es = s.s0
            UNION ALL
            SELECT p.conv_id, p.start_turn, e.ed, p.depth + 1,
                   p.path || '->' || CAST(e.ed AS VARCHAR)
            FROM rsm_paths p JOIN rsm_e e
              ON e.conv_id = p.conv_id AND e.es = p.end_turn
            WHERE p.depth < {REACHES_PATH_DEPTH}
          )
          SELECT conv_id, CAST(start_turn AS INTEGER) AS start_turn,
                 CAST(end_turn AS INTEGER) AS end_turn,
                 CAST(depth AS INTEGER) AS depth, path
          FROM rsm_paths
        """,
        # ACCESS-PATH matched flow enumeration (AccessPath.scala:62-249
        # matchAndDiff): numeric-suffixed keys alias their base class
        # (untracked-index over-taint); enumeration per (conv, class)
        "kg_reaches_paths_ap": f"""
          WITH RECURSIVE
          rap_raw AS MATERIALIZED (
            SELECT conv_id,
                   CASE WHEN regexp_matches(key, '^.* [0-9]+$')
                        THEN regexp_extract(key, '^(.*) [0-9]+$', 1)
                        ELSE key END AS var_class,
                   src_turn_idx, dst_turn_idx FROM (
              SELECT conv_id, key, turn_idx AS src_turn_idx,
                     CAST(lead(turn_idx) OVER (
                       PARTITION BY conv_id, key ORDER BY turn_idx
                     ) AS INTEGER) AS dst_turn_idx
              FROM (SELECT DISTINCT conv_id, turn_idx, key FROM ({mentions_keyed}))
            ) WHERE dst_turn_idx IS NOT NULL
          ),
          rap_e AS (SELECT DISTINCT conv_id, var_class,
                           CAST(src_turn_idx AS INTEGER) AS es,
                           CAST(dst_turn_idx AS INTEGER) AS ed FROM rap_raw),
          rap_seeds AS (SELECT conv_id, var_class, min(es) AS s0
                        FROM rap_e GROUP BY conv_id, var_class),
          rap_paths(conv_id, var_class, start_turn, end_turn, depth, path) AS (
            SELECT e.conv_id, e.var_class, s.s0, e.ed, 1,
                   CAST(s.s0 AS VARCHAR) || '->' || CAST(e.ed AS VARCHAR)
            FROM rap_seeds s JOIN rap_e e
              ON e.conv_id = s.conv_id AND e.var_class = s.var_class
             AND e.es = s.s0
            UNION ALL
            SELECT p.conv_id, p.var_class, p.start_turn, e.ed, p.depth + 1,
                   p.path || '->' || CAST(e.ed AS VARCHAR)
            FROM rap_paths p JOIN rap_e e
              ON e.conv_id = p.conv_id AND e.var_class = p.var_class
             AND e.es = p.end_turn
            WHERE p.depth < {REACHES_PATH_DEPTH}
          )
          SELECT DISTINCT conv_id, var_class,
                 CAST(start_turn AS INTEGER) AS start_turn,
                 CAST(end_turn AS INTEGER) AS end_turn,
                 CAST(depth AS INTEGER) AS depth, path
          FROM rap_paths
        """,
        # effective binding table: own predicates + located_in-inherited,
        # shallower depth shadows deeper (BindingTableCompat.scala:16-80 —
        # inherit base bindings minus the shadowing anti-join)
        "kg_bindings": f"""
          WITH RECURSIVE
          bnd_tri AS MATERIALIZED (SELECT DISTINCT subj, pred, obj FROM ({triples_all})),
          bnd_par AS (SELECT subj, min(obj) AS nxt FROM bnd_tri
                      WHERE pred = 'located_in' AND obj < subj GROUP BY subj),
          bnd_chain(entity, anc, depth) AS (
            SELECT subj, subj, 0 FROM (SELECT DISTINCT subj FROM bnd_tri)
            UNION ALL
            SELECT c.entity, p.nxt, c.depth + 1
            FROM bnd_chain c JOIN bnd_par p ON p.subj = c.anc
            WHERE c.depth < {BIND_MAX_DEPTH}
          ),
          bnd_cand AS (
            SELECT c.entity, t.pred, t.obj, c.anc AS provider, c.depth
            FROM bnd_chain c JOIN bnd_tri t ON t.subj = c.anc
            WHERE t.pred <> 'located_in'
          ),
          bnd_best AS (SELECT entity, pred, min(depth) AS d0
                       FROM bnd_cand GROUP BY entity, pred)
          SELECT c.entity, c.pred, c.obj, c.provider,
                 CAST(c.depth AS INTEGER) AS depth
          FROM bnd_cand c JOIN bnd_best b
            ON b.entity = c.entity AND b.pred = c.pred AND b.d0 = c.depth
        """,
        # boolean override propagation up the located_in DAG
        # (BindingMethodOverridesPass.scala:9-52)
        "kg_overrides": f"""
          WITH RECURSIVE
          ovr_tri AS MATERIALIZED (SELECT DISTINCT subj, pred, obj FROM ({triples_all})),
          ovr_par AS (SELECT subj, min(obj) AS nxt FROM ovr_tri
                      WHERE pred = 'located_in' AND obj < subj GROUP BY subj),
          ovr_own AS (SELECT DISTINCT subj, pred FROM ovr_tri
                      WHERE pred <> 'located_in'),
          ovr_chain(entity, anc, depth) AS (
            SELECT subj, subj, 0 FROM (SELECT DISTINCT subj FROM ovr_tri)
            UNION ALL
            SELECT c.entity, p.nxt, c.depth + 1
            FROM ovr_chain c JOIN ovr_par p ON p.subj = c.anc
            WHERE c.depth < {BIND_MAX_DEPTH}
          ),
          ovr_marked AS (
            SELECT DISTINCT c.anc, o.pred
            FROM ovr_chain c JOIN ovr_own o ON o.subj = c.entity
            WHERE c.depth >= 1
          )
          SELECT o.subj AS entity, o.pred,
                 (m.anc IS NOT NULL) AS is_overridden
          FROM ovr_own o LEFT JOIN ovr_marked m
            ON m.anc = o.subj AND m.pred = o.pred
        """,
        # memoized member-chain resolution (MemberAccessLinker analog, O11):
        # functional min-edge map over strictly-decreasing located_in edges,
        # walked to the terminal root with the reference's depth cap of 100
        # (MemberAccessLinker.scala:92-96)
        "kg_member_resolve": f"""
          WITH RECURSIVE
          tri AS (SELECT DISTINCT subj, obj FROM ({triples_all})
                  WHERE pred = 'located_in' AND obj < subj),
          f AS (SELECT subj, min(obj) AS nxt FROM tri GROUP BY subj),
          walk(start, cur, d) AS (
            SELECT subj, subj, 0 FROM f
            UNION ALL
            SELECT walk.start, f.nxt, walk.d + 1
            FROM walk JOIN f ON f.subj = walk.cur WHERE walk.d < 100
          )
          SELECT start AS entity, cur AS root FROM (
            SELECT start, cur, d,
                   row_number() OVER (PARTITION BY start ORDER BY d DESC) AS rn
            FROM walk
          ) WHERE rn = 1
        """,
        # depth-capped SCC of the directed FACT graph: mutual capped
        # reachability, scc_id = min of the mutual set (incl. self) —
        # both sides run the SAME cap (the REACHES discipline)
        "kg_scc": f"""
          WITH RECURSIVE
          scc_e AS MATERIALIZED (
            SELECT DISTINCT subj AS u, obj AS v FROM ({triples_all})),
          scc_c(u, v, d) AS (
            SELECT u, v, 1 FROM scc_e
            UNION
            SELECT c.u, e.v, c.d + 1 FROM scc_c c JOIN scc_e e ON e.u = c.v
            WHERE c.d < {SCC_DEPTH}
          ),
          scc_cl AS (SELECT DISTINCT u, v FROM scc_c),
          scc_mut AS (SELECT c1.u, c1.v FROM scc_cl c1
                      JOIN scc_cl c2 ON c2.u = c1.v AND c2.v = c1.u),
          scc_n AS (SELECT u AS node FROM scc_e UNION SELECT v FROM scc_e)
          SELECT n.node, least(n.node, coalesce(min(m.v), n.node)) AS scc_id
          FROM scc_n n LEFT JOIN scc_mut m ON m.u = n.node
          GROUP BY n.node
        """,
        "kg_entity_cooccurrence": cooc,
        "kg_entity_degree": f"""
          WITH e AS MATERIALIZED ({cooc})
          SELECT canon, CAST(count(*) AS BIGINT) AS degree FROM (
            SELECT canon_a AS canon FROM e
            UNION ALL SELECT canon_b FROM e
          ) GROUP BY canon
        """,
        # fixed-iteration k-core peeling (survivors after KCORE_ITERS
        # rounds, with in-core degree) — the Ray loop early-exits only on
        # a fixed point, so this exact unroll always agrees
        "kg_kcore": f"""
          WITH kc_e AS MATERIALIZED ({cooc}),
          kc_und AS (SELECT canon_a AS a, canon_b AS b FROM kc_e
                     UNION ALL SELECT canon_b, canon_a FROM kc_e),
          kc_s0 AS (SELECT DISTINCT a AS n FROM kc_und)
          {_kcore_chain(KCORE_ITERS, KCORE_K)}
          SELECT u.a AS canon, CAST(count(*) AS BIGINT) AS core_deg
          FROM kc_und u
          JOIN kc_s{KCORE_ITERS} x ON u.a = x.n
          JOIN kc_s{KCORE_ITERS} y ON u.b = y.n
          GROUP BY u.a
        """,
        # widest-path (max-min bottleneck) strengths from the first
        # entity: unrolled integer Bellman-Ford over the weighted
        # co-occurrence edges, seed pinned at the WIDEST_INF sentinel
        "kg_widest_path": f"""
          WITH wp_e AS MATERIALIZED ({cooc}),
          wp_und AS (SELECT canon_a AS a, canon_b AS b, n_turns FROM wp_e
                     UNION ALL SELECT canon_b, canon_a, n_turns FROM wp_e),
          wp_seed AS (SELECT min(a) AS s FROM wp_und),
          wp_w0 AS (SELECT s AS n, CAST({WIDEST_INF} AS BIGINT) AS w
                    FROM wp_seed)
          {_widest_chain(WIDEST_DEPTH, WIDEST_INF)}
          SELECT n AS canon, CAST(w AS BIGINT) AS width
          FROM wp_w{WIDEST_DEPTH}
        """,
        # degree assortativity: explicit-sum Pearson over endpoint degrees
        # of the symmetrized edge list (exact integer moments, identical
        # float finish — the rel_corr discipline on a graph)
        "kg_assortativity": f"""
          WITH as_e AS MATERIALIZED ({cooc}),
          as_und(a, b) AS (SELECT canon_a, canon_b FROM as_e
                           UNION ALL SELECT canon_b, canon_a FROM as_e),
          as_deg AS (SELECT a, CAST(count(*) AS BIGINT) AS d
                     FROM as_und GROUP BY a),
          as_m AS (
            SELECT CAST(count(*) AS DOUBLE) AS n,
                   CAST(sum(da.d) AS DOUBLE) AS sx,
                   CAST(sum(da.d * db.d) AS DOUBLE) AS sxy,
                   CAST(sum(da.d * da.d) AS DOUBLE) AS sxx
            FROM as_und u
            JOIN as_deg da ON da.a = u.a
            JOIN as_deg db ON db.a = u.b
          )
          SELECT (n * sxy - sx * sx) / (n * sxx - sx * sx) AS assort FROM as_m
        """,
        # degree-ordered triangle enumeration collapses in SQL to the
        # canonical 3-way self-join over the (a < b) edge list — each
        # triangle {{x < y < z}} matched exactly once
        "kg_triangles": f"""
          WITH e AS MATERIALIZED ({cooc})
          SELECT CAST(count(*) AS BIGINT) AS n_triangles
          FROM e e1
          JOIN e e2 ON e2.canon_a = e1.canon_a AND e2.canon_b > e1.canon_b
          JOIN e e3 ON e3.canon_a = e1.canon_b AND e3.canon_b = e2.canon_b
        """,
        # per-node triangle + wedge integers (local clustering coefficient
        # numerator/denominator): each u<v<w triangle credits all three
        # corners via the 3-way self-join's three projections
        "kg_local_cc": f"""
          WITH lcc_e AS MATERIALIZED ({cooc}),
          lcc_deg AS (
            SELECT canon, count(*) AS degree FROM (
              SELECT canon_a AS canon FROM lcc_e
              UNION ALL SELECT canon_b FROM lcc_e
            ) GROUP BY canon
          ),
          lcc_tri AS (
            SELECT node, count(*) AS n_tri FROM (
              SELECT e1.canon_a AS node
              FROM lcc_e e1
              JOIN lcc_e e2 ON e2.canon_a = e1.canon_a AND e2.canon_b > e1.canon_b
              JOIN lcc_e e3 ON e3.canon_a = e1.canon_b AND e3.canon_b = e2.canon_b
              UNION ALL
              SELECT e1.canon_b
              FROM lcc_e e1
              JOIN lcc_e e2 ON e2.canon_a = e1.canon_a AND e2.canon_b > e1.canon_b
              JOIN lcc_e e3 ON e3.canon_a = e1.canon_b AND e3.canon_b = e2.canon_b
              UNION ALL
              SELECT e2.canon_b
              FROM lcc_e e1
              JOIN lcc_e e2 ON e2.canon_a = e1.canon_a AND e2.canon_b > e1.canon_b
              JOIN lcc_e e3 ON e3.canon_a = e1.canon_b AND e3.canon_b = e2.canon_b
            ) GROUP BY node
          )
          SELECT d.canon,
                 CAST(coalesce(t.n_tri, 0) AS BIGINT) AS n_tri,
                 CAST(d.degree * (d.degree - 1) // 2 AS BIGINT) AS n_wedges
          FROM lcc_deg d LEFT JOIN lcc_tri t ON t.node = d.canon
        """,
        # BFS layers from the lexicographically-first entity: recursive CTE
        # with min-distance fold, depth-capped like the Ray frontier loop.
        # All outer CTE names carry a bfs_ prefix: DuckDB binds names
        # declared in an enclosing WITH RECURSIVE *into* nested subquery
        # WITH scopes, so generic names (e, reach) would capture the
        # canonical-map snippet's own CTEs
        "kg_entity_bfs": f"""
          WITH RECURSIVE bfs_ec AS MATERIALIZED ({cooc}),
          bfs_e(a, b) AS (SELECT canon_a, canon_b FROM bfs_ec
                          UNION SELECT canon_b, canon_a FROM bfs_ec),
          bfs_seed AS (SELECT min(a) AS s FROM bfs_e),
          bfs_reach(n, d) AS (
            SELECT s, 0 FROM bfs_seed
            UNION
            SELECT bfs_e.b, bfs_reach.d + 1 FROM bfs_reach
            JOIN bfs_e ON bfs_e.a = bfs_reach.n WHERE bfs_reach.d < {BFS_MAX_DEPTH}
          )
          SELECT n AS canon, CAST(min(d) AS BIGINT) AS dist
          FROM bfs_reach GROUP BY n
        """,
        # 3-iteration PageRank over the directed FACT graph, unrolled;
        # dangling mass dropped on both sides; (1 - 0.85) spelled as the
        # same IEEE expression the Ray side evaluates
        "kg_pagerank": f"""
          WITH e AS (SELECT DISTINCT subj AS a, obj AS b FROM ({triples_all})),
          nodes AS (SELECT a AS n FROM e UNION SELECT b FROM e),
          nn AS (SELECT CAST(count(*) AS DOUBLE) AS cnt FROM nodes),
          od AS (SELECT a, CAST(count(*) AS DOUBLE) AS deg FROM e GROUP BY a),
          r0 AS (SELECT n, 1.0 / (SELECT cnt FROM nn) AS pr FROM nodes)
          {_pagerank_chain(PR_ITERS, PR_DAMPING)}
          SELECT n AS canon, round(pr, {PR_ROUND}) AS pr FROM r{PR_ITERS}
        """,
        # HITS hubs/authorities, HITS_ITERS unrolled all-integer steps
        # (hub≡1 init, no normalization) — bit-exact vs the Ray side
        "kg_hits": f"""
          WITH he AS (SELECT DISTINCT subj AS a, obj AS b FROM ({triples_all})),
          hnodes AS (SELECT a AS n FROM he UNION SELECT b FROM he),
          hh0 AS (SELECT n, CAST(1 AS BIGINT) AS h FROM hnodes)
          {_hits_chain(HITS_ITERS)}
          SELECT hnodes.n AS canon,
                 CAST(coalesce(ha{HITS_ITERS}.a, 0) AS BIGINT) AS auth_units,
                 CAST(coalesce(hh{HITS_ITERS}.h, 0) AS BIGINT) AS hub_units
          FROM hnodes
          LEFT JOIN ha{HITS_ITERS} ON ha{HITS_ITERS}.n = hnodes.n
          LEFT JOIN hh{HITS_ITERS} ON hh{HITS_ITERS}.n = hnodes.n
        """,
        # neighborhood Jaccard for co-occurring pairs with ≥1 shared
        # neighbor (wedge counting; ej_ prefixes avoid CTE capture by the
        # nested canonical-map snippet)
        # PMI collocation over turn units: same mc/pair/entity counts as
        # the cooccurrence oracle; N = total turns (transcript rows)
        "kg_entity_pmi": f"""
          WITH pmi_mc AS MATERIALIZED (
            SELECT DISTINCT m.conv_id, m.turn_idx, c.canon
            FROM ({mentions_keyed}) m JOIN ({canon}) c ON c.key = m.key),
          pmi_pairs AS (
            SELECT a.canon AS canon_a, b.canon AS canon_b,
                   CAST(count(*) AS BIGINT) AS n_ab
            FROM pmi_mc a JOIN pmi_mc b
              ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
             AND a.canon < b.canon
            GROUP BY 1, 2),
          pmi_ent AS (SELECT canon, CAST(count(*) AS BIGINT) AS n
                      FROM pmi_mc GROUP BY canon),
          pmi_n AS (SELECT CAST(count(*) AS DOUBLE) AS nt FROM {t})
          SELECT p.canon_a, p.canon_b,
                 round(ln(p.n_ab * pmi_n.nt / (ea.n * eb.n)), {PMI_ROUND}) AS pmi
          FROM pmi_pairs p
          JOIN pmi_ent ea ON ea.canon = p.canon_a
          JOIN pmi_ent eb ON eb.canon = p.canon_b
          CROSS JOIN pmi_n
        """,
        # per-conversation top entity by tf·idf: tf = distinct mention
        # turns, idf = ln(N/df) quantized once per entity (IDF_UNIT),
        # integer products, tie-break lowest canon
        "kg_entity_salience": f"""
          WITH sal_mc AS MATERIALIZED (
            SELECT DISTINCT m.conv_id, m.turn_idx, c.canon
            FROM ({mentions_keyed}) m JOIN ({canon}) c ON c.key = m.key),
          sal_ct AS (SELECT conv_id, canon, CAST(count(*) AS BIGINT) AS tf
                     FROM sal_mc GROUP BY 1, 2),
          sal_df AS (SELECT canon, CAST(count(*) AS BIGINT) AS df
                     FROM sal_ct GROUP BY canon),
          sal_n AS (SELECT CAST(count(DISTINCT conv_id) AS DOUBLE) AS nc
                    FROM {t}),
          sal_u AS (SELECT canon,
                           CAST(round({10 ** IDF_UNIT}.0 *
                                ln((SELECT nc FROM sal_n) / df)) AS BIGINT) AS u
                    FROM sal_df),
          sal_s AS (SELECT ct.conv_id, ct.canon, ct.tf * u.u AS s
                    FROM sal_ct ct JOIN sal_u u USING (canon))
          SELECT conv_id, canon, CAST(s AS BIGINT) AS salience_units FROM (
            SELECT conv_id, canon, s,
                   row_number() OVER (PARTITION BY conv_id
                                      ORDER BY s DESC, canon) AS rn
            FROM sal_s) WHERE rn = 1
        """,
        "kg_communities": lpa_sql,
        # conversation near-dup pairs by canonical-entity-set Jaccard:
        # stop-entity df cap applied to BOTH sides, integer cross-
        # multiplied threshold — no float anywhere
        "kg_conv_jaccard": conv_jac,
        # conversation dedup policy: near-dup pairs → recursive-CTE
        # connected components → min-conv_id representative over the
        # full conversation universe
        "kg_conv_groups": f"""
          WITH RECURSIVE cg_pairs AS MATERIALIZED ({conv_jac}),
          cg_e(a, b) AS (SELECT conv_a, conv_b FROM cg_pairs
                         UNION SELECT conv_b, conv_a FROM cg_pairs),
          cg_reach(n, m) AS (
            SELECT a, a FROM cg_e GROUP BY a
            UNION
            SELECT r.n, e.b FROM cg_reach r JOIN cg_e e ON r.m = e.a),
          cg_comp AS (SELECT n AS node, min(m) AS comp
                      FROM cg_reach GROUP BY n)
          SELECT u.conv_id, coalesce(c.comp, u.conv_id) AS grp
          FROM (SELECT DISTINCT conv_id FROM {t}) u
          LEFT JOIN cg_comp c ON c.node = u.conv_id
        """,
        # Adamic–Adar link prediction: wedge sums of fixed-point
        # 1/ln(deg(apex)) units (quantized once per node, integer sums)
        "kg_adamic_adar": f"""
          WITH aa_e AS MATERIALIZED ({cooc}),
          aa_und(a, b) AS (SELECT canon_a, canon_b FROM aa_e
                           UNION ALL SELECT canon_b, canon_a FROM aa_e),
          aa_deg AS (SELECT a, count(*) AS d FROM aa_und GROUP BY a),
          aa_u AS (SELECT a, CAST(round({10 ** AA_UNIT}.0 / ln(d)) AS BIGINT) AS u
                   FROM aa_deg WHERE d >= 2),
          aa_w AS (
            SELECT u1.b AS x, u2.b AS y, sum(au.u) AS s
            FROM aa_und u1
            JOIN aa_und u2 ON u1.a = u2.a AND u1.b < u2.b
            JOIN aa_u au ON au.a = u1.a
            GROUP BY u1.b, u2.b)
          SELECT e.canon_a, e.canon_b, CAST(w.s AS BIGINT) AS aa_units
          FROM aa_e e JOIN aa_w w ON w.x = e.canon_a AND w.y = e.canon_b
        """,
        "kg_entity_jaccard": f"""
          WITH ej_ec AS MATERIALIZED ({cooc}),
          ej_und(a, b) AS (SELECT canon_a, canon_b FROM ej_ec
                           UNION ALL SELECT canon_b, canon_a FROM ej_ec),
          ej_deg AS (SELECT a, CAST(count(*) AS BIGINT) AS d
                     FROM ej_und GROUP BY a),
          ej_common AS (SELECT u1.b AS x, u2.b AS y,
                               CAST(count(*) AS BIGINT) AS c
                        FROM ej_und u1 JOIN ej_und u2
                          ON u1.a = u2.a AND u1.b < u2.b
                        GROUP BY u1.b, u2.b)
          SELECT e.canon_a, e.canon_b,
                 round(c.c * 1.0 / (da.d + db.d - c.c), {JAC_ROUND}) AS jac
          FROM ej_ec e
          JOIN ej_common c ON c.x = e.canon_a AND c.y = e.canon_b
          JOIN ej_deg da ON da.a = e.canon_a
          JOIN ej_deg db ON db.a = e.canon_b
        """,
        # temporal footprint per canonical entity (min/max position key +
        # distinct-conversation spread)
        # SymSpell deletion-neighborhood join = exact Levenshtein<=1 join;
        # the oracle states the spec directly (length-pruned all-pairs is
        # fine at oracle scale, never the engine's plan)
        "kg_fuzzy_keys": f"""
          WITH fz_k AS MATERIALIZED (SELECT DISTINCT key FROM ({mentions_keyed}))
          SELECT a.key AS key_a, b.key AS key_b
          FROM fz_k a JOIN fz_k b
            ON a.key < b.key
           AND abs(length(a.key) - length(b.key)) <= 1
           AND levenshtein(a.key, b.key) <= 1
        """,
        "kg_entity_span": f"""
          WITH es_mc AS MATERIALIZED (
            SELECT DISTINCT m.conv_id, m.turn_idx, c.canon
            FROM ({mentions_keyed}) m JOIN ({canon}) c ON c.key = m.key
          )
          SELECT canon,
                 min(conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 9, '0')) AS first_turn,
                 max(conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 9, '0')) AS last_turn,
                 CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs
          FROM es_mc GROUP BY canon
        """,
        "kg_node_label_counts": f"""
          SELECT 'TURN' AS label, CAST(count(*) AS BIGINT) AS n_nodes FROM {t}
          UNION ALL SELECT 'CONVERSATION', count(DISTINCT conv_id) FROM {t}
          UNION ALL SELECT 'MENTION', count(*) FROM ({mentions_keyed})
          UNION ALL SELECT 'ENTITY', count(DISTINCT canon) FROM ({canon})
          UNION ALL SELECT 'TOOL', count(DISTINCT tool) FROM {t} WHERE role = 'tool' AND tool <> ''
          UNION ALL SELECT 'SPEAKER', count(DISTINCT role) FROM {t}
          UNION ALL SELECT 'META_DATA', 1
        """,
        # per-conversation Graphviz text (DOT sink, S11 —
        # DotSerializer.scala analog): header + sorted node lines + chain
        # edge lines, byte-identical to stages/export.conversation_dot on
        # data with no chars needing escape (synthetic ids/roles are clean)
        "kg_dot_export": f"""
          WITH tt AS (SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn, role FROM {t}),
          nodes AS (
            SELECT conv_id,
                   string_agg('  t' || turn || ' [label="' || turn || ':' || role || '"];',
                              chr(10) ORDER BY turn) AS ns
            FROM tt GROUP BY conv_id
          ),
          pairs AS (
            SELECT conv_id, turn AS a,
                   lead(turn) OVER (PARTITION BY conv_id ORDER BY turn) AS b
            FROM tt
          ),
          chain AS (
            SELECT conv_id,
                   string_agg('  t' || a || ' -> t' || b || ';', chr(10) ORDER BY a) AS es
            FROM pairs WHERE b IS NOT NULL GROUP BY conv_id
          )
          SELECT n.conv_id,
                 'digraph "' || n.conv_id || '" {{' || chr(10) || n.ns
                 || coalesce(chr(10) || e.es, '') || chr(10) || '}}' AS dot
          FROM nodes n LEFT JOIN chain e ON e.conv_id = n.conv_id
        """,
        # CFG flavor: the reply graph (chain + user-skip edges) the
        # dominator overlay runs on — DotCfgGenerator.scala analog
        "kg_dot_cfg": f"""
          WITH dcf_tt AS (SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn, role FROM {t}),
          dcf_nodes AS (
            SELECT conv_id,
                   string_agg('  t' || turn || ' [label="' || turn || ':' || role || '"];',
                              chr(10) ORDER BY turn) AS ns
            FROM dcf_tt GROUP BY conv_id
          ),
          dcf_chain AS (
            SELECT conv_id, turn AS a,
                   lead(turn) OVER (PARTITION BY conv_id ORDER BY turn) AS b
            FROM dcf_tt
          ),
          dcf_sk AS (
            SELECT conv_id, turn AS a,
                   lead(turn) OVER (PARTITION BY conv_id ORDER BY turn) AS b
            FROM dcf_tt WHERE role = 'user'
          ),
          dcf_e AS (
            SELECT conv_id, a, b FROM dcf_chain WHERE b IS NOT NULL
            UNION SELECT conv_id, a, b FROM dcf_sk WHERE b IS NOT NULL AND b > a + 1
          ),
          dcf_es AS (
            SELECT conv_id,
                   string_agg('  t' || a || ' -> t' || b || ';', chr(10) ORDER BY a, b) AS es
            FROM dcf_e GROUP BY conv_id
          )
          SELECT n.conv_id,
                 'digraph "' || n.conv_id || '" {{' || chr(10) || n.ns
                 || coalesce(chr(10) || e.es, '') || chr(10) || '}}' AS dot
          FROM dcf_nodes n LEFT JOIN dcf_es e ON e.conv_id = n.conv_id
        """,
        # CDG flavor: Ferrante control dependence with the interval-DAG
        # span predicate (same derivation as kg_cdg, CTEs prefixed) —
        # DotCdgGenerator.scala analog
        "kg_dot_cdg": f"""
          WITH dcd_tt AS (SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn, role FROM {t}),
          dcd_sk AS (SELECT conv_id, turn AS a,
                            lead(turn) OVER (PARTITION BY conv_id ORDER BY turn) AS b
                     FROM dcd_tt WHERE role = 'user'),
          dcd_skips AS (SELECT conv_id, a, b FROM dcd_sk WHERE b IS NOT NULL AND b > a + 1),
          dcd_chain AS (SELECT conv_id, turn AS a,
                               lead(turn) OVER (PARTITION BY conv_id ORDER BY turn) AS b
                        FROM dcd_tt),
          dcd_e AS (SELECT conv_id, a, b FROM dcd_chain WHERE b IS NOT NULL
                    UNION SELECT conv_id, a, b FROM dcd_skips),
          dcd_cdg AS (
            SELECT DISTINCT e.conv_id, e.a, d.turn AS b
            FROM dcd_e e JOIN dcd_tt d ON d.conv_id = e.conv_id AND d.turn >= e.b
            WHERE NOT EXISTS (SELECT 1 FROM dcd_skips k
                              WHERE k.conv_id = e.conv_id AND k.a >= e.b
                                AND k.a < d.turn AND k.b > d.turn)
              AND EXISTS (SELECT 1 FROM dcd_skips k2
                          WHERE k2.conv_id = e.conv_id AND k2.a >= e.a
                            AND k2.a < d.turn AND k2.b > d.turn)
          ),
          dcd_nodes AS (
            SELECT conv_id,
                   string_agg('  t' || turn || ' [label="' || turn || ':' || role || '"];',
                              chr(10) ORDER BY turn) AS ns
            FROM dcd_tt GROUP BY conv_id
          ),
          dcd_es AS (
            SELECT conv_id,
                   string_agg('  t' || a || ' -> t' || b || ';', chr(10) ORDER BY a, b) AS es
            FROM dcd_cdg GROUP BY conv_id
          )
          SELECT n.conv_id,
                 'digraph "' || n.conv_id || '" {{' || chr(10) || n.ns
                 || coalesce(chr(10) || e.es, '') || chr(10) || '}}' AS dot
          FROM dcd_nodes n LEFT JOIN dcd_es e ON e.conv_id = n.conv_id
        """,
        # DDG flavor: REACHES dataflow edges labeled with their variable,
        # drawn from the reaching overlay — DdgGenerator.scala:1-100 analog
        "kg_dot_ddg": f"""
          WITH ddg_rp AS (
            SELECT conv_id, src_turn_idx, dst_turn_idx, variable FROM (
              SELECT conv_id, turn_idx AS src_turn_idx,
                     CAST(lead(turn_idx) OVER (
                       PARTITION BY conv_id, key ORDER BY turn_idx
                     ) AS INTEGER) AS dst_turn_idx,
                     key AS variable
              FROM (SELECT DISTINCT conv_id, turn_idx, key FROM ({mentions_keyed}))
            ) WHERE dst_turn_idx IS NOT NULL
          ),
          ddg_tt AS (SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn, role FROM {t}),
          ddg_nodes AS (
            SELECT conv_id,
                   string_agg('  t' || turn || ' [label="' || turn || ':' || role || '"];',
                              chr(10) ORDER BY turn) AS ns
            FROM ddg_tt GROUP BY conv_id
          ),
          ddg_es AS (
            SELECT conv_id,
                   string_agg('  t' || CAST(src_turn_idx AS INTEGER)
                              || ' -> t' || dst_turn_idx
                              || ' [label="' || variable || '"];', chr(10)
                              ORDER BY src_turn_idx, dst_turn_idx, variable) AS es
            FROM ddg_rp GROUP BY conv_id
          )
          SELECT n.conv_id,
                 'digraph "' || n.conv_id || '" {{' || chr(10) || n.ns
                 || coalesce(chr(10) || e.es, '') || chr(10) || '}}' AS dot
          FROM ddg_nodes n LEFT JOIN ddg_es e ON e.conv_id = n.conv_id
        """,
        # PDG flavor: the CDG ∪ DDG union view, one digraph per
        # conversation with edges labeled 'CDG' / 'DDG: <variable>' —
        # DotPdgGenerator.scala analog (DumpPdgTests.scala test shape).
        # CDG derivation identical to kg_dot_cdg; DDG derivation identical
        # to kg_dot_ddg; union sorted (a, b, lbl) like the Python side.
        "kg_dot_pdg": f"""
          WITH pdg_tt AS (SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn, role FROM {t}),
          pdg_sk AS (SELECT conv_id, turn AS a,
                            lead(turn) OVER (PARTITION BY conv_id ORDER BY turn) AS b
                     FROM pdg_tt WHERE role = 'user'),
          pdg_skips AS (SELECT conv_id, a, b FROM pdg_sk WHERE b IS NOT NULL AND b > a + 1),
          pdg_chain AS (SELECT conv_id, turn AS a,
                               lead(turn) OVER (PARTITION BY conv_id ORDER BY turn) AS b
                        FROM pdg_tt),
          pdg_e AS (SELECT conv_id, a, b FROM pdg_chain WHERE b IS NOT NULL
                    UNION SELECT conv_id, a, b FROM pdg_skips),
          pdg_cdg AS (
            SELECT DISTINCT e.conv_id, e.a, d.turn AS b
            FROM pdg_e e JOIN pdg_tt d ON d.conv_id = e.conv_id AND d.turn >= e.b
            WHERE NOT EXISTS (SELECT 1 FROM pdg_skips k
                              WHERE k.conv_id = e.conv_id AND k.a >= e.b
                                AND k.a < d.turn AND k.b > d.turn)
              AND EXISTS (SELECT 1 FROM pdg_skips k2
                          WHERE k2.conv_id = e.conv_id AND k2.a >= e.a
                            AND k2.a < d.turn AND k2.b > d.turn)
          ),
          pdg_rp AS (
            SELECT conv_id, src_turn_idx, dst_turn_idx, variable FROM (
              SELECT conv_id, turn_idx AS src_turn_idx,
                     CAST(lead(turn_idx) OVER (
                       PARTITION BY conv_id, key ORDER BY turn_idx
                     ) AS INTEGER) AS dst_turn_idx,
                     key AS variable
              FROM (SELECT DISTINCT conv_id, turn_idx, key FROM ({mentions_keyed}))
            ) WHERE dst_turn_idx IS NOT NULL
          ),
          pdg_edges AS (
            SELECT conv_id, a, b, 'CDG' AS lbl FROM pdg_cdg
            UNION ALL
            SELECT conv_id, CAST(src_turn_idx AS INTEGER) AS a,
                   dst_turn_idx AS b, 'DDG: ' || variable AS lbl
            FROM pdg_rp
          ),
          pdg_nodes AS (
            SELECT conv_id,
                   string_agg('  t' || turn || ' [label="' || turn || ':' || role || '"];',
                              chr(10) ORDER BY turn) AS ns
            FROM pdg_tt GROUP BY conv_id
          ),
          pdg_es AS (
            SELECT conv_id,
                   string_agg('  t' || a || ' -> t' || b
                              || ' [label="' || lbl || '"];', chr(10)
                              ORDER BY a, b, lbl) AS es
            FROM pdg_edges GROUP BY conv_id
          )
          SELECT n.conv_id,
                 'digraph "' || n.conv_id || '" {{' || chr(10) || n.ns
                 || coalesce(chr(10) || e.es, '') || chr(10) || '}}' AS dot
          FROM pdg_nodes n LEFT JOIN pdg_es e ON e.conv_id = n.conv_id
        """,
        # combined AST+CFG whole-CPG view (DotCpg14Generator.scala analog):
        # turn nodes + mention nodes (m<turn>_<ordinal>, key-labeled —
        # keys are normalized to the escape-free alphabet), AST containment
        # edges then CFG reply edges, layer-labeled
        "kg_dot_cpg14": f"""
          WITH c14_tt AS (SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn, role FROM {t}),
          c14_m AS (SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn,
                           CAST(ordinal AS INTEGER) AS ordinal, key
                    FROM ({mentions_keyed})),
          c14_tn AS (
            SELECT conv_id,
                   string_agg('  t' || turn || ' [label="' || turn || ':' || role || '"];',
                              chr(10) ORDER BY turn) AS ns
            FROM c14_tt GROUP BY conv_id
          ),
          c14_mn AS (
            SELECT conv_id,
                   string_agg('  m' || turn || '_' || ordinal
                              || ' [label="' || key || '"];',
                              chr(10) ORDER BY turn, ordinal) AS ms
            FROM c14_m GROUP BY conv_id
          ),
          c14_ae AS (
            SELECT conv_id,
                   string_agg('  t' || turn || ' -> m' || turn || '_' || ordinal
                              || ' [label="AST"];',
                              chr(10) ORDER BY turn, ordinal) AS aes
            FROM c14_m GROUP BY conv_id
          ),
          c14_chain AS (SELECT conv_id, turn AS a,
                               lead(turn) OVER (PARTITION BY conv_id ORDER BY turn) AS b
                        FROM c14_tt),
          c14_sk AS (SELECT conv_id, turn AS a,
                            lead(turn) OVER (PARTITION BY conv_id ORDER BY turn) AS b
                     FROM c14_tt WHERE role = 'user'),
          c14_e AS (SELECT conv_id, a, b FROM c14_chain WHERE b IS NOT NULL
                    UNION SELECT conv_id, a, b FROM c14_sk
                    WHERE b IS NOT NULL AND b > a + 1),
          c14_ce AS (
            SELECT conv_id,
                   string_agg('  t' || a || ' -> t' || b || ' [label="CFG"];',
                              chr(10) ORDER BY a, b) AS es
            FROM c14_e GROUP BY conv_id
          )
          SELECT n.conv_id,
                 'digraph "' || n.conv_id || '" {{' || chr(10) || n.ns
                 || coalesce(chr(10) || m.ms, '')
                 || coalesce(chr(10) || a.aes, '')
                 || coalesce(chr(10) || c.es, '') || chr(10) || '}}' AS dot
          FROM c14_tn n
          LEFT JOIN c14_mn m ON m.conv_id = n.conv_id
          LEFT JOIN c14_ae a ON a.conv_id = n.conv_id
          LEFT JOIN c14_ce c ON c.conv_id = n.conv_id
        """,
    }


def _rel_sql() -> dict[str, str]:
    from codepropertygraph_ray.functions.relational import (
        HIST_BINS,
        NTILE_N,
        SAMPLE_MOD,
        SAMPLE_MULT,
        STRAT_K,
        WSAMPLE_K,
    )

    from codepropertygraph_ray.functions.relational import IC_WINDOW_US

    SAMPLE_MULT_SQL, SAMPLE_MOD_SQL, WSAMPLE_K_SQL = SAMPLE_MULT, SAMPLE_MOD, WSAMPLE_K
    IC_WINDOW_US_SQL = IC_WINDOW_US

    return {
        # Efraimidis–Spirakis weighted sample in log form (ln(u)/w — the
        # monotone equivalent of u^(1/w)); the log is quantized to fixed
        # point BEFORE the divide so numpy-vs-libm last-ulp log
        # differences can't reach the gate, u from the multiplicative hash
        "rel_sample_weighted": f"""
          SELECT o_orderkey, o_totalprice, skey FROM (
            SELECT o_orderkey, o_totalprice,
                   CAST(round(ln((CAST((o_orderkey * {SAMPLE_MULT_SQL})
                                        % {SAMPLE_MOD_SQL} AS DOUBLE) + 1.0)
                                 / {SAMPLE_MOD_SQL + 1}.0) * 1000000)
                        AS BIGINT) / o_totalprice AS skey
            FROM orders)
          ORDER BY skey DESC, o_orderkey LIMIT {WSAMPLE_K_SQL}
        """,
        # gaps-and-islands interval union: an island breaks where a start
        # exceeds the running max end; ties at equal start always merge
        # (end > start), so the island set is order-invariant
        "rel_interval_coverage": f"""
          WITH ic_iv AS (SELECT user_id, epoch_us(ts) AS s,
                                epoch_us(ts) + {IC_WINDOW_US_SQL} AS e
                         FROM events),
          ic_m AS (SELECT user_id, s, e,
                          max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                                AND 1 PRECEDING) AS prev_max
                   FROM ic_iv),
          ic_g AS (SELECT user_id, s, e,
                          sum(CASE WHEN prev_max IS NULL OR s > prev_max
                                   THEN 1 ELSE 0 END)
                            OVER (PARTITION BY user_id ORDER BY s, e) AS isl
                   FROM ic_m),
          ic_i AS (SELECT user_id, isl, max(e) - min(s) AS len
                   FROM ic_g GROUP BY 1, 2)
          SELECT user_id, CAST(sum(len) AS BIGINT) AS covered_us,
                 CAST(count(*) AS BIGINT) AS n_islands
          FROM ic_i GROUP BY user_id
        """,
        # stream compaction (distinct-until-changed): keep a row iff its
        # type differs from the previous row's in the per-user total order
        "rel_compact": """
          SELECT user_id, event_id, event_type FROM (
            SELECT user_id, event_id, event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_type
            FROM events
          ) WHERE prev_type IS NULL OR event_type <> prev_type
        """,
        # relational division (the "for all" join): users whose distinct
        # type set covers the whole divisor
        "rel_division": """
          SELECT user_id, CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
          FROM events GROUP BY user_id
          HAVING count(DISTINCT event_type) =
                 (SELECT count(DISTINCT event_type) FROM events)
        """,
        # two-pass global statistic: bucket arithmetic is the identical
        # double expression tree as the Ray side ((v-mn)*B/(mx-mn), floored,
        # max folded into the last bucket)
        "rel_histogram": f"""
          WITH h_mm AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx
                        FROM orders)
          SELECT CAST(least(CAST(floor((o_totalprice - mn)
                                        * CAST({HIST_BINS} AS DOUBLE)
                                        / (mx - mn)) AS BIGINT),
                            {HIST_BINS} - 1) AS BIGINT) AS bucket,
                 CAST(count(*) AS BIGINT) AS n
          FROM orders, h_mm GROUP BY 1
        """,
        "rel_ntile": f"""
          SELECT o_orderkey,
                 CAST(ntile({NTILE_N}) OVER (PARTITION BY o_orderpriority
                                             ORDER BY o_totalprice, o_orderkey)
                      AS BIGINT) AS tile
          FROM orders
        """,
        # grouped Pearson correlation spelled as the explicit moment
        # formula (NOT corr(): its one-pass algorithm differs in float) —
        # exact integer moments via tie-free floor on both sides
        "rel_corr": """
          WITH cr AS (
            SELECT l_returnflag,
                   CAST(count(*) AS DOUBLE) AS n,
                   CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
                   CAST(sum(x * y) AS DOUBLE) AS sxy,
                   CAST(sum(x * x) AS DOUBLE) AS sxx,
                   CAST(sum(y * y) AS DOUBLE) AS syy
            FROM (SELECT l_returnflag,
                         CAST(floor(l_quantity) AS BIGINT) AS x,
                         CAST(floor(l_extendedprice) AS BIGINT) AS y
                  FROM lineitem)
            GROUP BY l_returnflag)
          SELECT l_returnflag,
                 (n * sxy - sx * sy)
                   / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qp
          FROM cr
        """,
        "rel_q1_pricing": """
          SELECT l_returnflag, l_linestatus,
                 round(sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0, 2) AS sum_qty,
                 round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0, 2) AS sum_base_price,
                 round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0, 2) AS sum_disc_price,
                 round(sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 / count(*), 4) AS avg_qty,
                 round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 / count(*), 4) AS avg_price,
                 CAST(count(*) AS BIGINT) AS count_order
          FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "rel_nation_revenue": """
          SELECT r_name, n_name,
                 round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2) AS revenue,
                 CAST(count(*) AS BIGINT) AS n_orders
          FROM orders
          JOIN customer ON c_custkey = o_custkey
          JOIN nation ON n_nationkey = c_nationkey
          JOIN region ON r_regionkey = n_regionkey
          GROUP BY r_name, n_name
        """,
        "rel_parts_without_lineitems": """
          SELECT p_partkey, p_name FROM part
          WHERE p_partkey NOT IN (SELECT DISTINCT l_partkey FROM lineitem)
        """,
        "rel_customers_with_orders": """
          SELECT c_custkey, c_name FROM customer
          WHERE c_custkey IN (SELECT DISTINCT o_custkey FROM orders)
        """,
        "rel_distinct_part_types": "SELECT DISTINCT p_type FROM part ORDER BY p_type",
        "rel_dedup_docs_exact": """
          SELECT text, min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies
          FROM documents GROUP BY text
        """,
        "rel_orders_by_priority": """
          SELECT o_orderpriority, min(o_orderkey) AS first_order,
                 CAST(count(*) AS BIGINT) AS n_orders
          FROM orders GROUP BY o_orderpriority
        """,
        "rel_top_orders": """
          SELECT o_orderkey, o_totalprice FROM orders
          ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
        """,
        "rel_events_hourly": """
          SELECT user_id, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
                 CAST(count(*) AS BIGINT) AS n_events,
                 round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2) AS sum_value
          FROM events GROUP BY user_id, date_trunc('hour', ts)
        """,
        "rel_part_type_tokens": """
          SELECT token, CAST(count(*) AS BIGINT) AS n_parts FROM (
            SELECT unnest(string_split(p_type, ' ')) AS token FROM part
          ) GROUP BY token
        """,
        "rel_events_extract_k": """
          SELECT event_id, CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS k
          FROM events
        """,
        "rel_asof_click_view": """
          SELECT l.event_id,
                 r.event_id AS view_event_id,
                 CAST(epoch_us(l.ts) - epoch_us(r.ts) AS BIGINT) AS gap_us
          FROM (SELECT * FROM events WHERE event_type = 'click') l
          ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') r
            ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        "rel_shipped_monthly": """
          SELECT CAST(epoch(date_trunc('month', l_shipdate)) AS BIGINT) AS month_epoch,
                 round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0, 2) AS revenue,
                 CAST(count(*) AS BIGINT) AS n_items
          FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          GROUP BY date_trunc('month', l_shipdate)
        """,
        # gap-based sessionization: LAG + running sum of breaks = the same
        # per-user session assignment the bucketed Ray pass computes
        "rel_sessionize": """
          WITH o AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTES
                        THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
          ), s AS (
            SELECT user_id, ts, value,
                   sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sess
            FROM o
          )
          SELECT user_id, CAST(sess + 1 AS BIGINT) AS session_idx,
                 min(ts) AS session_start, max(ts) AS session_end,
                 CAST(count(*) AS BIGINT) AS n_events,
                 round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2) AS sum_value
          FROM s GROUP BY user_id, sess
        """,
        # rank window: percent_rank — ties share min rank, (r-1)/(n-1)
        "rel_percent_rank": """
          SELECT o_orderkey,
                 percent_rank() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice) AS pct
          FROM orders
        """,
        "rel_topk_per_customer": """
          SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS BIGINT) AS rnk
          FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
            FROM orders
          ) WHERE rnk <= 3
        """,
        # ordered per-key window functions (the Ray side runs one bucketed
        # shuffle per partition key + a vectorized in-bucket window pass)
        "rel_rolling_avg": """
          SELECT user_id, event_id,
                 round(sum(CAST(round(value * 100) AS BIGINT))
                         OVER w2 / 100.0 / (count(*) OVER w2), 4) AS avg3
          FROM events
          WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        """,
        # time-RANGE sliding window (SlickDeque-style trailing max); max is
        # order-exact so no rounding needed
        "rel_sliding_max": """
          SELECT user_id, event_id,
                 max(value) OVER (PARTITION BY user_id ORDER BY ts
                                  RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING
                                            AND CURRENT ROW) AS max30
          FROM events
        """,
        "rel_lag_gaps": """
          SELECT user_id, event_id, prev_event_id, gap_us FROM (
            SELECT user_id, event_id,
                   lag(event_id) OVER w AS prev_event_id,
                   CAST(epoch_us(ts) - epoch_us(lag(ts) OVER w) AS BIGINT) AS gap_us
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
          ) WHERE prev_event_id IS NOT NULL
        """,
        # exact distributed percentile: the Ray side's counting quantile
        # (value-histogram + cumulative walk) equals percentile_disc
        "rel_median_price": """
          SELECT o_orderpriority,
                 percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS median_price
          FROM orders GROUP BY o_orderpriority
        """,
        # zero-filled per-user hourly series (resample archetype); the Ray
        # side's grouped-arange fill equals generate_series per user span
        "rel_gap_fill": """
          WITH gf_c AS (
            SELECT user_id,
                   CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
          ), gf_s AS (
            SELECT user_id, min(hour_epoch) AS mn, max(hour_epoch) AS mx
            FROM gf_c GROUP BY user_id
          ), gf_h AS (
            SELECT user_id, unnest(generate_series(mn, mx, 3600)) AS hour_epoch
            FROM gf_s
          )
          SELECT h.user_id, h.hour_epoch,
                 CAST(coalesce(c.n, 0) AS BIGINT) AS n_events
          FROM gf_h h LEFT JOIN gf_c c USING (user_id, hour_epoch)
        """,
        # 2-D Pareto skyline (max price, min date): the oracle is the
        # dominance definition itself; the Ray side is a prefix-max filter
        "rel_skyline": """
          SELECT o_orderkey, o_orderdate, o_totalprice FROM orders a
          WHERE NOT EXISTS (
            SELECT 1 FROM orders b
            WHERE b.o_totalprice >= a.o_totalprice
              AND b.o_orderdate <= a.o_orderdate
              AND (b.o_totalprice > a.o_totalprice
                   OR b.o_orderdate < a.o_orderdate))
        """,
        # distributive argmin/argmax merge under the (ts, event_id) total
        # order — first/last event type per user
        "rel_first_last": """
          SELECT DISTINCT user_id,
                 first_value(event_type) OVER w1 AS first_event,
                 last_value(event_type) OVER w2 AS last_event
          FROM events
          WINDOW w1 AS (PARTITION BY user_id ORDER BY ts, event_id),
                 w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND UNBOUNDED FOLLOWING)
        """,
        # quantile vector from ONE value histogram; quantile_disc matches
        # the Ray side's all-integer cumulative pick
        "rel_price_quantiles": """
          SELECT o_orderpriority,
                 quantile_disc(o_totalprice, 0.25) AS p25,
                 quantile_disc(o_totalprice, 0.50) AS p50,
                 quantile_disc(o_totalprice, 0.90) AS p90
          FROM orders GROUP BY o_orderpriority
        """,
        # per-user modal event type, ties broken by smallest type string —
        # the same total order the Ray-side sort applies
        "rel_mode_event": """
          SELECT user_id, event_type AS mode_event, n FROM (
            SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY count(*) DESC, event_type) AS rk
            FROM events GROUP BY user_id, event_type
          ) WHERE rk = 1
        """,
        # deterministic multiplicative-hash sample — identical subset at any
        # parallelism, same arithmetic on both sides
        "rel_sample_hash": """
          SELECT o_orderkey, o_custkey, o_totalprice FROM orders
          WHERE (o_orderkey * 2654435761) % 4294967296 < 42949672
        """,
        # TPC-H Q3 archetype: same int-cent revenue units, same
        # (revenue desc, date, key) top-k tie-break on both sides
        "rel_q3_unshipped": """
          SELECT l_orderkey,
                 round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                               AS BIGINT)) / 100.0, 2) AS revenue,
                 o_orderdate
          FROM customer
          JOIN orders ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
          WHERE c_mktsegment = 'BUILDING'
            AND o_orderdate < TIMESTAMP '1996-06-15'
            AND l_shipdate  > TIMESTAMP '1996-06-15'
          GROUP BY l_orderkey, o_orderdate
          ORDER BY sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                            AS BIGINT)) DESC, o_orderdate, l_orderkey
          LIMIT 10
        """,
        # Bloom-prefilter + exact-verify anti-join — the Bloom only
        # shrinks the exact pass's input, so the result is plain NOT EXISTS
        "rel_bloom_antijoin": """
          SELECT c_custkey, c_name FROM customer c
          WHERE NOT EXISTS (SELECT 1 FROM events e
                            WHERE e.user_id = c.c_custkey)
        """,
        # deterministic global shuffle: exact rank under the keyed-hash
        # total order (h, key) — same multiplicative hash as the sampler
        "rel_shuffle_rank": """
          SELECT o_orderkey,
                 CAST(row_number() OVER (ORDER BY h, o_orderkey) - 1
                      AS BIGINT) AS shuffle_pos
          FROM (SELECT o_orderkey,
                       (o_orderkey * 2654435761) % 4294967296 AS h
                FROM orders)
        """,
        # pivot as conditional aggregation (the declared type enum is the
        # column set — one shuffled row per user)
        "rel_pivot_events": """
          SELECT user_id,
                 CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
                 CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
                 CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
                 CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
                 CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view
          FROM events GROUP BY user_id
        """,
        # deterministic collect: sorted string_agg (order as data)
        "rel_region_nations": """
          SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
          FROM nation JOIN region ON r_regionkey = n_regionkey
          GROUP BY r_name
        """,
        # multi-level aggregate: ROLLUP subtotals, grouped-out levels as 'ALL'
        "rel_rollup_revenue": """
          SELECT coalesce(r_name, 'ALL') AS r_name,
                 coalesce(n_name, 'ALL') AS n_name,
                 round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2) AS revenue
          FROM orders
          JOIN customer ON c_custkey = o_custkey
          JOIN nation ON n_nationkey = c_nationkey
          JOIN region ON r_regionkey = n_regionkey
          GROUP BY ROLLUP(r_name, n_name)
        """,
        # ordered-sequence funnel: each stage's completion = min ts of its
        # events at-or-after the previous stage's completion
        "rel_funnel": """
          WITH fnl_v AS (SELECT user_id, min(ts) AS vt FROM events
                         WHERE event_type = 'view' GROUP BY user_id),
          fnl_c AS (SELECT e.user_id, min(e.ts) AS ct
                    FROM events e JOIN fnl_v v ON v.user_id = e.user_id
                    WHERE e.event_type = 'click' AND e.ts >= v.vt
                    GROUP BY e.user_id),
          fnl_p AS (SELECT e.user_id, min(e.ts) AS pt
                    FROM events e JOIN fnl_c c ON c.user_id = e.user_id
                    WHERE e.event_type = 'purchase' AND e.ts >= c.ct
                    GROUP BY e.user_id)
          SELECT v.user_id,
                 CAST(1 + (c.user_id IS NOT NULL)::INT
                        + (p.user_id IS NOT NULL)::INT AS BIGINT) AS funnel_stage
          FROM fnl_v v
          LEFT JOIN fnl_c c ON c.user_id = v.user_id
          LEFT JOIN fnl_p p ON p.user_id = v.user_id
        """,
        # range join: per click, views by the same user in (ts-5min, ts]
        "rel_range_count": """
          SELECT l.event_id, CAST(count(r.event_id) AS BIGINT) AS n_views
          FROM events l LEFT JOIN events r
            ON r.user_id = l.user_id AND r.event_type = 'view'
           AND r.ts > l.ts - INTERVAL 5 MINUTE AND r.ts <= l.ts
          WHERE l.event_type = 'click'
          GROUP BY l.event_id
        """,
        # interval-overlap self-join over gap-30min sessions (inclusive
        # endpoints); LEFT JOIN keeps zero-overlap sessions
        "rel_session_overlap": """
          WITH ovl_o AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTES
                        THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
          ), ovl_s AS (
            SELECT user_id, ts,
                   sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sess
            FROM ovl_o
          ), ovl_sess AS (
            SELECT user_id, CAST(sess + 1 AS BIGINT) AS session_idx,
                   min(ts) AS session_start, max(ts) AS session_end
            FROM ovl_s GROUP BY user_id, sess
          )
          SELECT a.user_id, a.session_idx,
                 CAST(count(b.user_id) AS BIGINT) AS n_overlap
          FROM ovl_sess a LEFT JOIN ovl_sess b
            ON b.session_start <= a.session_end
           AND b.session_end >= a.session_start
           AND NOT (b.user_id = a.user_id AND b.session_idx = a.session_idx)
          GROUP BY a.user_id, a.session_idx
        """,
        "rel_cube_revenue": """
          SELECT coalesce(r_name, 'ALL') AS r_name,
                 coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
                 round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2) AS revenue
          FROM orders
          JOIN customer ON c_custkey = o_custkey
          JOIN nation ON n_nationkey = c_nationkey
          JOIN region ON r_regionkey = n_regionkey
          GROUP BY CUBE(r_name, o_orderpriority)
        """,
        # correlated subquery, decorrelated; boundary test in exact cents
        # (price*n > sum) so no float-epsilon row flips
        "rel_above_avg": """
          SELECT o_orderkey, o_custkey, o_totalprice FROM (
            SELECT o_orderkey, o_custkey, o_totalprice,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                   count(*) OVER (PARTITION BY o_custkey) AS n,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT))
                     OVER (PARTITION BY o_custkey) AS tot
            FROM orders
          ) WHERE cents * n > tot
        """,
        # deterministic stratified sample: smallest multiplicative hash per
        # stratum, event_id tiebreak (same subset at any parallelism)
        "rel_sample_stratified": f"""
          SELECT event_type, event_id FROM (
            SELECT event_type, event_id,
                   row_number() OVER (
                     PARTITION BY event_type
                     ORDER BY (event_id * 2654435761) % 4294967296, event_id
                   ) AS rn
            FROM events
          ) WHERE rn <= {STRAT_K}
        """,
        # exact DISTINCT aggregate per window (two-level dedup)
        "rel_hourly_active_users": """
          SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
                 CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
          FROM events GROUP BY date_trunc('hour', ts)
        """,
        # running DISTINCT reduced to first-occurrence + prefix sum on
        # both sides (a windowed count(distinct) is not SQL-window-native)
        "rel_cumulative_users": """
          SELECT h AS hour_epoch,
                 CAST(new_users AS BIGINT) AS new_users,
                 CAST(sum(new_users) OVER (ORDER BY h) AS BIGINT)
                   AS cum_users
          FROM (
            SELECT h, count(*) AS new_users FROM (
              SELECT user_id,
                     min(CAST(epoch(date_trunc('hour', ts)) AS BIGINT)) AS h
              FROM events GROUP BY user_id
            ) GROUP BY h
          )
        """,
        # cohort-retention matrix: first-activity-day cohorts × activity age
        "rel_retention_cohorts": """
          WITH ud AS (
            SELECT DISTINCT user_id,
                   CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS d
            FROM events),
          fd AS (SELECT user_id, min(d) AS cohort FROM ud GROUP BY user_id)
          SELECT fd.cohort AS cohort_day,
                 ud.d - fd.cohort AS age_days,
                 CAST(count(*) AS BIGINT) AS active_users
          FROM ud JOIN fd USING (user_id)
          GROUP BY 1, 2
        """,
        # per-type trend over the zero-filled global hour axis: integer
        # slope numerator n·Σxy − Σx·Σy (denominator is a corpus constant)
        "rel_trend_slope": """
          WITH ts_hc AS (
            SELECT event_type,
                   CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS h,
                   CAST(count(*) AS BIGINT) AS y
            FROM events GROUP BY 1, 2),
          ts_rng AS (SELECT min(h) AS h0, max(h) AS h1 FROM ts_hc),
          ts_ax AS (SELECT h1 - h0 + 1 AS n,
                           (h1 - h0) * (h1 - h0 + 1) // 2 AS sx
                    FROM ts_rng)
          SELECT event_type,
                 CAST((SELECT n FROM ts_ax)
                        * sum((h - (SELECT h0 FROM ts_rng)) * y)
                      - (SELECT sx FROM ts_ax) * sum(y) AS BIGINT)
                   AS trend_units
          FROM ts_hc GROUP BY event_type
        """,
        # Markov transition counts over per-user (ts, event_id)-ordered
        # sequences
        "rel_transitions": """
          SELECT prev AS from_type, event_type AS to_type,
                 CAST(count(*) AS BIGINT) AS n
          FROM (
            SELECT user_id, event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev
            FROM events)
          WHERE prev IS NOT NULL GROUP BY 1, 2
        """,
        # late-arrival audit: ts earlier than the running max of prior-
        # ingested (event_id order) events of the same user
        "rel_out_of_order": """
          SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                 CAST(sum(CASE WHEN ts < pmax THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_late
          FROM (
            SELECT user_id, ts,
                   max(ts) OVER (PARTITION BY user_id ORDER BY event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS pmax
            FROM events)
          GROUP BY user_id
        """,
        # UNPIVOT/melt of the lineitem measure columns (cents-quantized)
        "rel_unpivot": """
          SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                 m AS measure,
                 CAST(sign(v) * floor(abs(v) * 100.0 + 0.5) AS BIGINT)
                   AS value_cents
          FROM (
            SELECT l_orderkey, l_linenumber, 'l_quantity' AS m,
                   CAST(l_quantity AS DOUBLE) AS v FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_extendedprice',
                   CAST(l_extendedprice AS DOUBLE) FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_discount',
                   CAST(l_discount AS DOUBLE) FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_tax',
                   CAST(l_tax AS DOUBLE) FROM lineitem)
        """,
        # genuine range join against the literal interval table (the Ray
        # path broadcasts the same bands and probes with searchsorted)
        "rel_value_bands": """
          SELECT e.event_type, b.band,
                 CAST(count(*) AS BIGINT) AS n_events,
                 round(sum(CAST(round(e.value * 100) AS BIGINT)) / 100.0, 2) AS sum_value
          FROM events e JOIN (VALUES
            (0.0, 10.0, 'low'), (10.0, 100.0, 'mid'), (100.0, 1e18, 'high')
          ) AS b(lo, hi, band) ON e.value >= b.lo AND e.value < b.hi
          GROUP BY e.event_type, b.band
        """,
    }


def _ops_sql() -> dict[str, str]:
    from codepropertygraph_ray.functions.dedup import (
        JACCARD_THRESHOLD,
        MAX_DF,
        SHINGLE_W,
        SPAN_K,
    )
    from codepropertygraph_ray.functions.similarity import (
        DBSCAN_COS,
        DBSCAN_MIN_PTS,
        DUP_COS_THRESHOLD,
        KM_ITERS,
        KM_K,
        KM_Q,
        MUTUAL_K,
        MUTUAL_Q,
        KNN_K,
        N_QUERIES,
    )
    from codepropertygraph_ray.functions.text import (
        ENTROPY_UNIT,
        CONTAMINATION_PROBES as CONTAM_PROBES,
    )
    from codepropertygraph_ray.functions.text import (
        BIGRAM_MIN_N,
        BPE_SQL_RE,
        LANG_MARKERS,
        PACK_BUDGET,
        PACK_SHARDS,
        STOPWORDS,
        TFIDF_K,
        TFIDF_ROUND,
    )

    stop_list = ", ".join(f"'{w}'" for w in sorted(STOPWORDS))
    mk = {
        lang: ", ".join(f"'{w}'" for w in sorted(markers))
        for lang, markers in LANG_MARKERS.items()
    }
    # distinct word shingles per doc via lateral position unnest; the
    # stop-shingle DF cap (drop shingles in > MAX_DF docs) mirrors the Ray
    # path's fan-out bound so both sides measure the same Jaccard
    shingle_rows_raw = f"""
      SELECT DISTINCT doc_id,
             list_aggregate(toks[i:i + {SHINGLE_W - 1}], 'string_agg', ' ') AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           LATERAL (SELECT unnest(generate_series(1, len(toks) - {SHINGLE_W - 1})) AS i)
    """
    shingle_rows = f"""
      SELECT * FROM ({shingle_rows_raw})
      WHERE shingle IN (
        SELECT shingle FROM ({shingle_rows_raw})
        GROUP BY shingle HAVING count(*) <= {MAX_DF}
      )
    """
    ngram_pairs_sql = f"""
      WITH sh AS ({shingle_rows}),
      sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ninter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
      )
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(ninter AS DOUBLE) / (sa.n + sb.n - ninter) >= {JACCARD_THRESHOLD}
    """

    # ---- keyed-hash family, now SQL-expressible (VERDICT r4 item 4) -------
    # text.poly_hash mirrors: list_reduce polynomial codepoint hash, same
    # modulus/base constants as the engine — every value below is bit-exact
    from codepropertygraph_ray.functions.dedup import (
        MH_A_MULT,
        MH_B_MULT,
        MH_P,
        N_PERM,
        SIMHASH_MAX_HAMMING,
    )
    from codepropertygraph_ray.functions.multimodal import (
        _DIM_A_MULT,
        _DIM_B_MULT,
        CHUNK_BYTES,
        FEATURE_DIM as MM_DIM,
        FRAME_EVERY_MS as MM_EVERY_MS,
    )
    from codepropertygraph_ray.functions.text import (
        FP_KGRAM,
        FP_WINDOW,
        POLY_B,
        POLY_B2,
        POLY_P31 as MM_P,
        POLY_P55,
        poly_hash_sql,
    )

    # ((a_d·h + b_d) mod P31) mod 2^24, as an exact double — the SQL twin of
    # multimodal._mix_dims (column h from the *_base CTE, dim from dd.d)
    _mm_value_sql = (
        f"CAST((((({_DIM_A_MULT} * dd.d + 1) % {MM_P}) * h"
        f" + (({_DIM_B_MULT} * dd.d + 7) % {MM_P})) % {MM_P})"
        f" % {1 << 24} AS DOUBLE) / {float(1 << 24)} AS value"
    )

    # per-doc 63-bit simhash: token bits from two independent poly hashes
    # (bit j<32 = h1 bit j; j>=32 = h2 bit j-32), occurrence-weighted
    # majority vote — identical to functions/text.simhash64
    simhash_sig_sql = f"""
      SELECT d.doc_id, CAST(coalesce(s.sig, 0) AS BIGINT) AS simhash
      FROM documents d LEFT JOIN (
        SELECT doc_id,
               sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS sig
        FROM (
          SELECT doc_id, j,
                 sum(CASE WHEN ((CASE WHEN j < 32 THEN h1 >> j
                                      ELSE h2 >> (j - 32) END) & 1) = 1
                     THEN 1 ELSE -1 END) AS v
          FROM (
            SELECT doc_id, {poly_hash_sql('tok')} AS h1,
                   {poly_hash_sql('tok', base=POLY_B2)} AS h2
            FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok
                  FROM documents)
          ), LATERAL (SELECT unnest(generate_series(0, 62)) AS j)
          GROUP BY doc_id, j
        ) GROUP BY doc_id
      ) s ON s.doc_id = d.doc_id
    """

    # winnowing fingerprint: k-gram mod-P poly hashes, window minima,
    # distinct + xor-fold — identical to functions/text.fingerprint_batch
    fp_kh = "CAST(0 AS BIGINT)"
    for _i in range(FP_KGRAM):
        fp_kh = f"(({fp_kh} * {POLY_B} + unicode(substr(text, p + {_i}, 1))) % {POLY_P55})"
    fingerprint_sql = f"""
      WITH fp_d AS (SELECT doc_id, coalesce(text, '') AS text,
                           length(coalesce(text, '')) AS L FROM documents),
      fp_k AS (
        SELECT doc_id, p, {fp_kh} AS kh, L - {FP_KGRAM - 1} AS nk
        FROM fp_d, LATERAL (SELECT unnest(generate_series(1, L - {FP_KGRAM - 1})) AS p)
      ),
      fp_win AS (
        SELECT doc_id, p, nk,
               min(kh) OVER (PARTITION BY doc_id ORDER BY p
                             ROWS BETWEEN CURRENT ROW
                             AND {FP_WINDOW - 1} FOLLOWING) AS m
        FROM fp_k
      ),
      fp_sel AS (
        SELECT doc_id, m AS h FROM fp_win
        WHERE nk >= {FP_WINDOW} AND p <= nk - {FP_WINDOW - 1}
        UNION ALL
        SELECT doc_id, kh FROM fp_k WHERE nk < {FP_WINDOW}
        UNION ALL
        SELECT doc_id, {poly_hash_sql('text')} FROM fp_d WHERE L < {FP_KGRAM}
      )
      SELECT doc_id, CAST(bit_xor(DISTINCT h) AS BIGINT) AS fingerprint,
             CAST(count(DISTINCT h) AS BIGINT) AS n_selected
      FROM fp_sel GROUP BY doc_id
    """

    # MinHash-LSH: 31-bit poly shingle hashes, closed-form universal-hash
    # permutations, banding = band-tuple equality (the engine's band_hash
    # equality ⟺ tuple equality), exact-Jaccard verification — identical
    # to functions/dedup.minhash_lsh_pairs
    minhash_lsh_sql = f"""
      WITH mh_sh AS MATERIALIZED ({shingle_rows_raw}),
      mh_h AS (SELECT doc_id, {poly_hash_sql('shingle', mod=MH_P)} AS h FROM mh_sh),
      mh_perm AS (
        SELECT i, ({MH_A_MULT} * i) % {MH_P} AS a, ({MH_B_MULT} * i) % {MH_P} AS b
        FROM (SELECT unnest(generate_series(1, {N_PERM})) AS i)
      ),
      mh_sig AS (
        SELECT doc_id, i, min((a * h + b) % {MH_P}) AS v
        FROM mh_h CROSS JOIN mh_perm GROUP BY doc_id, i
      ),
      mh_band AS (
        SELECT doc_id, (i - 1) // 4 AS band,
               max(CASE WHEN (i - 1) % 4 = 0 THEN v END) AS r0,
               max(CASE WHEN (i - 1) % 4 = 1 THEN v END) AS r1,
               max(CASE WHEN (i - 1) % 4 = 2 THEN v END) AS r2,
               max(CASE WHEN (i - 1) % 4 = 3 THEN v END) AS r3
        FROM mh_sig GROUP BY doc_id, (i - 1) // 4
      ),
      mh_cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM mh_band a JOIN mh_band b
          ON a.band = b.band AND a.r0 = b.r0 AND a.r1 = b.r1
         AND a.r2 = b.r2 AND a.r3 = b.r3 AND a.doc_id < b.doc_id
      ),
      mh_sizes AS (SELECT doc_id, count(*) AS n FROM mh_sh GROUP BY doc_id),
      mh_inter AS (
        SELECT c.id_a, c.id_b, count(*) AS ninter
        FROM mh_cand c
        JOIN mh_sh x ON x.doc_id = c.id_a
        JOIN mh_sh y ON y.doc_id = c.id_b AND y.shingle = x.shingle
        GROUP BY c.id_a, c.id_b
      )
      SELECT id_a, id_b FROM mh_inter
      JOIN mh_sizes sa ON sa.doc_id = id_a
      JOIN mh_sizes sb ON sb.doc_id = id_b
      WHERE CAST(ninter AS DOUBLE) / (sa.n + sb.n - ninter) >= {JACCARD_THRESHOLD}
    """

    # deterministic-sketch oracles: an HLL/CMS ESTIMATE is a closed-form
    # function of the data given its hash rows; with the universal-hash
    # family ((a·x+b) mod p) mod w the SQL rebuilds the same registers /
    # cells and hence the same estimates (functions/sketch.py)
    from codepropertygraph_ray.functions.sketch import (
        _ALPHA,
        CMS_D,
        CMS_W,
        HLL_M,
        SKETCH_A_MULT,
        SKETCH_B_MULT,
        SKETCH_P,
    )

    def _uh(i: int, key: str) -> str:
        a = (SKETCH_A_MULT * i) % SKETCH_P
        b = (SKETCH_B_MULT * i) % SKETCH_P
        return f"(({a} * ({key} % {SKETCH_P}) + {b}) % {SKETCH_P})"

    hll_sql = f"""
      WITH hll_h AS (
        SELECT event_type, {_uh(1, 'user_id')} % {HLL_M} AS idx,
               {_uh(2, 'user_id')} AS w
        FROM events
      ),
      hll_reg AS (
        SELECT event_type, idx,
               max(CASE WHEN w = 0 THEN 32
                        ELSE 32 - length(bin(w)) END) AS r
        FROM hll_h GROUP BY event_type, idx
      ),
      hll_agg AS (
        SELECT event_type, sum(power(2.0, -r)) AS zhit,
               count(*) AS nhit
        FROM hll_reg GROUP BY event_type
      ),
      hll_est AS (
        SELECT event_type,
               CAST({_ALPHA!r} AS DOUBLE) * {HLL_M} * {HLL_M}
                 / (zhit + ({HLL_M} - nhit)) AS raw,
               {HLL_M} - nhit AS zeros
        FROM hll_agg
      )
      SELECT event_type,
             CAST(round(CASE WHEN raw <= 2.5 * {HLL_M} AND zeros > 0
                             THEN {HLL_M} * ln(CAST({HLL_M} AS DOUBLE) / zeros)
                             ELSE raw END) AS BIGINT) AS approx_users
      FROM hll_est
    """

    cms_cells = " UNION ALL ".join(
        f"SELECT {i} AS i, {_uh(i + 3, 'user_id')} % {CMS_W} AS cell, user_id FROM events"
        for i in range(CMS_D)
    )
    cms_sql = f"""
      WITH cms_all AS MATERIALIZED ({cms_cells}),
      cms_counts AS (SELECT i, cell, count(*) AS c FROM cms_all GROUP BY i, cell),
      cms_keycell AS (SELECT DISTINCT i, cell, user_id FROM cms_all),
      cms_est AS (
        SELECT k.user_id, min(c.c) AS est
        FROM cms_keycell k JOIN cms_counts c ON c.i = k.i AND c.cell = k.cell
        GROUP BY k.user_id
      )
      SELECT CAST(user_id AS BIGINT) AS user_id, CAST(est AS BIGINT) AS approx_n
      FROM cms_est ORDER BY est DESC, user_id LIMIT 10
    """

    return {
        "agg_hll_users": hll_sql,
        "agg_cms_heavy": cms_sql,
        "text_simhash": simhash_sig_sql,
        "text_fingerprint": fingerprint_sql,
        # all-pairs Hamming ≤ 3 over the SQL-computed signatures (the
        # engine's 4×16-bit banding is EXACT by pigeonhole at ham ≤ 3 —
        # the brute-force-equivalence pytest pins it)
        "dedup_simhash_pairs": f"""
          WITH sp_sig AS MATERIALIZED ({simhash_sig_sql})
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
          FROM sp_sig a JOIN sp_sig b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
        """,
        "dedup_minhash_lsh": minhash_lsh_sql,
        "text_token_stats": r"""
          SELECT doc_id,
                 CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
                 CAST(len(list_distinct(regexp_extract_all(text, '\S+'))) AS BIGINT) AS n_distinct,
                 CAST(length(text) AS BIGINT) AS n_chars
          FROM documents
        """,
        # stopword-gazetteer language ID — same marker sets and the same
        # deterministic tie-break as functions/text.lang_id: 'en' wins ties
        # against all, then gazetteer order de > fr > es; score 0 → 'und';
        # any CJK char → 'zh' (checked first, like the Python fast path)
        "text_lang_id": f"""
          SELECT doc_id,
                 CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
                      WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                      WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                      WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                      WHEN s_fr >= s_es THEN 'fr'
                      ELSE 'es' END AS lang_pred
          FROM (
            SELECT doc_id, text,
                   len(list_filter(words, w -> w IN ({mk['en']}))) AS s_en,
                   len(list_filter(words, w -> w IN ({mk['de']}))) AS s_de,
                   len(list_filter(words, w -> w IN ({mk['fr']}))) AS s_fr,
                   len(list_filter(words, w -> w IN ({mk['es']}))) AS s_es
            FROM (SELECT doc_id, text,
                         regexp_extract_all(lower(text), '[a-z]+') AS words
                  FROM documents)
          )
        """,
        "text_quality": f"""
          SELECT doc_id,
                 CAST(len(words) AS BIGINT) AS n_words,
                 CAST(len(list_filter(words, w -> w IN ({stop_list}))) AS BIGINT) AS n_stopwords,
                 CAST(coalesce(list_max(list_apply(words, w -> length(w))), 0) AS BIGINT) AS longest_word,
                 CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT) AS n_punct
          FROM (SELECT doc_id, text, regexp_extract_all(lower(text), '[a-z]+') AS words FROM documents)
        """,
        # corpus bigram counts (1-based list indexing in DuckDB; split(' ')
        # keeps empty tokens on both sides)
        # BPE-ish pre-tokenizer count: identical alternation regex runs
        # under Python re and DuckDB RE2 (no lookarounds)
        "text_bpe_tokens": f"""
          SELECT doc_id,
                 CAST(len(regexp_extract_all(text, '{BPE_SQL_RE}')) AS BIGINT)
                   AS n_bpe_tokens
          FROM documents
        """,
        "text_bigrams": f"""
          SELECT bigram, CAST(count(*) AS BIGINT) AS n FROM (
            SELECT toks[i] || ' ' || toks[i + 1] AS bigram
            FROM (SELECT string_split(text, ' ') AS toks FROM documents),
                 LATERAL (SELECT unnest(generate_series(1, len(toks) - 1)) AS i)
          ) GROUP BY bigram HAVING count(*) >= {BIGRAM_MIN_N}
        """,
        # benchmark-contamination screen: substring probes, same set
        "text_contamination": f"""
          SELECT doc_id,
                 ({" OR ".join(f"contains(text, '{p}')" for p in CONTAM_PROBES)})
                 AS contaminated
          FROM documents
        """,
        # deterministic 80/10/10 split by multiplicative hash, same arithmetic
        "text_dataset_split": """
          SELECT CASE WHEN h < 80 THEN 'train'
                      WHEN h < 90 THEN 'val' ELSE 'test' END AS split,
                 CAST(count(*) AS BIGINT) AS n_docs
          FROM (SELECT (doc_id * 2654435761) % 4294967296 % 100 AS h FROM documents)
          GROUP BY 1
        """,
        # concat-and-chunk sequence packing: same pack order (shard =
        # multiplicative doc_id hash, then doc_id), same whitespace token
        # count, same all-integer offset arithmetic as text.pack_chunks;
        # empty docs span the zero-width chunk at their offset
        "text_pack_chunks": rf"""
          SELECT doc_id, shard, start_tok,
                 CAST(start_tok // {PACK_BUDGET} AS BIGINT) AS chunk_first,
                 CAST((start_tok + greatest(n_tok, 1) - 1) // {PACK_BUDGET}
                      AS BIGINT) AS chunk_last
          FROM (
            SELECT doc_id, shard, n_tok,
                   CAST(coalesce(sum(n_tok) OVER (
                     PARTITION BY shard ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS start_tok
            FROM (SELECT doc_id,
                         (doc_id * 2654435761) % 4294967296 % {PACK_SHARDS}
                           AS shard,
                         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
                           AS n_tok
                  FROM documents)
          )
        """,
        # unigram LM scoring: the corpus is the model; per-VOCAB-entry
        # log-probs round to fixed point BEFORE the per-doc sum, so both
        # sides sum exact integers (order-free) — only ln() itself must
        # agree, and both sides call libm log on the same double
        "text_unigram_logprob": r"""
          SELECT d.doc_id,
                 CAST(coalesce(ds.n_words, 0) AS BIGINT) AS n_words,
                 CAST(coalesce(ds.s, 0) AS BIGINT) AS logprob_units
          FROM documents d LEFT JOIN (
            SELECT w.doc_id, count(*) AS n_words, sum(u.units) AS s
            FROM (SELECT doc_id,
                         unnest(regexp_extract_all(lower(text), '[a-z]+'))
                           AS term
                  FROM documents) w
            JOIN (
              SELECT term,
                     CAST(round(ln(n / (SELECT sum(n) FROM (
                         SELECT count(*) AS n
                         FROM (SELECT unnest(regexp_extract_all(lower(text),
                                             '[a-z]+')) AS term
                               FROM documents)
                         GROUP BY term))) * 1000000) AS BIGINT) AS units
              FROM (SELECT term, count(*) AS n
                    FROM (SELECT unnest(regexp_extract_all(lower(text),
                                        '[a-z]+')) AS term
                          FROM documents)
                    GROUP BY term)
            ) u USING (term)
            GROUP BY w.doc_id
          ) ds ON d.doc_id = ds.doc_id
        """,
        # add-one bigram LM score: the unigram oracle's shape one rung up
        # (pair counts + history counts + prediction-alphabet size, per-
        # pair logs rounded once, integer per-doc sums)
        "text_bigram_logprob": r"""
          WITH bl_toks AS (SELECT doc_id, string_split(text, ' ') AS toks
                           FROM documents),
          bl_pairs AS (
            SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
            FROM bl_toks,
                 LATERAL (SELECT unnest(generate_series(1, len(toks) - 1)) AS i)
          ),
          bl_c AS (SELECT w1, w2, count(*) AS c FROM bl_pairs GROUP BY 1, 2),
          bl_c1 AS (SELECT w1, sum(c) AS c1 FROM bl_c GROUP BY w1),
          bl_v AS (SELECT count(DISTINCT w2) AS v FROM bl_c),
          bl_u AS (
            SELECT c.w1, c.w2,
                   CAST(round(ln((c.c + 1.0) / (c1.c1 + v.v)) * 1000000)
                        AS BIGINT) AS u
            FROM bl_c c JOIN bl_c1 c1 USING (w1) CROSS JOIN bl_v v
          ),
          bl_s AS (
            SELECT p.doc_id, count(*) AS n_bigrams, sum(u.u) AS s
            FROM bl_pairs p JOIN bl_u u ON u.w1 = p.w1 AND u.w2 = p.w2
            GROUP BY p.doc_id
          )
          SELECT d.doc_id,
                 CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
                 CAST(coalesce(s.s, 0) AS BIGINT) AS logprob_units
          FROM documents d LEFT JOIN bl_s s USING (doc_id)
        """,
        # character-distribution entropy in fixed point: per-count logs
        # rounded ONCE (ln matches libm log), then all-integer sums —
        # string_split(text,'') yields code points exactly like Python
        # iteration; the '' element from empty text is filtered on both
        # sides (Python: zero code points)
        "text_char_entropy": f"""
          SELECT d.doc_id,
                 CAST(coalesce(s.n_chars, 0) AS BIGINT) AS n_chars,
                 CAST(coalesce(s.ent_units, 0) AS BIGINT) AS ent_units
          FROM documents d LEFT JOIN (
            SELECT doc_id, sum(n) AS n_chars,
                   sum(n * CAST(round(ln(n) * {10 ** ENTROPY_UNIT}) AS BIGINT))
                     AS ent_units
            FROM (SELECT doc_id, ch, count(*) AS n
                  FROM (SELECT doc_id,
                               unnest(string_split(coalesce(text, ''), '')) AS ch
                        FROM documents)
                  WHERE ch <> '' GROUP BY doc_id, ch)
            GROUP BY doc_id
          ) s ON s.doc_id = d.doc_id
        """,
        # within-doc duplicate-trigram counts: tokens are \S+ runs so a
        # space-joined trigram key is injective (matches the Python tuple)
        "text_repetition": r"""
          SELECT doc_id,
                 CAST(greatest(len(toks) - 2, 0) AS BIGINT) AS n_trigrams,
                 CAST(greatest(len(toks) - 2, 0) - len(list_distinct(
                     list_transform(
                       generate_series(1, greatest(len(toks) - 2, 0)),
                       i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
                     ))) AS BIGINT) AS n_dup_trigrams
          FROM (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
                FROM documents)
        """,
        # PII scrub: the same RE2-portable rule table as text.REDACT_RULES,
        # applied in rule order; counts taken before each replacement
        "text_redact": _redact_sql(),
        # media metadata rollup: payload bytes = utf-8 text bytes, so the
        # media plumbing's sizes are exactly octet_length(text)
        "mm_payload_dups": """
          SELECT doc_id AS media_id,
                 min(doc_id) OVER (PARTITION BY md5(text)) AS dup_group
          FROM documents
        """,
        "mm_media_stats": """
          SELECT 'image' AS kind, CAST(count(*) AS BIGINT) AS n_items,
                 CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes
          FROM documents
        """,
        # decode-stub features, bit-exact: payload = utf-8 text bytes, hash =
        # poly_hash over the lowercase hex string (multimodal._fake_features),
        # per-dim universal-hash mix mod 2^24 → k/2^24 is an exact dyadic
        # rational in float32 AND double, so the float compare is bit-exact
        "mm_media_features": f"""
          WITH mf_pay AS (
            SELECT doc_id AS media_id, 'image' AS kind,
                   lower(hex(encode(coalesce(text, '')))) AS hx,
                   CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS n_bytes
            FROM documents
          ),
          mf_base AS (
            SELECT media_id, kind, n_bytes,
                   {poly_hash_sql('hx', mod=MM_P)} AS h
            FROM mf_pay
          )
          SELECT media_id, kind, n_bytes, CAST(dd.d AS BIGINT) AS dim,
                 {_mm_value_sql}
          FROM mf_base, (SELECT unnest(range({MM_DIM})) AS d) dd
        """,
        # fixed-size payload chunking: hex-string slices (2 chars/byte),
        # per-chunk polynomial content hash — the media_features hex
        # convention
        "mm_chunk_payloads": f"""
          WITH mcp AS (
            SELECT doc_id AS media_id,
                   lower(hex(encode(coalesce(text, '')))) AS hx,
                   CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT)
                     AS plen
            FROM documents),
          mcc AS (
            SELECT media_id, CAST(i AS BIGINT) AS chunk_idx,
                   substring(hx,
                             CAST(i * {CHUNK_BYTES} * 2 + 1 AS BIGINT),
                             {CHUNK_BYTES * 2}) AS chx
            FROM (SELECT media_id, hx,
                         unnest(range((plen + {CHUNK_BYTES - 1})
                                       // {CHUNK_BYTES})) AS i
                  FROM mcp))
          SELECT media_id, chunk_idx,
                 CAST(length(chx) // 2 AS BIGINT) AS n_bytes,
                 {poly_hash_sql('chx', mod=MM_P)} AS chunk_hash
          FROM mcc
        """,
        # frame sampling (multimodal.sample_frames): payload byte-slices are
        # 2×-width slices of the hex string; duration/step arithmetic is the
        # same integer math as the Python side
        "mm_frame_features": f"""
          WITH ff_pay AS (
            SELECT doc_id AS media_id,
                   lower(hex(encode(coalesce(text, '')))) AS hx,
                   CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS plen
            FROM documents
          ),
          ff_vid AS (
            SELECT media_id, hx, plen,
                   greatest((1000 + (plen % 5000)) // {MM_EVERY_MS}, 1) AS nf
            FROM ff_pay
          ),
          ff_fr AS (
            SELECT media_id, CAST(i AS BIGINT) AS frame_idx,
                   CAST(i * {MM_EVERY_MS} AS BIGINT) AS ts_ms,
                   substring(hx, CAST(i * greatest(plen // nf, 1) * 2 + 1 AS BIGINT),
                             CAST(greatest(plen // nf, 1) * 2 AS BIGINT)) AS fhx
            FROM (SELECT media_id, hx, plen, nf, unnest(range(nf)) AS i
                  FROM ff_vid)
          ),
          ff_base AS (
            SELECT media_id, frame_idx, ts_ms,
                   {poly_hash_sql('fhx', mod=MM_P)} AS h
            FROM ff_fr
          )
          SELECT media_id, frame_idx, ts_ms, CAST(dd.d AS BIGINT) AS dim,
                 {_mm_value_sql}
          FROM ff_base, (SELECT unnest(range({MM_DIM})) AS d) dd
        """,
        # TF-IDF top-k: rank on the ROUNDED score (both sides), term tiebreak
        "text_tfidf": f"""
          WITH tfx_ex AS MATERIALIZED (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents),
          tfx_tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                     FROM tfx_ex GROUP BY 1, 2),
          tfx_df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
                     FROM (SELECT DISTINCT doc_id, term FROM tfx_ex)
                     GROUP BY term),
          tfx_n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents)
          SELECT doc_id, term, rank, score FROM (
            SELECT t.doc_id, t.term,
                   round(t.tf * ln(tfx_n.n / d.df), {TFIDF_ROUND}) AS score,
                   row_number() OVER (
                     PARTITION BY t.doc_id
                     ORDER BY round(t.tf * ln(tfx_n.n / d.df), {TFIDF_ROUND}) DESC,
                              t.term ASC
                   ) AS rank
            FROM tfx_tf t JOIN tfx_df d ON d.term = t.term CROSS JOIN tfx_n
          ) WHERE rank <= {TFIDF_K}
        """,
        # per-document most-frequent token, lexicographic tiebreak
        "text_top_term": """
          SELECT doc_id, top_term, n FROM (
            SELECT doc_id, term AS top_term, CAST(count(*) AS BIGINT) AS n,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY count(*) DESC, term ASC) AS rn
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                  FROM documents)
            GROUP BY doc_id, term
          ) WHERE rn = 1
        """,
        "dedup_ngram_jaccard": ngram_pairs_sql,
        # end-to-end dedup policy: pairs → connected components (recursive
        # closure, min-id representative) → keep representative or
        # untouched docs (dk_ prefixes: see the CTE-capture note above)
        "dedup_keep_list": f"""
          WITH RECURSIVE dk_pairs AS MATERIALIZED ({ngram_pairs_sql}),
          dk_e(a, b) AS (SELECT id_a, id_b FROM dk_pairs
                         UNION SELECT id_b, id_a FROM dk_pairs),
          dk_reach(n, m) AS (
            SELECT a, a FROM dk_e GROUP BY a
            UNION
            SELECT r.n, dk_e.b FROM dk_reach r JOIN dk_e ON r.m = dk_e.a
          ),
          dk_comp AS (SELECT n, min(m) AS comp FROM dk_reach GROUP BY n)
          SELECT d.doc_id, (c.n IS NULL OR c.comp = d.doc_id) AS keep
          FROM documents d LEFT JOIN dk_comp c ON c.n = d.doc_id
        """,
        # position-level exact-substring duplication (Lee et al. 2022
        # ExactSubstr signal): per doc, how many word-K-gram positions
        # carry a gram occurring in >=2 distinct docs — same polynomial
        # gram hash as the engine, so counts are bit-exact
        "dedup_exact_spans": f"""
          WITH es_toks AS (
            SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w
            FROM documents
          ),
          es_grams AS (
            SELECT doc_id,
                   {poly_hash_sql(f"list_aggregate(w[i:i + {SPAN_K - 1}], 'string_agg', ' ')")} AS h
            FROM es_toks,
                 LATERAL (SELECT unnest(generate_series(1, len(w) - {SPAN_K - 1})) AS i)
          ),
          es_hc AS (SELECT doc_id, h, count(*) AS cnt FROM es_grams GROUP BY 1, 2),
          es_dph AS (SELECT h, count(*) AS n_docs FROM es_hc GROUP BY h),
          es_dup AS (
            SELECT doc_id, sum(cnt) AS dup_grams
            FROM es_hc JOIN es_dph USING (h) WHERE n_docs >= 2 GROUP BY doc_id
          )
          SELECT t.doc_id,
                 CAST(greatest(len(w) - {SPAN_K - 1}, 0) AS BIGINT) AS n_grams,
                 CAST(coalesce(dup_grams, 0) AS BIGINT) AS dup_grams
          FROM es_toks t LEFT JOIN es_dup USING (doc_id)
        """,
        # maximal duplicated token runs (the spans ExactSubstr would cut):
        # duplicated gram positions cover [p, p+K-1]; contiguous covers
        # merge — gaps-and-islands, break when p jumps by more than K
        "dedup_dup_spans": f"""
          WITH dsp_toks AS (
            SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w
            FROM documents
          ),
          dsp_grams AS (
            SELECT doc_id, i - 1 AS p,
                   {poly_hash_sql(f"list_aggregate(w[i:i + {SPAN_K - 1}], 'string_agg', ' ')")} AS h
            FROM dsp_toks,
                 LATERAL (SELECT unnest(generate_series(1, len(w) - {SPAN_K - 1})) AS i)
          ),
          dsp_dph AS (
            SELECT h, count(DISTINCT doc_id) AS n_docs FROM dsp_grams GROUP BY h
          ),
          dsp_pos AS (
            SELECT doc_id, p FROM dsp_grams JOIN dsp_dph USING (h)
            WHERE n_docs >= 2
          ),
          dsp_brk AS (
            SELECT doc_id, p,
                   CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p)
                             <= {SPAN_K} THEN 0 ELSE 1 END AS brk
            FROM dsp_pos
          ),
          dsp_grp AS (
            SELECT doc_id, p,
                   sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS grp
            FROM dsp_brk
          )
          SELECT doc_id, CAST(min(p) AS BIGINT) AS start,
                 CAST(max(p) - min(p) + {SPAN_K} AS BIGINT) AS length
          FROM dsp_grp GROUP BY doc_id, grp
        """,
        # the APPLIED ExactSubstr cut: every token covered by a duplicated
        # gram position [p, p+K-1] is removed, remaining tokens rejoin in
        # order (dct_ prefixes: own CTE namespace, see the capture note)
        "dedup_cut_text": f"""
          WITH dct_toks0 AS (
            SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w
            FROM documents
          ),
          dct_grams AS (
            SELECT doc_id, i - 1 AS p,
                   {poly_hash_sql(f"list_aggregate(w[i:i + {SPAN_K - 1}], 'string_agg', ' ')")} AS h
            FROM dct_toks0,
                 LATERAL (SELECT unnest(generate_series(1, len(w) - {SPAN_K - 1})) AS i)
          ),
          dct_dph AS (
            SELECT h, count(DISTINCT doc_id) AS n_docs FROM dct_grams GROUP BY h
          ),
          dct_pos AS (
            SELECT doc_id, p FROM dct_grams JOIN dct_dph USING (h)
            WHERE n_docs >= 2
          ),
          dct_cov AS (
            SELECT DISTINCT doc_id, p + j AS tok
            FROM dct_pos,
                 LATERAL (SELECT unnest(generate_series(0, {SPAN_K - 1})) AS j)
          ),
          dct_toks AS (
            SELECT doc_id, i - 1 AS tok, w[i] AS word
            FROM dct_toks0, LATERAL (SELECT unnest(generate_series(1, len(w))) AS i)
          )
          SELECT t.doc_id,
                 coalesce(string_agg(word, ' ' ORDER BY tok)
                          FILTER (WHERE c.tok IS NULL), '') AS clean_text
          FROM dct_toks t LEFT JOIN dct_cov c USING (doc_id, tok)
          GROUP BY t.doc_id
        """,
        # ExactSubstr on the flagship transcript payload: duplication unit
        # is the CONVERSATION (a gram in >=2 distinct conv_ids), per-turn
        # position counts
        "kg_turn_dup_spans": f"""
          WITH kts_toks AS (
            SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn_idx,
                   string_split(coalesce(text, ''), ' ') AS w
            FROM read_parquet('{_transcripts_path()}/*.parquet')
          ),
          kts_grams AS (
            SELECT conv_id, turn_idx,
                   {poly_hash_sql(f"list_aggregate(w[i:i + {SPAN_K - 1}], 'string_agg', ' ')")} AS h
            FROM kts_toks,
                 LATERAL (SELECT unnest(generate_series(1, len(w) - {SPAN_K - 1})) AS i)
          ),
          kts_hc AS (
            SELECT conv_id, turn_idx, h, count(*) AS cnt
            FROM kts_grams GROUP BY 1, 2, 3
          ),
          kts_dph AS (
            SELECT h, count(DISTINCT conv_id) AS n_convs FROM kts_grams GROUP BY h
          ),
          kts_dup AS (
            SELECT conv_id, turn_idx, sum(cnt) AS dup_grams
            FROM kts_hc JOIN kts_dph USING (h) WHERE n_convs >= 2 GROUP BY 1, 2
          )
          SELECT t.conv_id, t.turn_idx,
                 CAST(greatest(len(w) - {SPAN_K - 1}, 0) AS BIGINT) AS n_grams,
                 CAST(coalesce(dup_grams, 0) AS BIGINT) AS dup_grams
          FROM kts_toks t LEFT JOIN kts_dup USING (conv_id, turn_idx)
        """,
        "sim_knn_bruteforce": f"""
          WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
                     WHERE vec_id < {N_QUERIES}),
          scored AS (
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qe AS DOUBLE[])) AS cos
            FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id
          )
          SELECT query_id, CAST(rnk AS BIGINT) AS rank, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rnk
            FROM scored
          ) WHERE rnk <= {KNN_K}
        """,
        "sim_embedding_dups": f"""
          SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
          WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= {DUP_COS_THRESHOLD}
        """,
        # connected components over the dup-pair graph: transitive closure
        # by recursive CTE, component label = MIN reachable id — exactly
        # the canonical label functions/cc.py assigns
        # DBSCAN over the cosine-eps graph: cores by neighbor count,
        # clusters = CC of core-core edges (min-id label), borders attach
        # to the MIN adjacent-core cluster, noise = -1 — all tie-breaks
        # are mins, so SQL reproduces the distributed result exactly
        "sim_quantize_int8": """
          SELECT vec_id,
                 CAST(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                        x -> abs(CAST(floor(x * 127.0 /
                               greatest(list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                                                 y -> abs(y))), 1e-30)
                               + 0.5) AS BIGINT)))) AS BIGINT) AS sum_qabs,
                 CAST(len(list_filter(CAST(embedding AS DOUBLE[]),
                        x -> abs(CAST(floor(x * 127.0 /
                               greatest(list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                                                 y -> abs(y))), 1e-30)
                               + 0.5) AS BIGINT)) >= 127)) AS BIGINT) AS n_sat
          FROM embeddings
        """,
        # reciprocal nearest neighbors: pairs in each other's top-k by
        # quantized-cosine — integer dots of half-up-quantized unit vectors
        # (exact under any summation order; float cosine would break the
        # corpus's duplicate-vector rank ties differently per bucket)
        "sim_mutual_knn": f"""
          WITH mk_x AS (
            SELECT vec_id,
                   list_transform(CAST(embedding AS DOUBLE[]),
                     e -> CAST(floor(e / greatest(sqrt(list_inner_product(
                            CAST(embedding AS DOUBLE[]),
                            CAST(embedding AS DOUBLE[]))), 1e-30)
                            * {MUTUAL_Q} + 0.5) AS BIGINT)) AS v
            FROM embeddings),
          mk_s AS (
            SELECT a.vec_id AS src, b.vec_id AS dst,
                   list_inner_product(CAST(a.v AS DOUBLE[]),
                                      CAST(b.v AS DOUBLE[])) AS s
            FROM mk_x a JOIN mk_x b ON a.vec_id <> b.vec_id),
          mk_r AS (SELECT src, dst FROM (
            SELECT src, dst,
                   row_number() OVER (PARTITION BY src
                                      ORDER BY s DESC, dst) AS rn
            FROM mk_s) WHERE rn <= {MUTUAL_K})
          SELECT x.src AS id_a, x.dst AS id_b
          FROM mk_r x JOIN mk_r y ON y.src = x.dst AND y.dst = x.src
          WHERE x.src < x.dst
        """,
        # deterministic all-integer Lloyd's k-means: quantized coordinates,
        # integer squared-L2 argmin (ties → lowest cluster id), floor-div
        # centroid means, init = the KM_K smallest vec_ids
        "sim_kmeans": f"""
          WITH km_x AS (
            SELECT vec_id,
                   list_transform(CAST(embedding AS DOUBLE[]),
                     e -> CAST(floor(e * {KM_Q} + 0.5) AS BIGINT)) AS v
            FROM embeddings),
          km_el AS (
            SELECT vec_id, unnest(v) AS val,
                   unnest(generate_series(1, len(v))) AS pos
            FROM km_x),
          km_seed AS (SELECT vec_id, v,
                             row_number() OVER (ORDER BY vec_id) AS rn
                      FROM km_x),
          km_c0 AS (SELECT CAST(rn - 1 AS BIGINT) AS cl, v AS c
                    FROM km_seed WHERE rn <= {KM_K})
          {_kmeans_chain(KM_ITERS)}
          SELECT vec_id, CAST(cl AS BIGINT) AS cluster FROM km_a{KM_ITERS + 1}
        """,
        "sim_dbscan": f"""
          WITH RECURSIVE db_pairs AS MATERIALIZED (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= {DBSCAN_COS}
          ),
          db_und(a, b) AS (SELECT id_a, id_b FROM db_pairs
                           UNION ALL SELECT id_b, id_a FROM db_pairs),
          db_core AS (SELECT a FROM db_und GROUP BY a
                      HAVING count(*) >= {DBSCAN_MIN_PTS}),
          db_ce(a, b) AS (SELECT u.a, u.b FROM db_und u
                          JOIN db_core c1 ON c1.a = u.a
                          JOIN db_core c2 ON c2.a = u.b),
          db_reach(n, m) AS (
            SELECT a, a FROM db_core
            UNION
            SELECT r.n, db_ce.b FROM db_reach r JOIN db_ce ON db_ce.a = r.m
          ),
          db_cl AS (SELECT n, min(m) AS cluster FROM db_reach GROUP BY n),
          db_border AS (
            SELECT u.a AS n, min(cl.cluster) AS cluster
            FROM db_und u
            JOIN db_cl cl ON cl.n = u.b
            WHERE u.a NOT IN (SELECT a FROM db_core)
            GROUP BY u.a
          )
          SELECT e.vec_id,
                 coalesce(cl.cluster, bo.cluster, -1) AS cluster,
                 (cl.n IS NOT NULL) AS is_core
          FROM embeddings e
          LEFT JOIN db_cl cl ON cl.n = e.vec_id
          LEFT JOIN db_border bo ON bo.n = e.vec_id
        """,
        "sim_dup_groups": f"""
          WITH RECURSIVE pairs AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= {DUP_COS_THRESHOLD}
          ),
          e AS (SELECT id_a AS a, id_b AS b FROM pairs
                UNION SELECT id_b, id_a FROM pairs),
          reach(n, m) AS (
            SELECT a, a FROM e GROUP BY a
            UNION
            SELECT r.n, e.b FROM reach r JOIN e ON r.m = e.a
          )
          SELECT n AS vec_id, min(m) AS group_id FROM reach GROUP BY n
        """,
        # embedding-side end-to-end dedup policy: eps-graph components →
        # keep component representative (MIN vec_id) or any singleton
        "sim_keep_list": f"""
          WITH RECURSIVE sk_pairs AS MATERIALIZED (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= {DUP_COS_THRESHOLD}
          ),
          sk_e(a, b) AS (SELECT id_a, id_b FROM sk_pairs
                         UNION SELECT id_b, id_a FROM sk_pairs),
          sk_reach(n, m) AS (
            SELECT a, a FROM sk_e GROUP BY a
            UNION
            SELECT r.n, sk_e.b FROM sk_reach r JOIN sk_e ON r.m = sk_e.a
          ),
          sk_comp AS (SELECT n, min(m) AS comp FROM sk_reach GROUP BY n)
          SELECT v.vec_id, (c.n IS NULL OR c.comp = v.vec_id) AS keep
          FROM embeddings v LEFT JOIN sk_comp c ON c.n = v.vec_id
        """,
    }


def _redact_sql() -> str:
    """Chain one CTE per REDACT_RULES entry: count matches, then
    regexp_replace globally — the SQL mirror of text.redact's rule loop."""
    from codepropertygraph_ray.functions.text import REDACT_RULES

    sql = "SELECT event_id, props AS t, CAST(0 AS BIGINT) AS n FROM events"
    for pat, repl in REDACT_RULES:
        lit = pat.replace("'", "''")
        sql = f"""
          SELECT event_id,
                 regexp_replace(t, '{lit}', '{repl}', 'g') AS t,
                 n + len(regexp_extract_all(t, '{lit}')) AS n
          FROM ({sql})"""
    return f"""
      SELECT event_id, t AS redacted, CAST(n AS BIGINT) AS n_redacted
      FROM ({sql})"""


def oracle_sql() -> dict[str, str]:
    out = {}
    out.update(_kg_sql())
    out.update(_rel_sql())
    out.update(_ops_sql())
    return out
