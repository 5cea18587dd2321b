"""Invariant tests for the round-7 continuation queries (the differential
oracle parity for each lives in test_parity.py; these pin the semantic
claims the oracles can't express directly): sketch-calibration bounds,
containment >= Jaccard dominance, posting-list ordering, surprisal
non-negativity + bigram conservation, bucket agreement for semantic dups,
non-adjacency of predicted links, and basket support recomputation."""

from __future__ import annotations

import itertools
from collections import Counter

from pyspark.sql import functions as F

from epiteam_network_etl_functions_spark.workload.mobility import (
    common_neighbor_links,
    _colocation_edge_list,
)
from epiteam_network_etl_functions_spark.workload.text import (
    N_HASHES,
    bigram_surprisal,
    minhash_jaccard_calibration,
    posting_list_heads,
    shingle_containment_pairs,
    POSTING_MIN_DF,
    POSTING_HEAD_K,
    POSTINGS_PER_TERM,
)
from epiteam_network_etl_functions_spark.workload.tpch import (
    BASKET_MIN_ORDERS,
    part_basket_pairs,
)
from epiteam_network_etl_functions_spark.workload.vectors import (
    RP_PLANES,
    SEMDEDUP_COS,
    semantic_bucket_dups,
)
from tests.conftest import PARITY_SF_DIR


def test_calibration_bounds_and_error_identity(spark):
    rows = minhash_jaccard_calibration(spark, PARITY_SF_DIR).collect()
    assert rows, "calibration must be non-degenerate at sf0.001"
    for r in rows:
        assert r.a_id < r.b_id
        # the estimate is k/16 for integer k
        k = r.est_jaccard * N_HASHES
        assert abs(k - round(k)) < 1e-6
        assert 0.0 <= r.est_jaccard <= 1.0
        assert 0.0 < r.exact_jaccard <= 1.0
        assert abs(r.abs_err - round(abs(r.est_jaccard - r.exact_jaccard), 6)) < 1e-9


def test_containment_dominates_jaccard(spark):
    """containment = i/min(na,nb) >= i/(na+nb-i) = jaccard for every pair,
    so every exact-Jaccard near-dup pair at >= 0.5 must also appear in the
    containment output."""
    cont = {
        (r.a_id, r.b_id): r.containment
        for r in shingle_containment_pairs(spark, PARITY_SF_DIR).collect()
    }
    assert cont, "containment must be non-degenerate at sf0.001"
    cal = minhash_jaccard_calibration(spark, PARITY_SF_DIR).collect()
    for r in cal:
        if (r.a_id, r.b_id) in cont:
            assert cont[(r.a_id, r.b_id)] >= r.exact_jaccard - 1e-9
        else:
            # pairs absent from containment output were below its threshold
            assert r.exact_jaccard < 0.5 + 1e-9


def test_posting_list_shape(spark):
    rows = posting_list_heads(spark, PARITY_SF_DIR).collect()
    assert 0 < len(rows) <= POSTING_HEAD_K
    dfs = [r.df for r in rows]
    assert dfs == sorted(dfs, reverse=True)
    for r in rows:
        assert r.df >= POSTING_MIN_DF
        ids = [int(x) for x in r.postings.split(",")]
        assert ids == sorted(ids)
        assert len(ids) == min(r.df, POSTINGS_PER_TERM)


def test_bigram_surprisal_conservation(spark):
    """n_bigrams must equal token_count - 1 per doc, and the mean add-one
    surprisal is non-negative by construction (c1 >= c2, V >= 1)."""
    out = {r.doc_id: r for r in bigram_surprisal(spark, PARITY_SF_DIR).collect()}
    docs = (
        spark.read.parquet(f"{PARITY_SF_DIR}/documents.parquet")
        .select(
            "doc_id",
            F.size(
                F.filter(F.split("text", " "), lambda x: x != "")
            ).alias("n_tok"),
        )
        .collect()
    )
    for d in docs:
        if d.n_tok >= 2:
            assert out[d.doc_id].n_bigrams == d.n_tok - 1
            assert out[d.doc_id].mean_surprisal >= 0.0
        else:
            assert d.doc_id not in out


def test_semantic_bucket_dups_share_bucket(spark):
    from epiteam_network_etl_functions_spark.operators.similarity import (
        rp_bucket_col,
    )

    pairs = semantic_bucket_dups(spark, PARITY_SF_DIR).collect()
    assert pairs, "semantic dups must be non-degenerate at sf0.001"
    buckets = {
        r.vec_id: r.bucket
        for r in spark.read.parquet(f"{PARITY_SF_DIR}/embeddings.parquet")
        .select(
            "vec_id", rp_bucket_col(F.col("embedding"), RP_PLANES).alias("bucket")
        )
        .collect()
    }
    for p in pairs:
        assert p.a_id < p.b_id
        assert p.cosine >= SEMDEDUP_COS - 1e-9
        assert buckets[p.a_id] == buckets[p.b_id] == p.bucket


def test_common_neighbor_links_are_non_edges(spark):
    links = common_neighbor_links(spark, PARITY_SF_DIR).collect()
    assert links, "link prediction must be non-degenerate at sf0.001"
    edges = {
        (r.a_user_id, r.b_user_id)
        for r in _colocation_edge_list(spark, PARITY_SF_DIR).collect()
    }
    counts = [r.n_common for r in links]
    assert counts == sorted(counts, reverse=True)
    for r in links:
        assert r.a_user_id < r.b_user_id
        assert (r.a_user_id, r.b_user_id) not in edges
        assert r.n_common >= 1


def test_basket_pairs_match_direct_recount(spark):
    got = {
        (r.part_a, r.part_b): r.n_orders
        for r in part_basket_pairs(spark, PARITY_SF_DIR).collect()
    }
    assert got, "basket pairs must be non-degenerate at sf0.001"
    li = (
        spark.read.parquet(f"{PARITY_SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    orders: dict[int, set[int]] = {}
    for r in li:
        orders.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    support: Counter = Counter()
    for parts in orders.values():
        for a, b in itertools.combinations(sorted(parts), 2):
            support[(a, b)] += 1
    for pair, n in got.items():
        assert support[pair] == n
        assert n >= BASKET_MIN_ORDERS
    # the query returns the true top pairs: nothing outside the result may
    # strictly beat anything inside it
    floor = min(got.values())
    better = [p for p, n in support.items() if n > floor]
    assert all(p in got for p in better)


def test_frame_sample_conservation(spark):
    """Every doc with text emits exactly ceil(ceil(len/64) / every_n)
    frames, indices are multiples of the stride, and n_frames equals the
    total chunk count before sampling."""
    import math

    from epiteam_network_etl_functions_spark.workload.multimodal import (
        FRAME_EVERY_N,
        frame_sample_catalog,
    )

    rows = frame_sample_catalog(spark, PARITY_SF_DIR).collect()
    assert rows
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    lens = {
        r.doc_id: len(r.text.encode())
        for r in spark.read.parquet(f"{PARITY_SF_DIR}/documents.parquet").collect()
    }
    for doc_id, frames in per_doc.items():
        nc = math.ceil(lens[doc_id] / 64)
        assert len(frames) == math.ceil(nc / FRAME_EVERY_N)
        for fr in frames:
            assert fr.frame_idx % FRAME_EVERY_N == 0
            assert fr.n_frames == nc


def test_resized_payload_is_size_faithful(spark):
    from epiteam_network_etl_functions_spark.workload.multimodal import (
        RESIZE_H,
        RESIZE_W,
        resized_payload_digest,
    )

    rows = resized_payload_digest(spark, PARITY_SF_DIR).collect()
    assert rows
    want = min(3 * RESIZE_W * RESIZE_H, 1 << 20)
    for r in rows:
        assert (r.width, r.height, r.n_bytes) == (RESIZE_W, RESIZE_H, want)
        assert len(r.body_md5) == 32


def test_ivf_recall_bounds(spark):
    """recall = n_overlap/n_exact in [0,1]; the IVF side can never return
    more than K rows, and overlap can't exceed either side."""
    from epiteam_network_etl_functions_spark.workload.vectors import (
        K,
        RECALL_PROBE_IDS,
        ivf_recall_audit,
    )

    rows = ivf_recall_audit(spark, PARITY_SF_DIR).collect()
    assert {r.query_id for r in rows} == set(RECALL_PROBE_IDS)
    for r in rows:
        assert 0 < r.n_exact <= K
        assert 0 <= r.n_ivf <= K
        assert r.n_overlap <= min(r.n_exact, r.n_ivf)
        assert 0.0 <= r.recall <= 1.0


def test_quality_signal_correlation_matches_numpy(spark):
    """The moment-sum Pearson r must equal numpy's corrcoef on the same
    quantized signals (independent accumulation path)."""
    import numpy as np

    from epiteam_network_etl_functions_spark.workload.text import (
        quality_signal_correlation,
    )

    got = {
        (r.signal_a, r.signal_b): r.pearson_r
        for r in quality_signal_correlation(spark, PARITY_SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{PARITY_SF_DIR}/documents.parquet").collect()
    import math
    from collections import Counter

    xs, ys, zs = [], [], []
    for d in docs:
        t = [w for w in d.text.split(" ") if w]
        if len(t) < 2:
            continue
        xs.append(len(t))
        chars = [c for c in d.text]
        freq = Counter(chars)
        n = len(chars)
        ent = -sum((c / n) * math.log(c / n) for c in freq.values())
        ys.append(round(round(ent, 6) * 1e6))
        grams = [f"{t[i]}_{t[i+1]}" for i in range(len(t) - 1)]
        rep = 1.0 - len(set(grams)) / len(grams)
        zs.append(round(round(rep, 6) * 1e6))
    c = np.corrcoef(np.array([xs, ys, zs], dtype=np.float64))
    assert abs(got[("n_tokens", "entropy")] - c[0, 1]) < 1e-6
    assert abs(got[("n_tokens", "rep_ratio")] - c[0, 2]) < 1e-6
    assert abs(got[("entropy", "rep_ratio")] - c[1, 2]) < 1e-6


def test_regression_matches_numpy(spark):
    import numpy as np

    from epiteam_network_etl_functions_spark.workload.tpch import (
        part_size_price_regression,
    )

    row = part_size_price_regression(spark, PARITY_SF_DIR).collect()[0]
    p = spark.read.parquet(f"{PARITY_SF_DIR}/part.parquet").select(
        "p_size", "p_retailprice"
    ).collect()
    x = np.array([r.p_size for r in p], dtype=np.float64)
    y = np.array([round(r.p_retailprice * 100) for r in p], dtype=np.float64)
    slope, intercept = np.polyfit(x, y, 1)
    assert row.n_parts == len(p)
    assert abs(row.slope_per_size - slope / 100.0) < 1e-5
    assert abs(row.intercept_dollars - intercept / 100.0) < 1e-4


def test_trade_balance_reconciles_totals(spark):
    """Summed supply equals total lineitem revenue; summed demand equals
    total order value (every supplier/customer has a nation)."""
    from pyspark.sql import functions as F2

    from epiteam_network_etl_functions_spark.workload.tpch import (
        _cents,
        _revenue_col,
        _t,
        nation_trade_balance,
    )

    rows = nation_trade_balance(spark, PARITY_SF_DIR).collect()
    li = _t(spark, PARITY_SF_DIR, "lineitem")
    o = _t(spark, PARITY_SF_DIR, "orders")
    want_supply = (
        li.agg((F2.sum(_revenue_col()).cast("double") / 1e6).alias("r"))
        .collect()[0]
        .r
    )
    want_demand = (
        o.agg((F2.sum(_cents("o_totalprice")) / 100.0).alias("r"))
        .collect()[0]
        .r
    )
    assert abs(sum(r.supply_revenue for r in rows) - want_supply) < 1e-4
    assert abs(sum(r.demand_spend for r in rows) - want_demand) < 1e-4


def test_ltv_deciles_partition_customers(spark):
    from epiteam_network_etl_functions_spark.workload.tpch import (
        customer_ltv_deciles,
    )

    rows = sorted(
        customer_ltv_deciles(spark, PARITY_SF_DIR).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    total = sum(r.n_customers for r in rows)
    n_cust = (
        spark.read.parquet(f"{PARITY_SF_DIR}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert total == n_cust
    # decile value ranges are non-decreasing
    for a, b in zip(rows, rows[1:]):
        assert a.max_spend <= b.min_spend + 1e-9


def test_stickiness_bounds_and_last_day(spark):
    from epiteam_network_etl_functions_spark.workload.temporal import (
        dau_wau_stickiness,
    )

    rows = dau_wau_stickiness(spark, PARITY_SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r.dau <= r.wau
        assert 0.0 < r.stickiness <= 1.0


def test_first_touch_covers_all_users(spark):
    from epiteam_network_etl_functions_spark.workload.temporal import (
        first_touch_attribution,
    )

    rows = first_touch_attribution(spark, PARITY_SF_DIR).collect()
    n_users = (
        spark.read.parquet(f"{PARITY_SF_DIR}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r.n_users for r in rows) == n_users
    for r in rows:
        assert 0 <= r.n_converted <= r.n_users


def test_growth_curve_is_monotone_and_totals_vocab(spark):
    from epiteam_network_etl_functions_spark.workload.text import (
        _shingled,
        corpus_growth_curve,
    )

    rows = sorted(
        corpus_growth_curve(spark, PARITY_SF_DIR).collect(),
        key=lambda r: r.doc_id,
    )
    assert rows
    cum = 0
    for r in rows:
        assert r.n_new >= 1
        cum += r.n_new
        assert r.cum_vocab == cum
    vocab = _shingled(spark, PARITY_SF_DIR).select("shingle").distinct().count()
    assert cum == vocab


def test_quantization_error_small_relative(spark):
    """Int8 quantization of 64-dim unit-ish vectors has small relative
    error (each residual <= maxabs/254), and rel_err >= 0."""
    from epiteam_network_etl_functions_spark.workload.vectors import (
        vec_quantization_error,
    )

    rows = vec_quantization_error(spark, PARITY_SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.rel_err < 0.05
        assert 0.0 <= r.l2_err


def test_bridge_cells_equal_pair_join_volume(spark):
    """Counted pair_meetings must equal the materialized pair-bucket join
    volume (the skew-forecast claim), summed over cells."""
    from epiteam_network_etl_functions_spark.workload.mobility import (
        _bucketed_presence,
        bridge_cells_report,
    )

    rows = bridge_cells_report(spark, PARITY_SF_DIR).collect()
    p = _bucketed_presence(spark, PARITY_SF_DIR).distinct()
    a, b = p.alias("a"), p.alias("b")
    joined = (
        a.join(b, ["event_type", "tw"])
        .where(F.col("a.user_id") < F.col("b.user_id"))
        .count()
    )
    assert sum(r.pair_meetings for r in rows) == joined


def test_mobility_entropy_bounds(spark):
    """0 <= H <= ln(n_cells); single-cell devices score exactly 0."""
    import math

    from epiteam_network_etl_functions_spark.workload.mobility import (
        device_mobility_entropy,
    )

    rows = device_mobility_entropy(spark, PARITY_SF_DIR).collect()
    assert rows
    for r in rows:
        assert -1e-6 <= r.entropy_nats <= math.log(r.n_cells) + 1e-6
        if r.n_cells == 1:
            assert r.entropy_nats == 0.0


def test_meeting_histogram_totals_match_persistence(spark):
    from epiteam_network_etl_functions_spark.workload.mobility import (
        colocation_pair_persistence,
        meeting_count_histogram,
    )

    hist = {
        r.n_meetings: r.n_pairs
        for r in meeting_count_histogram(spark, PARITY_SF_DIR).collect()
    }
    persistent = colocation_pair_persistence(spark, PARITY_SF_DIR).count()
    assert sum(n for k, n in hist.items() if k >= 2) == persistent


def test_hourly_zscores_standardized(spark):
    """Per type: 24 rows, z-scores sum to ~0 and square-sum to ~24."""
    from collections import defaultdict

    from epiteam_network_etl_functions_spark.workload.temporal import (
        hourly_anomaly_zscore,
    )

    rows = hourly_anomaly_zscore(spark, PARITY_SF_DIR).collect()
    per_type = defaultdict(list)
    for r in rows:
        per_type[r.event_type].append(r.zscore)
    for t, zs in per_type.items():
        assert len(zs) == 24
        assert abs(sum(zs)) < 1e-3
        assert abs(sum(z * z for z in zs) - 24) < 1e-2


def test_lifecycle_covers_all_users(spark):
    from epiteam_network_etl_functions_spark.workload.temporal import (
        user_lifecycle_stages,
    )

    rows = user_lifecycle_stages(spark, PARITY_SF_DIR).collect()
    n_users = (
        spark.read.parquet(f"{PARITY_SF_DIR}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r.n_users for r in rows) == n_users


def test_winsorized_mean_between_cuts(spark):
    from epiteam_network_etl_functions_spark.workload.temporal import (
        value_winsorized_stats,
    )

    for r in value_winsorized_stats(spark, PARITY_SF_DIR).collect():
        assert r.p5 <= r.winsorized_mean <= r.p95


def test_abc_bands_partition_revenue(spark):
    from epiteam_network_etl_functions_spark.workload.tpch import (
        inventory_value_abc,
    )

    rows = {r.band: r for r in inventory_value_abc(spark, PARITY_SF_DIR).collect()}
    assert set(rows) <= {"A", "B", "C"} and "A" in rows
    total_share = sum(r.revenue_share for r in rows.values())
    assert abs(total_share - 1.0) < 1e-5
    # A-band share is at most 80% by construction (cut is <=)
    assert rows["A"].revenue_share <= 0.80 + 1e-9


def test_herfindahl_bounds(spark):
    from epiteam_network_etl_functions_spark.workload.tpch import (
        supplier_herfindahl,
    )

    for r in supplier_herfindahl(spark, PARITY_SF_DIR).collect():
        assert 1.0 / r.n_suppliers - 1e-6 <= r.hhi <= 1.0 + 1e-9


def test_pareto_share_bounds(spark):
    from epiteam_network_etl_functions_spark.workload.tpch import (
        customer_nation_pareto,
    )

    for r in customer_nation_pareto(spark, PARITY_SF_DIR).collect():
        assert 0.0 <= r.top20_share <= 1.0
        assert r.top20_spend <= r.total_spend + 1e-9


def test_token_budget_packed_lower_bound(spark):
    from epiteam_network_etl_functions_spark.workload.text import (
        corpus_token_budget_planner,
    )

    for r in corpus_token_budget_planner(spark, PARITY_SF_DIR).collect():
        assert r.packed_seqs <= r.naive_seqs
        assert 0.0 <= r.naive_padding_waste < 1.0


def test_benford_frequencies_sum_to_one(spark):
    import math

    from epiteam_network_etl_functions_spark.workload.temporal import (
        value_first_digit_benford,
    )

    rows = value_first_digit_benford(spark, PARITY_SF_DIR).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.observed_freq for r in rows) - 1.0) < 1e-3
    for r in rows:
        want = round(math.log(1 + 1 / r.digit) / math.log(10), 6)
        assert abs(r.benford_freq - want) < 1e-9


def test_interpurchase_gaps_ordered_quantiles(spark):
    from epiteam_network_etl_functions_spark.workload.temporal import (
        purchase_interpurchase_gaps,
    )

    r = purchase_interpurchase_gaps(spark, PARITY_SF_DIR).collect()[0]
    assert r.n_gaps >= r.n_repeat_buyers >= 1
    assert 0 <= r.median_gap_h <= r.p90_gap_h


def test_vocab_overlap_symmetric_bounds(spark):
    from epiteam_network_etl_functions_spark.workload.text import (
        source_vocab_overlap,
    )

    rows = source_vocab_overlap(spark, PARITY_SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.source_a < r.source_b
        assert r.n_shared >= 1
        assert 0.0 < r.jaccard <= 1.0


def test_dim_variance_matches_numpy(spark):
    import numpy as np

    from epiteam_network_etl_functions_spark.workload.vectors import (
        embedding_dim_variance,
    )

    rows = embedding_dim_variance(spark, PARITY_SF_DIR).collect()
    assert len(rows) == 16
    emb = np.array(
        [
            [round(float(x) * 1e6) for x in r.embedding]
            for r in spark.read.parquet(
                f"{PARITY_SF_DIR}/embeddings.parquet"
            ).collect()
        ],
        dtype=np.float64,
    )
    var = emb.var(axis=0) / 1e12
    order = sorted(
        range(emb.shape[1]), key=lambda i: (-round(var[i], 6), i)
    )[:16]
    assert [r.pos for r in rows] == [i + 1 for i in order]
    for r in rows:
        assert abs(r.variance - var[r.pos - 1]) < 1e-5


def test_order_value_lines_covers_all_orders(spark):
    from epiteam_network_etl_functions_spark.workload.tpch import (
        order_value_vs_lines,
    )

    rows = order_value_vs_lines(spark, PARITY_SF_DIR).collect()
    li = spark.read.parquet(f"{PARITY_SF_DIR}/lineitem.parquet")
    n_orders = li.select("l_orderkey").distinct().count()
    assert sum(r.n_orders for r in rows) == n_orders
    for r in rows:
        assert r.min_value <= r.avg_value <= r.max_value
