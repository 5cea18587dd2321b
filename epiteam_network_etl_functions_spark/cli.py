"""Staged CLI driver — the reference's primary user surface re-expressed.

The reference is driven as ``python NetworkBuilder.py 2020-02-04
--gen_tables --prob_matrix --build_network --scale 10000 --iterative 99``
(NetworkBuilder.py:483-546, click flags) plus a SimulationManager seed
sweep (SimulationManager.py:227-371). This module is the same workflow
over the Spark plans:

    python -m epiteam_network_etl_functions_spark.cli 2024-03-02 \\
        --sf-dir /root/testdata/sf0.001 --out /tmp/run \\
        --gen-tables --prob-matrix --build-network --scale 500 \\
        --seir --seeds 8

Stages are restartable exactly like the reference's ``side_results/``
pattern: each stage writes parquet/npy/GraphML into ``--out`` and later
stages re-read those files when run in a separate invocation
(NetworkBuilder.py:264-284 stage graph; the IR between stages is files).

Input is either a real pings parquet (``--pings`` with columns caid,
cdmx_datetime, latitude, longitude, horizontal_accuracy, plus ``--dim``
with (cell, cve_geo)) or ``--sf-dir`` demo mode, which derives a
pings-shaped table from the synthetic events fixture the same way the
oracle-checked pings workload does.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import DataFrame, SparkSession, functions as F

from .constants import SENTINEL_AGEB_13
from .operators.colocation import colocation_edges, colocation_pairs
from .operators.components import connected_components_star
from .operators.contacts import group_sizes
from .operators.graphs import (
    sample_nodes,
    sample_nodes_distributed,
    sbm_edges,
    sbm_edges_binomial,
    scale_sizes,
    write_graphml,
)
from .operators.seir import run_gillespie_sweep, trajectory_stats
from .operators.timebucket import with_time_bucket
from .plans.contact_matrix import contact_prob_table, probs_to_matrix
from .plans.mobility import (
    attach_home,
    daily_home_winners,
    extract_day,
    impute_neighbour_frequency_labels,
    locate_pings,
    night_presence_scores,
    with_cells,
)
from .session import get_session
from .sources.io import write_matrix_npy, write_pickle


def _load_inputs(
    spark: SparkSession, args: argparse.Namespace
) -> tuple[DataFrame, DataFrame, object]:
    """(pings, cell->region dim, cell expression) from --pings/--dim or
    --sf-dir demo derivation."""
    if args.pings:
        if not args.dim:
            sys.exit("--pings requires --dim (a (cell, cve_geo) parquet)")
        return spark.read.parquet(args.pings), spark.read.parquet(args.dim), None
    from .workload.pings import _cell_expr, _dim, _pings

    return (
        _pings(spark, args.sf_dir),
        _dim(spark, args.sf_dir),
        _cell_expr(),
    )


def _out(args: argparse.Namespace, name: str) -> str:
    return os.path.join(args.out, name)


def _read_or(spark: SparkSession, path: str, compute, what: str) -> DataFrame:
    """Stage IR: prefer the parquet a previous invocation left behind."""
    if os.path.exists(path):
        print(f"# {what}: reusing {path}", file=sys.stderr)
        return spark.read.parquet(path)
    return compute()


def gen_tables(spark, args) -> dict[str, DataFrame]:
    """Stage 1 (NetworkBuilder.get_tables): located pings -> homes ->
    interactions; writes homes/interactions/located parquet."""
    pings, dim, cell_expr = _load_inputs(spark, args)
    if args.day == "all":
        # multi-day run (S3 trusted-range shape): accuracy gate only
        sliced = pings.where(F.col("horizontal_accuracy") >= args.min_accuracy)
    else:
        sliced = extract_day(pings, args.day, min_accuracy=args.min_accuracy)
    day = with_cells(sliced, out_col="h3index_15", cell_expr=cell_expr)
    located = locate_pings(day, dim).cache()
    scores = night_presence_scores(located, bucket_seconds=args.bucket_seconds)
    winners = daily_home_winners(scores)
    homes = (
        locate_pings(winners.withColumnRenamed("home_cell", "h3index_15"), dim)
        .withColumn("home_ageb", F.coalesce(F.col("cve_geo"), F.lit(SENTINEL_AGEB_13)))
        .select("caid", "home_ageb", "score", "confidence")
    )
    bucketed = with_time_bucket(
        attach_home(located, homes.select("caid", "home_ageb")),
        "cdmx_datetime",
        args.bucket_seconds,
    )
    interactions = colocation_edges(
        bucketed, id_col="caid", cell_col="h3index_15", tw_col="tw"
    )
    if args.impute_rounds > 0:
        comp = connected_components_star(interactions, a_col="a_caid", b_col="b_caid")
        # long-label form: no component has to fit in a row (the arrays
        # form is kept for the reference-parity workload query)
        homes = impute_neighbour_frequency_labels(
            homes, comp, rounds=args.impute_rounds
        )
    if args.quality_gate:
        # Declarative stage gate (the reference's logged sanity counts,
        # SURVEY.md §5, as enforced invariants): one agg pass per table.
        from .operators.quality import assert_rules, matches, not_null, unique

        assert_rules(homes, [unique("caid"), not_null("home_ageb"),
                             matches("home_ageb", "^[0-9]{13}$")])
        assert_rules(interactions, [not_null("a_caid"), not_null("b_caid")])
        print("# gen-tables: quality gate passed (homes unique/13-char, "
              "interactions non-null)", file=sys.stderr)
    homes.write.mode("overwrite").parquet(_out(args, "homes.parquet"))
    interactions.write.mode("overwrite").parquet(_out(args, "interactions.parquet"))
    located.write.mode("overwrite").parquet(_out(args, "located.parquet"))
    print(f"# gen-tables: wrote homes/interactions/located under {args.out}",
          file=sys.stderr)
    return {"located": located, "homes": homes, "interactions": interactions}


def prob_matrix(spark, args, tables: dict | None) -> DataFrame:
    """Stage 2 (get_total_vs_observed + get_probs_matrix): long probs table
    + dense .npy matrix."""
    if tables:
        located, homes = tables["located"], tables["homes"]
    else:
        homes = _read_or(spark, _out(args, "homes.parquet"), lambda: None, "homes")
        located = _read_or(spark, _out(args, "located.parquet"), lambda: None, "located")
        if homes is None or located is None:
            sys.exit("prob-matrix needs gen-tables outputs (run --gen-tables first)")
    # contact_prob_table attaches homes itself (via observed_contacts); a
    # pre-join here would be a pure wasted shuffle of the located facts.
    probs = contact_prob_table(
        located,
        homes.select("caid", "home_ageb"),
        bucket_seconds=args.bucket_seconds,
    )
    probs.write.mode("overwrite").parquet(_out(args, "contact_probs.parquet"))
    labels, matrix = probs_to_matrix(probs, "a_home_ageb", "b_home_ageb")
    write_matrix_npy(_out(args, "probs_matrix.npy"), matrix)
    with open(_out(args, "probs_labels.json"), "w") as f:
        json.dump(labels, f)
    print(f"# prob-matrix: {len(labels)}x{len(labels)} matrix", file=sys.stderr)
    return probs


def build_network(spark, args, tables: dict | None, probs: DataFrame | None):
    """Stage 3 (build_network): scale block sizes, SBM edge sampling,
    GraphML export."""
    homes = (
        tables["homes"]
        if tables
        else spark.read.parquet(_out(args, "homes.parquet"))
    )
    if probs is None:
        probs = spark.read.parquet(_out(args, "contact_probs.parquet"))
    sizes = {
        r["home_ageb"]: r["size"]
        for r in group_sizes(homes, block_col="home_ageb", id_col="caid").collect()
    }
    scaled = scale_sizes(sizes, max(args.scale, len(sizes)))
    prob_table = probs.selectExpr(
        "a_home_ageb AS a_block", "b_home_ageb AS b_block", "prob"
    )
    if sum(scaled.values()) > 50_000:
        # beyond the n² candidate-join regime: distributed node table +
        # binomial per-chunk counts — identical layout and edge
        # distribution, output-sized work, O(n_blocks) driver state
        nodes = sample_nodes_distributed(scaled, spark)
        edges = sbm_edges_binomial(scaled, prob_table, spark, seed=args.seed)
    else:
        nodes = sample_nodes(scaled, spark)
        edges = sbm_edges(nodes, prob_table, seed=args.seed)
    edges.write.mode("overwrite").parquet(_out(args, "network_edges.parquet"))
    nodes.write.mode("overwrite").parquet(_out(args, "network_nodes.parquet"))
    # Downstream consumers read the materialized IR back — the SBM cross
    # join must run once, not once per consumer (side_results semantics).
    edges = spark.read.parquet(_out(args, "network_edges.parquet"))
    nodes = spark.read.parquet(_out(args, "network_nodes.parquet"))
    n_edges = edges.count()
    if n_edges <= args.graphml_max_edges:
        stats = write_graphml(
            _out(args, "network.graphml"),
            edges,
            nodes=nodes,
            id_col="node_id",
            attr_cols=["block"],
        )
        print(f"# build-network: {stats['nodes']} nodes / {stats['edges']} edges",
              file=sys.stderr)
    else:
        # GraphML is one driver-streamed XML document; at tens of millions
        # of edges that is GBs of text and minutes of wall. The parquet IR
        # above is the scale artifact — consumers join it directly.
        print(
            f"# build-network: {nodes.count()} nodes / {n_edges} edges — "
            f"skipping GraphML (> --graphml-max-edges="
            f"{args.graphml_max_edges}); network_edges.parquet is the IR",
            file=sys.stderr,
        )
    return nodes, edges


def seir_sweep(spark, args, nodes: DataFrame | None, edges: DataFrame | None):
    """Stage 4 (SimulationManager seed sweep): one continuous-time Gillespie
    run per seed, fanned out with parallelize; CSV trajectories + per-t
    stats + pickled results, matching seir_utils.py:84-140 /
    SimulationManager.py:239-240 output shapes.

    Above --seir-max-collect-edges the edge list no longer fits a driver
    collect (the reference's own regime never exceeds ~10⁴ nodes); the
    sweep switches to the distributed discrete-time kernel
    (plans/seir_distributed), one cluster-parallel run per seed, with
    rates converted to per-step probabilities p = 1 - exp(-rate)
    (divergence quantified in DETERMINISM.md §8)."""
    if nodes is None:
        nodes = spark.read.parquet(_out(args, "network_nodes.parquet"))
        edges = spark.read.parquet(_out(args, "network_edges.parquet"))
    n_nodes = nodes.count()
    n_edges = edges.count()
    if n_edges > args.seir_max_collect_edges:
        import math
        from functools import reduce

        from .plans.seir_distributed import distributed_seir

        bp = 1.0 - math.exp(-args.beta)
        sp = 1.0 - math.exp(-args.sigma)
        gp = 1.0 - math.exp(-args.gamma)
        runs = [
            distributed_seir(
                spark, nodes, edges,
                beta=bp, sigma=sp, gamma=gp, seed=s,
                t_max=int(args.t_max),
                initial_infected=args.initial_infected,
            ).select(
                F.lit(s).alias("seed"),
                F.col("t").cast("double").alias("t"),
                "S", "E", "I", "R",
            )
            for s in range(args.seeds)
        ]
        traj = reduce(lambda a, b: a.unionByName(b), runs).cache()
        print(f"# seir: distributed discrete-time kernel ({n_edges} edges "
              f"> --seir-max-collect-edges={args.seir_max_collect_edges})",
              file=sys.stderr)
    else:
        edge_list = [
            (r["a_node"], r["b_node"])
            for r in edges.select("a_node", "b_node").collect()
        ]
        traj = run_gillespie_sweep(
            spark,
            n_nodes,
            edge_list,
            seeds=list(range(args.seeds)),
            weighted=True,
            beta=args.beta,
            sigma=args.sigma,
            gamma=args.gamma,
            t_max=args.t_max,
            initial_infected=args.initial_infected,
        ).cache()
    traj.toPandas().to_csv(_out(args, "seir_trajectories.csv"), index=False)
    trajectory_stats(traj).toPandas().to_csv(
        _out(args, "seir_stats.csv"), index=False
    )
    write_pickle(
        _out(args, "seir_results.pickle"),
        {"n_nodes": n_nodes, "n_edges": n_edges, "seeds": args.seeds},
    )
    print(f"# seir: {args.seeds} seeds over {n_nodes} nodes", file=sys.stderr)


def rg_stage(spark, args, tables: dict | None) -> None:
    """Radius-of-gyration stage (RadiusOfGyrationHandler.py:134-279 +
    RGAggregatorByMun.py:75-104): per-device grid-hop RG over located
    pings, then the municipal AVG/STDDEV rollup keyed by the home code's
    5-char municipality prefix."""
    from .plans.gyration import device_rg, rg_rollup

    if tables:
        located, homes = tables["located"], tables["homes"]
    else:
        located = spark.read.parquet(_out(args, "located.parquet"))
        homes = spark.read.parquet(_out(args, "homes.parquet"))
    rgs = device_rg(located, id_col="caid", cell_col="h3index_15")
    rgs.write.mode("overwrite").parquet(_out(args, "device_rg.parquet"))
    # Devices whose home stayed the 13-char sentinel (unlocatable /
    # imputation miss) must not roll up into a phantom "00000" municipality
    # — the reference rollup keys on real cve_mun membership.
    membership = homes.where(F.col("home_ageb") != SENTINEL_AGEB_13).select(
        "caid", F.substring("home_ageb", 1, 5).alias("cve_mun")
    )
    rg_rollup(rgs, membership).toPandas().to_csv(
        _out(args, "rg_by_mun.csv"), index=False
    )
    print("# rg: device_rg.parquet + rg_by_mun.csv", file=sys.stderr)


def corpus_stage(spark, args) -> None:
    """LLM-corpus preparation stage (plans/corpus_pipeline): quality gates
    -> exact dedup -> fuzzy dedup -> decontamination -> packing -> JSONL
    shards, plus the per-stage funnel report — the training-data product
    the engine adds beyond the reference's mobility arc. Documents below
    --bench-max-id stand in for the benchmark/eval set (the same split
    convention the certified corpus_funnel query uses)."""
    from . import catalog
    from .plans.corpus_pipeline import (
        CorpusConfig,
        corpus_funnel,
        run_corpus_pipeline,
    )

    docs = catalog.load(spark, args.sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") >= args.bench_max_id)
    bench = docs.where(F.col("doc_id") < args.bench_max_id)
    cfg = CorpusConfig()
    res = run_corpus_pipeline(
        corpus,
        bench,
        cfg,
        out_dir=_out(args, "corpus_shards"),
        shards=args.corpus_shards,
        materialize=True,
    )
    res.packed.write.mode("overwrite").parquet(_out(args, "corpus_packed.parquet"))
    corpus_funnel(corpus, bench, cfg).toPandas().to_csv(
        _out(args, "corpus_funnel.csv"), index=False
    )
    print(
        "# corpus: corpus_shards/ + corpus_packed.parquet + corpus_funnel.csv",
        file=sys.stderr,
    )


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="epiteam-etl-spark",
        description="Staged mobility->network->SEIR pipeline driver",
    )
    p.add_argument(
        "day",
        help="day slice YYYY-MM-DD, or 'all' for a multi-day run. The "
        "synthetic demo data is deliberately sparse per (cell, 10-min "
        "bucket); for a live demo network use: all --bucket-seconds 86400",
    )
    src = p.add_argument_group("input")
    src.add_argument("--pings", help="pings parquet path")
    src.add_argument("--dim", help="(cell, cve_geo) dimension parquet path")
    src.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"),
        help="testdata dir for demo-mode derived pings (default sf0.001)",
    )
    p.add_argument("--out", required=True, help="output dir (stage IR lives here)")
    st = p.add_argument_group("stages")
    st.add_argument("--gen-tables", action="store_true")
    st.add_argument("--prob-matrix", action="store_true")
    st.add_argument("--build-network", action="store_true")
    st.add_argument("--seir", action="store_true")
    st.add_argument("--rg", action="store_true",
                    help="radius-of-gyration + municipal rollup stage")
    st.add_argument("--corpus", action="store_true",
                    help="LLM-corpus preparation stage (gates -> dedup -> "
                         "decontaminate -> pack -> JSONL shards + funnel)")
    p.add_argument("--bench-max-id", type=int, default=20,
                   help="documents below this doc_id form the benchmark "
                        "set for decontamination")
    p.add_argument("--corpus-shards", type=int, default=8)
    p.add_argument("--min-accuracy", type=float, default=100.0)
    p.add_argument("--quality-gate", action="store_true",
                   help="enforce stage invariants (operators/quality) "
                        "before writing gen-tables IR")
    p.add_argument("--bucket-seconds", type=int, default=600)
    p.add_argument("--impute-rounds", type=int, default=6)
    p.add_argument("--scale", type=int, default=1000, help="network node count")
    p.add_argument(
        "--graphml-max-edges", type=int, default=5_000_000,
        help="skip the driver-streamed GraphML sink above this edge count "
        "(the parquet IR is always written)",
    )
    p.add_argument(
        "--seir-max-collect-edges", type=int, default=2_000_000,
        help="above this edge count the SEIR sweep switches from the "
        "driver-collected Gillespie fan-out to the distributed "
        "discrete-time kernel (p = 1 - exp(-rate))",
    )
    p.add_argument("--seed", type=int, default=3696)
    p.add_argument("--seeds", type=int, default=10, help="SEIR seed-sweep width")
    p.add_argument("--beta", type=float, default=0.3, help="S->E transmission rate")
    p.add_argument("--sigma", type=float, default=0.4, help="E->I rate")
    p.add_argument("--gamma", type=float, default=0.2, help="I->R rate")
    p.add_argument("--t-max", type=float, default=60.0)
    p.add_argument(
        "--initial-infected", type=int, default=5,
        help="index cases (lowest node ids; node 0 alone can be isolated)",
    )
    return p


def main(argv: list[str] | None = None) -> None:
    args = build_parser().parse_args(argv)
    if not (args.gen_tables or args.prob_matrix or args.build_network
            or args.seir or args.rg or args.corpus):
        sys.exit("nothing to do: pass at least one of --gen-tables --prob-matrix "
                 "--build-network --seir --rg --corpus")
    os.makedirs(args.out, exist_ok=True)
    spark = get_session("epiteam-etl-spark-cli")
    tables = gen_tables(spark, args) if args.gen_tables else None
    probs = prob_matrix(spark, args, tables) if args.prob_matrix else None
    nodes = edges = None
    if args.build_network:
        nodes, edges = build_network(spark, args, tables, probs)
    if args.seir:
        seir_sweep(spark, args, nodes, edges)
    if args.rg:
        rg_stage(spark, args, tables)
    if args.corpus:
        corpus_stage(spark, args)
    spark.stop()


if __name__ == "__main__":
    main()
