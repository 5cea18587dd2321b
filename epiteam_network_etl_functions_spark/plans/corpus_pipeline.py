"""The LLM-corpus preparation pipeline as one composition.

Mirrors plans/full_pipeline.py (and the reference's own staged driver,
NetworkBuilder.py:264-284) for the training-data side of the engine:

    raw corpus -> quality gates (Gopher-family rules)
               -> exact dedup (md5 keeper)
               -> fuzzy dedup (PPJoin pairs -> connected components -> keeper)
               -> benchmark decontamination (shingle overlap)
               -> sequence packing (token-budget bins)
               -> JSONL shard export

Every stage is an already-certified kernel (operators/text.py,
operators/dedup.py, operators/components.py); this module is the
orchestrating composition plus the per-stage funnel report
(``corpus_funnel``) that the ``corpus_funnel`` workload query certifies
end-to-end against a DuckDB oracle.

Scale notes (the 100 TB shape): the quality gates are map-only and fuse
with the scan; exact dedup is one digest groupBy; the fuzzy stage is the
prefix-filtered PPJoin (never all-pairs) plus O(diameter) component
rounds over near-dup cliques; decontamination broadcasts only the
benchmark shingle set (eval suites are tiny by construction); packing is
per-shard-parallel (see doc_pack_bins); the export is a size-uniform
round-robin shard write. No stage holds data-sized driver state.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..operators.components import connected_components
from ..operators.dedup import jaccard_verify, prefix_filter_candidates
from ..operators.text import (
    bigram_repetition_ratio,
    char_entropy_nats,
    explode_shingles,
    tokens_col,
)


@dataclass(frozen=True)
class CorpusConfig:
    """Gate thresholds + dedup/packing parameters (one knob object, the
    analog of full_pipeline.PipelineConfig)."""

    min_tokens: int = 15
    max_rep_ratio: float = 0.10
    min_entropy: float = 2.7
    shingle_k: int = 3
    jaccard_threshold: float = 0.3
    contam_min_shared: int = 2
    pack_budget: int = 512


# ---- stages -----------------------------------------------------------------


def gate_quality(
    docs: DataFrame,
    cfg: CorpusConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-family quality gate: token-count floor, bigram-repetition
    ceiling, char-entropy floor. All three are per-row JVM array
    arithmetic (operators/text kernels) — map-only, fuses with the scan.

    Scan fan-out (the tfidf_top_terms rule, with a twist): the per-row
    entropy/bigram work expands far beyond the compressed bytes, so a
    corpus that is a handful of parquet splits runs this gate on as many
    tasks. A bare repartition() does NOT fix it — Catalyst pushes the
    deterministic gate predicates through the exchange down to the
    narrow scan stage (measured: 115 s either way at the 10x tier, where
    one 5.8 MB file gave 2 splits on 32 cores, vs ~6 s once the work
    actually lands on 32 tasks). The barrier must be hard: when the
    input's split count is far below the cluster parallelism, the
    repartitioned raw docs are localCheckpointed (an RDD boundary no
    filter can sink below) and the gate evaluates on the fanned-out
    copy — measured 115 s -> 8 s. The checkpoint is LAZY
    (eager=False): nothing materializes unless the caller actually
    executes the gated result, and repeated plan-building invocations
    don't pin executor storage. Fault-tolerance trade-off, accepted:
    localCheckpoint truncates lineage, so an executor loss after
    materialization fails the job instead of recomputing — fine in
    local mode and for the small-split case this branch guards; at
    production scale the input has thousands of splits so neither the
    shuffle nor the checkpoint ever happens."""
    sc = docs.sparkSession.sparkContext
    if docs.rdd.getNumPartitions() * 4 <= sc.defaultParallelism:
        docs = docs.repartition(sc.defaultParallelism).localCheckpoint(
            eager=False
        )
    toks = tokens_col(text_col)
    rep = bigram_repetition_ratio(toks)
    ent = char_entropy_nats(F.col(text_col))
    return docs.where(
        (F.size(toks) >= cfg.min_tokens)
        & (F.coalesce(rep, F.lit(0.0)) <= cfg.max_rep_ratio)
        & (ent >= cfg.min_entropy)
    )


def dedup_exact(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep the min-id copy of each byte-identical text: one digest groupBy
    (narrow keys), then a semi-join back to the full rows."""
    keepers = (
        docs.select(
            F.md5(F.col(text_col).cast("binary")).alias("__h"), F.col(id_col)
        )
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return docs.join(keepers, id_col, "left_semi")


def dedup_fuzzy(
    docs: DataFrame,
    cfg: CorpusConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Transitive-closure fuzzy dedup: PPJoin candidate pairs (exact, zero
    false negatives) -> Jaccard verify -> connected components -> keep the
    min-id doc per component; docs in no near-dup pair keep themselves.
    Same kernel chain as the certified fuzzy_dedup_components query."""
    shingled = explode_shingles(docs, id_col, text_col, k=cfg.shingle_k).cache()
    cands = prefix_filter_candidates(
        shingled, id_col, threshold=cfg.jaccard_threshold
    ).cache()
    pairs = jaccard_verify(
        cands, shingled, id_col, threshold=cfg.jaccard_threshold
    ).select("a_id", "b_id")
    comp = connected_components(pairs, "a_id", "b_id")
    # connected_components localCheckpoints eagerly; release the inputs.
    shingled.unpersist()
    cands.unpersist()
    losers = comp.where(F.col("node_id") != F.col("component_id")).select(
        F.col("node_id").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    cfg: CorpusConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop corpus docs sharing >= ``contam_min_shared`` distinct k-gram
    shingles with the benchmark set. The benchmark shingle set broadcasts
    (eval suites are tiny); the corpus side is one linear shingle pass."""
    sh = explode_shingles(docs, id_col, text_col, k=cfg.shingle_k)
    bsh = explode_shingles(bench, id_col, text_col, k=cfg.shingle_k).select(
        "shingle"
    ).distinct()
    contaminated = (
        sh.join(F.broadcast(bsh), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("__n_shared"))
        .where(F.col("__n_shared") >= cfg.contam_min_shared)
        .select(id_col)
    )
    return docs.join(contaminated, id_col, "left_anti")


def pack_bins(
    docs: DataFrame,
    cfg: CorpusConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Contiguous-fill sequence packing in id order (same kernel as the
    certified doc_pack_bins query): bin = floor(preceding-cumulative-tokens
    / budget). Global window here; partition by shard for the 100 TB run."""
    from pyspark.sql import Window

    n_tokens = F.size(tokens_col(text_col))
    w = Window.orderBy(F.asc(id_col)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return docs.select(F.col(id_col), n_tokens.alias("n_tokens")).select(
        id_col,
        "n_tokens",
        ((F.sum("n_tokens").over(w) - F.col("n_tokens")) / cfg.pack_budget)
        .cast("bigint")
        .alias("bin_id"),
    )


# ---- composition ------------------------------------------------------------


@dataclass
class CorpusResult:
    gated: DataFrame
    exact_kept: DataFrame
    fuzzy_kept: DataFrame
    decontaminated: DataFrame
    packed: DataFrame


STAGES = ("raw", "quality_gate", "exact_dedup", "fuzzy_dedup", "decontaminate")


def run_corpus_pipeline(
    docs: DataFrame,
    bench: DataFrame,
    cfg: CorpusConfig | None = None,
    out_dir: str | None = None,
    shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    materialize: bool = False,
) -> CorpusResult:
    """The full composition. When ``out_dir`` is given, the surviving
    documents are exported as size-uniform JSONL shards (sources/io).

    ``materialize=True`` localCheckpoints each stage boundary — the
    reference's materialized-stage-IR discipline (every stage writes
    parquet before the next reads it). Use it when several consumers
    read the stage frames (the funnel report taps counts off every
    boundary; without it each consumer replays the whole upstream
    chain). At production scale swap localCheckpoint for a parquet
    write per stage — same plan shape, restartable."""
    cfg = cfg or CorpusConfig()
    mat = (lambda df: df.localCheckpoint()) if materialize else (lambda df: df)
    gated = mat(gate_quality(docs, cfg, id_col, text_col))
    exact = mat(dedup_exact(gated, id_col, text_col))
    fuzzy = mat(dedup_fuzzy(exact, cfg, id_col, text_col))
    clean = mat(decontaminate(fuzzy, bench, cfg, id_col, text_col))
    packed = pack_bins(clean, cfg, id_col, text_col)
    if out_dir is not None:
        from ..sources.io import write_jsonl_shards

        # The export consumes `clean` twice (shard-count job + write);
        # cache across those two actions only, then release — the result
        # frames stay lazy/uncached (no session-pinned storage).
        export_df = clean.cache()
        n = export_df.count()
        write_jsonl_shards(
            export_df, out_dir, records_per_shard=max(1, -(-n // shards))
        )
        export_df.unpersist(blocking=False)
    return CorpusResult(gated, exact, fuzzy, clean, packed)


def corpus_funnel(
    docs: DataFrame,
    bench: DataFrame,
    cfg: CorpusConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-stage survival report (stage_id, stage, docs_in, docs_out) — the
    dedup-rate audit every corpus build publishes. One scalar count per
    stage unioned, then a lag window fills docs_in from the previous row;
    all counts are exact BIGINTs, the stage_id is the unique sort key."""
    from pyspark.sql import Window

    cfg = cfg or CorpusConfig()
    res = run_corpus_pipeline(
        docs, bench, cfg, id_col=id_col, text_col=text_col, materialize=True
    )
    frames = (
        docs,
        res.gated,
        res.exact_kept,
        res.fuzzy_kept,
        res.decontaminated,
    )
    counts = None
    for i, (name, frame) in enumerate(zip(STAGES, frames)):
        row = frame.agg(F.count(F.lit(1)).alias("docs_out")).select(
            F.lit(i).cast("int").alias("stage_id"),
            F.lit(name).alias("stage"),
            F.col("docs_out"),
        )
        counts = row if counts is None else counts.unionByName(row)
    w = Window.orderBy("stage_id")
    return counts.select(
        "stage_id",
        "stage",
        F.coalesce(F.lag("docs_out").over(w), F.col("docs_out")).alias(
            "docs_in"
        ),
        "docs_out",
    )
