"""Central query registry.

Each entry pairs a Spark DataFrame builder with an equivalent ANSI-SQL
oracle string (runnable by DuckDB on the same parquet tables). The driver's
correctness gate compares the two at sf=0.01 — row count, schema, and an
order-insensitive value hash — so:

- every computed column is aliased identically in builder and oracle;
- every LIMIT query is fully deterministic (ORDER BY includes a unique
  tie-breaker key);
- floating-point aggregates are rounded identically on both sides so the
  hash does not depend on summation order.
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
# operator, so the iteration order is pinned here instead: the full
# reference-parity surface first, then a representative cross-section of
# every extension family. Everything else follows in registration order.
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
    # deduplication (families: exact, shingle-Jaccard, MinHash-LSH,
    # SimHash, embedding, clustering, segment)
    "dd_exact_stats",
    "dd_ngram_jaccard",
    "dd_minhash_lsh",
    "dd_simhash_pairs",
    "dd_containment",
    "dd_embedding_lsh_pairs",
    "dd_cluster_components",
    "dd_segment_dup",
    # similarity search + clustering
    "ss_ivf_topk",
    "ss_lsh_topk",
    "ss_kmeans",
    "ss_semantic_dedup",
    # text analysis + pipeline
    "tx_lang_id",
    "tx_quality_score",
    "tx_tfidf_top_terms",
    "tx_filter_pipeline",
    # streaming (AvailableNow replay ≡ batch oracle)
    "st_tumbling_hourly",
    "st_session_30m",
    # window functions
    "wf_topn_per_group",
    "wf_range_frame",
    # as-of / range join / rollup / gap-fill / skew / graph
    "aj_purchase_last_click",
    "rj_price_tier_bucketed",
    "rj_interval_overlap",
    "ht_rollup_multigrain",
    "ht_gap_fill",
    "sk_salted_join",
    "gr_pagerank",
    # multimodal (deterministic decode pipeline, oracled)
    "mm_decode_pipeline",
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
