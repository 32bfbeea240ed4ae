"""Count-min-sketch heavy hitters with exact verification.

Cormode & Muthukrishnan's count-min sketch (J. Algorithms 2005) as a pure
Catalyst aggregation, plus the per-partition candidate lemma that makes
distributed heavy-hitters exact without ever shuffling the vocabulary.

Why this matters at 100 TB: the φ-heavy-hitters question ("every token in
>= φ of all token positions") naively groupBys the FULL token cardinality —
billions of distinct tokens for a web corpus, so every map task spills its
whole local vocabulary into the shuffle. This plan's shuffles are bounded
independently of vocabulary size:

1. **candidates** — per-partition local φ-heavy-hitters via one
   ``mapInPandas`` pass (a Counter per partition, emitting <= 1/φ tokens
   per partition). Lemma: if a token is a local φ-HH in NO partition, then
   count(t) = Σ_p c_p(t) < Σ_p φ·n_p = φ·N — so every global heavy hitter
   IS a local one somewhere, and the union is a lossless superset.
2. **sketch build** — one groupBy over D seeded (row, bucket) keys; map-side
   partial aggregation caps every map task's shuffle output at D·W = 2048
   counter rows no matter how many distinct tokens it saw. This bounded
   map output is the CMS property the naive groupBy lacks.
3. **prune** — candidates probe their D buckets (broadcast of the 2048-row
   sketch); estimate = min over rows. CMS never under-counts, so the
   estimate filter keeps every true heavy hitter (no false negatives) and
   discards most local-only impostors before the exact count.
4. **verify** — exact counts restricted to the surviving candidates
   (broadcast semi-join onto the token stream): the shuffle carries only
   candidate-token groups.

Every stage is a lossless-superset reduction, so the final output is
EXACTLY the true heavy-hitter set — which is what the DuckDB oracle
computes directly. Same prune-then-verify structure as the MinHash and
winnowing dedup paths (operators/dedup.py, operators/substring.py).

The final output is partitioning-independent (any superset of the truth
entering the verify stage yields the same verified result), so the oracle
comparison is deterministic even though stage 1's intermediate candidate
set depends on physical partitioning.

Reference scope: the reference app has no sketches; LLM-pipeline
extension per SURVEY.md.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..functions import text as T
from ..queries.registry import register
from ..session import ensure_analytics_conf

CMS_DEPTH = 4  # independent hash rows; P(all rows collide high) decays as 2^-D
CMS_WIDTH = 512  # buckets per row; expected overestimate <= N/W per row
HH_PHI = 0.01  # heavy hitter = token with count >= phi * total_tokens


def _local_phi_candidates(batches: Iterator) -> Iterator:
    """mapInPandas kernel: local φ-heavy-hitters of one partition.

    Vectorized: per-batch value_counts (C speed) merged by a groupby-sum
    — the former per-token Python dict loop was the partition's dominant
    cost. Counts are exact integers, so the merge order cannot change
    the result."""
    import pandas as pd

    parts = []
    n = 0
    for pdf in batches:
        if len(pdf):
            parts.append(pdf["token"].value_counts())
            n += len(pdf)
    if parts:
        counts = (
            pd.concat(parts).groupby(level=0).sum() if len(parts) > 1 else parts[0]
        )
        keep = counts[counts >= HH_PHI * n].index.to_list()
    else:
        keep = []
    yield pd.DataFrame({"token": keep})


@register(
    "tx_heavy_hitters_cms",
    oracle=f"""
    WITH tok AS (
        SELECT t.tok FROM documents,
            LATERAL unnest(regexp_split_to_array(trim(text), '\\s+')) t(tok)
        WHERE length(t.tok) > 0
    ),
    total AS (SELECT COUNT(*) AS n FROM tok)
    SELECT tok AS token, COUNT(*) AS cnt
    FROM tok
    GROUP BY tok
    HAVING COUNT(*) >= {HH_PHI} * (SELECT n FROM total)
    ORDER BY token
    """,
    tags=("sketch", "text", "heavy-hitters"),
)
def tx_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens in >= 1% of all token positions: CMS prune + exact verify."""
    ensure_analytics_conf(spark)
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select(F.explode(T.tokens("text")).alias("token"))
        .filter(F.length("token") > 0)
        # lazy: all four consumers (candidates, sketch, total, verify) are
        # subtrees of the single final action, which materializes the
        # token blocks once and shares them — eager added a separate
        # materialization job for no reuse the final job doesn't get
        .localCheckpoint(eager=False)
    )
    total = tok.agg(F.count("*").alias("n"))
    local_cand = tok.mapInPandas(
        _local_phi_candidates, schema="token string"
    ).distinct()

    def bucket(col: F.Column, d: int) -> F.Column:
        return (T.seeded_hash60(col, d) % CMS_WIDTH).cast("int")

    probes = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"), bucket(F.col("token"), d).alias("bucket")
            )
            for d in range(CMS_DEPTH)
        ]
    )
    cms = (
        tok.select(F.explode(probes).alias("p"))
        .groupBy(F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket"))
        .agg(F.count("*").alias("c"))
    )
    pruned = (
        local_cand.select("token", F.explode(probes).alias("p"))
        .select("token", F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket"))
        .join(F.broadcast(cms), ["d", "bucket"])
        .groupBy("token")
        .agg(F.min("c").alias("est"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("est") >= HH_PHI * F.col("n"))
        .select("token")
    )
    return (
        tok.join(F.broadcast(pruned), "token")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= HH_PHI * F.col("n"))
        .select("token", "cnt")
        .orderBy("token")
    )
