"""Exact substring-overlap dedup via winnowing fingerprints.

Implements the document-fingerprinting scheme of Schleimer, Wilkerson &
Aiken, "Winnowing: Local Algorithms for Document Fingerprinting" (SIGMOD
2003) as a fully distributed Catalyst plan, used the way Lee et al.,
"Deduplicating Training Data Makes Language Models Better" (ACL 2022) use
suffix arrays: find *exact* repeated character sequences across documents —
the telltale of boilerplate, licenses, and templated spam that token-level
Jaccard misses (two docs can share a verbatim 31-char license line at
Jaccard ≈ 0).

Losslessness: if two documents share any substring of length
>= T = K + G - 1, they share G consecutive K-gram hashes; the minimum over
that shared hash window is the same *value* in both documents, so both
emit that fingerprint, the pair surfaces as a candidate, and the exact
T-window verification keeps it. Pairs sharing only shorter substrings may
or may not collide at the fingerprint stage; verification removes them.
The output is therefore EXACTLY "pairs sharing a T-character substring" —
what the brute-force DuckDB oracle computes with an all-window self-join.

Scale (100 TB): winnowing's fingerprint density is 2/(G+1) per character
(the paper's expected-density bound), so the inverted index shuffles ~0.22
rows per character instead of one row per window; the self-join is an
equi-join on the fingerprint value (never a crossJoin); the O(L) verify
windows are generated only for candidate documents, never for the corpus.
The corpus-side pass is one scan + one explode + one shuffle.

Reference scope: the reference app (harvard_artifacts_app.py) has no dedup
at all; this extends SURVEY.md's LLM-pipeline mandate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..queries.registry import register
from ..session import ensure_analytics_conf

# K-gram size (chars hashed per gram), winnow window (grams per window),
# and the resulting guarantee threshold: any shared run of >= T chars is
# always detected; shorter runs never appear in the output.
WINNOW_K = 24
WINNOW_G = 8
WINNOW_T = WINNOW_K + WINNOW_G - 1  # 31


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_analytics_conf(spark)
    return load_table(spark, sf_dir, "documents")


def winnow_fingerprints(hashes: F.Column) -> F.Column:
    """array<bigint> of winnowing fingerprints from a K-gram hash array.

    ``hashes`` must be a *materialized column* (not an inline expression):
    higher-order-function lambdas are interpreted with no codegen CSE, so
    an inline hash-array expression would be re-evaluated once per window —
    O(L·G) md5 calls per row instead of O(L).
    """
    n_windows = F.size(hashes) - (WINNOW_G - 1)
    fps = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda j: F.array_min(F.slice(hashes, j, WINNOW_G)),
    )
    return F.array_distinct(
        F.when(n_windows >= 1, fps).otherwise(F.array().cast("array<bigint>"))
    )


def kgram_hashes(text: F.Column) -> F.Column:
    """array<bigint>: hash of each K-char gram of ``text``.

    Uses the native ``xxhash64`` rather than the portable md5 scheme: the
    fingerprint hashes never cross the engine boundary (the DuckDB oracle
    recomputes ground truth brute-force, and the T-window verification
    compares raw substrings), so the only requirement is determinism
    within Spark — and xxhash64 is ~10× cheaper per gram than
    md5→hex→conv on the O(corpus chars) hot path.

    Documents shorter than T emit an empty array — they cannot contain a
    T-char substring, so they can never appear in the output, and skipping
    them keeps the winnow sequence (size >= G) well-formed.
    """
    n_grams = F.length(text) - (WINNOW_K - 1)
    grams = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.xxhash64(F.substr(text, i, F.lit(WINNOW_K))),
    )
    return F.when(F.length(text) >= WINNOW_T, grams).otherwise(
        F.array().cast("array<bigint>")
    )


def _t_windows(text: F.Column) -> F.Column:
    """array<string> of all T-char windows of ``text`` (verify side only)."""
    n = F.length(text) - (WINNOW_T - 1)
    w = F.transform(
        F.sequence(F.lit(1), n), lambda i: F.substr(text, i, F.lit(WINNOW_T))
    )
    return F.when(n >= 1, w).otherwise(F.array().cast("array<string>"))


SQL_SUBSTRING_PAIRS = f"""
    WITH w AS (
        SELECT doc_id, substr(text, CAST(i AS INT), {WINNOW_T}) AS s
        FROM documents,
             LATERAL unnest(range(1, greatest(length(text) - {WINNOW_T - 2}, 1))) t(i)
    )
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
    FROM w a JOIN w b ON a.s = b.s AND a.doc_id < b.doc_id
"""


@register(
    "dd_winnow_pairs",
    oracle=SQL_SUBSTRING_PAIRS,
    tags=("dedup", "substring", "winnowing"),
)
def dd_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs of documents sharing an exact >= 31-char substring.

    Three stages, all equi-joins:
    1. corpus pass: K-gram hash array (materialized below a round-robin
       exchange so the interpreted winnow lambda sees a bound column, not
       an expression to re-evaluate) → winnow fingerprint set → explode;
    2. candidate generation: fingerprint inverted-index self-join
       (a.doc_id < b.doc_id) → distinct pairs;
    3. exact verification: join candidates back to the raw text (candidate
       docs only — at scale this side is orders of magnitude smaller than
       the corpus) and keep pairs whose T-char window sets overlap.
    """
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    n = docs.sparkSession.sparkContext.defaultParallelism
    # Exchange before the hash projection spreads the O(L) md5 work across
    # all cores; the localCheckpoint barrier stops projection collapse from
    # inlining the kgram transform into every winnow-window slice.
    hashed = (
        docs.repartition(n)
        .select("doc_id", kgram_hashes(F.col("text")).alias("hs"))
        .localCheckpoint(eager=True)
    )
    fp = hashed.select(
        "doc_id", F.explode(winnow_fingerprints(F.col("hs"))).alias("fp")
    )
    a, b = fp.alias("a"), fp.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Candidate-docs-only verification: semi-join the corpus down to the
    # docs that appear in any candidate pair BEFORE generating the O(L)
    # window arrays, so corpus-sized window generation never happens.
    cand_ids = (
        cand.select(F.col("a_id").alias("doc_id"))
        .union(cand.select(F.col("b_id").alias("doc_id")))
        .distinct()
    )
    # The semi-join output is small, so AQE coalesces it to one partition —
    # which would serialize the O(L)-per-doc window generation AND the
    # per-pair overlap probes onto a single task (measured 2.5× the whole
    # query). Round-robin repartitions spread both; the checkpoint
    # materializes the window arrays once instead of once per join side.
    windows = (
        docs.join(cand_ids, "doc_id", "left_semi")
        .repartition(n)
        .select("doc_id", _t_windows(F.col("text")).alias("w"))
        .localCheckpoint(eager=True)
    )
    wa = windows.select(F.col("doc_id").alias("a_id"), F.col("w").alias("wa"))
    wb = windows.select(F.col("doc_id").alias("b_id"), F.col("w").alias("wb"))
    return (
        cand.repartition(n)
        .join(wa, "a_id")
        .join(wb, "b_id")
        .filter(F.arrays_overlap("wa", "wb"))
        .select("a_id", "b_id")
    )
