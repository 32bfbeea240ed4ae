#!/usr/bin/env python
"""Synthesize an sf1-equivalent dataset by consistent 10x replication of
sf0.1 (VERDICT r4 #3: one real scale checkpoint instead of design-only
scaling claims).

Replication preserves referential integrity and — critically — per-copy
*structure*, so measured scaling reflects the algorithms, not an artifact
of the synthesis:

- relational tables: copy i shifts every key by i * (max key + 1), so
  joins stay consistent and selectivities per copy are unchanged;
  region/nation stay fixed (as TPC-H does across scale factors);
- documents: copy i > 0 prefixes every TOKEN with "c{i}" — every shingle
  changes, so copies share no 3-gram/minhash/simhash structure and the
  near-dup pair graph is 10 independent images of sf0.1's (linear pair
  growth; naive identical copies would quadratically explode every LSH
  bucket by construction);
- embeddings: copy i rotates the vector by i positions (norm-preserving,
  decorrelates copies) and shifts vec_id.

Usage: python scripts/make_scaled_data.py [out_dir] [copies]
"""

from __future__ import annotations

import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from harvard_artifacts_collection_data_engineering_analytics_app_spark.session import (  # noqa: E402
    get_spark,
)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# table -> columns that shift by i * stride(keyspace owner)
KEY_COLS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "customer"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
STRIDE_SOURCE = {  # keyspace owner -> (table, key col)
    "customer": ("customer", "c_custkey"),
    "supplier": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "orders": ("orders", "o_orderkey"),
    "events": ("events", "event_id"),
    "documents": ("documents", "doc_id"),
    "embeddings": ("embeddings", "vec_id"),
}


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/var/sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="make-scaled-data")
    spark.sparkContext.setLogLevel("ERROR")

    strides = {}
    for owner, (tbl, col) in STRIDE_SOURCE.items():
        strides[owner] = (
            spark.read.parquet(f"{SRC}/{tbl}.parquet").agg(F.max(col)).first()[0]
            + 1
        )

    for tbl in ("region", "nation"):
        spark.read.parquet(f"{SRC}/{tbl}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{tbl}.parquet")

    for tbl, keymap in KEY_COLS.items():
        base = spark.read.parquet(f"{SRC}/{tbl}.parquet")
        parts = []
        for i in range(copies):
            df = base
            for col, owner in keymap.items():
                df = df.withColumn(col, F.col(col) + F.lit(i * strides[owner]))
            if tbl == "documents" and i > 0:
                df = df.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split("text", " "),
                            lambda t: F.concat(F.lit(f"c{i}"), t),
                        ),
                        " ",
                    ),
                )
            if tbl == "embeddings" and i > 0:
                dim = len(base.first()["embedding"])
                shift = i % dim
                df = df.withColumn(
                    "embedding",
                    F.concat(
                        F.slice("embedding", shift + 1, dim - shift),
                        F.slice("embedding", 1, shift),
                    ),
                )
            parts.append(df)
        merged = parts[0]
        for p in parts[1:]:
            merged = merged.unionByName(p)
        merged.write.mode("overwrite").parquet(f"{out_dir}/{tbl}.parquet")
        print(f"{tbl}: {merged.count()} rows -> {out_dir}/{tbl}.parquet")


if __name__ == "__main__":
    main()
