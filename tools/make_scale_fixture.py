"""Derive a larger scale-factor fixture from /root/testdata/sf0.1 by
N-fold replication with disjoint key ranges — for SCALE-SOAK runs only
(never correctness: oracles always run against the driver-generated SFs).

Usage: python tools/make_scale_fixture.py [out_dir] [n_replicas]
       (defaults: .scratch/sf1, 10)

Design goal: the result should behave like N INDEPENDENT sf0.1 corpora so
that a soak measures true linear scaling rather than an artifact of the
replication:

* every key column gets a per-replica offset at a power-of-ten stride
  comfortably above its sf0.1 max, so joins stay within a replica and
  join selectivities match sf0.1;
* dimension foreign keys into nation/region are left alone (those dims
  are scale-invariant, matching TPC-H);
* ``documents.text`` is passed through a per-replica alphabet-rotation
  cipher (letters and digits rotated by the replica index): word lengths,
  whitespace, and doc structure survive, so WITHIN a replica every
  near-dup relationship (shingle overlap, minhash signature agreement) is
  preserved exactly, while ACROSS replicas every word differs — without
  the cipher each doc's N copies would form an N-clique of near-dups and
  LSH candidate pairs would grow ~N² per bucket, a super-linear corpus no
  fresh sf1 generator would produce.
"""

from __future__ import annotations

import os
import string
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"

# (table, {column: per-replica stride})
KEY_STRIDES = {
    "orders": {"o_orderkey": 1_000_000, "o_custkey": 100_000},
    "lineitem": {
        "l_orderkey": 1_000_000,
        "l_partkey": 100_000,
        "l_suppkey": 10_000,
    },
    "part": {"p_partkey": 100_000},
    "supplier": {"s_suppkey": 10_000},
    "customer": {"c_custkey": 100_000},
    "documents": {"doc_id": 10_000},
    "events": {"event_id": 1_000_000, "user_id": 10_000},
    "embeddings": {"vec_id": 100_000},
}
COPY_TABLES = ["region", "nation"]  # scale-invariant dims


def _rot_expr(col: str, r: int) -> str:
    """translate() applying a rot-r substitution over letters and digits."""
    lo, up, dg = string.ascii_lowercase, string.ascii_uppercase, string.digits
    src = lo + up + dg
    dst = (
        lo[r % 26 :] + lo[: r % 26] + up[r % 26 :] + up[: r % 26] + dg[r % 10 :] + dg[: r % 10]
    )
    return f"translate({col}, '{src}', '{dst}')"


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".scratch", "sf1")
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    from pyspark.sql import functions as F

    from data_ingestion_auto_spark.session import get_session

    spark = get_session("make-scale-fixture")
    os.makedirs(out_dir, exist_ok=True)

    for t in COPY_TABLES:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )
        print(f"copied {t}")

    for t, strides in KEY_STRIDES.items():
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for r in range(n):
            df = base
            for col, stride in strides.items():
                df = df.withColumn(col, (F.col(col) + F.lit(r * stride)).cast("bigint"))
            if t == "documents" and r > 0:
                df = df.withColumn("text", F.expr(_rot_expr("text", r)))
            parts.append(df)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
        print(f"wrote {t} x{n}")
    print(f"done: {out_dir}")


if __name__ == "__main__":
    main()
