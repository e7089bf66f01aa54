"""Generate NATIVE (process-generated, not replica-derived) documents and
embeddings tables at an arbitrary scale — round-5 verdict "Next round" #4.

The sf1 soak fixture from ``make_scale_fixture.py`` derives its text via a
per-replica rotation cipher; its invariants are verified, but the dup
structure is by construction an image of sf0.1's. This generator removes
the residual "did the construction bake in the answer" doubt: it
re-implements the OBSERVABLE generative process of the driver's fixture
(measured on /root/testdata/sf0.1 — 31-word vocabulary, uniform 10..100
words per doc, 5 languages at the observed mix, 20 sources, 5% of docs
are a uniformly-chosen earlier base doc with " dup" appended, embeddings
are L2-normalized 64-dim Gaussians with uniform labels 0..9) with an
INDEPENDENT seed, so the dup graph, LSH bucket loads, and connected-
component diameters at the target scale arise from the process itself.

Usage: python tools/gen_native_docs.py [out_dir] [n_docs] [n_vecs]
       (defaults: .scratch/sf1_native, 50_000, 20_000)

Writes documents.parquet + embeddings.parquet into out_dir. Pair with the
relational tables from make_scale_fixture.py (key-offset replication is
uncontroversial for join tables — no dup structure to bake in):

    python tools/make_scale_fixture.py .scratch/sf1_native 10
    python tools/gen_native_docs.py   .scratch/sf1_native 50000 20000
    python tools/soak.py              .scratch/sf1_native
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]
N_SOURCES = 20
DUP_FRACTION = 0.05
DIM = 64
N_LABELS = 10
SEED = 20260814  # independent of the driver's seed=42 by design


# --zipf mode (round-7 verdict #5): genuinely skewed keys, everywhere a
# real crawl is skewed. Uniform fixtures never stress the rank-and-cap /
# salting paths because every bucket and group stays near the mean.
ZIPF_LEN_A = 1.2  # truncated-Pareto length exponent
ZIPF_LEN_MIN, ZIPF_LEN_MAX = 10, 400
ZIPF_SRC_A = 1.1  # source-popularity exponent (head source ~25% of docs)
ZIPF_VOCAB_A = 1.0  # classic Zipf over word ranks ("the" dominates)


def _bounded_pareto(rng, n, a, lo, hi):
    u = rng.random(n)
    return (lo / (1.0 - u * (1.0 - (lo / hi) ** a)) ** (1.0 / a)).astype(int)


def gen_documents(
    n_docs: int, rng: np.random.Generator, zipf: bool = False
) -> pa.Table:
    if zipf:
        n_words = _bounded_pareto(rng, n_docs, ZIPF_LEN_A, ZIPF_LEN_MIN, ZIPF_LEN_MAX)
        vp = 1.0 / np.arange(1, len(VOCAB) + 1) ** ZIPF_VOCAB_A
        vp /= vp.sum()
        texts = [
            " ".join(rng.choice(VOCAB, size=k, p=vp).tolist()) for k in n_words
        ]
    else:
        n_words = rng.integers(10, 101, size=n_docs)
        texts = [
            " ".join(rng.choice(VOCAB, size=k).tolist()) for k in n_words
        ]
    # 5% of doc ids become near-dups of a uniformly-chosen OTHER doc
    # (base + " dup") — dup-of-dup chains and exact-dup collisions emerge
    # naturally when a base is picked twice, as observed in the fixture.
    dup_ids = rng.choice(n_docs, size=int(n_docs * DUP_FRACTION), replace=False)
    for d in dup_ids:
        base = int(rng.integers(0, n_docs - 1))
        if base >= d:
            base += 1  # never self
        texts[d] = texts[base] + " dup"
    langs = rng.choice(LANGS, size=n_docs, p=LANG_P)
    if zipf:
        sp = 1.0 / np.arange(1, N_SOURCES + 1) ** ZIPF_SRC_A
        sp /= sp.sum()
        sources = [f"src{int(s)}" for s in rng.choice(N_SOURCES, size=n_docs, p=sp)]
    else:
        sources = [f"src{int(s)}" for s in rng.integers(0, N_SOURCES, size=n_docs)]
    return pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs.tolist(), pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(
    n_vecs: int, rng: np.random.Generator, zipf: bool = False
) -> pa.Table:
    if zipf:
        # Skewed CLUSTER-SIZE distribution (round-8 verdict #7): a
        # 16-component Gaussian mixture with Zipf(1) weights — the head
        # component holds ~30% of all vectors (1/H_16 = 0.296), the tail
        # components a couple percent each — so k-means / IVF assignment
        # sees one genuinely hot cluster. Unit-norm centers, sigma 0.25
        # within-cluster noise, L2-normalized output (same embedding
        # contract as the uniform mode).
        k = 16
        w = 1.0 / np.arange(1, k + 1)
        w /= w.sum()
        centers = rng.standard_normal((k, DIM)).astype(np.float32)
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        comp = rng.choice(k, size=n_vecs, p=w)
        m = centers[comp] + 0.25 * rng.standard_normal((n_vecs, DIM)).astype(
            np.float32
        )
    else:
        m = rng.standard_normal((n_vecs, DIM)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": pa.array(m.tolist(), pa.list_(pa.float32())),
            "label": pa.array(
                rng.integers(0, N_LABELS, size=n_vecs).tolist(), pa.int32()
            ),
        }
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--zipf"]
    zipf = "--zipf" in sys.argv[1:]
    out_dir = args[0] if args else os.path.join(REPO, ".scratch", "sf1_native")
    n_docs = int(args[1]) if len(args) > 1 else 50_000
    n_vecs = int(args[2]) if len(args) > 2 else 20_000
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)
    docs = gen_documents(n_docs, rng, zipf=zipf)
    # directory-style parquet so load_table's spark.read.parquet sees the
    # same layout as the driver fixtures
    ddir = os.path.join(out_dir, "documents.parquet")
    shutil.rmtree(ddir, ignore_errors=True)  # replace any replica-derived table
    os.makedirs(ddir, exist_ok=True)
    pq.write_table(docs, os.path.join(ddir, "part-0.parquet"))
    edir = os.path.join(out_dir, "embeddings.parquet")
    shutil.rmtree(edir, ignore_errors=True)
    os.makedirs(edir, exist_ok=True)
    pq.write_table(
        gen_embeddings(n_vecs, rng, zipf=zipf), os.path.join(edir, "part-0.parquet")
    )
    print(f"wrote {n_docs} docs + {n_vecs} vecs to {out_dir}")


if __name__ == "__main__":
    main()
