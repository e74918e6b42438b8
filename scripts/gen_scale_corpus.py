#!/usr/bin/env python
"""Synthesize the scale-stress corpus (VERDICT.md r6 next-round #1).

The driver fixtures stop at sf0.1 (documents=5,000, embeddings=2,000),
which verifies correctness but cannot *measure* how the heavy
dedup/ANN lane grows with data.  This script regenerates the two
LLM-pipeline tables with the same statistical recipe as the fixtures
(read empirically from /root/testdata/sf0.1 with pyarrow, FIXTURES.md)
at BOTH a 1x and a 10x (sf1-equivalent) row count, so the
scale_stress.py growth ratios compare like with like — any difference
between this recipe and the driver's exact RNG stream cancels out
because numerator and denominator use the same generator.

Fixture recipe replicated (verified against sf0.1 2026-08-14):
  documents: 31-word vocabulary; words-per-doc ~ Uniform[10, 100]
    (observed mean 54.1); lang ~ {en: .41, zh: .15, es: .15, fr: .15,
    de: .14}; sources uniform at 250 docs/source (source count grows
    with n, matching the fixtures' src0..srcN); ~0.16% exact-duplicate
    rows (observed 8/5000); near-duplicates arise naturally from the
    tiny vocabulary, same as the fixtures.
  embeddings: dim=64, unit-L2-norm; 10 labels ~uniform; vec =
    normalize(N(0,1)^64 + 0.56 * unit_centroid_label) which reproduces
    the observed per-label mean-vector norm of ~0.07 (weak but real
    cluster signal — ANN label-agreement stays meaningful).

Deterministic (numpy PCG64 seed=42).  Output is NOT a correctness
fixture — the DuckDB-oracle gate stays on the driver's read-only
/root/testdata — it exists solely for scale measurement.

Usage: python scripts/gen_scale_corpus.py [out_root]
  default out_root: <repo>/.scale  (gitignored; ~60 MB)
  writes {out_root}/x1/{documents,embeddings}.parquet   (5,000 / 2,000)
         {out_root}/x10/{documents,embeddings}.parquet  (50,000 / 20,000)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
DIM = 64
N_LABELS = 10
DOCS_PER_SOURCE = 250
DUP_FRAC = 0.0016  # 8 / 5000 observed


def gen_documents(
    rng: np.random.Generator, n: int, vocab_scale: int = 1
) -> pa.Table:
    """``vocab_scale`` grows the vocabulary with the corpus (Heaps-law
    shape: the x100 tier uses 10x the words).  Holding the 31-word
    fixture vocabulary FIXED while scaling documents 100x saturates
    the word-bigram shingle space (31^2 = 961 types for 50M shingle
    instances), which makes essentially every document an LSH
    candidate of thousands of others — a corpus pathology that
    benchmarks quadratic-candidate behavior no real corpus has (the
    first x100 run filled 79 GB of shuffle spill in the minhash
    verify join this way).  Real vocabularies grow ~ n^beta; modeling
    that keeps near-dup density bounded, which is the regime LSH's
    linearity claim is about."""
    lens = rng.integers(10, 101, size=n)
    vocab = np.array(
        [f"{w}{i}" if i else w for i in range(vocab_scale) for w in VOCAB]
    )
    texts = [" ".join(vocab[rng.integers(0, len(vocab), size=k)]) for k in lens]
    # exact duplicates: overwrite a deterministic sample with earlier rows
    n_dup = max(1, int(round(DUP_FRAC * n)))
    dup_to = rng.integers(n // 2, n, size=n_dup)
    dup_from = rng.integers(0, n // 2, size=n_dup)
    for t, f in zip(dup_to, dup_from):
        texts[t] = texts[f]
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    n_sources = max(1, n // DOCS_PER_SOURCE)
    sources = np.array([f"src{i}" for i in rng.integers(0, n_sources, size=n)])
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(
                np.array([len(t) for t in texts]), pa.int64()
            ),
        }
    )


def gen_embeddings(rng: np.random.Generator, n: int) -> pa.Table:
    centroids = rng.standard_normal((N_LABELS, DIM))
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    labels = rng.integers(0, N_LABELS, size=n)
    vecs = rng.standard_normal((n, DIM)) + 0.56 * centroids[labels]
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs.astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    args = [a for a in sys.argv[1:]]
    # --x100 adds the third decade (500k docs / 200k vecs, ~600 MB) —
    # opt-in so the default regeneration stays ~60 MB / seconds-fast.
    tiers = [("x1", 5_000, 2_000, 1), ("x10", 50_000, 20_000, 1)]
    if "--x100" in args:
        args.remove("--x100")
        tiers.append(("x100", 500_000, 200_000, 10))
    out_root = args[0] if args else os.path.join(repo, ".scale")
    for tag, n_docs, n_emb, vscale in tiers:
        rng = np.random.default_rng(42)  # same stream both scales: x1 ⊂-like x10
        d = os.path.join(out_root, tag)
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            gen_documents(rng, n_docs, vscale),
            os.path.join(d, "documents.parquet"),
        )
        pq.write_table(gen_embeddings(rng, n_emb), os.path.join(d, "embeddings.parquet"))
        # the catalog loader (sparketl.tables.load_tables) eagerly reads
        # all ten fixture tables from an sf_dir, so symlink the eight the
        # stress lane doesn't scale from sf0.1 — regeneration is then
        # self-contained (round-7 lesson: a corpus without them crashes
        # the documents-table queries at load, not at run).
        for name in (
            "region nation customer supplier part orders lineitem events"
        ).split():
            dst = os.path.join(d, f"{name}.parquet")
            if not os.path.exists(dst):
                os.symlink(f"/root/testdata/sf0.1/{name}.parquet", dst)
        print(f"{tag}: documents={n_docs} embeddings={n_emb} -> {d}")


if __name__ == "__main__":
    main()
