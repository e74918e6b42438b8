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

Round 8 adds ``--rel``: synthesize the RELATIONAL + event tables at
x1 (sf0.1-equivalent) and x10 (sf1-equivalent) row counts so the
TPC-H / window / event-time core gets the same measured-scaling
treatment the dedup/ANN lane got in round 7 (VERDICT.md r7 #1).  The
recipe was read empirically from /root/testdata/sf0.1 with DuckDB on
2026-08-14 (key ranges, value domains, date ranges, per-order fan-out
~4 lineitems, events/user ~66.7, exact granularities: 2-dp money,
percent-step discount/tax, day-granular dates, globally-monotone
events.ts) — see gen_relational for the per-column recipe.  Facts are
written as MULTI-FILE parquet directories above ROWS_PER_FILE rows so
the file count grows with the corpus exactly as a real lake layout
does and Spark's scan parallelism is measured honestly (the known
single-file trap: one 110 MB file arrives as 1 task).

Deterministic (numpy PCG64 seed=42; relational tier seed=43).  Output
is NOT a correctness fixture — the DuckDB-oracle gate stays on the
driver's read-only /root/testdata — it exists solely for scale
measurement (though check.py --sf .scale/x10 grades the scaled corpus
itself, Spark vs DuckDB on identical files).

Usage: python scripts/gen_scale_corpus.py [--rel] [--x100] [out_root]
  default out_root: <repo>/.scale  (gitignored; ~60 MB, +~170 MB --rel)
  writes {out_root}/x1/{documents,embeddings}.parquet   (5,000 / 2,000)
         {out_root}/x10/{documents,embeddings}.parquet  (50,000 / 20,000)
  --rel adds generated customer/supplier/part/orders/lineitem/events
  at x1=sf0.1 row counts and x10=10x; region/nation are copied from
  the fixture root (SPARKETL_FIXTURE_ROOT, default /root/testdata/sf0.1).
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


#: facts larger than this are split into numbered part files — the
#: file count then grows ~linearly with the corpus (like a real lake
#: layout) and Spark's scan parallelism at x10 is real, not an
#: artifact of one oversized file arriving as a single task.
ROWS_PER_FILE = 1_000_000

EPOCH = np.datetime64("1970-01-01")
US = 86_400_000_000  # µs per day


def _days(rng: np.random.Generator, n: int, lo: str, hi: str) -> pa.Array:
    """Uniform day-granular timestamps in [lo, hi] as timestamp[us]."""
    d0 = (np.datetime64(lo) - EPOCH).astype(np.int64)
    d1 = (np.datetime64(hi) - EPOCH).astype(np.int64)
    return pa.array(rng.integers(d0, d1 + 1, size=n) * US, pa.timestamp("us"))


def _money(rng: np.random.Generator, n: int, lo: float, hi: float) -> np.ndarray:
    return np.round(rng.uniform(lo, hi, size=n), 2)


def _write(table: pa.Table, path: str) -> None:
    """Single file below ROWS_PER_FILE, else a directory of part files
    (Spark reads the directory natively; the DuckDB oracle globs it —
    sparketl/oracle.py:duckdb_connect)."""
    if os.path.lexists(path) and os.path.islink(path):
        os.remove(path)  # replace a stale symlink from a non-rel run
    if table.num_rows <= ROWS_PER_FILE:
        if os.path.isdir(path):
            import shutil

            shutil.rmtree(path)
        pq.write_table(table, path)
        return
    if os.path.isfile(path):
        os.remove(path)
    os.makedirs(path, exist_ok=True)
    for i in range(0, table.num_rows, ROWS_PER_FILE):
        pq.write_table(
            table.slice(i, ROWS_PER_FILE),
            os.path.join(path, f"part-{i // ROWS_PER_FILE:04d}.parquet"),
        )


def gen_relational(rng: np.random.Generator, s: int, out: str) -> None:
    """Synthesize the star-schema + events tables at scale ``s`` (s=1 ==
    sf0.1 row counts).  Per-column recipe == the fixture's, read
    empirically (FIXTURES.md + DuckDB audit 2026-08-14):

      customer  15k*s: acctbal U(-1000,10000) 2dp; 5 mktsegments; FK->25 nations
      supplier   1k*s: same acctbal shape
      part      20k*s: name adj+noun (8x8), Brand#1..25, 6 types,
                 size U(1,50), retailprice = 900 + (partkey % 1000)/10
      orders   150k*s: custkey U(0,15k*s), status F/O/P, totalprice
                 U(1000,500000) 2dp (independent of lineitems, as in the
                 fixture), orderdate uniform days 1995-01-01..2001-08-01
      lineitem 600k*s: orderkey U(0,150k*s) (=> fan-out Poisson(4), some
                 empty orders — matches observed min 1/max 17/avg 4.08),
                 linenumber U(1,7) (fixture is NOT sequential-per-order),
                 quantity integer 1..50 as double, extprice U(900,105000)
                 2dp, discount {0..10}%, tax {0..8}%, returnflag A/N/R,
                 linestatus F/O, shipdate uniform days (independent of
                 orderdate — observed diff range ±2400 days)
      events   100k*s: ts = sorted uniform µs over 2024-01-01..-30 (ids
                 assigned post-sort => globally monotone, ~25.9s mean
                 gap at s=1), user U(0,1500*s) (events/user stays ~66.7,
                 so per-user session density is scale-invariant),
                 5 types, value Exponential(50) 2dp (observed mean~std
                 ~49.9), props = '{"k": <U(0,100)>}'

    Scaling keys 10x on BOTH sides keeps join fan-out and filter
    selectivity constant — so an x10/x1 wall ratio near 10 means
    linear work growth, not a changed query shape."""
    n_cust, n_supp, n_part = 15_000 * s, 1_000 * s, 20_000 * s
    n_ord, n_li, n_ev = 150_000 * s, 600_000 * s, 100_000 * s

    _write(
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
                "c_name": pa.array(
                    [f"Customer#{i:09d}" for i in range(n_cust)], pa.string()
                ),
                "c_nationkey": pa.array(
                    rng.integers(0, 25, size=n_cust).astype(np.int32), pa.int32()
                ),
                "c_acctbal": pa.array(_money(rng, n_cust, -1000, 10_000)),
                "c_mktsegment": pa.array(
                    rng.choice(
                        ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"],
                        size=n_cust,
                    )
                ),
            }
        ),
        os.path.join(out, "customer.parquet"),
    )
    _write(
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
                "s_name": pa.array(
                    [f"Supplier#{i:09d}" for i in range(n_supp)], pa.string()
                ),
                "s_nationkey": pa.array(
                    rng.integers(0, 25, size=n_supp).astype(np.int32), pa.int32()
                ),
                "s_acctbal": pa.array(_money(rng, n_supp, -1000, 10_000)),
            }
        ),
        os.path.join(out, "supplier.parquet"),
    )
    adjs = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
    nouns = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
    pk = np.arange(n_part)
    _write(
        pa.table(
            {
                "p_partkey": pa.array(pk, pa.int64()),
                "p_name": pa.array(
                    [
                        f"{adjs[a]} {nouns[b]}"
                        for a, b in zip(
                            rng.integers(0, 8, size=n_part),
                            rng.integers(0, 8, size=n_part),
                        )
                    ]
                ),
                "p_brand": pa.array(
                    [f"Brand#{i}" for i in rng.integers(1, 26, size=n_part)]
                ),
                "p_type": pa.array(
                    rng.choice(
                        ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"],
                        size=n_part,
                    )
                ),
                "p_size": pa.array(
                    rng.integers(1, 51, size=n_part).astype(np.int32), pa.int32()
                ),
                "p_retailprice": pa.array(900.0 + (pk % 1000) / 10.0),
            }
        ),
        os.path.join(out, "part.parquet"),
    )
    _write(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
                "o_custkey": pa.array(rng.integers(0, n_cust, size=n_ord), pa.int64()),
                "o_orderstatus": pa.array(rng.choice(["F", "O", "P"], size=n_ord)),
                "o_totalprice": pa.array(_money(rng, n_ord, 1000, 500_000)),
                "o_orderdate": _days(rng, n_ord, "1995-01-01", "2001-08-01"),
                "o_orderpriority": pa.array(
                    rng.choice(
                        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
                        size=n_ord,
                    )
                ),
            }
        ),
        os.path.join(out, "orders.parquet"),
    )
    _write(
        pa.table(
            {
                "l_orderkey": pa.array(rng.integers(0, n_ord, size=n_li), pa.int64()),
                "l_partkey": pa.array(rng.integers(0, n_part, size=n_li), pa.int64()),
                "l_suppkey": pa.array(rng.integers(0, n_supp, size=n_li), pa.int64()),
                "l_linenumber": pa.array(
                    rng.integers(1, 8, size=n_li).astype(np.int32), pa.int32()
                ),
                "l_quantity": pa.array(rng.integers(1, 51, size=n_li).astype(np.float64)),
                "l_extendedprice": pa.array(_money(rng, n_li, 900, 105_000)),
                "l_discount": pa.array(rng.integers(0, 11, size=n_li) / 100.0),
                "l_tax": pa.array(rng.integers(0, 9, size=n_li) / 100.0),
                "l_returnflag": pa.array(rng.choice(["A", "N", "R"], size=n_li)),
                "l_linestatus": pa.array(rng.choice(["F", "O"], size=n_li)),
                "l_shipdate": _days(rng, n_li, "1995-01-02", "2001-11-04"),
            }
        ),
        os.path.join(out, "lineitem.parquet"),
    )
    t0 = (np.datetime64("2024-01-01T00:00:00") - np.datetime64("1970-01-01T00:00:00")).astype(
        np.int64
    ) * 1_000_000
    span = 30 * US
    ts = np.sort(rng.integers(t0, t0 + span, size=n_ev))
    _write(
        pa.table(
            {
                "event_id": pa.array(np.arange(n_ev), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(rng.integers(0, 1_500 * s, size=n_ev), pa.int64()),
                "event_type": pa.array(
                    rng.choice(["click", "error", "purchase", "signup", "view"], size=n_ev)
                ),
                "value": pa.array(np.round(rng.exponential(50.0, size=n_ev), 2)),
                "props": pa.array(
                    [f'{{"k": {k}}}' for k in rng.integers(0, 101, size=n_ev)]
                ),
            }
        ),
        os.path.join(out, "events.parquet"),
    )


def gen_skewed_events(rng: np.random.Generator, n: int, out: str) -> None:
    """events with a deliberately HOT key: user 0 owns 25% of all
    rows, the rest spread uniformly over n/100 users — the hot-key
    regime the fixtures (uniform keys) never produce, used by
    scripts/skew_stress.py to measure shuffle-join skew mitigation
    (plain vs AQE skew-join vs manual salt) on real data."""
    hot = rng.random(n) < 0.25
    users = rng.integers(1, max(2, n // 100), size=n)
    users[hot] = 0
    t0 = (
        np.datetime64("2024-01-01T00:00:00") - np.datetime64("1970-01-01T00:00:00")
    ).astype(np.int64) * 1_000_000
    ts = np.sort(rng.integers(t0, t0 + 30 * US, size=n))
    _write(
        pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(users, pa.int64()),
                "event_type": pa.array(
                    rng.choice(["click", "error", "purchase", "signup", "view"], size=n)
                ),
                "value": pa.array(np.round(rng.exponential(50.0, size=n), 2)),
            }
        ),
        os.path.join(out, "events.parquet"),
    )


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    args = [a for a in sys.argv[1:]]
    # --x100 adds the third decade (500k docs / 200k vecs, ~600 MB) —
    # opt-in so the default regeneration stays ~60 MB / seconds-fast.
    tiers = [("x1", 5_000, 2_000, 1, 1), ("x10", 50_000, 20_000, 1, 10)]
    if "--x100" in args:
        args.remove("--x100")
        # with --rel the x100 tier also gets sf10-equivalent relational
        # facts (60M lineitem / 15M orders / 10M events, ~2 GB, 60+
        # part files) — the third measured decade for the core lane.
        tiers.append(("x100", 500_000, 200_000, 10, 100))
    rel = "--rel" in args
    if rel:
        args.remove("--rel")
    skew = "--skew" in args
    if skew:
        args.remove("--skew")
    out_root = args[0] if args else os.path.join(repo, ".scale")
    if skew:
        # standalone tier: 10M-row events with a hot key (25% on user
        # 0) — consumed directly by scripts/skew_stress.py, no catalog
        d = os.path.join(out_root, "skew")
        os.makedirs(d, exist_ok=True)
        gen_skewed_events(np.random.default_rng(44), 10_000_000, d)
        print(f"skew: events=10000000 (hot user 0 = 25%) -> {d}")
    # fixture root is env-overridable so regeneration works on any
    # layout (round-7 review: the hardcoded absolute path broke links
    # elsewhere); these files are only symlink *targets*, never written.
    fixture_root = os.environ.get("SPARKETL_FIXTURE_ROOT", "/root/testdata/sf0.1")
    for tag, n_docs, n_emb, vscale, rel_scale in tiers:
        rng = np.random.default_rng(42)  # same stream both scales: x1 ⊂-like x10
        d = os.path.join(out_root, tag)
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            gen_documents(rng, n_docs, vscale),
            os.path.join(d, "documents.parquet"),
        )
        pq.write_table(gen_embeddings(rng, n_emb), os.path.join(d, "embeddings.parquet"))
        generated = {"documents", "embeddings"}
        if rel and rel_scale:
            # own seed so the documents/embeddings byte-stream (and thus
            # every round-7 dedup/ANN measurement) is unchanged.
            gen_relational(np.random.default_rng(43), rel_scale, d)
            generated |= {
                "customer", "supplier", "part", "orders", "lineitem", "events",
            }
        # the catalog loader (sparketl.tables.load_tables) eagerly reads
        # all ten fixture tables from an sf_dir, so symlink whatever this
        # run didn't scale from the fixture root — regeneration is then
        # self-contained (round-7 lesson: a corpus without them crashes
        # the documents-table queries at load, not at run).  lexists, not
        # exists: a broken symlink must be *replaced*, not crash symlink().
        for name in (
            "region nation customer supplier part orders lineitem events"
        ).split():
            if name in generated:
                continue
            dst = os.path.join(d, f"{name}.parquet")
            if os.path.islink(dst) or not os.path.lexists(dst):
                if os.path.lexists(dst):
                    os.remove(dst)
                os.symlink(os.path.join(fixture_root, f"{name}.parquet"), dst)
        print(
            f"{tag}: documents={n_docs} embeddings={n_emb}"
            + (f" relational_scale={rel_scale}x" if rel and rel_scale else "")
            + f" -> {d}"
        )


if __name__ == "__main__":
    main()
