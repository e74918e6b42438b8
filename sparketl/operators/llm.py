"""LLM-data-pipeline operators (SURVEY.md §2.11 #135-140 + north-star
extensions): deduplication (exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine), similarity search (brute-force cosine
top-k, random-hyperplane LSH), and text analysis (quality scoring,
language-ID, token counting, fingerprinting, tf-idf, multimodal
binary plumbing).

Engine-parity strategy (all verified bit-exact Spark 4.1.2 vs DuckDB
1.0.0 in SURVEY.md §0.1-style probes):

- **Hash family**: ``H(k, s) = first 15 hex digits of md5(k || '|' || s)
  as bigint`` — Spark ``conv(substr(md5(..),1,15),16,10)::bigint`` ≡
  DuckDB ``('0x' || substr(md5(..),1,15))::bigint``.  60-bit, positive,
  deterministic, engine-independent.
- **Dot products** in double with identical left-to-right summation:
  Spark ``aggregate(zip_with(a,b,(x,y)->double(x)*double(y)),0D,+)`` ≡
  DuckDB ``list_sum(list_transform(range, i -> a[i]::double *
  b[i]::double))`` (verified bit-identical; never use DuckDB's
  float32 ``list_dot_product`` / ``list_cosine_similarity``).

100-TB design notes (BASELINE.json:6) are in each docstring: the
declared queries run at test SF, but every plan is chosen so the same
code survives a 1000-executor deployment — LSH banding instead of
quadratic self-joins, blocking keys on the exact paths, no
driver-side collects, map-side-combinable aggregations.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import functions as F

from sparketl.registry import query
from sparketl.tables import table

#: persisted frames pinned by _pin(), oldest-first.  Bounded so repeated
#: operator invocations in a long-lived session cannot accumulate cache
#: blocks; persist is a hint, so evicting an old frame merely lets any
#: late re-consumer recompute — never a correctness issue.
_PINNED: list = []
_PIN_KEEP = 4


def _pin(df):
    """persist(MEMORY_AND_DISK) with a bounded module-level registry:
    at most _PIN_KEEP frames stay pinned; older ones are unpersisted."""
    df.persist(StorageLevel.MEMORY_AND_DISK)
    _PINNED.append(df)
    while len(_PINNED) > _PIN_KEEP:
        _PINNED.pop(0).unpersist()
    return df


# ---------------------------------------------------------------------------
# shared expression fragments (Spark SQL expr ≡ DuckDB SQL, kept visibly
# parallel so divergence is reviewable line-by-line)
# ---------------------------------------------------------------------------

# whitespace tokens
_TOKS_S = "split(text, ' ')"
_TOKS_D = "string_split(text, ' ')"

# distinct word-bigram shingles (docs are >= 10 words; guard anyway).
# Built as zip_with over two slices — NOT element_at(split(..), i) in a
# transform lambda, which re-evaluates the split per element (O(n^2)
# per document; measured 4.5s -> 0.3s at sf0.1 for the scan alone).
_SHINGLES_S = (
    "array_distinct(zip_with("
    "slice(split(text,' '), 1, size(split(text,' ')) - 1), "
    "slice(split(text,' '), 2, size(split(text,' ')) - 1), "
    "(a, b) -> concat(a, ' ', b)))"
)
_SHINGLES_D = (
    "list_distinct(list_transform(generate_series(1, len(string_split(text,' ')) - 1), "
    "i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]))"
)


def _h_spark(key: str, val: str) -> str:
    """60-bit md5-derived hash, Spark side; ``key``/``val`` are SQL exprs."""
    return (
        f"cast(conv(substr(md5(concat(cast({key} as string), '|', {val})), 1, 15), "
        f"16, 10) as bigint)"
    )


def _h_duck(key: str, val: str) -> str:
    return f"(('0x' || substr(md5({key}::varchar || '|' || {val}), 1, 15))::bigint)"


def _parallel(df):
    """Spread a small single-file scan across all cores before a
    CPU-dense map (md5 sketching, dot products).  The local fixtures
    arrive as one parquet row-group => a ONE-partition scan that would
    serialize the hash work on a 32-core machine (measured 4-10x on the
    sketch queries).  On a real 100 TB corpus the scan is already
    thousands of splits and this repartition collapses to a no-op cost
    relative to the compute it parallelizes."""
    spark = df.sparkSession
    return df.repartition(spark.sparkContext.defaultParallelism)


# ---------------------------------------------------------------------------
# §2.11 #135 — exact dedup
# ---------------------------------------------------------------------------


@query(
    "llm_dedup_exact",
    oracle="""
        select min(doc_id) as keep_id,
               md5(text)   as text_md5,
               count(*)    as n_copies
        from documents
        group by text
    """,
)
def llm_dedup_exact(spark, sf_dir):
    """#135 exact dedup: one keeper (min doc_id) per distinct text.

    Scale: a single hash-partitioned groupBy on the text hash — the
    canonical 100-TB exact-dedup plan.  Grouping by md5(text) rather
    than the full text keeps shuffle rows ~32 bytes instead of
    document-sized; partial aggregation (min/count) is map-side
    combinable so the shuffle carries one row per distinct doc per
    mapper.
    """
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("text_md5")).agg(
        F.min("doc_id").alias("keep_id"),
        F.count("*").alias("n_copies"),
    ).select("keep_id", "text_md5", "n_copies")


# ---------------------------------------------------------------------------
# §2.11 #136 — MinHash + LSH fuzzy dedup
# ---------------------------------------------------------------------------

_MINHASH_K = 8  # signature length
_LSH_BANDS = 4  # bands of R = K/B = 2 rows

# Double-hashing minhash (Broder): two md5-derived base hashes per
# shingle, then sig[k] = min over shingles of (h1 + k*h2) mod 2^60 —
# 2 md5 evaluations per shingle instead of K.  Computed via
# explode -> groupBy(doc).min so each md5 runs EXACTLY once (array
# lambdas re-evaluate inlined subexpressions per signature row); the
# per-doc min aggregation is map-side combinable, which is also the
# right 100 TB shape.  h2 < 2^60, k <= 7 => h1 + k*h2 < 2^63.
_MOD60 = 1 << 60

@query(
    "llm_dedup_minhash_lsh",
    oracle=f"""
        with d as materialized (
            select doc_id, {_SHINGLES_D} as sh
            from documents
            where len({_TOKS_D}) >= 2
        ),
        ex as (
            select doc_id, (('0x' || substr(md5('0' || '|' || s), 1, 15))::bigint) as h1, (('0x' || substr(md5('1' || '|' || s), 1, 15))::bigint) as h2
            from (select doc_id, unnest(sh) as s from d)
        ),
        sg as (select doc_id, min((h1 + 0 * h2) % 1152921504606846976) as s0, min((h1 + 1 * h2) % 1152921504606846976) as s1, min((h1 + 2 * h2) % 1152921504606846976) as s2, min((h1 + 3 * h2) % 1152921504606846976) as s3, min((h1 + 4 * h2) % 1152921504606846976) as s4, min((h1 + 5 * h2) % 1152921504606846976) as s5, min((h1 + 6 * h2) % 1152921504606846976) as s6, min((h1 + 7 * h2) % 1152921504606846976) as s7 from ex group by doc_id),
        bd as (
            select doc_id, unnest([md5('0:' || s0::varchar || ',' || s1::varchar), md5('1:' || s2::varchar || ',' || s3::varchar), md5('2:' || s4::varchar || ',' || s5::varchar), md5('3:' || s6::varchar || ',' || s7::varchar)]) as band_key
            from sg
        ),
        cand as (
            select distinct a.doc_id as doc_a, b.doc_id as doc_b
            from bd a join bd b
              on a.band_key = b.band_key and a.doc_id < b.doc_id
        )
        select c.doc_a, c.doc_b,
               round(len(list_intersect(x.sh, y.sh))
                     / len(list_distinct(x.sh || y.sh)), 6) as jaccard
        from cand c
        join d x on c.doc_a = x.doc_id
        join d y on c.doc_b = y.doc_id
        where round(len(list_intersect(x.sh, y.sh))
                    / len(list_distinct(x.sh || y.sh)), 6) >= 0.5
    """,
)
def llm_dedup_minhash_lsh(spark, sf_dir):
    """#136 fuzzy dedup: MinHash signatures over word-bigram shingles,
    LSH banding (K=8, 4 bands x 2 rows) to generate candidates, exact
    Jaccard >= 0.5 confirmation on candidates only.

    Scale: the self-join is on band_key — an equi-join whose fan-out is
    bounded by bucket size, NOT a quadratic cross join; this is the
    standard web-scale near-dedup plan (one shuffle to bucket, one to
    dedup pairs).  Signature computation is a single narrow map (no
    explode of shingles), so 100 TB of documents stream through
    without intermediate blow-up.  Skewed buckets (boilerplate docs)
    are handled by AQE skew-join splitting.
    """
    docs = table(spark, sf_dir, "documents")
    d = _parallel(docs.where(F.expr(f"size({_TOKS_S}) >= 2"))).select(
        "doc_id", F.expr(_SHINGLES_S).alias("sh")
    )
    # bands carry ONLY (doc_id, band_key): the pair self-join and its
    # dedup shuffle 16-byte rows, never document-sized shingle arrays
    # (arrays are re-attached per unique pair afterwards) — at 100 TB
    # this is the difference between shuffling keys and shuffling the
    # corpus.
    d = d.cache()  # reused 3x (bands, both jaccard sides); ~doc-count rows
    ex = d.select("doc_id", F.explode("sh").alias("s")).select(
        "doc_id",
        F.expr(_h_spark(repr("0"), "s")).alias("h1"),
        F.expr(_h_spark(repr("1"), "s")).alias("h2"),
    )
    sig = ex.groupBy("doc_id").agg(
        *[
            F.min((F.col("h1") + F.lit(k) * F.col("h2")) % F.lit(_MOD60)).alias(
                f"s{k}"
            )
            for k in range(_MINHASH_K)
        ]
    )
    band_exprs = [
        F.md5(
            F.concat(
                F.lit(f"{b}:"),
                F.col(f"s{2 * b}").cast("string"),
                F.lit(","),
                F.col(f"s{2 * b + 1}").cast("string"),
            )
        )
        for b in range(_LSH_BANDS)
    ]
    bands = (
        sig.select("doc_id", F.explode(F.array(*band_exprs)).alias("band_key"))
        # cache: the pair generator self-joins this — without it the
        # signature pipeline runs TWICE (once per join side)
        .cache()
    )
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    x = d.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    y = d.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    jacc = F.round(
        F.size(F.array_intersect("sh_a", "sh_b"))
        / F.size(F.array_union("sh_a", "sh_b")),
        6,
    )
    return (
        cand.join(x, "doc_a")
        .join(y, "doc_b")
        .select("doc_a", "doc_b", jacc.alias("jaccard"))
        .where(F.col("jaccard") >= 0.5)
    )


# ---------------------------------------------------------------------------
# §2.11 north-star — SimHash signatures
# ---------------------------------------------------------------------------

_SIMHASH_BITS = 60  # our md5-derived hash is 60-bit

_THASH_S = f"transform(array_distinct({_TOKS_S}), t -> {_h_spark('0', 't')})"
_THASH_D = f"list_transform(list_distinct({_TOKS_D}), t -> {_h_duck('0', 't')})"

_SIMHASH_S = (
    f"aggregate(transform(sequence(0, {_SIMHASH_BITS - 1}), "
    "j -> if(size(filter(th, h -> (shiftright(h, j) & 1) = 1)) * 2 > size(th), "
    "shiftleft(cast(1 as bigint), j), cast(0 as bigint))), "
    "cast(0 as bigint), (acc, x) -> acc + x)"
)
_SIMHASH_D = (
    f"cast(list_sum(list_transform(generate_series(0, {_SIMHASH_BITS - 1}), "
    "j -> case when len(list_filter(th, h -> (h >> j) & 1 = 1)) * 2 > len(th) "
    "then (1::bigint << j) else 0::bigint end)) as bigint)"
)


@query(
    "llm_dedup_simhash",
    oracle=f"""
        with t as (select doc_id, {_THASH_D} as th from documents)
        select doc_id, {_SIMHASH_D} as simhash
        from t
    """,
)
def llm_dedup_simhash(spark, sf_dir):
    """North-star SimHash: 60-bit signature per document (majority vote
    per bit over md5-derived token hashes).  Near-duplicates are then
    findable by hamming distance (``bit_count(a ^ b)``) — at scale via
    bit-block banding (split the 60 bits into 4 blocks of 15, equi-join
    on each block: any pair within hamming distance 3 shares >= 1 exact
    block, pigeonhole).  Signature computation is a pure narrow map.
    """
    docs = table(spark, sf_dir, "documents")
    return _parallel(docs).select(
        "doc_id", F.expr(_THASH_S).alias("th")
    ).select("doc_id", F.expr(_SIMHASH_S).alias("simhash"))


# ---------------------------------------------------------------------------
# §2.11 north-star — exact n-gram Jaccard near-dup (blocked)
# ---------------------------------------------------------------------------

#: target joined pair rows per aggregation partition for the inverted-
#: index Jaccard family; sized so a partition's count hash table stays
#: well inside executor memory (~1M keys * ~40B).
_PAIR_ROWS_PER_PART = 1_000_000

#: below this many bytes of documents parquet, the Jaccard family skips
#: its planning-stats job and explicit repartitions: the default 32
#: partitions handle the pair volume (sf0.1 = 2.9e7 candidates runs
#: clean), and the extra planning job + two exchanges cost more than
#: they save (measured +1.3-1.8 s per query at sf0.1).  Calibrated to
#: the MEASURED compressed sizes (small-vocab text compresses ~5x):
#: sf0.1 documents = 0.59 MB (fast path), the 10x stress corpus =
#: 5.98 MB (stats path — an 8 MB first guess silently sent it down
#: the fast path and reproduced the 43 GB-spill plan, caught by
#: re-timing).  Any corpus a scale problem could hide in is far above
#: this gate, so the 100 TB path ALWAYS takes the stats-sized plan.
_JACCARD_STATS_MIN_BYTES = 2 << 20

#: below this many bytes of embeddings parquet, the IVF/PQ family skips
#: the pre-assignment repartition (same tradeoff as the Jaccard gate:
#: at sf0.1 the shuffle costs more than 2k rows of argmin; at the 10x
#: corpus the repartition is a 10x wall win).
_EMB_PARALLEL_MIN_BYTES = 2 << 20


def _scan_bytes(sf_dir: str, name: str) -> int:
    """Driver-side metadata: on-disk bytes of one fixture table (no
    Spark job).  Directories (partitioned sinks) sum their files."""
    import os

    p = os.path.join(sf_dir.rstrip("/"), f"{name}.parquet")
    if os.path.isdir(p):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(p)
            for f in fs
        )
    try:
        return os.path.getsize(p)
    except OSError:
        return 1 << 40  # unknown => assume large, take the stats path


#: above this many bytes, a scan arrives in enough native splits
#: (maxPartitionBytes-sized) that the fixture-artifact repartition is
#: pure cost: at petabyte scale it would funnel the corpus through one
#: exchange AND collapse thousands of splits to core count (round-7
#: review, the agg_checksum finding generalized).
_PARALLEL_MAX_BYTES = 1 << 30


def _maybe_parallel(df, sf_dir: str, name: str = "embeddings", lo=None):
    """Banded size-gated :func:`_parallel` — THE shared gate for every
    CPU-dense map over a fixture-small scan (round-7 review: the
    2-line gate was copy-pasted at five sites; one helper keeps the
    thresholds and rationale in one place).

    Spread only inside [lo, _PARALLEL_MAX_BYTES): below ``lo`` the
    exchange costs more than the compute it parallelizes (measured
    +0.8 s at sf0.1 for the IVF argmin — callers whose downstream is
    pair-quadratic pass lo=0 because even tiny scans pay there); above
    the upper bound the scan already arrives in plenty of native
    splits and the repartition is pure cost."""
    lo = _EMB_PARALLEL_MIN_BYTES if lo is None else lo
    if lo <= _scan_bytes(sf_dir, name) < _PARALLEL_MAX_BYTES:
        return _parallel(df)
    return df


def _assign_expr(cens_lit: str) -> str:
    """Nearest-centroid assignment over the literal codebook: argmin
    by squared-L2, ties by label asc (array_sort on (d, label)
    structs ≡ an orderBy) — the single contract shared by
    llm_ivf_search, llm_kmeans_iterate, llm_semantic_dedup and
    kmeans_train, so a tie-break change cannot silently diverge
    between consumers (round-7 review)."""
    l2_in = _L2_S.format(a="embedding", b="cn.cvec")
    return (
        f"array_sort(transform({cens_lit}, cn -> "
        f"struct({l2_in} as d, cn.c_label as l)))[0].l"
    )


def _np_assign(df, cens, out_col: str = "cluster"):
    """Vectorized nearest-centroid assignment (round 8, measured by
    scripts/k_sweep.py): ``df`` must carry (vec_id, embedding); emits
    (vec_id, embedding, norm2, <out_col>).

    Why it exists: ``_assign_expr`` is a HOF over the literal codebook
    — CodegenFallback, interpreted at ~k x 64 element-ops per row —
    which is fine at the fixture's k=10 but DOMINATES at production
    k ~ sqrt(n) (measured: k=141 at x10 put llm_ivf_search at 7.4 s
    vs 1.2 s at k=10, and one Lloyd iteration at ~7 s).  This kernel
    computes the identical assignment as a blocked numpy product.

    Bit-exactness discipline (the _ivf_cos_topk contract):

    * norm2 is the dim-ascending fold acc = acc + x_i * x_i with
      float32 -> float64 conversion per element — the same IEEE
      sequence _NORM2_S evaluates;
    * squared-L2 to each centroid is the dim-ascending fold
      acc = acc + (x_i - c_i)^2, identical to _L2_S;
    * argmin ties break to the SMALLEST label: the centroid matrix is
      laid out in ascending-label order and np.argmin returns the
      first minimum — exactly _assign_expr's array_sort((d, l))[0].l.

    scripts/k_sweep.py cross-validates the two paths: at k=10 the HOF
    and numpy assignments produce checksum-identical frames.

    Scale: one Arrow batch in, one out — a narrow map with no shuffle,
    ~n*k*d fused multiply-adds in BLAS-speed numpy; the codebook rides
    into the closure (k x 64 doubles, metadata-sized)."""
    import numpy as np

    labels = np.array([l for l, _ in sorted(cens)], dtype=np.int64)
    cmat = np.array([v for _, v in sorted(cens)], dtype=np.float64)

    def assign(batches):
        for pdf in batches:
            e = np.stack(pdf["embedding"].values).astype(np.float64)
            n2 = np.zeros(len(e))
            dist = np.zeros((len(e), len(cmat)))
            for i in range(e.shape[1]):
                col = e[:, i]
                n2 = n2 + col * col
                diff = col[:, None] - cmat[None, :, i]
                dist = dist + diff * diff
            out = pdf[["vec_id", "embedding"]].copy()
            out["norm2"] = n2
            out[out_col] = labels[np.argmin(dist, axis=1)]
            yield out

    return df.mapInPandas(
        assign,
        f"vec_id long, embedding array<float>, norm2 double, {out_col} int",
    )


def _jaccard_pair_counts(spark, e, cand, max_id):
    """Shared candidate-join + intersection-count core of the exact
    n-gram Jaccard family (llm_dedup_ngram_jaccard / _dfcap).

    ``e`` is the postings frame (doc_id, lang, n_sh, s); ``cand`` the
    EXACT candidate-pair volume sum(df*(df-1)/2) over (lang, s)
    buckets and ``max_id`` the max doc_id, both from the caller's
    single planning-stats job.  Returns (doc_a, doc_b, ssum, n_inter).

    Round-7 scale fix (measured on the 10x stress corpus, SCALING.md):
    the naive groupBy(pair).count() plan let AQE size both the join
    input and the count exchange from INPUT bytes (~100 MB of
    postings), while the join OUTPUT explodes ~260x — everything
    funneled through ~32 tasks, spilling 43 GB and running 199 s.
    Candidate volume is exactly computable BEFORE the join from the
    df table (the same statistics a CBO would collect), so:

    * the postings are repartitioned by (lang, s) to spread the
      join's generate+write work (capped at 512 locally; at cluster
      scale the cap is total cores * 2-3);
    * the pair stream is repartitioned by pair key to
      cand/_PAIR_ROWS_PER_PART partitions before counting —
      explicitly, because AQE can only coalesce DOWN from
      spark.sql.shuffle.partitions, never split UP past it, and the
      pair exchange needs ~30x more partitions than any input-sized
      shuffle at 10x data;
    * shuffled pair rows are ONE packed bigint (doc_a<<32 | doc_b,
      taken only when the caller VERIFIED 0 <= min_id and
      max_id < 2^31 from its planning stats; callers pass max_id=None
      for unverified or negative id domains and the unpacked
      (doc_a, doc_b) key runs instead) plus
      ssum = n_sh_a + n_sh_b riding along in the group key, so the
      J >= 0.5 threshold applies immediately post-count with no
      per-pair rejoin: 3*n_inter >= ssum is EXACTLY round(J,6) >= 0.5
      because the closest rational below 1/2 is n/(2n+1) <= 0.4975
      for set sizes <= 10^5 — rounding cannot bridge the gap.

    Measured x10 (50k docs, 8.96e8 candidate pairs, local[32]):
    199 s / 43 GB spill -> 67.6 s / zero spill; x1 unchanged within
    noise.  Wall now tracks candidate volume ~linearly — the honest
    cost of EXACT all-pairs Jaccard on a near-dup-dense corpus; the
    subquadratic paths are minhash-LSH and the df-cap (see SCALING.md).
    """
    if cand is None:
        # small-corpus fast path (see _JACCARD_STATS_MIN_BYTES): default
        # partitioning, no planning job, no explicit exchanges
        n_parts = None
    else:
        n_parts = max(32, min(4096, int(cand / _PAIR_ROWS_PER_PART) + 1))
        e = e.repartition(min(n_parts, 512), "lang", "s")
    pairs = e.alias("a").join(
        e.alias("b"),
        (F.col("a.s") == F.col("b.s"))
        & (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & (F.col("a.n_sh") <= 2 * F.col("b.n_sh"))
        & (F.col("b.n_sh") <= 2 * F.col("a.n_sh")),
    )
    ssum = (F.col("a.n_sh") + F.col("b.n_sh")).alias("ssum")
    if max_id is not None and 0 <= max_id < (1 << 31):
        pk = pairs.select(
            (
                F.shiftleft(F.col("a.doc_id"), 32).bitwiseOR(F.col("b.doc_id"))
            ).alias("pk"),
            ssum,
        )
        if n_parts is not None:
            pk = pk.repartition(n_parts, "pk")
        return (
            pk.groupBy("pk", "ssum")
            .agg(F.count("*").alias("n_inter"))
            .where(3 * F.col("n_inter") >= F.col("ssum"))
            .select(
                F.shiftright("pk", 32).alias("doc_a"),
                F.col("pk").bitwiseAND(F.lit((1 << 32) - 1)).alias("doc_b"),
                "ssum",
                "n_inter",
            )
        )
    pk = pairs.select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        ssum,
    )
    if n_parts is not None:
        pk = pk.repartition(n_parts, "doc_a", "doc_b")
    return (
        pk.groupBy("doc_a", "doc_b", "ssum")
        .agg(F.count("*").alias("n_inter"))
        .where(3 * F.col("n_inter") >= F.col("ssum"))
    )


@query(
    "llm_dedup_ngram_jaccard",
    oracle=f"""
        with d as materialized (
            select doc_id, lang, {_SHINGLES_D} as sh
            from documents
            where len({_TOKS_D}) >= 2
        ),
        e as (select doc_id, lang, unnest(sh) as s from d),
        n as (select doc_id, len(sh) as n_sh from d),
        inter as (
            select a.doc_id as doc_a, b.doc_id as doc_b, count(*) as n_inter
            from e a join e b
              on a.s = b.s and a.lang = b.lang and a.doc_id < b.doc_id
            group by 1, 2
        )
        select i.doc_a, i.doc_b,
               round(n_inter / (na.n_sh + nb.n_sh - n_inter), 6) as jaccard
        from inter i
        join n na on i.doc_a = na.doc_id
        join n nb on i.doc_b = nb.doc_id
        where round(n_inter / (na.n_sh + nb.n_sh - n_inter), 6) >= 0.5
    """,
)
def llm_dedup_ngram_jaccard(spark, sf_dir):
    """North-star exact n-gram Jaccard: inverted-index join on shared
    shingles (lossless prefilter — Jaccard > 0 implies >= 1 shared
    shingle), blocked by ``lang`` to bound fan-out, exact
    |A∩B| / (|A|+|B|-|A∩B|) >= 0.5.

    Plan: postings self-join on (lang, shingle) with the lossless
    length filter (J >= 0.5 forces max(|A|,|B|) <= 2*min(|A|,|B|))
    pushed into the join, then ``groupBy(pair).count()`` — the shared-
    shingle count IS |A∩B| because shingle sets are distinct per doc.
    Jaccard falls out arithmetically; no per-pair array materialization
    and the aggregation is map-side combinable.

    Measured round 3 (sf0.1, local[32], warm): 1.5-2.1s vs 11.8s for
    the previous Chaudhuri prefix-filter + array_intersect-verify
    variant.  On this fixture's deliberately hot 31-word vocabulary
    the prefix filter kept 55% of all same-lang pairs as candidates
    (1.38M of 2.5M) while paying a window-rank shuffle, two caches and
    a ~51-element array_intersect per candidate — verification cost
    dwarfed the pruning.  Count-based wins whenever candidate density
    is high; the prefix+verify variant wins on Zipf vocabularies where
    the prefix prunes quadratically.

    Scale: shuffle volume is sum(df^2) over (lang, shingle) buckets —
    hot shingles are the skew risk.  Round-7: the pair join/count core
    moved to :func:`_jaccard_pair_counts`, which sizes BOTH exchanges
    from the exact candidate volume (one planning-stats job over the
    df table — the CBO step a 100 TB run would do anyway) and ships
    packed single-bigint pair keys; see its docstring for the measured
    199 s -> 67.6 s / 43 GB -> 0 spill fix on the 10x stress corpus.
    At 100 TB the df-cap variant (llm_dedup_ngram_dfcap) bounds
    volume against skew; this lossless form stays Θ(sum df^2) by
    definition of exactness.
    """
    docs = table(spark, sf_dir, "documents")
    d = _parallel(docs.where(F.expr(f"size({_TOKS_S}) >= 2"))).select(
        "doc_id", "lang", F.expr(_SHINGLES_S).alias("sh")
    )
    e = d.select(
        "doc_id", "lang", F.size("sh").alias("n_sh"), F.explode("sh").alias("s")
    )
    if _scan_bytes(sf_dir, "documents") < _JACCARD_STATS_MIN_BYTES:
        # small corpus: no planning job — and therefore no verified
        # id-domain either, so take the UNPACKED pair key (max_id
        # None).  Assuming 32-bit-safe ids here would silently merge
        # distinct pairs on a tiny corpus with snowflake/negative ids
        # (round-7 review); the packed key saves nothing at this size.
        cand, max_id = None, None
    else:
        # planning stats: exact candidate volume + doc-id domain
        # (BOTH ends — a small max does not rule out negative ids), 1 job
        stats = (
            e.groupBy("lang", "s")
            .agg(
                F.count("*").alias("df"),
                F.max("doc_id").alias("m"),
                F.min("doc_id").alias("mn"),
            )
            .agg(
                F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("cand"),
                F.max("m").alias("max_id"),
                F.min("mn").alias("min_id"),
            )
            .collect()[0]
        )
        cand = float(stats.cand or 0.0)
        max_id = (
            stats.max_id
            if stats.min_id is not None and stats.min_id >= 0
            else None
        )
    inter = _jaccard_pair_counts(spark, e, cand, max_id)
    jacc = F.round(
        F.col("n_inter") / (F.col("ssum") - F.col("n_inter")), 6
    )
    return (
        inter.select("doc_a", "doc_b", jacc.alias("jaccard"))
        .where(F.col("jaccard") >= 0.5)
    )


# ---------------------------------------------------------------------------
# §2.11 #137 — similarity search over embeddings
# ---------------------------------------------------------------------------

# double-precision dot product with identical summation order (verified
# bit-exact across engines; see module docstring).
#
# Measured round 3 (local[32], sf0.1, warm session, interleaved trials):
# this HOF fold beats a statically-unrolled 64-term
# ``element_at(a,1)*element_at(b,1) + ...`` expression by 2-4x
# (topk 0.76s vs 1.32s; pairwise micro 0.38s vs 0.91s).  The unroll
# emits 128 ANSI ElementAt ops whose generated method falls out of
# JIT-friendly codegen, while zip_with/aggregate runs one tight
# specialized loop over the array.  Keep the HOF form; the recorded
# 71-84s round-2 bench numbers were 4-way submission contention, not
# expression cost.
_DOT_S = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
    "cast(0 as double), (s, x) -> s + x)"
)
_NORM2_S = (
    "aggregate(transform({a}, x -> cast(x as double) * cast(x as double)), "
    "cast(0 as double), (s, x) -> s + x)"
)
_DOT_D = (
    "list_sum(list_transform(generate_series(1, 64), "
    "i -> {a}[i]::double * {b}[i]::double))"
)
_NORM2_D = (
    "list_sum(list_transform(generate_series(1, 64), "
    "i -> {a}[i]::double * {a}[i]::double))"
)


@query(
    "llm_embed_cosine_neardup",
    oracle=f"""
        with e as (
            select vec_id, label, embedding,
                   {_NORM2_D.format(a='embedding')} as norm2
            from embeddings
        )
        select a.label as label, a.vec_id as vec_a, b.vec_id as vec_b,
               round({_DOT_D.format(a='a.embedding', b='b.embedding')}
                     / sqrt(a.norm2 * b.norm2), 6) as cos_sim
        from e a join e b
          on a.label = b.label and a.vec_id < b.vec_id
        where round({_DOT_D.format(a='a.embedding', b='b.embedding')}
                    / sqrt(a.norm2 * b.norm2), 6) >= 0.3
    """,
)
def llm_embed_cosine_neardup(spark, sf_dir):
    """North-star embedding near-dup: same-label pairs with cosine
    >= 0.3 (labels are the natural blocking key per FIXTURES.md —
    near-duplicates share class).

    Scale: blocking by label turns an O(n^2) cross join into 10
    independent O((n/10)^2) blocks; at 100 TB the label becomes an
    IVF/k-means cluster id (see llm_similarity_ann_lsh for the
    unlabeled path).  Norms are precomputed pre-join (n, not n^2,
    evaluations).
    """
    emb = table(spark, sf_dir, "embeddings")
    e = _parallel(emb).select(
        "vec_id",
        "label",
        "embedding",
        F.expr(_NORM2_S.format(a="embedding")).alias("norm2"),
    )
    a = e.alias("a")
    b = e.alias("b")
    cos = F.round(
        F.expr(_DOT_S.format(a="a.embedding", b="b.embedding"))
        / F.sqrt(F.col("a.norm2") * F.col("b.norm2")),
        6,
    )
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.label").alias("label"),
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= 0.3)
    )


@query(
    "llm_similarity_topk",
    oracle=f"""
        with e as (
            select vec_id, embedding,
                   {_NORM2_D.format(a='embedding')} as norm2
            from embeddings
        ),
        scored as (
            select q.vec_id as query_id, c.vec_id as neighbor_id,
                   round({_DOT_D.format(a='q.embedding', b='c.embedding')}
                         / sqrt(q.norm2 * c.norm2), 6) as cos_sim
            from e q join e c on q.vec_id <> c.vec_id
            where q.vec_id % 25 = 0
        )
        select query_id, neighbor_id, cos_sim,
               row_number() over (partition by query_id
                                  order by cos_sim desc, neighbor_id asc) as rnk
        from scored
        qualify rnk <= 5
    """,
)
def llm_similarity_topk(spark, sf_dir):
    """#137 brute-force cosine top-k: for each query vector (vec_id
    divisible by 25), the 5 nearest neighbors by cosine (ties broken
    by neighbor_id — deterministic across engines since the doubles
    are bit-identical).

    Scale: queries x corpus is a broadcast nested-loop with the small
    query set broadcast — corpus streams once, no shuffle of the big
    side; top-k per query is a bounded window.  This is the exact
    baseline; llm_similarity_ann_lsh is the sublinear path.
    """
    from pyspark.sql import Window

    emb = table(spark, sf_dir, "embeddings")
    e = _parallel(emb).select(
        "vec_id",
        "embedding",
        F.expr(_NORM2_S.format(a="embedding")).alias("norm2"),
    )
    q = e.where(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm2").alias("q_norm2"),
    )
    cos = F.round(
        F.expr(_DOT_S.format(a="q_emb", b="embedding"))
        / F.sqrt(F.col("q_norm2") * F.col("norm2")),
        6,
    )
    scored = (
        F.broadcast(q)
        .join(e, F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cos.alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= 5
    )


# random-hyperplane LSH: 8 deterministic Rademacher (+1/-1) hyperplanes
# derived from md5 — reproducible without RNG state, same trick as the
# minhash seed family.
def _hyperplanes(n_planes: int = 8, dim: int = 64) -> list[list[float]]:
    import hashlib

    return [
        [
            1.0 if hashlib.md5(f"{p},{d}".encode()).digest()[0] & 1 else -1.0
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def _ann_oracle_sql() -> str:
    """DuckDB replay of the ANN-LSH pipeline with the SAME literal
    hyperplanes — bucketing is sign-of-exact-double-dot, so candidate
    sets and scores are bit-identical across engines and the
    'approximate' operator is still hash-gradeable."""
    planes = _hyperplanes()
    planes_sql = (
        "[" + ", ".join(
            "[" + ", ".join(f"{v:.1f}" for v in p) + "]::double[]" for p in planes
        ) + "]"
    )
    dot = _DOT_D.format(a="embedding", b="c.embedding")
    return f"""
        with pl as (select {planes_sql} as planes),
        e as (
            select vec_id, embedding,
                   {_NORM2_D.format(a='embedding')} as norm2,
                   list_sum(list_transform(generate_series(0, 7), p ->
                       case when list_sum(list_transform(generate_series(1, 64),
                                i -> embedding[i]::double * planes[p + 1][i])) > 0
                            then (1 << p) else 0 end)) as bucket
            from embeddings cross join pl
        ),
        scored as (
            select q.vec_id as query_id, c.vec_id as neighbor_id,
                   round({_DOT_D.format(a='q.embedding', b='c.embedding')}
                         / sqrt(q.norm2 * c.norm2), 6) as cos_sim
            from e q join e c
              on q.bucket = c.bucket and q.vec_id <> c.vec_id
            where q.vec_id % 25 = 0
        )
        select query_id, neighbor_id, cos_sim,
               row_number() over (partition by query_id
                                  order by cos_sim desc, neighbor_id asc) as rnk
        from scored
        qualify rnk <= 3
    """


@query("llm_similarity_ann_lsh", oracle=_ann_oracle_sql())
def llm_similarity_ann_lsh(spark, sf_dir):
    """#137 scale path: random-hyperplane LSH ANN.  Each vector gets an
    8-bit bucket (sign of dot with 8 deterministic Rademacher
    hyperplanes); candidates = same-bucket pairs; exact cosine top-3
    within bucket.

    Scale: bucketing is a narrow map; the candidate join is an
    equi-join on bucket (expected bucket population n/256), giving
    ~n^2/256 scored pairs instead of n^2 — and the bucket count grows
    with more planes, so the knob scales to 100 TB (16-20 planes +
    multi-probe).  Although ANN is approximation-defined, the
    approximation itself is deterministic (sign of exact double dots
    against literal hyperplanes), so the oracle replays it exactly and
    this query IS hash-graded.
    """
    from pyspark.sql import Window

    emb = table(spark, sf_dir, "embeddings")
    planes = _hyperplanes()
    plane_lit = F.array(
        *[F.array(*[F.lit(v) for v in p]) for p in planes]
    )
    e = (
        emb.select(
            "vec_id",
            "embedding",
            F.expr(_NORM2_S.format(a="embedding")).alias("norm2"),
            plane_lit.alias("planes"),
        )
        .withColumn(
            "bucket",
            F.expr(
                "aggregate(transform(sequence(0, 7), p -> if("
                + _DOT_S.format(a="element_at(planes, p + 1)", b="embedding")
                + " > 0, shiftleft(1, p), 0)), 0, (s, x) -> s + x)"
            ),
        )
        .drop("planes")
    )
    q = e.where(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm2").alias("q_norm2"),
        F.col("bucket").alias("q_bucket"),
    )
    cos = F.round(
        F.expr(_DOT_S.format(a="q_emb", b="embedding"))
        / F.sqrt(F.col("q_norm2") * F.col("norm2")),
        6,
    )
    scored = (
        q.join(
            e,
            (F.col("q_bucket") == F.col("bucket"))
            & (F.col("query_id") != F.col("vec_id")),
        )
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos_sim")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= 3
    )


def _register_similarity_eval_and_quantize() -> None:
    """Registered via a function so the oracle f-strings can reference
    the ALREADY-registered topk/ann oracles verbatim (composition at
    the SQL level mirrors the DataFrame-level composition below)."""
    from sparketl.registry import ORACLES

    @query(
        "llm_ann_recall_eval",
        oracle=f"""
            with bf as ({ORACLES["llm_similarity_topk"]}),
            ann as ({ORACLES["llm_similarity_ann_lsh"]})
            select bf.query_id,
                   count(ann.neighbor_id) as n_hit,
                   round(count(ann.neighbor_id) / 5.0, 6) as recall_at_5
            from bf
            left join ann on bf.query_id = ann.query_id
                         and bf.neighbor_id = ann.neighbor_id
            group by bf.query_id
        """,
    )
    def llm_ann_recall_eval(spark, sf_dir):
        """#137 evaluation harness: recall@5 of the sign-LSH ANN path
        against the exact brute-force top-5, per query vector — the
        metric that decides LSH band/width tuning before a corpus-wide
        rollout.  Composes the two declared queries (and their oracles)
        verbatim, so the evaluation can never drift from what the
        production paths actually return.

        Scale: both inputs are query-set-sized (queries × k rows), so
        the join is trivially broadcast; the expensive parts are the
        underlying paths being evaluated, not the evaluation.
        """
        bf = llm_similarity_topk(spark, sf_dir).select("query_id", "neighbor_id")
        ann = llm_similarity_ann_lsh(spark, sf_dir).select(
            F.col("query_id").alias("a_query_id"),
            F.col("neighbor_id").alias("a_neighbor_id"),
        )
        hits = bf.join(
            F.broadcast(ann),
            (F.col("query_id") == F.col("a_query_id"))
            & (F.col("neighbor_id") == F.col("a_neighbor_id")),
            "left",
        )
        return hits.groupBy("query_id").agg(
            F.count("a_neighbor_id").alias("n_hit"),
            F.round(F.count("a_neighbor_id") / F.lit(5.0), 6).alias(
                "recall_at_5"
            ),
        )

    @query(
        "llm_embed_quantize",
        oracle="""
            with m as (
                select vec_id, label, embedding,
                       list_max(list_transform(embedding, x -> abs(x::double)))
                           as maxabs
                from embeddings
            )
            select vec_id, label,
                   round(127.0 / maxabs, 6) as scale,
                   array_to_string(
                       list_transform(embedding,
                           x -> cast(floor(x::double * (127.0 / maxabs) + 0.5)
                                     as bigint)),
                       ',') as qvec,
                   cast(list_sum(list_transform(embedding,
                           x -> cast(floor(x::double * (127.0 / maxabs) + 0.5)
                                     as bigint))) as bigint) as qsum
            from m
        """,
    )
    def llm_embed_quantize(spark, sf_dir):
        """#137-family int8 symmetric quantization: per-vector scale =
        127 / max|x|, elements mapped through floor(x*scale + 0.5) —
        written as floor(+0.5) rather than round() so both engines run
        the identical IEEE double expression with no engine-specific
        tie-breaking, making the int8 codes bit-reproducible.

        Scale: a pure narrow map (no shuffle); quantization is the
        standard 4× memory/IO reduction before ANN index build, and
        the per-vector scale column is what dequantizes scores later.
        The float32 embeddings are cast to double BEFORE arithmetic on
        both sides (DuckDB's float32 list math diverges otherwise —
        module docstring).
        """
        emb = table(spark, sf_dir, "embeddings")
        m = emb.select(
            "vec_id",
            "label",
            "embedding",
            F.expr(
                "array_max(transform(embedding, x -> abs(double(x))))"
            ).alias("maxabs"),
        )
        qexpr = (
            "transform(embedding,"
            " x -> cast(floor(double(x) * (127.0 / maxabs) + 0.5) as bigint))"
        )
        return m.select(
            "vec_id",
            "label",
            F.round(F.lit(127.0) / F.col("maxabs"), 6).alias("scale"),
            F.expr(
                f"array_join(transform({qexpr}, v -> cast(v as string)), ',')"
            ).alias("qvec"),
            F.expr(f"aggregate({qexpr}, 0L, (acc, v) -> acc + v)").alias(
                "qsum"
            ),
        )


_register_similarity_eval_and_quantize()


# ---------------------------------------------------------------------------
# §2.11 #138 — text analysis
# ---------------------------------------------------------------------------


@query(
    "llm_text_quality",
    oracle=f"""
        with t as (
            select doc_id, text, {_TOKS_D} as toks, len({_TOKS_D}) as n_words
            from documents
        )
        select doc_id, n_words,
               len(list_distinct(toks)) as n_distinct_words,
               round((length(text) - (n_words - 1)) / n_words, 6) as avg_word_len,
               round(len(list_distinct(toks)) / n_words, 6) as ttr,
               round(len(list_filter(toks, x -> x in ('the', 'a'))) / n_words, 6)
                   as stopword_ratio,
               (len(list_distinct(toks)) / n_words) >= 0.4 and n_words >= 15
                   as is_high_quality
        from t
    """,
)
def llm_text_quality(spark, sf_dir):
    """#138 quality scoring: word count, type-token ratio, average word
    length, stopword ratio, and a boolean quality gate — the standard
    pre-training corpus filters (length / repetition / stopword
    heuristics a la C4/Gopher rules).

    Scale: pure narrow map — no shuffle at all; runs at scan speed on
    any corpus size.
    """
    docs = table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "text",
        F.expr(_TOKS_S).alias("toks"),
        F.expr(f"size({_TOKS_S})").alias("n_words"),
    )
    n_distinct = F.size(F.array_distinct("toks"))
    return t.select(
        "doc_id",
        "n_words",
        n_distinct.alias("n_distinct_words"),
        F.round(
            (F.length("text") - (F.col("n_words") - 1)) / F.col("n_words"), 6
        ).alias("avg_word_len"),
        F.round(n_distinct / F.col("n_words"), 6).alias("ttr"),
        F.round(
            F.expr("size(filter(toks, x -> x in ('the', 'a')))")
            / F.col("n_words"),
            6,
        ).alias("stopword_ratio"),
        (
            (n_distinct / F.col("n_words") >= 0.4) & (F.col("n_words") >= 15)
        ).alias("is_high_quality"),
    )


_LANG_MARKERS = {
    "de": ("der", "die", "das", "und"),
    "en": ("the", "a", "fast", "slow"),
    "es": ("el", "la", "los", "y"),
    "fr": ("le", "la", "les", "et"),
}


def _lang_score(lang: str, list_fn: str, toks: str) -> str:
    """count of marker-word hits; identical text in both dialects."""
    markers = ", ".join(f"'{m}'" for m in _LANG_MARKERS[lang])
    if list_fn == "spark":
        return f"size(filter({toks}, x -> x in ({markers})))"
    return f"len(list_filter({toks}, x -> x in ({markers})))"


@query(
    "llm_lang_id",
    oracle=f"""
        with s as (
            select doc_id, lang,
                   {_lang_score('de', 'duck', _TOKS_D)} as s_de,
                   {_lang_score('en', 'duck', _TOKS_D)} as s_en,
                   {_lang_score('es', 'duck', _TOKS_D)} as s_es,
                   {_lang_score('fr', 'duck', _TOKS_D)} as s_fr
            from documents
        )
        select doc_id, lang,
               case when s_de >= s_en and s_de >= s_es and s_de >= s_fr and s_de > 0 then 'de'
                    when s_en >= s_es and s_en >= s_fr and s_en > 0 then 'en'
                    when s_es >= s_fr and s_es > 0 then 'es'
                    when s_fr > 0 then 'fr'
                    else 'und' end as lang_pred,
               case when s_de >= s_en and s_de >= s_es and s_de >= s_fr and s_de > 0 then 'de'
                    when s_en >= s_es and s_en >= s_fr and s_en > 0 then 'en'
                    when s_es >= s_fr and s_es > 0 then 'es'
                    when s_fr > 0 then 'fr'
                    else 'und' end = lang as is_match
        from s
    """,
)
def llm_lang_id(spark, sf_dir):
    """#138 language-ID: marker-word (stopword n-gram) scoring with a
    deterministic priority argmax (de > en > es > fr on ties, 'und'
    when nothing matches) — the classic dictionary-based heuristic
    (fastText/CLD fallback tier).  Pure narrow map; no shuffle.
    """
    docs = table(spark, sf_dir, "documents")
    s = docs.select(
        "doc_id",
        "lang",
        *[
            F.expr(_lang_score(lang, "spark", _TOKS_S)).alias(f"s_{lang}")
            for lang in ("de", "en", "es", "fr")
        ],
    )
    pred = (
        F.when(
            (F.col("s_de") >= F.col("s_en"))
            & (F.col("s_de") >= F.col("s_es"))
            & (F.col("s_de") >= F.col("s_fr"))
            & (F.col("s_de") > 0),
            F.lit("de"),
        )
        .when(
            (F.col("s_en") >= F.col("s_es"))
            & (F.col("s_en") >= F.col("s_fr"))
            & (F.col("s_en") > 0),
            F.lit("en"),
        )
        .when((F.col("s_es") >= F.col("s_fr")) & (F.col("s_es") > 0), F.lit("es"))
        .when(F.col("s_fr") > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )
    return s.select(
        "doc_id",
        "lang",
        pred.alias("lang_pred"),
        (pred == F.col("lang")).alias("is_match"),
    )


@query(
    "llm_token_count",
    oracle=f"""
        select doc_id,
               len({_TOKS_D}) as ws_tokens,
               len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) as bpe_ish_tokens,
               length(text) as n_chars_actual,
               round(length(text) / len({_TOKS_D}), 6) as chars_per_token
        from documents
    """,
)
def llm_token_count(spark, sf_dir):
    """#138 token counting: whitespace tokens + a BPE-ish regex
    tokenizer (letter runs / digit runs / single other chars) — the
    cheap proxy used for corpus token budgeting.  Narrow map, no
    shuffle.
    """
    docs = table(spark, sf_dir, "documents")
    ws = F.expr(f"size({_TOKS_S})")
    return docs.select(
        "doc_id",
        ws.alias("ws_tokens"),
        F.expr("regexp_count(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')").alias(
            "bpe_ish_tokens"
        ),
        F.length("text").alias("n_chars_actual"),
        F.round(F.length("text") / ws, 6).alias("chars_per_token"),
    )


@query(
    "llm_doc_fingerprint",
    oracle=f"""
        with t as (
            select doc_id, lower(trim(text)) as norm,
                   list_transform({_TOKS_D}, x -> {_h_duck("'0'", 'x')} % 1048576) as th
            from documents
        )
        select doc_id,
               md5(norm) as content_md5,
               list_reduce(list_prepend(0::bigint, th),
                           (a, x) -> (a * 31 + x) % 1099511627776) as rolling_hash
        from t
    """,
)
def llm_doc_fingerprint(spark, sf_dir):
    """#138 document fingerprinting: content md5 of the normalized text
    plus an order-sensitive polynomial rolling hash over token hashes
    (base 31 mod 2^40 — overflow-safe in 64-bit).  Unlike the md5, the
    rolling hash supports incremental/windowed variants for chunk-level
    dedup.  Narrow map, no shuffle.
    """
    docs = _parallel(table(spark, sf_dir, "documents"))
    th = f"transform({_TOKS_S}, x -> {_h_spark(repr('0'), 'x')} % 1048576)"
    return docs.select(
        "doc_id",
        F.md5(F.lower(F.trim(F.col("text")))).alias("content_md5"),
        F.expr(
            f"aggregate({th}, cast(0 as bigint), "
            "(a, x) -> (a * 31 + x) % 1099511627776)"
        ).alias("rolling_hash"),
    )


# ---------------------------------------------------------------------------
# §2.11 #140 — tf-idf / token stats
# ---------------------------------------------------------------------------


@query(
    "llm_tfidf_term_stats",
    oracle=f"""
        with tok as (
            select doc_id, unnest({_TOKS_D}) as term from documents
        ),
        n as (select count(*) as n_docs from documents)
        select term,
               count(distinct doc_id) as df,
               count(*) as tf_total,
               round(ln(n.n_docs / count(distinct doc_id)), 6) as idf
        from tok cross join n
        group by term, n.n_docs
    """,
)
def llm_tfidf_term_stats(spark, sf_dir):
    """#140 corpus term statistics: document frequency, total term
    frequency, idf = ln(N/df) per term.

    Scale: explode + groupBy(term) with map-side partial aggregation;
    the corpus size N joins in as a broadcast scalar (no collect).
    """
    docs = table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.expr(_TOKS_S)).alias("term"))
    n = docs.agg(F.count("*").alias("n_docs"))
    # single-pass rollup: groupBy(doc_id, term) first, then per-term —
    # df is a plain count over per-doc-term rows and tf_total a sum, so
    # both stages are map-side combinable (no count-distinct expansion)
    per_doc_term = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    return (
        per_doc_term.groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.sum("tf").alias("tf_total"),
        )
        .crossJoin(F.broadcast(n))
        .select(
            "term",
            "df",
            "tf_total",
            F.round(F.log(F.col("n_docs") / F.col("df")), 6).alias("idf"),
        )
    )


@query(
    "llm_tfidf_top_term",
    oracle=f"""
        with tok as (
            select doc_id, unnest({_TOKS_D}) as term from documents
        ),
        n as (select count(*) as n_docs from documents),
        tf as (
            select doc_id, term, count(*) as tf
            from tok group by doc_id, term
        ),
        idf as (
            select term, ln(n.n_docs / count(distinct doc_id)) as idf
            from tok cross join n
            group by term, n.n_docs
        )
        select doc_id, term as top_term, round(tf.tf * idf.idf, 6) as tfidf
        from tf join idf using (term)
        qualify row_number() over (partition by doc_id
                                   order by tf.tf * idf.idf desc, term asc) = 1
    """,
)
def llm_tfidf_top_term(spark, sf_dir):
    """#140 tf-idf join-back: the highest-tf-idf term per document
    (ties by term asc; doubles are bit-identical across engines so the
    ordering is deterministic).

    Scale: both tf and idf derive from the same groupBy(doc_id, term)
    rollup — df is a skew-immune two-level count (map-side combinable),
    not a count-distinct expansion over the raw token stream.  The
    rollup lineage appears in both branches (Catalyst prunes the idf
    branch's aggregate so ReuseExchange can't canonicalize them equal);
    that second pass is map-parallel scan+explode with no extra
    shuffle, which beats materializing a corpus-scale intermediate.
    idf rides back in as a broadcast of the term-idf table
    (vocabulary << corpus), then a bounded top-1 window per doc.
    """
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.expr(_TOKS_S)).alias("term"))
    n = docs.agg(F.count("*").alias("n_docs"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    idf = (
        tf.groupBy("term")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(n))
        .select("term", F.log(F.col("n_docs") / F.col("df")).alias("idf"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        (F.col("tf") * F.col("idf")).desc(), F.col("term").asc()
    )
    return (
        tf.join(F.broadcast(idf), "term")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("term").alias("top_term"),
            F.round(F.col("tf") * F.col("idf"), 6).alias("tfidf"),
        )
    )


@query(
    "llm_unigram_nll",
    oracle=f"""
        with tok as (
            select doc_id, unnest({_TOKS_D}) as w from documents
        ),
        cw as (select w, count(*) as cw from tok group by w),
        tot as (select sum(cw) as n_corpus from cw),
        scored as (
            select t.doc_id,
                   count(*) as n_tok,
                   sum(cast(round(
                       -ln(cw / cast(n_corpus as double)) * 1e9
                   ) as bigint)) as nano
            from tok t
            join cw using (w)
            cross join tot
            group by t.doc_id
        )
        select doc_id,
               cast(n_tok as bigint) as n_tok,
               round(nano / n_tok / 1e9, 6) as nll_nats,
               cast(least(9, floor(nano / n_tok / 1e9)) as int) as ppl_bucket
        from scored
    """,
)
def llm_unigram_nll(spark, sf_dir):
    """CCNet-style unigram language-model scoring: each document's
    mean negative log-likelihood under the corpus's own unigram
    distribution — the perplexity-proxy quality signal used to bucket
    web text against a reference distribution (docs full of rare
    tokens score high; templated/common text scores low).  The bucket
    column is the coarse filter knob (keep buckets 0-N).

    Determinism: per-token contributions are rounded to integer
    nano-nats and summed as bigint (the llm_word_entropy policy —
    order-free, so partitioning/AQE cannot flip the hash); the final
    mean divides two exact integers in IEEE double, identical in both
    engines.

    Scale: the unigram table is one map-side-combinable groupBy of the
    token stream; its grand total joins back as a broadcast one-row
    frame (never a driver-side collect).  The token→prob join is on
    the word — at 100 TB the real deployment truncates to a top-V
    vocabulary + OOV smoothing mass, making the prob table a
    megabyte-scale broadcast exactly like the idf table above; the
    full-vocab equi-join here is the same plan with V unbounded."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.expr(_TOKS_S)).alias("w"))
    cw = tok.groupBy("w").agg(F.count("*").alias("cw"))
    tot = cw.agg(F.sum("cw").alias("n_corpus"))
    contrib = F.round(
        -F.log(F.col("cw") / F.col("n_corpus").cast("double")) * 1e9
    ).cast("bigint")
    scored = (
        tok.join(cw, "w")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            F.sum(contrib).alias("nano"),
        )
    )
    mean_nll = F.col("nano") / F.col("n_tok") / F.lit(1e9)
    return scored.select(
        "doc_id",
        F.col("n_tok").cast("bigint").alias("n_tok"),
        F.round(mean_nll, 6).alias("nll_nats"),
        F.least(F.lit(9).cast("bigint"), F.floor(mean_nll))
        .cast("int")
        .alias("ppl_bucket"),
    )


# ---------------------------------------------------------------------------
# §2.11 #139 — multimodal binary columns
# ---------------------------------------------------------------------------


@query(
    "llm_multimodal_binary",
    oracle="""
        select doc_id,
               octet_length(encode(text)) as n_bytes,
               sha256(text) as digest,
               substr(md5(text), 1, 8) as chunk_key
        from documents
        where n_chars >= 100
    """,
)
def llm_multimodal_binary(spark, sf_dir):
    """#139 multimodal columns: payloads ride through the pipeline as
    opaque BinaryType with typed metadata (byte length, content digest,
    a routing key) — the text column stands in for an image/audio blob
    here; the decode/feature stage is the Pandas-UDF path in
    sparketl.operators.multimodal (the actual image libs are stubbed
    per the brief; the Spark-side schema/partitioning/batching is real).

    Scale: binary payloads are never exploded or shuffled by value —
    only their metadata moves; routing uses the digest-derived
    chunk_key so re-partitioning is by 8-byte keys, not megabyte blobs.
    """
    docs = table(spark, sf_dir, "documents")
    return (
        docs.where(F.col("n_chars") >= 100)
        .select("doc_id", F.encode("text", "UTF-8").alias("payload"), "text")
        .select(
            "doc_id",
            F.length("payload").alias("n_bytes"),
            F.sha2("text", 256).alias("digest"),
            F.substring(F.md5("text"), 1, 8).alias("chunk_key"),
        )
    )


# ---------------------------------------------------------------------------
# §2.11 north-star extensions: chunking, redaction, IVF centroids
# ---------------------------------------------------------------------------


@query(
    "llm_doc_chunking",
    oracle=f"""
        with t as (
            select doc_id, {_TOKS_D} as toks, len({_TOKS_D}) as n
            from documents
        ),
        c as (
            select doc_id, n, unnest(generate_series(0,
                       cast(greatest(ceil((n - 8) / 8.0), 0) as bigint))) as ci
            from t
        )
        select c.doc_id, ci as chunk_id,
               ci * 8 + 1 as start_tok,
               least(ci * 8 + 16, t.n) as end_tok,
               array_to_string(list_slice(t.toks, ci * 8 + 1,
                                          least(ci * 8 + 16, t.n)), ' ') as chunk_text
        from c join t using (doc_id)
    """,
)
def llm_doc_chunking(spark, sf_dir):
    """North-star document chunking: overlapping 16-token windows with
    stride 8 (the standard context-window prep for embedding/training
    pipelines).  Chunk count per doc = ceil((n-8)/8) [+1 for ci=0],
    computed arithmetically so the explode is bounded and predictable.

    Scale: narrow map + explode with ~n/8 fan-out — shuffle-free; chunk
    ids are (doc_id, chunk_id) so downstream dedup/embedding stages
    key on 16 bytes.  NB Spark ``slice`` takes (start, LENGTH) while
    DuckDB ``list_slice`` takes (start, STOP) — SURVEY.md §2.9 #108
    trap, resolved here on both sides."""
    docs = table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.expr(_TOKS_S).alias("toks"),
        F.expr(f"size({_TOKS_S})").alias("n"),
    )
    c = t.select(
        "doc_id",
        "toks",
        "n",
        F.explode(
            F.expr(
                "sequence(cast(0 as bigint), "
                "cast(greatest(ceil((n - 8) / 8.0), 0) as bigint))"
            )
        ).alias("ci"),
    )
    return c.select(
        "doc_id",
        F.col("ci").alias("chunk_id"),
        (F.col("ci") * 8 + 1).alias("start_tok"),
        F.least(F.col("ci") * 8 + 16, F.col("n")).alias("end_tok"),
        F.array_join(
            F.expr(
                "slice(toks, cast(ci * 8 + 1 as int), "
                "cast(least(ci * 8 + 16, n) - (ci * 8 + 1) + 1 as int))"
            ),
            " ",
        ).alias("chunk_text"),
    )


@query(
    "llm_pii_redaction",
    oracle="""
        select doc_id,
               regexp_replace(
                   regexp_replace(text, '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g'),
                   '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<ID>', 'g') as redacted,
               len(regexp_extract_all(text, '[a-z0-9.]+@[a-z0-9.]+')) as n_emails,
               length(text) as orig_len
        from documents
        where doc_id < 200
    """,
)
def llm_pii_redaction(spark, sf_dir):
    """North-star PII scrubbing: regex redaction of email/ID patterns +
    a hit count — the pre-training compliance pass.  (Fixture text has
    no PII; the operator is the point.)  Narrow map, no shuffle; Spark
    regexp_replace is global by default, DuckDB needs the 'g' flag —
    pinned equal here."""
    docs = table(spark, sf_dir, "documents")
    return docs.where(F.col("doc_id") < 200).select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(
                F.col("text"), "[a-z0-9.]+@[a-z0-9.]+", "<EMAIL>"
            ),
            r"\b\d{3}-\d{2}-\d{4}\b",
            "<ID>",
        ).alias("redacted"),
        F.expr("size(regexp_extract_all(text, '[a-z0-9.]+@[a-z0-9.]+', 0))").alias(
            "n_emails"
        ),
        F.length("text").alias("orig_len"),
    )


@query(
    "llm_ivf_centroids",
    oracle=f"""
        with e as (
            select label, embedding from embeddings
        ),
        sums as (
            select label, i,
                   round(sum(embedding[i]::double), 6) as s,
                   count(*) as n
            from e cross join unnest(generate_series(1, 64)) as u(i)
            group by label, i
        )
        select label, i as dim, round(s / n, 6) as centroid_val, n as n_vecs
        from sums
        where i <= 4
    """,
)
def llm_ivf_centroids(spark, sf_dir):
    """North-star IVF index build step: per-label centroid of the
    embedding vectors (labels stand in for k-means cluster assignments,
    FIXTURES.md).  Emitted long-form (label, dim, value) for the first
    4 dims so the oracle compare stays exact; the full 64-dim centroid
    array is the same aggregation without the dim filter.

    Float note: per-dimension sums cross partitions, so bare double
    sums would be order-dependent — rounded at 6 on BOTH sides, and
    each dimension sums <= n_vecs values of magnitude <= 1 so the
    rounding absorbs reorder noise.

    Scale: explode(64) + map-side-combined groupBy((label, dim)) — the
    canonical distributed centroid step of k-means/IVF training; the
    result (k x 64 rows) broadcasts back for assignment."""
    emb = _parallel(table(spark, sf_dir, "embeddings"))
    e = emb.select(
        "label",
        F.posexplode(F.col("embedding")).alias("i0", "v"),
    ).select("label", (F.col("i0") + 1).alias("dim"), F.col("v"))
    return (
        e.groupBy("label", "dim")
        .agg(
            F.round(F.sum(F.col("v").cast("double")), 6).alias("s"),
            F.count("*").alias("n_vecs"),
        )
        .where(F.col("dim") <= 4)
        .select(
            "label",
            "dim",
            F.round(F.col("s") / F.col("n_vecs"), 6).alias("centroid_val"),
            "n_vecs",
        )
    )


# squared-L2 distance to a centroid vector, same ordered-fold contract
# as _DOT_S/_DOT_D (bit-exact across engines given identical inputs)
_L2_S = (
    "aggregate(zip_with({a}, {b}, (x, y) -> "
    "(cast(x as double) - y) * (cast(x as double) - y)), "
    "cast(0 as double), (s, x) -> s + x)"
)
_L2_D = (
    "list_sum(list_transform(generate_series(1, 64), "
    "i -> ({a}[i]::double - {b}[i]) * ({a}[i]::double - {b}[i])))"
)

#: collected codebook cache for the IVF/PQ family, keyed by
#: (session id, sf_dir) — see _centroids().  Contract (shared with
#: curation._CC_MEMO and tables._CATALOG_CACHE): sf_dir contents are
#: immutable for the life of the session; bench clears it per timed
#: pass so every pass pays the codebook build exactly once.
_CEN_CACHE: dict = {}


def clear_cen_cache() -> None:
    """Drop memoized centroid codebooks (bench calls this per pass)."""
    _CEN_CACHE.clear()


def _centroids(spark, sf_dir):
    """The per-label centroid codebook as DRIVER-SIDE values: a sorted
    list of (label, [64 rounded doubles]).

    The IVF/PQ search family (llm_ivf_search, _search_nprobe,
    llm_pq_codes, llm_pq_adc_search) all consume the identical k x 64
    codebook.  Re-deriving it inside each query costs a corpus-scan
    aggregation PLUS a broadcast-exchange build job per consumer — and
    the queries that reference the codebook on both sides of a
    self-join paid it twice (round-5 verdict: 10-12x per-query job
    overhead vs referent).  The codebook is METADATA-sized (k=10
    labels x 64 doubles, rounded at 6 so partition-order noise is
    absorbed — same values the in-plan aggregation produced), so this
    is the one sanctioned driver collect: k x 64 scalars, independent
    of corpus size, computed once per (session, sf_dir) and inlined as
    a literal codebook in every consumer.  At 100 TB the centroid
    aggregation still runs distributed exactly as llm_ivf_centroids
    does; only its k x 64-scalar RESULT ever touches the driver."""
    key = (id(spark), sf_dir)
    if key not in _CEN_CACHE:
        emb = _parallel(table(spark, sf_dir, "embeddings"))
        cen = (
            emb.select("label", F.posexplode(F.col("embedding")).alias("i0", "v"))
            .groupBy("label", (F.col("i0") + 1).alias("dim"))
            .agg(
                F.round(
                    F.round(F.sum(F.col("v").cast("double")), 6) / F.count("*"), 6
                ).alias("c")
            )
            .groupBy(F.col("label").alias("c_label"))
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(dim, c))), s -> s.c)"
                ).alias("cvec")
            )
        )
        _CEN_CACHE[key] = sorted(
            ((int(r.c_label), [float(x) for x in r.cvec]) for r in cen.collect())
        )
    return _CEN_CACHE[key]


def _dlit(v: float) -> str:
    """Spark SQL double literal (repr round-trips the exact double)."""
    return f"{v!r}D"


def _cens_expr(cens) -> str:
    """``array<struct<c_label:int, cvec:array<double>>>`` literal SQL —
    the in-expression form of the codebook (replaces the former
    crossJoin(broadcast(one-row-agg)) with a constant)."""
    entries = ", ".join(
        "named_struct('c_label', cast(%d as int), 'cvec', array(%s))"
        % (lbl, ", ".join(_dlit(v) for v in vec))
        for lbl, vec in cens
    )
    return f"array({entries})"


def _cen_frame(spark, cens):
    """The codebook as a (c_label, cvec) LOCAL relation — for consumers
    that need it as a joinable frame (broadcast of a LocalTableScan:
    no corpus scan, no aggregation job)."""
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("c_label", IntegerType(), False),
            StructField("cvec", ArrayType(DoubleType(), False), False),
        ]
    )
    return spark.createDataFrame(list(cens), schema)

@query(
    "llm_ivf_search",
    oracle=f"""
        with cen_long as (
            select label, i,
                   round(round(sum(embedding[i]::double), 6) / count(*), 6) as c
            from embeddings cross join unnest(generate_series(1, 64)) as u(i)
            group by label, i
        ),
        cen as (
            select label as c_label, list(c order by i) as cvec
            from cen_long group by label
        ),
        e as (
            select vec_id, embedding,
                   {_NORM2_D.format(a='embedding')} as norm2
            from embeddings
        ),
        assigned as (
            select vec_id, embedding, norm2, c_label,
                   row_number() over (
                       partition by vec_id
                       order by {_L2_D.format(a='embedding', b='cvec')} asc,
                                c_label asc) as rn
            from e cross join cen
            qualify rn = 1
        ),
        scored as (
            select q.vec_id as query_id, c.vec_id as neighbor_id,
                   round({_DOT_D.format(a='q.embedding', b='c.embedding')}
                         / sqrt(q.norm2 * c.norm2), 6) as cos_sim
            from assigned q join assigned c
              on q.c_label = c.c_label and q.vec_id <> c.vec_id
            where q.vec_id % 25 = 0
        )
        select query_id, neighbor_id, cos_sim,
               row_number() over (partition by query_id
                                  order by cos_sim desc, neighbor_id asc) as rnk
        from scored
        qualify rnk <= 3
    """,
)
def llm_ivf_search(spark, sf_dir):
    """#137 second ANN path — IVF assignment + search, consuming the
    centroid build step (llm_ivf_centroids is the long-form view of the
    same aggregation): (1) per-label centroids as 64-dim arrays,
    (2) every vector assigned to its nearest centroid by squared-L2
    (10-row centroid table broadcast; ties broken by label), (3) top-3
    cosine neighbors searched WITHIN the query's cluster only.
    Deterministic end-to-end — centroids are order-noise-rounded, and
    all distances are ordered folds over identical doubles — so this
    'approximate' index is hash-graded exactly, like ANN-LSH.

    Scale: the canonical IVF plan.  Centroids: the _centroids() literal
    codebook (computed distributed, k x 64 scalars collected once per
    session — no per-query broadcast-build job).  Assignment: a local
    argmin over the constant codebook — a narrow map, no shuffle of
    the corpus.  Search: equi-join on assigned cluster ~ n^2/k scored
    pairs instead of n^2; nprobe>1 (probing the next-nearest clusters
    too) generalizes by keeping rn <= nprobe assignments for the QUERY
    side only.  k ~ sqrt(n) measured round 8 via scripts/k_sweep.py +
    ivf_search_frame (SCALING.md 'k ~ sqrt(n)' table).
    """
    return ivf_search_frame(spark, sf_dir, _centroids(spark, sf_dir))


def ivf_search_frame(spark, sf_dir, cens, np_assign: bool = False):
    """Codebook-parameterized IVF search core (see llm_ivf_search;
    scripts/k_sweep.py binds kmeans_train codebooks).  ``np_assign``
    swaps the HOF argmin for :func:`_np_assign` — checksum-identical,
    the scale path at production k ~ sqrt(n)."""
    from pyspark.sql import Window

    # _maybe_parallel: see the helper for the stress-run rationale.
    emb = _maybe_parallel(table(spark, sf_dir, "embeddings"), sf_dir)
    # assignment is a TRUE narrow map: the codebook is a literal, and
    # each vector picks its nearest centroid with the shared
    # _assign_expr argmin.  The corpus is never shuffled, and because
    # `assigned` feeds BOTH sides of the cluster self-join below, the
    # literal also halves the old per-side centroid-subtree recompute
    # — the exact plan the 100-TB claim requires.
    if np_assign:
        assigned = _np_assign(
            emb.select("vec_id", "embedding"), cens, out_col="c_label"
        )
    else:
        cens_lit = _cens_expr(cens)
        assigned = emb.select(
            "vec_id",
            "embedding",
            F.expr(_NORM2_S.format(a="embedding")).alias("norm2"),
            F.expr(_assign_expr(cens_lit)).alias("c_label"),
        )
    q = assigned.where(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm2").alias("q_norm2"),
        F.col("c_label").alias("q_label"),
    )
    scored = _ivf_cos_topk(q, assigned)
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rnk", F.row_number().over(w_rank)).where(
        F.col("rnk") <= 3
    )


def _ivf_cos_topk(probes, assigned, k=3):
    """Cogrouped numpy scorer for the IVF search family (round 7).

    The per-pair cosine was a zip_with/aggregate HOF — lambda
    expressions are CodegenFallback, so Spark interprets them at
    ~0.5 ms/pair regardless of the codegen conf (measured both ways at
    sf0.1; the HOF was the best JVM-expression option, but EVERY
    expression option pays interpretation here).  Scoring is a dense
    blocked product, so each (probe-label, cluster) pair scores in
    numpy instead — with the same bit-exactness discipline as the PQ
    ADC kernel:

    * the dot is an explicit 64-step left-to-right loop
      (acc = acc + q_i*m_i), the identical IEEE fold the zip_with/
      aggregate expression evaluates; float32→float64 conversion per
      element matches the expression's cast;
    * norms come through from the JVM-computed frame, and
      dot/sqrt(qn*mn) is the same three-op sequence as the column
      expression;
    * round-half-up at 6 decimals must match Spark's
      BigDecimal.valueOf(double) (shortest-repr decimal, HALF_UP) —
      replicated via Decimal(repr(x)) on the CANDIDATE SET ONLY: the
      kernel takes the k-th largest raw cosine as a cut and keeps
      everything >= cut − 1.1e-6 (no pair outside that band can round
      into the top-k), then orders candidates by (rounded desc,
      neighbor_id asc) — the window's exact tie-break, so
      rounding-collapsed ties (deliberately common in the 0.25-grid
      property corpora) resolve identically.

    Emits cluster-local exact top-k per (query, probed label); the
    caller's window merges probe-local winners (<= nprobe*k rows per
    query).  Measured sf0.1 warm: nprobe 1.1-1.3 s -> ~0.5 s; x10
    scales as the candidate count, numpy-speed."""
    import numpy as np
    import pandas as pd

    def score(key, probes_pdf, members_pdf):
        empty = pd.DataFrame(
            {"query_id": pd.Series(dtype="int64"),
             "neighbor_id": pd.Series(dtype="int64"),
             "cos_sim": pd.Series(dtype="float64")}
        )
        if len(probes_pdf) == 0 or len(members_pdf) == 0:
            return empty
        from decimal import ROUND_HALF_UP, Decimal

        q_mat = np.stack(probes_pdf["q_emb"].values).astype(np.float64)
        m_mat = np.stack(members_pdf["embedding"].values).astype(np.float64)
        qn = probes_pdf["q_norm2"].values.astype(np.float64)
        mn = members_pdf["norm2"].values.astype(np.float64)
        acc = np.zeros((len(q_mat), len(m_mat)))
        # dim from the data, not a constant: property corpora use
        # small-dim grid embeddings (the zip_with fold was dim-agnostic)
        for i in range(q_mat.shape[1]):
            acc = acc + q_mat[:, i][:, None] * m_mat[None, :, i]
        cos = acc / np.sqrt(qn[:, None] * mn[None, :])
        qid = probes_pdf["query_id"].values.astype(np.int64)
        vid = members_pdf["vec_id"].values.astype(np.int64)
        rq, rn, rc = [], [], []
        for r in range(len(q_mat)):
            mask = vid != qid[r]
            c, v = cos[r][mask], vid[mask]
            if len(c) == 0:
                continue
            kk = min(k, len(c))
            cut = np.partition(c, len(c) - kk)[len(c) - kk]
            cand = c >= cut - 1.1e-6
            cc, cv = c[cand], v[cand]
            rounded = [
                float(
                    Decimal(repr(x)).quantize(
                        Decimal("0.000001"), ROUND_HALF_UP
                    )
                )
                for x in cc
            ]
            order = sorted(
                range(len(cc)), key=lambda j: (-rounded[j], cv[j])
            )[:kk]
            rq += [int(qid[r])] * len(order)
            rn += [int(cv[j]) for j in order]
            rc += [rounded[j] for j in order]
        if not rq:
            return empty
        return pd.DataFrame(
            {"query_id": rq, "neighbor_id": rn, "cos_sim": rc}
        )

    return (
        probes.groupBy("q_label")
        .cogroup(assigned.groupBy("c_label"))
        .applyInPandas(score, "query_id long, neighbor_id long, cos_sim double")
    )


@query(
    "llm_ivf_search_nprobe",
    oracle=f"""
        with cen_long as (
            select label, i,
                   round(round(sum(embedding[i]::double), 6) / count(*), 6) as c
            from embeddings cross join unnest(generate_series(1, 64)) as u(i)
            group by label, i
        ),
        cen as (
            select label as c_label, list(c order by i) as cvec
            from cen_long group by label
        ),
        e as (
            select vec_id, embedding,
                   {_NORM2_D.format(a='embedding')} as norm2
            from embeddings
        ),
        ranked as (
            select vec_id, embedding, norm2, c_label,
                   row_number() over (
                       partition by vec_id
                       order by {_L2_D.format(a='embedding', b='cvec')} asc,
                                c_label asc) as rn
            from e cross join cen
        ),
        assigned as (
            select vec_id, embedding, norm2, c_label
            from ranked where rn = 1
        ),
        probes as (
            select vec_id, embedding, norm2, c_label
            from ranked where rn <= 2 and vec_id % 25 = 0
        ),
        scored as (
            select q.vec_id as query_id, c.vec_id as neighbor_id,
                   round({_DOT_D.format(a='q.embedding', b='c.embedding')}
                         / sqrt(q.norm2 * c.norm2), 6) as cos_sim
            from probes q join assigned c
              on q.c_label = c.c_label and q.vec_id <> c.vec_id
        )
        select query_id, neighbor_id, cos_sim,
               row_number() over (partition by query_id
                                  order by cos_sim desc, neighbor_id asc) as rnk
        from scored
        qualify rnk <= 3
    """,
)
def llm_ivf_search_nprobe(spark, sf_dir):
    """#137 IVF search with nprobe=2 — the accuracy/cost knob that makes
    IVF usable in production: each QUERY probes its two nearest
    clusters while the corpus stays single-assigned, so candidate
    volume is ~2 n^2/k (vs n^2/k at nprobe=1) and recall recovers the
    neighbors that fall just across a Voronoi boundary.  Same
    deterministic contract as llm_ivf_search (rounded centroids,
    ordered-fold distances, full tie-breaks) so the probe expansion is
    hash-graded exactly.

    Scale: identical to llm_ivf_search plus a 2x fan-out on the QUERY
    side only (queries are the small side by construction); the corpus
    is still never shuffled for assignment and the candidate join stays
    a cluster-key equi-join.
    """
    # _maybe_parallel: see the helper for the stress-run rationale.
    emb = _maybe_parallel(table(spark, sf_dir, "embeddings"), sf_dir)
    e = emb.select(
        "vec_id",
        "embedding",
        F.expr(_NORM2_S.format(a="embedding")).alias("norm2"),
    )
    l2_in = _L2_S.format(a="embedding", b="cn.cvec")
    cens_lit = _cens_expr(_centroids(spark, sf_dir))
    ranked_expr = (
        f"array_sort(transform({cens_lit}, "
        f"cn -> struct({l2_in} as d, cn.c_label as l)))"
    )
    assigned = e.select(
        "vec_id",
        "embedding",
        "norm2",
        F.expr(f"{ranked_expr}[0].l").alias("c_label"),
    )
    probes = (
        e.where(F.col("vec_id") % 25 == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("norm2").alias("q_norm2"),
            F.explode(
                F.expr(f"transform(slice({ranked_expr}, 1, 2), s -> s.l)")
            ).alias("q_label"),
        )
    )
    scored = _ivf_cos_topk(probes, assigned)
    from pyspark.sql import Window

    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rnk", F.row_number().over(w_rank)).where(
        F.col("rnk") <= 3
    )


@query(
    "llm_pq_codes",
    oracle=f"""
        with cen_long as (
            select label, i,
                   round(round(sum(embedding[i]::double), 6) / count(*), 6) as c
            from embeddings cross join unnest(generate_series(1, 64)) as u(i)
            group by label, i
        ),
        cen as (
            select label as c_label, list(c order by i) as cvec
            from cen_long group by label
        ),
        d as (
            select e.vec_id, m.m, c.c_label,
                   list_sum(list_transform(generate_series(m.m * 8 + 1,
                                                           m.m * 8 + 8),
                       i -> (e.embedding[i]::double - c.cvec[i])
                            * (e.embedding[i]::double - c.cvec[i]))) as dist
            from embeddings e
            cross join (select unnest(generate_series(0, 7)) as m) m
            cross join cen c
        ),
        best as (
            select vec_id, m, c_label, dist,
                   row_number() over (partition by vec_id, m
                                      order by dist asc, c_label asc) as rn
            from d
            qualify rn = 1
        )
        select vec_id,
               string_agg(c_label::varchar, ',' order by m) as codes,
               cast(sum(cast(round(dist * 1e9) as bigint)) as bigint)
                   as err_nano
        from best
        group by vec_id
    """,
)
def llm_pq_codes(spark, sf_dir):
    """#137-family PRODUCT QUANTIZATION encode: each 64-dim vector is
    split into 8 subvectors of 8 dims; every subvector is replaced by
    the id of its nearest subspace codeword (the per-label centroids
    restricted to that subspace — labels stand in for learned
    codebooks exactly as in IVF), compressing a vector to 8 small
    codes — the memory-bound ANN representation (IVF-PQ) that serves
    billion-vector indexes from RAM.  err_nano is the total squared
    reconstruction distance in exact integer nano-units (the
    exact-cents policy, so the fp-order-sensitive sum of 8 subspace
    distances is order-free and hash-exact).

    Scale: with the _centroids() literal codebook, encoding is a pure
    narrow map — each vector computes 8 local argmins over a constant;
    no shuffle (and no broadcast-build job) at any point.  Distances
    are ordered folds over identical doubles on both engines; code
    ties break by label asc.
    """
    # _maybe_parallel: see the helper for the stress-run rationale.
    emb = _maybe_parallel(table(spark, sf_dir, "embeddings"), sf_dir)
    sub_l2 = (
        "aggregate(zip_with(slice(embedding, m * 8 + 1, 8), "
        "slice(cn.cvec, m * 8 + 1, 8), "
        "(x, y) -> (cast(x as double) - y) * (cast(x as double) - y)), "
        "cast(0 as double), (acc, t) -> acc + t)"
    )
    cens_lit = _cens_expr(_centroids(spark, sf_dir))
    pq_expr = (
        f"transform(sequence(0, 7), m -> "
        f"array_sort(transform({cens_lit}, cn -> "
        f"struct({sub_l2} as d, cn.c_label as l)))[0])"
    )
    return (
        emb.select("vec_id", F.expr(pq_expr).alias("pq"))
        .select(
            "vec_id",
            F.expr(
                "array_join(transform(pq, s -> cast(s.l as string)), ',')"
            ).alias("codes"),
            F.expr(
                "aggregate(pq, cast(0 as bigint), "
                "(acc, s) -> acc + cast(round(s.d * 1e9) as bigint))"
            ).alias("err_nano"),
        )
    )


@query(
    "llm_pq_adc_search",
    oracle=f"""
        with cen_long as (
            select label, i,
                   round(round(sum(embedding[i]::double), 6) / count(*), 6) as c
            from embeddings cross join unnest(generate_series(1, 64)) as u(i)
            group by label, i
        ),
        cen as (
            select label as c_label, list(c order by i) as cvec
            from cen_long group by label
        ),
        d as (
            select e.vec_id, m.m, c.c_label,
                   list_sum(list_transform(generate_series(m.m * 8 + 1,
                                                           m.m * 8 + 8),
                       i -> (e.embedding[i]::double - c.cvec[i])
                            * (e.embedding[i]::double - c.cvec[i]))) as dist
            from embeddings e
            cross join (select unnest(generate_series(0, 7)) as m) m
            cross join cen c
        ),
        codes as (
            select vec_id, m, c_label as code
            from d
            qualify row_number() over (partition by vec_id, m
                                       order by dist asc, c_label asc) = 1
        ),
        adc as (
            select q.vec_id as query_id, c.vec_id as neighbor_id,
                   cast(sum(cast(round(list_sum(list_transform(
                       generate_series(c.m * 8 + 1, c.m * 8 + 8),
                       i -> (q.embedding[i]::double - cb.cvec[i])
                            * (q.embedding[i]::double - cb.cvec[i])))
                       * 1e9) as bigint)) as bigint) as adc_nano
            from embeddings q
            join codes c on c.vec_id <> q.vec_id
            join cen cb on cb.c_label = c.code
            where q.vec_id % 25 = 0
            group by q.vec_id, c.vec_id
        )
        select query_id, neighbor_id, adc_nano,
               row_number() over (partition by query_id
                                  order by adc_nano asc, neighbor_id asc)
                   as rnk
        from adc
        qualify rnk <= 3
    """,
)
def llm_pq_adc_search(spark, sf_dir):
    """#137-family IVF-PQ search side — ASYMMETRIC DISTANCE
    COMPUTATION: the full-precision query scores every PQ-coded corpus
    vector as the sum over subspaces of L2(query_subvector,
    codeword[code_m]) — the corpus side is never decompressed, which
    is the entire point of PQ (the index stays 8 bytes/vector).
    Per-subspace distances round to integer nano-units before the
    8-term sum, so ADC scores are exact bigints (order-free) and the
    top-3 per query is hash-graded with full tie-breaks.

    Scale: the true production ADC shape — each query precomputes its
    k x M distance LOOKUP TABLE once, and scoring the corpus is table
    lookups over the 8-small-int code rows.  The LUT is computed
    RELATIONALLY (crossJoin with the codebook frame + the exact
    round-to-nano expression, so the rounding engine is Spark, not
    Python) and collected: it is query-set-sized (|Q| x k x M exact
    bigints — queries are the small side by construction, like the
    _centroids() codebook).  The corpus-side encode + gather runs as
    ONE Arrow-vectorized mapInPandas over the scan: lambda-based
    higher-order functions are CodegenFallback (interpreted per row,
    measured ~0.5s/2k rows locally), while the numpy kernel replays
    the identical left-to-right IEEE fold per element — bit-exact vs
    the oracle — at vector speed.  No shuffle anywhere before the
    query-key top-3; at 100 TB it composes with IVF cluster pruning
    (llm_ivf_search) so each query touches one cluster's codes, not
    the corpus.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window

    emb = table(spark, sf_dir, "embeddings")
    cens = _centroids(spark, sf_dir)
    labels = [l for l, _ in cens]
    cmat = np.array([v for _, v in cens], dtype=np.float64)  # k x 64
    q_sub_l2 = (
        "aggregate(zip_with(slice(q_emb, m * 8 + 1, 8), "
        "slice(cvec, m * 8 + 1, 8), "
        "(x, y) -> (cast(x as double) - y) * (cast(x as double) - y)), "
        "cast(0 as double), (acc, t) -> acc + t)"
    )
    qlut = (
        emb.where(F.col("vec_id") % 25 == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
        )
        .crossJoin(F.broadcast(_cen_frame(spark, cens)))
        .select(
            "query_id",
            "q_emb",
            "c_label",
            "cvec",
            F.explode(F.expr("sequence(0, 7)")).alias("m"),
        )
        .select(
            "query_id",
            "c_label",
            "m",
            F.expr(f"cast(round({q_sub_l2} * 1e9) as bigint)").alias("d_nano"),
        )
    )
    lidx = {l: i for i, l in enumerate(labels)}
    lut_rows = qlut.collect()
    qids = sorted({r.query_id for r in lut_rows})
    qidx = {q: i for i, q in enumerate(qids)}
    lut = np.zeros((len(qids), 8, len(labels)), dtype=np.int64)
    for r in lut_rows:
        lut[qidx[r.query_id], r.m, lidx[r.c_label]] = r.d_nano
    qarr = np.array(qids, dtype=np.int64)

    def score(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            x = np.stack(pdf["embedding"].values).astype(np.float64)
            # PQ encode: argmin codeword per subspace.  The fold is the
            # same left-to-right acc + (x-y)*(x-y) per element as the
            # Spark/DuckDB expression (elementwise numpy ops preserve
            # per-element order), so distances are bit-identical and
            # np.argmin's first-minimum == label-asc tie-break (the
            # codebook rows are label-sorted).
            pos = np.empty((n, 8), dtype=np.int64)
            for m in range(8):
                acc = np.zeros((n, cmat.shape[0]))
                for i in range(8):
                    d = x[:, m * 8 + i][:, None] - cmat[None, :, m * 8 + i]
                    acc = acc + d * d
                pos[:, m] = np.argmin(acc, axis=1)
            s = np.zeros((len(qarr), n), dtype=np.int64)
            for m in range(8):
                s += lut[:, m, :][:, pos[:, m]]
            vid = pdf["vec_id"].values.astype(np.int64)
            # batch-local EXACT top-3 per query (round-7 scale fix,
            # SCALING.md): emitting all |Q| x n scored rows shipped
            # 16M rows through Arrow into the window sort at the 10x
            # corpus (24-30 s); any global top-3 row is necessarily in
            # its batch's top-3, so emit only those and let the final
            # window merge batch winners.  Exactness under ties: take
            # the 3rd-smallest score as the cut, keep EVERYTHING at or
            # below it, and lexsort those few by (score, neighbor_id)
            # — identical to the window's full tie-break.
            qi_l, nb_l, sc_l = [], [], []
            for qrow in range(len(qarr)):
                srow = s[qrow]
                self_mask = vid != qarr[qrow]
                sv, vv = srow[self_mask], vid[self_mask]
                if len(sv) == 0:
                    continue
                k = min(3, len(sv))
                cut = np.partition(sv, k - 1)[k - 1]
                m2 = sv <= cut
                cs, cv = sv[m2], vv[m2]
                order = np.lexsort((cv, cs))[:k]
                qi_l.append(np.full(k, qarr[qrow]))
                nb_l.append(cv[order])
                sc_l.append(cs[order])
            if not qi_l:
                continue
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(qi_l),
                    "neighbor_id": np.concatenate(nb_l),
                    "adc_nano": np.concatenate(sc_l),
                }
            )

    scored = emb.select("vec_id", "embedding").mapInPandas(
        score, "query_id long, neighbor_id long, adc_nano long"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_nano").asc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= 3
    )


# ---------------------------------------------------------------------------
# §2.11 #137 — multi-probe LSH (SURVEY.md §8 candidate)
# ---------------------------------------------------------------------------


def _multiprobe_oracle_sql() -> str:
    """DuckDB replay of multi-probe ANN: identical literal hyperplanes,
    query probes its own bucket plus all 8 Hamming-distance-1 buckets."""
    planes = _hyperplanes()
    planes_sql = (
        "[" + ", ".join(
            "[" + ", ".join(f"{v:.1f}" for v in p) + "]::double[]" for p in planes
        ) + "]"
    )
    probes = ", ".join(f"xor(q.bucket, {1 << b})" for b in range(8))
    return f"""
        with pl as (select {planes_sql} as planes),
        e as (
            select vec_id, embedding,
                   {_NORM2_D.format(a='embedding')} as norm2,
                   list_sum(list_transform(generate_series(0, 7), p ->
                       case when list_sum(list_transform(generate_series(1, 64),
                                i -> embedding[i]::double * planes[p + 1][i])) > 0
                            then (1 << p) else 0 end)) as bucket
            from embeddings cross join pl
        ),
        scored as (
            select q.vec_id as query_id, c.vec_id as neighbor_id,
                   round({_DOT_D.format(a='q.embedding', b='c.embedding')}
                         / sqrt(q.norm2 * c.norm2), 6) as cos_sim
            from e q join e c
              on c.bucket in (q.bucket, {probes})
             and q.vec_id <> c.vec_id
            where q.vec_id % 25 = 0
        )
        select query_id, neighbor_id, cos_sim,
               row_number() over (partition by query_id
                                  order by cos_sim desc, neighbor_id asc) as rnk
        from scored
        qualify rnk <= 3
    """


@query("llm_similarity_ann_multiprobe", oracle=_multiprobe_oracle_sql())
def llm_similarity_ann_multiprobe(spark, sf_dir):
    """#137 multi-probe LSH: same 8-hyperplane bucketing as
    llm_similarity_ann_lsh, but each QUERY additionally probes the 8
    buckets at Hamming distance 1 from its own (flip one sign bit) —
    the standard recall repair for sign-LSH (a near neighbor falls on
    the far side of one hyperplane with probability ~theta/pi per
    plane, and one flipped plane is by far the most likely miss).

    Scale: recall is bought with 9 probe keys per QUERY — a 9x
    fan-out of the (small) query side's 8-byte keys, NOT more
    replicas of the corpus (corpus rows still live in exactly one
    bucket; compare index replication, which multiplies the corpus).
    The probe join stays a key-equi-join (explode -> shuffle on
    bucket), so the candidate set is ~9·n/256 per query vs n for
    brute force, and the knob (planes, probe radius) tunes
    recall/cost independently of corpus size.  Deterministic
    (sign-of-exact-double-dot buckets), so hash-graded like the
    single-probe query."""
    from pyspark.sql import Window

    emb = table(spark, sf_dir, "embeddings")
    planes = _hyperplanes()
    plane_lit = F.array(*[F.array(*[F.lit(v) for v in p]) for p in planes])
    e = (
        emb.select(
            "vec_id",
            "embedding",
            F.expr(_NORM2_S.format(a="embedding")).alias("norm2"),
            plane_lit.alias("planes"),
        )
        .withColumn(
            "bucket",
            F.expr(
                "aggregate(transform(sequence(0, 7), p -> if("
                + _DOT_S.format(a="element_at(planes, p + 1)", b="embedding")
                + " > 0, shiftleft(1, p), 0)), 0, (s, x) -> s + x)"
            ),
        )
        .drop("planes")
    )
    q = (
        e.where(F.col("vec_id") % 25 == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("norm2").alias("q_norm2"),
            # own bucket + the 8 single-bit flips
            F.explode(
                F.expr(
                    "array(bucket, "
                    + ", ".join(f"bucket ^ {1 << b}" for b in range(8))
                    + ")"
                )
            ).alias("probe_bucket"),
        )
    )
    cos = F.round(
        F.expr(_DOT_S.format(a="q_emb", b="embedding"))
        / F.sqrt(F.col("q_norm2") * F.col("norm2")),
        6,
    )
    # each corpus row lives in exactly ONE bucket and probe buckets are
    # distinct per query, so no (query, neighbor) pair can duplicate
    scored = q.join(
        e,
        (F.col("probe_bucket") == F.col("bucket"))
        & (F.col("query_id") != F.col("vec_id")),
    ).select(
        "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= 3
    )


# ---------------------------------------------------------------------------
# §2.11 #136 — df-capped n-gram Jaccard (the 100-TB skew mitigation,
# as a first-class graded operator)
# ---------------------------------------------------------------------------


@query(
    "llm_dedup_ngram_dfcap",
    oracle=f"""
        with d as materialized (
            select doc_id, lang, {_SHINGLES_D} as sh
            from documents
            where len({_TOKS_D}) >= 2
        ),
        tot as (select count(*) as n_docs from d),
        e0 as materialized (select doc_id, lang, unnest(sh) as s from d),
        dfreq as (
            select lang, s, count(*) as df
            from e0 group by lang, s
        ),
        e as (
            select e0.doc_id, e0.lang, e0.s
            from e0
            join dfreq on e0.lang = dfreq.lang and e0.s = dfreq.s
            cross join tot
            where dfreq.df <= greatest(2, cast(ceil(0.05 * tot.n_docs) as bigint))
        ),
        n as (select doc_id, count(*) as n_sh from e group by doc_id),
        inter as (
            select a.doc_id as doc_a, b.doc_id as doc_b, count(*) as n_inter
            from e a join e b
              on a.s = b.s and a.lang = b.lang and a.doc_id < b.doc_id
            group by 1, 2
        )
        select i.doc_a, i.doc_b,
               round(n_inter / (na.n_sh + nb.n_sh - n_inter), 6) as jaccard
        from inter i
        join n na on i.doc_a = na.doc_id
        join n nb on i.doc_b = nb.doc_id
        where round(n_inter / (na.n_sh + nb.n_sh - n_inter), 6) >= 0.5
    """,
)
def llm_dedup_ngram_dfcap(spark, sf_dir):
    """#136 df-capped n-gram Jaccard: identical inverted-index plan to
    llm_dedup_ngram_jaccard, but shingles whose document frequency
    exceeds max(2, ceil(5% of corpus)) are dropped from the index and
    the metric — i.e. Jaccard over the LOW-DF shingle universe, the
    standard boilerplate-removal formulation from the dedup
    literature.

    The cap is computed exactly (per-lang df, corpus count via a
    broadcast scalar — no collect), so the operator is deterministic
    and the DuckDB oracle replays it bit-for-bit: the "lossy at 100 TB"
    mitigation is itself hash-graded here.

    Scale: THE fix for the hot-shingle skew called out in
    llm_dedup_ngram_jaccard — posting-join shuffle volume is
    sum(df^2) per shingle, so one boilerplate shingle in 1% of a
    100 TB corpus generates 10^14 pair rows; capping df bounds every
    POSTING LIST, so no single shingle can dominate.  Honesty note
    from the round-7 stress run (SCALING.md): the cap bounds SKEW,
    not total volume — the cap threshold scales with corpus size, so
    a corpus whose every shingle sits just below it (the synthetic
    dense-uniform vocabulary is exactly that worst case) still pays
    Θ(sum df^2) overall.  Total volume is instead made safe by the
    shared :func:`_jaccard_pair_counts` core, which sizes both
    exchanges from the exact candidate count (measured x10: 138.7 s /
    40 GB spill -> ~70 s / zero spill)."""
    docs = table(spark, sf_dir, "documents")
    d = _parallel(docs.where(F.expr(f"size({_TOKS_S}) >= 2"))).select(
        "doc_id", "lang", F.expr(_SHINGLES_S).alias("sh")
    )
    e0 = d.select("doc_id", "lang", F.explode("sh").alias("s"))
    # planning job 1: corpus size (for the cap) + doc-id domain (BOTH
    # ends, for the packed pair key — a small max does not rule out
    # negative ids) — scalar stats, the sanctioned collect
    nd = d.agg(
        F.count("*").alias("n_docs"),
        F.max("doc_id").alias("max_id"),
        F.min("doc_id").alias("min_id"),
    ).collect()[0]
    cap = max(2, -(-5 * int(nd.n_docs) // 100))  # ceil(0.05 * n_docs)
    small = _scan_bytes(sf_dir, "documents") < _JACCARD_STATS_MIN_BYTES
    # kept = the sub-cap shingle vocabulary.  It is vocabulary-sized
    # (not postings-sized), so BROADCAST it and the postings stream is
    # never shuffled for the cap — measured 8-11s -> ~2s at sf0.1 vs
    # the previous shuffle join + cache + count join-back plan.  At
    # 100 TB a billion-term vocabulary outgrows a broadcast: drop the
    # hint and the same plan runs as a shuffle semi-join that AQE
    # skew-splits — the downstream pair-join bound is unchanged.
    dfreq = e0.groupBy("lang", "s").agg(F.count("*").alias("df"))
    if small:
        cand = None  # fast path: skip planning job 2 + repartitions
    else:
        # planning job 2: exact capped candidate volume from df table
        cand = float(
            dfreq.where(F.col("df") <= cap)
            .agg(F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("c"))
            .collect()[0]
            .c
            or 0.0
        )
    kept = dfreq.where(F.col("df") <= cap).select("lang", "s")
    # e is consumed three times (the n_sh aggregate + both self-join
    # sides); without a cache the scan+explode+semi lineage recomputes
    # per consumer.  Measured at sf0.1 steady-state: 2.88s cached vs
    # 2.97s recomputed — a wash locally, but the cache also removes the
    # 3x recompute landmine (SURVEY.md §8 #4), so keep it.  Pinned via
    # _pin(): the module keeps at most _PIN_KEEP live cache entries, so
    # repeated invocations in a long-lived session (pytest, a notebook)
    # cannot leak blocks even if the caller never clearCache()s —
    # bench.py's per-query clearCache remains a belt on top.  At 100 TB
    # the capped postings are the smallest corpus-scale intermediate in
    # this query; MEMORY_AND_DISK spills rather than OOMs if a cluster
    # can't hold them.
    e = _pin(e0.join(F.broadcast(kept), ["lang", "s"], "left_semi"))
    # capped per-doc set sizes ride back in as a broadcast (doc-count-
    # sized keys+count; at corpus scale this becomes a co-partitioned
    # sort-merge join on doc_id instead)
    n = e.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    en = e.join(F.broadcast(n), "doc_id").select(
        "doc_id", "lang", "n_sh", "s"
    )
    inter = _jaccard_pair_counts(
        spark,
        en,
        cand,
        nd.max_id if nd.min_id is not None and nd.min_id >= 0 else None,
    )
    jacc = F.round(
        F.col("n_inter") / (F.col("ssum") - F.col("n_inter")), 6
    )
    return (
        inter.select("doc_a", "doc_b", jacc.alias("jaccard"))
        .where(F.col("jaccard") >= 0.5)
    )


# ---------------------------------------------------------------------------
# north-star extensions (round 7): k-means refinement + SemDeDup
# ---------------------------------------------------------------------------

#: SemDeDup drop threshold — rounded cosine >= this within a cluster
#: marks the higher-id member a semantic duplicate.  0.35 sits between
#: the fixtures' same-label cosine bulk (<= 0.3) and max (~0.48), so
#: the drop set is non-vacuous at every fixture SF (14 / 26 / 391
#: witness pairs at sf0.001 / 0.01 / 0.1) without degenerating to
#: "drop everything".
_SEMDEDUP_TAU = 0.35


@query(
    "llm_kmeans_iterate",
    oracle=f"""
        with cen_long as (
            select label, i,
                   round(round(sum(embedding[i]::double), 6) / count(*), 6) as c
            from embeddings cross join unnest(generate_series(1, 64)) as u(i)
            group by label, i
        ),
        cen as (
            select label as c_label, list(c order by i) as cvec
            from cen_long group by label
        ),
        assigned as (
            select vec_id, label, embedding, c_label,
                   row_number() over (
                       partition by vec_id
                       order by {_L2_D.format(a='embedding', b='cvec')} asc,
                                c_label asc) as rn
            from embeddings cross join cen
            qualify rn = 1
        )
        select c_label as cluster, i as dim,
               round(round(sum(embedding[i]::double), 6) / count(*), 6)
                   as centroid_val,
               count(*) as n_vecs,
               count(*) filter (label <> c_label) as n_moved_in
        from assigned cross join unnest(generate_series(1, 64)) as u(i)
        where i <= 4
        group by c_label, i
    """,
)
def llm_kmeans_iterate(spark, sf_dir):
    """One Lloyd (k-means) refinement step — the iterative-algorithm
    face of the IVF family: every vector re-assigns to its nearest
    current centroid (squared-L2 over the session codebook, ties by
    label asc — identical argmin contract to llm_ivf_search), then
    NEW centroids are recomputed from the re-assignment.  Output is
    the long-form new codebook (first 4 dims, llm_ivf_centroids'
    compare convention) plus per-cluster membership and churn
    (``n_moved_in`` = vectors whose seed label differs from their
    assigned cluster) — the convergence metric a training loop
    monitors per iteration.

    Determinism: the codebook literal is rounded at 6 (order-noise
    absorbed, see _centroids), the argmin is an exact fold over
    identical doubles in both engines, and the new centroid means
    re-apply the round(round(sum,6)/n,6) policy — so an
    "approximate" clustering step is hash-graded exactly.

    Scale: assignment is a narrow map over the constant codebook (no
    corpus shuffle); the recompute is posexplode(64) + map-side-
    combinable groupBy((cluster, dim)) — the canonical distributed
    Lloyd iteration.  Driving k iterations loops this plan with the
    k x 64 result as the next literal codebook: per-iteration driver
    traffic is metadata-sized, exactly like _centroids."""
    emb = _maybe_parallel(table(spark, sf_dir, "embeddings"), sf_dir)
    cens_lit = _cens_expr(_centroids(spark, sf_dir))
    assigned = emb.select(
        "label",
        "embedding",
        F.expr(_assign_expr(cens_lit)).alias("cluster"),
    )
    e = assigned.select(
        "cluster",
        "label",
        F.posexplode("embedding").alias("i0", "v"),
    ).select("cluster", "label", (F.col("i0") + 1).alias("dim"), "v")
    return (
        e.groupBy("cluster", "dim")
        .agg(
            F.round(
                F.round(F.sum(F.col("v").cast("double")), 6) / F.count("*"), 6
            ).alias("centroid_val"),
            F.count("*").alias("n_vecs"),
            F.count_if(F.col("label") != F.col("cluster")).alias("n_moved_in"),
        )
        .where(F.col("dim") <= 4)
        .select("cluster", "dim", "centroid_val", "n_vecs", "n_moved_in")
    )


@query(
    "llm_semantic_dedup",
    oracle=f"""
        with cen_long as (
            select label, i,
                   round(round(sum(embedding[i]::double), 6) / count(*), 6) as c
            from embeddings cross join unnest(generate_series(1, 64)) as u(i)
            group by label, i
        ),
        cen as (
            select label as c_label, list(c order by i) as cvec
            from cen_long group by label
        ),
        e as (
            select vec_id, embedding,
                   {_NORM2_D.format(a='embedding')} as norm2
            from embeddings
        ),
        assigned as (
            select vec_id, embedding, norm2, c_label,
                   row_number() over (
                       partition by vec_id
                       order by {_L2_D.format(a='embedding', b='cvec')} asc,
                                c_label asc) as rn
            from e cross join cen
            qualify rn = 1
        ),
        dropped as (
            select b.vec_id as vec_id, min(a.vec_id) as dup_of
            from assigned a join assigned b
              on a.c_label = b.c_label and a.vec_id < b.vec_id
            where round({_DOT_D.format(a='a.embedding', b='b.embedding')}
                        / sqrt(a.norm2 * b.norm2), 6) >= {_SEMDEDUP_TAU}
            group by b.vec_id
        )
        select s.c_label as cluster, s.vec_id as vec_id,
               (d.vec_id is null) as keep,
               coalesce(d.dup_of, -1) as dup_of
        from assigned s left join dropped d on s.vec_id = d.vec_id
    """,
)
def llm_semantic_dedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding space, then deduplicate ONLY within clusters — a vector
    is dropped when a lower-id member of its own cluster has rounded
    cosine >= tau (0.35); the drop decision records its witness
    (``dup_of`` = smallest such id, -1 for kept rows).  Clusters come
    from the same nearest-centroid assignment as llm_ivf_search, so
    this is the decision layer the pairwise llm_embed_cosine_neardup
    lacks: every vector gets an explicit keep/drop verdict, ready for
    the anti-join application pass (llm_dedup_apply's shape).

    Scale: THE point of SemDeDup — the O(n^2) semantic comparison is
    confined to k independent O((n/k)^2) blocks, and k grows with the
    corpus (the codebook stays metadata-sized).  Assignment is a
    narrow map over the constant codebook; norms are computed once per
    vector (n, not n^2, folds); the drop aggregation is a map-side-
    combinable min per duplicate.  At 100 TB the same plan runs with
    IVF-trained centroids instead of label seeds — measured round 8:
    scripts/k_sweep.py trains k ~ sqrt(n) codebooks via
    kmeans_train(k=...) and re-runs THIS plan (semantic_dedup_frame)
    at x10; see SCALING.md 'k ~ sqrt(n)' table for the block-cost
    flattening vs the fixture-fixed k=10 codebook."""
    return semantic_dedup_frame(spark, sf_dir, _centroids(spark, sf_dir))


def semantic_dedup_frame(spark, sf_dir, cens, np_assign: bool = False):
    """Codebook-parameterized SemDeDup core (the declared query binds
    the per-label codebook; scripts/k_sweep.py binds kmeans_train
    codebooks with k ~ sqrt(n) — identical plan either way).
    ``np_assign`` swaps the HOF argmin for the :func:`_np_assign`
    kernel — checksum-identical output, the scale path at large k."""
    # lo=0: downstream is the per-PAIR kernel — quadratic in the
    # partition's row count — so even the smallest fixture pays for
    # spreading (measured 2.3-3.5 s on the 1-2 partition scan vs
    # 0.7-1.5 s spread, sf0.1); the pinned assigned frame keeps the
    # repartition a one-time cost, and the helper's upper band stops
    # it at real-corpus scale.
    emb = _maybe_parallel(table(spark, sf_dir, "embeddings"), sf_dir, lo=0)
    # assigned feeds BOTH self-join sides AND the final output join;
    # the k x 64-literal argmin is the expensive narrow map (SCALING.md
    # IVF finding: ~1 ms/row), so pin it once instead of recomputing
    # the subtree per consumer (measured 3.3-3.5 s -> ~1 s at sf0.1).
    if np_assign:
        assigned = _pin(_np_assign(emb.select("vec_id", "embedding"), cens))
    else:
        cens_lit = _cens_expr(cens)
        assigned = _pin(
            emb.select(
                "vec_id",
                "embedding",
                F.expr(_NORM2_S.format(a="embedding")).alias("norm2"),
                F.expr(_assign_expr(cens_lit)).alias("cluster"),
            )
        )
    dropped = _semdedup_drops(assigned)
    # the drop list is duplicate-count-sized (hundreds of rows here;
    # at corpus scale it is the semantic-dup fraction, typically a few
    # percent of n x 8 bytes) — broadcast it so the verdict join never
    # shuffles/sorts the corpus-sized assigned frame; if a corpus's
    # dup list outgrows broadcast, dropping the hint degrades to the
    # same co-partitioned join llm_dedup_apply uses.
    s = assigned.alias("s")
    d = F.broadcast(dropped).alias("d")
    return s.join(d, F.col("s.vec_id") == F.col("d.vec_id"), "left").select(
        F.col("s.cluster").alias("cluster"),
        F.col("s.vec_id").alias("vec_id"),
        F.col("d.vec_id").isNull().alias("keep"),
        F.coalesce(F.col("d.dup_of"), F.lit(-1)).alias("dup_of"),
    )


def _semdedup_drops(assigned):
    """Per-cluster numpy drop kernel for llm_semantic_dedup (round 7,
    after the x10 stress run): the JVM HOF cosine is interpreted at
    every pair (CodegenFallback, the _ivf_cos_topk finding), and
    SemDeDup's within-cluster volume grows (n/k)^2 — 13.1x wall for
    10x data with k fixed by the fixtures.  Scoring each cluster as
    one dense numpy product cuts the per-pair constant ~5x and keeps
    rows crossing the Arrow boundary to the DROPPED set only.

    Bit-exactness discipline (identical to _ivf_cos_topk):

    * the dot is a dim-ascending accumulation (acc = acc + a_i*b_i) —
      the same IEEE fold as the zip_with/aggregate expression and the
      DuckDB oracle's list_sum;
    * norms come through from the JVM-computed frame, and
      dot/sqrt(na*nb) is the same three-op sequence;
    * the tau comparison is on round-half-up-at-6 values, replicated
      via Decimal(repr(x)) ONLY on the candidate band
      raw >= tau - 1.1e-6 (no pair below the band can round up to
      tau); witnesses scan a ascending and stop at the first
      confirmed — exactly min(a).

    Scale: one task per cluster, cluster matrices are (n/k)^2 doubles
    — bounded because production k grows with n (the SemDeDup paper
    runs k ~ sqrt(n); the declared query's k is fixture-fixed).  A
    cluster too large for one task splits into tile pairs over the
    same kernel without changing semantics."""
    import numpy as np
    import pandas as pd

    def drops(pdf):
        empty = pd.DataFrame(
            {"vec_id": pd.Series(dtype="int64"),
             "dup_of": pd.Series(dtype="int64")}
        )
        if len(pdf) < 2:
            return empty
        from decimal import ROUND_HALF_UP, Decimal

        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        mat = np.stack(pdf["embedding"].values).astype(np.float64)
        nrm = pdf["norm2"].values.astype(np.float64)
        vid = pdf["vec_id"].values.astype(np.int64)
        n = len(pdf)
        acc = np.zeros((n, n))
        for i in range(mat.shape[1]):
            acc = acc + mat[:, i][:, None] * mat[None, :, i]
        cos = acc / np.sqrt(nrm[:, None] * nrm[None, :])
        band = cos >= (_SEMDEDUP_TAU - 1.1e-6)
        out_v, out_d = [], []
        for b in range(1, n):
            cand = np.nonzero(band[:b, b])[0]  # witnesses a < b, asc
            dup = -1
            for a in cand:
                r = float(
                    Decimal(repr(float(cos[a, b]))).quantize(
                        Decimal("0.000001"), ROUND_HALF_UP
                    )
                )
                if r >= _SEMDEDUP_TAU:
                    dup = int(vid[a])
                    break
            if dup >= 0:
                out_v.append(int(vid[b]))
                out_d.append(dup)
        if not out_v:
            return empty
        return pd.DataFrame({"vec_id": out_v, "dup_of": out_d})

    return assigned.groupBy("cluster").applyInPandas(
        drops, "vec_id long, dup_of long"
    )


def kmeans_train(
    spark, sf_dir, iters: int = 5, k: int | None = None, np_assign: bool = False
):
    """Drive Lloyd's algorithm to (at most) ``iters`` iterations —
    the multi-step consumer of the llm_kmeans_iterate plan, showing
    the iterative-algorithm pattern end-to-end: each iteration runs
    ONE distributed job (narrow-map assignment over the literal
    codebook + posexplode/groupBy recompute) and ships only the
    k x dim rounded codebook through the driver (the _centroids
    contract: per-iteration driver traffic is metadata-sized,
    independent of corpus size).  Stops early when the codebook is
    unchanged (exact comparison — centroids are rounded at 6, so
    fixed-point detection is deterministic, no epsilon).

    Returns (codebook, n_iters_run): codebook is the sorted
    [(cluster, [dim doubles])] list in _centroids' format, directly
    inlinable by every IVF/PQ consumer.  Always a FRESH copy — when
    the seed is already a fixed point the naive return value would be
    the _CEN_CACHE-owned list, and a caller mutating it (editing a
    centroid before re-inlining) would silently corrupt the session
    codebook every IVF/PQ declared query inlines from (round-7
    review).

    ``k`` (round 8): when given, seed with the first ``k`` corpus
    vectors by vec_id (deterministic, rounded at 6 like every
    codebook) instead of the per-label centroids — the production
    path where k grows ~ sqrt(n) with the corpus while the codebook
    stays metadata-sized (k x 64 doubles through the driver per
    iteration).  Lloyd may empty a cluster; the codebook then simply
    shrinks, which every argmin consumer handles."""
    emb = _maybe_parallel(table(spark, sf_dir, "embeddings"), sf_dir)
    if k is None:
        cens = [(lbl, list(vec)) for lbl, vec in _centroids(spark, sf_dir)]
    else:
        seed = (
            table(spark, sf_dir, "embeddings")
            .orderBy("vec_id")
            .limit(k)
            .select("embedding")
            .collect()
        )
        cens = [
            (i, [round(float(x), 6) for x in r.embedding])
            for i, r in enumerate(seed)
        ]
    for it in range(1, iters + 1):
        if np_assign:
            # the scale path at k ~ sqrt(n): HOF argmin interprets
            # k x 64 element-ops per row per iteration (measured 21 s
            # for 3 iterations at k=141/x10; numpy kernel: ~1 s)
            assigned = _np_assign(
                emb.select("vec_id", "embedding"), cens
            ).select("embedding", "cluster")
        else:
            assigned = emb.select(
                "embedding",
                F.expr(_assign_expr(_cens_expr(cens))).alias("cluster"),
            )
        new = (
            assigned.select(
                "cluster", F.posexplode("embedding").alias("i0", "v")
            )
            .groupBy("cluster", (F.col("i0") + 1).alias("dim"))
            .agg(
                F.round(
                    F.round(F.sum(F.col("v").cast("double")), 6)
                    / F.count("*"),
                    6,
                ).alias("c")
            )
            .groupBy(F.col("cluster"))
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(dim, c))), "
                    "s -> s.c)"
                ).alias("cvec")
            )
        )
        new_cens = sorted(
            (int(r.cluster), [float(x) for x in r.cvec])
            for r in new.collect()
        )
        if new_cens == cens:
            return cens, it - 1
        cens = new_cens
    return cens, iters
