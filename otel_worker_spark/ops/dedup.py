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
  shingle hashes; near-dup = small Hamming distance. Signature is a
  narrow map; the pair stage here blocks by ``lang`` (at scale:
  block by signature bands of the simhash itself).
- n-gram Jaccard: exact Jaccard on distinct shingle sets for pairs
  within a block — the verifier used on LSH candidates.

Every op has its DuckDB oracle twin in this file; hashes are the
md5-based portable ones from ``common`` so both engines agree
bit-for-bit (swap xxhash64 in production for cheaper hashing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .common import MERSENNE31, hash31_sql, minhash_perms, shingles_expr

N_PERMS = 16
N_BANDS = 4  # 4 rows per band
SHINGLE_K = 5
SIMHASH_BITS = 32


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


def _hashes_spark_sql(hash_impl: str = "md5") -> str:
    """Shingle-hash expression. ``md5`` is the portable form the DuckDB
    oracle can reproduce; ``xxhash64`` is the production form (JVM
    native, ~5-10x cheaper) with identical op structure — swap freely,
    only cross-engine verification requires md5."""
    if hash_impl == "xxhash64":
        return f"transform({_shingles_spark_sql()}, s -> pmod(xxhash64(s), {MERSENNE31}))"
    return (
        f"transform({_shingles_spark_sql()}, s ->"
        f" (CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT) % {MERSENNE31}))"
    )


def _shingles_duck_sql() -> str:
    return (
        f"list_distinct([substr(text, i, {SHINGLE_K}) "
        f"for i in range(1, greatest(1, len(text) - {SHINGLE_K - 1}) + 1)])"
    )


def _hashes_duck_sql() -> str:
    return f"[{hash31_sql('s')} for s in {_shingles_duck_sql()}]"


def minhash_signatures(documents: DataFrame, hash_impl: str = "md5") -> DataFrame:
    """doc_id → minhash signature (one narrow map job, no shuffle).

    The shingle hash array is computed ONCE into a lateral column and
    the P permutations fold over it — without this, Catalyst inlines
    the hash-array expression into every permutation (P× the work).
    """
    hashes = _hashes_spark_sql(hash_impl)
    perms = minhash_perms(N_PERMS)
    mins = [
        f"array_min(transform(hs, h -> ({a} * h + {b}) % {MERSENNE31}))"
        for (a, b) in perms
    ]
    return (
        documents.select("doc_id", F.expr(hashes).alias("hs"))
        .select("doc_id", F.expr("array(" + ", ".join(mins) + ")").alias("sig"))
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


def _minhash_sig_duck() -> str:
    perms = minhash_perms(N_PERMS)
    parts = [
        f"list_min([({a} * h + {b}) % {MERSENNE31} for h in hs])" for (a, b) in perms
    ]
    return "[" + ", ".join(parts) + "]"


def minhash_signatures_sql() -> str:
    return f"""
SELECT doc_id, {_minhash_sig_duck()} AS sig
FROM (SELECT doc_id, {_hashes_duck_sql()} AS hs FROM documents) t
"""


def minhash_lsh_pairs(
    documents: DataFrame, threshold: float = 0.5, hash_impl: str = "md5"
) -> DataFrame:
    """LSH candidate pairs + estimated Jaccard (fraction of matching
    signature components), kept when est ≥ threshold.

    Plan shape: signatures (map) → explode to (band, band_sig) →
    self-equi-join on the band bucket (shuffle on uniform band hash)
    → distinct pairs → estimate on the two 16-element signatures.
    """
    sigs = minhash_signatures(documents, hash_impl)
    rows_per_band = N_PERMS // N_BANDS
    bands = sigs.select(
        "doc_id",
        "sig",
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
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "sig", F.col("bb.band").alias("band"), F.col("bb.band_sig").alias("band_sig"))

    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(b, ["band", "band_sig"])
        .where(F.expr("a.doc_id < b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()
    )
    est = F.expr(
        f"CAST(floor(1000.0 * size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), e -> e)) / {N_PERMS}) AS INT)"
    )
    return (
        pairs.select("doc_a", "doc_b", est.alias("est_jaccard_m"))
        .where(F.col("est_jaccard_m") >= int(threshold * 1000))
    )


def minhash_lsh_pairs_sql(threshold: float = 0.5) -> str:
    rows_per_band = N_PERMS // N_BANDS
    band_sig = lambda b: (
        "concat_ws('-', "
        + ", ".join(f"sig[{b * rows_per_band + r + 1}]" for r in range(rows_per_band))
        + ")"
    )
    bands_select = " UNION ALL ".join(
        f"SELECT doc_id, sig, {b} AS band, {band_sig(b)} AS band_sig FROM sigs"
        for b in range(N_BANDS)
    )
    return f"""
WITH hs AS (SELECT doc_id, {_hashes_duck_sql()} AS hs FROM documents),
sigs AS (SELECT doc_id, {_minhash_sig_duck()} AS sig FROM hs),
bands AS ({bands_select}),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sig_a, b.sig AS sig_b
  FROM bands a JOIN bands b USING (band, band_sig)
  WHERE a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(floor(1000.0 * len(list_filter([sig_a[i] = sig_b[i] for i in range(1, {N_PERMS} + 1)], e -> e)) / {N_PERMS}) AS INT) AS est_jaccard_m
FROM pairs
WHERE CAST(floor(1000.0 * len(list_filter([sig_a[i] = sig_b[i] for i in range(1, {N_PERMS} + 1)], e -> e)) / {N_PERMS}) AS INT) >= {int(threshold * 1000)}
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
    """Near-dup pairs by SimHash Hamming distance, blocked by lang.

    (At 100 TB the block key becomes bands of the simhash itself so
    the join stays near-linear; lang-blocking demonstrates the shape.)
    """
    sigs = simhash(documents).join(documents.select("doc_id", "lang"), "doc_id")
    a, b = sigs.alias("a"), sigs.alias("b")
    return (
        a.join(b, "lang")
        .where(F.expr("a.doc_id < b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )


def simhash_near_pairs_sql(max_hamming: int = 6) -> str:
    return f"""
WITH sigs AS (
  {simhash_sql().strip().rstrip()}
), sl AS (
  SELECT s.doc_id, s.simhash, d.lang FROM sigs s JOIN documents d USING (doc_id)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sl a JOIN sl b USING (lang)
WHERE a.doc_id < b.doc_id AND bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


# ------------------------------------------------- n-gram Jaccard verify

def ngram_jaccard_pairs(documents: DataFrame, threshold: float = 0.2) -> DataFrame:
    """Exact n-gram Jaccard for pairs within the same ``source`` block
    (the verification stage run on LSH candidates at scale)."""
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
