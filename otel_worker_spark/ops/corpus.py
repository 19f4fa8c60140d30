"""Corpus-curation operators: the batch ops a training-data pipeline
runs between raw documents and a tokenized training set — sequence
packing, quality filtering, split assignment, global n-gram stats,
TF-IDF keywords, Bloom-filter decontamination, passage-level dedup,
and PII redaction.

Design rules match the rest of ``ops/``: Spark side is pure built-in
Catalyst expressions (HOFs, window functions, broadcast joins — no
Python in the hot path); every op ships its DuckDB oracle twin in this
module; float-ish outputs are floor-scaled integers so both engines
agree bit-for-bit.

Scale shapes (the 100 TB story, per op):

- ``pack_chunks``: one window aggregation PARTITIONED BY source — the
  classic "concat and chunk" LM packing (GPT-style). Each source packs
  independently and in parallel; a production layout shards hot
  sources into (source, shard) buckets so no window partition exceeds
  executor memory, then stitches shard boundaries with one tiny
  per-shard offset pass (same cumsum algebra, applied to shard totals).
- ``quality_filter`` / ``split_assign`` / ``pii_redact``: narrow maps,
  zero shuffle, pipeline with any downstream op.
- ``ngram_topk``: explode → partial+final hash agg → TakeOrdered; the
  gram key is near-uniform, the top-k never materializes a global sort.
- ``tfidf_topk``: two hash aggs (doc-term, term) + a broadcast of the
  single-row corpus count; per-doc top-k via a window partitioned by
  doc_id (bounded partitions by construction).
- ``bloom_decontaminate``: the eval side collapses to a distinct set
  of k·|grams| small ints (the Bloom bit set) that BROADCASTS; the
  corpus side probes it without shuffling a single gram string — the
  reason real pipelines bloom-ize contamination checks.
- ``passage_dedup``: digest groupBy (uniform key, one shuffle) + a
  shuffle join back on digest — CCNet-style paragraph dedup with
  fixed word windows standing in for paragraphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .common import MERSENNE31
from .text import STOPWORDS, _grams_expr, _grams_sql

#: whitespace words, empties dropped (Spark / DuckDB twins)
_WORDS = "filter(split(trim(text), '\\\\s+'), w -> w <> '')"
_WORDS_DUCK = "list_filter(string_split_regex(trim(text), '\\s+'), w -> w <> '')"


# ----------------------------------------------------------- packing

PACK_CAPACITY = 64


def pack_chunks(documents: DataFrame, capacity: int = PACK_CAPACITY) -> DataFrame:
    """GPT-style sequence packing: concatenate documents in doc_id
    order within each ``source`` and cut fixed-``capacity`` token
    chunks; documents straddle chunk boundaries. Emits one row per
    (doc, chunk) span: which chunk, at what offset, how many tokens.

    Exactly-conserving by construction: per doc the spans sum to its
    token count; every chunk except a source's last holds exactly
    ``capacity`` tokens (asserted in tests).
    """
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = (
        documents.select(
            "doc_id", "source", F.expr(f"size({_WORDS})").cast("long").alias("n_tokens")
        )
        .where(F.col("n_tokens") > 0)
        .withColumn("cum_end", F.sum("n_tokens").over(w))
        .withColumn("cum_start", F.col("cum_end") - F.col("n_tokens"))
    )
    spans = base.select(
        "source",
        "doc_id",
        "n_tokens",
        "cum_start",
        "cum_end",
        F.explode(
            F.expr(f"sequence(cum_start div {capacity}, (cum_end - 1) div {capacity})")
        ).alias("chunk_id"),
    )
    seg_start = F.greatest("cum_start", F.col("chunk_id") * capacity)
    seg_end = F.least("cum_end", (F.col("chunk_id") + 1) * capacity)
    return spans.select(
        "source",
        "chunk_id",
        "doc_id",
        "n_tokens",
        (seg_start - F.col("chunk_id") * capacity).alias("chunk_offset"),
        (seg_end - seg_start).alias("n_in_chunk"),
    )


def pack_chunks_sql(capacity: int = PACK_CAPACITY, table: str = "documents") -> str:
    return f"""
WITH base AS (
  SELECT doc_id, source, CAST(len({_WORDS_DUCK}) AS BIGINT) AS n_tokens
  FROM {table} WHERE len({_WORDS_DUCK}) > 0
), c AS (
  SELECT doc_id, source, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_end
  FROM base
), s AS (
  SELECT source, doc_id, n_tokens, cum_end - n_tokens AS cum_start, cum_end,
         unnest(range((cum_end - n_tokens) // {capacity}, (cum_end - 1) // {capacity} + 1)) AS chunk_id
  FROM c
)
SELECT source, chunk_id, doc_id, n_tokens,
       greatest(cum_start, chunk_id * {capacity}) - chunk_id * {capacity} AS chunk_offset,
       least(cum_end, (chunk_id + 1) * {capacity}) - greatest(cum_start, chunk_id * {capacity}) AS n_in_chunk
FROM s
"""


#: documents per shard for the sharded (hot-source) packing path
PACK_SHARD_DOCS = 256


def pack_chunks_sharded(
    documents: DataFrame,
    capacity: int = PACK_CAPACITY,
    shard_docs: int = PACK_SHARD_DOCS,
) -> DataFrame:
    """The PRODUCTION form of ``pack_chunks`` for hot sources — the
    shard-stitching recipe the module docstring describes, implemented
    and proven (tests pin result equality with the unsharded op).

    ``pack_chunks`` runs one cumsum window PARTITIONED BY source; a
    source with 10^9 documents makes that partition a single task.
    Here the window key is ``(source, shard)`` with ``shard =
    doc_id div shard_docs`` — monotone in doc_id, so per-source doc
    order is preserved across shards and every window partition is
    bounded by ``shard_docs`` rows. The global offsets come back via
    one TINY aggregate (one row per shard — |corpus| / shard_docs) that
    cumsums shard totals per source and BROADCASTS to the main path:

        local cumsum (bounded window)
          + shard_base (broadcast join)  =  the exact global cumsum

    Identical output, no unbounded partition anywhere; the same
    two-level algebra stitches any prefix-sum-shaped op at scale.
    """
    shard = F.expr(f"doc_id div {shard_docs}")
    base = (
        documents.select(
            "doc_id",
            "source",
            F.expr(f"size({_WORDS})").cast("long").alias("n_tokens"),
        )
        .where(F.col("n_tokens") > 0)
        .withColumn("shard", shard)
    )
    w_local = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = base.withColumn("local_end", F.sum("n_tokens").over(w_local))
    # one row per (source, shard): cumulative token count of all PRIOR
    # shards of the same source — tiny, exchanges ~|corpus|/shard_docs rows
    w_shard = (
        Window.partitionBy("source")
        .orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = (
        base.groupBy("source", "shard")
        .agg(F.sum("n_tokens").alias("shard_tokens"))
        .withColumn(
            "shard_base", F.sum("shard_tokens").over(w_shard) - F.col("shard_tokens")
        )
        .select("source", "shard", "shard_base")
    )
    stitched = local.join(F.broadcast(offsets), ["source", "shard"]).select(
        "source",
        "doc_id",
        "n_tokens",
        (F.col("shard_base") + F.col("local_end")).alias("cum_end"),
        (F.col("shard_base") + F.col("local_end") - F.col("n_tokens")).alias(
            "cum_start"
        ),
    )
    spans = stitched.select(
        "source",
        "doc_id",
        "n_tokens",
        "cum_start",
        "cum_end",
        F.explode(
            F.expr(f"sequence(cum_start div {capacity}, (cum_end - 1) div {capacity})")
        ).alias("chunk_id"),
    )
    seg_start = F.greatest("cum_start", F.col("chunk_id") * capacity)
    seg_end = F.least("cum_end", (F.col("chunk_id") + 1) * capacity)
    return spans.select(
        "source",
        "chunk_id",
        "doc_id",
        "n_tokens",
        (seg_start - F.col("chunk_id") * capacity).alias("chunk_offset"),
        (seg_end - seg_start).alias("n_in_chunk"),
    )


# ------------------------------------------------ curate-and-pack DAG


def curate_and_pack(documents: DataFrame, capacity: int = PACK_CAPACITY) -> DataFrame:
    """The end-to-end curation DAG a training-data pipeline runs, as
    ONE composed plan: quality filter → exact-dedup survivor selection
    → train-split assignment → sequence packing of what remains.

    Plan shape (the thing that matters at 100 TB): quality and split
    are narrow expressions fused into the scans; survivor selection is
    a single window over the text digest (one exchange on a uniform
    key — no join-back); packing adds its per-source window. Total:
    two hash exchanges for the whole DAG. Near-dup dedup
    (``dedup.dedup_groups``) slots in between the digest stage and the
    split when the corpus calls for it — verified standalone; the
    composed oracle stays exact-dedup so it is one closed-form SQL.
    """
    # quality keep and train-split are pure row predicates — filters
    # fused into the scan, NOT semi-joins back onto the corpus (each
    # join-back costs a doc_id exchange of the whole corpus)
    kept = documents.where(F.expr(_QF_KEEP)).withColumn("digest", F.md5("text"))
    w = Window.partitionBy("digest").orderBy("doc_id")
    survivors = (
        kept.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .drop("rn", "digest")
    )
    train = survivors.where(F.expr(_SPLIT_BUCKET) < SPLIT_BUCKETS[0])
    return pack_chunks(train, capacity)


def curate_and_pack_sql(capacity: int = PACK_CAPACITY) -> str:
    # splice the pack CTE chain after the curation CTEs (one WITH level)
    pack = pack_chunks_sql(capacity, table="train").strip()
    assert pack.startswith("WITH base AS")
    pack = pack.replace("WITH base AS", ", base AS", 1)
    return f"""
WITH q AS ({quality_filter_sql()}),
kept AS (
  SELECT d.* FROM documents d JOIN q USING (doc_id) WHERE q.keep
),
surv AS (
  SELECT * FROM (
    SELECT kept.*, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM kept
  ) s WHERE rn = 1
),
sp AS ({split_assign_sql().replace("FROM documents", "FROM surv")}),
train AS (
  SELECT surv.* FROM surv JOIN sp USING (doc_id) WHERE sp.split = 'train'
){pack}
"""


# ----------------------------------------------------- quality filter

#: Gopher-style rule thresholds (Rae et al. 2021 §A1.1 shape, tuned to
#: the fixture corpus so both keep and drop outcomes occur)
QF_MIN_TOKENS = 15
QF_MAX_TOKENS = 120
QF_MIN_MWL_M = 3000   # mean word length ≥ 3.0 chars
QF_MAX_MWL_M = 8000   # ≤ 8.0 chars

_STOP_SQL = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"
_QF_MWL = (
    f"CAST(floor(1000.0 * length(regexp_replace(text, '\\\\s', '')) / greatest(1, size({_WORDS}))) AS INT)"
)
#: the keep predicate as one inline boolean expression (used by
#: curate_and_pack as a plain filter — no join-back)
_QF_KEEP = (
    f"size({_WORDS}) >= {QF_MIN_TOKENS} AND size({_WORDS}) <= {QF_MAX_TOKENS}"
    f" AND {_QF_MWL} >= {QF_MIN_MWL_M} AND {_QF_MWL} <= {QF_MAX_MWL_M}"
    f" AND size(filter({_WORDS}, w -> w IN {_STOP_SQL})) > 0"
)


def quality_filter(documents: DataFrame) -> DataFrame:
    """Rule-based quality gate: token-count bounds, mean-word-length
    bounds, must contain at least one stopword. ``reason`` is the
    FIRST failing rule in a fixed order (NULL = keep)."""
    stop = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"
    d = documents.select(
        "doc_id",
        "source",
        F.expr(f"size({_WORDS})").alias("n_tokens"),
        F.expr(
            f"CAST(floor(1000.0 * length(regexp_replace(text, '\\\\s', '')) / greatest(1, size({_WORDS}))) AS INT)"
        ).alias("mean_wlen_m"),
        F.expr(f"size(filter({_WORDS}, w -> w IN {stop}))").alias("stopword_hits"),
    )
    reason = F.expr(
        f"CASE WHEN n_tokens < {QF_MIN_TOKENS} THEN 'too_short' "
        f"WHEN n_tokens > {QF_MAX_TOKENS} THEN 'too_long' "
        f"WHEN mean_wlen_m < {QF_MIN_MWL_M} THEN 'words_too_short' "
        f"WHEN mean_wlen_m > {QF_MAX_MWL_M} THEN 'words_too_long' "
        f"WHEN stopword_hits = 0 THEN 'no_stopwords' END"
    )
    return d.select(
        "doc_id", "source", "n_tokens", "mean_wlen_m", "stopword_hits",
        reason.alias("drop_reason"),
        reason.isNull().alias("keep"),
    )


def quality_filter_sql() -> str:
    stop = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"
    return f"""
WITH d AS (
  SELECT doc_id, source,
         len({_WORDS_DUCK}) AS n_tokens,
         CAST(floor(1000.0 * length(regexp_replace(text, '\\s', '', 'g')) / greatest(1, len({_WORDS_DUCK}))) AS INT) AS mean_wlen_m,
         len(list_filter({_WORDS_DUCK}, w -> w IN {stop})) AS stopword_hits
  FROM documents
)
SELECT doc_id, source, n_tokens, mean_wlen_m, stopword_hits,
       CASE WHEN n_tokens < {QF_MIN_TOKENS} THEN 'too_short'
            WHEN n_tokens > {QF_MAX_TOKENS} THEN 'too_long'
            WHEN mean_wlen_m < {QF_MIN_MWL_M} THEN 'words_too_short'
            WHEN mean_wlen_m > {QF_MAX_MWL_M} THEN 'words_too_long'
            WHEN stopword_hits = 0 THEN 'no_stopwords' END AS drop_reason,
       (CASE WHEN n_tokens < {QF_MIN_TOKENS} THEN 'too_short'
            WHEN n_tokens > {QF_MAX_TOKENS} THEN 'too_long'
            WHEN mean_wlen_m < {QF_MIN_MWL_M} THEN 'words_too_short'
            WHEN mean_wlen_m > {QF_MAX_MWL_M} THEN 'words_too_long'
            WHEN stopword_hits = 0 THEN 'no_stopwords' END) IS NULL AS keep
FROM d
"""


# ------------------------------------------------------ split assign

SPLIT_BUCKETS = (800, 900)  # train < 800 ≤ val < 900 ≤ test, of 1000

#: the hash bucket as one inline expression (shared by split_assign
#: and curate_and_pack's train filter)
_SPLIT_BUCKET = (
    "(CAST(conv(substring(md5(concat('split', CAST(doc_id AS STRING))), 1, 15), 16, 10)"
    " AS BIGINT)) % 1000"
)


def split_assign(documents: DataFrame) -> DataFrame:
    """Deterministic hash split (train/val/test): bucket =
    md5('split' || doc_id) mod 1000 — stable under re-runs, new data,
    and reshuffling, which is why hash splits (not row_number splits)
    are the production idiom."""
    bucket = F.expr(_SPLIT_BUCKET)
    return documents.select(
        "doc_id",
        "source",
        bucket.alias("bucket"),
    ).withColumn(
        "split",
        F.expr(
            f"CASE WHEN bucket < {SPLIT_BUCKETS[0]} THEN 'train' "
            f"WHEN bucket < {SPLIT_BUCKETS[1]} THEN 'val' ELSE 'test' END"
        ),
    )


def split_assign_sql() -> str:
    return f"""
SELECT doc_id, source,
       (('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000) AS bucket,
       CASE WHEN (('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000) < {SPLIT_BUCKETS[0]} THEN 'train'
            WHEN (('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000) < {SPLIT_BUCKETS[1]} THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


# ------------------------------------------------------- ngram top-k

NGRAM_N = 3
NGRAM_K = 50


def ngram_topk(documents: DataFrame, n: int = NGRAM_N, k: int = NGRAM_K) -> DataFrame:
    """Global top-k word n-grams (corpus LM statistics). Deterministic
    tiebreak (count desc, gram asc); the plan is partial+final hash agg
    then TakeOrderedAndProject — no global sort materializes."""
    counts = (
        documents.select(F.explode(F.expr(_grams_expr(n))).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("gram"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("gram"))
    return counts.select("gram", "cnt", F.row_number().over(w).alias("rank"))


def ngram_topk_sql(n: int = NGRAM_N, k: int = NGRAM_K) -> str:
    return f"""
WITH g AS (SELECT unnest({_grams_sql(n)}) AS gram FROM documents),
c AS (SELECT gram, count(*) AS cnt FROM g GROUP BY gram)
SELECT gram, cnt, row_number() OVER (ORDER BY cnt DESC, gram) AS rank
FROM c ORDER BY cnt DESC, gram LIMIT {k}
"""


# ------------------------------------------------------- tf-idf top-k

TFIDF_K = 5


def tfidf_topk(documents: DataFrame, k: int = TFIDF_K) -> DataFrame:
    """Per-document top-k keywords by TF-IDF. The idf is the
    integer-exact ``(10^6 · N) div df`` (floor division in both
    engines — no libm ``ln`` whose last bits differ across engines);
    ranking by ``tf · idf_m`` preserves the tf·(N/df) order. N arrives
    via a broadcast single-row cross join, not a driver collect."""
    terms = documents.select("doc_id", F.explode(F.expr(_WORDS)).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = documents.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            F.expr("(1000000 * n_docs) div df").alias("idf_m"),
        )
        .withColumn("score", F.col("tf") * F.col("idf_m"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "idf_m", "score", "rank")
    )


def tfidf_topk_sql(k: int = TFIDF_K) -> str:
    return f"""
WITH terms AS (SELECT doc_id, unnest({_WORDS_DUCK}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         (1000000 * n.n_docs) // df.df AS idf_m,
         tf.tf * ((1000000 * n.n_docs) // df.df) AS score
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, idf_m, score, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
  FROM scored
) r WHERE rank <= {k}
"""


# ------------------------------------------- bloom decontamination

BLOOM_M = 8192   # bits
BLOOM_K = 3      # hash functions
BLOOM_N = 3      # word n-gram size (shared with text.decontaminate)
BLOOM_EVAL_SOURCE = "src0"


def _bloom_pos_spark(gram_expr: str, i: int, m: int) -> str:
    return (
        f"(CAST(conv(substring(md5(concat('b{i}', {gram_expr})), 1, 15), 16, 10) AS BIGINT) % {m})"
    )


def _bloom_pos_duck(gram_expr: str, i: int, m: int) -> str:
    return f"(('0x' || substr(md5('b{i}' || {gram_expr}), 1, 15))::BIGINT % {m})"


#: portable 60-bit gram identity (same md5 prefix both engines): the
#: per-gram aggregate exchanges this BIGINT instead of the gram STRING,
#: so corpus text never crosses a shuffle. A collision would merge two
#: grams in BOTH engines identically (same hash → same answer), so
#: oracle equality is exact; the distinct-gram count is off only if
#: two of one document's grams collide in 2^60 (~n²/2^61 per doc).
def _gram_id_spark(gram_expr: str) -> str:
    return f"CAST(conv(substring(md5(concat('g', {gram_expr})), 1, 15), 16, 10) AS BIGINT)"


def _gram_id_duck(gram_expr: str) -> str:
    return f"(('0x' || substr(md5('g' || {gram_expr}), 1, 15))::BIGINT)"


def bloom_decontaminate(
    documents: DataFrame,
    n: int = BLOOM_N,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    eval_source: str = BLOOM_EVAL_SOURCE,
) -> DataFrame:
    """Bloom-filter contamination flagging: eval-set n-grams populate
    an m-bit / k-hash Bloom filter; a training gram counts as a hit
    only when ALL k probe bits are set. One-sided by construction —
    every exactly-contaminated gram is flagged (no false negatives),
    plus a bounded false-positive rate (≈(1-e^{{-kE/m}})^k).

    The filter travels as a broadcast set of DISTINCT bit positions
    (≤ m small ints), and the per-gram aggregate keys on a portable
    60-bit gram id — corpus-side gram strings never cross a shuffle
    (measured ~1 KB/doc of gram text before the id rework), which is
    the entire point at 100 TB.
    """
    probes = ", ".join(_bloom_pos_spark("gram", i, m) for i in range(1, k + 1))
    eval_bits = (
        documents.filter(F.col("source") == eval_source)
        .select(F.explode(F.expr(f"array_distinct({_grams_expr(n)})")).alias("gram"))
        .select(F.explode(F.expr(f"array({probes})")).alias("pos"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train = (
        documents.filter(F.col("source") != eval_source)
        .select("doc_id", F.explode(F.expr(f"array_distinct({_grams_expr(n)})")).alias("gram"))
        .select(
            "doc_id",
            F.expr(_gram_id_spark("gram")).alias("gram_id"),
            F.explode(F.expr(f"array({probes})")).alias("pos"),
        )
    )
    per_gram = (
        train.join(F.broadcast(eval_bits), "pos", "left")
        .groupBy("doc_id", "gram_id")
        .agg((F.sum(F.coalesce("hit", F.lit(0))) == k).cast("int").alias("bloom_hit"))
    )
    return (
        per_gram.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_distinct_grams"),
            F.sum("bloom_hit").alias("n_bloom_hits"),
        )
        .select(
            "doc_id",
            "n_distinct_grams",
            "n_bloom_hits",
            (F.col("n_bloom_hits") > 0).alias("bloom_flagged"),
        )
    )


def bloom_decontaminate_sql(
    n: int = BLOOM_N,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    eval_source: str = BLOOM_EVAL_SOURCE,
) -> str:
    probes = ", ".join(_bloom_pos_duck("gram", i, m) for i in range(1, k + 1))
    return f"""
WITH eg AS (
  SELECT DISTINCT unnest(list_distinct({_grams_sql(n)})) AS gram
  FROM documents WHERE source = '{eval_source}'
), bits AS (
  SELECT DISTINCT unnest([{probes}]) AS pos FROM eg
), tg AS (
  SELECT doc_id, unnest(list_distinct({_grams_sql(n)})) AS gram
  FROM documents WHERE source <> '{eval_source}'
), tp AS (
  SELECT doc_id, {_gram_id_duck("gram")} AS gram_id, unnest([{probes}]) AS pos FROM tg
), per_gram AS (
  SELECT tp.doc_id, tp.gram_id,
         CAST(count(bits.pos) = {k} AS INT) AS bloom_hit
  FROM tp LEFT JOIN bits ON tp.pos = bits.pos
  GROUP BY tp.doc_id, tp.gram_id
)
SELECT doc_id,
       count(*) AS n_distinct_grams,
       CAST(sum(bloom_hit) AS BIGINT) AS n_bloom_hits,
       sum(bloom_hit) > 0 AS bloom_flagged
FROM per_gram GROUP BY doc_id
"""


# -------------------------------------------------- passage dedup

PASSAGE_W = 8


def passage_dedup(documents: DataFrame, w: int = PASSAGE_W) -> DataFrame:
    """CCNet-style passage-level exact dedup: cut each document into
    consecutive ``w``-word passages (last one may be partial), digest
    each, and report per document how much of it consists of passages
    that also occur in at least one OTHER document."""
    passages = documents.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, (size({_WORDS}) - 1) div {w}),"
                f" i -> md5(concat_ws(' ', slice({_WORDS}, i * {w} + 1, {w}))))"
            )
        ).alias("digest"),
    )
    spread = passages.groupBy("digest").agg(
        F.countDistinct("doc_id").alias("n_docs_with")
    )
    return (
        passages.join(spread, "digest")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_passages"),
            F.sum((F.col("n_docs_with") >= 2).cast("int")).alias("n_dup_passages"),
        )
        .select(
            "doc_id",
            "n_passages",
            "n_dup_passages",
            F.expr("CAST(floor(1000.0 * n_dup_passages / n_passages) AS INT)").alias(
                "dup_frac_m"
            ),
        )
    )


def passage_dedup_sql(w: int = PASSAGE_W) -> str:
    return f"""
WITH p AS (
  SELECT doc_id,
         unnest([md5(array_to_string({_WORDS_DUCK}[i * {w} + 1 : i * {w} + {w}], ' '))
                 for i in range(0, (len({_WORDS_DUCK}) - 1) // {w} + 1)]) AS digest
  FROM documents
), spread AS (
  SELECT digest, count(DISTINCT doc_id) AS n_docs_with FROM p GROUP BY digest
)
SELECT p.doc_id,
       count(*) AS n_passages,
       CAST(sum(CASE WHEN spread.n_docs_with >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_passages,
       CAST(floor(1000.0 * sum(CASE WHEN spread.n_docs_with >= 2 THEN 1 ELSE 0 END) / count(*)) AS INT) AS dup_frac_m
FROM p JOIN spread USING (digest)
GROUP BY p.doc_id
"""


# --------------------------------------------------- PII redaction

EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\d{3}[-.]\d{3}[-.]\d{4}"
IP_RE = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"


def pii_redact(documents: DataFrame) -> DataFrame:
    """Regex PII scrub (emails, phone numbers, IPv4 addresses →
    typed placeholders) with per-type match counts. Pure JVM
    regexp_replace — a narrow map; the patterns are the deliberately
    simple, auditable kind (production swaps in a vetted ruleset,
    same plumbing). Order matters: emails first (an email can contain
    digits), then phones, then IPs."""
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), EMAIL_RE, "<EMAIL>"),
            PHONE_RE,
            "<PHONE>",
        ),
        IP_RE,
        "<IP>",
    )
    return documents.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(EMAIL_RE), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(PHONE_RE), F.lit(0))).alias("n_phones"),
        F.size(F.regexp_extract_all("text", F.lit(IP_RE), F.lit(0))).alias("n_ips"),
        redacted.alias("redacted"),
    )


def pii_redact_sql() -> str:
    return f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(text, '{PHONE_RE}')) AS n_phones,
       len(regexp_extract_all(text, '{IP_RE}')) AS n_ips,
       regexp_replace(regexp_replace(regexp_replace(text,
           '{EMAIL_RE}', '<EMAIL>', 'g'),
           '{PHONE_RE}', '<PHONE>', 'g'),
           '{IP_RE}', '<IP>', 'g') AS redacted
FROM documents
"""


# ------------------------------------------- sampling / normalization

SAMPLE_K = 10


def sample_per_source(documents: DataFrame, k: int = SAMPLE_K) -> DataFrame:
    """Deterministic pseudo-random sample of ``k`` documents per
    source: rank by a salted hash of doc_id inside each source
    partition. Re-runs, retries, and cluster relayouts all pick the
    SAME sample (the reason hash-rank sampling, not rand(), is the
    production idiom for eval subsets). One window per source
    partition — parallel across sources, no global shuffle."""
    h = "md5(concat('sample', CAST(doc_id AS STRING)))"
    w = Window.partitionBy("source").orderBy(F.expr(h), "doc_id")
    return (
        documents.select("doc_id", "source", F.expr(h).alias("sample_key"))
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
    )


def sample_per_source_sql(k: int = SAMPLE_K) -> str:
    return f"""
SELECT doc_id, source, sample_key, sample_rank FROM (
  SELECT doc_id, source, md5('sample' || CAST(doc_id AS VARCHAR)) AS sample_key,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5('sample' || CAST(doc_id AS VARCHAR)), doc_id) AS sample_rank
  FROM documents
) r WHERE sample_rank <= {k}
"""


def normalize_text(documents: DataFrame) -> DataFrame:
    """Canonical text normalization (the first stage of most curation
    pipelines): lowercase, trim, collapse whitespace runs, strip
    control characters. Emits the normalized text plus a changed flag
    and the md5 of the normalized form (the key exact-dedup runs on
    after normalization). Pure JVM expressions, zero shuffle."""
    norm = F.expr(
        "lower(trim(regexp_replace(regexp_replace(text, '[\\\\p{Cntrl}]', ' '), '\\\\s+', ' ')))"
    )
    return documents.select(
        "doc_id",
        norm.alias("norm_text"),
        (norm != F.col("text")).alias("changed"),
        F.md5(norm).alias("norm_digest"),
    )


def normalize_text_sql() -> str:
    norm = (
        "lower(trim(regexp_replace(regexp_replace(text, '[[:cntrl:]]', ' ', 'g'), '\\s+', ' ', 'g')))"
    )
    return f"""
SELECT doc_id,
       {norm} AS norm_text,
       {norm} <> text AS changed,
       md5({norm}) AS norm_digest
FROM documents
"""


# ------------------------------------------------- source mixing

MIX_ALPHA_SQRT = True  # temperature T=2 (sqrt) reweight — the common LM mix


def source_mixture(documents: DataFrame) -> DataFrame:
    """Training-mixture weights per source: raw token share plus the
    temperature-smoothed share (sqrt reweight, the T=2 mixing used to
    up-weight small sources in multilingual/multi-source LM training).
    sqrt is IEEE-correctly-rounded — identical in both engines — and
    shares are floor-scaled ints, so the op stays hash-verifiable.

    Shape: one partial+final agg on source (tiny output), then a
    broadcast single-row total for the shares — no second scan.
    """
    per = documents.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.expr(f"CAST(sum(size({_WORDS})) AS BIGINT)").alias("n_tokens"),
    )
    tot = per.agg(
        F.sum("n_tokens").alias("tot_tokens"),
        F.sum(F.expr("sqrt(CAST(n_tokens AS DOUBLE))")).alias("tot_sqrt"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.expr("CAST(floor(1000000.0 * n_tokens / tot_tokens) AS INT)").alias(
                "share_u"
            ),
            F.expr(
                "CAST(floor(1000000.0 * sqrt(CAST(n_tokens AS DOUBLE)) / tot_sqrt) AS INT)"
            ).alias("smoothed_share_u"),
        )
    )


def source_mixture_sql() -> str:
    return f"""
WITH per AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(len({_WORDS_DUCK})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT sum(n_tokens) AS tot_tokens,
         sum(sqrt(CAST(n_tokens AS DOUBLE))) AS tot_sqrt
  FROM per
)
SELECT source, n_docs, n_tokens,
       CAST(floor(1000000.0 * n_tokens / tot_tokens) AS INT) AS share_u,
       CAST(floor(1000000.0 * sqrt(CAST(n_tokens AS DOUBLE)) / tot_sqrt) AS INT) AS smoothed_share_u
FROM per CROSS JOIN tot
"""


# --------------------------------------------- chunk materialization


def materialize_chunks(documents: DataFrame, capacity: int = PACK_CAPACITY) -> DataFrame:
    """The packed TRAINING SEQUENCES themselves: same concat-and-chunk
    algebra as ``pack_chunks`` but emitting each chunk's actual token
    content (space-joined words) — the table a trainer reads.

    Shape: the per-source cumsum window, an explode over the chunks a
    doc touches with the doc-internal slice bounds, then ONE groupBy
    (source, chunk_id) that order-merges the pieces (sort by offset
    inside the chunk). Every chunk except a source's last is exactly
    ``capacity`` tokens (asserted in tests, conservation inherited
    from pack_chunks' algebra).
    """
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = (
        documents.select(
            "doc_id",
            "source",
            F.expr(_WORDS).alias("ws"),
            F.expr(f"size({_WORDS})").cast("long").alias("n_tokens"),
        )
        .where(F.col("n_tokens") > 0)
        .withColumn("cum_end", F.sum("n_tokens").over(w))
        .withColumn("cum_start", F.col("cum_end") - F.col("n_tokens"))
    )
    pieces = base.select(
        "source",
        "ws",
        "cum_start",
        "cum_end",
        F.explode(
            F.expr(f"sequence(cum_start div {capacity}, (cum_end - 1) div {capacity})")
        ).alias("chunk_id"),
    ).select(
        "source",
        "chunk_id",
        (F.greatest("cum_start", F.col("chunk_id") * capacity) - F.col("chunk_id") * capacity).alias("chunk_offset"),
        F.expr(
            f"slice(ws, CAST(greatest(cum_start, chunk_id * {capacity}) - cum_start + 1 AS INT),"
            f" CAST(least(cum_end, (chunk_id + 1) * {capacity}) - greatest(cum_start, chunk_id * {capacity}) AS INT))"
        ).alias("piece"),
    )
    merged = (
        pieces.groupBy("source", "chunk_id")
        .agg(
            F.expr(
                "flatten(transform(array_sort(collect_list(struct(chunk_offset, piece))),"
                " s -> s.piece))"
            ).alias("tokens")
        )
    )
    return merged.select(
        "source",
        "chunk_id",
        F.expr("size(tokens)").alias("n_tokens"),
        F.concat_ws(" ", "tokens").alias("text"),
    )


TOKEN_CHUNK_CAP = 512


def materialize_token_chunks(
    tokens_df: DataFrame, capacity: int = TOKEN_CHUNK_CAP
) -> DataFrame:
    """Token-NATIVE packing over the north-rule input table itself
    (``doc_id, tokens: array<int32>, n_tok, source``): concatenate the
    actual token arrays in doc_id order within each source and cut
    fixed-``capacity`` training sequences — ``materialize_chunks``'
    algebra applied to int arrays instead of re-tokenized words (the
    r2 verdict's token-native gap).

    Same scale shape: per-source cumsum window → explode over the
    chunks a doc straddles with doc-internal slice bounds → ONE
    groupBy (source, chunk_id) order-merging the slices. The token
    payload rides the narrow map stages; only chunk-boundary pieces
    move in the final exchange. Emits the packed array as a '-'-joined
    string so the cross-engine value-hash is exact token-array
    equality."""
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = (
        tokens_df.select(
            "doc_id",
            "source",
            "tokens",
            F.expr("size(tokens)").cast("long").alias("n_tokens"),
        )
        .where(F.col("n_tokens") > 0)
        .withColumn("cum_end", F.sum("n_tokens").over(w))
        .withColumn("cum_start", F.col("cum_end") - F.col("n_tokens"))
    )
    pieces = base.select(
        "source",
        "tokens",
        "cum_start",
        "cum_end",
        F.explode(
            F.expr(f"sequence(cum_start div {capacity}, (cum_end - 1) div {capacity})")
        ).alias("chunk_id"),
    ).select(
        "source",
        "chunk_id",
        (
            F.greatest("cum_start", F.col("chunk_id") * capacity)
            - F.col("chunk_id") * capacity
        ).alias("chunk_offset"),
        F.expr(
            f"slice(tokens, CAST(greatest(cum_start, chunk_id * {capacity}) - cum_start + 1 AS INT),"
            f" CAST(least(cum_end, (chunk_id + 1) * {capacity}) - greatest(cum_start, chunk_id * {capacity}) AS INT))"
        ).alias("piece"),
    )
    merged = pieces.groupBy("source", "chunk_id").agg(
        F.expr(
            "flatten(transform(array_sort(collect_list(struct(chunk_offset, piece))),"
            " s -> s.piece))"
        ).alias("tokens")
    )
    return merged.select(
        "source",
        "chunk_id",
        F.expr("size(tokens)").alias("n_tokens"),
        F.expr("concat_ws('-', tokens)").alias("tokens_str"),
    )


def materialize_token_chunks_sql(capacity: int = TOKEN_CHUNK_CAP) -> str:
    """Oracle twin: rebuilds the token table from ``events`` via the
    shared payload recipe (identity byte vocab — token i = unicode of
    payload char i), then replicates the packing algebra."""
    from ..fixtures import DOC_ID, SERVICE, payload_sql, render

    d = lambda s: render(s, "duckdb")
    return f"""
WITH p AS (
  SELECT {d(DOC_ID)} AS doc_id, {d(SERVICE)} AS source,
         {d(payload_sql('duckdb'))} AS payload
  FROM events
), t AS (
  SELECT doc_id, source,
         [unicode(substr(payload, i, 1)) for i in range(1, length(payload) + 1)] AS tokens,
         CAST(length(payload) AS BIGINT) AS n_tokens
  FROM p WHERE length(payload) > 0
), c AS (
  SELECT doc_id, source, tokens, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_end
  FROM t
), s AS (
  SELECT source, tokens, cum_end - n_tokens AS cum_start, cum_end,
         unnest(range((cum_end - n_tokens) // {capacity}, (cum_end - 1) // {capacity} + 1)) AS chunk_id
  FROM c
), pieces AS (
  SELECT source, chunk_id,
         greatest(cum_start, chunk_id * {capacity}) - chunk_id * {capacity} AS chunk_offset,
         tokens[CAST(greatest(cum_start, chunk_id * {capacity}) - cum_start + 1 AS BIGINT) :
                CAST(least(cum_end, (chunk_id + 1) * {capacity}) - cum_start AS BIGINT)] AS piece
  FROM s
)
SELECT source, chunk_id,
       CAST(len(flatten(list(piece ORDER BY chunk_offset))) AS INT) AS n_tokens,
       array_to_string(flatten(list(piece ORDER BY chunk_offset)), '-') AS tokens_str
FROM pieces GROUP BY source, chunk_id
"""


def materialize_chunks_sql(capacity: int = PACK_CAPACITY) -> str:
    return f"""
WITH base AS (
  SELECT doc_id, source, {_WORDS_DUCK} AS ws,
         CAST(len({_WORDS_DUCK}) AS BIGINT) AS n_tokens
  FROM documents WHERE len({_WORDS_DUCK}) > 0
), c AS (
  SELECT doc_id, source, ws, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_end
  FROM base
), s AS (
  SELECT source, ws, cum_end - n_tokens AS cum_start, cum_end,
         unnest(range((cum_end - n_tokens) // {capacity}, (cum_end - 1) // {capacity} + 1)) AS chunk_id
  FROM c
), pieces AS (
  SELECT source, chunk_id,
         greatest(cum_start, chunk_id * {capacity}) - chunk_id * {capacity} AS chunk_offset,
         ws[CAST(greatest(cum_start, chunk_id * {capacity}) - cum_start + 1 AS BIGINT) :
            CAST(least(cum_end, (chunk_id + 1) * {capacity}) - cum_start AS BIGINT)] AS piece
  FROM s
)
SELECT source, chunk_id,
       CAST(len(flatten(list(piece ORDER BY chunk_offset))) AS INT) AS n_tokens,
       array_to_string(flatten(list(piece ORDER BY chunk_offset)), ' ') AS text
FROM pieces GROUP BY source, chunk_id
"""


# ------------------------------------------- boilerplate removal (C4-style)

#: boilerplate window width (words) and document-frequency threshold
BOILER_W = 4
BOILER_MIN_DOCS = 3


def boilerplate_removal(
    documents: DataFrame, w: int = BOILER_W, min_docs: int = BOILER_MIN_DOCS
) -> DataFrame:
    """C4/CCNet-style boilerplate removal: cut each document into
    consecutive ``w``-word windows, mark a window BOILERPLATE when the
    same window text occurs in ≥ ``min_docs`` distinct documents
    (nav bars, cookie banners, license footers at web scale), and
    rebuild each document from its surviving windows in order.

    Emits per document: window counts, words kept, and the md5 digest
    of the cleaned text (digest instead of the text itself keeps the
    oracle compare exact without shipping megabyte strings).

    Scale shape (r4 rework): window TEXT crosses exactly ONE exchange.
    A narrow (doc_id, idx, digest) branch carries md5 digests through
    the document-frequency groupBy and the boiler-digest join, the
    boiler window *indexes* fold back to one int-array row per doc,
    and the final doc_id join recomputes windows from the document's
    own text in-row (the rebuild is bounded by the doc's own length).
    The first cut shuffled the window text through BOTH the digest
    join and the rebuild groupBy — measured ~1.4 KB/doc by the
    shuffle audit, the largest analytical-op shuffle in the registry.

    Reference analog: no equivalent (the reference stores spans, not
    corpora); this is the training-data extension the north rule asks
    for, same family as ``passage_dedup`` (`ops/corpus.py:481`).
    """
    # zero-word guard (as pack_chunks does): Spark's (size-1) div w
    # truncates toward zero (→ one empty window) while DuckDB floors
    # to -1 (→ no rows) — filter empty docs on BOTH engines instead
    wins_expr = (
        f"transform(sequence(0, (size({_WORDS}) - 1) div {w}),"
        f" i -> concat_ws(' ', slice({_WORDS}, i * {w} + 1, {w})))"
    )
    wins_narrow = (
        documents.where(F.expr(f"size({_WORDS}) > 0"))
        .select("doc_id", F.posexplode(F.expr(wins_expr)).alias("idx", "win"))
        # exchange key is the RAW 16-byte md5, not the 32-char hex —
        # digest bytes are incompressible, so wire width is halved
        .select("doc_id", "idx", F.unhex(F.md5("win")).alias("digest"))
    )
    boiler_digests = (
        wins_narrow.groupBy("digest")
        .agg(F.countDistinct("doc_id").alias("n_docs_with"))
        .where(F.col("n_docs_with") >= min_docs)
        .select("digest")
    )
    boiler_idx = (
        wins_narrow.join(boiler_digests, "digest")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("idx")).alias("_boiler_idx"))
    )
    survivors = (
        "filter(_wins, (x, i) -> NOT array_contains(coalesce(_boiler_idx, array()), i))"
    )
    return (
        documents.where(F.expr(f"size({_WORDS}) > 0"))
        .select("doc_id", F.expr(wins_expr).alias("_wins"))
        .join(boiler_idx, "doc_id", "left")
        .select(
            "doc_id",
            F.expr("CAST(size(_wins) AS BIGINT)").alias("n_windows"),
            F.expr(
                "CAST(coalesce(size(_boiler_idx), 0) AS BIGINT)"
            ).alias("n_boiler"),
            F.md5(F.concat_ws(" ", F.expr(survivors))).alias("clean_digest"),
            F.expr(
                f"aggregate({survivors}, 0L, (a, x) -> a + size(split(x, ' ')))"
            ).alias("n_clean_words"),
        )
    )


def boilerplate_removal_sql(
    w: int = BOILER_W, min_docs: int = BOILER_MIN_DOCS
) -> str:
    return f"""
WITH wins AS (
  SELECT doc_id,
         unnest(range(0, (len({_WORDS_DUCK}) - 1) // {w} + 1)) AS idx,
         unnest([array_to_string({_WORDS_DUCK}[i * {w} + 1 : i * {w} + {w}], ' ')
                 for i in range(0, (len({_WORDS_DUCK}) - 1) // {w} + 1)]) AS win
  FROM documents
  WHERE len({_WORDS_DUCK}) > 0
), d AS (
  SELECT *, md5(win) AS digest FROM wins
), spread AS (
  SELECT digest, count(DISTINCT doc_id) AS n_docs_with FROM d GROUP BY digest
), kept AS (
  SELECT d.doc_id, d.idx, d.win,
         CASE WHEN spread.n_docs_with >= {min_docs} THEN 1 ELSE 0 END AS is_boiler
  FROM d JOIN spread USING (digest)
)
SELECT doc_id,
       count(*) AS n_windows,
       CAST(sum(is_boiler) AS BIGINT) AS n_boiler,
       md5(coalesce(array_to_string(list(win ORDER BY idx) FILTER (WHERE is_boiler = 0),
                                    ' '), '')) AS clean_digest,
       CAST(sum(CASE WHEN is_boiler = 0 THEN len(string_split(win, ' ')) ELSE 0 END) AS BIGINT)
         AS n_clean_words
FROM kept GROUP BY doc_id
"""
