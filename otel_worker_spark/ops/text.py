"""Text analysis over the ``documents`` table: quality scoring,
token counting, language ID, document fingerprinting.

All Spark-side logic is built-in expressions (split/filter/aggregate
HOFs — JVM-side, codegen'd); every op has a matching DuckDB oracle in
this file. Scale notes: each op is a narrow map over one partition —
no shuffle at all; they pipeline with any downstream groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .common import MERSENNE31

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

#: marker words per language for the n-gram/stopword language-ID
#: heuristic (deterministic, tiny — a real deployment would plug in a
#: fastText-style model via mapInPandas; the *plumbing* is identical).
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "das"),
    "fr": ("le", "et", "la"),
    "es": ("el", "y", "la"),
    "zh": ("zh",),
}


def _tokens_expr(col: str) -> str:
    return f"split(trim({col}), '\\\\s+')"


def text_stats(documents: DataFrame) -> DataFrame:
    """Per-document quality stats: token count, distinct-token count,
    mean token length, stopword ratio, alnum ratio, and a composite
    quality score. Ratios are floor-scaled ints (×1000) so the oracle
    matches bit-for-bit."""
    toks = _tokens_expr("text")
    return documents.select(
        "doc_id",
        "lang",
        "source",
        F.length("text").alias("n_chars_m"),
        F.expr(f"size({toks})").alias("n_tokens"),
        F.expr(f"size(array_distinct({toks}))").alias("n_distinct_tokens"),
        F.expr(
            f"CAST(floor(1000.0 * size(filter({toks}, t -> t IN {STOPWORDS})) / size({toks})) AS INT)"
        ).alias("stopword_ratio_m"),
        F.expr(
            f"CAST(floor(1000.0 * length(regexp_replace(text, '[^a-z0-9]', '')) / greatest(1, length(text))) AS INT)"
        ).alias("alnum_ratio_m"),
        F.expr(
            f"CAST(floor(1000.0 * size(array_distinct({toks})) / size({toks})) AS INT)"
        ).alias("distinct_ratio_m"),
    )


def text_stats_sql() -> str:
    toks = "string_split_regex(trim(text), '\\s+')"
    stop = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"
    return f"""
SELECT doc_id,
       lang,
       source,
       length(text) AS n_chars_m,
       len({toks}) AS n_tokens,
       len(list_distinct({toks})) AS n_distinct_tokens,
       CAST(floor(1000.0 * len(list_filter({toks}, t -> t IN {stop})) / len({toks})) AS INT) AS stopword_ratio_m,
       CAST(floor(1000.0 * length(regexp_replace(text, '[^a-z0-9]', '', 'g')) / greatest(1, length(text))) AS INT) AS alnum_ratio_m,
       CAST(floor(1000.0 * len(list_distinct({toks})) / len({toks})) AS INT) AS distinct_ratio_m
FROM documents
"""


def _marker_list_sql(markers: tuple[str, ...]) -> str:
    return "(" + ", ".join(repr(m) for m in markers) + ")"


def lang_id(documents: DataFrame) -> DataFrame:
    """Heuristic language ID: count marker-word hits per language,
    argmax with deterministic (alphabetical) tiebreak — expressed as
    greatest() + an alphabetically-ordered CASE so the oracle SQL is
    a verbatim mirror."""
    toks = _tokens_expr("text")
    langs = sorted(LANG_MARKERS)
    scores = {
        lang: f"size(filter({toks}, t -> t IN {_marker_list_sql(LANG_MARKERS[lang])}))"
        for lang in langs
    }
    scored = documents.select(
        "doc_id", "lang", *[F.expr(e).alias(f"score_{l}") for l, e in scores.items()]
    )
    best = "greatest(" + ", ".join(f"score_{l}" for l in langs) + ")"
    case = "CASE " + " ".join(f"WHEN score_{l} = {best} THEN '{l}'" for l in langs) + " END"
    return scored.select(
        "doc_id",
        "lang",
        F.expr(case).alias("predicted_lang"),
        F.expr(best).alias("marker_hits"),
    )


def lang_id_sql() -> str:
    toks = "string_split_regex(trim(text), '\\s+')"
    langs = sorted(LANG_MARKERS)
    scores = {
        lang: f"len(list_filter({toks}, t -> t IN {_marker_list_sql(LANG_MARKERS[lang])}))"
        for lang in langs
    }
    select_scores = ", ".join(f"{e} AS score_{l}" for l, e in scores.items())
    best = "greatest(" + ", ".join(f"score_{l}" for l in langs) + ")"
    case = "CASE " + " ".join(f"WHEN score_{l} = {best} THEN '{l}'" for l in langs) + " END"
    return f"""
SELECT doc_id, lang, {case} AS predicted_lang, {best} AS marker_hits
FROM (SELECT doc_id, lang, {select_scores} FROM documents) t
"""


#: BPE-ish pre-tokenizer regex: letter runs, digit runs, single
#: punctuation — the standard GPT-2-style pre-split shape.
BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def token_counts(documents: DataFrame) -> DataFrame:
    """Token counting two ways: whitespace words and a BPE-ish regex
    pre-tokenization (the count a training-data pipeline budgets by)."""
    toks = _tokens_expr("text")
    return documents.select(
        "doc_id",
        F.expr(f"size({toks})").alias("n_ws_tokens"),
        F.expr(f"size(regexp_extract_all(text, '{BPE_RE}', 0))").alias("n_bpe_tokens"),
        F.expr("length(text)").alias("n_chars_m"),
    )


def token_counts_sql() -> str:
    toks = "string_split_regex(trim(text), '\\s+')"
    return f"""
SELECT doc_id,
       len({toks}) AS n_ws_tokens,
       len(regexp_extract_all(text, '{BPE_RE}', 0)) AS n_bpe_tokens,
       length(text) AS n_chars_m
FROM documents
"""


def fingerprint(documents: DataFrame) -> DataFrame:
    """Document fingerprint: polynomial rolling hash over codepoints,
    mod 2^31-1 (a Rabin-Karp-style content fingerprint). Sequential
    left fold in both engines → bit-identical."""
    chars = "filter(split(text, ''), c -> c <> '')"
    return documents.select(
        "doc_id",
        F.expr(
            f"aggregate(transform({chars}, c -> ascii(c)), CAST(0 AS BIGINT),"
            f" (acc, x) -> (acc * 31 + x) % {MERSENNE31})"
        ).alias("fingerprint"),
    )


def _grams_expr(n: int) -> str:
    """Word n-gram array (Spark SQL). Guarded: fewer than ``n`` words
    yields an EMPTY array — ``sequence(1, 0)`` would count DOWN."""
    toks = f"filter({_tokens_expr('text')}, w -> w <> '')"
    return (
        f"CASE WHEN size({toks}) < {n} THEN array() "
        f"ELSE transform(sequence(1, size({toks}) - {n} + 1), "
        f"i -> concat_ws(' ', slice({toks}, i, {n}))) END"
    )


def _grams_sql(n: int) -> str:
    """The DuckDB twin of ``_grams_expr`` (1-based inclusive slices)."""
    toks = "list_filter(string_split_regex(trim(text), '\\s+'), w -> w <> '')"
    return (
        f"[array_to_string({toks}[i:i+{n - 1}], ' ') "
        f"for i in range(1, len({toks}) - {n} + 2)]"
    )


def repetition(documents: DataFrame, n: int = 2) -> DataFrame:
    """Gopher-style repetition stats on word n-grams: how much of each
    document is duplicated n-grams, and how dominant the single most
    frequent n-gram is (Rae et al. 2021 §A1.1 use line/paragraph and
    top-n-gram fractions; these documents are single-line, so the
    n-gram form is the operative one).

    Scale shape: ZERO shuffle — a per-doc sorted run-length fold.
    Sort the document's own gram array, then one ``aggregate`` pass
    counts run lengths (equal grams are adjacent after the sort), so
    per-gram frequencies never leave the row: O(d log d) per document
    instead of exploding ~d·n words per doc through a (doc_id, gram)
    exchange (measured ~850 B/doc of gram text at sf0.1), and still
    no O(d²) in-array filter() counting. The oracle keeps the
    explode→group form — equal results, not equal plans, are what the
    gate compares. Docs shorter than ``n`` words drop out (no grams),
    mirrored by the oracle.
    """
    fold = (
        "aggregate(array_sort(_grams), "
        "named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'top', 0L, 'dup', 0L), "
        "(a, x) -> IF(a.prev IS NULL OR x <> a.prev, "
        "named_struct('prev', x, 'run', 1L, "
        "             'top', greatest(a.top, a.run), "
        "             'dup', a.dup + IF(a.run >= 2, a.run, 0L)), "
        "named_struct('prev', a.prev, 'run', a.run + 1L, 'top', a.top, 'dup', a.dup)), "
        "a -> named_struct('top', greatest(a.top, a.run), "
        "                  'dup', a.dup + IF(a.run >= 2, a.run, 0L)))"
    )
    return (
        documents.select("doc_id", F.expr(_grams_expr(n)).alias("_grams"))
        .where("size(_grams) > 0")
        .select(
            "doc_id",
            F.expr("CAST(size(_grams) AS BIGINT)").alias("n_grams"),
            F.expr(fold).alias("_acc"),
        )
        .select(
            "doc_id",
            "n_grams",
            F.col("_acc.top").alias("top_gram_cnt"),
            F.col("_acc.dup").alias("dup_gram_mass"),
            F.expr(
                "CAST(floor(1000.0 * _acc.dup / n_grams) AS INT)"
            ).alias("dup_frac_m"),
            F.expr(
                "CAST(floor(1000.0 * _acc.top / n_grams) AS INT)"
            ).alias("top_frac_m"),
        )
    )


def repetition_sql(n: int = 2) -> str:
    return f"""
WITH g AS (
  SELECT doc_id, unnest({_grams_sql(n)}) AS gram FROM documents
), c AS (
  SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY doc_id, gram
)
SELECT doc_id,
       CAST(sum(cnt) AS BIGINT) AS n_grams,
       max(cnt) AS top_gram_cnt,
       CAST(sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS BIGINT) AS dup_gram_mass,
       CAST(floor(1000.0 * sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) / sum(cnt)) AS INT) AS dup_frac_m,
       CAST(floor(1000.0 * max(cnt) / sum(cnt)) AS INT) AS top_frac_m
FROM c GROUP BY doc_id
"""


#: which documents play the "held-out eval benchmark" in the
#: decontamination check (deterministic: one of the 20 sources)
EVAL_SOURCE = "src0"


def decontaminate(documents: DataFrame, n: int = 3, eval_source: str = EVAL_SOURCE) -> DataFrame:
    """Training-set decontamination: flag training documents sharing
    word n-grams with a held-out eval set (the standard 13-gram
    overlap check of GPT-3 appendix C / PaLM, at fixture-friendly
    ``n``). Eval set = documents from ``eval_source``; training set =
    everything else.

    Scale shape: the eval side is benchmarks — tiny vs the corpus — so
    its distinct-gram set is BROADCAST; the training side explodes
    distinct grams and left-joins without a shuffle of the corpus.
    Per-doc rollup is the only wide exchange.
    """
    eval_grams = (
        documents.filter(F.col("source") == eval_source)
        .select(F.explode(F.expr(f"array_distinct({_grams_expr(n)})")).alias("gram"))
        .distinct()
        .withColumn("contaminated", F.lit(1))
    )
    train = documents.filter(F.col("source") != eval_source).select(
        "doc_id", F.explode(F.expr(f"array_distinct({_grams_expr(n)})")).alias("gram")
    )
    joined = train.join(F.broadcast(eval_grams), "gram", "left")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_distinct_grams"),
            F.sum(F.coalesce("contaminated", F.lit(0))).alias("n_contaminated"),
        )
        .select(
            "doc_id",
            "n_distinct_grams",
            "n_contaminated",
            F.expr(
                "CAST(floor(1000.0 * n_contaminated / n_distinct_grams) AS INT)"
            ).alias("contamination_m"),
            (F.col("n_contaminated") > 0).alias("flagged"),
        )
    )


def decontaminate_sql(n: int = 3, eval_source: str = EVAL_SOURCE) -> str:
    return f"""
WITH e AS (
  SELECT DISTINCT unnest(list_distinct({_grams_sql(n)})) AS gram
  FROM documents WHERE source = '{eval_source}'
), t AS (
  SELECT doc_id, unnest(list_distinct({_grams_sql(n)})) AS gram
  FROM documents WHERE source <> '{eval_source}'
)
SELECT t.doc_id,
       count(*) AS n_distinct_grams,
       count(e.gram) AS n_contaminated,
       CAST(floor(1000.0 * count(e.gram) / count(*)) AS INT) AS contamination_m,
       count(e.gram) > 0 AS flagged
FROM t LEFT JOIN e ON t.gram = e.gram
GROUP BY t.doc_id
"""


def fingerprint_sql() -> str:
    return f"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
                      [CAST(unicode(substr(text, i, 1)) AS BIGINT) for i in range(1, length(text) + 1)]),
         (acc, x) -> (acc * 31 + x) % {MERSENNE31}
       ) AS fingerprint
FROM documents
"""


# ----------------------------------------------- unigram LM rarity score

def unigram_rarity(documents: DataFrame) -> DataFrame:
    """Unigram language-model quality score: build the corpus unigram
    table, then score each document by how RARE its words are —
    ``rarity = mean over words of (10^6 div corpus_count(word))`` —
    plus its hapax count (words occurring exactly once corpus-wide).
    High rarity ≈ unusual/garbled text, near-zero ≈ boilerplate-ish;
    the integer surrogate for mean negative log-likelihood keeps the
    cross-engine compare bit-exact (no libm log drift).

    Scale shape: explode words → ONE partial+final hash agg for the
    unigram table (uniform word key, map-side combine) → shuffle join
    words↔counts on the word key → per-doc agg. The unigram table of
    a 100 TB corpus still fits the classic power-law budget (vocab ≪
    corpus); if it were small enough it could broadcast, but the
    word-key shuffle join is the shape that never falls over.

    Reference analog: none (stores spans, not corpora) — north-rule
    training-data extension, same family as ``text_stats``.
    """
    words = documents.select(
        "doc_id",
        F.explode(
            F.expr("filter(split(trim(text), '\\\\s+'), w -> w <> '')")
        ).alias("word"),
    )
    counts = words.groupBy("word").agg(F.count("*").alias("wc"))
    return (
        words.join(counts, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum((F.col("wc") == 1).cast("int")).alias("n_hapax"),
            F.sum(F.expr("1000000 div wc")).alias("rarity_sum"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_hapax",
            F.expr("rarity_sum div n_words").alias("rarity_mean_u"),
        )
    )


def unigram_rarity_sql() -> str:
    words = "list_filter(string_split_regex(trim(text), '\\s+'), w -> w <> '')"
    return f"""
WITH w AS (
  SELECT doc_id, unnest({words}) AS word FROM documents
), c AS (
  SELECT word, count(*) AS wc FROM w GROUP BY word
)
SELECT doc_id,
       count(*) AS n_words,
       CAST(sum(CASE WHEN wc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST(sum(1000000 // wc) // count(*) AS BIGINT) AS rarity_mean_u
FROM w JOIN c USING (word)
GROUP BY doc_id
"""
