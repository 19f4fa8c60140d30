"""Corpus-curation ops vs their DuckDB oracles (sf0.001) plus
behavioral invariants: packing conservation, Bloom one-sidedness,
planted-PII redaction, split stability."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from otel_worker_spark.ops import corpus as cp
from otel_worker_spark.ops import text as tx

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(f"create view documents as select * from '{SF_DIR}/documents.parquet'")
    return c


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def assert_match(sdf, con, sql, min_rows=1):
    a = sdf.toPandas()
    b = con.sql(sql).df()
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    a = a[cols].sort_values(cols).reset_index(drop=True).astype(str)
    b = b[cols].sort_values(cols).reset_index(drop=True).astype(str)
    assert len(a) == len(b) >= min_rows
    assert a.equals(b)


def test_pack_chunks_oracle(spark, con, docs):
    assert_match(cp.pack_chunks(docs), con, cp.pack_chunks_sql(), min_rows=100)


def test_pack_chunks_conservation(spark, docs):
    """Per-doc spans sum to the doc's token count; every chunk except
    each source's last is exactly full; offsets+sizes stay in bounds."""
    spans = cp.pack_chunks(docs).cache()
    bad_doc = (
        spans.groupBy("doc_id", "n_tokens")
        .agg(F.sum("n_in_chunk").alias("packed"))
        .where("packed <> n_tokens")
        .count()
    )
    assert bad_doc == 0
    per_chunk = spans.groupBy("source", "chunk_id").agg(
        F.sum("n_in_chunk").alias("fill")
    )
    last = per_chunk.groupBy("source").agg(F.max("chunk_id").alias("last_chunk"))
    not_full_non_last = (
        per_chunk.join(last, "source")
        .where(f"chunk_id <> last_chunk AND fill <> {cp.PACK_CAPACITY}")
        .count()
    )
    assert not_full_non_last == 0
    assert (
        spans.where(
            f"chunk_offset < 0 OR n_in_chunk < 1 OR chunk_offset + n_in_chunk > {cp.PACK_CAPACITY}"
        ).count()
        == 0
    )
    spans.unpersist()


def test_quality_filter_oracle(spark, con, docs):
    assert_match(cp.quality_filter(docs), con, cp.quality_filter_sql(), min_rows=100)


def test_quality_filter_both_outcomes(spark, docs):
    qf = cp.quality_filter(docs)
    kept = qf.where("keep").count()
    dropped = qf.where("NOT keep").count()
    assert kept > 0 and dropped > 0
    # every dropped row has a reason, every kept row has none
    assert qf.where("NOT keep AND drop_reason IS NULL").count() == 0
    assert qf.where("keep AND drop_reason IS NOT NULL").count() == 0


def test_split_assign_oracle(spark, con, docs):
    assert_match(cp.split_assign(docs), con, cp.split_assign_sql(), min_rows=100)


def test_split_assign_stable_and_proportional(spark, docs):
    s = cp.split_assign(docs)
    frac = {r["split"]: r["n"] for r in s.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = sum(frac.values())
    # hash split ≈ 80/10/10 with generous tolerance at 500 docs
    assert 0.7 < frac.get("train", 0) / n < 0.9
    # doubling the corpus never changes an existing doc's split
    again = {r.doc_id: r.split for r in cp.split_assign(docs.limit(50)).collect()}
    full = {r.doc_id: r.split for r in s.collect()}
    assert all(full[d] == sp for d, sp in again.items())


def test_ngram_topk_oracle(spark, con, docs):
    assert_match(cp.ngram_topk(docs), con, cp.ngram_topk_sql(), min_rows=50)


def test_tfidf_topk_oracle(spark, con, docs):
    assert_match(cp.tfidf_topk(docs), con, cp.tfidf_topk_sql(), min_rows=100)


def test_bloom_oracle(spark, con, docs):
    assert_match(
        cp.bloom_decontaminate(docs), con, cp.bloom_decontaminate_sql(), min_rows=100
    )


def test_bloom_is_one_sided_vs_exact(spark, docs):
    """No false negatives: every doc the exact n-gram check flags must
    be Bloom-flagged too (same n, same eval source)."""
    exact = tx.decontaminate(docs, n=cp.BLOOM_N).select("doc_id", "flagged")
    bloom = cp.bloom_decontaminate(docs).select("doc_id", "bloom_flagged")
    missed = (
        exact.join(bloom, "doc_id")
        .where("flagged AND NOT bloom_flagged")
        .count()
    )
    assert missed == 0


def test_passage_dedup_oracle(spark, con, docs):
    assert_match(cp.passage_dedup(docs), con, cp.passage_dedup_sql(), min_rows=100)


def test_passage_dedup_planted(spark, docs):
    """A duplicated document must show dup_frac_m = 1000 for both
    copies (every passage shared)."""
    clone = docs.limit(1).withColumn("doc_id", F.col("doc_id") + 900000)
    res = cp.passage_dedup(docs.limit(1).union(clone)).collect()
    assert len(res) == 2 and all(r.dup_frac_m == 1000 for r in res)


def test_pii_redact_oracle(spark, con, docs):
    assert_match(cp.pii_redact(docs), con, cp.pii_redact_sql(), min_rows=100)


def test_pii_redact_planted(spark):
    s = pytest.importorskip("pyspark.sql").SparkSession.getActiveSession()
    planted = s.createDataFrame(
        [
            (1, "contact bob.smith@example.com or 555-123-4567 now", "en", "srcx", 48),
            (2, "server at 10.0.0.1 responded", "en", "srcx", 29),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r.doc_id: r for r in cp.pii_redact(planted).collect()}
    assert out[1].n_emails == 1 and out[1].n_phones == 1
    assert "<EMAIL>" in out[1].redacted and "<PHONE>" in out[1].redacted
    assert "example.com" not in out[1].redacted
    assert out[2].n_ips == 1 and "<IP>" in out[2].redacted


def test_curate_and_pack_oracle(spark, con, docs):
    assert_match(cp.curate_and_pack(docs), con, cp.curate_and_pack_sql(), min_rows=100)


def test_curate_and_pack_two_exchanges(spark, docs):
    """The whole curation DAG (quality → dedup survivors → split →
    pack) must cost exactly TWO hash exchanges: the digest window and
    the per-source pack window. Quality/split are filters, never
    join-backs."""
    plan = (
        cp.curate_and_pack(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Exchange SinglePartition" not in plan
    assert "Join" not in plan


def test_curate_drops_quality_and_duplicates(spark, docs):
    """A planted duplicate of a kept doc must not add packed tokens;
    a planted low-quality doc must vanish."""
    from pyspark.sql import functions as F

    base_docs = docs.limit(100)
    packed_base = cp.curate_and_pack(base_docs)
    base_total = packed_base.agg(F.sum("n_in_chunk")).collect()[0][0]
    # duplicate every doc (new ids after every original id) — survivors
    # are unchanged, so the packed token mass stays identical
    clones = base_docs.withColumn("doc_id", F.col("doc_id") + 1000000)
    packed_dup = cp.curate_and_pack(base_docs.union(clones))
    dup_total = packed_dup.agg(F.sum("n_in_chunk")).collect()[0][0]
    assert dup_total == base_total
    # a too-short doc never reaches packing
    junk = spark.createDataFrame(
        [(555555, "tiny doc", "en", "src0", 8)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    packed_junk = cp.curate_and_pack(base_docs.union(junk))
    assert packed_junk.where("doc_id = 555555").count() == 0


def test_sample_per_source_oracle(spark, con, docs):
    assert_match(cp.sample_per_source(docs), con, cp.sample_per_source_sql(), min_rows=50)


def test_sample_is_stable_under_growth(spark, docs):
    """Adding documents never changes which of the ORIGINAL docs rank
    in the sample unless a new doc hashes ahead of them — with fixed
    ids the original sample of a subset is a superset filter."""
    full = {(r.doc_id, r.source) for r in cp.sample_per_source(docs).collect()}
    # same corpus re-sampled = identical (deterministic)
    again = {(r.doc_id, r.source) for r in cp.sample_per_source(docs).collect()}
    assert full == again


def test_normalize_text_oracle(spark, con, docs):
    assert_match(cp.normalize_text(docs), con, cp.normalize_text_sql(), min_rows=100)


def test_normalize_text_planted(spark):
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    planted = s.createDataFrame(
        [(1, "  Hello\t\tWORLD  \x07 again ", "en", "srcx", 20)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = cp.normalize_text(planted).collect()[0]
    assert r.norm_text == "hello world again"
    assert r.changed


def test_source_mixture_oracle(spark, con, docs):
    assert_match(cp.source_mixture(docs), con, cp.source_mixture_sql(), min_rows=10)


def test_source_mixture_smoothing_upweights_small_sources(spark, docs):
    rows = {r.source: r for r in cp.source_mixture(docs).collect()}
    small = min(rows.values(), key=lambda r: r.n_tokens)
    big = max(rows.values(), key=lambda r: r.n_tokens)
    # sqrt smoothing moves share toward uniform: small gains, big loses
    assert small.smoothed_share_u >= small.share_u
    assert big.smoothed_share_u <= big.share_u


def test_materialize_chunks_oracle(spark, con, docs):
    assert_match(
        cp.materialize_chunks(docs), con, cp.materialize_chunks_sql(), min_rows=100
    )


def test_materialize_chunks_full_and_consistent(spark, docs):
    m = cp.materialize_chunks(docs).cache()
    last = m.groupBy("source").agg(F.max("chunk_id").alias("last_chunk"))
    not_full = (
        m.join(last, "source")
        .where(f"chunk_id <> last_chunk AND n_tokens <> {cp.PACK_CAPACITY}")
        .count()
    )
    assert not_full == 0
    # text content is the word-accurate concatenation: total tokens
    # across chunks == total words across packed docs
    total = m.agg(F.sum("n_tokens")).collect()[0][0]
    words = docs.selectExpr(
        "size(filter(split(trim(text), '\\\\s+'), w -> w <> '')) AS n"
    ).agg(F.sum("n")).collect()[0][0]
    assert total == words
    m.unpersist()


def test_quality_filter_empty_docs_quarantine_not_crash(spark):
    """ANSI mode: an empty/whitespace-only document must flow through
    the rules as 'too_short', never a DIVIDE_BY_ZERO job abort."""
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    edge = s.createDataFrame(
        [(1, "", "en", "s", 0), (2, "   ", "en", "s", 3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = {r.doc_id: r for r in cp.quality_filter(edge).collect()}
    assert all(r.drop_reason == "too_short" and not r.keep for r in rows.values())
    # the composed DAG also survives (filters, then packs nothing)
    assert cp.curate_and_pack(edge).count() == 0
