"""Token-native corpus statistics (ops/token_stats.py): DuckDB oracle
equality for the SQL-expressible ops, single-node-reference equality
for the iterative BPE trainer, and Arrow merge-kernel edge cases."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from otel_worker_spark.fixtures import token_sequences_from_events
from otel_worker_spark.ops import token_stats as tks

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(f"create view events as select * from '{SF_DIR}/events.parquet'")
    return c


@pytest.fixture(scope="module")
def tok(spark):
    t = token_sequences_from_events(spark, SF_DIR).persist()
    yield t
    t.unpersist()


def assert_match(sdf, con, sql, min_rows=1):
    a = sdf.toPandas()
    b = con.sql(sql).df()
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    a = a[cols].sort_values(cols).reset_index(drop=True).astype(str)
    b = b[cols].sort_values(cols).reset_index(drop=True).astype(str)
    assert len(a) == len(b) >= min_rows
    assert a.equals(b)


# ------------------------------------------------------- oracle parity


def test_pair_counts_oracle(spark, con, tok):
    assert_match(tks.bpe_pair_counts(tok), con, tks.bpe_pair_counts_sql(), 100)


def test_dup_spans_oracle(spark, con, tok):
    assert_match(tks.dup_spans(tok), con, tks.dup_spans_sql(), 100)


def test_doc_dup_stats_oracle(spark, con, tok):
    assert_match(tks.doc_dup_stats(tok), con, tks.doc_dup_stats_sql(), 500)


def test_dup_spans_finds_planted_boilerplate(spark):
    """Two docs sharing one 16-token run (and nothing else long
    enough) yield exactly the shared windows; the unique doc none."""
    shared = list(range(100, 100 + 20))  # 20 tokens → 5 shared windows
    rows = [
        (1, [1] * 3 + shared, len(shared) + 3, "a"),
        (2, shared + [2] * 3, len(shared) + 3, "a"),
        (3, list(range(500, 560)), 60, "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>, n_tok int, source string")
    got = {r["span"]: (r["n_docs"], r["n_occ"]) for r in tks.dup_spans(df).collect()}
    want_spans = {
        "-".join(str(t) for t in shared[i : i + tks.SPAN_L])
        for i in range(len(shared) - tks.SPAN_L + 1)
    }
    assert set(got) == want_spans
    assert all(v == (2, 2) for v in got.values())


# ----------------------------------------------------------- BPE kernel


def _ref_apply(s, merges):
    for a, b, nid in merges:
        ns, i = [], 0
        while i < len(s):
            if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                ns.append(nid)
                i += 2
            else:
                ns.append(s[i])
                i += 1
        s = ns
    return s


def test_bpe_apply_overlap_and_boundaries(spark):
    """Chained equal pairs merge leftmost-first; a pair split across
    two documents must NOT merge."""
    rows = [
        (1, [7, 7, 7, 7]),  # → [300, 300]
        (2, [7, 7, 7]),  # → [300, 7]
        (3, [1, 7]),  # ends with a …
        (4, [7, 2]),  # … next row starts with b: no cross-row merge
        (5, []),  # empty row survives
        (6, [7]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    got = {
        r["doc_id"]: list(r["tokens"])
        for r in tks.bpe_apply(df, [(7, 7, 300)]).collect()
    }
    assert got == {
        1: [300, 300],
        2: [300, 7],
        3: [1, 7],
        4: [7, 2],
        5: [],
        6: [7],
    }


def test_bpe_apply_matches_reference_on_corpus(spark, tok):
    merges = [(34, 58, 256), (256, 34, 257), (44, 34, 258)]
    sample = tok.select("doc_id", "tokens").limit(200)
    got = {
        r["doc_id"]: list(r["tokens"])
        for r in tks.bpe_apply(sample, merges).collect()
    }
    for r in sample.collect():
        assert got[r["doc_id"]] == _ref_apply(list(r["tokens"]), merges)


def test_bpe_train_matches_reference(spark, tok):
    got = [tuple(r) for r in tks.bpe_train(tok, n_merges=6).collect()]
    seqs = [list(r["tokens"]) for r in tok.select("tokens").collect()]
    assert got == tks.bpe_reference_train(seqs, n_merges=6)
    # ids minted in rank order from BPE_FIRST_ID, counts non-increasing
    assert [m[3] for m in got] == [tks.BPE_FIRST_ID + i for i in range(len(got))]
    assert all(got[i][4] >= got[i + 1][4] for i in range(len(got) - 1))


def test_bpe_compression_shrinks(spark, tok):
    from otel_worker_spark import registry

    comp = registry.token_bpe_compression(spark, SF_DIR).collect()
    assert len(comp) >= 5
    for r in comp:
        assert 0 < r["enc_tokens"] < r["orig_tokens"]
    # merges cache is shared with the merges row
    m = registry.token_bpe_merges(spark, SF_DIR).collect()
    assert len(m) == 8


def test_span_key_expr_is_eight_byte_hash(spark, tok):
    n = (
        tok.limit(5)
        .select(F.explode(tks.span_key_expr()).alias("k"))
        .where(F.col("k").isNotNull())
        .count()
    )
    assert n > 0


def test_bigram_typicality_oracle(spark, con, tok):
    assert_match(tks.bigram_typicality(tok), con, tks.bigram_typicality_sql(), 50)


def test_bigram_typicality_matches_python_reference(spark):
    """Brute-force reference on an in-memory corpus: MLE transition
    probs quantized per pair, per-doc BIGINT sum — including the
    repeated-pair and shared-context cases."""
    import math

    seqs = {
        "d1": [1, 2, 1, 2, 3],
        "d2": [1, 2, 2, 2],
        "d3": [9],  # no pairs → no output row
    }
    df = spark.createDataFrame(
        [(d, t, len(t), "s") for d, t in seqs.items()],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    cnt: dict[tuple[int, int], int] = {}
    for t in seqs.values():
        for a, b in zip(t, t[1:]):
            cnt[(a, b)] = cnt.get((a, b), 0) + 1
    ctx: dict[int, int] = {}
    for (a, _), c in cnt.items():
        ctx[a] = ctx.get(a, 0) + c
    p_u = {k: math.floor(1000000.0 * (c / ctx[k[0]])) for k, c in cnt.items()}
    want = {}
    for d, t in seqs.items():
        prs = list(zip(t, t[1:]))
        if prs:
            want[d] = (len(prs), sum(p_u[p] for p in prs))
    got = {
        r["doc_id"]: (r["n_pairs"], r["score_u"])
        for r in tks.bigram_typicality(df).collect()
    }
    assert got == want


def test_zipf_coverage_oracle(spark, con, tok):
    assert_match(tks.zipf_coverage(tok), con, tks.zipf_coverage_sql(), 50)


def test_zipf_coverage_is_a_coverage_curve(spark, tok):
    """Ranks are a 1..|V| permutation, counts non-increasing along the
    rank order, and the last cumulative count is the corpus token
    total."""
    rows = sorted(tks.zipf_coverage(tok).collect(), key=lambda r: r["rank"])
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    running = 0
    for r in rows:
        running += r["cnt"]
        assert r["cum_cnt"] == running
    total = tok.select(F.sum(F.size("tokens"))).first()[0]
    assert rows[-1]["cum_cnt"] == total


def test_source_divergence_oracle(spark, con, tok):
    assert_match(tks.source_divergence(tok), con, tks.source_divergence_sql(), 2)


def test_source_divergence_matches_python_reference(spark):
    """Brute force over the FULL vocab (absent tokens included): the
    windowed plan must reproduce Σ_t |cnt_s(t)·N − cnt(t)·n_s| even
    though it never materializes source×vocab. Includes an identical-
    distribution source pair (same Σ|P_s − P|, so their l1_num are
    exactly proportional to their masses) and a disjoint-vocab
    source."""
    seqs = {
        "a1": ("src-a", [1, 1, 2]),
        "a2": ("src-a", [1, 2, 2]),
        "b1": ("src-b", [1, 1, 2, 1, 2, 2]),  # same dist as src-a, 2x mass
        "c1": ("src-c", [7, 7, 7]),  # disjoint vocab
    }
    df = spark.createDataFrame(
        [(d, t, len(t), s) for d, (s, t) in seqs.items()],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    cnt_all: dict[int, int] = {}
    per: dict[str, dict[int, int]] = {}
    for s, t in seqs.values():
        for x in t:
            cnt_all[x] = cnt_all.get(x, 0) + 1
            per.setdefault(s, {})[x] = per.setdefault(s, {}).get(x, 0) + 1
    N = sum(cnt_all.values())
    want = {}
    for s, c in per.items():
        n_s = sum(c.values())
        l1 = sum(abs(c.get(t, 0) * N - cnt_all[t] * n_s) for t in cnt_all)
        want[s] = (n_s, l1)
    got = {
        r["source"]: (r["n_src"], r["l1_num"])
        for r in tks.source_divergence(df).collect()
    }
    assert got == want
    # identical distributions ⇒ l1_num proportional to source mass
    # (l1_num = N·n_s·Σ_t|P_s(t) − P(t)|, same Σ for src-a/src-b)
    n_a, l1_a = want["src-a"]
    n_b, l1_b = want["src-b"]
    assert l1_a * n_b == l1_b * n_a
    assert want["src-c"][1] > 0


def test_token_decontaminate_oracle(spark, con, tok):
    assert_match(
        tks.token_decontaminate(tok), con, tks.token_decontaminate_sql(), 100
    )


def test_token_decontaminate_flags_planted_overlap(spark):
    """doc_id 'evt-0' (0 % mod == 0) is the benchmark; a training doc
    sharing one L-window with it is flagged with the exact hit count,
    a disjoint doc is not, and a short doc carries 0/0 windows."""
    L = tks.SPAN_L
    bench = list(range(100, 100 + 2 * L))  # 2L tokens → L+1 windows
    hit = [255] * 5 + bench[:L] + [254] * 5  # exactly 1 benchmark window
    clean = list(range(1, 1 + 2 * L))  # offset by 99 → disjoint windows
    short = [1, 2, 3]
    df = spark.createDataFrame(
        [
            ("evt-0", bench, len(bench), "s"),
            ("evt-1", hit, len(hit), "s"),
            ("evt-2", clean, len(clean), "s"),
            ("evt-3", short, len(short), "s"),
        ],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    got = {
        r["doc_id"]: (r["n_windows"], r["n_hits"], r["contaminated"])
        for r in tks.token_decontaminate(df).collect()
    }
    assert set(got) == {"evt-1", "evt-2", "evt-3"}  # benchmark row excluded
    assert got["evt-1"] == (len(hit) - L + 1, 1, 1)
    assert got["evt-2"] == (len(clean) - L + 1, 0, 0)
    assert got["evt-3"] == (0, 0, 0)


def test_jobs_token_curate_cli(spark, tmp_path):
    """`jobs.py token-curate` end-to-end with an EXTERNAL benchmark:
    every input doc is gated, the receipt's counters are consistent,
    and --kept-out lands exactly the kept token rows."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tok = token_sequences_from_events(spark, SF_DIR).where(
        "CAST(substr(doc_id, 5) AS BIGINT) < 150"
    )
    bench = token_sequences_from_events(spark, SF_DIR).where(
        "CAST(substr(doc_id, 5) AS BIGINT) % 101 = 0"
    )
    tok_dir, bench_dir = str(tmp_path / "tok"), str(tmp_path / "bench")
    out_dir, kept_dir = str(tmp_path / "gate"), str(tmp_path / "kept")
    tok.write.parquet(tok_dir)
    bench.write.parquet(bench_dir)
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs.py"), "token-curate",
         "--tokens", tok_dir, "--out", out_dir,
         "--bench", bench_dir, "--kept-out", kept_dir],
        capture_output=True, text=True, timeout=600, env=env, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    receipt = json.loads(proc.stdout.strip().splitlines()[-1])
    n_in = tok.count()
    assert receipt["docs"] == n_in  # external bench ⇒ ALL docs gated
    gate = spark.read.parquet(out_dir)
    assert gate.count() == n_in
    kept_ids = {r["doc_id"] for r in gate.where("kept = 1").collect()}
    assert receipt["kept"] == len(kept_ids)
    got_kept = spark.read.parquet(kept_dir)
    assert {r["doc_id"] for r in got_kept.collect()} == kept_ids
    # the benchmark doc (evt-0) IS in the input window and shares the
    # JSON scaffolding with itself → must be flagged contaminated
    flags = {r["doc_id"]: r["contaminated"] for r in gate.collect()}
    assert flags["evt-0"] == 1


# ------------------------------------------- mixture / sampling / salt


def _mk_tokens(spark, rows):
    """(doc_id, tokens, n_tok, source) frame from (doc_id, n_tok, source)
    triples — token contents don't matter to the mixture family."""
    data = [(d, list(range(n % 7 + 2)), n, s) for d, n, s in rows]
    return spark.createDataFrame(
        data, "doc_id string, tokens array<int>, n_tok int, source string"
    )


def test_mixture_weights_oracle(spark, con, tok):
    assert_match(tks.mixture_weights(tok), con, tks.mixture_weights_sql(), 2)


def test_sample_gate_oracle(spark, con, tok):
    assert_match(tks.sample_gate(tok), con, tks.sample_gate_sql(), 500)


def test_salted_receipts_oracle(spark, con, tok):
    assert_match(tks.salted_receipts(tok), con, tks.salted_receipts_sql(), 2)


def test_mixture_weights_invariants(spark):
    """α=1/2 reweighting on a 100×-skewed corpus: exact isqrt
    numerators, weights sum to ≤1e6 ppm (floor rounding), the small
    source is up-weighted past one epoch and the huge one below."""
    import math

    rows = [(f"s{i}", 1000, "small") for i in range(10)] + [
        (f"b{i}", 1000, "big") for i in range(1000)
    ]
    out = {
        r["source"]: r
        for r in tks.mixture_weights(_mk_tokens(spark, rows)).collect()
    }
    assert out["small"]["n_src"] == 10_000 and out["big"]["n_src"] == 1_000_000
    for r in out.values():
        assert r["w_num"] == math.isqrt(r["n_src"])
    total_ppm = sum(r["weight_ppm"] for r in out.values())
    assert 1_000_000 - len(out) <= total_ppm <= 1_000_000
    assert out["small"]["epochs_permille"] > 1000 > out["big"]["epochs_permille"]
    budget = sum(r["n_src"] for r in out.values())
    assert sum(r["sampled_tokens"] for r in out.values()) <= budget


def test_sample_gate_realizes_rates_and_is_deterministic(spark):
    """The md5-uniform thinning hits the mixture's keep rate in
    expectation (±5σ binomial band) on the down-weighted source, keeps
    everything on the up-weighted one, kept ⇔ u_q < rate_q row-wise,
    and a re-execution keeps EXACTLY the same rows (the retry-safety
    property rand() cannot give)."""
    rows = [(f"s{i}", 1000, "small") for i in range(50)] + [
        (f"b{i}", 1000, "big") for i in range(4000)
    ]
    tok = _mk_tokens(spark, rows)
    g = tks.sample_gate(tok).toPandas().set_index("doc_id")
    assert ((g["u_q"] < g["rate_q"]).astype(int) == g["kept"]).all()
    small = g[g["source"] == "small"]
    assert small["kept"].all()  # upsampled → rate capped at keep-all
    big = g[g["source"] == "big"]
    p = big["rate_q"].iloc[0] / tks.SAMPLE_Q
    assert p < 1
    n = len(big)
    sigma = (n * p * (1 - p)) ** 0.5
    assert abs(big["kept"].sum() - n * p) < 5 * sigma
    g2 = tks.sample_gate(tok).toPandas().set_index("doc_id")
    assert g2["kept"].sort_index().equals(g["kept"].sort_index())


def test_sample_gate_plan_broadcasts_rates(spark, tok):
    """The corpus side never shuffles: the per-source rate frame joins
    in via BroadcastHashJoin, not a sort-merge exchange."""
    plan = (
        tks.sample_gate(tok)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_salted_receipts_matches_plain_groupby_on_hot_key(spark):
    """90%-hot-key input: the two-phase salted aggregate is
    semantically invisible, and its phase-1 exchange really keys on
    (source, content-salt) — pmod(xxhash64(...)) in the plan."""
    rows = [(f"h{i}", i % 100 + 1, "hot") for i in range(9000)] + [
        (f"c{i}", i % 100 + 1, f"cold-{i % 7}") for i in range(1000)
    ]
    tok = _mk_tokens(spark, rows)
    salted = tks.salted_receipts(tok)
    plain = (
        tok.groupBy("source")
        .agg(F.count("*").alias("row_count"), F.sum("n_tok").alias("sum_n_tok"))
    )
    a = salted.toPandas().sort_values("source").reset_index(drop=True)
    b = plain.toPandas().sort_values("source").reset_index(drop=True)
    assert a.equals(b[a.columns])
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "pmod" in plan and "xxhash64" in plan


def test_jobs_token_curate_cli_with_mixture(spark, tmp_path):
    """`jobs.py token-curate --mixture` composes the full release
    pipeline: gate → freeze mixture rates → deterministic thinning.
    Short unique docs (no L-windows) all pass the gate, so the
    sampled count is pure mixture behavior: the hot source thins, the
    small source survives whole, and --rates-out lands the frozen
    rate table the streaming gate would serve."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rows = [(f"hot-{i}", 40 + i % 9, "hot") for i in range(3000)] + [
        (f"small-{i}", 40 + i % 9, "small") for i in range(50)
    ]
    tok = _mk_tokens(spark, rows)  # 2-8 tokens/doc → below SPAN_L
    bench = _mk_tokens(spark, [(f"bench-{i}", 40, "bench") for i in range(5)])
    tok_dir, bench_dir = str(tmp_path / "tok"), str(tmp_path / "bench")
    out_dir, kept_dir = str(tmp_path / "gate"), str(tmp_path / "kept")
    rates_dir = str(tmp_path / "rates")
    tok.write.parquet(tok_dir)
    bench.write.parquet(bench_dir)
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs.py"), "token-curate",
         "--tokens", tok_dir, "--out", out_dir, "--bench", bench_dir,
         "--kept-out", kept_dir, "--mixture", "--rates-out", rates_dir],
        capture_output=True, text=True, timeout=600, env=env, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    receipt = json.loads(proc.stdout.strip().splitlines()[-1])
    assert receipt["kept"] == 3050  # no windows → everything gated in
    assert 0 < receipt["sampled"] < 3050  # mixture actually thinned
    landed = spark.read.parquet(kept_dir)
    assert landed.count() == receipt["sampled"]
    # the landed rows are exactly the batch gate's keeps against the
    # SAME frozen rates — the CLI is replayable end to end
    rates = spark.read.parquet(rates_dir)
    want = {
        r["doc_id"]
        for r in tks.apply_sample_gate(tok, rates).where("kept = 1").collect()
    }
    assert {r["doc_id"] for r in landed.collect()} == want
    by_src = {r["source"]: r["rate_q"] for r in rates.collect()}
    assert by_src["small"] == tks.SAMPLE_Q  # tiny source: keep-all
    assert by_src["hot"] < tks.SAMPLE_Q  # hot source: thinned
