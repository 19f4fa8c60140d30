#!/usr/bin/env python
"""Shuffle-economics audit: measured bytes, not wall-clock.

Wall-clock on this sandbox drifts up to 4x with host weather
(BASELINE.md), but the *bytes a plan moves* are a property of the plan
and the data alone — deterministic run to run. This tool runs a
representative slice of the registry under Spark's event log, sums
per-query input / shuffle-write / shuffle-read / spill bytes from the
task metrics, and extrapolates each query's shuffle volume to the
north-rule scale (10^12 rows of its driving table). That extrapolation
— shuffle TB at target scale vs a real cluster's aggregate disk and
network — is the quantitative form of "would this plan survive 100x",
which timing on a noisy single box cannot answer.

Methodology:
- one SparkSession with ``spark.eventLog.enabled`` pointed at a temp
  dir; every query runs under its own job group
  (``sc.setJobGroup``), so AQE's many jobs, broadcast-exchange jobs,
  and the final action all attribute to the query that spawned them;
- each query executes via the ``noop`` datasource writer (full plan,
  full width, nothing collected to the driver);
- the parse cache (``registry.enable_parse_cache``) stays OFF so each
  query pays — and therefore shows — its own parse cost;
- after ``spark.stop()`` the finalized event log is parsed:
  SparkListenerJobStart maps stages -> job group, SparkListenerTaskEnd
  accumulates the task metrics.

Output: one JSON document on stdout, and (with --write) SCALE.md's
measured table refreshed in place.

Usage:
  python shuffle_audit.py [--sf /root/testdata/sf0.1] [--cpus 16]
                          [--queries q1,q2] [--write]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile
import time
from collections import defaultdict

#: representative slice: the heaviest op of each family plus the
#: headline pipeline path (full list in __spark_entry__.queries()).
DEFAULT_QUERIES = [
    "pipeline_parse_spans",
    "pipeline_enrich_agg",
    "pipeline_trace_summaries",
    "pipeline_traces_list",
    "rel_sessionize",
    "rel_range_join",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_groups",
    "corpus_pack_chunks",
    "corpus_curate_pack",
    "text_unigram_rarity",
    "ann_ivf_topk",
    "ann_embedding_near_dup",
]

#: which table a query's cost scales with (prefix -> parquet name);
#: extrapolation is per driving table: 10^12 rows OF THAT TABLE.
DRIVING_TABLE = {
    "pipeline_": "events",
    "rel_": "events",
    "dedup_": "documents",
    "corpus_": "documents",
    "text_": "documents",
    "multimodal_": "documents",
    "ann_": "embeddings",
}

TARGET_ROWS = 1_000_000_000_000  # the north-rule 10^12-sequence scale


def driving_table(qname: str) -> str:
    for prefix, table in DRIVING_TABLE.items():
        if qname.startswith(prefix):
            return table
    return "events"


def table_rows(sf_dir: str, table: str) -> int:
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{table}.parquet")
    if os.path.isdir(path):
        # --prepartition rewrites each table as an N-file directory
        return sum(
            pq.ParquetFile(p).metadata.num_rows
            for p in glob.glob(os.path.join(path, "*.parquet"))
        )
    return pq.ParquetFile(path).metadata.num_rows


def prepartition_inputs(sf_dir: str, cpus: int, n_parts: int, dest: str) -> str:
    """Materialize every ``<table>.parquet`` of ``sf_dir`` as an
    ``n_parts``-file parquet directory under ``dest`` (identical rows,
    round-robin distribution) and return the new sf dir.

    Why: the fixture tables are single parquet files, so the
    ``spread()`` guard (ops/common.py — repartition only when input
    partitions < defaultParallelism) FIRES in a raw-fixture audit and
    its round-robin exchange is charged to the query. Production
    inputs arrive in thousands of partitions and the guard no-ops;
    auditing over a pre-partitioned copy measures THAT plan — the
    bytes a query moves because of its algebra, not because the
    fixture is one file (VERDICT r6 item 5)."""
    from otel_worker_spark.session import get_spark

    spark = get_spark(app_name="audit-prep", cores=cpus, shuffle_partitions=cpus)
    try:
        for src in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
            out = os.path.join(dest, os.path.basename(src))
            (
                spark.read.parquet(src)
                .repartition(n_parts)
                .write.mode("overwrite")
                .parquet(out)
            )
    finally:
        spark.stop()
    return dest


#: forced-spill probe (r4 verdict item 4): the sf0.1 audit shows zero
#: spill everywhere, which means the spill paths were UNTESTED. The
#: probe reruns one wide op (sessionize: a window whose per-user
#: groups hold ~100 rows) with a tiny in-memory window buffer
#: (``spark.sql.windowExec.buffer.spill.threshold`` — a dynamic SQL
#: conf driving the real UnsafeExternalSorter spill machinery), checks
#: the result is unchanged, and attributes the spilled bytes under
#: their own job group in the event log.
SPILL_PROBE_QUERY = "rel_sessionize"
SPILL_PROBE_GROUP = "spill_probe"
SPILL_THRESHOLD_ROWS = 32


def run_queries(
    sf_dir: str, cpus: int, names: list[str], event_dir: str
) -> tuple[dict[str, float], dict]:
    """Execute each registry query under its own job group; returns
    (per-query wall seconds — context only, bytes are the product —
    and the forced-spill probe's correctness verdict)."""
    from otel_worker_spark.session import get_spark

    spark = get_spark(
        app_name="shuffle-audit",
        cores=cpus,
        shuffle_partitions=cpus,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{event_dir}",
            "spark.eventLog.compress": "false",
        },
    )
    import __spark_entry__ as entry

    queries = entry.queries()
    walls: dict[str, float] = {}
    probe: dict = {}
    try:
        sc = spark.sparkContext
        for name in names:
            fn = queries[name]
            sc.setJobGroup(name, name, interruptOnCancel=False)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            walls[name] = round(time.perf_counter() - t0, 3)
            print(f"  {name}: {walls[name]} s", file=sys.stderr)
        # ---- forced-spill probe -------------------------------------
        fn = queries[SPILL_PROBE_QUERY]
        sc.setJobGroup(f"{SPILL_PROBE_GROUP}_base", "unthresholded control")
        base = sorted(map(str, fn(spark, sf_dir).collect()))
        # BOTH thresholds: in.memory.threshold converts the plain row
        # array to an UnsafeExternalSorter, spill.threshold then force-
        # spills that sorter to disk (with only the latter set, buffers
        # under the 4096-row default never convert and nothing spills)
        spark.conf.set(
            "spark.sql.windowExec.buffer.in.memory.threshold",
            str(SPILL_THRESHOLD_ROWS // 2),
        )
        spark.conf.set(
            "spark.sql.windowExec.buffer.spill.threshold",
            str(SPILL_THRESHOLD_ROWS),
        )
        try:
            sc.setJobGroup(SPILL_PROBE_GROUP, "forced-spill window run")
            spilled = sorted(map(str, fn(spark, sf_dir).collect()))
        finally:
            spark.conf.unset("spark.sql.windowExec.buffer.spill.threshold")
            spark.conf.unset("spark.sql.windowExec.buffer.in.memory.threshold")
        probe = {
            "query": SPILL_PROBE_QUERY,
            "buffer_threshold_rows": SPILL_THRESHOLD_ROWS,
            "rows_match_unthresholded": base == spilled,
        }
    finally:
        spark.stop()
    return walls, probe


def parse_event_log(event_dir: str) -> dict[str, dict[str, int]]:
    """Sum task metrics per job group from the finalized event log."""
    logs: list[str] = []
    for p in glob.glob(os.path.join(event_dir, "*")):
        if os.path.isdir(p):
            # Spark 4 event-log v2: a directory of events_* part files
            # (plus an appstatus_* marker, which json-parses to nothing)
            logs += [q for q in glob.glob(os.path.join(p, "*")) if os.path.isfile(q)]
        else:
            logs.append(p)
    finalized = [p for p in logs if ".inprogress" not in os.path.basename(p)]
    if finalized:  # tolerate an unflushed log rather than crash
        logs = finalized
    stage_group: dict[int, str] = {}
    totals: dict[str, dict[str, int]] = defaultdict(lambda: defaultdict(int))
    for path in logs:
        with open(path, encoding="utf-8", errors="replace") as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                kind = ev.get("Event")
                if kind == "SparkListenerJobStart":
                    group = (ev.get("Properties") or {}).get("spark.jobGroup.id")
                    if not group:
                        continue
                    stage_ids = ev.get("Stage IDs") or [
                        si["Stage ID"] for si in ev.get("Stage Infos", [])
                    ]
                    for sid in stage_ids:
                        stage_group.setdefault(sid, group)
                elif kind == "SparkListenerTaskEnd":
                    group = stage_group.get(ev.get("Stage ID"))
                    if group is None:
                        continue
                    tm = ev.get("Task Metrics") or {}
                    agg = totals[group]
                    agg["tasks"] += 1
                    agg["input_bytes"] += (tm.get("Input Metrics") or {}).get("Bytes Read", 0)
                    agg["input_records"] += (tm.get("Input Metrics") or {}).get("Records Read", 0)
                    sw = tm.get("Shuffle Write Metrics") or {}
                    agg["shuffle_write_bytes"] += sw.get("Shuffle Bytes Written", 0)
                    sr = tm.get("Shuffle Read Metrics") or {}
                    agg["shuffle_read_bytes"] += sr.get("Remote Bytes Read", 0) + sr.get(
                        "Local Bytes Read", 0
                    )
                    agg["spill_memory_bytes"] += tm.get("Memory Bytes Spilled", 0)
                    agg["spill_disk_bytes"] += tm.get("Disk Bytes Spilled", 0)
    return {k: dict(v) for k, v in totals.items()}


def audit(sf_dir: str, cpus: int, names: list[str]) -> dict:
    event_dir = tempfile.mkdtemp(prefix="spark-events-")
    walls, probe = run_queries(sf_dir, cpus, names, event_dir)
    metrics = parse_event_log(event_dir)
    rows_cache = {t: table_rows(sf_dir, t) for t in {driving_table(n) for n in names}}
    out = {"sf_dir": sf_dir, "cpus": cpus, "target_rows": TARGET_ROWS, "queries": {}}
    probe_metrics = metrics.get(SPILL_PROBE_GROUP, {})
    out["spill_probe"] = {
        **probe,
        "spill_disk_bytes": probe_metrics.get("spill_disk_bytes", 0),
        "spill_memory_bytes": probe_metrics.get("spill_memory_bytes", 0),
    }
    for name in names:
        m = metrics.get(name, {})
        table = driving_table(name)
        nrows = rows_cache[table]
        sw = m.get("shuffle_write_bytes", 0)
        out["queries"][name] = {
            **m,
            # JIT-COLD single run inside the audit session — NOT a
            # benchmark timing (BENCH_DETAIL.json carries warm sweeps);
            # the artifact's claim is the byte columns
            "cold_wall_s": walls.get(name),
            "driving_table": table,
            "driving_rows": nrows,
            "shuffle_bytes_per_row": round(sw / nrows, 2),
            # shuffle volume if the driving table had 10^12 rows, in TB
            "shuffle_tb_at_target": round(sw / nrows * TARGET_ROWS / 1e12, 3),
        }
    return out


def render_markdown(result: dict) -> str:
    lines = [
        "| query | driving table | input MB | shuffle write MB | shuffle read MB | spill | B/row | TB @10^12 rows |",
        "|---|---|---|---|---|---|---|---|",
    ]
    mb = lambda b: f"{b / 1e6:,.1f}"
    for name, q in result["queries"].items():
        spill = q.get("spill_disk_bytes", 0) + q.get("spill_memory_bytes", 0)
        lines.append(
            f"| {name} | {q['driving_table']} ({q['driving_rows']:,}) "
            f"| {mb(q.get('input_bytes', 0))} | {mb(q.get('shuffle_write_bytes', 0))} "
            f"| {mb(q.get('shuffle_read_bytes', 0))} | {'0' if spill == 0 else mb(spill) + ' MB'} "
            f"| {q['shuffle_bytes_per_row']:,.1f} | {q['shuffle_tb_at_target']:,.2f} |"
        )
    return "\n".join(lines)


# ------------------------------------------------- decade probe (sf1)
#
# r5 verdict item 5: validate the byte-audit extrapolation ONE DECADE
# further for the heavy families (dedup / ann / corpus). The probe
# replicates the sf0.1 documents+embeddings ×10 (≈ sf1) and runs the
# same heavy ops at BOTH scales in one event-logged session; the claim
# checked is that shuffle bytes stay ~linear in the driving rows
# (bytes/row flat across the decade), plus that the spill machinery
# copes if the bigger inputs force it.
#
# Replicas must NOT be byte-identical: identical documents would give
# every doc 10 exact copies — C(10,2)=45 candidate pairs per doc, a
# quadratic-in-replicas pair graph that says nothing about linear
# scaling. Each replica instead applies its own character-substitution
# cipher: an injective char map preserves the 5-gram shingle-set
# structure (and therefore the near-dup density) WITHIN a replica
# while decorrelating replicas, so candidates grow ~10×, not 45×.

DECADE_REP = 10
DECADE_QUERIES = (
    "dedup_minhash_pairs_128",
    "dedup_groups",
    "ann_ivfpq_topk",
    "corpus_pack_chunks",
)
_ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _cipher(i: int) -> str:
    import random as _random

    letters = list(_ALPHA)
    _random.Random(1000 + i).shuffle(letters)
    return "".join(letters)


def _replicate_sf(spark, sf_dir: str, out_dir: str, rep: int = DECADE_REP) -> None:
    """Write a ×rep sf directory: documents/embeddings replicated with
    per-replica id offsets (+ the cipher on text); everything else
    symlinked from the base sf (read-only)."""
    import functools

    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    doc_parts = []
    for i in range(rep):
        part = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        if i:  # replica 0 stays byte-identical to the base corpus
            part = part.withColumn(
                "text", F.expr(f"translate(text, '{_ALPHA}', '{_cipher(i)}')")
            )
        doc_parts.append(part)
    functools.reduce(lambda a, b: a.union(b), doc_parts).repartition(64).write.parquet(
        f"{out_dir}/documents.parquet"
    )
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    functools.reduce(
        lambda a, b: a.union(b),
        [
            embs.withColumn("vec_id", F.col("vec_id") + F.lit(i * 1_000_000))
            for i in range(rep)
        ],
    ).repartition(16).write.parquet(f"{out_dir}/embeddings.parquet")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"):
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)


def _decade_jobs(spark, sf_dir: str) -> dict:
    from otel_worker_spark.ops import corpus as cp
    from otel_worker_spark.ops import dedup as dd
    from otel_worker_spark.ops import similarity as sim

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return {
        "dedup_minhash_pairs_128": lambda: dd.minhash_lsh_pairs(
            docs, hash_impl="xxhash64", n_perms=dd.PROD_PERMS, n_bands=dd.PROD_BANDS
        ),
        "dedup_groups": lambda: dd.dedup_groups(docs, hash_impl="xxhash64"),
        "ann_ivfpq_topk": lambda: sim.ivfpq_topk(embs),
        # pack_chunks: output AND its per-source cumsum window scale
        # linearly with docs — the realistic window-spill candidate
        "corpus_pack_chunks": lambda: cp.pack_chunks(docs),
    }


def decade_probe(sf_dir: str, cpus: int) -> dict:
    from otel_worker_spark.ops import dedup as dd
    from otel_worker_spark.session import get_spark

    event_dir = tempfile.mkdtemp(prefix="spark-events-dec-")
    rep_root = tempfile.mkdtemp(prefix="ows-decade-")
    rep_dir = os.path.join(rep_root, "x10")
    spark = get_spark(
        app_name="decade-probe",
        cores=cpus,
        shuffle_partitions=cpus,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{event_dir}",
            "spark.eventLog.compress": "false",
        },
    )
    runs: dict[tuple[str, str], dict] = {}
    try:
        _replicate_sf(spark, sf_dir, rep_dir)
        sc = spark.sparkContext
        for tag, d in (("1x", sf_dir), ("10x", rep_dir)):
            for name, fn in _decade_jobs(spark, d).items():
                group = f"dec_{name}@{tag}"
                sc.setJobGroup(group, group, interruptOnCancel=False)
                t0 = time.perf_counter()
                rows = fn().count()
                runs[(name, tag)] = {
                    "rows_out": rows,
                    "wall_s": round(time.perf_counter() - t0, 3),
                }
                print(f"  {group}: {rows} rows, {runs[(name, tag)]['wall_s']} s",
                      file=sys.stderr)
                dd.release_persisted_signatures()
    finally:
        spark.stop()
        import shutil as _shutil

        _shutil.rmtree(rep_root, ignore_errors=True)
    metrics = parse_event_log(event_dir)
    n_docs = table_rows(sf_dir, "documents")
    n_embs = table_rows(sf_dir, "embeddings")
    out = {"sf_dir": sf_dir, "cpus": cpus, "replication": DECADE_REP, "queries": {}}
    for name in DECADE_QUERIES:
        base_rows = n_embs if name.startswith("ann_") else n_docs
        per = {}
        for tag, mult in (("1x", 1), ("10x", DECADE_REP)):
            m = metrics.get(f"dec_{name}@{tag}", {})
            sw = m.get("shuffle_write_bytes", 0)
            per[tag] = {
                **runs.get((name, tag), {}),
                "shuffle_write_bytes": sw,
                "shuffle_read_bytes": m.get("shuffle_read_bytes", 0),
                "input_bytes": m.get("input_bytes", 0),
                "spill_disk_bytes": m.get("spill_disk_bytes", 0),
                "driving_rows": base_rows * mult,
                "shuffle_bytes_per_row": round(sw / (base_rows * mult), 3),
            }
        b1 = per["1x"]["shuffle_bytes_per_row"]
        b10 = per["10x"]["shuffle_bytes_per_row"]
        per["bytes_per_row_ratio"] = (
            round(b10 / b1, 3) if b1 > 0 else (1.0 if b10 == 0 else float("inf"))
        )
        out["queries"][name] = per
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES), help="comma list, or 'all' for every registry query")
    ap.add_argument("--json-out", default="SCALE_AUDIT.json")
    ap.add_argument("--merge", action="store_true",
                    help="merge this run's query rows into the existing "
                    "json (registry order) instead of replacing the whole "
                    "sweep — for targeted re-audits at the SAME sf/cpus")
    ap.add_argument("--write", action="store_true", help="refresh SCALE.md's measured table")
    ap.add_argument("--decade", action="store_true",
                    help="run the ×10 (≈sf1) heavy-family probe and merge "
                         "it into --json-out under 'decade_probe'")
    ap.add_argument("--prepartition", type=int, default=0, metavar="N",
                    help="audit over an N-file copy of every input table "
                    "(production-shaped inputs: the spread() guard no-ops, "
                    "so the audited plan is the production plan)")
    args = ap.parse_args()
    prep_dir = None
    orig_sf = args.sf
    if args.prepartition:
        prep_dir = tempfile.mkdtemp(prefix="ows-audit-prep-")
        print(
            f"pre-partitioning {args.sf} -> {prep_dir} ({args.prepartition} files/table)",
            file=sys.stderr,
        )
        args.sf = prepartition_inputs(args.sf, args.cpus, args.prepartition, prep_dir)
    if args.decade:
        result = decade_probe(args.sf, args.cpus)
        merged = {}
        if os.path.exists(args.json_out):
            try:
                with open(args.json_out) as fh:
                    merged = json.load(fh)
            except ValueError:
                merged = {}
        merged["decade_probe"] = result
        with open(args.json_out, "w") as fh:
            json.dump(merged, fh, indent=1)
        print(json.dumps(result))
        return
    if args.queries.strip() == "all":
        import __spark_entry__ as entry

        names = list(entry.queries().keys())
    else:
        names = [q.strip() for q in args.queries.split(",") if q.strip()]
    result = audit(args.sf, args.cpus, names)
    if prep_dir is not None:
        # the artifact should name the REAL fixture, plus its basis
        result["sf_dir"] = orig_sf
        result["prepartition"] = args.prepartition
        import shutil as _shutil

        _shutil.rmtree(prep_dir, ignore_errors=True)
    # preserve sections other modes own (e.g. decade_probe) — the
    # audit refresh must not clobber the ×10 probe's archived numbers
    if os.path.exists(args.json_out):
        try:
            with open(args.json_out) as fh:
                prior = json.load(fh)
        except ValueError:
            prior = {}
        for key in ("decade_probe",):
            if key in prior:
                result[key] = prior[key]
        if args.merge:
            import __spark_entry__ as entry

            order = list(entry.queries().keys())
            allq = {**prior.get("queries", {}), **result["queries"]}
            result["queries"] = {n: allq[n] for n in order if n in allq}
            # keep prior-only top-level sections this run didn't produce
            # (spill_probe, serve_note, ...)
            for k, v in prior.items():
                if k not in result and k != "queries":
                    result[k] = v
    with open(args.json_out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "queries"}))
    print(render_markdown(result))
    if args.write:
        _rewrite_scale_md(result)


BEGIN_MARK = "<!-- shuffle-audit:begin -->"
END_MARK = "<!-- shuffle-audit:end -->"


def _rewrite_scale_md(result: dict, path: str | None = None) -> None:
    path = path or os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALE.md")
    if not os.path.exists(path):
        return
    text = open(path).read()
    if BEGIN_MARK not in text or END_MARK not in text:
        return
    head, rest = text.split(BEGIN_MARK, 1)
    _, tail = rest.split(END_MARK, 1)
    prep = result.get("prepartition")
    basis = (
        f", inputs pre-partitioned to {prep} files/table (production-shaped: "
        f"the spread() under-partitioned-input guard no-ops, so these are the "
        f"production plans' bytes)" if prep else ""
    )
    block = (
        f"{BEGIN_MARK}\nMeasured at `{result['sf_dir']}`, local[{result['cpus']}]"
        f"{basis} (bytes are plan properties — stable across host weather):\n\n"
        + render_markdown(result)
        + f"\n{END_MARK}"
    )
    with open(path, "w") as fh:
        fh.write(head + block + tail)


if __name__ == "__main__":
    main()
