"""Spark-free units for shuffle_audit: event-log parsing and the
SCALE.md table rewrite. The Spark-side runner is exercised by the
audit itself (SCALE_AUDIT.json is the archived artifact)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import shuffle_audit as sa


def _task_end(stage_id, input_bytes=0, sw=0, sr_local=0, sr_remote=0, spill_disk=0):
    return {
        "Event": "SparkListenerTaskEnd",
        "Stage ID": stage_id,
        "Task Metrics": {
            "Input Metrics": {"Bytes Read": input_bytes, "Records Read": 0},
            "Shuffle Write Metrics": {"Shuffle Bytes Written": sw},
            "Shuffle Read Metrics": {
                "Local Bytes Read": sr_local,
                "Remote Bytes Read": sr_remote,
            },
            "Memory Bytes Spilled": 0,
            "Disk Bytes Spilled": spill_disk,
        },
    }


def _job_start(job_id, stage_ids, group):
    return {
        "Event": "SparkListenerJobStart",
        "Job ID": job_id,
        "Stage IDs": stage_ids,
        "Properties": {"spark.jobGroup.id": group},
    }


def _write_log(tmp_path, events, name="app-1"):
    p = tmp_path / name
    p.write_text("\n".join(json.dumps(e) for e in events) + "\n")
    return str(tmp_path)


def test_parse_event_log_groups_stages_by_job_group(tmp_path):
    events = [
        _job_start(0, [0, 1], "qa"),
        _job_start(1, [2], "qb"),
        _task_end(0, input_bytes=100),
        _task_end(0, input_bytes=50, sw=10),
        _task_end(1, sr_local=7, sr_remote=3),
        _task_end(2, input_bytes=5, sw=1, spill_disk=2),
        _task_end(99, input_bytes=10**9),  # unattributed stage: dropped
    ]
    totals = sa.parse_event_log(_write_log(tmp_path, events))
    assert totals["qa"]["input_bytes"] == 150
    assert totals["qa"]["shuffle_write_bytes"] == 10
    assert totals["qa"]["shuffle_read_bytes"] == 10
    assert totals["qa"]["tasks"] == 3
    assert totals["qb"] == {
        "tasks": 1,
        "input_bytes": 5,
        "input_records": 0,
        "shuffle_write_bytes": 1,
        "shuffle_read_bytes": 0,
        "spill_memory_bytes": 0,
        "spill_disk_bytes": 2,
    }
    assert set(totals) == {"qa", "qb"}


def test_parse_event_log_descends_v2_directory(tmp_path):
    # Spark 4 event-log v2: eventlog_v2_<app>/events_1_<app> + appstatus marker
    d = tmp_path / "eventlog_v2_local-123"
    d.mkdir()
    (d / "appstatus_local-123").write_text("")
    (d / "events_1_local-123").write_text(
        json.dumps(_job_start(0, [0], "q")) + "\n" + json.dumps(_task_end(0, sw=42)) + "\n"
    )
    totals = sa.parse_event_log(str(tmp_path))
    assert totals["q"]["shuffle_write_bytes"] == 42


def test_parse_event_log_tolerates_garbage_and_missing_metrics(tmp_path):
    p = tmp_path / "app-2"
    p.write_text(
        "not json\n"
        + json.dumps(_job_start(0, [0], "q"))
        + "\n"
        + json.dumps({"Event": "SparkListenerTaskEnd", "Stage ID": 0})  # no metrics
        + "\n"
    )
    totals = sa.parse_event_log(str(tmp_path))
    assert totals["q"]["tasks"] == 1
    assert totals["q"]["shuffle_write_bytes"] == 0


def test_driving_table_prefix_map():
    assert sa.driving_table("pipeline_enrich_agg") == "events"
    assert sa.driving_table("dedup_groups") == "documents"
    assert sa.driving_table("ann_pq_topk") == "embeddings"
    assert sa.driving_table("text_stats") == "documents"


def test_extrapolation_is_linear_in_target_rows():
    # 5 B/row over 10^12 rows = 5 TB
    sw, nrows = 5_000, 1_000
    assert round(sw / nrows * sa.TARGET_ROWS / 1e12, 3) == 5.0


def test_rewrite_scale_md_replaces_marker_block(tmp_path):
    md = tmp_path / "SCALE.md"
    md.write_text(
        "# head\n\n%s\nold table\n%s\n\ntail\n" % (sa.BEGIN_MARK, sa.END_MARK)
    )
    result = {
        "sf_dir": "/x",
        "cpus": 4,
        "target_rows": sa.TARGET_ROWS,
        "queries": {
            "q1": {
                "driving_table": "events",
                "driving_rows": 1000,
                "input_bytes": 1_000_000,
                "shuffle_write_bytes": 5_000,
                "shuffle_read_bytes": 5_000,
                "spill_disk_bytes": 0,
                "spill_memory_bytes": 0,
                "shuffle_bytes_per_row": 5.0,
                "shuffle_tb_at_target": 5.0,
            }
        },
    }
    sa._rewrite_scale_md(result, path=str(md))
    text = md.read_text()
    assert "old table" not in text
    assert "| q1 | events (1,000) |" in text
    assert text.startswith("# head")  # content outside markers untouched
    assert text.rstrip().endswith("tail")
