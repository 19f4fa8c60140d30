"""Real HTTP round-trips against the serving shim: reference route
table, status codes (200/204/400/401/404), camelCase wire JSON, and
the OTLP ingest content-type echo (api.rs:62-91, handlers/*.rs,
middleware/auth.rs)."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from otel_worker_spark.api import TraceApi, serve
from otel_worker_spark.fixtures import (
    GOLDEN_CHILD_SPAN_ID,
    GOLDEN_ROOT_SPAN_ID,
    GOLDEN_TRACE_ID,
    golden_trace_envelope,
    service_lookup_df,
)
from otel_worker_spark.pipeline import PipelineStores

TOKEN = "s3cret-token"


def _req(base, path, method="GET", body=None, headers=None):
    req = urllib.request.Request(base + path, data=body, method=method)
    for k, v in (headers or {}).items():
        req.add_header(k, v)
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, resp.read(), dict(resp.headers)
    except urllib.error.HTTPError as e:
        return e.code, e.read(), dict(e.headers)


@pytest.fixture()
def server(spark, tmp_root):
    stores = PipelineStores(spark, tmp_root + "/stores")
    api = TraceApi(spark, stores, service_lookup_df(spark))
    srv = serve(api)
    host, port = srv.server_address
    yield f"http://{host}:{port}", api
    srv.shutdown()


def _ingest_golden(base):
    body = json.dumps(golden_trace_envelope(), separators=(",", ":")).encode()
    return _req(
        base, "/v1/traces", "POST", body, {"Content-Type": "application/json"}
    )


def test_http_round_trip(server):
    base, _api = server
    status, out, _ = _ingest_golden(base)
    assert status == 200 and json.loads(out) == {}

    # list → one TraceSummary, camelCase keys, spans ordered by start
    status, out, _ = _req(base, "/v1/traces?limit=5")
    assert status == 200
    traces = json.loads(out)
    assert [t["traceId"] for t in traces] == [GOLDEN_TRACE_ID]
    spans = traces[0]["spans"]
    assert [s["spanId"] for s in spans] == [GOLDEN_ROOT_SPAN_ID, GOLDEN_CHILD_SPAN_ID]
    # root omits parentSpanId on the wire (serde skips None)
    assert "parentSpanId" not in spans[0]
    assert spans[1]["parentSpanId"] == GOLDEN_ROOT_SPAN_ID

    # point GETs
    status, out, _ = _req(base, f"/v1/traces/{GOLDEN_TRACE_ID}")
    assert status == 200 and json.loads(out)["traceId"] == GOLDEN_TRACE_ID
    status, out, _ = _req(base, f"/v1/traces/{GOLDEN_TRACE_ID}/spans")
    assert status == 200 and len(json.loads(out)) == 2
    status, out, _ = _req(
        base, f"/v1/traces/{GOLDEN_TRACE_ID}/spans/{GOLDEN_CHILD_SPAN_ID}"
    )
    assert status == 200
    got = json.loads(out)
    assert got["name"] == "database.query" and got["kind"] == "Client"

    # 404 mappings (valid hex, absent rows)
    status, out, _ = _req(base, "/v1/traces/" + "ab" * 16)
    assert status == 404 and json.loads(out) == {"error": "notFound"}
    status, out, _ = _req(
        base, f"/v1/traces/{GOLDEN_TRACE_ID}/spans/" + "ab" * 8
    )
    assert status == 404 and json.loads(out) == {"error": "spanNotFound"}

    # HexEncodedId path rejection → 400; router fallback → 404
    assert _req(base, "/v1/traces/not-hex")[0] == 400
    assert _req(base, f"/v1/traces/{GOLDEN_TRACE_ID}/spans/zz")[0] == 400
    assert _req(base, "/v1/other")[0] == 404
    assert _req(base, f"/v1/traces/{GOLDEN_TRACE_ID}/nope")[0] == 404


def test_http_deletes(server):
    base, _api = server
    _ingest_golden(base)
    status, out, _ = _req(
        base,
        f"/v1/traces/{GOLDEN_TRACE_ID}/spans/{GOLDEN_CHILD_SPAN_ID}",
        "DELETE",
    )
    assert status == 204 and out == b""
    assert (
        _req(base, f"/v1/traces/{GOLDEN_TRACE_ID}/spans/{GOLDEN_CHILD_SPAN_ID}")[0]
        == 404
    )
    assert len(json.loads(_req(base, f"/v1/traces/{GOLDEN_TRACE_ID}/spans")[1])) == 1

    status, out, _ = _req(base, f"/v1/traces/{GOLDEN_TRACE_ID}", "DELETE")
    assert status == 204
    assert _req(base, f"/v1/traces/{GOLDEN_TRACE_ID}")[0] == 404
    assert json.loads(_req(base, "/v1/traces")[1]) == []


def test_http_ingest_idempotent_and_protobuf(server, spark):
    base, api = server
    # same export re-delivered → no duplicate spans
    _ingest_golden(base)
    _ingest_golden(base)
    assert len(json.loads(_req(base, f"/v1/traces/{GOLDEN_TRACE_ID}/spans")[1])) == 2

    # protobuf ingest: response echoes the content type with an empty
    # (no partial_success) body; spans land identically
    from otel_worker_spark.proto import encode_export_request

    env = golden_trace_envelope()
    for sp in env["resourceSpans"][0]["scopeSpans"][0]["spans"]:
        sp["traceId"] = "cd" * 16  # a second trace, over the wire path
    wire = encode_export_request(env)
    status, out, headers = _req(
        base, "/v1/traces", "POST", wire, {"Content-Type": "application/x-protobuf"}
    )
    assert status == 200 and out == b""
    assert len(json.loads(_req(base, "/v1/traces/" + "cd" * 16 + "/spans")[1])) == 2


def test_http_auth_gate(spark, tmp_root):
    stores = PipelineStores(spark, tmp_root + "/stores-auth")
    api = TraceApi(spark, stores, service_lookup_df(spark), token=TOKEN)
    srv = serve(api)
    base = "http://%s:%s" % srv.server_address
    try:
        assert _req(base, "/v1/traces")[0] == 401          # missing header
        assert _req(base, "/v1/traces", headers={"Authorization": f"Bearer wrong"})[0] == 401
        assert _req(base, "/v1/traces", headers={"Authorization": f"bearer {TOKEN}"})[0] == 401
        status, out, _ = _req(base, "/v1/traces", headers={"Authorization": f"Bearer {TOKEN}"})
        assert status == 200 and json.loads(out) == []
        # ingest behind the gate too
        body = json.dumps(golden_trace_envelope(), separators=(",", ":")).encode()
        assert _req(base, "/v1/traces", "POST", body, {"Content-Type": "application/json"})[0] == 401
        assert _req(
            base, "/v1/traces", "POST", body,
            {"Content-Type": "application/json", "Authorization": f"Bearer {TOKEN}"},
        )[0] == 200
    finally:
        srv.shutdown()


def test_client_cli_round_trip(server):
    """The jobs.py `client` wrappers (reference: otel-worker-cli
    client traces/spans commands) against a live server: list, get,
    delete, and the 404→exit-1 path. The client process is pure
    urllib — no Spark session."""
    import os
    import subprocess
    import sys

    base, _api = server
    _ingest_golden(base)
    jobs = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs.py")

    def run(*args):
        return subprocess.run(
            [sys.executable, jobs, "client", *args, "--base-url", base],
            capture_output=True,
            text=True,
            timeout=120,
        )

    out = run("traces-list", "--limit", "5")
    assert out.returncode == 0
    traces = json.loads(out.stdout)
    assert [t["traceId"] for t in traces] == [GOLDEN_TRACE_ID]

    out = run("span-get", "--trace-id", GOLDEN_TRACE_ID,
              "--span-id", GOLDEN_CHILD_SPAN_ID)
    assert out.returncode == 0
    assert json.loads(out.stdout)["spanId"] == GOLDEN_CHILD_SPAN_ID

    out = run("trace-get", "--trace-id", "00" * 16)
    assert out.returncode == 1
    assert json.loads(out.stdout) == {"error": "notFound"}

    out = run("trace-delete", "--trace-id", GOLDEN_TRACE_ID)
    assert out.returncode == 0
    out = run("traces-list")
    assert out.returncode == 0 and json.loads(out.stdout) == []


def test_gzip_request_and_response_codings(server):
    """RequestDecompressionLayer parity (api.rs:85): a gzip'd export
    body inflates transparently; CompressionLayer parity (api.rs:
    87-90): responses gzip only when the client advertises it; an
    unknown content coding is refused."""
    import gzip

    base, _api = server
    body = json.dumps(golden_trace_envelope(), separators=(",", ":")).encode()
    status, out, _ = _req(
        base, "/v1/traces", "POST", gzip.compress(body, mtime=0),
        {"Content-Type": "application/json", "Content-Encoding": "gzip"},
    )
    assert status == 200 and json.loads(out) == {}

    # plain client → plain response
    status, out, headers = _req(base, "/v1/traces?limit=5")
    assert status == 200 and "Content-Encoding" not in headers
    plain = json.loads(out)

    # gzip-capable client → gzip'd response, same content
    status, out, headers = _req(
        base, "/v1/traces?limit=5", headers={"Accept-Encoding": "gzip"}
    )
    assert status == 200 and headers.get("Content-Encoding") == "gzip"
    assert json.loads(gzip.decompress(out)) == plain

    # unsupported request coding → 415
    status, _, _ = _req(
        base, "/v1/traces", "POST", b"xx",
        {"Content-Type": "application/json", "Content-Encoding": "br"},
    )
    assert status == 415


def test_gzip_bomb_is_413_not_oom(server):
    """ADVICE r3: the 10 MiB body limit must apply to the DECOMPRESSED
    stream (DefaultBodyLimit inside RequestDecompressionLayer,
    api.rs:66,85). A small gzip bomb that inflates to ~64 MiB must
    bounce with 413 after at most ~10 MiB of inflate work — never
    buffer the expansion."""
    import gzip

    bomb = gzip.compress(b"\x00" * (64 * 1024 * 1024), mtime=0)
    assert len(bomb) < 1024 * 1024  # small on the wire
    status, _, _ = _req(
        base := server[0], "/v1/traces", "POST", bomb,
        {"Content-Type": "application/json", "Content-Encoding": "gzip"},
    )
    assert status == 413

    # corrupt gzip stays a 400, as before
    status, _, _ = _req(
        base, "/v1/traces", "POST", b"\x1f\x8b\x00garbage",
        {"Content-Type": "application/json", "Content-Encoding": "gzip"},
    )
    assert status == 400


def test_unauthed_bad_content_length_gets_401(spark, tmp_root):
    """r5 advice: a non-numeric Content-Length on the UNauthenticated
    path must still produce the 401 (with the connection closed, since
    the body can't be safely drained) — previously the int() parse sat
    outside _route's try and an uncaught ValueError dropped the
    connection with a server-side traceback."""
    import socket as _socket

    stores = PipelineStores(spark, tmp_root + "/stores-badcl")
    api = TraceApi(spark, stores, service_lookup_df(spark), token=TOKEN)
    srv = serve(api)
    host, port = srv.server_address
    try:
        sock = _socket.create_connection((host, port), timeout=10)
        sock.sendall(
            b"POST /v1/traces HTTP/1.1\r\nHost: x\r\n"
            b"Content-Type: application/json\r\n"
            b"Content-Length: banana\r\n\r\n"
        )
        sock.settimeout(10)
        data = b""
        while True:
            got = sock.recv(65536)
            if not got:
                break
            data += got
        sock.close()
        assert b" 401" in data.split(b"\r\n", 1)[0]
        assert data.count(b"HTTP/1.") == 1  # closed, no desynced follow-up
    finally:
        srv.shutdown()


def test_oversized_post_bounce_closes_connection(server):
    """r4 advice: a 413 sent without draining the body must close the
    connection — otherwise a keep-alive client's unread body bytes get
    parsed as the next request line (garbage 400s)."""
    import socket as _socket

    base, _api = server
    host, port = base.replace("http://", "").split(":")
    sock = _socket.create_connection((host, int(port)), timeout=10)
    body_decl = 20 * 1024 * 1024
    req = (
        f"POST /v1/traces HTTP/1.1\r\nHost: x\r\n"
        f"Connection: keep-alive\r\nContent-Type: application/json\r\n"
        f"Content-Length: {body_decl}\r\n\r\n"
    ).encode() + b"GET /not-a-request HTTP/1.1\r\n\r\n"
    sock.sendall(req)
    sock.settimeout(10)
    data = b""
    while True:
        try:
            got = sock.recv(65536)
        except TimeoutError:
            raise AssertionError("server kept the desynced connection open")
        if not got:
            break
        data += got
    sock.close()
    # exactly ONE response — the 413 — and no second (garbage) response
    assert data.split(b"\r\n", 1)[0].endswith(b"413 Request Entity Too Large") or b" 413 " in data.split(b"\r\n", 1)[0] + b" "
    assert data.count(b"HTTP/1.") == 1
