"""S3: OTLP/gRPC adapter — the transport framing the reference's tonic
server handles in `otel-worker-cli/src/grpc.rs:20-36`.

The reference's gRPC surface is one unary method,
``opentelemetry.proto.collector.trace.v1.TraceService/Export``: tonic
strips the gRPC wire framing, decodes the SAME
``ExportTraceServiceRequest`` protobuf that the HTTP path posts, and
calls the one shared ``Service::ingest_export``. Everything
engine-side is already implemented here (``proto.decode_export_request``
+ the ingest pipeline); this module adds the remaining
transport-independent layer, from-scratch per the public gRPC spec
(PROTOCOL-HTTP2.md):

- **Length-Prefixed-Message framing**: 1-byte compressed flag +
  4-byte big-endian length + message bytes, possibly several per
  stream (``encode_frame`` / ``decode_frames``).
- **Message compression**: ``grpc-encoding: gzip`` (flag byte = 1)
  via stdlib gzip; ``identity`` otherwise. An unknown encoding or a
  compressed frame without a declared encoding is UNIMPLEMENTED(12) /
  INTERNAL(13) per spec.
- **Unary Export call**: exactly one request frame → decode → ingest
  (idempotent batch id from the payload digest, same exactly-once
  contract as the HTTP path) → one framed
  ``ExportTraceServiceResponse`` (no partial_success → zero bytes,
  mirroring ``partial_success: None`` in service.rs:32-54) + a
  grpc-status trailer.

What is NOT here: the HTTP/2 transport itself. No gRPC/h2 runtime
ships in this image, so ``api.serve`` carries the call over HTTP/1.1
(POST to the real method path, ``application/grpc`` content type,
trailers as headers) — the framing, status mapping, and message bytes
are exactly what an HTTP/2 front would relay.
"""

from __future__ import annotations

import gzip
import hashlib
import json
import struct

# google.rpc.Code values used by the adapter
GRPC_OK = 0
GRPC_INVALID_ARGUMENT = 3
GRPC_RESOURCE_EXHAUSTED = 8
GRPC_UNIMPLEMENTED = 12
GRPC_INTERNAL = 13
GRPC_UNAUTHENTICATED = 16

#: the one rpc the reference serves (grpc.rs:20-36)
EXPORT_PATH = "/opentelemetry.proto.collector.trace.v1.TraceService/Export"

#: request cap — parity with the HTTP route's DefaultBodyLimit
MAX_MESSAGE = 10 * 1024 * 1024


class GrpcError(Exception):
    def __init__(self, code: int, message: str):
        super().__init__(message)
        self.code = code
        self.grpc_message = message


class InflateTooLarge(Exception):
    """Decompressed size exceeded the caller's limit (gzip bomb)."""


def gunzip_bounded(data: bytes, limit: int) -> bytes:
    """Incrementally inflate a gzip stream, aborting as soon as the
    decompressed size exceeds ``limit`` — a ~10 MiB gzip bomb must
    cost at most ``limit`` bytes of memory, not its ~10 GiB expansion.
    Mirrors the reference's layering, where the body limit applies to
    the DECOMPRESSED stream (DefaultBodyLimit inside
    RequestDecompressionLayer, api.rs:66,85).

    Multi-member streams (valid per RFC 1952 §2.2, and what
    ``gzip.decompress`` accepts) keep inflating member by member under
    the same cumulative limit; trailing NUL padding is ignored (RFC
    1952 §2.3.1.2), any other trailing garbage is a ValueError.

    Raises InflateTooLarge over limit; ValueError on a corrupt or
    truncated stream."""
    import zlib

    out = bytearray()
    try:
        while True:
            d = zlib.decompressobj(wbits=31)  # gzip container only
            while data:
                out.extend(d.decompress(data, limit + 1 - len(out)))
                if len(out) > limit:
                    raise InflateTooLarge(f"decompressed body exceeds {limit} bytes")
                data = d.unconsumed_tail
                if d.eof:
                    break
            out.extend(d.flush())
            if not d.eof:
                raise ValueError("truncated gzip stream")
            # next member, zero padding, or garbage
            data = d.unused_data.lstrip(b"\x00")
            if not data:
                break
    except zlib.error as e:
        raise ValueError(f"bad gzip stream: {e}") from e
    if len(out) > limit:
        raise InflateTooLarge(f"decompressed body exceeds {limit} bytes")
    return bytes(out)


def percent_encode_message(msg: str) -> str:
    """gRPC ``grpc-message`` percent-encoding (gRPC HTTP/2 spec,
    "Status-Message"): UTF-8 bytes outside 0x20-0x7E — and ``%``
    itself — become %XX, leaving the value pure ASCII, so it is always
    HPACK/latin-1 encodable regardless of the error text."""
    out = []
    for b in msg.encode("utf-8"):
        if 0x20 <= b <= 0x7E and b != 0x25:
            out.append(chr(b))
        else:
            out.append(f"%{b:02X}")
    return "".join(out)


def encode_frame(message: bytes, compress: bool = False) -> bytes:
    """One Length-Prefixed-Message: flag + u32 BE length + bytes."""
    if compress:
        message = gzip.compress(message, mtime=0)
    return struct.pack(">BI", 1 if compress else 0, len(message)) + message


def decode_frames(stream: bytes, encoding: str = "identity") -> list[bytes]:
    """Split a gRPC message stream into messages, inflating
    compressed frames per ``encoding``. Raises GrpcError on a
    truncated frame, an undeclared/unsupported compression, or an
    oversized message."""
    out: list[bytes] = []
    i, n = 0, len(stream)
    while i < n:
        if n - i < 5:
            raise GrpcError(GRPC_INTERNAL, "truncated frame header")
        flag, length = struct.unpack_from(">BI", stream, i)
        i += 5
        if length > MAX_MESSAGE:
            raise GrpcError(GRPC_RESOURCE_EXHAUSTED, "message exceeds 10MiB")
        if n - i < length:
            raise GrpcError(GRPC_INTERNAL, "truncated message body")
        msg = bytes(stream[i : i + length])
        i += length
        if flag == 0:
            out.append(msg)
        elif flag == 1:
            if encoding == "identity":
                raise GrpcError(
                    GRPC_INTERNAL, "compressed frame without grpc-encoding"
                )
            if encoding != "gzip":
                raise GrpcError(
                    GRPC_UNIMPLEMENTED, f"unsupported grpc-encoding {encoding!r}"
                )
            try:
                # cap applies to the INFLATED message too (a compressed
                # frame under 10MiB on the wire must not balloon past it)
                out.append(gunzip_bounded(msg, MAX_MESSAGE))
            except InflateTooLarge as e:
                raise GrpcError(GRPC_RESOURCE_EXHAUSTED, "message exceeds 10MiB") from e
            except ValueError as e:
                raise GrpcError(GRPC_INTERNAL, f"bad gzip payload: {e}") from e
        else:
            raise GrpcError(GRPC_INTERNAL, f"bad frame flag {flag}")
    return out


def unary_export(
    spark,
    stores,
    service_lookup,
    body: bytes,
    encoding: str = "identity",
    on_ingested=None,
) -> tuple[int, str, bytes]:
    """The TraceService/Export unary handler: framed request bytes in,
    ``(grpc_status, grpc_message, framed_response_bytes)`` out.

    Decodes the frame(s), parses the protobuf export request with the
    in-repo wire codec, ingests through the same idempotent batch path
    as HTTP (batch id = sha256 of the raw message, so a retried RPC is
    a no-op returning the original receipt), and frames the empty
    ``ExportTraceServiceResponse``."""
    from .fixtures import token_df_from_payloads
    from .pipeline import ingest_batch
    from .proto import decode_export_request

    try:
        frames = decode_frames(body, encoding)
    except GrpcError as e:
        return e.code, e.grpc_message, b""
    if len(frames) != 1:
        return GRPC_INTERNAL, "Export is unary: expected exactly one message", b""
    try:
        env = decode_export_request(frames[0])
    except ValueError as e:
        return GRPC_INVALID_ARGUMENT, f"bad ExportTraceServiceRequest: {e}", b""
    payloads = [json.dumps(env, separators=(",", ":"))]
    bid = "grpc-" + hashlib.sha256(frames[0]).hexdigest()[:16]
    tok = token_df_from_payloads(spark, payloads)
    ingest_batch(spark, tok, service_lookup, stores, bid)
    if on_ingested is not None:
        # post-commit hook (the SpanAdded broadcast, service.rs:47-49)
        on_ingested(bid)
    # ExportTraceServiceResponse{partial_success: None} = empty message
    return GRPC_OK, "", encode_frame(b"")
