"""Kafka wire protocol (Produce/Fetch) — the client layer between the
offline segment decoder and a live socket.

The live connector story (reference: Kafka consumer wired in
/root/reference/src/CodeGenLib_IO.ml:176-210) is still jar- and
network-blocked in this container (the round-8 and round-10 vendoring
attempts both fail at DNS). What CAN be real without a broker is the
protocol itself: this module speaks the public Kafka wire format
(kafka.apache.org/protocol) for Produce v8 and Fetch v11 — the newest
versions BEFORE KIP-482's flexible/compact encodings, so every field
is a fixed-width big-endian int or a length-prefixed blob, exactly
representable with struct packs and byte-replayable as fixtures.

Both directions are implemented (request encode/decode, response
encode/decode) so a spec-following in-memory broker can answer a real
conversation in tests: produce RecordBatches → fetch them back →
records flow into the SAME ``decode_kafka_segment`` path the offline
lane uses. ``KafkaWireClient`` takes any duplex transport exposing
``sendall(bytes)`` / ``recv(n)`` — a ``socket.socket`` when the
network exists, an in-memory loopback in tests — so the only
untested piece left is the TCP dial itself.

Out of scope (documented, not hidden): ApiVersions/Metadata
negotiation, consumer groups, SASL/TLS. A consumer here is
"fetch from (topic, partition, offset)" — the shape the reference's
kafka reader uses (explicit partition list, no group membership).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

API_PRODUCE = 0
API_FETCH = 1
PRODUCE_VERSION = 8
FETCH_VERSION = 11


# ---------------------------------------------------------------------------
# primitives (non-flexible encodings: fixed ints, INT16/INT32-length blobs)
# ---------------------------------------------------------------------------


def _string(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack(">h", len(b)) + b


def _nullable_string(s: str | None) -> bytes:
    return struct.pack(">h", -1) if s is None else _string(s)


def _nullable_bytes(b: bytes | None) -> bytes:
    return struct.pack(">i", -1) if b is None else struct.pack(">i", len(b)) + b


class _Reader:
    """Bounds-checked cursor over one frame; every overrun raises
    ValueError so a corrupt capture fails loudly, never silently."""

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def _take(self, n: int) -> bytes:
        if n < 0 or self.pos + n > len(self.buf):
            raise ValueError(
                f"kafka frame overrun at {self.pos} (+{n} of {len(self.buf)})"
            )
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def i8(self) -> int:
        return struct.unpack(">b", self._take(1))[0]

    def i16(self) -> int:
        return struct.unpack(">h", self._take(2))[0]

    def i32(self) -> int:
        return struct.unpack(">i", self._take(4))[0]

    def i64(self) -> int:
        return struct.unpack(">q", self._take(8))[0]

    def string(self) -> str:
        return self._take(self.i16()).decode("utf-8")

    def nullable_string(self) -> str | None:
        n = self.i16()
        return None if n < 0 else self._take(n).decode("utf-8")

    def nullable_bytes(self) -> bytes | None:
        n = self.i32()
        return None if n < 0 else bytes(self._take(n))

    def done(self) -> bool:
        return self.pos == len(self.buf)


# ---------------------------------------------------------------------------
# envelopes: INT32 size framing; request header v1 / response header v0
# ---------------------------------------------------------------------------


def encode_request(
    api_key: int,
    api_version: int,
    correlation_id: int,
    client_id: str | None,
    body: bytes,
) -> bytes:
    payload = (
        struct.pack(">hhi", api_key, api_version, correlation_id)
        + _nullable_string(client_id)
        + body
    )
    return struct.pack(">i", len(payload)) + payload


def decode_request(frame: bytes) -> tuple[int, int, int, str | None, _Reader]:
    """size-stripped request frame → (api_key, api_version,
    correlation_id, client_id, body reader)."""
    r = _Reader(frame)
    api_key, api_version, corr = r.i16(), r.i16(), r.i32()
    client_id = r.nullable_string()
    return api_key, api_version, corr, client_id, r


def encode_response(correlation_id: int, body: bytes) -> bytes:
    payload = struct.pack(">i", correlation_id) + body
    return struct.pack(">i", len(payload)) + payload


def decode_response(frame: bytes) -> tuple[int, _Reader]:
    r = _Reader(frame)
    return r.i32(), r


# ---------------------------------------------------------------------------
# Produce v8
# ---------------------------------------------------------------------------


def encode_produce_request_body(
    topic_data: dict[tuple[str, int], bytes],
    acks: int = -1,
    timeout_ms: int = 30_000,
    transactional_id: str | None = None,
) -> bytes:
    """{(topic, partition): record_set_bytes} → Produce v8 body.
    record_set is one-or-more concatenated RecordBatches
    (``encode_kafka_record_batch``)."""
    by_topic: dict[str, list[tuple[int, bytes]]] = {}
    for (t, p), rs in sorted(topic_data.items()):
        by_topic.setdefault(t, []).append((p, rs))
    out = bytearray()
    out += _nullable_string(transactional_id)
    out += struct.pack(">hi", acks, timeout_ms)
    out += struct.pack(">i", len(by_topic))
    for t, parts in by_topic.items():
        out += _string(t)
        out += struct.pack(">i", len(parts))
        for p, rs in parts:
            out += struct.pack(">i", p)
            out += _nullable_bytes(rs)
    return bytes(out)


def decode_produce_request_body(r: _Reader) -> tuple[
    str | None, int, int, dict[tuple[str, int], bytes | None]
]:
    transactional_id = r.nullable_string()
    acks, timeout_ms = r.i16(), r.i32()
    topic_data: dict[tuple[str, int], bytes | None] = {}
    for _ in range(r.i32()):
        t = r.string()
        for _ in range(r.i32()):
            p = r.i32()
            topic_data[(t, p)] = r.nullable_bytes()
    return transactional_id, acks, timeout_ms, topic_data


@dataclass
class ProducePartitionResult:
    topic: str
    partition: int
    error_code: int
    base_offset: int
    log_append_time_ms: int = -1
    log_start_offset: int = 0
    error_message: str | None = None


def encode_produce_response_body(
    results: list[ProducePartitionResult], throttle_time_ms: int = 0
) -> bytes:
    by_topic: dict[str, list[ProducePartitionResult]] = {}
    for pr in results:
        by_topic.setdefault(pr.topic, []).append(pr)
    out = bytearray()
    out += struct.pack(">i", len(by_topic))
    for t, parts in sorted(by_topic.items()):
        out += _string(t)
        out += struct.pack(">i", len(parts))
        for pr in parts:
            out += struct.pack(
                ">ihqqq",
                pr.partition,
                pr.error_code,
                pr.base_offset,
                pr.log_append_time_ms,
                pr.log_start_offset,
            )
            out += struct.pack(">i", 0)  # record_errors (v8): empty
            out += _nullable_string(pr.error_message)
    out += struct.pack(">i", throttle_time_ms)
    return bytes(out)


def decode_produce_response_body(r: _Reader) -> list[ProducePartitionResult]:
    out: list[ProducePartitionResult] = []
    for _ in range(r.i32()):
        t = r.string()
        for _ in range(r.i32()):
            p, err, base_off, append_ms, log_start = (
                r.i32(), r.i16(), r.i64(), r.i64(), r.i64(),
            )
            for _ in range(r.i32()):  # record_errors
                r.i32()
                r.nullable_string()
            msg = r.nullable_string()
            out.append(
                ProducePartitionResult(t, p, err, base_off, append_ms, log_start, msg)
            )
    r.i32()  # throttle_time_ms
    return out


# ---------------------------------------------------------------------------
# Fetch v11
# ---------------------------------------------------------------------------


def encode_fetch_request_body(
    offsets: dict[tuple[str, int], int],
    max_wait_ms: int = 500,
    min_bytes: int = 1,
    max_bytes: int = 50 * 1024 * 1024,
    partition_max_bytes: int = 1024 * 1024,
    isolation_level: int = 0,
) -> bytes:
    """{(topic, partition): fetch_offset} → Fetch v11 body (replica_id
    -1 = ordinary consumer; sessions unused: session_id 0 / epoch -1,
    the stateless one-shot form brokers always accept)."""
    by_topic: dict[str, list[tuple[int, int]]] = {}
    for (t, p), off in sorted(offsets.items()):
        by_topic.setdefault(t, []).append((p, off))
    out = bytearray()
    out += struct.pack(
        ">iiiibii", -1, max_wait_ms, min_bytes, max_bytes, isolation_level, 0, -1
    )
    out += struct.pack(">i", len(by_topic))
    for t, parts in by_topic.items():
        out += _string(t)
        out += struct.pack(">i", len(parts))
        for p, off in parts:
            out += struct.pack(">iiqqi", p, -1, off, -1, partition_max_bytes)
    out += struct.pack(">i", 0)  # forgotten_topics_data
    out += _string("")  # rack_id
    return bytes(out)


def decode_fetch_request_body(r: _Reader) -> dict[tuple[str, int], int]:
    r.i32(); r.i32(); r.i32(); r.i32()  # replica, max_wait, min/max bytes
    r.i8()  # isolation
    r.i32(); r.i32()  # session id/epoch
    offsets: dict[tuple[str, int], int] = {}
    for _ in range(r.i32()):
        t = r.string()
        for _ in range(r.i32()):
            p = r.i32()
            r.i32()  # current_leader_epoch
            off = r.i64()
            r.i64()  # log_start_offset
            r.i32()  # partition_max_bytes
            offsets[(t, p)] = off
    for _ in range(r.i32()):  # forgotten_topics_data
        r.string()
        for _ in range(r.i32()):
            r.i32()
    r.string()  # rack_id
    return offsets


@dataclass
class FetchPartitionResult:
    topic: str
    partition: int
    error_code: int
    high_watermark: int
    record_set: bytes | None
    last_stable_offset: int = -1
    log_start_offset: int = 0
    preferred_read_replica: int = -1
    aborted_transactions: list[tuple[int, int]] = field(default_factory=list)


def encode_fetch_response_body(
    results: list[FetchPartitionResult],
    throttle_time_ms: int = 0,
    error_code: int = 0,
    session_id: int = 0,
) -> bytes:
    by_topic: dict[str, list[FetchPartitionResult]] = {}
    for fr in results:
        by_topic.setdefault(fr.topic, []).append(fr)
    out = bytearray()
    out += struct.pack(">ihi", throttle_time_ms, error_code, session_id)
    out += struct.pack(">i", len(by_topic))
    for t, parts in sorted(by_topic.items()):
        out += _string(t)
        out += struct.pack(">i", len(parts))
        for fr in parts:
            out += struct.pack(
                ">ihqqq",
                fr.partition,
                fr.error_code,
                fr.high_watermark,
                fr.last_stable_offset,
                fr.log_start_offset,
            )
            out += struct.pack(">i", len(fr.aborted_transactions))
            for pid, first_off in fr.aborted_transactions:
                out += struct.pack(">qq", pid, first_off)
            out += struct.pack(">i", fr.preferred_read_replica)
            out += _nullable_bytes(fr.record_set)
    return bytes(out)


def decode_fetch_response_body(r: _Reader) -> list[FetchPartitionResult]:
    r.i32()  # throttle_time_ms
    err, _session = r.i16(), r.i32()
    if err:
        raise ValueError(f"fetch session error_code={err}")
    out: list[FetchPartitionResult] = []
    for _ in range(r.i32()):
        t = r.string()
        for _ in range(r.i32()):
            p, perr, hwm, lso, log_start = (
                r.i32(), r.i16(), r.i64(), r.i64(), r.i64(),
            )
            n_aborted = r.i32()
            aborted = [(r.i64(), r.i64()) for _ in range(max(n_aborted, 0))]
            preferred = r.i32()
            rs = r.nullable_bytes()
            out.append(
                FetchPartitionResult(
                    t, p, perr, hwm, rs, lso, log_start, preferred, aborted
                )
            )
    return out


# ---------------------------------------------------------------------------
# transport-agnostic client
# ---------------------------------------------------------------------------


def connect_kafka(
    host: str,
    port: int,
    client_id: str = "ramen-spark",
    timeout_s: float = 10.0,
) -> "KafkaWireClient":
    """THE TCP DIAL: open a real socket to ``host:port`` and wrap it
    in a :class:`KafkaWireClient`. ``socket.socket`` natively exposes
    the ``sendall``/``recv`` duplex contract the client speaks, so
    this is the entire live-broker integration surface — exercised in
    tests against a loopback server fronting the same spec-following
    broker core the conversation fixtures use (DNS is blocked in this
    container, loopback is not). TCP_NODELAY because the protocol is
    strict request/response — Nagle would add 40 ms per roundtrip."""
    import socket

    s = socket.create_connection((host, port), timeout=timeout_s)
    s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
    return KafkaWireClient(s, client_id=client_id)


class KafkaWireClient:
    """Produce/Fetch over any duplex byte transport (``sendall`` /
    ``recv``): a plain TCP socket where the network exists
    (:func:`connect_kafka` is the dial), an in-memory loopback in the
    fixture tests. Correlation ids are checked on every response — a
    desynced stream fails loudly."""

    def __init__(self, transport, client_id: str = "ramen-spark"):
        self._t = transport
        self._client_id = client_id
        self._corr = 0

    def close(self) -> None:
        """Close the underlying transport if it can be closed (a TCP
        socket from :func:`connect_kafka`); in-memory loopbacks without
        a close are fine to leave."""
        close = getattr(self._t, "close", None)
        if close is not None:
            close()

    def _recv_exact(self, n: int) -> bytes:
        chunks = bytearray()
        while len(chunks) < n:
            got = self._t.recv(n - len(chunks))
            if not got:
                raise ConnectionError("kafka transport closed mid-frame")
            chunks += got
        return bytes(chunks)

    def _roundtrip(self, api_key: int, api_version: int, body: bytes) -> _Reader:
        self._corr += 1
        self._t.sendall(
            encode_request(api_key, api_version, self._corr, self._client_id, body)
        )
        (size,) = struct.unpack(">i", self._recv_exact(4))
        corr, r = decode_response(self._recv_exact(size))
        if corr != self._corr:
            raise ValueError(
                f"correlation id mismatch: sent {self._corr}, got {corr}"
            )
        return r

    def produce(
        self,
        topic: str,
        partition: int,
        record_set: bytes,
        acks: int = -1,
        timeout_ms: int = 30_000,
    ) -> ProducePartitionResult:
        body = encode_produce_request_body(
            {(topic, partition): record_set}, acks=acks, timeout_ms=timeout_ms
        )
        results = decode_produce_response_body(
            self._roundtrip(API_PRODUCE, PRODUCE_VERSION, body)
        )
        (res,) = [
            x for x in results if (x.topic, x.partition) == (topic, partition)
        ]
        if res.error_code:
            raise ValueError(
                f"produce error_code={res.error_code} ({res.error_message})"
            )
        return res

    def fetch_records(
        self,
        topic: str,
        partition: int,
        offset: int,
        max_wait_ms: int = 500,
    ) -> tuple[list[tuple[int, int, int, bytes | None, bytes | None]], int]:
        """Fetch from (topic, partition, offset) → (records decoded by
        the offline lane's ``decode_kafka_segment`` — (base_offset,
        offset, timestamp_ms, key, value) —, high_watermark). The
        record_set IS segment bytes: the live path and the offline
        path share one decoder by construction."""
        from ramen_spark.sources.binary import decode_kafka_segment

        body = encode_fetch_request_body(
            {(topic, partition): offset}, max_wait_ms=max_wait_ms
        )
        results = decode_fetch_response_body(
            self._roundtrip(API_FETCH, FETCH_VERSION, body)
        )
        (res,) = [
            x for x in results if (x.topic, x.partition) == (topic, partition)
        ]
        if res.error_code:
            raise ValueError(f"fetch error_code={res.error_code}")
        records = (
            decode_kafka_segment(res.record_set) if res.record_set else []
        )
        return [rec for rec in records if rec[1] >= offset], res.high_watermark
