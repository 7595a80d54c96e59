"""Shared test Kafka broker: a spec-following single-node broker core
(per-(topic, partition) RecordBatch logs with broker-assigned base
offsets) plus a loopback ThreadingTCPServer front — used by the wire
conversation fixtures (test_kafka_wire) and the live-source e2e lane
(test_kafka_live). Loopback TCP is a REAL reachable broker as far as
the client stack is concerned; only DNS/egress is blocked in this
container."""

from __future__ import annotations

import socketserver
import struct
import threading

from ramen_spark.sources import kafka_wire as kw
from ramen_spark.sources.binary import decode_kafka_segment


class FakeBroker:
    """Spec-following single-node broker core: per-(topic, partition)
    logs of RecordBatches with broker-assigned base offsets (the first
    8 bytes of each appended batch are rewritten to the log-end
    offset, exactly what a real broker's offset assignment does).
    Thread-safe: the TCP front serves one handler thread per client
    connection."""

    def __init__(self):
        self.logs: dict[tuple[str, int], list[bytes]] = {}
        self.ends: dict[tuple[str, int], int] = {}
        self._lock = threading.Lock()

    def handle(self, frame: bytes) -> bytes:
        api, ver, corr, _cid, r = kw.decode_request(frame)
        if api == kw.API_PRODUCE:
            assert ver == kw.PRODUCE_VERSION
            _tid, _acks, _timeout, topic_data = kw.decode_produce_request_body(r)
            results = []
            with self._lock:
                for (t, p), rs in topic_data.items():
                    base = self.ends.get((t, p), 0)
                    n = len(decode_kafka_segment(rs))
                    patched = struct.pack(">q", base) + rs[8:]
                    self.logs.setdefault((t, p), []).append(patched)
                    self.ends[(t, p)] = base + n
                    results.append(kw.ProducePartitionResult(t, p, 0, base))
            body = kw.encode_produce_response_body(results)
        elif api == kw.API_FETCH:
            assert ver == kw.FETCH_VERSION
            offsets = kw.decode_fetch_request_body(r)
            results = []
            with self._lock:
                for (t, p), off in offsets.items():
                    batches = [
                        b
                        for b in self.logs.get((t, p), [])
                        if any(rec[1] >= off for rec in decode_kafka_segment(b))
                    ]
                    results.append(
                        kw.FetchPartitionResult(
                            t, p, 0, self.ends.get((t, p), 0),
                            b"".join(batches) or None,
                        )
                    )
            body = kw.encode_fetch_response_body(results)
        else:  # pragma: no cover
            raise AssertionError(f"unexpected api {api}")
        assert r.done(), "request body not fully consumed"
        return kw.encode_response(corr, body)


class BrokerServer:
    """Loopback TCP front for a FakeBroker — context manager yielding
    (host, port). Handles many concurrent client connections (the
    live source dials once PER EXECUTOR TASK)."""

    def __init__(self, broker: FakeBroker | None = None):
        self.broker = broker or FakeBroker()

        broker_ref = self.broker

        class _Handler(socketserver.BaseRequestHandler):
            def handle(self):
                buf = bytearray()
                while True:
                    try:
                        got = self.request.recv(65536)
                    except OSError:  # client closed
                        return
                    if not got:
                        return
                    buf += got
                    while len(buf) >= 4:
                        (size,) = struct.unpack(">i", buf[:4])
                        if len(buf) < 4 + size:
                            break
                        frame = bytes(buf[4 : 4 + size])
                        del buf[: 4 + size]
                        self.request.sendall(broker_ref.handle(frame))

        self._srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), _Handler)
        self._srv.daemon_threads = True

    def __enter__(self) -> tuple[str, int]:
        threading.Thread(target=self._srv.serve_forever, daemon=True).start()
        return self._srv.server_address

    def __exit__(self, *exc) -> None:
        self._srv.shutdown()
        self._srv.server_close()
