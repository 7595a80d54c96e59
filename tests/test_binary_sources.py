"""NetFlow v5 and ClickHouse RowBinary wire-format kernels
(sources/binary.py ↔ reference src/RamenNetflow.ml:14-142 and
READ ... AS ROWBINARY, src/raql_operation.type:54-138)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ramen_spark.sources.binary import (
    NETFLOW_V5_DECODED_SCHEMA,
    decode_netflow_v5,
    decode_netflow_v5_packet,
    decode_rowbinary,
    decode_rowbinary_blob,
    encode_netflow_v5,
    encode_rowbinary,
    encode_rowbinary_df,
    rowbinary_spark_schema,
)

FLOW_A = {
    "src": 0x0A000001,  # 10.0.0.1
    "dst": 0xC0A80002,  # 192.168.0.2
    "next_hop": 0,
    "in_iface": 3,
    "out_iface": 7,
    "packets": 100,
    "bytes": 123456,
    "first": 1_000,  # uptime ms
    "last": 2_500,
    "src_port": 443,
    "dst_port": 51514,
    "tcp_flags": 0x18,
    "ip_proto": 6,
    "ip_tos": 0,
    "src_as": 64512,
    "dst_as": 65000,
    "src_mask": 24,
    "dst_mask": 16,
}
FLOW_B = {"src": 0xFFFFFFFF, "dst": 1, "packets": 1, "bytes": 40, "first": 0, "last": 0}


def test_netflow_roundtrip_values():
    pkt = encode_netflow_v5(
        [FLOW_A, FLOW_B],
        sys_uptime_ms=10_000,
        unix_secs=1_700_000_100,
        unix_nsecs=500_000_000,
        flow_sequence=42,
        engine_type=1,
        engine_id=2,
        sampling=(0x1 << 14) | 100,  # mode 1, rate 100
    )
    rows = decode_netflow_v5_packet(pkt)
    assert len(rows) == 2
    a = dict(zip(NETFLOW_V5_DECODED_SCHEMA.names, rows[0]))
    assert a["src"] == 0x0A000001 and a["dst"] == 0xC0A80002
    assert a["src_port"] == 443 and a["dst_port"] == 51514
    assert a["packets"] == 100 and a["bytes"] == 123456
    assert a["seqnum"] == 42 and a["engine_type"] == 1 and a["engine_id"] == 2
    assert a["sampling_type"] == 1 and a["sampling_rate"] == 100
    assert a["src_as"] == 64512 and a["src_mask"] == 24
    # boot = secs + nsecs/1e9 − uptime/1e3; start = boot + first/1e3
    boot = 1_700_000_100 + 0.5 - 10.0
    assert rows[0][0] == pytest.approx(boot + 1.0, abs=1e-6)
    assert rows[0][1] == pytest.approx(boot + 2.5, abs=1e-6)
    # u32 max survives (no sign wrap)
    b = dict(zip(NETFLOW_V5_DECODED_SCHEMA.names, rows[1]))
    assert b["src"] == 0xFFFFFFFF


def test_netflow_rejects_wrong_version():
    pkt = bytearray(encode_netflow_v5([FLOW_B]))
    pkt[0:2] = (9).to_bytes(2, "big")
    with pytest.raises(ValueError, match="version=9"):
        decode_netflow_v5_packet(bytes(pkt))


def test_netflow_mapinpandas(spark):
    pkts = [
        encode_netflow_v5([FLOW_A] * 30, flow_sequence=i) for i in range(4)
    ] + [encode_netflow_v5([FLOW_B], flow_sequence=99)]
    df = spark.createDataFrame(
        [(p,) for p in pkts], T.StructType([T.StructField("packet", T.BinaryType())])
    )
    out = decode_netflow_v5(df)
    assert out.count() == 4 * 30 + 1
    agg = out.agg(
        F.sum("bytes").alias("b"), F.countDistinct("seqnum").alias("s")
    ).first()
    assert agg["b"] == 120 * 123456 + 40 and agg["s"] == 5


RB_SPEC = [
    ("id", "uint32"),
    ("flag", "int8"),
    ("qty", "float64"),
    ("name", "Nullable(String)"),
    ("tag", "string"),
]


def test_rowbinary_roundtrip_blob():
    rows = [
        (1, -5, 3.25, "alice", "x"),
        (4_000_000_000, 127, -0.0, None, ""),  # u32 > i32 range, NULL, empty str
        (7, 0, 1e300, "émoji ✓", "y" * 200),  # utf-8 multibyte, len > 127 (LEB128 2 bytes)
    ]
    blob = encode_rowbinary(rows, RB_SPEC)
    back = decode_rowbinary_blob(blob, RB_SPEC)
    assert back == rows


def test_rowbinary_null_in_non_nullable_raises():
    with pytest.raises(ValueError, match="non-nullable"):
        encode_rowbinary([(None, 1, 1.0, None, "t")], RB_SPEC)


def test_rowbinary_spark_schema_types():
    sch = rowbinary_spark_schema(RB_SPEC)
    assert [f.dataType.simpleString() for f in sch.fields] == [
        "bigint",  # uint32 needs the >2^31 headroom
        "int",
        "double",
        "string",
        "string",
    ]
    assert [f.nullable for f in sch.fields] == [False, False, False, True, False]


def test_rowbinary_df_roundtrip(spark):
    spec = [("k", "int64"), ("v", "float64"), ("s", "Nullable(String)")]
    src = spark.range(0, 1000, numPartitions=4).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.5).alias("v"),
        F.when(F.col("id") % 3 == 0, F.concat(F.lit("s"), F.col("id"))).alias("s"),
    )
    blobs = encode_rowbinary_df(src, spec)
    assert blobs.count() == 4  # one blob per partition
    back = decode_rowbinary(blobs, spec)
    assert back.count() == 1000
    chk = back.agg(
        F.sum("k").alias("sk"), F.sum("v").alias("sv"), F.count("s").alias("cs")
    ).first()
    assert chk["sk"] == 499500 and chk["sv"] == 499500 * 1.5
    assert chk["cs"] == 334


# ------------------------------------------------------------------ collectd

from ramen_spark.sources.binary import (  # noqa: E402
    decode_collectd,
    decode_collectd_packet,
    encode_collectd,
    encode_collectd_df,
)


def test_collectd_roundtrip_state_machine():
    rows = [
        {
            "host": "web1",
            "time": 1_700_000_000.25,
            "plugin": "cpu",
            "instance": "0",
            "type_name": "cpu",
            "type_instance": "idle",
            "values": [97.5],
        },
        # same context except type_instance; values mixed types
        {
            "host": "web1",
            "time": 1_700_000_000.25,
            "plugin": "cpu",
            "instance": "0",
            "type_name": "cpu",
            "type_instance": "user",
            "values": [1.5, 42, -7],
        },
        {"host": "db1", "time": 1_700_000_010.0, "plugin": "load", "values": [0.5]},
    ]
    pkt = encode_collectd(rows, value_types=None)
    out = decode_collectd_packet(pkt)
    assert len(out) == 3
    r0 = dict(zip([f.name for f in __import__("ramen_spark.sources.binary", fromlist=["x"]).COLLECTD_DECODED_SCHEMA.fields], out[0]))
    assert r0["host"] == "web1" and r0["plugin"] == "cpu"
    assert r0["type_instance"] == "idle" and r0["value"] == 97.5
    assert r0["start"] == pytest.approx(1_700_000_000.25, abs=1e-6)
    # second row: context carries over, 3 values padded to 5
    assert out[1][5] == "user" and out[1][6:9] == (1.5, 42.0, -7.0)
    assert out[1][9] is None and out[1][10] is None
    # third row: host switch, plugin context updated
    assert out[2][0] == "db1" and out[2][2] == "load"


def test_collectd_value_type_encodings():
    from ramen_spark.sources.binary import _CD_COUNTER, _CD_DERIVE, _CD_GAUGE

    rows = [{"host": "h", "time": 10.0, "plugin": "p", "values": [2.5, 2**40, -5]}]
    pkt = encode_collectd(rows, value_types=[_CD_GAUGE, _CD_COUNTER, _CD_DERIVE])
    out = decode_collectd_packet(pkt)
    assert out[0][6:9] == (2.5, float(2**40), -5.0)


def test_collectd_malformed_raises():
    with pytest.raises(ValueError, match="malformed"):
        decode_collectd_packet(b"\x00\x06\x00\x02")  # part len < 4


def test_collectd_mapinpandas(spark):
    rows = [
        {"host": f"h{i%3}", "time": 100.0 + i, "plugin": "cpu", "values": [float(i)]}
        for i in range(100)
    ]
    pkts = [encode_collectd(rows[i : i + 32]) for i in range(0, 100, 32)]
    df = spark.createDataFrame(
        [(p,) for p in pkts], T.StructType([T.StructField("packet", T.BinaryType())])
    )
    out = decode_collectd(df)
    assert out.count() == 100
    s = out.agg(F.sum("value").alias("s"), F.countDistinct("host").alias("h")).first()
    assert s["s"] == sum(range(100)) and s["h"] == 3


def test_collectd_df_roundtrip(spark):
    src = spark.range(0, 200, numPartitions=3).select(
        F.concat(F.lit("host"), (F.col("id") % 5).cast("string")).alias("host"),
        (F.lit(1000.0) + F.col("id")).alias("time"),
        F.lit("mem").alias("plugin"),
        F.array((F.col("id") * 2.0)).alias("values"),
    )
    back = decode_collectd(encode_collectd_df(src))
    assert back.count() == 200
    chk = back.agg(F.sum("value").alias("sv")).first()
    assert chk["sv"] == sum(i * 2.0 for i in range(200))


def test_rowbinary_nan_encodes_as_null():
    """pandas missing numerics arrive as NaN, not None — both must hit
    the RowBinary NULL flag for Nullable numeric columns (ADVICE r1)."""
    spec = [("v", "Nullable(Float64)")]
    blob = encode_rowbinary([(float("nan"),), (1.5,), (None,)], spec)
    from ramen_spark.sources.binary import decode_rowbinary_blob

    assert decode_rowbinary_blob(blob, spec) == [(None,), (1.5,), (None,)]


def test_catalog_parse_bytes_suffixes():
    from ramen_spark.catalog import _parse_bytes

    assert _parse_bytes("134217728") == 128 << 20
    assert _parse_bytes("128m") == 128 << 20
    assert _parse_bytes("134217728b") == 128 << 20
    assert _parse_bytes("1g") == 1 << 30
    assert _parse_bytes("garbage") == 128 << 20


def _independent_record_batch(base_offset, base_ts, records, gzip_it=False):
    """A RecordBatch v2 built straight from the protocol guide,
    sharing no code with the product encoder — the wire segment the
    decoder is tested against is data, not self-consistency."""
    import gzip as _gzip
    import struct as _s
    import zlib as _z

    def vint(n):  # zigzag varint
        z = (n << 1) ^ (n >> 63)
        b = bytearray()
        while True:
            if z > 0x7F:
                b.append((z & 0x7F) | 0x80)
                z >>= 7
            else:
                b.append(z)
                return bytes(b)

    body = b""
    max_ts = base_ts
    for d, (ts, key, val) in enumerate(records):
        max_ts = max(max_ts, ts)
        r = b"\x00" + vint(ts - base_ts) + vint(d)
        for blob in (key, val):
            r += vint(-1) if blob is None else vint(len(blob)) + blob
        r += vint(0)
        body += vint(len(r)) + r
    attrs = 0
    if gzip_it:
        body, attrs = _gzip.compress(body), 1
    tail = (
        _s.pack(
            ">hiqqqhii",
            attrs,
            len(records) - 1,
            base_ts,
            max_ts,
            -1,
            -1,
            -1,
            len(records),
        )
        + body
    )
    after_len = _s.pack(">ibI", -1, 2, _z.crc32(tail) & 0xFFFFFFFF) + tail
    return _s.pack(">qi", base_offset, len(after_len)) + after_len


def test_kafka_segment_decode_roundtrip(spark, tmp_path):
    """The offline Kafka lane (the connector jar is absent and
    unvendorable — no network): a log segment assembled by an
    INDEPENDENT spec-following encoder (plain + gzip batches, null
    key, truncated tail) decodes to the right (offset, timestamp,
    key, value) rows through read_kafka_segment, and the value
    column composes with decode_rowbinary — the same per-blob decode
    the live consumer path would run."""
    from ramen_spark.sources.binary import (
        decode_kafka_segment,
        decode_rowbinary,
        encode_kafka_record_batch,
        encode_rowbinary,
        read_kafka_segment,
    )

    spec = [("metric", "String"), ("v", "UInt32")]
    payloads = [
        encode_rowbinary([(f"m{i}", i * 10)], spec) for i in range(5)
    ]
    seg = _independent_record_batch(
        100, 1_700_000_000_000, [
            (1_700_000_000_000, b"k0", payloads[0]),
            (1_700_000_000_007, None, payloads[1]),
            (1_700_000_000_011, b"k2", payloads[2]),
        ],
    ) + _independent_record_batch(
        103, 1_700_000_001_000, [
            (1_700_000_001_000, b"k3", payloads[3]),
            (1_700_000_001_002, b"k4", payloads[4]),
        ],
        gzip_it=True,
    )
    f = tmp_path / "00000000000000000100.log"
    # truncated tail batch: an unclean shutdown leaves half a batch
    f.write_bytes(seg + seg[:17])

    rows = read_kafka_segment(spark, str(f)).orderBy("offset").collect()
    assert [r["offset"] for r in rows] == [100, 101, 102, 103, 104]
    assert rows[1]["key"] is None and bytes(rows[0]["key"]) == b"k0"
    assert rows[4]["timestamp_ms"] == 1_700_000_001_002
    assert [bytes(r["value"]) for r in rows] == payloads

    typed = decode_rowbinary(
        read_kafka_segment(spark, str(f)).select(
            F.col("value").alias("blob")
        ),
        spec,
    )
    got = {(r["metric"], r["v"]) for r in typed.collect()}
    assert got == {(f"m{i}", i * 10) for i in range(5)}

    # the product encoder's batches verify their stored crc
    own = encode_kafka_record_batch(
        [(1, b"a", b"x"), (2, None, b"y")], base_offset=7, base_timestamp=1
    )
    recs = decode_kafka_segment(own, verify_crc=True)
    assert [(o, t, k, v) for _b, o, t, k, v in recs] == [
        (7, 1, b"a", b"x"),
        (8, 2, None, b"y"),
    ]


def test_kafka_segment_corrupt_batch_interior_is_contained():
    """A malformed record INSIDE a length-valid batch (value length
    claiming past the body, corrupt gzip body, unsupported codec)
    must not fail the segment: records before the corruption and
    every LATER batch still decode — the WARC walker's
    skip-bad-record contract."""
    import struct as _s
    import zlib as _z

    from ramen_spark.sources.binary import (
        decode_kafka_segment,
        encode_kafka_record_batch,
    )

    def _rebody(batch: bytes, mutate) -> bytes:
        """Rewrite a v2 batch's post-crc tail through `mutate`,
        refreshing length+crc so the batch FRAME stays valid."""
        tail = bytearray(batch[21:])
        tail = mutate(tail)
        crc = _z.crc32(bytes(tail)) & 0xFFFFFFFF
        after_len = _s.pack(">ibI", -1, 2, crc) + bytes(tail)
        return batch[:8] + _s.pack(">i", len(after_len)) + after_len

    good1 = encode_kafka_record_batch(
        [(10, b"k1", b"v1"), (11, b"k2", b"v2")], base_offset=0,
        base_timestamp=10,
    )
    head = _s.calcsize(">hiqqqhii")

    def overrun_value_len(tail):
        # body starts after the fixed header; first record's varints:
        # len, attr, ts, off, klen(=2)+key, then vlen — bump vlen to
        # a huge claim so the second record is unreachable garbage
        body = tail[head:]
        # record: [len][attr][ts][off][klen]kk[vlen]vv… — find 'v1'
        i = bytes(body).find(b"k1") + 2
        body[i] = 0x7E  # zigzag(63): claims 63 bytes, body has 2
        return tail[:head] + body

    bad_interior = _rebody(good1, overrun_value_len)
    good2 = encode_kafka_record_batch(
        [(20, b"k3", b"v3")], base_offset=2, base_timestamp=20
    )
    recs = decode_kafka_segment(bad_interior + good2)
    # later batch fully survives; nothing raised
    assert (2, 2, 20, b"k3", b"v3") in recs

    # corrupt gzip body: batch skipped, later batch survives
    gz = encode_kafka_record_batch(
        [(30, b"k4", b"v4")], base_offset=5, base_timestamp=30,
        compression="gzip",
    )
    def smash_gzip(tail):
        tail[head + 3] ^= 0xFF
        return tail
    recs2 = decode_kafka_segment(_rebody(gz, smash_gzip) + good2)
    assert recs2 == [(2, 2, 20, b"k3", b"v3")]

    # unsupported codec (snappy=2): skipped, not raised
    def set_snappy(tail):
        tail[:2] = _s.pack(">h", 2)
        return tail
    recs3 = decode_kafka_segment(_rebody(gz, set_snappy) + good2)
    assert recs3 == [(2, 2, 20, b"k3", b"v3")]


def test_kafka_segment_corrupt_deflate_body_is_contained():
    """gzip.decompress raises zlib.error (NOT ValueError/OSError) when
    the DEFLATE STREAM — not the gzip header — is corrupt; the
    containment must catch it so later batches survive."""
    import struct as _s
    import zlib as _z

    from ramen_spark.sources.binary import (
        decode_kafka_segment,
        encode_kafka_record_batch,
    )

    gz = encode_kafka_record_batch(
        [(30, b"k4", b"v4" * 50)], base_offset=5, base_timestamp=30,
        compression="gzip",
    )
    head = _s.calcsize(">hiqqqhii")
    tail = bytearray(gz[21:])
    # corrupt INSIDE the deflate stream (past the 10-byte gzip header)
    tail[head + 14] ^= 0xFF
    crc = _z.crc32(bytes(tail)) & 0xFFFFFFFF
    after_len = _s.pack(">ibI", -1, 2, crc) + bytes(tail)
    bad = gz[:8] + _s.pack(">i", len(after_len)) + after_len
    # sanity: this really is the zlib.error shape, not BadGzipFile
    import gzip as _gzip
    import pytest as _pytest
    with _pytest.raises(_z.error):
        _gzip.decompress(bytes(tail[head:]))

    good = encode_kafka_record_batch(
        [(40, b"k5", b"v5")], base_offset=9, base_timestamp=40
    )
    assert decode_kafka_segment(bad + good) == [(9, 9, 40, b"k5", b"v5")]
