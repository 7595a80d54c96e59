"""Reproduce the reference's published end-to-end benchmark shape.

The one quantitative end-to-end number in the reference repo
(BASELINE.md; site/blog/2019-02.php "Ramen vs KSQL") is ~19 s to run
a per-minute tumbling aggregate over a 400 k-row × ~80-column gzipped
CSV of TCP flow records (~21 k rows/s including CSV parse +
decompress) on an 8-core single node. This module reproduces that
benchmark apples-to-apples against THIS engine:

- the same data shape: 400 k rows × 80 columns (9 semantically real
  TCP columns + 71 numeric filler columns so per-row parse cost
  matches), written as a single .csv.gz — one gzip stream is not
  splittable, which mirrors the reference's single sequential reader;
- the same query: the blog's ``top_tcp`` RaQL text VERBATIM, compiled
  by this repo's front-end (per-minute GROUP BY server port, summed
  traffic, conditional average RTT, ``COMMIT AFTER in.capture_begin >
  out.capture_begin + 80_000_000``);
- end-to-end wall time: CSV decompress + parse + aggregate + emit.

Used by bench.py (``baseline_repro`` section of the JSON line).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N_ROWS = 400_000
N_FILLER = 71  # + 9 real columns = 80, the blog's ~80-col CSV

REAL_COLS = [
    "capture_begin",  # microseconds
    "port_server",
    "ip4_client",
    "traffic_bytes_client",
    "traffic_bytes_server",
    "rtt_count_client",
    "rtt_count_server",
    "rtt_sum_client",
    "rtt_sum_server",
]

TOP_TCP_RAQL = """
DEFINE top_tcp AS
  SELECT
    min capture_begin AS capture_begin,
    port_server,
    SUM(traffic_bytes_client + traffic_bytes_server) AS traffic,
    SUM(rtt_count_client + rtt_count_server) AS rtt_count,
    CASE WHEN rtt_count > 0 THEN
           SUM(rtt_sum_client + rtt_sum_server) / rtt_count
    END AS avg_rtt
  FROM tcp
  WHERE ip4_client IS NOT NULL
  GROUP BY port_server, capture_begin // 60_000_000
  COMMIT AFTER
    in.capture_begin > out.capture_begin + 80_000_000;
"""


def generate_csv(spark: SparkSession, out_dir: str) -> str:
    """Write the 400 k × 80-col gzipped CSV once (cached). Flow records
    span ~20 minutes of capture time across 1024 server ports."""
    import hashlib

    os.makedirs(out_dir, exist_ok=True)
    version = hashlib.md5(open(os.path.abspath(__file__), "rb").read()).hexdigest()
    done = os.path.join(out_dir, "_DONE")
    try:
        if open(done).read() == version:
            return out_dir
    except OSError:
        pass
    df = spark.range(N_ROWS).select(
        (F.lit(1_500_000_000_000_000) + F.col("id") * F.lit(3_000))
        .alias("capture_begin"),
        F.pmod(F.xxhash64("id"), F.lit(1024)).alias("port_server"),
        F.when(F.pmod(F.col("id"), 50) == 0, F.lit(None))
        .otherwise(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1 << 31)))
        .alias("ip4_client"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(100_000)).alias(
            "traffic_bytes_client"
        ),
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(100_000)).alias(
            "traffic_bytes_server"
        ),
        F.pmod(F.xxhash64("id", F.lit(4)), F.lit(10)).alias("rtt_count_client"),
        F.pmod(F.xxhash64("id", F.lit(5)), F.lit(10)).alias("rtt_count_server"),
        F.pmod(F.xxhash64("id", F.lit(6)), F.lit(1_000_000)).alias(
            "rtt_sum_client"
        ),
        F.pmod(F.xxhash64("id", F.lit(7)), F.lit(1_000_000)).alias(
            "rtt_sum_server"
        ),
        *[
            F.pmod(F.xxhash64("id", F.lit(100 + i)), F.lit(1_000_000)).alias(
                f"filler_{i}"
            )
            for i in range(N_FILLER)
        ],
    )
    (
        df.orderBy("capture_begin")
        .coalesce(1)  # ONE gzip stream, like the reference's input
        .write.mode("overwrite")
        .option("compression", "gzip")
        .csv(os.path.join(out_dir, "tcp"))
    )
    with open(done, "w") as fh:
        fh.write(version)
    return out_dir


def reader_raql(csv_glob: str) -> str:
    """The tcp CSV reader as RaQL (all 80 columns declared, so the
    engine parses every column exactly like the reference's reader
    did — column pruning is deliberately defeated by the gz format
    anyway: the whole stream must be decompressed)."""
    fields = [
        "capture_begin u64?",
        "port_server u32?",
        "ip4_client u32?",
        "traffic_bytes_client u64?",
        "traffic_bytes_server u64?",
        "rtt_count_client u64?",
        "rtt_count_server u64?",
        "rtt_sum_client u64?",
        "rtt_sum_server u64?",
    ] + [f"filler_{i} u64?" for i in range(N_FILLER)]
    cols = ",\n    ".join(fields)
    return (
        f'DEFINE tcp AS READ FROM FILE "{csv_glob}" AS CSV (\n    {cols}\n);\n'
    )


def run(spark: SparkSession, data_dir: str) -> dict:
    """End-to-end wall time of the blog benchmark on this engine."""
    from ramen_spark.plans.raql import compile_program

    generate_csv(spark, data_dir)
    glob = os.path.join(data_dir, "tcp", "*.csv.gz")
    text = reader_raql(glob) + TOP_TCP_RAQL
    prog = compile_program(text, name="ramen_vs_ksql")
    t0 = time.perf_counter()
    dfs = prog.materialize(spark, register_views=False)
    out = dfs["top_tcp"]
    n_out = out.count()
    wall = time.perf_counter() - t0
    return {
        "rows": N_ROWS,
        "cols": 9 + N_FILLER,
        "sec": round(wall, 3),
        "groups_out": n_out,
        "rows_per_sec": round(N_ROWS / wall),
        "ref_sec": 19.0,
        "ref_rows_per_sec": 21_000,
    }


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ramen_spark import get_spark

    spark = get_spark("baseline_repro")
    print(run(spark, os.environ.get("SPARK_GRAFT_REPRO_DIR", "/tmp/spark_graft_repro")))
