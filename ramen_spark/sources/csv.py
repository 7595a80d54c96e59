"""READ FROM FILES ... AS CSV — the reference's CSV option surface
(src/raql_operation.type:54-138: separator, null string, quoting,
escaping, skip-first-lines, clickhouse syntax) mapped onto Spark's
CSV datasource (distributed, splittable scan; schema mandatory like
the reference's declared fields — no inference in production paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    separator: str = ",",
    null_str: str = "",
    may_quote: bool = False,
    escape_seq: str | None = None,
    skip_first: int = 0,
    clickhouse_syntax: bool = False,
) -> DataFrame:
    """Batch CSV read with RaQL defaults (separator=',', NULLs as
    empty string, no quoting unless ``may_quote``).

    ``clickhouse_syntax`` enables ClickHouse-style array cells
    ('[1,2,3]') — declare those fields as StringType and post-parse
    with ``parse_clickhouse_array``. Array cells must not contain the
    separator (ClickHouse exports these as TSV; use separator='\\t').
    """
    reader = (
        spark.read.schema(schema)
        .option("sep", separator)
        .option("nullValue", null_str)
        .option("header", "false")
        .option("mode", "PERMISSIVE")
    )
    if may_quote:
        reader = reader.option("quote", '"')
    else:
        reader = reader.option("quote", "")  # empty quote char disables quoting
    if escape_seq:
        reader = reader.option("escape", escape_seq)
    if skip_first:
        reader = reader.option("skipLines", str(skip_first))
    return reader.csv(path)


@F.pandas_udf(T.BinaryType())
def decimal_str_to_bytes16(s):
    """Decimal-string 128-bit value → 16-byte big-endian binary (the
    v6 half of the generic ip/cidr sum types). Python ints because the
    value range (2^128) exceeds Decimal(38); ingest-only cold path —
    per-batch vectorized via Arrow. (DataType instance, not DDL string:
    the module imports before any SparkSession exists.)"""
    return s.map(
        lambda v: None if v is None else int(v).to_bytes(16, "big")
    )


def parse_clickhouse_array(col, element_type: str = "long"):
    """ClickHouse-syntax array cell '[1,2,3]' → array<element_type>
    (the reference decodes these via dessser; here: split built-ins)."""
    inner = F.regexp_replace(col, r"^\[|\]$", "")
    return F.when(
        F.length(F.trim(inner)) == 0, F.array().cast(f"array<{element_type}>")
    ).otherwise(
        F.transform(F.split(inner, ","), lambda x: F.trim(x).cast(element_type))
    )


def parse_clickhouse_array_cell(col, element_type: str = "string"):
    """Array cell in ClickHouse export syntax with optionally
    single-quoted string elements: ``['a', 'b']`` / ``[1,2]`` / ``[]``
    (fixtures/email.csv). Splits on ', ' boundaries between quoted
    items, strips the quotes, casts elements. NULL cell stays NULL."""
    inner = F.regexp_replace(col, r"^\[|\]$", "")
    if element_type == "string":
        # split on the quote-comma-quote boundary, then strip the
        # remaining outer quotes of the first/last elements
        parts = F.split(inner, r"',\s*'")
        stripped = F.transform(
            parts, lambda x: F.regexp_replace(x, r"^\s*'|'\s*$", "")
        )
        return F.when(col.isNull(), F.lit(None).cast("array<string>")).when(
            F.length(F.trim(inner)) == 0, F.array().cast("array<string>")
        ).otherwise(stripped)
    return F.when(col.isNull(), F.lit(None).cast(f"array<{element_type}>")).otherwise(
        parse_clickhouse_array(col, element_type)
    )
