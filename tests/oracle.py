"""Shared Spark-vs-DuckDB comparison harness, mimicking the driver's
correctness gate: row count + column names + order-insensitive values.

Stricter than the driver (exact value equality after normalization) so
passing here predicts passing there.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from ramen_spark.catalog import TABLES, table_path


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64", errors="ignore")
        elif pd.api.types.is_bool_dtype(s):
            out[c] = s.astype("boolean")
        elif pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]")
        else:
            out[c] = s.astype("object").map(lambda v: str(v) if v is not None else None)
    ndf = pd.DataFrame(out)
    return ndf.sort_values(by=list(ndf.columns), kind="stable").reset_index(drop=True)


def compare(spark_df, oracle_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    sp = spark_df.toPandas()
    errs: list[str] = []
    if sorted(sp.columns) != sorted(oracle_df.columns):
        errs.append(f"columns differ: spark={sorted(sp.columns)} oracle={sorted(oracle_df.columns)}")
        return errs
    if len(sp) != len(oracle_df):
        errs.append(f"row count differs: spark={len(sp)} oracle={len(oracle_df)}")
    # Representation strictness (round-1 lesson: the driver's value-hash
    # is repr-sensitive where numeric comparison is lenient):
    # 1. dtype KIND must agree — DuckDB HUGEINT (count_if / sum(int))
    #    lands as float64 in pandas while Spark gives int64: "3.0" vs
    #    "3" hash-differs. Fix the oracle SQL with CAST(... AS BIGINT).
    # 2. no -0.0 on either side — DuckDB round() emits -0.0, Spark's
    #    BigDecimal round never does. Fix with `+ 0.0` on both sides.
    import numpy as np

    for c in sorted(sp.columns):
        sk, ok_ = sp[c].dtype.kind, oracle_df[c].dtype.kind
        if {sk, ok_} <= {"i", "u", "f"} and sk != ok_:
            errs.append(f"col {c}: dtype kind differs spark={sp[c].dtype} oracle={oracle_df[c].dtype}")
        for tag, s_ in (("spark", sp), ("oracle", oracle_df)):
            if s_[c].dtype.kind == "f":
                v = s_[c].to_numpy(dtype="float64", na_value=np.nan)
                n0 = int(np.sum((v == 0) & np.signbit(v)))
                if n0:
                    errs.append(f"col {c}: {tag} side has {n0} IEEE -0.0 values")
    a, b = _normalize(sp), _normalize(oracle_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if pd.api.types.is_float_dtype(av):
                bad = ~(
                    (av.isna() & bv.isna())
                    | ((av - bv).abs() <= 1e-9)
                    | (av.eq(bv))
                )
                nbad = int(bad.sum())
                if nbad:
                    i = bad.idxmax()
                    errs.append(
                        f"col {c}: {nbad} float mismatches, first at {i}: {av[i]!r} vs {bv[i]!r}"
                    )
                # also flag non-exact floats (driver may hash exact values)
                exact_bad = ~((av.isna() & bv.isna()) | av.eq(bv))
                nexact = int(exact_bad.sum())
                if nexact and not nbad:
                    i = exact_bad.idxmax()
                    errs.append(
                        f"col {c}: {nexact} NON-EXACT floats (within 1e-9), first {av[i]!r} vs {bv[i]!r}"
                    )
            else:
                av2 = av.where(~av.isna(), None)
                bv2 = bv.where(~bv.isna(), None)
                bad = ~(av2.eq(bv2) | (av.isna() & bv.isna()))
                nbad = int(bad.sum())
                if nbad:
                    i = bad.idxmax()
                    errs.append(f"col {c}: {nbad} mismatches, first at {i}: {av[i]!r} vs {bv[i]!r}")
    return errs
