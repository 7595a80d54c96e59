"""Adapter: the spec runner now lives in ramen_spark.testkit (the
`ramen test` product surface); this module keeps the corpus paths and
the historical entry point for the sweep."""

from __future__ import annotations

import os

from ramen_spark.testkit import parse_spec, run_spec_file  # noqa: F401

FUNC_DIR = "/root/reference/tests/func"


def run_spec(spark, test_name: str, parse_expected, values_equal):
    return run_spec_file(
        spark, os.path.join(FUNC_DIR, f"{test_name}.test"),
        parse_expected, values_equal,
    )
