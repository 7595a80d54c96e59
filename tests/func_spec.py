"""Adapter: the spec runner now lives in ramen_spark.testkit (the
`ramen test` product surface); this module keeps the corpus paths and
the historical entry point for the sweep."""

from __future__ import annotations

import os

from ramen_spark.testkit import parse_spec, run_spec_file  # noqa: F401

FUNC_DIR = "/root/reference/tests/func"


def run_spec(spark, test_name: str, parse_expected, values_equal,
             source_provider=None):
    return run_spec_file(
        spark, os.path.join(FUNC_DIR, f"{test_name}.test"),
        parse_expected, values_equal, source_provider=source_provider,
    )


def generated_source_provider(scratch_dir):
    """Stand-in for the reference's build step that emits
    tests/func/generated.ramen + fixtures/generated.csv
    (tools/gen_reader_test.opt, Makefile.in:1372-1382) before
    `ramen test` runs: regenerates an equivalent deterministic pair
    (tests/gen_reader.py) under ``scratch_dir``."""
    def provider(src: str):
        if os.path.basename(src) == "generated.ramen":
            from tests.gen_reader import generate

            text, _fields, _first = generate(
                scratch_dir, seed=42, rows=100_000
            )
            return text, str(scratch_dir)
        return None

    return provider
