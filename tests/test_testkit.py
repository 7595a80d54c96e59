"""ramen_spark.testkit — `ramen test` as a product surface: users run
their OWN .test specs (programs + present/absent expectations)
against the engine, not just the reference corpus."""

from __future__ import annotations

import pytest

from ramen_spark.testkit import parse_spec, run_spec_file


def test_user_spec_end_to_end(spark, tmp_path):
    (tmp_path / "shop.ramen").write_text(
        """
DEFINE orders AS
  READ FROM FILE "orders.csv" AS CSV (
    item STRING,
    qty U32);

DEFINE totals AS
  SELECT item, SUM qty AS total
  FROM orders
  GROUP BY item
  COMMIT AFTER in.item <> out.item;
"""
    )
    (tmp_path / "orders.csv").write_text(
        "apple,3\napple,4\npear,1\nfin,0\n"
    )
    (tmp_path / "shop.test").write_text(
        """
{
  programs = [ { src = "shop.ramen" } ];
  outputs = {
    "shop/totals" => {
      present = [ { "item" => "apple"; "total" => "7" };
                  { "item" => "pear"; "total" => "1" } ];
      absent = [ { "item" => "apple"; "total" => "3" } ];
    }
  }
}
"""
    )
    fails = run_spec_file(spark, str(tmp_path / "shop.test"))
    assert fails == []


def test_failures_are_reported(spark, tmp_path):
    (tmp_path / "p.ramen").write_text("DEFINE f AS YIELD 1 AS one;\n")
    (tmp_path / "p.test").write_text(
        """
{
  programs = [ { src = "p.ramen" } ];
  outputs = { "p/f" => { present = [ { "one" => "2" } ] } }
}
"""
    )
    fails = run_spec_file(spark, str(tmp_path / "p.test"))
    assert len(fails) == 1 and fails[0][1] == "present"


def test_parse_spec_shapes():
    spec = parse_spec(
        '{ programs = [ { src = "a.ramen"; params = { n = VU8 3 } } ];'
        ' outputs = { "a/f" => { present = [ { "x" => "1" } ] } } }'
    )
    assert spec["programs"][0]["params"]["n"] == 3
    assert spec["outputs"]["a/f"]["present"] == [{"x": "1"}]
