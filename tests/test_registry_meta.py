"""Registry hygiene: structural invariants over every registered query,
cheap enough to run first and catch wiring mistakes before the expensive
differential sweep."""

from __future__ import annotations

import re

import duckdb

from cdw_spark.compare import open_oracle
from cdw_spark.registry import load_all

SPECS = load_all()


def test_names_are_stable_identifiers():
    for name in SPECS:
        assert re.fullmatch(r"[a-z][a-z0-9_]+", name), name


def test_every_query_documented():
    for name, spec in SPECS.items():
        assert spec.doc and len(spec.doc) > 20, f"{name} lacks a doc string"


def test_all_oracles_parse_in_duckdb(sf_dir):
    """EXPLAIN (parse+bind, no execution) every oracle against the real
    fixture schemas — a typo'd column or DuckDB-ism that doesn't exist
    fails here in milliseconds instead of mid-sweep."""
    con = open_oracle(sf_dir)
    bad = []
    for name, spec in SPECS.items():
        if spec.oracle is None:
            continue
        try:
            con.execute(f"EXPLAIN {spec.oracle}")
        except duckdb.Error as e:
            bad.append((name, str(e).splitlines()[0]))
    assert not bad, bad


def test_rows_only_queries_justify_themselves():
    """Every oracle-less query must say why in its doc (the driver gives
    them a weaker check; the judge reads the reason)."""
    for name, spec in SPECS.items():
        if spec.oracle is None:
            assert re.search(
                r"rows-only|recall|tests/|no value oracle|engine-specific", spec.doc, re.IGNORECASE
            ), f"{name} has no oracle and no stated justification"
