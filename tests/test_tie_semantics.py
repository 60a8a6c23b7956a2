"""Q15 tie semantics: top_supplier_revenue must return EVERY supplier
tied at the maximum quarterly revenue, identically in Spark and in the
DuckDB oracle.

The tie comparison happens on exact decimal sums (operators/relational3
docstring); this property test FORCES ties by mirroring one supplier's
line set onto another and checks both engines against a from-scratch
Python Decimal argmax. Hypothesis drives the line sets; examples are
few because each one executes a Spark job.
"""

from __future__ import annotations

import decimal
import os

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from synthetic_data_transfer_to_relational_database_spark import registry

QUERY = "top_supplier_revenue"

_line = st.tuples(
    st.integers(min_value=1, max_value=9_999_999),  # price cents
    st.integers(min_value=0, max_value=10),  # discount in 5% steps
)


def _revenue(lines) -> decimal.Decimal:
    """From-scratch exact revenue: sum(price * (1 - discount))."""
    total = decimal.Decimal(0)
    for cents, disc in lines:
        price = decimal.Decimal(cents) / 100
        total += price * (1 - decimal.Decimal(disc * 5) / 100)
    return total


@pytest.fixture(scope="module")
def tie_dir_factory(tmp_path_factory):
    base = tmp_path_factory.mktemp("q15_tie")
    counter = [0]

    def build(lines_by_supp):
        counter[0] += 1
        d = base / str(counter[0])
        d.mkdir()
        rows = [
            {
                "l_orderkey": i + 1,
                "l_suppkey": supp,
                "l_extendedprice": cents / 100.0,
                "l_discount": disc * 5 / 100.0,
                "l_shipdate": pd.Timestamp("1996-02-01"),
            }
            for i, (supp, (cents, disc)) in enumerate(
                (s, ln) for s, lns in lines_by_supp.items() for ln in lns
            )
        ]
        li = pd.DataFrame(rows)
        # Spark 4 refuses parquet TIMESTAMP(NANOS); write micros like
        # the driver testdata does.
        li["l_shipdate"] = li["l_shipdate"].astype("datetime64[us]")
        li.to_parquet(d / "lineitem.parquet")
        pd.DataFrame(
            {
                "s_suppkey": list(lines_by_supp),
                "s_name": [f"Supplier#{s}" for s in lines_by_supp],
            }
        ).to_parquet(d / "supplier.parquet")
        return str(d)

    return build


def _run_both(spark, sf_dir):
    """Run the registered query and its oracle on one tie fixture;
    return both engines' supplier-key sets."""
    sdf = registry.all_queries()[QUERY](spark, sf_dir)
    got_spark = {r["s_suppkey"] for r in sdf.collect()}
    con = duckdb.connect()
    for t in ("lineitem", "supplier"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t)}.parquet')"
        )
    got_duck = {row[0] for row in con.execute(registry.all_oracles()[QUERY]).fetchall()}
    return got_spark, got_duck


@given(
    base_lines=st.lists(_line, min_size=1, max_size=6),
    extra_fracs=st.lists(st.floats(min_value=0.0, max_value=1.0), max_size=3),
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_forced_tie_returns_all_tied_suppliers(
    spark, tie_dir_factory, base_lines, extra_fracs
):
    # suppliers 1 and 2 mirror each other's lines -> exact revenue tie
    # AT the maximum: every other supplier draws a PREFIX of the base
    # lines, so (line revenues being strictly positive) it earns
    # strictly less — unless the prefix is the whole set, in which case
    # it JOINS the tie and must come back too.
    lines_by_supp = {1: base_lines, 2: list(base_lines)}
    for i, frac in enumerate(extra_fracs):
        lines_by_supp[3 + i] = base_lines[: round(frac * len(base_lines))]
    sf_dir = tie_dir_factory(lines_by_supp)

    expected_rev = {s: _revenue(l) for s, l in lines_by_supp.items() if l}
    mx = max(expected_rev.values())
    expected = {s for s, r in expected_rev.items() if r == mx}
    assert {1, 2} <= expected  # the forced tie is part of the answer

    got_spark, got_duck = _run_both(spark, sf_dir)
    assert got_spark == expected
    assert got_duck == expected


def test_tie_from_distinct_row_multisets(spark, tie_dir_factory):
    # The property test above forces ties only by mirroring a line set;
    # here the tie is reached through DIFFERENT rows: supplier 3 matches
    # the pair's 2.00 revenue with three lines mixing quantity splits
    # and a 50% discount. An implementation that compared row data
    # instead of the aggregated sum would miss this tie.
    lines_by_supp = {
        1: [(200, 0)],                      # 2.00
        2: [(200, 0)],                      # 2.00 (mirror)
        3: [(100, 0), (50, 0), (100, 10)],  # 1.00 + 0.50 + 0.50 = 2.00
        4: [(100, 0)],                      # 1.00 — strictly below
    }
    sf_dir = tie_dir_factory(lines_by_supp)
    got_spark, got_duck = _run_both(spark, sf_dir)
    assert got_spark == {1, 2, 3}
    assert got_duck == {1, 2, 3}


def test_non_mirrored_supplier_outearning_the_pair(spark, tie_dir_factory):
    # The max holder need not be part of a tie at all: supplier 3 alone
    # out-earns the mirrored pair, so exactly one row comes back.
    lines_by_supp = {
        1: [(200, 0)],  # 2.00
        2: [(200, 0)],  # 2.00
        3: [(500, 0)],  # 5.00 — sole maximum
    }
    sf_dir = tie_dir_factory(lines_by_supp)
    got_spark, got_duck = _run_both(spark, sf_dir)
    assert got_spark == {3}
    assert got_duck == {3}
