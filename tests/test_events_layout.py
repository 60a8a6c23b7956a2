"""The driver has shipped events.parquet with two physical ts layouts:
TIMESTAMP(NANOS) and TIMESTAMP(MICROS, isAdjustedToUTC=false). The source
layer sniffs the footer and must normalize BOTH to the same session-TZ
TimestampType values — otherwise a testdata regeneration silently flips
every time-window result. This test freezes that contract by writing the
same rows in each layout and loading them through sources.tables.table().
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from synthetic_data_transfer_to_relational_database_spark.sources.tables import (
    events_ts_unit,
    table,
)

_ROWS = [
    # (event_id, epoch-micros, user_id, event_type, value, props)
    (1, 1_700_000_000_123_456, 7, "click", 1.5, '{"k":1}'),
    (2, 1_700_000_555_000_001, 8, "view", 2.5, '{"k":2}'),
    (3, 1_700_099_999_999_999, 7, "click", 3.5, None),
]


def _write_events(dir_path, ts_unit: str) -> str:
    ts_us = [r[1] for r in _ROWS]
    if ts_unit == "ns":
        ts_arr = pa.array([t * 1000 for t in ts_us], pa.timestamp("ns"))
    else:
        ts_arr = pa.array(ts_us, pa.timestamp("us"))
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in _ROWS], pa.int64()),
            "ts": ts_arr,
            "user_id": pa.array([r[2] for r in _ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in _ROWS], pa.string()),
            "value": pa.array([r[4] for r in _ROWS], pa.float64()),
            "props": pa.array([r[5] for r in _ROWS], pa.string()),
        }
    )
    out = dir_path / f"events_{ts_unit}"
    out.mkdir()
    # store_schema=False drops the Arrow schema blob, so readers see only
    # the parquet logical type — exactly how the driver's files look.
    pq.write_table(tbl, out / "events.parquet", store_schema=False)
    return str(out)


@pytest.mark.parametrize("ts_unit", ["us", "ns"])
def test_ts_unit_sniff(tmp_path, ts_unit):
    d = _write_events(tmp_path, ts_unit)
    assert events_ts_unit(d) == ts_unit


@pytest.mark.parametrize("ts_unit", ["us", "ns"])
def test_both_layouts_normalize_identically(spark, tmp_path, ts_unit):
    d = _write_events(tmp_path, ts_unit)
    df = table(spark, d, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = {r["event_id"]: r["ts"] for r in df.collect()}
    # Session TZ is pinned UTC (session.py), so the expected wall-clock
    # value is the epoch-micros rendered in UTC.
    want = {
        r[0]: datetime.datetime.fromtimestamp(r[1] / 1e6, tz=datetime.timezone.utc).replace(tzinfo=None)
        for r in _ROWS
    }
    assert got == want


def test_nanos_conf_scoped_to_the_read(spark, tmp_path):
    """The legacy nanosAsLong conf must be restored right after the
    events read (a session-global leftover would silently read any later
    nanos parquet as longs) — while the already-resolved relation still
    executes correctly afterwards."""
    key = "spark.sql.legacy.parquet.nanosAsLong"
    if spark.conf.get(key, None) is not None:  # a streaming test may have set it
        spark.conf.unset(key)
    d = _write_events(tmp_path, "ns")
    df = table(spark, d, "events")
    assert spark.conf.get(key, None) is None
    got = {r["event_id"]: r["ts"] for r in df.collect()}
    want = {
        r[0]: datetime.datetime.fromtimestamp(r[1] / 1e6, tz=datetime.timezone.utc).replace(tzinfo=None)
        for r in _ROWS
    }
    assert got == want


def test_stream_rejects_mixed_annotations(tmp_path):
    """A directory holding events files with different ts annotations must
    fail stream construction loudly (the ns-declared + MICROS-file case
    is otherwise silent garbage — see events_stream.stream_events)."""
    import pathlib

    from synthetic_data_transfer_to_relational_database_spark.streaming.events_stream import (
        _assert_uniform_ts_unit,
    )

    d = pathlib.Path(_write_events(tmp_path, "us"))
    ts_arr = pa.array([1_700_000_000_000_000_000], pa.timestamp("ns"))
    pq.write_table(
        pa.table({"event_id": pa.array([9], pa.int64()), "ts": ts_arr}),
        d / "events_late.parquet",
        store_schema=False,
    )
    with pytest.raises(ValueError, match="mixed events ts annotations"):
        _assert_uniform_ts_unit(str(d), "us")


def test_shipped_testdata_loads(spark, sf_dir):
    """Whatever layout the current testdata uses, the loader reads it."""
    import os

    if not os.path.exists(os.path.join(sf_dir, "events.parquet")):
        pytest.skip(f"no shipped testdata at {sf_dir}")
    df = table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.limit(1).count() == 1
