"""The events-loader timestamp contract across parquet physical
types — in particular the tz-ADJUSTED branch (isAdjustedToUTC=true,
Spark's plain ``timestamp``): ``load_table`` must normalize ``ts``
to UTC wall-clock TimestampNTZ and derive ``ts_ns`` so that a
DuckDB oracle reading the same file with its timezone pinned to UTC
(``SET TimeZone='UTC'``) matches BIT-EXACTLY.  This is the enforced
form of the loader's documented NOTE: the driver's own testdata is
NTZ, but external tz-adjusted parquet must either convert cleanly or
the divergence must be caught here, not discovered in an oracle
mismatch."""

from __future__ import annotations

import glob

import duckdb

from rakam_api_spark.tables import load_table

_ROWS = [
    # (instant as UTC wall-clock string, user)
    ("2024-03-05 12:34:56.789123", 1),
    ("2024-07-01 00:00:00", 2),
    ("2023-12-31 23:59:59.999999", 3),
]


def _write_tz_adjusted_events(spark, out_dir: str) -> None:
    # Spark's plain TIMESTAMP writes parquet TIMESTAMP(MICROS,
    # isAdjustedToUTC=true); with the session timezone pinned to UTC
    # (session.configure_runtime) the literals below are interpreted
    # as UTC wall-clock, i.e. the instants are exactly these strings.
    values = ", ".join(f"(timestamp'{ts}', {u})" for ts, u in _ROWS)
    spark.sql(f"SELECT * FROM VALUES {values} AS t(ts, user_id)").write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/events.parquet")


def test_tz_adjusted_parquet_loads_as_utc_ntz(spark, tmp_path):
    _write_tz_adjusted_events(spark, str(tmp_path))
    df = load_table(spark, str(tmp_path), "events")
    dtypes = dict(df.dtypes)
    # contract: callers ALWAYS see NTZ ts + long ts_ns
    assert dtypes["ts"] == "timestamp_ntz"
    assert dtypes["ts_ns"] == "bigint"
    got = {r["user_id"]: (r["ts"], r["ts_ns"]) for r in df.collect()}
    # the NTZ wall-clock equals the instant rendered at UTC
    assert got[1][0].isoformat(sep=" ") == "2024-03-05 12:34:56.789123"
    assert got[2][0].isoformat(sep=" ") == "2024-07-01 00:00:00"


def test_tz_adjusted_parquet_matches_utc_pinned_duckdb(spark, tmp_path):
    _write_tz_adjusted_events(spark, str(tmp_path))
    df = load_table(spark, str(tmp_path), "events")
    spark_rows = {
        r["user_id"]: (r["ts"].isoformat(sep=" "), r["ts_ns"]) for r in df.collect()
    }
    files = glob.glob(f"{tmp_path}/events.parquet/*.parquet")
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")  # the documented oracle contract
    duck_rows = {
        u: (ts.isoformat(sep=" "), us * 1000)
        for ts, us, u in con.execute(
            "SELECT CAST(ts AS TIMESTAMP) AS ts, epoch_us(ts) AS us, user_id "
            f"FROM read_parquet({files!r})"
        ).fetchall()
    }
    assert spark_rows == duck_rows
    # DuckDB's parquet reader types isAdjustedToUTC=true micros as
    # NAIVE TIMESTAMP holding the UTC wall-clock, so for DuckDB
    # specifically the contract holds even without the pin — verify
    # that too (the pin stays documented for engines that type the
    # column TIMESTAMPTZ)
    con2 = duckdb.connect()
    con2.execute("SET TimeZone='America/New_York'")
    (typ,) = [
        r[1]
        for r in con2.execute(
            f"DESCRIBE SELECT ts FROM read_parquet({files!r})"
        ).fetchall()
    ]
    assert typ == "TIMESTAMP"  # naive, tz-setting-independent
    (ny_ts,) = con2.execute(
        f"SELECT ts FROM read_parquet({files!r}) WHERE user_id = 1"
    ).fetchone()
    assert ny_ts.isoformat(sep=" ") == spark_rows[1][0]


def test_ntz_and_bigint_branches_agree_on_ts_ns(spark, tmp_path):
    """The three physical layouts (tz-adjusted micros, NTZ micros, raw
    ns longs) must all derive the SAME (ts, ts_ns) for the same
    instants — loader equivalence across testdata generations."""
    _write_tz_adjusted_events(spark, str(tmp_path / "adj"))
    adj = {
        r["user_id"]: (r["ts"], r["ts_ns"])
        for r in load_table(spark, str(tmp_path / "adj"), "events").collect()
    }
    # NTZ branch: same wall-clock written as timestamp_ntz
    values = ", ".join(f"(timestamp_ntz'{ts}', {u})" for ts, u in _ROWS)
    spark.sql(f"SELECT * FROM VALUES {values} AS t(ts, user_id)").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/ntz/events.parquet")
    ntz = {
        r["user_id"]: (r["ts"], r["ts_ns"])
        for r in load_table(spark, str(tmp_path / "ntz"), "events").collect()
    }
    assert ntz == adj
    # bigint branch: the same instants as raw epoch nanoseconds
    ns_rows = ", ".join(f"({v}, {u})" for u, (_, v) in sorted(adj.items()))
    spark.sql(f"SELECT * FROM VALUES {ns_rows} AS t(ts, user_id)").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/ns/events.parquet")
    raw = {
        r["user_id"]: (r["ts"], r["ts_ns"])
        for r in load_table(spark, str(tmp_path / "ns"), "events").collect()
    }
    assert raw == adj
