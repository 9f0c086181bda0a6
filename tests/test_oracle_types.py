"""Cross-engine OUTPUT-TYPE contract for the oracle gate (round 8).

Root cause of the r5-r7 driver hash-reds (monthly_sales_retract,
revenue_cusum_changepoint): their oracles were the only gated
entries with an INT128-backed output column — DuckDB widens
``sum(int)`` to HUGEINT and backs DECIMAL(p>18) with INT128, and
DuckDB's pandas/arrow fetch converts BOTH to float64, while the
``fetchall()`` path every local replica used yields exact Python
ints/Decimals. Under a str-canonicalizing comparator
(GATE_ENV.json: ``other_compare: str(v)``) that is
``'74' != '74.0'`` — reproducible ONLY through the pandas fetch,
which is why three rounds of sf0.01/sf0.1/hostile-shuffle/
hostile-TZ local replicas stayed green while the driver stayed red.

Contract enforced here, both engines:
- no oracle output column may be HUGEINT or DECIMAL (any precision)
  — big exact integers travel as BIGINT when they provably fit,
  else as digit STRINGS (identical rendering in both engines);
- no Spark query may return a DecimalType column.

DATE/TIMESTAMP outputs are allowed: entries carrying them
(shipping_priority_orders, events_unpivot_daily, events_hourly, ...)
have multi-round driver-green history, so the driver's canonicalizer
demonstrably handles them.

Round-9 update: the r8 driver run came back hash-RED on
``int128_fetch_probe`` exactly as the theory predicted (with both
fixed parents green), so the mechanism is CONFIRMED and the probe's
catalog oracle is re-armed as an all-BIGINT green contract — there
are no exemptions left; the deliberate-HUGEINT positive control
lives here as a non-catalog SQL twin
(``test_pandas_fetch_emulation_still_detects_int128``).
"""

from __future__ import annotations

import duckdb
import pytest

from simpleetlpipeline_spark.plans.catalog import ORACLE_SQL, QUERIES

#: Round-8 carried one documented exemption (the deliberate-HUGEINT
#: int128_fetch_probe); with the fetch theory confirmed the probe is
#: re-armed green and the set is empty — kept so any future
#: diagnostic must be added HERE, visibly, to violate the contract.
EXEMPT: set[str] = set()

#: The round-8 probe oracle, verbatim: one BIGINT column and one
#: HUGEINT column with identical values. No catalog entry may carry
#: this anymore; it persists as the positive control proving the
#: pandas-fetch emulation still detects the INT128->float64 class.
HUGEINT_CONTROL_SQL = """
    SELECT CAST(sum(1) AS BIGINT) AS n_bigint,
           sum(1) AS n_int128
    FROM nation
"""


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    yield con
    con.close()


def test_no_int128_backed_oracle_outputs(duck):
    """Every oracle's result types must survive DuckDB's pandas
    fetch losslessly: HUGEINT and DECIMAL columns float-convert
    there (the r5-r7 driver-red mechanism) and are banned."""
    offenders = {}
    for name, sql in ORACLE_SQL.items():
        if name in EXEMPT:
            continue
        rel = duck.sql(sql)
        bad = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
               if str(t) == "HUGEINT" or str(t).startswith("DECIMAL")]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"INT128-backed oracle outputs (float64 under pandas fetch, "
        f"the r5-r7 driver-red class): {offenders} — CAST to BIGINT "
        f"if it provably fits, else to VARCHAR digit strings on both "
        f"sides")


def test_probe_re_armed_green(duck):
    """The re-armed probe's catalog oracle must be all-BIGINT (the
    green contract), and the non-catalog HUGEINT control must still
    be a genuine probe — one BIGINT, one HUGEINT, equal values."""
    rel = duck.sql(ORACLE_SQL["int128_fetch_probe"])
    types = {c: str(t) for c, t in zip(rel.columns, rel.types)}
    assert types == {"n_bigint": "BIGINT", "n_int128": "BIGINT"}
    ctl = duck.sql(HUGEINT_CONTROL_SQL)
    ctypes = {c: str(t) for c, t in zip(ctl.columns, ctl.types)}
    assert ctypes == {"n_bigint": "BIGINT", "n_int128": "HUGEINT"}
    row = ctl.fetchall()[0]
    assert row[0] == row[1] == 25


def test_no_decimal_outputs_in_spark_schemas(spark, sf_dir):
    """The Spark twin of the oracle-side ban: a DecimalType output
    collects as decimal.Decimal, whose str rendering can disagree
    with whatever the oracle's engine fetched (float64 '.0'
    suffixes, exponent reprs). Exact big integers leave the engine
    as long or as digit strings."""
    from pyspark.sql.types import DecimalType

    skip = {"etl_pipeline_run", "user_erasure_audit",
            "bpe_train_merges"}
    offenders = {}
    for name, fn in QUERIES.items():
        if name in skip or name.startswith("streaming_"):
            continue
        bad = [(f.name, f.dataType.simpleString())
               for f in fn(spark, sf_dir).schema.fields
               if isinstance(f.dataType, DecimalType)]
        if bad:
            offenders[name] = bad
    assert not offenders, f"DecimalType Spark outputs: {offenders}"


def test_pandas_fetch_emulation_still_detects_int128(spark, duck, sf_dir):
    """The dataframe-fetch emulation (the driver's evident path:
    Spark toPandas + DuckDB .df()) must (a) STILL flag the
    non-catalog HUGEINT control — proving the emulation actually
    exercises the INT128→float64 conversion — and (b) pass the
    re-armed probe plus every query the r8 fix touched, plus a
    nullable-int-output representative (hybrid_rrf_search) where
    BOTH engines float-convert symmetrically."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "check_oracle", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools", "check_oracle.py"))
    co = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(co)

    def compare(name, sql=None):
        sdf = QUERIES[name](spark, sf_dir)
        srows = co._frame_rows(sdf.toPandas())
        ddf = duck.execute(sql or ORACLE_SQL[name]).df()
        drows = co._frame_rows(ddf)
        if len(srows) != len(drows):
            return False
        ns = co.normalize(srows, sdf.columns)
        nd = co.normalize(drows, list(ddf.columns))
        return all(
            len(rs) == len(rd)
            and all(co.values_equal(a, b) for a, b in zip(rs, rd))
            for rs, rd in zip(ns, nd))

    assert not compare("int128_fetch_probe", sql=HUGEINT_CONTROL_SQL), (
        "the HUGEINT control no longer diverges under dataframe "
        "fetch — the emulation went vacuous")
    for name in ("int128_fetch_probe",
                 "monthly_sales_retract", "revenue_cusum_changepoint",
                 "order_value_ks_drift", "calibration_reliability",
                 "order_value_equidepth", "retract_base_canary",
                 "retract_delta_canary", "cusum_daily_canary",
                 "hybrid_rrf_search"):
        assert compare(name), f"{name} diverges under dataframe fetch"


def test_no_timestamp_outputs_in_spark_schemas(spark, sf_dir):
    """Render-layer ban (round 10): pyspark collect() converts a
    TIMESTAMP output to a naive datetime via the PYTHON PROCESS
    timezone — independent of the pinned session timezone — while
    DuckDB fetches naive UTC, so any raw-timestamp output hash-reds
    the moment the harness process runs outside UTC (caught live by
    the round-10 hostile-TZ rung on events_dedup_batch). Publish
    raw epoch micros (unix_micros / epoch_us) or calendar labels
    derived via operators/dates.py instead. DATE outputs stay legal:
    both engines fetch them as calendar days with no tz conversion
    (multi-round driver-green history on DATE columns).

    Streaming entries are covered by tests/test_streaming.py (they
    execute a real stream per construction, too slow to rebuild
    here); the construction-side-effect trio is skipped as in the
    sibling bans."""
    from pyspark.sql.types import TimestampNTZType, TimestampType

    from simpleetlpipeline_spark.plans.catalog import QUERIES

    skip = {"etl_pipeline_run", "user_erasure_audit",
            "bpe_train_merges"}
    offenders = {}
    for name, fn in QUERIES.items():
        if name in skip or name.startswith("streaming_"):
            continue
        bad = [f.name for f in fn(spark, sf_dir).schema.fields
               if isinstance(f.dataType,
                             (TimestampType, TimestampNTZType))]
        if bad:
            offenders[name] = bad
    assert not offenders, f"raw TIMESTAMP outputs: {offenders}"
