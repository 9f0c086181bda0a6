"""Timezone-independent calendar bucketing over TIMESTAMP columns.

Why this module exists (the round-6 driver-red diagnosis): the
testdata parquet stores timestamps as INT64 micros with
isAdjustedToUTC=false. Depending on reader conf, Spark surfaces the
column as TIMESTAMP_NTZ (naive) or TIMESTAMP_LTZ (instant), and
every calendar-rendering expression over an LTZ column —
``to_date``, ``date_format``, ``date_trunc``, ``year``, ``hour`` —
resolves ``spark.sql.session.timeZone`` at ANALYSIS time. A harness
whose session timezone is not UTC when it builds the plan (or whose
DuckDB reads the column tz-aware and renders in host timezone)
shifts every midnight-UTC instant into the adjacent day: the gate
recorded exactly that signature in rounds 5-6 (the only red queries
were the only ones emitting absolute calendar positions; raw
``unix_micros`` outputs and day-difference statistics stayed green).

The cure is to never let a timezone-dependent code path touch the
data. Both engines provably agree on the RAW stored micros
(``unix_micros`` / ``epoch_us`` — attested green by
``table_stats_profile``), so every calendar bucket here derives from
those micros with pure integer division and proleptic-Gregorian DATE
arithmetic, which carries no timezone semantics in either engine:

===============  ============================================  ==========================================
helper           Spark expression                               DuckDB oracle twin
===============  ============================================  ==========================================
epoch_day        ``unix_micros(ts) div 86400000000``            ``epoch_us(ts) // 86400000000``
epoch_date       ``date_from_unix_date(epoch_day)``             ``DATE '1970-01-01' + CAST(... AS INT)``
month_label      ``substring(cast(epoch_date as string),1,7)``  ``substr(CAST(... AS VARCHAR), 1, 7)``
day_label        ``cast(epoch_date as string)``                 ``CAST(... AS VARCHAR)``
year_of          ``year(epoch_date)``                           ``year(DATE ...)``
month_start      ``trunc(epoch_date, 'month')``                 ``date_trunc('month', DATE ...)``
week_start       ``date_from_unix_date(day - pmod(day+3, 7))``  ``DATE '1970-01-01' + (d - (d+3) % 7)``
hour_of          ``pmod(epoch_day_micros div 3600000000, 24)``  ``(epoch_us(ts) // 3600000000) % 24``
hour_bucket      ``unix_micros(ts) div 3600000000``             ``epoch_us(ts) // 3600000000``
===============  ============================================  ==========================================

``year``/``month``/``trunc`` on a DATE input and ``cast(DATE as
string)`` are pure day-count -> civil-calendar conversions in Spark
(no timezone parameter in the expression tree), and ``strftime`` /
``CAST .. AS VARCHAR`` on a DuckDB DATE likewise. ``date_format`` is
deliberately NOT used anywhere here, even on DATE inputs, so the
plan contract test can assert the absence of every tz-parameterised
expression class over these paths.

Exactness note: ``unix_micros`` stays below 2**53 until the year
2255 and all testdata is 1992+, i.e. non-negative, so Spark ``div``
and DuckDB ``//`` agree (both truncate); the helpers use SQL ``div``
via ``F.expr`` on named columns and the exact
``(a - pmod(a, b)) / b`` spelling (dividend made an exact multiple
first, so the double quotient is the exact integer) when handed a
Column object.

Reference parity: the reference renders month buckets with SQLite
``strftime('%Y-%m', order_date)`` over TEXT dates (main.py:478) —
naive calendar semantics, which is exactly what these helpers pin.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Micros per day / per hour — the only constants in the idiom.
DAY_US = 86_400_000_000
HOUR_US = 3_600_000_000


def _micros(col: Column | str) -> Column:
    """Raw stored micros-since-epoch of a timestamp column.

    TZ-free on LTZ inputs (reads the stored instant); on NTZ inputs
    Spark defines unix_micros via an implicit cast, which our
    sessions never produce (io.read_table pins
    spark.sql.parquet.inferTimestampNTZ.enabled=false).
    """
    return F.unix_micros(F.col(col) if isinstance(col, str) else col)


def _exact_div(num: Column, divisor: int) -> Column:
    """Truncating integer division without a tz- or float-hazard.

    ``(a - pmod(a, b)) / b``: the dividend is an exact multiple of b
    and both operands stay within 2**53, so the IEEE quotient IS the
    exact integer (see module docstring). Matches SQL ``div`` and
    DuckDB ``//`` for the non-negative micros this engine feeds it.
    """
    return ((num - F.pmod(num, F.lit(divisor))) / F.lit(divisor)).cast("long")


def epoch_day(col: Column | str) -> Column:
    """Days since 1970-01-01 (long) from raw micros. Oracle twin:
    ``epoch_us(ts) // 86400000000``."""
    return _exact_div(_micros(col), DAY_US)


def epoch_date(col: Column | str) -> Column:
    """The timestamp's UTC-naive calendar DATE, built by pure day
    arithmetic (``date_from_unix_date``), never by a tz-cast.
    Oracle twin: ``DATE '1970-01-01' + CAST(epoch_us(ts) //
    86400000000 AS INTEGER)``."""
    return F.date_from_unix_date(epoch_day(col).cast("int"))


def day_label(col: Column | str) -> Column:
    """'yyyy-MM-dd' string; DATE->STRING cast is pure ISO rendering.
    Oracle twin: ``CAST(<epoch_date> AS VARCHAR)``."""
    return epoch_date(col).cast("string")


def month_label(col: Column | str) -> Column:
    """'yyyy-MM' string via substring of the ISO date rendering —
    replaces ``date_format(ts, 'yyyy-MM')``. Oracle twin:
    ``substr(CAST(<epoch_date> AS VARCHAR), 1, 7)`` (or DuckDB's
    naive ``strftime``, identical on naive reads).

    PERFORMANCE CONTRACT: per-row string building costs real CPU on
    fact-sized frames (measured 10.4s vs 5.7s on the sf1
    lineitem⋈orders latency rollup). In a hot path, group by
    ``month_start()`` (pure DATE arithmetic) and render the label on
    the AGGREGATED frame via ``label_of_month_start`` — this helper
    belongs on row-tier data only when the label itself is the
    per-row output."""
    return F.substring(day_label(col), 1, 7)


def label_of_month_start(col: Column | str) -> Column:
    """'yyyy-MM' from an already-computed month_start/epoch_date DATE
    column — the post-aggregation label step of the hot-path pattern
    documented on month_label. Oracle twin: ``substr(CAST(<date> AS
    VARCHAR), 1, 7)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c.cast("string"), 1, 7)


def year_of(col: Column | str) -> Column:
    """Calendar year (int); ``year`` over a DATE input carries no
    timezone parameter. Oracle twin: ``year(<epoch_date>)`` or naive
    ``year(ts)``."""
    return F.year(epoch_date(col))


def month_start(col: Column | str) -> Column:
    """First day of the timestamp's month as a DATE (replaces
    ``date_trunc('month', ts)``). Oracle twin:
    ``date_trunc('month', <epoch_date>)``."""
    return F.trunc(epoch_date(col), "month")


def week_start(col: Column | str) -> Column:
    """Monday-of-week DATE (ISO truncation, replaces
    ``date_trunc('week', ts)``): 1970-01-01 was a Thursday, so
    ``day - pmod(day + 3, 7)`` lands on the preceding Monday.
    Oracle twin: ``DATE '1970-01-01' + CAST(d - (d + 3) % 7 AS
    INTEGER)`` with ``d = epoch_us(ts) // 86400000000``."""
    d = epoch_day(col)
    return F.date_from_unix_date((d - F.pmod(d + 3, F.lit(7))).cast("int"))


def hour_of(col: Column | str) -> Column:
    """Hour-of-day 0..23 (int) in the naive-UTC calendar (replaces
    ``hour(ts)``). Oracle twin: ``(epoch_us(ts) // 3600000000) %
    24``."""
    return F.pmod(_exact_div(_micros(col), HOUR_US), F.lit(24)).cast("int")


def epoch_second(col: Column | str) -> Column:
    """Whole seconds since epoch (long) — same value as
    ``unix_timestamp(ts)`` on TIMESTAMP input, but via the pure
    micros path (unix_timestamp's signature is tz-parameterised for
    its string-parsing overload, so the plan-contract test bans it
    wholesale). Oracle twin: ``epoch_us(ts) // 1000000`` or
    ``floor(epoch(ts))``."""
    return _exact_div(_micros(col), 1_000_000)


def hour_bucket(col: Column | str) -> Column:
    """Hours since epoch (long) — an absolute hour bucket id
    (replaces ``date_trunc('hour', ts)`` as a grouping key). Oracle
    twin: ``epoch_us(ts) // 3600000000``."""
    return _exact_div(_micros(col), HOUR_US)


def iso_second_label(col: Column | str) -> Column:
    """'yyyy-MM-ddTHH:mm:ss' string from raw micros — the pure
    replacement for ``date_format(ts, "yyyy-MM-dd'T'HH:mm:ss")``
    (fixture writers that must render wall-clock text). Oracle twin:
    ``strftime(ts, '%Y-%m-%dT%H:%M:%S')`` on a naive read."""
    us = _micros(col)

    def two(n: Column) -> Column:
        return F.lpad(n.cast("string"), 2, "0")

    return F.concat(
        day_label(col), F.lit("T"),
        two(F.pmod(_exact_div(us, HOUR_US), F.lit(24))), F.lit(":"),
        two(F.pmod(_exact_div(us, 60_000_000), F.lit(60))), F.lit(":"),
        two(F.pmod(_exact_div(us, 1_000_000), F.lit(60))))


def day_lit(date_str: str) -> int:
    """Epoch-day number of an ISO date string, computed driver-side
    (plain Python) — for comparisons against epoch_day(col)."""
    return (_dt.date.fromisoformat(date_str) - _dt.date(1970, 1, 1)).days


def ts_lit(date_str: str) -> Column:
    """Timestamp literal at UTC midnight of ``date_str``, built from
    raw micros (``timestamp_micros`` — no string->timestamp cast, so
    no session-timezone parse at analysis time). Constant-folded by
    Catalyst, so range predicates on timestamp columns still reach
    the parquet scan as pushed filters (asserted by
    tests/test_plans.py). A bare string comparand
    (``F.col("ts") > "1997-01-01"``) instead parses the literal in
    the session timezone: under an eastern-offset analysis timezone
    the cutoff instant moves BEFORE the stored midnight instants and
    the predicate admits an extra day of rows.

    DuckDB oracle twin: ``TIMESTAMP '<date_str>'`` (naive) — equal
    to this instant whenever the engines agree on raw micros, which
    the date_axis_canary attests.
    """
    return F.timestamp_micros(F.lit(day_lit(date_str) * DAY_US))


# --- DuckDB oracle-side spellings (f-string fragments) -------------

def sql_epoch_day(col: str) -> str:
    return f"(epoch_us({col}) // {DAY_US})"


def sql_epoch_date(col: str) -> str:
    return f"(DATE '1970-01-01' + CAST({sql_epoch_day(col)} AS INTEGER))"


def sql_day_label(col: str) -> str:
    return f"CAST({sql_epoch_date(col)} AS VARCHAR)"


def sql_month_label(col: str) -> str:
    return f"substr({sql_day_label(col)}, 1, 7)"


def sql_month_start(col: str) -> str:
    return f"date_trunc('month', {sql_epoch_date(col)})"


def sql_year_of(col: str) -> str:
    return f"year({sql_epoch_date(col)})"


def sql_week_start(col: str) -> str:
    d = sql_epoch_day(col)
    return f"(DATE '1970-01-01' + CAST({d} - ({d} + 3) % 7 AS INTEGER))"


def sql_hour_of(col: str) -> str:
    return f"CAST((epoch_us({col}) // {HOUR_US}) % 24 AS INTEGER)"


def sql_hour_bucket(col: str) -> str:
    return f"(epoch_us({col}) // {HOUR_US})"
