"""Structured Streaming operators (SURVEY.md §2.8 disposition).

The reference's 'real-time monitoring' is batch SQL over a metadata
table with a 24h predicate (main.py:814-872). The idiomatic Spark
upgrade is Structured Streaming over the events table: file source →
watermarked window aggregation → sink. Catalog entries run the
stream to completion with trigger(availableNow) into a memory sink,
so the same code path is (a) driveable by the correctness oracle
against batch SQL and (b) deployable unchanged against a live file /
Kafka source.
"""
