"""Ingest: per-collection parser transforms (the reference's UDF surface).

Each reference parser's ``process_data(timestamp, data, source)`` row-mangling
becomes a vectorized DataFrame transform: raw measurement rows in, stream
properties + fact rows out.  Everything runs JVM-side via built-in
``pyspark.sql.functions`` (no Python UDFs in the hot path); the exact
semantics (integer-truncated medians, None-padded rtt arrays, tri-state
lossrates) are encoded as column expressions and pinned by the unit tests in
``tests/test_ingest.py`` which mirror the reference's parser test goldens.
"""
