"""Per-event-type vectorized parsers (Arrow pandas UDFs).

The reference dispatches each JSON change event to row-at-a-time Python
parsers that decode a binary BOC payload field-by-field (model/parser.py
:100-102, e.g. parsers/message/stonfi_swap.py:24-45). Here each event
type gets ONE vectorized decode over Arrow batches:

  * JSON envelope decode stays JVM-side (`from_json` — no Python at all);
  * the binary-ish payload parts (zlib+base64 content, Debezium-encoded
    decimals, converter.py:38-44 / utils.py:8-9) are pandas UDFs: Python
    executes once per Arrow batch, not once per row;
  * per-row failures yield NULL instead of failing the batch — the
    NonCriticalParserError contract (model/parser.py:25-71): bad rows are
    filtered and counted, the stream continues.
"""

from __future__ import annotations

import base64
import zlib

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

from ..schemas import SCHEMA_CHANGE_PAYLOAD

# payload schema accepts both pre- and post-rename field names — the
# column-rename schema_change flips which one is populated
_UPSERT_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("language", T.StringType()),
        T.StructField("content_z", T.StringType()),
        T.StructField("size_scale", T.IntegerType()),
        T.StructField("size_value", T.StringType()),
        T.StructField("stars", T.LongType()),
    ]
)


@F.pandas_udf(T.StringType())
def _unpack_zb64(s: pd.Series) -> pd.Series:
    """zlib+base64 packed text -> text; None on any per-row failure."""

    def one(v):
        if v is None:
            return None
        try:
            return zlib.decompress(base64.b64decode(v)).decode()
        except Exception:
            return None

    return s.map(one)


# marked nondeterministic ON PURPOSE (it is pure): it stops Catalyst
# from duplicating the decode into pushed-down filter stages — the
# `_malformed` filter would otherwise re-evaluate the whole decode a
# second time for every row (observed 2x decode cost in the plan).
unpack_zb64 = _unpack_zb64.asNondeterministic()


@F.pandas_udf(T.LongType())
def debezium_int(value_b64: pd.Series, scale: pd.Series) -> pd.Series:
    """Debezium variable-scale decimal {scale, value: b64 two's-complement
    bigint} -> integer value (reference converter.py:38-44, utils.py:8-9)."""

    def one(v, sc):
        if v is None or sc is None:
            return None
        try:
            unscaled = int.from_bytes(base64.b64decode(v), "big", signed=True)
            out = unscaled // (10 ** int(sc))
            # NonCritical contract: a value outside int64 must not kill
            # the Arrow batch — null it (callers needing 2^120-range
            # amounts use DecimalType(38,0) columns instead)
            if not (-(2**63) <= out < 2**63):
                return None
            return out
        except Exception:
            return None

    return pd.Series([one(v, sc) for v, sc in zip(value_b64, scale)])


@F.pandas_udf(T.DecimalType(38, 0))
def debezium_decimal(value_b64: pd.Series, scale: pd.Series) -> pd.Series:
    """Debezium decimal decode preserving the FULL unbounded-amount
    range: {scale, value: b64 two's-complement bigint} ->
    DecimalType(38,0). The reference stores token amounts up to 2^120 as
    `decimal(38,0)` (athena_ddl.sql:84,332-338); `debezium_int` nulls
    anything outside int64, this kernel does not."""
    import decimal

    def one(v, sc):
        if v is None or sc is None:
            return None
        try:
            unscaled = int.from_bytes(base64.b64decode(v), "big", signed=True)
            out = unscaled // (10 ** int(sc))
            if abs(out) >= 10**38:  # NonCritical: outside decimal(38,0)
                return None
            return decimal.Decimal(out)
        except Exception:
            return None

    return pd.Series([one(v, sc) for v, sc in zip(value_b64, scale)])


@F.pandas_udf(T.DoubleType())
def debezium_double(value_b64: pd.Series, scale: pd.Series) -> pd.Series:
    """Debezium decimal -> double (for ratio-like fields where float
    precision suffices, e.g. prices — reference utils.py:8-9 divides by
    10**scale)."""

    def one(v, sc):
        if v is None or sc is None:
            return None
        try:
            unscaled = int.from_bytes(base64.b64decode(v), "big", signed=True)
            return float(unscaled) / (10 ** int(sc))
        except Exception:
            return None

    return pd.Series([one(v, sc) for v, sc in zip(value_b64, scale)])


@F.pandas_udf(T.StringType())
def pack_zb64(s: pd.Series) -> pd.Series:
    """Inverse of unpack_zb64 (test/fixture helper: build wire-format
    payloads inside a plan so decode oracles are roundtrip-identities)."""

    def one(v):
        if v is None:
            return None
        return base64.b64encode(zlib.compress(v.encode(), 1)).decode()

    return s.map(one)


def csv_struct(col: Column, field_names: list[str]) -> Column:
    """CSV string -> named struct (P6 — the reference builds a 6-field
    `sources` record by splitting a comma-joined string,
    datalake/converters/jetton_metadata.py:26-35). Pure column
    expression: split + element_at + struct, zero Python."""
    parts = F.split(col, ",")
    # F.get (not element_at): null on missing trailing fields instead of
    # an ANSI out-of-bounds error — the NonCritical contract
    return F.struct(
        *[F.get(parts, i).alias(name) for i, name in enumerate(field_names)]
    )


def sha256_col(c: Column) -> Column:
    """Row invariant: sha2 over content (datalake/main.py:145-148 uses
    sha256 for content-addressed files; our per-row parity hash)."""
    return F.sha2(c, 256)


def parse_file_upserts(events: DataFrame, lang_col_name: str = "lang") -> DataFrame:
    """file_upsert events -> update rows (repo, path, lsn, op, commit,
    <lang_col_name>, content, size_bytes, stars, _malformed)."""
    p = F.from_json("payload", _UPSERT_WIRE_SCHEMA)
    # two nested selects (still ONE driver analysis each, no withColumn
    # chain): the inner one evaluates the decode UDF exactly once; the
    # outer derives _malformed from the materialized column. Because the
    # UDF is marked nondeterministic, CollapseProject will NOT inline it
    # back into two evaluations.
    decoded = events.select(
        "repo",
        "path",
        "lsn",
        "ts_ms",
        "op",
        p.getField("commit").alias("commit"),
        F.coalesce(p.getField("language"), p.getField("lang")).alias(lang_col_name),
        unpack_zb64(p.getField("content_z")).alias("content"),
        debezium_int(p.getField("size_value"), p.getField("size_scale")).alias(
            "size_bytes"
        ),
        p.getField("stars").alias("stars"),
        p.isNull().alias("_bad_json"),
    )
    return decoded.select(
        "repo", "path", "lsn", "ts_ms", "op", "commit", lang_col_name, "content",
        "size_bytes", "stars",
        (F.col("_bad_json") | F.col("content").isNull()).alias("_malformed"),
    )


def parse_file_deletes(events: DataFrame) -> DataFrame:
    return events.select(
        "repo", "path", "lsn", F.lit("d").alias("op")
    )


def parse_schema_changes(events: DataFrame) -> DataFrame:
    p = events.withColumn("_p", F.from_json("payload", SCHEMA_CHANGE_PAYLOAD))
    return p.select("lsn", "_p.action", "_p.name", "_p.new_name", "_p.type")


def parse_renames(events: DataFrame) -> DataFrame:
    return events.select(
        "repo",
        "path",
        "lsn",
        F.get_json_object("payload", "$.new_path").alias("new_path"),
    )
