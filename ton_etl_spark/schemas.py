"""Canonical schemas of the CDC engine.

The change-event envelope mirrors the Debezium `ExtractNewRecordState`
envelope the reference consumes (`__op`, `__table`, `__lsn`,
`__source_ts_ms` — reference parser/main.py:68-71, datalake/main.py:48),
flattened into real columns instead of dunder JSON keys.

The subject table is the source-code `repos` table from BASELINE.json
`input_hint`: (repo, path, commit, lang, content) keyed by (repo, path),
LWW-ordered by `lsn` — the exact analogue of the reference's
`latest_account_states` keyed by account and guarded by
`last_trans_lt` (reference db.py:249-269).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# change-event envelope (bronze)
# ---------------------------------------------------------------------------

# op codes follow Debezium: c=create, r=snapshot read, u=update, d=delete
OPS = ("c", "r", "u", "d")

# ties on equal LSN are impossible for distinct events (LSN unique) but the
# rank makes the merge comparator total and deterministic anyway
OP_RANK = {"r": 0, "c": 1, "u": 2, "d": 3}

CHANGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),      # __lsn analogue
        T.StructField("ts_ms", T.LongType(), True),     # __source_ts_ms
        T.StructField("op", T.StringType(), False),     # __op
        T.StructField("event_type", T.StringType(), False),  # __table/topic
        T.StructField("repo", T.StringType(), True),
        T.StructField("path", T.StringType(), True),
        T.StructField("payload", T.StringType(), True),  # JSON body (body_boc analogue)
    ]
)

# ---------------------------------------------------------------------------
# subject lake table (silver)
# ---------------------------------------------------------------------------

REPOS_KEY_FIELDS = ["repo", "path"]
REPOS_VERSION_FIELD = "lsn"

# initial schema — schema_change events later add `stars`, widen
# `size_bytes` int->long, and rename `lang`->`language`
REPOS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("lsn", T.LongType(), False),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("size_bytes", T.IntegerType(), True),
    ]
)

# payload schema of file_upsert events (decoded by the vectorized parser)
FILE_UPSERT_PAYLOAD = T.StructType(
    [
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        # zlib+base64-packed content — the BOC-cell analogue, decoded by a
        # pandas UDF (reference decodes BOC via pytoniq, SURVEY.md §2.5 E3)
        T.StructField("content_z", T.StringType(), True),
        # Debezium-style encoded decimal {scale, value b64} for size_bytes
        T.StructField("size_scale", T.IntegerType(), True),
        T.StructField("size_value", T.StringType(), True),
        T.StructField("stars", T.LongType(), True),
    ]
)

FILE_RENAME_PAYLOAD = T.StructType(
    [
        T.StructField("new_path", T.StringType(), True),
    ]
)

SCHEMA_CHANGE_PAYLOAD = T.StructType(
    [
        T.StructField("action", T.StringType(), True),   # add|rename|widen
        T.StructField("name", T.StringType(), True),
        T.StructField("new_name", T.StringType(), True),
        T.StructField("type", T.StringType(), True),     # spark simpleString
    ]
)


def spark_type_from_string(s: str) -> T.DataType:
    """Parse a type name as stored in lake manifests / schema_change events."""
    return T.StructType.fromDDL(f"x {s}")[0].dataType


def type_to_string(dt: T.DataType) -> str:
    return dt.simpleString()
