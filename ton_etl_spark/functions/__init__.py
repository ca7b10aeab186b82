"""Scalar expression library (SURVEY.md §2.5) — pure Column
expressions where possible, pandas UDFs only for genuinely imperative
decodes (which live in cdc/parsers.py)."""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from ..cdc.parsers import debezium_int, unpack_zb64  # noqa: F401 (re-export)


def opcode_signed(op: Column) -> Column:
    """uint32 -> signed int32 (reference model/parser.py:76-78
    `opcode_signed`): values >= 2^31 wrap negative."""
    return F.when(op < 0x80000000, op).otherwise(op - 0x100000000)


def opcode_unsigned(op: Column) -> Column:
    return F.when(op >= 0, op).otherwise(op + 0x100000000)


def date_bucket(ts_seconds: Column) -> Column:
    """epoch seconds -> 'yyyyMMdd' partition string (reference
    converter.py:32-33, repartition.py:99)."""
    return F.date_format(F.from_unixtime(ts_seconds), "yyyyMMdd")


def content_sha256(c: Column) -> Column:
    """The per-row invariant hash (datalake/main.py:145-148)."""
    return F.sha2(c, 256)


def normalize_address(addr: Column) -> Column:
    """Deterministic address canonicalization (analogue of the TON
    user-friendly <-> raw form, model/parser.py:83-85; our synthetic
    addresses are '<wc>:<hex>' or 'raw/<wc>/<hex>'): normalize to
    upper-hex '<wc>:<HEX>'."""
    wc = F.regexp_extract(addr, r"^(?:raw/)?(-?\d+)[:/]", 1)
    hexpart = F.upper(F.regexp_extract(addr, r"[:/]([0-9a-fA-F]+)$", 1))
    return F.when(
        (wc != "") & (hexpart != ""), F.concat(wc, F.lit(":"), hexpart)
    ).otherwise(F.upper(addr))
