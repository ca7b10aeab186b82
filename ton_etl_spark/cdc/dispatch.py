"""Parser dispatch registry — the pluggable-operator API.

Mirrors the reference's `Parser` base class contract (model/parser.py:
48-71: `topics()`, `predicate(obj)`, `handle_internal`) and its static
registry (parsers/__init__.py:35-103), re-expressed declaratively: an
event type maps to a predicate Column plus a vectorized parse function
`DataFrame -> DataFrame` producing standard update rows. The runtime
subset is selectable (SUPPORTED_PARSERS analogue, parser/main.py:21,44).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame, functions as F


@dataclass
class ParserSpec:
    event_type: str                                  # topic analogue
    predicate: Column | None                         # cheap pre-filter
    parse: Callable[[DataFrame], DataFrame]          # vectorized decode
    kind: str = "upsert"                             # upsert|delete|rename|ddl


class ParserRegistry:
    def __init__(self) -> None:
        self._specs: dict[str, ParserSpec] = {}

    def register(self, spec: ParserSpec) -> None:
        self._specs[spec.event_type] = spec

    def get(self, event_type: str) -> ParserSpec | None:
        return self._specs.get(event_type)

    def specs(self, only: set[str] | None = None) -> list[ParserSpec]:
        return [
            s for et, s in self._specs.items() if only is None or et in only
        ]

    def route(self, events: DataFrame, spec: ParserSpec) -> DataFrame:
        """Topic routing + predicate filter, then the vectorized parse —
        the filter runs before the UDF barrier so Catalyst prunes early
        (reference runs predicate(obj) before handle_internal)."""
        df = events.filter(F.col("event_type") == spec.event_type)
        if spec.predicate is not None:
            df = df.filter(spec.predicate)
        return spec.parse(df)


def default_registry(lang_col_name: str = "lang") -> ParserRegistry:
    from . import parsers as P

    reg = ParserRegistry()
    reg.register(
        ParserSpec(
            "file_upsert",
            predicate=F.col("op").isin("c", "r", "u"),  # op filter F4
            parse=lambda df: P.parse_file_upserts(df, lang_col_name),
            kind="upsert",
        )
    )
    reg.register(
        ParserSpec("file_delete", predicate=None, parse=P.parse_file_deletes, kind="delete")
    )
    reg.register(
        ParserSpec("file_rename", predicate=None, parse=P.parse_renames, kind="rename")
    )
    reg.register(
        ParserSpec("schema_change", predicate=None, parse=P.parse_schema_changes, kind="ddl")
    )
    return reg
