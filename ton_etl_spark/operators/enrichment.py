"""E8: pluggable enrichment stage with a fallback-resolver chain.

The reference enriches decoded rows by fetching off-chain metadata over
HTTP with a fallback chain and retries — IPFS gateway, then tonapi,
with per-source timeouts (jetton_masters/jetton_metadata.py:39-65,
164-212; nft_items/nft_item_metadata.py:40-70). External I/O is out of
scope here, but the PATTERN is not: a `mapInPandas` stage that runs a
prioritized list of resolvers per row, takes the first success, retries
transient failures, and degrades NonCritically (row survives with null
enrichment + the error recorded) — exactly the shape you would deploy
on a cluster with real HTTP resolvers plugged in.

Design notes for the 100 TB path:
  * enrichment is a barrier stage over Arrow batches; resolvers are
    called once per DISTINCT uri within the batch (memoized), the
    batch-local analogue of the reference's metadata cache;
  * batches are bounded by rows via kernel-side slicing (same policy as
    operators/multimodal.py) so a slow resolver can't hold a giant
    batch's memory;
  * the stage is pure w.r.t. its resolvers: with deterministic
    resolvers the output is replayable, which keeps the exactly-once
    story intact (real HTTP enrichment belongs in its own table, keyed
    by uri + fetch_time, merged like any other source).
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

Resolver = Callable[[str], dict | None]

ENRICHED_FIELDS = [
    T.StructField("enriched", T.StringType(), True),      # JSON document
    T.StructField("enrich_source", T.StringType(), True),  # which resolver won
    T.StructField("enrich_error", T.StringType(), True),   # last error if none
]


def offline_resolver(uri: str) -> dict | None:
    """Deterministic no-network stand-in: derives a metadata document
    from the uri itself. Replace with real HTTP fetchers in production
    (requests/aiohttp inside the worker — NOT on the driver)."""
    if not uri or "://" not in uri:
        return None
    scheme, rest = uri.split("://", 1)
    return {"name": rest.rsplit("/", 1)[-1] or rest, "source_scheme": scheme}


def flaky_stub(fail_prefixes: tuple[str, ...] = ("ipfs://broken",)):
    """Test helper: a resolver that raises for chosen prefixes
    (simulating gateway timeouts) and declines otherwise."""

    def resolve(uri: str) -> dict | None:
        if uri and uri.startswith(fail_prefixes):
            raise TimeoutError(f"simulated timeout for {uri}")
        return None

    return resolve


def enrich(
    df: DataFrame,
    uri_col: str,
    resolvers: list[tuple[str, Resolver]] | None = None,
    retries: int = 2,
    batch_rows: int = 1024,
) -> DataFrame:
    """Append enrichment columns by running the resolver chain per
    distinct uri. Output schema = input schema + (enriched,
    enrich_source, enrich_error)."""
    chain = resolvers or [("offline", offline_resolver)]
    out_schema = T.StructType(list(df.schema.fields) + ENRICHED_FIELDS)
    in_cols = [f.name for f in df.schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, tuple[str | None, str | None, str | None]] = {}

        def resolve_one(uri):
            if uri in memo:
                return memo[uri]
            doc = src = err = None
            for name, fn in chain:
                for attempt in range(retries + 1):
                    try:
                        got = fn(uri)
                    except Exception as e:  # transient -> retry, then next
                        err = f"{name}: {e}"
                        continue
                    if got is not None:
                        doc, src = json.dumps(got, sort_keys=True), name
                        err = None
                    break
                if doc is not None:
                    break
            memo[uri] = (doc, src, err)
            return memo[uri]

        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                sl = pdf.iloc[lo : lo + batch_rows].copy()
                res = sl[uri_col].map(resolve_one)
                sl["enriched"] = res.map(lambda t: t[0])
                sl["enrich_source"] = res.map(lambda t: t[1])
                sl["enrich_error"] = res.map(lambda t: t[2])
                yield sl[in_cols + ["enriched", "enrich_source", "enrich_error"]]

    return df.mapInPandas(run, out_schema)
