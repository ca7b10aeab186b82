"""Single-threaded Python oracle reducer.

Applies the change-event log strictly in LSN order (deduped by LSN) with
the same replay / LWW / delete / rename / schema-evolution rules as the
engine, producing the expected final table state. The engine's lake
table must match row-for-row with per-row sha256(content) equality
(BASELINE.json metric), independent of batching and parallelism.
"""

from __future__ import annotations

import base64
import hashlib
import json
import zlib


def _decode_upsert(payload: str) -> dict | None:
    """Mirror of the engine's vectorized payload decode; None = malformed
    (NonCritical per-row skip, reference model/parser.py:25-71)."""
    try:
        obj = json.loads(payload)
        content = zlib.decompress(base64.b64decode(obj["content_z"])).decode()
        unscaled = int.from_bytes(
            base64.b64decode(obj["size_value"]), "big", signed=True
        )
        size = unscaled // (10 ** obj["size_scale"])
        return {
            "commit": obj.get("commit"),
            "lang": obj.get("language", obj.get("lang")),
            "content": content,
            "size_bytes": size,
            "stars": obj.get("stars"),
        }
    except Exception:
        return None


def reduce_events(events) -> tuple[dict, list[str]]:
    """events: iterable of dicts with lsn/op/event_type/repo/path/payload
    (any arrival order). Returns (final_state, columns) where final_state
    maps (repo, path) -> row dict over `columns`.
    """
    ordered = {}
    for e in events:  # dedup by lsn (at-least-once delivery)
        ordered.setdefault(e["lsn"], e)

    cols = ["repo", "path", "lsn", "commit", "lang", "content", "size_bytes"]
    renames: dict[str, str] = {}
    state: dict[tuple[str, str], dict] = {}

    for lsn in sorted(ordered):
        e = ordered[lsn]
        et = e["event_type"]
        if et == "schema_change":
            ddl = json.loads(e["payload"])
            if ddl["action"] == "add" and ddl["name"] not in cols:
                cols.append(ddl["name"])
                for row in state.values():
                    row.setdefault(ddl["name"], None)
            elif ddl["action"] == "rename":
                old, new = ddl["name"], ddl["new_name"]
                if old in cols:
                    cols[cols.index(old)] = new
                    renames[old] = new
                    for row in state.values():
                        row[new] = row.pop(old, None)
            # widen: value-space only, nothing to do in Python
            continue

        key = (e["repo"], e["path"])
        if et == "file_delete":
            state.pop(key, None)
        elif et == "file_rename":
            if key in state:
                row = state.pop(key)
                new_path = json.loads(e["payload"])["new_path"]
                row = dict(row, path=new_path, lsn=lsn)
                state[(e["repo"], new_path)] = row
            # else: old key unknown -> skip (NonCritical)
        elif et == "file_upsert":
            decoded = _decode_upsert(e["payload"])
            if decoded is None:
                continue
            row = {"repo": e["repo"], "path": e["path"], "lsn": lsn}
            for k, v in decoded.items():
                name = renames.get(k, k)
                if name in cols:
                    row[name] = v
            for c in cols:
                row.setdefault(c, None)
            state[key] = row
    return state, cols


def state_hashes(state: dict, cols: list[str]) -> dict[tuple[str, str], tuple]:
    """(repo, path) -> (lsn, sha256(content), other column values) for
    comparison against the lake table."""
    out = {}
    for key, row in state.items():
        content = row.get("content")
        sha = hashlib.sha256(content.encode()).hexdigest() if content is not None else None
        rest = tuple(
            row.get(c) for c in cols if c not in ("repo", "path", "content")
        )
        out[key] = (sha, rest)
    return out
