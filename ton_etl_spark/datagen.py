"""Deterministic synthetic change-event log generator.

Produces the bronze layer: a directory of parquet files holding
Debezium-style change events over the `repos` subject table
(FIXTURES.md §2), replicating the reference's failure modes
(SURVEY.md §2.11):

  * at-least-once duplicates (same LSN delivered twice);
  * bounded out-of-order arrival across keys (Kafka gives per-partition
    order only — reference T5); within a key, writes may also be locally
    reordered, which the LWW merge absorbs;
  * hot keys: a configurable set of (repo, path) keys carries a large
    share of all events (mega-account analogue, reference README.md:30-39);
  * schema_change events (add / widen / rename) at fixed points of the
    log; they are global arrival barriers, like the reference's
    masterchain-block group-commit barrier (datalake/streaming.py:98-106)
    — DDL is totally ordered in any real WAL;
  * rename events act as per-key barriers: all writes to the old key
    precede the rename in arrival order, and the old key retires
    afterwards (the reference's MIN_MATURITY_SECONDS race-avoidance
    contract, parser/main.py:60-63, made explicit);
  * malformed payloads on a fraction of rows (NonCriticalParserError
    contract, model/parser.py:25-71).

Everything is a pure function of (seed, params); `content_for()` is
shared with the oracle so per-row sha256 parity is checkable without
storing content twice.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import shutil
import zlib
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["py", "js", "go", "rs", "java", "md"]
LSN_STEP = 1
ARRIVAL_JITTER = 200.0  # max out-of-order distance (in lsn units)

# schema-evolution script: (fraction-of-log position, ddl payload)
DDL_SCRIPT = [
    (0.40, {"action": "add", "name": "stars", "type": "bigint"}),
    (0.55, {"action": "widen", "name": "size_bytes", "type": "bigint"}),
    (0.70, {"action": "rename", "name": "lang", "new_name": "language"}),
]


def _h(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def content_for(repo: str, path: str, lsn: int) -> str:
    """Deterministic pseudo-source content; a small fraction is huge
    (mega-value skew)."""
    h = _h(f"{repo}|{path}|{lsn}")
    n = (int(h[:4], 16) % 40) + 1
    if int(h[4:8], 16) % 1000 == 0:
        n = 2000
    head = f"// {repo}/{path} @ {lsn}\n"
    return head + "".join(f"L{i:04d} {h}\n" for i in range(n))


def row_fields(repo: str, path: str, lsn: int, post_widen: bool) -> dict:
    """The decoded field values an upsert at `lsn` carries (shared with
    the oracle)."""
    h = _h(f"{repo}|{path}|{lsn}")
    content = content_for(repo, path, lsn)
    size = len(content)
    if post_widen and int(h[12:14], 16) < 3:
        size += 5_000_000_000  # exercises the int->bigint widening
    return {
        "commit": h[:40],
        "lang": LANGS[int(h[8:10], 16) % len(LANGS)],
        "content": content,
        "size_bytes": size,
        "stars": int(h[10:14], 16),
    }


def encode_payload(repo: str, path: str, lsn: int, post_add: bool, post_rename: bool, post_widen: bool) -> str:
    """Wire format of a file_upsert payload: zlib+base64 content (BOC-cell
    analogue) + Debezium-encoded decimal size (converter.py:38-44)."""
    f = row_fields(repo, path, lsn, post_widen)
    h = _h(f"{repo}|{path}|{lsn}")
    scale = int(h[14], 16) % 3
    unscaled = f["size_bytes"] * (10**scale)
    nbytes = max(1, (unscaled.bit_length() + 8) // 8)
    obj = {
        "commit": f["commit"],
        ("language" if post_rename else "lang"): f["lang"],
        "content_z": base64.b64encode(zlib.compress(f["content"].encode(), 1)).decode(),
        "size_scale": scale,
        "size_value": base64.b64encode(
            unscaled.to_bytes(nbytes, "big", signed=True)
        ).decode(),
    }
    if post_add:
        obj["stars"] = f["stars"]
    return json.dumps(obj, separators=(",", ":"))


@dataclass
class GenParams:
    n_events: int = 20_000
    n_repos: int = 50
    paths_per_repo: int = 40
    seed: int = 42
    p_delete: float = 0.08
    p_rename: float = 0.03
    p_duplicate: float = 0.05
    p_malformed: float = 0.01
    hot_share: float = 0.30      # fraction of events hitting hot keys
    n_hot_keys: int = 2
    n_files: int = 12
    zipf_a: float = 1.3
    ddl_script: list = field(default_factory=lambda: list(DDL_SCRIPT))
    # fact-event fan-out (trade/metadata/comment silver tables):
    # share of events that are fact events rather than repos-table CDC
    p_facts: float = 0.0
    # fraction of repos that are "bots": EVERY upsert payload they emit
    # is structurally corrupt (the runtime-learned blacklist target, F7
    # — analogue of non-NFT code hashes, reference nfts_parser.py:29)
    p_bot_repos: float = 0.0
    # rename arrival barrier (all writes to the old key arrive before the
    # rename). True = the polite-generator assumption; False = renames
    # jitter like everything else, which REQUIRES the pipeline's runtime
    # maturity gate (reference MIN_MATURITY_SECONDS, parser/main.py:60-63)
    rename_barrier: bool = True


_FACT_TYPES = ("trade_event", "metadata_event", "comment_event")


def fact_payload(kind: str, repo: str, lsn: int) -> str:
    """Deterministic wire payload for a fact event (shared with test
    oracles)."""
    h = _h(f"fact|{lsn}")
    if kind == "trade_event":
        # ~25% of amounts exceed int64 (up to ~10^33 ≈ 2^110) — the
        # unbounded-numeric range of reference athena_ddl.sql:84
        big = int(h[0], 16) < 4
        amount = int(h[0:30], 16) % (10**33) if big else int(h[0:8], 16)
        scale = int(h[31], 16) % 3
        unscaled = amount * (10**scale)
        nbytes = max(1, (unscaled.bit_length() + 8) // 8)
        price_unscaled = (int(h[8:16], 16) % 10**7) + 1
        obj = {
            "asset": repo,
            "side": "buy" if int(h[16], 16) % 2 == 0 else "sell",
            "amount_scale": scale,
            "amount_value": base64.b64encode(
                unscaled.to_bytes(nbytes, "big", signed=True)
            ).decode(),
            "price_scale": 3,
            "price_value": base64.b64encode(
                price_unscaled.to_bytes(4, "big", signed=True)
            ).decode(),
        }
    elif kind == "metadata_event":
        obj = {
            "name": f"tok_{repo.split('/')[-1]}",
            "symbol": h[:6].upper(),
            "sources_csv": ",".join(h[i * 4 : i * 4 + 4] for i in range(6)),
        }
    else:  # comment_event
        text = f"comment {h[:12]} on {repo} " + " ".join(
            f"w{h[i]}" for i in range(8)
        )
        obj = {
            "text_z": base64.b64encode(zlib.compress(text.encode(), 1)).decode()
        }
    return json.dumps(obj, separators=(",", ":"))


@dataclass
class Event:
    lsn: int
    op: str
    event_type: str
    repo: str | None
    path: str | None
    payload: str | None
    arrival: float
    ts_ms: int = 0


def generate_events(p: GenParams) -> list[Event]:
    """Emits ~p.n_events events (exactly, up to DDL rows and the final
    duplicate): iterations that cannot emit (retired-key collisions)
    don't count against the budget."""
    rng = np.random.default_rng(p.seed)
    repos = [f"org{i % 7}/repo{i}" for i in range(p.n_repos)]
    # zipf-ish repo popularity
    ranks = np.arange(1, p.n_repos + 1, dtype=float)
    probs = 1.0 / ranks**p.zipf_a
    probs /= probs.sum()

    hot_keys = [
        (repos[i % p.n_repos], f"src/hot_{i}.py") for i in range(p.n_hot_keys)
    ]
    hot_set = set(hot_keys)
    # bot repos: deterministic subset (never hot-key repos)
    n_bots = int(p.n_repos * p.p_bot_repos)
    bot_repos = {
        repos[i] for i in range(p.n_repos - 1, p.n_repos - 1 - n_bots, -1)
    } - {r for r, _ in hot_keys}
    moved_pool: list[tuple[str, str]] = []  # rename targets -> rename chains
    ddl_positions = {
        int(frac * p.n_events): ddl for frac, ddl in p.ddl_script
    }

    events: list[Event] = []
    live: dict[tuple[str, str], bool] = {}
    retired: set[tuple[str, str]] = set()
    post_add = post_widen = post_rename = False
    lsn = 0
    rename_seq = 0

    n_rand = 6 if p.p_facts > 0 else 5  # keep draws identical when facts off
    chunk = 1 << 16
    repo_choices = rng.choice(p.n_repos, size=chunk, p=probs)
    path_choices = rng.integers(0, p.paths_per_repo, size=chunk)
    u = rng.random(size=(chunk, n_rand))
    i = -1
    emitted = 0
    max_iter = p.n_events * 4

    while emitted < p.n_events and i < max_iter:
        i += 1
        ci = i % chunk
        if i > 0 and ci == 0:
            repo_choices = rng.choice(p.n_repos, size=chunk, p=probs)
            path_choices = rng.integers(0, p.paths_per_repo, size=chunk)
            u = rng.random(size=(chunk, n_rand))
        lsn += LSN_STEP
        if emitted in ddl_positions:
            ddl = ddl_positions.pop(emitted)
            if ddl["action"] == "add":
                post_add = True
            elif ddl["action"] == "widen":
                post_widen = True
            elif ddl["action"] == "rename":
                post_rename = True
            events.append(
                Event(lsn, "c", "schema_change", None, None,
                      json.dumps(ddl, separators=(",", ":")),
                      arrival=float(lsn), ts_ms=lsn)
            )
            continue

        if p.p_facts > 0 and u[ci, 5] < p.p_facts:
            kind = _FACT_TYPES[int(u[ci, 1] * 3) % 3]
            repo = repos[repo_choices[ci]]
            events.append(
                Event(lsn, "c" if kind != "metadata_event" else "u", kind,
                      repo, None, fact_payload(kind, repo, lsn),
                      arrival=lsn + u[ci, 3] * ARRIVAL_JITTER, ts_ms=lsn)
            )
            emitted += 1
            continue

        if u[ci, 0] < p.hot_share:
            key = hot_keys[int(u[ci, 1] * p.n_hot_keys) % p.n_hot_keys]
        elif moved_pool and u[ci, 0] > 1 - 0.02:
            # revisit a renamed-to key (enables rename chains)
            key = moved_pool[int(u[ci, 1] * len(moved_pool)) % len(moved_pool)]
        else:
            key = (repos[repo_choices[ci]], f"src/m{path_choices[ci]}.py")
        if key in retired:
            key = (key[0], f"src/m{path_choices[ci]}_b.py")
            if key in retired:
                continue
        repo, path = key
        r = u[ci, 2]
        # hot keys never rename (they must stay hot for the skew tests)
        can_rename = key not in hot_set

        if key in live and live[key] and r < p.p_delete:
            events.append(
                Event(lsn, "d", "file_delete", repo, path, None,
                      arrival=lsn + u[ci, 3] * ARRIVAL_JITTER, ts_ms=lsn)
            )
            live[key] = False
        elif key in live and live[key] and can_rename and r < p.p_delete + p.p_rename:
            rename_seq += 1
            new_path = f"{path}.moved{rename_seq}"
            payload = json.dumps({"new_path": new_path}, separators=(",", ":"))
            # per-key barrier: arrives after every earlier write to `key`
            # (unless disabled — then the runtime maturity gate must cope)
            ren_arrival = (
                lsn + ARRIVAL_JITTER + 1.0
                if p.rename_barrier
                else lsn + u[ci, 3] * ARRIVAL_JITTER
            )
            events.append(
                Event(lsn, "u", "file_rename", repo, path, payload,
                      arrival=ren_arrival, ts_ms=lsn)
            )
            retired.add(key)
            live.pop(key)
            live[(repo, new_path)] = True
            moved_pool.append((repo, new_path))
        else:
            op = "u" if key in live else ("r" if u[ci, 3] < 0.1 else "c")
            if repo in bot_repos:
                payload = '{"commit": "BOT_CORRUPT_' + str(lsn)  # truncated
                events.append(
                    Event(lsn, op, "file_upsert", repo, path, payload,
                          arrival=lsn + u[ci, 3] * ARRIVAL_JITTER, ts_ms=lsn)
                )
                emitted += 1
                continue
            if u[ci, 4] < p.p_malformed:
                payload = '{"commit": "CORRUPT'  # truncated JSON
            else:
                payload = encode_payload(
                    repo, path, lsn, post_add, post_rename, post_widen
                )
            events.append(
                Event(lsn, op, "file_upsert", repo, path, payload,
                      arrival=lsn + u[ci, 3] * ARRIVAL_JITTER, ts_ms=lsn)
            )
            live[key] = True

        emitted += 1
        # at-least-once duplicate delivery of the event just emitted
        if events and u[ci, 1] < p.p_duplicate and events[-1].event_type != "schema_change":
            e = events[-1]
            events.append(
                Event(e.lsn, e.op, e.event_type, e.repo, e.path, e.payload,
                      arrival=e.arrival + u[ci, 4] * ARRIVAL_JITTER, ts_ms=e.ts_ms)
            )
            emitted += 1

    # arrival order: jittered, but DDL events are global barriers —
    # clamp every arrival into its inter-DDL segment
    ddl_lsns = sorted(e.lsn for e in events if e.event_type == "schema_change")
    bounds = ddl_lsns + [float("inf")]

    def seg(lsn: float) -> int:
        for j, b in enumerate(bounds):
            if lsn < b:
                return j
        return len(bounds)

    events.sort(key=lambda e: (seg(e.lsn), e.arrival, e.lsn))
    return events


def write_event_log(events: list[Event], out_dir: str, n_files: int) -> list[str]:
    """Write the arrival-ordered log as `n_files` parquet chunks with
    increasing mtimes (the streaming file source replays them in order)."""
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    chunks = np.array_split(np.arange(len(events)), n_files)
    paths = []
    t0 = 1_700_000_000
    for ci, idx in enumerate(chunks):
        if len(idx) == 0:
            continue
        sub = [events[i] for i in idx]
        tbl = pa.table(
            {
                "lsn": pa.array([e.lsn for e in sub], pa.int64()),
                "ts_ms": pa.array([e.ts_ms for e in sub], pa.int64()),
                "op": pa.array([e.op for e in sub], pa.string()),
                "event_type": pa.array([e.event_type for e in sub], pa.string()),
                "repo": pa.array([e.repo for e in sub], pa.string()),
                "path": pa.array([e.path for e in sub], pa.string()),
                "payload": pa.array([e.payload for e in sub], pa.string()),
            }
        )
        fp = os.path.join(out_dir, f"chunk-{ci:05d}.parquet")
        # small row groups so Spark can split one chunk across many scan
        # tasks (parquet splits cannot cross row-group boundaries; one
        # giant row group serializes the whole parse stage)
        pq.write_table(tbl, fp, compression="zstd", row_group_size=16384)
        os.utime(fp, (t0 + ci, t0 + ci))
        paths.append(fp)
    return paths


def generate_event_log(out_dir: str, params: GenParams | None = None) -> list[str]:
    p = params or GenParams()
    return write_event_log(generate_events(p), out_dir, p.n_files)
