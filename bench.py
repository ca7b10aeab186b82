#!/usr/bin/env python
"""Benchmark: headline operator queries + CDC apply throughput at two
parallelism levels (the in-sandbox proxy for N vs 4N executors,
BASELINE.json north_rule).

Prints ONE JSON line to stdout:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "cdc": {"events": N, "levels": {"8": {...}, "32": {...}},
           "scaling_efficiency": e, "state_parity": true}}

All progress chatter goes to stderr. Results are also appended to
BENCH.md. Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
BENCH_CDC_EVENTS (default 400000), BENCH_SKIP_CDC=1.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ton_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CDC_EVENTS = int(os.environ.get("BENCH_CDC_EVENTS", "400000"))
CDC_LEVELS = (max(CPUS // 4, 1), CPUS)  # N and 4N cores
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")

HEADLINE = [
    "latest_state",
    "state_dedup",
    "asof_join",
    "decayed_avg",
    "daily_rollup",
    "chain_signature",
    "pricing_summary",
    "region_revenue",
    "text_analyze",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "cosine_topk",
]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_headline(spark) -> dict[str, float]:
    from ton_etl_spark.queries import QUERIES

    out = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()  # warm (plan+JIT)
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 3)
        log(f"  {name}: {out[name]}s")
    return out


def cdc_event_log() -> tuple[str, int]:
    """Generate (once, cached) the CDC bench event log."""
    from ton_etl_spark.datagen import GenParams, generate_event_log

    params = GenParams(
        n_events=CDC_EVENTS,
        n_repos=max(CDC_EVENTS // 2000, 50),
        paths_per_repo=60,
        n_files=16,
        hot_share=0.3,
    )
    tag = f"{CDC_EVENTS}_{params.n_repos}_{params.seed}"
    log_dir = os.path.join(CACHE, f"events_{tag}")
    marker = os.path.join(log_dir, "_DONE")
    if not os.path.exists(marker):
        log(f"  generating {CDC_EVENTS} events -> {log_dir} ...")
        t0 = time.time()
        generate_event_log(log_dir, params)
        open(marker, "w").write("ok")
        log(f"  generated in {time.time() - t0:.0f}s")
    return log_dir, CDC_EVENTS


def run_cdc_level(cores: int, log_dir: str) -> dict:
    from pyspark.sql import SparkSession, functions as F

    from ton_etl_spark.cdc.pipeline import CdcPipeline
    from ton_etl_spark.lake.table import LakeTable
    from ton_etl_spark.schemas import REPOS_KEY_FIELDS, REPOS_SCHEMA

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = get_spark(f"cdc-bench-{cores}", cores=cores,
                      shuffle_partitions=max(cores, 8))
    work = os.path.join(CACHE, f"cdc_run_{cores}")
    shutil.rmtree(work, ignore_errors=True)
    table = LakeTable.create(
        spark, os.path.join(work, "lake"), REPOS_SCHEMA, REPOS_KEY_FIELDS,
        "lsn", bucket_count=max(cores * 2, 16),
    )
    pipe = CdcPipeline(
        spark, table, log_dir, os.path.join(work, "cp"),
        max_files_per_trigger=4, collect_stats=False,
    )
    t0 = time.time()
    pipe.run_streaming(available_now=True)
    wall = time.time() - t0
    state = table.read().agg(
        F.sha2(
            F.concat_ws(
                "\n",
                F.sort_array(
                    F.collect_list(
                        F.concat_ws(
                            "\x00", "repo", "path",
                            F.col("lsn").cast("string"),
                            F.sha2("content", 256),
                        )
                    )
                ),
            ),
            256,
        ).alias("h"),
        F.count(F.lit(1)).alias("rows"),
    ).collect()[0]
    spark.stop()
    return {
        "cores": cores,
        "wall_s": round(wall, 2),
        "batches": pipe.batches_applied,
        "rows": state["rows"],
        "state_sha": state["h"],
    }


def main():
    results: dict = {"sf": SF_DIR, "unit": "sec"}
    log(f"== headline queries at {SF_DIR} on local[{CPUS}]")
    spark = get_spark("bench", cores=CPUS)
    queries = run_headline(spark)
    results["queries"] = queries

    cdc = None
    if os.environ.get("BENCH_SKIP_CDC") != "1":
        log(f"== CDC apply throughput, {CDC_EVENTS} events, "
            f"cores {CDC_LEVELS[0]} vs {CDC_LEVELS[1]}")
        log_dir, n_events = cdc_event_log()
        levels = {}
        for cores in CDC_LEVELS:
            r = run_cdc_level(cores, log_dir)
            r["events_per_sec"] = round(n_events / r["wall_s"], 1)
            levels[str(cores)] = r
            log(f"  local[{cores}]: {r['wall_s']}s = "
                f"{r['events_per_sec']} ev/s ({r['batches']} batches)")
        lo, hi = (levels[str(c)] for c in CDC_LEVELS)
        ratio = hi["events_per_sec"] / lo["events_per_sec"]
        ideal = CDC_LEVELS[1] / CDC_LEVELS[0]
        cdc = {
            "events": n_events,
            "levels": levels,
            "speedup": round(ratio, 3),
            "ideal": ideal,
            "scaling_efficiency": round(ratio / ideal, 3),
            "state_parity": lo["state_sha"] == hi["state_sha"],
        }
        results["cdc"] = cdc
        for c in CDC_LEVELS:
            results["queries"][f"cdc_apply_local{c}"] = levels[str(c)]["wall_s"]

    results["value"] = round(sum(results["queries"].values()), 3)
    results["metric"] = (
        "headline operator wall times + CDC apply at two parallelism levels"
    )
    _append_bench_md(results)
    print(json.dumps(results), flush=True)


def _append_bench_md(results: dict) -> None:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md")
    lines = [f"\n## bench run {time.strftime('%Y-%m-%d %H:%M:%S')}\n",
             f"- sf dir: {results['sf']}, cores: {CPUS}\n"]
    for k, v in results["queries"].items():
        lines.append(f"- {k}: {v}s\n")
    cdc = results.get("cdc")
    if cdc:
        lo, hi = (cdc["levels"][str(c)] for c in CDC_LEVELS)
        lines.append(
            f"- CDC apply ({cdc['events']} events): "
            f"local[{lo['cores']}] {lo['events_per_sec']} ev/s, "
            f"local[{hi['cores']}] {hi['events_per_sec']} ev/s -> "
            f"speedup {cdc['speedup']}x / ideal {cdc['ideal']}x = "
            f"efficiency {cdc['scaling_efficiency']}; "
            f"state parity: {cdc['state_parity']}\n"
        )
    with open(path, "a") as f:
        f.writelines(lines)


if __name__ == "__main__":
    main()
