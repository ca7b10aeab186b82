"""`python -m ton_etl_spark` CLI (the spark-submit --py-files entry
surface) driven in-process: gen -> init -> replay -> verify -> history
-> feed, each command's JSON summary parsed from stdout. get_spark's
getOrCreate reuses the test session, so no extra JVM spins up."""

import json

from ton_etl_spark.__main__ import main


def _run(capsys, *argv):
    rc = main(list(argv))
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0, argv
    return [json.loads(line) for line in out if line.startswith("{")]


def test_cli_gen_init_replay_verify_feed(spark, tmp_path, capsys):
    ev = str(tmp_path / "events")
    lake = str(tmp_path / "lake")

    (g,) = _run(capsys, "gen", "--out", ev, "--events", "1200")
    assert g["files"] > 0

    (i,) = _run(capsys, "init", "--lake", lake, "--buckets", "8")
    assert i["version"] == 0

    (r,) = _run(capsys, "replay", "--lake", lake, "--events", ev)
    assert r["batches"] == 1 and r["version"] >= 1

    (v,) = _run(capsys, "verify", "--lake", lake, "--events", ev)
    assert v["parity"] is True and v["rows"] == v["oracle_rows"] > 0

    hist = _run(capsys, "history", "--lake", lake)
    assert [h["version"] for h in hist][:2] == [0, 1]

    (f,) = _run(capsys, "feed", "--lake", lake, "--since", "0")
    assert f["rows"] > 0
