"""Per-query job/stage profile via the Spark event log (the UI is
disabled in this sandbox, so this is the 'open the Stages tab' step of
guide §1.1/§7.1 in file form). For each named query: one untimed warm
pass, then one timed pass labeled with setJobDescription; afterwards the
event log is parsed and every job of the timed pass is printed with its
wall, stage count, task count, and dominant stage.

Usage: python tools/profile_query.py name [name ...]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_cdc_validator_spark.queries import QUERIES  # noqa: E402
from rust_cdc_validator_spark.session import get_spark  # noqa: E402

EVDIR = "/tmp/spark-events"


def main() -> None:
    names = sys.argv[1:]
    unknown = [n for n in names if n not in QUERIES]
    if unknown or not names:
        raise SystemExit(f"unknown or missing query names: {unknown}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(EVDIR, exist_ok=True)
    spark = get_spark(
        "profile-query",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{EVDIR}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    sc = spark.sparkContext
    walls: dict[str, float] = {}
    for name in names:
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        sc.setJobDescription(f"TIMED::{name}")
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls[name] = time.perf_counter() - t0
        sc.setJobDescription(None)
    app_id = sc.applicationId
    spark.stop()

    paths = sorted(
        glob.glob(os.path.join(EVDIR, app_id + "*"))
        + glob.glob(os.path.join(EVDIR, "eventlog_v2_" + app_id, "events*"))
    )
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}

    def lines():
        for p in paths:
            if p.endswith(".zstd"):
                import io

                import zstandard

                with open(p, "rb") as raw:
                    reader = zstandard.ZstdDecompressor().stream_reader(raw)
                    yield from io.TextIOWrapper(reader, encoding="utf-8")
            else:
                with open(p) as f:
                    yield from f

    if True:
        for line in lines():
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                desc = ev.get("Properties", {}).get("spark.job.description", "")
                if desc.startswith("TIMED::"):
                    jobs[ev["Job ID"]] = {
                        "q": desc[7:],
                        "t0": ev["Submission Time"],
                        "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                    }
            elif e == "SparkListenerJobEnd" and ev["Job ID"] in jobs:
                jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                if "Completion Time" in si and "Submission Time" in si:
                    stages[si["Stage ID"]] = {
                        "name": si["Stage Name"].split("\n")[0][:80],
                        "ms": si["Completion Time"] - si["Submission Time"],
                        "tasks": si["Number of Tasks"],
                        **stages.get(si["Stage ID"], {}),
                    }
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                agg = stages.setdefault(sid, {})
                for key, field in [
                    ("run", "Executor Run Time"),
                    ("deser", "Executor Deserialize Time"),
                    ("gc", "JVM GC Time"),
                    ("rser", "Result Serialization Time"),
                ]:
                    agg[key] = agg.get(key, 0) + tm.get(field, 0)
                srm = tm.get("Shuffle Read Metrics") or {}
                agg["fetch"] = agg.get("fetch", 0) + srm.get("Fetch Wait Time", 0)
                ti = ev.get("Task Info") or {}
                launch_to_end = ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
                agg["taskwall"] = agg.get("taskwall", 0) + max(launch_to_end, 0)
    for name in names:
        qjobs = sorted(
            (j for j in jobs.values() if j["q"] == name), key=lambda j: j["t0"]
        )
        total_ms = sum(j.get("t1", j["t0"]) - j["t0"] for j in qjobs)
        gap_ms = 0.0
        if qjobs:
            span = qjobs[-1].get("t1", qjobs[-1]["t0"]) - qjobs[0]["t0"]
            gap_ms = span - total_ms
        print(
            f"\n=== {name}: wall {walls[name]:.2f}s, {len(qjobs)} jobs, "
            f"in-job {total_ms / 1e3:.2f}s, between-job gaps {gap_ms / 1e3:.2f}s"
        )
        for j in qjobs:
            dur = (j.get("t1", j["t0"]) - j["t0"]) / 1e3
            done = [stages[s] for s in j["stages"] if s in stages]
            n_tasks = sum(s["tasks"] for s in done)
            top = max(done, key=lambda s: s["ms"], default=None)
            top_s = (
                f" | top stage {top['ms']}ms x{top['tasks']}t"
                f" run={top.get('run', 0)} deser={top.get('deser', 0)}"
                f" gc={top.get('gc', 0)} fetch={top.get('fetch', 0)}"
                f" taskwall={top.get('taskwall', 0)} {top['name']}"
                if top
                else ""
            )
            print(
                f"  job {dur:6.2f}s  stages {len(done)}/{len(j['stages'])} "
                f"tasks {n_tasks}{top_s}"
            )


if __name__ == "__main__":
    main()
