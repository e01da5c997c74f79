"""Per-job profile of one bench row via the Spark event log.

Runs a single bench row (one warm-up + one measured execution) with
``spark.eventLog.enabled`` and parses the event log into a per-job
timeline: job wall time, job description/call site, stage task counts and
shuffle bytes.  This is the guide's "empirical loop" (§1.1/§7.1) without
the UI: it answers *where the wall-clock goes* — scheduling, shuffle, or
compute — and how many Spark jobs a row really issues.

Usage:  python tools/profile_row.py <row_name> [<row_name> ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_event_log(path: str) -> dict:
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    for line in open(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            jid = ev["Job ID"]
            props = ev.get("Properties") or {}
            jobs[jid] = {
                "start": ev["Submission Time"],
                "desc": props.get("spark.job.description")
                or props.get("callSite.short", ""),
                "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
            }
        elif e == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in jobs:
                jobs[jid]["end"] = ev["Completion Time"]
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            st = stages.setdefault(si["Stage ID"], {})
            st.update(
                name=si["Stage Name"],
                tasks=si["Number of Tasks"],
                sub=si.get("Submission Time"),
                done=si.get("Completion Time"),
            )
        elif e == "SparkListenerTaskEnd":
            si = ev["Stage ID"]
            st = stages.setdefault(si, {})
            ti = ev.get("Task Info") or {}
            st["task_ms"] = st.get("task_ms", 0) + max(
                0, ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
            )
            for a in ti.get("Accumulables") or []:
                nm, up = a.get("Name", ""), a.get("Update", 0)
                try:
                    up = int(up)
                except (TypeError, ValueError):
                    continue
                if nm == "internal.metrics.shuffle.write.bytesWritten":
                    st["shuf_w"] = st.get("shuf_w", 0) + up
                elif nm in (
                    "internal.metrics.shuffle.read.localBytesRead",
                    "internal.metrics.shuffle.read.remoteBytesRead",
                ):
                    st["shuf_r"] = st.get("shuf_r", 0) + up
                elif nm == "internal.metrics.jvmGCTime":
                    st["gc_ms"] = st.get("gc_ms", 0) + up
    return {"jobs": jobs, "stages": stages}


def main() -> None:
    rows = sys.argv[1:]
    if not rows:
        raise SystemExit("usage: profile_row.py <bench_row> [...]")
    evdir = "/tmp/spark-events-profile"
    import shutil

    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)

    from tiledb_vector_search_spark import get_spark

    spark = get_spark(
        app_name="tvs-profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    def _noop(batches):
        yield from batches

    spark.range(100).toDF("id").mapInPandas(_noop, "id long").collect()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import bench

    queries = bench._bench_queries(spark, sf_dir)
    sc = spark.sparkContext
    marks: list[tuple[str, float, float]] = []
    for name in rows:
        fn = queries[name]
        fn()  # warm-up: codegen + one-time setup
        spark.catalog.clearCache()
        sc._jvm.System.gc()
        t0 = time.time()
        fn()
        t1 = time.time()
        marks.append((name, t0 * 1000, t1 * 1000))
        print(f"== {name}: {t1 - t0:.3f}s wall", flush=True)
        sc.setJobDescription(None)
    spark.stop()

    logf = []
    for root, _dirs, files in os.walk(evdir):
        for f in files:
            if not f.startswith(".") and not f.endswith(".crc"):
                logf.append(os.path.join(root, f))
    parsed = {"jobs": {}, "stages": {}}
    for p in sorted(logf):
        part = parse_event_log(p)
        parsed["jobs"].update(part["jobs"])
        parsed["stages"].update(part["stages"])
    jobs, stages = parsed["jobs"], parsed["stages"]
    for name, ms0, ms1 in marks:
        sel = {
            j: info
            for j, info in jobs.items()
            if "start" in info and ms0 <= info["start"] <= ms1
        }
        tot_job = sum(
            (i.get("end", i["start"]) - i["start"]) / 1000 for i in sel.values()
        )
        print(f"\n=== {name}: wall {(ms1 - ms0) / 1000:.3f}s, "
              f"{len(sel)} jobs covering {tot_job:.3f}s; "
              f"gap (driver-side) {(ms1 - ms0) / 1000 - tot_job:.3f}s")
        for j in sorted(sel):
            i = sel[j]
            dur = (i.get("end", i["start"]) - i["start"]) / 1000
            sts = [stages.get(s, {}) for s in i["stages"]]
            tasks = sum(s.get("tasks", 0) for s in sts)
            shr = sum(s.get("shuf_r", 0) for s in sts)
            shw = sum(s.get("shuf_w", 0) for s in sts)
            taskms = sum(s.get("task_ms", 0) for s in sts)
            gcms = sum(s.get("gc_ms", 0) for s in sts)
            desc = (i["desc"] or "")[:60]
            print(
                f"  job {j:4d} {dur:7.3f}s tasks={tasks:4d} "
                f"taskcpu={taskms / 1000:7.2f}s gc={gcms / 1000:5.2f}s "
                f"shufR={shr >> 10:6d}K shufW={shw >> 10:6d}K  {desc}"
            )


if __name__ == "__main__":
    main()
