#!/usr/bin/env python3
"""Parse a Spark event log (JSON lines) and print the job timeline:
per job its duration, gap since the previous job ended (driver-side
time), description, and stage/task shape. Dev tool for the
optimization rounds — point it at a log produced with
JAVA_TOOL_OPTIONS='-Dspark.eventLog.enabled=true -Dspark.eventLog.dir=<dir>'.

Usage: python3 scripts/joblog.py <eventlog-file> [--min-gap 0.05]
"""
import json, sys


def main(path, min_gap=0.05):
    jobs = {}       # id -> dict
    stages = {}     # id -> dict
    app_start = None
    app_end = None
    with open(path) as f:
        for line in f:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerApplicationStart":
                app_start = e.get("Timestamp")
            elif ev == "SparkListenerApplicationEnd":
                app_end = e.get("Timestamp")
            elif ev == "SparkListenerJobStart":
                jid = e["Job ID"]
                props = e.get("Properties") or {}
                jobs[jid] = {
                    "start": e["Submission Time"],
                    "desc": props.get("spark.job.description", ""),
                    "group": props.get("spark.jobGroup.id", ""),
                    "stages": [s["Stage ID"] for s in e.get("Stage Infos", [])],
                    "ntasks": sum(s.get("Number of Tasks", 0)
                                  for s in e.get("Stage Infos", [])),
                }
            elif ev == "SparkListenerJobEnd":
                jid = e["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = e["Completion Time"]
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si.get("Stage Name", ""),
                    "ntasks": si.get("Number of Tasks", 0),
                    "start": si.get("Submission Time"),
                    "end": si.get("Completion Time"),
                }
    ordered = sorted(jobs.items(), key=lambda kv: kv[1]["start"])
    t0 = app_start or (ordered[0][1]["start"] if ordered else 0)
    prev_end = t0
    total_job = 0.0
    total_gap = 0.0
    print(f"{'job':>4} {'t_rel':>8} {'gap_s':>7} {'dur_s':>7} {'tasks':>5}  description")
    for jid, j in ordered:
        end = j.get("end", j["start"])
        dur = (end - j["start"]) / 1000.0
        gap = (j["start"] - prev_end) / 1000.0
        total_job += dur
        if gap > 0:
            total_gap += gap
        mark = " *" if gap >= min_gap else "  "
        desc = j["desc"][:90]
        print(f"{jid:>4} {(j['start']-t0)/1000.0:>8.2f} {gap:>7.2f}{mark}"
              f"{dur:>7.2f} {j['ntasks']:>5}  {desc}")
        prev_end = max(prev_end, end)
    if app_end:
        tail = (app_end - prev_end) / 1000.0
        wall = (app_end - t0) / 1000.0
        print(f"\nwall {wall:.2f}s  in-job {total_job:.2f}s  "
              f"gaps {total_gap:.2f}s  tail-after-last-job {tail:.2f}s")
    # slowest stages
    print("\nslowest stages:")
    for sid, s in sorted(stages.items(),
                         key=lambda kv: (kv[1]["end"] or 0) - (kv[1]["start"] or 0),
                         reverse=True)[:15]:
        if s["start"] is None or s["end"] is None:
            continue
        print(f"  stage {sid:>4} {(s['end']-s['start'])/1000.0:>7.2f}s "
              f"{s['ntasks']:>5}t  {s['name'][:100]}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    mg = 0.05
    if "--min-gap" in sys.argv:
        mg = float(sys.argv[sys.argv.index("--min-gap") + 1])
    main(args[0], mg)
