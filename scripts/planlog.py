#!/usr/bin/env python3
"""Extract per-query physical plans from a Spark event log produced by
a `graft.Bench` run with job descriptions on (bench:<query> labels).

For each requested query, finds the FIRST rep's time window (from the
first labeled job to the start of the next query's first labeled job),
collects every SQLExecutionStart inside it, and writes the FINAL plan
of each execution (last SparkListenerSQLAdaptiveExecutionUpdate when
AQE re-planned, else the start plan) — i.e. the same text
`.explain("formatted")` renders, as actually executed.

Usage:
  python3 scripts/planlog.py <events.jsonl> <outdir> <suffix> q1 q2 ...
Writes <outdir>/<query>_<suffix>.txt
"""
import json, sys, os


def main(path, outdir, suffix, queries):
    starts = []          # (time, query) first labeled job per rep boundary
    execs = []           # (time, execId, desc, plan)
    updates = {}         # execId -> last updated plan
    job_exec = []        # (time, label) for every labeled job start
    with open(path) as f:
        for line in f:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = e.get("Event", "")
            if ev == "SparkListenerJobStart":
                p = e.get("Properties") or {}
                d = p.get("spark.job.description", "")
                if d.startswith("bench:"):
                    job_exec.append((e["Submission Time"], d[6:]))
            elif ev.endswith("SparkListenerSQLExecutionStart"):
                execs.append((e["time"], e["executionId"],
                              e.get("description", ""),
                              e.get("physicalPlanDescription", "")))
            elif ev.endswith("SparkListenerSQLAdaptiveExecutionUpdate"):
                updates[e["executionId"]] = e.get("physicalPlanDescription", "")
    # first labeled job per query = that query's rep-1 anchor
    first = {}
    order = []
    for t, q in job_exec:
        if q not in first:
            first[q] = t
            order.append((t, q))
    order.sort()
    os.makedirs(outdir, exist_ok=True)
    reps_of = {}
    detail = os.environ.get("PLANLOG_DETAIL")
    if detail:
        with open(detail) as df:
            d = json.load(df)
        for name, info in d.get("queries", {}).items():
            atts = info.get("attempts") or []
            if atts:
                reps_of[name] = len(atts)
    for q in queries:
        if q not in first:
            print(f"WARN no labeled jobs for {q}")
            continue
        t0 = first[q]
        later = [t for t, name in order if t > t0]
        t1 = min(later) if later else float("inf")
        # window start: small lookback for executions submitted just
        # before their first job, CLAMPED to the previous query's first
        # labeled job so a trailing execution of the previous query (or
        # a pre-label warm-up) is never attributed to this one
        earlier = [t for t, name in order if t < t0]
        w0 = max(t0 - 2000, max(earlier) + 1) if earlier else t0 - 2000
        picked = [(t, i, d, updates.get(i, pl))
                  for (t, i, d, pl) in execs if w0 <= t < t1]
        # the window spans every rep of the query — the lifecycle is
        # deterministic, so executions-per-rep is constant: keep the
        # first 1/nreps slice (nreps from the run's bench_detail.json,
        # via PLANLOG_DETAIL env; default 1 = keep everything)
        nreps = reps_of.get(q, 1)
        if picked and nreps > 1:
            picked = picked[: -(-len(picked) // nreps)]
        with open(os.path.join(outdir, f"{q}_{suffix}.txt"), "w") as out:
            out.write(f"# {q} — physical plans of rep-1 SQL executions\n"
                      f"# extracted from Spark event log ({suffix} run); "
                      f"each is the FINAL (AQE-re-optimized) plan\n\n")
            for t, i, d, pl in picked:
                out.write(f"===== execution {i} :: {d.splitlines()[0][:120]}"
                          f" =====\n{pl}\n\n")
        print(f"{q}: {len(picked)} executions -> {q}_{suffix}.txt")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4:])
