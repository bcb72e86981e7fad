#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's t2 check: run graft.Verify at a
given SF, then run each oracle SQL in DuckDB over the same parquet tables
and compare row counts, schemas (loosely), and sorted values."""
import sys, json, glob, os
import duckdb, pyarrow.parquet as pq
import pandas as pd
import numpy as np

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        got_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not got_files:
            print(f"FAIL {name}: no spark output"); fails += 1; continue
        got = pq.read_table(got_files).to_pandas()
        exp = con.execute(sql).fetchdf()
        ok = True; msgs = []
        if sorted(got.columns) != sorted(exp.columns):
            ok = False; msgs.append(f"cols spark={sorted(got.columns)} duck={sorted(exp.columns)}")
        elif len(got) != len(exp):
            ok = False; msgs.append(f"rows spark={len(got)} duck={len(exp)}")
        else:
            g = got[sorted(got.columns)].reset_index(drop=True)
            e = exp[sorted(exp.columns)].reset_index(drop=True)
            for c in g.columns:
                gv, ev = g[c], e[c]
                if str(gv.dtype).startswith("datetime") or str(ev.dtype).startswith("datetime"):
                    gv = pd.to_datetime(gv).astype("datetime64[us]")
                    ev = pd.to_datetime(ev).astype("datetime64[us]")
                    same = gv.equals(ev)
                elif gv.dtype == object or ev.dtype == object:
                    same = gv.astype(str).equals(ev.astype(str))
                elif np.issubdtype(gv.dtype, np.floating):
                    same = bool(np.array_equal(gv.to_numpy(), ev.to_numpy(), equal_nan=True))
                    if not same:
                        # report max diff for debugging
                        d = np.nanmax(np.abs(gv.to_numpy() - ev.to_numpy().astype(float)))
                        msgs.append(f"col {c} float mismatch maxdiff={d!r}")
                else:
                    same = bool((gv.to_numpy() == ev.to_numpy()).all())
                if not same:
                    ok = False
                    if not msgs or not msgs[-1].startswith(f"col {c}"):
                        bad = (gv != ev)
                        try:
                            i = int(np.argmax(bad.to_numpy()))
                            msgs.append(f"col {c} ({gv.dtype} vs {ev.dtype}) first diff row {i}: spark={gv.iloc[i]!r} duck={ev.iloc[i]!r}")
                        except Exception:
                            msgs.append(f"col {c} mismatch ({gv.dtype} vs {ev.dtype})")
        if ok:
            print(f"PASS {name} ({len(got)} rows)")
        else:
            fails += 1
            print(f"FAIL {name}: " + "; ".join(msgs))
    except Exception as ex:
        fails += 1
        print(f"FAIL {name}: exception {ex}")
print(f"== {len(oracle)-fails}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
