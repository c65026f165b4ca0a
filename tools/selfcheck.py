#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracles and diff. Usage:
  python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

# Generated scale dirs (graft.Scale) store events.ts as raw ns BIGINT;
# normalize to the same µs timestamp Tables.withEventTs produces so the
# event-family oracles run unchanged against any dir.
ts_type = con.sql("SELECT typeof(ts) FROM events LIMIT 1").fetchone()
if ts_type and ts_type[0] == "BIGINT":
    con.sql("DROP VIEW events")
    con.sql(f"""CREATE VIEW events AS
        SELECT event_id, make_timestamp(ts // 1000) AS ts,
               user_id, event_type, value, props
        FROM '{sfdir}/events.parquet'""")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        return round(v, 4)
    return v

fails, passes, skipped = [], [], []
for name in sorted(oracle):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        fails.append((name, "no spark output")); continue
    try:
        got_df = con.sql(f"SELECT * FROM '{files[0]}'").df()
        exp_df = con.sql(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"oracle error: {e}")); continue
    gcols, ecols = sorted(got_df.columns), sorted(exp_df.columns)
    if gcols != ecols:
        fails.append((name, f"cols differ: spark={gcols} duck={ecols}")); continue
    got = sorted([tuple(norm(v) for v in r) for r in got_df[gcols].itertuples(index=False)], key=repr)
    exp = sorted([tuple(norm(v) for v in r) for r in exp_df[gcols].itertuples(index=False)], key=repr)
    if got == exp:
        passes.append((name, len(got)))
    else:
        d1 = [r for r in got if r not in exp][:3]
        d2 = [r for r in exp if r not in got][:3]
        fails.append((name, f"rows {len(got)} vs {len(exp)}; spark-only={d1} duck-only={d2}"))

for name in sorted(set(d.split('/')[-1] for d in glob.glob(f"{outdir}/q*")) - set(oracle)):
    n = len(glob.glob(f"{outdir}/{name}/*.parquet"))
    skipped.append((name, "rows-only (no oracle)" if n else "NO OUTPUT"))

print(f"PASS {len(passes)}: " + ", ".join(f"{n}({r})" for n, r in passes))
for n, r in skipped: print(f"SKIP {n}: {r}")
for n, r in fails: print(f"FAIL {n}: {r}")
sys.exit(1 if fails else 0)
