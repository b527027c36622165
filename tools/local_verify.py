#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run after
`sbt "runMain graft.Verify <sfDir> <outDir>"`, compares each dumped
query parquet to its DuckDB oracle (column-name-sorted, row-sorted,
value-level compare). Dev tool only — not part of the library.
"""
import json, math, sys
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: {type(e).__name__} {e}"); continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        fails.append(name)
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
        continue
    if len(got) != len(exp):
        fails.append(name); print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); continue
    g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    e = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    bad = 0
    for c in g.columns:
        gv, ev = g[c], e[c]
        if gv.dtype != ev.dtype:
            print(f"  note {name}.{c}: dtype {gv.dtype} vs {ev.dtype}")
        for x, y in zip(gv.tolist(), ev.tolist()):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                if x != y:
                    bad += 1
                    if bad < 4: print(f"  diff {name}.{c}: {x!r} vs {y!r}")
            elif x != y:
                bad += 1
                if bad < 4: print(f"  diff {name}.{c}: {x!r} vs {y!r}")
    if bad:
        fails.append(name); print(f"FAIL {name}: {bad} value diffs")
    else:
        print(f"OK   {name} ({len(got)} rows)")
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} oracle queries pass")
sys.exit(1 if fails else 0)
