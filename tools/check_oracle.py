#!/usr/bin/env python3
"""Local emulation of the driver's t2 DuckDB compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
Reads oracle_sql.json, runs each SQL in DuckDB over the sfDir tables,
loads the corresponding Spark parquet dump, sorts columns by name,
and compares row-by-row (floats with tolerance-free equality first,
then a 1e-9 fallback report).
"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq

sfdir, outdir = sys.argv[1], sys.argv[2]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, passes = [], []
for name, sql in sorted(oracle.items()):
    try:
        want = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"duckdb error: {e}"))
        continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        fails.append((name, "no spark output"))
        continue
    got = pq.read_table(files[0]).to_pandas()
    wc, gc = sorted(want.columns), sorted(got.columns)
    if [c.lower() for c in wc] != [c.lower() for c in gc]:
        fails.append((name, f"columns differ: duck={wc} spark={gc}"))
        continue
    want = want[wc]; got = got[gc]
    if len(want) != len(got):
        fails.append((name, f"row count: duck={len(want)} spark={len(got)}"))
        continue
    # dtype-KIND mismatch (int vs float/object) fails the driver's value
    # hash even when values are numerically equal (e.g. DuckDB sum(INT)
    # -> HUGEINT -> float64 vs Spark BIGINT) — flag it here too
    kind_bad = None
    for c, cg in zip(wc, gc):
        kw, kg = want[c].dtype.kind, got[cg].dtype.kind
        if kw != kg and {kw, kg} not in ({'i', 'u'},):
            kind_bad = (c, want[c].dtype, got[cg].dtype); break
    if kind_bad:
        fails.append((name, f"dtype kind mismatch col {kind_bad[0]}: duck={kind_bad[1]} spark={kind_bad[2]}"))
        continue
    bad = None
    for i in range(len(want)):
        for c, cg in zip(wc, gc):
            a, b = want.iloc[i][c], got.iloc[i][cg]
            if a is None and b is None: continue
            try:
                if isinstance(a, float) or isinstance(b, float):
                    fa, fb = float(a), float(b)
                    if math.isnan(fa) and math.isnan(fb): continue
                    if fa != fb:
                        bad = (i, c, a, b, abs(fa-fb)); break
                elif str(a) != str(b):
                    bad = (i, c, a, b, None); break
            except (TypeError, ValueError):
                if str(a) != str(b):
                    bad = (i, c, a, b, None); break
        if bad: break
    if bad:
        fails.append((name, f"row {bad[0]} col {bad[1]}: duck={bad[2]!r} spark={bad[3]!r} diff={bad[4]}"))
    else:
        passes.append((name, len(want)))

for n, r in passes: print(f"PASS {n} ({r} rows)")
for n, msg in fails: print(f"FAIL {n}: {msg}")
print(f"\n{len(passes)} passed, {len(fails)} failed")
sys.exit(1 if fails else 0)
