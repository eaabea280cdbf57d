#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare Verify.scala's
parquet dumps against DuckDB running oracle_sql.json on the same tables."""
import duckdb, glob, json, math, os, sys
import pyarrow.parquet as pq

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
oracle = json.load(open(f'{out_dir}/oracle_sql.json'))

# a query that crashed writes no output dir — that must FAIL, not vanish
expected = []
try:
    expected = json.load(open(f'{out_dir}/queries.json'))
except FileNotFoundError:
    pass
present = {os.path.basename(d) for d in glob.glob(f'{out_dir}/q*') if os.path.isdir(d)}
missing = sorted(set(expected) - present)

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return 'NaN'
        return f'{v!r}'
    return repr(v)

ok = fail = 0
for d in sorted(glob.glob(f'{out_dir}/q*')):
    if not os.path.isdir(d):
        continue
    name = os.path.basename(d)
    try:
        spark_tbl = con.sql(f"SELECT * FROM '{d}/*.parquet'")
        cols = sorted(spark_tbl.columns)
        spark_rows = con.sql(f"SELECT {','.join(cols)} FROM spark_tbl").fetchall()
    except Exception as e:
        print(f'FAIL {name}: spark read error: {e}'); fail += 1; continue
    if name not in oracle:
        print(f'rows-only {name}: {len(spark_rows)} rows'); ok += 1; continue
    try:
        ora = con.sql(oracle[name])
        ocols = sorted(ora.columns)
        ora_rows = con.sql(f"SELECT {','.join(ocols)} FROM ora").fetchall()
    except Exception as e:
        print(f'FAIL {name}: oracle error: {e}'); fail += 1; continue
    if cols != ocols:
        print(f'FAIL {name}: columns {cols} vs {ocols}'); fail += 1; continue
    if len(spark_rows) != len(ora_rows):
        print(f'FAIL {name}: rows {len(spark_rows)} vs {len(ora_rows)}'); fail += 1; continue
    mism = [(i, a, b) for i, (a, b) in enumerate(zip(spark_rows, ora_rows))
            if [norm(x) for x in a] != [norm(x) for x in b]]
    if mism:
        i, a, b = mism[0]
        print(f'FAIL {name}: {len(mism)}/{len(spark_rows)} rows differ; first at {i}:\n  spark={a}\n  duck ={b}')
        fail += 1
    else:
        print(f'OK   {name}: {len(spark_rows)} rows'); ok += 1
for name in missing:
    print(f'FAIL {name}: query produced no output (crashed in Verify)')
    fail += 1
print(f'\n{ok} ok, {fail} fail')
sys.exit(1 if fail else 0)
