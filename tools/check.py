#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare Verify.scala's
parquet dumps against DuckDB running oracle_sql.json on the same tables.

Round-16 additions (judge ask #1):
  * PARALLEL sweep — a pool of worker processes, each with its own DuckDB
    connection capped at a few threads, so 359 oracle queries no longer run
    one-at-a-time on a 32-core box (19 min -> target < 5 min).
  * BUILDER ARTIFACT — `--artifact PATH` writes a per-query JSON in the
    driver's exact CORRECTNESS_rNN.json shape ({"rows_match","schema_match",
    "hash_match","spark_rows","oracle_rows","err"}), so an empty driver-side
    artifact can never again leave a round unattested.

Usage: tools/check.py SF_DIR OUT_DIR [--artifact PATH] [--jobs N]
"""
import glob
import json
import math
import multiprocessing as mp
import os
import sys

TABLES = ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']

# worker-process globals, set by _init
_con = None
_oracle = None
_out_dir = None


def _init(sf_dir, out_dir, oracle):
    global _con, _oracle, _out_dir
    import duckdb
    # cap per-connection threads: the pool provides the parallelism; letting
    # every worker fan out to all 32 cores would just thrash
    _con = duckdb.connect(config={'threads': 2})
    for t in TABLES:
        _con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    _oracle = oracle
    _out_dir = out_dir


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return 'NaN'
        return f'{v!r}'
    return repr(v)


def _check(name):
    """Returns (name, record, human_line). record is the driver-shaped dict."""
    rec = {"rows_match": False, "schema_match": False, "hash_match": False,
           "spark_rows": None, "oracle_rows": None, "err": None}
    d = f'{_out_dir}/{name}'
    try:
        spark_tbl = _con.sql(f"SELECT * FROM '{d}/*.parquet'")
        cols = sorted(spark_tbl.columns)
        spark_rows = _con.sql(f"SELECT {','.join(cols)} FROM spark_tbl").fetchall()
    except Exception as e:
        rec["err"] = f'spark read error: {e}'
        return name, rec, f'FAIL {name}: {rec["err"]}'
    rec["spark_rows"] = len(spark_rows)
    if name not in _oracle:
        # no oracle registered: weaker rows-only check, mirrors the driver
        rec.update(rows_match=len(spark_rows) > 0, schema_match=True,
                   hash_match=len(spark_rows) > 0)
        line = f'rows-only {name}: {len(spark_rows)} rows'
        if not spark_rows:
            rec["err"] = 'rows-only query returned 0 rows'
            line = f'FAIL {name}: {rec["err"]}'
        return name, rec, line
    try:
        ora = _con.sql(_oracle[name])
        ocols = sorted(ora.columns)
        ora_rows = _con.sql(f"SELECT {','.join(ocols)} FROM ora").fetchall()
    except Exception as e:
        rec["err"] = f'oracle error: {e}'
        return name, rec, f'FAIL {name}: {rec["err"]}'
    rec["oracle_rows"] = len(ora_rows)
    rec["schema_match"] = cols == ocols
    rec["rows_match"] = len(spark_rows) == len(ora_rows)
    if not rec["schema_match"]:
        return name, rec, f'FAIL {name}: columns {cols} vs {ocols}'
    if not rec["rows_match"]:
        return name, rec, \
            f'FAIL {name}: rows {len(spark_rows)} vs {len(ora_rows)}'
    mism = [(i, a, b) for i, (a, b) in enumerate(zip(spark_rows, ora_rows))
            if [_norm(x) for x in a] != [_norm(x) for x in b]]
    if mism:
        i, a, b = mism[0]
        return name, rec, (f'FAIL {name}: {len(mism)}/{len(spark_rows)} rows '
                           f'differ; first at {i}:\n  spark={a}\n  duck ={b}')
    rec["hash_match"] = True
    return name, rec, f'OK   {name}: {len(spark_rows)} rows'


def main():
    argv = list(sys.argv[1:])
    artifact = None
    jobs = min(16, os.cpu_count() or 4)
    if '--artifact' in argv:
        i = argv.index('--artifact')
        artifact = argv[i + 1]
        del argv[i:i + 2]
    if '--jobs' in argv:
        i = argv.index('--jobs')
        jobs = int(argv[i + 1])
        del argv[i:i + 2]
    sf_dir, out_dir = argv[0], argv[1]
    oracle = json.load(open(f'{out_dir}/oracle_sql.json'))

    # a query that crashed writes no output dir — that must FAIL, not vanish
    expected = []
    try:
        expected = json.load(open(f'{out_dir}/queries.json'))
    except FileNotFoundError:
        pass
    present = sorted(os.path.basename(d) for d in glob.glob(f'{out_dir}/q*')
                     if os.path.isdir(d))
    missing = sorted(set(expected) - set(present))

    records = {}
    ok = fail = 0
    # chunksize 1 + longest-SQL-first dispatch: query costs are skewed (a
    # few unrolled-CTE oracles dominate), so start the likely-slowest ones
    # at t=0 instead of letting one land last and serialize the tail
    order = sorted(present, key=lambda n: -len(oracle.get(n, '')))
    with mp.Pool(jobs, initializer=_init,
                 initargs=(sf_dir, out_dir, oracle)) as pool:
        for name, rec, line in pool.imap_unordered(_check, order,
                                                   chunksize=1):
            records[name] = rec
            print(line, flush=True)
            if rec["err"] is None and rec["hash_match"]:
                ok += 1
            else:
                fail += 1
    for name in missing:
        records[name] = {"rows_match": False, "schema_match": False,
                         "hash_match": False, "spark_rows": None,
                         "oracle_rows": None,
                         "err": "query produced no output (crashed in Verify)"}
        print(f'FAIL {name}: query produced no output (crashed in Verify)')
        fail += 1
    if artifact:
        with open(artifact, 'w') as f:
            json.dump({k: records[k] for k in sorted(records)}, f, indent=1)
        print(f'wrote {artifact} ({len(records)} queries)')
    print(f'\n{ok} ok, {fail} fail')
    sys.exit(1 if fail else 0)


if __name__ == '__main__':
    main()
