#!/usr/bin/env python3
"""Oracle output-type lint.

DESCRIBEs every oracle SQL in oracle_sql.json under DuckDB and fails if
any result column carries a type Spark cannot emit bit-compatibly.  The
motivating bug (round 6, q162): an uncast `sum(BIGINT)` silently widens
to HUGEINT in DuckDB, so the driver's schema-sensitive hash diverges
even when every value is identical.  rows/schema checks cannot see this
class of defect — only a DESCRIBE sweep can.

Usage: python3 tools/oracle_lint.py <sf_dir> <oracle_sql.json>
Exit 0 = all oracle result schemas Spark-emittable; 1 = violations.
"""
import duckdb, json, re, sys

BAD = re.compile(
    r"HUGEINT|UHUGEINT|UTINYINT|USMALLINT|UINTEGER|UBIGINT"
    r"|\bTIME\b|INTERVAL|UUID|ENUM|\bBIT\b",
    re.IGNORECASE,
)

def scan_type(t: str):
    """Return the offending token or None. DECIMAL(p>38) also flagged:
    Spark caps precision at 38. DECIMAL whose integer part exceeds 15
    digits (p-s > 15) is flagged too: such a value can exceed 2^53, and
    while identical DECIMAL(38,0) values pass check.py's repr-compare,
    the DRIVER's DuckDB->pandas hop degrades DECIMAL to float64 and its
    hash diverges on identical numbers (q157 and q289, rounds 8/11) —
    gate such outputs as STRING on both sides instead."""
    m = BAD.search(t)
    if m:
        return m.group(0)
    for p, s in re.findall(r"DECIMAL\((\d+),(\d+)\)", t, re.IGNORECASE):
        if int(p) > 38:
            return f"DECIMAL({p},_) precision > 38"
        if int(p) - int(s) > 15:
            return (f"DECIMAL({p},{s}) integer part > 15 digits: can "
                    "exceed 2^53, degrades to float64 on the driver's "
                    "pandas hop — gate as STRING")
    return None

def main(sf_dir: str, oracle_path: str) -> int:
    con = duckdb.connect()
    for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
              'lineitem', 'events', 'documents', 'embeddings']:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    violations, errors = [], []
    for name in sorted(oracle):
        try:
            desc = con.sql(f"DESCRIBE ({oracle[name]})").fetchall()
        except Exception as e:
            errors.append((name, str(e).splitlines()[0]))
            continue
        for col, typ, *_ in desc:
            bad = scan_type(typ)
            if bad:
                violations.append((name, col, typ, bad))
    for name, col, typ, bad in violations:
        print(f"VIOLATION {name}.{col}: {typ} (offending: {bad})")
    for name, err in errors:
        print(f"DESCRIBE-ERROR {name}: {err}")
    print(f"oracle_lint: {len(oracle)} oracles, "
          f"{len(violations)} violations, {len(errors)} describe errors")
    return 1 if (violations or errors) else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
