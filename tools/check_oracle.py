#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB (tables = parquet basenames in
sfDir), sorts columns by name, and compares cell-by-cell.
"""
import json, math, struct, sys, glob, os
import duckdb
import pyarrow.parquet as pq


def cell_mismatch(x, y):
    """Strict comparison matching the driver's byte-hash gate: floats are
    compared by IEEE-754 bit pattern (so -0.0 != +0.0), ints must agree in
    Python value AND neither side may be a float; types must be compatible."""
    if isinstance(x, float) or isinstance(y, float):
        if not (isinstance(x, float) and isinstance(y, float)):
            return True  # int-vs-float width/type divergence
        if math.isnan(x) and math.isnan(y):
            return False
        return struct.pack(">d", x) != struct.pack(">d", y)
    return x != y


# Result-type lint (VERDICT r20 task 2): the driver's typed byte-hash
# compares Arrow buffers, so a DuckDB implicit widening that rows+schema
# checks miss (HUGEINT/decimal128 from a windowed sum(), as in the r20
# packWholeShardsSql slip) must fail LOUDLY here instead of silently
# diverging the hash. Every oracle result column must be one of the
# Spark-representable types the declared queries actually emit.
ALLOWED_ORACLE_TYPES = {"BIGINT", "INTEGER", "DOUBLE", "FLOAT", "VARCHAR",
                        "BOOLEAN", "TIMESTAMP", "TIMESTAMP WITH TIME ZONE",
                        "DATE"}


def lint_types(rel):
    """Return the list of (column, type) pairs whose DuckDB result type is
    outside the allowed Spark-compatible set (HUGEINT, DECIMAL, ...)."""
    return [(c, str(t)) for c, t in zip(rel.columns, rel.types)
            if str(t).upper() not in ALLOWED_ORACLE_TYPES]


def load_spark(path):
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        return None, None
    import pyarrow as pa
    tb = pa.concat_tables([pq.read_table(f) for f in files])
    cols = sorted(tb.column_names)
    return cols, [tuple(r[c] for c in cols) for r in tb.to_pylist()]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(f)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spath = os.path.join(out_dir, name)
        scols, srows = load_spark(spath)
        if scols is None:
            print(f"FAIL {name}: no spark output at {spath}")
            n_fail += 1
            continue
        try:
            rel = con.sql(sql)
            bad_types = lint_types(rel)
            dcols = list(rel.columns)
            order = sorted(range(len(dcols)), key=lambda i: dcols[i])
            drows = [tuple(r[i] for i in order) for r in rel.fetchall()]
            dcols = sorted(dcols)
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        if bad_types:
            print(f"FAIL {name}: oracle result type outside the hashable set: "
                  f"{bad_types} (allowed: {sorted(ALLOWED_ORACLE_TYPES)})")
            n_fail += 1
            continue
        if scols != dcols:
            print(f"FAIL {name}: columns spark={scols} duckdb={dcols}")
            n_fail += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rows spark={len(srows)} duckdb={len(drows)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(srows, drows)):
            for j, (x, y) in enumerate(zip(a, b)):
                if cell_mismatch(x, y):
                    bad = (i, scols[j], x, y)
                    break
            if bad:
                break
        if bad:
            i, c, x, y = bad
            print(f"FAIL {name}: row {i} col {c}: spark={x!r} duckdb={y!r}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
