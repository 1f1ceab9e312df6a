#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs
the matching SQL from oracle_sql.json in DuckDB over views of the sfDir
tables, and compares: column names (sorted), row count, and values
(exact for non-floats; floats both exact-count and max-abs-diff so we
can judge hash-compare risk).

Uses driver-side python libs (duckdb/pyarrow) — tooling only, NOT an
engine dependency.
"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def load_spark_result(path):
    files = sorted(glob.glob(f"{path}/*.parquet"))
    if not files:
        return None
    import pyarrow as pa
    tabs = [pq.read_table(f) for f in files]
    return pa.concat_tables(tabs)

def norm_rows(cols, rows):
    # sort columns by name (driver behavior), rows as tuples
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    ncols = [cols[i] for i in order]
    nrows = [tuple(r[i] for i in order) for r in rows]
    return ncols, nrows

def canon(v):
    if isinstance(v, float):
        return v
    if hasattr(v, "isoformat"):
        s = v.isoformat()
        return s.replace("+00:00", "")
    return v

def main():
    args = list(sys.argv[1:])
    # Optional: --out PATH writes a CORRECTNESS_r*-format json of this
    # local run (for tools/status.py check-coverage between driver rounds).
    out_json = None
    if "--out" in args:
        i = args.index("--out")
        out_json = args[i + 1]
        del args[i:i + 2]
    sf_dir, out_dir = args[0], args[1]
    # Optional 3rd arg: comma-separated name prefixes — check only those.
    only = args[2].split(",") if len(args) > 2 else None
    results = {}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0

    def record(name, rows=None, hash_match=None, err=None, oracle_rows=None,
               rows_match=None, schema_match=None):
        # Every compared query MUST end up in `results` exactly once —
        # including the early-FAIL modes (columns/type-category/rowcount),
        # which previously `continue`d without recording and so vanished
        # from the --out artifact entirely.
        if hash_match is not None:
            if rows_match is None:
                rows_match = hash_match or rows == oracle_rows
            if schema_match is None:
                schema_match = True
        results[name] = {
            "rows_match": rows_match,
            "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": rows,
            "oracle_rows": oracle_rows, "err": err}

    for name, sql in sorted(oracle.items()):
        if only and not any(name.startswith(p) for p in only):
            continue
        tab = load_spark_result(f"{out_dir}/{name}")
        if tab is None:
            print(f"FAIL {name}: no spark result")
            record(name, err="no_result")
            n_bad += 1
            continue
        try:
            duck = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            record(name, rows=tab.num_rows, err=f"duckdb: {e}")
            n_bad += 1
            continue
        scols, srows = norm_rows(tab.column_names,
                                 [list(r.values()) for r in tab.to_pylist()])
        dcols, drows = norm_rows(duck.column_names,
                                 [list(r.values()) for r in duck.to_pylist()])
        if scols != dcols:
            print(f"FAIL {name}: columns differ spark={scols} duck={dcols}")
            record(name, rows=tab.num_rows, hash_match=False,
                   rows_match=tab.num_rows == duck.num_rows, schema_match=False,
                   oracle_rows=duck.num_rows,
                   err=f"columns_differ spark={scols} duck={dcols}")
            n_bad += 1
            continue
        # Driver hashes raw arrow values, so a DuckDB HUGEINT (decimal128)
        # column vs a Spark int64 hash-mismatches even when the Python
        # values compare equal. Flag any type-category divergence.
        def tcat(t):
            import pyarrow.types as pt
            if pt.is_integer(t): return "int"
            if pt.is_decimal(t): return "decimal"
            if pt.is_floating(t): return "float"
            if pt.is_timestamp(t): return "timestamp"
            if pt.is_date(t): return "date"
            if pt.is_boolean(t): return "bool"
            if pt.is_string(t) or pt.is_large_string(t): return "string"
            return str(t)
        sfield = {f.name: f.type for f in tab.schema}
        dfield = {f.name: f.type for f in duck.schema}
        tbad = [(c, tcat(sfield[c]), tcat(dfield[c]))
                for c in scols if tcat(sfield[c]) != tcat(dfield[c])]
        if tbad:
            print(f"FAIL {name}: arrow type-category mismatch {tbad}")
            record(name, rows=len(srows), hash_match=False,
                   rows_match=len(srows) == len(drows), schema_match=False,
                   oracle_rows=len(drows), err=f"type_category {tbad}")
            n_bad += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
            record(name, rows=len(srows), hash_match=False, rows_match=False,
                   schema_match=True, oracle_rows=len(drows), err="rowcount")
            n_bad += 1
            continue
        max_fdiff = 0.0
        mism = 0
        first = None
        for i, (a, b) in enumerate(zip(srows, drows)):
            for x, y in zip(a, b):
                x, y = canon(x), canon(y)
                if isinstance(x, float) and isinstance(y, float):
                    if math.isnan(x) and math.isnan(y):
                        continue
                    d = abs(x - y)
                    max_fdiff = max(max_fdiff, d)
                    if x != y:
                        mism += 1
                        if first is None:
                            first = (i, x, y)
                elif x != y:
                    mism += 1
                    if first is None:
                        first = (i, x, y)
        if mism == 0:
            print(f"OK   {name}: rows={len(srows)}")
            record(name, rows=len(srows), hash_match=True, oracle_rows=len(drows))
            n_ok += 1
        else:
            print(f"FAIL {name}: {mism} value mismatches, max_float_diff={max_fdiff}, first={first}")
            record(name, rows=len(srows), hash_match=False, oracle_rows=len(drows))
            n_bad += 1
    if out_json:
        # queries Verify dumped but with no oracle entry = rows-only.
        # ALL subdirectories count, not just q*-named ones — a dumped
        # result with an unconventional name must still land in the
        # artifact (the 'every query is recorded' guarantee).
        import os
        for entry in sorted(os.listdir(out_dir)):
            path = os.path.join(out_dir, entry)
            if not os.path.isdir(path):
                continue  # oracle_sql.json etc.
            name = entry
            if name not in oracle and name not in results:
                tab = load_spark_result(path)
                results[name] = {
                    "rows_match": None, "schema_match": None, "hash_match": None,
                    "spark_rows": tab.num_rows if tab is not None else None,
                    "oracle_rows": None, "err": "no_oracle"}
        json.dump(dict(sorted(results.items())), open(out_json, "w"), indent=2)
        print(f"wrote {out_json}")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
