#!/usr/bin/env python3
"""Self-test for tools/check_oracle.py's artifact integrity.

Fabricates a Verify-style output dir with one query per failure mode
(pass, columns_differ, type_category, rowcount, value mismatch) and
asserts every mode shows up as a row in the --out json — i.e. no
failure mode can silently vanish from the correctness artifact.

Usage: python3 tools/test_check_oracle.py   (exit 0 = all assertions pass)
Driver-side python (pyarrow/duckdb) only — tooling, not an engine dep.
"""
import json, os, subprocess, sys, tempfile
import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))

# check_oracle.py binds read_parquet views for every engine table at
# connect time, so the self-test fabricates one-row placeholders rather
# than depending on /root/testdata existing (the test SQL never reads
# them — they only have to parse as parquet).
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def make_sf_dir(tmp):
    sf_dir = os.path.join(tmp, "sf")
    os.makedirs(sf_dir)
    for t in TABLES:
        pq.write_table(pa.table({"id": pa.array([1], pa.int64())}),
                       os.path.join(sf_dir, f"{t}.parquet"))
    return sf_dir


def write_result(out_dir, name, table):
    d = os.path.join(out_dir, name)
    os.makedirs(d, exist_ok=True)
    pq.write_table(table, os.path.join(d, "part-0.parquet"))


def main():
    with tempfile.TemporaryDirectory() as tmp:
        sf_dir = make_sf_dir(tmp)
        out_dir = os.path.join(tmp, "verify_out")
        os.makedirs(out_dir)
        oracle = {
            # identical → OK row with hash_match true
            "t01_pass": "SELECT CAST(1 AS BIGINT) AS a",
            # spark column named b, oracle a → columns_differ
            "t02_cols": "SELECT CAST(1 AS BIGINT) AS a",
            # spark int64 vs oracle decimal → type_category
            "t03_types": "SELECT CAST(1 AS DECIMAL(10,2)) AS a",
            # spark 2 rows vs oracle 1 → rowcount
            "t04_rows": "SELECT CAST(1 AS BIGINT) AS a",
            # same shape, different value → hash_match false
            "t05_vals": "SELECT CAST(2 AS BIGINT) AS a",
        }
        i64 = pa.int64()
        write_result(out_dir, "t01_pass", pa.table({"a": pa.array([1], i64)}))
        write_result(out_dir, "t02_cols", pa.table({"b": pa.array([1], i64)}))
        write_result(out_dir, "t03_types", pa.table({"a": pa.array([1], i64)}))
        write_result(out_dir, "t04_rows", pa.table({"a": pa.array([1, 1], i64)}))
        write_result(out_dir, "t05_vals", pa.table({"a": pa.array([1], i64)}))
        # a dumped result with no oracle entry → no_oracle row — one
        # q*-named and one with an unconventional name (the sweep walks
        # every subdirectory, not just the q* glob)
        write_result(out_dir, "q_noracle", pa.table({"a": pa.array([1], i64)}))
        write_result(out_dir, "x_oddname", pa.table({"a": pa.array([1], i64)}))
        with open(os.path.join(out_dir, "oracle_sql.json"), "w") as f:
            json.dump(oracle, f)

        out_json = os.path.join(tmp, "correctness.json")
        proc = subprocess.run(
            [sys.executable, os.path.join(HERE, "check_oracle.py"),
             sf_dir, out_dir, "--out", out_json],
            capture_output=True, text=True)
        assert proc.returncode == 1, f"expected rc=1 (failures present), got {proc.returncode}\n{proc.stdout}{proc.stderr}"
        res = json.load(open(out_json))

        # Every query — including every early-FAIL mode — must be present.
        expect = {"t01_pass", "t02_cols", "t03_types", "t04_rows", "t05_vals",
                  "q_noracle", "x_oddname"}
        missing = expect - set(res)
        assert not missing, f"queries missing from artifact: {missing}"

        r = res["t01_pass"]
        assert r["hash_match"] is True and r["err"] is None, r
        r = res["t02_cols"]
        assert r["hash_match"] is False and r["schema_match"] is False, r
        assert r["err"].startswith("columns_differ"), r
        r = res["t03_types"]
        assert r["hash_match"] is False and r["schema_match"] is False, r
        assert r["err"].startswith("type_category"), r
        r = res["t04_rows"]
        assert r["hash_match"] is False and r["rows_match"] is False, r
        assert r["schema_match"] is True and r["err"] == "rowcount", r
        assert r["spark_rows"] == 2 and r["oracle_rows"] == 1, r
        r = res["t05_vals"]
        assert r["hash_match"] is False and r["rows_match"] is True, r
        assert r["err"] is None, r
        r = res["q_noracle"]
        assert r["err"] == "no_oracle" and r["spark_rows"] == 1, r
        r = res["x_oddname"]
        assert r["err"] == "no_oracle" and r["spark_rows"] == 1, r

        print("test_check_oracle: all assertions passed")


if __name__ == "__main__":
    main()
