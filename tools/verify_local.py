#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/verify_local.py [sfDir] [outDir]

Runs graft.Verify (Spark) to dump each SparkEntry.queries result as parquet
plus oracle_sql.json, then executes each oracle SQL in DuckDB over the same
testdata parquet (tables registered by name) and compares:
  - schema: sorted column-name lists must match
  - types: per-column arrow types must map to the SAME Python value class.
    Calibrated against the driver's r7 verdicts: int32 vs int64 is
    driver-GREEN (both surface as Python int), while DuckDB
    HUGEINT=decimal128(38,0) vs Spark BIGINT=int64 is driver-RED even when
    every value agrees (Decimal vs int) — r7 shipped a false "329/329"
    because this replica erased that distinction via to_pylist equality
    (Decimal(5) == 5 in Python).
  - rows: row counts must match
  - values: cell-by-cell over rows sorted by all columns, columns sorted by
    name; floats compared exactly first, with a report of max abs delta when
    not exact (to decide whether a query needs rounding).
"""
import json
import math
import subprocess
import sys
from pathlib import Path

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
SKIP_SPARK = "--no-spark" in sys.argv


def run_spark():
    cmd = ["sbt", "-batch", f"runMain graft.Verify {SF_DIR} {OUT}"]
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True,
                       timeout=1200)
    sys.stdout.write("\n".join(l for l in r.stdout.splitlines()
                               if "error" in l.lower() or "failed" in l.lower()) + "\n")
    if r.returncode != 0:
        print(r.stdout[-3000:], r.stderr[-2000:])
        sys.exit(1)


def pyclass(t):
    """The Python value class an arrow type surfaces as in to_pylist —
    the grain the driver's hash distinguishes (int32/int64 both 'int',
    but decimal128 is 'Decimal')."""
    import pyarrow as pa
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "Decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "datetime"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{pyclass(t.value_type)}>"
    return str(t)


def compare(name, sql, con):
    res_dir = OUT / name
    if not res_dir.exists():
        return f"MISSING (spark side failed)"
    spark_df = con.execute(
        f"SELECT * FROM parquet_scan('{res_dir}/*.parquet')").fetch_arrow_table()
    try:
        duck_df = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        return f"ORACLE-ERROR {type(e).__name__}: {str(e)[:200]}"
    s_cols, d_cols = sorted(spark_df.column_names), sorted(duck_df.column_names)
    if s_cols != d_cols:
        return f"SCHEMA spark={s_cols} duck={d_cols}"
    type_errs = []
    for c in s_cols:
        st = spark_df.schema.field(c).type
        dt = duck_df.schema.field(c).type
        sf, df_ = pyclass(st), pyclass(dt)
        if sf != df_:
            type_errs.append(f"{c}: spark={st}({sf}) duck={dt}({df_})")
    if type_errs:
        return "TYPE " + "; ".join(type_errs)
    if spark_df.num_rows != duck_df.num_rows:
        return f"ROWS spark={spark_df.num_rows} duck={duck_df.num_rows}"
    import pyarrow.compute as pc
    s = spark_df.select(s_cols).sort_by([(c, "ascending") for c in s_cols])
    d = duck_df.select(d_cols).sort_by([(c, "ascending") for c in d_cols])
    max_delta = 0.0
    for c in s_cols:
        sv, dv = s.column(c).to_pylist(), d.column(c).to_pylist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            if a == b:
                continue
            if a is None or b is None:
                return f"VALUE col={c} row={i}: {a!r} != {b!r}"
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                max_delta = max(max_delta, abs(a - b))
                if abs(a - b) > 1e-9 * max(1.0, abs(a), abs(b)):
                    return f"VALUE col={c} row={i}: {a!r} != {b!r}"
                continue
            return f"VALUE col={c} row={i} ({type(a).__name__}/{type(b).__name__}): {a!r} != {b!r}"
    if max_delta > 0:
        return f"FLOAT-NOISE max_abs_delta={max_delta:.3e} (not exact!)"
    return "OK"


def connect():
    """Bounded-memory connection: the default 80%-of-RAM limit let one
    heavy sf1 oracle exhaust the machine and every later query then
    failed on tiny allocations (the r11 sf1 gate's q252+ cascade). A
    hard cap + disk spill keeps single-query failures contained. The
    cap is min(24GB, half of physical RAM) so the containment holds on
    smaller gate replicas too."""
    try:
        import os
        total_gb = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE") / 2**30
        cap = max(2, min(24, int(total_gb / 2)))
    except (ValueError, OSError):
        cap = 24
    con = duckdb.connect()
    con.execute(f"PRAGMA memory_limit='{cap}GB'")
    con.execute("PRAGMA temp_directory='.tmp/duckdb_spill'")
    for t in TABLES:
        glob = f"{SF_DIR}/{t}.parquet"
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS FROM parquet_scan('{glob}')")
    return con


def main():
    if not SKIP_SPARK:
        run_spark()
    con = connect()
    oracle = json.loads((OUT / "oracle_sql.json").read_text())
    dumped = {p.name for p in OUT.iterdir() if p.is_dir()}
    n_ok = 0
    for name in sorted(set(oracle) | dumped):
        if name not in oracle:
            print(f"{name:32s} NO-ORACLE (rows-only check)")
            continue
        verdict = compare(name, oracle[name], con)
        if verdict.startswith("ORACLE-ERROR"):
            # a failed query can poison the connection (OOM leaves the
            # allocator wedged) — reconnect so one bad oracle cannot
            # cascade into every later verdict
            try:
                con.close()
            except Exception:
                pass
            con = connect()
        n_ok += verdict == "OK"
        print(f"{name:32s} {verdict}", flush=True)
    print(f"\n{n_ok}/{len(oracle)} oracle-matched")


if __name__ == "__main__":
    main()
