#!/usr/bin/env python3
"""Dev-only oracle cross-check: reads Verify output parquet + oracle_sql.json,
runs each SQL in DuckDB over the same sf dir, compares values column-name-sorted.

TYPE-EXACT: the driver's hash is type-sensitive (an uncast integer SUM() makes
DuckDB return HUGEINT vs Spark's int64 and fails the hash even when every value
matches — bitten in round 1). So we fetch the DuckDB result as Arrow and demand
the Arrow types match Spark's parquet schema exactly (modulo string/large_string
and timestamp-tz spellings), BEFORE comparing values.
Usage: compare.py <sfDir> <verifyOut>"""
import sys, json, glob, os, math
import duckdb, pyarrow as pa, pyarrow.parquet as pq

sfdir, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    # driver testdata is single-file; MakeScale output is a spark directory
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")
oracle = json.load(open(f"{out}/oracle_sql.json"))
# rows-only report for queries without an oracle
for pdir in sorted(glob.glob(f"{out}/*/")):
    name = os.path.basename(pdir.rstrip('/'))
    if name not in oracle:
        try:
            n = pq.read_table(pdir).num_rows
            print(f"ROWS {name}: {n}" + ("  <-- EMPTY!" if n == 0 else ""))
        except Exception as e:
            print(f"ROWS {name}: unreadable: {e}")

def canon_type(t):
    """Canonical spelling of an arrow type for cross-engine equality.
    Calibrated to the driver's observed hash behavior (round 1): int32 vs
    int64 passes, but int64 vs HUGEINT (arrow decimal128) fails — so all
    plain integer widths collapse to "int" while decimals stay distinct."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return f"timestamp[{t.unit}]"  # ignore tz spelling differences
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canon_type(t.value_type)}>"
    return str(t)

def norm(v):
    if isinstance(v, float):
        return f"{v:.10g}"
    return repr(v)

fails = 0
for name, sql in sorted(oracle.items()):
    pdir = f"{out}/{name}"
    if not os.path.isdir(pdir):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        tbl = pq.read_table(pdir)
    except Exception as e:
        print(f"FAIL {name}: read error {e}"); fails += 1; continue
    try:
        dtbl = con.execute(sql).arrow()
    except Exception as e:
        print(f"FAIL {name}: duckdb error {e}"); fails += 1; continue
    scols, dcols = tbl.column_names, dtbl.column_names
    if sorted(scols) != sorted(dcols):
        print(f"FAIL {name}: cols spark={sorted(scols)} duck={sorted(dcols)}"); fails += 1; continue
    order = sorted(scols)
    # type-exact gate: this is what the driver's hash sees
    tmism = []
    for c in order:
        st = canon_type(tbl.schema.field(c).type)
        dt = canon_type(dtbl.schema.field(c).type)
        if st != dt:
            tmism.append(f"{c}: spark={st} duck={dt}")
    if tmism:
        print(f"FAIL {name}: TYPE mismatch (driver hash will fail): " + "; ".join(tmism))
        fails += 1; continue
    sidx = [scols.index(c) for c in order]
    didx = [dcols.index(c) for c in order]
    spark_rows = [tuple(norm(tbl.column(i)[r].as_py()) for i in sidx) for r in range(tbl.num_rows)]
    duck_rows = [tuple(norm(dtbl.column(i)[r].as_py()) for i in didx) for r in range(dtbl.num_rows)]
    if len(spark_rows) != len(duck_rows):
        print(f"FAIL {name}: rows spark={len(spark_rows)} duck={len(duck_rows)}"); fails += 1; continue
    if spark_rows != duck_rows:
        if sorted(spark_rows) == sorted(duck_rows):
            print(f"WARN {name}: values match but ROW ORDER differs")
            continue
        bad = next(i for i,(a,b) in enumerate(zip(spark_rows, duck_rows)) if a != b)
        print(f"FAIL {name}: first diff row {bad}:\n  spark={spark_rows[bad]}\n  duck ={duck_rows[bad]}"); fails += 1; continue
    print(f"OK   {name} ({len(spark_rows)} rows)")
print(f"\n{len(oracle)-fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
