#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads a Verify output dir (<name>/ parquet dirs + oracle_sql.json),
runs each oracle SQL in DuckDB against the sf tables, and compares:
column names (sorted), row counts, and values (rows sorted). Reports
exact-match / float-drift / mismatch per query.

Usage: tools/check.py /tmp/verify_out /root/testdata/sf0.001
"""
import sys, os, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        return v
    return v

def key(row):
    def s(c):
        if c is None or str(c) in ('NaT', 'nan', 'None'):
            return '\x00NULL'
        return str(c)
    return tuple(s(c) for c in row)

def compare(name, spark_rows, spark_cols, duck_rows, duck_cols):
    if sorted(spark_cols) != sorted(duck_cols):
        return f"COLS differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    if len(spark_rows) != len(duck_rows):
        return f"ROWCOUNT differ: spark={len(spark_rows)} duck={len(duck_rows)}"
    # reorder duck cols to match spark col order (by name)
    order = [duck_cols.index(c) for c in spark_cols]
    duck_rows = [tuple(r[i] for i in order) for r in duck_rows]
    s = sorted(spark_rows, key=key)
    d = sorted(duck_rows, key=key)
    max_drift = 0.0
    def isnull(v):
        if v is None:
            return True
        if isinstance(v, float) and math.isnan(v):
            return True
        return str(v) == 'NaT'
    for i, (a, b) in enumerate(zip(s, d)):
        for ca, cb, cn in zip(a, b, spark_cols):
            if isnull(ca) and isnull(cb):
                continue
            if isinstance(ca, float) and isinstance(cb, float):
                if math.isnan(ca) and math.isnan(cb):
                    continue
                if ca != cb:
                    drift = abs(ca - cb)
                    max_drift = max(max_drift, drift)
                    if drift > 1e-9 * max(1.0, abs(ca)):
                        return (f"VALUE mismatch row {i} col {cn}: "
                                f"spark={ca!r} duck={cb!r}")
            elif ca != cb:
                if str(ca) == str(cb):
                    continue
                return (f"VALUE mismatch row {i} col {cn}: "
                        f"spark={ca!r} duck={cb!r} "
                        f"(types {type(ca).__name__}/{type(cb).__name__})")
    if max_drift > 0:
        return f"FLOAT-DRIFT max={max_drift:g} (hash would MISMATCH)"
    return "OK"

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    names = sorted([d for d in os.listdir(outdir)
                    if os.path.isdir(os.path.join(outdir, d))])
    n_ok = 0
    for name in names:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"{name}: NO SPARK OUTPUT"); continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        spark_cols = list(sdf.columns)
        spark_rows = [tuple(r) for r in sdf.itertuples(index=False)]
        if name not in oracle:
            print(f"{name}: rows-only check — {len(spark_rows)} rows "
                  f"{'OK' if len(spark_rows) > 0 else 'EMPTY!'}")
            n_ok += 1 if len(spark_rows) > 0 else 0
            continue
        try:
            res = con.execute(oracle[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}"); continue
        verdict = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
        if verdict == "OK":
            n_ok += 1
        print(f"{name}: {verdict}  ({len(spark_rows)} rows)")
    print(f"== {n_ok}/{len(names)} OK ==")
    # boundary-sensitivity lint: the round-9 convention bans round()
    # of float quotients in hashed oracle columns — a construct whose
    # half-boundary behavior differs across DuckDB VERSIONS (the
    # sandbox pins 1.0.0; the driver runs newer), so a violation can
    # be green here and red at the gate. lint_oracles.py fails the
    # check when one reappears. (A true multi-version sweep needs
    # additional duckdb wheels, which the zero-egress sandbox cannot
    # fetch — the lint enforces the convention that makes results
    # version-independent by construction instead.)
    import subprocess
    lint = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "lint_oracles.py"),
         outdir])
    # output-type lint: DESCRIBE every oracle and fail on HUGEINT
    # (always the un-cast aggregate bug — dtype-sensitive driver hash)
    # and on non-grandfathered DECIMAL/DOUBLE columns. This is the
    # structural kill for the round-9 48-query regression class,
    # which the round()-regex lint above cannot see.
    tlint = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "lint_types.py"),
         outdir, sfdir])
    if lint.returncode != 0 or tlint.returncode != 0:
        sys.exit(1)

if __name__ == "__main__":
    main()
