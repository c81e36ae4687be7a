#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify output
against DuckDB oracles on the same parquet tables and diff values.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, json, glob, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if hasattr(v, "timestamp"):  # datetime
        return str(v)
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    return v

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), x if not isinstance(x, tuple) else str(x)) for x in t))
    return [cols[i] for i in order], out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    import os
    for t in TABLES:
        # driver testdata ships single files; Spark-written grown copies
        # (e.g. /tmp/scale) are directories of part files
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = con.execute(f"SELECT * FROM read_parquet({files})").fetchall()
        gcols = [d[0] for d in con.description]
        try:
            want = con.execute(sql).fetchall()
            wcols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        gc, g = canon(gcols, got)
        wc, w = canon(wcols, want)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}")
            n_fail += 1
        elif g != w:
            n_fail += 1
            diffs = [(a, b) for a, b in zip(g, w) if a != b]
            print(f"FAIL {name}: {len(g)} vs {len(w)} rows, {len(diffs)} differing")
            for a, b in diffs[:3]:
                print(f"   spark: {a}\n   duckdb:{b}")
            if len(g) != len(w):
                only_g = set(map(str, g)) - set(map(str, w))
                only_w = set(map(str, w)) - set(map(str, g))
                for x in list(only_g)[:2]: print(f"   only-spark: {x}")
                for x in list(only_w)[:2]: print(f"   only-duck:  {x}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(g)} rows)")
    # queries without oracle → rows-only
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name not in oracles:
            files = glob.glob(f"{d}/*.parquet")
            n = con.execute(f"SELECT count(*) FROM read_parquet({files})").fetchone()[0] if files else 0
            print(f"ROWS {name}: {n}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
