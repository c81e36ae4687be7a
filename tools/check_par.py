#!/usr/bin/env python3
"""Parallel DuckDB-oracle gate (check.py semantics, N worker processes)
for the SCALE correctness replay (verdict r18 #1): some oracles carry
exact quadratic ground-truth legs that take minutes each on a grown
corpus, so the serial runner would take hours.

Usage: python3 tools/check_par.py <sfDir> <verifyOutDir> <outJson> [nproc]
Writes <outJson> with per-query pass/fail + a summary, exit 1 on any fail.
"""
import sys, json, glob, math, os
from multiprocessing import Pool

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if hasattr(v, "timestamp"):
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


SF_DIR = OUT_DIR = None
THREADS = 4


def one(args):
    import duckdb
    name, sql = args
    con = duckdb.connect()
    con.execute(f"PRAGMA threads={THREADS}")
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    files = glob.glob(f"{OUT_DIR}/{name}/*.parquet")
    if not files:
        return name, "fail", "no spark output"
    try:
        got = con.execute(f"SELECT * FROM read_parquet({files})").fetchall()
        gcols = [d[0] for d in con.description]
        want = con.execute(sql).fetchall()
        wcols = [d[0] for d in con.description]
    except Exception as e:
        return name, "fail", f"oracle error: {e}"
    gc, g = canon(gcols, got)
    wc, w = canon(wcols, want)
    if gc != wc:
        return name, "fail", f"columns {gc} != {wc}"
    if g != w:
        diffs = [(a, b) for a, b in zip(g, w) if a != b]
        detail = f"{len(g)} vs {len(w)} rows, {len(diffs)} differing"
        if diffs:
            detail += f"; first: spark={diffs[0][0]} duck={diffs[0][1]}"
        return name, "fail", detail
    return name, "pass", f"{len(g)} rows"


def init(sf, out, threads):
    global SF_DIR, OUT_DIR, THREADS
    SF_DIR, OUT_DIR, THREADS = sf, out, threads


def main():
    sf_dir, out_dir, out_json = sys.argv[1], sys.argv[2], sys.argv[3]
    nproc = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    threads = max(2, 32 // nproc)
    oracles = sorted(json.load(open(f"{out_dir}/oracle_sql.json")).items())
    results = {}
    with Pool(nproc, initializer=init, initargs=(sf_dir, out_dir, threads)) as pool:
        for name, status, detail in pool.imap_unordered(one, oracles):
            results[name] = {"status": status, "detail": detail}
            print(f"{status.upper()} {name}: {detail}", flush=True)
    n_pass = sum(1 for r in results.values() if r["status"] == "pass")
    n_fail = len(results) - n_pass
    summary = {"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
               "queries": {k: results[k] for k in sorted(results)}}
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"\n{n_pass} pass / {n_fail} fail -> {out_json}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
