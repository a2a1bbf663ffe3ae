#!/usr/bin/env python3
"""check_oracle with a per-query time budget — for OPTIONAL scale-up
sweeps beyond the driver's sf0.01 gate (e.g. sf0.1), where a handful of
definitional oracles (recursive dedup closures, full wedge
enumerations) are quadratic in DuckDB and would run for hours. Queries
whose ORACLE exceeds the budget are reported as TIMEOUT (not failures);
the Spark side already materialized, so every within-budget query gets
the full value compare.

Usage: python3 tools/check_oracle_budget.py <sfDir> <verifyOutDir> [budget_s]
"""
import json, sys, glob, os, queue, multiprocessing as mp
import duckdb
import pandas as pd
import numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]
budget = float(sys.argv[3]) if len(sys.argv) > 3 else 60.0


def run_oracle(sql, q):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    try:
        q.put(("ok", con.execute(sql).df()))
    except Exception as e:  # noqa: BLE001 — report any engine error verbatim
        q.put(("err", str(e)))


def oracle_df(sql):
    # Drain the queue BEFORE joining the child (r10 ADVICE): a result
    # larger than the OS pipe buffer blocks the child's queue feeder
    # thread at exit, so join(budget)-first misreports exactly the
    # large-result queries a scale-up sweep most needs as TIMEOUT.
    # Poll liveness while waiting (r11 ADVICE): a child that dies without
    # posting is classified immediately, not after the full budget; and
    # the post-result join is BOUNDED + terminated on expiry so a child
    # hanging in teardown (duckdb close) can't stall the whole sweep.
    q = mp.Queue()
    proc = mp.Process(target=run_oracle, args=(sql, q))
    proc.start()
    import time
    deadline = time.monotonic() + budget
    result = None
    while result is None:
        try:
            result = q.get(timeout=min(1.0, max(0.05, deadline - time.monotonic())))
        except queue.Empty:
            if not proc.is_alive():
                # dead child: one last non-blocking drain (it may have
                # posted between our get timing out and its exit)
                try:
                    result = q.get_nowait()
                except queue.Empty:
                    proc.join(5)
                    return ("err", "oracle process died")
            elif time.monotonic() >= deadline:
                proc.terminate()
                proc.join(10)
                if proc.is_alive():
                    proc.kill()
                    proc.join(5)
                return ("timeout", None)
    proc.join(10)
    if proc.is_alive():
        proc.terminate()
        proc.join(5)
    return result


oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
n_pass = n_fail = n_to = 0
for name, sql in sorted(oracle.items()):
    spark_dir = f"{out_dir}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"MISSING SPARK OUT: {name}")
        n_fail += 1
        continue
    kind, odf = oracle_df(sql)
    if kind == "timeout":
        print(f"TIMEOUT {name} (> {budget:.0f}s oracle — skipped)")
        n_to += 1
        continue
    if kind == "err":
        print(f"ORACLE SQL ERROR {name}: {odf}")
        n_fail += 1
        continue
    sdf = pd.concat(
        [pd.read_parquet(f) for f in sorted(glob.glob(f"{spark_dir}/*.parquet"))],
        ignore_index=True)
    odf = odf[sorted(odf.columns)]
    if sorted(sdf.columns) != sorted(odf.columns):
        print(f"FAIL {name}: columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        n_fail += 1
        continue
    sdf = sdf[sorted(sdf.columns)]
    if len(sdf) != len(odf):
        print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
        n_fail += 1
        continue
    ok = True
    for c in odf.columns:
        a, b = sdf[c].to_numpy(), odf[c].to_numpy()
        if (a.dtype.kind in 'iu') != (b.dtype.kind in 'iu') and \
           {a.dtype.kind, b.dtype.kind} <= set('iuf'):
            print(f"FAIL {name}.{c}: dtype kind skew spark={a.dtype} oracle={b.dtype}")
            ok = False
            continue
        if a.dtype.kind == 'f' or b.dtype.kind == 'f':
            aa = a.astype(float); bb = b.astype(float)
            both_nan = np.isnan(aa) & np.isnan(bb)
            eq = both_nan | (aa == bb)
            if not eq.all():
                i = int(np.argmin(eq))
                print(f"FAIL {name}.{c}: first diff row {i}: spark={aa[i]!r} oracle={bb[i]!r}")
                ok = False
        else:
            eq = (pd.Series(a).astype(str).fillna('<NA>') ==
                  pd.Series(b).astype(str).fillna('<NA>'))
            if not eq.all():
                i = int(np.argmin(eq.to_numpy()))
                print(f"FAIL {name}.{c}: first diff row {i}: spark={a[i]!r} oracle={b[i]!r}")
                ok = False
    if ok:
        n_pass += 1
        print(f"PASS {name} ({len(sdf)} rows)")
    else:
        n_fail += 1

print(f"\n{n_pass} pass / {n_fail} fail / {n_to} oracle-timeout")
