#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [only]

  only: optional comma-separated query names for a TARGETED run (pass
        the same list you passed to graft.Verify) — names outside it
        are skipped without penalty.

Registers the sfDir parquet tables in DuckDB, runs each oracle SQL from
<verifyOutDir>/oracle_sql.json, and compares against the Spark result
parquet in <verifyOutDir>/<name>/ — columns sorted by name, rows sorted
by all columns, exact value equality (what a value-hash would see).

On a FULL run (no `only` list) a missing dump directory is a FAIL, not
a skip: Verify swallows per-query exceptions, so a crashing registered
query leaves no dump — silently skipping it would pass the gate on a
query that never ran.
"""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: ints -> int64, floats -> float64, bools -> bool
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("bool")
        elif isinstance(df[c].dtype, pd.DatetimeTZDtype) or pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

class OracleTimeout(Exception):
    pass

def oracle_df(con, sql, timeout_s):
    """Run one oracle query, optionally under a wall-clock cap.

    The timer's interrupt runs under a lock shared with a done-flag, so
    a query that finishes just before the timer fires marks itself done
    and the late callback no-ops instead of poisoning the shared
    connection. If a stale interrupt still lands between queries, the
    next execute raises instantly with THIS query's fired-flag unset —
    distinguishable from a genuine timeout — and is retried once.
    """
    if timeout_s <= 0:
        return con.execute(sql).df()
    import threading
    lock = threading.Lock()
    state = {"done": False, "fired": False}
    def _fire():
        with lock:
            if not state["done"]:
                state["fired"] = True
                con.interrupt()
    timer = threading.Timer(timeout_s, _fire)
    timer.start()
    try:
        for attempt in (0, 1):
            try:
                df = con.execute(sql).df()
                with lock:
                    state["done"] = True
                return df
            except duckdb.InterruptException:
                with lock:
                    if state["fired"] or attempt == 1:
                        state["done"] = True
                        raise OracleTimeout()
                # stale interrupt from a prior query: retry once
    finally:
        timer.cancel()

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = p.split("/")[-1].replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    n_skip = n_timeout = 0
    for name, sql in sorted(oracle.items()):
        # names outside an explicit targeted list are skipped before
        # touching disk (the oracle SQL — all-pairs jaccard, recursive
        # closures — is far more expensive than a parquet read)
        if only is not None and name not in only:
            n_skip += 1
            continue
        # a missing dump for a name we WERE asked to check means the
        # query crashed inside Verify (which swallows exceptions) or
        # was never dumped — that is a gate failure, not a skip
        import os
        if not os.path.isdir(f"{out_dir}/{name}"):
            print(f"FAIL {name}: no dump at {out_dir}/{name} "
                  "(query crashed in Verify, or name not dumped?)")
            n_fail += 1
            continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in
                       sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))],
                       ignore_index=True))
        except Exception as e:
            print(f"FAIL {name}: spark result read error: {e}")
            n_fail += 1
            continue
        # GRAFT_ORACLE_TIMEOUT=<seconds>: opt-in per-query cap for
        # exploratory scale sweeps — some oracles are pathologically
        # slower than the engine they check (the sf0.1 WITH RECURSIVE
        # star-closure burned 2.5 CPU-hours in DuckDB against a 4 s
        # Spark answer). A timed-out ORACLE is reported and counted
        # separately: it is no evidence either way about the engine,
        # and must not wedge the rest of the sweep. Leave unset for
        # gate runs — there every oracle must actually complete.
        timeout_s = float(os.environ.get("GRAFT_ORACLE_TIMEOUT", "0"))
        try:
            want = canon(oracle_df(con, sql, timeout_s))
        except OracleTimeout:
            print(f"TIMEOUT {name}: oracle exceeded {timeout_s}s (engine unchecked)")
            n_timeout += 1
            continue
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_fail += 1
        elif not got.equals(want):
            neq = (got != want) & ~(got.isna() & want.isna())
            bad_cols = [c for c in got.columns if neq[c].any()]
            print(f"FAIL {name}: value mismatch in {bad_cols} "
                  f"({int(neq.any(axis=1).sum())}/{len(got)} rows)")
            for c in bad_cols[:2]:
                i = neq[c].idxmax()
                print(f"  e.g. row {i} col {c}: spark={got[c][i]!r} oracle={want[c][i]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    skipped = f", {n_skip} skipped (outside --only)" if n_skip else ""
    timed = f", {n_timeout} oracle-timeout (engine unchecked)" if n_timeout else ""
    print(f"== {n_pass} pass, {n_fail} fail{skipped}{timed} ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    only = None
    if len(sys.argv) > 3:
        only = {n.strip() for n in sys.argv[3].split(",") if n.strip()}
    sys.exit(main(sys.argv[1], sys.argv[2], only))
