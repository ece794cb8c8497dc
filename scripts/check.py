#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify's
parquet dumps against DuckDB executing oracle_sql.json on the same
fixture tables, sort columns by name, sort rows, and compare values.

Usage: python3 scripts/check.py [--rel-tol=R] [--abs-tol=A[:name,...]]
       <sfDir> <outDir> [name ...]

--rel-tol is for the LARGE-scale sweeps only (the driver's sf0.01 gate
is exact, and this script stays exact by default): at sf1 magnitudes
(decimal sums ~4e11) DuckDB's decimal->double conversion lands 1 ULP
off the correctly-rounded double the JVM produces (verified against
python Decimal: Spark's cells are the correctly-rounded ones), so a
rel-tol of 1e-12 admits that conversion artifact while still failing
any real arithmetic divergence by four orders of magnitude.
"""
import sys, json, math, glob
import duckdb
import pandas as pd

REL_TOL = 0.0
ABS_TOL = 0.0
ABS_TOL_ONLY = None  # set of query names the abs tolerance applies to

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        ignore_index=True, na_position="last")
    return df

def cmp_cell(a, b, abs_tol=0.0):
    if a is None and b is None:
        return True, 0.0
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None or (isinstance(a, float) and math.isnan(a)) != (isinstance(b, float) and math.isnan(b)):
            return False, float("inf")
        if isinstance(a, float) and math.isnan(a):
            return True, 0.0
        d = abs(float(a) - float(b))
        eq = (a == b) or (REL_TOL > 0 and
                          d <= REL_TOL * max(abs(float(a)), abs(float(b)))) \
            or (abs_tol > 0 and d <= abs_tol)
        return eq, d
    return a == b, 0.0

def main():
    global REL_TOL, ABS_TOL, ABS_TOL_ONLY
    args = []
    for a in sys.argv[1:]:
        if a.startswith("--rel-tol="):
            REL_TOL = float(a.split("=", 1)[1])
        elif a.startswith("--abs-tol="):
            # for cancellation shapes (x - global_avg): the oracle
            # avg's 1-ULP conversion error is a constant ABSOLUTE
            # offset that dwarfs the relative scale of a near-zero
            # difference column. Scope it to the named queries
            # (--abs-tol=1e-9:qA,qB) — applied globally it can mask
            # genuine divergence in any small-magnitude cell; unscoped
            # use warns and reports per-query max deltas either way.
            spec = a.split("=", 1)[1]
            if ":" in spec:
                tol, names = spec.split(":", 1)
                ABS_TOL = float(tol)
                ABS_TOL_ONLY = set(n for n in names.split(",") if n)
            else:
                ABS_TOL = float(spec)
                print("WARNING: --abs-tol without :name,... applies to "
                      "EVERY numeric cell of every query — scope it "
                      "(--abs-tol=1e-9:qname) to keep small-magnitude "
                      "cells honest", file=sys.stderr)
        else:
            args.append(a)
    sfdir, outdir = args[0], args[1]
    only = set(args[2:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            files = glob.glob(f"{outdir}/{name}/*.parquet")
            got = pd.concat([pd.read_parquet(f) for f in files]) if files else None
            if got is None:
                print(f"FAIL {name}: no spark output"); n_fail += 1; continue
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        got, exp = norm(got), norm(exp)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols spark={list(got.columns)} duck={list(exp.columns)}")
            n_fail += 1; continue
        # Driver hashes values dtype-strictly: int64 3117361715 vs float64
        # 3117361715.0 is a FAIL there, so flag any dtype-kind mismatch here.
        kinds = [(c, got[c].dtype.kind, exp[c].dtype.kind)
                 for c in got.columns if got[c].dtype.kind != exp[c].dtype.kind]
        if kinds:
            print(f"FAIL {name}: dtype kinds (col, spark, duck) = {kinds}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} duck={len(exp)}")
            n_fail += 1; continue
        q_abs_tol = ABS_TOL if (ABS_TOL_ONLY is None
                                or name in ABS_TOL_ONLY) else 0.0
        bad = 0; maxdiff = 0.0; first = None
        ga, ea = got.to_numpy(), exp.to_numpy()
        for i in range(len(got)):
            for j in range(len(got.columns)):
                ok, d = cmp_cell(ga[i][j], ea[i][j], q_abs_tol)
                maxdiff = max(maxdiff, d if d != float("inf") else 0)
                if not ok:
                    bad += 1
                    if first is None:
                        first = (i, got.columns[j], ga[i][j], ea[i][j])
        if bad:
            print(f"FAIL {name}: {bad} cells differ, first={first}, maxfloatdiff={maxdiff:.3g}")
            n_fail += 1
        else:
            # keep tolerance-masked deltas visible (r7 ADVICE): report
            # the max float delta whenever a tolerance admitted cells
            tol_note = (f" (maxfloatdiff={maxdiff:.3g} under tol)"
                        if maxdiff > 0 and (REL_TOL > 0 or q_abs_tol > 0)
                        else "")
            print(f"PASS {name} ({len(got)} rows){tol_note}")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
