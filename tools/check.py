#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfdir> <verify_out_dir>
Reads each <name>/ parquet written by graft.Verify and compares
row-count, sorted column names, and cell values against the oracle SQL
run in DuckDB over the same parquet tables. NOT part of the library —
driver-side test tooling only.
"""
import json, sys, glob, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{outdir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            sp = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
            du = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        sp = sp.reindex(sorted(sp.columns), axis=1)
        du = du.reindex(sorted(du.columns), axis=1)
        if list(sp.columns) != list(du.columns):
            print(f"FAIL {name}: cols spark={list(sp.columns)} duck={list(du.columns)}")
            n_fail += 1; continue
        if len(sp) != len(du):
            print(f"FAIL {name}: rows spark={len(sp)} duck={len(du)}"); n_fail += 1; continue
        # Sort on scalar (hashable) columns only — array/struct cells are
        # numpy arrays pandas cannot sort/factorize. Non-scalar columns
        # still participate in the value compare below.
        def _scalar_cols(df):
            return [c for c in df.columns
                    if not df[c].map(lambda v: hasattr(v, "__len__")
                                     and not isinstance(v, (str, bytes))).any()]
        keys = _scalar_cols(sp) or list(sp.columns)
        sp2 = sp.sort_values(keys).reset_index(drop=True)
        du2 = du.sort_values(keys).reset_index(drop=True)
        # Dtype drift gate: the driver's compare hashes TYPED values, so a
        # DOUBLE vs BIGINT drift fails there even when every value matches
        # (r12's q_ship_latency). Never coerce before comparing — fail on
        # any dtype KIND mismatch (float vs int vs object vs datetime).
        # Width-only differences (int32 vs int64) are driver-accepted
        # (12 rounds of passing rank()/length() int32 columns prove it) —
        # reported as a note, not a failure.
        def kind(dt):
            k = getattr(dt, "kind", "O")
            return "i" if k in "iu" else k
        drift = [(c, str(sp2[c].dtype), str(du2[c].dtype))
                 for c in sp.columns
                 if kind(sp2[c].dtype) != kind(du2[c].dtype)]
        if drift:
            print(f"FAIL {name}: dtype drift {drift}")
            n_fail += 1; continue
        widths = [(c, str(sp2[c].dtype), str(du2[c].dtype))
                  for c in sp.columns if sp2[c].dtype != du2[c].dtype]
        wnote = f" [width-only dtype diffs: {widths}]" if widths else ""
        bad = None
        for c in sp.columns:
            a, b = sp2[c], du2[c]
            try:
                eq = (a.fillna("§") == b.fillna("§")) if a.dtype == object else \
                     ((a.isna() & b.isna()) | (a == b))
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                i = (~eq).idxmax()
                bad = (c, a[i], b[i]); break
        if bad:
            print(f"FAIL {name}: col {bad[0]} spark={bad[1]!r} duck={bad[2]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sp)} rows){wnote}"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
