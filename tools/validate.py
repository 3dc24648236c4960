#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Dev tool only (NOT part of the Scala library): after
  sbt "runMain graft.Verify <sfDir> <outDir>"
this compares each <outDir>/<name> parquet against the oracle SQL in
<outDir>/oracle_sql.json executed by DuckDB over <sfDir>/*.parquet.

Compare is order-insensitive: columns sorted by name, rows sorted,
floats rounded to 15 significant decimals before hashing. (15, not 6:
the driver's comparator is higher-precision than 6 sig figs — a
cents-level rounding tie that 6g hid got through this gate in rounds
1-2 and failed on the driver. 15g still forgives last-ulp libm noise.)
"""
import sys, json, glob, os, math
import duckdb

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): v = "NaN"
                else: v = f"{v:.15g}"
            vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return out

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    if only:  # optional comma-separated name filter (dev iteration)
        keep = set(only.split(","))
        oracle = {k: v for k, v in oracle.items() if k in keep}
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            sdf = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchall()
            scols = [d[0] for d in con.description]
            orel = con.sql(sql)
            ocols, otypes = orel.columns, [str(t) for t in orel.types]
            odf = orel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        # HUGEINT/DECIMAL oracle columns hash differently under a
        # dtype-sensitive comparator (HUGEINT -> float "1.0" vs int64 "1")
        # even when values are identical — DuckDB's sum(int) returns
        # HUGEINT, so CAST aggregates to BIGINT in the oracle SQL. This
        # exact blind spot cost two rounds on e_sessionize.
        risky = [(c, t) for c, t in zip(ocols, otypes)
                 if t in ("HUGEINT", "UHUGEINT") or t.startswith("DECIMAL")]
        if risky:
            print(f"FAIL {name}: driver-risky oracle types {risky} — CAST to BIGINT/DOUBLE")
            n_bad += 1; continue
        if sorted(map(str.lower, scols)) != sorted(map(str.lower, ocols)):
            print(f"FAIL {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
            n_bad += 1; continue
        a, b = canon(sdf, [c.lower() for c in scols]), canon(odf, [c.lower() for c in ocols])
        if a == b:
            print(f"OK   {name}: {len(a)} rows"); n_ok += 1
        else:
            n_bad += 1
            # hoist the sets: building set(b) inside the comprehension
            # re-hashes the full result per ELEMENT (O(n^2) — wedged 40+
            # CPU-minutes on a 6M-row mismatch at the sf1 sweep)
            sb, sa = set(b), set(a)
            diff_a = [x for x in a if x not in sb][:3]
            diff_b = [x for x in b if x not in sa][:3]
            print(f"FAIL {name}: rows spark={len(a)} oracle={len(b)}")
            for d in diff_a: print(f"   spark-only: {d!r}")
            for d in diff_b: print(f"  oracle-only: {d!r}")
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
