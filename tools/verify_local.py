#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — not
part of the library). Usage:

    python3 tools/verify_local.py <sfDir> <outDir> [--skip-spark] [keys...]

1. Runs `sbt "runMain graft.Verify <sfDir> <outDir>"` (unless --skip-spark).
2. Registers each <sfDir>/<table>.parquet under its bare table name in
   DuckDB, runs every statement in <outDir>/oracle_sql.json.
3. Compares against <outDir>/<name>/*.parquet: column names (sorted),
   row count, and value-by-value equality in plan order.
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list) or type(v).__name__ == "ndarray":
        return tuple(norm(x) for x in v)
    return v


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])

    if "--skip-spark" not in flags:
        r = subprocess.run(
            ["sbt", f'runMain graft.Verify {sf_dir} {out_dir}'],
            capture_output=True, text=True, cwd=Path(__file__).parent.parent)
        if r.returncode != 0:
            print(r.stdout[-4000:], r.stderr[-4000:])
            sys.exit("sbt Verify failed")
        for line in r.stderr.splitlines():
            if "[verify]" in line:
                print(line)

    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        res_dir = Path(out_dir) / name
        try:
            got_rel = con.sql(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
            want_rel = con.sql(sql)
            got_types = dict(zip(got_rel.columns, map(str, got_rel.types)))
            want_types = dict(zip(want_rel.columns, map(str, want_rel.types)))
            got = got_rel.fetchdf()
            want = want_rel.fetchdf()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} vs oracle {wc}")
            n_fail += 1
            continue
        # Nested output columns (LIST/STRUCT/MAP) crash the DRIVER's
        # pandas sort_values ("unhashable type: numpy.ndarray") even
        # though norm() below would tuple-ize them fine — this gate must
        # be at least as strict as the driver's (round-8 harness-parity
        # miss: embed_quantize_int8). Render arrays as scalar strings.
        def nested(t):
            return "[" in t or t.startswith("STRUCT") or t.startswith("MAP")
        nbad = [(c, got_types[c], want_types[c]) for c in gc
                if nested(got_types[c]) or nested(want_types[c])]
        if nbad:
            print(f"FAIL {name}: nested output column(s) would crash the "
                  "driver's comparator: "
                  + ", ".join(f"{c}: {g} / {w}" for c, g, w in nbad))
            n_fail += 1
            continue
        # Type-sensitive: the driver hashes typed values, so HUGEINT vs
        # BIGINT (DuckDB integer SUM) hash-mismatches even when pandas
        # values compare equal. Catch it here, before the driver does.
        # Types are compared up to the driver's effective normalization
        # (pandas dtype classes): all machine ints collapse to int64 and
        # DATE/TIMESTAMP to datetime64 — empirically hash-green in r7 —
        # while HUGEINT becomes object and hash-breaks, so it stays its
        # own class.
        def tclass(t):
            if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT"):
                return "int"
            if t in ("FLOAT", "DOUBLE"):
                return "float"
            if t in ("DATE", "TIMESTAMP", "TIMESTAMP_NS", "TIMESTAMP WITH TIME ZONE"):
                return "datetime"
            return t
        # DECIMAL/HUGEINT ban on the hashed surface: even when BOTH
        # sides agree (so tclass passes), the DRIVER's two read paths
        # canonicalize DECIMAL differently (r12: graph_walk_embed was
        # value-identical yet hash-red — the only key with
        # DECIMAL(38,0) output columns). DECIMAL/HUGEINT are fine in
        # intermediate arithmetic; the final SELECT must CAST to
        # BIGINT/DOUBLE/VARCHAR/DATE/TIMESTAMP/BOOLEAN.
        decbad = [(c, got_types[c], want_types[c]) for c in gc
                  if any(t.startswith("DECIMAL") or t == "HUGEINT"
                         for t in (got_types[c], want_types[c]))]
        if decbad:
            print(f"FAIL {name}: DECIMAL/HUGEINT on the hashed output "
                  "surface (driver hasher canonicalizes these "
                  "inconsistently — CAST the final SELECT): "
                  + ", ".join(f"{c}: {g} / {w}" for c, g, w in decbad))
            n_fail += 1
            continue
        tbad = [(c, got_types[c], want_types[c]) for c in gc
                if tclass(got_types[c]) != tclass(want_types[c])]
        if tbad:
            print(f"FAIL {name}: type mismatch (spark-parquet vs oracle): "
                  + ", ".join(f"{c}: {g} vs {w}" for c, g, w in tbad))
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs oracle {len(want)}")
            n_fail += 1
            continue
        got, want = got[gc], want[gc]
        bad = None
        for i in range(len(got)):
            rg = tuple(norm(v) for v in got.iloc[i])
            rw = tuple(norm(v) for v in want.iloc[i])
            if rg != rw:
                bad = (i, rg, rw)
                break
        if bad:
            print(f"FAIL {name}: first diff at row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
