#!/usr/bin/env python3
"""Regenerate src/test/scala/graft/GoldenSchemas.scala from a verified
`graft.Verify` dump (dev tool only). Usage:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout"
    python3 tools/verify_local.py /root/testdata/sf0.01 /tmp/vout --skip-spark
    python3 tools/golden_schemas.py /tmp/vout

Only regenerate from a dump that just passed the oracle compare —
the golden file pins INTENTIONAL schemas, so a failing dump must
never be snapshotted.
"""
import os
import sys

import duckdb

HEADER = '''package graft

/** Golden sorted-column-name snapshot for every registered key,
  * generated from a fully verified `graft.Verify` dump (the same
  * parquet the driver's comparator reads). Regenerate via
  * tools/golden_schemas.py after intentionally changing an output
  * schema — an UNintentional change (the round-10 `graph_lpa_exact`
  * cache-refactor regression) fails OperatorSmokeSpec immediately
  * instead of surfacing as a driver-side column mismatch a round
  * later. */
object GoldenSchemas {
  val cols: Map[String, String] = Map(
'''


def main():
    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
    keys = sorted(d for d in os.listdir(base)
                  if os.path.isdir(os.path.join(base, d)))
    lines = []
    for k in keys:
        rel = duckdb.sql(
            f"select * from read_parquet('{base}/{k}/*.parquet') limit 0")
        lines.append(f'    "{k}" -> "{",".join(sorted(rel.columns))}",')
    body = "\n".join(lines)[:-1]
    out = "src/test/scala/graft/GoldenSchemas.scala"
    with open(out, "w") as f:
        f.write(HEADER + body + "\n  )\n}\n")
    print(f"wrote {out} ({len(keys)} keys)")


if __name__ == "__main__":
    main()
