#!/usr/bin/env python3
"""Local dev mirror of the driver's correctness gate (NOT part of the
library): runs DuckDB on SparkEntry.oracleSql over the same parquet
tables and compares against the parquet written by graft.Verify.

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
    python3 scripts/check.py <sfDir> <outDir>
"""
import json, sys, math

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    return repr(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            exp = con.sql(sql)
            gcols, ecols = sorted(got.columns), sorted(exp.columns)
            if gcols != ecols:
                print(f"FAIL {name}: columns {gcols} != {ecols}")
                continue
            # The driver's hash is TYPE-sensitive (e.g. DuckDB bare
            # sum(BIGINT) -> HUGEINT vs Spark BIGINT hash-fails even
            # when the values match), so compare declared types too.
            gtypes = dict(zip(got.columns, (str(t) for t in got.types)))
            etypes = dict(zip(exp.columns, (str(t) for t in exp.types)))
            tdiff = {c: (gtypes[c], etypes[c])
                     for c in gcols if gtypes[c] != etypes[c]}
            if tdiff:
                print(f"FAIL {name}: column types spark!=duck {tdiff}")
                continue
            grows = got.select(*gcols).fetchall()
            erows = exp.select(*ecols).fetchall()
            if len(grows) != len(erows):
                print(f"FAIL {name}: rows {len(grows)} != {len(erows)}")
                continue
            mismatch = None
            for i, (g, e) in enumerate(zip(grows, erows)):
                cg = tuple(canon(x) for x in g)
                ce = tuple(canon(x) for x in e)
                if cg != ce:
                    mismatch = (i, cg, ce)
                    break
            if mismatch:
                i, cg, ce = mismatch
                print(f"FAIL {name}: row {i}\n  spark={cg}\n  duck ={ce}")
            else:
                print(f"ok   {name} ({len(grows)} rows)")
                n_ok += 1
        except Exception as ex:
            print(f"ERR  {name}: {ex}")
    print(f"{n_ok}/{len(oracle)} passed")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
