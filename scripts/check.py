#!/usr/bin/env python3
"""Local dev mirror of the driver's correctness gate (NOT part of the
library): runs DuckDB on SparkEntry.oracleSql over the same parquet
tables and compares against the parquet written by graft.Verify.

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
    python3 scripts/check.py <sfDir> <outDir>
    python3 scripts/check.py --lint <sfDir> <outDir>
        # type-lint only: DESCRIBE every oracle SQL and fail on any
        # output column DuckDB types as HUGEINT (bare sum() over an
        # integer column) or other Spark-unrepresentable widths — the
        # grad_accum_equiv trap: the driver's hash is TYPE-sensitive,
        # so such a column hash-fails even when values match. Needs
        # only oracle_sql.json, not the Spark result parquet.
"""
import json, sys, math

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# DuckDB output types Spark cannot emit → guaranteed driver hash-fail.
# HUGEINT/UHUGEINT: bare sum()/product() over integer columns (fix:
# CAST(... AS BIGINT)); UBIGINT: e.g. bit_count. DECIMAL beyond (38,18)
# cannot round-trip either, but DuckDB caps at 38 so width alone is
# representable — only the integer-overflow family is flagged.
BANNED_TYPES = ("HUGEINT", "UHUGEINT", "UBIGINT")


def lint_types(con, oracle):
    """DESCRIBE every oracle and flag Spark-unrepresentable columns.
    Returns the number of violations (0 = suite clean)."""
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            rel = con.sql(sql)
            bad = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
                   if any(str(t).startswith(b) for b in BANNED_TYPES)]
        except Exception as ex:
            print(f"ERR  {name}: {ex}")
            n_bad += 1
            continue
        if bad:
            n_bad += 1
            print(f"LINT {name}: Spark-unrepresentable oracle column "
                  f"types {bad} — wrap in CAST(... AS BIGINT)")
    print(f"lint: {n_bad} violation(s) in {len(oracle)} oracles")
    return n_bad


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    return repr(v)


def main(sf_dir, out_dir, lint_only=False):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if lint_only:
        sys.exit(1 if lint_types(con, oracle) else 0)
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
    args = [a for a in sys.argv[1:] if a != "--lint"]
    main(args[0], args[1], lint_only="--lint" in sys.argv)
