#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads every query result parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB (tables = views over the sfDir
parquet fixtures), sorts columns by name and rows by all columns, and
compares cell-by-cell EXACTLY (floats included — queries are responsible for
rounding both sides identically; a strict gate here is what guarantees the
driver's hash compare passes).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


# Int widths (TINYINT..BIGINT) all surface as exact Python ints and hash
# identically in the driver; HUGEINT does NOT (pandas widens it to float64),
# which is the round-1 failure mode — so widths collapse but HUGEINT stays
# distinct and fails the compare.
INT_WIDTHS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
              "UTINYINT", "USMALLINT", "UINTEGER"}


def typ(t):
    s = str(t)
    return "INTLIKE" if s in INT_WIDTHS else s


def canon(rows, cols, types):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out, [typ(types[i]) for i in order]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols, s_rows, s_types = canon(
                spark_rel.fetchall(), spark_rel.columns, spark_rel.types)
            duck_rel = con.sql(sql)
            d_cols, d_rows, d_types = canon(
                duck_rel.fetchall(), duck_rel.columns, duck_rel.types)
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        # The driver's compare pandas-sort_values the rows; list/array cells
        # raise "unhashable type: numpy.ndarray" there and zero the query
        # (round-2 q116/q123/q124). Flag them here so pre-flight mirrors it.
        arr_cols = [s_cols[c] for c in range(len(s_cols))
                    if any(isinstance(r[c], (list, tuple)) for r in s_rows)
                    or any(isinstance(r[c], (list, tuple)) for r in d_rows)]
        if arr_cols:
            print(f"FAIL {name}: array-typed output columns {arr_cols} "
                  f"would crash the driver compare — array_join them")
            n_fail += 1
            continue
        if s_cols != d_cols:
            print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}")
            n_fail += 1
            continue
        # Type-sensitive: the driver hashes typed values, so a DuckDB HUGEINT
        # sum vs a Spark BIGINT mismatches even when the values are equal.
        if s_types != d_types:
            print(f"FAIL {name}: types spark={s_types} duck={d_types}")
            n_fail += 1
            continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}")
            n_fail += 1
            continue
        bad = 0
        for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
            for c, (sv, dv) in enumerate(zip(sr, dr)):
                if sv == dv:
                    # -0.0 == 0.0 in Python but hashes differently in the
                    # driver's typed compare (round-3 q44). Flag sign-of-zero
                    # divergence even though == passes.
                    if (isinstance(sv, float) and isinstance(dv, float)
                            and sv == 0.0
                            and math.copysign(1, sv) != math.copysign(1, dv)):
                        if bad < 3:
                            print(f"  {name} row {i} col {s_cols[c]}: "
                                  f"signed-zero spark={sv!r} duck={dv!r}")
                        bad += 1
                    continue
                if bad < 3:
                    print(f"  {name} row {i} col {s_cols[c]}: "
                          f"spark={sv!r} duck={dv!r}")
                bad += 1
        if bad:
            print(f"FAIL {name}: {bad} mismatched cells "
                  f"(of {len(s_rows)} rows)")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
