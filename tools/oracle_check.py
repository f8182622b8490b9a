#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 oracle gate (SURVEY.md §5.2.1).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [query ...]

For every query in <verifyOutDir>/oracle_sql.json (or just the named ones):
run the SQL in DuckDB with views named after the 10 fixture tables over
<sfDir>/*.parquet, load the Spark result parquet from <verifyOutDir>/<name>/,
sort columns by name on both sides (mirrors the driver compare described in
the builder prompt), and diff row-by-row.

Exit code = number of failing queries.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    """Normalize a cell for comparison across engines/arrow versions."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # already rounded by the queries; stringify at full precision
        return repr(v)
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    # numpy arrays from pandas
    if hasattr(v, "tolist") and not isinstance(v, (str, bytes)):
        return tuple(canon(x) for x in v.tolist())
    return v


def rows_of(df):
    cols = sorted(df.columns)
    out = []
    for t in df[cols].itertuples(index=False, name=None):
        out.append(tuple(canon(x) for x in t))
    return cols, out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())

    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir, f"{t}.parquet")
        if p.is_dir():
            # Spark directory layout (StressGen frames): glob the parts
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failures = []
    checked = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        checked += 1
        spark_dir = Path(out_dir, name)
        if not spark_dir.exists():
            failures.append(name)
            print(f"FAIL {name}: no Spark output at {spark_dir}")
            continue
        try:
            duck = con.execute(sql).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: DuckDB error: {e}")
            continue
        try:
            spark = duckdb.connect().execute(
                f"SELECT * FROM '{spark_dir}/*.parquet'").fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: cannot read Spark parquet: {e}")
            continue

        # The REAL driver comparator hashes cells with pandas factorize,
        # which throws on array cells (round-1: agg_collect/array_funcs
        # passed here but failed the driver). Mirror its strictness:
        # reject any array/list-typed output column outright.
        arr_cols = [c for c in spark.columns
                    if any(isinstance(v, (list, tuple)) or
                           (hasattr(v, "tolist") and not isinstance(v, (str, bytes)))
                           for v in spark[c].head(20))]
        if arr_cols:
            failures.append(name)
            print(f"FAIL {name}: array-typed output columns {arr_cols} — "
                  "driver comparator cannot hash these; stringify them")
            continue

        dcols, drows = rows_of(duck)
        scols, srows = rows_of(spark)
        if dcols != scols:
            failures.append(name)
            print(f"FAIL {name}: columns differ: duckdb={dcols} spark={scols}")
            continue
        if len(drows) != len(srows):
            failures.append(name)
            print(f"FAIL {name}: row counts differ: duckdb={len(drows)} spark={len(srows)}")
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(drows, srows)) if a != b]
        if bad:
            failures.append(name)
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(drows)} rows differ; first at {i}:")
            print(f"  cols   : {dcols}")
            print(f"  duckdb : {a}")
            print(f"  spark  : {b}")
        else:
            print(f"ok   {name}: {len(drows)} rows, {len(dcols)} cols")

    print(f"\n{checked - len(failures)}/{checked} queries match"
          + (f"; FAILURES: {sorted(failures)}" if failures else ""))
    sys.exit(len(failures))


if __name__ == "__main__":
    main()
