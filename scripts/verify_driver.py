"""Driver replica: verify the __spark_entry__ contract in a fresh process.

Usage: python scripts/verify_driver.py [sf_dir] [query ...]

Replicates the round driver: plain SparkSession (local[8], shuffle=8, no
engine conf — the driver sets none), smoke entry(), then every queries()
entry vs its oracle_sql() twin through DuckDB with repr-normalized
order-insensitive value comparison (exact — the driver hashes with no
tolerance). Pass query names to check a subset; exit code = #failures.
"""
import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

SF = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.01"
ONLY = set(a for a in sys.argv[1:] if "/" not in a)
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in idx))
    return sorted(out)


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("driver-sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    # 1. smoke
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0, "entry() returned 0 rows"
    assert len(df.columns) == 7, df.columns
    print(f"smoke OK: {len(rows)} rows, cols={df.columns}")

    # 2. correctness vs oracle
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    qs = e.queries()
    oracles = e.oracle_sql()
    print(f"{len(qs)} queries, {len(oracles)} oracles")
    n_fail = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            sdf = fn(spark, SF)
            scols = sdf.columns
            srows = sdf.collect()
            if name not in oracles:
                print(f"{name}: rows-only check, {len(srows)} rows")
                continue
            rel = con.execute(oracles[name])
            ocols = [d[0] for d in rel.description]
            orows = rel.fetchall()
            ok_cols = sorted(c.lower() for c in scols) == sorted(
                c.lower() for c in ocols
            )
            a, b = norm_rows(scols, srows), norm_rows(ocols, orows)
            ok = ok_cols and len(srows) == len(orows) and a == b
            status = "OK" if ok else "FAIL"
            if not ok:
                n_fail += 1
                print(f"{name}: {status} cols_match={ok_cols} "
                      f"rows {len(srows)}/{len(orows)}")
                if ok_cols and len(a) == len(b):
                    for x, y in zip(a, b):
                        if x != y:
                            print("  spark:", x)
                            print("  oracle:", y)
                            break
            else:
                print(f"{name}: OK ({len(srows)} rows)")
        except Exception as ex:
            n_fail += 1
            print(f"{name}: ERROR {type(ex).__name__}: {ex}")
    spark.stop()
    print("FAILURES:", n_fail)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
