#!/usr/bin/env python3
"""Local cross-check of dumped query parquet vs its DuckDB oracle,
mimicking the driver's compare: sort columns by name, compare row
counts, schemas (loosely), and a value hash. usage:
  compare_one.py <sfDir> <outDir> <query> [query...]"""
import sys, duckdb, hashlib

def canon(df):
    df = df[sorted(df.columns)]
    rows = sorted(tuple(str(v) for v in r) for r in df.itertuples(index=False))
    h = hashlib.md5(repr(rows).encode()).hexdigest()
    return len(rows), h, rows

def main():
    sf, out, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    for n in names:
        con = duckdb.connect()
        for t in ("documents", "embeddings", "events", "lineitem", "orders",
                  "customer", "supplier", "part", "nation", "region"):
            try:
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
            except Exception:
                pass
        spark_df = duckdb.query(f"SELECT * FROM read_parquet('{out}/{n}/*.parquet')").df()
        sql = open(f"{out}/{n}.sql").read()
        ora_df = con.execute(sql).df()
        (nr_s, h_s, rows_s), (nr_o, h_o, rows_o) = canon(spark_df), canon(ora_df)
        ok = nr_s == nr_o and h_s == h_o
        print(f"{n}: rows {nr_s} vs {nr_o}, hash {'MATCH' if h_s == h_o else 'MISMATCH'}")
        if not ok:
            ss, so = set(rows_s), set(rows_o)
            for r in list(ss - so)[:5]:
                print("  spark-only:", r)
            for r in list(so - ss)[:5]:
                print("  oracle-only:", r)

main()
