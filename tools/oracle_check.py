#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables and exact-diff (EXCEPT ALL, both ways)
against the Verify output parquet. Usage: oracle_check.py <sfDir> <verifyOut>.
"""
import duckdb, json, sys

sfdir, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f'{out}/oracle_sql.json'))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        con.sql(f"CREATE OR REPLACE VIEW _spark AS SELECT * FROM '{out}/{name}/*.parquet'")
        con.sql(f"CREATE OR REPLACE VIEW _oracle AS {sql}")
        cols = ', '.join(f'"{c}"' for c in sorted(
            r[0] for r in con.sql("DESCRIBE _spark").fetchall()))
        n_s = con.sql("SELECT count(*) FROM _spark").fetchone()[0]
        n_o = con.sql("SELECT count(*) FROM _oracle").fetchone()[0]
        d1 = con.sql(f"SELECT count(*) FROM (SELECT {cols} FROM _spark EXCEPT ALL SELECT {cols} FROM _oracle)").fetchone()[0]
        d2 = con.sql(f"SELECT count(*) FROM (SELECT {cols} FROM _oracle EXCEPT ALL SELECT {cols} FROM _spark)").fetchone()[0]
        ok = n_s == n_o and d1 == 0 and d2 == 0
        print(f"{name}: spark={n_s} oracle={n_o} diff={d1}+{d2} {'MATCH' if ok else 'MISMATCH'}")
        if not ok:
            fails += 1
            con.sql(f"SELECT {cols} FROM _spark EXCEPT ALL SELECT {cols} FROM _oracle").limit(3).show()
            con.sql(f"SELECT {cols} FROM _oracle EXCEPT ALL SELECT {cols} FROM _spark").limit(3).show()
    except Exception as e:
        fails += 1
        print(f"{name}: ERROR {e}")
sys.exit(1 if fails else 0)
