#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables and exact-diff (EXCEPT ALL, both ways)
against the Verify output parquet. Usage: oracle_check.py <sfDir> <verifyOut>.

Two comparisons per query:
  1. value-exact: EXCEPT ALL both ways inside DuckDB (multiset equality).
  2. driver-faithful hash: Spark side via pandas.read_parquet (parquet DECIMAL
     -> decimal.Decimal objects), oracle side via duckdb .df() (HUGEINT ->
     float64), columns sorted by name, rows lexsorted, values rendered to str
     and md5'd. This reproduces the external driver's hasher, so a DECIMAL
     '179.60' vs float '179.6' mismatch (r2's failure mode) is red HERE before
     the driver ever sees it.
"""
import duckdb, hashlib, json, sys
import pandas as pd

sfdir, out = sys.argv[1], sys.argv[2]
# optional 3rd arg: comma-separated query-name filter (fast local iteration)
only = set(sys.argv[3].split(',')) if len(sys.argv) > 3 else None

def driver_hash(df):
    """The external driver's view: sort columns by name, lexsort rows, hash
    the string form of every cell. Raises on unsortable cells (e.g. ndarray)
    exactly like the driver's pandas lexsort does."""
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind='mergesort').reset_index(drop=True)
    h = hashlib.md5()
    for row in df.itertuples(index=False):
        h.update(('\x1f'.join(str(v) for v in row) + '\x1e').encode())
    return h.hexdigest()
con = duckdb.connect()
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

# Verify writes UTF-8 unconditionally; q_nfc_canon's probe literals are
# non-ASCII, so never trust the locale's preferred encoding here
oracle = json.load(open(f'{out}/oracle_sql.json', encoding='utf-8'))
# a typo'd filter name must be a hard error, not a silently-empty (and
# therefore green) gate
if only is not None:
    unknown = only - set(oracle)
    if unknown:
        sys.exit(f'unknown query name(s) in filter: {sorted(unknown)}')
fails = 0
for name, sql in sorted(oracle.items()):
    if only is not None and name not in only:
        continue
    try:
        con.sql(f"CREATE OR REPLACE VIEW _spark AS SELECT * FROM '{out}/{name}/*.parquet'")
        # temp TABLE, not view: the oracle SQL (expensive for the all-pairs
        # queries) executes once; EXCEPTs and the hash reuse the materialization
        con.sql(f"CREATE OR REPLACE TEMP TABLE _oracle AS {sql}")
        cols = ', '.join(f'"{c}"' for c in sorted(
            r[0] for r in con.sql("DESCRIBE _spark").fetchall()))
        n_s = con.sql("SELECT count(*) FROM _spark").fetchone()[0]
        n_o = con.sql("SELECT count(*) FROM _oracle").fetchone()[0]
        d1 = con.sql(f"SELECT count(*) FROM (SELECT {cols} FROM _spark EXCEPT ALL SELECT {cols} FROM _oracle)").fetchone()[0]
        d2 = con.sql(f"SELECT count(*) FROM (SELECT {cols} FROM _oracle EXCEPT ALL SELECT {cols} FROM _spark)").fetchone()[0]
        try:
            h_s = driver_hash(pd.read_parquet(f'{out}/{name}'))
            h_o = driver_hash(con.table('_oracle').df())
            hash_ok, hash_note = h_s == h_o, ''
        except Exception as e:
            hash_ok, hash_note = False, f' hash_err={type(e).__name__}: {e}'
        ok = n_s == n_o and d1 == 0 and d2 == 0 and hash_ok
        print(f"{name}: spark={n_s} oracle={n_o} diff={d1}+{d2}"
              f" hash={'OK' if hash_ok else 'FAIL'}{hash_note} {'MATCH' if ok else 'MISMATCH'}")
        if not ok:
            fails += 1
            con.sql(f"SELECT {cols} FROM _spark EXCEPT ALL SELECT {cols} FROM _oracle").limit(3).show()
            con.sql(f"SELECT {cols} FROM _oracle EXCEPT ALL SELECT {cols} FROM _spark").limit(3).show()
    except Exception as e:
        fails += 1
        print(f"{name}: ERROR {e}")
sys.exit(1 if fails else 0)
