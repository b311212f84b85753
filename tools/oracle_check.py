#!/usr/bin/env python3
# Dev tool replicating the driver's DuckDB-oracle gate locally (not part
# of the library build): creates DuckDB views over the testdata parquet,
# runs each oracle_sql.json query, and value-compares against the Spark
# parquet outputs with column-name sorting, like the driver does.
# Usage: python3 tools/oracle_check.py [sfdir] [verify_outdir]
import duckdb, json, glob, os, sys
sfdir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
outdir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
con = duckdb.connect()
for tbl in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{sfdir}/{tbl}.parquet'")
oracle = json.load(open(f'{outdir}/oracle_sql.json'))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f'oracle error: {e}')); continue
    try:
        got = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
    except Exception as e:
        fails.append((name, f'spark output error: {e}')); continue
    # driver-style compare: sort columns by name, then sort rows, compare values
    exp = exp[sorted(exp.columns)]; got = got[sorted(got.columns)]
    if list(exp.columns) != list(got.columns):
        fails.append((name, f'columns: oracle={list(exp.columns)} spark={list(got.columns)}')); continue
    if exp.dtypes.to_dict() != got.dtypes.to_dict():
        note = f'dtypes differ: {[(c, str(exp[c].dtype), str(got[c].dtype)) for c in exp.columns if exp[c].dtype != got[c].dtype]}'
    else:
        note = ''
    e2 = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    g2 = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    if len(e2) != len(g2):
        fails.append((name, f'row count: oracle={len(e2)} spark={len(g2)}')); continue
    try:
        eq = e2.equals(g2)
    except Exception as ex:
        eq = False
    if not eq:
        # find first differing cell
        diff = None
        for c in e2.columns:
            if not (e2[c] == g2[c]).all():
                mask = ~(e2[c] == g2[c])
                i = mask.idxmax()
                diff = f'col {c} row {i}: oracle={e2[c][i]!r} spark={g2[c][i]!r}'
                break
        fails.append((name, f'VALUE MISMATCH {diff} {note}'))
    else:
        print(f'OK   {name} ({len(e2)} rows) {note}')
for name, why in fails:
    print(f'FAIL {name}: {why}')
print(f'\n{len(oracle)-len(fails)}/{len(oracle)} queries match')
