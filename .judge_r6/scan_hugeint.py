"""Scan every oracle for columns DuckDB types as HUGEINT (or other
types that pandas .df() will render as float64 while Spark emits
integers) — the exact class that broke 7 of 50 driver hashes in r6."""
import sys
sys.path.insert(0, "/root/repo")
import duckdb
from go_mailio_diskusage_handler_spark import registry

SF = "/root/testdata/sf0.01"
ddb = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    ddb.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

import json
prior = set()
for r in range(1, 7):
    with open(f"/root/repo/CORRECTNESS_r{r:02d}.json") as f:
        prior |= set(json.load(f))

flagged = {}
for name, sql in registry.ORACLE_SQL.items():
    try:
        rel = ddb.sql(sql)
        bad = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
               if str(t) in ("HUGEINT", "UHUGEINT", "UBIGINT")]
        if bad:
            flagged[name] = bad
    except Exception as e:
        flagged[name] = [("ERROR", str(e)[:120])]
print(f"{len(flagged)} oracles with HUGEINT-class columns:")
for n, b in sorted(flagged.items()):
    status = "CHECKED" if n in prior else "never-checked"
    print(f"  {n} [{status}]: {b}")
print()
never = [n for n in registry.QUERIES if n not in prior]
print(f"registry={len(registry.QUERIES)} cumulative-checked={len(prior & set(registry.QUERIES))} never-checked={len(never)}")
print("never-checked:", never)
