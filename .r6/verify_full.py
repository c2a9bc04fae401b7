import sys
sys.path.insert(0, "/root/repo/tests")
sys.path.insert(0, "/root/repo")
import duckdb
from conftest import compare_with_oracle, SF_CORRECT

import importlib.util
spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
entry_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry_mod)

from go_mailio_diskusage_handler_spark.session import build_session

spark = build_session("verify-full-r6")
spark.sparkContext.setLogLevel("ERROR")

# 1. entry() smoke at sf0.001
res = entry_mod.entry(spark)
n = res.count()
print(f"entry(): {n} rows, schema={[f.name for f in res.schema.fields]}", flush=True)
assert n > 0

queries = entry_mod.queries()
oracles = entry_mod.oracle_sql()
print(f"queries: {len(queries)}, oracles: {len(oracles)}", flush=True)

ddb = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    ddb.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_CORRECT}/{t}.parquet')")

fails = []
for i, name in enumerate(queries):
    if name not in oracles:
        print(f"{name}: rows-only (no oracle)", flush=True)
        try:
            assert queries[name](spark, SF_CORRECT).count() >= 0
        except Exception as e:
            print(f"{name}: FAIL {str(e)[:200]}", flush=True); fails.append(name)
        continue
    try:
        compare_with_oracle(spark, ddb, name, queries, oracles)
        print(f"[{i+1}/{len(queries)}] {name}: OK", flush=True)
    except Exception as e:
        print(f"[{i+1}/{len(queries)}] {name}: FAIL {str(e)[:300]}", flush=True)
        fails.append(name)
    if (i + 1) % 25 == 0:
        spark.catalog.clearCache()
print("FAILS:", fails, flush=True)
spark.stop()
sys.exit(1 if fails else 0)
