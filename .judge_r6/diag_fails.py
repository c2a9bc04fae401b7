import sys
sys.path.insert(0, "/root/repo/tests")
sys.path.insert(0, "/root/repo")
import duckdb
from conftest import SF_CORRECT
from go_mailio_diskusage_handler_spark import registry
from go_mailio_diskusage_handler_spark.session import build_session

NAMES = ["events_funnel_rates", "events_ab_test", "dedup_eval_pr",
         "scalar_variant_props", "sql_shipping_modes",
         "udf_iter_model_scores", "percentile_mad_outliers"]

spark = build_session("judge-diag-r6")
spark.sparkContext.setLogLevel("ERROR")
ddb = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    ddb.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_CORRECT}/{t}.parquet')")

for name in NAMES:
    print(f"===== {name}")
    sdf = registry.QUERIES[name](spark, SF_CORRECT)
    cols = sorted(sdf.columns)
    srows = sorted([tuple(r) for r in sdf.select(*cols).collect()], key=str)
    ora = ddb.execute(registry.ORACLE_SQL[name]).df()
    print("  oracle dtypes:", dict(ora.dtypes.astype(str)))
    print("  spark  schema:", {f.name: f.dataType.simpleString() for f in sdf.schema.fields})
    orows = sorted([tuple(r) for r in ora[cols].itertuples(index=False, name=None)], key=str)
    ndiff = 0
    for a, b in zip(srows, orows):
        ra, rb = tuple(map(repr, a)), tuple(map(repr, b))
        if ra != rb:
            ndiff += 1
            if ndiff <= 3:
                print("  spark :", dict(zip(cols, ra)))
                print("  oracle:", dict(zip(cols, rb)))
    print(f"  rows={len(srows)} repr-diff rows={ndiff}")
spark.stop()
