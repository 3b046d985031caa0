"""Bisect which stage of the validation job anti-scales: run isolated
pieces at a given master and print per-piece wall times."""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

master = sys.argv[1] if len(sys.argv) > 1 else "local[32]"
data = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dvs_bench_sequences_400000"

from data_validation_spark.session import get_spark
from pyspark.sql import functions as F

cores = int(master.split("[")[1].rstrip("]"))
spark = get_spark(app_name=f"probe-{cores}", master=master,
                  shuffle_partitions=cores)
df = spark.read.parquet(data)
df.limit(100).count()  # warm

t = {}

def timed(name, fn):
    t0 = time.time()
    r = fn()
    t[name] = round(time.time() - t0, 2)
    print(f"{name}: {t[name]}s", file=sys.stderr, flush=True)
    return r

# 1. raw scan + cheap agg (no tokens)
timed("scan_notokens", lambda: df.agg(F.sum("n_tok")).collect())
# 2. scan incl tokens + size agg
timed("scan_tokens_size", lambda: df.agg(F.sum(F.array_size("tokens"))).collect())
# 3. tokens element min/max (array_min/max)
timed("tokens_elem", lambda: df.agg(F.min(F.array_min("tokens")),
                                    F.max(F.array_max("tokens"))).collect())
# 4. numeric agg with percentile_approx 101 probs acc 10000, grouped
from data_validation_spark.functions.stats import numeric_agg_exprs
timed("grouped_percentiles", lambda: df.groupBy("source", "bucket")
      .agg(*numeric_agg_exprs("n_tok", "n_tok")).collect())
# 5. percentile over size(tokens) grouped (tokens_agg path)
from data_validation_spark.functions.stats import tokens_agg_exprs
timed("grouped_tokens_aggs", lambda: df.groupBy("source", "bucket")
      .agg(*tokens_agg_exprs("tokens", "tokens")).collect())
# 6. uniqueness two-phase
from data_validation_spark.operators.constraints import uniqueness_violations
timed("uniqueness", lambda: uniqueness_violations(
    df, ["doc_id"], ["source", "bucket"]).count())
# 7. row-level constraints
from data_validation_spark.operators.constraints import row_level_violations
from data_validation_spark.plans.suite import Constraint
cs = [Constraint("len_consistency", "expression",
                 {"sql": "tokens is null or size(tokens) = n_tok"}),
      Constraint("vocab_bounds", "expression",
                 {"sql": "tokens is null or (array_min(tokens) >= 0 "
                         "and array_max(tokens) < 50257)"})]
timed("rowlevel", lambda: row_level_violations(
    df, cs, ["source", "bucket"]).count())

print(json.dumps({"master": master, **t}))
