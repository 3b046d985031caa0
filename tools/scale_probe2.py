"""Isolate the array_min/array_max agg anti-scaling: repeats, GC
choice, nested vectorized reader on/off."""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

master = sys.argv[1]
variant = sys.argv[2]  # base | parallelgc | novec
data = "/tmp/dvs_bench_sequences_400000"

from data_validation_spark.session import get_spark
from pyspark.sql import functions as F

extra = {}
if variant == "parallelgc":
    extra["spark.driver.extraJavaOptions"] = "-XX:+UseParallelGC"
if variant == "novec":
    extra["spark.sql.parquet.enableNestedColumnVectorizedReader"] = "false"

cores = int(master.split("[")[1].rstrip("]"))
spark = get_spark(app_name=f"p2-{cores}-{variant}", master=master,
                  shuffle_partitions=cores, extra_conf=extra)
df = spark.read.parquet(data)
df.limit(100).count()

t = {}
for rep in (1, 2):
    t0 = time.time()
    df.agg(F.min(F.array_min("tokens")), F.max(F.array_max("tokens"))).collect()
    t[f"elem_rep{rep}"] = round(time.time() - t0, 2)
t0 = time.time()
df.agg(F.sum(F.array_size("tokens"))).collect()
t["size"] = round(time.time() - t0, 2)

print(json.dumps({"master": master, "variant": variant, **t}))
