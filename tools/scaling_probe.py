"""Focused scaling probe for one stage. Usage:
   python tools/scaling_probe.py <ncpus> <repl> <minhash_k> <sink>
Prints one JSON line."""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ncpus, repl, k, sink = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]

import ray

ray.init(address="local", num_cpus=ncpus, include_dashboard=False,
         logging_level="ERROR",
         runtime_env={"env_vars": {"POLARS_MAX_THREADS": "2"}})
import pyarrow as pa
import ray.data
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from texrex_ray.pipelines.clean_documents import clean_documents

# warm the worker pool
warm = ray.data.read_parquet("/root/testdata/sf0.1/documents.parquet", columns=["text"])
clean_documents(warm.repartition(ncpus), minhash_k=k, batch_size=512).count()

docs = ray.data.read_parquet(
    "/root/testdata/sf0.1/documents.parquet", columns=["text"],
    override_num_blocks=ncpus * 3,
)
big = docs.map_batches(lambda t: pa.concat_tables([t] * repl), batch_format="pyarrow")
t0 = time.perf_counter()
cleaned = clean_documents(big, minhash_k=k, batch_size=1024)
if sink == "write":
    shutil.rmtree("/tmp/probe_clean", ignore_errors=True)
    cleaned.write_parquet("/tmp/probe_clean")
    n = repl * 5000
else:
    n = cleaned.count()
dt = time.perf_counter() - t0
print(json.dumps({"ncpus": ncpus, "repl": repl, "k": k, "sink": sink,
                  "sec": round(dt, 2), "rows_per_sec": round(n / dt, 1)}))
ray.shutdown()
