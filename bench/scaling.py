"""Scaling-efficiency evidence for the north rule (BASELINE.json:14).

A real N-vs-4N-executor cluster isn't available in the sandbox, so the
sanctioned stand-in (driver brief) is the same job at two parallelism
levels on the same input: ``local[8]`` vs ``local[32]``.  Each level
runs in its OWN subprocess/JVM (a SparkSession's master can't change
in-process), reading the SAME pre-materialized sequences parquet, so
the timed section is purely the validation job.

Usage:
    python bench/scaling.py [--rows 400000]      # parent: writes BENCH/BASELINE.md
    python bench/scaling.py --child --master local[8] --data PATH
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child(master: str, data: str) -> None:
    from data_validation_spark.session import get_spark
    from bench import bench_validation  # reuse the exact north-star job

    cores = int(master.split("[")[1].rstrip("]"))
    spark = get_spark(app_name=f"scaling-{cores}", master=master,
                      shuffle_partitions=cores)
    # warm the JVM/codegen path so the measured run isn't first-touch
    spark.read.parquet(data).limit(1000).count()

    import bench as bench_mod
    bench_mod.CPUS = cores

    n_rows = int(os.path.basename(data).rsplit("_", 1)[-1])
    wall, info = bench_validation(spark, n_rows)
    print(json.dumps({"master": master, "wall_s": round(wall, 2), **info}),
          flush=True)


def run_child(master: str, data: str) -> dict:
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child",
         "--master", master, "--data", data],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3600)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"child {master} failed")
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=400_000)
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--master")
    ap.add_argument("--data")
    args = ap.parse_args()

    if args.child:
        child(args.master, args.data)
        return

    # materialize the shared input once (excluded from timing)
    from data_validation_spark.session import get_spark
    from bench import seq_parquet_path
    spark = get_spark(app_name="scaling-gen", master="local[32]",
                      shuffle_partitions=32)
    data = seq_parquet_path(spark, args.rows)
    spark.stop()

    results = {}
    for master in ("local[8]", "local[32]"):
        t0 = time.time()
        results[master] = run_child(master, data)
        print(f"{master}: {results[master]}  (subprocess total "
              f"{time.time()-t0:.0f}s)", file=sys.stderr)

    r8, r32 = results["local[8]"], results["local[32]"]
    thr8 = r8["throughput_seq_per_s"]
    thr32 = r32["throughput_seq_per_s"]
    eff = thr32 / (4 * thr8)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "a") as f:
        f.write(
            f"\n## Scaling run — {args.rows:,} sequences "
            f"(same parquet input, one job: full validation pass)\n\n"
            f"| cores | wall (s) | throughput (seq/s) |\n"
            f"|---|---|---|\n"
            f"| local[8] (N) | {r8['wall_s']} | {thr8:,.0f} |\n"
            f"| local[32] (4N) | {r32['wall_s']} | {thr32:,.0f} |\n\n"
            f"Scaling efficiency N→4N = throughput(32) / (4 × "
            f"throughput(8)) = **{eff:.2f}** "
            f"(target ≥ 0.8, BASELINE.json north_rule).\n"
            f"Violations found: {r32['violations']:,} (identical at both "
            f"levels: {r8['violations'] == r32['violations']}).\n")
    print(json.dumps({"eff": round(eff, 3), "thr8": thr8, "thr32": thr32}))


if __name__ == "__main__":
    main()
