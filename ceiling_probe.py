#!/usr/bin/env python
"""Host-ceiling micro-benchmarks for the scaling analysis (BENCH.md).

Measures, at 8 vs 32 pinned cores, the 8→32 scaling efficiency of:
1. pure-CPU python spin processes (the host's raw CPU ceiling);
2. an embarrassingly parallel mapInPandas+numpy kernel over a parquet
   input — Arrow round-trip, no shuffle (the Arrow/pandas-path ceiling
   that bounds this pipeline's heavy stages).

The pipeline cannot scale better than (2) on this box; BENCH.md reports
pipeline efficiency as a fraction of this measured ceiling. Usage:
``python ceiling_probe.py`` — prints one JSON line, appends nothing.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import shutil
import subprocess
import sys
import tempfile
import time


def _spin(n: int, cores: int) -> None:
    os.sched_setaffinity(0, set(range(cores)))
    x = 0
    for i in range(n):
        x += i * i
    return None


def cpu_spin_leg(procs: int, n: int = 80_000_000) -> float:
    """procs processes pinned to cores [0, procs) each spinning fixed work;
    returns wall sec for procs*n total work units."""
    t0 = time.time()
    ps = [mp.Process(target=_spin, args=(n, procs)) for _ in range(procs)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    return time.time() - t0


def arrow_leg(cpus: int, rows: int, workdir: str) -> float:
    """One pinned bench of a shuffle-free mapInPandas+numpy kernel: read
    parquet -> per-batch numpy transform -> noop write. Run as a
    subprocess so each leg gets a fresh JVM pinned to `cpus` cores."""
    script = os.path.join(workdir, "arrow_leg.py")
    with open(script, "w") as f:
        f.write(
            """
import sys, time
import numpy as np, pandas as pd
from pyspark.sql import SparkSession
cpus, rows, data = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", str(cpus * 4))
         .config("spark.driver.memory", "8g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
df = spark.read.parquet(data)
def kern(batches):
    for pdf in batches:
        v = np.stack(pdf["v"].to_numpy())
        w = v
        for _ in range(6):
            w = np.tanh(w @ np.full((64, 64), 0.01))
        w = w @ np.full((64, 8), 0.02)
        yield pd.DataFrame({"id": pdf["id"], "s": w.sum(axis=1)})
out = df.mapInPandas(kern, "id long, s double")
# warmup pass: spawn+warm every python worker, fault in the input pages —
# the timed pass then measures steady-state Arrow/pandas throughput, not
# worker startup (which dominated at 32 cores on a short job)
out.write.format("noop").mode("overwrite").save()
t0 = time.time()
out.write.format("noop").mode("overwrite").save()
print("LEG", time.time() - t0)
spark.stop()
"""
        )
    cmd = [sys.executable, script, str(cpus), str(rows),
           os.path.join(workdir, "data")]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True)
    if out.returncode != 0:
        raise SystemExit(out.stderr[-2000:])
    line = [l for l in out.stdout.splitlines() if l.startswith("LEG")][-1]
    return float(line.split()[1])


def main() -> None:
    res = {"loadavg_start": round(os.getloadavg()[0], 1)}

    t8 = cpu_spin_leg(8)
    t32 = cpu_spin_leg(32)
    # fixed per-process work: efficiency = t8 / t32 would be 1.0 on an
    # ideal 32-core box when each leg runs `procs` copies — instead compare
    # total-throughput form: (work32/t32) / (work8/t8) / 4
    res["cpu_spin_sec_8"] = round(t8, 2)
    res["cpu_spin_sec_32"] = round(t32, 2)
    res["cpu_spin_eff"] = round((32 / t32) / (8 / t8) / 4, 3)

    workdir = tempfile.mkdtemp(prefix="ceiling_")
    try:
        rows = 4_000_000
        gen = os.path.join(workdir, "gen.py")
        with open(gen, "w") as f:
            f.write(
                f"""
import numpy as np, pandas as pd
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[16]")
         .config("spark.driver.memory", "8g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
def gen(batches):
    for pdf in batches:
        ids = pdf["id"].to_numpy()
        yield pd.DataFrame({{"id": ids,
            "v": [np.random.default_rng(int(i)).standard_normal(64).tolist()
                  for i in ids]}})
spark.range({rows}).repartition(128).mapInPandas(gen, "id long, v array<double>")\\
    .write.mode("overwrite").parquet(r"{os.path.join(workdir, 'data')}")
spark.stop()
"""
            )
        subprocess.run([sys.executable, gen], check=True, capture_output=True)
        a8 = arrow_leg(8, rows, workdir)
        a32 = arrow_leg(32, rows, workdir)
        res["arrow_sec_8"] = round(a8, 2)
        res["arrow_sec_32"] = round(a32, 2)
        res["arrow_eff"] = round((a8 / a32) / 4, 3)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    res["loadavg_end"] = round(os.getloadavg()[0], 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
