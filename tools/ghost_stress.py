#!/usr/bin/env python
"""Attribution stress for the kg_edge_intervals "ghost" (round-6).

Reproduces the long-lived-session condition the round-5 one-off mismatch
was recorded under: ONE Spark session + ONE DuckDB connection, N
interleaved reps of kg_edge_intervals alternating with its temporal
neighbors. Each side's canonicalized result is hashed and compared
against ITS OWN first-run value, so any mismatch is attributed to the
side that moved — which a plain Spark-vs-DuckDB compare cannot do.

Round-6 finding (this script, N=50, sf0.01, live local[32] JVM):
SPARK 50/50 identical; DUCKDB 47/50 identical + 3/50 a divergent
variant containing an island that spans a 55.62e9 us gap — violating
the twin SQL's own `off_us - prev_us > 7200000000` CASE rule, i.e. the
twin's EVALUATION moved, not the data. Isolated DuckDB (no live Spark
JVM, same connection, 40 reps, threads default and 1) is stable.

Mechanism: the frozen twin computes the lag boundary flag and the
running-sum island id in two separate window passes over a NON-UNIQUE
`ORDER BY off_us`; DuckDB 1.0.0's parallel window execution may order
tied rows differently in the two passes under CPU contention, so a
boundary flag computed in pass 1 rides the wrong row in pass 2 (also
explains the other recorded signature: a tied pair split into islands
0 and 1 — an island id of 0 is impossible under self-consistent
evaluation, since the first row of a partition always flags 1). Spark's
stacked Window operators share one physical sort, making its output
tie-order-invariant (pinned in tests/test_edge_intervals_determinism).

Usage:  PYTHONPATH=. python tools/ghost_stress.py [SF_DIR] [REPS]
Exit 1 if the SPARK side ever moves; DuckDB variance is reported (it is
the known engine-side artifact, not a repo defect).
"""
import hashlib
import os
import sys
from collections import Counter

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pl_marker_spark import queries_catalog as qc  # noqa: E402
from pl_marker_spark.session import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 50
NEIGHBORS = ["kg_edge_temporal", "kg_edge_decay", "kg_snapshot_delta"]

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")
qs = qc.queries()
oracles = qc.oracle_sql()


def canon_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = sorted(tuple(str(r[i]) for i in order) for r in rows)
    return hashlib.md5(repr(data).encode()).hexdigest()[:12], data


s_hashes, d_hashes = Counter(), Counter()
s_data, d_data = {}, {}
for i in range(REPS):
    nb = NEIGHBORS[i % len(NEIGHBORS)]
    qs[nb](spark, SF).collect()
    con.execute(oracles[nb]).fetchall()

    sdf = qs["kg_edge_intervals"](spark, SF)
    sh, sd = canon_hash([tuple(r) for r in sdf.collect()], sdf.columns)
    res = con.execute(oracles["kg_edge_intervals"])
    dh, dd = canon_hash(res.fetchall(), [d[0] for d in res.description])
    s_hashes[sh] += 1
    d_hashes[dh] += 1
    s_data.setdefault(sh, sd)
    d_data.setdefault(dh, dd)
    if len(s_hashes) > 1 or len(d_hashes) > 1:
        print(f"rep {i}: spark={sh} duck={dh}", flush=True)

print("SPARK distinct results:", dict(s_hashes))
print("DUCK  distinct results:", dict(d_hashes))
if len(d_hashes) > 1:
    variants = list(d_data)
    a, b = d_data[variants[0]], d_data[variants[1]]
    sa, sb = set(a), set(b)
    print("duck variant diff (first 4 rows each side):")
    print("  only in A:", sorted(sa - sb)[:4])
    print("  only in B:", sorted(sb - sa)[:4])
spark.stop()
sys.exit(1 if len(s_hashes) > 1 else 0)
