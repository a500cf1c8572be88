"""Driver-gate check for a SUBSET of catalog queries (same compare
discipline as tools/gate_sim.py: column sort by name, float round-6,
row sort, rows+schema+hash vs the DuckDB oracle twin).

    PYTHONPATH=. python tools/gate_subset.py SF_DIR name1 name2 ...

Exit 1 on any mismatch."""
import math
import sys

import duckdb

from pl_marker_spark import queries_catalog as qc
from pl_marker_spark.session import get_spark

SF = sys.argv[1]
NAMES = sys.argv[2:]
spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")


def norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 6)
    return v


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


qs = qc.queries()
oracles = qc.oracle_sql()
bad = []
for name in NAMES:
    sdf = qs[name](spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    res = con.execute(oracles[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    ok = (len(srows) == len(drows)
          and sorted(scols) == sorted(dcols)
          and canon(srows, scols) == canon(drows, dcols))
    print(("PASS" if ok else "FAIL"), name, len(srows), len(drows),
          flush=True)
    if not ok:
        bad.append(name)
        sc, dc = canon(srows, scols), canon(drows, dcols)
        only_s = [r for r in sc if r not in set(dc)][:5]
        only_d = [r for r in dc if r not in set(sc)][:5]
        print("  only_spark:", only_s)
        print("  only_oracle:", only_d)
print("BAD", bad)
sys.exit(1 if bad else 0)
