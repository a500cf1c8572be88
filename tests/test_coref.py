"""O17 coref surface: bracket-notation writer + native muc/bcub/ceafe.

The driver-gate equivalents live in test_queries_oracle (o17_coref_conll /
o17_coref_metrics); here: the brute-force anchor for BOTH optimal-assignment
solvers, the literal CoNLL rendering (bracket ordering quirks of
conll.py:31-62, '-' fill, header/trailer), and Spark-vs-oracle metric
equality on randomized cluster configurations.
"""

import itertools
import random
from fractions import Fraction

import numpy as np
import pytest

from pl_marker_spark.oracle_coref import (
    _assign_max_py,
    clusters_from_mentions,
    coref_column_py,
    coref_metrics_py,
)
from pl_marker_spark.pipeline.conll_writer import (
    _assign_max,
    coref_clusters,
    coref_column,
    coref_metrics,
    render_conll_lines,
)


def test_assignment_solvers_match_brute_force():
    rng = random.Random(11)
    for _ in range(120):
        n = rng.randint(1, 6)
        m = rng.randint(1, 6)
        W = np.array(
            [[rng.choice([0, 0, 1, 2, 3, 5]) / rng.choice([2, 3, 4, 5])
              for _ in range(m)] for _ in range(n)]
        )
        small = min(n, m)
        best = 0.0
        for cols in itertools.permutations(range(max(n, m)), small):
            v = sum(
                (W[i, cols[i]] if n <= m else W[cols[i], i]) for i in range(small)
            )
            best = max(best, v)
        v_np = sum(W[r, c] for r, c in _assign_max(W.copy()))
        wd = {
            (i, j): Fraction(W[i, j]).limit_denominator(100)
            for i in range(n) for j in range(m) if W[i, j] > 0
        }
        v_py = float(
            sum(Fraction(W[r, c]).limit_denominator(100)
                for r, c in _assign_max_py(wd, n, m))
        )
        assert abs(v_np - best) < 1e-9
        assert abs(v_py - best) < 1e-9


def test_bracket_ordering_quirks(spark):
    # doc word 6 carries: two multi-word ends (sorted start DESC), one
    # single; doc word 0/1 carry starts (sorted end DESC)
    me = spark.createDataFrame(
        [("d", 1, 6, 10), ("d", 4, 6, 20), ("d", 6, 6, 30),
         ("d", 0, 2, 40), ("d", 0, 4, 50)],
        "conv_id string, start int, end int, entity_id long",
    )
    col = {(r.conv_id, r.word_idx): r.coref
           for r in coref_column(coref_clusters(me)).collect()}
    # first-appearance cluster ids: (0,2)->0, (0,4)->1, (1,6)->2, (4,6)->3,
    # (6,6)->4
    assert col[("d", 0)] == "(1|(0"      # starts ordered end DESC
    assert col[("d", 2)] == "0)"
    assert col[("d", 4)] == "1)|(3"      # end of (0,4) then start of (4,6)
    assert col[("d", 6)] == "3)|2)|(4)"  # ends start-DESC, then singles
    # oracle twin agrees on the same clusters
    oc = {(d, w): s for d, w, s in coref_column_py(clusters_from_mentions(
        [("d", 1, 6, 10), ("d", 4, 6, 20), ("d", 6, 6, 30),
         ("d", 0, 2, 40), ("d", 0, 4, 50)]))}
    assert oc == col


def test_render_conll_lines_literal(spark):
    tt = spark.createDataFrame(
        [("d", 0, ["Alice", "met", "Bob"]), ("d", 1, ["she", "smiled"])],
        "conv_id string, turn_idx int, words array<string>",
    )
    me = spark.createDataFrame(
        [("d", 0, 0, 1), ("d", 3, 3, 1), ("d", 2, 2, 2)],
        "conv_id string, start int, end int, entity_id long",
    )
    lines = [r.line for r in
             render_conll_lines(tt, me).orderBy("conv_id", "line_no").collect()]
    assert lines == [
        "#begin document (d); part 0",
        "d   0   0   Alice   (0)",
        "d   0   1   met   -",
        "d   0   2   Bob   (1)",
        "d   0   3   she   (0)",
        "d   0   4   smiled   -",
        "#end document",
    ]


def _rand_clusters(rng, n_docs=4, n_words=30):
    by_doc = {}
    for d in range(n_docs):
        doc = f"doc{d}"
        spans = rng.sample(
            [(s, s + rng.randint(0, 2)) for s in range(0, n_words, 3)],
            rng.randint(2, 8),
        )
        k = rng.randint(1, 4)
        clusters = [[] for _ in range(k)]
        for sp in spans:
            clusters[rng.randrange(k)].append(sp)
        by_doc[doc] = [sorted(set(c)) for c in clusters if c]
    return by_doc


def test_metrics_spark_matches_oracle(spark):
    rng = random.Random(23)
    gold = _rand_clusters(rng)
    pred = _rand_clusters(rng)
    rows = []
    for src, by_doc in (("g", gold), ("p", pred)):
        for doc, cs in by_doc.items():
            for cid, c in enumerate(cs):
                rows += [(src, doc, cid, s, e) for s, e in c]
    df = spark.createDataFrame(
        rows, "src string, conv_id string, cluster_id int, start int, end int"
    )
    got = {
        r.metric: (r.recall, r.precision, r.f1)
        for r in coref_metrics(
            df.filter("src='g'").drop("src"), df.filter("src='p'").drop("src")
        ).collect()
    }
    want = {m: (r, p, f) for m, r, p, f in coref_metrics_py(gold, pred)}
    assert got == want


def test_metrics_identical_clusters_all_one(spark):
    rng = random.Random(5)
    by_doc = _rand_clusters(rng)
    rows = []
    for doc, cs in by_doc.items():
        for cid, c in enumerate(cs):
            rows += [(doc, cid, s, e) for s, e in c]
    df = spark.createDataFrame(
        rows, "conv_id string, cluster_id int, start int, end int"
    )
    out = coref_metrics(df, df).collect()
    assert len(out) == 3
    for r in out:
        assert (r.recall, r.precision, r.f1) == (1.0, 1.0, 1.0)
    for m, rr, pp, ff in coref_metrics_py(by_doc, by_doc):
        assert (rr, pp, ff) == (1.0, 1.0, 1.0)


def test_muc_textbook_example():
    # Vilain et al. 1995's canonical example: gold {A B C D} (one chain),
    # response splits it into {A B} {C D} -> MUC recall 2/3
    gold = {"d": [[(0, 0), (1, 1), (2, 2), (3, 3)]]}
    pred = {"d": [[(0, 0), (1, 1)], [(2, 2), (3, 3)]]}
    rows = {m: (r, p, f) for m, r, p, f in coref_metrics_py(gold, pred)}
    assert rows["muc"][0] == pytest.approx(2 / 3, abs=1e-6)
    assert rows["muc"][1] == 1.0  # both response chains are pure
