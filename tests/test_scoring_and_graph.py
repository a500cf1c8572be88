"""Spark relational scoring must equal the oracle's counter loops; the graph
stages must canonicalize deterministically."""

import pytest
from pyspark.sql import functions as F

from pl_marker_spark import synth
from pl_marker_spark.config import DEFAULT_CONFIG
from pl_marker_spark.oracle_ref import oracle_metrics, run_oracle
from pl_marker_spark.pipeline.graph import build_graph
from pl_marker_spark.pipeline.cc import connected_components
from pl_marker_spark.pipeline.runner import run_extraction
from pl_marker_spark.pipeline.scoring import ner_metrics, re_metrics

N_CONVS = 20


@pytest.fixture(scope="module")
def everything(spark):
    corpus = synth.local_corpus(N_CONVS)
    oracle = run_oracle(corpus[0], DEFAULT_CONFIG)
    transcripts = synth.transcripts_df(spark, N_CONVS)
    out = run_extraction(spark, transcripts, DEFAULT_CONFIG)
    return corpus, oracle, out


def test_metrics_match_oracle(spark, everything):
    corpus, oracle, out = everything
    _, gms, grs = corpus
    gold_m = spark.createDataFrame(
        gms, schema="conv_id string, turn_idx int, start int, end int, label string"
    )
    gold_r = spark.createDataFrame(
        grs,
        schema="conv_id string, turn_idx int, s1 int, e1 int, s2 int, e2 int, label string",
    )
    gold_types = {(c, t, s, e): l for c, t, s, e, l in gms}
    want = oracle_metrics(
        oracle["mentions"], oracle["raw"], oracle["triples"], gms, grs, gold_types
    )
    got = ner_metrics(out["mentions"], out["span_scores"], gold_m)
    got.update(re_metrics(out["triples"], gold_r, gold_m))
    for k in ("ner_precision", "ner_recall", "ner_f1", "ner_f1_overlap",
              "re_precision", "re_recall", "re_f1", "re_f1_with_ner",
              "ner_tot_recall", "re_tot_recall", "re_tot_pred", "re_cor"):
        assert got[k] == pytest.approx(want[k], abs=1e-12), k
    # recall-set consistency assertion (run_re.py:1005)
    assert got["golden_size"] == want["re_tot_recall"]


def test_connected_components_basic(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (9, 9), (7, 3)], "src long, dst long"
    )
    assign = {r.sid: r.component for r in connected_components(edges).collect()}
    assert assign[1] == assign[2] == assign[3] == assign[7] == 1
    assert assign[5] == assign[6] == 5


def test_cc_local_matches_distributed(spark):
    """The size-gated driver union-find and the alternating-star path label
    identically (min node id per component) — on longs and on strings
    (entity keys), chains + cliques + singles-by-edge."""
    cases = [
        ([(1, 2), (2, 3), (5, 6), (9, 9), (7, 3)], "src long, dst long"),
        ([(i, i + 1) for i in range(50)]
         + [(100 + i, 100 + (i + 1) % 5) for i in range(5)],
         "src long, dst long"),
        ([("b", "a"), ("c", "b"), ("x", "x"), ("m", "z")],
         "src string, dst string"),
    ]
    for rows, schema in cases:
        edges = spark.createDataFrame(rows, schema)
        local = {(r.sid, r.component)
                 for r in connected_components(edges).collect()}
        dist = {(r.sid, r.component)
                for r in connected_components(
                    edges, local_threshold=0).collect()}
        assert local == dist and local


def test_graph_build(spark, everything):
    _, _, out = everything
    g = build_graph(out["mentions_refined"], out["triples"], out["turns_tok"])
    nodes = g["nodes"]
    edges = g["edges"]
    assert nodes.count() > 10
    assert edges.count() > 5
    # every edge endpoint is a node
    ids = {r.entity_id for r in nodes.collect()}
    for r in edges.collect():
        assert r.src_id in ids and r.dst_id in ids
    # surfaces reconstructed correctly: every surface is in the gazetteer
    from pl_marker_spark.world import GAZETTEER
    for r in g["surfaces"].select("surface", "label").distinct().collect():
        assert GAZETTEER.get(r.surface) is not None
    # exact-duplicate surfaces collapse to one entity
    dup = (
        g["entity_vocab"].groupBy("label", "norm")
        .agg(F.countDistinct("entity_id").alias("k"))
        .filter(F.col("k") > 1)
    )
    assert dup.count() == 0


def test_provenance_alias_conf_invariants(spark):
    """Cross-consistency of the session-4 KG materialization queries:
    provenance support re-derives edge weight, the alias table's rank-1
    row IS the node's canonical name (same ordering by construction), and
    PMI confidence is a bijection of the edge list."""
    from pl_marker_spark.queries_catalog import (
        q_kg_canonical_alias,
        q_kg_graph_edges,
        q_kg_graph_nodes,
        q_kg_triple_conf,
        q_kg_triple_provenance,
    )

    sf = "/root/testdata/sf0.001"
    edges = {(r.src_id, r.dst_id, r.pred): r.weight
             for r in q_kg_graph_edges(spark, sf).collect()}
    prov = {(r.src_id, r.dst_id, r.pred): r
            for r in q_kg_triple_provenance(spark, sf).collect()}
    assert set(prov) == set(edges)
    for k, r in prov.items():
        assert r.support == edges[k]
        assert 1 <= r.n_convs <= r.n_sites <= r.support
        assert r.first_conv <= r.last_conv

    nodes = {r.entity_id: r for r in q_kg_graph_nodes(spark, sf).collect()}
    alias = q_kg_canonical_alias(spark, sf).collect()
    rank1 = {r.entity_id: r for r in alias if r.alias_rank == 1}
    assert set(rank1) == set(nodes)
    for eid, n in nodes.items():
        assert rank1[eid].surface == n.canonical_name
        assert rank1[eid].label == n.type
    per_entity_mentions, per_entity_surfaces = {}, {}
    for r in alias:
        per_entity_mentions[r.entity_id] = (
            per_entity_mentions.get(r.entity_id, 0) + r.n_mentions)
        per_entity_surfaces[r.entity_id] = (
            per_entity_surfaces.get(r.entity_id, 0) + 1)
    for eid, n in nodes.items():
        assert per_entity_mentions[eid] == n.n_mentions
        assert per_entity_surfaces[eid] == n.n_surfaces

    conf = {(r.src_id, r.dst_id, r.pred): r for r in
            q_kg_triple_conf(spark, sf).collect()}
    assert set(conf) == set(edges)
    import math
    w_total = sum(edges.values())
    w_out, w_in = {}, {}
    for (s, d, _p), w in edges.items():
        w_out[s] = w_out.get(s, 0) + w
        w_in[d] = w_in.get(d, 0) + w
    for k, r in conf.items():
        expect = math.log(w_total * edges[k] / (w_out[k[0]] * w_in[k[1]]))
        assert abs(r.conf - expect) < 1e-6


def test_type_violations_invariants(spark):
    """kg_type_violations is a consistent QA report: per-pred totals
    equal the sum of pair supports, shares sum to 1, the licensed pair
    is the pred's max-support pair (lexicographic tie-break), exactly
    the licensed row is non-violating, and the census covers exactly
    the (pred, pair) set of the triples table."""
    from collections import defaultdict

    from pl_marker_spark.queries_catalog import (
        q_kg_triples,
        q_kg_type_violations,
    )

    sf = "/root/testdata/sf0.001"
    rows = q_kg_type_violations(spark, sf).collect()
    triples = q_kg_triples(spark, sf).collect()

    census: dict = defaultdict(int)
    for t in triples:
        census[(t.pred, t.subj_type, t.obj_type)] += 1
    assert {(r.pred, r.subj_type, r.obj_type) for r in rows} == set(census)

    by_pred: dict = defaultdict(list)
    for r in rows:
        assert r.n == census[(r.pred, r.subj_type, r.obj_type)]
        by_pred[r.pred].append(r)
    for pred, rs in by_pred.items():
        total = sum(r.n for r in rs)
        assert all(r.pred_total == total for r in rs)
        assert abs(sum(r.share for r in rs) - 1.0) < 1e-4
        lic = min(rs, key=lambda r: (-r.n, r.subj_type, r.obj_type))
        ok = [r for r in rs if not r.is_violation]
        assert len(ok) == 1
        assert (ok[0].subj_type, ok[0].obj_type) == (lic.subj_type,
                                                     lic.obj_type)
        assert all((r.lic_subj, r.lic_obj)
                   == (lic.subj_type, lic.obj_type) for r in rs)


def test_ntriples_export_invariants(spark):
    """kg_export_ntriples emits spec-valid RDF 1.1 N-Triples: the escape
    chain matches an independent python ECHAR encoder on adversarial
    literals (quotes, backslashes, control chars, the \\n-vs-backslash-n
    ambiguity trap), every exported line parses under the N-Triples
    grammar, and the statement census reconciles with nodes/edges (one
    label + one type per node, one statement per edge, zero rejected
    tokens on the pipeline's vocabularies)."""
    import re

    from pl_marker_spark.queries_catalog import (
        _nt_escape,
        q_kg_export_ntriples,
        q_kg_graph_edges,
        q_kg_graph_nodes,
    )

    def py_echar(s: str) -> str:
        return (s.replace("\\", "\\\\").replace('"', '\\"')
                 .replace("\n", "\\n").replace("\r", "\\r")
                 .replace("\t", "\\t"))

    nasty = ['he said "hi"', "back\\slash", "tab\there", "nl\nthere",
             "cr\rhere", "\\n literal backslash-n", '\\"', "", "plain",
             'mix "\\" \n\t\r end\\']
    rows = spark.createDataFrame([(s,) for s in nasty], "s string")
    got = [r.e for r in rows.select(_nt_escape(F.col("s")).alias("e"))
           .collect()]
    assert got == [py_echar(s) for s in nasty]

    sf = "/root/testdata/sf0.001"
    out = q_kg_export_ntriples(spark, sf).collect()
    n_nodes = q_kg_graph_nodes(spark, sf).count()
    n_edges = q_kg_graph_edges(spark, sf).count()
    by_kind: dict = {}
    for r in out:
        by_kind.setdefault(r.kind, []).append(r.line)
    assert len(by_kind.get("label", [])) == n_nodes
    assert len(by_kind.get("type", [])) == n_nodes
    assert len(by_kind.get("edge", [])) == n_edges
    assert "rejected_token" not in by_kind

    iri = r"<[^\s<>\"{}|^`\\]+>"
    lit = r'"(?:[^"\\\n\r]|\\[tbnrf"\'\\])*"'
    stmt = re.compile(rf"^{iri} {iri} (?:{iri}|{lit}) \.$")
    for lines in by_kind.values():
        for line in lines:
            assert stmt.match(line), line
    # round-trip one label literal back through the inverse ECHAR map
    import codecs
    line0 = by_kind["label"][0]
    literal = line0.split(' "', 1)[1].rsplit('" .', 1)[0]
    assert codecs.decode(literal, "unicode_escape") is not None


def test_negative_samples_and_cooccur_invariants(spark):
    """Filtered-protocol laws for kg_negative_samples (no true edge, no
    self-corruption, ≤1 row per (edge, k), most draws survive) and a
    python PMI recomputation for kg_entity_cooccur."""
    import collections
    import math

    from pl_marker_spark.queries_catalog import (
        NEG_SAMPLES_K,
        q_kg_entity_cooccur,
        q_kg_graph_edges,
        q_kg_mention_entity,
        q_kg_negative_samples,
    )

    sf = "/root/testdata/sf0.001"
    edges = [(r.src_id, r.dst_id, r.pred)
             for r in q_kg_graph_edges(spark, sf).collect()]
    truth = {(s, p, d) for s, d, p in edges}
    negs = q_kg_negative_samples(spark, sf).collect()
    for r in negs:
        assert (r.src_id, r.pred, r.neg_dst) not in truth
        assert r.neg_dst != r.pos_dst
        assert 0 <= r.k < NEG_SAMPLES_K
    keys = [(r.src_id, r.pos_dst, r.pred, r.k) for r in negs]
    assert len(keys) == len(set(keys))
    assert len(negs) > 0.5 * len(edges) * NEG_SAMPLES_K

    inc = {(r.conv_id, r.entity_id)
           for r in q_kg_mention_entity(spark, sf).collect()}
    n_convs = len({c for c, _ in inc})
    marg = collections.Counter(e for _, e in inc)
    by_conv = collections.defaultdict(set)
    for c, e in inc:
        by_conv[c].add(e)
    pair = collections.Counter()
    for es in by_conv.values():
        es = sorted(es)
        for i in range(len(es)):
            for j in range(i + 1, len(es)):
                pair[(es[i], es[j])] += 1
    got = {(r.ent_a, r.ent_b): (r.n_ab, r.pmi)
           for r in q_kg_entity_cooccur(spark, sf).collect()}
    assert set(got) == set(pair)
    for k, (n_ab, pmi) in got.items():
        assert n_ab == pair[k]
        assert abs(pmi - math.log(n_convs * n_ab
                                  / (marg[k[0]] * marg[k[1]]))) < 1e-6


def test_path_snapshot_example_invariants(spark):
    """Cross-consistency of the session-5 KG completion / incremental /
    training-data rows: 2-hop path stats re-derive from a python wedge
    walk over the edge list; snapshot-delta supports partition provenance
    support exactly; and stripping the <S>/<O> markers from every RE
    example reproduces the evidence turn's words verbatim (the P11
    per-turn text-equality invariant, extended through the example
    generator)."""
    import collections

    from pl_marker_spark.queries_catalog import (
        _pipeline_outputs,
        q_kg_graph_edges,
        q_kg_path_2hop,
        q_kg_re_examples,
        q_kg_snapshot_delta,
        q_kg_triple_provenance,
    )

    sf = "/root/testdata/sf0.001"
    edges = [(r.src_id, r.dst_id, r.pred, r.weight)
             for r in q_kg_graph_edges(spark, sf).collect()]
    by_src = collections.defaultdict(list)
    for s, d, p, w in edges:
        by_src[s].append((d, p, w))
    pair_set = {(s, d) for s, d, _p, _w in edges}
    expect = collections.defaultdict(lambda: [0, set(), 0, 0])
    for a, b, p1, w1 in edges:
        for c, p2, w2 in by_src[b]:
            if a == c:
                continue
            st = expect[(p1, p2)]
            st[0] += 1
            st[1].add(b)
            st[2] += min(w1, w2)
            st[3] += 1 if (a, c) in pair_set else 0
    got = {(r.pred1, r.pred2): (r.n_paths, r.n_mid, r.support, r.n_closed)
           for r in q_kg_path_2hop(spark, sf).collect()}
    assert got == {k: (v[0], len(v[1]), v[2], v[3])
                   for k, v in expect.items()}

    prov = {(r.src_id, r.dst_id, r.pred): r.support
            for r in q_kg_triple_provenance(spark, sf).collect()}
    delta = q_kg_snapshot_delta(spark, sf).collect()
    assert {(r.src_id, r.dst_id, r.pred) for r in delta} == set(prov)
    for r in delta:
        assert r.support_old + r.support_new == prov[(r.src_id, r.dst_id,
                                                      r.pred)]
        assert r.status == ("new" if r.support_old == 0 else
                            "stable" if r.support_new == 0 else "grown")

    out = _pipeline_outputs(spark, sf)
    words = {(r.conv_id, r.turn_idx): list(r.words)
             for r in out["turns_tok"].select(
                 "conv_id", "turn_idx", "words").collect()}
    triples = out["triples"].count()
    ex = q_kg_re_examples(spark, sf).collect()
    assert len(ex) == triples
    for r in ex:
        toks = r.example.split(" ")
        assert toks.count("<S>") == toks.count("</S>") == 1
        assert toks.count("<O>") == toks.count("</O>") == 1
        stripped = [t for t in toks
                    if t not in ("<S>", "</S>", "<O>", "</O>")]
        assert stripped == words[(r.conv_id, r.turn_idx)]
        i1, j1 = toks.index("<S>"), toks.index("</S>")
        i2, j2 = toks.index("<O>"), toks.index("</O>")
        assert i1 < j1 and i2 < j2
        assert j1 < i2 or j2 < i1  # spans never interleave


def test_ner_examples_and_tool_transitions_invariants(spark):
    """The BIO export strips back to the turn words verbatim (P11 again);
    every reconstructed B/I run lies inside an extracted mention with the
    same label (word-level shadowing can truncate but never relabel or
    extend); every mention that overlaps no other mention surfaces as an
    exact full run. Tool transitions re-derive from a python walk of the
    corpus."""
    import collections

    from pl_marker_spark import synth
    from pl_marker_spark.oracle_values import N_KG_CONVS
    from pl_marker_spark.queries_catalog import (
        _pipeline_outputs,
        q_kg_ner_examples,
        q_tool_transitions,
    )

    sf = "/root/testdata/sf0.001"
    out = _pipeline_outputs(spark, sf)
    words = {(r.conv_id, r.turn_idx): list(r.words)
             for r in out["turns_tok"].select(
                 "conv_id", "turn_idx", "words").collect()}
    offs = {}
    by_conv = collections.defaultdict(list)
    for (c, t) in words:
        by_conv[c].append(t)
    for c, ts in by_conv.items():
        off = 0
        for t in sorted(ts):
            offs[(c, t)] = off
            off += len(words[(c, t)])
    mentions = collections.defaultdict(list)
    for r in out["mentions"].collect():
        mentions[(r.conv_id, r.turn_idx)].append((r.start, r.end, r.label))

    rows = q_kg_ner_examples(spark, sf).collect()
    assert {(r.conv_id, r.turn_idx) for r in rows} == set(words)
    for r in rows:
        toks = r.tagged.split(" ")
        ws, tags = zip(*(t.rsplit("/", 1) for t in toks))
        assert list(ws) == words[(r.conv_id, r.turn_idx)]
        off = offs[(r.conv_id, r.turn_idx)]
        runs, cur = [], None
        for i, tg in enumerate(tags):
            if tg.startswith("B-"):
                if cur:
                    runs.append(cur)
                cur = [off + i, off + i, tg[2:]]
            elif tg.startswith("I-"):
                assert cur is not None and cur[2] == tg[2:], r.tagged
                cur[1] = off + i
            else:
                assert tg == "O"
                if cur:
                    runs.append(cur)
                cur = None
        if cur:
            runs.append(cur)
        ms = mentions[(r.conv_id, r.turn_idx)]
        for s, e, lab in runs:
            assert any(m_s <= s and e <= m_e and m_l == lab
                       for m_s, m_e, m_l in ms), (r.conv_id, r.turn_idx,
                                                  s, e, lab)
        run_set = {(s, e, l) for s, e, l in runs}
        for m_s, m_e, m_l in ms:
            clash = any(not (o_e < m_s or m_e < o_s)
                        for o_s, o_e, _ in ms if (o_s, o_e) != (m_s, m_e))
            if not clash:
                assert (m_s, m_e, m_l) in run_set

    turns, _gm, _gr = synth.local_corpus(N_KG_CONVS)
    seqs = collections.defaultdict(list)
    for c, t, role, _text, tool, _ts in sorted(turns,
                                               key=lambda x: (x[0], x[1])):
        if role == "tool":
            seqs[c].append(tool)
    expect_n = collections.Counter()
    expect_convs = collections.defaultdict(set)
    for c, seq in seqs.items():
        for a, b in zip(seq, seq[1:]):
            expect_n[(a, b)] += 1
            expect_convs[(a, b)].add(c)
    got = {(r.tool, r.next_tool): (r.n, r.n_convs)
           for r in q_tool_transitions(spark, sf).collect()}
    assert got == {k: (v, len(expect_convs[k])) for k, v in expect_n.items()}


def test_bgp_and_reachability_semantics(spark):
    """Hand-built graphs pin the two session-8 query-surface semantics
    the synthetic corpus may not exercise: (1) BGP star fan-out
    multiplies bindings and the closing edge flags ONLY the matching
    (o, g) pair; (2) reachability reports min-hops under shorter
    alternatives and keeps cycle self-reachability."""
    from pyspark.sql import functions as F

    from pl_marker_spark.graphops import bgp_person_org_place

    # p1(PER) works at o1,o2(ORG), located at g1,g2(GPE); only (o1, g1)
    # closed -> 4 bindings, exactly one with closed=1.
    edges = spark.createDataFrame(
        [(1, 10, "ORG-AFF", 2), (1, 11, "ORG-AFF", 1),
         (1, 20, "PHYS", 1), (1, 21, "PHYS", 3),
         (10, 20, "GEN-AFF", 1),
         # distractors: wrong types / wrong predicate
         (10, 1, "ORG-AFF", 1), (1, 99, "PER-SOC", 1)],
        "src_id long, dst_id long, pred string, weight long")
    nodes = spark.createDataFrame(
        [(1, "alice", "PER"), (10, "acme", "ORG"), (11, "beta", "ORG"),
         (20, "paris", "GPE"), (21, "oslo", "GPE"), (99, "bob", "PER")],
        "entity_id long, canonical_name string, type string")
    rows = {(r.o, r.g): r for r in
            bgp_person_org_place(edges, nodes).collect()}
    assert len(rows) == 4
    assert rows[(10, 20)].closed == 1
    assert sum(r.closed for r in rows.values()) == 1
    assert rows[(11, 21)].person == "alice"
    assert rows[(11, 21)].w_aff == 1 and rows[(11, 21)].w_phys == 3

    # Reachability: chain a->b->c->a (3-cycle) plus shortcut a->c.
    # min-hops must prefer the shortcut (a,c,1) over the 2-hop path,
    # and the cycle yields self-reachability at exactly 3 hops.
    from pl_marker_spark.queries_catalog import q_kg_reachability
    import pl_marker_spark.queries_catalog as qc

    cyc = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 3)], "src_id long, dst_id long")
    # drive the same BFS body over a crafted edge set by monkeypatching
    # the pipeline-outputs source for this call
    orig = qc._pipeline_outputs
    try:
        qc._pipeline_outputs = lambda s, sf: {"edges": cyc}
        got = {(r.src_id, r.dst_id): r.min_hops
               for r in q_kg_reachability(spark, "unused").collect()}
    finally:
        qc._pipeline_outputs = orig
    assert got[(1, 3)] == 1          # shortcut wins over a->b->c
    assert got[(1, 1)] == 2          # self-reach via shortcut cycle 1->3->1
    assert got[(3, 3)] == 2          # ... and 3->1->3
    assert got[(2, 2)] == 3          # full ring is the only return path
    assert got[(1, 2)] == 1 and got[(2, 1)] == 2 and got[(3, 2)] == 2


def test_infer_edges_multi_derivation_and_suppression(spark):
    """Crafted graph pins the two kg_infer_edges behaviors sf0.01 leaves
    thin: (1) two distinct mids deriving the same (p, g) count as
    n_derivations=2 with best_support = the strongest derivation's
    weakest link; (2) an inferred pair that already exists as ANY edge
    is suppressed."""
    import pl_marker_spark.queries_catalog as qc
    from pl_marker_spark.queries_catalog import q_kg_infer_edges

    edges = spark.createDataFrame(
        [(1, 10, "ORG-AFF", 5), (1, 11, "ORG-AFF", 2),
         (10, 20, "GEN-AFF", 3), (11, 20, "GEN-AFF", 9),
         # second person whose inferred (2, 20) already exists
         (2, 10, "ORG-AFF", 1), (2, 20, "PER-SOC", 1)],
        "src_id long, dst_id long, pred string, weight long")
    orig = qc._pipeline_outputs
    try:
        qc._pipeline_outputs = lambda s, sf: {"edges": edges}
        rows = q_kg_infer_edges(spark, "unused").collect()
    finally:
        qc._pipeline_outputs = orig
    assert len(rows) == 1
    r = rows[0]
    # derivations: via mid 10 min(5,3)=3, via mid 11 min(2,9)=2 -> best 3
    assert (r.src_id, r.dst_id, r.pred, r.n_derivations,
            r.best_support) == (1, 20, "PHYS", 2, 3)
    assert r.rule == "ORG-AFF/GEN-AFF"


def test_best_chain_semiring_and_hops(spark):
    """Hand graph pins the (max, min) bottleneck semantics the synthetic
    corpus leaves thin: (1) parallel edges collapse to their max weight;
    (2) a wider-but-longer path beats a narrow direct edge, including a
    3-hop winner found only after two delta-improvement rounds; (3) an
    equal-support longer path must NOT displace the shorter hop count."""
    from pl_marker_spark.graphops import bottleneck_paths

    edges = spark.createDataFrame(
        [(1, 2, "A", 1), (1, 2, "B", 4),        # parallel -> direct supp 4
         (1, 3, "A", 9), (3, 2, "A", 7),        # 2-hop supp 7
         (3, 4, "A", 8), (4, 2, "A", 8),        # 1->3->4->2 supp 8 (3 hops)
         (6, 7, "A", 5), (6, 8, "A", 5), (8, 7, "A", 5)],  # tie case
        "src_id long, dst_id long, pred string, weight long")
    got = {(r.src_id, r.dst_id): (r.best_support, r.hops)
           for r in bottleneck_paths(edges, max_hops=3).collect()}
    assert got[(1, 2)] == (8, 3)   # two successive strict improvements
    assert got[(1, 3)] == (9, 1)
    assert got[(1, 4)] == (8, 2)
    assert got[(3, 2)] == (8, 2)   # via 4 beats the direct 7
    assert got[(6, 7)] == (5, 1)   # equal-supp 2-hop path keeps hops=1


def test_random_walks_follow_md5_argmin(spark):
    """The next-hop table and the assembled walks must equal an
    independent python recomputation of the md5-argmin rule, and every
    walk must traverse real edges of the symmetrized graph."""
    import hashlib

    import pl_marker_spark.queries_catalog as qc
    from pl_marker_spark.graphops import next_hop_table
    from pl_marker_spark.queries_catalog import q_kg_random_walks

    edges = spark.createDataFrame(
        [(1, 2, "A", 1), (2, 3, "A", 1), (3, 1, "A", 1), (3, 4, "A", 1),
         (5, 5, "A", 1)],   # self-loop: dropped, 5 is isolated
        "src_id long, dst_id long, pred string, weight long")
    und = {(1, 2), (2, 3), (1, 3), (3, 4)}
    adj: dict[int, list[int]] = {}
    for a, b in und:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)

    def expect_next(k, a):
        return min((hashlib.md5(f"{k}:{a}:{b}".encode()).hexdigest(), b)
                   for b in adj[a])[1]

    nxt = {(r.step, r.cur): r.nxt
           for r in next_hop_table(edges, walk_len=4).collect()}
    assert set(nxt) == {(k, a) for k in range(1, 5) for a in adj}
    for (k, a), b in nxt.items():
        assert b == expect_next(k, a)

    orig = qc._pipeline_outputs
    try:
        qc._pipeline_outputs = lambda s, sf: {"edges": edges}
        rows = q_kg_random_walks(spark, "unused").collect()
    finally:
        qc._pipeline_outputs = orig
    walks: dict[int, dict[int, int]] = {}
    for r in rows:
        walks.setdefault(r.walk_id, {})[r.step] = r.node_id
    assert set(walks) == set(adj)           # one walk per non-isolated node
    for start, path in walks.items():
        assert sorted(path) == [0, 1, 2, 3, 4]
        assert path[0] == start
        cur = start
        for k in range(1, 5):
            assert path[k] == expect_next(k, cur)
            assert (min(cur, path[k]), max(cur, path[k])) in und
            cur = path[k]


def test_clustering_and_embed_eval_semantics(spark):
    """(1) Local clustering coefficient on triangle+pendant: interior
    triangle nodes are fully clustered, the hub dilutes to 1/3, the
    pendant (deg 1) is excluded. (2) The filtered-ranking eval pins the
    Bordes FILTERED protocol and the id-ascending tie-break."""
    import pl_marker_spark.queries_catalog as qc
    from pl_marker_spark.queries_catalog import (
        q_kg_clustering,
        q_kg_embed_eval,
    )

    tri = spark.createDataFrame(
        [(1, 2, "A", 1), (2, 3, "A", 1), (1, 3, "A", 1), (1, 4, "A", 1)],
        "src_id long, dst_id long, pred string, weight long")
    orig = qc._pipeline_outputs
    try:
        qc._pipeline_outputs = lambda s, sf: {"edges": tri}
        got = {r.node_id: (r.degree, r.n_tri, r.clustering)
               for r in q_kg_clustering(spark, "unused").collect()}
    finally:
        qc._pipeline_outputs = orig
    assert got[1] == (3, 1, round(2 / 6, 6))
    assert got[2] == (2, 1, 1.0) and got[3] == (2, 1, 1.0)
    assert 4 not in got   # deg 1: coefficient undefined, excluded

    # embed-eval: h=1 (PER); GPE tails 19,20,21,22. True edges (1,PHYS,20)
    # and (1,PHYS,21) are the two queries AND each other's filtered tails.
    # Co-occurrence scores: s(1,22)=2, s(1,19)=s(1,20)=s(1,21)=1, so for
    # both queries candidate 22 outranks (2>1) and candidate 19 ties but
    # wins the id-ascending tie-break (19 < 20, 19 < 21) -> rank 3 each.
    e = spark.createDataFrame(
        [(1, 20, "PHYS", 1), (1, 21, "PHYS", 1)],
        "src_id long, dst_id long, pred string, weight long")
    n = spark.createDataFrame(
        [(1, "PER"), (19, "GPE"), (20, "GPE"), (21, "GPE"), (22, "GPE")],
        "entity_id long, type string")
    me = spark.createDataFrame(
        [("c1", 1), ("c1", 22), ("c2", 1), ("c2", 22),
         ("c3", 1), ("c3", 20), ("c4", 1), ("c4", 21), ("c5", 1), ("c5", 19)],
        "conv_id string, entity_id long")
    try:
        qc._pipeline_outputs = lambda s, sf: {
            "edges": e, "nodes": n, "mention_entity": me}
        rows = q_kg_embed_eval(spark, "unused").collect()
    finally:
        qc._pipeline_outputs = orig
    assert len(rows) == 1
    r = rows[0]
    assert (r.pred, r.n_queries, r.hits1, r.hits3, r.hits10) == \
        ("PHYS", 2, 0, 2, 2)
    assert r.mrr_micro == 2 * (1000000 // 3)


def test_ppr_integer_recurrence_and_seeds(spark):
    """Hand path graph 1-2-3 pins the exact integer PPR recurrence and
    the (degree desc, id asc) seed protocol: with n_seeds=2 the seeds
    are node 2 (deg 2) then node 1 (deg 1 — beats 3 on id), and one
    iteration gives, per seed, exactly per-edge floor((85*r)/ (100*deg))
    contributions plus the 150000 teleport on the seed itself."""
    from pl_marker_spark.graphops import personalized_pagerank

    edges = spark.createDataFrame(
        [(1, 2, "A", 1), (2, 3, "A", 1)],
        "src_id long, dst_id long, pred string, weight long")
    got = {(r.seed_id, r.node): r.ppr_micro
           for r in personalized_pagerank(
               edges, n_seeds=2, iters=1).collect()}
    assert got == {
        # seed 2 (deg 2): 85e6 div 200 = 425000 to each neighbor
        (2, 1): 425000, (2, 3): 425000, (2, 2): 150000,
        # seed 1 (deg 1): 85e6 div 100 = 850000 to node 2
        (1, 2): 850000, (1, 1): 150000,
    }
    # three iterations must conserve <= initial mass per seed (floor
    # division and rank-0 filtering only ever LOSE micro-units) and
    # remain strictly positive everywhere emitted
    r3 = personalized_pagerank(edges, n_seeds=2, iters=3).collect()
    per_seed = {}
    for r in r3:
        assert r.ppr_micro > 0
        per_seed[r.seed_id] = per_seed.get(r.seed_id, 0) + r.ppr_micro
    assert set(per_seed) == {1, 2}
    assert all(v <= 1_000_000 for v in per_seed.values())


def test_neighbor_jaccard_square_graph(spark):
    """The 4-cycle 1-2-3-4-1 pins the wedge/jaccard algebra: exactly the
    two diagonal pairs share neighbors — (1,3) via {2,4} and (2,4) via
    {1,3} — each with n_common=2, degrees 2+2, union 2, jaccard 1.0,
    and is_edge=0 (they are the ER-candidate NON-edges the op exists to
    surface). Adding chord 1-3 flips is_edge for that pair and shrinks
    its jaccard (degrees grow, intersection does not)."""
    from pl_marker_spark.graphops import neighbor_jaccard

    sq = [(1, 2, "A", 1), (2, 3, "A", 1), (3, 4, "A", 1), (4, 1, "A", 1)]
    schema = "src_id long, dst_id long, pred string, weight long"
    got = {(r.a, r.b): (r.n_common, r.is_edge, r.jaccard)
           for r in neighbor_jaccard(
               spark.createDataFrame(sq, schema)).collect()}
    assert got == {(1, 3): (2, 0, 1.0), (2, 4): (2, 0, 1.0)}
    with_chord = spark.createDataFrame(sq + [(1, 3, "A", 1)], schema)
    got2 = {(r.a, r.b): (r.n_common, r.is_edge, r.jaccard)
            for r in neighbor_jaccard(with_chord).collect()}
    # (1,3): neighbors 1={2,4,3}, 3={2,4,1} -> common {2,4}, union 4
    assert got2[(1, 3)] == (2, 1, 0.5)
    assert got2[(2, 4)] == (2, 0, 1.0)


def test_entity_cards_digest_and_counts(spark):
    """Hand graph pins the card algebra: node 1 (PER "alice") has three
    out-facts — two predicates to node 2 ("acme") and one to node 3
    ("paris") — so its card is the three items in BYTE order (ORG-AFF
    before PHYS; '(' sorts before any letter never matters here since
    items differ at the pred/object), n_facts=3, out_weight=5; node 2
    has one out-fact and n_in=2; node 3 holds no card (no out-edges)
    even though it has in-degree. Self-loops count as both out-fact and
    in-edge for their node."""
    from pl_marker_spark.graphops import entity_cards

    edges = spark.createDataFrame(
        [(1, 2, "ORG-AFF", 2), (1, 2, "PHYS", 1), (1, 3, "GEN-AFF", 2),
         (2, 3, "PHYS", 4), (2, 2, "ORG-AFF", 1)],
        "src_id long, dst_id long, pred string, weight long")
    nodes = spark.createDataFrame(
        [(1, "alice", "PER"), (2, "acme", "ORG"), (3, "paris", "GPE")],
        "entity_id long, canonical_name string, type string")
    got = {r.entity_id: r for r in entity_cards(edges, nodes).collect()}
    assert set(got) == {1, 2}
    assert (got[1].n_facts, got[1].out_weight, got[1].n_in) == (3, 5, 0)
    assert got[1].card == "GEN-AFF:paris(2); ORG-AFF:acme(2); PHYS:acme(1)"
    assert (got[2].n_facts, got[2].out_weight, got[2].n_in) == (2, 5, 3)
    assert got[2].card == "ORG-AFF:acme(1); PHYS:paris(4)"
    assert (got[1].canonical_name, got[1].type) == ("alice", "PER")


def test_khop_subgraph_path_graph(spark):
    """Path 1-2-3-4-5 (directed i→i+1, weight i): the unique top-degree
    tie-break picks seeds by id asc among equal degrees — n_seeds=1
    selects node 2 (deg 2, lowest id among the deg-2 interior 2,3,4).
    k=2 reach from 2 = {2:0, 1:1, 3:1, 4:2}; induced directed edges are
    exactly 1→2, 2→3, 3→4 with the endpoint hop annotations, and 4→5 is
    excluded because node 5 is 3 hops out."""
    from pl_marker_spark.graphops import khop_subgraph

    edges = spark.createDataFrame(
        [(i, i + 1, "R", i) for i in range(1, 5)],
        "src_id long, dst_id long, pred string, weight long")
    rows = khop_subgraph(edges, n_seeds=1, k=2).collect()
    got = {(r.src_id, r.dst_id): (r.seed_id, r.src_hops, r.dst_hops, r.weight)
           for r in rows}
    assert got == {(1, 2): (2, 1, 0, 1),
                   (2, 3): (2, 0, 1, 2),
                   (3, 4): (2, 1, 2, 3)}


def test_kg_cc_components_isolated_nodes(spark):
    """The catalog CC row must label isolated entities with their own id
    and size 1 — pin the coalesce path on the kernel output directly:
    edges 1-2, 2-3 plus isolated node 9 → component 1 of size 3 and
    component 9 of size 1."""
    from pyspark.sql import functions as F

    from pl_marker_spark.pipeline.cc import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3)], "src long, dst long")
    nodes = spark.createDataFrame([(1,), (2,), (3,), (9,)], "entity_id long")
    cc = connected_components(edges)
    lbl = (nodes.join(cc, F.col("entity_id") == F.col("sid"), "left")
           .select("entity_id",
                   F.coalesce("component", "entity_id").alias("component")))
    got = {r.entity_id: r.component for r in lbl.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 9: 9}


def test_min_cost_paths_semiring_and_hops(spark):
    """Hand graph pins the (min, +) cheapest-chain semantics: (1)
    parallel edges collapse to their min cost; (2) a cheaper-but-longer
    path beats a costly direct edge, including a 3-hop winner that needs
    two delta-improvement rounds; (3) an equal-cost longer path must NOT
    displace the shorter hop count; (4) costs ADD along the chain."""
    from pl_marker_spark.graphops import min_cost_paths

    edges = spark.createDataFrame(
        [(1, 2, 9), (1, 2, 20),            # parallel -> direct cost 9
         (1, 3, 2), (3, 2, 4),             # 2-hop cost 6
         (3, 4, 1), (4, 2, 2),             # 1->3->4->2 cost 5 (3 hops)
         (6, 7, 4), (6, 8, 2), (8, 7, 2)],  # tie: 2-hop also costs 4
        "src_id long, dst_id long, cost long")
    got = {(r.src_id, r.dst_id): (r.min_cost, r.hops)
           for r in min_cost_paths(edges, max_hops=3).collect()}
    assert got[(1, 2)] == (5, 3)   # two successive strict improvements
    assert got[(1, 3)] == (2, 1)
    assert got[(1, 4)] == (3, 2)
    assert got[(3, 2)] == (3, 2)   # via 4 beats the direct 4
    assert got[(6, 7)] == (4, 1)   # equal-cost 2-hop path keeps hops=1


def test_hits_matches_numpy_and_keeps_zero_degree(spark):
    """graphops.hits must equal the unnormalized textbook recurrence
    computed densely in numpy on a directed hand graph, keep zero-degree
    nodes at 0 (spine left join), drop self-loops, and collapse parallel
    predicates to one edge."""
    import numpy as np

    from pl_marker_spark.graphops import hits

    # directed: 1->2, 1->3, 2->3, 3->1, plus self-loop 2->2 (dropped),
    # duplicate 1->2 (collapsed), and isolated node 9
    pairs = [(1, 2), (1, 3), (2, 3), (3, 1)]
    ids = [1, 2, 3, 9]
    idx = {v: i for i, v in enumerate(ids)}
    A = np.zeros((4, 4), dtype=np.int64)
    for u, v in pairs:
        A[idx[u], idx[v]] = 1
    h = np.ones(4, dtype=np.int64)
    for _ in range(3):
        a = A.T @ h
        h = A @ a
    edges = spark.createDataFrame(
        [(u, v) for u, v in pairs] + [(2, 2), (1, 2)],
        "src_id long, dst_id long")
    nodes = spark.createDataFrame([(i,) for i in ids], "node long")
    got = {r.node: (r.h, r.a) for r in hits(nodes, edges, iters=3).collect()}
    assert got == {v: (int(h[idx[v]]), int(a[idx[v]])) for v in ids}
    assert got[9] == (0, 0)


def test_pred_cardinality_flags_and_fans(spark):
    """Hand graph pins the cardinality profile: pred F is functional
    (every subject has exactly one object) but NOT inverse-functional
    (object 5 has two inbound); pred M is neither (subject 1 fans out
    to 2 objects); avg_out is the exact 6dp mean of per-subject fans."""
    from pl_marker_spark.graphops import pred_cardinality

    edges = spark.createDataFrame(
        [(1, 5, "F"), (2, 5, "F"), (3, 6, "F"),
         (1, 7, "M"), (1, 8, "M"), (2, 9, "M")],
        "src_id long, dst_id long, pred string")
    got = {r.pred: r.asDict() for r in pred_cardinality(edges).collect()}
    f, m = got["F"], got["M"]
    assert (f["n_edges"], f["n_src"], f["n_dst"]) == (3, 3, 2)
    assert (f["max_out"], f["max_in"]) == (1, 2)
    assert f["is_functional"] and not f["is_inverse_functional"]
    assert f["avg_out"] == 1.0
    assert (m["n_edges"], m["n_src"], m["n_dst"]) == (3, 2, 3)
    assert (m["max_out"], m["max_in"]) == (2, 1)
    assert not m["is_functional"] and m["is_inverse_functional"]
    assert m["avg_out"] == 1.5


def test_pred_implication_directions_and_symmetry(spark):
    """Hand graph pins the rule miner: P={ (1,2), (2,1), (3,4) } is
    symmetric on 2 of 3 pairs -> inv self-rule confidence 2/3; Q holds
    on (1,2) only -> P=>Q 'same' support 1 conf 1/3, Q=>P 'same'
    support 1 conf 1; R=(2,1) makes P=>R 'inv' fire on the (1,2)
    positive; 'same' self-rules are excluded."""
    from pl_marker_spark.graphops import pred_implication

    edges = spark.createDataFrame(
        [(1, 2, "P"), (2, 1, "P"), (3, 4, "P"),
         (1, 2, "Q"), (2, 1, "R")],
        "src_id long, dst_id long, pred string")
    got = {(r.p1, r.p2, r.direction): (r.support, r.n_p1,
                                       round(r.confidence, 6))
           for r in pred_implication(edges).collect()}
    assert got[("P", "P", "inv")] == (2, 3, 0.666667)
    assert got[("P", "Q", "same")] == (1, 3, 0.333333)
    assert got[("Q", "P", "same")] == (1, 1, 1.0)
    assert got[("P", "R", "inv")] == (1, 3, 0.333333)
    assert got[("Q", "R", "inv")] == (1, 1, 1.0)
    assert ("P", "P", "same") not in got
    assert ("Q", "Q", "same") not in got


def test_functional_conflicts_routing_and_digest(spark):
    """Hand graph pins conflict detection: pred F (share 3/4 = 0.75 <
    0.8) yields a non-suspect conflict for subject 4 with digest '7,8';
    pred G (share 4/5 = 0.8) yields a SUSPECT conflict for subject 5;
    a duplicated edge row must not inflate n_obj (distinct first)."""
    from pl_marker_spark.graphops import functional_conflicts

    edges = spark.createDataFrame(
        [(1, 5, "F"), (1, 5, "F"), (2, 5, "F"), (3, 6, "F"),
         (4, 7, "F"), (4, 8, "F"),
         (1, 2, "G"), (2, 3, "G"), (3, 4, "G"), (4, 5, "G"),
         (5, 6, "G"), (5, 7, "G")],
        "src_id long, dst_id long, pred string")
    got = {(r.pred, r.src_id): r.asDict()
           for r in functional_conflicts(edges).collect()}
    assert set(got) == {("F", 4), ("G", 5)}
    f = got[("F", 4)]
    assert (f["n_obj"], f["func_share"], f["is_suspect"]) == (2, 0.75, False)
    assert f["objs"] == "7,8"
    g = got[("G", 5)]
    assert (g["n_obj"], g["func_share"], g["is_suspect"]) == (2, 0.8, True)
    assert g["objs"] == "6,7"


def test_redundant_edges_witnesses_and_exclusions(spark):
    """Hand graph pins the reduction prepass: (1,3,P) is redundant with
    TWO witnesses (mids 2 and 4); (1,2,P) is not (no same-pred chain);
    a cross-pred chain must not witness (5->6 P, 6->9 Q does not make
    (5,9,P) redundant); a self-loop mid is excluded ((7,7)+(7,8) does
    not flag (7,8))."""
    from pl_marker_spark.graphops import redundant_edges

    edges = spark.createDataFrame(
        [(1, 2, "P"), (2, 3, "P"), (1, 3, "P"), (1, 4, "P"), (4, 3, "P"),
         (5, 6, "P"), (6, 9, "Q"), (5, 9, "P"),
         (7, 7, "P"), (7, 8, "P")],
        "src_id long, dst_id long, pred string")
    got = {(r.pred, r.src_id, r.dst_id): r.n_witness
           for r in redundant_edges(edges).collect()}
    assert got == {("P", 1, 3): 2}
    # any-pred mode: the cross-pred chain 5 -P-> 6 -Q-> 9 now witnesses
    # the present (5, 9, P); everything else is unchanged
    got_any = {(r.pred, r.src_id, r.dst_id): r.n_witness
               for r in redundant_edges(edges, same_pred=False).collect()}
    assert got_any == {("P", 1, 3): 2, ("P", 5, 9): 1}


def test_b3_summary_hand_clusters(spark):
    """Hand clustering pins the B³ micro-unit arithmetic: predicted
    cluster 1 over-merges three 'A' mentions with one 'B' (precision
    hit), the second 'B' sits alone (recall hit), 'C' is perfect.
    P_sum = 9e6//4 + 1e6//4 + 1e6 + 1e6 = 4.5e6 -> p 750000;
    R_sum = 9e6//3 + 1e6//2 + 1e6//2 + 1e6 = 5e6 -> r 833333;
    every // floors BEFORE the sum, so the values are exact."""
    from pl_marker_spark.queries_catalog import b3_summary

    me = spark.createDataFrame(
        [(1, "A"), (1, "A"), (1, "A"), (1, "B"), (2, "B"), (3, "C")],
        "entity_id long, surface string")
    row = b3_summary(me).collect()[0]
    assert (row.n_mentions, row.n_clusters, row.n_golds) == (6, 3, 3)
    assert (row.b3_p_micro, row.b3_r_micro) == (750_000, 833_333)
    assert row.b3_f1_micro == (2 * 750_000 * 833_333) // (750_000 + 833_333)


def test_rule_mine_2hop_pca_vs_std(spark):
    """Hand graph pins AMIE 2-hop mining — the textbook PCA example:
    born_in(a1,c1) ∧ city_of(c1,C) and born_in(a2,c2) ∧ city_of(c2,C)
    give 2 body pairs; only citizen_of(a1,C) exists, so conf_std = 1/2
    but conf_pca = 1/1 (a2 has NO citizen_of fact -> not a
    counterexample under partial completeness). A degenerate closed
    path (x == z) must not enter the body, and support-0 rules are
    absent."""
    from pl_marker_spark.graphops import rule_mine_2hop

    edges = spark.createDataFrame(
        [(1, 10, "born_in"), (2, 20, "born_in"),
         (10, 100, "city_of"), (20, 100, "city_of"),
         (1, 100, "citizen_of"),
         # x == z closed path: 3 -P-> 4 -Q-> 3 must not count as a body
         (3, 4, "P"), (4, 3, "Q")],
        "src_id long, dst_id long, pred string")
    rows = {(r.p1, r.p2, r.p3): r.asDict()
            for r in rule_mine_2hop(edges).collect()}
    r = rows[("born_in", "city_of", "citizen_of")]
    assert (r["body_pairs"], r["support"], r["pca_body"]) == (2, 1, 1)
    assert (r["conf_std"], r["conf_pca"]) == (0.5, 1.0)
    # the degenerate (3,4,P)+(4,3,Q) path produced no rule at all
    assert all(p1 not in ("P", "Q") for (p1, _, _) in rows)
    # no zero-support rules are emitted
    assert all(v["support"] >= 1 for v in rows.values())


def test_community_modularity_two_triangles(spark):
    """Two triangles {1,2,3} and {4,5,6} bridged by 3-4: LPA (3 rounds,
    smallest-label ties) lands communities 1 and 4; m=7, each community
    has 3 within edges and degree mass 7, so each Newman term is
    3/7 - (7/14)^2 = 0.178571 and Q = 2x. Directed duplicates and a
    self-loop must collapse/drop in the canonical pair prep."""
    from pl_marker_spark.graphops import community_modularity

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4),
         (2, 1),          # reverse duplicate of (1,2) -> same canonical pair
         (5, 5)],         # self-loop -> dropped
        "src_id long, dst_id long")
    got = {r.community: r.asDict()
           for r in community_modularity(edges).collect()}
    assert set(got) == {1, 4}
    for c in (1, 4):
        assert got[c]["n_nodes"] == 3
        assert got[c]["within_edges"] == 3
        assert got[c]["degree_sum"] == 7
        assert got[c]["modularity"] == 0.178571


def test_conf_calibration_hand_buckets(spark):
    """Hand frame pins the calibration algebra: scores 0.0/0.5/1.0 land
    in buckets 0/5/9 (max clamps to the last band); the 0.5 prediction
    matches gold only via the SWAPPED orientation (the symmetric-agnostic
    hit rule); the 1.0 prediction's label mismatch is a miss."""
    from pl_marker_spark.queries_catalog import conf_calibration

    t = spark.createDataFrame(
        [("c", 0, 1, 2, 3, 4, "R", 0.0),     # exact gold hit
         ("c", 0, 5, 6, 7, 8, "S", 0.5),     # hit via swapped orientation
         ("c", 0, 1, 2, 7, 8, "R", 1.0)],    # no gold -> miss
        "conv_id string, turn_idx int, s1 int, e1 int, s2 int, e2 int, "
        "pred string, score double")
    gold = spark.createDataFrame(
        [("c", 0, 1, 2, 3, 4, "R"),
         ("c", 0, 7, 8, 5, 6, "S")],
        "conv_id string, turn_idx int, s1 int, e1 int, s2 int, e2 int, "
        "label string")
    got = {r.bucket: (r.n, r.n_hit, r.prec)
           for r in conf_calibration(t, gold).collect()}
    assert got == {0: (1, 1, 1.0), 5: (1, 1, 1.0), 9: (1, 0, 0.0)}


def test_incremental_components_equals_full(spark):
    """The star-forest fold is row-identical to a full recompute: base
    edges {1-2, 6-7} + pre-existing singleton 9; delta {2-3, 4-5}. The
    merged component {1,2,3} takes label 1, the NEW pair {4,5} label 4,
    the untouched {6,7} KEEPS label 6, and 9 stays its own singleton.
    Both the driver union-find gate and the distributed alternating-star
    branch (local_threshold=0) of the fold must agree with CC over the
    full union."""
    from pl_marker_spark.pipeline.cc import (connected_components,
                                             incremental_components)

    old = spark.createDataFrame([(1, 2), (6, 7)], "src long, dst long")
    new = spark.createDataFrame([(2, 3), (4, 5)], "src long, dst long")
    assign = connected_components(old).unionByName(
        spark.createDataFrame([(9, 9)], "sid long, component long"))
    full = {r.sid: r.component
            for r in connected_components(old.unionByName(new)).collect()}
    full[9] = 9     # the full recompute never saw the isolated node
    for thr in (100_000, 0):
        inc = {r.sid: r.component
               for r in incremental_components(
                   assign, new, local_threshold=thr).collect()}
        assert inc == full == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4,
                               6: 6, 7: 6, 9: 9}


def test_incremental_components_random_equivalence(spark):
    """Randomized pin of the star-forest equivalence claim: for seeded
    random graphs, CC(base) folded with the delta equals CC(base ∪
    delta) row-for-row — including nodes that appear only in the base
    assignment. One Spark run per seed; the full recompute is a local
    union-find (independent implementation)."""
    import random

    from pl_marker_spark.pipeline.cc import (connected_components,
                                             incremental_components)

    for seed in (7, 23, 91):
        rng = random.Random(seed)
        n = 60
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(50)]
        base, delta = edges[:30], edges[30:]
        # local union-find over the union — the independent oracle
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        touched = set()
        for u, v in edges:
            touched.update((u, v))
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        base_nodes = {x for uv in base for x in uv}
        expect = {x: find(x) for x in touched | base_nodes}

        bdf = spark.createDataFrame(base, "src long, dst long")
        ddf = spark.createDataFrame(delta, "src long, dst long")
        assign = connected_components(bdf)
        got = {r.sid: r.component
               for r in incremental_components(assign, ddf).collect()}
        # nodes only in the delta enter via the fold; nodes only in the
        # base stay via the assignment spine — both must carry the
        # union's min-id labels
        assert got == expect, f"seed {seed}: {got} != {expect}"
