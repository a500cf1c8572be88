"""Single-process oracle for the graph half of the pipeline: entity linking
(blocking + affine-MinHash LSH + Jaccard verify), connected-components
canonicalization, and node/edge materialization.

Independent reimplementation of pipeline/link.py + pipeline/cc.py +
pipeline/graph.py semantics with plain dicts/loops and union-find — shares
only the portable hash (phash.py) and the link constants, which *define*
the LSH family the same way surrogate.py defines the model. Used to give
kg_graph_nodes / kg_graph_edges real driver-side oracles (VALUES twins via
oracle_values.py) in addition to pytest equality.
"""

from __future__ import annotations

import re
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

from .phash import phash64_py
from .pipeline.link import (
    JACCARD_THRESHOLD,
    LINK_A,
    LINK_B,
    LINK_P,
    N_BANDS,
    N_HASHES,
)
from .tokenizer import split_words


def round_half_up(x: float, nd: int) -> float:
    """Twin of Spark's F.round on doubles: BigDecimal.valueOf(x) uses the
    shortest round-trip decimal (same as Python repr), then HALF_UP."""
    return float(Decimal(repr(float(x))).quantize(Decimal(1).scaleb(-nd), ROUND_HALF_UP))


def _normalize(surface: str) -> str:
    return re.sub(r"[^a-z0-9 ]", "", surface.strip().lower())


def _shingles(norm: str, k: int = 3) -> list[str]:
    padded = "^" + norm + "$"
    n = max(len(padded) - (k - 1), 1)
    out, seen = [], set()
    for i in range(n):
        s = padded[i : i + k]
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def _sid(label: str, surface: str) -> int:
    return phash64_py(f"{label}\x1f{surface}", "sid")


def _sig(shingles: list[str]) -> list[int]:
    hs = [phash64_py(s, "sh", chars=8) for s in shingles]
    return [min((LINK_A[i] * h + LINK_B[i]) % LINK_P for h in hs) for i in range(N_HASHES)]


def mention_surfaces_py(refined, turn_words):
    """refined: [(conv, turn, start, end, label)]; turn_words: {(conv, turn):
    [words]} -> [(conv, turn, start, end, label, surface)]."""
    word_off: dict[tuple, int] = {}
    by_conv: dict[str, list[int]] = defaultdict(list)
    for (c, t) in turn_words:
        by_conv[c].append(t)
    for c, ts in by_conv.items():
        off = 0
        for t in sorted(ts):
            word_off[(c, t)] = off
            off += len(turn_words[(c, t)])
    out = []
    for c, t, s, e, label in refined:
        w = turn_words[(c, t)]
        off = word_off[(c, t)]
        out.append((c, t, s, e, label, " ".join(w[s - off : e - off + 1])))
    return out


class _UnionFind:
    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent.setdefault(x, x)
        while p != self.parent[p]:
            self.parent[p] = self.parent[self.parent[p]]
            p = self.parent[p]
        self.parent[x] = p
        return p

    def union(self, a: int, b: int):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def graph_oracle(refined, triples, turn_words):
    """Returns dict with vocab / sim_edges / assignment / nodes / edges,
    matching pipeline/graph.build_graph output values exactly.

    nodes rows: (entity_id, canonical_name, type, n_mentions, n_surfaces)
    edges rows: (src_id, dst_id, pred, weight, score_sum[round 9])
    """
    surfaces = mention_surfaces_py(refined, turn_words)

    # vocab: distinct (label, surface) with counts (link.build_vocab)
    counts: dict[tuple, int] = defaultdict(int)
    for _c, _t, _s, _e, label, surface in surfaces:
        counts[(label, surface)] += 1
    vocab = []
    for (label, surface), n in counts.items():
        norm = _normalize(surface)
        sh = _shingles(norm)
        vocab.append(
            {"label": label, "surface": surface, "n_mentions": n,
             "norm": norm, "sid": _sid(label, surface), "shingles": sh,
             "sig": _sig(sh)}
        )

    # banding (link.link_entities): bucket on (label, band, bkey)
    rpb = N_HASHES // N_BANDS
    buckets: dict[tuple, list[dict]] = defaultdict(list)
    for v in vocab:
        for b in range(N_BANDS):
            key_str = ":".join(str(x) for x in v["sig"][b * rpb : (b + 1) * rpb])
            bkey = phash64_py(key_str, f"band{b}")
            buckets[(v["label"], b, bkey)].append(v)
    cand: dict[tuple, tuple] = {}
    for members in buckets.values():
        ms = sorted(members, key=lambda v: v["sid"])
        for i, a in enumerate(ms):
            for bb in ms[i + 1 :]:
                if a["sid"] != bb["sid"]:
                    cand[(a["sid"], bb["sid"])] = (a, bb)
    sim_edges = []
    for (s1, s2), (a, bb) in cand.items():
        inter = len(set(a["shingles"]) & set(bb["shingles"]))
        union = len(set(a["shingles"]) | set(bb["shingles"]))
        sim = round_half_up(inter / union, 9)
        if sim >= JACCARD_THRESHOLD or a["norm"] == bb["norm"]:
            sim_edges.append((s1, s2, sim))

    # connected components -> entity assignment (cc.connected_components:
    # component id = min sid; here via union-find, provably the same map)
    uf = _UnionFind()
    for s1, s2, _sim in sim_edges:
        uf.union(s1, s2)
    comp_min: dict[int, int] = {}
    for v in vocab:
        r = uf.find(v["sid"])
        comp_min[r] = min(comp_min.get(r, r), v["sid"])
    for v in vocab:
        v["entity_id"] = comp_min[uf.find(v["sid"])]

    # nodes (graph.build_graph): canonical = max n_mentions, tie asc surface
    by_entity: dict[int, list[dict]] = defaultdict(list)
    for v in vocab:
        by_entity[v["entity_id"]].append(v)
    nodes = []
    for eid, vs in by_entity.items():
        canon = sorted(vs, key=lambda v: (-v["n_mentions"], v["surface"]))[0]
        nodes.append(
            (eid, canon["surface"], canon["label"],
             sum(v["n_mentions"] for v in vs), len(vs))
        )

    # edges: mention span -> entity via (label, surface); triples melted
    ent_of = {(v["label"], v["surface"]): v["entity_id"] for v in vocab}
    mention_entity = sorted(
        (c, t, s, e, label, surface, ent_of[(label, surface)])
        for c, t, s, e, label, surface in surfaces
    )
    span_entity = {
        (c, t, s, e): ent_of[(label, surface)]
        for c, t, s, e, label, surface in surfaces
    }
    agg: dict[tuple, list[float]] = defaultdict(list)
    for c, t, s1, e1, s2, e2, pred, score, _n1, _n2 in triples:
        src = span_entity.get((c, t, s1, e1))
        dst = span_entity.get((c, t, s2, e2))
        if src is None or dst is None:
            continue
        agg[(src, dst, pred)].append(score)
    edges = [
        (src, dst, pred, len(scores), round_half_up(sum(scores), 9))
        for (src, dst, pred), scores in agg.items()
    ]
    return {
        "vocab": vocab,
        "sim_edges": sorted(sim_edges),
        "mention_entity": mention_entity,
        "nodes": sorted(nodes),
        "edges": sorted(edges),
    }
