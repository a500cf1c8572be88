"""Single-process oracle for the O17 coref surface (conll_writer.py).

The bracket-column oracle follows the reference algorithm's shape directly
(conll.py:17-70: start_map/end_map/word_map defaultdicts, the two reverse
sorts, the ends→singles→starts append order) — re-derived, not copied —
over plain dicts. The metric oracle computes MUC / B-cubed / CEAF-e with
loop-based formula evaluation and exact Fraction arithmetic for the final
ratios; its optimal-assignment solver (_assign_max_py) is an independently
written pure-python Kuhn-Munkres (1-based lists, scalar loops) from the
numpy-vectorized one in conll_writer._assign_max — both are anchored by
the brute-force permutation property test in tests/test_coref.py.
"""

from __future__ import annotations

from collections import defaultdict
from fractions import Fraction

from .oracle_graph import round_half_up


# --------------------------------------------------------------------------
# Bracket column (reference conll.py:17-70 semantics)
# --------------------------------------------------------------------------


def coref_column_py(clusters_by_doc: dict[str, list[list[tuple[int, int]]]]):
    """{doc: [cluster -> [(start, end), ...]]} (enumeration order = cluster
    id) -> [(doc, word_idx, coref_string)] for bracket-bearing words only.
    Mirrors output_conll's per-word assembly: ends (sorted start DESC),
    singles (insertion order), starts (sorted end DESC), '|'-joined."""
    out = []
    for doc in sorted(clusters_by_doc):
        start_map = defaultdict(list)
        end_map = defaultdict(list)
        word_map = defaultdict(list)
        for cluster_id, mentions in enumerate(clusters_by_doc[doc]):
            for start, end in mentions:
                if start == end:
                    word_map[start].append(cluster_id)
                else:
                    start_map[start].append((cluster_id, end))
                    end_map[end].append((cluster_id, start))
        for k, v in start_map.items():
            start_map[k] = [c for c, e in sorted(v, key=lambda x: x[1], reverse=True)]
        for k, v in end_map.items():
            end_map[k] = [c for c, s in sorted(v, key=lambda x: x[1], reverse=True)]
        for w in sorted(set(start_map) | set(end_map) | set(word_map)):
            parts = []
            for c in end_map.get(w, []):
                parts.append(f"{c})")
            for c in word_map.get(w, []):
                parts.append(f"({c})")
            for c in start_map.get(w, []):
                parts.append(f"({c}")
            out.append((doc, w, "|".join(parts)))
    return out


def clusters_from_mentions(mention_entity_rows) -> dict[str, list[list[tuple[int, int]]]]:
    """[(doc, start, end, entity_key)] -> per-doc cluster lists in the
    deterministic enumeration order (earliest mention (start, end), ties by
    entity key) — the twin of conll_writer.coref_clusters."""
    spans = defaultdict(set)
    for doc, s, e, ent in mention_entity_rows:
        spans[(doc, ent)].add((s, e))
    by_doc: dict[str, list[tuple[tuple, object, list]]] = defaultdict(list)
    for (doc, ent), ms in spans.items():
        ms = sorted(ms)
        by_doc[doc].append((ms[0], ent, ms))
    return {
        doc: [ms for _f, _e, ms in sorted(lst, key=lambda x: (x[0], x[1]))]
        for doc, lst in by_doc.items()
    }


# --------------------------------------------------------------------------
# Metrics (native twin of conll.py:72-98's scorer.pl metrics)
# --------------------------------------------------------------------------


def _assign_max_py(weights: dict[tuple[int, int], Fraction], n: int, m: int):
    """Maximum-weight assignment over a sparse {(row, col): w>=0} dict;
    returns the matched (row, col) pairs. Pure-python Kuhn-Munkres with
    potentials over the implicit dense matrix (missing cells weigh 0)."""
    transposed = False
    if n > m:
        weights = {(c, r): w for (r, c), w in weights.items()}
        n, m = m, n
        transposed = True

    def cost(i, j):  # 1-based, min-cost form
        return -float(weights.get((i - 1, j - 1), 0.0))

    INF = float("inf")
    u = [0.0] * (n + 1)
    v = [0.0] * (m + 1)
    p = [0] * (m + 1)
    way = [0] * (m + 1)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = [INF] * (m + 1)
        used = [False] * (m + 1)
        while True:
            used[j0] = True
            i0 = p[j0]
            delta = INF
            j1 = 0
            for j in range(1, m + 1):
                if used[j]:
                    continue
                cur = cost(i0, j) - u[i0] - v[j]
                if cur < minv[j]:
                    minv[j] = cur
                    way[j] = j0
                if minv[j] < delta:
                    delta = minv[j]
                    j1 = j
            for j in range(m + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    pairs = [(p[j] - 1, j - 1) for j in range(1, m + 1) if p[j]]
    if transposed:
        pairs = [(c, r) for r, c in pairs]
    return pairs


def coref_metrics_py(gold_by_doc: dict, pred_by_doc: dict):
    """{doc: [cluster -> [(s, e), ...]]} twice -> [(metric, r, p, f1)] rows
    (muc / bcub / ceafe), exact Fraction accumulation, rounded to 6."""
    muc_rn = muc_rd = muc_pn = muc_pd = 0
    b3_rn = b3_pn = Fraction(0)
    b3_rd = b3_pd = 0
    ce_n = Fraction(0)
    ce_rd = ce_pd = 0
    docs = sorted(set(gold_by_doc) | set(pred_by_doc))
    for doc in docs:
        gold = [set(c) for c in gold_by_doc.get(doc, [])]
        pred = [set(c) for c in pred_by_doc.get(doc, [])]
        pred_of = {mn: ri for ri, r in enumerate(pred) for mn in r}
        gold_of = {mn: ki for ki, k in enumerate(gold) for mn in k}
        # MUC
        for k in gold:
            parts = {pred_of[mn] for mn in k if mn in pred_of}
            unmatched = sum(1 for mn in k if mn not in pred_of)
            muc_rn += len(k) - (len(parts) + unmatched)
            muc_rd += len(k) - 1
        for r in pred:
            parts = {gold_of[mn] for mn in r if mn in gold_of}
            unmatched = sum(1 for mn in r if mn not in gold_of)
            muc_pn += len(r) - (len(parts) + unmatched)
            muc_pd += len(r) - 1
        # B-cubed + CEAF intersections
        inter: dict[tuple[int, int], int] = defaultdict(int)
        for mn, ki in gold_of.items():
            if mn in pred_of:
                inter[(ki, pred_of[mn])] += 1
        for (ki, ri), i in inter.items():
            b3_rn += Fraction(i * i, len(gold[ki]))
            b3_pn += Fraction(i * i, len(pred[ri]))
        b3_rd += sum(len(k) for k in gold)
        b3_pd += sum(len(r) for r in pred)
        # CEAF-e
        ce_rd += len(gold)
        ce_pd += len(pred)
        if inter:
            gks = sorted({ki for ki, _ in inter})
            rks = sorted({ri for _, ri in inter})
            gix = {k: i for i, k in enumerate(gks)}
            rix = {k: i for i, k in enumerate(rks)}
            w = {
                (gix[ki], rix[ri]): Fraction(2 * i, len(gold[ki]) + len(pred[ri]))
                for (ki, ri), i in inter.items()
            }
            for gi, ri in _assign_max_py(w, len(gks), len(rks)):
                ce_n += w.get((gi, ri), Fraction(0))

    def prf(rn, rd, pn, pd):
        r = Fraction(rn, rd) if rd else Fraction(0)
        p = Fraction(pn, pd) if pd else Fraction(0)
        f = 2 * r * p / (r + p) if (r + p) else Fraction(0)
        return r, p, f

    rows = []
    for metric, (rn, rd, pn, pd) in (
        ("muc", (muc_rn, muc_rd, muc_pn, muc_pd)),
        ("bcub", (b3_rn, b3_rd, b3_pn, b3_pd)),
        ("ceafe", (ce_n, ce_rd, ce_n, ce_pd)),
    ):
        r, p, f = prf(rn, rd, pn, pd)
        rows.append(
            (metric, round_half_up(float(r), 6), round_half_up(float(p), 6),
             round_half_up(float(f), 6))
        )
    return rows
