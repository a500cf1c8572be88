"""Single-process oracle: a faithful, independent reimplementation of the
reference's evaluation semantics (thunlp/PL-Marker), used only by pytest to
verify the Spark pipeline triple-for-triple (SURVEY.md §5 "oracle level").

This follows the *published behavior* of:
- NER scoring + greedy non-overlap suppression: run_acener.py:661-745
- RE pair scoring, bidirectional fusion with the label-block permutation,
  inverse decode, relation suppression, and NER refinement:
  run_re.py:726-897
- micro P/R/F1 with symmetric-relation recall doubling:
  run_acener.py:751-757, run_re.py:204-209, 856-881, 998-1010

It shares only the tokenizer / world / surrogate modules with the Spark
pipeline (those *define* the model); windowing, enumeration, packing order,
fusion and scoring are re-derived here with plain dict/loop code so a bug in
the Spark relational formulation cannot hide.
"""

from __future__ import annotations

import itertools
from collections import defaultdict

import numpy as np

from .config import PipelineConfig
from .surrogate import (
    aux_obj_ner,
    ner_decode,
    ner_logits_for_surfaces,
    re_logits_for_pair,
)
from .tokenizer import CLS, SEP, split_words, surface_of_span, tokenize_word
from .world import (
    NER_LABELS,
    NUM_REL,
    NUM_SYM,
    REL_LABELS,
    SYM_LABELS,
    score_key6,
)


def _overlap(a, b) -> bool:
    return (b[0] <= a[0] <= b[1]) or (a[0] <= b[0] <= a[1])


def _conv_structures(turn_texts: list[str], family: str = "bert"):
    """words / subwords / alignment prefix sums for one conversation."""
    turn_words = [split_words(t) for t in turn_texts]
    words = [w for tw in turn_words for w in tw]
    pieces = [tokenize_word(w, family) for w in words]
    lens = [len(p) for p in pieces]
    subwords = [p for pl in pieces for p in pl]
    t2s = [0] + list(itertools.accumulate(lens))
    word_bounds = [0] + list(itertools.accumulate(len(tw) for tw in turn_words))
    sub_bounds = [t2s[b] for b in word_bounds]
    return words, subwords, t2s, word_bounds, sub_bounds


def _window(subwords, sub_bounds, n, budget, truncate):
    s0, s1 = sub_bounds[n], sub_bounds[n + 1]
    sent_len = s1 - s0
    left_len, right_len = s0, len(subwords) - s1
    half = (budget - sent_len) // 2
    lc = rc = 0
    if sent_len < budget or not truncate:
        if left_len < right_len:
            lc = min(left_len, half)
            rc = min(right_len, budget - lc - sent_len)
        else:
            rc = min(right_len, half)
            lc = min(left_len, budget - rc - sent_len)
    off = s0 - lc
    tgt = subwords[off : s1 + rc]
    if truncate:
        tgt = tgt[:budget]
    return [CLS] + tgt + [SEP], off


def oracle_ner(conv_turns: dict[str, list[str]], cfg: PipelineConfig):
    """conv_id -> ordered turn texts. Returns
    (mentions, raw_predictions) where mentions are post-suppression rows
    (conv, turn, start, end, label, score) and raw_predictions are the
    pre-suppression NIL-filtered scores (for the f1_overlap variant)."""
    budget = cfg.budget_ner()
    mentions = []
    raw = []
    for cid, texts in conv_turns.items():
        words, subwords, t2s, wb, sb = _conv_structures(texts, cfg.tokenizer_family)
        for n in range(len(texts)):
            win, off = _window(subwords, sb, n, budget, truncate=False)
            spans = []
            for ws in range(wb[n], wb[n + 1]):
                for we in range(ws, min(ws + cfg.max_mention_ori_length, wb[n + 1])):
                    lo = t2s[ws] - off + 1
                    hi = t2s[we + 1] - off
                    spans.append((lo, hi, ws, we))
            if not spans:
                continue
            if cfg.model in ("packed_linear", "hf"):
                # tensor-consuming head: chunked like the pipeline's K1
                # packing (group membership provably cannot change logits —
                # the 2D mask isolates marker pairs; tests/test_models.py).
                # For "hf" the adapter's heads are shared with the pipeline
                # by design (heads *define* the model, like surrogate.py);
                # windowing/packing/suppression stay independently derived.
                from .kernels import assemble_ner_tensors
                from .models import get_hf_adapter, ner_head_logits

                if cfg.model == "hf":
                    head = get_hf_adapter(cfg.checkpoint_dir, "ner",
                                          cfg.use_full_layer).ner_head_logits
                else:
                    def head(*a, _f=cfg.use_full_layer == 0, **k):
                        return ner_head_logits(*a, full_mask=_f, **k)
                dL = cfg.max_pair_length_ner
                probs_l, preds_l = [], []
                for i in range(0, len(spans), dL):
                    grp = [(lo, hi) for lo, hi, _, _ in spans[i : i + dL]]
                    ii, pi, att = assemble_ner_tensors(
                        win, grp, cfg.max_seq_length_ner, dL)
                    p_, k_ = ner_decode(
                        head(ii, pi, att, grp,
                             cfg.max_seq_length_ner,
                             cfg.ner_feature))
                    probs_l.extend(p_.tolist())
                    preds_l.extend(k_.tolist())
                probs, preds = probs_l, preds_l
            else:
                surfaces = [surface_of_span(win, lo, hi, cfg.tokenizer_family)
                            for lo, hi, _, _ in spans]
                probs, preds = ner_decode(ner_logits_for_surfaces(surfaces))
            sent_results = []
            for (lo, hi, ws, we), p, k in zip(spans, probs, preds):
                if NER_LABELS[k] != "NIL":
                    sent_results.append((float(p), (ws, we), NER_LABELS[k]))
                    raw.append((cid, n, ws, we, NER_LABELS[k], float(p)))
            sent_results.sort(key=lambda x: (-score_key6(x[0]), x[1]))
            kept = []
            for item in sent_results:
                clash = False
                for other in kept:
                    if _overlap(item[1], other[1]) and (
                        cfg.overlap_any or item[2] == other[2]
                    ):
                        clash = True
                        break
                if not clash:
                    kept.append(item)
            for p, (ws, we), lab in kept:
                mentions.append((cid, n, ws, we, lab, p))
    mentions.sort(key=lambda m: (m[0], m[1], m[2], m[3], m[4]))
    return mentions, raw


def oracle_two_stage(conv_turns: dict[str, list[str]], cfg: PipelineConfig,
                     top_k: int = 256):
    """Two-stage NER oracle (pipeline/bio.two_stage_mentions): BIO tagging →
    candidate spans (conversation-level offsets, top-k by 1-P(NIL)) → packed
    scoring restricted to candidates → greedy suppression.

    Shares the pure tagger functions (tag_words_bio / bio_to_spans — they
    define the surrogate BIO model, like surrogate.py defines the heads) and
    re-derives windowing, candidate ranking and suppression independently."""
    from .pipeline.bio import bio_to_spans, tag_words_bio
    from .world import jitter

    budget = cfg.budget_ner()
    mentions = []
    for cid, texts in conv_turns.items():
        words, subwords, t2s, wb, sb = _conv_structures(texts, cfg.tokenizer_family)
        for n in range(len(texts)):
            local = words[wb[n] : wb[n + 1]]
            cands = [
                (wb[n] + s, wb[n] + e,
                 0.9 + jitter("cand|" + " ".join(local[s : e + 1])))
                for s, e, _label in bio_to_spans(tag_words_bio(local))
            ]
            cands.sort(key=lambda x: (-x[2], x[0], x[1]))
            cands = sorted((ws, we) for ws, we, _p in cands[:top_k])
            if not cands:
                continue
            win, off = _window(subwords, sb, n, budget, truncate=False)
            spans = [
                (t2s[ws] - off + 1, t2s[we + 1] - off, ws, we)
                for ws, we in cands
            ]
            surfaces = [surface_of_span(win, lo, hi, cfg.tokenizer_family)
                        for lo, hi, _, _ in spans]
            probs, preds = ner_decode(ner_logits_for_surfaces(surfaces))
            sent_results = []
            for (lo, hi, ws, we), p, k in zip(spans, probs, preds):
                if NER_LABELS[k] != "NIL":
                    sent_results.append((float(p), (ws, we), NER_LABELS[k]))
            sent_results.sort(key=lambda x: (-score_key6(x[0]), x[1]))
            kept = []
            for item in sent_results:
                clash = any(
                    _overlap(item[1], o[1]) and (cfg.overlap_any or item[2] == o[2])
                    for o in kept
                )
                if not clash:
                    kept.append(item)
            for p, (ws, we), lab in kept:
                mentions.append((cid, n, ws, we, lab, p))
    mentions.sort(key=lambda m: (m[0], m[1], m[2], m[3], m[4]))
    return mentions


def oracle_re(conv_turns: dict[str, list[str]], mentions, cfg: PipelineConfig):
    """Full RE flow on predicted mentions. Returns (triples, refined_mentions)
    with triples rows (conv, turn, s1, e1, s2, e2, pred, score, subj_type,
    obj_type)."""
    budget = cfg.budget_re()
    max_seq = cfg.max_seq_length_re
    by_turn = defaultdict(list)
    for cid, n, ws, we, lab, _score in mentions:
        by_turn[(cid, n)].append((ws, we, lab))
    for v in by_turn.values():
        v.sort()

    triples = []
    refined = []
    for cid, texts in conv_turns.items():
        words, subwords, t2s, wb, sb = _conv_structures(texts, cfg.tokenizer_family)
        for n in range(len(texts)):
            ments = by_turn.get((cid, n), [])
            if not ments:
                continue
            win, off = _window(subwords, sb, n, budget, truncate=True)
            # pair scoring (dict semantics: last write wins, insertion order
            # = subject-major as in the reference DataLoader order)
            pair_scores: dict[tuple, tuple[list[float], str]] = {}

            def _xform(logits):
                if cfg.eval_logsoftmax:
                    a = np.asarray(logits) - max(logits)
                    return (a - np.log(np.exp(a).sum())).tolist()
                if cfg.eval_softmax:
                    a = np.exp(np.asarray(logits) - max(logits))
                    return (a / a.sum()).tolist()
                return list(logits)

            for sub in ments:
                sub_s = t2s[sub[0]] - off + 1
                sub_e0 = t2s[sub[1] + 1] - off
                sub_e = sub_e0 + 2
                if sub_e >= max_seq - 1:
                    continue
                sub_surface = " ".join(words[sub[0] : sub[1] + 1])
                objs = []
                for obj in ments:
                    left = t2s[obj[0]] - off + 1
                    right = t2s[obj[1] + 1] - off
                    if obj[0] >= sub[0]:
                        left += 1
                        if obj[0] > sub[1]:
                            left += 1
                    if obj[1] >= sub[0]:
                        right += 1
                        if obj[1] > sub[1]:
                            right += 1
                    if right >= max_seq - 1:
                        continue
                    objs.append((left, right, obj))
                if cfg.model in ("packed_linear", "hf"):
                    from .kernels import assemble_re_tensors
                    from .tokenizer import SUB_L, SUB_R

                    if cfg.use_typemarker:
                        from .world import NER_INDEX, NUM_NER

                        ti = NER_INDEX[sub[2]]
                        l_m, r_m = f"[unused{2 + ti}]", f"[unused{2 + ti + NUM_NER}]"
                    else:
                        l_m, r_m = SUB_L, SUB_R
                    tokens = (
                        win[:sub_s] + [l_m] + win[sub_s : sub_e0 + 1]
                        + [r_m] + win[sub_e0 + 1 :]
                    )
                    from .models import get_hf_adapter, re_head_logits

                    if cfg.model == "hf":
                        re_head = get_hf_adapter(
                            cfg.checkpoint_dir, "re",
                            cfg.use_full_layer).re_head_logits
                    else:
                        def re_head(*a, _f=cfg.use_full_layer == 0, **k):
                            return re_head_logits(*a, full_mask=_f, **k)

                    dL = cfg.max_pair_length_re
                    for i in range(0, len(objs), dL):
                        chunk = objs[i : i + dL]
                        ii, pi, att, subpos = assemble_re_tensors(
                            tokens, (sub_s, sub_e), [(l, r) for l, r, _ in chunk],
                            max_seq, dL,
                            att_left=cfg.att_left, att_right=cfg.att_right)
                        mat, aux = re_head(ii, pi, att, subpos, len(chunk), max_seq)
                        for k, (_l, _r, obj) in enumerate(chunk):
                            if cfg.use_ner_results:
                                ner_lab = obj[2]
                            else:
                                ner_lab = NER_LABELS[int(aux[k].argmax())]
                            pair_scores[((sub[0], sub[1]), (obj[0], obj[1]))] = (
                                _xform(mat[k].tolist()), ner_lab)
                else:
                    for _l, _r, obj in objs:
                        obj_surface = " ".join(words[obj[0] : obj[1] + 1])
                        logits = re_logits_for_pair(sub_surface, obj_surface)
                        if cfg.use_ner_results:
                            ner_lab = obj[2]
                        else:
                            ner_lab = aux_obj_ner(obj_surface)
                        pair_scores[((sub[0], sub[1]), (obj[0], obj[1]))] = (
                            _xform(logits), ner_lab)

            if cfg.eval_unidirect:
                # ablation decode (run_re.py:899-918): raw forward logits,
                # forward labels only; m1's type from the NER-stage mentions
                predpos2ner = {(m[0], m[1]): m[2] for m in ments}
                sent_results = []
                for (m1, m2), (v1, m2_ner) in pair_scores.items():
                    if m2_ner == "NIL" or m1 == m2:
                        continue
                    pred = int(np.argmax(v1))
                    if 0 < pred < NUM_REL:
                        sent_results.append(
                            (v1[pred], m1, m2, pred, predpos2ner[m1], m2_ner)
                        )
                sent_results.sort(key=lambda x: (-score_key6(x[0]), x[1], x[2]))
                kept = []
                for item in sent_results:
                    clash = any(
                        item[3] == o[3] and _overlap(item[1], o[1])
                        and _overlap(item[2], o[2])
                        for o in kept
                    )
                    if not clash:
                        kept.append(item)
                pos2ner = {}
                for score, m1, m2, pred, n1, n2 in kept:
                    pos2ner.setdefault(m1, n1)
                    pos2ner.setdefault(m2, n2)
                    triples.append(
                        (cid, n, m1[0], m1[1], m2[0], m2[1], REL_LABELS[pred],
                         float(score), pos2ner[m1], pos2ner[m2])
                    )
                for ws, we, lab in ments:
                    refined.append((cid, n, ws, we, pos2ner.get((ws, we), lab)))
                continue

            # bidirectional fusion + decode (run_re.py:783-823)
            visited = set()
            sent_results = []
            for k1, (v1, m2_ner) in pair_scores.items():
                if k1 in visited:
                    continue
                visited.add(k1)
                if m2_ner == "NIL":
                    continue
                m1, m2 = k1
                if m1 == m2:
                    continue
                k2 = (m2, m1)
                if k2 not in pair_scores:
                    raise AssertionError(f"missing reverse pair {k2} in {cid}/{n}")
                visited.add(k2)
                v2, m1_ner = pair_scores[k2]
                v2p = list(v2[:NUM_SYM]) + list(v2[NUM_REL:]) + list(v2[NUM_SYM:NUM_REL])
                fused = [a + b for a, b in zip(v1, v2p)]
                if m1_ner == "NIL":
                    continue
                pred = int(np.argmax(fused))
                if pred > 0:
                    if pred >= NUM_REL:
                        pred = pred - NUM_REL + NUM_SYM
                        m1, m2 = m2, m1
                        m1_ner, m2_ner = m2_ner, m1_ner
                    sent_results.append(
                        (fused[pred], m1, m2, pred, m1_ner, m2_ner)
                    )

            # relation suppression (run_re.py:825-852)
            sent_results.sort(key=lambda x: (-score_key6(x[0]), x[1], x[2]))
            kept = []
            for item in sent_results:
                clash = False
                for other in kept:
                    if (
                        item[3] == other[3]
                        and _overlap(item[1], other[1])
                        and _overlap(item[2], other[2])
                    ):
                        clash = True
                        break
                if not clash:
                    kept.append(item)

            # NER refinement: first kept relation naming a span wins
            # (run_re.py:854-872)
            pos2ner: dict[tuple, str] = {}
            for score, m1, m2, pred, n1, n2 in kept:
                pos2ner.setdefault(m1, n1)
                pos2ner.setdefault(m2, n2)
                triples.append(
                    (cid, n, m1[0], m1[1], m2[0], m2[1], REL_LABELS[pred],
                     float(score), pos2ner[m1], pos2ner[m2])
                )
            for ws, we, lab in ments:
                refined.append((cid, n, ws, we, pos2ner.get((ws, we), lab)))

    triples.sort()
    refined.sort()
    return triples, refined


def oracle_levitated(conv_turns: dict[str, list[str]], mentions,
                     cfg: PipelineConfig):
    """C4 all-pairs levitated-pair oracle (run_levitatedpair.py:282-322,
    evaluate :700-790): window budget max_seq-2, all pairs incl. self-pairs,
    forward-only argmax over NUM_REL, aux-NER endpoint types, then the same
    suppression + refinement as the default path."""
    budget = cfg.budget_lev()
    max_seq = cfg.max_seq_length_re
    by_turn = defaultdict(list)
    for cid, n, ws, we, lab, _score in mentions:
        by_turn[(cid, n)].append((ws, we, lab))
    for v in by_turn.values():
        v.sort()
    triples, refined = [], []
    for cid, texts in conv_turns.items():
        words, subwords, t2s, wb, sb = _conv_structures(texts, cfg.tokenizer_family)
        for n in range(len(texts)):
            ments = by_turn.get((cid, n), [])
            if not ments:
                continue
            _win, off = _window(subwords, sb, n, budget, truncate=True)
            sent_results = []
            for sub in ments:
                if t2s[sub[1] + 1] - off >= max_seq - 1:
                    continue
                sub_surface = " ".join(words[sub[0] : sub[1] + 1])
                for obj in ments:
                    if t2s[obj[1] + 1] - off >= max_seq - 1:
                        continue
                    obj_surface = " ".join(words[obj[0] : obj[1] + 1])
                    v = re_logits_for_pair(sub_surface, obj_surface)[:NUM_REL]
                    k = int(np.argmax(v))
                    if k > 0:
                        sent_results.append(
                            (float(v[k]), (sub[0], sub[1]), (obj[0], obj[1]),
                             k, aux_obj_ner(sub_surface), aux_obj_ner(obj_surface))
                        )
            sent_results.sort(key=lambda x: (-score_key6(x[0]), x[1], x[2]))
            kept = []
            for item in sent_results:
                clash = any(
                    item[3] == o[3] and _overlap(item[1], o[1])
                    and _overlap(item[2], o[2])
                    for o in kept
                )
                if not clash:
                    kept.append(item)
            pos2ner = {}
            for score, m1, m2, k, a1, a2 in kept:
                pos2ner.setdefault(m1, a1)
                pos2ner.setdefault(m2, a2)
                triples.append(
                    (cid, n, m1[0], m1[1], m2[0], m2[1], REL_LABELS[k],
                     float(score), pos2ner[m1], pos2ner[m2])
                )
            for ws, we, lab in ments:
                refined.append((cid, n, ws, we, pos2ner.get((ws, we), lab)))
    triples.sort()
    refined.sort()
    return triples, refined


def oracle_metrics(mentions, raw, triples, gold_mentions, gold_relations,
                   gold_types: dict[tuple, str]):
    """Micro P/R/F1 with the reference's counting rules."""
    gm = {(c, t, s, e, l) for c, t, s, e, l in gold_mentions}
    ner_tot_recall = len(gm)
    pred_m = [(c, t, s, e, l) for c, t, s, e, l, _ in mentions]
    cor = sum(1 for m in pred_m if m in gm)
    p = cor / len(pred_m) if pred_m else 0.0
    r = cor / ner_tot_recall if ner_tot_recall else 0.0
    f1 = 2 * p * r / (p + r) if cor > 0 else 0.0

    raw_m = [(c, t, s, e, l) for c, t, s, e, l, _ in raw]
    cor_tot = sum(1 for m in raw_m if m in gm)
    pt = cor_tot / len(raw_m) if raw_m else 0.0
    rt = cor_tot / ner_tot_recall if ner_tot_recall else 0.0
    f1_overlap = 2 * pt * rt / (pt + rt) if cor_tot > 0 else 0.0

    golden = set()
    golden_withner = set()
    tot_recall = 0
    for c, t, s1, e1, s2, e2, lab in gold_relations:
        golden.add((c, t, (s1, e1), (s2, e2), lab))
        t1 = gold_types[(c, t, s1, e1)]
        t2 = gold_types[(c, t, s2, e2)]
        golden_withner.add((c, t, (s1, e1, t1), (s2, e2, t2), lab))
        tot_recall += 2 if lab in SYM_LABELS[1:] else 1
        if lab in SYM_LABELS[1:]:
            golden.add((c, t, (s2, e2), (s1, e1), lab))
            golden_withner.add((c, t, (s2, e2, t2), (s1, e1, t1), lab))

    rcor = 0
    rcor_withner = 0
    tot_pred = 0
    for c, t, s1, e1, s2, e2, lab, _score, n1, n2 in triples:
        tot_pred += 1
        if lab in SYM_LABELS[1:]:
            tot_pred += 1
            if (c, t, (s1, e1), (s2, e2), lab) in golden or (
                c, t, (s2, e2), (s1, e1), lab) in golden:
                rcor += 2
            if (c, t, (s1, e1, n1), (s2, e2, n2), lab) in golden_withner or (
                c, t, (s2, e2, n2), (s1, e1, n1), lab) in golden_withner:
                rcor_withner += 2
        else:
            if (c, t, (s1, e1), (s2, e2), lab) in golden:
                rcor += 1
            if (c, t, (s1, e1, n1), (s2, e2, n2), lab) in golden_withner:
                rcor_withner += 1

    rp = rcor / tot_pred if tot_pred else 0.0
    rr = rcor / tot_recall if tot_recall else 0.0
    rf1 = 2 * rp * rr / (rp + rr) if rcor > 0 else 0.0
    rpn = rcor_withner / tot_pred if tot_pred else 0.0
    rrn = rcor_withner / tot_recall if tot_recall else 0.0
    rf1n = 2 * rpn * rrn / (rpn + rrn) if rcor_withner > 0 else 0.0
    assert tot_recall == len(golden), "recall-set consistency (run_re.py:1005)"
    return {
        "ner_precision": p, "ner_recall": r, "ner_f1": f1,
        "ner_f1_overlap": f1_overlap,
        "re_precision": rp, "re_recall": rr, "re_f1": rf1,
        "re_f1_with_ner": rf1n,
        "ner_tot_recall": float(ner_tot_recall),
        "re_tot_recall": float(tot_recall),
        "re_tot_pred": float(tot_pred),
        "re_cor": float(rcor),
    }


def run_oracle(turn_rows, cfg: PipelineConfig):
    """turn_rows: [(conv_id, turn_idx, role, text, tool, ts)] — returns the
    oracle's mentions, raw scores, triples, refined mentions."""
    conv_turns: dict[str, list[tuple[int, str]]] = defaultdict(list)
    for row in turn_rows:
        conv_turns[row[0]].append((row[1], row[3]))
    ordered = {
        cid: [t for _, t in sorted(pairs)] for cid, pairs in sorted(conv_turns.items())
    }
    tids = {cid: [i for i, _ in sorted(pairs)] for cid, pairs in conv_turns.items()}
    mentions, raw = oracle_ner(ordered, cfg)
    if cfg.levitated_pairs:
        triples, refined = oracle_levitated(ordered, mentions, cfg)
    else:
        triples, refined = oracle_re(ordered, mentions, cfg)
    # map sentence ordinals back to the original turn ids
    fix = lambda rows: sorted(
        (r[0], tids[r[0]][r[1]], *r[2:]) for r in rows
    )
    return {
        "mentions": fix(mentions),
        "raw": fix(raw),
        "triples": fix(triples),
        "refined": fix(refined),
    }
