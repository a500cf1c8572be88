"""Deterministic "world": label vocabularies, entity gazetteers, and the
relation table that both the synthetic-transcript generator and the
deterministic surrogate model share.

Label sets follow the reference's ACE05 vocabularies:
  - NER labels: /root/reference/run_acener.py:113 (index 0 = NIL)
  - relation labels + symmetric block: /root/reference/run_re.py:120-130
    (label_list = sym_labels + asymmetric; sym_labels[0] = NIL)

Everything here is a pure function of the fixed SEED so the Spark pipeline,
the single-process oracle, and the generator agree byte-for-byte.
"""

from __future__ import annotations

import random
import zlib

SEED = 42

# --- label algebra (reference: run_acener.py:113, run_re.py:121-130) ---
NER_LABELS: tuple[str, ...] = ("NIL", "FAC", "WEA", "LOC", "VEH", "GPE", "ORG", "PER")
REL_LABELS: tuple[str, ...] = ("NIL", "PER-SOC", "ART", "ORG-AFF", "GEN-AFF", "PHYS", "PART-WHOLE")
SYM_LABELS: tuple[str, ...] = ("NIL", "PER-SOC")  # symmetric block, run_re.py:129
NUM_NER = len(NER_LABELS)
NUM_REL = len(REL_LABELS)
NUM_SYM = len(SYM_LABELS)
# RE logit vector length: forward labels + inverse copies of the asymmetric
# block (reference head width, run_re.py:804 permutation algebra).
REL_LOGIT_DIM = 2 * NUM_REL - NUM_SYM

NER_INDEX = {l: i for i, l in enumerate(NER_LABELS)}
REL_INDEX = {l: i for i, l in enumerate(REL_LABELS)}

# PTB escape map (reference run_acener.py:135-146, preprocess_ontonotes.py:14-25)
PTB_UNESCAPE = {
    "-LRB-": "(",
    "-RRB-": ")",
    "-LSB-": "[",
    "-RSB-": "]",
    "-LCB-": "{",
    "-RCB-": "}",
}


def stable_hash(s: str) -> int:
    """Deterministic 32-bit hash, identical across processes/executors."""
    return zlib.crc32(s.encode("utf-8"))


def jitter(s: str, scale: float = 1e-3) -> float:
    """Tiny deterministic score perturbation so sort orders have no ties."""
    return stable_hash(s) / 4294967296.0 * scale


def score_key6(x):
    """Quantized sort key for model-score ORDERINGS (never the emitted
    value). Tensor-head scores of exact-math-tied spans can differ by
    ~1e-16 between the pipeline and the oracle (BLAS reduction order is
    batch-shape-dependent, and the two sides batch the same head
    differently), which would flip greedy suppression / refinement order
    host-dependently. Quantizing every score comparison at 1e-6 — far
    above ulp noise, far below any genuine score gap — and tie-breaking
    on span coordinates makes each decision identical on every host and
    on both engines. numpy half-even rounding on every numpy-side sort;
    the one Spark-side ordering (rel.refine_types) uses F.round, which
    differs only on exact decimal midpoints (unreachable for softmax /
    fused-sum scores in binary floating point). Scalars in, float out;
    arrays in, array out."""
    import numpy as np

    out = np.round(np.asarray(x, dtype=np.float64), 6)
    return float(out) if out.ndim == 0 else out


def _syllable_words(rng: random.Random, n_words: int, n_syll: tuple[int, int]) -> str:
    cons = "bcdfghjklmnprstvz"
    vows = "aeiou"
    words = []
    for _ in range(n_words):
        k = rng.randint(*n_syll)
        w = "".join(rng.choice(cons) + rng.choice(vows) for _ in range(k))
        words.append(w.capitalize())
    return " ".join(words)


def _build_world():
    rng = random.Random(SEED)
    sizes = {"PER": 50, "ORG": 40, "GPE": 30, "LOC": 30, "FAC": 20, "VEH": 15, "WEA": 15}
    gaz: dict[str, str] = {}          # surface -> ner label (injective by construction)
    by_label: dict[str, list[str]] = {l: [] for l in sizes}
    for label, n in sizes.items():
        made = 0
        while made < n:
            nw = rng.choice([1, 1, 2, 2, 3])
            s = _syllable_words(rng, nw, (2, 4))
            if s in gaz:
                continue
            gaz[s] = label
            by_label[label].append(s)
            made += 1
    # nested same-label surfaces: exercise greedy non-overlap suppression (O3)
    for i in range(5):
        base = by_label["ORG"][i]
        nested = base + " Group"
        if nested not in gaz:
            gaz[nested] = "ORG"
            by_label["ORG"].append(nested)
    # overlapping different-label surfaces: both survive the same-label rule
    for i in range(3):
        base = by_label["GPE"][i]
        over = base + " Tower"
        if over not in gaz:
            gaz[over] = "FAC"
            by_label["FAC"].append(over)

    # relation table: (subject surface, object surface) -> relation label.
    # Directed; symmetric labels stored once (recall doubling handled by the
    # eval, reference run_re.py:204-209).
    type_rules = [
        ("PER", "ORG", "ORG-AFF", 60),
        ("PER", "PER", "PER-SOC", 30),
        ("ORG", "GPE", "GEN-AFF", 40),
        ("PER", "GPE", "PHYS", 40),
        ("FAC", "GPE", "PART-WHOLE", 25),
        ("PER", "VEH", "ART", 20),
        ("PER", "WEA", "ART", 15),
        ("LOC", "GPE", "PART-WHOLE", 25),
    ]
    rel_table: dict[tuple[str, str], str] = {}
    for s_t, o_t, label, n in type_rules:
        made = 0
        tries = 0
        while made < n and tries < 10 * n:
            tries += 1
            a = rng.choice(by_label[s_t])
            b = rng.choice(by_label[o_t])
            if a == b or (a, b) in rel_table or (b, a) in rel_table:
                continue
            rel_table[(a, b)] = label
            made += 1
    filler = [
        _syllable_words(random.Random(SEED + 1 + i), 1, (1, 3)).lower() for i in range(200)
    ]
    return gaz, by_label, rel_table, filler


GAZETTEER, GAZ_BY_LABEL, REL_TABLE, FILLER_WORDS = _build_world()
ALL_SURFACES = sorted(GAZETTEER)
