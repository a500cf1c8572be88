"""Deterministic synthetic transcript generator.

Produces the driver-mandated input shape (BASELINE.json input_hint):
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` plus gold mention / relation tables in the reference's
annotation semantics (document-level word indices, one row per gold span —
/root/reference/README.md:52-83).

Generation is a pure function of ``(SEED, conv_idx)`` so it can run
*distributed* (``spark.range(n).mapInPandas``) with any partitioning and
still be byte-deterministic — the 100 TB-scale story is "generate/read per
conversation", never a driver-resident list.

Skew: conv 0 is a planted heavy-tail conversation (~100x the median turn
count) so the pipeline's repartitioning/salting is actually exercised
(FIXTURES.md §1 generator requirements).
"""

from __future__ import annotations

import random
from collections.abc import Iterator

import pandas as pd

from .world import ALL_SURFACES, FILLER_WORDS, GAZETTEER, REL_TABLE, SEED

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)
GOLD_MENTION_SCHEMA = "conv_id string, turn_idx int, start int, end int, label string"
GOLD_RELATION_SCHEMA = (
    "conv_id string, turn_idx int, s1 int, e1 int, s2 int, e2 int, label string"
)

_REL_PAIRS = sorted(REL_TABLE.items())  # [((subj_surface, obj_surface), label)]
_TOOLS = ("search", "browser", "python", "db_query")
_EPOCH = 1735689600  # 2025-01-01T00:00:00Z


def conv_name(conv_idx: int) -> str:
    return f"c{conv_idx:08d}"


def gen_conv(conv_idx: int, max_words: int = 40):
    """Generate one conversation.

    Returns (turn_rows, gold_mention_rows, gold_relation_rows) where
    turn_rows = [(conv_id, turn_idx, role, text, tool, ts_epoch_sec)] and
    gold offsets are conversation-level word indices (the reference's
    document-level token indexing).
    """
    rng = random.Random(f"{SEED}:{conv_idx}")
    if conv_idx == 0:
        n_turns = 400  # heavy-tail conversation for skew testing
    elif rng.random() < 0.02:
        n_turns = rng.randint(60, 120)
    else:
        n_turns = rng.randint(3, 12)

    cid = conv_name(conv_idx)
    turns, gold_mentions, gold_relations = [], [], []
    offset = 0  # conversation-level word offset

    for t in range(n_turns):
        words: list[str] = []
        mentions: list[tuple[int, int, str, str]] = []  # (start, end, label, surface)

        def filler(k: int):
            for _ in range(k):
                words.append(rng.choice(FILLER_WORDS))
                if rng.random() < 0.08:
                    words.append(",")

        def plant(surface: str):
            ws = surface.split()
            s = offset + len(words)
            words.extend(ws)
            mentions.append((s, s + len(ws) - 1, GAZETTEER[surface], surface))

        filler(rng.randint(1, 3))
        if rng.random() < 0.55:
            (a, b), _ = _REL_PAIRS[rng.randrange(len(_REL_PAIRS))]
            plant(a)
            filler(rng.randint(1, 2))
            plant(b)
        for _ in range(rng.randint(0, 2)):
            if len(words) > max_words - 8:
                break
            filler(rng.randint(0, 2))
            plant(ALL_SURFACES[rng.randrange(len(ALL_SURFACES))])
        filler(rng.randint(1, 3))
        if rng.random() < 0.15:  # PTB escapes + punctuation (P1 exercise)
            words.extend(["-LRB-", rng.choice(FILLER_WORDS), "-RRB-", "."])
        else:
            words.append(".")

        role = rng.choices(("user", "assistant", "tool"), weights=(4, 4, 2))[0]
        tool = rng.choice(_TOOLS) if role == "tool" else None
        # monotone within a conversation (the only ordering contract);
        # modulo keeps ts inside pandas' ns-timestamp range at any corpus size
        ts = _EPOCH + (conv_idx % 1_000_000) * 3600 + t * 60
        turns.append((cid, t, role, " ".join(words), tool, ts))

        for s, e, label, _surf in mentions:
            gold_mentions.append((cid, t, s, e, label))
        for i, (s1, e1, _l1, a) in enumerate(mentions):
            for j, (s2, e2, _l2, b) in enumerate(mentions):
                if i != j and (a, b) in REL_TABLE:
                    gold_relations.append((cid, t, s1, e1, s2, e2, REL_TABLE[(a, b)]))

        offset += len(words)

    return turns, gold_mentions, gold_relations


def _ts(seconds: pd.Series) -> pd.Series:
    return pd.to_datetime(seconds, unit="s")


def transcripts_df(spark, n_convs: int, max_words: int = 40):
    """Distributed transcript generation: spark.range → mapInPandas."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid in pdf["id"]:
                rows.extend(gen_conv(int(cid), max_words)[0])
            out = pd.DataFrame(
                rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
            )
            out["ts"] = _ts(out["ts"])
            yield out

    return spark.range(n_convs).mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)


def gold_mentions_df(spark, n_convs: int, max_words: int = 40):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid in pdf["id"]:
                rows.extend(gen_conv(int(cid), max_words)[1])
            yield pd.DataFrame(rows, columns=["conv_id", "turn_idx", "start", "end", "label"])

    return spark.range(n_convs).mapInPandas(gen, schema=GOLD_MENTION_SCHEMA)


def gold_relations_df(spark, n_convs: int, max_words: int = 40):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid in pdf["id"]:
                rows.extend(gen_conv(int(cid), max_words)[2])
            yield pd.DataFrame(
                rows, columns=["conv_id", "turn_idx", "s1", "e1", "s2", "e2", "label"]
            )

    return spark.range(n_convs).mapInPandas(gen, schema=GOLD_RELATION_SCHEMA)


def local_corpus(n_convs: int, max_words: int = 40):
    """Single-process variant for pytest fixtures and the oracle."""
    turns, gms, grs = [], [], []
    for cid in range(n_convs):
        t, m, r = gen_conv(cid, max_words)
        turns.extend(t)
        gms.extend(m)
        grs.extend(r)
    return turns, gms, grs
