"""Deterministic synthetic fixtures (FIXTURES.md). Pure functions of a
seed; no wall-clock, no global RNG. Used by tests and by bench.py's
transcript generator (no external data)."""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

import pandas as pd

_BASE_WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa",
    "quebec", "romeo", "sierra", "tango", "uniform", "victor", "whiskey",
    "xray", "yankee", "zulu", "apple", "banana", "cherry", "date", "elder",
    "fig", "grape", "honey", "iris", "jade", "kiwi", "lemon", "mango",
    "nectar", "olive", "peach", "quince", "rasp", "straw", "tomato", "ugli",
    "vanilla", "walnut", "yam", "zest", "run", "jump", "walk", "read",
    "write", "code", "test", "build", "ship", "merge", "join", "scan",
    "sort", "hash", "batch", "stream", "spark", "table", "query", "plan",
]
# ~210-word vocabulary (FIXTURES.md §1: "~200 words") — base words plus
# deterministic suffixed variants so random conversations stay
# dissimilar while injected duplicates stay similar
_VOCAB_WORDS = _BASE_WORDS + [f"{w}{s}" for s in ("ly", "ish") for w in _BASE_WORDS]
_SYNONYMS = {
    "run": "sprint", "jump": "leap", "walk": "stroll", "read": "peruse",
    "write": "compose", "apple": "pomme", "banana": "plantain",
}
_ROLES = ["user", "assistant", "tool"]
_TOOLS = ["search", "calc", "browse"]
_FIRST_NAMES = [
    "james", "mary", "robert", "patricia", "john", "jennifer", "michael",
    "linda", "david", "elizabeth", "william", "barbara", "richard", "susan",
    "joseph", "jessica", "thomas", "sarah", "charles", "karen",
]
_LAST_NAMES = [
    "smith", "johnson", "williams", "brown", "jones", "garcia", "miller",
    "davis", "rodriguez", "martinez", "hernandez", "lopez", "gonzalez",
    "wilson", "anderson", "thomas", "taylor", "moore", "jackson", "martin",
]
_STREETS = ["main", "oak", "pine", "maple", "cedar", "elm", "washington", "lake"]

EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)


def _edit_text(rng: random.Random, text: str, rate: float = 0.10) -> str:
    """Noisy copy: per-token edits from {typo, drop, swap, synonym,
    case change} at ~rate of tokens (FIXTURES.md §1)."""
    toks = text.split()
    out = []
    i = 0
    while i < len(toks):
        t = toks[i]
        if rng.random() < rate:
            op = rng.choice(["typo", "drop", "swap", "syn", "case"])
            if op == "typo" and len(t) > 1:
                p = rng.randrange(len(t))
                t = t[:p] + rng.choice("abcdefghijklmnopqrstuvwxyz") + t[p + 1 :]
                out.append(t)
            elif op == "drop":
                pass
            elif op == "swap" and i + 1 < len(toks):
                out.append(toks[i + 1])
                out.append(t)
                i += 1
            elif op == "syn" and t in _SYNONYMS:
                out.append(_SYNONYMS[t])
            elif op == "case":
                out.append(t.upper())
            else:
                out.append(t)
        else:
            out.append(t)
        i += 1
    return " ".join(out)


def expanded_vocab(size: int) -> list[str]:
    """Deterministic vocabulary of ``size`` distinct words (bench
    realism knob: real corpora have 10^4+ word vocabularies, so
    blocking selectivity at scale is driven by vocab size)."""
    out = list(_BASE_WORDS)
    i = 0
    while len(out) < size:
        out.extend(f"{w}{i}" for w in _BASE_WORDS)
        i += 1
    return out[:size]


def make_transcripts(
    n_conv: int = 2000, seed: int = 42, hot_token_rate: float = 0.35,
    vocab: list[str] | None = None,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """-> (transcripts_pdf, entities_pdf).

    transcripts: (conv_id, turn_idx, role, text, tool, ts) per
    FIXTURES.md §1, with injected duplicate entities (Zipf-ish sizes,
    ~70% singletons) and hot boilerplate tokens in >30% of convs.
    entities: (conv_id, entity_id) gold mapping.
    """
    rng = random.Random(seed)
    words_pool = vocab if vocab is not None else _VOCAB_WORDS
    rows = []
    entities = []
    conv_i = 0
    entity_id = 0
    while conv_i < n_conv:
        r = rng.random()
        size = 1 if r < 0.70 else 2 if r < 0.85 else 3 if r < 0.93 else rng.randint(4, 5)
        size = min(size, n_conv - conv_i)
        n_turns = rng.randint(2, 12)
        base_turns = []
        for t in range(n_turns):
            n_words = rng.randint(4, 14)
            words = [rng.choice(words_pool) for _ in range(n_words)]
            if rng.random() < hot_token_rate:
                words.insert(0, "the")
                words.append("boilerplate standard disclaimer applies")
            base_turns.append(" ".join(words))
        role_off = rng.randrange(3)
        for m in range(size):
            conv_id = f"conv{conv_i:08d}"
            for t, base in enumerate(base_turns):
                text = base if m == 0 else _edit_text(rng, base)
                role = _ROLES[(role_off + t) % 3]
                rows.append(
                    {
                        "conv_id": conv_id,
                        "turn_idx": t,
                        "role": role,
                        "text": text,
                        "tool": rng.choice(_TOOLS) if role == "tool" else None,
                        "ts": EPOCH + timedelta(seconds=conv_i * 60 + t),
                    }
                )
            entities.append({"conv_id": conv_id, "entity_id": entity_id})
            conv_i += 1
        entity_id += 1
    tdf = pd.DataFrame(rows)
    tdf["turn_idx"] = tdf["turn_idx"].astype("int32")
    return tdf, pd.DataFrame(entities)


def make_person_tables(
    n_a: int = 150, n_b: int = 200, seed: int = 42
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """table_A / table_B person records (FIXTURES.md §3) with the
    required edge-case rows: empty name, null name, 1-char name,
    ceil-boundary token counts, duplicated name values."""
    rng = random.Random(seed)

    def person(i: int) -> dict:
        return {
            "id": i,
            "name": f"{rng.choice(_FIRST_NAMES)} {rng.choice(_LAST_NAMES)}",
            "birth_year": rng.randint(1950, 2005),
            "hourly_wage": round(rng.uniform(10.0, 100.0), 2),
            "address": f"{rng.randint(1, 999)} {rng.choice(_STREETS)} st",
            "zipcode": f"{rng.choice(range(10000, 10020)) if rng.random() < 0.8 else rng.randint(10000, 99999):05d}",
        }

    a_rows = [person(i) for i in range(n_a)]
    # edge cases (overwrite tail rows)
    a_rows[-1]["name"] = ""
    a_rows[-2]["name"] = None
    a_rows[-3]["name"] = "x"
    a_rows[-4]["name"] = "one two three four five"   # l=5 -> t*l integral at 0.8
    a_rows[-5]["name"] = "alpha beta gamma delta"    # l=4 -> t*l integral at 0.5
    a_rows[-6]["name"] = a_rows[0]["name"]           # duplicate value, distinct key

    b_rows = []
    for j in range(n_b):
        if j < int(n_b * 0.4):
            src = a_rows[rng.randrange(n_a - 6)]
            row = dict(src)
            row["id"] = j
            row["name"] = _edit_text(rng, src["name"], rate=0.25) if src["name"] else src["name"]
            b_rows.append(row)
        else:
            b_rows.append(person(j))
            b_rows[-1]["id"] = j
    b_rows[-1]["name"] = ""
    b_rows[-2]["name"] = None
    b_rows[-3]["name"] = "y"
    b_rows[-4]["name"] = "one two three four five"
    b_rows[-5]["name"] = "alpha beta gamma delta"
    return pd.DataFrame(a_rows), pd.DataFrame(b_rows)


def make_edge_fixtures() -> dict[str, list[tuple[int, int]]]:
    """Graph fixtures for connected components (FIXTURES.md §5)."""
    path = [(i, i + 1) for i in range(64)]
    star = [(0, i) for i in range(1, 10_001)]
    clique_a = [(i, j) for i in range(10) for j in range(i + 1, 10)]
    clique_b = [(i, j) for i in range(100, 110) for j in range(i + 1, 110)]
    bridged = clique_a + clique_b + [(9, 100)]
    messy = [(1, 2), (2, 1), (2, 2), (1, 2), (5, 5), (7, 8)]
    return {
        "path64": path,
        "star10k": star,
        "bridged_cliques": bridged,
        "messy": messy,
    }
