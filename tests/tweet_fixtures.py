"""Deterministic tweet-shaped fixtures (FIXTURES.md §A, seed=42).

Emoji pool spans all three reference ranges (q1:97) plus deliberate
out-of-range, ZWJ, skin-tone, and metachar cases so every kernel branch
is exercised.
"""

from __future__ import annotations

import random

# In-range: Emoticons / Misc S&P / Supplemental S&P.
IN_RANGE = ["\U0001f600", "\U0001f601", "\U0001f64f", "\U0001f300",
            "\U0001f5ff", "\U0001f44d", "\U0001f923", "\U0001f9ff"]
# Outside the reference's three ranges — must be dropped by the kernel.
OUT_OF_RANGE = ["\U0001f680", "❤", "☺"]
ZWJ_SEQ = "\U0001f469‍\U0001f4bb"  # woman+ZWJ+laptop -> splits into 2
SKIN_TONE = "\U0001f44d\U0001f3fd"      # thumbs + medium modifier -> 2 tokens

WORDS = ["the", "quick", "don't", "RT", "hello42", "café", "a%b", "<tag>",
         "spark", "data", "big", "x"]
CATEGORIES = ["Musician", "Person", "Sports", "TV Shows", "Politician"]
COUNTRIES = ["Brazil", "United States", "Japan", "India", "France",
             "Mexico", "Nigeria", "Germany", "Canada", "Turkey"]
USERNAMES = ["alice", "bob", "carol", "dave", "erin", "frank"]


def make_text(rng: random.Random) -> str:
    """One tweet text mixing words and emoji per FIXTURES.md A1."""
    parts = [rng.choice(WORDS) for _ in range(rng.randint(2, 8))]
    roll = rng.random()
    if roll < 0.6:  # ~60% carry >=1 in-range emoji
        for _ in range(rng.randint(1, 4)):
            parts.insert(rng.randrange(len(parts) + 1), rng.choice(IN_RANGE))
        if rng.random() < 0.3:  # unseparated emoji run
            parts.append("".join(rng.choice(IN_RANGE) for _ in range(rng.randint(2, 4))))
        if rng.random() < 0.2:  # metachars adjacent to emoji
            parts.append("(" + rng.choice(IN_RANGE) + ")|")
    if roll < 0.1:
        parts.append(ZWJ_SEQ)
    elif roll < 0.2:
        parts.append(SKIN_TONE)
    if rng.random() < 0.3:
        parts.append(rng.choice(OUT_OF_RANGE))
    return " ".join(parts)


def tweets_base(n: int = 1000, seed: int = 42) -> list[dict]:
    rng = random.Random(seed)
    return [
        {"data": {"id": str(i), "text": make_text(rng)}} for i in range(n)
    ]


def tweets_mentions(n: int = 1000, seed: int = 42) -> list[dict]:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        k = rng.randint(0, 3)
        mentions = [{"username": rng.choice(USERNAMES)} for _ in range(k)]
        row = {
            "data": {
                "id": str(i),
                "text": make_text(rng),
                "entities": {"mentions": mentions} if k else None,
            },
            # null-includes rows must be dropped by the q4:111 guard
            "includes": (
                {"users": [{"id": str(j), "username": m["username"]}
                           for j, m in enumerate(mentions)]}
                if k and rng.random() > 0.1
                else None
            ),
        }
        rows.append(row)
    return rows


def tweets_categories(n: int = 1000, seed: int = 42) -> list[dict]:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        k = rng.randint(0, 3)
        anns = [{"domain": {"id": str(j), "name": rng.choice(CATEGORIES)}}
                for j in range(k)]
        rows.append({
            "data": {
                "id": str(i),
                "text": make_text(rng),
                "context_annotations": anns if k else None,
            }
        })
    return rows


def tweets_geo(n: int = 1000, seed: int = 42) -> list[dict]:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        has_geo = rng.random() < 0.4  # <100% geo coverage (deck slide 16)
        country = rng.choice(COUNTRIES) if has_geo else None
        rows.append({
            "data": {"id": str(i), "text": make_text(rng),
                     "geo": {"place_id": f"p{i}"} if has_geo else None},
            "includes": (
                {"places": [{"id": f"p{i}", "country": country}]}
                if has_geo else None
            ),
        })
    return rows


def tweets_2006(n: int = 500, seed: int = 42) -> list[dict]:
    rng = random.Random(seed)
    emoticons = [":)", "o_o", "XD", ":-(", ";)"]
    return [
        {"full_text": " ".join(rng.choice(WORDS) for _ in range(5))
                      + " " + rng.choice(emoticons),
         "created_at": "2007-05-01", "id": i}
        for i in range(n)
    ]


def tweets_2015(n: int = 500, seed: int = 42) -> list[dict]:
    rng = random.Random(seed)
    return [
        {"text": make_text(rng), "created_at": "2015-06-21", "id": i}
        for i in range(n)
    ]
