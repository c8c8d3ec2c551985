"""Deterministic synthetic Common-Crawl-style webtext generator.

Produces the exact input_hint table shape
``(url string, warc_ts timestamp, html binary, text string, lang string)``.

Scale-out-safe determinism: every document is a pure function of its
``doc_id`` (a per-id ``random.Random`` stream), so the table content is
identical regardless of partitioning, parallelism or engine — the
reference implementation regenerates the same docs in pandas.  Host
distribution is Zipf-skewed (hot hosts exercise the salting path).

A slice of documents is engineered to trip each quality rule and each
scrub pattern, so keep/drop boundaries and redaction are all exercised.
"""

from __future__ import annotations

import datetime as _dt
import random
from typing import Iterator, List

import pandas as pd

from .spec import LANGS, LEXICONS, TOXIC_WORDS

_BASE_TS = _dt.datetime(2024, 1, 1, 0, 0, 0)
_N_HOSTS = 1000
_LANG_WEIGHTS = [("en", 0.62), ("de", 0.10), ("fr", 0.10), ("es", 0.08), ("it", 0.05)]
# remaining 0.05 -> mixed-language gibberish ("und")

WEBTEXT_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def _pick_lang(rng: random.Random) -> str:
    u = rng.random()
    acc = 0.0
    for lang, w in _LANG_WEIGHTS:
        acc += w
        if u < acc:
            return lang
    return "und"


def _host_for(rng: random.Random) -> str:
    # Zipf-ish inverse-CDF: density ~ 1/rank; host0 is the hottest.
    import math

    u = rng.random()
    rank = int(math.exp(u * math.log(_N_HOSTS))) - 1
    return f"host{rank}.example.com"


def make_doc(doc_id: int) -> dict:
    """Generate one document deterministically from its id."""
    rng = random.Random((doc_id * 2654435761) & 0xFFFFFFFF)
    lang = _pick_lang(rng)
    if lang == "und":
        # mixed-language noise: words sampled across all lexicons
        vocab: List[str] = [w for lx in LEXICONS.values() for w in lx[:40]]
    else:
        vocab = list(LEXICONS[lang])

    # lognormal-ish document length; some docs deliberately short
    n_words = max(1, int(rng.lognormvariate(4.6, 0.9)))
    n_words = min(n_words, 4000)

    flaw = rng.random()
    words: List[str] = [rng.choice(vocab) for _ in range(n_words)]

    if flaw < 0.04:
        # repetition spam: repeat one phrase to trip n-gram rules
        phrase = [rng.choice(vocab) for _ in range(3)]
        words = phrase * (max(10, n_words) // 3)
    elif flaw < 0.07:
        # symbol spam
        words = [w if rng.random() > 0.3 else "###" for w in words]
    elif flaw < 0.10:
        # non-alpha junk
        words = [w if rng.random() > 0.4 else str(rng.randint(0, 999999)) for w in words]
    elif flaw < 0.12:
        # long-gibberish words (mean word length rule)
        words = ["x" * rng.randint(12, 25) for _ in range(max(60, n_words))]

    # PII / toxicity injections
    if rng.random() < 0.05:
        words.insert(
            rng.randrange(len(words) + 1),
            f"user{rng.randint(0, 9999)}@mail{rng.randint(0, 99)}.com",
        )
    if rng.random() < 0.03:
        groups = [str(rng.randint(1000, 9999)) for _ in range(3)]
        words.insert(
            rng.randrange(len(words) + 1), "4" + groups[0][1:] + " " + " ".join(groups)
        )
    if rng.random() < 0.04:
        words.insert(rng.randrange(len(words) + 1), rng.choice(TOXIC_WORDS))

    # layout: lines of ~12 words; some bullet / ellipsis lines
    lines: List[str] = []
    i = 0
    while i < len(words):
        line_words = words[i : i + 12]
        line = " ".join(line_words)
        r = rng.random()
        if r < 0.05:
            line = "- " + line
        elif r < 0.08:
            line = line + " ..."
        lines.append(line)
        i += 12
    text = "\n".join(lines)

    host = _host_for(rng)
    url = f"https://{host}/page/{doc_id}"
    html = f"<html><body><p>{text}</p></body></html>".encode("utf-8")
    ts = _BASE_TS + _dt.timedelta(seconds=int(doc_id) % 31536000)
    return {
        "url": url,
        "warc_ts": ts,
        "html": html,
        "text": text,
        "lang": lang,
    }


def make_docs_pdf(ids) -> pd.DataFrame:
    """Pandas frame of documents for the given ids (reference path)."""
    return pd.DataFrame([make_doc(int(i)) for i in ids])


def synthesize(spark, n_docs: int, partitions: int = 32):
    """Distributed generation: spark.range -> mapInPandas (Arrow batches).

    Each task generates only its ids — no driver-side materialization,
    scales linearly with partitions.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield make_docs_pdf(pdf["id"].to_numpy())

    return (
        spark.range(0, n_docs, numPartitions=partitions)
        .mapInPandas(gen, schema=WEBTEXT_SCHEMA)
    )
