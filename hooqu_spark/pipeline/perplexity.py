"""Perplexity scoring stage.

Production interface: a KenLM-style 5-gram model with
``score(sentence) -> log10 prob``; here the default is a deterministic
hash unigram model (no external data in the sandbox):

    surprisal(w) = SURPRISAL_COMMON                     if lower(w) in any lexicon
                 = SURPRISAL_BASE
                   + (crc32(utf8(lower(w))) % 3000)/1000  otherwise
    log_ppl(doc) = mean surprisal over tokens; SURPRISAL_EMPTY if no tokens

crc32 is platform-stable, so scores are identical across executors,
partitions and runs — the property that matters for checkpoint/resume
and for the reference-parity contract shared with
``reference_impl.py``.
"""

from __future__ import annotations

import zlib
from typing import Iterable, List, Sequence

from .spec import (
    LEXICONS,
    SURPRISAL_BASE,
    SURPRISAL_COMMON,
    SURPRISAL_EMPTY,
    SURPRISAL_SPREAD,
)

_ALL_COMMON = frozenset(w for words in LEXICONS.values() for w in words)
_MOD = int(SURPRISAL_SPREAD * 1000)


class PerplexityModel:
    """Interface: implement ``log_ppl_tokens`` over a batch."""

    def log_ppl_tokens(self, docs_tokens: Sequence[Sequence[str]]) -> List[float]:
        raise NotImplementedError


class HashUnigramLM(PerplexityModel):
    def log_ppl_tokens(self, docs_tokens: Sequence[Sequence[str]]) -> List[float]:
        return [doc_log_ppl(tokens) for tokens in docs_tokens]


def surprisal(token: str) -> float:
    w = token.lower()
    if w in _ALL_COMMON:
        return SURPRISAL_COMMON
    return SURPRISAL_BASE + (zlib.crc32(w.encode("utf-8")) % _MOD) / 1000.0


def doc_log_ppl(tokens: Iterable[str]) -> float:
    total = 0.0
    n = 0
    for t in tokens:
        total += surprisal(t)
        n += 1
    if n == 0:
        return SURPRISAL_EMPTY
    return total / n


DEFAULT_LM = HashUnigramLM()


def perplexity_scores(
    df, model: PerplexityModel = DEFAULT_LM, text_col: str = "text"
):
    """Adapter: run any :class:`PerplexityModel` over a DataFrame in
    Arrow-batched ``mapInPandas`` calls — one ``log_ppl_tokens`` call
    per batch (KenLM-style models score batches efficiently).  Returns
    the input columns plus ``log_ppl``."""
    from pyspark.sql import types as T

    schema = T.StructType(
        list(df.schema.fields) + [T.StructField("log_ppl", T.DoubleType())]
    )

    def gen(batches):
        for pdf in batches:
            tokens = [(t or "").split() for t in pdf[text_col].tolist()]
            out = pdf.copy()
            out["log_ppl"] = [float(v) for v in model.log_ppl_tokens(tokens)]
            yield out

    return df.mapInPandas(gen, schema=schema)
