"""Language identification stage.

Production interface: a fastText ``lid.176``-style model object with
``predict(texts) -> (labels, scores)``.  The binary model is not
shippable in this sandbox (no external data), so the default model is
``LexiconLangId`` — a deterministic lexicon-hit scorer over the seed
vocabularies in ``spec.LEXICONS``:

    score(lang) = |{tokens (lowercased) in LEXICONS[lang]}| / n_tokens
    prediction  = argmax score, ties broken by language-code order
    empty doc   -> ("und", 0.0)

This exact definition is the parity contract shared with
``reference_impl.py``.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence, Tuple

from .spec import LANGS, LEXICONS

_LEXICON_SETS = {lang: frozenset(words) for lang, words in LEXICONS.items()}


class LangIdModel:
    """Interface: implement ``predict_tokens`` (batch of token lists)."""

    def predict_tokens(
        self, docs_tokens: Sequence[Sequence[str]]
    ) -> List[Tuple[str, float]]:
        raise NotImplementedError


class LexiconLangId(LangIdModel):
    def predict_tokens(
        self, docs_tokens: Sequence[Sequence[str]]
    ) -> List[Tuple[str, float]]:
        return [score_tokens(tokens) for tokens in docs_tokens]


def score_tokens(tokens: Iterable[str]) -> Tuple[str, float]:
    lowered = [t.lower() for t in tokens]
    n = len(lowered)
    if n == 0:
        return ("und", 0.0)
    best_lang = "und"
    best_score = -1.0
    for lang in LANGS:  # sorted order = deterministic tie-break
        lex = _LEXICON_SETS[lang]
        hits = sum(1 for t in lowered if t in lex)
        score = hits / n
        if score > best_score:
            best_lang, best_score = lang, score
    if best_score <= 0.0:
        return ("und", 0.0)
    return (best_lang, best_score)


DEFAULT_LANGID = LexiconLangId()
