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


def langid_scores(df, model: LangIdModel = DEFAULT_LANGID, text_col: str = "text"):
    """Adapter: run any :class:`LangIdModel` over a DataFrame in
    Arrow-batched ``mapInPandas`` calls — ONE ``predict_tokens`` call
    per batch (how a real fastText model wants to be fed), never
    per-row Python.  Returns the input columns plus
    ``(lang_pred, lang_score)``.

    The model object is shipped to executors via cloudpickle; a real
    fastText wrapper should lazy-load its binary in ``predict_tokens``
    (executor-side) rather than pickling the model weights.
    """
    from pyspark.sql import types as T

    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("lang_pred", T.StringType()),
            T.StructField("lang_score", T.DoubleType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            tokens = [(t or "").split() for t in pdf[text_col].tolist()]
            preds = model.predict_tokens(tokens)
            out = pdf.copy()
            out["lang_pred"] = [p[0] for p in preds]
            out["lang_score"] = [float(p[1]) for p in preds]
            yield out

    return df.mapInPandas(gen, schema=schema)
