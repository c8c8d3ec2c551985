"""Independent single-process reference implementation of the quality
pipeline (the parity oracle).

Deliberately NOT sharing code with the Spark path: plain row-at-a-time
Python against the shared *spec* (``spec.py`` docstrings define the
semantics).  Tests compare the distributed pipeline against this
implementation doc-by-doc: keep/drop F1 >= 0.99 and byte-identical
scrubbed text per url.
"""

from __future__ import annotations

import re
import zlib
from collections import Counter
from typing import Dict, List

import pandas as pd

from .. import patterns
from .spec import (
    EN_STOPWORDS,
    LANGS,
    LEXICONS,
    RuleSet,
    DEFAULT_RULES,
    SCRUB_CREDITCARD_TOKEN,
    SCRUB_EMAIL_TOKEN,
    SCRUB_TOXIC_TOKEN,
    SURPRISAL_BASE,
    SURPRISAL_COMMON,
    SURPRISAL_EMPTY,
    SURPRISAL_SPREAD,
    TOXIC_WORDS,
)

_TOXIC_RE = re.compile(
    r"\b(?:" + "|".join(re.escape(w) for w in TOXIC_WORDS) + r")\b", re.IGNORECASE
)
_LEX = {lang: set(ws) for lang, ws in LEXICONS.items()}
_COMMON = set().union(*_LEX.values())


def _ref_doc(text: str, rules: RuleSet) -> Dict[str, object]:
    words = text.split()
    nw = len(words)
    lines = text.split("\n")

    mean_wl = sum(len(w) for w in words) / nw if nw else 0.0
    sym = (text.count("#") + text.count("...")) / nw if nw else 0.0
    alpha = sum(1 for w in words if re.search(r"[^\W\d_]", w)) / nw if nw else 0.0
    stop = sum(1 for w in words if w.lower() in EN_STOPWORDS) / nw if nw else 0.0
    bullets = sum(
        1 for ln in lines if ln.lstrip()[:1] in ("-", "*", "•")
    ) / len(lines)
    ellipsis = sum(
        1
        for ln in lines
        if ln.rstrip().endswith("...") or ln.rstrip().endswith("…")
    ) / len(lines)

    def top_frac(n: int) -> float:
        if nw < n:
            return 0.0
        grams = Counter(tuple(words[i : i + n]) for i in range(nw - n + 1))
        return grams.most_common(1)[0][1] * n / nw

    def dup_frac(n: int) -> float:
        if nw < n:
            return 0.0
        grams = Counter(tuple(words[i : i + n]) for i in range(nw - n + 1))
        return min(1.0, n * sum(c for c in grams.values() if c > 1) / nw)

    # language id per spec
    if nw:
        low = [w.lower() for w in words]
        scores = {
            lang: sum(1 for w in low if w in _LEX[lang]) / nw for lang in LANGS
        }
        lang_pred = max(sorted(scores), key=lambda L: scores[L])
        lang_score = scores[lang_pred]
        if lang_score <= 0.0:
            lang_pred, lang_score = "und", 0.0
    else:
        lang_pred, lang_score = "und", 0.0

    # perplexity per spec
    if nw:
        total = 0.0
        for w in words:
            lw = w.lower()
            if lw in _COMMON:
                total += SURPRISAL_COMMON
            else:
                total += SURPRISAL_BASE + (
                    zlib.crc32(lw.encode("utf-8")) % int(SURPRISAL_SPREAD * 1000)
                ) / 1000.0
        ppl = total / nw
    else:
        ppl = SURPRISAL_EMPTY

    # scrub per spec: email -> cc -> toxic
    scrubbed = patterns.EMAIL.sub(SCRUB_EMAIL_TOKEN, text)
    scrubbed = patterns.CREDITCARD.sub(SCRUB_CREDITCARD_TOKEN, scrubbed)
    scrubbed = _TOXIC_RE.sub(SCRUB_TOXIC_TOKEN, scrubbed)

    keep = (
        rules.min_words <= nw <= rules.max_words
        and rules.min_mean_word_length <= mean_wl <= rules.max_mean_word_length
        and sym <= rules.max_symbol_to_word_ratio
        and bullets <= rules.max_bullet_line_frac
        and ellipsis <= rules.max_ellipsis_line_frac
        and alpha >= rules.min_alpha_word_frac
        and stop >= rules.min_stopword_frac
        and top_frac(2) <= rules.max_top2gram_frac
        and top_frac(3) <= rules.max_top3gram_frac
        and dup_frac(5) <= rules.max_dup5gram_frac
        and lang_pred == rules.target_lang
        and lang_score >= rules.min_lang_score
        and ppl <= rules.max_log_ppl
    )
    return {
        "keep": keep,
        "scrubbed_text": scrubbed,
        "lang_pred": lang_pred,
        "lang_score": lang_score,
        "log_ppl": ppl,
    }


def reference_labels(
    pages: pd.DataFrame, rules: RuleSet = DEFAULT_RULES
) -> pd.DataFrame:
    """(url, keep, scrubbed_text, lang_pred) for every input page."""
    rows: List[Dict[str, object]] = []
    for url, text in zip(pages["url"], pages["text"]):
        d = _ref_doc(text if text is not None else "", rules)
        d["url"] = url
        rows.append(d)
    return pd.DataFrame(rows, columns=["url", "keep", "scrubbed_text", "lang_pred"])


def f1_score(expected: pd.Series, actual: pd.Series) -> float:
    tp = int(((expected) & (actual)).sum())
    fp = int(((~expected) & (actual)).sum())
    fn = int(((expected) & (~actual)).sum())
    if tp == 0:
        return 0.0
    precision = tp / (tp + fp)
    recall = tp / (tp + fn)
    return 2 * precision * recall / (precision + recall)
