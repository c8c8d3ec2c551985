"""Per-document feature kernel for the Spark enrich stage.

One pass per document: tokenize once, derive every Gopher/C4 heuristic
feature, language ID, perplexity and the scrubbed text from the same
token list.  Called from ``core.enrich``'s Arrow-batched UDF — never
row-at-a-time Spark UDFs.

Feature definitions (the parity contract, mirrored independently by
``reference_impl.py``):

* words = ``text.split()`` (any whitespace)
* mean_word_length = mean(len(w)); 0.0 if no words
* symbol_to_word_ratio = (count('#') + count('...')) / n_words; 0.0 if
  no words
* lines = ``text.split('\\n')``; bullet lines start with -, *, or the
  bullet glyph after lstrip; ellipsis lines end with '...' or the
  ellipsis glyph after rstrip
* alpha_word_frac = fraction of words containing a letter
* stopword_frac = fraction of lowercased words in EN_STOPWORDS
* topNgram_frac (n=2,3) = count(most frequent word n-gram) * n / n_words
  (0.0 when n_words < n)
* dup5gram_frac = min(1, 5 * sum counts of repeated 5-grams / n_words)
* language ID / perplexity: see ``langid.py`` / ``perplexity.py`` specs
  (this kernel fuses them through one word->language-mask lookup so
  each token is hashed/looked-up once)

Performance notes: this is the 100TB hot path (~0.4 ms/doc single
core).  n-gram counting uses C-speed ``Counter(zip(...))``; tokens are
lowercased once and shared by langid/ppl/stopwords; scrub regexes are
gated by cheap prechecks that are provably implied by the patterns
(EMAIL requires '@'; CREDITCARD requires a 4-digit run).
"""

from __future__ import annotations

import re
import zlib
from collections import Counter
from typing import Dict

from .scrub import scrub_text
from .spec import (
    EN_STOPWORDS,
    LANGS,
    LEXICONS,
    SURPRISAL_BASE,
    SURPRISAL_COMMON,
    SURPRISAL_EMPTY,
    SURPRISAL_SPREAD,
)

_BULLETS = ("-", "*", "•")
_ELLIPSES = ("...", "…")
_ALPHA_RE = re.compile(r"[^\W\d_]")  # any letter (same class reference_impl uses)
# One findall counts the tokens containing a letter in a single C-level
# pass: \S cannot cross whitespace, so each match is exactly one
# whitespace-delimited token that contains a letter — equivalent to
# `sum(1 for w in text.split() if _ALPHA_RE.search(w))` for the
# corpus's whitespace (str.split() additionally treats \x1c-\x1f as
# separators, which never occur here; parity vs reference_impl is
# asserted corpus-wide in tests).
_ALPHA_WORD_RE = re.compile(r"\S*[^\W\d_]\S*")
_SURPRISAL_MOD = int(SURPRISAL_SPREAD * 1000)

# word -> bitmask of languages whose lexicon contains it (one dict
# lookup replaces len(LANGS) set probes + the "in any lexicon" check)
_WORD_LANG_MASK: Dict[str, int] = {}
for _i, _lang in enumerate(LANGS):
    for _w in LEXICONS[_lang]:
        _WORD_LANG_MASK[_w] = _WORD_LANG_MASK.get(_w, 0) | (1 << _i)

_LANG_BITS = [(lang, 1 << i) for i, lang in enumerate(LANGS)]


def compute_doc_features(text: str) -> Dict[str, object]:
    if text is None:
        text = ""
    words = text.split()
    n_words = len(words)
    lines = text.split("\n")
    n_lines = len(lines)

    text_lower = text.lower()
    if n_words:
        # lowercase the whole text once (C-level) instead of per word;
        # str.lower maps non-whitespace to non-whitespace, so the split
        # boundaries — and therefore the per-word lowered list — are
        # identical to [w.lower() for w in words]
        lowered = text_lower.split()
        mask_get = _WORD_LANG_MASK.get

        mean_wl = sum(map(len, words)) / n_words
        symbol_ratio = (text.count("#") + text.count("...")) / n_words
        alpha_frac = len(_ALPHA_WORD_RE.findall(text)) / n_words

        # language scores + stopword fraction + per-token surprisal
        # VALUES need one lookup/hash per UNIQUE token (counts act as
        # weights for the integer tallies) — real text repeats words,
        # so this shrinks the Python loop by the duplication factor
        word_counts = Counter(lowered)
        stop_frac = (
            sum(c for w, c in word_counts.items() if w in EN_STOPWORDS)
            / n_words
        )
        lang_counts = [0] * len(LANGS)
        surprisal: Dict[str, float] = {}
        for w, c in word_counts.items():
            m = mask_get(w)
            if m is None:
                surprisal[w] = (
                    SURPRISAL_BASE
                    + (zlib.crc32(w.encode("utf-8")) % _SURPRISAL_MOD) / 1000.0
                )
            else:
                surprisal[w] = SURPRISAL_COMMON
                i = 0
                while m:
                    if m & 1:
                        lang_counts[i] += c
                    m >>= 1
                    i += 1
        # Float-exactness contract: reference_impl accumulates surprisal
        # per OCCURRENCE (left to right); float addition is not
        # associative, so a count-weighted sum over unique tokens drifts
        # by ulps and can flip threshold-adjacent keep decisions.  Only
        # the per-token VALUES come from the unique-token dict; the
        # summation order stays the reference's.
        log_ppl = sum(map(surprisal.__getitem__, lowered)) / n_words
        best = max(range(len(LANGS)), key=lambda i: (lang_counts[i], -i))
        if lang_counts[best] == 0:
            lang_pred, lang_score = "und", 0.0
        else:
            lang_pred = LANGS[best]
            lang_score = lang_counts[best] / n_words
    else:
        mean_wl = symbol_ratio = alpha_frac = stop_frac = 0.0
        lang_pred, lang_score = "und", 0.0
        log_ppl = SURPRISAL_EMPTY

    bullet_frac = (
        sum(1 for ln in lines if ln.lstrip().startswith(_BULLETS)) / n_lines
    )
    ellipsis_frac = (
        sum(1 for ln in lines if ln.rstrip().endswith(_ELLIPSES)) / n_lines
    )

    # n-gram fractions: Counter over C-speed zip tuples
    if n_words >= 2:
        c2 = Counter(zip(words, words[1:]))
        top2 = max(c2.values()) * 2 / n_words
    else:
        top2 = 0.0
    if n_words >= 3:
        c3 = Counter(zip(words, words[1:], words[2:]))
        top3 = max(c3.values()) * 3 / n_words
    else:
        top3 = 0.0
    if n_words >= 5:
        c5 = Counter(zip(words, words[1:], words[2:], words[3:], words[4:]))
        dup_tokens = sum(c for c in c5.values() if c > 1) * 5
        dup5 = min(1.0, dup_tokens / n_words)
    else:
        dup5 = 0.0

    scrubbed, n_emails, n_ccs, n_toxic = scrub_text(text, _lowered=text_lower)

    return {
        "n_chars": len(text),
        "n_words": n_words,
        "mean_word_length": mean_wl,
        "symbol_to_word_ratio": symbol_ratio,
        "bullet_line_frac": bullet_frac,
        "ellipsis_line_frac": ellipsis_frac,
        "alpha_word_frac": alpha_frac,
        "stopword_frac": stop_frac,
        "top2gram_frac": top2,
        "top3gram_frac": top3,
        "dup5gram_frac": dup5,
        "lang_pred": lang_pred,
        "lang_score": lang_score,
        "log_ppl": log_ppl,
        "n_emails": n_emails,
        "n_creditcards": n_ccs,
        "n_toxic": n_toxic,
        "scrubbed_text": scrubbed,
    }
