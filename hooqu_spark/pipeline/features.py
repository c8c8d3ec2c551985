"""Per-document feature kernel for the Spark enrich stage.

One pass per document: tokenize once, derive every Gopher/C4 heuristic
feature, language ID, perplexity and the scrubbed text from the same
token list.  Called from ``core.enrich``'s ``mapInPandas`` iterator —
Arrow-batched, never row-at-a-time Spark UDFs.

Feature definitions (the parity contract, mirrored independently by
``reference_impl.py``):

* words = ``text.split()`` (any whitespace)
* mean_word_length = mean(len(w)); 0.0 if no words
* symbol_to_word_ratio = (count('#') + count('...')) / n_words; 0.0 if
  no words
* lines = ``text.split('\\n')``; bullet lines start with -, *, or the
  bullet glyph after lstrip; ellipsis lines end with '...' or the
  ellipsis glyph after rstrip
* alpha_word_frac = fraction of words containing an alphabetic char
* stopword_frac = fraction of lowercased words in EN_STOPWORDS
* topNgram_frac (n=2,3) = count(most frequent word n-gram) * n / n_words
  (0.0 when n_words < n)
* dup5gram_frac = min(1, 5 * sum counts of repeated 5-grams / n_words)
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List

from .langid import score_tokens
from .perplexity import doc_log_ppl
from .scrub import scrub_text
from .spec import EN_STOPWORDS

_BULLETS = ("-", "*", "•")
_ELLIPSES = ("...", "…")


def _top_ngram_frac(words: List[str], n: int) -> float:
    total = len(words)
    if total < n:
        return 0.0
    counts = Counter(tuple(words[i : i + n]) for i in range(total - n + 1))
    return counts.most_common(1)[0][1] * n / total


def _dup_ngram_frac(words: List[str], n: int) -> float:
    total = len(words)
    if total < n:
        return 0.0
    counts = Counter(tuple(words[i : i + n]) for i in range(total - n + 1))
    dup_tokens = sum(c for c in counts.values() if c > 1) * n
    return min(1.0, dup_tokens / total)


def compute_doc_features(text: str) -> Dict[str, object]:
    if text is None:
        text = ""
    words = text.split()
    n_words = len(words)
    lines = text.split("\n")
    n_lines = len(lines)

    if n_words:
        mean_wl = sum(len(w) for w in words) / n_words
        symbol_ratio = (text.count("#") + text.count("...")) / n_words
        alpha_frac = (
            sum(1 for w in words if any(c.isalpha() for c in w)) / n_words
        )
        stop_frac = (
            sum(1 for w in words if w.lower() in EN_STOPWORDS) / n_words
        )
    else:
        mean_wl = 0.0
        symbol_ratio = 0.0
        alpha_frac = 0.0
        stop_frac = 0.0

    bullet_frac = (
        sum(1 for ln in lines if ln.lstrip().startswith(_BULLETS)) / n_lines
    )
    ellipsis_frac = (
        sum(1 for ln in lines if ln.rstrip().endswith(_ELLIPSES)) / n_lines
    )

    lang_pred, lang_score = score_tokens(words)
    log_ppl = doc_log_ppl(words)
    scrubbed, n_emails, n_ccs, n_toxic = scrub_text(text)

    return {
        "n_chars": len(text),
        "n_words": n_words,
        "mean_word_length": mean_wl,
        "symbol_to_word_ratio": symbol_ratio,
        "bullet_line_frac": bullet_frac,
        "ellipsis_line_frac": ellipsis_frac,
        "alpha_word_frac": alpha_frac,
        "stopword_frac": stop_frac,
        "top2gram_frac": _top_ngram_frac(words, 2),
        "top3gram_frac": _top_ngram_frac(words, 3),
        "dup5gram_frac": _dup_ngram_frac(words, 5),
        "lang_pred": lang_pred,
        "lang_score": lang_score,
        "log_ppl": log_ppl,
        "n_emails": n_emails,
        "n_creditcards": n_ccs,
        "n_toxic": n_toxic,
        "scrubbed_text": scrubbed,
    }
