"""PII / toxicity scrub stage.

Extends the reference's count-only PII patterns
(``/root/reference/hooqu/patterns.py`` — email, credit card) to
redaction.  CPython ``re`` is the source of truth (byte-identical
scrubbed text per url is part of the contract; Python and Java regex
dialects differ on these patterns), applied inside Arrow-batched UDF
workers.

Replacement ORDER is part of the contract: EMAIL, then CREDITCARD,
then TOXIC.
"""

from __future__ import annotations

import re
from typing import Tuple

from .. import patterns
from .spec import (
    SCRUB_CREDITCARD_TOKEN,
    SCRUB_EMAIL_TOKEN,
    SCRUB_TOXIC_TOKEN,
    TOXIC_WORDS,
)

TOXIC_RE = re.compile(
    r"\b(?:" + "|".join(re.escape(w) for w in TOXIC_WORDS) + r")\b",
    re.IGNORECASE,
)

# Prechecks provably implied by the patterns (pure fast-path, cannot
# change results): EMAIL requires a literal '@'; both CREDITCARD
# branches start with four consecutive digits; a \b-bounded
# case-insensitive toxic-word match implies plain substring presence
# in the lowercased text (C-level memmem scans beat re's alternation).
_CC_PRECHECK = re.compile(r"\d{4}")
_TOXIC_LOWER = tuple(w.lower() for w in TOXIC_WORDS)

# The toxic precheck runs against the ORIGINAL text while the subn runs
# on the email/cc-scrubbed text — sound only if replacement tokens
# cannot introduce a toxic word.  Enforce that at import time.
for _tok in (SCRUB_EMAIL_TOKEN, SCRUB_CREDITCARD_TOKEN):
    assert not any(w in _tok.lower() for w in _TOXIC_LOWER), (
        "scrub replacement token contains a toxic word; "
        "the precheck in scrub_text would be unsound"
    )


def scrub_text(text: str, _lowered: str = None) -> Tuple[str, int, int, int]:
    """Return (scrubbed_text, n_emails, n_creditcards, n_toxic).

    ``_lowered`` optionally passes an already-computed ``text.lower()``
    (the feature kernel has one) to avoid recomputing it for the
    toxic-word precheck."""
    n_emails = n_ccs = n_toxic = 0
    scrubbed = text
    if "@" in text:
        scrubbed, n_emails = patterns.EMAIL.subn(SCRUB_EMAIL_TOKEN, scrubbed)
    if _CC_PRECHECK.search(scrubbed):
        scrubbed, n_ccs = patterns.CREDITCARD.subn(
            SCRUB_CREDITCARD_TOKEN, scrubbed
        )
    tl = _lowered if _lowered is not None else text.lower()
    if any(w in tl for w in _TOXIC_LOWER):
        scrubbed, n_toxic = TOXIC_RE.subn(SCRUB_TOXIC_TOKEN, scrubbed)
    return scrubbed, n_emails, n_ccs, n_toxic
