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
# branches start with four consecutive digits.
_CC_PRECHECK = re.compile(r"\d{4}")


def scrub_text(text: str) -> Tuple[str, int, int, int]:
    """Return (scrubbed_text, n_emails, n_creditcards, n_toxic)."""
    n_emails = n_ccs = 0
    scrubbed = text
    if "@" in text:
        scrubbed, n_emails = patterns.EMAIL.subn(SCRUB_EMAIL_TOKEN, scrubbed)
    if _CC_PRECHECK.search(scrubbed):
        scrubbed, n_ccs = patterns.CREDITCARD.subn(
            SCRUB_CREDITCARD_TOKEN, scrubbed
        )
    scrubbed, n_toxic = TOXIC_RE.subn(SCRUB_TOXIC_TOKEN, scrubbed)
    return scrubbed, n_emails, n_ccs, n_toxic
