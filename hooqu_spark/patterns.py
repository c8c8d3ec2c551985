"""Compiled PII-detection regex patterns.

Same public-source patterns the reference ships
(``hooqu/patterns.py:1-12``): email (emailregex.com), URL
(mathiasbynens.be stephenhay variant), credit card
(richardsramblings.com).  These seed the webtext pipeline's
PII scrub stage (``hooqu_spark/pipeline/scrub.py``), which extends
them from count-only metrics to redaction.
"""

import re

# http://emailregex.com
EMAIL = re.compile(
    r"""(?:[a-z0-9!#$%&'*+/=?^_`{|}~-]+(?:\.[a-z0-9!#$%&'*+/=?^_`{|}~-]+)*"""
    r"""|"(?:[\x01-\x08\x0b\x0c\x0e-\x1f\x21\x23-\x5b\x5d-\x7f]|\\[\x01-\x09\x0b\x0c\x0e-\x7f])*")"""
    r"""@(?:(?:[a-z0-9](?:[a-z0-9-]*[a-z0-9])?\.)+[a-z0-9](?:[a-z0-9-]*[a-z0-9])?"""
    r"""|\[(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}"""
    r"""(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?|[a-z0-9-]*[a-z0-9]:"""
    r"""(?:[\x01-\x08\x0b\x0c\x0e-\x1f\x21-\x5a\x53-\x7f]|\\[\x01-\x09\x0b\x0c\x0e-\x7f])+)\])"""
)

# https://mathiasbynens.be/demo/url-regex (stephenhay)
URL = re.compile(r"""(https?|ftp)://[^\s/$.?#].[^\s]*""")

# Visa, MasterCard, AMEX, Discover
# http://www.richardsramblings.com/regex/credit-card-numbers/
CREDITCARD = re.compile(
    r"""\b(?:3[47]\d{2}([\ \-]?)\d{6}\1\d"""
    r"""|(?:(?:4\d|5[1-5]|65)\d{2}|6011)([\ \-]?)\d{4}\2\d{4}\2)\d{4}\b"""
)
