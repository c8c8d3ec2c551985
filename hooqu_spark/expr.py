"""pandas ``query``/``eval`` dialect -> Spark SQL expression translator.

The reference accepts pandas-eval predicate strings everywhere
(``where=`` filters, ``Compliance`` predicates, the fluent
``satisfies``/``is_contained_in``/``is_non_negative`` builders — see
``hooqu/analyzers/compliance.py:33-40`` and ``hooqu/checks.py:377-518``).
This module translates that dialect to Spark SQL so the predicates run
JVM-side inside whole-stage codegen instead of in Python.

Supported constructs (the full dialect the reference exercises):

=====================  =============================
pandas-eval            Spark SQL
=====================  =============================
``` `col`.isna() ```   ``(`col` IS NULL)``
``` `col`.notna() ```  ``(`col` IS NOT NULL)``
``col.isin([a, b])``   ``col IN (a, b)``
``col.fillna(x)``      ``coalesce(col, x)``
``==  !=  <  <=  ...`` unchanged (Spark accepts ``==``)
``and  or  not``       unchanged (valid Spark SQL)
``&  |  ~``            ``AND  OR  NOT``
=====================  =============================

NaN caveat: pandas conflates NaN and NULL; Spark does not.  Numeric
analyzers NaN-normalize their target column (see ``analyzers/base.py``);
predicates referencing raw float columns containing NaN follow Spark
semantics (NaN compares greater than any value).
"""

from __future__ import annotations

import re

# A receiver is either a backticked identifier (may contain spaces) or a
# bare python identifier.
_RECV = r"(?P<recv>`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)"

_ISNA = re.compile(rf"{_RECV}\s*\.\s*isna\(\s*\)")
_NOTNA = re.compile(rf"{_RECV}\s*\.\s*notna\(\s*\)")
_ISIN = re.compile(rf"{_RECV}\s*\.\s*isin\(\s*[\[\(](?P<items>.*?)[\]\)]\s*,?\s*\)")
_FILLNA = re.compile(rf"{_RECV}\s*\.\s*fillna\(\s*(?P<arg>[^()]*)\s*\)")
_BITAND = re.compile(r"&")
_BITOR = re.compile(r"\|")
_BITNOT = re.compile(r"~")


def translate(query: str) -> str:
    """Translate a pandas-eval predicate string into Spark SQL."""
    if query is None:
        raise ValueError("query must not be None")
    out = query
    out = _ISNA.sub(lambda m: f"({m.group('recv')} IS NULL)", out)
    out = _NOTNA.sub(lambda m: f"({m.group('recv')} IS NOT NULL)", out)
    out = _ISIN.sub(lambda m: f"{m.group('recv')} IN ({m.group('items')})", out)
    out = _FILLNA.sub(
        lambda m: f"coalesce({m.group('recv')}, {m.group('arg')})", out
    )
    out = _BITAND.sub(" AND ", out)
    out = _BITOR.sub(" OR ", out)
    out = _BITNOT.sub(" NOT ", out)
    return out
