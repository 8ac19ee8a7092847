"""Row filters of the template pipeline (pure-Python twins of native rlike exprs).

* statement pre-filter: /root/reference/src/templatecrawler/logparser/filtersettings.py:6-9,
  applied before parsing at logparser/java.py:52-56.
* C preprocessor filter + strip: logparser/c.py:56-60 (NOTE: C strips the raw
  statement before filtering AND stores the stripped text as `raw`).
* template validity filter: /root/reference/src/templatecrawler/templatefilter.py:5-21.
* final empty-row cleanup: dags/log2vec_process-repository.py:287-294.

Replicated QUIRK in the validity filter: the reference OR-combines all terms
(`mask |= …`, templatefilter.py:16-20), so it is extremely permissive — any
template longer than 14 chars passes, as does any containing a letter other
than x/X.  The "≤12 placeholders" term is dead code: ``~count > 12`` applies
bitwise-NOT to the int count first, yielding a negative number that is never
greater than 12.  Both replicated.

In fact the OR-mask is provably ALWAYS TRUE: dropping a row would require
(len ≤ 14) AND (no letters besides x/X) AND (starts with a keyword) AND
(starts with a comment) simultaneously — but every keyword alternative
('static', '#include', …) contains letters other than x/X, contradicting the
no-letters term, and the keyword/comment prefixes are mutually exclusive.
``find_valid`` is a no-op in the reference and therefore here too; we keep
the expression (and its Spark-native twin) for auditable parity.
"""

from __future__ import annotations

import re

# filtersettings.py:6-9 — drop raws matching either pattern.
PREFILTER_SHORT_RE = re.compile(r"^.{0,5}$")
PREFILTER_REPEAT_RE = re.compile(r"(.)\1{5,}")

# templatefilter.py:5-9.
VALID_LENGTH_MIN = 14
VALID_NO_LETTERS_RE = re.compile(r"^[^a-wyzA-WYZ]+$")
VALID_KEYWORD_RE = re.compile(r"^\s*(static|#include|#define|#if|#endif)")
VALID_COMMENT_RE = re.compile(r"^\s*(//|\*)")


def prefilter_keep(raw: str) -> bool:
    """True if the raw statement survives the pre-parse filters (F6)."""
    if PREFILTER_SHORT_RE.search(raw):
        return False
    if PREFILTER_REPEAT_RE.search(raw):
        return False
    return True


def template_valid(parsed_template: str) -> bool:
    """The permissive OR-mask of templatefilter.find_valid (:12-21)."""
    keep = len(parsed_template) > VALID_LENGTH_MIN
    keep |= not bool(VALID_NO_LETTERS_RE.match(parsed_template))
    keep |= not bool(VALID_KEYWORD_RE.match(parsed_template))
    keep |= not bool(VALID_COMMENT_RE.match(parsed_template))
    # placeholder-count term is dead code in the reference — see module doc.
    return keep
