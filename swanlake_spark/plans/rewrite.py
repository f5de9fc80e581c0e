"""SQL rewrites applied before handing a statement to Catalyst.

``strip_select_locks`` re-expresses the reference rewrite that removes
``FOR UPDATE`` / ``FOR SHARE`` / ``FOR NO KEY UPDATE`` / ``FOR KEY
SHARE`` (with optional ``NOWAIT`` / ``SKIP LOCKED``) clauses, because
the underlying engine has no row locks
(``/root/reference/swanlake-core/src/sql/rewrite.rs:21-66``). Spark has
no row locks either, so the same rewrite applies.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_LOCK_RE = re.compile(
    r"\bFOR\s+(?:UPDATE|NO\s+KEY\s+UPDATE|KEY\s+SHARE|SHARE)"
    r"(?:\s+OF\s+[A-Za-z_][A-Za-z0-9_,.\s]*?)?"
    r"(?:\s+(?:NOWAIT|SKIP\s+LOCKED))?",
    re.IGNORECASE,
)


@dataclass
class LockStripResult:
    sql: str
    stripped: bool


def _mask_literals(sql: str) -> str:
    """Replace string/quoted-identifier contents with spaces so the regex
    can't match inside literals."""
    out = list(sql)
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c in ("'", '"', "`"):
            q = c
            i += 1
            while i < n:
                if sql[i] == q and i + 1 < n and sql[i + 1] == q:
                    out[i] = out[i + 1] = " "
                    i += 2
                elif sql[i] == q:
                    i += 1
                    break
                else:
                    out[i] = " "
                    i += 1
            continue
        i += 1
    return "".join(out)


def strip_select_locks(sql: str) -> LockStripResult:
    masked = _mask_literals(sql)
    spans = [(m.start(), m.end()) for m in _LOCK_RE.finditer(masked)]
    if not spans:
        return LockStripResult(sql=sql, stripped=False)
    pieces, last = [], 0
    for s, e in spans:
        pieces.append(sql[last:s])
        last = e
    pieces.append(sql[last:])
    # Collapse whitespace only at the splice boundaries — never across the
    # whole statement, which would mangle whitespace inside string
    # literals (`SELECT 'a  b' ... FOR UPDATE`).
    joined = pieces[0]
    for p in pieces[1:]:
        joined = joined.rstrip() + " " + p.lstrip()
    return LockStripResult(sql=joined.strip(), stripped=True)
