"""Flink-1.8 SQL -> Spark SQL pre-rewrite.

Handles the group-window functions (SQL TUMBLE/HOP/SESSION +
TUMBLE_START/.../SESSION_ROWTIME, FunctionCatalog.scala:495-509;
planner rule DataStreamLogicalWindowAggregateRule, FlinkRuleSets.scala:160):

    SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS w_start, count(*)
    FROM events GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)
        -->
    SELECT window.start AS w_start, count(*)
    FROM events GROUP BY window(ts, '1 hour')

Flink's HOP takes (time, slide, size); Spark's window() takes
(time, size, slide) — the rewrite swaps them.  Unsupported 1.8-isms
(MATCH_RECOGNIZE, FOR SYSTEM_TIME) raise with a pointer to the API-level
equivalent, per SURVEY.md §7 phase 2.
"""

from __future__ import annotations

import re

_INTERVAL = re.compile(
    r"INTERVAL\s+'(?P<n>[\d.]+)'\s+(?P<unit>SECOND|MINUTE|HOUR|DAY|MONTH|YEAR)S?",
    re.IGNORECASE,
)

_UNITS = {
    "second": "seconds",
    "minute": "minutes",
    "hour": "hours",
    "day": "days",
    "month": "months",
    "year": "years",
}


def _interval_to_duration(expr: str) -> str:
    """INTERVAL '10' MINUTE -> '10 minutes' (window() duration string)."""
    m = _INTERVAL.fullmatch(expr.strip())
    if not m:
        raise ValueError(f"unsupported interval literal: {expr!r}")
    return f"'{m.group('n')} {_UNITS[m.group('unit').lower()]}'"


def _split_args(argstr: str) -> list[str]:
    """Split top-level comma-separated args (parens-aware)."""
    out, depth, cur = [], 0, []
    for ch in argstr:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


_WINDOW_FN = re.compile(
    r"\b(?P<fn>TUMBLE|HOP|SESSION)(?P<suffix>_START|_END|_ROWTIME|_PROCTIME)?\s*\(",
    re.IGNORECASE,
)

_UNSUPPORTED = re.compile(r"\bMATCH_RECOGNIZE\b|\bFOR\s+SYSTEM_TIME\b", re.IGNORECASE)


def mask_literals(sql: str) -> str:
    """Blank out string-literal / quoted-identifier contents AND
    comment interiors (keeping length and positions) so keyword, paren
    and name scans never fire inside ``'...'``, ``"..."``, backticks —
    including doubled-quote escapes — or ``-- ...`` line comments and
    (nested, as Spark parses them) ``/* ... */`` bracketed comments.
    One pass tracks both states: a quote inside a comment is comment
    text, a ``--`` inside a literal is literal text."""
    out = list(sql)
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch in ("'", '"', "`"):
            j = i + 1
            while j < n:
                if sql[j] == ch:
                    if j + 1 < n and sql[j + 1] == ch:  # '' / "" escape
                        j += 2
                        continue
                    break
                j += 1
            for k in range(i + 1, min(j, n)):
                out[k] = " "
            i = j + 1
        elif ch == "-" and i + 1 < n and sql[i + 1] == "-":
            j = i + 2
            while j < n and sql[j] != "\n":
                out[j] = " "
                j += 1
            i = j
        elif ch == "/" and i + 1 < n and sql[i + 1] == "*":
            depth, j = 1, i + 2
            while j < n and depth:
                if sql[j] == "/" and j + 1 < n and sql[j + 1] == "*":
                    depth += 1
                    out[j] = out[j + 1] = " "
                    j += 2
                elif sql[j] == "*" and j + 1 < n and sql[j + 1] == "/":
                    depth -= 1
                    if depth:
                        out[j] = out[j + 1] = " "
                    j += 2
                else:
                    out[j] = " "
                    j += 1
            i = j
        else:
            i += 1
    return "".join(out)


def _find_call(sql: str, start: int) -> int:
    """Index just past the matching close paren for a call whose open
    paren is at ``start``."""
    depth = 0
    for i in range(start, len(sql)):
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    raise ValueError("unbalanced parentheses in SQL")


def rewrite_flink_sql(sql: str) -> str:
    """Rewrite Flink-1.8 group-window SQL into Spark SQL. Idempotent on
    plain Spark SQL."""
    if _UNSUPPORTED.search(mask_literals(sql)):
        raise NotImplementedError(
            "MATCH_RECOGNIZE / FOR SYSTEM_TIME are not string-rewritable: "
            "Engine.sql routes MATCH_RECOGNIZE through cep.match_recognize "
            "(use it instead of calling rewrite_flink_sql directly); for "
            "FOR SYSTEM_TIME use operators.joins.asof_join."
        )
    while True:
        m = _WINDOW_FN.search(mask_literals(sql))
        if not m:
            return sql
        open_paren = m.end() - 1
        close = _find_call(sql, open_paren)
        args = _split_args(sql[m.end() : close - 1])
        fn = m.group("fn").upper()
        suffix = (m.group("suffix") or "").upper()

        if fn == "TUMBLE":
            ts, size = args
            call = f"window({ts}, {_interval_to_duration(size)})"
        elif fn == "HOP":
            ts, slide, size = args  # Flink order: (time, slide, size)
            call = (
                f"window({ts}, {_interval_to_duration(size)}, {_interval_to_duration(slide)})"
            )
        else:  # SESSION
            ts, gap = args
            call = f"session_window({ts}, {_interval_to_duration(gap)})"

        # Spark names the grouping struct 'window' for TUMBLE/HOP but
        # 'session_window' for SESSION
        struct_name = "session_window" if fn == "SESSION" else "window"
        if suffix in ("_START", "_ROWTIME"):
            # _ROWTIME is window end - 1ms in Flink; we expose window.start/
            # end (the 1ms epsilon is a representation detail, documented).
            repl = f"{struct_name}.start" if suffix == "_START" else f"{struct_name}.end"
        elif suffix in ("_END", "_PROCTIME"):
            repl = f"{struct_name}.end"
        else:
            repl = call
        sql = sql[: m.start()] + repl + sql[close:]
