"""Scalar-function shims: Flink 1.8 spellings Spark lacks.

Reference parity (all JVM-side Column expressions — no Python UDFs):

- ``at``          : Flink ITEM/AT ``a[i]`` is 1-based
                    (flink-table/.../expressions/collection.scala); Spark's
                    ``element_at`` is also 1-based, so this is a direct alias.
- ``element``     : Flink ELEMENT(a) — sole element of a 1-element array
                    (FunctionCatalog.scala:283).
- ``cot``         : cotangent (FunctionCatalog.scala:236).
- ``truncate``    : TRUNCATE(x, d) — truncate toward zero
                    (flink-table/.../expressions/mathExpressions.scala).
- ``rand_integer``: RAND_INTEGER(n) (FunctionCatalog.scala).
- ``similar_to``  : SQL ``SIMILAR TO`` — SQL-regex full match
                    (FunctionCatalog.scala comparison ops).
- ``overlaps``    : SQL ``(s1, e1) OVERLAPS (s2, e2)``
                    (flink-table/.../expressions/time.scala).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def at(arr: Column, index) -> Column:
    """Flink ``a[i]`` / AT — 1-based array access (NULL when out of range)."""
    return F.element_at(arr, index)


def element(arr: Column) -> Column:
    """Flink ELEMENT(a): the single element of a one-item array, else NULL."""
    return F.when(F.size(arr) == 1, F.element_at(arr, 1))


def cot(col: Column) -> Column:
    return F.cos(col) / F.sin(col)


def truncate(col: Column, scale: int = 0) -> Column:
    """TRUNCATE(x, d): drop digits past d decimal places, toward zero."""
    factor = 10**scale
    scaled = col * F.lit(factor)
    truncated = F.when(scaled >= 0, F.floor(scaled)).otherwise(F.ceil(scaled))
    return truncated / F.lit(factor)


def rand_integer(n, seed: int | None = None) -> Column:
    """RAND_INTEGER(n): uniform int in [0, n). Nondeterministic — excluded
    from hash-checked queries (tested by property)."""
    r = F.rand(seed) if seed is not None else F.rand()
    return F.floor(r * F.lit(n)).cast("int")


def _sql_regex_to_re(pattern: str) -> str:
    """Translate a SQL SIMILAR TO pattern into a Java regex.

    ``%`` -> ``.*``, ``_`` -> ``.``; character classes ``[...]`` and
    grouping/alternation pass through (SIMILAR TO already uses them).
    """
    out: list[str] = []
    i, n = 0, len(pattern)
    in_class = False
    while i < n:
        c = pattern[i]
        if in_class:
            out.append(c)
            if c == "]":
                in_class = False
        elif c == "[":
            out.append(c)
            in_class = True
        elif c == "%":
            out.append(".*")
        elif c == "_":
            out.append(".")
        elif c == "\\" and i + 1 < n:
            out.append(c + pattern[i + 1])
            i += 1
        elif c in ".^$":
            out.append("\\" + c)
        else:
            out.append(c)
        i += 1
    return "".join(out)


def similar_to(col: Column, pattern: str) -> Column:
    """SQL ``col SIMILAR TO pattern`` — full-string SQL-regex match."""
    return col.rlike("^" + _sql_regex_to_re(pattern) + "$")


def overlaps(s1: Column, e1: Column, s2: Column, e2: Column) -> Column:
    """SQL (s1, e1) OVERLAPS (s2, e2): do the two periods share any instant?

    Normalizes each period so start <= end, then tests strict interval
    intersection with boundary contact counting as overlap (SQL semantics).
    """
    lo1, hi1 = F.least(s1, e1), F.greatest(s1, e1)
    lo2, hi2 = F.least(s2, e2), F.greatest(s2, e2)
    return (lo1 <= hi2) & (lo2 <= hi1)


_MYSQL_FMT = {
    # MySQL %-code -> Spark datetime pattern
    # (reference runtime DateTimeFunctions.scala:36-100 enumerates the
    # joda builder equivalents; this is the same table for Spark)
    "a": "EEE", "b": "MMM", "c": "M", "d": "dd", "e": "d",
    "f": "SSSSSS", "H": "HH", "h": "hh", "I": "hh", "i": "mm",
    "j": "DDD", "k": "H", "l": "h", "M": "MMMM", "m": "MM",
    "p": "a", "r": "hh:mm:ss a", "S": "ss", "s": "ss",
    "T": "HH:mm:ss", "W": "EEEE", "Y": "yyyy", "y": "yy",
}


# %-codes the reference REFUSES (DateTimeFunctions.scala:103 throws
# UnsupportedOperationException for exactly these six)
_MYSQL_FMT_UNSUPPORTED_REF = frozenset("wUuVXD")
# %-codes the reference supports via joda week-based fields
# (DateTimeFunctions.scala:85 %v appendWeekOfWeekyear, :88 %x
# appendWeekyear) that Spark 3's datetime patterns cannot express
# (week-based pattern letters were removed from date_format)
_MYSQL_FMT_UNSUPPORTED_SPARK = frozenset("vx")


def mysql_date_format(col: Column, fmt: str) -> Column:
    """DATE_FORMAT(ts, mysqlFormat): MySQL %-code date formatting
    (reference DateTimeFunctions.scala:31 dateFormat) lowered to Spark
    ``date_format`` — literal characters are single-quoted so Spark
    never interprets them.  Matches the reference's joda-builder
    semantics exactly: %w/%U/%u/%V/%X/%D raise (the reference's own
    unsupported set, DateTimeFunctions.scala:103); any OTHER
    unrecognized %-code emits its literal character
    (DateTimeFunctions.scala:109 default case); %v/%x are week-based
    fields Spark 3 patterns cannot express, so they raise with a
    Spark-limitation message.  The reference appends each code as an
    independent joda field, so adjacent codes whose Spark patterns
    share a letter ('%d%e' -> 'dd'+'d', NOT the 3-letter field 'ddd')
    are rendered as separate ``date_format`` calls concatenated
    together — one call suffices whenever no segments collide."""
    # each part becomes one date_format call; a part is a list of
    # pattern/quoted-literal segments
    parts: list[list[str]] = [[]]
    last_pat_end: str | None = None  # trailing letter of the previous
    # pattern segment in the current part (None after a literal)
    lit: list[str] = []

    def flush_lit():
        nonlocal last_pat_end
        if lit:
            parts[-1].append("'" + "".join(lit).replace("'", "''") + "'")
            lit.clear()
            last_pat_end = None

    def emit_pattern(p: str):
        nonlocal last_pat_end
        flush_lit()
        if last_pat_end is not None and p[0] == last_pat_end:
            # same-letter adjacency would merge two independent fields
            # into one wider field — split into a new date_format call
            parts.append([])
        parts[-1].append(p)
        last_pat_end = p[-1]

    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == "%":
            if i + 1 >= len(fmt):
                raise ValueError("dateFormat: dangling '%' at end of format")
            code = fmt[i + 1]
            i += 2
            if code == "%":
                lit.append("%")
            elif code in _MYSQL_FMT:
                emit_pattern(_MYSQL_FMT[code])
            elif code in _MYSQL_FMT_UNSUPPORTED_REF:
                raise ValueError(
                    f"dateFormat: %{code} is unsupported by the reference "
                    "(DateTimeFunctions.scala:103)"
                )
            elif code in _MYSQL_FMT_UNSUPPORTED_SPARK:
                raise ValueError(
                    f"dateFormat: %{code} is a week-based field Spark 3 "
                    "datetime patterns cannot express"
                )
            else:
                # reference default case: emit the literal character
                lit.append(code)
        else:
            lit.append(ch)
            i += 1
    flush_lit()
    ts = col.cast("timestamp")
    cols = [F.date_format(ts, "".join(p)) for p in parts if p]
    if not cols:
        return F.date_format(ts, "")
    return cols[0] if len(cols) == 1 else F.concat(*cols)
