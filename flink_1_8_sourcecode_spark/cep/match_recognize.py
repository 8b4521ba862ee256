"""SQL MATCH_RECOGNIZE — the SQL face of the CEP module.

Reference parity: planner DataStreamMatch.scala:65, codegen
MatchCodeGenerator.scala, runtime flink-table/.../runtime/match/ —
Flink 1.8 supports PARTITION BY / ORDER BY / MEASURES / ONE ROW PER
MATCH / AFTER MATCH SKIP / PATTERN / DEFINE with FIRST/LAST navigation.

Supported subset (documented):
- PARTITION BY <col>, ORDER BY <col>
- PATTERN over symbols with quantifiers ``+ * ? {n} {n,} {n,m}`` and a
  trailing ``?`` for reluctant (non-greedy); row contiguity is STRICT
  between and inside symbols, per the SQL standard
- DEFINE <S> AS <condition on the current row> (``S.col`` and bare
  ``col`` both refer to the current row; cross-symbol navigation like
  ``LAST(B.x) < A.y`` is not supported in round 1)
- MEASURES FIRST(S.col) / LAST(S.col) / S.col (= FIRST) / COUNT(S.*)
  AS alias
- ONE ROW PER MATCH (only); AFTER MATCH SKIP PAST LAST ROW (default) or
  AFTER MATCH SKIP TO NEXT ROW

Execution: DEFINE conditions are evaluated JVM-side as boolean columns
(one ``F.expr`` each — whole-stage codegen), so the Python NFA only
reads precomputed booleans; measures aggregate match rows with
sorted-collect expressions (no Python post-processing).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.cep.matcher import match_pattern
from flink_1_8_sourcecode_spark.cep.pattern import Pattern, Stage


@dataclass(frozen=True)
class _Measure:
    kind: str  # 'first' | 'last' | 'count'
    symbol: str
    col: str | None
    alias: str


_MEASURE_RE = re.compile(
    r"(?:(?P<nav>FIRST|LAST|COUNT)\s*\(\s*(?P<sym1>\w+)\.(?P<col1>\w+|\*)\s*\)"
    r"|(?P<sym2>\w+)\.(?P<col2>\w+))\s+AS\s+(?P<alias>\w+)",
    re.IGNORECASE,
)

_QUANT_RE = re.compile(r"(?P<sym>[A-Za-z_]\w*)(?P<q>[+*?]|\{\d+(?:,\d*)?\})?(?P<rel>\?)?")


def _parse_clause(text: str, name: str, required: bool = True) -> str | None:
    m = re.search(
        rf"{name}\s+(.*?)(?=(?:PARTITION\s+BY|ORDER\s+BY|MEASURES|ONE\s+ROW|AFTER\s+MATCH|PATTERN|DEFINE|$))",
        text,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        if required:
            raise ValueError(f"MATCH_RECOGNIZE: missing {name} clause")
        return None
    return m.group(1).strip().rstrip(",")


def _split_top_level(s: str) -> list[str]:
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if "".join(cur).strip():
        out.append("".join(cur).strip())
    return out


def _strip_symbol_prefixes(cond: str, symbols: set[str]) -> str:
    """Rewrite ``S.col`` -> ``col`` for pattern symbols S only.

    A blanket ``\\w+\\.(\\w+)`` rewrite corrupts decimal literals
    (``price > 1.5`` -> ``price > 5``) and dotted text inside string
    literals, so the prefix must be a known symbol and quoted strings
    are left untouched.
    """
    if not symbols:
        return cond
    sym_re = re.compile(rf"\b({'|'.join(map(re.escape, sorted(symbols)))})\.(\w+)")
    # split keeps single-quoted literals (with '' escapes) at odd indices
    parts = re.split(r"('(?:[^']|'')*')", cond)
    return "".join(p if i % 2 else sym_re.sub(r"\2", p) for i, p in enumerate(parts))


def _parse_pattern(pat: str) -> list[tuple[str, int, int | None, bool]]:
    """-> [(symbol, times_min, times_max, greedy)]"""
    out = []
    for tok in pat.replace("(", " ").replace(")", " ").split():
        m = _QUANT_RE.fullmatch(tok)
        if not m:
            raise ValueError(f"unsupported PATTERN token {tok!r}")
        q, rel = m.group("q"), bool(m.group("rel"))
        greedy = not rel
        if q is None:
            lo, hi = 1, 1
        elif q == "+":
            lo, hi = 1, None
        elif q == "*":
            lo, hi = 0, None
        elif q == "?":
            lo, hi = 0, 1
        else:
            inner = q.strip("{}")
            if "," in inner:
                a, b = inner.split(",")
                lo, hi = int(a), (int(b) if b else None)
            else:
                lo = hi = int(inner)
        out.append((m.group("sym"), lo, hi, greedy))
    return out


def match_recognize(df: DataFrame, clause: str) -> DataFrame:
    """Run ``MATCH_RECOGNIZE (<clause>)`` over a DataFrame."""
    partition = _parse_clause(clause, r"PARTITION\s+BY")
    order = _parse_clause(clause, r"ORDER\s+BY")
    measures_txt = _parse_clause(clause, "MEASURES")
    pattern_txt = _parse_clause(clause, "PATTERN")
    define_txt = _parse_clause(clause, "DEFINE")
    skip_txt = _parse_clause(clause, r"AFTER\s+MATCH", required=False) or "SKIP PAST LAST ROW"

    # -- PATTERN first: its symbols scope the DEFINE prefix rewrite ---
    parsed = _parse_pattern(pattern_txt)

    # -- DEFINE -> boolean columns (JVM-side) -------------------------
    raw_defines: dict[str, str] = {}
    for item in _split_top_level(define_txt):
        m = re.match(r"(\w+)\s+AS\s+(.*)", item, re.IGNORECASE | re.DOTALL)
        if not m:
            raise ValueError(f"bad DEFINE item: {item!r}")
        raw_defines[m.group(1)] = m.group(2).strip()
    symbols = set(raw_defines) | {sym for sym, *_ in parsed}
    defines = {
        sym: _strip_symbol_prefixes(cond, symbols) for sym, cond in raw_defines.items()
    }

    # -- MEASURES -----------------------------------------------------
    measures: list[_Measure] = []
    for item in _split_top_level(measures_txt):
        m = _MEASURE_RE.fullmatch(item.strip())
        if not m:
            raise ValueError(f"unsupported MEASURES item: {item!r}")
        if m.group("nav"):
            kind = m.group("nav").lower()
            sym, col = m.group("sym1"), m.group("col1")
            col = None if col == "*" else col
            if kind == "count" and col is not None:
                kind = "count"  # COUNT(S.col) counts non-null rows ~ rows
        else:
            kind, sym, col = "first", m.group("sym2"), m.group("col2")
        measures.append(_Measure(kind, sym, col, m.group("alias")))

    # -- PATTERN -> Pattern (strict contiguity, per SQL standard) -----
    stages = []
    for idx, (sym, lo, hi, greedy) in enumerate(parsed):
        if sym not in defines:
            defines[sym] = "true"  # undefined symbol matches any row
        stages.append(
            Stage(
                name=sym,
                contiguity="begin" if idx == 0 else "next",
                predicates=(lambda row, s=sym: bool(row[f"__def_{s}"]),),
                times_min=lo,
                times_max=hi,
                optional=(lo == 0),
                greedy=greedy,
                strict_iter=True,
            )
        )
    skip = "skip_past_last" if re.search(r"PAST\s+LAST", skip_txt, re.IGNORECASE) else "no_skip"
    pattern = Pattern(stages=tuple(stages), skip_strategy=skip)

    # -- evaluate defines, run the NFA --------------------------------
    work = df
    for sym, cond in defines.items():
        work = work.withColumn(f"__def_{sym}", F.expr(cond))

    needed = sorted(
        {m.col for m in measures if m.col is not None} | {order}
    )
    matches = match_pattern(
        work, pattern, key=partition, time_col=order, select_cols=needed
    )

    # -- measures: sorted-collect per match, pure Column expressions --
    arr = F.array_sort(F.collect_list(F.struct("seq", "stage", *needed)))

    def stage_filter(sym: str):
        # closure factory — a default-arg lambda would change the HOF arity
        return lambda x: x["stage"] == sym

    aggs = []
    for ms in measures:
        sub = F.filter(arr, stage_filter(ms.symbol))
        if ms.kind == "count":
            aggs.append(F.size(sub).alias(ms.alias))
        elif ms.kind == "first":
            aggs.append(sub[0][ms.col].alias(ms.alias))
        else:  # last
            aggs.append(F.element_at(sub, -1)[ms.col].alias(ms.alias))
    return (
        matches.groupBy(F.col(partition), F.col("match_id"))
        .agg(*aggs)
        .drop("match_id")
    )
