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
- ONE ROW PER MATCH (default) and ALL ROWS PER MATCH.  The reference's
  SQL planner rejects all-rows mode (DataStreamMatch.scala:182-183
  ``throw new TableException("All rows per match mode is not supported
  yet.")``) — ours is a documented superset: one output row per matched
  event carrying the input columns, CLASSIFIER() as ``classifier``, and
  the MEASURES with FINAL semantics (each match's measures repeated on
  its rows).
- AFTER MATCH SKIP PAST LAST ROW (default), SKIP TO NEXT ROW,
  SKIP TO FIRST <sym>, SKIP TO LAST <sym> — the skip-to forms raise on
  no-progress/unbound symbol, per the SQL standard (and Flink's
  throwExceptionOnMiss)

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
        rf"{name}\s+(.*?)(?=(?:PARTITION\s+BY|ORDER\s+BY|MEASURES|ONE\s+ROW|ALL\s+ROWS|AFTER\s+MATCH|PATTERN|DEFINE|$))",
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
    all_rows = re.search(r"ALL\s+ROWS\s+PER\s+MATCH", clause, re.IGNORECASE) is not None

    # ORDER BY <time_col>[, <tiebreak>] — extra columns break ties so the
    # row sequence the NFA sees is deterministic under equal timestamps
    order_cols = [c.strip() for c in order.split(",")]
    order, tiebreak = order_cols[0], (order_cols[1] if len(order_cols) > 1 else None)

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
    # -- AFTER MATCH SKIP ---------------------------------------------
    skip_kw = {}
    if re.search(r"PAST\s+LAST", skip_txt, re.IGNORECASE):
        skip = "skip_past_last"
    elif re.search(r"TO\s+NEXT\s+ROW", skip_txt, re.IGNORECASE):
        skip = "skip_to_next"
    elif m := re.search(r"TO\s+(FIRST|LAST)\s+(\w+)", skip_txt, re.IGNORECASE):
        skip = f"skip_to_{m.group(1).lower()}"
        # SQL standard: skipping to an unbound symbol or to the match's
        # own first row is a runtime error (Flink: throwExceptionOnMiss)
        skip_kw = {"stage": m.group(2), "throw_on_miss": True}
    else:
        skip = "no_skip"
    pattern = Pattern(stages=tuple(stages)).with_skip(skip, **skip_kw)

    # -- evaluate defines, run the NFA --------------------------------
    work = df
    for sym, cond in defines.items():
        work = work.withColumn(f"__def_{sym}", F.expr(cond))

    measure_cols = {m.col for m in measures if m.col is not None}
    if all_rows:
        # every input column rides along — the SQL-standard all-rows shape
        needed = [c for c in df.columns if c != partition]
    else:
        needed = sorted(measure_cols | {order})
    matches = match_pattern(
        work, pattern, key=partition, time_col=order, select_cols=needed,
        tiebreak=tiebreak,
    )

    # -- measures: sorted-collect per match, pure Column expressions --
    struct_cols = sorted(measure_cols | {order}) if all_rows else needed
    arr_of = F.collect_list(F.struct("seq", "stage", *struct_cols))

    def stage_filter(sym: str):
        # closure factory — a default-arg lambda would change the HOF arity
        return lambda x: x["stage"] == sym

    def measure_exprs(arr):
        out = []
        for ms in measures:
            sub = F.filter(arr, stage_filter(ms.symbol))
            if ms.kind == "count":
                out.append(F.size(sub).alias(ms.alias))
            elif ms.kind == "first":
                out.append(sub[0][ms.col].alias(ms.alias))
            else:  # last
                out.append(F.element_at(sub, -1)[ms.col].alias(ms.alias))
        return out

    if all_rows:
        # one row per matched event: input columns + CLASSIFIER() +
        # FINAL-semantics measures, computed over a per-match window (one
        # exchange on (partition, match_id); no extra join)
        from pyspark.sql import Window

        wm = Window.partitionBy(partition, "match_id")
        arr = F.array_sort(arr_of.over(wm))
        return matches.select(
            partition,
            *needed,
            F.col("stage").alias("classifier"),
            *measure_exprs(arr),
        )
    return (
        matches.groupBy(F.col(partition), F.col("match_id"))
        .agg(*measure_exprs(F.array_sort(arr_of)))
        .drop("match_id")
    )
