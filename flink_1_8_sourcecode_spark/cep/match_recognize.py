"""SQL MATCH_RECOGNIZE — the SQL face of the CEP module.

Reference parity: planner DataStreamMatch.scala:65, codegen
MatchCodeGenerator.scala, runtime flink-table/.../runtime/match/ —
Flink 1.8 supports PARTITION BY / ORDER BY / MEASURES / ONE ROW PER
MATCH / AFTER MATCH SKIP / PATTERN / DEFINE with FIRST/LAST navigation.

Supported subset (documented):
- PARTITION BY <col>, ORDER BY <col>[, <tiebreak> ...]
- PATTERN over symbols with quantifiers ``+ * ? {n} {n,} {n,m}`` and a
  trailing ``?`` for reluctant (non-greedy); row contiguity is STRICT
  between and inside symbols, per the SQL standard; parenthesized
  QUANTIFIED groups — ``(A B)+``, ``(A B){2}`` — match as units via
  the CEP group machinery (GroupPattern.java semantics), and
  unquantified parentheses are plain grouping
- MEASURES also accept ``MATCH_ROWTIME()`` (the match's last-row
  event time, Flink 1.8 parity), ``MATCH_NUMBER()`` (1-based
  per-partition match ordinal) and ``CLASSIFIER()`` (the matched
  row's variable; in ONE ROW mode, the last row's) — the latter two a
  documented superset where the reference planner rejects them
- DEFINE <S> AS <condition>: row-local conditions (``S.col`` / bare
  ``col`` = current row) compile to JVM boolean columns; conditions
  that NAVIGATE — ``FIRST(A.col[, n])`` / ``LAST(A.col[, n])`` or a
  cross-symbol reference ``A.col`` (= ``LAST(A.col)`` per the SQL
  standard) — run as iterative predicates inside the NFA with a
  match context, the reference's IterativeCondition path
  (MatchCodeGenerator.scala; IterativeCondition.java).  Supported
  iterative grammar: comparisons/arithmetic, AND/OR/NOT,
  IS [NOT] NULL; anything else raises readably.
- MEASURES FIRST(S.col) / LAST(S.col) / S.col (= FIRST) / COUNT(S.*)
  / COUNT(S.col) (non-null values) / SUM|AVG|MIN|MAX(S.col) AS alias —
  the per-pattern-variable aggregates the reference code-generates
  (MatchCodeGenerator.scala:42-69, AggregationPatternVariableFinder);
  RUNNING forms apply in ALL ROWS mode; DEFINE conditions may use the
  same aggregates with RUNNING semantics (current row included)
- SUBSET U = (A, B): union variables — navigation and aggregates over
  a subset see the merged rows of its component symbols
  (DataStreamMatch.scala:38 ``subsets``)
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

Execution: row-local DEFINE conditions are evaluated JVM-side as
boolean columns (one ``F.expr`` each — whole-stage codegen), so the
Python NFA only reads precomputed booleans; NAVIGATING conditions run
as iterative Python predicates inside the NFA (they depend on the
partial match, which only the NFA holds — same split as the
reference's generated IterativeConditions); measures aggregate match
rows with sorted-collect expressions (no Python post-processing).
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
    kind: str  # 'first' | 'last' | 'count' | 'sum' | 'avg' | 'min' | 'max'
    symbol: str
    col: str | None
    alias: str
    running: bool = False  # RUNNING vs FINAL semantics (ALL ROWS mode)


# per-pattern-variable aggregates (SUM/AVG/MIN/MAX/COUNT grouped by the
# variable the argument is prefixed with) are the reference's
# MatchCodeGenerator.scala:42-69 / AggregationPatternVariableFinder path
_MEASURE_RE = re.compile(
    r"(?:(?P<sem>RUNNING|FINAL)\s+)?"
    r"(?:(?P<noarg>MATCH_NUMBER|CLASSIFIER|MATCH_ROWTIME)\s*\(\s*\)"
    r"|(?P<nav>FIRST|LAST|COUNT|SUM|AVG|MIN|MAX)\s*\(\s*(?P<sym1>\w+)\.(?P<col1>\w+|\*)\s*\)"
    # universal (symbol-less) form: FIRST(id) / LAST(id) / SUM(col) —
    # over ALL rows of the match (SQL standard unprefixed semantics)
    r"|(?P<nav3>FIRST|LAST|COUNT|SUM|AVG|MIN|MAX)\s*\(\s*(?P<col3>\w+)\s*\)"
    r"|(?P<sym2>\w+)\.(?P<col2>\w+))\s+AS\s+(?P<alias>\w+)",
    re.IGNORECASE,
)

_AGG_KINDS = ("sum", "avg", "min", "max")

_INTERVAL_UNITS = {"second": 1.0, "minute": 60.0, "hour": 3600.0, "day": 86400.0}


def _parse_sql_interval(text: str) -> float:
    """``INTERVAL '<v>' <UNIT> [TO <UNIT>]`` -> seconds.

    Single-unit (``INTERVAL '10' MINUTE``, fractional values fine) and
    the common day-time composite forms (``'d hh:mm:ss' DAY TO SECOND``,
    ``'hh:mm:ss' HOUR TO SECOND``, ``'hh:mm' HOUR TO MINUTE``,
    ``'mm:ss' MINUTE TO SECOND``).  Anything else raises readably —
    matching the reference planner, which rejects non-constant /
    non-time-interval WITHIN bounds (DataStreamMatch.scala:100-118
    translateTimeBound)."""
    t = text.strip().rstrip(";").strip()
    m = re.fullmatch(
        r"INTERVAL\s+'(?P<val>[^']+)'\s+(?P<unit>[A-Za-z]+)(?:\s*\(\s*\d+\s*\))?"
        r"(?:\s+TO\s+(?P<to>[A-Za-z]+))?",
        t,
        re.IGNORECASE,
    )
    if not m:
        raise NotImplementedError(
            f"MATCH_RECOGNIZE WITHIN: unsupported interval {text!r}; supported: "
            "INTERVAL '<n>' SECOND|MINUTE|HOUR|DAY and day-time composites "
            "like INTERVAL '1 02:30:00' DAY TO SECOND"
        )
    val = m.group("val").strip()
    unit = m.group("unit").lower().rstrip("s")
    to = (m.group("to") or "").lower().rstrip("s")
    if not to:
        if unit not in _INTERVAL_UNITS:
            raise NotImplementedError(f"MATCH_RECOGNIZE WITHIN: unknown unit {unit!r}")
        return float(val) * _INTERVAL_UNITS[unit]
    shapes = {
        ("day", "second"): r"(?:(?P<d>\d+)\s+)?(?P<h>\d+):(?P<mi>\d+):(?P<s>\d+(?:\.\d+)?)",
        ("hour", "second"): r"(?P<h>\d+):(?P<mi>\d+):(?P<s>\d+(?:\.\d+)?)",
        ("hour", "minute"): r"(?P<h>\d+):(?P<mi>\d+)",
        ("minute", "second"): r"(?P<mi>\d+):(?P<s>\d+(?:\.\d+)?)",
    }
    shape = shapes.get((unit, to))
    vm = re.fullmatch(shape, val) if shape else None
    if vm is None:
        raise NotImplementedError(
            f"MATCH_RECOGNIZE WITHIN: cannot parse {val!r} as {unit.upper()} TO {to.upper()}"
        )
    g = {k: float(v) for k, v in vm.groupdict(default="0").items()}
    return (
        g.get("d", 0.0) * 86400.0
        + g.get("h", 0.0) * 3600.0
        + g.get("mi", 0.0) * 60.0
        + g.get("s", 0.0)
    )


def _parse_clause(text: str, name: str, required: bool = True) -> str | None:
    m = re.search(
        # keyword-shaped identifiers must not terminate a clause:
        # SUBSET only counts followed by "<name> =", PATTERN only
        # followed by "(", DEFINE only followed by "<sym> AS" — so an
        # alias named subset/pattern/define parses instead of
        # truncating the clause it appears in
        rf"{name}\s+(.*?)(?=(?:(?:PARTITION\s+BY|ORDER\s+BY|MEASURES|ONE\s+ROW|ALL\s+ROWS|AFTER\s+MATCH)\b|PATTERN\s*\(|DEFINE\s+\w+\s+AS\b|SUBSET\s+\w+\s*=|$))",
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


_PAT_TOK_RE = re.compile(
    r"\s*(?:(?P<lp>\()|(?P<rp>\))|(?P<brace>\{\d+(?:,\d*)?\})"
    r"|(?P<q>[+*?])|(?P<sym>[A-Za-z_]\w*))"
)


def _parse_pattern(pat: str):
    """Recursive PATTERN parser.

    -> list of nodes; node = ``("sym", name, lo, hi, greedy)`` or
    ``("grp", inner_nodes, lo, hi, greedy)`` for a parenthesized,
    QUANTIFIED sub-pattern like ``(A B)+`` — the SQL-standard pattern
    grouping, matched by the CEP group machinery (GroupPattern.java
    semantics with MR's strict contiguity).  An UNquantified group is
    pure grouping and is inlined.  A trailing ``?`` after a quantifier
    marks it reluctant (non-greedy).
    """
    toks = []
    pos = 0
    while pos < len(pat):
        m = _PAT_TOK_RE.match(pat, pos)
        if not m or m.end() == pos:
            rest = pat[pos:].strip()
            if not rest:
                break
            raise ValueError(f"unsupported PATTERN token {rest[:20]!r}")
        pos = m.end()
        if m.lastgroup:
            toks.append((m.lastgroup, m.group(m.lastgroup)))

    i = [0]

    def peek():
        return toks[i[0]] if i[0] < len(toks) else (None, None)

    def parse_quant():
        lo, hi, greedy = 1, 1, True
        k, v = peek()
        if k == "q" or k == "brace":
            i[0] += 1
            if v == "+":
                lo, hi = 1, None
            elif v == "*":
                lo, hi = 0, None
            elif v == "?":
                lo, hi = 0, 1
            else:
                inner = v.strip("{}")
                if "," in inner:
                    a, b = inner.split(",")
                    lo, hi = int(a), (int(b) if b else None)
                else:
                    lo = hi = int(inner)
            k2, v2 = peek()
            if k2 == "q" and v2 == "?":
                i[0] += 1
                greedy = False
        return lo, hi, greedy

    def parse_seq(depth: int):
        elems = []
        while True:
            k, v = peek()
            if k is None:
                break
            if k == "rp":
                if depth == 0:
                    raise ValueError(f"unbalanced ')' in PATTERN {pat!r}")
                break
            if k == "lp":
                i[0] += 1
                inner = parse_seq(depth + 1)
                if peek()[0] != "rp":
                    raise ValueError(f"unbalanced '(' in PATTERN {pat!r}")
                i[0] += 1
                lo, hi, greedy = parse_quant()
                if not inner:
                    raise ValueError(f"empty group in PATTERN {pat!r}")
                if (lo, hi, greedy) == (1, 1, True):
                    elems.extend(inner)  # plain grouping — inline
                else:
                    elems.append(("grp", inner, lo, hi, greedy))
            elif k == "sym":
                i[0] += 1
                lo, hi, greedy = parse_quant()
                elems.append(("sym", v, lo, hi, greedy))
            else:
                raise ValueError(
                    f"unsupported PATTERN token {v!r} in {pat!r} (a "
                    "quantifier needs a symbol or group before it)"
                )
        return elems

    out = parse_seq(0)
    if i[0] != len(toks):
        raise ValueError(f"unbalanced ')' in PATTERN {pat!r}")
    if not out:
        raise ValueError(f"empty PATTERN {pat!r}")
    return out


def _pattern_symbols(nodes) -> list[str]:
    out = []
    for node in nodes:
        if node[0] == "sym":
            out.append(node[1])
        else:
            out.extend(_pattern_symbols(node[1]))
    return out


_NAV_RE = re.compile(r"\b(FIRST|LAST|PREV|SUM|AVG|MIN|MAX|COUNT)\s*\(", re.IGNORECASE)


def _needs_iterative(cond: str, sym: str, symbols: set[str]) -> bool:
    """A DEFINE condition is iterative when it navigates (FIRST/LAST),
    aggregates over a pattern variable (SUM/AVG/MIN/MAX/COUNT), or
    references a DIFFERENT symbol's columns — those depend on the
    current partial match, not just the current row."""
    no_strings = re.sub(r"'(?:[^']|'')*'", "''", cond)
    if _NAV_RE.search(no_strings):
        return True
    return any(
        m.group(1) in symbols and m.group(1) != sym
        for m in re.finditer(r"\b(\w+)\.(\w+)", no_strings)
    )


_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<str>'(?:[^']|'')*')
  | (?P<nav>(?P<navkind>FIRST|LAST)\s*\(\s*(?P<navsym>\w+)\.(?P<navcol>\w+)
        \s*(?:,\s*(?P<navoff>\d+)\s*)?\))
  | (?P<prev>PREV\s*\(\s*(?P<prevcol>\w+)\s*(?:,\s*(?P<prevoff>\d+)\s*)?\))
  | (?P<agg>(?P<aggkind>SUM|AVG|MIN|MAX|COUNT)\s*\(\s*(?P<aggsym>\w+)\.(?P<aggcol>\w+|\*)\s*\))
  | (?P<num>\d+(?:\.\d+)?)
  | (?P<qual>(?P<qsym>\w+)\.(?P<qcol>\w+))
  | (?P<word>[A-Za-z_]\w*)
  | (?P<op><>|!=|<=|>=|=|<|>|\(|\)|\+|-|\*|/|%)
    """,
    re.IGNORECASE | re.VERBOSE,
)

_WORD_MAP = {"and": "and", "or": "or", "not": "not", "true": "True", "false": "False"}


def _nav(ctx, row, kind, sym, col, off, cur):
    """SQL MATCH_RECOGNIZE running navigation: while DEFINE for ``cur``
    evaluates a candidate row, that row counts as the LAST row already
    mapped to ``cur`` (SQL standard running semantics) — whereas the
    underlying MatchContext (Flink IterativeCondition parity) holds
    only previously-bound rows.  This shim re-bases the offsets.

    ``sym`` may be a frozenset (a SUBSET union variable): the current
    row participates when ``cur`` is one of its components, and
    navigation merges the components' rows in match order."""
    involved = (cur in sym) if isinstance(sym, frozenset) else (sym == cur)
    if involved:
        if kind == "last":
            if off == 0:
                return row.get(col)
            return ctx.last(sym, col, off - 1)
        v = ctx.first(sym, col, off)
        if v is not None:
            return v
        # offset walked past every bound row: the current row sits at
        # index n_bound in front-to-back order
        return row.get(col) if off == len(ctx.events_for(sym)) else None
    return ctx.last(sym, col, off) if kind == "last" else ctx.first(sym, col, off)


def _agg_match(ctx, row, kind, sym, col, cur):
    """Per-pattern-variable aggregate inside a DEFINE condition with SQL
    RUNNING semantics (MatchCodeGenerator.scala:42-69): aggregate over
    the rows currently bound to ``sym`` — the candidate row counts as
    mapped to the symbol being defined (``cur``).  COUNT(S.*) counts
    rows, COUNT(S.col) non-null values; SUM/AVG/MIN/MAX ignore NULLs
    and return NULL (UNKNOWN upstream) over an empty/all-NULL set, per
    standard SQL aggregate semantics."""
    evs = ctx.events_for(sym)
    involved = (cur in sym) if isinstance(sym, frozenset) else (sym == cur)
    if involved:
        evs = evs + [row]
    if col is None:  # COUNT(S.*)
        return len(evs)
    vals = [v for r in evs if (v := r.get(col)) is not None]
    if kind == "count":
        return len(vals)
    if not vals:
        return None
    if kind == "sum":
        return sum(vals)
    if kind == "avg":
        return sum(vals) / len(vals)
    return min(vals) if kind == "min" else max(vals)


import operator as _op_mod

_CMP_OPS = {
    "=": _op_mod.eq, "<>": _op_mod.ne, "!=": _op_mod.ne,
    "<": _op_mod.lt, ">": _op_mod.gt, "<=": _op_mod.le, ">=": _op_mod.ge,
}
_ADD_OPS = {"+": _op_mod.add, "-": _op_mod.sub}
_MUL_OPS = {"*": _op_mod.mul, "/": _op_mod.truediv, "%": _op_mod.mod}


def _tokenize_define(cond: str):
    """-> list of (kind, payload) tokens for the DEFINE mini-grammar."""
    toks, pos = [], 0
    while pos < len(cond):
        m = _TOKEN_RE.match(cond, pos)
        if not m:
            raise NotImplementedError(
                f"MATCH_RECOGNIZE DEFINE: cannot parse {cond[pos:pos+25]!r} in "
                f"iterative condition {cond!r}"
            )
        pos = m.end()
        if m.group("ws"):
            continue
        if m.group("str"):
            toks.append(("lit", m.group("str")[1:-1].replace("''", "'")))
        elif m.group("nav"):
            toks.append(
                (
                    "nav",
                    (
                        m.group("navkind").lower(),
                        m.group("navsym"),
                        m.group("navcol"),
                        int(m.group("navoff") or 0),
                    ),
                )
            )
        elif m.group("prev"):
            toks.append(("prev", (m.group("prevcol"), int(m.group("prevoff") or 1))))
        elif m.group("agg"):
            col = m.group("aggcol")
            toks.append(
                (
                    "agg",
                    (
                        m.group("aggkind").lower(),
                        m.group("aggsym"),
                        None if col == "*" else col,
                    ),
                )
            )
        elif m.group("num"):
            n = m.group("num")
            toks.append(("lit", float(n) if "." in n else int(n)))
        elif m.group("qual"):
            toks.append(("qual", (m.group("qsym"), m.group("qcol"))))
        elif m.group("word"):
            toks.append(("word", m.group("word")))
        else:
            toks.append(("op", m.group("op")))
    return toks


_NAVAGG_CALL_RE = re.compile(
    r"\b(FIRST|LAST|SUM|AVG|MIN|MAX|COUNT)\s*\(([^()]+)\)", re.IGNORECASE
)


def _lower_expr_args(text: str, symbols: set, default_sym, synth: dict) -> str:
    """Rewrite FIRST/LAST/aggregate calls whose argument is an
    EXPRESSION (``SUM(B.price * B.rate)``) or an implied-symbol column
    (``SUM(weight)`` inside B's DEFINE) into plain ``SYM.col`` calls
    over synthetic row-local columns collected in ``synth``
    (name -> SQL expr over the input row).  Plain ``SYM.col[, n]`` /
    ``SYM.*`` arguments pass through untouched; ``default_sym`` is the
    defining symbol for DEFINE items (None for MEASURES, where a bare
    argument stays universal — all rows of the match)."""
    if text is None:
        return text

    def lower(m: re.Match) -> str:
        fn, arg = m.group(1), m.group(2).strip()
        # optional trailing ', n' navigation offset
        om = re.fullmatch(r"(.*?)(,\s*\d+\s*)?$", arg, re.DOTALL)
        expr, off = om.group(1).strip(), (om.group(2) or "").strip()
        if expr == "*" or re.fullmatch(r"[A-Za-z_]\w*\.(?:\w+|\*)", expr):
            # already SYM.col / SYM.* (or bare COUNT(*) — let the
            # measure/DEFINE layer apply its documented rule); numeric
            # literals ('1.5' would false-match a \w+\.\w+ form) fall
            # through to the synthetic-column lowering below
            return m.group(0)
        if re.fullmatch(r"[A-Za-z_]\w*", expr):
            if default_sym is not None:
                return f"{fn}({default_sym}.{expr}{off and ', ' + off.lstrip(', ')})"
            return m.group(0)  # MEASURES: universal bare column
        syms = {s for s in re.findall(r"(\w+)\s*\.", expr) if s in symbols}
        if len(syms) > 1:
            raise NotImplementedError(
                f"MATCH_RECOGNIZE: {fn}({arg}) mixes pattern variables "
                f"{sorted(syms)} in one argument expression"
            )
        sym = next(iter(syms), default_sym)
        row_expr = re.sub(
            r"\b(\w+)\s*\.\s*(\w+)",
            lambda mm: mm.group(2) if mm.group(1) in symbols else mm.group(0),
            expr,
        )
        name = None
        for k, v in synth.items():
            if v == row_expr:
                name = k
                break
        if name is None:
            name = f"__mx{len(synth)}"
            synth[name] = row_expr
        ref = f"{sym}.{name}" if sym is not None else name
        tail = f", {off.lstrip(', ')}" if off else ""
        return f"{fn}({ref}{tail})"

    return _NAVAGG_CALL_RE.sub(lower, text)


# Scalar functions allowed inside a bare expression measure
# (ROUND(UP.price, 2) AS total): row-local, deterministic, identical
# semantics in Spark SQL — the reference's MatchCodeGenerator compiles
# arbitrary RexCalls in measures (MatchCodeGenerator.scala:42-69).
# Aggregates/navigation and anything NOT listed (STDDEV, user calls)
# must keep falling through to the measure grammar's loud
# NotImplementedError rather than silently mis-evaluating.
_BARE_MEASURE_SCALAR_FNS = frozenset(
    """round abs sqrt ceil ceiling floor power pow mod ln log log10 exp
    sign greatest least coalesce nullif upper lower length char_length
    trim ltrim rtrim substring substr concat replace""".split()
)


def _lower_bare_expr_measures(measures_txt: str, symbols: set, synth: dict) -> str:
    """Rewrite bare single-variable expression measures
    (``UP.price + UP.tax AS end_total``, ``ROUND(UP.price, 2) AS r``)
    into ``LAST(SYM.__mx) AS alias`` over a synthetic row-local column
    — SQL's FINAL semantics for an unwrapped variable reference (the
    variable's last row)."""
    out = []
    for item in _split_top_level(measures_txt):
        it = item.strip()
        m = re.fullmatch(r"(.+?)\s+AS\s+(\w+)", it, re.IGNORECASE | re.DOTALL)
        if m and not _MEASURE_RE.fullmatch(it):
            expr, alias = m.group(1).strip(), m.group(2)
            syms = {s for s in re.findall(r"(\w+)\s*\.", expr) if s in symbols}
            # arithmetic over one variable's columns, calls restricted
            # to the whitelisted row-local scalars — an unknown
            # function (STDDEV(A.price)) must fall through to the
            # measure grammar's NotImplementedError
            calls = {
                c.lower() for c in re.findall(r"\b([A-Za-z_]\w*)\s*\(", expr)
            }
            if len(syms) == 1 and calls <= _BARE_MEASURE_SCALAR_FNS:
                sym = next(iter(syms))
                row_expr = re.sub(
                    r"\b(\w+)\s*\.\s*(\w+)",
                    lambda mm: mm.group(2) if mm.group(1) in symbols
                    else mm.group(0),
                    expr,
                )
                name = next(
                    (k for k, v in synth.items() if v == row_expr), None
                )
                if name is None:
                    name = f"__mx{len(synth)}"
                    synth[name] = row_expr
                out.append(f"LAST({sym}.{name}) AS {alias}")
                continue
        out.append(it)
    return ", ".join(out)


def _compile_define_python(
    cond: str, sym: str, symbols: set[str], columns=None, subsets=None
):
    """Compile an iterative DEFINE condition into a Python
    ``(row, ctx) -> bool | None`` predicate (the reference evaluates
    these as IterativeCondition code, MatchCodeGenerator.scala) — a
    recursive-descent parser producing closure ASTs with SQL
    THREE-VALUED LOGIC: a comparison against NULL (unbound navigation)
    is UNKNOWN, and ``UNKNOWN OR TRUE = TRUE`` / ``NOT UNKNOWN =
    UNKNOWN`` / etc. hold regardless of operand order, exactly as the
    reference's generated null checks behave.

    Supported surface: comparisons/arithmetic over ``S.col`` /
    ``FIRST|LAST(S.col[, n])`` / ``PREV(col[, n])`` / per-variable
    aggregates ``SUM|AVG|MIN|MAX|COUNT(S.col)`` and ``COUNT(S.*)``
    (MatchCodeGenerator.scala:42-69 parity, RUNNING semantics) / bare
    columns / literals, AND/OR/NOT, IS [NOT] NULL, parentheses.
    Cross-symbol ``A.col`` means ``LAST(A.col)`` per the SQL standard;
    symbol positions also accept SUBSET union variables.  Anything
    else raises readably instead of mis-evaluating.  The NFA gate
    (Stage.accepts) treats a final UNKNOWN as reject, per the standard.
    """
    subsets = subsets or {}

    def resolve(s: str):
        # a SUBSET union variable navigates/aggregates over the merged
        # rows of its component symbols
        return subsets[s] if s in subsets else s

    toks = _tokenize_define(cond)
    i = [0]

    def peek():
        return toks[i[0]] if i[0] < len(toks) else (None, None)

    def peek_word(*words):
        k, p = peek()
        return k == "word" and p.lower() in words

    def take():
        t = toks[i[0]]
        i[0] += 1
        return t

    def expect_op(op):
        k, p = peek()
        if k == "op" and p == op:
            take()
            return
        raise NotImplementedError(
            f"MATCH_RECOGNIZE DEFINE: expected {op!r} near token {p!r} in {cond!r}"
        )

    def primary():
        k, p = peek()
        if k == "op" and p == "(":
            take()
            e = or_expr()
            expect_op(")")
            return e
        if k == "op" and p == "-":
            take()
            inner = primary()
            return lambda row, ctx: (
                None if (v := inner(row, ctx)) is None else -v
            )
        if k == "lit":
            take()
            return lambda row, ctx, v=p: v
        if k == "nav":
            take()
            kind, nsym, ncol, off = p
            if nsym not in symbols and nsym not in subsets:
                raise NotImplementedError(
                    f"MATCH_RECOGNIZE DEFINE: {kind.upper()}({nsym}.{ncol}) "
                    f"references unknown symbol {nsym!r}"
                )
            nres = resolve(nsym)
            return lambda row, ctx: _nav(ctx, row, kind, nres, ncol, off, sym)
        if k == "agg":
            take()
            kind, asym, acol = p
            if asym not in symbols and asym not in subsets:
                raise NotImplementedError(
                    f"MATCH_RECOGNIZE DEFINE: {kind.upper()}({asym}.{acol or '*'}) "
                    f"references unknown symbol {asym!r}"
                )
            if acol is None and kind != "count":
                raise NotImplementedError(
                    f"MATCH_RECOGNIZE DEFINE: {kind.upper()}({asym}.*) — "
                    "only COUNT takes the .* argument"
                )
            ares = resolve(asym)
            return lambda row, ctx: _agg_match(ctx, row, kind, ares, acol, sym)
        if k == "prev":
            take()
            pcol, poff = p
            return lambda row, ctx: ctx.prev(pcol, poff)
        if k == "qual":
            take()
            qsym, qcol = p
            if qsym in subsets:
                qres = resolve(qsym)
                return lambda row, ctx: _nav(ctx, row, "last", qres, qcol, 0, sym)
            if qsym == sym or qsym not in symbols:
                return lambda row, ctx: row.get(qcol)
            # SQL standard: a cross-symbol reference navigates to the
            # symbol's LAST bound row
            return lambda row, ctx: _nav(ctx, row, "last", qsym, qcol, 0, sym)
        if k == "word":
            lw = p.lower()
            if lw == "true":
                take()
                return lambda row, ctx: True
            if lw == "false":
                take()
                return lambda row, ctx: False
            if lw == "null":
                take()
                return lambda row, ctx: None
            if lw in ("and", "or", "not", "is"):
                raise NotImplementedError(
                    f"MATCH_RECOGNIZE DEFINE: misplaced {p!r} in {cond!r}"
                )
            if columns is not None and p not in columns:
                raise NotImplementedError(
                    f"MATCH_RECOGNIZE DEFINE: {p!r} in iterative condition "
                    f"{cond!r} is neither a column nor a supported keyword "
                    "(supported: comparisons/arithmetic, AND/OR/NOT, "
                    "IS [NOT] NULL, FIRST/LAST/PREV navigation)"
                )
            take()
            return lambda row, ctx: row.get(p)
        raise NotImplementedError(
            f"MATCH_RECOGNIZE DEFINE: unexpected end/token {p!r} in {cond!r}"
        )

    def binary(sub, ops):
        def parse():
            left = sub()
            while True:
                k, p = peek()
                if k == "op" and p in ops:
                    take()
                    fn = ops[p]
                    lhs, rhs = left, sub()
                    left = (
                        lambda row, ctx, lhs=lhs, rhs=rhs, fn=fn: None
                        if (a := lhs(row, ctx)) is None
                        or (b := rhs(row, ctx)) is None
                        else fn(a, b)
                    )
                else:
                    return left
        return parse

    mul_expr = binary(primary, _MUL_OPS)
    add_expr = binary(mul_expr, _ADD_OPS)

    def cmp_expr():
        left = add_expr()
        k, p = peek()
        if k == "word" and p.lower() == "is":
            take()
            negate = False
            if peek_word("not"):
                take()
                negate = True
            if not peek_word("null"):
                raise NotImplementedError(
                    f"MATCH_RECOGNIZE DEFINE: IS must be followed by [NOT] NULL in {cond!r}"
                )
            take()
            return lambda row, ctx: (left(row, ctx) is None) != negate
        if k == "op" and p in _CMP_OPS:
            take()
            fn = _CMP_OPS[p]
            rhs = add_expr()
            # comparison against NULL is UNKNOWN (None), never an error
            return (
                lambda row, ctx: None
                if (a := left(row, ctx)) is None or (b := rhs(row, ctx)) is None
                else bool(fn(a, b))
            )
        return left

    def not_expr():
        if peek_word("not"):
            take()
            inner = not_expr()
            return lambda row, ctx: (
                None if (v := inner(row, ctx)) is None else not v
            )
        return cmp_expr()

    def and_expr():
        left = not_expr()
        while peek_word("and"):
            take()
            lhs, rhs = left, not_expr()

            def _and(row, ctx, lhs=lhs, rhs=rhs):
                a = lhs(row, ctx)
                if a is False:
                    return False
                b = rhs(row, ctx)
                if b is False:
                    return False
                return None if a is None or b is None else True

            left = _and
        return left

    def or_expr():
        left = and_expr()
        while peek_word("or"):
            take()
            lhs, rhs = left, and_expr()

            def _or(row, ctx, lhs=lhs, rhs=rhs):
                a = lhs(row, ctx)
                if a is True:
                    return True
                b = rhs(row, ctx)
                if b is True:
                    return True
                return None if a is None or b is None else False

            left = _or
        return left

    root = or_expr()
    if i[0] != len(toks):
        raise NotImplementedError(
            f"MATCH_RECOGNIZE DEFINE: trailing tokens {toks[i[0]:]} in {cond!r}"
        )
    return root


def match_recognize(
    df: DataFrame, clause: str, watermark_delay: str = "10 minutes"
) -> DataFrame:
    """Run ``MATCH_RECOGNIZE (<clause>)`` over a DataFrame.

    ``PATTERN (...) WITHIN <interval>`` bounds a match's first-to-last
    event time, exactly the Pattern DSL's ``within`` (reference:
    DataStreamMatch.scala:100-118 translateTimeBound -> Pattern.within).

    A STREAMING ``df`` routes to the streaming CEP matcher
    (cep/streaming.py) — the reference's MATCH_RECOGNIZE is natively a
    DataStream operator — and returns an append-mode stream of one row
    per match as matches stabilize behind the watermark
    (``watermark_delay`` on the ORDER BY time column).  Streaming mode
    REQUIRES a WITHIN bound (unbounded patterns would keep unbounded
    state, the same constraint Flink's CEP enforces) and supports ONE
    ROW PER MATCH only.
    """
    # PARTITION BY is optional in the reference (non-keyed CEP —
    # MatchRecognizeITCase orders globally); a global pattern runs as
    # one synthetic partition.  Scale note: like the reference's
    # non-keyed CEP operator, a global pattern is inherently
    # single-task — partition when the data allows it.
    partition = _parse_clause(clause, r"PARTITION\s+BY", required=False)
    _global = partition is None
    if _global:
        partition = "__mr_part"
        df = df.withColumn(partition, F.lit(0))
    order = _parse_clause(clause, r"ORDER\s+BY")
    measures_txt = _parse_clause(clause, "MEASURES")
    # the lookaheads keep keyword-shaped aliases (e.g. "AS pattern")
    # from being mistaken for the clause keywords
    pattern_txt = _parse_clause(clause, r"PATTERN(?=\s*\()")
    define_txt = _parse_clause(clause, r"DEFINE(?=\s+\w+\s+AS\b)")

    # -- PATTERN (...) WITHIN <interval> ------------------------------
    within_secs = None
    wm = re.search(r"\bWITHIN\b", pattern_txt, re.IGNORECASE)
    if wm:
        within_secs = _parse_sql_interval(pattern_txt[wm.end():])
        pattern_txt = pattern_txt[: wm.start()].strip()
    skip_txt = _parse_clause(clause, r"AFTER\s+MATCH", required=False) or "SKIP PAST LAST ROW"
    all_rows = re.search(r"ALL\s+ROWS\s+PER\s+MATCH", clause, re.IGNORECASE) is not None

    # ORDER BY <time_col>[, <tiebreak>...] — ALL extra columns break ties
    # so the row sequence the NFA sees is deterministic under equal
    # timestamps (previously only the first tiebreak was honored)
    order_cols = [c.strip() for c in order.split(",")]
    order, tiebreak = order_cols[0], (order_cols[1:] or None)

    # -- PATTERN first: its symbols scope the DEFINE prefix rewrite ---
    parsed = _parse_pattern(pattern_txt)

    # -- DEFINE -> boolean columns (JVM-side) -------------------------
    raw_defines: dict[str, str] = {}
    for item in _split_top_level(define_txt):
        m = re.match(r"(\w+)\s+AS\s+(.*)", item, re.IGNORECASE | re.DOTALL)
        if not m:
            raise ValueError(f"bad DEFINE item: {item!r}")
        raw_defines[m.group(1)] = m.group(2).strip()
    symbols = set(raw_defines) | set(_pattern_symbols(parsed))

    # -- SUBSET U = (A, B): union variables over component symbols ----
    # (DataStreamMatch.scala:38 carries ``subsets`` from the parsed
    # MatchRecognize RelNode into codegen; navigation/aggregates over a
    # union variable see the merged rows of its components)
    subsets: dict[str, frozenset[str]] = {}
    # the lookahead keeps an alias/identifier named "subset" from being
    # mistaken for the clause keyword
    subset_txt = _parse_clause(clause, r"SUBSET(?=\s+\w+\s*=)", required=False)
    if subset_txt:
        for item in _split_top_level(subset_txt):
            m = re.match(r"(\w+)\s*=\s*\(([^()]*)\)\s*$", item.strip())
            if not m:
                raise ValueError(f"bad SUBSET item: {item!r}")
            name = m.group(1)
            comps = [c.strip() for c in m.group(2).split(",") if c.strip()]
            if name in symbols:
                raise ValueError(
                    f"SUBSET variable {name!r} collides with a pattern symbol"
                )
            unknown = [c for c in comps if c not in symbols]
            if unknown or not comps:
                raise ValueError(
                    f"SUBSET {name} = ({', '.join(comps)}): components must "
                    f"be pattern symbols; unknown: {unknown}"
                )
            subsets[name] = frozenset(comps)

    # -- expression pre-lowering --------------------------------------
    # Navigation/aggregates over EXPRESSIONS — FIRST(DOWN.price +
    # DOWN.tax + 1), SUM(B.price * B.rate), SUM(price * weight) with
    # the defining symbol implied (MatchRecognizeITCase
    # testLogicalOffsets/testAggregates) — lower to synthetic ROW-LOCAL
    # columns computed once on the input (plain Catalyst projection,
    # WSCG) and plain SYM.col references, so the NFA/measure machinery
    # only ever sees column arguments.
    synth: dict[str, str] = {}
    raw_defines = {
        sym: _lower_expr_args(cond, symbols, sym, synth)
        for sym, cond in raw_defines.items()
    }
    measures_txt = _lower_expr_args(measures_txt, symbols, None, synth)
    measures_txt = _lower_bare_expr_measures(measures_txt, symbols, synth)
    for cname, expr_s in synth.items():
        df = df.withColumn(cname, F.expr(expr_s))

    # row-local conditions evaluate JVM-side as boolean columns (one
    # F.expr each — whole-stage codegen); conditions that NAVIGATE
    # (FIRST/LAST or a cross-symbol reference) or AGGREGATE over a
    # pattern variable depend on the current partial match and run as
    # iterative Python predicates inside the NFA, exactly the
    # reference's IterativeCondition split
    defines: dict[str, str] = {}
    iter_defines: dict = {}
    symbols_ext = symbols | set(subsets)
    for sym, cond in raw_defines.items():
        if _needs_iterative(cond, sym, symbols_ext):
            iter_defines[sym] = _compile_define_python(
                cond, sym, symbols, columns=set(df.columns), subsets=subsets
            )
        else:
            defines[sym] = _strip_symbol_prefixes(cond, symbols)

    # -- MEASURES -----------------------------------------------------
    measures: list[_Measure] = []
    for item in _split_top_level(measures_txt):
        m = _MEASURE_RE.fullmatch(item.strip())
        if not m:
            raise NotImplementedError(
                f"unsupported MEASURES item: {item!r}; supported: "
                "[RUNNING|FINAL] FIRST/LAST/COUNT/SUM/AVG/MIN/MAX(S.col) "
                "(COUNT also takes S.*), S.col, each AS alias"
            )
        if m.group("noarg"):
            # MATCH_NUMBER(): 1-based per-partition match ordinal in scan
            # order; CLASSIFIER(): the (last) matched row's variable —
            # documented superset where the reference planner rejects
            kind, sym, col = m.group("noarg").lower(), None, None
        elif m.group("nav"):
            kind = m.group("nav").lower()
            sym, col = m.group("sym1"), m.group("col1")
            col = None if col == "*" else col
            if col is None and kind != "count":
                raise NotImplementedError(
                    f"unsupported MEASURES item: {item!r} — only COUNT "
                    "takes the .* argument"
                )
        elif m.group("nav3"):
            # universal: navigate/aggregate over ALL rows of the match
            kind, sym, col = m.group("nav3").lower(), None, m.group("col3")
        else:
            # bare `SYM.col` resolves as the variable's LAST row (SQL
            # FINAL semantics; MatchCodeGenerator.scala defaults
            # first=false) — consistent with the bare-expression
            # lowering in _lower_bare_expr_measures
            kind, sym, col = "last", m.group("sym2"), m.group("col2")
        if kind not in ("match_number", "classifier", "match_rowtime") \
                and sym is not None and sym not in symbols and sym not in subsets:
            raise ValueError(
                f"MEASURES item {item!r} references unknown symbol {sym!r}"
            )
        running = (m.group("sem") or "").upper() == "RUNNING"
        measures.append(_Measure(kind, sym, col, m.group("alias"), running))

    # -- PATTERN -> Pattern (strict contiguity, per SQL standard) -----
    # quantified groups become GROUP stages (GroupPattern machinery in
    # the NFA) whose occurrences are complete sub-sequence matches,
    # strictly contiguous like every other MR position
    for sym in _pattern_symbols(parsed):
        if sym not in defines and sym not in iter_defines:
            defines[sym] = "true"  # undefined symbol matches any row
    grp_counter = iter(range(10**6))

    def build_stages(nodes) -> list[Stage]:
        out = []
        for idx, node in enumerate(nodes):
            contiguity = "begin" if idx == 0 else "next"
            if node[0] == "sym":
                _, sym, lo, hi, greedy = node
                out.append(
                    Stage(
                        name=sym,
                        contiguity=contiguity,
                        predicates=(
                            (lambda row, s=sym: bool(row[f"__def_{s}"]),)
                            if sym in defines
                            else ()
                        ),
                        iter_predicates=(
                            (iter_defines[sym],) if sym in iter_defines else ()
                        ),
                        times_min=lo,
                        times_max=hi,
                        optional=(lo == 0),
                        greedy=greedy,
                        strict_iter=True,
                    )
                )
            else:
                _, inner, lo, hi, greedy = node
                out.append(
                    Stage(
                        name=f"__grp{next(grp_counter)}",
                        contiguity=contiguity,
                        group=tuple(build_stages(inner)),
                        times_min=lo,
                        times_max=hi,
                        optional=(lo == 0),
                        greedy=greedy,
                        strict_iter=True,
                    )
                )
        return out

    stages = build_stages(parsed)
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
    if within_secs is not None:
        pattern = pattern.within(f"{within_secs} seconds")

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

    if df.isStreaming:
        # ---- streaming dispatch (DataStreamMatch is a stream operator
        # in the reference) — the measures fold to one row per match
        # inside the stateful function, so no downstream streaming agg
        if all_rows:
            raise NotImplementedError(
                "MATCH_RECOGNIZE: ALL ROWS PER MATCH is not supported on a "
                "streaming source (batch only)"
            )
        if pattern.within_seconds is None:
            raise ValueError(
                "streaming MATCH_RECOGNIZE requires PATTERN (...) WITHIN "
                "<interval> — unbounded patterns would keep unbounded state "
                "(the same constraint Flink's CEP enforces)"
            )
        from flink_1_8_sourcecode_spark.cep.streaming import match_pattern_stream

        def _mtype(ms: _Measure) -> str:
            if ms.kind == "match_number":
                raise NotImplementedError(
                    "MATCH_NUMBER() is not supported on a streaming "
                    "source (per-key match ordinals live in the batch "
                    "matcher's scan; use the batch path)"
                )
            if ms.kind == "classifier":
                return "string"
            if ms.kind == "match_rowtime":
                return work.schema[order].dataType.simpleString()
            if ms.kind == "count":
                return "int"  # batch path uses F.size -> int
            if ms.kind in ("sum", "avg"):
                return "double"  # batch path folds into a double
            return work.schema[ms.col].dataType.simpleString()

        reduced_schema = ", ".join(
            [f"{partition} {df.schema[partition].dataType.simpleString()}"]
            + [f"{ms.alias} {_mtype(ms)}" for ms in measures]
        )

        def reduce_match(kval, mrows):
            rec = {partition: kval}
            for ms in measures:
                if ms.kind == "classifier":
                    rec[ms.alias] = mrows[-1]["__stage"] if mrows else None
                    continue
                if ms.kind == "match_rowtime":
                    rec[ms.alias] = mrows[-1][order] if mrows else None
                    continue
                if ms.symbol is None:
                    # universal (symbol-less) measure: all rows of the
                    # match — mirrors the batch path at measure_expr
                    sub = mrows
                else:
                    comps = subsets.get(ms.symbol, (ms.symbol,))
                    sub = [r for r in mrows if r["__stage"] in comps]
                if ms.kind == "count" and ms.col is None:
                    rec[ms.alias] = len(sub)
                elif ms.kind == "first":
                    rec[ms.alias] = sub[0][ms.col] if sub else None
                elif ms.kind == "last":
                    rec[ms.alias] = sub[-1][ms.col] if sub else None
                else:
                    vals = [r[ms.col] for r in sub if r[ms.col] is not None]
                    if ms.kind == "count":
                        rec[ms.alias] = len(vals)
                    elif not vals:
                        rec[ms.alias] = None
                    elif ms.kind == "sum":
                        rec[ms.alias] = float(sum(vals))
                    elif ms.kind == "avg":
                        rec[ms.alias] = float(sum(vals)) / len(vals)
                    else:
                        rec[ms.alias] = min(vals) if ms.kind == "min" else max(vals)
            return rec

        out_stream = match_pattern_stream(
            work,
            pattern,
            key=partition,
            time_col=order,
            select_cols=needed,
            watermark_delay=watermark_delay,
            tiebreak=tiebreak,
            match_reducer=reduce_match,
            reduced_schema=reduced_schema,
        )
        # a synthetic global-pattern partition key must not leak to
        # callers (the batch branches drop it the same way below)
        return out_stream.drop(partition) if _global else out_stream

    matches = match_pattern(
        work, pattern, key=partition, time_col=order, select_cols=needed,
        tiebreak=tiebreak,
    )

    # -- measures: sorted-collect per match, pure Column expressions --
    struct_cols = sorted(measure_cols | {order}) if all_rows else needed
    arr_of = F.collect_list(F.struct("seq", "stage", *struct_cols))

    def stage_filter(sym: str):
        # closure factory — a default-arg lambda would change the HOF arity
        comps = subsets.get(sym)
        if comps:
            in_list = sorted(comps)
            return lambda x: x["stage"].isin(in_list)
        return lambda x: x["stage"] == sym

    def field_of(col: str):
        return lambda x: x[col]

    def field_not_null(col: str):
        return lambda x: x[col].isNotNull()

    def measure_expr(arr, ms: _Measure):
        """One measure over a sorted array of match-row structs — pure
        Column HOFs, so aggregates run JVM-side per match with no extra
        exchange (the reference code-generates the same per-variable
        folds, MatchCodeGenerator.scala:42-69)."""
        if ms.kind == "match_number":
            # match_id is a grouping column in ONE ROW mode and a plain
            # column in ALL ROWS mode — legal in both select contexts
            return (F.col("match_id") + 1).alias(ms.alias)
        if ms.kind == "classifier":
            return F.element_at(arr, -1)["stage"].alias(ms.alias)
        if ms.kind == "match_rowtime":
            # the rowtime of the match's last row (Flink 1.8's
            # MATCH_ROWTIME(), the event-time attribute the planner
            # carries downstream for subsequent time-based operators)
            return F.element_at(arr, -1)[order].alias(ms.alias)
        # symbol None = universal (all rows of the match)
        sub = arr if ms.symbol is None else F.filter(arr, stage_filter(ms.symbol))
        if ms.kind == "count":
            if ms.col is None:
                return F.size(sub).alias(ms.alias)
            return F.size(F.filter(sub, field_not_null(ms.col))).alias(ms.alias)
        if ms.kind == "first":
            return sub[0][ms.col].alias(ms.alias)
        if ms.kind == "last":
            return F.element_at(sub, -1)[ms.col].alias(ms.alias)
        # SQL aggregate semantics: NULLs ignored, empty/all-NULL -> NULL
        vals = F.filter(F.transform(sub, field_of(ms.col)), lambda v: v.isNotNull())
        if ms.kind == "min":
            return F.array_min(vals).alias(ms.alias)
        if ms.kind == "max":
            return F.array_max(vals).alias(ms.alias)
        total = F.when(
            F.size(vals) > 0,
            F.aggregate(vals, F.lit(0.0), lambda a, v: a + v.cast("double")),
        )
        if ms.kind == "sum":
            return total.alias(ms.alias)
        return (total / F.size(vals)).alias(ms.alias)  # avg

    def measure_exprs(arr):
        return [measure_expr(arr, ms) for ms in measures]

    if all_rows:
        # one row per matched event: input columns + CLASSIFIER() +
        # measures over a per-match window (one exchange on (partition,
        # match_id); no extra join).  FINAL measures (default) see the
        # whole match; RUNNING measures (SQL-standard per-row semantics,
        # `RUNNING LAST(S.x)`) see only rows up to the current seq —
        # the same sorted-collect over a running frame, no second
        # exchange (both windows share the partition keys).
        from pyspark.sql import Window

        wm = Window.partitionBy(partition, "match_id")
        wm_run = wm.orderBy("seq").rowsBetween(Window.unboundedPreceding, 0)
        arr = F.array_sort(arr_of.over(wm))
        arr_run = F.array_sort(arr_of.over(wm_run))

        def per_measure():
            return [
                measure_expr(arr_run if ms.running else arr, ms)
                for ms in measures
            ]

        out_all = matches.select(
            partition,
            *needed,
            F.col("stage").alias("classifier"),
            *per_measure(),
        )
        return out_all.drop(partition) if _global else out_all
    out_one = (
        matches.groupBy(F.col(partition), F.col("match_id"))
        .agg(*measure_exprs(F.array_sort(arr_of)))
        .drop("match_id")
    )
    return out_one.drop(partition) if _global else out_one
