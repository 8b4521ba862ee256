"""NFA-style pattern matcher over keyed, time-ordered event groups.

Reference parity: flink-cep's NFA (flink-libraries/flink-cep/.../nfa/
NFA.java:85 — shared buffer + versioned runs) and the per-key execution
model of CepOperator.  Our engine runs a backtracking interpreter over
each key's time-sorted pandas group inside ``applyInPandas``:

- the pattern spec is pickled with the UDF closure (pattern-as-data);
- per key, rows sort by (time, tiebreak) and the matcher scans starts;
- backtracking explores quantifier counts (greedy prefers longest,
  non-greedy shortest) and followed_by_any branches; followed_by /
  next commit to the first (shortest) viable branch like Flink;
- ``within`` prunes every branch whose span exceeds the bound;
- after-match skip 'skip_past_last' advances the scan past the last
  matched event; 'no_skip' tries every start.

Scale: state is one key-group in memory at a time — the same bound as
Flink's keyed NFA state; keys shard across executors via the groupBy
shuffle.  (Streaming form: same matcher inside applyInPandasWithState,
buffering rows until the watermark passes — planned, SURVEY §7 phase 6.)
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.cep.pattern import MatchContext, Pattern, Stage

MATCH_SCHEMA_SUFFIX = "match_id long, stage string, seq int"


def _collect_scalar_stages(stages):
    """All non-group stages of a pattern tree (group members included)."""
    for st in stages:
        if st.group is not None:
            yield from _collect_scalar_stages(st.group)
        else:
            yield st


def _build_masks(rows: list[dict[str, Any]], pattern: Pattern):
    """Vectorized predicate pre-pass (r17, guide §4): evaluate every
    ROW-LOCAL stage predicate once per row up front and hand the NFA
    boolean arrays, so the backtracking scan (which revisits rows once
    per candidate anchor — O(n^2) predicate calls on relaxed-contiguity
    patterns) does mask lookups instead of Python predicate calls.
    Stages with iterative conditions see the partial match and stay on
    the per-call path.  Returns (accept_masks, until_masks) keyed by
    Stage."""
    import numpy as np

    n = len(rows)
    accept: dict[Stage, Any] = {}
    until: dict[Stage, Any] = {}
    for st in _collect_scalar_stages(pattern.stages):
        if not st.iter_predicates and st not in accept:
            accept[st] = np.fromiter(
                (st.accepts(r) for r in rows), dtype=bool, count=n
            )
        if st.until_predicates and st not in until:
            until[st] = np.fromiter(
                (any(p(r) for p in st.until_predicates) for r in rows),
                dtype=bool,
                count=n,
            )
    return accept, until


def _find_matches(
    rows: list[dict[str, Any]],
    times: list[float],
    pattern: Pattern,
    max_start_time: float | None = None,
    anchor: int | None = None,
    emit_timeouts: bool = False,
    accept_masks: dict | None = None,
    until_masks: dict | None = None,
):
    """Yield matches as lists of (stage_name, row_index); with
    ``emit_timeouts`` yield ``(bindings, is_timeout)`` tuples instead.

    ``max_start_time`` bounds which rows may START a match — the
    streaming path only tries starts whose full window has passed the
    watermark (stable starts), leaving later ones for the next batch.

    ``anchor`` restricts the scan to a single start row (used
    internally for partial-prefix discovery).

    Timeout side channel (PatternStream.select(timeoutTag, ...) parity,
    flink-libraries/flink-cep/.../PatternStream.java): when the pattern
    has ``within`` and a start row opens a partial match that never
    completes, the longest bound stage-prefix is emitted with
    ``is_timeout=True``.  On bounded input the end-of-data watermark is
    +inf, so every incomplete partial has, by then, timed out — same as
    Flink's behavior when a bounded stream closes.
    """
    stages = pattern.stages
    n = len(rows)
    amask = accept_masks or {}
    umask = until_masks or {}

    def stage_occurrences(
        stages, si: int, start_i: int, first_time: float | None, outer=()
    ):
        """Yield (bindings, next_index) for stage si of ``stages``
        beginning search at start_i. bindings = list of (stage_name,
        row_index).  ``outer`` is the live binding list of the enclosing
        partial match — the context iterative conditions
        (IterativeCondition.java) see.  ``stages`` is a parameter (not
        the pattern's top-level tuple) so GROUP stages can recurse into
        their nested sequences."""
        st: Stage = stages[si]
        needs_ctx = bool(st.iter_predicates)

        def within_ok(i: int, acc: list[int]) -> bool:
            if pattern.within_seconds is None:
                return True
            # The clock starts at the match's first bound event — which may
            # be inside THIS stage's own run (e.g. times(n) on begin).
            ft = first_time if first_time is not None else (times[acc[0]] if acc else None)
            return ft is None or times[i] - ft <= pattern.within_seconds

        if st.negative:
            # Negative stage: guard the gap between previous match end and
            # the next positive stage's match; handled by caller via
            # _negative_ok — never yields bindings of its own.
            raise AssertionError("negative stages are inlined, not matched")

        if st.group is not None:
            # GROUP stage (GroupPattern.java): one occurrence = a complete
            # match of the nested stage sequence, anchored at a candidate
            # row; quantifiers count sequence-matches.  Each occurrence
            # commits to the FIRST complete alternative at the earliest
            # viable anchor (the same first-match commitment scalar
            # stages make per occurrence); 'followed_by_any' additionally
            # branches on later anchors.  Inner stage names label the
            # bound events, so measures/selects see A/B, not the group.
            def runs_group(j: int, count: int, acc):
                # acc: list of (name, idx) for this stage's occurrences
                if count >= st.times_min or (
                    count == 0 and st.optional and st.times_min > 0
                ):
                    yield list(acc)
                if st.times_max is not None and count >= st.times_max:
                    return
                jj = j
                while jj < n:
                    if not within_ok(jj, [idx for _, idx in acc]):
                        return
                    ft = first_time
                    if ft is None and acc:
                        ft = times[acc[0][1]]
                    prefix = list(outer) + acc
                    # EVERY inner alternative at this anchor is explored
                    # (a greedy variable-length inner match must not
                    # steal rows a later occurrence needs — committing
                    # to the first alternative silently dropped matches
                    # like (A+){2} over [a, a]); the scan still commits
                    # to the first VIABLE anchor like scalar stages,
                    # with followed_by_any branching on later anchors.
                    matched_any = False
                    for delta in seq_matches(st.group, jj, ft, prefix):
                        if not delta:  # empty sub-matches are not occurrences
                            continue
                        matched_any = True
                        acc.extend(delta)
                        nxt = max(idx for _, idx in delta) + 1
                        yield from runs_group(nxt, count + 1, acc)
                        del acc[len(acc) - len(delta):]
                    if matched_any:
                        if st.contiguity != "followed_by_any":
                            return
                    else:
                        if count == 0 and st.contiguity in ("begin", "next"):
                            return  # first occurrence must anchor at start
                        if count > 0 and st.strict_iter:
                            return  # consecutive(): run broken
                    jj += 1

            order = []
            seen_runs = set()
            for occ in runs_group(start_i, 0, []):
                key = tuple(occ)
                if key not in seen_runs:  # different occurrence splits can
                    seen_runs.add(key)    # reach identical binding lists
                    order.append(occ)
            order.sort(key=len, reverse=st.greedy)
            for occ in order:
                nxt = (max(idx for _, idx in occ) + 1) if occ else start_i
                yield occ, nxt
            return

        # Enumerate candidate runs of occurrences (times_min..times_max).
        # Contiguity rules (Flink defaults): 'begin'/'next' constrain only
        # the FIRST occurrence's position; iterations of a quantifier are
        # relaxed (non-matching events may sit between occurrences).
        # 'followed_by_any' additionally branches on alternative positions
        # for each occurrence; the others commit to the first qualifying.
        def runs(i: int, count: int, acc: list[int]):
            # optional() permits the empty run even when times_min > 0
            # (Pattern.java:332 — optional is orthogonal to the quantifier)
            if count >= st.times_min or (count == 0 and st.optional and st.times_min > 0):
                yield list(acc)
            if st.times_max is not None and count >= st.times_max:
                return
            j = i
            while j < n:
                if not within_ok(j, acc):
                    return
                # Pattern.until stop condition: the loop stops expanding
                # at the first matching event; runs already yielded
                # (count >= times_min) stand, the stop event is not
                # consumed (Pattern.java:219 semantics)
                if st.until_predicates and (
                    umask[st][j]
                    if st in umask
                    else any(p(rows[j]) for p in st.until_predicates)
                ):
                    return
                if needs_ctx:
                    ctx = MatchContext(
                        rows, list(outer) + [(st.name, x) for x in acc], cur=j
                    )
                    ok = st.accepts(rows[j], ctx)
                else:
                    ok = amask[st][j] if st in amask else st.accepts(rows[j])
                if ok:
                    acc.append(j)
                    yield from runs(j + 1, count + 1, acc)
                    acc.pop()
                    if st.contiguity == "followed_by_any":
                        j += 1  # branch: also try a later occurrence
                        continue
                    return  # commit to the first qualifying occurrence
                if count == 0 and st.contiguity in ("begin", "next"):
                    return  # first occurrence must sit exactly at start
                if count > 0 and st.strict_iter:
                    return  # consecutive() / MATCH_RECOGNIZE: run broken
                j += 1  # relaxed: scan past non-matching events

        order = []
        for occ in runs(start_i, 0, []):
            order.append(occ)
        # greedy prefers longest run first; default shortest-first (Flink
        # non-greedy quantifier behavior).
        order.sort(key=len, reverse=st.greedy)
        for occ in order:
            nxt = (occ[-1] + 1) if occ else start_i
            yield [(st.name, i) for i in occ], nxt

    def negative_ok(st: Stage, lo: int, hi: int, outer=()) -> bool:
        """No row in [lo, hi) satisfies the negative predicate."""
        if st.contiguity == "next":
            rng = range(lo, min(lo + 1, hi))
        else:
            rng = range(lo, hi)
        if st.iter_predicates:
            return not any(
                st.accepts(rows[i], MatchContext(rows, list(outer), cur=i))
                for i in rng
            )
        if st in amask:
            m = amask[st]
            return not m[rng.start:rng.stop].any() if len(rng) else True
        return not any(st.accepts(rows[i]) for i in rng)

    def backtrack(
        stages, si: int, start_i: int, first_time: float | None, acc,
        exhaustive: bool = False,
    ):
        # ``exhaustive`` disables the first-match commitment: a nested
        # GROUP sequence must surface EVERY complete alternative so the
        # enclosing quantifier can leave rows for later occurrences
        # (Flink's NFA branches the same way in its shared buffer); the
        # top-level pattern keeps the committed followedBy semantics.
        if si == len(stages):
            yield list(acc)
            return
        st = stages[si]
        if st.negative:
            # pair the negative stage with the following positive stage:
            # find the next stage's match, then check the gap.
            nxt_stage = si + 1
            for bindings, nxt_i in stage_occurrences(
                stages, nxt_stage, start_i, first_time, acc
            ):
                if not bindings and not stages[nxt_stage].optional:
                    continue
                gap_hi = bindings[0][1] if bindings else n
                if not negative_ok(st, start_i, gap_hi, acc):
                    continue
                ft = first_time if first_time is not None else (
                    times[bindings[0][1]] if bindings else None
                )
                acc.extend(bindings)
                yield from backtrack(
                    stages, nxt_stage + 1, nxt_i, ft, acc, exhaustive
                )
                for _ in bindings:
                    acc.pop()
                if not exhaustive and (st.contiguity == "followed_by" or bindings):
                    if not stages[nxt_stage].contiguity == "followed_by_any":
                        return
            return
        committed = st.contiguity in ("begin", "next", "followed_by")
        for bindings, nxt_i in stage_occurrences(stages, si, start_i, first_time, acc):
            if not bindings and not st.optional and st.times_min > 0:
                continue
            ft = first_time
            if ft is None and bindings:
                ft = times[bindings[0][1]]
            acc.extend(bindings)
            matched_any = False
            for m in backtrack(stages, si + 1, nxt_i, ft, acc, exhaustive):
                matched_any = True
                yield m
            for _ in bindings:
                acc.pop()
            if committed and matched_any and not exhaustive:
                return  # first-match semantics for non-any contiguity

    def seq_matches(gstages, anchor: int, first_time: float | None, prefix):
        """Complete matches of the nested stage sequence ``gstages``
        anchored at ``anchor`` (its first stage is 'begin', so the first
        bound row sits exactly there), yielded as binding DELTAS — ALL
        alternatives, not just the first (see ``exhaustive``).
        ``prefix`` is the enclosing partial match's live binding list —
        nested iterative conditions see the whole partial match, exactly
        as Flink's shared NFA state does for group patterns."""
        acc = list(prefix)
        base = len(acc)
        for full in backtrack(gstages, 0, anchor, first_time, acc, True):
            yield full[base:]

    def prefix_partial(start_i: int):
        """Longest proper stage-prefix bound at start_i, plus the index
        of the first unbound stage."""
        from dataclasses import replace

        for k in range(len(stages) - 1, 0, -1):
            if stages[k - 1].negative:
                continue
            sub = replace(pattern, stages=pattern.stages[:k])
            for m in _find_matches(
                rows, times, sub, anchor=start_i,
                accept_masks=accept_masks, until_masks=until_masks,
            ):
                if m:
                    return m, k
        return None, None

    def timeout_attributable(prefix, k: int) -> bool:
        """True when the partial run was still alive when ``within``
        expired — Flink's NFA emits a timeout ONLY then.  A run pruned
        earlier (strict 'next' successor failing the predicate, or a
        notFollowedBy guard firing inside the window) is discarded
        silently (nfa/NFA.java run pruning), not reported on the
        timeout channel."""
        last = max(idx for _, idx in prefix)
        first_t = times[prefix[0][1]]

        def in_window(j: int) -> bool:
            return times[j] - first_t <= pattern.within_seconds

        si = k
        while si < len(stages) and stages[si].negative:
            neg = stages[si]
            j = last + 1
            hi = min(j + 1, n) if neg.contiguity == "next" else n
            needs_nctx = bool(neg.iter_predicates)
            while j < hi and in_window(j):
                if neg in amask:
                    hit = bool(amask[neg][j])
                else:
                    nctx = (
                        MatchContext(rows, list(prefix), cur=j)
                        if needs_nctx
                        else None
                    )
                    hit = neg.accepts(rows[j], nctx)
                if hit:
                    return False  # guard fired in-window: run killed
                j += 1
            si += 1
        if si < len(stages) and stages[si].contiguity == "next":
            # a GROUP successor has no predicates of its own — descend
            # to its first scalar stage (bailing out, i.e. keeping the
            # run alive, when that stage is optional/negative and the
            # cheap check cannot decide)
            succ = stages[si]
            while succ is not None:
                if succ.optional or succ.times_min == 0 or succ.negative:
                    succ = None  # cheap check cannot decide: keep alive
                    break
                if succ.group is None:
                    break
                succ = succ.group[0]
            j = last + 1
            if succ is not None and j < n and in_window(j):
                if succ in amask:
                    ok = bool(amask[succ][j])
                else:
                    sctx = (
                        MatchContext(rows, list(prefix), cur=j)
                        if succ.iter_predicates
                        else None
                    )
                    ok = succ.accepts(rows[j], sctx)
                if not ok:
                    return False  # strict successor broke the run pre-expiry
        return True

    def can_anchor(i: int) -> bool:
        """Cheap start gate: the first scalar stage must accept rows[i].
        Descends through group stages; bails to True whenever the stage
        under inspection (INCLUDING the outermost first stage) is
        optional/zero-min/negative — the anchor row may then bind to a
        later stage, so only the full backtrack can decide."""
        st = stages[0]
        while True:
            if st.optional or st.times_min == 0 or st.negative:
                return True
            if st.group is None:
                break
            st = st.group[0]
        if st in amask:
            return bool(amask[st][i])
        ctx0 = MatchContext(rows, [], cur=i) if st.iter_predicates else None
        return st.accepts(rows[i], ctx0)

    i = 0 if anchor is None else anchor
    while i < n:
        if max_start_time is not None and times[i] > max_start_time:
            return
        next_i = None  # scan-advance override from the after-match skip
        matched_here = False
        if can_anchor(i):
            for m in backtrack(stages, 0, i, None, []):
                matched_here = True
                yield (m, False) if emit_timeouts else m
                if m and next_i is None:
                    next_i = _after_match_pos(pattern, m, i)
                if next_i is not None:
                    # every later branch from this start is a partial that
                    # started before the pruning event — discarded
                    break
            if emit_timeouts and not matched_here and pattern.within_seconds is not None:
                partial, first_unbound = prefix_partial(i)
                if partial and timeout_attributable(partial, first_unbound):
                    yield partial, True
        if anchor is not None:
            return
        i = next_i if next_i is not None else i + 1


def _after_match_pos(pattern: Pattern, match, start_i: int) -> int | None:
    """Scan position after an emitted match, per AfterMatchSkipStrategy
    (nfa/aftermatch/): partial matches that started BEFORE the pruning
    event are discarded, so the scan resumes at it.  ``None`` = no
    pruning effect — NoSkip behavior: keep enumerating this start's
    remaining branches, then advance one event.

    - skip_past_last: pruning event is just past the match's last event
      (SkipPastLastStrategy).
    - skip_to_next: discards every partial that started WITH the same
      event (SkipToNextStrategy) — resume at the next event.
    - skip_to_first/skip_to_last: pruning event is the first/last event
      bound to ``pattern.skip_stage`` (SkipToFirstStrategy.getIndex=0 /
      SkipToLastStrategy.getIndex=size-1).  A miss (stage bound nothing)
      falls back to NoSkip, and a no-progress skip (pruning event == the
      match's own start) prunes nothing — unless ``skip_throw_on_miss``
      (throwExceptionOnMiss), which raises in both cases exactly like
      SkipToElementStrategy.getPruningId.
    """
    s = pattern.skip_strategy
    if s == "no_skip":
        return None
    if s == "skip_past_last":
        return max(idx for _, idx in match) + 1
    if s == "skip_to_next":
        return start_i + 1
    bound = [idx for name, idx in match if name == pattern.skip_stage]
    if not bound:
        if pattern.skip_throw_on_miss:
            raise ValueError(
                f"Could not skip to {pattern.skip_stage!r}: no such element "
                f"in the found match"
            )
        return None
    pos = bound[0] if s == "skip_to_first" else bound[-1]
    if pos <= min(idx for _, idx in match):
        if pattern.skip_throw_on_miss:
            raise ValueError("Could not skip to first element of a match")
        return None
    return pos


def match_pattern(
    df: DataFrame,
    pattern: Pattern,
    key: str,
    time_col: str,
    select_cols: list[str] | None = None,
    tiebreak: str | None = None,
    emit_timeouts: bool = False,
) -> DataFrame:
    """PatternStream.select analogue: returns one row per matched event,
    (key, match_id, stage, seq, <select_cols>), match_id numbered per key
    in scan order.

    With ``emit_timeouts=True`` (PatternStream.select(timeoutTag,
    timeoutFn, selectFn) parity) the output gains a ``timed_out``
    boolean column, and partial matches that exceeded ``within`` are
    emitted with their longest bound stage-prefix and
    ``timed_out=true`` — filter on the flag for the two channels.

    Dispatch (r17, guide §2.4/§4): keys co-locate via ONE hash
    repartition and rows sort (key, time, tiebreaks) INSIDE the JVM;
    the Python side then processes a whole partition per ``mapInPandas``
    call — group boundaries are array slices of the partition frame, row
    dicts and the row-local predicate masks (:func:`_build_masks`) are
    built once per partition, and one output frame is emitted per
    partition.  The previous ``groupBy(key).applyInPandas`` form paid a
    per-GROUP pandas sort + ``to_dict`` + output-frame construction
    (~4 ms x 1500 groups at sf0.1 = slower than single-threaded pandas)
    plus Spark's per-group Arrow dispatch.  Memory: one shuffle
    partition of events in Python at a time — size partitions via
    ``spark.sql.shuffle.partitions`` at scale (the reference's keyed NFA
    holds one key-group per operator instance the same way)."""
    pattern = pattern.validate()
    select_cols = select_cols or [time_col]
    key_field = df.schema[key]
    sel_schema = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in select_cols
    )
    timeout_schema = ", timed_out boolean" if emit_timeouts else ""
    out_schema = (
        f"{key} {key_field.dataType.simpleString()}, {MATCH_SCHEMA_SUFFIX}"
        f"{timeout_schema}, {sel_schema}"
    )
    # one or several tiebreak columns (ORDER BY t, c1, c2, ...)
    tb = [tiebreak] if isinstance(tiebreak, str) else list(tiebreak or [])
    sort_cols = [time_col] + tb
    out_cols = [key, "match_id", "stage", "seq"]
    if emit_timeouts:
        out_cols.append("timed_out")

    def run_partition(pdfs):
        import numpy as np

        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            return
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(
            chunks, ignore_index=True
        )
        n = len(pdf)
        times_all = (
            pdf[time_col].astype("datetime64[us]").astype("int64").to_numpy()
            / 1e6
        )
        # row dicts once per partition (same value types as the former
        # per-group to_dict("records"): Series.tolist() round-trips
        # datetimes as pd.Timestamp, ints/floats as Python scalars)
        names = list(pdf.columns)
        rows_all = [
            dict(zip(names, vals))
            for vals in zip(*(pdf[c].tolist() for c in names))
        ]
        amask_all, umask_all = _build_masks(rows_all, pattern)
        # group boundaries on the (key-sorted) partition; factorize
        # keeps every NULL key under one sentinel code, matching the
        # former groupBy(key)'s null-safe grouping
        codes, _ = pd.factorize(pdf[key], use_na_sentinel=True)
        starts = np.flatnonzero(np.diff(codes, prepend=codes[0] - 1))
        ends = np.append(starts[1:], n)
        key_vals = pdf[key].tolist()
        out = []
        for a, b in zip(starts, ends):
            rows = rows_all[a:b]
            times = times_all[a:b]
            amask = {st: m[a:b] for st, m in amask_all.items()}
            umask = {st: m[a:b] for st, m in umask_all.items()}
            found = _find_matches(
                rows, times, pattern, emit_timeouts=emit_timeouts,
                accept_masks=amask, until_masks=umask,
            )
            kv = key_vals[a]
            for match_id, item in enumerate(found):
                m, is_timeout = item if emit_timeouts else (item, False)
                for seq, (stage_name, ridx) in enumerate(m):
                    rec = [kv, match_id, stage_name, seq]
                    if emit_timeouts:
                        rec.append(is_timeout)
                    rec.extend(rows[ridx][c] for c in select_cols)
                    out.append(rec)
        if out:
            yield pd.DataFrame(out, columns=out_cols + select_cols)

    parted = df.repartition(F.col(key)).sortWithinPartitions(
        key, *sort_cols
    )
    return parted.mapInPandas(run_partition, out_schema)
