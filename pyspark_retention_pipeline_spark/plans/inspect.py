"""Helpers that read the formatted physical plan so tests can assert the
scale-critical properties — filter pushdown, column pruning, broadcast joins —
instead of hoping for them (the per-operator discipline mandated by the build
brief: ``.explain("formatted")`` and iterate until it's the plan you want).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters lists appearing in the plan's scan nodes."""
    plan = explain_str(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def scan_columns(df: DataFrame) -> list[list[str]]:
    """ReadSchema column lists per scan — for asserting column pruning."""
    plan = explain_str(df)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    return [
        [part.split(":")[0].strip() for part in s.split(",") if part.strip()] for s in schemas
    ]


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)


# Column-name prefixes identify which testdata table a scan reads; used to
# map hinted plan subtrees back to source tables.
_PREFIX_TO_TABLE = {
    "c_": "customer",
    "o_": "orders",
    "l_": "lineitem",
    "p_": "part",
    "s_": "supplier",
    "n_": "nation",
    "r_": "region",
}
_COLUMN_TO_TABLE = {
    "doc_id": "documents",
    "text": "documents",
    "embedding": "embeddings",
    "event_id": "events",
    "props": "events",
}

# Tables whose row count grows with SF — a *forced* broadcast of any of these
# is an OOM at scale; only AQE may choose to broadcast them (it checks size).
SCALING_TABLES = frozenset(
    {"customer", "orders", "lineitem", "part", "supplier", "documents", "embeddings", "events"}
)


# Grouping-key names whose value DOMAIN is bounded by construction, not by
# data volume: language codes, source labels, event types, partition ids
# (cluster parallelism, not corpus size), histogram band/bin labels. An
# aggregate keyed ONLY on these cannot outgrow its domain no matter the
# corpus size, so broadcasting its result is safe at any SF. Corpus-keyed
# grains (token, doc_id, vec_id, *_key columns) are deliberately ABSENT:
# Heaps' law puts a 100 TB vocab at 10⁸–10⁹ tokens — a token-grain
# aggregate broadcast FAILS at scale, it doesn't degrade (round-13 verdict:
# bm25_topk's df-side broadcast, the gap this set closes).
BOUNDED_GRAIN_KEYS = frozenset(
    {"lang", "source", "event_type", "_pid", "band", "bin", "qbin",
     # TPC-H spec enum: l_returnflag ∈ {A, N, R} — three values at any SF
     "l_returnflag"}
)


def _agg_grouping_names(node) -> set[str]:
    keys: set[str] = set()
    ge = node.groupingExpressions()
    for i in range(ge.size()):
        it = ge.apply(i).references().iterator()
        while it.hasNext():
            keys.add(it.next().name())
    return keys


def _dedup_key_names(node) -> set[str]:
    keys: set[str] = set()
    ks = node.keys()
    for i in range(ks.size()):
        it = ks.apply(i).references().iterator()
        while it.hasNext():
            keys.add(it.next().name())
    return keys


def _relation_table(node) -> str | None:
    """Map a relation leaf to a testdata table via its output columns."""
    try:
        attrs = node.output()
        for i in range(attrs.size()):
            col = attrs.apply(i).name()
            hit = _COLUMN_TO_TABLE.get(col) or _PREFIX_TO_TABLE.get(col[:2])
            if hit:
                return hit
    except Exception:
        return None
    return None


def _subtree_bounded(node) -> bool:
    """True when the subtree's row count is PROVABLY bounded regardless of
    corpus size: a global aggregate (≤1 row), an aggregate/dedup whose every
    grouping key has a construction-bounded domain (``BOUNDED_GRAIN_KEYS``),
    a GlobalLimit, a literal-bounded leaf, or a non-scaling dimension scan
    (nation/region). A CORPUS-KEYED aggregate (token/doc/vec/key grain) is
    bounded only if its own input is — the round-13 gap: the old blanket
    Aggregate exemption assumed all aggregates are small, which vocab-grain
    aggregates are not. A ``LogicalRDD`` (lazy localCheckpoint) hides its
    lineage, so nothing behind one is provable — those sites need a named,
    per-hint signature exemption in tests/test_plans.py."""
    name = node.getClass().getSimpleName()
    if name == "Generate":
        # A generator MULTIPLIES rows by its output size, so child-row
        # boundedness alone proves nothing: a keyless Aggregate is ≤1 row
        # but can carry a corpus-sized collect_list/collect_set array that
        # a Generate above it re-expands to corpus grain (round-14 ADVICE
        # item 2 — the same family as the removed blanket-Aggregate
        # exemption, one node further up). Provable only when the
        # generator's input is a plan-time literal (foldable) expression —
        # then the expansion factor is in the plan; anything else needs a
        # per-hint signature exemption. (The Generator trait hardcodes
        # foldable=false on the generator node itself, so foldability is
        # checked on its INPUT children — explode(array(lit...)) has a
        # foldable CreateArray child.)
        try:
            gen_kids = node.generator().children()
            if gen_kids.size() == 0 or not all(
                gen_kids.apply(i).foldable() for i in range(gen_kids.size())
            ):
                return False
        except Exception:
            return False
    elif name == "Aggregate":
        keys = _agg_grouping_names(node)
        if not keys or keys <= BOUNDED_GRAIN_KEYS:
            return True
    elif name == "Deduplicate":
        keys = _dedup_key_names(node)
        if not keys or keys <= BOUNDED_GRAIN_KEYS:
            return True
    elif name == "GlobalLimit":
        return True
    kids = node.children()
    if kids.size() == 0:
        if _literal_bounded_leaf(node):
            return True
        if "Relation" in name:
            table = _relation_table(node)
            return table is not None and table not in SCALING_TABLES
        return False
    return all(_subtree_bounded(kids.apply(i)) for i in range(kids.size()))


def _hint_signature(node) -> str:
    """Compact pre-order signature of a hinted subtree's bounding-relevant
    nodes — ``Filter[doc_id]>documents`` — so test exemptions pin the EXACT
    shape that was reviewed as bounded: a plan drift (e.g. the filter
    disappearing, or an aggregate's grain changing) breaks the signature
    and re-raises the invariant."""
    name = node.getClass().getSimpleName()
    label: str | None = None
    kids = node.children()
    if name == "Aggregate":
        label = f"Aggregate[{','.join(sorted(_agg_grouping_names(node)))}]"
    elif name == "Deduplicate":
        label = f"Deduplicate[{','.join(sorted(_dedup_key_names(node)))}]"
    elif name == "Filter":
        cols: set[str] = set()
        it = node.condition().references().iterator()
        while it.hasNext():
            cols.add(it.next().name())
        label = f"Filter[{','.join(sorted(cols))}]"
    elif name in ("GlobalLimit", "LocalLimit", "Join", "Generate", "Window"):
        label = name
    elif kids.size() == 0:
        label = _relation_table(node) or name
    subs = [
        s for s in (_hint_signature(kids.apply(i)) for i in range(kids.size())) if s
    ]
    child = "(" + "+".join(subs) + ")" if len(subs) > 1 else (subs[0] if subs else "")
    if label is None:
        return child
    return label + (">" + child if child else "")


def unbounded_hinted_broadcasts(df: DataFrame) -> list[str]:
    """Signatures of every broadcast-hinted subtree whose row count is NOT
    provably bounded (see ``_subtree_bounded``). The registry-wide invariant
    (``tests/test_plans.py``) requires each returned signature to carry an
    explicit, documented boundedness exemption — the round-13 verdict fix:
    no more blanket Aggregate trust, and LogicalRDD-hidden lineage
    (localCheckpoint) must be justified by name, not silently passed."""
    out: list[str] = []

    def walk(node) -> None:
        name = node.getClass().getSimpleName()
        if name == "ResolvedHint" and "broadcast" in node.hints().toString().lower():
            kids = node.children()
            for i in range(kids.size()):
                child = kids.apply(i)
                if not _subtree_bounded(child):
                    out.append(_hint_signature(child))
            return
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i))

    walk(df._jdf.queryExecution().analyzed())
    return out


def forced_broadcast_tables(df: DataFrame) -> set[str]:
    """Source tables visible under a NON-provably-bounded ``F.broadcast``
    hint (the table-level view of ``unbounded_hinted_broadcasts``; blind to
    lineage hidden behind localCheckpoint — the signature check covers
    those). Tables are identified from scan output columns (TPC-H column
    prefixes + the extension tables' distinctive columns)."""
    tables: set[str] = set()

    def relations_under(node) -> None:
        if _subtree_bounded(node):
            return
        name = node.getClass().getSimpleName()
        if "Relation" in name:
            table = _relation_table(node)
            if table:
                tables.add(table)
        kids = node.children()
        for i in range(kids.size()):
            relations_under(kids.apply(i))

    def walk(node) -> None:
        name = node.getClass().getSimpleName()
        if name == "ResolvedHint" and "broadcast" in node.hints().toString().lower():
            relations_under(node)
            return
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i))

    walk(df._jdf.queryExecution().analyzed())
    return tables


# Logical nodes that bound the row count flowing into a window: a window
# whose input passes through one of these is a per-group/top-k frame (tiny by
# construction), not a corpus funneled into one task.
_BOUNDED_REDUCTIONS = frozenset({"Aggregate", "GlobalLimit", "Deduplicate"})

# A leaf whose row count is a PLAN-TIME LITERAL is bounded too, when small:
# ``spark.range(20)`` bin spines, literal frames, OneRowRelation. Unlike a
# file relation, these can't grow with the data — the count is in the plan.
_BOUNDED_LEAF_ROWS = 100_000


def _literal_bounded_leaf(node) -> bool:
    name = node.getClass().getSimpleName()
    try:
        if name == "Range":
            return int(str(node.numElements())) <= _BOUNDED_LEAF_ROWS
        if name == "OneRowRelation":
            return True
        if name == "LocalRelation":
            return int(node.data().size()) <= _BOUNDED_LEAF_ROWS
    except Exception:
        return False
    return False


def _all_paths_reduced(node) -> bool:
    """True when EVERY row-contributing path below ``node`` passes through a
    bounding reduction (Aggregate/GlobalLimit/Deduplicate) or ends in a
    literal-bounded leaf. Shared by the unpartitioned-window and the
    cross-join invariants."""
    if node.getClass().getSimpleName() in _BOUNDED_REDUCTIONS:
        return True
    kids = node.children()
    if kids.size() == 0:
        # bare relation: corpus-scale, unless the leaf's row count is a
        # small plan-time literal (range spine / literal frame).
        return _literal_bounded_leaf(node)
    return all(_all_paths_reduced(kids.apply(i)) for i in range(kids.size()))


def unbounded_cross_joins(df: DataFrame) -> list[str]:
    """``Join`` nodes with NO equi-join key (cross joins and pure non-equi
    conditions — the shapes that compile to CartesianProduct /
    BroadcastNestedLoopJoin) where NEITHER side is bounded.

    A nested-loop join is O(|left| × |right|): fine when one side is a
    1-row broadcast scalar or an aggregate-reduced frame (the sanctioned
    ``crossJoin(F.broadcast(scalar))`` pattern), a quadratic cliff when both
    sides scale with the corpus. Equi-key detection walks the Join node's
    condition EXPRESSION TREE for an ``EqualTo``/``EqualNullSafe`` top-level
    conjunct whose operands reference OPPOSITE SIDES of the join (only
    such a conjunct lets the planner hash-partition) — not the node's
    simpleString, whose truncation could drop the equality conjunct from a
    long condition and whose string literals could contain ``" = "``
    (ADVICE r7). The side check matters for OUTER joins: a
    preserved-side ``col = lit`` or same-side ``col = col`` conjunct is
    NOT pushed below an outer join and would otherwise mask a genuinely
    keyless corpus × corpus nested loop (round-8 review finding)."""
    import re as _re

    def _spans_sides(eq, left_out, right_out) -> bool:
        l_refs, r_refs = eq.left().references(), eq.right().references()

        def on(refs, out) -> bool:
            return (not refs.isEmpty()) and refs.subsetOf(out)

        return (on(l_refs, left_out) and on(r_refs, right_out)) or (
            on(l_refs, right_out) and on(r_refs, left_out)
        )

    def _has_equi_conjunct(expr, left_out, right_out) -> bool:
        cls = expr.getClass().getSimpleName()
        if cls == "And":
            return _has_equi_conjunct(
                expr.left(), left_out, right_out
            ) or _has_equi_conjunct(expr.right(), left_out, right_out)
        return cls in ("EqualTo", "EqualNullSafe") and _spans_sides(
            expr, left_out, right_out
        )

    out: list[str] = []

    def walk(node) -> None:
        name = node.getClass().getSimpleName()
        if name == "Join":
            s = node.simpleString(200)
            cond = node.condition()
            has_equi = (not cond.isEmpty()) and _has_equi_conjunct(
                cond.get(), node.left().outputSet(), node.right().outputSet()
            )
            kids = node.children()
            if not has_equi and not any(
                _all_paths_reduced(kids.apply(i)) for i in range(kids.size())
            ):
                out.append(_re.sub(r"#\d+L?", "", s))
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return out


def unbounded_global_sorts(df: DataFrame) -> list[str]:
    """Global ``Sort`` nodes over a non-reduced input with no ``Limit``
    above them — a TOTAL ORDER of a corpus-scale frame.

    A global sort compiles to a range exchange (sampling pass) plus a full
    sort of every row — legitimate under a Limit (TakeOrdered) or over an
    aggregate-bounded frame (ordering a per-group rollup for output), pure
    waste otherwise: downstream operators that only need per-group order
    should use a partitioned window, and unordered sinks don't need the
    sort at all. Found in the wild in round 8: Spark 4.1's decorrelation
    of a correlated ``ORDER BY .. LIMIT`` injects exactly this shape (see
    ``lateral_recent_orders``). Registry-wide test:
    ``tests/test_plans.py::test_no_unbounded_global_sorts``."""
    import re as _re

    out: list[str] = []

    def walk(node, under_limit: bool) -> None:
        cls = node.getClass().getSimpleName()
        if cls in ("GlobalLimit", "LocalLimit"):
            under_limit = True
        if cls == "Sort" and not under_limit:
            # The Scala accessor is ``global()`` — a Python keyword, so it
            # must be fetched with getattr (py4j does NO keyword mangling;
            # ``node.global_()`` raises Py4JError, and a silent
            # except-default-True here turned the documented global-vs-local
            # distinction into dead code — round-8 ADVICE item 3). No
            # fallback: if the accessor ever breaks, fail loudly.
            is_global = bool(getattr(node, "global")())
            kids = node.children()
            if is_global and not all(
                _all_paths_reduced(kids.apply(i)) for i in range(kids.size())
            ):
                out.append(_re.sub(r"#\d+L?", "", node.simpleString(150)))
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i), under_limit)

    walk(df._jdf.queryExecution().optimizedPlan(), False)
    return out


def unpartitioned_corpus_windows(df: DataFrame) -> list[str]:
    """Unpartitioned ``Window`` nodes whose input is NOT aggregate-reduced.

    An unpartitioned window funnels its entire input through one task —
    harmless when the input is an aggregate frame (one row per group, e.g.
    the bin-frame window in ``token_budget_select``), a 100 TB cliff when it
    is the raw corpus. Spark logs the same WARN for both, so the bench log
    can't distinguish a deliberate tiny frame from a regression; this makes
    the distinction a checked invariant (round-3 verdict item 7): returns
    one descriptor per unpartitioned window with no ``Aggregate`` /
    ``GlobalLimit`` / ``Deduplicate`` bounding EVERY row-contributing path
    below it in the optimized logical plan. Registry-wide test:
    ``tests/test_plans.py::test_no_unpartitioned_corpus_windows``.

    A reduction bounds the window only if every path that contributes rows
    passes through one — so multi-child nodes (Join, Union) require ALL
    children bounded. The earlier ``any``-descent falsely marked a
    corpus-scale window bounded when the corpus was merely *joined* to a
    tiny aggregate (round-5 ADVICE item 1): the aggregate bounds the
    broadcast side's cardinality, not the probe side's."""

    reduced = _all_paths_reduced
    out: list[str] = []

    def walk(node) -> None:
        name = node.getClass().getSimpleName()
        if name == "Window" and node.partitionSpec().size() == 0:
            child = node.children().apply(0)
            if not reduced(child):
                out.append(node.simpleString(120))
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return out


def shuffle_count(df: DataFrame) -> int:
    """Number of exchanges in the physical plan (lower is better; AQE may
    remove some at runtime). Formatted explain lists operators as
    ``(N) Exchange`` with arguments on separate lines, so count operator
    headers, not the ``Exchange hashpartitioning`` one-liner of simple
    mode."""
    return len(re.findall(r"\(\d+\) Exchange\b", explain_str(df)))
