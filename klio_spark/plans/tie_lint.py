"""Tie-key lint: find ORDER-dependent picks whose sort key may not be total.

The round-8 amplified-corpus sweep caught two shipped bugs of one class
(VERDICT r8 item 3): a value pick that is deterministic only when the
order key has no ties — q09's ``max_by(orderkey, totalprice)`` copied an
arbitrary orderkey once prices duplicated, and q114's ``distinct()``
assumed a composite business key was unique when the corpus duplicates
it. Ties are invisible at small scale factors and guaranteed at 100 TB,
so the class is gated at the SOURCE level: this module AST-walks the
query/streaming modules for every tie-sensitive pick and classifies its
order key.

Tie-sensitive kinds detected:

  * ``row_number`` / ``ntile`` over a window — among order-key ties the
    numbering is engine-arbitrary, so any downstream ``== 1`` filter or
    bucket assignment copies an arbitrary row.
  * ``max_by`` / ``min_by`` (Python) and ``arg_max`` / ``arg_min`` /
    ``ROW_NUMBER`` / ``NTILE`` (inside oracle SQL strings) — same
    semantics on the aggregate side.
  * ``first`` / ``last`` over an ORDERED window — order-dependent value
    picks (unordered ``first`` inside groupBy aggs is flagged too:
    it is partition-arbitrary unless every value in the group ties).

A site is auto-classified TOTAL when its order-key text references one
of the corpus's genuinely unique row ids (checked against the actual
parquet: ``event_id``, ``doc_id``, ``vec_id``, the TPC-H primary keys).
Composite *business* keys are deliberately NOT on that list —
``(l_orderkey, l_linenumber)`` duplicates 143k rows at sf0.1, which is
exactly how q114 broke. Every other site must carry an explicit
allow-list entry (tests/test_tie_keys.py) stating WHY ties are
impossible or harmless; an unlisted site fails the suite, so a new
query cannot reintroduce the class silently.

Heuristic honesty: referencing a unique id proves totality only while
the id is still unique in the frame at hand — an explode or self-join
upstream can duplicate it. The allow-list review is where that judgment
lives; the auto-pass just removes the 90% of sites that order by a raw
row id of the source table.
"""

from __future__ import annotations

import ast
import dataclasses
import re

# Row ids verified unique in the generated corpus (COUNT = COUNT DISTINCT
# at sf0.1 for every one; see tests/test_tie_keys.py which re-asserts it
# at the test SF so corpus regeneration can't silently invalidate this).
UNIQUE_IDS = (
    "event_id",
    "doc_id",
    "vec_id",
    "o_orderkey",
    "c_custkey",
    "p_partkey",
    "s_suppkey",
    "n_nationkey",
    "r_regionkey",
)

_UNIQUE_RE = re.compile(r"\b(" + "|".join(UNIQUE_IDS) + r")\b")

# SQL-side tie-sensitive constructs inside oracle strings
_SQL_PATTERNS = (
    ("sql_row_number", re.compile(r"ROW_NUMBER\s*\(\s*\)\s*OVER", re.I)),
    ("sql_ntile", re.compile(r"\bNTILE\s*\(", re.I)),
    ("sql_arg_pick", re.compile(r"\b(ARG_MAX|ARG_MIN|MAX_BY|MIN_BY)\s*\(", re.I)),
    ("sql_first_last", re.compile(r"\b(FIRST|LAST)\s*\(.{0,200}ORDER\s+BY", re.I | re.S)),
)


@dataclasses.dataclass
class TieSite:
    file: str  # path relative to the package root's parent
    func: str  # enclosing function ("<module>" at top level)
    line: int
    kind: str  # row_number | ntile | max_by | min_by | first | last | sql_*
    key_text: str  # best-effort source of the ordering/pick key
    total: bool  # True → order key references a unique row id


def _src(tree_src: str, node: ast.AST) -> str:
    return ast.get_source_segment(tree_src, node) or ""


class _FuncScanner(ast.NodeVisitor):
    """Collect tie-sensitive call sites within one module."""

    def __init__(self, src: str, relpath: str):
        self.src = src
        self.relpath = relpath
        self.sites: list[TieSite] = []
        self._func_stack: list[str] = []
        # per-function window assignments: name -> orderBy source text
        self._windows_stack: list[dict[str, str]] = [{}]
        # inner calls already reported via their enclosing .over(...) —
        # prevents double-reporting F.first(x).over(w) as BOTH an
        # ordered-window pick and a bare aggregate pick
        self._handled: set[int] = set()

    # -- scope tracking -------------------------------------------------
    def visit_FunctionDef(self, node: ast.FunctionDef):
        self._func_stack.append(node.name)
        self._windows_stack.append(dict(self._windows_stack[-1]))
        self.generic_visit(node)
        self._windows_stack.pop()
        self._func_stack.pop()

    visit_AsyncFunctionDef = visit_FunctionDef

    @property
    def _func(self) -> str:
        return self._func_stack[-1] if self._func_stack else "<module>"

    # -- window assignments ---------------------------------------------
    def visit_Assign(self, node: ast.Assign):
        text = _src(self.src, node.value)
        if ".orderBy(" in text or "Window." in text:
            for tgt in node.targets:
                if isinstance(tgt, ast.Name):
                    self._windows_stack[-1][tgt.id] = text
        self.generic_visit(node)

    # -- call sites -------------------------------------------------------
    def visit_Call(self, node: ast.Call):
        fn = node.func
        name = None
        if isinstance(fn, ast.Attribute):
            name = fn.attr
        elif isinstance(fn, ast.Name):
            name = fn.id

        if name in ("max_by", "min_by"):
            key = _src(self.src, node.args[1]) if len(node.args) > 1 else ""
            self._add(node, name, key)
        elif name == "over":
            inner = fn.value  # the windowed function call
            iname = None
            if isinstance(inner, ast.Call):
                f2 = inner.func
                iname = f2.attr if isinstance(f2, ast.Attribute) else (
                    f2.id if isinstance(f2, ast.Name) else None
                )
            if iname in ("row_number", "ntile", "first", "last"):
                key = self._window_key(node.args[0]) if node.args else ""
                # first/last over an UNORDERED window is an aggregate-
                # style pick: still tie/partition-arbitrary → flag with
                # empty key text (never auto-total)
                self._add(node, iname, key)
                if isinstance(inner, ast.Call):
                    self._handled.add(id(inner))
        elif (
            name in ("first", "last")
            and id(node) not in self._handled
            and (node.args or node.keywords)
        ):
            # bare F.first/F.last inside a groupBy agg (no .over): the
            # pick is partition-arbitrary — NEVER auto-total (empty key
            # text), so it always needs an allow-list justification
            # (e.g. VALUE-EQUALS-KEY when picking the grouping key
            # itself). The arg/keyword guard skips 0-ary DataFrame
            # actions like df.first().
            self._add(node, name, "")
        self.generic_visit(node)

    def _window_key(self, arg: ast.AST) -> str:
        if isinstance(arg, ast.Name):
            return self._windows_stack[-1].get(arg.id, "")
        return _src(self.src, arg)

    def _add(self, node: ast.AST, kind: str, key_text: str):
        order = key_text
        if ".orderBy(" in key_text:
            # only the orderBy argument list decides totality
            order = key_text.split(".orderBy(", 1)[1]
        self.sites.append(
            TieSite(
                file=self.relpath,
                func=self._func,
                line=node.lineno,
                kind=kind,
                key_text=" ".join(order.split())[:160],
                total=bool(_UNIQUE_RE.search(order)),
            )
        )


def _scan_sql_strings(tree: ast.AST, src: str, relpath: str) -> list[TieSite]:
    sites: list[TieSite] = []
    func = "<module>"

    class V(ast.NodeVisitor):
        def __init__(self):
            self._stack = []

        def visit_FunctionDef(self, node):
            self._stack.append(node.name)
            self.generic_visit(node)
            self._stack.pop()

        visit_AsyncFunctionDef = visit_FunctionDef

        def visit_Constant(self, node: ast.Constant):
            if isinstance(node.value, str) and len(node.value) > 20:
                self._scan(node, node.value)

        def visit_JoinedStr(self, node: ast.JoinedStr):
            # f-string oracle SQL: scan the literal fragments
            text = _src(src, node)
            self._scan(node, text)

        def _scan(self, node, text: str):
            for kind, pat in _SQL_PATTERNS:
                for m in pat.finditer(text):
                    ctx = text[m.start() : m.start() + 260]
                    # named window (<FN>(...) OVER w): the ordering lives
                    # in the WINDOW clause — resolve it for EVERY
                    # construct kind (ROW_NUMBER/NTILE/FIRST/LAST), not
                    # just ROW_NUMBER, so a unique-id key in the WINDOW
                    # definition auto-passes uniformly
                    mw = re.match(
                        r"\w+\s*\(.*?\)\s*OVER\s+([A-Za-z_]\w*)",
                        ctx,
                        re.I | re.S,
                    )
                    if mw:
                        wname = mw.group(1)
                        mdef = re.search(
                            rf"WINDOW\s+{re.escape(wname)}\s+AS\s*\(([^)]*)\)",
                            text,
                            re.I,
                        )
                        if mdef:
                            ctx = mdef.group(1)
                    else:
                        # inline window: trim trailing context past the
                        # OVER(...) spec so a unique id appearing
                        # INCIDENTALLY after the window clause cannot
                        # false-pass the totality check
                        mo = re.match(
                            r"\w+\s*\(.*?\)\s*OVER\s*"
                            r"\(([^()]*(?:\([^()]*\)[^()]*)*)\)",
                            ctx,
                            re.I | re.S,
                        )
                        if mo:
                            ctx = ctx[: mo.end()]
                    sites.append(
                        TieSite(
                            file=relpath,
                            func=self._stack[-1] if self._stack else func,
                            line=node.lineno,
                            kind=kind,
                            key_text=" ".join(ctx.split())[:160],
                            total=bool(_UNIQUE_RE.search(ctx)),
                        )
                    )

    V().visit(tree)
    return sites


def scan_file(path: str, relpath: str | None = None) -> list[TieSite]:
    src = open(path).read()
    tree = ast.parse(src)
    rel = relpath or path
    scanner = _FuncScanner(src, rel)
    scanner.visit(tree)
    return scanner.sites + _scan_sql_strings(tree, src, rel)


def site_key(s: TieSite) -> str:
    """Stable identity for the allow-list: file/function/kind (line
    numbers churn on every edit; one entry covers all same-kind sites
    in one function, which share one justification in practice)."""
    return f"{s.file}::{s.func}::{s.kind}"
