"""Physical-plan introspection helpers shared by tools/plan_audit.py
and the plan-regression pytests: parse `explain(mode="formatted")`
output into a node tree, resolve scans to their tables, and walk
broadcast subtrees. Pure string processing — no Spark calls here."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout


def formatted_plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


_ORDER_SORTERS = ("sort_array", "array_sort")
_ORDER_COLLECTORS = r"\b(collect_list|collect_set|array_agg)\("


def _mask_quoted(plan: str) -> str:
    """Blank the inside of single-quoted literals, preserving length.

    The enclosing-call scan below counts '(' / ')' to build its call
    stack; a paren inside a string literal (a regexp or delimiter
    argument in the plan, e.g. quality_score's patterns) would
    misalign the stack and silently suppress violations (ADVICE r12).
    Replacing literal bodies with spaces keeps every index identical
    while removing their parens from the scan. Quote state resets at
    each newline so one unpaired quote cannot blank the rest of the
    plan."""
    out = []
    in_q = False
    for ch in plan:
        if ch == "\n":
            in_q = False
            out.append(ch)
        elif ch == "'":
            in_q = not in_q
            out.append(ch)
        else:
            out.append(" " if in_q else ch)
    return "".join(out)


def unsorted_collector_violations(plan: str) -> list[str]:
    """PARITY.md §7's nested-column rule, made structural (VERDICT r11
    #6): an ArrayType output built by an aggregation collector
    (collect_list / collect_set / array_agg) carries SHUFFLE order —
    nondeterministic run to run — unless some enclosing call is
    sort_array / array_sort. Scans an analyzed-plan string and returns
    a snippet per collector occurrence with NO sorter anywhere in its
    enclosing-call chain (so sort_array(flatten(collect_list(...)))
    passes: the outer sort fixes the order of the whole union). Window
    collectors (collect_list OVER an ordered frame) are still flagged —
    frame order is deterministic only when the ordering key is unique,
    which a plan string cannot prove; such queries must be waived BY
    NAME with their ordering argument (tools/check_oracle.py
    NESTED_ORDER_WAIVERS)."""
    out = []
    masked = _mask_quoted(plan)
    for m in re.finditer(_ORDER_COLLECTORS, masked):
        seg = masked[: m.start()]
        stack: list[str] = []
        for j, ch in enumerate(seg):
            if ch == "(":
                k = j - 1
                while k >= 0 and (seg[k].isalnum() or seg[k] == "_"):
                    k -= 1
                stack.append(seg[k + 1 : j])
            elif ch == ")" and stack:
                stack.pop()
        if not any(s in _ORDER_SORTERS for s in stack):
            out.append(plan[m.start() : m.start() + 80].replace("\n", " "))
    return out


def split_top_level(schema: str) -> list[str]:
    """Split a ReadSchema struct body on top-level commas only."""
    out, depth, cur = [], 0, []
    for ch in schema:
        if ch in "<([":
            depth += 1
        elif ch in ">)]":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return [c for c in out if c.strip()]


class Node:
    def __init__(self, nid: int, name: str, depth: int):
        self.id = nid
        self.name = name
        self.depth = depth
        self.children: list["Node"] = []


def parse_tree(plan: str) -> list[Node]:
    """Parse the formatted-plan ASCII tree into Node objects.

    Tree lines look like `   +- * BroadcastHashJoin Inner BuildRight (8)`;
    each nesting level is a 3-character prefix unit (`+- `, `:- `,
    `:  `, `   `). Returns all nodes (index 0 = root).
    """
    nodes: list[Node] = []
    stack: list[Node] = []
    for line in plan.splitlines():
        m = re.match(r"^((?:[:+\- ]{3})*)(?:\* )?([A-Za-z][^(]*)\((\d+)\)\s*$", line)
        if not m:
            continue
        depth = len(m.group(1)) // 3
        node = Node(int(m.group(3)), m.group(2).strip(), depth)
        while stack and stack[-1].depth >= depth:
            stack.pop()
        if stack:
            stack[-1].children.append(node)
        nodes.append(node)
        stack.append(node)
    return nodes


def scan_tables(plan: str) -> dict[int, str]:
    """Map scan node id -> table name, from the detail section.

    Detail blocks look like `(1) Scan parquet ` followed some lines
    later by `Location: InMemoryFileIndex [file:/.../lineitem.parquet]`.
    """
    tables: dict[int, str] = {}
    current: int | None = None
    for line in plan.splitlines():
        m = re.match(r"^\((\d+)\) Scan ", line)
        if m:
            current = int(m.group(1))
            continue
        if re.match(r"^\(\d+\) ", line):
            current = None
            continue
        if current is not None:
            loc = re.search(r"Location:.*\[[^\]]*?([A-Za-z_0-9]+)\.parquet", line)
            if loc:
                tables[current] = loc.group(1)
    return tables


def scan_read_counts(plan: str) -> dict[int, int]:
    """Map scan node id -> number of top-level columns it reads."""
    counts: dict[int, int] = {}
    current: int | None = None
    for line in plan.splitlines():
        m = re.match(r"^\((\d+)\) Scan ", line)
        if m:
            current = int(m.group(1))
            continue
        if re.match(r"^\(\d+\) ", line):
            current = None
            continue
        if current is not None:
            rs = re.search(r"ReadSchema: struct<(.*)>\s*$", line)
            if rs:
                counts[current] = len(split_top_level(rs.group(1)))
    return counts


def descendant_scan_ids(node: Node) -> list[int]:
    out = []
    todo = [node]
    while todo:
        n = todo.pop()
        if n.name.startswith("Scan "):
            out.append(n.id)
        todo.extend(n.children)
    return out


def unpartitioned_window_ids(plan: str) -> list[int]:
    """Window node ids whose partitionSpec is empty — the plans that
    funnel their whole input through ONE task (Spark logs "No Partition
    Defined for Window operation" at runtime).

    Detection: in the formatted detail section, a Window node's
    Arguments line is `[functions], [partitionSpec], [orderSpec]`;
    empty specs are OMITTED, not rendered as []. Three groups is
    always partitioned. Two groups is ambiguous — `[funcs], [order]`
    (unpartitioned, the bad shape) vs `[funcs], [partition]` (a
    partitioned whole-frame window with no order, fine) — and the two
    are told apart by the ASC/DESC direction tokens only an orderSpec
    carries. Counted bracket-aware so commas inside
    windowspecdefinition(...) don't split."""
    out: set[int] = set()
    current: int | None = None
    for line in plan.splitlines():
        m = re.match(r"^\((\d+)\) Window\s*$", line)
        if m:
            current = int(m.group(1))
            continue
        if re.match(r"^\(\d+\) ", line):
            current = None
            continue
        if current is not None and line.startswith("Arguments:"):
            groups = [
                g.strip()
                for g in split_top_level(line[len("Arguments:"):].strip())
                if g.strip().startswith("[")
            ]
            if len(groups) == 2 and re.search(
                r" (ASC|DESC)( NULLS (FIRST|LAST))?\]?", groups[1]
            ):
                out.add(current)
            elif len(groups) == 1:
                out.add(current)  # neither partition nor order spec
            current = None
    return sorted(out)


def broadcast_fact_tables(plan: str, fact_tables: set[str]) -> list[str]:
    """Tables from `fact_tables` that sit under a BroadcastExchange —
    the plan shape that OOMs at scale when the broadcast is hint-forced."""
    nodes = parse_tree(plan)
    tables = scan_tables(plan)
    bad: list[str] = []
    for n in nodes:
        if "BroadcastExchange" in n.name:
            bad.extend(
                tables[sid]
                for sid in descendant_scan_ids(n)
                if tables.get(sid) in fact_tables
            )
    return sorted(bad)
