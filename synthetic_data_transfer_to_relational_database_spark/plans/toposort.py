"""FK-dependency ordering: Kahn's algorithm over the table graph.

Mirrors fill_db.py:39-61 (networkx toposort with cycle fallback): edges
parent→child per FK, self-loops excluded up front (CariHesap's
self-references, script.sql:4043-4049, would otherwise make the graph
cyclic). On a residual cycle (mutual FKs), the remaining tables are
appended in name order — the reference falls back to original order.

Driver-side metadata work: the graph has ≤ hundreds of nodes.
"""

from __future__ import annotations

from collections import deque

from .model import TableSpec


def toposort_tables(tables: dict[str, TableSpec]) -> list[str]:
    names = sorted(tables.keys())
    children: dict[str, set[str]] = {n: set() for n in names}
    indeg: dict[str, int] = {n: 0 for n in names}
    for t in tables.values():
        for fk in t.fks:
            p = fk.parent_table
            if p == t.name or p not in tables:
                continue  # self-loops / external parents don't order
            if t.name not in children[p]:
                children[p].add(t.name)
                indeg[t.name] += 1
    queue = deque(sorted(n for n in names if indeg[n] == 0))
    order: list[str] = []
    while queue:
        n = queue.popleft()
        order.append(n)
        for c in sorted(children[n]):
            indeg[c] -= 1
            if indeg[c] == 0:
                queue.append(c)
    if len(order) < len(names):  # residual cycle fallback
        order.extend(sorted(n for n in names if n not in set(order)))
    return order
