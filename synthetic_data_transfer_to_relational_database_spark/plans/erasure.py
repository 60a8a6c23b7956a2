"""Right-to-be-forgotten DELETE planning over the FK graph.

The dual of the generation engine: the same FK metadata that orders
INSERTs parent-first (toposort.py, the reference's fill_db.py:39-61
ordering) orders DELETEs child-first. Given a schema, a root table, and
a SQL predicate naming the erasure cohort, :func:`erasure_delete_statements`
emits one ``DELETE`` per affected table — children before parents, each
child predicated by an ``EXISTS`` chain back to the root cohort — so a
live database with ACTIVE FK constraints accepts the purge with no
constraint-disable bracket and no orphan window.

Self-referencing FKs are handled by SEVERING, not cascading: before a
table's DELETE, an ``UPDATE ... SET <self-fk> = NULL`` clears surviving
rows' links into the doomed cohort (GDPR erases the subject's rows, not
rows that merely point at them). That requires the self-FK columns to be
nullable — a non-nullable self-FK inside the purge set has no safe
single-statement order, and the planner refuses loudly rather than emit
a DELETE a live database would reject. Likewise for FK cycles SPANNING
tables in the purge set: no child-first order exists, so the planner
raises instead of producing statements that violate constraints.

``operators/relational2.erasure_audit`` is the read-only half (how many
rows WOULD go); this module is the write half. Together they are the
compliance workflow the audit's docstring promises.

All work here is driver-side metadata planning (the FK graph has tens of
nodes); execution goes through the ordinary K1 executor
(``sinks.jdbc.execute_statements`` / ``execute_transaction`` for an
all-or-nothing purge).
"""

from __future__ import annotations

import re

from .model import TableSpec
from .toposort import toposort_tables


def erasure_delete_statements(
    tables: dict[str, TableSpec],
    root_table: str,
    root_predicate: str,
) -> list[str]:
    """Child-first purge statements for every row that references the
    cohort ``root_predicate`` selects in ``root_table`` (transitively
    through the FK graph), ending with the root rows themselves.
    Self-FK links from SURVIVING rows into the cohort are severed with
    an ``UPDATE ... SET NULL`` immediately before that table's DELETE
    (see module docstring for the policy and its preconditions).

    ``root_predicate`` references root columns bare (``c_custkey % 97 =
    0``) or as ``<root_table>.<col>``; it is embedded verbatim
    (caller-trusted SQL, the same trust model as deploy_script's DDL).
    Multiple FK paths into the cohort OR together: a row referencing it
    through ANY path is deleted. Every ``EXISTS`` level gets a globally
    unique alias, so arbitrarily deep chains nest without shadowing.

    Ordering: reversed toposort — the exact inverse of the INSERT order
    the generator uses, so each DELETE runs while its own children are
    already gone and its parents still exist (the EXISTS subqueries need
    the parents alive).

    Raises ``ValueError`` when no constraint-safe order exists: a
    non-nullable self-FK on a purged table, or an FK cycle spanning two
    purged tables.

    Scale note: each statement pushes one semi-join to the database —
    the server does the work; nothing row-shaped crosses the wire. For
    purges too large for one server-side transaction, run the same
    statements batched by key ranges.
    """
    if root_table not in tables:
        raise KeyError(f"unknown root table {root_table!r}")

    counter = [0]

    def fresh_alias() -> str:
        counter[0] += 1
        return f"e{counter[0]}"

    quoted = re.compile(r"'(?:[^']|'')*'")

    def requalify(pred: str, table: str, alias: str) -> str:
        # rewrite '<table>.' column references to the enclosing alias;
        # word-bounded so a table whose name suffixes another is safe,
        # and SQL string literals are carried through untouched — a root
        # predicate like `name LIKE 'orders.%'` on table `orders` must
        # keep its literal when embedded one level down
        rx = re.compile(rf"\b{re.escape(table)}\.")
        out, last = [], 0
        for m in quoted.finditer(pred):
            out.append(rx.sub(f"{alias}.", pred[last : m.start()]))
            out.append(m.group(0))
            last = m.end()
        out.append(rx.sub(f"{alias}.", pred[last:]))
        return "".join(out)

    # Predicates are stored referencing the table's own columns via the
    # TABLE NAME, so embedding a predicate one level down is a single
    # name→alias rewrite.
    preds: dict[str, str] = {root_table: root_predicate}
    order = toposort_tables(tables)
    pos = {n: i for i, n in enumerate(order)}
    # forward pass in insert order: parents acquire predicates before
    # children look them up, so chains compose transitively
    for name in order:
        if name in preds:
            continue
        clauses = []
        for fk in tables[name].fks:
            parent = fk.parent_table
            if parent == name or parent not in tables:
                continue  # self-refs: severed below, never a new pred
            parent_pred = preds.get(parent)
            if parent_pred is None:
                continue
            a = fresh_alias()
            on = " AND ".join(
                f"{a}.{pc} = {name}.{cc}"
                for cc, pc in zip(fk.columns, fk.parent_columns)
            )
            inner = requalify(parent_pred, parent, a)
            clauses.append(
                f"EXISTS (SELECT 1 FROM {parent} {a} WHERE {on} AND ({inner}))"
            )
        if clauses:
            preds[name] = " OR ".join(clauses)

    # No valid child-first order exists when a purged parent sits LATER
    # in the (cycle-fallback) order than a table referencing it: the
    # reversed order would delete the parent while references survive.
    for name in order:
        for fk in tables[name].fks:
            p = fk.parent_table
            if p == name or p not in tables or p not in preds:
                continue
            if pos[p] > pos[name]:
                raise ValueError(
                    f"FK cycle spans the purge set ({name} -> {p}); no "
                    "constraint-safe DELETE order exists — sever one "
                    "edge manually (UPDATE ... SET NULL) and re-plan"
                )

    stmts: list[str] = []
    for name in reversed(order):
        if name not in preds:
            continue
        spec = tables[name]
        pred = preds[name]
        for fk in spec.fks:
            if fk.parent_table != name:
                continue
            for cc in fk.columns:
                try:
                    col = spec.column(cc)
                except KeyError:
                    col = None
                if col is not None and not col.nullable:
                    raise ValueError(
                        f"self-FK {name}.{cc} is NOT NULL; severing is "
                        "impossible and a cohort DELETE would violate "
                        "the constraint — drop the constraint or purge "
                        "the whole table"
                    )
            a = fresh_alias()
            on = " AND ".join(
                f"{a}.{pc} = {name}.{cc}"
                for cc, pc in zip(fk.columns, fk.parent_columns)
            )
            sets = ", ".join(f"{cc} = NULL" for cc in fk.columns)
            stmts.append(
                f"UPDATE {name} SET {sets} WHERE EXISTS "
                f"(SELECT 1 FROM {name} {a} WHERE {on} AND "
                f"({requalify(pred, name, a)}))"
            )
        stmts.append(f"DELETE FROM {name} WHERE {pred}")
    return stmts
