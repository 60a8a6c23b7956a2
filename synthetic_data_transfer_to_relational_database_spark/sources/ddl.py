"""MSSQL DDL-dump source: parse a management-studio script into TableSpecs.

Re-expresses the reference's DDL pipeline (apply_mssql.py) plus the schema
knowledge it leaves implicit in the database catalog:

- encoding handling: UTF-16 default with utf-8-sig fallback
  (apply_mssql.py:124-129)
- ``GO`` batch splitting: line-anchored, case-insensitive
  (apply_mssql.py:12-15)
- batch filters: skip CREATE DATABASE / FILENAME settings / bare USE
  (apply_mssql.py:69-83) and database-name rewrite (apply_mssql.py:87-89)
- CREATE TABLE / PRIMARY KEY / IDENTITY / FOREIGN KEY parsing — the
  reference reads these from INFORMATION_SCHEMA at runtime
  (run_engine.py:85-147); we parse the same facts from the script so the
  generator can plan without a live database.

Everything here is driver-side metadata work (a few thousand lines of
text) — never distributed.
"""

from __future__ import annotations

import re
from pathlib import Path

from ..plans.model import ColumnSpec, FKSpec, TableSpec, wire_fk_rules

# --- encoding + batching (S1/S2) ---------------------------------------


def read_sql_script(path: str | Path, encoding: str = "utf-16") -> str:
    """UTF-16 first (SSMS default), utf-8-sig fallback on decode failure."""
    raw = Path(path).read_bytes()
    try:
        return raw.decode(encoding)
    except (UnicodeDecodeError, UnicodeError):
        return raw.decode("utf-8-sig")


_GO_RE = re.compile(r"^\s*GO(?:\s+(\d+))?\s*$", re.IGNORECASE | re.MULTILINE)


def split_go_batches(script: str) -> list[str]:
    """T-SQL batch splitter including the ``GO n`` repeat-count form
    (SQL Server executes the preceding batch n times). The reference
    script uses only bare GO; the count form is supported for dialect
    completeness."""
    parts = _GO_RE.split(script)
    out: list[str] = []
    # split() with one capture group alternates [batch, count?, batch, ...]
    for i in range(0, len(parts), 2):
        batch = parts[i].strip()
        if not batch:
            continue
        count = parts[i + 1] if i + 1 < len(parts) else None
        out.extend([batch] * (int(count) if count else 1))
    return out


def filter_batches(batches: list[str], target_db: str | None = None, source_db: str | None = None) -> list[str]:
    """Deploy-time batch hygiene: drop CREATE DATABASE, physical FILENAME
    settings, and bare USE batches; optionally rewrite the database name."""
    out = []
    for b in batches:
        up = b.upper()
        if "CREATE DATABASE" in up:
            continue
        if "FILENAME =" in up or "FILENAME=" in up:
            continue
        if up.startswith("USE ") and len(b) < 40:
            continue
        if target_db and source_db:
            b = b.replace(f"[{source_db}]", f"[{target_db}]").replace(source_db, target_db)
        out.append(b)
    return out


# --- type mapping -------------------------------------------------------

# Canonical-dtype mapping for T-SQL types (SURVEY.md §1.2 census). Types
# outside the safe surface (rowversion/varbinary/image/xml/…) are kept in
# the spec but flagged unsafe so the generator drops them, matching the
# SAFE_TYPES whitelist semantics (run_engine.py:28-34,105).
_SAFE = {
    "nvarchar": ("string", True),
    "varchar": ("string", True),
    "nchar": ("string", True),
    "char": ("string", True),
    "text": ("string", False),
    "ntext": ("string", False),
    "uniqueidentifier": ("uuid", False),
    "int": ("int", False),
    "smallint": ("short", False),
    "tinyint": ("int", False),
    "bigint": ("long", False),
    "bit": ("boolean", False),
    "real": ("float", False),
    "float": ("double", False),
    "date": ("date", False),
    "datetime": ("timestamp", False),
    "datetime2": ("timestamp", False),
    "smalldatetime": ("timestamp", False),
    "time": ("time", False),
    "money": ("decimal", False),
    "smallmoney": ("decimal", False),
    "numeric": ("decimal", False),
    "decimal": ("decimal", False),
}


def map_sql_type(sql_type: str, args: list[int]) -> ColumnSpec:
    """Map a T-SQL type (+ parenthesized args) onto a canonical ColumnSpec
    fragment (dtype/length/precision/scale/unsafe)."""
    t = sql_type.lower()
    if t in ("timestamp", "rowversion", "varbinary", "binary", "image"):
        return ColumnSpec(name="?", dtype="binary", unsafe=True)
    if t not in _SAFE:
        return ColumnSpec(name="?", dtype="string", unsafe=True)
    dtype, has_len = _SAFE[t]
    spec = ColumnSpec(name="?", dtype=dtype)
    if dtype == "decimal":
        # Explicit args: NUMERIC(p) means scale 0 per SQL standard —
        # padding with the (18,2) default made NUMERIC(10) parse as
        # decimal(10,18), an invalid scale > precision spec.
        p, s = (args + [0])[:2] if args else ((19, 4) if "money" in t else (18, 2))
        if t in ("money", "smallmoney"):
            p, s = 19, 4
        spec.dtype = f"decimal({p},{s})"
        spec.precision, spec.scale = p, s
    elif has_len:
        spec.length = args[0] if args else 1  # -1 == MAX
    elif dtype == "uuid":
        spec.length = 36
    return spec


# --- CREATE TABLE / FK parsing -----------------------------------------

_CREATE_RE = re.compile(r"CREATE\s+TABLE\s+\[?(?:\w+)\]?\.\[?(\w+)\]?\s*\(", re.IGNORECASE)
_COL_RE = re.compile(
    r"^\s*\[(?P<name>[^\]]+)\]\s+\[(?P<type>\w+)\]\s*(?:\((?P<args>max|[\d,\s]+)\))?"
    r"(?P<identity>\s*IDENTITY\s*\(\s*\d+\s*,\s*\d+\s*\))?"
    r".*?(?P<null>NOT\s+NULL|NULL)\s*,?\s*$",
    re.IGNORECASE,
)
_COMPUTED_RE = re.compile(r"^\s*\[(?P<name>[^\]]+)\]\s+AS\s+", re.IGNORECASE)
_PK_RE = re.compile(
    r"CONSTRAINT\s+\[[^\]]+\]\s+PRIMARY\s+KEY\s+(?:CLUSTERED|NONCLUSTERED)?\s*\((?P<cols>[^)]+)\)",
    re.IGNORECASE | re.DOTALL,
)
_PK_COL_RE = re.compile(r"\[([^\]]+)\]")
_FK_RE = re.compile(
    r"ALTER\s+TABLE\s+\[?(?:\w+)\]?\.\[?(?P<child>\w+)\]?\s+(?:WITH\s+(?:NO)?CHECK\s+)?ADD\s+"
    r"CONSTRAINT\s+\[(?P<name>[^\]]+)\]\s+FOREIGN\s+KEY\s*\((?P<cols>[^)]+)\)\s*"
    r"REFERENCES\s+\[?(?:\w+)\]?\.\[?(?P<parent>\w+)\]?\s*\((?P<pcols>[^)]+)\)"
    r"(?P<cascade>\s*ON\s+DELETE\s+CASCADE)?",
    re.IGNORECASE | re.DOTALL,
)


_UNIQUE_IDX_RE = re.compile(
    r"CREATE\s+UNIQUE\s+(?:NONCLUSTERED\s+|CLUSTERED\s+)?INDEX\s+\[(?P<name>[^\]]+)\]\s+"
    r"ON\s+\[?(?:\w+)\]?\.\[?(?P<table>\w+)\]?\s*\((?P<cols>[^)]+)\)",
    re.IGNORECASE | re.DOTALL,
)


def parse_unique_indexes(batches: list[str]) -> list[tuple[str, list[str]]]:
    """(table, [columns]) per CREATE UNIQUE [NONCLUSTERED] INDEX batch —
    filtered indexes (trailing WHERE) parse identically; enforcing
    uniqueness over ALL rows satisfies the filtered constraint a fortiori."""
    out: list[tuple[str, list[str]]] = []
    for b in batches:
        for m in _UNIQUE_IDX_RE.finditer(b):
            cols = _PK_COL_RE.findall(m.group("cols"))
            if cols:
                out.append((m.group("table"), cols))
    return out


def _parse_type_args(argstr: str | None) -> list[int]:
    if not argstr:
        return []
    if argstr.strip().lower() == "max":
        return [-1]
    return [int(x) for x in argstr.replace(" ", "").split(",") if x]


def parse_create_table(batch: str) -> TableSpec | None:
    m = _CREATE_RE.search(batch)
    if not m:
        return None
    spec = TableSpec(name=m.group(1))
    body = batch[m.end():]
    for line in body.splitlines():
        cm = _COMPUTED_RE.match(line)
        if cm:
            spec.columns.append(ColumnSpec(name=cm.group("name"), dtype="string", computed=True))
            continue
        m2 = _COL_RE.match(line)
        if not m2:
            continue
        base = map_sql_type(m2.group("type"), _parse_type_args(m2.group("args")))
        base.name = m2.group("name")
        base.nullable = m2.group("null").upper() == "NULL"
        base.identity = bool(m2.group("identity"))
        spec.columns.append(base)
    pk = _PK_RE.search(batch)
    if pk:
        spec.pk = _PK_COL_RE.findall(pk.group("cols"))
    return spec


def parse_foreign_keys(batches: list[str]) -> list[tuple[str, FKSpec]]:
    out: list[tuple[str, FKSpec]] = []
    for b in batches:
        for m in _FK_RE.finditer(b):
            out.append(
                (
                    m.group("child"),
                    FKSpec(
                        columns=_PK_COL_RE.findall(m.group("cols")),
                        parent_table=m.group("parent"),
                        parent_columns=_PK_COL_RE.findall(m.group("pcols")),
                        name=m.group("name"),
                        on_delete_cascade=bool(m.group("cascade")),
                    ),
                )
            )
    return out


def parse_schema_script(path: str | Path, encoding: str = "utf-16") -> dict[str, TableSpec]:
    """Full pipeline: script file → {table_name: TableSpec} with FK rules
    wired (FK-over-provider precedence, generate_config_v2.py:81-93)."""
    batches = split_go_batches(read_sql_script(path, encoding))
    tables: dict[str, TableSpec] = {}
    for b in batches:
        t = parse_create_table(b)
        if t is not None:
            tables[t.name] = t
    for child, fk in parse_foreign_keys(batches):
        if child in tables:
            tables[child].fks.append(fk)
    for tname, cols in parse_unique_indexes(batches):
        if tname in tables:
            tables[tname].unique_indexes.append(cols)
    wire_fk_rules(tables)
    return tables


# --- DDL emission (inverse of the parser above) -------------------------

_TSQL_OF = {
    "uuid": "uniqueidentifier",
    "int": "int",
    "short": "smallint",
    "long": "bigint",
    "boolean": "bit",
    "float": "real",
    "double": "float",
    "date": "date",
    "timestamp": "datetime2(7)",
    "time": "time(7)",
    "binary": "varbinary(max)",
}


def _bq(name: str) -> str:
    """Bracket-quote an identifier, doubling ``]`` — the same escaping
    ``ensure_database_statements`` (sinks/jdbc.py) applies. A spec name
    containing ``]`` must not terminate the quote early (malformed, and
    injectable, DDL otherwise). Note the PARSER's ``[^\\]]+`` identifier
    regexes do not unescape ``]]`` back, so the emit→parse fixpoint holds
    only for ``]``-free names — the emitter's job here is to never
    produce malformed DDL, not to extend the parser's surface."""
    return "[" + name.replace("]", "]]") + "]"


def table_to_ddl(spec: TableSpec) -> str:
    """T-SQL ``CREATE TABLE`` for a TableSpec — the emitter the reference
    never needed (it only REPLAYS an existing dump, apply_mssql.py) but a
    catalog-derived pipeline does: specs reflected from a live database
    (S4-S7) or a schema JSONL (S3) become deployable DDL. Exact inverse
    of :func:`parse_create_table` — re-parsing the emitted text yields an
    equal spec (round-trip property-tested, with two DEPLOYABILITY
    corrections the fixpoint tolerates: PK member columns are forced
    NOT NULL — SQL Server rejects nullable PRIMARY KEY members, and
    JSONL-derived specs default nullable — and string lengths outside
    nvarchar's 1..4000 become nvarchar(max), covering catalog-reflected
    CLOB sizes like 2147483647). Unique INDEX statements are not
    emitted (the parser resolves them onto column flags; the original
    index sets are not retained)."""
    lines = [f"CREATE TABLE [dbo].{_bq(spec.name)}("]
    for c in spec.columns:
        if c.computed:
            lines.append(f"\t{_bq(c.name)} AS (NULL),")
            continue
        nullable = c.nullable and c.name not in spec.pk
        null = "NULL" if nullable else "NOT NULL"
        if c.unsafe and c.dtype != "binary":
            # the original out-of-surface type (datetimeoffset/xml/...)
            # is not retained; sql_variant is the stand-in that re-parses
            # to the same unsafe-string spec the original did
            lines.append(f"\t{_bq(c.name)} [sql_variant] {null},")
            continue
        if c.dtype.startswith("decimal"):
            base, args = "numeric", f"({c.precision or 18}, {c.scale or 0})"
        elif c.dtype == "string":
            n = c.length if c.length is not None else 100
            if n == -1 or n > 4000 or n <= 0:
                base, args = "nvarchar", "(max)"
            else:
                base, args = "nvarchar", f"({n})"
        else:
            t = _TSQL_OF.get(c.dtype, "nvarchar(100)")
            base, _, rest = t.partition("(")
            args = f"({rest}" if rest else ""
        ident = " IDENTITY(1,1)" if c.identity else ""
        lines.append(f"\t{_bq(c.name)} [{base}]{args}{ident} {null},")
    if spec.pk:
        cols = ", ".join(f"{_bq(c)} ASC" for c in spec.pk)
        lines.append(
            f" CONSTRAINT {_bq('PK_' + spec.name)} PRIMARY KEY CLUSTERED ({cols})"
        )
    else:
        lines[-1] = lines[-1].rstrip(",")
    lines.append(")")
    return "\n".join(lines)


def fk_to_ddl(child: str, fk: FKSpec) -> str:
    """``ALTER TABLE ... ADD CONSTRAINT ... FOREIGN KEY`` — inverse of
    :func:`parse_foreign_keys`."""
    name = fk.name or f"FK_{child}_{fk.parent_table}_{'_'.join(fk.columns)}"
    cols = ", ".join(_bq(c) for c in fk.columns)
    pcols = ", ".join(_bq(c) for c in fk.parent_columns)
    cascade = " ON DELETE CASCADE" if fk.on_delete_cascade else ""
    return (
        f"ALTER TABLE [dbo].{_bq(child)} WITH CHECK ADD CONSTRAINT {_bq(name)} "
        f"FOREIGN KEY({cols}) REFERENCES [dbo].{_bq(fk.parent_table)} ({pcols})"
        f"{cascade}"
    )


def schema_to_ddl(tables: dict[str, TableSpec]) -> list[str]:
    """Deployable batches for a whole schema: CREATE TABLEs in FK
    dependency order, then every FK constraint (so self-references and
    mutual FKs attach after both tables exist — the dump layout
    script.sql itself uses). FKs whose parent is OUTSIDE the schema are
    skipped (the same rule toposort applies) — emitting them would be a
    guaranteed-failing ALTER. Feed straight into
    ``sinks.deploy.deploy_statements``."""
    from ..plans.toposort import toposort_tables

    out = [table_to_ddl(tables[n]) for n in toposort_tables(tables)]
    for n, spec in tables.items():
        for fk in spec.fks:
            if fk.parent_table in tables:
                out.append(fk_to_ddl(n, fk))
    return out
