"""JSONL schema-description source (reference S3).

Parses line-delimited ``{table_name, columns[], foreign_keys[]}`` records
(the generate_config_v2.py:69-97 input format: columns carry
``column_name`` / ``data_type`` / ``description_tr``; foreign keys carry
``column`` / ``references: "Parent.Col"``) into TableSpecs. Bad lines are
skipped, matching the reference's PERMISSIVE behavior.

Driver-side metadata work; for data-scale JSONL use ``spark.read.json``
— a schema description is never data-sized.
"""

from __future__ import annotations

import json
from pathlib import Path

from ..plans.model import FKSpec, TableSpec, wire_fk_rules
from .ddl import map_sql_type


def parse_jsonl_schema(path: str | Path) -> dict[str, TableSpec]:
    tables: dict[str, TableSpec] = {}
    for line in Path(path).read_text(encoding="utf-8").splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue  # skip bad lines (generate_config_v2.py:95-97)
        name = rec.get("table_name")
        if not name:
            continue
        spec = TableSpec(name=name)
        for col in rec.get("columns", []):
            col_name = col.get("column_name")
            if not col_name:
                continue
            raw_type = (col.get("data_type") or "nvarchar").lower()
            base, _, argstr = raw_type.partition("(")
            args = []
            if argstr:
                for a in argstr.rstrip(")").split(","):
                    a = a.strip()
                    args.append(-1 if a == "max" else int(a) if a.isdigit() else 0)
            cs = map_sql_type(base.strip(), args)
            cs.name = col_name
            cs.nullable = bool(col.get("nullable", True))
            cs.description = col.get("description_tr") or col.get("description")
            spec.columns.append(cs)
        for fk in rec.get("foreign_keys", []):
            if "column" not in fk or "references" not in fk:
                continue
            parent, _, pcol = fk["references"].partition(".")
            spec.fks.append(FKSpec([fk["column"]], parent, [pcol or "Id"]))
        pk = rec.get("primary_key")
        spec.pk = pk if isinstance(pk, list) else [pk] if pk else (
            ["Id"] if any(c.name == "Id" for c in spec.columns) else []
        )
        tables[name] = spec
    wire_fk_rules(tables)
    return tables
