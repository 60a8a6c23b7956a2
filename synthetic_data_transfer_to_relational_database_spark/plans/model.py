"""Schema model: the plan-time representation of a relational schema.

Mirrors the per-column metadata the reference carries (run_engine.py:107-116:
name, type, nullable, char length, precision/scale, is_identity,
is_computed) plus FK bindings (run_engine.py:132-138) and PK shape —
mapped 1:1 onto Spark ``StructField`` + metadata (SURVEY.md §1.2).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


@dataclass
class ColumnSpec:
    name: str
    dtype: str  # canonical: string|uuid|int|short|long|boolean|float|double|date|timestamp|time|binary|decimal(p,s)
    nullable: bool = True
    length: int | None = None  # char length; -1 means MAX
    precision: int | None = None
    scale: int | None = None
    identity: bool = False  # IDENTITY(1,1) — never generated (run_engine.py:243)
    computed: bool = False  # computed column — never generated
    fk_parent: str | None = None  # "ParentTable.ParentColumn"
    rule: str | None = None  # generation rule "provider[:args]"
    unsafe: bool = False  # outside SAFE_TYPES (rowversion/varbinary) — dropped (run_engine.py:105)
    description: str | None = None  # docs text (JSONL description_tr) — drives tier-2 rules
    fk_salt: str | None = None  # shared sampling salt: composite-FK columns pick the SAME parent row
    unique: bool = False  # member of a unique index resolved onto this column:
    # FK columns sample parents WITHOUT replacement, others get injective rules

    def spark_type(self) -> DataType:
        d = self.dtype
        if d.startswith("decimal"):
            return DecimalType(self.precision or 18, self.scale or 2)
        return {
            "string": StringType(),
            "uuid": StringType(),
            "time": StringType(),
            "int": IntegerType(),
            "short": ShortType(),
            "long": LongType(),
            "boolean": BooleanType(),
            "float": FloatType(),
            "double": DoubleType(),
            "date": DateType(),
            "timestamp": TimestampType(),
            "binary": BinaryType(),
        }[d]

    def struct_field(self) -> StructField:
        meta = {
            k: v
            for k, v in {
                "length": self.length,
                "precision": self.precision,
                "scale": self.scale,
                "identity": self.identity or None,
                "computed": self.computed or None,
                "fk_parent": self.fk_parent,
                "rule": self.rule,
            }.items()
            if v is not None
        }
        return StructField(self.name, self.spark_type(), self.nullable, metadata=meta)


@dataclass
class FKSpec:
    columns: list[str]
    parent_table: str
    parent_columns: list[str]
    name: str | None = None
    on_delete_cascade: bool = False

    @property
    def is_self_reference(self) -> bool:
        return False  # resolved by TableSpec context; see TableSpec.self_fks


@dataclass
class TableSpec:
    name: str
    columns: list[ColumnSpec] = field(default_factory=list)
    pk: list[str] = field(default_factory=list)
    fks: list[FKSpec] = field(default_factory=list)
    # CREATE UNIQUE INDEX column tuples (script.sql:2549-3814 declares 31
    # unique + 7 filtered indexes, e.g. uBankaUlkeKod script.sql:2621).
    # The reference's generator can violate them (SURVEY.md §1.3 known
    # gap); our rules enforce them via injective member columns.
    unique_indexes: list[list[str]] = field(default_factory=list)

    def column(self, name: str) -> ColumnSpec:
        for c in self.columns:
            if c.name == name:
                return c
        raise KeyError(f"{self.name}.{name}")

    @property
    def generated_columns(self) -> list[ColumnSpec]:
        """Columns the generator must fill — excludes identity/computed
        (run_engine.py:243) and non-SAFE_TYPES columns (run_engine.py:105)."""
        return [c for c in self.columns if not (c.identity or c.computed or c.unsafe)]

    def self_fks(self) -> list[FKSpec]:
        return [f for f in self.fks if f.parent_table == self.name]

    def foreign_fks(self) -> list[FKSpec]:
        return [f for f in self.fks if f.parent_table != self.name]

    def shared_pk_fk(self) -> FKSpec | None:
        """Subtype pattern: the PK itself is an FK to the parent's PK
        (e.g. FK_SatisBelge_BelgeBaslik_Id, script.sql:4256-4257). Child
        PKs must be sampled from parent PKs without replacement."""
        for f in self.foreign_fks():
            if self.pk and set(f.columns) == set(self.pk):
                return f
        return None

    def schema(self) -> StructType:
        return StructType([c.struct_field() for c in self.generated_columns])


def wire_fk_rules(tables: dict[str, TableSpec]) -> None:
    """Mark each FK column's ColumnSpec with its parent binding — FK rules
    take precedence over any provider rule (generate_config_v2.py:81-93)."""
    for t in tables.values():
        for fk in t.fks:
            # one salt per FK constraint: composite-FK columns must sample
            # the SAME parent row or the generated tuple may not exist
            salt = f"{t.name}.fk.{fk.parent_table}.{','.join(fk.columns)}"
            for col, pcol in zip(fk.columns, fk.parent_columns):
                try:
                    spec = t.column(col)
                except KeyError:
                    continue
                spec.fk_parent = f"{fk.parent_table}.{pcol}"
                spec.rule = f"foreign_key:{fk.parent_table}.{pcol}"
                spec.fk_salt = salt
