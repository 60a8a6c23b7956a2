"""Mini-ERP generator fixture (FIXTURES.md §B): 7 tables distilled from
the reference's script.sql, each exercising one hard structural pattern —
natural-key lookup chain, identity PK, self-referencing FKs, shared-PK
subtype, wide decimal fact, composite PK, skip-columns."""

from __future__ import annotations

from synthetic_data_transfer_to_relational_database_spark.plans.model import (
    ColumnSpec,
    FKSpec,
    TableSpec,
    wire_fk_rules,
)


def mini_erp() -> dict[str, TableSpec]:
    tables = {
        "Ulke": TableSpec(
            name="Ulke",
            columns=[
                ColumnSpec("NumKod", "string", nullable=False, length=3),
                ColumnSpec("Kod", "string", nullable=True, length=3),
                ColumnSpec("Ad", "string", nullable=False, length=100),
                ColumnSpec("TenantId", "uuid", nullable=False, length=36),
            ],
            pk=["NumKod"],
        ),
        "Il": TableSpec(
            name="Il",
            columns=[
                ColumnSpec("Kod", "string", nullable=False, length=3),
                ColumnSpec("Ad", "string", nullable=False, length=100),
                ColumnSpec("UlkeNumKod", "string", nullable=False, length=3),
                ColumnSpec("TenantId", "uuid", nullable=False, length=36),
            ],
            pk=["Kod"],
            fks=[FKSpec(["UlkeNumKod"], "Ulke", ["NumKod"])],
        ),
        "Banka": TableSpec(
            name="Banka",
            columns=[
                ColumnSpec("Id", "int", nullable=False, identity=True),
                ColumnSpec("Kod", "string", nullable=False, length=3),
                ColumnSpec("Ad", "string", nullable=False, length=100),
                ColumnSpec("UlkeNumKod", "string", nullable=False, length=3),
                ColumnSpec("TenantId", "uuid", nullable=False, length=36),
            ],
            pk=["Id"],
            fks=[FKSpec(["UlkeNumKod"], "Ulke", ["NumKod"])],
        ),
        "CariHesap": TableSpec(
            name="CariHesap",
            columns=[
                ColumnSpec("Id", "uuid", nullable=False, length=36),
                ColumnSpec("Unvan", "string", nullable=False, length=100),
                ColumnSpec("MusterekHesapId", "uuid", nullable=True, length=36),
                ColumnSpec("FaturaHesapId", "uuid", nullable=True, length=36),
                ColumnSpec("UlkeNumKod", "string", nullable=True, length=3),
                ColumnSpec("TenantId", "uuid", nullable=False, length=36),
            ],
            pk=["Id"],
            fks=[
                FKSpec(["MusterekHesapId"], "CariHesap", ["Id"]),
                FKSpec(["FaturaHesapId"], "CariHesap", ["Id"]),
                FKSpec(["UlkeNumKod"], "Ulke", ["NumKod"]),
            ],
        ),
        "BelgeBaslik": TableSpec(
            name="BelgeBaslik",
            columns=[
                ColumnSpec("Id", "uuid", nullable=False, length=36),
                ColumnSpec("BelgeNo", "string", nullable=False, length=20),
                ColumnSpec("Tarih", "date", nullable=False),
                ColumnSpec("DovizKuru", "decimal(25,6)", nullable=True, precision=25, scale=6),
                ColumnSpec("TenantId", "uuid", nullable=False, length=36),
            ],
            pk=["Id"],
        ),
        "SatisBelge": TableSpec(
            name="SatisBelge",
            columns=[
                ColumnSpec("Id", "uuid", nullable=False, length=36),
                ColumnSpec("Saat", "time", nullable=True),
                ColumnSpec("TenantId", "uuid", nullable=False, length=36),
            ],
            pk=["Id"],
            fks=[FKSpec(["Id"], "BelgeBaslik", ["Id"])],
        ),
        "CariHareket": TableSpec(
            name="CariHareket",
            columns=[
                ColumnSpec("Id", "uuid", nullable=False, length=36),
                ColumnSpec("BelgeTip", "int", nullable=False),
                ColumnSpec("BelgeTarih", "date", nullable=False),
                ColumnSpec("BelgeNo", "string", nullable=False, length=20),
                ColumnSpec("CariHesapId", "uuid", nullable=False, length=36),
                ColumnSpec("Tutar", "decimal(25,6)", nullable=True, precision=25, scale=6),
                ColumnSpec("DovizKuru", "decimal(25,6)", nullable=True, precision=25, scale=6),
                ColumnSpec("KdvOran", "float", nullable=True),
                ColumnSpec("Aciklama", "string", nullable=True, length=200),
                ColumnSpec("IBAN", "string", nullable=True, length=40),
                ColumnSpec("VadeTarih", "date", nullable=False),
                ColumnSpec("Kod10", "short", nullable=True),
                ColumnSpec("RowVersion", "binary", nullable=False, unsafe=True),
                ColumnSpec("CreateDate", "timestamp", nullable=True, computed=True),
                ColumnSpec("TenantId", "uuid", nullable=False, length=36),
            ],
            pk=["Id"],
            fks=[FKSpec(["CariHesapId"], "CariHesap", ["Id"])],
        ),
        "Referans": TableSpec(
            name="Referans",
            columns=[
                ColumnSpec("TenantId", "uuid", nullable=False, length=36),
                ColumnSpec("Kod", "string", nullable=False, length=20),
                ColumnSpec("TipId", "int", nullable=False),
                ColumnSpec("Deger", "string", nullable=True, length=50),
            ],
            pk=["TenantId", "Kod", "TipId"],
        ),
    }
    wire_fk_rules(tables)
    return tables
