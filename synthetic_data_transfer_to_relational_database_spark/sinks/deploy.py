"""DDL deployment pipeline: script file → sanitized batches → database.

The reference's apply_mssql.py main() flow (SURVEY.md §3.3), composed from
the source-side parsing (sources/ddl.py handles S1 encoding fallback, S2
GO-splitting, F1-F3 batch filters, P1 identifier rewrite) and the
driver-side executor (sinks/jdbc.py K1). Per-batch error containment:
one broken batch never aborts the deploy (apply_mssql.py:94-102).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..sources.ddl import filter_batches, read_sql_script, split_go_batches
from .jdbc import JdbcTarget, ensure_database, execute_statements


def deploy_script(
    spark: SparkSession,
    target: JdbcTarget,
    script_path: str,
    encoding: str = "utf-16",
    target_db: str | None = None,
    source_db: str | None = None,
    create_db: bool = False,
    admin_target: JdbcTarget | None = None,
) -> list[tuple[str, str | None]]:
    """Read, split, sanitize, and replay a DDL dump into ``target``.

    With ``create_db`` the deploy is bracketed by K2
    :func:`ensure_database` (apply_mssql.py:27-43's check-then-create,
    run before any batch executes): for mssql the probe/create runs
    against ``admin_target`` (the reference's ``master`` connection) or,
    when omitted, ``target`` itself; ``target_db`` names the database to
    ensure (for derby the URL already names it).

    Returns the per-batch (statement, error-or-None) log so callers can
    inspect which batches failed without losing the rest.
    """
    if create_db:
        ensure_database(spark, admin_target or target, target_db or "")
    script = read_sql_script(script_path, encoding=encoding)
    batches = filter_batches(split_go_batches(script), target_db=target_db, source_db=source_db)
    return execute_statements(spark, target, batches, continue_on_error=True)


def deploy_statements(
    spark: SparkSession, target: JdbcTarget, statements: list[str]
) -> list[tuple[str, str | None]]:
    """Replay pre-built DDL statements (e.g. from
    ``sources.ddl.schema_to_ddl`` — the emitter that turns
    catalog-/JSONL-derived TableSpecs into deployable T-SQL)."""
    return execute_statements(spark, target, statements, continue_on_error=True)
