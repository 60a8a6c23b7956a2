"""Relational sinks: JDBC bulk load + DDL deploy (reference K1-K4)."""
