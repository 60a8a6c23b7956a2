"""Expression-level function library: seeded deterministic generators and
vector helpers. Everything returns pyspark Column trees — JVM-side,
whole-stage-codegen'd, never row-at-a-time Python."""
