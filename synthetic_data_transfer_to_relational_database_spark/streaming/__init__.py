"""Structured-Streaming face of the engine (SURVEY.md §2.3, §7 Phase 3)."""
