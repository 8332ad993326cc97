"""CLI entry points mirroring the reference scripts (SURVEY.md §2.5)."""
