"""Operators: the engine's dataflow building blocks (SURVEY.md §2)."""
