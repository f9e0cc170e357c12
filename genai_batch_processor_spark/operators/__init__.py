"""DataFrame operators: the engine's query surface (SURVEY.md §2)."""
