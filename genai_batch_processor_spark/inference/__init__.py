"""Inference boundary: pluggable clients, mock backend, mapInPandas runner,
and the driver-side async-batch orchestrator (SURVEY.md §2 #9-11, #24-25)."""
