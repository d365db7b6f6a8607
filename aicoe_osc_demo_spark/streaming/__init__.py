"""Incremental / streaming surface (SURVEY.md §2.10)."""

from .incremental import incremental_file_pipeline, windowed_event_counts, sessionize

__all__ = ["incremental_file_pipeline", "windowed_event_counts", "sessionize"]
