"""Structured Streaming surface: continuous harvesting over a pages
stream (the reference is a periodically-triggered batch harvester,
docs/overview.rst:17 — streaming is the engine-mode extension)."""
