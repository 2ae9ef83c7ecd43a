"""Structured Streaming surfaces (live metrics rollup — the
status.json analog, S9/A2)."""
