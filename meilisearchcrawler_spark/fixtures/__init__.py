"""Deterministic fixtures: the synthetic web (the fetch UDF's
"network") and the image+caption payload table from BASELINE
``input_hint``. Seeded — no external data."""
