"""In-process reference-semantics oracle (SURVEY.md §5 item 2)."""
