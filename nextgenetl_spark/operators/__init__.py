"""Relational operator compositions (SURVEY.md §2) as DataFrame → DataFrame
functions. Everything is declarative DataFrame API so Catalyst handles
pushdown, pruning, and join planning."""
