"""Structured Streaming surface (SURVEY.md §7.6 north-star; no streaming
exists in the reference — delta-unity-duckdb.js:637-643 is one-shot batch)."""
