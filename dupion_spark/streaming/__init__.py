"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §2.9: incremental behavior comes from
its cache, not a streaming runtime), so streaming here is a graft extension:
continuous ingest of new image rows with streaming exact-dedup against the
already-ingested corpus, the shape a production 10^12-row pipeline uses to
keep the dedup tables current between full near-dup recomputes.
"""
