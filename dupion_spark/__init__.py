"""dupion_spark — a PySpark-native near-duplicate detection & clustering engine.

A from-scratch reimplementation of the *semantics* of qwertz19281/dupion
(reference at /root/reference, Rust), regrafted from local files/folders onto
columnar tables of image+caption pairs designed for 10^12-row scale:

- exact duplicate detection: cheap-key pregroup -> prune -> decoded-pixel
  SHA-256 -> hash groups (mirrors dupion's size-pregroup then blake3 pipeline,
  reference dupion/src/state/mod.rs:95-111, dupion/src/driver/platterwalker.rs:268-344)
- near-duplicate detection: MinHash over caption shingles + SimHash/pHash band
  keys over pixel blocks -> LSH banding -> candidate pairs -> PSNR/LCS verify
  -> connected components (no reference analog; dupion is exact-only)
- per-partition rollup + shadow marking (mirrors dupion's recursive dir-hash
  rollup and shadow propagation, dupion/src/process/mod.rs:35-136)
- canonical ("senpai") election per cluster (dupion/src/dedup/mod.rs:60-79)

Everything is the DataFrame API + vectorized pandas/Arrow UDFs; no RDDs, no
per-row Python UDFs, no Catalyst extensions.
"""

__version__ = "0.1.0"

from dupion_spark.config import DedupConfig  # noqa: F401
