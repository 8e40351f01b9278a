"""Single source of truth for raw-parquet input discovery.

Both the resume fingerprint (sources/checkpoint.fingerprint_files) and the
worker-side feature scan (operators/features.extract_features_from_files)
must see EXACTLY the same file set — if the two globs ever drifted, a file
visible to the scan but invisible to the fingerprint would silently escape
the F5 change-invalidation guarantee.
"""

from __future__ import annotations

import glob
import os


def list_parquet_files(source_path: str) -> list[str]:
    """All parquet data files for a file/dir input path, sorted.

    Matches Spark's parquet reader for the layouts the engine writes: a
    single file, or a directory of *.parquet parts (nested subdirectories
    are deliberately NOT picked up — partitioned layouts go through the
    table-format path, not this raw-file fallback)."""
    if os.path.isfile(source_path):
        return [source_path]
    return sorted(glob.glob(os.path.join(source_path, "*.parquet")))
