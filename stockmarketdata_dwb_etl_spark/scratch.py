"""Scratch-cache tagging: bind derived artifacts to the fixture vintage.

Several queries materialize derived data under ``/root/repo/.scratch``
(stream replay chunks, JSONL/ORC/CSV roundtrips, IVF indexes, bucketed
tables) and reuse it across runs via a ``_SUCCESS`` probe. The external
driver regenerates ``/root/testdata`` between rounds, so a cache keyed on
the scale-factor name alone would silently serve data derived from a STALE
fixture (observed in round 2: the events fixture changed vintage and the
cached JSONL no longer matched). ``fixture_tag`` folds a fingerprint of
every fixture file's (name, size, mtime) into the cache directory name, so
a regenerated fixture lands in a fresh directory and old caches are simply
orphaned.
"""

from __future__ import annotations

import glob
import hashlib
import os

SCRATCH = "/root/repo/.scratch"


def fixture_tag(sf_dir: str) -> str:
    """Scale-factor tag + 8-hex fingerprint of the fixture files' identity.

    Stat-based (no data read): (basename, size, mtime_ns) per parquet file
    is enough to change whenever the driver rewrites the fixtures.
    """
    base = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    h = hashlib.md5()
    for path in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        st = os.stat(path)
        h.update(f"{os.path.basename(path)}:{st.st_size}:{st.st_mtime_ns};".encode())
    # underscore separator: the tag is also used inside SQL identifiers
    # (saveAsTable bucketed-table names), where a dash would not parse
    return f"{base}_{h.hexdigest()[:8]}"
