"""fixture_tag must bind caches to the fixture vintage: same files →
same tag; any rewrite (mtime/size change) → different tag. This is the
property that stops .scratch from serving stale derived data after the
driver regenerates /root/testdata between rounds."""

from __future__ import annotations

import os
import shutil

from stockmarketdata_dwb_etl_spark.scratch import fixture_tag


def test_tag_changes_when_fixture_rewritten(tmp_path):
    src = "/root/testdata/sf0.001"
    mirror = tmp_path / "sf0.001"
    mirror.mkdir()
    for f in os.listdir(src):
        if f.endswith(".parquet"):
            shutil.copy2(os.path.join(src, f), mirror / f)  # preserves mtime

    t1 = fixture_tag(str(mirror))
    assert t1 == fixture_tag(str(mirror)), "tag must be deterministic"
    assert t1.startswith("sf0_001_")
    # identifier-safe: used inside saveAsTable names
    assert all(c.isalnum() or c == "_" for c in t1)

    os.utime(mirror / "events.parquet")  # simulate driver regeneration
    t2 = fixture_tag(str(mirror))
    assert t2 != t1, "rewritten fixture must land in a fresh cache dir"
