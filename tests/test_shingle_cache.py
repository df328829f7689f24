"""The catalog's shared shingle cache must not serve stale data when the
underlying documents table is regenerated in-place (r4 ADVICE): the cache
key carries a fingerprint (path, mtime, size) of the parquet files."""

import os
import shutil

from logvision_spark.catalog import (
    _docs_fingerprint,
    _shared_shingles,
    invalidate_shingle_cache,
)
from logvision_spark.sources.readers import load_table_cache_clear

SF_DIR = os.environ.get("LOGVISION_TEST_SF_DIR", "/root/testdata/sf0.001")


def _copy_docs(dst: str) -> None:
    src = os.path.join(SF_DIR, "documents.parquet")
    if os.path.isfile(src):
        shutil.copy2(src, os.path.join(dst, "documents.parquet"))
    else:
        shutil.copytree(src, os.path.join(dst, "documents.parquet"))


def test_fingerprint_tracks_mtime_and_size(tmp_path):
    d = str(tmp_path)
    _copy_docs(d)
    fp1 = _docs_fingerprint(d)
    assert fp1, "fingerprint should see the copied parquet"
    fp_again = _docs_fingerprint(d)
    assert fp1 == fp_again
    # touch one underlying file: fingerprint must change
    root = os.path.join(d, "documents.parquet")
    target = root if os.path.isfile(root) else os.path.join(
        root, sorted(os.listdir(root))[0]
    )
    st = os.stat(target)
    os.utime(target, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    assert _docs_fingerprint(d) != fp1


def test_cache_invalidates_on_regeneration(spark, tmp_path):
    d = str(tmp_path)
    _copy_docs(d)
    invalidate_shingle_cache()
    load_table_cache_clear()
    try:
        first = _shared_shingles(spark, d)
        assert _shared_shingles(spark, d) is first  # steady state: cached
        root = os.path.join(d, "documents.parquet")
        target = root if os.path.isfile(root) else os.path.join(
            root, sorted(os.listdir(root))[0]
        )
        st = os.stat(target)
        os.utime(target, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
        load_table_cache_clear()  # regenerated table ⇒ resolution redone
        second = _shared_shingles(spark, d)
        assert second is not first, "stale cache served after regeneration"
    finally:
        invalidate_shingle_cache()
        load_table_cache_clear()
