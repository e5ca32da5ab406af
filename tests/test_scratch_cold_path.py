"""Cold-cache smoke for the shared ``_scratch_root`` harness.

Round-11 refactored the three standing-index goldens (IVF, dup
clusters, text index) onto one content-keyed scratch layout, but the
marker-write sites kept referencing a ``key`` local that the helper no
longer leaves in scope — so every *fresh* machine (or regenerated
fixture) crashed with NameError while warm scratch kept local runs
green. This test deletes the scratch roots first, runs each golden
from truly cold cache, and asserts the _COMPLETE marker carries the
content key, so the masked-on-retry failure mode can't come back.
"""
import os
import shutil

import pytest

from batch_processing_on_aws_spark.plans import golden
from tests.conftest import SF_SMOKE


@pytest.mark.parametrize(
    "table,prefix,fn,check",
    [
        (
            "embeddings",
            "spark_graft_ivf",
            golden.incremental_ivf_topk,
            lambda df: df.count() > 0,
        ),
        (
            "documents",
            "spark_graft_cidx",
            golden.incremental_dup_clusters,
            lambda df: df.count() > 0,
        ),
        (
            "documents",
            "spark_graft_tidx2",
            golden.standing_bm25_search,
            lambda df: df.count() > 0,
        ),
    ],
)
def test_cold_scratch_build(spark, table, prefix, fn, check):
    root, _, _, _, done = golden._scratch_root(SF_SMOKE, table, prefix)
    shutil.rmtree(root, ignore_errors=True)
    assert not os.path.exists(done)
    df = fn(spark, SF_SMOKE)
    assert check(df)
    # the marker must exist AND carry the content key (the basename
    # embeds it), proving the write ran after a successful cold build
    with open(done) as f:
        marker = f.read()
    assert marker == os.path.basename(root)
