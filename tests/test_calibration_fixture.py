"""Pin the committed calibration fixture's bytes (no Spark).

bench.py's host probe times a scan-agg over
tools/fixtures/calibration.parquet; every committed probe_floor_sec in
BENCH_BUDGETS.json was measured against these EXACT bytes. The
generator predates the uint64-wrap fix (tools/gen_calibration.py:10
documents this), so an accidental regeneration — different numpy,
different parquet encoder — would produce a file the probe reads at a
different speed, silently shifting every future host_factor and the
drift alarm's baseline. The sha pin turns that silent shift into a
test failure; if the fixture is ever deliberately re-frozen, update
the sha AND re-measure probe_floor_sec in the same commit.
"""
import hashlib
import os

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "fixtures",
    "calibration.parquet",
)

PINNED_SHA256 = "591b266158051e40fd58344cc5a1d87ea90a50c9d8fbae269f90c9ed496115cd"


def test_calibration_fixture_sha_pinned():
    with open(FIXTURE, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()
    assert digest == PINNED_SHA256, (
        "calibration.parquet changed on disk; the probe floors in "
        "BENCH_BUDGETS.json were measured against the pinned bytes — "
        "re-freeze deliberately (new sha + re-measured probe_floor_sec "
        "in one commit) or restore the committed fixture"
    )
