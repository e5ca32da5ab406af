"""Generate the frozen calibration fixture for bench.py's host probe.

Writes tools/fixtures/calibration.parquet — a single deterministic
pyarrow file (1.5M rows: id, v, s) that is COMMITTED and never
regenerated: the probe's scan-agg time over these exact bytes gauges
the host, independent of any engine code under test. Re-running this
script reproduces deterministic logical content (fixed seed-free
integer recurrences, no RNG state, no timestamps), but the point is
to not re-run it — the committed bytes are the reference. NOTE: the
committed fixture was generated before the uint64 wrap fix below (the
old int64 multiply was silently promoted to float64 by numpy 1.x);
re-running today yields different — but now cross-numpy-stable —
content. Do not regenerate; the probe only needs frozen bytes.

Usage: python tools/gen_calibration.py
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "tools", "fixtures", "calibration.parquet")

N = 1_500_000


def main() -> int:
    ids = np.arange(N, dtype=np.int64)
    # deterministic mixed-entropy columns: enough value variety that
    # parquet can't RLE the whole thing away, zero RNG state
    v = ((ids * 2654435761) % 1_000_003).astype(np.float64) / 997.0
    # wrap-around multiply in uint64: int64 would overflow (numpy 1.x
    # silently promotes to float64, numpy 2.x/NEP 50 raises), breaking
    # the "re-run reproduces identical content" contract
    s = np.char.add(
        "k",
        (
            (ids.astype(np.uint64) * np.uint64(11400714819323198485))
            % np.uint64(1 << 20)
        ).astype("U8"),
    )
    tbl = pa.table(
        {
            "id": pa.array(ids),
            "v": pa.array(v),
            "s": pa.array(s.tolist(), type=pa.string()),
        }
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(tbl, OUT, compression="snappy", row_group_size=200_000)
    print(f"wrote {OUT}: {os.path.getsize(OUT)} bytes, {N} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
