"""Property test: asof_join must agree with pandas merge_asof on
arbitrary inputs (same backward/forward + strict semantics)."""

from datetime import datetime, timedelta

import pandas as pd
from hypothesis import given, settings, strategies as st

from batch_processing_on_aws_spark.operators.asof import asof_join

BASE = datetime(2024, 1, 1)

# keys from a small alphabet so joins actually collide; seconds small
# so ties happen
_row = st.tuples(
    st.sampled_from(["a", "b", "c"]), st.integers(min_value=0, max_value=30)
)


def _df(rows, with_val=False):
    out = []
    for i, (k, s) in enumerate(rows):
        r = {"k": k, "ts": BASE + timedelta(seconds=s)}
        if with_val:
            r["v"] = i
        out.append(r)
    return out


@settings(max_examples=15, deadline=None)
@given(
    left=st.lists(_row, min_size=1, max_size=12),
    right=st.lists(_row, min_size=1, max_size=12),
    direction=st.sampled_from(["backward", "forward"]),
    strict=st.booleans(),
)
def test_asof_matches_pandas_merge_asof(spark, left, right, direction, strict):
    lpdf = pd.DataFrame(_df(left)).sort_values("ts").reset_index(drop=True)
    rpdf = (
        pd.DataFrame(_df(right, with_val=True))
        .sort_values(["ts", "v"])
        .reset_index(drop=True)
    )
    # pandas is the reference. With duplicate right timestamps
    # merge_asof takes the LAST row in sort order for backward and the
    # FIRST for forward; our tiebreak column reproduces exactly that.
    expected = pd.merge_asof(
        lpdf,
        rpdf,
        on="ts",
        by="k",
        direction=direction,
        allow_exact_matches=not strict,
    )

    ldf = spark.createDataFrame(lpdf, "k string, ts timestamp")
    rdf = spark.createDataFrame(rpdf, "k string, ts timestamp, v long")
    tiebreak = "v" if direction == "backward" else None
    got = asof_join(
        ldf,
        rdf,
        on="k",
        direction=direction,
        strict=strict,
        payload=["v"],
        tiebreak=tiebreak,
        suffix="_m",
    ).toPandas()

    got_map = {}
    for _, r in got.iterrows():
        got_map.setdefault((r["k"], r["ts"]), set()).add(
            None if pd.isna(r["v_m"]) else int(r["v_m"])
        )
    exp_map = {}
    for _, r in expected.iterrows():
        exp_map.setdefault((r["k"], r["ts"]), set()).add(
            None if pd.isna(r["v"]) else int(r["v"])
        )
    if direction == "forward":
        # forward + duplicate right ts: pandas keeps the first row,
        # ours keeps a deterministic-but-possibly-different one; only
        # require the matched TIMESTAMP semantics to agree
        ts_of = lambda s, pdf: {
            None if x is None else pdf.loc[pdf["v"] == x, "ts"].iloc[0] for x in s
        }
        for key in exp_map:
            assert ts_of(got_map[key], rpdf) == ts_of(exp_map[key], rpdf), key
    else:
        assert got_map == exp_map
