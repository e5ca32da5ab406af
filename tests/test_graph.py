import numpy as np
import pytest

from batch_processing_on_aws_spark.operators.graph import page_rank


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["rank"] for r in page_rank(df, **kw).collect()}


def test_two_node_cycle_is_uniform(spark):
    got = _ranks(spark, [(1, 2), (2, 1)], n_iter=8)
    assert got[1] == pytest.approx(0.5, abs=1e-12)
    assert got[2] == pytest.approx(0.5, abs=1e-12)


def test_dangling_chain_closed_form(spark):
    """a→b with b dangling, one iteration from uniform: b's whole rank
    redistributes uniformly, so r(a) = 0.15/2 + 0.85·(0.5/2) = 0.2875
    and r(b) = 0.15/2 + 0.85·(0.5 + 0.5/2) = 0.7125. Mass conserved."""
    got = _ranks(spark, [(1, 2)], n_iter=1)
    assert got[1] == pytest.approx(0.2875, abs=1e-12)
    assert got[2] == pytest.approx(0.7125, abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_mass_conserved_and_authority_ranks_higher(spark):
    # 1..5 all link to 6; 6 links back to 1 — 6 is the authority.
    # The 1↔6 near-cycle makes convergence oscillate with period 2
    # (decaying by damping² per double-step), so run long enough for
    # the stationary ordering: r6 = 0.13125/0.2775 ≈ 0.473 > r1 ≈ 0.427
    edges = [(i, 6) for i in range(1, 6)] + [(6, 1)]
    got = _ranks(spark, edges, n_iter=40)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert got[6] == max(got.values())
    assert got[6] == pytest.approx(0.13125 / 0.2775, abs=1e-3)
    assert got[1] > got[2]  # 1 receives 6's endorsement, 2..5 only base
    assert got[2] == pytest.approx(got[5], abs=1e-12)  # symmetric peers


def test_matches_numpy_power_iteration(spark):
    """Same damped power iteration (with dangling redistribution) in
    NumPy on a fixed 8-node graph — values agree to 1e-9 after the
    same number of iterations."""
    rng_edges = [
        (0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 4), (4, 5),
        (5, 4), (6, 2), (6, 0), (7, 6), (2, 7),
    ]
    n, d, iters = 8, 0.85, 10
    r = np.full(n, 1.0 / n)
    deg = np.zeros(n)
    for s, _ in rng_edges:
        deg[s] += 1
    for _ in range(iters):
        nxt = np.full(n, (1 - d) / n)
        dangling = r[deg == 0].sum()
        nxt += d * dangling / n
        for s, t in rng_edges:
            nxt[t] += d * r[s] / deg[s]
        r = nxt
    got = _ranks(spark, rng_edges, n_iter=iters)
    for node in range(n):
        assert got[node] == pytest.approx(r[node], abs=1e-9), node


def test_parallel_edges_double_share_and_bad_damping(spark):
    got = _ranks(spark, [(1, 2), (1, 2), (1, 3)], n_iter=1)
    # node 2 receives 2/3 of node 1's share, node 3 receives 1/3
    assert got[2] > got[3]
    with pytest.raises(ValueError, match="damping"):
        _ranks(spark, [(1, 2)], damping=1.0)


# --------------------------------------------------------- exact (BIGINT)

def _exact_ranks(spark, edges, **kw):
    from batch_processing_on_aws_spark.operators.graph import page_rank_exact

    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["rank_micro"]
        for r in page_rank_exact(df, **kw).collect()
    }


def _py_exact(edges, n_iter, scale=10**12, num=85, den=100):
    """The integer recurrence page_rank_exact implements, in pure
    Python big-int arithmetic (bit-exact ground truth)."""
    from collections import defaultdict

    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    deg = defaultdict(int)
    outs = defaultdict(list)
    for s, d in edges:
        deg[s] += 1
        outs[s].append(d)
    r = {v: scale // n for v in nodes}
    for _ in range(n_iter):
        ins = defaultdict(int)
        for s in outs:
            c = r[s] // deg[s]
            for d in outs[s]:
                ins[d] += c
        dang = sum(r[v] for v in nodes if v not in deg)
        r = {
            v: (scale * (den - num)) // (den * n)
            + (num * (ins[v] + dang // n)) // den
            for v in nodes
        }
    return r


def test_exact_matches_python_bigint_recurrence(spark):
    """page_rank_exact is BIT-EXACT against the pure-Python integer
    recurrence on a graph with cycles, parallel-free fan-in, and a
    dangling sink — the property that makes supplier_pagerank's
    DuckDB oracle replayable."""
    edges = [
        (0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 4), (4, 5),
        (6, 2), (6, 0), (7, 6), (2, 7),
    ]  # node 5 is dangling
    want = _py_exact(edges, n_iter=10)
    got = _exact_ranks(spark, edges, n_iter=10)
    assert got == want


def test_exact_tracks_float_operator(spark):
    """The quantized trajectory stays within quantization error of the
    float operator: |rank_micro/scale - rank| < n_iter * n / scale
    slack (floor losses accumulate per round)."""
    edges = [(i, 6) for i in range(1, 6)] + [(6, 1)]
    flt = _ranks(spark, edges, n_iter=8)
    q = _exact_ranks(spark, edges, n_iter=8)
    for node, rank in flt.items():
        assert abs(q[node] / 1e12 - rank) < 1e-6, node


def test_exact_partitioning_invariance(spark):
    """Same result under 1-partition and many-partition edge inputs —
    the integer sums are order-independent by construction."""
    edges = [
        (0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (4, 0), (2, 4), (5, 2),
    ]
    df1 = spark.createDataFrame(edges, "src long, dst long").coalesce(1)
    df2 = spark.createDataFrame(edges, "src long, dst long").repartition(16)
    from batch_processing_on_aws_spark.operators.graph import page_rank_exact

    r1 = {
        r["node"]: r["rank_micro"]
        for r in page_rank_exact(df1, n_iter=6).collect()
    }
    r2 = {
        r["node"]: r["rank_micro"]
        for r in page_rank_exact(df2, n_iter=6).collect()
    }
    assert r1 == r2
    with pytest.raises(ValueError, match="damping"):
        page_rank_exact(df1, damping_num=100, damping_den=100)


# ------------------------------------------------------------------ SCC

def _scc_map(spark, edges):
    from batch_processing_on_aws_spark.operators.graph import (
        strongly_connected_components,
    )

    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["component"]
        for r in strongly_connected_components(df).collect()
    }


def test_scc_cycle_chain_and_singletons(spark):
    # 1→2→3→1 is a cycle; 3→4→5 is a chain; 6→6 self-loop; 7 isolated
    # appears only as a dst
    got = _scc_map(
        spark,
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (6, 6), (5, 7)],
    )
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 6, 7: 7}


def test_scc_two_cycles_joined_by_one_way_bridge(spark):
    # two 3-cycles with a one-directional bridge: NOT merged (that
    # would need mutual reachability), unlike weakly-CC which merges
    got = _scc_map(
        spark,
        [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10), (3, 10)],
    )
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_scc_matches_python_reference_on_random_graph(spark):
    """Pin against a driver-side Tarjan on a seeded random digraph —
    every node labeled, labels = min member, component partition
    identical."""
    import random

    rng = random.Random(20240815)
    n = 60
    edges = {(rng.randrange(n), rng.randrange(n)) for _ in range(150)}

    # iterative Tarjan reference
    import sys

    adj = {u: [] for u in range(n)}
    for u, v in edges:
        adj[u].append(v)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    comp = {}
    counter = [0]

    def strongconnect(v0):
        work = [(v0, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            work.pop()
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    members.append(w)
                    if w == v:
                        break
                m = min(members)
                for w in members:
                    comp[w] = m
            if work:
                pv, _ = work[-1]
                low[pv] = min(low[pv], low[v])

    nodes_in_edges = {u for e in edges for u in e}
    for v in sorted(nodes_in_edges):
        if v not in index:
            strongconnect(v)
    want = {v: comp[v] for v in nodes_in_edges}

    got = _scc_map(spark, sorted(edges))
    assert got == want


# ------------------------------------------------------ label propagation


def _lpa_map(spark, edges, n_rounds=3):
    from batch_processing_on_aws_spark.operators.graph import label_propagation

    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r.node: r.community
        for r in label_propagation(df, n_rounds=n_rounds).collect()
    }


def test_lpa_two_cliques_with_bridge(spark):
    # two 4-cliques {1..4} and {10..13} joined by one bridge edge:
    # LPA must split the CONNECTED graph into the two planted
    # communities (components would collapse it to one label)
    def clique(ids):
        return [(a, b) for a in ids for b in ids if a < b]

    edges = clique([1, 2, 3, 4]) + clique([10, 11, 12, 13]) + [(4, 10)]
    got = _lpa_map(spark, edges)
    assert {got[n] for n in (1, 2, 3, 4)} == {1}
    assert {got[n] for n in (10, 11, 12, 13)} == {10}


def test_lpa_deterministic_tiebreak_and_rounds(spark):
    # node 3's neighbors 1 and 2 tie at one vote each -> min label 1
    got = _lpa_map(spark, [(1, 3), (2, 3)], n_rounds=1)
    assert got[3] == 1
    # symmetrized: 1 and 2 each see only 3 -> adopt 3
    assert got[1] == 3 and got[2] == 3

    from batch_processing_on_aws_spark.operators.graph import label_propagation

    with pytest.raises(ValueError, match="n_rounds"):
        label_propagation(
            spark.createDataFrame([(1, 2)], "src long, dst long"), n_rounds=0
        )


def test_lpa_self_loops_nulls_and_python_reference(spark):
    # self-loops and NULL endpoints are dropped; the sync-round
    # semantics match a plain python replay on a random graph
    import random

    rng = random.Random(7)
    edges = sorted(
        {
            (rng.randrange(20), rng.randrange(20))
            for _ in range(40)
        }
    )
    rows = [(int(s), int(d)) for s, d in edges] + [(5, 5), (None, 3)]
    df = spark.createDataFrame(rows, "src long, dst long")

    nbrs = {}
    for s, d in edges:
        if s == d:
            continue
        nbrs.setdefault(s, set()).add(d)
        nbrs.setdefault(d, set()).add(s)
    labels = {n: n for n in nbrs}
    for _ in range(3):
        new = {}
        for n, ns in nbrs.items():
            counts = {}
            for m in ns:
                counts[labels[m]] = counts.get(labels[m], 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        labels = new

    from batch_processing_on_aws_spark.operators.graph import label_propagation

    got = {
        r.node: r.community for r in label_propagation(df, n_rounds=3).collect()
    }
    want = dict(labels)
    # (5,5) self-loop contributes no edge; (None,3) dropped. node 3
    # and 5 may still appear via random edges only.
    assert got == want
