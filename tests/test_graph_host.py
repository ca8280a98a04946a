"""Host graph algorithm tests.

Mirrors reference Tier-1 unit tests graph/mod.rs:491-779 (same fixtures,
same assertions) plus select_neighbors pruning edge cases.
"""

import numpy as np
import pytest

from pgvector_rx_tpu.graph import host
from pgvector_rx_tpu.graph.host import GraphElement


def make_l2_fns(values):
    arr = np.asarray(values, dtype=np.float32)

    def dist_many(a, ids):
        av = arr[a] if isinstance(a, (int, np.integer)) else np.asarray(a)
        d = av[None, :] - arr[np.asarray(ids, dtype=np.int64)]
        return np.sum(d * d, axis=1, dtype=np.float32)

    def pair_many(a_idx, ids):
        d = arr[a_idx][None, :] - arr[np.asarray(ids, dtype=np.int64)]
        return np.sum(d * d, axis=1, dtype=np.float32)

    def dist(a, b_idx):
        return float(dist_many(a, [b_idx])[0])

    return dist_many, pair_many, dist


class TestSearchLayer:
    def test_chain_search(self):
        # graph/mod.rs:537-584: chain 0-1-2-3-4, query [3.5] from 0
        values = [[0.0], [1.0], [2.0], [3.0], [4.0]]
        dist_many, _, dist = make_l2_fns(values)
        elems = [GraphElement(level=0) for _ in values]
        for i in range(4):
            elems[i].neighbors[0].append((1.0, i + 1))
            elems[i + 1].neighbors[0].append((1.0, i))

        ep = [(dist([3.5], 0), 0)]
        results = host.search_layer(elems, ep, 2, 0, np.array([3.5]), dist_many)
        idxs = [i for _, i in results]
        assert len(results) == 2
        assert 3 in idxs and 4 in idxs

    def test_skips_lower_level_elements(self):
        values = [[0.0], [1.0], [2.0]]
        dist_many, _, dist = make_l2_fns(values)
        elems = [GraphElement(level=1), GraphElement(level=0), GraphElement(level=1)]
        elems[0].neighbors[1].append((1.0, 2))
        elems[2].neighbors[1].append((1.0, 0))
        ep = [(dist([2.0], 0), 0)]
        results = host.search_layer(elems, ep, 3, 1, np.array([2.0]), dist_many)
        assert [i for _, i in results] == [2, 0]

    def test_discarded_collects_evicted(self):
        values = [[float(i)] for i in range(6)]
        dist_many, _, dist = make_l2_fns(values)
        elems = [GraphElement(level=0) for _ in values]
        for i in range(5):
            elems[i].neighbors[0].append((1.0, i + 1))
            elems[i + 1].neighbors[0].append((1.0, i))
        discarded = []
        visited = set()
        q = np.array([0.0])
        results = host.search_layer(
            elems, [(dist(q, 0), 0)], 2, 0, q, dist_many,
            visited=visited, discarded=discarded,
        )
        assert len(results) == 2
        assert len(discarded) >= 1  # farther elements spilled
        assert all(i not in [r[1] for r in results] for _, i in discarded)


class TestSelectNeighbors:
    def test_fits(self):
        # graph/mod.rs:587-611
        _, pair, _d = make_l2_fns([[0.0], [1.0], [2.0]])
        cands = [(1.0, 1), (2.0, 2)]
        assert host.select_neighbors(cands, 4, pair) == cands

    def test_prunes(self):
        # graph/mod.rs:613-646: query origin, candidates [1,0],[1.1,0],[5,0]
        _, pair, _d = make_l2_fns([[0.0, 0.0], [1.0, 0.0], [1.1, 0.0], [5.0, 0.0]])
        cands = [(1.0, 1), (1.21, 2), (25.0, 3)]
        selected = host.select_neighbors(cands, 2, pair)
        assert len(selected) == 2
        assert selected[0] == (1.0, 1)
        # idx2 (closer to idx1 than to query) and idx3 (closer to idx1 than
        # its own distance 25 > 16) are both pruned; backfill restores idx2
        assert selected[1] == (1.21, 2)

    def test_backfill(self):
        _, pair, _d = make_l2_fns([[0.0, 0.0], [1.0, 0.0], [1.1, 0.0]])
        cands = [(1.0, 1), (1.21, 2)]
        # only close pair: idx2 pruned but backfilled since room remains
        selected = host.select_neighbors(cands + [(100.0, 0)], 2, pair)
        assert selected[0] == (1.0, 1)


class TestInsertAlgorithms:
    def test_two_elements(self):
        # graph/mod.rs:649-676
        values = [[0.0, 0.0], [1.0, 0.0]]
        dist_many, pair, dist = make_l2_fns(values)
        elems = [GraphElement(level=0), GraphElement(level=0)]
        host.find_element_neighbors(elems, 1, 0, 16, 4, dist_many, pair)
        assert elems[1].neighbors[0] == [(1.0, 0)]

    def test_back_connections(self):
        # graph/mod.rs:679-726
        values = [[0.0], [1.0], [2.0]]
        dist_many, pair, dist = make_l2_fns(values)
        elems = [GraphElement(level=0) for _ in values]
        host.find_element_neighbors(elems, 1, 0, 16, 4, dist_many, pair)
        host.update_neighbor_connections(elems, 1, 4, pair)
        assert elems[0].neighbors[0][0][1] == 1

        host.find_element_neighbors(elems, 2, 0, 16, 4, dist_many, pair)
        host.update_neighbor_connections(elems, 2, 4, pair)
        n1 = [i for _, i in elems[1].neighbors[0]]
        assert 0 in n1 and 2 in n1

    def test_multi_layer(self):
        # graph/mod.rs:729-778
        values = [[0.0], [3.0], [1.0]]
        dist_many, pair, dist = make_l2_fns(values)
        elems = [GraphElement(level=2), GraphElement(level=0), GraphElement(level=1)]
        host.find_element_neighbors(elems, 1, 0, 8, 2, dist_many, pair)
        host.update_neighbor_connections(elems, 1, 2, pair)
        assert elems[1].neighbors[0]

        host.find_element_neighbors(elems, 2, 0, 8, 2, dist_many, pair)
        host.update_neighbor_connections(elems, 2, 2, pair)
        assert elems[2].neighbors[0]
        assert elems[2].neighbors[1]

    def test_prune_when_full(self):
        # inserting many points saturates layer-0 list (2*m) and triggers
        # heuristic pruning (graph/mod.rs:473-486)
        rng = np.random.default_rng(0)
        values = rng.random((40, 2)).astype(np.float32)
        dist_many, pair, dist = make_l2_fns(values)
        m = 2
        elems = [GraphElement(level=0) for _ in range(40)]
        for i in range(1, 40):
            host.find_element_neighbors(elems, i, 0, 8, m, dist_many, pair)
            host.update_neighbor_connections(elems, i, m, pair)
        for e in elems:
            assert len(e.neighbors[0]) <= 2 * m

    def test_skip_set_excluded_from_selection(self):
        values = [[0.0], [0.5], [1.0], [2.0]]
        dist_many, pair, dist = make_l2_fns(values)
        elems = [GraphElement(level=0) for _ in values]
        for i in range(1, 4):
            host.find_element_neighbors(elems, i, 0, 8, 2, dist_many, pair)
            host.update_neighbor_connections(elems, i, 2, pair)
        # repair element 3 skipping deleted {1} and itself
        host.find_element_neighbors(
            elems, 3, 0, 8, 2, dist_many, pair, skip={1, 3}
        )
        assert all(i not in (1, 3) for _, i in elems[3].neighbors[0])
