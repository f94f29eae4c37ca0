"""Native C++ nav-graph engine vs the pure-Python implementations:
identical distances and paths on random graphs."""

import numpy as np
import pytest

from vln_bevbert_tpu.data.nav_graph import NavGraph, make_synthetic_scan
from vln_bevbert_tpu.nav.graph_map import FloydGraph

native = pytest.importorskip("vln_bevbert_tpu.native")
if not native.available():
    pytest.skip("g++ toolchain unavailable", allow_module_level=True)


def test_static_graph_matches_scipy(rng):
    _, g = make_synthetic_scan(rng, n_nodes=15)
    edges, weights = [], []
    for i, nbrs in enumerate(g.adjacency):
        for j in nbrs:
            if j > i:
                edges.append((i, j))
                weights.append(float(np.linalg.norm(g.positions[i] - g.positions[j])))
    ng = native.NativeStaticGraph(len(g), np.array(edges), np.array(weights))
    np.testing.assert_allclose(ng.distances(), g.distances, atol=1e-9)
    for a in range(0, 15, 3):
        for b in range(0, 15, 4):
            path = ng.path(a, b)
            assert path[0] == a and path[-1] == b
            # path length equals the shortest distance
            total = sum(
                float(np.linalg.norm(g.positions[u] - g.positions[v]))
                for u, v in zip(path[:-1], path[1:])
            )
            assert total == pytest.approx(g.distances[a, b])


def test_floyd_native_matches_python(rng):
    py = FloydGraph()
    cc = native.NativeFloydGraph(capacity=64)
    names = [f"n{i}" for i in range(12)]
    # random incremental exploration: add edges then update nodes, comparing
    # distances and paths at each stage
    for step in range(30):
        a, b = rng.choice(12, 2, replace=False)
        w = float(rng.uniform(0.5, 5.0))
        py.add_edge(names[a], names[b], w)
        cc.add_edge(names[a], names[b], w)
        k = names[int(rng.integers(12))]
        py.update(k)
        cc.update(k)
        assert py.visited(k) and cc.visited(k)
        for x in names[:6]:
            for y in names[:6]:
                assert cc.distance(x, y) == pytest.approx(py.distance(x, y))
    # paths agree where defined
    for x in names[:6]:
        for y in names[:6]:
            if x != y and py.distance(x, y) < 1e8:
                assert cc.path(x, y) == py.path(x, y)


import pytest
def test_native_dtw_matches_python():
    import numpy as np

    from vln_bevbert_tpu import native

    if not native.available():
        pytest.skip("no toolchain")
    rng = np.random.default_rng(4)
    a = rng.normal(size=(23, 3))
    b = rng.normal(size=(17, 3))
    acc = np.full((24, 18), np.inf)
    acc[0, 0] = 0
    for i in range(1, 24):
        for j in range(1, 18):
            c = float(np.linalg.norm(a[i - 1] - b[j - 1]))
            acc[i, j] = c + min(acc[i - 1, j], acc[i, j - 1], acc[i - 1, j - 1])
    assert abs(native.dtw_positions(a, b) - acc[23, 17]) < 1e-9
    cm = np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1)
    assert abs(native.dtw_costmatrix(cm) - acc[23, 17]) < 1e-9
    # degenerate single-point sequences
    assert native.dtw_positions(a[:1], b[:1]) == pytest.approx(
        float(np.linalg.norm(a[0] - b[0]))
    )
