"""Region graph algorithm tests (ref:
``tests/templates/region_graph/test_algorithms.py``)."""

import os
import tempfile

import numpy as np
import pytest

from cirkit_tpu.models.region_graph import (
    ChowLiuTree,
    FullyFactorized,
    LinearTree,
    PartitionNode,
    PoonDomingos,
    QuadGraph,
    QuadTree,
    RandomBinaryTree,
    RegionGraph,
    RegionNode,
)
from cirkit_tpu.utils import Scope


def test_fully_factorized():
    rg = FullyFactorized(5)
    assert rg.num_variables == 5
    assert rg.is_structured_decomposable
    assert rg.is_omni_compatible
    assert sum(1 for _ in rg.partition_nodes) == 1


def test_linear_tree():
    rg = LinearTree(6)
    assert rg.num_variables == 6
    assert rg.is_structured_decomposable
    assert sum(1 for _ in rg.partition_nodes) == 5


def test_random_binary_tree():
    rg = RandomBinaryTree(8, seed=1)
    assert rg.num_variables == 8
    assert rg.is_structured_decomposable
    # a full binary vtree over 8 leaves has 7 partitions
    assert sum(1 for _ in rg.partition_nodes) == 7
    # leaf regions are univariate
    assert all(len(r.scope) == 1 for r in rg.inputs)


@pytest.mark.parametrize("splits", [2, 4])
def test_quad_tree(splits):
    rg = QuadTree((1, 4, 4), num_patch_splits=splits)
    assert rg.num_variables == 16
    assert rg.is_structured_decomposable
    assert rg.scope == Scope(range(16))


def test_quad_graph_not_structured_but_valid():
    rg = QuadGraph((1, 4, 4))
    assert rg.num_variables == 16
    assert not rg.is_structured_decomposable
    # some region must have two partitionings (H-then-V and V-then-H)
    assert any(len(rg.region_inputs(r)) > 1 for r in rg.region_nodes)


def test_poon_domingos():
    rg = PoonDomingos((1, 4, 4), delta=2)
    assert rg.num_variables == 16
    assert not rg.is_structured_decomposable


def test_chow_liu_tree_categorical():
    rng = np.random.default_rng(0)
    # correlated pairs: x1 = x0, x3 = x2
    base = rng.integers(0, 3, size=(500, 2))
    data = np.stack([base[:, 0], base[:, 0], base[:, 1], base[:, 1]], axis=1)
    rg = ChowLiuTree(data, "categorical")
    assert isinstance(rg, RegionGraph)
    assert rg.num_variables == 4
    tree = ChowLiuTree(data, "categorical", as_region_graph=False)
    # the learned tree must link the duplicated pairs
    edges = {frozenset((i, int(p))) for i, p in enumerate(tree) if p != -1}
    assert frozenset((0, 1)) in edges
    assert frozenset((2, 3)) in edges


def test_chow_liu_tree_gaussian_and_heterogeneous():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(300,))
    data = np.stack([x, x + 0.01 * rng.normal(size=300), rng.normal(size=300)], axis=1)
    rg = ChowLiuTree(data, "gaussian")
    assert isinstance(rg, RegionGraph)
    het = np.concatenate([data, rng.integers(0, 3, size=(300, 1))], axis=1)
    rg2 = ChowLiuTree(het, ["gaussian", "gaussian", "gaussian", "categorical"])
    assert isinstance(rg2, RegionGraph)
    assert rg2.num_variables == 4


def test_region_graph_json_roundtrip():
    rg = QuadTree((1, 4, 4))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "rg.json")
        rg.dump(path)
        rg2 = RegionGraph.load(path)
    assert rg2.num_variables == rg.num_variables
    assert rg2.is_structured_decomposable == rg.is_structured_decomposable
    assert sum(1 for _ in rg2.partition_nodes) == sum(1 for _ in rg.partition_nodes)
    scopes = sorted(tuple(n.scope) for n in rg.region_nodes)
    scopes2 = sorted(tuple(n.scope) for n in rg2.region_nodes)
    assert scopes == scopes2


def test_invalid_partitioning_rejected():
    r01 = RegionNode([0, 1])
    r0 = RegionNode([0])
    ptn = PartitionNode([0, 1])
    with pytest.raises(ValueError, match="partitioning"):
        RegionGraph([r01, r0, ptn], {ptn: [r0], r01: [ptn]}, [r01])
