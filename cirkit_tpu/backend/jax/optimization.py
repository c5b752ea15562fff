"""Layer-graph optimization rewrites (fusions and shatterings).

Placeholder registry: the fusion passes (sum-collapse, Tucker, CP-T,
tensor-dot shatter — ref ``cirkit/backend/torch/optimization/layers.py``)
land on top of this hook. ``optimize_layer_graph`` must return a graph with
identical semantics.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from cirkit_tpu.backend.jax.layers import JaxLayer


def optimize_layer_graph(
    compiler,
    layers: Sequence[JaxLayer],
    in_layers: Mapping[JaxLayer, Sequence[JaxLayer]],
    outputs: Sequence[JaxLayer],
):
    return list(layers), dict(in_layers), list(outputs)
