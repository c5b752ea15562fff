"""TPU-native fused kernels for the hot circuit contractions."""

from cirkit_tpu.ops.lse_einsum import (
    lse_matmul,
    lse_matmul_softmax,
    lse_tucker2,
    lse_tucker2_softmax,
)

__all__ = [
    "lse_matmul",
    "lse_matmul_softmax",
    "lse_tucker2",
    "lse_tucker2_softmax",
]
