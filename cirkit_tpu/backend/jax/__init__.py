from cirkit_tpu.backend.jax.circuit import JaxCircuit
from cirkit_tpu.backend.jax.compiler import JaxCompiler
from cirkit_tpu.backend.jax.cross import (
    cross_circuit_kl,
    expected_loglikelihood,
    expected_loglikelihood_mc,
    is_deterministic,
    kl_monte_carlo,
)
from cirkit_tpu.backend.jax.distill import distill_tree
from cirkit_tpu.backend.jax.entropy import (
    EntropyQuery,
    KLDivergenceQuery,
    renyi2_entropy,
)
from cirkit_tpu.backend.jax.pruning import (
    grow_circuit,
    grow_prune_loop,
    prune_circuit,
    selection_score,
)
from cirkit_tpu.backend.jax.queries import (
    ExpectationQuery,
    IntegrateQuery,
    MAPQuery,
    Query,
    SamplingQuery,
    mutual_information,
)
from cirkit_tpu.backend.jax.serving import (
    bf16_weight_store,
    export_circuit,
    load_exported,
    weight_slots,
)
from cirkit_tpu.backend.jax.warmstart import (
    WarmBundle,
    WarmStartError,
    load_bundle,
    save_bundle,
)
from cirkit_tpu.backend.jax.semiring import (
    ComplexLSESumSemiring,
    LSESumSemiring,
    Semiring,
    SemiringImpl,
    SumProductSemiring,
)

__all__ = [
    "ComplexLSESumSemiring",
    "JaxCircuit",
    "JaxCompiler",
    "LSESumSemiring",
    "Semiring",
    "SemiringImpl",
    "SumProductSemiring",
    "EntropyQuery",
    "ExpectationQuery",
    "KLDivergenceQuery",
    "IntegrateQuery",
    "MAPQuery",
    "bf16_weight_store",
    "weight_slots",
    "Query",
    "SamplingQuery",
    "cross_circuit_kl",
    "distill_tree",
    "expected_loglikelihood",
    "expected_loglikelihood_mc",
    "export_circuit",
    "load_exported",
    "grow_circuit",
    "grow_prune_loop",
    "selection_score",
    "is_deterministic",
    "kl_monte_carlo",
    "mutual_information",
    "prune_circuit",
    "renyi2_entropy",
    "WarmBundle",
    "WarmStartError",
    "load_bundle",
    "save_bundle",
]
