from cirkit_tpu.parallel.em import em_programs, em_slots, fit_em
from cirkit_tpu.parallel.optimizers import adam_lowmem
from cirkit_tpu.parallel.tensor import (
    shard_store_tp,
    tp_forward,
    tp_slot_specs,
    tp_train_step,
)
from cirkit_tpu.parallel.training import (
    data_parallel_step,
    default_mesh,
    evaluate_ll,
    fit,
    Preempted,
    replicate_store,
    shard_batch,
    shard_opt_state_zero1,
    zero1_state_shardings,
)

__all__ = [
    "adam_lowmem",
    "data_parallel_step",
    "em_programs",
    "em_slots",
    "evaluate_ll",
    "Preempted",
    "fit_em",
    "shard_store_tp",
    "tp_forward",
    "tp_slot_specs",
    "tp_train_step",
    "default_mesh",
    "fit",
    "replicate_store",
    "shard_batch",
    "shard_opt_state_zero1",
    "zero1_state_shardings",
]
