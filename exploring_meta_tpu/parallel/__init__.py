"""Device-mesh parallelism (task-DP via shard_map + ICI collectives)."""

from exploring_meta_tpu.parallel.multiseed import (
    stack_seed_states,
    vmap_seeds,
)
from exploring_meta_tpu.parallel.mesh import (
    make_task_mesh,
    make_sharded_adam_train_scan,
    make_sharded_meta_step,
    make_sharded_replay_meta_step,
    make_sharded_train_scan,
    make_sharded_trpo_meta_step,
    make_sharded_trpo_train_scan,
    shard_task_batch,
)

__all__ = ["make_task_mesh", "make_sharded_adam_train_scan",
           "make_sharded_meta_step", "make_sharded_replay_meta_step",
           "make_sharded_train_scan", "make_sharded_trpo_meta_step",
           "make_sharded_trpo_train_scan", "shard_task_batch",
           "stack_seed_states", "vmap_seeds"]
