"""exploring_meta_tpu — a TPU-native meta-learning framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
``Kostis-S-Z/exploring_meta`` (MAML/ANIL few-shot vision + meta-RL with
TRPO/PPO/VPG, continual-learning and representation-change analysis),
re-designed TPU-first:

- inner loops are pure functions differentiated with ``jax.grad`` (second
  order comes for free), not object mutation;
- the per-task meta-batch loop is ``jax.vmap``, sharded over a device mesh
  with ``shard_map`` + ``psum`` instead of a sequential Python loop;
- rollouts for pure-math envs run fully on device under ``lax.scan``;
- the experiment artifact contract (``logger.json``/``metrics.json``/
  checkpoints) mirrors the reference so analysis tooling carries over.

Reference parity map lives in SURVEY.md at the repo root.
"""

__version__ = "0.1.0"

# ``EMT_FORCE_CPU=1`` must work for plain library imports, not just the
# CLI scripts (whose argparser builders call this): the remote-TPU
# tunnel's failure mode is an unbounded hang at first backend use, and
# the env var alone does nothing — the platform has to be flipped in
# jax.config before backend initialization.
from exploring_meta_tpu.utils.config import force_cpu_if_requested as _fcpu

_fcpu()
del _fcpu
