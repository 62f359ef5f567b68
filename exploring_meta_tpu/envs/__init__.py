"""Environments: pure-JAX device envs + host-side physics adapters."""

from exploring_meta_tpu.envs.particles2d import Particles2D, EnvState
from exploring_meta_tpu.envs.factory import make_env, calculate_samples_seen

__all__ = ["Particles2D", "EnvState", "make_env", "calculate_samples_seen"]
