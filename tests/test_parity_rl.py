"""CI-sized RL learning-parity check (scripts/parity_check.py --rl).

The full-scale evidence lives in BASELINE.md (30-iteration runs, 100 eval
tasks, 2 seeds per algorithm); this test runs the same harness end-to-end
at a small budget to keep both implementations' training loops and the
comparison machinery exercised in CI. Tolerances are wide: at this budget
the algorithms are mid-training and eval noise dominates.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "scripts"))


def _small_cfg(algo):
    from parity_check import default_rl_cfg
    cfg = default_rl_cfg(algo)
    cfg.update(adapt_batch_size=4, max_path_length=25, meta_batch_size=4,
               num_iterations=12, n_eval_tasks=24)
    return cfg


@pytest.mark.slow
@pytest.mark.parametrize("algo", ["trpo", "ppo"])
def test_rl_parity_harness_end_to_end(algo):
    from parity_check import run_jax_rl, run_torch_rl

    cfg = _small_cfg(algo)
    jax_post, jax_pre = run_jax_rl(algo, cfg, seed=3, exact=True)
    torch_post, torch_pre = run_torch_rl(algo, cfg, seed=3)

    for v in (jax_post, jax_pre, torch_post, torch_pre):
        assert np.isfinite(v)
    # Untrained evals of architecturally identical policies on the same
    # task distribution must land in the same range.
    assert abs(jax_pre - torch_pre) < 8.0, (jax_pre, torch_pre)
    # Neither implementation may diverge where the other learns: the
    # post-training gap stays within the mid-training noise band.
    assert abs(jax_post - torch_post) < 8.0, (jax_post, torch_post)
    # Training must not blow up relative to the untrained policy.
    assert jax_post > jax_pre - 5.0
    assert torch_post > torch_pre - 5.0
