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
    # The TRAINING DYNAMICS must match: both implementations' paired
    # pre->post deltas track each other (at this tiny budget meta-RL is
    # in a transient where BOTH sides dip before the meta-objective
    # kicks in — measured: ppo seed 3 jax -5.3 vs torch -5.2; the
    # full-scale BASELINE.md runs show both improving strongly by 30
    # iterations). A one-sided divergence is what this guards against.
    d_jax = jax_post - jax_pre
    d_torch = torch_post - torch_pre
    assert abs(d_jax - d_torch) < 8.0, (d_jax, d_torch)


def test_torch_repro_multi_step_and_anil_threading():
    """The torch reproduction must support adapt_steps >= 2 (reference
    rl.py:384-396 loops inner updates; a per-step hard detach used to make
    the second autograd.grad crash) and must thread ANIL semantics through
    cfg, not module state (evaluate/fast_adapt after an ANIL run must not
    inherit it)."""
    import numpy as np
    import torch
    import torch_rl_repro as repro

    cfg = {"inner_lr": 0.05, "gamma": 0.99, "tau": 1.0, "adapt_steps": 2,
           "adapt_batch_size": 2, "max_path_length": 8, "max_kl": 0.05,
           "outer_lr": 0.3, "backtrack_factor": 0.5, "ls_max_steps": 3,
           "ppo_epochs": 2, "ppo_clip_ratio": 0.3}
    gen = torch.Generator().manual_seed(0)
    goal = np.array([0.3, -0.2])
    baseline = repro.make_baseline(cfg)
    assert baseline.reg == 2.0  # reference-exact reg = action_size (D9)

    p = repro.init_policy(gen)
    adapted, replay, _ = repro.fast_adapt_trpo(p, goal, baseline, cfg, gen)
    assert len(replay) == cfg["adapt_steps"] + 1
    # both steps actually moved the params
    assert not torch.equal(adapted["w1"], p["w1"])

    # the 2nd-order surrogate replays BOTH inner steps without crashing
    loss, kl = repro.meta_surrogate_loss([replay], [adapted], p, baseline,
                                         cfg)
    grads = torch.autograd.grad(loss, repro.params_list(p))
    assert all(torch.isfinite(g).all() for g in grads)

    # ANIL via cfg: body frozen under adaptation, no lingering state
    anil_cfg = dict(cfg, adapt_steps=1, anil=True)
    p2 = repro.init_policy(gen)
    adapted2, _, _ = repro.fast_adapt_trpo(p2, goal, baseline, anil_cfg,
                                           gen)
    assert torch.equal(adapted2["w1"], p2["w1"])  # body untouched
    assert not torch.equal(adapted2["w3"], p2["w3"])  # head adapted
    # a subsequent MAML call sees relu semantics again (no module flag)
    adapted3, _, _ = repro.fast_adapt_trpo(p2, goal, baseline, cfg, gen)
    assert not torch.equal(adapted3["w1"], p2["w1"])


def test_flat_timestep_advantages_match_torch_oracle():
    """RLConfig.flat_timestep=True must reproduce cherry's advantage
    pipeline EXACTLY (flat concatenated-replay row index as the baseline
    time feature, same index for next-state values): compare against the
    torch reproduction on a real rollout with early terminations."""
    import jax
    import jax.numpy as jnp
    import torch
    import torch_rl_repro as repro
    from exploring_meta_tpu import rl
    from exploring_meta_tpu.envs import Particles2D
    from exploring_meta_tpu.models import DiagNormalPolicy

    env = Particles2D()
    policy = DiagNormalPolicy(input_size=2, output_size=2, hiddens=(8, 8))
    params = policy.init(jax.random.key(0))
    # value_reg=2.0: the reference-exact LinearValue ridge coefficient
    # (the reference passes action_size positionally into cherry's reg —
    # PARITY.md D9); the parity harness runs this exact combination.
    cfg = rl.RLConfig(gamma=0.9, tau=0.95, adapt_batch_size=4,
                      max_path_length=6, flat_timestep=True, value_reg=2.0)

    # Mixed-length episodes: 2 slots under the stochastic policy (run the
    # full horizon) + 2 under a near-deterministic stay-at-origin policy
    # with the goal AT the origin (terminate at step 1).
    roll2 = rl.make_rollout(env, policy.sample, episodes=2, horizon=6)
    t_far = jnp.array([0.4, -0.3])
    traj_far = roll2(params, t_far, jax.random.key(5))
    still = jax.tree_util.tree_map(jnp.zeros_like, params)
    still = dict(still, sigma=jnp.full((2,), -30.0))  # scale -> 1e-6 clamp
    t_origin = jnp.array([0.0, 0.0])
    traj_near = roll2(still, t_origin, jax.random.key(6))

    from exploring_meta_tpu.rl.rollout import Trajectory
    traj = Trajectory(*[jnp.concatenate([a, b], axis=1)
                        for a, b in zip(traj_far, traj_near)])
    assert float(jnp.sum(traj.valid)) < 24, "want early-done episodes"

    adv, _ = rl.traj_advantages(traj, cfg)

    # Episode-major concatenation of REAL steps only (runner.py layout).
    v = np.asarray(traj.valid, bool)
    ep = {"states": [], "actions": [], "rewards": [], "dones": [],
          "next_states": []}
    for e in range(4):
        for t in range(6):
            if v[t, e]:
                ep["states"].append(np.asarray(traj.state[t, e]))
                ep["actions"].append(np.asarray(traj.action[t, e]))
                ep["rewards"].append(float(traj.reward[t, e]))
                ep["dones"].append(float(traj.done[t, e]))
                ep["next_states"].append(np.asarray(traj.next_state[t, e]))
    tens = {
        "states": torch.tensor(np.array(ep["states"]), dtype=torch.float32),
        "next_states": torch.tensor(np.array(ep["next_states"]),
                                    dtype=torch.float32),
        "rewards": torch.tensor(ep["rewards"]).view(-1, 1),
        "dones": torch.tensor(ep["dones"]).view(-1, 1),
    }
    baseline = repro.LinearValue(2, reg=2.0)
    ref = repro.compute_advantages(
        baseline, cfg.tau, cfg.gamma, tens["rewards"], tens["dones"],
        tens["states"], tens["next_states"]).detach().numpy().ravel()

    ours = []
    a = np.asarray(adv)
    for e in range(4):
        for t in range(6):
            if v[t, e]:
                ours.append(a[t, e])
    np.testing.assert_allclose(np.array(ours), ref, rtol=2e-3, atol=2e-4)
