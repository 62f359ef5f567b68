"""Non-meta baselines: plain PPO/TRPO, a random policy, supervised vision.

Rebuilds of ``baselines/{ppo,trpo,random,vision}.py``: train one policy /
classifier across tasks with NO inner loop, then meta-test it with
few-step MAML adaptation post hoc (reference ``baselines/ppo.py:135-136``,
``baselines/vision.py:141-143``) — the control experiments that show what
meta-learning adds.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import optax
from tqdm import trange

from exploring_meta_tpu import adapt, models, rl, tasks
from exploring_meta_tpu.envs.factory import make_env
from exploring_meta_tpu.ops.cg import conjugate_gradient
from exploring_meta_tpu.ops.losses import accuracy, cross_entropy
from exploring_meta_tpu.models.distributions import normal_kl, normal_log_prob
from exploring_meta_tpu.trainers.rl import build_policy
from exploring_meta_tpu.trainers.vision import _build_spec
from exploring_meta_tpu.utils.config import RLScriptConfig, VisionConfig
from exploring_meta_tpu.utils.experiment import DivergenceError, Experiment


_UNSUPPORTED = ("bf16", "mesh", "fuse", "resume", "profile", "trace",
                "async_ckpt", "task_batch", "host_policy", "ckpt_backend")


def _warn_unsupported(cfg) -> None:
    """The baseline trainers keep the reference's simple training loops
    (baselines/*.py) and do not implement the meta-trainers' TPU extras;
    say so instead of silently ignoring an advertised flag."""
    defaults = type(cfg)()
    ignored = [f for f in _UNSUPPORTED
               if getattr(cfg, f, None) != getattr(defaults, f, None)]
    if ignored:
        print(f"[baselines] note: not supported by the baseline trainers, "
              f"ignored: {', '.join(ignored)}")


# ---------------------------------------------------------------------------
# RL baselines
# ---------------------------------------------------------------------------

def _setup_rl_baseline(cfg: RLScriptConfig):
    """Env + policy + rollout routing shared by the RL baselines.

    Reference baselines train on whatever ``make_env`` yields — multitask
    Meta-World included (``baselines/ppo.py:42-48``) — so this routes
    device envs to the fused scan rollout and host envs (MuJoCo /
    Meta-World) to the eager HostVecEnv path."""
    _warn_unsupported(cfg)
    # Collection here is forward-only too, but the baselines keep the
    # module default policy placement: a previous trainer in this process
    # may have left it on another backend (same always-set rule as the
    # meta-trainers).
    from exploring_meta_tpu.envs.host import set_host_policy_device
    set_host_policy_device("device")
    env, is_device = make_env(cfg.env, workers=cfg.adapt_batch_size,
                              seed=cfg.seed,
                              max_path_length=cfg.max_path_length,
                              n_threads=cfg.workers if cfg.workers > 1
                              else None)
    policy = build_policy(env, anil=False, activation=cfg.activation)
    if is_device:
        roll = rl.make_rollout(env, policy.sample,
                               episodes=cfg.adapt_batch_size,
                               horizon=cfg.max_path_length)
    else:
        from exploring_meta_tpu.envs.host import make_host_rollout
        roll = make_host_rollout(env, policy, cfg.max_path_length)
    return env, is_device, policy, roll


def _task_at(tasks, i: int):
    """Index one task out of a sampled batch: host envs give Python lists,
    device envs give stacked arrays."""
    if isinstance(tasks, list):
        return tasks[i]
    return jax.tree_util.tree_map(lambda x: x[i], tasks)

class PPOBaseline(Experiment):
    """Plain PPO across tasks (reference baselines/ppo.py)."""

    def __init__(self, cfg: RLScriptConfig, path: str = "ppo_results/"):
        super().__init__("ppo", cfg.env, cfg.to_params(), path=path,
                         use_wandb=cfg.use_wandb)
        self.cfg = cfg

    def run(self) -> dict:
        cfg = self.cfg
        env, is_device, policy, roll = _setup_rl_baseline(cfg)
        key = jax.random.key(cfg.seed)
        key, ik = jax.random.split(key)
        params = policy.init(ik)
        opt = optax.adam(cfg.outer_lr)
        opt_state = opt.init(params)

        rl_cfg = rl.RLConfig(gamma=cfg.gamma, tau=cfg.tau,
                             adapt_batch_size=cfg.adapt_batch_size,
                             max_path_length=cfg.max_path_length,
                             ppo_epochs=cfg.ppo_epochs,
                             ppo_clip_ratio=cfg.ppo_clip_ratio)

        def ppo_update(params, opt_state, traj):
            adv, _ = rl.traj_advantages(traj, rl_cfg)
            adv_flat = jax.lax.stop_gradient(rl.masked_normalize(
                traj.flat(adv), traj.flat(traj.valid)))[:, None]
            old_lp = jax.lax.stop_gradient(policy.log_prob(
                params, traj.flat(traj.state), traj.flat(traj.action)))
            valid = traj.flat(traj.valid)[:, None]

            def loss_fn(p):
                new_lp = policy.log_prob(p, traj.flat(traj.state),
                                         traj.flat(traj.action))
                ratio = jnp.exp(new_lp - old_lp)
                clipped = jnp.clip(ratio, 1 - rl_cfg.ppo_clip_ratio,
                                   1 + rl_cfg.ppo_clip_ratio) * adv_flat
                return -rl.masked_mean(jnp.minimum(ratio * adv_flat, clipped),
                                       valid)

            total = 0.0
            for _ in range(rl_cfg.ppo_epochs):
                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                total += loss
            rew = jnp.sum(traj.reward * traj.valid) / traj.n_episodes
            return params, opt_state, total / rl_cfg.ppo_epochs, rew

        if is_device:
            # Fused: rollout + ppo epochs in ONE XLA program (a standalone
            # jitted scan is pathologically slow on this runtime).
            @jax.jit
            def ppo_step(params, opt_state, task, k):
                return ppo_update(params, opt_state, roll(params, task, k))
        else:
            jit_update = jax.jit(ppo_update)

            def ppo_step(params, opt_state, task, k):
                return jit_update(params, opt_state, roll(params, task, k))

        t = trange(cfg.num_iterations)
        iteration = 0
        try:
            for iteration in t:
                key, tk = jax.random.split(key)
                task_list = env.sample_tasks(tk, cfg.meta_batch_size)
                iter_rew, iter_loss = 0.0, 0.0
                for i in range(cfg.meta_batch_size):
                    key, k = jax.random.split(key)
                    params, opt_state, loss, rew = ppo_step(
                        params, opt_state, _task_at(task_list, i), k)
                    iter_rew += float(rew)
                    iter_loss += float(loss)
                metrics = {"average_return": iter_rew / cfg.meta_batch_size,
                           "loss": iter_loss / cfg.meta_batch_size}
                t.set_postfix(metrics)
                self.log_metrics(metrics)
                if iteration % cfg.save_every == 0:
                    self.save_model_checkpoint(params, iteration + 1)
        except (KeyboardInterrupt, DivergenceError) as stop:
            self.mark_stopped(stop, iteration)

        self.save_model(params)
        self.logger["elapsed_time"] = f"{round(t.format_dict['elapsed'], 2)} sec"

        # Meta-test with few-step adaptation on a fresh test env
        # (reference ppo.py:135-136 wraps the trained policy in MAML).
        key, ek = jax.random.split(key)
        adapt_cfg = rl_cfg._replace(inner_lr=cfg.inner_lr,
                                    adapt_steps=cfg.adapt_steps)
        final = rl.meta_test("ppo", cfg.env, policy, params, adapt_cfg,
                             n_tasks=cfg.n_eval_tasks, key=ek, seed=cfg.seed)
        self.logger["test_reward"] = final["mean_reward"]
        self.log_metrics({"test_reward": final["mean_reward"]})
        self.save_logs_to_file()
        return final


class TRPOBaseline(Experiment):
    """Plain single-task TRPO across tasks (reference baselines/trpo.py:
    full KL/HVP/CG/line-search update per task batch)."""

    def __init__(self, cfg: RLScriptConfig, path: str = "trpo_results/"):
        super().__init__("trpo", cfg.env, cfg.to_params(), path=path,
                         use_wandb=cfg.use_wandb)
        self.cfg = cfg

    def run(self) -> dict:
        cfg = self.cfg
        env, is_device, policy, roll = _setup_rl_baseline(cfg)
        key = jax.random.key(cfg.seed)
        key, ik = jax.random.split(key)
        params = policy.init(ik)

        rl_cfg = rl.RLConfig(gamma=cfg.gamma, tau=cfg.tau,
                             adapt_batch_size=cfg.adapt_batch_size,
                             max_path_length=cfg.max_path_length)

        from jax.flatten_util import ravel_pytree

        def trpo_update(params, traj):
            adv, _ = rl.traj_advantages(traj, rl_cfg)
            adv_flat = jax.lax.stop_gradient(rl.masked_normalize(
                traj.flat(adv), traj.flat(traj.valid)))[:, None]
            states = traj.flat(traj.state)
            actions = traj.flat(traj.action)
            valid = traj.flat(traj.valid)[:, None]

            flat0, unravel = ravel_pytree(params)
            old_loc, old_scale = policy.density(params, states)
            old_lp = jax.lax.stop_gradient(
                jnp.mean(normal_log_prob(old_loc, old_scale, actions),
                         axis=-1, keepdims=True))

            def surrogate(flat):
                p = unravel(flat)
                loc, scale = policy.density(p, states)
                new_lp = jnp.mean(normal_log_prob(loc, scale, actions),
                                  axis=-1, keepdims=True)
                return -rl.masked_mean(jnp.exp(new_lp - old_lp) * adv_flat,
                                       valid)

            def kl_fn(flat):
                p = unravel(flat)
                loc, scale = policy.density(p, states)
                return rl.masked_mean(
                    normal_kl(loc, scale,
                              jax.lax.stop_gradient(old_loc),
                              jax.lax.stop_gradient(old_scale)),
                    jnp.broadcast_to(valid, loc.shape))

            old_loss, grad = jax.value_and_grad(surrogate)(flat0)
            grad_kl = jax.grad(kl_fn)

            def Fvp(v):
                _, hv = jax.jvp(grad_kl, (flat0,), (v,))
                return hv + 1e-5 * v

            step = conjugate_gradient(Fvp, grad)
            shs = 0.5 * jnp.dot(step, Fvp(step))
            step = step / jnp.sqrt(shs / cfg.max_kl)

            def cond(s):
                i, acc, _ = s
                return jnp.logical_and(i < cfg.ls_max_steps,
                                       jnp.logical_not(acc))

            def body(s):
                i, _, cur = s
                size = (cfg.backtrack_factor ** i) * cfg.outer_lr
                cand = flat0 - size * step
                ok = jnp.logical_and(surrogate(cand) < old_loss,
                                     kl_fn(cand) < cfg.max_kl)
                return i + 1, ok, jnp.where(ok, cand, cur)

            _, _, final = jax.lax.while_loop(
                cond, body, (jnp.zeros((), jnp.int32),
                             jnp.zeros((), bool), flat0))
            rew = jnp.sum(traj.reward * traj.valid) / traj.n_episodes
            return unravel(final), rew

        if is_device:
            @jax.jit
            def trpo_step(params, task, k):
                return trpo_update(params, roll(params, task, k))
        else:
            jit_update = jax.jit(trpo_update)

            def trpo_step(params, task, k):
                return jit_update(params, roll(params, task, k))

        t = trange(cfg.num_iterations)
        iteration = 0
        try:
            for iteration in t:
                key, tk = jax.random.split(key)
                task_list = env.sample_tasks(tk, cfg.meta_batch_size)
                iter_rew = 0.0
                for i in range(cfg.meta_batch_size):
                    key, k = jax.random.split(key)
                    params, rew = trpo_step(params, _task_at(task_list, i), k)
                    iter_rew += float(rew)
                metrics = {"average_return": iter_rew / cfg.meta_batch_size}
                t.set_postfix(metrics)
                self.log_metrics(metrics)
                if iteration % cfg.save_every == 0:
                    self.save_model_checkpoint(params, iteration + 1)
        except (KeyboardInterrupt, DivergenceError) as stop:
            self.mark_stopped(stop, iteration)

        self.save_model(params)
        self.logger["elapsed_time"] = f"{round(t.format_dict['elapsed'], 2)} sec"
        key, ek = jax.random.split(key)
        adapt_cfg = rl_cfg._replace(inner_lr=cfg.inner_lr,
                                    adapt_steps=cfg.adapt_steps)
        final = rl.meta_test("trpo", cfg.env, policy, params, adapt_cfg,
                             n_tasks=cfg.n_eval_tasks, key=ek, seed=cfg.seed)
        self.logger["test_reward"] = final["mean_reward"]
        self.save_logs_to_file()
        return final


class RandomPolicyBaseline(Experiment):
    """Random policy control (reference ``baselines/random.py:65-115``):
    roll an UNTRAINED policy over sampled tasks for ``num_iterations``,
    logging ``average_return`` per iteration and checkpointing on the
    ``save_every`` cadence (policy + the LinearValue baseline artifact),
    then meta-test with **PPO** few-step adaptation (reference
    ``random.py:112-115`` wraps in MAML and calls ``evaluate_ppo``).

    The baseline artifact note: cherry's LinearValue is a persistent
    module the reference checkpoints alongside the policy
    (``random.py:99,108``); here the fit is closed-form per batch
    (ops/value.py), so each ``baseline_<iter>.npz`` stores the weights
    fitted on that iteration's rollouts."""

    def __init__(self, cfg: RLScriptConfig, path: str = "random_results/"):
        super().__init__("random", cfg.env, cfg.to_params(), path=path,
                         use_wandb=cfg.use_wandb)
        self.cfg = cfg

    def run(self) -> dict:
        import numpy as np

        from exploring_meta_tpu.ops.gae import discount
        from exploring_meta_tpu.ops.value import fit_linear_value

        cfg = self.cfg
        env, is_device, policy, roll = _setup_rl_baseline(cfg)
        key = jax.random.key(cfg.seed)
        key, ik = jax.random.split(key)
        params = policy.init(ik)
        self.log_model(params)
        rl_cfg = rl.RLConfig(gamma=cfg.gamma, tau=cfg.tau,
                             inner_lr=cfg.inner_lr,
                             adapt_steps=cfg.adapt_steps,
                             adapt_batch_size=cfg.adapt_batch_size,
                             max_path_length=cfg.max_path_length,
                             ppo_epochs=cfg.ppo_epochs,
                             ppo_clip_ratio=cfg.ppo_clip_ratio)

        def reward_and_fit(traj):
            rew = jnp.sum(traj.reward * traj.valid) / traj.n_episodes
            returns = discount(cfg.gamma, traj.reward, traj.done)
            w = fit_linear_value(traj.flat(traj.state),
                                 traj.flat(traj.timestep),
                                 traj.flat(returns),
                                 weights=traj.flat(traj.valid))
            return rew, w

        if is_device:
            @jax.jit
            def run_task(params, task, k):
                return reward_and_fit(roll(params, task, k))
        else:
            fit = jax.jit(reward_and_fit)

            def run_task(params, task, k):
                return fit(roll(params, task, k))

        t = trange(cfg.num_iterations)
        iteration = 0
        baseline_w = None
        try:
            for iteration in t:
                key, tk = jax.random.split(key)
                task_list = env.sample_tasks(tk, cfg.meta_batch_size)
                iter_rew = 0.0
                for i in range(cfg.meta_batch_size):
                    key, k = jax.random.split(key)
                    rew, baseline_w = run_task(params, _task_at(task_list, i),
                                               k)
                    iter_rew += float(rew)
                metrics = {"average_return": iter_rew / cfg.meta_batch_size}
                t.set_postfix(metrics)
                self.log_metrics(metrics)
                if iteration % cfg.save_every == 0:
                    self.save_model_checkpoint(params, iteration + 1)
                    np.savez(os.path.join(self.model_path,
                                          "model_checkpoints",
                                          f"baseline_{iteration + 1}.npz"),
                             weight=np.asarray(baseline_w))
        except (KeyboardInterrupt, DivergenceError) as stop:
            self.mark_stopped(stop, iteration)

        self.save_model(params)
        if baseline_w is not None:
            np.savez(os.path.join(self.model_path, "baseline.npz"),
                     weight=np.asarray(baseline_w))
        self.logger["elapsed_time"] = (
            f"{round(t.format_dict['elapsed'], 2)} sec")

        # Meta-test with PPO adaptation (reference random.py:112-115).
        key, ek = jax.random.split(key)
        final = rl.meta_test("ppo", cfg.env, policy, params, rl_cfg,
                             n_tasks=cfg.n_eval_tasks, key=ek, seed=cfg.seed)
        self.logger["test_reward"] = final["mean_reward"]
        self.log_metrics({"test_reward": final["mean_reward"]})
        self.save_logs_to_file()
        return final


# ---------------------------------------------------------------------------
# Vision baseline
# ---------------------------------------------------------------------------

class VisionBaseline(Experiment):
    """Supervised training on task batches, no inner loop; meta-tested with
    post-hoc MAML adaptation (reference baselines/vision.py)."""

    def __init__(self, cfg: VisionConfig, path: str = "results/"):
        super().__init__("baseline", cfg.dataset, cfg.to_params(), path=path,
                         use_wandb=cfg.use_wandb)
        self.cfg = cfg

    def run(self) -> float:
        cfg = self.cfg
        _warn_unsupported(cfg)
        train_ds, valid_ds, test_ds = tasks.get_dataset(
            cfg.dataset, seed=cfg.seed, synthetic=cfg.synthetic or None)
        # Always set it — a previous trainer in this process may have left
        # the module default on another lowering.
        from exploring_meta_tpu.models.layers import set_conv_impl
        set_conv_impl(cfg.conv_impl)
        spec = _build_spec(cfg, anil=False)
        key = jax.random.key(cfg.seed)
        key, ik = jax.random.split(key)
        params = models.init_cnn4(ik, spec)
        opt = optax.adam(cfg.outer_lr)
        opt_state = opt.init(params)
        self.log_model(params)

        @jax.jit
        def sgd_step(params, opt_state, data_b, labels_b):
            # The reference takes n_batch_iter SEQUENTIAL optimizer.step()
            # calls per iteration, one per sampled task batch
            # (vision.py:91-103) — a scan of per-batch Adam updates, NOT
            # one update on the mean loss (which would give ~n_batch_iter
            # fewer optimizer steps and different Adam dynamics).
            def one(carry, xs):
                p, o = carry
                x, y = xs

                def loss_fn(pp):
                    logits = models.cnn4_apply(pp, spec, x)
                    return cross_entropy(logits, y), accuracy(logits, y)

                (l, a), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
                up, o = opt.update(g, o, p)
                return (optax.apply_updates(p, up), o), (l, a)

            (params, opt_state), (ls, accs) = jax.lax.scan(
                one, (params, opt_state), (data_b, labels_b))
            return params, opt_state, jnp.mean(ls), jnp.mean(accs)

        n_batch_iter = max(1, int(320 / cfg.meta_batch_size))
        t = trange(cfg.num_iterations)
        iteration = 0
        try:
            for iteration in t:
                key, k = jax.random.split(key)
                # n_batch_iter task batches per iteration (each one task's
                # ways*2*shots samples — the reference's train_tasks.sample())
                data, labels = tasks.sample_task_batch(
                    k, train_ds, cfg.ways, cfg.shots, n_batch_iter)
                params, opt_state, loss, acc = sgd_step(params, opt_state,
                                                        data, labels)
                metrics = {"train_loss": float(loss),
                           "train_acc": float(acc)}
                t.set_postfix(metrics)
                self.log_metrics(metrics)
                if iteration % cfg.save_every == 0:
                    self.save_model_checkpoint(params, iteration)
        except (KeyboardInterrupt, DivergenceError) as stop:
            self.mark_stopped(stop, iteration)

        self.save_model(params)
        self.logger["elapsed_time"] = f"{round(t.format_dict['elapsed'], 2)} sec"

        # Meta-test with post-hoc MAML wrapping (reference vision.py:141-143)
        fast_adapt = adapt.make_vision_fast_adapt(
            spec, inner_lr=cfg.outer_lr, adapt_steps=1,
            shots=cfg.shots, ways=cfg.ways)
        meta_eval = adapt.make_meta_eval(fast_adapt)
        key, k = jax.random.split(key)
        data, labels = tasks.sample_task_batch(k, test_ds, cfg.ways,
                                               cfg.shots, cfg.meta_batch_size)
        test_acc = float(meta_eval(params, data, labels)["metric"])
        print("Meta Test Accuracy", test_acc)
        self.logger["test_acc"] = test_acc
        self.save_logs_to_file()
        return test_acc
