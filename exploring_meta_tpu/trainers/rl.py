"""Meta-RL trainers: MAML/ANIL x TRPO/PPO/VPG.

Equivalents of reference ``rl/maml_trpo.py``, ``rl/anil_trpo.py``,
``rl/maml_ppo.py``, ``rl/anil_ppo.py``, ``rl/maml_vpg.py``-style loops:
outer iterations sample a meta-batch of tasks, run per-task inner
adaptation while collecting rollouts, then take the outer step — TRPO's
natural-gradient replay step or Adam through the differentiable query
losses (PPO/VPG). Device envs (Particles2D) run the entire iteration as
compiled XLA programs.
"""

from __future__ import annotations

import contextlib
import os

import jax
import jax.numpy as jnp
import optax
from tqdm import trange

from exploring_meta_tpu import rl
from exploring_meta_tpu.envs import Particles2D
from exploring_meta_tpu.envs.factory import make_env
from exploring_meta_tpu.models import DiagNormalPolicy, DiagNormalPolicyANIL
from exploring_meta_tpu.rl.replay_meta import (
    collect_replays, make_replay_meta_loss,
)
from exploring_meta_tpu.utils.config import RLScriptConfig
from exploring_meta_tpu.utils.experiment import DivergenceError, Experiment
from exploring_meta_tpu.utils.profiling import PhaseTimer, device_trace


def make_device_env(name: str):
    """Device-env factory (the pure-JAX half of reference
    ``utils/env_maker.py:48-60``; host envs route through envs/host.py)."""
    if name.startswith("Particles2D"):
        return Particles2D()
    raise ValueError(
        f"{name!r} is not a device env — use envs.host for MuJoCo/Meta-World")


def build_policy(env, anil: bool, fc_neurons: int = 100,
                 activation: str = "relu"):
    """``activation`` makes the reference's dead knob real: every
    reference script carries ``params['activation']`` ("tanh for
    MetaWorld, relu otherwise", e.g. ``rl/maml_trpo.py:32``) but never
    passes it to ``DiagNormalPolicy(...)`` — the policies always ran
    relu. Here ``--activation tanh`` actually takes effect (the ANIL
    policy's body is tanh by construction, reference ``policies.py:79-85``,
    so the knob applies to the plain DiagNormalPolicy only)."""
    if anil:
        # Tie the body's output width to the head's input width: the
        # reference builds body hiddens=[100,100] regardless of
        # fc_neurons (policies.py:74-88), so any fc_neurons != 100
        # crashes there — here the knob actually works (fc_neurons is
        # the width of the features the ANIL head adapts on; the default
        # reproduces the reference's (100, 100) body exactly).
        return DiagNormalPolicyANIL(input_size=env.obs_size,
                                    output_size=env.action_size,
                                    fc_neurons=fc_neurons,
                                    hiddens=(100, fc_neurons))
    return DiagNormalPolicy(input_size=env.obs_size,
                            output_size=env.action_size,
                            activation=activation)


class RLTrainer(Experiment):
    """Meta-RL training loop for device envs."""

    def __init__(self, cfg: RLScriptConfig, algo: str, anil: bool = False,
                 path: str = "results/"):
        name = f"{'anil' if anil else 'maml'}_{algo}"
        super().__init__(name, cfg.env, cfg.to_params(), path=path,
                         use_wandb=cfg.use_wandb)
        self.cfg = cfg
        self.algo = algo
        self.anil = anil
        self.ckpt_backend = getattr(cfg, "ckpt_backend", "npz")
        self._timer = PhaseTimer() if cfg.profile else None
        self._fused_params = None
        self._fused_count = 0  # iterations fully completed (fused path)

    def _ph(self, name: str):
        """Profiling phase context (no-op list sink when profiling is off)."""
        if self._timer:
            return self._timer.phase(name)
        return contextlib.nullcontext([])

    def run(self) -> dict:
        cfg = self.cfg
        # Task-batched host collection steps the whole meta-batch through
        # one big vec env (meta_batch x episodes slots); per-task mode uses
        # episodes slots reused across tasks. --workers caps the native
        # thread-pool parallelism (the reference's AsyncVectorEnv worker
        # count; slot COUNT is fixed by the collection shape).
        workers = cfg.adapt_batch_size * (
            cfg.meta_batch_size if cfg.task_batch else 1)
        env, is_device = make_env(
            cfg.env, workers=workers, seed=cfg.seed,
            max_path_length=cfg.max_path_length,
            n_threads=cfg.workers if cfg.workers > 1 else None)
        policy = build_policy(env, self.anil, fc_neurons=cfg.fc_neurons,
                              activation=cfg.activation)
        if getattr(cfg, "bf16", False):
            # Mixed precision: every policy application (rollout sampling,
            # inner/outer losses, surrogate/KL) runs its MLP in bf16 with
            # f32 master params (models/policies.py compute_dtype).
            policy = policy._replace(compute_dtype="bf16")
        key = jax.random.key(cfg.seed)
        key, ik = jax.random.split(key)
        params = policy.init(ik)
        self.log_model(params)

        # One outer optimizer owned by the trainer (Adam paths); TRPO's
        # natural-gradient step is stateless. Shared so checkpoints can
        # carry resumable optimizer state.
        self._opt = None if self.algo == "trpo" else optax.adam(cfg.outer_lr)

        state = None
        if cfg.resume:  # true mid-training resume
            from exploring_meta_tpu.utils.experiment import resume_training
            opt_template = (self._opt.init(params)
                            if self._opt is not None else None)
            params, state, key, start_iteration = resume_training(
                cfg.resume, params, opt_template, key)
        else:
            start_iteration = 0

        rl_cfg = rl.RLConfig(
            inner_lr=cfg.inner_lr, gamma=cfg.gamma, tau=cfg.tau,
            adapt_steps=cfg.adapt_steps,
            adapt_batch_size=cfg.adapt_batch_size,
            max_path_length=cfg.max_path_length,
            ppo_epochs=cfg.ppo_epochs, ppo_clip_ratio=cfg.ppo_clip_ratio,
            anil=self.anil)
        if not is_device:
            # Host-env collection: route the per-step policy forward to the
            # chosen backend process-wide (eval/CL/RC paths inherit it).
            # Always set it — a previous trainer in this process may have
            # left the module default on another backend.
            from exploring_meta_tpu.envs.host import set_host_policy_device
            set_host_policy_device(getattr(cfg, "host_policy", "device"))
        if is_device:
            roll = rl.make_rollout(env, policy.sample,
                                   episodes=cfg.adapt_batch_size,
                                   horizon=cfg.max_path_length)
        elif cfg.task_batch:
            from exploring_meta_tpu.envs.host import make_grouped_host_rollout
            roll = make_grouped_host_rollout(env, policy,
                                             cfg.max_path_length,
                                             cfg.meta_batch_size,
                                             cfg.adapt_batch_size)
        else:
            from exploring_meta_tpu.envs.host import make_host_rollout
            roll = make_host_rollout(env, policy, cfg.max_path_length)

        use_fused = cfg.fuse > 1 and is_device
        if use_fused:
            step_fn = None
        elif not is_device and cfg.task_batch:
            # lockstep host collection is algo-independent (the replay
            # rederive / TRPO outer step dispatch happens inside)
            step_fn = self._make_host_batched_iteration(env, policy, roll,
                                                        rl_cfg)
        elif self.algo == "trpo":
            step_fn = (self._make_trpo_iteration(env, policy, roll, rl_cfg)
                       if is_device else
                       self._make_host_trpo_iteration(env, policy, roll,
                                                      rl_cfg))
        else:
            step_fn = (self._make_adam_iteration(env, policy, roll, rl_cfg)
                       if is_device else
                       self._make_host_adam_iteration(env, policy, roll,
                                                      rl_cfg))

        t = trange(start_iteration, cfg.num_iterations,
                   initial=start_iteration, total=cfg.num_iterations)
        iteration = start_iteration
        trace_ctx = (device_trace(cfg.trace) if getattr(cfg, "trace", "")
                     else contextlib.nullcontext())
        try:
          with trace_ctx:
            if use_fused:
                # rebind key: the final meta-test below must not reuse the
                # RNG stream that generated the training chunks
                iteration, key = self._fused_device_loop(
                    env, policy, roll, rl_cfg, params, key, t,
                    opt_state=state, start=start_iteration)
                params = self._fused_params  # final params from the loop
            else:
                for iteration in t:
                    key, k = jax.random.split(key)
                    params, state, metrics = step_fn(params, state, k)
                    t.set_postfix(metrics)
                    self.log_metrics(metrics)
                    if iteration % cfg.save_every == 0:
                        self.save_model_checkpoint(params, iteration,
                                                   opt_state=state,
                                                   rng_key=key,
                                                   async_write=cfg.async_ckpt)
        except (KeyboardInterrupt, DivergenceError) as stop:
            if use_fused:
                # the helper tracks completed-chunk progress on self; the
                # local `iteration` is only set on normal return. The
                # COUNT of completed iterations matches the non-fused
                # path's in-flight index (= rows in metrics.json).
                iteration = self._fused_count
                if self._fused_params is not None:
                    params = self._fused_params
            # `key` may still be the pre-loop key here (the fused loop
            # rebinds it only on normal return) — splitting it again for
            # the meta-test would reproduce training chunk 1's stream
            key = jax.random.fold_in(key, 0x5eed)
            self.mark_stopped(stop, iteration)

        self.flush_checkpoints()
        self.save_model(params)
        self.logger["elapsed_time"] = (
            f"{round(t.format_dict['elapsed'], 2)} sec")
        if self._timer:
            self._timer.save(os.path.join(self.model_path,
                                          "phase_times.json"))
            print("Phase times:", self._timer.summary())

        # Final meta-test on a FRESH test-split env (reference trainers
        # call evaluate() which builds test=True, rl.py:153).
        key, ek = jax.random.split(key)
        final = rl.meta_test(self.algo, cfg.env, policy, params, rl_cfg,
                             n_tasks=cfg.n_eval_tasks, key=ek, seed=cfg.seed,
                             task_batch=cfg.task_batch)
        print("Final evaluation:", final["mean_reward"],
              "success:", final["mean_success"])
        self.logger["final_eval"] = final
        self.log_metrics({"eval_reward": final["mean_reward"],
                          "eval_success": final["mean_success"]})
        self.save_logs_to_file()
        return final

    # -- fused device training: whole iterations under lax.scan -------------

    def _fused_device_loop(self, env, policy, roll, rl_cfg, params, key, t,
                           opt_state=None, start: int = 0):
        """Run num_iterations in chunks of ``cfg.fuse`` fully-fused XLA
        programs (rl/train_scan.py); logs per-iteration metrics and
        checkpoints at chunk boundaries. -> (last iteration index,
        advanced RNG key); final params exposed via ``self._fused_params``
        (KeyboardInterrupt-safe: updated after every chunk)."""
        cfg = self.cfg
        self._fused_params = params
        self._fused_count = start
        scans: dict = {}  # chunk length -> compiled program (<=2 entries)
        opt = self._opt
        if opt is not None and opt_state is None:
            opt_state = opt.init(params)
        trpo_cfg = self._trpo_cfg()

        mesh = None
        if getattr(cfg, "mesh", 1) > 1:
            # --mesh N --fuse K together: each chunk of K iterations is one
            # XLA program task-DP-sharded over N chips (parallel/mesh.py).
            from exploring_meta_tpu import parallel
            mesh = parallel.make_task_mesh(cfg.mesh)

        def run_chunk(n, params, opt_state, k):
            if n not in scans:
                if mesh is not None:
                    from exploring_meta_tpu import parallel
                    if self.algo == "trpo":
                        scans[n] = parallel.make_sharded_trpo_train_scan(
                            env, policy, roll, rl_cfg, trpo_cfg,
                            cfg.meta_batch_size, n, mesh)
                    else:
                        scans[n] = parallel.make_sharded_adam_train_scan(
                            env, policy, roll, rl_cfg, opt, self.algo,
                            cfg.meta_batch_size, n, mesh)
                elif self.algo == "trpo":
                    scans[n] = rl.make_trpo_train_scan(
                        env, policy, roll, rl_cfg, trpo_cfg,
                        cfg.meta_batch_size, n)
                else:
                    scans[n] = rl.make_adam_train_scan(
                        env, policy, roll, rl_cfg, opt, self.algo,
                        cfg.meta_batch_size, n)
            if self.algo == "trpo":
                p, ms = scans[n](params, k)
                return p, opt_state, ms
            return scans[n](params, opt_state, k)

        from exploring_meta_tpu.trainers.fused import drive_fused_chunks

        def chunk(n, state, k):
            p, o = state
            with self._ph("train_chunk") as sync:
                p, o, ms = run_chunk(n, p, o, k)
                sync.append(ms)
            return (p, o), ms

        def on_chunk(state, iteration):
            self._fused_params = state[0]
            self._fused_count = iteration + 1

        (params, opt_state), iteration, key = drive_fused_chunks(
            total=cfg.num_iterations, fuse=cfg.fuse,
            save_every=cfg.save_every, key=key, state=(params, opt_state),
            run_chunk=chunk,
            log_step=lambda ms, j: self.log_metrics(
                {name: float(v[j]) for name, v in ms.items()}),
            postfix=lambda ms: {name: float(v[-1])
                                for name, v in ms.items()},
            save_ckpt=lambda state, i, k: self.save_model_checkpoint(
                state[0], i, opt_state=state[1], rng_key=k,
                async_write=cfg.async_ckpt),
            progress=t, on_chunk=on_chunk, start=start)
        self._fused_params = params
        return iteration, key

    # -- TRPO outer step ---------------------------------------------------

    def _trpo_cfg(self) -> "rl.TRPOConfig":
        """One construction site for the outer-step hyperparameters so the
        fused and per-iteration paths cannot drift."""
        cfg = self.cfg
        return rl.TRPOConfig(outer_lr=cfg.outer_lr, max_kl=cfg.max_kl,
                             ls_max_steps=cfg.ls_max_steps,
                             backtrack_factor=cfg.backtrack_factor)

    def _make_trpo_meta_step(self, policy, rl_cfg):
        """The (optionally mesh-sharded, ``--mesh N``) TRPO outer step:
        ``(params, old_params_stack, replays) -> (params, info)``."""
        cfg = self.cfg
        trpo_cfg = self._trpo_cfg()
        if getattr(cfg, "mesh", 1) > 1:
            # Replays are placed task-sharded across chips; the 2nd-order
            # surrogate/CG/line search runs task-DP with pmean over ICI
            # (parallel/mesh.py).
            from exploring_meta_tpu import parallel
            mesh = parallel.make_task_mesh(cfg.mesh)
            sharded_step = parallel.make_sharded_trpo_meta_step(
                policy, rl_cfg, trpo_cfg, cfg.adapt_steps, mesh)

            def meta_step(params, old_params, replays):
                s_old, s_rep = parallel.shard_task_batch(
                    mesh, (old_params, replays))
                return sharded_step(params, s_old, s_rep)

            return meta_step
        return rl.make_trpo_meta_step(policy, rl_cfg, trpo_cfg,
                                      adapt_steps=cfg.adapt_steps)

    def _make_trpo_iteration(self, env, policy, roll, rl_cfg):
        cfg = self.cfg
        meta_step = self._make_trpo_meta_step(policy, rl_cfg)

        collect = rl.make_trpo_collect(policy, roll, rl_cfg)

        def iteration(params, _, key):
            k_tasks, k_adapt = jax.random.split(key)
            tasks_batch = env.sample_tasks(k_tasks, cfg.meta_batch_size)
            keys = jax.random.split(k_adapt, cfg.meta_batch_size)
            with self._ph("collect") as sync:
                old_params, losses, replays, metrics = collect(
                    params, tasks_batch, keys)
                sync.append(replays)
            with self._ph("meta_step") as sync:
                params, info = meta_step(params, old_params, replays)
                sync.append(params)
            return params, None, {
                "adapt_reward": float(jnp.mean(metrics["reward"])),
                "adapt_success": float(jnp.mean(metrics["success"])),
                "meta_loss": float(info["old_loss"]),
                "ls_accepted": bool(info["accepted"]),
            }

        return iteration

    # -- host-env TRPO: eager collection, jitted replay outer step ----------

    def _make_host_trpo_iteration(self, env, policy, roll, rl_cfg):
        cfg = self.cfg
        meta_step = self._make_trpo_meta_step(policy, rl_cfg)

        def iteration(params, _, key):
            key, tk = jax.random.split(key)
            tasks_list = env.sample_tasks(tk, cfg.meta_batch_size)
            replays, old_stack, rews, sucs = [], [], [], []
            with self._ph("collect"):
                for task in tasks_list:
                    key, k = jax.random.split(key)
                    adapted, _, replay, m = rl.fast_adapt_trpo(
                        policy, params, roll, task, k, rl_cfg)
                    replays.append(replay)
                    old_stack.append(adapted)
                    rews.append(float(m["reward"]))
                    sucs.append(float(m["success"]))
            with self._ph("meta_step") as sync:
                stacked = rl.stack_replays(replays)
                old_params = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs), *old_stack)
                params, info = meta_step(params, old_params, stacked)
                sync.append(params)
            return params, None, {
                "adapt_reward": sum(rews) / len(rews),
                "adapt_success": sum(sucs) / len(sucs),
                "meta_loss": float(info["old_loss"]),
                "ls_accepted": bool(info["accepted"]),
            }

        return iteration

    # -- Adam replay outer step (host envs), optionally mesh-sharded --------

    def _make_adam_replay_outer(self, policy, rl_cfg, opt):
        """``(params, opt_state, stacked_replays) -> (params, opt_state,
        loss)``; with --mesh N the replays are task-sharded and gradients
        pmean-reduced over ICI (parallel.make_sharded_replay_meta_step)."""
        cfg = self.cfg
        if getattr(cfg, "mesh", 1) > 1:
            from exploring_meta_tpu import parallel
            mesh = parallel.make_task_mesh(cfg.mesh)
            sharded = parallel.make_sharded_replay_meta_step(
                policy, rl_cfg, self.algo, opt, mesh)

            def outer(params, opt_state, stacked_replays):
                s_rep = parallel.shard_task_batch(mesh, stacked_replays)
                return sharded(params, opt_state, s_rep)

            return outer

        meta_loss = make_replay_meta_loss(self.algo, policy, rl_cfg)

        @jax.jit
        def outer(params, opt_state, stacked_replays):
            loss, grads = jax.value_and_grad(meta_loss)(params,
                                                        stacked_replays)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return outer

    # -- task-batched host collection (--task_batch): one big vec env -------

    def _make_host_batched_iteration(self, env, policy, roll, rl_cfg):
        """Host iteration with task-batched collection: the whole
        meta-batch rolls out in lockstep through one
        ``meta_batch x episodes``-slot vec env (rl/host_batched.py) —
        ``meta_batch``x fewer policy round-trips than the per-task loop —
        then the standard replay outer step (TRPO natural gradient or
        Adam through the re-derived query losses)."""
        from exploring_meta_tpu.rl.host_batched import collect_task_batched
        cfg = self.cfg
        algo = self.algo

        if algo == "trpo":
            meta_step = self._make_trpo_meta_step(policy, rl_cfg)
        else:
            opt = self._opt
            outer = self._make_adam_replay_outer(policy, rl_cfg, opt)

        def iteration(params, opt_state, key):
            key, tk, ck = jax.random.split(key, 3)
            tasks_list = env.sample_tasks(tk, cfg.meta_batch_size)
            with self._ph("collect") as sync:
                old_params, replays, m = collect_task_batched(
                    algo, policy, params, roll, tasks_list, ck, rl_cfg)
                sync.append(replays)
            with self._ph("meta_step") as sync:
                if algo == "trpo":
                    params, info = meta_step(params, old_params, replays)
                    loss = float(info["old_loss"])
                    extra = {"ls_accepted": bool(info["accepted"])}
                else:
                    if opt_state is None:
                        opt_state = opt.init(params)
                    params, opt_state, loss = outer(params, opt_state,
                                                    replays)
                    loss = float(loss)
                    extra = {}
                sync.append(params)
            return params, opt_state, {
                "meta_loss": loss,
                "adapt_reward": m["reward"],
                "adapt_success": m["success"],
                **extra,
            }

        return iteration

    # -- host-env PPO/VPG: eager collection, jitted replay meta-grad --------

    def _make_host_adam_iteration(self, env, policy, roll, rl_cfg):
        cfg = self.cfg
        opt = self._opt
        outer = self._make_adam_replay_outer(policy, rl_cfg, opt)

        def iteration(params, opt_state, key):
            if opt_state is None:
                opt_state = opt.init(params)
            key, tk = jax.random.split(key)
            tasks_list = env.sample_tasks(tk, cfg.meta_batch_size)
            replays, rews, sucs = [], [], []
            with self._ph("collect"):
                for task in tasks_list:
                    key, k = jax.random.split(key)
                    stacked, m = collect_replays(self.algo, policy, params,
                                                 roll, task, k, rl_cfg)
                    replays.append(stacked)
                    rews.append(float(m["reward"]))
                    sucs.append(float(m["success"]))
            with self._ph("meta_step") as sync:
                batched = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                                 *replays)
                params, opt_state, loss = outer(params, opt_state, batched)
                sync.append(params)
            return params, opt_state, {
                "meta_loss": float(loss),
                "adapt_reward": sum(rews) / len(rews),
                "adapt_success": sum(sucs) / len(sucs),
            }

        return iteration

    # -- Adam outer step (PPO / VPG) ----------------------------------------

    def _make_adam_iteration(self, env, policy, roll, rl_cfg):
        cfg = self.cfg
        opt = self._opt
        algo = self.algo

        if getattr(cfg, "mesh", 1) > 1:
            # Non-fused --mesh N device Adam: one sharded iteration per
            # dispatch (the n_steps=1 case of the fused sharded scan).
            from exploring_meta_tpu import parallel
            mesh = parallel.make_task_mesh(cfg.mesh)
            scan1 = parallel.make_sharded_adam_train_scan(
                env, policy, roll, rl_cfg, opt, algo,
                cfg.meta_batch_size, 1, mesh)

            def iteration(params, opt_state, key):
                if opt_state is None:
                    opt_state = opt.init(params)
                with self._ph("meta_step") as sync:
                    params, opt_state, ms = scan1(params, opt_state, key)
                    sync.append(params)
                return params, opt_state, {
                    "meta_loss": float(ms["meta_loss"][0]),
                    "adapt_reward": float(ms["adapt_reward"][0]),
                    "adapt_success": float(ms["adapt_success"][0]),
                }

            return iteration

        @jax.jit
        def meta_step(params, opt_state, tasks_batch, keys):
            def task_loss(p, task, k):
                if algo == "ppo":
                    _, loss, m = rl.fast_adapt_ppo(policy, p, roll, task, k,
                                                   rl_cfg)
                else:
                    _, loss, m = rl.fast_adapt_vpg(policy, p, roll, task, k,
                                                   rl_cfg)
                return loss, m

            def batch_loss(p):
                losses, ms = jax.vmap(lambda t, k: task_loss(p, t, k))(
                    tasks_batch, keys)
                return jnp.mean(losses), ms

            (loss, ms), grads = jax.value_and_grad(
                batch_loss, has_aux=True)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, ms

        def iteration(params, opt_state, key):
            if opt_state is None:
                opt_state = opt.init(params)
            k_tasks, k_adapt = jax.random.split(key)
            tasks_batch = env.sample_tasks(k_tasks, cfg.meta_batch_size)
            keys = jax.random.split(k_adapt, cfg.meta_batch_size)
            with self._ph("meta_step") as sync:
                params, opt_state, loss, ms = meta_step(params, opt_state,
                                                        tasks_batch, keys)
                sync.append(params)
            return params, opt_state, {
                "meta_loss": float(loss),
                "adapt_reward": float(jnp.mean(ms["reward"])),
                "adapt_success": float(jnp.mean(ms["success"])),
            }

        return iteration
