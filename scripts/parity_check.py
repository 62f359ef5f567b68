#!/usr/bin/env python3
"""Accuracy-parity check: this framework vs a torch reproduction of the
reference, trained on the SAME data / task distribution.

Vision mode (default): the target (BASELINE.json) is meta-test accuracy
within 0.5% of the PyTorch/learn2learn reference. Real Omniglot is
unavailable in hermetic environments, so this check trains both
implementations on the identical synthetic episodic dataset (same packed
arrays, same split) with the same hyperparameters and compares meta-test
accuracy over many tasks. The torch side reproduces the reference
training step exactly (sequential per-task clone -> create_graph inner
adapt -> query backward -> grad mean -> Adam; BN in train mode).
Prints one JSON line:
  {"jax_acc": ..., "torch_acc": ..., "diff": ...}

RL mode (``--rl trpo`` / ``--rl ppo``): trains this framework's
MAML-TRPO / MAML-PPO alongside a torch reproduction of the reference
algorithm (scripts/torch_rl_repro.py — reference
``core_functions/rl.py:264-316,343-473``) on the same Particles2D task
distribution with identical hyperparameters (independent RNG streams),
then compares post-adaptation meta-test reward. Prints one JSON line:
  {"jax_rew": ..., "torch_rew": ..., "jax_pre": ..., "torch_pre": ...,
   "diff": ..., "rel_diff": ...}
where ``rel_diff`` is the reward gap normalized by the mean improvement
over the untrained policy (the meaningful scale for reward parity).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # torch_rl_repro

WAYS, SHOTS = 5, 1


def sample_np_task(rng, images, ways, shots, invert=True, rotations=True):
    """Host-side task sampler with the same episodic semantics (class-major,
    even/odd support/query interleave) for the torch side. ``invert`` and
    ``rotations`` are Omniglot-only transforms (reference
    ``utils/data_pre.py:17-35`` vs the plain Mini-ImageNet pipeline)."""
    n_cls, n_per = images.shape[0], images.shape[1]
    cls = rng.choice(n_cls, ways, replace=False)
    data, labels = [], []
    for c_new, c in enumerate(cls):
        smp = rng.choice(n_per, 2 * shots, replace=False)
        imgs = images[c, smp].astype(np.float32) / 255.0
        if invert:
            imgs = 1.0 - imgs
        if rotations:
            k = rng.integers(0, 4)
            imgs = np.rot90(imgs, k, axes=(1, 2)).copy()
        data.append(imgs)
        labels += [c_new] * 2 * shots
    data = np.concatenate(data)  # [ways*2s, H, W, C]
    labels = np.array(labels)
    idx_s = np.arange(shots * ways) * 2
    idx_q = idx_s + 1
    return (data[idx_s], labels[idx_s]), (data[idx_q], labels[idx_q])


def _torch_conv_base(torch, in_ch, hidden, max_pool):
    """Reference ConvBase (vision_models.py:121-193): conv3x3 (stride 2
    when not max-pooling) -> BN(affine, U(0,1) weight) -> ReLU
    [-> maxpool2]; conv init xavier-uniform + zero bias."""
    blocks = []
    for _ in range(4):
        conv = torch.nn.Conv2d(in_ch, hidden, 3,
                               stride=1 if max_pool else 2, padding=1)
        torch.nn.init.xavier_uniform_(conv.weight)
        torch.nn.init.zeros_(conv.bias)
        bn = torch.nn.BatchNorm2d(hidden, affine=True)
        torch.nn.init.uniform_(bn.weight)
        blocks += [conv, bn, torch.nn.ReLU()]
        if max_pool:
            blocks.append(torch.nn.MaxPool2d(2, 2))
        in_ch = hidden
    return torch.nn.Sequential(*blocks)


def build_torch_model(torch, dataset: str, anil: bool):
    """Faithful torch builds of the four reference vision configurations:
    OmniglotCNN (vision_models.py:10-63), MiniImagenetCNN (:66-118), and
    the two ANIL feature/head splits (vision/anil_vision.py:85-94).
    -> (model, forward(params, x)) with model.head the inner-loop target
    for ANIL."""

    class MamlOmni(torch.nn.Module):
        """64ch stride-2 ConvBase -> global spatial mean -> Linear(64, ways)
        with N(0,1) weight (vision_models.py:38-55)."""

        def __init__(self):
            super().__init__()
            self.base = _torch_conv_base(torch, 1, 64, max_pool=False)
            self.head = torch.nn.Linear(64, WAYS)
            with torch.no_grad():
                self.head.weight.normal_()
                self.head.bias.zero_()

        def forward(self, x):
            return self.head(self.base(x).mean(dim=[2, 3]))

    class MamlMin(torch.nn.Module):
        """32ch maxpool ConvBase -> flatten 800 -> maml_init_ Linear
        (vision_models.py:93-110)."""

        def __init__(self):
            super().__init__()
            self.base = _torch_conv_base(torch, 3, 32, max_pool=True)
            self.head = torch.nn.Linear(800, WAYS)
            torch.nn.init.xavier_uniform_(self.head.weight)
            torch.nn.init.zeros_(self.head.bias)

        def forward(self, x):
            return self.head(self.base(x).flatten(1))

    class Anil(torch.nn.Module):
        """ConvBase features + flatten + torch-default Linear head
        (anil_vision.py:85-94: omni hidden=32 stride-2 -> 128; min
        hidden=64 maxpool -> 1600; head built raw, keeping torch's
        default kaiming-uniform init)."""

        def __init__(self, channels, hidden, max_pool, fc):
            super().__init__()
            self.base = _torch_conv_base(torch, channels, hidden, max_pool)
            self.head = torch.nn.Linear(fc, WAYS)

        def features(self, x):
            return self.base(x).flatten(1)

        def forward(self, x):
            return self.head(self.features(x))

    if anil:
        model = (Anil(1, 32, False, 128) if dataset == "omni"
                 else Anil(3, 64, True, 1600))
    else:
        model = MamlOmni() if dataset == "omni" else MamlMin()
    return model.train()


def run_torch(images_train, images_test, iters, meta_batch, inner_lr,
              outer_lr, adapt_steps, eval_tasks, seed, dataset="omni",
              anil=False):
    import torch
    torch.manual_seed(seed)
    rng = np.random.default_rng(seed)
    is_omni = dataset == "omni"

    model = build_torch_model(torch, dataset, anil)
    opt = torch.optim.Adam(model.parameters(), lr=outer_lr)
    loss_fn = torch.nn.CrossEntropyLoss()

    def to_t(x):
        return torch.tensor(x.transpose(0, 3, 1, 2))

    def adapt_and_query_maml(params, support, query, track_higher):
        (xs, ys), (xq, yq) = support, query
        xs, xq = to_t(xs), to_t(xq)
        ys, yq = torch.tensor(ys), torch.tensor(yq)
        cur = params
        for _ in range(adapt_steps):
            loss = loss_fn(torch.func.functional_call(model, cur, (xs,)), ys)
            grads = torch.autograd.grad(loss, list(cur.values()),
                                        create_graph=track_higher)
            cur = {n: p - inner_lr * g
                   for (n, p), g in zip(cur.items(), grads)}
        logits = torch.func.functional_call(model, cur, (xq,))
        q_loss = loss_fn(logits, yq)
        acc = (logits.argmax(1) == yq).float().mean().item()
        return q_loss, acc

    class FeatWrap(torch.nn.Module):
        """Module view exposing only the feature path (base.*)."""

        def __init__(self, inner):
            super().__init__()
            self.base = inner.base

        def forward(self, x):
            return self.base(x).flatten(1)

    def adapt_and_query_anil(params, support, query, track_higher):
        # prepare_batch(features=...) encodes the WHOLE 2NK batch in one
        # pass (shared BN statistics over support+query, data_pre.py:118),
        # then the inner loop adapts ONLY the head on those features
        # (anil_vision.py:93-99); the body graph is kept so meta-grads
        # reach it through both the head update and the query loss.
        (xs, ys), (xq, yq) = support, query
        n_s = xs.shape[0]
        x_all = to_t(np.concatenate([xs, xq]))
        ys, yq = torch.tensor(ys), torch.tensor(yq)
        base_params = {k: v for k, v in params.items()
                       if k.startswith("base.")}
        head_params = {k.split(".", 1)[1]: v for k, v in params.items()
                       if k.startswith("head.")}
        f_all = torch.func.functional_call(
            FeatWrap(model), base_params, (x_all,))
        f_s, f_q = f_all[:n_s], f_all[n_s:]
        cur = head_params
        for _ in range(adapt_steps):
            logits = torch.nn.functional.linear(f_s, cur["weight"],
                                                cur["bias"])
            loss = loss_fn(logits, ys)
            grads = torch.autograd.grad(loss, list(cur.values()),
                                        create_graph=track_higher)
            cur = {n: p - inner_lr * g
                   for (n, p), g in zip(cur.items(), grads)}
        logits = torch.nn.functional.linear(f_q, cur["weight"], cur["bias"])
        q_loss = loss_fn(logits, yq)
        acc = (logits.argmax(1) == yq).float().mean().item()
        return q_loss, acc

    adapt_and_query = adapt_and_query_anil if anil else adapt_and_query_maml

    def sample(images):
        return sample_np_task(rng, images, WAYS, SHOTS,
                              invert=is_omni, rotations=is_omni)

    for it in range(iters):
        opt.zero_grad()
        for _ in range(meta_batch):
            task = sample(images_train)
            params = dict(model.named_parameters())
            q_loss, _ = adapt_and_query(params, *task, track_higher=True)
            (q_loss / meta_batch).backward()
        opt.step()
        if (it + 1) % 25 == 0:
            print(f"torch iter {it + 1}/{iters}", flush=True)

    accs = []
    for _ in range(eval_tasks):
        task = sample(images_test)
        params = {n: p.detach().clone().requires_grad_(True)
                  for n, p in model.named_parameters()}
        _, acc = adapt_and_query(params, *task, track_higher=False)
        accs.append(acc)
    return float(np.mean(accs))


def run_jax(train_ds, test_ds, iters, meta_batch, inner_lr, outer_lr,
            adapt_steps, eval_tasks, seed, bf16=False, dataset="omni",
            anil=False):
    import jax
    import optax
    from exploring_meta_tpu import adapt, models, tasks

    if dataset == "omni":
        spec = (models.anil_omniglot_spec(ways=WAYS) if anil
                else models.omniglot_spec(ways=WAYS))
    else:
        spec = (models.anil_mini_imagenet_spec(ways=WAYS) if anil
                else models.mini_imagenet_spec(ways=WAYS))
    key = jax.random.key(seed)
    key, ik = jax.random.split(key)
    params = models.init_cnn4(ik, spec)
    fa = adapt.make_vision_fast_adapt(spec, inner_lr, adapt_steps, SHOTS,
                                      WAYS, anil=anil)
    if bf16:  # mixed precision: bf16 compute graph, f32 master params
        fa = adapt.cast_compute(fa)
    opt = optax.adam(outer_lr)
    step = adapt.make_meta_step(fa, opt)
    ev = adapt.make_meta_eval(fa)
    opt_state = opt.init(params)
    for it in range(iters):
        key, k = jax.random.split(key)
        d, l = tasks.sample_task_batch(k, train_ds, WAYS, SHOTS, meta_batch)
        params, opt_state, m = step(params, opt_state, d, l)
    # Evaluate EXACTLY eval_tasks tasks (in 32-task compiled batches plus
    # one remainder batch) so both implementations average over the same
    # sample size — a rounded count would skew the parity diff.
    accs, weights = [], []
    remaining = eval_tasks
    while remaining > 0:
        b = min(32, remaining)
        key, k = jax.random.split(key)
        d, l = tasks.sample_task_batch(k, test_ds, WAYS, SHOTS, b)
        accs.append(float(ev(params, d, l)["metric"]))
        weights.append(b)
        remaining -= b
    return float(np.average(accs, weights=weights))


# ---------------------------------------------------------------------------
# RL parity: MAML-TRPO / MAML-PPO on Particles2D vs the torch reproduction
# ---------------------------------------------------------------------------

def default_rl_cfg(algo: str) -> dict:
    """Shared hyperparameters for both implementations (Particles2D-scaled
    versions of reference rl/maml_trpo.py:19-40 / rl/maml_ppo.py:19-37)."""
    cfg = {
        "inner_lr": 0.05, "gamma": 0.99, "tau": 1.0,
        "adapt_steps": 1, "adapt_batch_size": 10, "max_path_length": 50,
        "meta_batch_size": 10, "num_iterations": 30, "n_eval_tasks": 40,
        # LinearValue ridge reg: the reference passes env.action_size
        # positionally into cherry's reg parameter (rl/maml_trpo.py:85),
        # so reference-exact runs use 2.0 on Particles2D (PARITY.md D9).
        "value_reg": 2.0,
        # TRPO outer
        "outer_lr": 0.3, "backtrack_factor": 0.5, "ls_max_steps": 15,
        "max_kl": 0.05,
        # PPO inner/outer
        "ppo_epochs": 3, "ppo_clip_ratio": 0.3,
    }
    if algo in ("ppo", "vpg"):
        cfg["outer_lr"] = 3e-3  # Adam
    return cfg


def run_jax_rl(algo: str, cfg: dict, seed: int, bf16: bool = False,
               exact: bool = True, anil: bool = False):
    """Train this framework's MAML-{TRPO,PPO} on device Particles2D with
    the same building blocks the RLTrainer uses (trainers/rl.py
    _make_trpo_iteration / _make_adam_iteration), then meta-test.
    -> (post_reward, pre_reward).

    ``exact=True`` runs the parity comparison under reference-exact
    semantics (cherry's flat-replay-index baseline timestep,
    RLConfig.flat_timestep); ``exact=False`` measures the framework's
    default (within-episode timestep — the documented improvement)."""
    import jax
    import jax.numpy as jnp
    import optax
    from exploring_meta_tpu import rl
    from exploring_meta_tpu.envs import Particles2D
    from exploring_meta_tpu.models import DiagNormalPolicy, DiagNormalPolicyANIL

    env = Particles2D()
    if anil:  # tanh body + head/sigma-only inner updates (anil_trpo.py)
        policy = DiagNormalPolicyANIL(input_size=2, output_size=2,
                                      fc_neurons=100)
    else:
        policy = DiagNormalPolicy(input_size=2, output_size=2)
    if bf16:  # bf16 compute graph in every policy application (RL --bf16)
        policy = policy._replace(compute_dtype="bf16")
    key = jax.random.key(seed)
    key, ik = jax.random.split(key)
    params = policy.init(ik)
    rl_cfg = rl.RLConfig(
        inner_lr=cfg["inner_lr"], gamma=cfg["gamma"], tau=cfg["tau"],
        adapt_steps=cfg["adapt_steps"],
        adapt_batch_size=cfg["adapt_batch_size"],
        max_path_length=cfg["max_path_length"],
        ppo_epochs=cfg["ppo_epochs"],
        ppo_clip_ratio=cfg["ppo_clip_ratio"],
        anil=anil, flat_timestep=exact,
        # exact mode reproduces the reference's accidental reg =
        # action_size (D9); improved mode keeps the framework default.
        value_reg=(cfg.get("value_reg", 2.0) if exact else 1e-5))
    roll = rl.make_rollout(env, policy.sample,
                           episodes=cfg["adapt_batch_size"],
                           horizon=cfg["max_path_length"])
    mb = cfg["meta_batch_size"]

    # Paired evaluation: pre and post share ONE eval key -> identical
    # task draws and rollout seeds, so the difference isolates training.
    eval_key = jax.random.key(seed + 1000)
    pre = rl.meta_test(algo, "Particles2D-v1", policy, params, rl_cfg,
                       n_tasks=cfg["n_eval_tasks"], key=eval_key,
                       seed=seed)["mean_reward"]

    if algo == "trpo":
        trpo_cfg = rl.TRPOConfig(
            outer_lr=cfg["outer_lr"], max_kl=cfg["max_kl"],
            ls_max_steps=cfg["ls_max_steps"],
            backtrack_factor=cfg["backtrack_factor"])
        meta_step = rl.make_trpo_meta_step(policy, rl_cfg, trpo_cfg,
                                           adapt_steps=cfg["adapt_steps"])

        collect = rl.make_trpo_collect(policy, roll, rl_cfg)

        for it in range(cfg["num_iterations"]):
            key, tk, ak = jax.random.split(key, 3)
            tasks_batch = env.sample_tasks(tk, mb)
            keys = jax.random.split(ak, mb)
            old_params, _, replays, m = collect(params, tasks_batch, keys)
            params, _ = meta_step(params, old_params, replays)
            if (it + 1) % 5 == 0:
                print(f"jax trpo iter {it + 1}/{cfg['num_iterations']} "
                      f"adapt_reward {float(jnp.mean(m['reward'])):.3f}",
                      flush=True)
    else:
        opt = optax.adam(cfg["outer_lr"])
        opt_state = opt.init(params)

        fast_adapt = (rl.fast_adapt_vpg if algo == "vpg"
                      else rl.fast_adapt_ppo)

        @jax.jit
        def meta_step(params, opt_state, tasks_batch, keys):
            def batch_loss(p):
                def one(t, k):
                    _, loss, m = fast_adapt(policy, p, roll, t, k, rl_cfg)
                    return loss, m["reward"]
                losses, rews = jax.vmap(one)(tasks_batch, keys)
                return jnp.mean(losses), jnp.mean(rews)
            (_, rew), grads = jax.value_and_grad(
                batch_loss, has_aux=True)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, rew

        for it in range(cfg["num_iterations"]):
            key, tk, ak = jax.random.split(key, 3)
            tasks_batch = env.sample_tasks(tk, mb)
            keys = jax.random.split(ak, mb)
            params, opt_state, rew = meta_step(params, opt_state,
                                               tasks_batch, keys)
            if (it + 1) % 5 == 0:
                print(f"jax {algo} iter {it + 1}/{cfg['num_iterations']} "
                      f"adapt_reward {float(rew):.3f}", flush=True)

    post = rl.meta_test(algo, "Particles2D-v1", policy, params, rl_cfg,
                        n_tasks=cfg["n_eval_tasks"], key=eval_key,
                        seed=seed)["mean_reward"]
    return float(post), float(pre)


def run_torch_rl(algo: str, cfg: dict, seed: int):
    import torch_rl_repro as repro
    if algo == "trpo":
        return repro.train_maml_trpo(cfg, seed)
    if algo == "vpg":
        return repro.train_maml_vpg(cfg, seed)
    return repro.train_maml_ppo(cfg, seed)


def rl_parity(args) -> None:
    cfg = default_rl_cfg(args.rl)
    cfg["num_iterations"] = args.iters
    if args.meta_batch:
        cfg["meta_batch_size"] = args.meta_batch
    if args.eval_tasks:
        cfg["n_eval_tasks"] = args.eval_tasks
    if args.inner_lr is not None:
        cfg["inner_lr"] = args.inner_lr
    if args.outer_lr is not None:
        cfg["outer_lr"] = args.outer_lr
    cfg["adapt_steps"] = args.adapt_steps

    cfg["anil"] = args.anil
    jax_rew, jax_pre = run_jax_rl(args.rl, cfg, args.seed, bf16=args.bf16,
                                  exact=not args.improved, anil=args.anil)
    print(f"jax  {args.rl}: pre {jax_pre:.3f} -> post {jax_rew:.3f}",
          flush=True)
    torch_rew, torch_pre = run_torch_rl(args.rl, cfg, args.seed)
    print(f"torch {args.rl}: pre {torch_pre:.3f} -> post {torch_rew:.3f}",
          flush=True)

    improvement = 0.5 * ((jax_rew - jax_pre) + (torch_rew - torch_pre))
    diff = abs(jax_rew - torch_rew)
    print(json.dumps({
        "algo": args.rl,
        "anil": args.anil,
        "mode": "improved" if args.improved else "exact",
        "jax_rew": round(jax_rew, 3), "torch_rew": round(torch_rew, 3),
        "jax_pre": round(jax_pre, 3), "torch_pre": round(torch_pre, 3),
        "diff": round(diff, 3),
        "rel_diff": round(diff / abs(improvement), 4)
        if improvement else None,
        "cfg": {k: cfg[k] for k in ("inner_lr", "outer_lr", "adapt_steps",
                                    "meta_batch_size", "num_iterations",
                                    "n_eval_tasks", "value_reg")},
    }))


def main():
    from exploring_meta_tpu.utils.config import force_cpu_if_requested
    force_cpu_if_requested()  # EMT_FORCE_CPU=1 -> off-TPU smoke runs
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=None)
    p.add_argument("--meta_batch", type=int, default=None)
    p.add_argument("--inner_lr", type=float, default=None,
                   help="vision default 0.5; RL default 0.05")
    p.add_argument("--outer_lr", type=float, default=None,
                   help="vision default 0.003; RL default 0.3 (TRPO) / "
                        "3e-3 (Adam)")
    p.add_argument("--adapt_steps", type=int, default=1)
    p.add_argument("--eval_tasks", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--bf16", action="store_true",
                   help="gate the bf16-compute mode (trainer --bf16)")
    p.add_argument("--rl", choices=["trpo", "ppo", "vpg"], default=None,
                   help="RL parity mode: MAML-{TRPO,PPO,VPG} on "
                        "Particles2D vs the torch reference reproduction")
    p.add_argument("--improved", action="store_true",
                   help="RL mode: use the framework's default within-"
                        "episode baseline timestep instead of the "
                        "reference-exact flat replay index (measures the "
                        "documented deviation's gain)")
    p.add_argument("--dataset", choices=["omni", "min"], default="omni",
                   help="vision mode: Omniglot-shaped (28x28x1 stride-2 "
                        "CNN4) or Mini-ImageNet-shaped (84x84x3 maxpool "
                        "CNN4) synthetic data")
    p.add_argument("--anil", action="store_true",
                   help="ANIL: frozen-body head-only inner loop. Vision "
                        "mode (reference vision/anil_vision.py:86-99) and "
                        "RL mode (DiagNormalPolicyANIL, rl/anil_*.py)")
    p.add_argument("--compile_cache", type=str, default="",
                   help="persistent XLA compile cache dir ('' = default, "
                        "'off' disables) — repeat parity runs skip the "
                        "multi-minute remote compiles")
    args = p.parse_args()

    from exploring_meta_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache(args.compile_cache)

    if args.rl:
        args.iters = args.iters if args.iters is not None else 30
        rl_parity(args)
        return
    args.iters = args.iters if args.iters is not None else 150
    args.meta_batch = args.meta_batch or 16
    args.eval_tasks = args.eval_tasks or 256
    args.inner_lr = 0.5 if args.inner_lr is None else args.inner_lr
    args.outer_lr = 0.003 if args.outer_lr is None else args.outer_lr

    from exploring_meta_tpu import tasks
    if args.dataset == "omni":
        train_ds, _, test_ds = tasks.load_omniglot(seed=0, synthetic=True,
                                                   synthetic_classes=160)
    else:
        train_ds, _, test_ds = tasks.load_mini_imagenet(seed=0,
                                                        synthetic=True)
    imgs_train = np.asarray(train_ds.images)
    imgs_test = np.asarray(test_ds.images)

    jax_acc = run_jax(train_ds, test_ds, args.iters, args.meta_batch,
                      args.inner_lr, args.outer_lr, args.adapt_steps,
                      args.eval_tasks, args.seed, bf16=args.bf16,
                      dataset=args.dataset, anil=args.anil)
    print(f"jax meta-test acc: {jax_acc:.4f}", flush=True)

    torch_acc = run_torch(imgs_train, imgs_test, args.iters,
                          args.meta_batch, args.inner_lr, args.outer_lr,
                          args.adapt_steps, args.eval_tasks, args.seed,
                          dataset=args.dataset, anil=args.anil)
    print(f"torch meta-test acc: {torch_acc:.4f}", flush=True)

    print(json.dumps({"dataset": args.dataset, "anil": args.anil,
                      "jax_acc": round(jax_acc, 4),
                      "torch_acc": round(torch_acc, 4),
                      "diff": round(abs(jax_acc - torch_acc), 4)}))


if __name__ == "__main__":
    main()
