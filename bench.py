"""Headline benchmarks vs faithful torch-CPU reproductions of the reference.

``python bench.py`` (no args) runs the headline config — Omniglot-shaped
5-way 5-shot CNN4 MAML meta-training, the ``vision/maml_vision.py`` hot
path — and prints exactly ONE JSON line:

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``--config`` selects the other BASELINE.json configs (one JSON line per
invocation):

  maml_omni       MAML Omniglot 5w5s meta-train tasks/sec   (default)
  anil_min        ANIL Mini-ImageNet 5w5s meta-train tasks/sec
  trpo_particles  full MAML-TRPO meta-iteration (reference rl/maml_trpo.py
                  scale: 20 tasks x 20 eps x horizon 100, 2nd-order TRPO
                  outer step with CG + line search) — iterations/sec
  trpo_particles_fast  the same meta-iteration under the documented fast
                  flags (--bf16 --fuse 20, BASELINE.md r5s6c), same
                  torch-CPU denominator
  host_rollout_ant  MuJoCo Ant host-rollout env steps/sec through the
                  native C++ env pool vs the sequential Python loop
  host_collect_ant_batched  full Ant meta-batch collection (support +
                  on-device inner updates + query, all tasks) with
                  --task_batch lockstep collection vs the per-task
                  sequential loop

``vs_baseline`` divides by a torch-CPU (or sequential-Python, for
host_rollout_ant) reproduction of the reference's computation, measured
once on this machine and cached per-config in ``.bench_baseline.json``.
The torch baselines exclude data loading and batch work the reference ran
sequentially (both favor the baseline); the TPU numbers INCLUDE on-device
task sampling.

TIMING: the axon remote runtime's ``block_until_ready`` does not
synchronize — every timed window ends with a host fetch of a scalar that
transitively depends on all timed work.
"""

from __future__ import annotations

import argparse
import json
import os
import time

WAYS, SHOTS, META_BATCH, ADAPT_STEPS = 5, 5, 32, 1
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".bench_baseline.json")


def tunnel_up(timeout_s: float | None = None) -> bool:
    """Probe the remote TPU tunnel from a SUBPROCESS with a hard timeout.

    The axon tunnel's failure mode is an infinite in-process hang inside
    ``jax.devices()`` (not an exception), which cannot be interrupted once
    entered — so the probe must live in a child process we can kill. When
    the tunnel is up the probe costs one jax import + backend init
    (~15-25 s); when it is down, bounded failure instead of a bench run
    that never returns (and a driver round with no BENCH artifact at all).
    """
    import subprocess
    import sys
    if timeout_s is None:
        timeout_s = float(os.environ.get("EMT_BENCH_PROBE_TIMEOUT", "240"))
    try:
        r = subprocess.run([sys.executable, "-c",
                            "import jax; jax.devices()"],
                           timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


# ---------------------------------------------------------------------------
# torch-CPU reference reproductions (the denominators)
# ---------------------------------------------------------------------------

def measure_torch_cpu_baseline() -> float:
    """Reference-equivalent torch CPU MAML step; -> tasks/sec."""
    import numpy as np
    import torch

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 1)

    # Reference OmniglotCNN: 4x [conv3x3 s2 p1 -> BN -> ReLU], 64ch,
    # global mean, Linear(64 -> ways) (vision_models.py:38-55).
    blocks = []
    in_ch = 1
    for _ in range(4):
        blocks += [torch.nn.Conv2d(in_ch, 64, 3, stride=2, padding=1),
                   torch.nn.BatchNorm2d(64, affine=True),
                   torch.nn.ReLU()]
        in_ch = 64
    base = torch.nn.Sequential(*blocks)
    head = torch.nn.Linear(64, WAYS)

    class Model(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.base, self.head = base, head

        def forward(self, x):
            h = self.base(x)
            return self.head(h.mean(dim=[2, 3]))

    model = Model().train()
    opt = torch.optim.Adam(model.parameters(), lr=3e-3)
    loss_fn = torch.nn.CrossEntropyLoss()

    rng = np.random.default_rng(0)

    def one_iteration():
        opt.zero_grad()
        for _ in range(META_BATCH):
            xs = torch.tensor(rng.normal(size=(WAYS * SHOTS, 1, 28, 28))
                              .astype(np.float32))
            ys = torch.tensor(np.repeat(np.arange(WAYS), SHOTS))
            xq = torch.tensor(rng.normal(size=(WAYS * SHOTS, 1, 28, 28))
                              .astype(np.float32))
            params = dict(model.named_parameters())
            for _ in range(ADAPT_STEPS):
                loss = loss_fn(torch.func.functional_call(model, params, (xs,)), ys)
                grads = torch.autograd.grad(loss, list(params.values()),
                                            create_graph=True)
                params = {n: p - 0.5 * g
                          for (n, p), g in zip(params.items(), grads)}
            q_loss = loss_fn(torch.func.functional_call(model, params, (xq,)), ys)
            (q_loss / META_BATCH).backward()
        opt.step()

    one_iteration()  # warmup
    t0 = time.perf_counter()
    iters = 2
    for _ in range(iters):
        one_iteration()
    dt = time.perf_counter() - t0
    return META_BATCH * iters / dt


def measure_torch_cpu_anil_baseline() -> float:
    """Reference ANIL Mini-ImageNet step (vision/anil_vision.py:86-151):
    shared ConvBase(64ch, maxpool) encodes once per task, the inner loop
    adapts only the Linear(1600 -> ways) head with create_graph, outer
    Adam over body+head. -> tasks/sec."""
    import numpy as np
    import torch

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 1)

    blocks = []
    in_ch = 3
    for _ in range(4):
        blocks += [torch.nn.Conv2d(in_ch, 64, 3, stride=1, padding=1),
                   torch.nn.BatchNorm2d(64, affine=True),
                   torch.nn.ReLU(),
                   torch.nn.MaxPool2d(2)]
        in_ch = 64
    body = torch.nn.Sequential(*blocks).train()
    head = torch.nn.Linear(1600, WAYS)
    opt = torch.optim.Adam(list(body.parameters()) + list(head.parameters()),
                           lr=3e-3)
    loss_fn = torch.nn.CrossEntropyLoss()
    rng = np.random.default_rng(0)

    def one_iteration():
        opt.zero_grad()
        for _ in range(META_BATCH):
            x = torch.tensor(rng.normal(size=(2 * WAYS * SHOTS, 3, 84, 84))
                             .astype(np.float32))
            y = torch.tensor(np.repeat(np.arange(WAYS), SHOTS))
            feats = body(x).flatten(1)  # encode support+query once
            f_s, f_q = feats[0::2], feats[1::2]
            params = dict(head.named_parameters())
            for _ in range(ADAPT_STEPS):
                loss = loss_fn(torch.func.functional_call(head, params, (f_s,)), y)
                grads = torch.autograd.grad(loss, list(params.values()),
                                            create_graph=True)
                params = {n: p - 0.5 * g
                          for (n, p), g in zip(params.items(), grads)}
            q_loss = loss_fn(torch.func.functional_call(head, params, (f_q,)), y)
            (q_loss / META_BATCH).backward()
        opt.step()

    one_iteration()
    t0 = time.perf_counter()
    iters = 2
    for _ in range(iters):
        one_iteration()
    return META_BATCH * iters / (time.perf_counter() - t0)


def measure_torch_cpu_trpo_baseline() -> float:
    """One full reference MAML-TRPO meta-iteration in torch on CPU
    (rl/maml_trpo.py:92-134 + core_functions/rl.py:346-473): per task
    rollout -> GAE w/ fitted linear value -> first-order inner update ->
    query rollout; then the 2nd-order meta step — surrogate re-deriving
    every inner update with create_graph, KL, CG(10) on Fisher-vector
    products, backtracking line search. Env stepping is BATCHED over the
    20 episodes (the reference steps one env per subprocess round-trip —
    this baseline is deliberately leaner/faster). -> iterations/sec."""
    import numpy as np
    import torch

    TASKS, EPS, H = 20, 20, 100
    INNER_LR, GAMMA, TAU, MAX_KL, LS_STEPS = 0.05, 0.99, 1.0, 0.01, 15
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 1)

    # reference DiagNormalPolicy (policies.py:30-67): 2x100 ReLU mean + logσ
    mean_net = torch.nn.Sequential(
        torch.nn.Linear(2, 100), torch.nn.ReLU(),
        torch.nn.Linear(100, 100), torch.nn.ReLU(),
        torch.nn.Linear(100, 2))
    sigma = torch.nn.Parameter(torch.zeros(2))
    params0 = {**{f"m.{k}": v for k, v in mean_net.named_parameters()},
               "sigma": sigma}

    def mean_fwd(params, s):
        sub = {k[2:]: v for k, v in params.items() if k.startswith("m.")}
        return torch.func.functional_call(mean_net, sub, (s,))

    def log_prob(params, s, a):
        loc = mean_fwd(params, s)
        scale = torch.exp(params["sigma"])
        d = torch.distributions.Normal(loc, scale)
        return d.log_prob(a).mean(dim=1, keepdim=True)

    rng = np.random.default_rng(0)

    def rollout(params, goal):
        """Batched-episode Particles2D rollout -> [H,E] numpy arrays."""
        pos = np.zeros((EPS, 2))
        S = np.zeros((H, EPS, 2), np.float32)
        A = np.zeros((H, EPS, 2), np.float32)
        R = np.zeros((H, EPS), np.float32)
        D = np.zeros((H, EPS), np.float32)
        with torch.no_grad():
            scale = torch.exp(params["sigma"]).numpy()
        for t in range(H):
            with torch.no_grad():
                loc = mean_fwd(params, torch.tensor(pos, dtype=torch.float32))
            a = loc.numpy() + scale * rng.standard_normal((EPS, 2))
            S[t], A[t] = pos, a
            pos = pos + np.clip(a, -0.1, 0.1)
            dist = np.linalg.norm(pos - goal, axis=1)
            R[t] = -dist
            D[t] = (dist < 0.01).astype(np.float32)
        D[-1] = 1.0
        return S, A, R, D

    def gae(R, D, values):
        adv = np.zeros_like(R)
        last = np.zeros(R.shape[1], np.float32)
        next_v = np.zeros(R.shape[1], np.float32)
        for t in range(R.shape[0] - 1, -1, -1):
            delta = R[t] + GAMMA * next_v * (1 - D[t]) - values[t]
            last = delta + GAMMA * TAU * (1 - D[t]) * last
            adv[t] = last
            next_v = values[t]
        return adv

    def advantages(S, R, D):
        # linear value baseline fit on discounted returns (lstsq)
        ret = np.zeros_like(R)
        run = np.zeros(R.shape[1], np.float32)
        for t in range(R.shape[0] - 1, -1, -1):
            run = R[t] + GAMMA * (1 - D[t]) * run
            ret[t] = run
        tgrid = np.tile(np.arange(R.shape[0], dtype=np.float32)[:, None] / 100,
                        (1, R.shape[1]))
        feats = np.concatenate(
            [S, S ** 2, tgrid[..., None], tgrid[..., None] ** 2,
             tgrid[..., None] ** 3, np.ones_like(tgrid)[..., None]], axis=-1)
        F = feats.reshape(-1, feats.shape[-1])
        w = np.linalg.lstsq(F, ret.reshape(-1), rcond=None)[0]
        values = (F @ w).reshape(R.shape)
        adv = gae(R, D, values).reshape(-1)
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        return adv.astype(np.float32)

    def a2c_loss(params, S, A, adv):
        lp = log_prob(params, torch.tensor(S.reshape(-1, 2)),
                      torch.tensor(A.reshape(-1, 2)))
        return -(lp.squeeze(1) * torch.tensor(adv)).mean()

    def one_iteration():
        goals = rng.uniform(-0.5, 0.5, size=(TASKS, 2))
        replays = []
        for goal in goals:  # sequential per-task loop, like the reference
            S, A, R, D = rollout(params0, goal)
            adv = advantages(S, R, D)
            loss = a2c_loss(params0, S, A, adv)
            grads = torch.autograd.grad(loss, list(params0.values()))
            adapted = {k: p - INNER_LR * g for (k, p), g
                       in zip(params0.items(), grads)}
            Sq, Aq, Rq, Dq = rollout(adapted, goal)
            advq = advantages(Sq, Rq, Dq)
            replays.append((S, A, adv, Sq, Aq, advq))

        def meta_surrogate(params, create_graph):
            total, kls = 0.0, 0.0
            for S, A, adv, Sq, Aq, advq in replays:
                loss = a2c_loss(params, S, A, adv)
                grads = torch.autograd.grad(loss, list(params.values()),
                                            create_graph=create_graph)
                new = {k: p - INNER_LR * g for (k, p), g
                       in zip(params.items(), grads)}
                sq = torch.tensor(Sq.reshape(-1, 2))
                aq = torch.tensor(Aq.reshape(-1, 2))
                with torch.no_grad():
                    old_lp = log_prob(new, sq, aq)
                new_lp = log_prob(new, sq, aq)
                ratio = torch.exp(new_lp - old_lp).squeeze(1)
                total = total - (ratio * torch.tensor(advq)).mean()
                kls = kls + ((old_lp - new_lp) ** 2).mean()  # KL proxy, same DAG
            return total / TASKS, kls / TASKS

        loss, kl = meta_surrogate(params0, create_graph=True)
        flat_grad = torch.cat([g.reshape(-1) for g in torch.autograd.grad(
            loss, list(params0.values()), create_graph=True, allow_unused=False)])
        kl_grad = torch.cat([g.reshape(-1) for g in torch.autograd.grad(
            kl, list(params0.values()), create_graph=True)])

        def Fvp(v):
            gv = (kl_grad * v).sum()
            hv = torch.autograd.grad(gv, list(params0.values()),
                                     retain_graph=True)
            return torch.cat([h.reshape(-1) for h in hv]) + 1e-5 * v

        x = torch.zeros_like(flat_grad)
        r = flat_grad.detach().clone()
        p = r.clone()
        for _ in range(10):  # CG
            Ap = Fvp(p).detach()
            alpha = (r @ r) / (p @ Ap + 1e-10)
            x = x + alpha * p
            r_new = r - alpha * Ap
            beta = (r_new @ r_new) / (r @ r + 1e-10)
            p = r_new + beta * p
            r = r_new
        step = x / torch.sqrt(0.5 * (x @ Fvp(x).detach()) / MAX_KL + 1e-10)

        # backtracking line search re-evaluating the meta surrogate (the
        # surrogate re-derives inner updates, so candidates need grad)
        flat_params = torch.cat(
            [v.reshape(-1) for v in params0.values()]).detach()
        for i in range(LS_STEPS):
            cand_flat = (flat_params - (0.5 ** i) * step).detach()
            cand, off = {}, 0
            for k, v in params0.items():
                n = v.numel()
                cand[k] = cand_flat[off:off + n].reshape(
                    v.shape).requires_grad_(True)
                off += n
            cl, ck = meta_surrogate(cand, create_graph=False)
            if cl.detach() < loss.detach() and ck.detach() < MAX_KL:
                break

    t0 = time.perf_counter()
    one_iteration()
    return 1.0 / (time.perf_counter() - t0)


# ---------------------------------------------------------------------------
# TPU measurements
# ---------------------------------------------------------------------------

def _measure_vision(anil: bool) -> float:
    from exploring_meta_tpu.models.layers import set_conv_impl, set_precision
    # A/B knob for the stride-2 conv lowering (--conv_impl; exact math,
    # see models/layers.py): EMT_BENCH_CONV={direct,s2d,pallas}, with
    # EMT_BENCH_S2D=1 kept as the legacy spelling. Always set BOTH ways
    # so the knob can't leak into later configs of a --all run — and
    # restore the MXU precision the vision configs flip (a leaked
    # "default" would run every later --all config's matmuls in bf16,
    # making BENCH_FULL rows incomparable with standalone --config runs).
    conv = os.environ.get("EMT_BENCH_CONV", "")
    if not conv:
        conv = "s2d" if os.environ.get("EMT_BENCH_S2D") == "1" else "direct"
    set_conv_impl(conv)
    try:
        return _measure_vision_inner(anil)
    finally:
        set_conv_impl("direct")
        set_precision("highest")


def _measure_vision_inner(anil: bool) -> float:
    import jax
    import optax
    from exploring_meta_tpu import adapt, models, tasks
    from exploring_meta_tpu.models.layers import set_precision

    # Mixed precision, both accuracy-gated on scripts/parity_check.py:
    # bf16 MXU passes (set_precision) train to 0.9992 vs torch 0.9984, and
    # the full bf16 compute graph w/ f32 master params (cast_compute,
    # trainer --bf16) to 1.0000 vs 0.9984 — the meta-step is HBM-
    # bandwidth-bound, so halving activation bytes is the big lever
    # (BASELINE.md roofline note).
    set_precision("default")


    if anil:
        train, _, _ = tasks.load_mini_imagenet(seed=0, synthetic=True)
        spec = models.anil_mini_imagenet_spec(ways=WAYS)
    else:
        train, _, _ = tasks.load_omniglot(seed=0, synthetic=True,
                                          synthetic_classes=1623)
        spec = models.omniglot_spec(ways=WAYS)
    params = models.init_cnn4(jax.random.key(0), spec)
    fast_adapt = adapt.make_vision_fast_adapt(
        spec, inner_lr=0.5, adapt_steps=ADAPT_STEPS, shots=SHOTS, ways=WAYS,
        anil=anil,
        # A/B knob for the ANIL body FLOPs-for-bytes remat (adapt/vision.py)
        remat_body=os.environ.get("EMT_BENCH_REMAT") == "1")
    fast_adapt = adapt.cast_compute(fast_adapt)
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    # Fused training path (the trainers' --fuse mode): `iters` whole
    # meta-iterations — on-device sampling included — per XLA program.
    # Measured +15% over one-dispatch-per-iteration at CNN4/Omniglot scale
    # and immune to tunnel latency.
    iters = 50 if not anil else 20  # ANIL mini-imagenet steps are bigger

    def sample_fn(k, images):
        return tasks.sample_task_batch(k, train._replace(images=images),
                                       WAYS, SHOTS, META_BATCH)

    train_fn = adapt.make_train_scan(fast_adapt, opt, sample_fn, iters)
    key = jax.random.key(1)

    def one_window(key, params, opt_state):
        key, k = jax.random.split(key)
        params, opt_state, m = train_fn(params, opt_state, k, train.images)
        return key, params, opt_state, m

    # warmup/compile + pipeline settle
    for _ in range(2):
        key, params, opt_state, m = one_window(key, params, opt_state)
    float(m["loss"][-1])

    # GROUND-TRUTH timing: host fetch of a scalar depending on every
    # iteration (params chain through all steps). Best-of-3 for tunnel noise.
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        key, params, opt_state, m = one_window(key, params, opt_state)
        float(m["loss"][-1])  # forces the full dependency chain to finish
        dt = time.perf_counter() - t0
        best = max(best, META_BATCH * iters / dt)
    return best


def measure_tpu() -> float:
    return _measure_vision(anil=False)


def measure_tpu_anil_min() -> float:
    return _measure_vision(anil=True)


def _measure_trpo(bf16: bool, iters: int) -> float:
    """Full MAML-TRPO meta-iteration at reference scale on device —
    the trainers' fused path (rl/train_scan.py): sampling, rollouts,
    first-order inner adaptation and the second-order CG/line-search
    outer step, ``iters`` iterations per XLA program. -> iterations/sec."""
    import jax
    from exploring_meta_tpu import rl
    from exploring_meta_tpu.envs import Particles2D
    from exploring_meta_tpu.models import DiagNormalPolicy

    TASKS = 20
    env = Particles2D()
    policy = DiagNormalPolicy(input_size=2, output_size=2)
    if bf16:
        # RL --bf16 mode: policy compute graphs in bf16, f32 master params
        # (parity-gated via scripts/parity_check.py --rl trpo --bf16).
        policy = policy._replace(compute_dtype="bf16")
    ITERS = iters
    params = policy.init(jax.random.key(0))
    rl_cfg = rl.RLConfig(inner_lr=0.05, gamma=0.99, tau=1.0, adapt_steps=1,
                         adapt_batch_size=20, max_path_length=100)
    trpo_cfg = rl.TRPOConfig(outer_lr=1.0, max_kl=0.01, ls_max_steps=15,
                             backtrack_factor=0.5)
    # (The fused Particles2D rollout kernel that once sat behind an
    # EMT_BENCH_ROLLOUT=pallas knob lost its end-to-end A/B — 25.1 vs
    # 27.0 it/s, BASELINE.md r4s5 — and was removed in round 5.)
    roll = rl.make_rollout(env, policy.sample, episodes=20, horizon=100)
    train = rl.make_trpo_train_scan(env, policy, roll, rl_cfg, trpo_cfg,
                                    TASKS, ITERS)

    key = jax.random.key(1)
    for _ in range(2):  # compile + settle
        key, k = jax.random.split(key)
        params, ms = train(params, k)
    float(ms["meta_loss"][-1])

    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        key, k = jax.random.split(key)
        params, ms = train(params, k)
        float(ms["meta_loss"][-1])  # ground-truth host fetch
        best = max(best, ITERS / (time.perf_counter() - t0))
    return best


def measure_tpu_trpo_particles() -> float:
    """The reference-exact configuration: full f32 precision.

    EMT_BENCH_BF16=1 / EMT_BENCH_FUSE=K keep working as A/B knobs (used
    by the BASELINE.md fuse sweeps); the defaults are f32, 10
    iterations per XLA program (the trainers' --fuse default — larger
    chunks amortize the ~15-20 ms per-dispatch tunnel overhead)."""
    return _measure_trpo(bf16=os.environ.get("EMT_BENCH_BF16") == "1",
                         iters=int(os.environ.get("EMT_BENCH_FUSE", "10")))


def measure_tpu_trpo_particles_fast() -> float:
    """The documented fast MAML-TRPO configuration (--bf16 --fuse 20,
    BASELINE.md r5s6c): accuracy-gated RL mixed precision + 20 fused
    iterations per program. Same torch-CPU denominator as
    trpo_particles — the reference computation does not change; this
    row records what a user of the fast flags actually gets (96 it/s
    vs 27 f32 on a v5e chip). Past fuse~20 the remote XLA compiler,
    not the device, sets the limit (r5s6c)."""
    return _measure_trpo(bf16=True, iters=20)


def _measure_host_rollout(backend: str, policy_device: str = "device") -> float:
    """MuJoCo Ant host-rollout throughput (env steps/sec) for one
    HostVecEnv backend; ``policy_device`` picks where the per-step policy
    forward runs ("device" = TPU round-trip per step, "cpu" = local)."""
    import jax
    from exploring_meta_tpu.envs.host import (
        AntDirectionEnv, HostVecEnv, make_host_rollout,
    )
    from exploring_meta_tpu.models import DiagNormalPolicy

    import itertools
    E, H = 20, 150
    ctr = itertools.count()  # per-slot seeds (cf. envs/factory.py)
    env = HostVecEnv(lambda: AntDirectionEnv(seed=next(ctr)), E,
                     backend=backend)
    policy = DiagNormalPolicy(input_size=env.obs_size,
                              output_size=env.action_size)
    params = policy.init(jax.random.key(0))
    roll = make_host_rollout(env, policy, horizon=H,
                             policy_device=policy_device)
    task = env.sample_tasks(None, 1)[0]
    traj = roll(params, task, jax.random.key(1))  # warmup + compile
    float(traj.reward.sum())
    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        traj = roll(params, task, jax.random.fold_in(jax.random.key(2), i))
    float(traj.reward.sum())
    return E * H * reps / (time.perf_counter() - t0)


def measure_host_rollout_native() -> float:
    return _measure_host_rollout("native")


def measure_host_rollout_python() -> float:
    return _measure_host_rollout("python")


def measure_host_rollout_cpu_policy() -> float:
    return _measure_host_rollout("native", policy_device="cpu")


def _serve_setup(batch: int):
    import jax
    import jax.numpy as jnp
    from exploring_meta_tpu import models
    from exploring_meta_tpu.serve import VisionServer

    spec = models.omniglot_spec(ways=WAYS)
    params = models.init_cnn4(jax.random.key(0), spec)
    server = VisionServer(spec, params, inner_lr=0.5, adapt_steps=1,
                          compute_dtype=jnp.bfloat16)
    k1, k2 = jax.random.split(jax.random.key(1))
    sx = jax.random.normal(k1, (batch, SHOTS * WAYS, 28, 28, 1))
    sy = jnp.tile(jnp.arange(WAYS), (batch, SHOTS))
    qx = jax.random.normal(k2, (batch, 15, 28, 28, 1))
    return server, sx, sy, qx


def measure_serve_vision_batched() -> float:
    """Few-shot serving throughput (requests/sec): B=64 concurrent
    adapt+predict requests in ONE fused XLA program (serve.py
    VisionServer.batch, bf16 compute)."""
    import time as _t
    B = 64
    server, sx, sy, qx = _serve_setup(B)
    preds, _ = server.batch(sx, sy, qx)          # compile
    int(preds[0, 0])
    reps, t0 = 5, _t.perf_counter()
    for _ in range(reps):
        preds, _ = server.batch(sx, sy, qx)
    int(preds.sum())                              # ground-truth fetch
    return B * reps / (_t.perf_counter() - t0)


def measure_serve_vision_sequential() -> float:
    """Baseline: the same requests served one jitted program at a time
    (the reference's eval-script execution model — one task per step)."""
    import time as _t
    B = 16
    server, sx, sy, qx = _serve_setup(B)
    preds, _ = server(sx[0], sy[0], qx[0])       # compile
    int(preds[0])
    t0 = _t.perf_counter()
    acc = 0
    for i in range(B):
        preds, _ = server(sx[i], sy[i], qx[i])
        acc += int(preds[0])                     # per-request fetch, as a
    return B / (_t.perf_counter() - t0)          # real serving loop would


def _serve_rl_setup(n_tasks: int):
    """PolicyServer + per-task support trajectories on Particles2D
    (serving inputs; in production these arrive from the deployed
    system's own env steps — scripts/serve_rl.py)."""
    import jax
    import jax.numpy as jnp
    from exploring_meta_tpu import models, rl
    from exploring_meta_tpu.envs import Particles2D
    from exploring_meta_tpu.serve import PolicyServer

    episodes, horizon = 10, 50
    env = Particles2D()
    policy = models.DiagNormalPolicy(input_size=env.obs_size,
                                     output_size=env.action_size)
    params = policy.init(jax.random.key(0))
    cfg = rl.RLConfig(inner_lr=0.05, adapt_steps=1,
                      adapt_batch_size=episodes, max_path_length=horizon)
    server = PolicyServer(policy, params, cfg, algo="vpg")
    roll = rl.make_rollout(env, policy.sample, episodes=episodes,
                           horizon=horizon)
    keys = jax.random.split(jax.random.key(1), n_tasks)
    task_arr = env.sample_tasks(jax.random.key(2), n_tasks)
    supports = [roll(params, task_arr[i], keys[i]) for i in range(n_tasks)]
    stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *supports)
    return server, supports, stack


def measure_serve_rl_batched() -> float:
    """Meta-RL serving throughput (adaptation requests/sec): B=64 tasks
    adapted from their support trajectories in ONE vmapped XLA program
    (serve.py PolicyServer.adapt_batched)."""
    import time as _t
    import jax
    B = 64
    server, _, stack = _serve_rl_setup(B)
    adapted = server.adapt_batched(stack)             # compile
    float(jax.tree_util.tree_leaves(adapted)[0].sum())
    reps, t0 = 5, _t.perf_counter()
    for _ in range(reps):
        adapted = server.adapt_batched(stack)
    float(jax.tree_util.tree_leaves(adapted)[0].sum())  # ground-truth fetch
    return B * reps / (_t.perf_counter() - t0)


def measure_serve_rl_sequential() -> float:
    """Baseline: one adaptation program per task with a per-request fetch
    (the reference's execution model — cl_rl.py adapts one task at a
    time)."""
    import time as _t
    import jax
    B = 16
    server, supports, _ = _serve_rl_setup(B)
    a = server.adapt(supports[0])                     # compile
    float(jax.tree_util.tree_leaves(a)[0].sum())
    t0 = _t.perf_counter()
    for s in supports:
        a = server.adapt(s)
        float(jax.tree_util.tree_leaves(a)[0].sum())
    return B / (_t.perf_counter() - t0)


def _measure_host_collect(task_batched: bool,
                          policy_device: str = "device") -> float:
    """Full meta-batch collection pass on MuJoCo Ant (support rollouts +
    on-device inner updates + query rollouts for every task) -> env
    steps/sec. ``task_batched`` steps ALL tasks' episodes per policy
    round-trip (--task_batch); otherwise tasks collect sequentially
    (the reference's execution model, rl/maml_ppo.py:102-113)."""
    import jax
    from exploring_meta_tpu import rl
    from exploring_meta_tpu.envs.host import (
        AntDirectionEnv, HostVecEnv, make_grouped_host_rollout,
        make_host_rollout,
    )
    from exploring_meta_tpu.models import DiagNormalPolicy

    TASKS, EPS, H = 5, 4, 50
    cfg = rl.RLConfig(inner_lr=0.01, adapt_steps=1, adapt_batch_size=EPS,
                      max_path_length=H, ppo_epochs=1)
    steps_per_pass = TASKS * EPS * H * (cfg.adapt_steps + 1)

    import itertools
    if task_batched:
        ctr = itertools.count()
        env = HostVecEnv(lambda: AntDirectionEnv(seed=next(ctr)),
                         TASKS * EPS)
        policy = DiagNormalPolicy(input_size=env.obs_size,
                                  output_size=env.action_size)
        params = policy.init(jax.random.key(0))
        roll = make_grouped_host_rollout(env, policy, H, TASKS, EPS,
                                         policy_device=policy_device)

        def one_pass(key):
            tasks = env.sample_tasks(None, TASKS)
            _, replays, _ = rl.collect_task_batched("ppo", policy, params,
                                                    roll, tasks, key, cfg)
            return replays
    else:
        ctr = itertools.count()
        env = HostVecEnv(lambda: AntDirectionEnv(seed=next(ctr)), EPS)
        policy = DiagNormalPolicy(input_size=env.obs_size,
                                  output_size=env.action_size)
        params = policy.init(jax.random.key(0))
        roll = make_host_rollout(env, policy, H)

        def one_pass(key):
            tasks = env.sample_tasks(None, TASKS)
            reps = []
            for i in range(TASKS):
                k = jax.random.fold_in(key, i)
                stacked, _ = rl.collect_replays("ppo", policy, params, roll,
                                                tasks[i], k, cfg)
                reps.append(stacked)
            return reps

    one_pass(jax.random.key(1))  # warmup + compile
    t0 = time.perf_counter()
    replays = one_pass(jax.random.key(2))
    float(jax.tree_util.tree_leaves(replays)[0].sum())  # ground-truth fetch
    return steps_per_pass / (time.perf_counter() - t0)


def _multiseed_setup(n_seeds: int, n_steps: int):
    """S-seed MAML-TRPO sweep pieces on Particles2D (one fused scan per
    seed; parallel/multiseed.py stacks them into one program)."""
    import jax
    from exploring_meta_tpu import parallel, rl
    from exploring_meta_tpu.envs import Particles2D
    from exploring_meta_tpu.models import DiagNormalPolicy

    MB, EPS, H = 10, 10, 50
    env = Particles2D()
    policy = DiagNormalPolicy(input_size=env.obs_size,
                              output_size=env.action_size)
    cfg = rl.RLConfig(inner_lr=0.05, adapt_steps=1, adapt_batch_size=EPS,
                      max_path_length=H)
    roll = rl.make_rollout(env, policy.sample, episodes=EPS, horizon=H)
    train = rl.make_trpo_train_scan(env, policy, roll, cfg, rl.TRPOConfig(),
                                    MB, n_steps)
    params, _, keys = parallel.stack_seed_states(policy.init,
                                                 list(range(n_seeds)))
    return train, params, keys


def measure_multiseed_vmapped() -> float:
    """Whole-sweep-as-one-program throughput: S seeds of fused MAML-TRPO
    training vmapped into ONE XLA program (sweep --vmap_seeds) ->
    seed-iterations/sec. vs_baseline divides by the serial per-seed loop
    over the SAME fused scan — the strongest honest baseline — so the
    ratio isolates what batching the seed axis buys."""
    import jax
    from exploring_meta_tpu import parallel

    S, STEPS = 4, 3
    train, params, keys = _multiseed_setup(S, STEPS)
    sweep = parallel.vmap_seeds(train, 2)
    p, _ = sweep(params, keys)                        # compile
    float(jax.tree_util.tree_leaves(p)[0].sum())
    reps, t0 = 3, time.perf_counter()
    for _ in range(reps):
        p, _ = sweep(params, keys)
    float(jax.tree_util.tree_leaves(p)[0].sum())      # ground-truth fetch
    return S * STEPS * reps / (time.perf_counter() - t0)


def measure_multiseed_serial() -> float:
    """Baseline: the same S seeds through the same fused scan, one seed
    at a time (scripts/sweep.py's serial in-process mode)."""
    import jax

    S, STEPS = 4, 3
    train, params, keys = _multiseed_setup(S, STEPS)
    one = jax.tree_util.tree_map(lambda x: x[0], params)
    p, _ = train(one, keys[0])                        # compile
    float(jax.tree_util.tree_leaves(p)[0].sum())
    t0 = time.perf_counter()
    for i in range(S):
        p, _ = train(jax.tree_util.tree_map(lambda x: x[i], params),
                     keys[i])
        float(jax.tree_util.tree_leaves(p)[0].sum())
    return S * STEPS / (time.perf_counter() - t0)


def measure_host_collect_batched() -> float:
    return _measure_host_collect(task_batched=True)


def measure_host_collect_batched_cpu_policy() -> float:
    return _measure_host_collect(task_batched=True, policy_device="cpu")


def measure_host_collect_sequential() -> float:
    return _measure_host_collect(task_batched=False)


# ---------------------------------------------------------------------------
# registry + main
# ---------------------------------------------------------------------------

def _measure_native_pool(n_threads: int, spin: bool = False,
                         busy_us: float = 1000.0) -> float:
    """Steps/sec of the C++ vecenv thread pool on the synthetic busy env
    (vecenv.cpp BusyState): each step costs ``busy_us`` of C-side
    simulated physics that does NOT hold the GIL. Sleep mode blocks
    without holding the core (the shape of GIL-releasing physics from
    the pool's perspective), so steps/sec must scale ~linearly in
    n_threads even on this 1-core box — isolating the pool's fan-out
    from MuJoCo/core-count limits (VERDICT r3 item 6)."""
    import numpy as np
    from exploring_meta_tpu.native.binding import NativeVecEnv
    E, STEPS = 8, 50
    env = NativeVecEnv("busy", n_envs=E, n_threads=n_threads,
                       busy_us=busy_us, busy_spin=spin)
    env.reset(np.zeros((E, 2)))
    acts = np.zeros((E, 2))
    env.step(acts)  # warm the pool
    t0 = time.perf_counter()
    for _ in range(STEPS):
        env.step(acts)
    return E * STEPS / (time.perf_counter() - t0)


def measure_native_pool_8threads() -> float:
    return _measure_native_pool(8)


def measure_native_pool_1thread() -> float:
    return _measure_native_pool(1)


CONFIGS = {
    "maml_omni": {
        "metric": "maml_omniglot_5w5s_cnn4_meta_train",
        "unit": "tasks/sec",
        "measure": measure_tpu,
        "baseline": measure_torch_cpu_baseline,
    },
    "anil_min": {
        "metric": "anil_mini_imagenet_5w5s_cnn4_meta_train",
        "unit": "tasks/sec",
        "measure": measure_tpu_anil_min,
        "baseline": measure_torch_cpu_anil_baseline,
    },
    "trpo_particles": {
        "metric": "maml_trpo_particles2d_meta_iteration",
        "unit": "iterations/sec",
        "measure": measure_tpu_trpo_particles,
        "baseline": measure_torch_cpu_trpo_baseline,
    },
    "trpo_particles_fast": {
        "metric": "maml_trpo_particles2d_meta_iteration_bf16_fuse20",
        "unit": "iterations/sec",
        "measure": measure_tpu_trpo_particles_fast,
        "baseline": measure_torch_cpu_trpo_baseline,
    },
    "host_rollout_ant": {
        "metric": "ant_host_rollout_native_pool",
        "unit": "env_steps/sec",
        "measure": measure_host_rollout_native,
        "baseline": measure_host_rollout_python,
    },
    "host_collect_ant_batched": {
        "metric": "ant_meta_collection_task_batched",
        "unit": "env_steps/sec",
        "measure": measure_host_collect_batched,
        "baseline": measure_host_collect_sequential,
    },
    "host_rollout_ant_cpu_policy": {
        "metric": "ant_host_rollout_cpu_policy",
        "unit": "env_steps/sec",
        "measure": measure_host_rollout_cpu_policy,
        "baseline": measure_host_rollout_python,
    },
    "host_collect_ant_batched_cpu_policy": {
        "metric": "ant_meta_collection_task_batched_cpu_policy",
        "unit": "env_steps/sec",
        "measure": measure_host_collect_batched_cpu_policy,
        "baseline": measure_host_collect_sequential,
    },
    "serve_vision": {
        "metric": "few_shot_serving_batched_requests",
        "unit": "requests/sec",
        "measure": measure_serve_vision_batched,
        "baseline": measure_serve_vision_sequential,
    },
    "serve_rl": {
        "metric": "meta_rl_policy_adaptation_serving",
        "unit": "requests/sec",
        "measure": measure_serve_rl_batched,
        "baseline": measure_serve_rl_sequential,
    },
    "multiseed_trpo": {
        "metric": "maml_trpo_4seed_sweep_vmapped",
        "unit": "seed_iterations/sec",
        "measure": measure_multiseed_vmapped,
        "baseline": measure_multiseed_serial,
    },
    "native_pool_sleep": {
        "metric": "native_vecenv_pool_8threads_blocking_env",
        "unit": "env_steps/sec",
        "measure": measure_native_pool_8threads,
        "baseline": measure_native_pool_1thread,
    },
}


# configs that share one baseline measurement share its cache entry (the
# sequential MuJoCo baselines are minutes each on this 1-core box, and a
# paired comparison needs ONE denominator, not two noisy ones)
_BASELINE_ALIAS = {
    "host_rollout_ant_cpu_policy": "host_rollout_ant",
    "host_collect_ant_batched_cpu_policy": "host_collect_ant_batched",
    "trpo_particles_fast": "trpo_particles",
}

# Baselines that are pure torch-CPU reproductions measure the same thing
# on any backend; every other baseline touches the JAX backend (serving
# loops, host rollouts with on-device policy, the serial sweep), so a
# CPU-backed run — EMT_FORCE_CPU, or the axon plugin silently falling
# back to the CPU platform — must not cache a CPU denominator that a
# later on-chip run would silently divide by (or vice versa). Keyed on
# the ACTUAL backend, not the env var; the pre-existing bare entries on
# this box all come from on-chip sessions (BASELINE.md provenance).
_TORCH_BASELINES = {"maml_omni", "anil_min", "trpo_particles"}


def _cached_baseline(name: str, fn):
    """-> (denominator, band_or_None).

    Torch-CPU denominators on this 1-core box carry large run-to-run
    variance (BASELINE.md records 8-18 tasks/sec for maml_omni): a
    single-sample denominator once moved the headline vs_baseline
    283x -> 614x between rounds while the measured value was flat. For
    the torch configs the cache therefore pins a MULTI-REPETITION MEDIAN
    with its min/max band, measured once and reused — round-over-round
    vs_baseline changes then reflect the numerator only. Legacy
    single-sample scalar entries for torch configs are re-measured."""
    name = _BASELINE_ALIAS.get(name, name)
    torch_cfg = name in _TORCH_BASELINES
    if not torch_cfg:
        import jax
        if jax.default_backend() == "cpu":
            name = name + "@cpu"
    cache = {}
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cache = json.load(f)
        if "tasks_per_sec" in cache:  # migrate round-1 single-config format
            cache = {"maml_omni": cache["tasks_per_sec"]}
    entry = cache.get(name)
    if (torch_cfg and not isinstance(entry, dict)) or entry is None:
        if torch_cfg:
            reps = int(os.environ.get("EMT_BASELINE_REPS", "5"))
            samples = sorted(fn() for _ in range(reps))
            entry = {"median": samples[len(samples) // 2],
                     "band": [samples[0], samples[-1]], "reps": reps}
        else:
            entry = fn()
        cache[name] = entry
        with open(BASELINE_CACHE, "w") as f:
            json.dump(cache, f, indent=2, sort_keys=True)
    if isinstance(entry, dict):
        return entry["median"], entry["band"]
    return entry, None


def run_config(name: str) -> dict:
    cfg = CONFIGS[name]
    baseline, band = _cached_baseline(name, cfg["baseline"])
    value = cfg["measure"]()
    out = {
        "metric": cfg["metric"],
        "value": round(value, 2),
        "unit": cfg["unit"],
        "vs_baseline": round(value / baseline, 2),
    }
    if band:
        # denominator variance band: vs the slowest/fastest observed
        # baseline repetition (hi/lo of the honest comparison)
        out["vs_baseline_band"] = [round(value / band[1], 2),
                                   round(value / band[0], 2)]
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", choices=sorted(CONFIGS), default="maml_omni")
    p.add_argument("--all", action="store_true",
                   help="run EVERY config (one JSON line each) and record "
                        "them all in BENCH_FULL.json; the bare invocation "
                        "keeps the driver's one-line contract")
    args = p.parse_args()

    # EMT_FORCE_CPU=1 routes to the in-process CPU backend (debug/smoke),
    # same contract as every other CLI (utils/config.py).
    from exploring_meta_tpu.utils.config import force_cpu_if_requested
    force_cpu_if_requested()

    cpu_forced = os.environ.get("EMT_FORCE_CPU") == "1"

    # The axon tunnel's failure mode is an unbounded in-process hang, not
    # an error; a hung bench run leaves the driver round with NO artifact.
    # Probe from a killable subprocess and fast-fail with an honest error
    # line (the one-line contract is preserved; value 0 cannot be mistaken
    # for a measurement).
    if (not cpu_forced
            and os.environ.get("EMT_BENCH_NO_PROBE") != "1"
            and not tunnel_up()):
        err = {"value": 0.0, "vs_baseline": 0.0,
               "error": "tpu_tunnel_down",
               "note": "remote TPU unreachable at measurement time; "
                       "BENCH_FULL.json holds the last on-chip "
                       "measurements"}
        names = sorted(CONFIGS) if args.all else [args.config]
        for name in names:  # one line per unmeasured config, none recorded
            print(json.dumps({**({"config": name} if args.all else {}),
                              "metric": CONFIGS[name]["metric"],
                              "unit": CONFIGS[name]["unit"], **err}))
        # --all is our own tooling (chip_queue.sh): exit nonzero so its
        # queue log shows the failure; the driver's bare invocation keeps
        # exit 0 with the error line as the artifact.
        raise SystemExit(1 if args.all else 0)

    # Off-chip smoke runs must never masquerade as chip measurements:
    # mark every line, and divert --all's artifact away from the on-chip
    # BENCH_FULL.json record.
    marker = {"backend": "cpu-forced"} if cpu_forced else {}

    if args.all:
        results = []
        for name in sorted(CONFIGS):
            print(f"--- {name}", flush=True)
            line = {"config": name, **run_config(name), **marker}
            results.append(line)
            print(json.dumps(line), flush=True)
        out = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "BENCH_FULL_cpu.json" if cpu_forced else "BENCH_FULL.json")
        with open(out, "w") as f:
            json.dump(results, f, indent=2)
        return

    print(json.dumps({**run_config(args.config), **marker}))


if __name__ == "__main__":
    main()
