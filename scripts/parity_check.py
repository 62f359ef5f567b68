#!/usr/bin/env python3
"""Accuracy-parity check: this framework vs a torch reproduction of the
reference, trained on the SAME data.

The target (BASELINE.json) is meta-test accuracy within 0.5% of the
PyTorch/learn2learn reference. Real Omniglot is unavailable in hermetic
environments, so this check trains both implementations on the identical
synthetic episodic dataset (same packed arrays, same split) with the same
hyperparameters and compares meta-test accuracy over many tasks. The
torch side reproduces the reference training step exactly (sequential
per-task clone -> create_graph inner adapt -> query backward -> grad
mean -> Adam; BN in train mode).

Prints one JSON line:
  {"jax_acc": ..., "torch_acc": ..., "diff": ...}
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

WAYS, SHOTS = 5, 1


def sample_np_task(rng, images, ways, shots):
    """Host-side task sampler with the same episodic semantics (class-major,
    even/odd support/query interleave) for the torch side."""
    n_cls, n_per = images.shape[0], images.shape[1]
    cls = rng.choice(n_cls, ways, replace=False)
    data, labels = [], []
    for c_new, c in enumerate(cls):
        smp = rng.choice(n_per, 2 * shots, replace=False)
        imgs = images[c, smp].astype(np.float32) / 255.0
        imgs = 1.0 - imgs
        k = rng.integers(0, 4)
        imgs = np.rot90(imgs, k, axes=(1, 2)).copy()
        data.append(imgs)
        labels += [c_new] * 2 * shots
    data = np.concatenate(data)  # [ways*2s, H, W, 1]
    labels = np.array(labels)
    idx_s = np.arange(shots * ways) * 2
    idx_q = idx_s + 1
    return (data[idx_s], labels[idx_s]), (data[idx_q], labels[idx_q])


def run_torch(images_train, images_test, iters, meta_batch, inner_lr,
              outer_lr, adapt_steps, eval_tasks, seed):
    import torch
    torch.manual_seed(seed)
    rng = np.random.default_rng(seed)

    blocks = []
    in_ch = 1
    for _ in range(4):
        blocks += [torch.nn.Conv2d(in_ch, 64, 3, stride=2, padding=1),
                   torch.nn.BatchNorm2d(64, affine=True),
                   torch.nn.ReLU()]
        in_ch = 64

    class Model(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.base = torch.nn.Sequential(*blocks)
            self.head = torch.nn.Linear(64, WAYS)
            torch.nn.init.xavier_uniform_(self.head.weight)  # use normal? ref: normal_()
            with torch.no_grad():
                self.head.weight.normal_()
                self.head.bias.zero_()
            for m in self.base:
                if isinstance(m, torch.nn.Conv2d):
                    torch.nn.init.xavier_uniform_(m.weight)
                    torch.nn.init.zeros_(m.bias)
                if isinstance(m, torch.nn.BatchNorm2d):
                    torch.nn.init.uniform_(m.weight)

        def forward(self, x):
            return self.head(self.base(x).mean(dim=[2, 3]))

    model = Model().train()
    opt = torch.optim.Adam(model.parameters(), lr=outer_lr)
    loss_fn = torch.nn.CrossEntropyLoss()

    def adapt_and_query(params, support, query, track_higher):
        (xs, ys), (xq, yq) = support, query
        xs = torch.tensor(xs.transpose(0, 3, 1, 2))
        xq = torch.tensor(xq.transpose(0, 3, 1, 2))
        ys = torch.tensor(ys)
        yq = torch.tensor(yq)
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

    for it in range(iters):
        opt.zero_grad()
        for _ in range(meta_batch):
            task = sample_np_task(rng, images_train, WAYS, SHOTS)
            params = dict(model.named_parameters())
            q_loss, _ = adapt_and_query(params, *task, track_higher=True)
            (q_loss / meta_batch).backward()
        opt.step()
        if (it + 1) % 25 == 0:
            print(f"torch iter {it + 1}/{iters}", flush=True)

    accs = []
    for _ in range(eval_tasks):
        task = sample_np_task(rng, images_test, WAYS, SHOTS)
        params = {n: p.detach().clone().requires_grad_(True)
                  for n, p in model.named_parameters()}
        _, acc = adapt_and_query(params, *task, track_higher=False)
        accs.append(acc)
    return float(np.mean(accs))


def run_jax(train_ds, test_ds, iters, meta_batch, inner_lr, outer_lr,
            adapt_steps, eval_tasks, seed, bf16=False):
    import jax
    import optax
    from exploring_meta_tpu import adapt, models, tasks

    spec = models.omniglot_spec(ways=WAYS)
    key = jax.random.key(seed)
    key, ik = jax.random.split(key)
    params = models.init_cnn4(ik, spec)
    fa = adapt.make_vision_fast_adapt(spec, inner_lr, adapt_steps, SHOTS,
                                      WAYS)
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
    accs = []
    for i in range(max(1, eval_tasks // 32)):
        key, k = jax.random.split(key)
        d, l = tasks.sample_task_batch(k, test_ds, WAYS, SHOTS, 32)
        accs.append(float(ev(params, d, l)["metric"]))
    return float(np.mean(accs))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=150)
    p.add_argument("--meta_batch", type=int, default=16)
    p.add_argument("--inner_lr", type=float, default=0.5)
    p.add_argument("--outer_lr", type=float, default=0.003)
    p.add_argument("--adapt_steps", type=int, default=1)
    p.add_argument("--eval_tasks", type=int, default=256)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--bf16", action="store_true",
                   help="gate the bf16-compute mode (trainer --bf16)")
    args = p.parse_args()

    from exploring_meta_tpu import tasks
    train_ds, _, test_ds = tasks.load_omniglot(seed=0, synthetic=True,
                                               synthetic_classes=160)
    imgs_train = np.asarray(train_ds.images)
    imgs_test = np.asarray(test_ds.images)

    jax_acc = run_jax(train_ds, test_ds, args.iters, args.meta_batch,
                      args.inner_lr, args.outer_lr, args.adapt_steps,
                      args.eval_tasks, args.seed, bf16=args.bf16)
    print(f"jax meta-test acc: {jax_acc:.4f}", flush=True)

    torch_acc = run_torch(imgs_train, imgs_test, args.iters,
                          args.meta_batch, args.inner_lr, args.outer_lr,
                          args.adapt_steps, args.eval_tasks, args.seed)
    print(f"torch meta-test acc: {torch_acc:.4f}", flush=True)

    print(json.dumps({"jax_acc": round(jax_acc, 4),
                      "torch_acc": round(torch_acc, 4),
                      "diff": round(abs(jax_acc - torch_acc), 4)}))


if __name__ == "__main__":
    main()
