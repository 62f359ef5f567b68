"""Reference-checkpoint importer round-trip tests.

Builds live torch modules with the reference's exact module nesting and
state_dict key naming (``core_functions/vision_models.py:10-193``,
``core_functions/policies.py:30-126``, ``vision/anil_vision.py:86-94``),
saves their state_dicts the way the reference's Experiment harness does
(``utils/experiment.py:85-90``), imports them via
``utils/import_torch.py``, and asserts the framework forward matches the
torch forward to f32 tolerance.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from exploring_meta_tpu import models
from exploring_meta_tpu.models.cnn4 import cnn4_apply
from exploring_meta_tpu.utils import import_torch as imp
from exploring_meta_tpu.utils.experiment import load_params

WAYS = 5


# --- torch twins with the reference's module nesting / key names --------

class RefConvBlock(torch.nn.Module):
    """vision_models.py:149-193 (child names conv / normalize)."""

    def __init__(self, ci, co, max_pool):
        super().__init__()
        self.conv = torch.nn.Conv2d(ci, co, 3,
                                    stride=1 if max_pool else 2, padding=1)
        torch.nn.init.xavier_uniform_(self.conv.weight)
        torch.nn.init.zeros_(self.conv.bias)
        self.normalize = torch.nn.BatchNorm2d(co, affine=True)
        torch.nn.init.uniform_(self.normalize.weight)
        self.pool = torch.nn.MaxPool2d(2, 2) if max_pool else None

    def forward(self, x):
        x = torch.relu(self.normalize(self.conv(x)))
        return self.pool(x) if self.pool is not None else x


def ref_conv_base(ci, hidden, max_pool):
    blocks = [RefConvBlock(ci, hidden, max_pool)]
    blocks += [RefConvBlock(hidden, hidden, max_pool) for _ in range(3)]
    return torch.nn.Sequential(*blocks)


class RefOmniglotCNN(torch.nn.Module):
    """vision_models.py:10-63 (attrs base / linear)."""

    def __init__(self):
        super().__init__()
        self.base = ref_conv_base(1, 64, max_pool=False)
        self.linear = torch.nn.Linear(64, WAYS)
        with torch.no_grad():
            self.linear.weight.normal_()
            self.linear.bias.zero_()

    def forward(self, x):
        return self.linear(self.base(x).mean(dim=[2, 3]))


class RefMiniImagenetCNN(torch.nn.Module):
    """vision_models.py:66-118 — flatten is torch NCHW (c, h, w) order."""

    def __init__(self):
        super().__init__()
        self.base = ref_conv_base(3, 32, max_pool=True)
        self.linear = torch.nn.Linear(800, WAYS)
        torch.nn.init.xavier_uniform_(self.linear.weight)
        torch.nn.init.zeros_(self.linear.bias)

    def forward(self, x):
        return self.linear(self.base(x).flatten(1))


class RefDiagNormalPolicy(torch.nn.Module):
    """policies.py:30-67 (mean Sequential + sigma Parameter)."""

    def __init__(self, input_size=2, output_size=2):
        super().__init__()
        self.mean = torch.nn.Sequential(
            torch.nn.Linear(input_size, 100), torch.nn.ReLU(),
            torch.nn.Linear(100, 100), torch.nn.ReLU(),
            torch.nn.Linear(100, output_size))
        self.sigma = torch.nn.Parameter(torch.full((output_size,), -0.3))

    def forward(self, x):
        return self.mean(x)


def _np(t):
    return np.asarray(t.detach().numpy())


def _nhwc(x_torch):
    return jnp.asarray(_np(x_torch).transpose(0, 2, 3, 1))


# --- vision ---------------------------------------------------------------

def test_import_maml_omniglot():
    torch.manual_seed(0)
    m = RefOmniglotCNN().train()
    params = imp.import_cnn4(
        {k: _np(v) for k, v in m.state_dict().items()},
        models.omniglot_spec(WAYS))
    x = torch.randn(10, 1, 28, 28)
    want = _np(m(x))
    got = cnn4_apply(jax.tree_util.tree_map(jnp.asarray, params),
                     models.omniglot_spec(WAYS), _nhwc(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_import_maml_mini_imagenet_flatten_order():
    """The NCHW->NHWC flatten permutation on the 800-wide head."""
    torch.manual_seed(1)
    m = RefMiniImagenetCNN().train()
    params = imp.import_cnn4(
        {k: _np(v) for k, v in m.state_dict().items()},
        models.mini_imagenet_spec(WAYS))
    x = torch.randn(6, 3, 84, 84)
    want = _np(m(x))
    got = cnn4_apply(jax.tree_util.tree_map(jnp.asarray, params),
                     models.mini_imagenet_spec(WAYS), _nhwc(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_import_anil_vision_omni():
    """features.pt (Sequential(ConvBase, Lambda)) + MAML-wrapped head.pt
    (anil_vision.py:86-94)."""
    torch.manual_seed(2)
    base = ref_conv_base(1, 32, max_pool=False)
    features = torch.nn.Sequential(base)  # Lambda holds no params
    head = torch.nn.Linear(128, WAYS)
    feats_sd = {k: _np(v) for k, v in features.state_dict().items()}
    head_sd = {f"module.{k}": _np(v) for k, v in head.state_dict().items()}

    spec = models.anil_omniglot_spec(WAYS)
    params = imp.import_anil_vision(feats_sd, head_sd, spec)
    x = torch.randn(10, 1, 28, 28)
    with torch.no_grad():
        base.train()
        want = _np(head(base(x).flatten(1)))
    got = cnn4_apply(jax.tree_util.tree_map(jnp.asarray, params),
                     spec, _nhwc(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


# --- RL policies ----------------------------------------------------------

def test_import_diag_policy():
    torch.manual_seed(3)
    m = RefDiagNormalPolicy()
    params = imp.import_diag_policy(
        {k: _np(v) for k, v in m.state_dict().items()})
    pol = models.DiagNormalPolicy(input_size=2, output_size=2)
    s = torch.randn(7, 2)
    want_loc = _np(m(s))
    loc, scale = pol.density(jax.tree_util.tree_map(jnp.asarray, params),
                             jnp.asarray(_np(s)))
    np.testing.assert_allclose(np.asarray(loc), want_loc, rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(scale)[0], np.exp(-0.3),
                               rtol=1e-6)


def test_import_anil_policy_sigma_reset():
    """body/head split checkpoints; sigma resets to log(1)=0 exactly as
    the reference eval driver's fresh-policy rebuild does."""
    torch.manual_seed(4)
    body = torch.nn.Sequential(
        torch.nn.Linear(9, 100), torch.nn.Tanh(),
        torch.nn.Linear(100, 100), torch.nn.Tanh())
    head = torch.nn.Linear(100, 4)
    params = imp.import_anil_policy(
        {k: _np(v) for k, v in body.state_dict().items()},
        {k: _np(v) for k, v in head.state_dict().items()})
    pol = models.DiagNormalPolicyANIL(input_size=9, output_size=4,
                                      fc_neurons=100)
    s = torch.randn(5, 9)
    with torch.no_grad():
        want_loc = _np(head(body(s)))
    loc, scale = pol.density(jax.tree_util.tree_map(jnp.asarray, params),
                             jnp.asarray(_np(s)))
    np.testing.assert_allclose(np.asarray(loc), want_loc, rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(scale), 1.0, rtol=1e-6)


# --- run-dir round trip -----------------------------------------------------

def test_import_reference_run_dir(tmp_path):
    """Full reference-layout run dir -> framework run dir consumed by
    load_params + the eval drivers' template contract."""
    torch.manual_seed(5)
    src = tmp_path / "maml_5w1s_omni_ref"
    (src / "model_checkpoints").mkdir(parents=True)
    m = RefOmniglotCNN()
    torch.save(m.state_dict(), src / "model.pt")
    torch.save(m.state_dict(), src / "model_checkpoints" / "model_100.pt")
    config = {"algo": "maml_5w1s", "dataset": "omni", "ways": WAYS,
              "shots": 1, "inner_lr": 0.5, "adapt_steps": 1,
              "meta_batch_size": 4, "seed": 42}
    (src / "logger.json").write_text(json.dumps(
        {"config": config, "date": "x", "model_id": "42_1"}))
    (src / "metrics.json").write_text(json.dumps({"train_loss": [1.0]}))

    dst = str(tmp_path / "imported")
    imp.import_reference_run(str(src), dst)

    spec = models.omniglot_spec(WAYS)
    template = models.init_cnn4(jax.random.key(0), spec)
    params = load_params(os.path.join(dst, "model.npz"), template)
    ck = load_params(os.path.join(dst, "model_checkpoints",
                                  "model_100.npz"), template)
    x = torch.randn(4, 1, 28, 28)
    want = _np(m.train()(x))
    for p in (params, ck):
        got = cnn4_apply(p, spec, _nhwc(x))
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                                   atol=2e-4)
    with open(os.path.join(dst, "logger.json")) as f:
        out_cfg = json.load(f)["config"]
    assert out_cfg["algo"] == "maml_5w1s" and out_cfg["dataset"] == "omni"
    assert os.path.exists(os.path.join(dst, "metrics.json"))
