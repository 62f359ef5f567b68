"""Functional RL policies mirroring reference ``core_functions/policies.py``.

All policies are (params, state) -> distribution-parameter functions:

- ``DiagNormalPolicy``      — Gaussian MLP (2x100 hidden), learned
  state-independent log-sigma clamped at log(1e-6) (reference :30-67).
- ``DiagNormalPolicyANIL``  — tanh body / linear head split; the ANIL
  "frozen body" toggle (reference ``turn_off_body_grads``, :94-106)
  becomes a ``stop_body_grad`` flag that stop-gradients the body output —
  functionally identical to torch's ``no_grad`` body pass.
- ``DiagNormalPolicyCNN`` / ``BaselineCNN`` — conv policies for 64x64
  pixel observations (reference :129-245).
- ``CategoricalPolicy``     — discrete policy over one-hot states
  (reference :248-268).

``log_prob`` keeps the reference's quirk of *averaging* (not summing) the
per-dimension Gaussian log density over the action axis
(``policies.py:54-56``) — the surrogate losses are calibrated to it.

Mixed precision (``--bf16`` on the RL trainers): each policy spec carries
a ``compute_dtype`` field; ``policy._replace(compute_dtype="bf16")`` runs
the MLP/conv compute graphs (where all the RL tier's FLOPs and HBM bytes
are) in bfloat16 with f32 master params, casting distribution parameters
back to f32 so the advantage/KL/CG numerics stay full precision. AD
transposes the casts automatically, so meta-gradients arrive f32.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from exploring_meta_tpu.models import init as pinit
from exploring_meta_tpu.models import distributions as dist
from exploring_meta_tpu.models.layers import (
    batch_norm, conv2d, linear, max_pool2d, mlp_apply, relu,
)

EPSILON = 1e-6
MIN_LOG_SIGMA = math.log(EPSILON)


def _init_mlp(key, sizes) -> list:
    layers = []
    for i, o in zip(sizes[:-1], sizes[1:]):
        key, k = jax.random.split(key)
        layers.append(pinit.linear_params(k, i, o, init="xavier"))
    return layers


def _sigma(params) -> jnp.ndarray:
    return jnp.exp(jnp.clip(params["sigma"], min=MIN_LOG_SIGMA))


def _cast_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, tree)


def _compute_cast(compute_dtype: str, params, x):
    """Cast (params, input) into the policy's compute dtype (bf16 mixed
    precision when ``compute_dtype == 'bf16'``; identity otherwise)."""
    if compute_dtype == "bf16":
        return _cast_tree(params, jnp.bfloat16), x.astype(jnp.bfloat16)
    return params, x


def _module_sliced_rep(layer_params, act, x, layer: int,
                       trailing_act: bool):
    """Reference ``get_representation`` semantics: walk the torch
    Sequential's module list (Linear and activation modules counted
    SEPARATELY) and apply ``modules[1:layer]`` — i.e. the first
    ``layer - 1`` modules; ``layer == -1`` applies all but the last.
    ``trailing_act``: whether the Sequential ends with an activation
    (ANIL body) or a Linear (the mean net)."""
    mods: list = []
    n = len(layer_params)
    for i, p in enumerate(layer_params):
        mods.append(p)
        if i < n - 1 or trailing_act:
            mods.append(None)  # activation module
    sel = mods[:-1] if layer == -1 else mods[:max(layer - 1, 0)]
    for m in sel:
        x = linear(m, x) if m is not None else act(x)
    return x


class DiagNormalPolicy(NamedTuple):
    """Static spec; params are a separate pytree."""
    input_size: int
    output_size: int
    hiddens: tuple = (100, 100)
    activation: str = "relu"
    compute_dtype: str = "f32"   # "bf16" = mixed-precision compute graph

    def init(self, key) -> dict:
        km, _ = jax.random.split(key)
        sizes = (self.input_size,) + tuple(self.hiddens) + (self.output_size,)
        return {"mean": _init_mlp(km, sizes),
                "sigma": jnp.zeros((self.output_size,))}  # fill_(log 1) = 0

    def _act(self):
        return jnp.tanh if self.activation == "tanh" else relu

    def density(self, params, state):
        """-> (loc, scale) of the diagonal Gaussian."""
        mean_p, state = _compute_cast(self.compute_dtype, params["mean"],
                                      state)
        loc = mlp_apply(mean_p, state, self._act()).astype(jnp.float32)
        return loc, jnp.broadcast_to(_sigma(params), loc.shape)

    def log_prob(self, params, state, action):
        loc, scale = self.density(params, state)
        return jnp.mean(dist.normal_log_prob(loc, scale, action),
                        axis=-1, keepdims=True)

    def sample(self, params, key, state):
        loc, scale = self.density(params, state)
        return dist.normal_sample(key, loc, scale)

    def get_representation(self, params, x, layer: int = -1):
        """Activation tap with the reference's MODULE-counted layer index
        (policies.py:63-67 applies ``mean.modules()[1:layer]``, where
        Linear and activation modules count separately): layer 1 is the
        identity, 2 the first Linear's output, 3 adds its activation,
        ...; -1 applies everything but the final Linear. (The reference
        eval config's comment labels 2/4 as 'ReLU output' but its code
        yields Linear outputs there — we match the code.)"""
        return _module_sliced_rep(params["mean"], self._act(), x, layer,
                                  trailing_act=False)


class DiagNormalPolicyANIL(NamedTuple):
    input_size: int
    output_size: int
    fc_neurons: int = 100
    hiddens: tuple = (100, 100)
    compute_dtype: str = "f32"

    def init(self, key) -> dict:
        if self.fc_neurons != self.hiddens[-1]:
            # The reference's Linear(fc_neurons, out) head silently
            # mismatches its hardcoded [100, 100] body for any other
            # value and dies in the first forward; fail at init with the
            # actual constraint instead.
            raise ValueError(
                f"fc_neurons={self.fc_neurons} must equal the body's "
                f"output width hiddens[-1]={self.hiddens[-1]} "
                f"(pass hiddens=(100, fc_neurons))")
        kb, kh = jax.random.split(key)
        sizes = (self.input_size,) + tuple(self.hiddens)
        return {
            "body": _init_mlp(kb, sizes),
            "head": pinit.linear_params(kh, self.fc_neurons, self.output_size,
                                        init="xavier"),
            "sigma": jnp.zeros((self.output_size,)),
        }

    def features(self, params, state):
        """Tanh body (activation after every layer, reference :79-85)."""
        body_p, x = _compute_cast(self.compute_dtype, params["body"], state)
        for p in body_p:
            x = jnp.tanh(linear(p, x))
        return x

    def density(self, params, state, stop_body_grad: bool = False):
        feats = self.features(params, state)
        if stop_body_grad:
            feats = jax.lax.stop_gradient(feats)
        head_p, feats = _compute_cast(self.compute_dtype, params["head"],
                                      feats)
        loc = linear(head_p, feats).astype(jnp.float32)
        return loc, jnp.broadcast_to(_sigma(params), loc.shape)

    def log_prob(self, params, state, action, stop_body_grad: bool = False):
        loc, scale = self.density(params, state, stop_body_grad)
        return jnp.mean(dist.normal_log_prob(loc, scale, action),
                        axis=-1, keepdims=True)

    def sample(self, params, key, state):
        loc, scale = self.density(params, state)
        return dist.normal_sample(key, loc, scale)

    def get_representation(self, params, x, layer: int = -1):
        """Module-counted tap over the body (reference :122-126); the
        body Sequential ENDS with an activation, so -1 yields the final
        hidden layer's PRE-activation output."""
        return _module_sliced_rep(params["body"], jnp.tanh, x, layer,
                                  trailing_act=True)


class DiagNormalPolicyCNN(NamedTuple):
    """Conv Gaussian policy on [N, 64, 64, C] pixels (reference :129-193)."""
    input_channels: int
    output_size: int
    network: tuple = (32, 64, 64)
    compute_dtype: str = "f32"

    @property
    def flatten_size(self) -> int:
        final = int(64 / (2 ** len(self.network)))
        return self.network[-1] * final * final

    def init(self, key) -> dict:
        blocks = []
        in_ch = self.input_channels
        for out_ch in self.network:
            key, kc, kb = jax.random.split(key, 3)
            blocks.append({"conv": pinit.conv_params(kc, 3, in_ch, out_ch),
                           "bn": pinit.batchnorm_params(kb, out_ch)})
            in_ch = out_ch
        key, kh = jax.random.split(key)
        return {"features": blocks,
                "mean": pinit.linear_params(kh, self.flatten_size,
                                            self.output_size, init="xavier"),
                "sigma": jnp.zeros((self.output_size,))}

    def _features(self, params, x):
        feat_p, x = _compute_cast(self.compute_dtype, params["features"], x)
        for p in feat_p:
            x = conv2d(p["conv"], x, stride=1, padding=1)
            x = max_pool2d(relu(batch_norm(p["bn"], x)), 2, 2)
        return x.reshape(x.shape[0], -1)

    def density(self, params, state):
        mean_p, feats = _compute_cast(self.compute_dtype, params["mean"],
                                      self._features(params, state))
        loc = linear(mean_p, feats).astype(jnp.float32)
        return loc, jnp.broadcast_to(_sigma(params), loc.shape)

    def log_prob(self, params, state, action):
        loc, scale = self.density(params, state)
        return jnp.mean(dist.normal_log_prob(loc, scale, action),
                        axis=-1, keepdims=True)

    def sample(self, params, key, state):
        loc, scale = self.density(params, state)
        return dist.normal_sample(key, loc, scale)


class BaselineCNN(NamedTuple):
    """Conv value network -> scalar (reference :196-245)."""
    input_channels: int
    network: tuple = (32, 64, 64)

    @property
    def flatten_size(self) -> int:
        final = int(64 / (2 ** len(self.network)))
        return self.network[-1] * final * final

    def init(self, key) -> dict:
        blocks = []
        in_ch = self.input_channels
        for out_ch in self.network:
            key, kc, kb = jax.random.split(key, 3)
            blocks.append({"conv": pinit.conv_params(kc, 3, in_ch, out_ch),
                           "bn": pinit.batchnorm_params(kb, out_ch)})
            in_ch = out_ch
        key, kh = jax.random.split(key)
        return {"features": blocks,
                "head": pinit.linear_params(kh, self.flatten_size, 1,
                                            init="xavier")}

    def apply(self, params, state):
        x = state
        for p in params["features"]:
            x = conv2d(p["conv"], x, stride=1, padding=1)
            x = max_pool2d(relu(batch_norm(p["bn"], x)), 2, 2)
        return linear(params["head"], x.reshape(x.shape[0], -1))


class CategoricalPolicy(NamedTuple):
    input_size: int
    output_size: int
    hiddens: tuple = (100, 100)

    def init(self, key) -> dict:
        sizes = (self.input_size,) + tuple(self.hiddens) + (self.output_size,)
        return {"mean": _init_mlp(key, sizes)}

    def logits(self, params, state):
        from exploring_meta_tpu.ops.stats import onehot
        state = onehot(state, self.input_size)
        return mlp_apply(params["mean"], state, relu)

    def sample(self, params, key, state):
        lg = self.logits(params, state)
        action = dist.categorical_sample(key, lg)
        log_prob = dist.categorical_log_prob(lg, action)
        return action, {"log_prob": jax.lax.stop_gradient(log_prob)}

    def log_prob(self, params, state, action):
        return dist.categorical_log_prob(self.logits(params, state), action)
