"""CNN4 backbones for few-shot vision (Finn et al. 2017 architecture).

Functional re-design of reference ``core_functions/vision_models.py``:

- ``OmniglotCNN``  — 4x [conv3x3 stride-2 -> BN -> ReLU], 64 ch, input
  [N, 28, 28, 1], global spatial mean -> Linear(64 -> ways) with N(0,1)
  weight (``vision_models.py:38-55``).
- ``MiniImagenetCNN`` — 4x [conv3x3 stride-1 -> BN -> ReLU -> maxpool2],
  32 ch, input [N, 84, 84, 3], flatten 5*5*32=800 -> xavier Linear
  (``vision_models.py:93-110``).

Block order (conv -> BN -> ReLU -> pool) and all init distributions match
the reference exactly. Layout is NHWC and the whole forward is one XLA
program; under ``vmap`` over a task axis the per-task BN statistics are
computed per episode, replicating l2l's per-clone BN behavior.

Per-layer activation taps (``get_rep_layer`` / ``get_base_representation``,
reference ``vision_models.py:57-63,112-118``) are provided for the
representation-change analysis suite.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from exploring_meta_tpu.models import init as pinit
from exploring_meta_tpu.models.layers import (
    batch_norm, conv2d, linear, max_pool2d, relu,
)


class CNN4Spec(NamedTuple):
    """Static architecture description (hashable, safe as a jit static arg)."""
    channels: int          # input channels
    hidden: int            # conv width
    layers: int            # number of conv blocks
    max_pool: bool         # True: stride-1 conv + maxpool; False: stride-2 conv
    head_in: int           # flattened feature dim into the linear head
    ways: int              # output classes
    image_size: int
    head_init: str         # "normal" (omniglot) | "xavier" (mini-imagenet)
    global_pool: bool      # True: spatial mean head input (omniglot)


def omniglot_spec(ways: int = 5, hidden: int = 64, layers: int = 4) -> CNN4Spec:
    return CNN4Spec(channels=1, hidden=hidden, layers=layers, max_pool=False,
                    head_in=hidden, ways=ways, image_size=28,
                    head_init="normal", global_pool=True)


def mini_imagenet_spec(ways: int = 5, hidden: int = 32, layers: int = 4) -> CNN4Spec:
    return CNN4Spec(channels=3, hidden=hidden, layers=layers, max_pool=True,
                    head_in=25 * hidden, ways=ways, image_size=84,
                    head_init="xavier", global_pool=False)


def anil_omniglot_spec(ways: int = 5) -> CNN4Spec:
    """ANIL-vision Omniglot: ConvBase(hidden=32, stride-2) flattened to
    fc_neurons=128 (2*2*32), torch-default head
    (reference ``vision/anil_vision.py:40-41,87,94``)."""
    return CNN4Spec(channels=1, hidden=32, layers=4, max_pool=False,
                    head_in=128, ways=ways, image_size=28,
                    head_init="torch_default", global_pool=False)


def anil_mini_imagenet_spec(ways: int = 5) -> CNN4Spec:
    """ANIL-vision Mini-ImageNet: ConvBase(hidden=64, maxpool) flattened to
    fc_neurons=1600 (5*5*64), torch-default head
    (reference ``vision/anil_vision.py:42-43,89,94``)."""
    return CNN4Spec(channels=3, hidden=64, layers=4, max_pool=True,
                    head_in=1600, ways=ways, image_size=84,
                    head_init="torch_default", global_pool=False)


def init_conv_base(key, spec: CNN4Spec) -> list:
    """Init the ConvBase: ``layers`` blocks of {conv, bn} params."""
    blocks = []
    in_ch = spec.channels
    for i in range(spec.layers):
        kc, kb, key = jax.random.split(key, 3)
        blocks.append({
            "conv": pinit.conv_params(kc, 3, in_ch, spec.hidden),
            "bn": pinit.batchnorm_params(kb, spec.hidden),
        })
        in_ch = spec.hidden
    return blocks


def init_cnn4(key, spec: CNN4Spec) -> dict:
    kb, kh = jax.random.split(key)
    return {
        "base": init_conv_base(kb, spec),
        "head": pinit.linear_params(kh, spec.head_in, spec.ways,
                                    init=spec.head_init),
    }


def conv_block_apply(p: dict, x: jnp.ndarray, max_pool: bool) -> jnp.ndarray:
    """conv -> BN -> ReLU -> (maxpool | identity); stride folded into the
    conv when not max-pooling (reference ``vision_models.py:149-193``)."""
    x = conv2d(p["conv"], x, stride=1 if max_pool else 2, padding=1)
    x = relu(batch_norm(p["bn"], x))
    if max_pool:
        x = max_pool2d(x, 2, 2)
    return x


def base_apply(base: list, x: jnp.ndarray, max_pool: bool,
               n_blocks: int | None = None,
               remat: bool = False) -> jnp.ndarray:
    """Run the first ``n_blocks`` conv blocks (all by default) — the
    activation tap used by ``get_rep_layer``.

    ``remat=True`` checkpoints each block: the backward pass recomputes
    block internals (conv output, BN normalization) from the block input
    instead of loading them from HBM — a FLOPs-for-bytes trade for
    bandwidth-bound steps (the ANIL-min meta-step runs at ~8% MXU /
    ~100% physical HBM, BASELINE.md r4s6b-r4s8)."""
    blocks = base if n_blocks is None else base[:n_blocks]
    block = (jax.checkpoint(conv_block_apply, static_argnums=(2,))
             if remat else conv_block_apply)
    for p in blocks:
        x = block(p, x, max_pool)
    return x


def cnn4_features(params: dict, spec: CNN4Spec, x: jnp.ndarray,
                  remat: bool = False) -> jnp.ndarray:
    """Base output flattened to the head input ([N, head_in]).

    Under ``set_conv_impl("pallas")`` the Omniglot-shaped base (stride-2
    blocks + global mean) routes to the fused whole-base Pallas kernels
    (``pallas/cnn4_pallas.py``, SURVEY §7.2 stage 11); other specs fall
    back to the per-op XLA path.
    """
    from exploring_meta_tpu.models.layers import get_conv_impl
    if (get_conv_impl() == "pallas" and spec.global_pool
            and not spec.max_pool and spec.layers == 4):
        from exploring_meta_tpu.pallas.cnn4_pallas import fused_omni_base
        return fused_omni_base(params["base"], x)
    x = base_apply(params["base"], x, spec.max_pool, remat=remat)
    if spec.global_pool:
        return jnp.mean(x, axis=(1, 2))
    return x.reshape(x.shape[0], -1)


def cnn4_apply(params: dict, spec: CNN4Spec, x: jnp.ndarray) -> jnp.ndarray:
    """Full forward: [N, H, W, C] images -> [N, ways] logits."""
    return linear(params["head"], cnn4_features(params, spec, x))


def cnn4_head_apply(params: dict, feats: jnp.ndarray) -> jnp.ndarray:
    """Head only, on pre-extracted features — the ANIL inner-loop path
    (reference ``utils/data_pre.py:118-119`` + ``vision/anil_vision.py``)."""
    return linear(params["head"], feats)


def get_rep_layer(params: dict, spec: CNN4Spec, x: jnp.ndarray,
                  layer: int) -> jnp.ndarray:
    """Activations after ``layer`` conv blocks; ``layer == -1`` applies
    the head to base features (reference ``vision_models.py:60-63``).

    The head tap respects the spec's own feature layout — the reference's
    OmniglotCNN copy-pasted MiniImagenet's ``view(-1, 25*hidden)`` there
    and would crash on its own headline model; we keep the intended
    semantics instead: raw images ([N, H, W, C] at the spec's input size)
    run the full forward to logits, pre-extracted features apply only the
    head.
    """
    if layer == -1:
        if x.ndim == 4:
            return cnn4_apply(params, spec, x)
        return linear(params["head"], x.reshape(x.shape[0], -1))
    return base_apply(params["base"], x, spec.max_pool, n_blocks=layer)


def count_params(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
