"""Import reference-trained torch checkpoints into framework params.

The reference ecosystem's run dirs hold torch ``state_dict`` pickles
(``utils/experiment.py:85-90``), consumed by its offline drivers
(``misc_scripts/eval_vision.py:79-92``, ``eval_rl.py:126-159``). This
module completes the migration story: load those artifacts into this
framework's param pytrees (and whole run dirs into the framework's
run-dir contract) so ``analysis/eval_vision.py``, ``analysis/eval_rl.py``
and ``serve.py`` can consume a reference-trained model unchanged.

Layout translations (all mechanical, all verified round-trip in
``tests/test_import_reference.py`` against live torch modules built to
the reference definitions):

- conv weights: torch OIHW ``[co, ci, kh, kw]`` -> JAX HWIO
  ``[kh, kw, ci, co]``;
- linear weights: torch ``[out, in]`` -> ``[in, out]``;
- flattened conv features feeding a linear head (MiniImagenetCNN
  ``view(-1, 25*hidden)`` at ``vision_models.py:107``; ANIL-vision's
  Lambda flatten at ``vision/anil_vision.py:90``): torch flattens NCHW
  as (c, h, w) while this framework flattens NHWC as (h, w, c), so the
  head's input axis is permuted accordingly;
- BatchNorm: ``normalize.{weight,bias}`` -> ``bn.{scale,bias}``;
  running statistics are dropped — both the reference (per-clone
  batch-stat BN, ``vision_models.py:168-175``) and this framework
  normalize with batch statistics, so they are dead state;
- ``module.``-prefixed keys (l2l ``MAML``-wrapped modules, e.g. the
  ANIL-vision head at ``vision/anil_vision.py:94``) are unwrapped;
- ANIL RL checkpoints hold body/head only (``rl/anil_trpo.py:131-134``);
  ``sigma`` is reset to its init log(1) = 0, exactly what the
  reference's own eval driver does when it rebuilds the policy and
  loads only body+head (``misc_scripts/eval_rl.py:150-153``);
- the cherry ``LinearValue`` baseline checkpoint is not imported: this
  framework's linear value baseline is fit closed-form per batch
  (``ops/value.py``), mirroring how the reference refits it inside
  every adaptation — the pickled weights are always refit before use.
"""

from __future__ import annotations

import glob
import json
import os
import re

import numpy as np


# ---------------------------------------------------------------------------
# state_dict loading / key utilities
# ---------------------------------------------------------------------------

def load_state_dict(path: str) -> dict:
    """torch.load a ``.pt`` state_dict to numpy arrays (CPU, weights-only)."""
    import torch
    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except TypeError:  # older torch without weights_only
        sd = torch.load(path, map_location="cpu")
    return {k: np.asarray(v.detach().cpu().numpy())
            for k, v in sd.items() if hasattr(v, "detach")}


def strip_maml_prefix(sd: dict) -> dict:
    """Unwrap l2l ``MAML(module)`` state_dicts (keys ``module.*``)."""
    if sd and all(k.startswith("module.") for k in sd):
        return {k[len("module."):]: v for k, v in sd.items()}
    return sd


def _t(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _conv_w(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _flat_head_w(w: np.ndarray, channels: int, spatial: int) -> np.ndarray:
    """Torch ``[out, c*h*w]`` head weight -> framework ``[h*w*c, out]``."""
    out = w.shape[0]
    w = w.reshape(out, channels, spatial, spatial)
    w = np.transpose(w, (0, 2, 3, 1)).reshape(out, -1)
    return _t(w)


# ---------------------------------------------------------------------------
# vision models
# ---------------------------------------------------------------------------

def import_conv_base(sd: dict, prefix: str = "") -> list:
    """ConvBase state_dict (keys ``{prefix}<i>.conv.*`` /
    ``{prefix}<i>.normalize.*``) -> framework block list."""
    blocks = []
    for i in range(64):  # blocks are contiguous from 0
        kc = f"{prefix}{i}.conv.weight"
        if kc not in sd:
            break
        blocks.append({
            "conv": {"w": _conv_w(sd[kc]),
                     "b": sd[f"{prefix}{i}.conv.bias"].copy()},
            "bn": {"scale": sd[f"{prefix}{i}.normalize.weight"].copy(),
                   "bias": sd[f"{prefix}{i}.normalize.bias"].copy()},
        })
    if not blocks:
        raise ValueError(
            f"no ConvBase blocks under prefix {prefix!r}: keys={list(sd)[:8]}")
    return blocks


def import_cnn4(sd: dict, spec) -> dict:
    """OmniglotCNN / MiniImagenetCNN state_dict -> ``init_cnn4``-shaped
    params (reference ``vision_models.py:10-118``)."""
    sd = strip_maml_prefix(sd)
    base = import_conv_base(sd, prefix="base.")
    w, b = sd["linear.weight"], sd["linear.bias"]
    if spec.global_pool:  # Omniglot head: [ways, hidden] on pooled feats
        head_w = _t(w)
    else:  # flattened NCHW features
        spatial = int(round((spec.head_in / spec.hidden) ** 0.5))
        head_w = _flat_head_w(w, spec.hidden, spatial)
    return {"base": base, "head": {"w": head_w, "b": b.copy()}}


def import_anil_vision(features_sd: dict, head_sd: dict, spec) -> dict:
    """ANIL-vision ``features.pt`` (Sequential(ConvBase, Lambda) ->
    keys ``0.<i>.*``) + ``head.pt`` (possibly MAML-wrapped Linear) ->
    framework CNN4 params (reference ``vision/anil_vision.py:86-99``)."""
    features_sd = strip_maml_prefix(features_sd)
    head_sd = strip_maml_prefix(head_sd)
    prefix = "0." if any(k.startswith("0.0.") for k in features_sd) else ""
    base = import_conv_base(features_sd, prefix=prefix)
    spatial = int(round((spec.head_in / spec.hidden) ** 0.5))
    return {"base": base,
            "head": {"w": _flat_head_w(head_sd["weight"], spec.hidden,
                                       spatial),
                     "b": head_sd["bias"].copy()}}


# ---------------------------------------------------------------------------
# RL policies
# ---------------------------------------------------------------------------

def _import_mlp(sd: dict, prefix: str) -> list:
    """nn.Sequential of Linear(+activation) -> framework layer list."""
    layers = []
    idxs = sorted({int(m.group(1)) for k in sd
                   if (m := re.match(rf"{re.escape(prefix)}(\d+)\.weight$",
                                     k))})
    for i in idxs:
        layers.append({"w": _t(sd[f"{prefix}{i}.weight"]),
                       "b": sd[f"{prefix}{i}.bias"].copy()})
    if not layers:
        raise ValueError(f"no Linear layers under prefix {prefix!r}")
    return layers


def import_diag_policy(sd: dict) -> dict:
    """DiagNormalPolicy state_dict (``mean.<i>.*`` + ``sigma``) ->
    framework params (reference ``policies.py:30-67``)."""
    sd = strip_maml_prefix(sd)
    return {"mean": _import_mlp(sd, "mean."),
            "sigma": sd["sigma"].copy()}


def import_anil_policy(body_sd: dict, head_sd: dict) -> dict:
    """ANIL policy from its split body/head checkpoints
    (``rl/anil_trpo.py:131-134``). ``sigma`` resets to log(1) = 0 — the
    reference's eval driver does the same (it loads only body+head into
    a freshly built policy, ``misc_scripts/eval_rl.py:150-153``)."""
    body_sd = strip_maml_prefix(body_sd)
    head_sd = strip_maml_prefix(head_sd)
    body = _import_mlp(body_sd, "")
    out = head_sd["bias"].shape[0]
    return {"body": body,
            "head": {"w": _t(head_sd["weight"]),
                     "b": head_sd["bias"].copy()},
            "sigma": np.zeros((out,), np.float32)}


# ---------------------------------------------------------------------------
# whole-run-dir import
# ---------------------------------------------------------------------------

def _vision_spec(config: dict, anil: bool):
    from exploring_meta_tpu import models
    ways = config["ways"]
    if config["dataset"] == "omni":
        return (models.anil_omniglot_spec(ways) if anil
                else models.omniglot_spec(ways))
    return (models.anil_mini_imagenet_spec(ways) if anil
            else models.mini_imagenet_spec(ways))


def _detect_kind(config: dict, src: str) -> str:
    algo = config.get("algo", "")
    anil = algo.startswith("anil")
    is_vision = (config.get("dataset") in ("omni", "min")
                 or os.path.exists(os.path.join(src, "features.pt"))
                 or "ways" in config)
    if is_vision:
        return "anil_vision" if anil else "maml_vision"
    return "anil_rl" if anil else "maml_rl"


def _import_params(kind: str, spec, paths: dict):
    if kind == "maml_vision":
        return import_cnn4(load_state_dict(paths["model"]), spec)
    if kind == "anil_vision":
        return import_anil_vision(load_state_dict(paths["features"]),
                                  load_state_dict(paths["head"]), spec)
    if kind == "maml_rl":
        return import_diag_policy(load_state_dict(paths["model"]))
    return import_anil_policy(load_state_dict(paths["body"]),
                              load_state_dict(paths["head"]))


def import_reference_run(src: str, dst: str, kind: str | None = None) -> str:
    """Convert a reference run dir (``logger.json`` + ``*.pt`` +
    ``model_checkpoints/``; layout per reference ``utils/experiment.py``
    + ``misc_scripts/eval_rl.py:126-139``) into a framework run dir
    (``logger.json`` + ``model.npz`` + ``model_checkpoints/*.npz``)
    that analysis/eval/serving consume unchanged. Returns ``dst``."""
    from exploring_meta_tpu.utils.experiment import flatten_params

    with open(os.path.join(src, "logger.json")) as f:
        logger = json.load(f)
    config = dict(logger.get("config", logger))
    kind = kind or _detect_kind(config, src)
    anil = kind.startswith("anil")
    spec = _vision_spec(config, anil) if kind.endswith("vision") else None

    os.makedirs(os.path.join(dst, "model_checkpoints"), exist_ok=True)

    def save(params, path):
        np.savez(path, **flatten_params(params))

    # final model
    final = {
        "maml_vision": {"model": "model.pt"},
        "anil_vision": {"features": "features.pt", "head": "head.pt"},
        "maml_rl": {"model": "model.pt"},
        "anil_rl": {"body": "body.pt", "head": "head.pt"},
    }[kind]
    paths = {k: os.path.join(src, v) for k, v in final.items()}
    if all(os.path.exists(p) for p in paths.values()):
        save(_import_params(kind, spec, paths),
             os.path.join(dst, "model.npz"))

    # checkpoints: model_<iter>.pt (maml) / split files (anil)
    ckdir = os.path.join(src, "model_checkpoints")
    n_ckpts = 0
    if os.path.isdir(ckdir):
        if kind == "maml_vision" or kind == "maml_rl":
            for p in glob.glob(os.path.join(ckdir, "model_*.pt")):
                m = re.match(r"model_(\d+)\.pt$", os.path.basename(p))
                if not m:
                    continue
                save(_import_params(kind, spec, {"model": p}),
                     os.path.join(dst, "model_checkpoints",
                                  f"model_{m.group(1)}.npz"))
                n_ckpts += 1
        else:
            first, second = (("features", "head") if kind == "anil_vision"
                             else ("body", "head"))
            for p in glob.glob(os.path.join(ckdir, f"model_{first}_*.pt")):
                m = re.match(rf"model_{first}_(\d+)\.pt$",
                             os.path.basename(p))
                if not m:
                    continue
                it = m.group(1)
                q = os.path.join(ckdir, f"model_{second}_{it}.pt")
                if not os.path.exists(q):
                    continue
                save(_import_params(kind, spec, {first: p, second: q}),
                     os.path.join(dst, "model_checkpoints",
                                  f"model_{it}.npz"))
                n_ckpts += 1

    config.setdefault("imported_from", os.path.abspath(src))
    with open(os.path.join(dst, "logger.json"), "w") as f:
        json.dump({"config": config,
                   "date": logger.get("date", ""),
                   "model_id": logger.get("model_id", "imported")},
                  f, sort_keys=True, indent=4)
    # metrics.json: copy if present (analysis plotters read it)
    srcm = os.path.join(src, "metrics.json")
    if os.path.exists(srcm):
        with open(srcm) as f:
            metrics = json.load(f)
        with open(os.path.join(dst, "metrics.json"), "w") as f:
            json.dump(metrics, f)
    print(f"imported kind={kind} -> {dst} ({n_ckpts} checkpoints)")
    return dst
