"""Packed array-backed few-shot datasets.

The reference builds l2l ``MetaDataset``/``TaskDataset`` pipelines with
host-side PIL decoding per sample (``utils/data_pre.py``). TPU-natively,
each dataset is a single packed uint8 array ``[n_classes, n_per_class,
H, W, C]`` resident in HBM; episodic task construction becomes pure
device gathers (see :mod:`exploring_meta_tpu.tasks.sampler`).

Class splits mirror the reference:
- Omniglot: 1623 classes shuffled with a seeded RNG, split
  1100/100/423 for train/valid/test (``data_pre.py:25-65``); images are
  28x28, inverted (``1.0 - x``), 20 samples per class.
- Mini-ImageNet: separate train(64)/validation(16)/test(20) class sets,
  84x84x3, 600 samples per class (``data_pre.py:70-110``).

Real data is loaded from packed ``.npz`` files when present (created once
by ``scripts/pack_datasets.py`` from the original downloads); otherwise a
deterministic synthetic dataset with the same shapes is generated so the
full pipeline (and benchmarks) run in hermetic environments. Synthetic
classes are separable (class-dependent patterns + noise), so learning
curves are meaningful.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

DATA_DIR = os.environ.get("EXPLORING_META_TPU_DATA",
                          os.path.expanduser("~/data/exploring_meta_tpu"))


class PackedDataset(NamedTuple):
    """Device-resident episodic dataset for one split."""
    images: jnp.ndarray      # [n_classes, n_per_class, H, W, C] uint8
    name: str
    invert: bool             # omniglot applies 1 - x after /255
    rotations: bool          # omniglot augments with random class rotations

    @property
    def n_classes(self) -> int:
        return self.images.shape[0]

    @property
    def n_per_class(self) -> int:
        return self.images.shape[1]


def _synthetic_classes(seed: int, n_classes: int, n_per_class: int,
                       h: int, w: int, c: int) -> np.ndarray:
    """Separable synthetic classes: smooth class-specific pattern + noise."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    imgs = np.empty((n_classes, n_per_class, h, w, c), dtype=np.uint8)
    for cls in range(n_classes):
        freq = rng.uniform(0.15, 0.9, size=(4, c))
        phase = rng.uniform(0, 2 * np.pi, size=(4, c))
        base = np.zeros((h, w, c), dtype=np.float32)
        for k in range(4):
            for ch in range(c):
                base[..., ch] += np.sin(freq[k, ch] * (xx + yy * (k % 2)) + phase[k, ch])
        base = (base - base.min()) / (np.ptp(base) + 1e-6)
        noise = rng.normal(0, 0.12, size=(n_per_class, h, w, c)).astype(np.float32)
        samples = np.clip(base[None] + noise, 0, 1)
        imgs[cls] = (samples * 255).astype(np.uint8)
    return imgs


def _load_packed(path: str) -> np.ndarray | None:
    if os.path.exists(path):
        with np.load(path) as z:
            return z["images"]
    return None


def _resolve_packed(synthetic: bool | None, path: str):
    """Tri-state ``synthetic``: True -> synthetic, None -> packed file
    with silent synthetic fallback (hermetic environments), False ->
    packed file REQUIRED (a user explicitly expecting real data must not
    silently get synthetic results)."""
    if synthetic:
        return None
    packed = _load_packed(path)
    if packed is None and synthetic is False:
        raise FileNotFoundError(
            f"synthetic=False but no packed dataset at {path}; run "
            "scripts/pack_datasets.py (or pass synthetic=None to allow "
            "the synthetic fallback)")
    return packed


def load_omniglot(seed: int = 42, synthetic: bool | None = None,
                  synthetic_classes: int = 160, synthetic_per_class: int = 20):
    """-> (train, valid, test) PackedDatasets with the reference's
    1100/100/423 shuffled-class split (scaled proportionally when
    synthetic)."""
    packed = _resolve_packed(synthetic,
                             os.path.join(DATA_DIR, "omniglot.npz"))
    if packed is None:
        n = synthetic_classes
        packed = _synthetic_classes(seed, n, synthetic_per_class, 28, 28, 1)
        splits = (int(n * 1100 / 1623), int(n * 1200 / 1623))
    else:
        if packed.shape[0] != 1623:
            # The reference's 1100/100/423 split is defined over the full
            # 1623-class FullOmniglot; silently splitting a partial pack
            # would give empty/mis-proportioned splits.
            raise ValueError(
                f"packed omniglot has {packed.shape[0]} classes, expected "
                "1623 (full FullOmniglot) — re-run scripts/pack_datasets.py "
                "on the complete dataset, or use synthetic=True")
        splits = (1100, 1200)

    rng = np.random.default_rng(seed)
    order = rng.permutation(packed.shape[0])

    def mk(cls_ids):
        return PackedDataset(images=jnp.asarray(packed[cls_ids]),
                             name="omni", invert=True, rotations=True)

    return (mk(order[:splits[0]]),
            mk(order[splits[0]:splits[1]]),
            mk(order[splits[1]:]))


def load_mini_imagenet(seed: int = 42, synthetic: bool | None = None,
                       synthetic_per_class: int = 64):
    """-> (train, valid, test) PackedDatasets; 64/16/20 class splits are
    fixed by the dataset definition, not reshuffled."""
    sizes = {"train": 64, "validation": 16, "test": 20}
    paths = {m: os.path.join(DATA_DIR, f"mini_imagenet_{m}.npz")
             for m in sizes}
    # Resolve all three splits together: a partial pack must not silently
    # mix real and synthetic splits (accuracy would be measured on
    # synthetic tasks while looking like real mini-ImageNet results).
    if synthetic is not True:
        present = {m: os.path.exists(p) for m, p in paths.items()}
        if any(present.values()) and not all(present.values()):
            missing = [paths[m] for m, ok in present.items() if not ok]
            raise ValueError(
                "partially packed mini-ImageNet: missing "
                f"{missing} — re-run scripts/pack_datasets.py for every "
                "split, or use synthetic=True")
    out = []
    for i, (mode, n_cls) in enumerate(sizes.items()):
        packed = _resolve_packed(synthetic, paths[mode])
        if packed is None:
            packed = _synthetic_classes(seed + i, n_cls, synthetic_per_class,
                                        84, 84, 3)
        out.append(PackedDataset(images=jnp.asarray(packed), name="min",
                                 invert=False, rotations=False))
    return tuple(out)


def get_dataset(name: str, seed: int = 42, synthetic: bool | None = None,
                synth_classes: int = 0, synth_per_class: int = 0):
    """Name-routed factory: ``omni`` | ``min`` (reference's dataset toggle,
    ``vision/maml_vision.py:40``).

    ``synth_classes``/``synth_per_class`` (0 = small hermetic defaults)
    size the synthetic fallback; at the real dataset shape that is
    ``omni: 1623 classes x 20`` (``data_pre.py:17-39``) and
    ``min: 64/16/20 classes x 600`` (``data_pre.py:70-110``)."""
    if name in ("omni", "omniglot"):
        kw = {}
        if synth_classes:
            kw["synthetic_classes"] = synth_classes
        if synth_per_class:
            kw["synthetic_per_class"] = synth_per_class
        return load_omniglot(seed=seed, synthetic=synthetic, **kw)
    if name in ("min", "mini-imagenet", "mini_imagenet"):
        if synth_classes:
            raise ValueError("mini-ImageNet class counts are fixed by the "
                             "dataset definition (64/16/20); only "
                             "synth_per_class is tunable (real shape: 600)")
        kw = {}
        if synth_per_class:
            kw["synthetic_per_class"] = synth_per_class
        return load_mini_imagenet(seed=seed, synthetic=synthetic, **kw)
    raise ValueError(f"unknown dataset {name!r}")
