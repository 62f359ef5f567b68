"""Real-data ingestion rehearsal on bit-faithful on-disk fakes.

The image has no network egress, so the actual downloads can never run
here — this rehearses EVERY other seam of the real-data path end to end:

- Omniglot: a fake download tree in torchvision's exact layout
  (``<src>/images_background/<Alphabet>/character<NN>/<id>.png``,
  105x105 grayscale PNGs, 30+20 alphabets totalling the real 964+659 =
  1623 classes x 20 samples — reference ``utils/data_pre.py:17-23``)
  -> ``pack_omniglot`` -> ``load_omniglot(synthetic=False)`` ->
  2-iteration MAML train + meta-test through the fused trainer.
- Mini-ImageNet: the standard l2l cache pickles
  (``mini-imagenet-cache-{train,val,test}.pkl`` holding
  ``{"image_data": [N,84,84,3] uint8, "class_dict": {name: [idx]}}``,
  reference ``utils/data_pre.py:72-74``) -> ``pack_mini_imagenet`` ->
  ``load_mini_imagenet(synthetic=False)`` -> 2-iteration ANIL train.

After this, the only untested seam on the data path is the download
itself.
"""

import os
import pickle

import numpy as np
import pytest

from exploring_meta_tpu.tasks import datasets
from exploring_meta_tpu.tasks.pack import pack_mini_imagenet, pack_omniglot

pytestmark = pytest.mark.slow

# real FullOmniglot alphabet sizes sum to these (data_pre.py:17-23)
_BACKGROUND_CLASSES = 964
_EVALUATION_CLASSES = 659


def _write_omniglot_tree(src):
    """Torchvision FullOmniglot layout; 50 distinct PNG blobs cycled
    across the 32,460 files (IO format is the thing under test)."""
    import io

    from PIL import Image

    rng = np.random.default_rng(0)
    blobs = []
    for i in range(50):
        # white background, dark strokes, like the real scans
        arr = np.full((105, 105), 255, np.uint8)
        for _ in range(6):
            r, c = rng.integers(0, 90, 2)
            arr[r:r + rng.integers(3, 12), c:c + rng.integers(3, 12)] = \
                rng.integers(0, 60)
        b = io.BytesIO()
        Image.fromarray(arr, "L").save(b, "PNG")
        blobs.append(b.getvalue())

    cls = 0
    for part, total in (("images_background", _BACKGROUND_CLASSES),
                        ("images_evaluation", _EVALUATION_CLASSES)):
        alpha_i, left = 0, total
        while left:
            n_chars = min(left, 20 + (alpha_i % 7))  # uneven alphabets
            adir = os.path.join(src, part, f"Alphabet{alpha_i:03d}")
            for ch in range(n_chars):
                cdir = os.path.join(adir, f"character{ch + 1:02d}")
                os.makedirs(cdir)
                for s in range(20):
                    with open(os.path.join(cdir, f"{cls:04d}_{s:02d}.png"),
                              "wb") as f:
                        f.write(blobs[(cls * 20 + s) % len(blobs)])
                cls += 1
            alpha_i += 1
            left -= n_chars
    assert cls == 1623


def _write_min_pickles(src, n_per=24):
    """l2l cache pickles; the val split uses the real file's '-val'
    spelling to exercise pack_mini_imagenet's name fallback."""
    rng = np.random.default_rng(1)
    sizes = {"train": 64, "val": 16, "test": 20}
    os.makedirs(src, exist_ok=True)
    for mode, n_cls in sizes.items():
        img = (rng.random((n_cls * n_per, 84, 84, 3)) * 255).astype(np.uint8)
        class_dict = {f"n{mode}{c:08d}": list(range(c * n_per,
                                                    (c + 1) * n_per))
                      for c in range(n_cls)}
        with open(os.path.join(src, f"mini-imagenet-cache-{mode}.pkl"),
                  "wb") as f:
            pickle.dump({"image_data": img, "class_dict": class_dict}, f)


def test_omniglot_pack_load_train(tmp_path, monkeypatch):
    src, out = str(tmp_path / "omniglot-py"), str(tmp_path / "packed")
    _write_omniglot_tree(src)
    pack_omniglot(src, out)

    packed = np.load(os.path.join(out, "omniglot.npz"))["images"]
    assert packed.shape == (1623, 20, 28, 28, 1)
    assert packed.dtype == np.uint8
    assert packed.mean() > 128  # stored raw (white bg); invert is on-device

    monkeypatch.setattr(datasets, "DATA_DIR", out)
    train, valid, test = datasets.load_omniglot(seed=3, synthetic=False)
    assert (train.n_classes, valid.n_classes, test.n_classes) \
        == (1100, 100, 423)
    assert train.invert and train.rotations

    # 2-iteration MAML train + meta-test through the real trainer
    from exploring_meta_tpu.trainers import VisionTrainer
    from exploring_meta_tpu.utils.config import VisionConfig

    monkeypatch.chdir(tmp_path)
    cfg = VisionConfig(num_iterations=2, meta_batch_size=2, save_every=10,
                       compile_cache=os.environ.get("EMT_COMPILE_CACHE", ""))
    acc = VisionTrainer(cfg).run()
    assert np.isfinite(acc)


def test_mini_imagenet_pack_load_train(tmp_path, monkeypatch):
    src, out = str(tmp_path / "downloads"), str(tmp_path / "packed")
    _write_min_pickles(src)
    pack_mini_imagenet(src, out)

    for mode, n_cls in (("train", 64), ("validation", 16), ("test", 20)):
        packed = np.load(
            os.path.join(out, f"mini_imagenet_{mode}.npz"))["images"]
        assert packed.shape == (n_cls, 24, 84, 84, 3), mode

    monkeypatch.setattr(datasets, "DATA_DIR", out)
    train, valid, test = datasets.load_mini_imagenet(synthetic=False)
    assert (train.n_classes, valid.n_classes, test.n_classes) == (64, 16, 20)
    assert not train.invert and not train.rotations

    from exploring_meta_tpu.trainers import VisionTrainer
    from exploring_meta_tpu.utils.config import (
        VisionConfig, anil_vision_defaults,
    )

    monkeypatch.chdir(tmp_path)
    cfg = anil_vision_defaults()
    cfg = VisionConfig(**{**cfg.to_params(), "dataset": "min",
                          "num_iterations": 2, "meta_batch_size": 2,
                          "save_every": 10,
                          "compile_cache": os.environ.get(
                              "EMT_COMPILE_CACHE", "")})
    acc = VisionTrainer(cfg, anil=True).run()
    assert np.isfinite(acc)