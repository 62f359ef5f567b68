"""Real-data packing pipeline tests (no network: synthetic PIL images).

Exercises ``scripts/pack_datasets.py``'s resize-LANCZOS / layout logic on
generated images and the split contracts of ``tasks/datasets.py``
(Omniglot 1100/100/423 shuffled classes, Mini-ImageNet 64/16/20) — the
reference pipeline being ``utils/data_pre.py:16-112``.
"""

import os
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "scripts"))


def _write_omniglot_tree(src, n_alphabets=2, chars_per_alphabet=2,
                         samples=20, size=105):
    """Fake Omniglot download layout: images_background/<alphabet>/
    character<NN>/<id>.png, 105x105 grayscale like the real data."""
    from PIL import Image

    rng = np.random.default_rng(0)
    truths = {}
    for part, alphas in (("images_background", range(n_alphabets)),
                         ("images_evaluation", range(1))):
        for a in alphas:
            for c in range(chars_per_alphabet):
                d = os.path.join(src, part, f"Alphabet{a}",
                                 f"character{c:02d}")
                os.makedirs(d)
                for s in range(samples):
                    arr = (rng.random((size, size)) * 255).astype(np.uint8)
                    Image.fromarray(arr, mode="L").save(
                        os.path.join(d, f"{s:04d}.png"))
                    truths[(part, a, c, s)] = arr
    return truths


def test_pack_omniglot_shapes_and_lanczos(tmp_path):
    from PIL import Image
    import pack_datasets

    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    truths = _write_omniglot_tree(src)
    pack_datasets.pack_omniglot(src, out)

    with np.load(os.path.join(out, "omniglot.npz")) as z:
        images = z["images"]
    # 2 alphabets x 2 chars (background) + 1 x 2 (evaluation) = 6 classes
    assert images.shape == (6, 20, 28, 28, 1)
    assert images.dtype == np.uint8

    # The stored class 0 sample 0 must equal an independent PIL
    # LANCZOS-resize of the first file of the first sorted class dir
    # (background/Alphabet0/character00), raw — the invert happens on
    # device (pack_datasets.py:11).
    ref = Image.fromarray(truths[("images_background", 0, 0, 0)],
                          mode="L").resize((28, 28), Image.LANCZOS)
    np.testing.assert_array_equal(images[0, 0, :, :, 0],
                                  np.asarray(ref, np.uint8))


def test_pack_mini_imagenet_from_cache_pickles(tmp_path):
    import pack_datasets

    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    os.makedirs(src)
    rng = np.random.default_rng(1)
    sizes = {"train": 4, "validation": 3, "test": 2}
    for mode, n_cls in sizes.items():
        n_per = 12
        img = (rng.random((n_cls * n_per, 84, 84, 3)) * 255).astype(np.uint8)
        class_dict = {f"n{mode}{c:02d}": list(range(c * n_per,
                                                    (c + 1) * n_per))
                      for c in range(n_cls)}
        stem = "val" if mode == "validation" else mode
        with open(os.path.join(src, f"mini-imagenet-cache-{stem}.pkl"),
                  "wb") as f:
            pickle.dump({"image_data": img, "class_dict": class_dict}, f)

    pack_datasets.pack_mini_imagenet(src, out)
    for mode, n_cls in sizes.items():
        with np.load(os.path.join(out, f"mini_imagenet_{mode}.npz")) as z:
            packed = z["images"]
        assert packed.shape == (n_cls, 12, 84, 84, 3)
        assert packed.dtype == np.uint8


def test_omniglot_split_1100_100_423(tmp_path, monkeypatch):
    """The real-data split contract (reference data_pre.py:25-65): 1623
    shuffled classes -> 1100 train / 100 valid / 423 test, invert +
    rotations on."""
    import exploring_meta_tpu.tasks.datasets as ds

    packed = np.zeros((1623, 20, 28, 28, 1), np.uint8)
    # stamp the class id into each image so splits can be identity-checked
    packed[:, :, 0, 0, 0] = (np.arange(1623) % 251)[:, None]
    np.savez(tmp_path / "omniglot.npz", images=packed)
    monkeypatch.setattr(ds, "DATA_DIR", str(tmp_path))

    train, valid, test = ds.load_omniglot(seed=42, synthetic=False)
    assert train.n_classes == 1100
    assert valid.n_classes == 100
    assert test.n_classes == 423
    assert train.invert and train.rotations
    # disjoint shuffled split: the three stamped-id multisets partition 1623
    counts = (np.bincount(np.asarray(train.images[:, 0, 0, 0, 0]), minlength=251)
              + np.bincount(np.asarray(valid.images[:, 0, 0, 0, 0]), minlength=251)
              + np.bincount(np.asarray(test.images[:, 0, 0, 0, 0]), minlength=251))
    np.testing.assert_array_equal(
        counts, np.bincount(np.arange(1623) % 251, minlength=251))


def test_mini_imagenet_loads_packed(tmp_path, monkeypatch):
    import exploring_meta_tpu.tasks.datasets as ds

    rng = np.random.default_rng(2)
    for mode, n_cls in {"train": 5, "validation": 4, "test": 3}.items():
        np.savez(tmp_path / f"mini_imagenet_{mode}.npz",
                 images=(rng.random((n_cls, 6, 84, 84, 3)) * 255
                         ).astype(np.uint8))
    monkeypatch.setattr(ds, "DATA_DIR", str(tmp_path))
    train, valid, test = ds.load_mini_imagenet(synthetic=False)
    assert train.n_classes == 5 and valid.n_classes == 4
    assert test.n_classes == 3
    assert not train.invert and not train.rotations
