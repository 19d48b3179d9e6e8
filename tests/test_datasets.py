"""Dataset list-builder parity vs the reference's classes on fabricated trees."""

import os
import sys
import types

import numpy as np
import pytest

from scouter_tpu.data import (
    load_image_list,
    load_mnist,
    scan_context,
    scan_cub200,
    scan_imagenet_subset,
    synthetic_mnist,
)

REFERENCE = "/root/reference"


def _ref_modules():
    # stub the reference's import-time deps that this env lacks
    for name in ("prefetch_generator",):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.BackgroundGenerator = iter
            sys.modules[name] = mod
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from dataset.ConText import MakeList, MakeListImage  # noqa

    return MakeList, MakeListImage


def _write_img(path):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(path)


class TestConTextSplit:
    def test_split_matches_reference(self, tmp_path):
        root = str(tmp_path / "context")
        names = [f"cat{c}_{i:03d}.jpg" for c in ("aa", "bb", "cc") for i in range(7)]
        for n in names:
            _write_img(os.path.join(root, n))

        MakeList, _ = _ref_modules()
        ns = types.SimpleNamespace(dataset_dir=root)
        ref_train, ref_val = MakeList(ns).get_data()
        train, val = scan_context(root)
        assert [tuple(x) for x in ref_train] == [tuple(x) for x in train]
        assert [tuple(x) for x in ref_val] == [tuple(x) for x in val]


class TestImageNetSubset:
    def test_first_n_folders_rule(self, tmp_path):
        root = str(tmp_path / "imagenet") + "/"
        for wnid in ("n01", "n02", "n03"):
            for phase in ("train", "val"):
                _write_img(os.path.join(root, phase, wnid, f"{wnid}_1.JPEG"))

        _, MakeListImage = _ref_modules()
        ns = types.SimpleNamespace(dataset_dir=root, num_classes=2)
        ref_train, ref_val = MakeListImage(ns).get_data()
        train, val = scan_imagenet_subset(root, 2)
        assert [tuple(x) for x in ref_train] == [tuple(x) for x in train]
        assert [tuple(x) for x in ref_val] == [tuple(x) for x in val]
        assert all(lbl in (0, 1) for _, lbl in train)


class TestCub200:
    def test_metadata_parse_and_class_filter(self, tmp_path):
        root = str(tmp_path / "cub")
        os.makedirs(root, exist_ok=True)
        images = [
            ("1", "001.Sp1/im1.jpg", "1", "1"),
            ("2", "001.Sp1/im2.jpg", "1", "0"),
            ("3", "002.Sp2/im3.jpg", "2", "1"),
            ("4", "003.Sp3/im4.jpg", "3", "1"),  # filtered (class > 2)
        ]
        with open(os.path.join(root, "images.txt"), "w") as f:
            f.writelines(f"{i} {n}\n" for i, n, _, _ in images)
        with open(os.path.join(root, "image_class_labels.txt"), "w") as f:
            f.writelines(f"{i} {c}\n" for i, _, c, _ in images)
        with open(os.path.join(root, "train_test_split.txt"), "w") as f:
            f.writelines(f"{i} {s}\n" for i, _, _, s in images)

        train, test = scan_cub200(root, num_classes=2)
        train_names = [os.path.basename(p) for p, _ in train]
        test_names = [os.path.basename(p) for p, _ in test]
        assert train_names == ["im1.jpg", "im3.jpg"]
        assert test_names == ["im2.jpg"]
        assert [l for _, l in train] == [0, 1]  # labels shifted -1 (CUB200.py:72)


class TestLoading:
    def test_load_image_list(self, tmp_path):
        paths = []
        for i in range(3):
            p = str(tmp_path / f"x_{i}.png")
            _write_img(p)
            paths.append((p, i))
        images, labels = load_image_list(paths, staging_size=16)
        assert images.shape == (3, 16, 16, 3) and images.dtype == np.uint8
        np.testing.assert_array_equal(labels, [0, 1, 2])

    def test_mnist_idx_roundtrip(self, tmp_path):
        import gzip
        import struct

        (tr_x, tr_y), _ = synthetic_mnist(num_train=10, num_test=2)
        d = tmp_path / "MNIST" / "raw"
        os.makedirs(d)
        with open(d / "train-images-idx3-ubyte", "wb") as f:
            f.write(struct.pack(">IIII", 0x803, 10, 28, 28))
            f.write(tr_x[..., 0].tobytes())
        with gzip.open(str(d / "train-labels-idx1-ubyte") + ".gz", "wb") as f:
            f.write(struct.pack(">II", 0x801, 10))
            f.write(tr_y.astype(np.uint8).tobytes())

        images, labels = load_mnist(str(tmp_path), train=True)
        np.testing.assert_array_equal(images, tr_x)
        np.testing.assert_array_equal(labels, tr_y)


class TestAugmentRandomOrder:
    """imgaug Sequential(random_order=True) parity (tools/image_aug.py:41)."""

    def test_order_changes_result(self):
        import jax.numpy as jnp
        from scouter_tpu.data.transforms import _apply_augs

        rng = np.random.RandomState(0)
        img = jnp.asarray(rng.uniform(0, 255, (16, 16, 3)).astype(np.float32))
        gates = (False, False, True, True)  # affine + blur: non-commuting pair
        params = (0.85, 0.9, 0.05, -0.05, 7.0, 2.0)
        a_then_b = _apply_augs(img, gates, params, [2, 3, 0, 1])
        b_then_a = _apply_augs(img, gates, params, [3, 2, 0, 1])
        assert not np.allclose(np.asarray(a_then_b), np.asarray(b_then_a), atol=1e-3)
        # identity slots don't affect the result
        a_then_b2 = _apply_augs(img, gates, params, [0, 2, 1, 3])
        np.testing.assert_allclose(np.asarray(a_then_b), np.asarray(a_then_b2),
                                   rtol=1e-6, atol=1e-4)

    def test_all_orders_occur(self):
        import jax
        from scouter_tpu.data.transforms import _augment_one

        # the per-image permutation draw covers multiple orders across keys
        orders = set()
        for i in range(40):
            keys = jax.random.split(jax.random.PRNGKey(i), 11)
            orders.add(tuple(np.asarray(jax.random.permutation(keys[10], 4))))
        assert len(orders) >= 10

    def test_gates_off_is_identity(self):
        import jax.numpy as jnp
        from scouter_tpu.data.transforms import _apply_augs

        rng = np.random.RandomState(1)
        img = jnp.asarray(rng.uniform(0, 255, (12, 12, 3)).astype(np.float32))
        out = _apply_augs(img, (False,) * 4, (0.9, 0.9, 0.0, 0.0, 5.0, 1.0),
                          [3, 1, 2, 0])
        np.testing.assert_allclose(np.asarray(out), np.asarray(img))


class TestStreamingFolderDataset:
    """Lazy per-batch decode (VERDICT round-1 weak item 4): byte-identical to
    the eager load_image_list path, deterministic, and RAM-bounded."""

    def _make_tree(self, tmp_path, n=12, size=24):
        from PIL import Image

        rng = np.random.RandomState(0)
        items = []
        for i in range(n):
            p = str(tmp_path / f"img_{i:03d}.png")
            Image.fromarray(rng.randint(0, 255, (size, size, 3), np.uint8)).save(p)
            items.append((p, i % 3))
        return items

    def test_gather_matches_eager_decode(self, tmp_path):
        from scouter_tpu.data import FolderDataset, load_image_list

        items = self._make_tree(tmp_path)
        eager_imgs, eager_labels = load_image_list(items, staging_size=16)
        ds = FolderDataset(items, staging_size=16, dataset_name="ConText")
        idx = np.array([3, 0, 7, 3, 11])
        np.testing.assert_array_equal(ds.gather(idx), eager_imgs[idx])
        np.testing.assert_array_equal(ds.labels[idx], eager_labels[idx])

    def test_loader_batches_match_eager_dataset(self, tmp_path):
        from scouter_tpu.data import ArrayDataset, FolderDataset, Loader, load_image_list

        items = self._make_tree(tmp_path)
        eager_imgs, eager_labels = load_image_list(items, staging_size=16)
        eager = ArrayDataset(eager_imgs, eager_labels, "ConText")
        lazy = FolderDataset(items, staging_size=16, dataset_name="ConText")
        kw = dict(batch_size=4, img_size=16, train=True, seed=5, shard_by_host=False)
        b_eager = list(Loader(eager, **kw).epoch(0))
        b_lazy = list(Loader(lazy, **kw).epoch(0))
        assert len(b_eager) == len(b_lazy) == 3
        for a, b in zip(b_eager, b_lazy):
            np.testing.assert_array_equal(np.asarray(a["label"]), np.asarray(b["label"]))
            np.testing.assert_allclose(np.asarray(a["image"]), np.asarray(b["image"]))

    def test_images_view_matches_eager(self, tmp_path):
        # .images accessor parity with ArrayDataset (used by explain/cli.py,
        # compare_cli.py and parity_report.py to fetch a single vis image)
        from scouter_tpu.data import FolderDataset, load_image_list

        items = self._make_tree(tmp_path)
        eager_imgs, _ = load_image_list(items, staging_size=16)
        ds = FolderDataset(items, staging_size=16, dataset_name="ConText")
        assert len(ds.images) == len(eager_imgs)
        np.testing.assert_array_equal(ds.images[5], eager_imgs[5])
        np.testing.assert_array_equal(ds.images[2:7], eager_imgs[2:7])
        sel = np.array([1, 9, 4])
        np.testing.assert_array_equal(ds.images[sel], eager_imgs[sel])
        np.testing.assert_array_equal(
            np.stack([np.asarray(ds.images[i]) for i in sel]), eager_imgs[sel])

    def test_cache_is_byte_bounded(self, tmp_path):
        from scouter_tpu.data import FolderDataset

        items = self._make_tree(tmp_path)
        item_bytes = 16 * 16 * 3
        ds = FolderDataset(items, staging_size=16, dataset_name="ConText",
                           cache_bytes=3 * item_bytes)
        ds.gather(np.arange(12))
        assert ds.cached_bytes <= 3 * item_bytes
        # cached entries are reused and identical
        np.testing.assert_array_equal(ds.gather([0, 1, 2]), ds.gather([0, 1, 2]))

    def test_select_dataset_returns_streaming(self, tmp_path):
        from scouter_tpu.core import ScouterConfig
        from scouter_tpu.data import FolderDataset, select_dataset

        for i in range(4):
            (tmp_path / f"cat_{i}.png").write_bytes(b"")  # names only
        from PIL import Image

        rng = np.random.RandomState(1)
        for i in range(4):
            Image.fromarray(rng.randint(0, 255, (8, 8, 3), np.uint8)).save(
                str(tmp_path / f"cat_{i}.png"))
        cfg = ScouterConfig(dataset="ConText", dataset_dir=str(tmp_path),
                            num_classes=1, img_size=8)
        ds = select_dataset(cfg, train=True)
        assert isinstance(ds, FolderDataset)
        # staging == img_size: the host PIL resize is the only resize (single
        # Resize parity with transform_func.py:59-66)
        assert ds.gather([0]).shape == (1, cfg.img_size, cfg.img_size, 3)


def test_folder_dataset_synthetic_fallback():
    """Folder datasets (ConText/ImageNet/CUB) fall back to a labeled synthetic
    stream when nothing is on disk — same contract as the MNIST fallback, so
    every CLI runs data-free (numbers tagged SYNTHETIC in the reports)."""
    from scouter_tpu.core import ScouterConfig
    from scouter_tpu.data import select_dataset

    cfg = ScouterConfig(model="resnet10", dataset="ImageNet", num_classes=3,
                        channel=512, img_size=64, batch_size=2,
                        dataset_dir="/nonexistent_dir_xyz",
                        pre_trained=False, freeze_layers=0)
    ds_tr = select_dataset(cfg, train=True)
    ds_va = select_dataset(cfg, train=False)
    assert len(ds_tr.images) > len(ds_va.images) > 0
    img = np.asarray(ds_tr.images[0])
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    assert set(np.unique(ds_tr.labels)) <= {0, 1, 2}
    # deterministic across calls
    img2 = np.asarray(select_dataset(cfg, train=True).images[0])
    np.testing.assert_array_equal(img, img2)


class TestLoaderRobustness:
    """Round-3 review regressions: padding arithmetic, worker error
    propagation, epoch abandonment."""

    def _loader(self, n=10, batch_size=4, **kw):
        from scouter_tpu.data import ArrayDataset, Loader

        images = np.zeros((n, 8, 8, 1), np.uint8)
        labels = np.arange(n, dtype=np.int32) % 3
        return Loader(ArrayDataset(images, labels, "MNIST"), batch_size,
                      img_size=8, **kw)

    def test_val_tail_batch_padded_once(self):
        """10 items / batch 4 -> 3 val batches, the last padded 4-long with a
        2-hot mask (the old double-pad emitted an 8-long batch)."""
        loader = self._loader(train=False)
        batches = list(loader.epoch(0))
        assert len(batches) == 3
        for b in batches:
            assert b["image"].shape[0] == 4 and b["mask"].shape[0] == 4
        assert float(np.asarray(batches[-1]["mask"]).sum()) == 2.0

    def test_worker_error_propagates(self):
        """A failure inside batch production must raise in the training loop,
        not hang q.get() forever (the old worker died without the sentinel)."""
        import pytest

        loader = self._loader(train=False)
        loader.ds.dataset_name = "NoSuchDataset"  # breaks NORMALIZE_VALUES lookup
        with pytest.raises(KeyError):
            list(loader.epoch(0))

    def test_abandoned_epoch_does_not_wedge_next(self):
        """Breaking out of an epoch early must not leave the worker blocked
        (subsequent epochs keep working; queued batches are released)."""
        loader = self._loader(n=40, batch_size=4, train=False)
        it = loader.epoch(0)
        next(it)
        it.close()  # abandon with 9 batches unconsumed
        assert len(list(loader.epoch(1))) == 10

    def test_multihost_train_shuffle_is_global(self):
        """DistributedSampler semantics: the per-epoch permutation is GLOBAL
        (a host's shard changes every epoch and is not its fixed contiguous
        slice of the class-sorted list)."""
        from unittest import mock

        from scouter_tpu.data import ArrayDataset, Loader

        images = np.zeros((16, 8, 8, 1), np.uint8)
        labels = np.arange(16, dtype=np.int32)
        with mock.patch("jax.process_count", return_value=2), \
             mock.patch("jax.process_index", return_value=0):
            loader = Loader(ArrayDataset(images, labels, "MNIST"), 4,
                            img_size=8, train=True, shard_by_host=True)
            e0 = loader._epoch_indices(0)
            e1 = loader._epoch_indices(1)
        assert len(e0) == 8
        assert set(e0) != set(range(8)) or set(e1) != set(range(8))
        assert not np.array_equal(np.sort(e0), np.sort(e1)) or \
            not np.array_equal(e0, e1)
