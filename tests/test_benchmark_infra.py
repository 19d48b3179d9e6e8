"""Tests for the attribution benchmark harness + experiment store."""

import numpy as np

from scouter_tpu.explain.benchmark import ExperimentStore, run_pointing_benchmark


def test_experiment_store_roundtrip(tmp_path):
    store = ExperimentStore(str(tmp_path / "results.db"))
    store.save("voc", "gradcam", "img1", {"hit": 1})
    store.save("voc", "gradcam", "img2", {"hit": -1})
    assert store.load("voc", "gradcam", "img1") == {"hit": 1}
    assert sorted(store.keys("voc", "gradcam")) == ["img1", "img2"]
    store.save("voc", "gradcam", "img1", {"hit": -1})  # upsert
    assert store.load("voc", "gradcam", "img1") == {"hit": -1}
    assert store.load("voc", "rise", "img1") is None
    store.close()


def test_pointing_benchmark_end_to_end(tmp_path):
    # perfect saliency: peak at the object center
    def saliency_fn(image, class_id):
        sal = np.zeros(image.shape[:2], np.float32)
        ys, xs = np.nonzero(image[..., 0] > 0)
        sal[int(ys.mean()), int(xs.mean())] = 1.0
        return sal

    def make_item(cy, cx, cls):
        img = np.zeros((32, 32, 3), np.float32)
        img[cy - 3: cy + 3, cx - 3: cx + 3] = 1.0
        mask = (img[..., 0] > 0).astype(np.uint8)
        return img, cls, mask

    dataset = [make_item(10, 10, 0), make_item(20, 20, 1), make_item(8, 24, 1)]
    store = ExperimentStore(str(tmp_path / "r.db"))
    game = run_pointing_benchmark(saliency_fn, dataset, num_classes=2,
                                  tolerance=3, store=store)
    assert game.accuracy == 1.0
    assert len(store.keys("default", "pointing")) == 3


def test_pointing_benchmark_misses():
    def bad_saliency(image, class_id):
        sal = np.zeros(image.shape[:2], np.float32)
        sal[0, 0] = 1.0  # always the corner
        return sal

    img = np.zeros((32, 32, 3), np.float32)
    img[20:26, 20:26] = 1.0
    mask = (img[..., 0] > 0).astype(np.uint8)
    game = run_pointing_benchmark(bad_saliency, [(img, 0, mask)], num_classes=1,
                                  tolerance=5)
    assert game.accuracy == 0.0
