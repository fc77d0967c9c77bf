"""Distortion-synthesis and dataset/loader tests."""

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from color_transfer_tpu.data import distortions, datasets


def _img(rng, h=16, w=20):
    return jnp.asarray(rng.uniform(0.1, 0.9, (h, w, 3)).astype(np.float32))


class TestDistortions:
    def test_identity_factors(self, rng):
        x = _img(rng)
        for fn in [
            lambda: distortions.adjust_brightness(x, 1.0),
            lambda: distortions.adjust_contrast(x, 1.0),
            lambda: distortions.adjust_saturation(x, 1.0),
            lambda: distortions.adjust_hue(x, 0.0),
            lambda: distortions.adjust_gamma(x, 1.0),
            lambda: distortions.adjust_sharpness(x, 1.0),
        ]:
            np.testing.assert_allclose(np.asarray(fn()), np.asarray(x), atol=1e-5)

    def test_brightness_scales(self, rng):
        x = _img(rng)
        out = distortions.adjust_brightness(x, 0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 0.5, atol=1e-6)

    def test_contrast_preserves_gray_mean_direction(self, rng):
        x = _img(rng)
        lo = np.asarray(distortions.adjust_contrast(x, 0.5))
        # contrast 0 collapses to the grayscale mean
        zero = np.asarray(distortions.adjust_contrast(x, 0.0))
        assert zero.std() < 1e-6
        assert lo.std() < float(np.asarray(x).std())

    def test_saturation_zero_is_grayscale(self, rng):
        x = _img(rng)
        out = np.asarray(distortions.adjust_saturation(x, 0.0))
        assert np.abs(out[..., 0] - out[..., 1]).max() < 1e-6
        assert np.abs(out[..., 1] - out[..., 2]).max() < 1e-6

    def test_hue_full_cycle(self, rng):
        x = _img(rng)
        out = distortions.adjust_hue(distortions.adjust_hue(x, 0.3), -0.3)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)

    def test_gamma_monotone(self, rng):
        x = _img(rng)
        dark = np.asarray(distortions.adjust_gamma(x, 1.5))
        bright = np.asarray(distortions.adjust_gamma(x, 0.7))
        assert (dark <= np.asarray(x) + 1e-6).all()
        assert (bright >= np.asarray(x) - 1e-6).all()

    def test_sharpness_border_untouched(self, rng):
        x = _img(rng)
        out = np.asarray(distortions.adjust_sharpness(x, 3.0))
        np.testing.assert_allclose(out[0], np.asarray(x)[0], atol=1e-6)
        np.testing.assert_allclose(out[:, -1], np.asarray(x)[:, -1], atol=1e-6)
        assert np.abs(out[1:-1, 1:-1] - np.asarray(x)[1:-1, 1:-1]).max() > 1e-4

    def test_uniform_distortions_jittable_and_seeded(self, rng):
        x = _img(rng)
        f = jax.jit(distortions.apply_uniform_distortions)
        k = jax.random.PRNGKey(3)
        o1, o2 = f(x, k), f(x, k)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
        o3 = f(x, jax.random.PRNGKey(4))
        assert np.abs(np.asarray(o1) - np.asarray(o3)).max() > 1e-4
        assert np.asarray(o1).min() >= 0 and np.asarray(o1).max() <= 1

    def test_grid_has_31_fns(self, rng):
        fns = distortions.setup_grid_distortions()
        assert len(fns) == 31
        x = _img(rng)
        outs = [np.asarray(fn(x)) for fn in fns]
        np.testing.assert_array_equal(outs[0], np.asarray(x))  # identity first
        assert all(o.shape == x.shape for o in outs)


def _make_stereo_dir(tmp_path, n=3, h=40, w=60, subdir=None, with_ld=False):
    rng = np.random.default_rng(0)
    root = tmp_path if subdir is None else tmp_path / subdir
    root.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        for suffix in (["L", "R", "LD"] if with_ld else ["L", "R"]):
            arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            Image.fromarray(arr).save(root / f"{i:04d}_{suffix}.png")
    return root


class TestDatasets:
    def test_train_dataset_crops_and_repeats(self, tmp_path):
        _make_stereo_dir(tmp_path, n=3)
        ds = datasets.ArtificialTrainValDataset(tmp_path, crop_size=(16, 24), image_repeats=5)
        assert len(ds) == 15
        item = ds[0]
        assert item["gt"].shape == (16, 24, 3)
        assert item["reference"].shape == (16, 24, 3)
        assert item["gt"].dtype == np.uint8

    def test_test_dataset_grid_indexing(self, tmp_path):
        _make_stereo_dir(tmp_path, n=2)
        ds = datasets.ArtificialTestDataset(tmp_path)
        assert len(ds) == 62
        assert ds[0]["distortion_idx"] == 0
        assert ds[32]["distortion_idx"] == 1

    def test_realworld_dataset(self, tmp_path):
        _make_stereo_dir(tmp_path, n=2, subdir="scene1", with_ld=True)
        ds = datasets.RealWorldTestDataset(tmp_path)
        assert len(ds) == 2
        item = ds[0]
        assert set(item) == {"gt", "target", "reference"}

    def test_loader_batches(self, tmp_path):
        _make_stereo_dir(tmp_path, n=4)
        ds = datasets.ArtificialTrainValDataset(tmp_path, crop_size=(8, 8), image_repeats=2)
        loader = datasets.Loader(ds, batch_size=3, shuffle=True, num_threads=2)
        batches = list(loader)
        assert sum(b["gt"].shape[0] for b in batches) == 8
        assert batches[0]["gt"].shape[1:] == (8, 8, 3)

    def test_first_batch_no_epoch_bump_no_thread_leak(self, tmp_path):
        """first_batch is a synchronous probe: it must not advance the
        seeded shuffle stream (next(iter(...)) did, shifting every epoch of
        a resumed run) nor leave a producer thread blocked on its queue."""
        import threading

        _make_stereo_dir(tmp_path, n=4)
        ds = datasets.ArtificialTrainValDataset(
            tmp_path, crop_size=(8, 8), image_repeats=2
        )
        loader = datasets.Loader(ds, batch_size=3, shuffle=True, num_threads=2)

        before = threading.active_count()
        for _ in range(5):
            b = loader.first_batch()
            assert b["gt"].shape == (3, 8, 8, 3)
        assert loader._epoch == 0
        assert threading.active_count() == before

        # The first real epoch is byte-identical to a probe-free loader's.
        loader2 = datasets.Loader(
            ds, batch_size=3, shuffle=True, num_threads=2
        )
        a = [np.asarray(b["gt"]) for b in loader]
        b = [np.asarray(x["gt"]) for x in loader2]
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)

    def test_loader_propagates_dataset_errors(self, tmp_path):
        """A failing dataset item must raise in the consumer, not deadlock
        the training loop on a queue whose producer died silently."""
        class Bad:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                if i == 2:
                    raise RuntimeError("corrupt item")
                return {"gt": np.zeros((4, 4, 3), np.float32)}

        import pytest

        loader = datasets.Loader(Bad(), batch_size=2, num_threads=2)
        with pytest.raises(RuntimeError, match="corrupt item"):
            list(loader)

    def test_loader_early_break_shuts_down_producer(self, tmp_path):
        import threading
        import time as _time

        _make_stereo_dir(tmp_path, n=8)
        ds = datasets.ArtificialTrainValDataset(
            tmp_path, crop_size=(8, 8), image_repeats=4
        )
        before = threading.active_count()
        for _ in range(4):
            for batch in datasets.Loader(ds, batch_size=1, prefetch=1):
                break  # max_batches-style early exit
        _time.sleep(0.5)
        assert threading.active_count() <= before + 1

    def test_crop_exact_size_image(self, tmp_path):
        """An image exactly crop-sized must be croppable (inclusive upper
        bound, torchvision RandomCrop semantics)."""
        _make_stereo_dir(tmp_path, n=1, h=40, w=60)
        ds = datasets.ArtificialTrainValDataset(
            tmp_path, crop_size=(40, 60), image_repeats=1
        )
        item = ds[0]
        assert item["gt"].shape == (40, 60, 3)
