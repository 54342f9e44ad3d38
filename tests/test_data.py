"""Data pipeline: image preprocessing parity, augmentation, loader shapes."""

import numpy as np
import pytest

from htr_vt_tpu.config import AugmentConfig, DataConfig
from htr_vt_tpu.data import augment
from htr_vt_tpu.data.image import from_uint8, prepare_line_image, resize_keep_aspect, to_uint8
from htr_vt_tpu.data.loader import (TrainLoader, build_dataset, choose_max_label_len,
                                    collate, eval_batches, make_converter)
from htr_vt_tpu.data.synthetic import SyntheticLineDataset, render_line


def test_prepare_line_image_shape_and_padding():
    img = np.full((100, 300), 128, np.uint8)
    out = prepare_line_image(img, max_w=512, max_h=64)
    assert out.shape == (64, 512, 1)
    # aspect-preserving: new width = 300 * 64/100 = 192, rest padded white 1.0
    assert np.allclose(out[:, 192 + 2:], 1.0)
    assert not np.allclose(out[:, :190], 1.0)


def test_prepare_line_image_wide_cap():
    # very wide lines are capped at max_w (reference npThum min())
    img = np.zeros((50, 5000), np.uint8)
    out = prepare_line_image(img, 512, 64)
    assert out.shape == (64, 512, 1)


def test_uint8_roundtrip():
    img = np.random.default_rng(0).random((64, 512, 1)).astype(np.float32)
    back = from_uint8(to_uint8(img))
    assert np.abs(back - img).max() < 1 / 255 + 1e-6


def test_augment_batch_shapes_preserved():
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (64, 512), dtype=np.uint8) for _ in range(4)]
    cfg = AugmentConfig(proba=1.0)  # force every augmentation on
    out = augment.augment_batch(list(imgs), cfg, np.random.default_rng(1))
    assert all(o.shape == (64, 512) and o.dtype == np.uint8 for o in out)
    assert any(not np.array_equal(a, b) for a, b in zip(imgs, out))


def test_transform_zoo_runs():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (64, 256), dtype=np.uint8)
    assert augment.dilation(img, (2, 2)).shape == img.shape
    assert augment.erosion(img, (2, 2)).shape == img.shape
    assert augment.random_projective(img, 8.0, rng).shape == img.shape
    assert augment.elastic_distortion(img, rng).shape == img.shape
    assert augment.sign_flipping(img).shape == img.shape
    assert augment.gaussian_noise(img, rng).shape == img.shape
    assert augment.sharpen(img).shape == img.shape
    assert augment.zoom_ratio(img, 0.8, 0.9).shape == img.shape
    small = augment.dpi_adjusting(img, 0.5)
    assert small.shape == (32, 128)
    tight = augment.tightening(np.pad(img, 8, constant_values=255))
    assert tight.shape[0] <= img.shape[0] + 2


def test_synthetic_dataset_deterministic():
    ds = SyntheticLineDataset(8, seed=3, width=256)
    img1, lbl1 = ds[2]
    img2, lbl2 = ds[2]
    assert lbl1 == lbl2 and np.array_equal(img1, img2)
    assert img1.shape == (64, 256)
    # text actually rendered (not blank)
    assert (img1 < 200).sum() > 50


def test_train_loader_fixed_shapes_and_cycle():
    cfg = DataConfig(dataset="SYNTH", synth_train_size=16, img_size=(64, 256))
    ds = build_dataset(cfg, "train")
    conv = make_converter(cfg, ds)
    loader = TrainLoader(ds, conv, batch_size=4, max_label_len=32,
                         augment=cfg.augment, num_threads=2)
    try:
        seen = 0
        for batch in loader:
            assert batch["image"].shape == (4, 64, 256, 1)
            assert batch["image"].dtype == np.float32
            assert batch["labels"].shape == (4, 32)
            assert batch["label_lengths"].shape == (4,)
            seen += 1
            if seen >= 3:
                break
    finally:
        loader.close()


def test_eval_batches_pads_last():
    cfg = DataConfig(dataset="SYNTH", synth_eval_size=5, img_size=(64, 256))
    ds = build_dataset(cfg, "val")
    conv = make_converter(cfg, ds)
    batches = list(eval_batches(ds, conv, batch_size=4, max_label_len=32))
    assert len(batches) == 2
    (b1, v1, t1), (b2, v2, t2) = batches
    assert v1 == 4 and v2 == 1
    assert b2["image"].shape == (4, 64, 256, 1)  # padded to full batch
    assert len(t2) == 1


def test_choose_max_label_len():
    assert choose_max_label_len(["ab", "abcdefghi"], num_frames=128) == 16
    assert choose_max_label_len(["x" * 500], num_frames=128) == 128  # CTC cap


def test_degenerate_narrow_image():
    """Ultra-narrow inputs clamp to 1 px instead of crashing PIL."""
    out = prepare_line_image(np.zeros((500, 1), np.uint8), 512, 64)
    assert out.shape == (64, 512, 1)


def test_epoch_sampling_exactly_once_per_epoch():
    """Epoch-shuffled sampling: every index appears exactly once per epoch,
    reshuffled across epochs (reference DataLoader(shuffle=True) + cycle_data,
    data/dataset.py:169-172)."""
    from htr_vt_tpu.data.loader import batch_sample_ids

    n, bs = 10, 4
    drawn = np.concatenate([
        batch_sample_ids(n, b, seed=3, sampling="epoch", global_bs=bs,
                         shard_offset=0, shard_bs=bs) for b in range(10)])
    for e in range(4):
        epoch = np.sort(drawn[e * n:(e + 1) * n])
        np.testing.assert_array_equal(epoch, np.arange(n))
    # epochs are reshuffled, not repeated in the same order
    assert not np.array_equal(drawn[:n], drawn[n:2 * n])


def test_batch_sampling_shards_concatenate_to_global_stream():
    """P-process shards of every global batch concatenate to the exact
    1-process stream (the multi-host data-sharding contract)."""
    from htr_vt_tpu.data.loader import batch_sample_ids

    n, gbs, p = 23, 8, 2
    for sampling in ("epoch", "iid"):
        for b in range(7):
            full = batch_sample_ids(n, b, 5, sampling, gbs, 0, gbs)
            parts = [batch_sample_ids(n, b, 5, sampling, gbs,
                                      r * (gbs // p), gbs // p)
                     for r in range(p)]
            np.testing.assert_array_equal(full, np.concatenate(parts))


def test_train_loader_deterministic_and_resumable():
    """The emitted batch stream is a pure function of (seed, batch index):
    identical across loader instances/thread counts, and a loader started at
    start_batch=k continues the stream exactly (stream-exact resume)."""
    cfg = DataConfig(dataset="SYNTH", synth_train_size=12, img_size=(64, 256))
    ds = build_dataset(cfg, "train")
    conv = make_converter(cfg, ds)

    def take(loader, k):
        try:
            return [next(loader) for _ in range(k)]
        finally:
            loader.close()

    a = take(TrainLoader(ds, conv, batch_size=4, max_label_len=32,
                         augment=cfg.augment, seed=9, num_threads=3), 6)
    b = take(TrainLoader(ds, conv, batch_size=4, max_label_len=32,
                         augment=cfg.augment, seed=9, num_threads=1), 6)
    c = take(TrainLoader(ds, conv, batch_size=4, max_label_len=32,
                         augment=cfg.augment, seed=9, num_threads=2,
                         start_batch=3), 3)
    for x, y in zip(a, b):
        for key in x:
            np.testing.assert_array_equal(x[key], y[key])
    for x, y in zip(a[3:], c):  # resumed stream == tail of the full stream
        for key in x:
            np.testing.assert_array_equal(x[key], y[key])
    # different seed -> different stream
    d = take(TrainLoader(ds, conv, batch_size=4, max_label_len=32,
                         augment=cfg.augment, seed=10, num_threads=2), 1)
    assert not np.array_equal(a[0]["image"], d[0]["image"])


def test_train_loader_epoch_sampling_threadsafe():
    cfg = DataConfig(dataset="SYNTH", synth_train_size=8, img_size=(64, 256))
    ds = build_dataset(cfg, "train")
    conv = make_converter(cfg, ds)
    loader = TrainLoader(ds, conv, batch_size=4, max_label_len=32,
                         augment=None, num_threads=3, sampling="epoch")
    try:
        batches = [next(iter(loader)) for _ in range(6)]
        assert all(b["image"].shape == (4, 64, 256, 1) for b in batches)
    finally:
        loader.close()


def test_train_loader_surfaces_worker_errors():
    """A worker exception must raise in __next__, not deadlock the consumer
    (regression: the reordering buffer waited forever on a batch index whose
    builder thread died)."""
    import pytest

    cfg = DataConfig(dataset="SYNTH", synth_train_size=16, img_size=(64, 256))
    ds = build_dataset(cfg, "train")
    conv = make_converter(cfg, ds)

    class Broken:
        labels = ds.labels

        def __len__(self):
            return len(ds)

        def __getitem__(self, i):
            raise OSError("corrupt image")

    loader = TrainLoader(Broken(), conv, batch_size=4, max_label_len=32,
                         num_threads=2)
    try:
        with pytest.raises(RuntimeError, match="failed building batch"):
            next(loader)
    finally:
        loader.close()


def test_train_loader_iter_stopiteration_after_close():
    """iter(loader) must end with StopIteration after close(), not
    RuntimeError('generator raised StopIteration') — PEP 479 converts the
    exception inside a generator-based __iter__ (regression)."""
    import pytest

    cfg = DataConfig(dataset="SYNTH", synth_train_size=16, img_size=(64, 256))
    ds = build_dataset(cfg, "train")
    conv = make_converter(cfg, ds)
    loader = TrainLoader(ds, conv, batch_size=4, max_label_len=32,
                         num_threads=1)
    it = iter(loader)
    assert it is loader
    next(it)  # stream works
    loader.close()
    with pytest.raises(StopIteration):
        while True:
            next(it)


def test_elastic_distortion_mesh_semantics():
    """OrigamiNet mesh warp: borders fixed (corner pixels map to themselves),
    interior displaced, output identical when magnitude is 0."""
    from htr_vt_tpu.data import augment
    rng = np.random.default_rng(3)
    img = np.full((64, 128), 255, np.uint8)
    img[20:40, 30:100] = 0
    out = augment.elastic_distortion(img, rng)
    assert out.shape == img.shape and out.dtype == img.dtype
    assert not np.array_equal(out, img)  # interior really warps
    # zero magnitude -> identity mapping (bilinear corner interp is exact)
    rng2 = np.random.default_rng(3)
    same = augment.elastic_distortion(img, rng2, magnitude=(0, 0))
    np.testing.assert_array_equal(same, img)
