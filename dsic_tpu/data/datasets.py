"""Host-side dataset pipeline: folder of images -> prefetched numpy batches.

Capability-equivalent of the reference loader (datasets.py:15-93): recursive
multi-extension glob, 90/10 seeded split, reflect pad-to-multiple-of-16,
random hflip p=0.5 for training, [0,1] float tensors, drop_last on train.
Worker processes are replaced by a thread pool + prefetch queue (PIL decode
releases the GIL), and shapes are made static for XLA: either all images share
one padded shape ("pad" policy, the reference's implicit assumption — its
BigEarthNet patches are uniformly 120x120 -> 128x128), or images are
random-cropped/padded to exactly crop_size ("crop" policy).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from dsic_tpu.utils.image_io import list_images, load_image


def _pad_to_multiple_np(img: np.ndarray, mult: int) -> np.ndarray:
    h, w = img.shape[:2]
    new_h = ((h + mult - 1) // mult) * mult
    new_w = ((w + mult - 1) // mult) * mult
    top = (new_h - h) // 2
    left = (new_w - w) // 2
    if new_h == h and new_w == w:
        return img
    mode = "reflect" if (h > 1 and w > 1) else "edge"
    return np.pad(img, ((top, new_h - h - top), (left, new_w - w - left),
                        (0, 0)), mode=mode)


def _crop_or_pad_np(img: np.ndarray, size: int, rng: np.random.Generator
                    ) -> np.ndarray:
    h, w = img.shape[:2]
    if h < size or w < size:
        ph, pw = max(0, size - h), max(0, size - w)
        img = np.pad(img, ((ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2),
                           (0, 0)), mode="reflect")
        h, w = img.shape[:2]
    top = int(rng.integers(0, h - size + 1))
    left = int(rng.integers(0, w - size + 1))
    return img[top:top + size, left:left + size]


def split_paths(paths: list[str], val_fraction: float = 0.1, seed: int = 42):
    """Seeded shuffle + train/val split (datasets.py:79-84)."""
    paths = list(paths)
    rng = np.random.default_rng(seed)
    rng.shuffle(paths)
    n_train = int((1.0 - val_fraction) * len(paths))
    return paths[:n_train], paths[n_train:]


class FolderImages:
    """Indexable image dataset with the reference's preprocessing."""

    def __init__(self, root_or_paths, crop_size: int = 256, train: bool = True,
                 shape_policy: str = "pad", pad_multiple: int = 16,
                 seed: int = 0, wire_dtype: str = "uint8"):
        """wire_dtype="uint8" ships 8-bit images to the accelerator (4x less
        host->device transfer; jitted steps normalize on device);
        "float32" yields [0,1] floats (the reference's to_tensor format)."""
        if isinstance(root_or_paths, (list, tuple)):
            self.paths = list(root_or_paths)
        else:
            self.paths = list_images(root_or_paths)
        if not self.paths:
            raise FileNotFoundError("No images found")
        self.crop_size = crop_size
        self.train = train
        self.shape_policy = shape_policy
        self.pad_multiple = pad_multiple
        self.wire_dtype = wire_dtype
        self.seed = seed
        # augmentation draws are seeded per (seed, epoch, index): deterministic
        # regardless of decode-thread scheduling, and a resumed run replays the
        # SAME hflip/crop stream as the uninterrupted run it matches
        # (Loader.__iter__/skip_epochs advance the epoch counter)
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = int(epoch)

    def __len__(self):
        return len(self.paths)

    def sample_shape(self) -> tuple[int, int, int]:
        """Static per-image shape (H, W, C) WITHOUT advancing any rng state —
        shape probes must not consume the augmentation stream."""
        if self.shape_policy == "crop":
            return (self.crop_size, self.crop_size, 3)
        img = load_image(self.paths[0])
        return _pad_to_multiple_np(img, self.pad_multiple).shape

    def __getitem__(self, idx: int) -> np.ndarray:
        # WARN-and-substitute on unreadable files (the reference's
        # warn-and-continue posture, modelseval.py:202-204): a corrupt image
        # must not kill a long training run.
        last_exc = None
        for attempt in range(4):
            try:
                img = load_image(self.paths[(idx + attempt) % len(self.paths)])
                break
            except Exception as exc:  # noqa: BLE001
                print(f"[data] WARN: failed to read "
                      f"{self.paths[(idx + attempt) % len(self.paths)]}: {exc}")
                last_exc = exc
        else:
            raise last_exc
        rng = np.random.default_rng((self.seed, self._epoch, idx))
        flip = self.train and rng.random() < 0.5
        if self.shape_policy == "crop":
            img = _crop_or_pad_np(img, self.crop_size, rng)
        if self.shape_policy == "pad":
            img = _pad_to_multiple_np(img, self.pad_multiple)
        if flip:
            img = img[:, ::-1]
        if self.wire_dtype == "uint8":
            img = (img * 255.0 + 0.5).astype(np.uint8)
        return np.ascontiguousarray(img)


class Loader:
    """Batched iterator with background thread-pool decode + prefetch."""

    def __init__(self, dataset: FolderImages, batch_size: int,
                 shuffle: bool = True, drop_last: bool = True,
                 num_workers: int = 8, prefetch: int = 2, seed: int = 0,
                 process_index: int = 0, process_count: int = 1):
        """``batch_size`` is the GLOBAL batch. On a multi-host pod pass
        (jax.process_index(), jax.process_count()): every process computes the
        same seeded shuffle, then reads only ITS batch_size/process_count
        slice of each global batch — the slice parallel.mesh.shard_batch
        assembles into the global array (SURVEY.md section 2 parallelism
        checklist, "DCN for multi-host input pipelines")."""
        if batch_size % max(1, process_count):
            raise ValueError(f"global batch_size {batch_size} must divide by "
                             f"process_count {process_count}")
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        # a partial final global batch cannot split evenly across processes;
        # with drop_last=False on a pod the tail is instead TRIMMED to a
        # process_count multiple (so validation never silently loses a whole
        # epoch's worth of images when the set is smaller than the batch)
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.process_index = process_index
        self.process_count = max(1, process_count)
        self._epoch_rng = np.random.default_rng(seed)
        self._epoch_count = 0  # epochs started; drives ds.set_epoch

    def __len__(self):
        n = len(self.ds)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def skip_epochs(self, n: int) -> None:
        """Advance the epoch-shuffle rng AND the augmentation epoch counter by
        ``n`` epochs without loading anything: a resumed run's loader replays
        the same batch-order and hflip/crop streams the preempted run saw
        (Trainer.fit calls this on restore)."""
        order = np.arange(len(self.ds))
        for _ in range(max(0, n)):
            if self.shuffle:
                self._epoch_rng.shuffle(order)
        self._epoch_count += max(0, n)

    def __iter__(self):
        # Identical seeded order on every process (the rng is seeded per
        # Loader and advanced once per epoch on all processes alike), so the
        # global batch composition is consistent across hosts.
        if hasattr(self.ds, "set_epoch"):
            self.ds.set_epoch(self._epoch_count)
        self._epoch_count += 1
        order = np.arange(len(self.ds))
        if self.shuffle:
            self._epoch_rng.shuffle(order)
        batches = []
        bs = self.batch_size
        local = bs // self.process_count
        n_full = len(order) // bs
        for i in range(0, n_full * bs, bs):
            idxs = order[i:i + bs]
            if self.process_count > 1:
                idxs = idxs[self.process_index * local:
                            (self.process_index + 1) * local]
            batches.append(idxs)
        if not self.drop_last and n_full * bs < len(order):
            tail = order[n_full * bs:]
            if self.process_count > 1:
                # trim to a process_count multiple so every host gets an
                # equal slice of the final partial global batch
                keep = (len(tail) // self.process_count) * self.process_count
                if keep < len(tail):
                    import warnings
                    warnings.warn(
                        f"multi-host loader: dropping {len(tail) - keep} "
                        f"tail image(s) that cannot split across "
                        f"{self.process_count} processes")
                tail = tail[:keep]
                per = keep // self.process_count
                tail = tail[self.process_index * per:
                            (self.process_index + 1) * per]
            if len(tail):
                batches.append(tail)

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            """q.put that re-checks `stop` so an abandoned iterator (e.g.
            trainer max_steps mid-epoch) never leaves the producer blocked
            forever on a full queue, leaking the thread + its pool."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for idxs in batches:
                    if stop.is_set():
                        break
                    imgs = list(pool.map(self.ds.__getitem__, idxs))
                    shapes = {im.shape for im in imgs}
                    if len(shapes) != 1:
                        put_or_stop(ValueError(
                            f"non-uniform image shapes in batch: {shapes}; "
                            "use shape_policy='crop' for mixed-size datasets"))
                        break
                    if not put_or_stop(np.stack(imgs, axis=0)):
                        break
            put_or_stop(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


def make_loaders(cfg):
    """Config -> (train_loader, val_loader), mirroring datasets.py:74-93.
    On a multi-host pod (jax.distributed initialized, process_count > 1) each
    process automatically loads only its slice of every global batch."""
    paths = list_images(cfg.DATA.root)
    if not paths:
        raise FileNotFoundError(f"No images found under {cfg.DATA.root}")
    train_paths, val_paths = split_paths(paths, cfg.DATA.val_fraction,
                                         cfg.DATA.seed)
    common = dict(crop_size=cfg.DATA.crop_size, shape_policy=cfg.DATA.shape_policy,
                  pad_multiple=cfg.DATA.pad_multiple,
                  wire_dtype=getattr(cfg.DATA, "wire_dtype", "uint8"))
    train_ds = FolderImages(train_paths, train=True, seed=cfg.DATA.seed,
                            **common)
    val_ds = FolderImages(val_paths, train=False, seed=cfg.DATA.seed + 1,
                          **common)
    try:  # host-only module: jax is optional here, used just for topology
        import jax
        proc = dict(process_index=jax.process_index(),
                    process_count=jax.process_count())
    except Exception:  # noqa: BLE001
        proc = dict(process_index=0, process_count=1)
    train_loader = Loader(train_ds, cfg.DATA.batch_size, shuffle=True,
                          drop_last=True, num_workers=cfg.DATA.num_workers,
                          prefetch=cfg.DATA.prefetch, seed=cfg.DATA.seed,
                          **proc)
    val_loader = Loader(val_ds, cfg.DATA.batch_size, shuffle=False,
                        drop_last=False, num_workers=cfg.DATA.num_workers,
                        prefetch=cfg.DATA.prefetch, seed=cfg.DATA.seed,
                        **proc)
    return train_loader, val_loader
