"""Host-side datasets and input pipeline.

Mirrors the reference's three dataset layouts (reference utils/data.py:52-125):

  * ArtificialTrainValDataset — ``*_L.*`` (gt) / ``*_R.*`` (reference) pairs;
    random same-location crops; horizontal flip swaps the views (a flipped
    right view is a left view), vertical flip keeps them (reference :75-80);
    ``image_repeats`` virtual-epoch expansion (:63).
  * ArtificialTestDataset — full-size pairs x the 31-distortion grid (:87-106).
  * RealWorldTestDataset — ``*/*_L.* *_LD.* *_R.*`` triplets (:109-125).

Division of labour (TPU-first): the host decodes PNGs, crops and flips
(cheap, random-access); photometric distortion synthesis runs on-device
(data/distortions.py). Training batches are therefore {gt, reference} uint8
and the device step derives the distorted target — removing the reference's
32-worker CPU bottleneck (reference configs/dcmcs3di.yaml:15).

A thread-pool ``Loader`` overlaps decode with device compute.
"""

import threading
import queue
import warnings
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

from color_transfer_tpu.data import native_loader


def _read_image(path):
    """Native C++ decode (GIL-free) with transparent PIL fallback."""
    return native_loader.read_image(path)


class ArtificialTrainValDataset:
    def __init__(self, image_dir, crop_size, image_repeats=1, seed=0):
        image_dir = Path(image_dir)
        self.gts = sorted(image_dir.glob("*_L.*"))
        self.references = sorted(image_dir.glob("*_R.*"))
        assert len(self.gts) == len(self.references), (
            f"unpaired stereo images in {image_dir}"
        )
        assert self.gts, f"no *_L.* images in {image_dir}"
        self.crop_size = tuple(crop_size)
        self.image_repeats = image_repeats
        self.seed = seed
        self._epoch = 0
        self._info_cache = {}

    def __len__(self):
        return len(self.gts) * self.image_repeats

    def set_epoch(self, epoch):
        """Advance the augmentation stream; called by the Loader each epoch."""
        self._epoch = int(epoch)

    def __getitem__(self, index):
        # Deterministic per-(seed, epoch, item) stream — NOT Python hash(),
        # which is salted per process and would break `seed_everything`
        # reproducibility (reference configs/dcmcs3di.yaml:1).
        rng = np.random.default_rng(
            np.random.SeedSequence(entropy=(self.seed, self._epoch, index))
        )
        return self.sample(index, rng)

    def _image_hw(self, path):
        if path not in self._info_cache:
            if native_loader.available():
                self._info_cache[path] = native_loader.image_info(path)
            else:
                self._info_cache[path] = _read_image(path).shape[:2]
        return self._info_cache[path]

    def sample(self, index, rng):
        gt_path = self.gts[index // self.image_repeats]
        ref_path = self.references[index // self.image_repeats]

        ch, cw = self.crop_size
        h, w = self._image_hw(gt_path)
        if h < ch or w < cw:
            raise ValueError(
                f"image {gt_path} is {h}x{w}, smaller than crop {ch}x{cw}"
            )
        # Inclusive upper bound: an image exactly crop-sized must not crash,
        # and the bottom/right-most position must be reachable (torchvision
        # RandomCrop semantics).
        top = int(rng.integers(0, h - ch + 1))
        left = int(rng.integers(0, w - cw + 1))
        # Cropped decode: PNG inflation stops at row top+ch.
        gt = native_loader.read_image_crop(gt_path, top, left, ch, cw)
        reference = native_loader.read_image_crop(ref_path, top, left, ch, cw)

        if rng.random() > 0.5:
            # Horizontal flip turns a left view into a right view — swap.
            gt, reference = reference[:, ::-1], gt[:, ::-1]
        if rng.random() > 0.5:
            gt, reference = gt[::-1], reference[::-1]

        return {"gt": np.ascontiguousarray(gt), "reference": np.ascontiguousarray(reference)}


class ArtificialTestDataset:
    """Full-size pairs; the caller crosses them with the 31-distortion grid
    (distortion index = item % 31 like the reference's indexing scheme)."""

    def __init__(self, image_dir, num_distortions=31):
        image_dir = Path(image_dir)
        self.gts = sorted(image_dir.glob("*_L.*"))
        self.references = sorted(image_dir.glob("*_R.*"))
        assert len(self.gts) == len(self.references)
        self.num_distortions = num_distortions

    def __len__(self):
        return len(self.gts) * self.num_distortions

    def __getitem__(self, index):
        gt = _read_image(self.gts[index // self.num_distortions])
        reference = _read_image(self.references[index // self.num_distortions])
        return {
            "gt": gt,
            "reference": reference,
            "distortion_idx": index % self.num_distortions,
        }


class RealWorldTestDataset:
    def __init__(self, image_dir):
        image_dir = Path(image_dir)
        self.gts = sorted(image_dir.glob("*/*_L.*"))
        self.targets = sorted(image_dir.glob("*/*_LD.*"))
        self.references = sorted(image_dir.glob("*/*_R.*"))
        assert len(self.gts) == len(self.targets) == len(self.references)

    def __len__(self):
        return len(self.gts)

    def __getitem__(self, index):
        return {
            "gt": _read_image(self.gts[index]),
            "target": _read_image(self.targets[index]),
            "reference": _read_image(self.references[index]),
        }


def _collate(items):
    out = {}
    for key in items[0]:
        vals = [item[key] for item in items]
        out[key] = np.stack(vals) if isinstance(vals[0], np.ndarray) else np.asarray(vals)
    return out


class Loader:
    """Threaded prefetching batch loader (host-side half of the pipeline)."""

    def __init__(self, dataset, batch_size=1, shuffle=False, num_threads=8,
                 seed=0, drop_last=False, prefetch=4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_threads = num_threads
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def first_batch(self):
        """One batch, synchronously: no producer thread and no epoch bump.

        Use this for shape probes and image panels — ``next(iter(loader))``
        would abandon the producer thread blocked on its queue (leaking the
        thread pool and prefetched batches) and advance the epoch counter,
        perturbing the seeded shuffle stream."""
        if len(self.dataset) == 0:
            raise ValueError(
                "cannot probe an empty dataset (no items matched the data "
                "glob — check data_dir)"
            )
        idxs = range(min(self.batch_size, len(self.dataset)))
        return _collate([self.dataset[i] for i in idxs])

    def __iter__(self):
        rng = np.random.default_rng(self.seed + self._epoch)
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(self._epoch)
        self._epoch += 1
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng.shuffle(order)

        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        q = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()

        def put(item):
            # Responsive put: notice consumer shutdown instead of blocking
            # forever on a full queue (early break / consumer crash).
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                with ThreadPoolExecutor(self.num_threads) as pool:
                    for idxs in batches:
                        if stop.is_set():
                            return
                        items = list(pool.map(self.dataset.__getitem__, idxs))
                        if not put(_collate(items)):
                            return
            except BaseException as exc:  # noqa: BLE001
                # Propagate decode/dataset errors to the consumer — a dead
                # producer with no sentinel would deadlock q.get() silently.
                put(exc)
                return
            put(sentinel)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            thread.join(timeout=10.0)
            if thread.is_alive():
                warnings.warn(
                    "Loader producer thread did not exit within 10 s (a "
                    "dataset item is likely hung in decode); its worker "
                    "pool leaks until process exit",
                    RuntimeWarning,
                    stacklevel=2,
                )
