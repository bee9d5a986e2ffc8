"""Host input pipeline: decode → resize → normalize → pad → pack → prefetch.

Replaces the reference's PyTorch ``DataLoader`` + ``Blob`` path
(``/root/reference/dataloaders/visual_genome.py:377-455,691-739``,
``blob.py``): per-image PIL decode, SquarePad-to-IM_SCALE with ImageNet
normalization, random horizontal flip with box mirroring, duplicate-relation
sampling, and fixed-shape padded batch packing (native collate). Batches are
assembled by worker threads and double-buffered through a queue so the TPU
step never waits on the host (the reference's analogue is DataLoader worker
processes).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np

from sgg_tpu.constants import BOX_SCALE, IM_SCALE
from sgg_tpu.data.datasets import SGGDataset, filter_duplicate_rels
from sgg_tpu.data.graph_batch import GraphBatch, pack_ragged

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def load_image(path: str) -> np.ndarray:
    """Decode an image file to float32 RGB in [0, 1]."""
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.float32) / 255.0


def load_image_u8(path: str) -> np.ndarray:
    """Decode an image file to uint8 RGB (the native-prep fast path)."""
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.uint8)


def content_size(orig_h: int, orig_w: int, im_scale: int = IM_SCALE):
    """(content_h, content_w, scale) of the resized image inside the padded
    square canvas (visual_genome.py:377-455 resize semantics)."""
    s = im_scale / max(orig_h, orig_w)
    ch, cw = int(round(orig_h * s)), int(round(orig_w * s))
    return min(ch, im_scale), min(cw, im_scale), s


def prepare_boxes(boxes: np.ndarray, rels: np.ndarray, box_coordinates: str,
                  is_train: bool, rng: np.random.RandomState,
                  ch: int, cw: int, s: float, im_scale: int = IM_SCALE,
                  filter_duplicates: bool = True,
                  force_flip: "Optional[bool]" = None):
    """Box scale/clip/flip + duplicate-rel sampling (the non-image half of
    ``prepare_example``; shared with the feature-cache pipeline, which has
    no decoded image). RNG call order matches ``prepare_example`` exactly:
    flip draw first, then duplicate filtering."""
    boxes = boxes.astype(np.float32).copy()
    if box_coordinates == "box_scale":
        boxes *= im_scale / BOX_SCALE
    else:
        boxes *= s
    boxes[:, 0::2] = boxes[:, 0::2].clip(0, cw)
    boxes[:, 1::2] = boxes[:, 1::2].clip(0, ch)

    flipped = (is_train and rng.rand() > 0.5) if force_flip is None \
        else bool(force_flip)
    if flipped:
        x1 = cw - boxes[:, 2].copy()
        x2 = cw - boxes[:, 0].copy()
        boxes[:, 0], boxes[:, 2] = x1, x2

    if is_train and filter_duplicates and len(rels):
        rels = filter_duplicate_rels(rels, rng)
    return boxes, rels, flipped


def prepare_example(image: np.ndarray, boxes: np.ndarray, rels: np.ndarray,
                    box_coordinates: str, is_train: bool,
                    rng: np.random.RandomState, im_scale: int = IM_SCALE,
                    filter_duplicates: bool = True, uint8: bool = False,
                    force_flip: "Optional[bool]" = None):
    """One example: resize+normalize+pad image, scale+clip+flip boxes.

    Returns (padded image (S, S, 3), boxes in padded-frame pixels, rels,
    (content_h, content_w)). Box scaling follows visual_genome.py:377-455:
    stanford boxes live at BOX_SCALE along the longest side; native boxes in
    original pixels.

    With ``uint8=True`` the canvas stays raw uint8 (ImageNet-mean padding)
    and normalization happens on device — 4x less host→device traffic. A
    uint8 *input* image on that path takes the native one-pass prep
    (``sgg_tpu/native/image_prep.cpp``: triangle resize + flip + mean-padded
    canvas, no float round trips); PIL otherwise.

    ``force_flip`` pins the horizontal-flip decision (feature-cache
    extraction renders both orientations deterministically); None keeps the
    training-time random draw.
    """
    h, w = image.shape[:2]
    ch, cw, s = content_size(h, w, im_scale)
    boxes, rels, flipped = prepare_boxes(
        boxes, rels, box_coordinates, is_train, rng, ch, cw, s,
        im_scale=im_scale, filter_duplicates=filter_duplicates,
        force_flip=force_flip)

    mean_u8 = (IMAGENET_MEAN * 255).astype(np.uint8)
    canvas = None
    if uint8 and image.dtype == np.uint8:
        from sgg_tpu import native
        canvas = native.prepare_image_u8(image, im_scale, ch, cw, flipped,
                                         mean_u8)
    if canvas is None:
        # PIL path: equivalent semantics (triangle/antialiased bilinear)
        from PIL import Image
        if image.dtype == np.uint8:
            pil = Image.fromarray(image)
        else:
            pil = Image.fromarray((image * 255).astype(np.uint8))
        img = np.asarray(pil.resize((cw, ch), Image.BILINEAR), np.float32)
        img /= 255.0
        if flipped:
            img = img[:, ::-1]
        if uint8:
            canvas = np.empty((im_scale, im_scale, 3), np.uint8)
            canvas[:] = mean_u8
            canvas[:ch, :cw] = np.round(img * 255).astype(np.uint8)
        else:
            img = (img - IMAGENET_MEAN) / IMAGENET_STD
            canvas = np.zeros((im_scale, im_scale, 3), np.float32)
            canvas[:ch, :cw] = img

    return canvas, boxes, rels, (ch, cw)


def device_prefetch(iterator, size: int = 2, sharding=None):
    """Overlap host→device transfer with compute: eagerly ``device_put`` the
    next ``size`` batches while the current one executes (the jax analogue
    of the reference's CUDA-stream prefetch in the DataLoader workers).
    ``sharding``: optional jax sharding for the leading (batch) axis —
    data-parallel placement happens right at the transfer."""
    import collections

    import jax
    import jax.numpy as jnp

    def place(x):
        if x is None:
            return None
        if isinstance(x, jax.Array):
            # already placed upstream (e.g. a process-spanning global
            # batch from distributed.global_batch) — don't re-transfer
            return x
        if sharding is not None:
            return jax.device_put(x, sharding)
        return jnp.asarray(x)

    buf = collections.deque()
    for item in iterator:
        buf.append(jax.tree_util.tree_map(place, item))
        if len(buf) > size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def to_image_dtype(batch: GraphBatch, dtype: str) -> GraphBatch:
    """Cast images for transfer (bf16 halves the H2D volume; the model
    casts to its compute dtype anyway)."""
    if batch.images is None or dtype == "float32" or \
            batch.images.dtype == np.uint8:
        return batch
    import ml_dtypes
    import dataclasses
    images = np.asarray(batch.images).astype(ml_dtypes.bfloat16)
    return dataclasses.replace(batch, images=images)


def load_source_image(dataset, idx: int, image_format: str,
                      with_images: bool = True) -> np.ndarray:
    """The raw image a dataset example comes from — decoded file when the
    dataset has filenames (and the run wants images), else a blank canvas
    spanning the boxes' extent (file-less synthetic/test datasets, or
    ``with_images=False`` feature-level runs). Shared by ``BatchLoader``
    and the feature-cache extractor so both see identical pixels."""
    import os
    if with_images and dataset.filenames:
        path = os.path.join(dataset.images_dir, dataset.filenames[idx])
        return (load_image_u8(path) if image_format == "uint8"
                else load_image(path))
    ext = max(float(dataset.gt_boxes[idx].max()), 1.0)
    return np.zeros((int(ext), int(ext), 3), np.float32)


class BatchLoader:
    """Iterable over padded GraphBatches with threaded decode + prefetch."""

    def __init__(self, dataset: SGGDataset, batch_size: int, max_nodes: int,
                 max_edges: int, shuffle: Optional[bool] = None,
                 drop_last: Optional[bool] = None, num_workers: int = 4,
                 prefetch: int = 2, seed: int = 0,
                 with_images: bool = True, im_scale: int = IM_SCALE,
                 buckets=None, image_format: str = "float32",
                 feature_cache=None, shard=None,
                 cache_orientations: Optional[int] = None):
        """``buckets``: optional ascending list of (max_nodes, max_edges)
        shape buckets. Images are grouped into the smallest bucket whose
        node capacity fits them, so small graphs stop paying the global
        padding cost (one compiled step per bucket shape). None = a single
        global (max_nodes, max_edges) shape.

        ``shard``: optional ``(process_index, process_count)`` for
        multi-host runs — every process computes the SAME shuffled batch
        order (same seed/epoch) but loads only its contiguous
        ``batch_size / process_count`` slice of each batch; the Trainer
        assembles the global batch via ``parallel.distributed.global_batch``.
        Example-level randomness (flips) is keyed on (seed, epoch, image
        index), so the sharded global batch is bit-identical to the
        single-process one."""
        self.ds = dataset
        self.batch_size = batch_size
        self.max_nodes = max_nodes
        self.max_edges = max_edges
        self.buckets = sorted(buckets) if buckets else None
        # train loader shuffles and drops last (visual_genome.py:720-739)
        self.shuffle = dataset.is_train if shuffle is None else shuffle
        self.drop_last = dataset.is_train if drop_last is None else drop_last
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.seed = seed
        self.with_images = with_images
        self.im_scale = im_scale
        # 'float32' = normalized on host; 'uint8' = raw bytes, normalized
        # on device (4x less H2D traffic)
        assert image_format in ("float32", "uint8"), image_format
        self.image_format = image_format
        # Frozen-trunk feature cache (data/feature_cache.py): batches carry
        # precomputed trunk fmaps instead of images — the trunk never runs.
        self.feature_cache = None
        if feature_cache is not None:
            from sgg_tpu.data.feature_cache import FeatureCache
            self.feature_cache = (feature_cache
                                  if isinstance(feature_cache, FeatureCache)
                                  else FeatureCache(feature_cache))
            assert self.feature_cache.num_images == len(dataset), (
                "feature cache / dataset size mismatch: "
                f"{self.feature_cache.num_images} vs {len(dataset)}")
            assert self.feature_cache.im_scale == im_scale
            assert self.feature_cache.complete(), (
                f"feature cache {self.feature_cache.path} is incomplete "
                f"— re-run extraction")
        # Flip pinning is CONFIG-driven, not disk-driven: a run configured
        # with cache_orientations=1 trains flip-free even when a
        # 2-orientation cache happens to exist on disk (the trainer accepts
        # such a cache as a storage superset) — otherwise augmentation
        # behavior, and hence reproducibility, would depend on disk state.
        # None (direct BatchLoader users) defers to the cache file itself.
        self.cache_orientations = cache_orientations
        if shard is not None:
            pid, n_proc = shard
            assert 0 <= pid < n_proc, shard
            assert batch_size % n_proc == 0, (
                f"batch_size {batch_size} not divisible across "
                f"{n_proc} processes")
        self.shard = shard
        self._epoch = 0

    def __len__(self):
        n = len(self.ds)
        return n // self.batch_size if self.drop_last else \
            -(-n // self.batch_size)

    def _make_example(self, idx: int, rng: np.random.RandomState):
        if self.feature_cache is not None:
            return self._make_example_cached(idx, rng)
        if self.with_images and self.ds.filenames:
            img = load_source_image(self.ds, idx, self.image_format)
        else:
            # feature-level / test operation: synthesize a blank canvas with
            # the boxes' extent as the "image"
            ext = max(float(self.ds.gt_boxes[idx].max()), 1.0)
            img = np.zeros((int(ext), int(ext), 3), np.float32)
        # model-frame -> original-pixel factor (for artifact export; the
        # reference keeps rm_box_priors_org, rel_model_base.py:237-240)
        scale_org = max(img.shape[:2]) / self.im_scale
        return prepare_example(
            img, self.ds.gt_boxes[idx], self.ds.relationships[idx],
            self.ds.box_coordinates, self.ds.is_train, rng,
            im_scale=self.im_scale,
            filter_duplicates=self.ds.filter_duplicates,
            uint8=self.image_format == "uint8") + (scale_org,)

    def _make_example_cached(self, idx: int, rng: np.random.RandomState):
        """Feature-cache path: identical box/rel/flip semantics, but the
        "pixels" are the stored trunk feature map of the drawn
        orientation."""
        oh, ow = self.feature_cache.orig_hw(idx)
        ch, cw, s = content_size(oh, ow, self.im_scale)
        # single-orientation operation (config.cache_orientations=1, or a
        # cache file that only stores the unflipped fmap): pin the draw —
        # flip augmentation off for this run, by explicit opt-in. The
        # config value wins over the file so a 2-orientation cache on disk
        # can't silently re-enable flips for a 1-orientation run.
        n_eff = min(self.feature_cache.n_orient,
                    self.cache_orientations
                    if self.cache_orientations is not None
                    else self.feature_cache.n_orient)
        force = False if (self.ds.is_train and n_eff == 1) else None
        boxes, rels, flipped = prepare_boxes(
            self.ds.gt_boxes[idx], self.ds.relationships[idx],
            self.ds.box_coordinates, self.ds.is_train, rng, ch, cw, s,
            im_scale=self.im_scale,
            filter_duplicates=self.ds.filter_duplicates,
            force_flip=force)
        fmap = self.feature_cache.read(idx, flipped)
        scale_org = max(oh, ow) / self.im_scale
        return fmap, boxes, rels, (ch, cw), scale_org

    def _example_rng(self, epoch: int, idx: int) -> np.random.RandomState:
        """Per-example RNG keyed on (seed, epoch, image index).

        One RandomState per example (not one shared stream): RandomState is
        not thread-safe under the decode pool, and keying on the index makes
        flip draws identical whether a batch is assembled by one process or
        sliced across hosts (``shard``)."""
        ss = np.random.SeedSequence([self.seed, epoch, idx])
        return np.random.RandomState(ss.generate_state(4))

    def _assemble(self, indices, epoch, max_nodes=None,
                  max_edges=None) -> GraphBatch:
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            examples = list(pool.map(
                lambda i: self._make_example(i, self._example_rng(epoch, i)),
                indices))
        stacked = np.stack([e[0] for e in examples])
        cached = self.feature_cache is not None
        im_hw = np.asarray([e[3] for e in examples], np.float32)
        batch = pack_ragged(
            [e[1] for e in examples],
            [self.ds.gt_classes[i] for i in indices],
            [e[2] for e in examples],
            max_nodes=max_nodes or self.max_nodes,
            max_edges=max_edges or self.max_edges,
            images=None if cached else stacked, im_hw=im_hw,
            im_scale_org=np.asarray([e[4] for e in examples], np.float32))
        if cached:
            import dataclasses
            batch = dataclasses.replace(batch, fmaps=stacked)
        return batch

    def _bucket_for(self, idx: int):
        n = len(self.ds.gt_classes[idx])
        for b in self.buckets:
            if n <= b[0]:
                return b
        return self.buckets[-1]

    def _bucketed_chunks(self, order):
        """Group indices into per-bucket fixed-size chunks (stream order)."""
        queues = {b: [] for b in self.buckets}
        for idx in order:
            b = self._bucket_for(idx)
            queues[b].append(idx)
            if len(queues[b]) == self.batch_size:
                yield b, queues[b]
                queues[b] = []
        if not self.drop_last:
            for b, q in queues.items():
                if q:
                    yield b, q

    def __iter__(self) -> Iterator[GraphBatch]:
        order = np.arange(len(self.ds))
        epoch = self._epoch
        rng = np.random.RandomState(self.seed + epoch)
        self._epoch += 1
        if self.shuffle:
            rng.shuffle(order)
        n = len(self.ds)
        if self.buckets:
            chunks = list(self._bucketed_chunks(order))
        else:
            ends = range(self.batch_size, n + 1, self.batch_size) \
                if self.drop_last else range(self.batch_size,
                                             n + self.batch_size,
                                             self.batch_size)
            chunks = [(None, order[max(0, e - self.batch_size):min(e, n)])
                      for e in ends]
        if self.shard is not None:
            # every process computed the same `chunks`; keep only this
            # host's contiguous slice of each one (matching the data-axis
            # shard layout of parallel.distributed.global_batch)
            pid, n_proc = self.shard
            sliced = []
            for bucket, chunk in chunks:
                if len(chunk) % n_proc:
                    # wrap-pad the tail batch to a process multiple (torch
                    # DistributedSampler semantics: a few images repeat
                    # rather than the pod crashing / idling on the tail).
                    # np.resize repeats cyclically, so this is correct even
                    # when the pad exceeds the chunk (a 1-image tail on a
                    # 4-process pod needs 3 repeats of that one image).
                    pad = n_proc - len(chunk) % n_proc
                    chunk = np.resize(np.asarray(chunk), len(chunk) + pad)
                per = len(chunk) // n_proc
                sliced.append((bucket, chunk[pid * per:(pid + 1) * per]))
            chunks = sliced

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            # a producer failure must surface in the consumer, not silently
            # end the epoch (an AttributeError here once made val_epoch
            # evaluate zero images while reporting success)
            try:
                for bucket, chunk in chunks:
                    if stop.is_set():
                        return
                    if bucket is None:
                        q.put(self._assemble(chunk, epoch))
                    else:
                        q.put(self._assemble(chunk, epoch,
                                             max_nodes=bucket[0],
                                             max_edges=bucket[1]))
                q.put(None)
            except BaseException as e:  # noqa: BLE001
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
