"""Training driver: the end-to-end program tying data → model → train → eval.

Rebuild of the reference's script-level trainer (``/root/reference/main.py``):
dataset/split assembly, model construction, checkpoint resume, the epoch loop
with interval loss averaging and s/batch reporting (``main.py:196-236``),
per-epoch checkpointing (``main.py:249-254``), per-epoch validation and the
final test sweep over all eval splits (``main.py:256-288``).

TPU-native shape: a ``Trainer`` class over jitted steps and the threaded
input pipeline instead of module-level script code; device work is one fused
step per batch.
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sgg_tpu.config import Config
from sgg_tpu.data.datasets import SGGDataset
from sgg_tpu.data.pipeline import BatchLoader
from sgg_tpu.eval.driver import val_epoch
from sgg_tpu.models.frequency_bias import (count_matrices,
                                           log_predicate_distribution)
from sgg_tpu.models.relhead import RelModelIMP
from sgg_tpu.train import checkpoint as ckpt
from sgg_tpu.train.assign import sample_edges
from sgg_tpu.train.state import TrainState, create_train_state
from sgg_tpu.train.step import make_eval_step, make_train_step


def build_model(config: Config, train_data: SGGDataset) -> RelModelIMP:
    """Flagship IMP model from config + dataset vocab (main.py:54-60)."""
    freq_table = None
    if config.use_bias:
        fg, bg = count_matrices(train_data.gt_boxes, train_data.gt_classes,
                                train_data.relationships,
                                train_data.num_classes,
                                train_data.num_predicates, must_overlap=True)
        freq_table = log_predicate_distribution(fg, bg)
    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else \
        jnp.float32
    # resnet50: 1024-d box head, relation features from the last pyramid
    # level (rel_model_base.py:59,239)
    obj_dim = 1024 if config.backbone == "resnet50" else 4096
    return RelModelIMP(
        num_classes=train_data.num_classes,
        num_predicates=train_data.num_predicates,
        mode=config.mode, use_bias=config.use_bias,
        test_bias=config.test_bias, obj_dim=obj_dim,
        backbone=config.backbone, edge_model=config.edge_model,
        dtype=dtype, freq_table=freq_table)


class Trainer:
    """Owns model, state, steps, and the epoch/val/test loops."""

    def __init__(self, config: Config, splits: Dict[str, SGGDataset],
                 model: Optional[RelModelIMP] = None,
                 gan_model=None, detector=None, det_variables=None,
                 with_images: bool = True, log_fn=None):
        self.config = config
        self.splits = splits
        self.train_data = splits["train"]
        self.with_images = with_images
        self.log_fn = log_fn or (lambda d, **kw: None)
        self.model = model if model is not None else build_model(
            config, self.train_data)
        self.detector = detector
        self.det_variables = det_variables
        if config.mode == "sgdet":
            # sgdet trains the relation head on frozen detections
            # (main.py:62-63; rel_model_stanford.py:136-140)
            assert detector is not None and det_variables is not None, (
                "sgdet training needs a (pretrained) detector — pass "
                "detector/det_variables (see pretrain_detector.py)")

        # data-parallel mesh over the available devices (the reference
        # asserts a single GPU, config.py:71; we shard the batch axis)
        self.mesh = None
        n_dev = config.num_devices or len(jax.devices())
        if n_dev > 1 and len(jax.devices()) >= n_dev \
                and config.batch_size % n_dev == 0:
            from sgg_tpu.parallel import make_mesh
            self.mesh = make_mesh(n_dev, axis_name=config.dp_axis)
        self.multihost = False
        if self.mesh is not None:
            from sgg_tpu.parallel.mesh import is_multiprocess
            self.multihost = is_multiprocess(self.mesh)
        if config.mode != "sgdet" and config.max_edges < config.rels_per_img:
            # the padded edge bucket bounds the per-image relation budget
            # shape-wise; only images with more candidate pairs than the
            # bucket are affected (reference budget: rels_per_img)
            print(f"[trainer] edge budget = min(max_edges "
                  f"{config.max_edges}, rels_per_img "
                  f"{config.rels_per_img}) — raise -max_edges for full "
                  f"budget parity on graphs with > {config.max_edges} "
                  f"candidate pairs")
        self.steps_per_epoch = max(
            len(self.train_data) // config.batch_size, 1)
        self.state = self._init_state()
        if self.mesh is not None:
            from sgg_tpu.parallel import replicate
            self.state = replicate(self.state, self.mesh)
        if config.mode == "sgdet":
            from sgg_tpu.models.sgdet import make_sgdet_train_step
            self.train_step = make_sgdet_train_step(
                self.detector, self.model, config, self.det_variables)
        else:
            self.train_step = make_train_step(self.model, config)
        self.start_epoch = 0
        self.global_iter = 0

        self.gan = None
        self.gan_state = None
        self.perturber = None
        self.feature_bank = None
        self._feature_caches = {}
        if config.gan:
            self._init_gan(gan_model)

        if config.save_dir:
            os.makedirs(config.save_dir, exist_ok=True)
            self._restore()

    # ------------------------------------------------------------------
    def _init_gan(self, gan_model):
        """GAN assembly (reference main.py:65-76, sgp at :131)."""
        from sgg_tpu.constants import IM_SCALE, STRIDE
        from sgg_tpu.models.gan import GANModel
        from sgg_tpu.train.gan_step import (create_gan_state,
                                            make_gan_train_step)

        cfg = self.config
        td = self.train_data
        if gan_model is None:
            emb_o = emb_r = None
            if cfg.init_embed:
                from sgg_tpu.data.word_vectors import \
                    normalized_class_embeddings
                emb_o = normalized_class_embeddings(td.ind_to_classes,
                                                    wv_dir=cfg.data)
                emb_r = normalized_class_embeddings(td.ind_to_predicates,
                                                    wv_dir=cfg.data)
            gan_model = GANModel(
                num_classes=td.num_classes,
                num_predicates=td.num_predicates,
                fmap_sz=IM_SCALE // STRIDE,
                vis_cond=cfg.vis_cond is not None, largeD=cfg.largeD,
                init_embed_objs=emb_o, init_embed_rels=emb_r)
        self.gan = gan_model

        loader = BatchLoader(td, batch_size=min(cfg.batch_size,
                                                max(len(td), 1)),
                             max_nodes=cfg.max_nodes,
                             max_edges=cfg.max_edges,
                             with_images=self.with_images, shuffle=False)
        batch = next(iter(loader))
        # padded-canvas frame, matching the gan_step layout normalization
        canvas = (max(batch.images.shape[1], batch.images.shape[2])
                  if batch.images is not None else IM_SCALE)
        boxes01 = batch.boxes / canvas
        vis = None
        if cfg.vis_cond is not None:
            from sgg_tpu.augment.feature_bank import FeatureBank
            self.feature_bank = FeatureBank(cfg.vis_cond, td.ind_to_classes,
                                            pool_sz=self.gan.pool_sz,
                                            n_ch=self.gan.n_ch,
                                            seed=cfg.seed)
            vis = jnp.asarray(self.feature_bank.sample(
                np.asarray(batch.classes), np.asarray(batch.node_mask)))
        gan_vars = self.gan.init(
            jax.random.key(cfg.seed + 1), batch.classes, boxes01,
            batch.rels, batch.node_mask, batch.rel_mask,
            vis_features=vis, train=False, method=self.gan.init_all)
        self.gan_state = create_gan_state(cfg, self.state, gan_vars)
        if self.mesh is not None:
            self._replicate_gan_state()
        self.gan_step = make_gan_train_step(self.model, self.gan, cfg)

        if cfg.perturb:
            from sgg_tpu.augment.perturb import SceneGraphPerturb
            from sgg_tpu.data.word_vectors import \
                normalized_class_embeddings
            emb = normalized_class_embeddings(td.ind_to_classes,
                                              wv_dir=cfg.data)
            self.perturber = SceneGraphPerturb(
                cfg.perturb, emb, td.subj_pred_pairs, td.pred_obj_pairs,
                L=cfg.L, topk=cfg.topk, alpha=cfg.graphn_a,
                uniform=cfg.uniform,
                degree_smoothing=cfg.degree_smoothing, seed=cfg.seed)

    # ------------------------------------------------------------------
    def _replicate_gan_state(self) -> None:
        """Mesh-replicate the GAN leaves (the embedded ``sgg`` TrainState is
        already replicated by __init__/_restore and must NOT pass through
        ``replicate`` again — its process-spanning arrays are not
        addressable as host numpy)."""
        from sgg_tpu.parallel import replicate
        s = self.gan_state
        self.gan_state = s.replace(
            sgg=self.state,
            gan_params=replicate(s.gan_params, self.mesh),
            gan_stats=replicate(s.gan_stats, self.mesh),
            g_opt_state=replicate(s.g_opt_state, self.mesh),
            d_opt_state=replicate(s.d_opt_state, self.mesh))

    # ------------------------------------------------------------------
    def _payload(self, epoch: int):
        payload = {
            "step": self.state.step,
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "epoch": np.asarray(epoch),
        }
        if self.gan_state is not None:
            payload["gan"] = {
                "params": self.gan_state.gan_params,
                "stats": self.gan_state.gan_stats,
                "g_opt": self.gan_state.g_opt_state,
                "d_opt": self.gan_state.d_opt_state,
            }
        return payload

    def _save(self, epoch: int):
        if self.gan_state is not None:
            self.state = self.gan_state.sgg
        ckpt.save_payload(self.config.save_dir, self._payload(epoch), epoch)

    def _restore(self):
        # optimistic (reference optimistic_restore semantics): tolerate
        # checkpoints whose tree differs from this run's state — the GQA
        # SGGen workflow resumes an sgcls checkpoint from an sgdet-mode
        # program (reference README.md:239-243), and cross-device restores
        # (detector pretrained on the chip, consumed by a CPU run)
        restored, last, on_disk, stats = ckpt.optimistic_restore_payload(
            self.config.save_dir, self._payload(0))
        if last < 0:
            return
        # This is the run's OWN save_dir (auto-resume), so the on-disk tree
        # normally matches the template exactly and the merge is equivalent
        # to a strict StandardRestore. A partial match here usually means
        # config drift (e.g. a changed hidden_dim) — resuming part
        # random-init at a saved epoch would silently corrupt the run, so
        # be loud about exactly which leaves kept their init values.
        if stats["missing"] or stats["unused"]:
            print(f"[resume] WARNING: checkpoint epoch {last} in "
                  f"{self.config.save_dir} only partially matches this "
                  f"run's state tree — {len(stats['missing'])} leaves kept "
                  f"their fresh-init values "
                  f"(first: {stats['missing'][:5]}), "
                  f"{len(stats['unused'])} on-disk leaves had no home "
                  f"(first: {stats['unused'][:5]}). Expected only for "
                  f"deliberate cross-mode resumes.")
        self.state = self.state.replace(
            step=restored["step"], params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"])
        if self.mesh is not None:
            # the merged leaves are host-local numpy; re-establish the
            # replicated sharding that __init__ set up (required on
            # process-spanning meshes, where host-local arrays cannot feed
            # a pjit-sharded step)
            from sgg_tpu.parallel import replicate
            self.state = replicate(self.state, self.mesh)
        if self.gan_state is not None and "gan" in on_disk:
            g = restored["gan"]
            self.gan_state = self.gan_state.replace(
                sgg=self.state, gan_params=g["params"], gan_stats=g["stats"],
                g_opt_state=g["g_opt"], d_opt_state=g["d_opt"])
            if self.mesh is not None:
                self._replicate_gan_state()
        self.start_epoch = last + 1
        self.global_iter = int(self.state.step)
        print(f"resumed from epoch {last}")

    def _init_state(self) -> TrainState:
        cfg = self.config
        loader = BatchLoader(self.train_data, batch_size=min(
            cfg.batch_size, max(len(self.train_data), 1)),
            max_nodes=cfg.max_nodes, max_edges=cfg.max_edges,
            with_images=self.with_images, shuffle=False)
        batch = next(iter(loader))
        if cfg.mode == "sgdet":
            from sgg_tpu.models.sgdet import detection_pairs
            det = self.detector.apply(self.det_variables, batch.images,
                                      batch.im_hw, train=False)
            pairs, pm = detection_pairs(det["boxes"], det["mask"], True)
            variables = self.model.init(
                jax.random.key(cfg.seed), None, det["boxes"],
                det["labels"], pairs, pm, fmap=det["fmap"], train=False,
                mode="sgdet")
        else:
            sampled, pm = sample_edges(jax.random.key(0), batch.rels,
                                       batch.rel_mask, batch.node_mask,
                                       max_out=cfg.max_edges)
            variables = self.model.init(
                jax.random.key(cfg.seed), batch.images, batch.boxes,
                batch.classes, sampled[..., :2], pm, train=False)
        # the MultiStep LR schedule counts OPTIMIZER UPDATES; under -gan
        # with 'rec' the SGG optimizer steps twice per batch (F phase +
        # reconstruction, reference main.py:116-120,173-176 — its epoch-
        # counting MultiStepLR is unaffected, so the boundaries here must
        # scale by updates/batch to decay at the same epochs)
        upd_per_batch = 2 if (self.config.gan
                              and "rec" in self.config.ganlosses) else 1
        return create_train_state(
            self.config, variables,
            steps_per_epoch=self.steps_per_epoch * upd_per_batch)

    @property
    def variables(self):
        return {"params": self.state.params,
                "batch_stats": self.state.batch_stats}

    # ------------------------------------------------------------------
    def _feature_cache_for(self, split_name: str, dataset):
        """Frozen-trunk feature cache for one split (config.feature_cache).

        Extracts on first use (one trunk pass per image x orientation);
        re-extracts if the stored trunk fingerprint doesn't match the
        current (possibly checkpoint-restored) trunk weights. See
        data/feature_cache.py — no reference analogue; this is the
        TPU-native answer to the reference recomputing the frozen VGG
        forward for every one of 57k images x 20 epochs."""
        cfg = self.config
        if not cfg.feature_cache or len(dataset) == 0:
            return None
        if cfg.mode == "sgdet" and split_name.startswith("val_"):
            # val_epoch skips the sgdet evaluator for val_ splits
            # (eval/driver.py; reference lib/eval.py:34-35) — don't spend
            # an extraction pass on a cache nothing reads
            return None
        cache = self._feature_caches.get(split_name)
        if cache is not None:
            return cache
        from sgg_tpu.data.feature_cache import (FeatureCache,
                                                extract_trunk_cache,
                                                params_fingerprint,
                                                split_cache_path)
        path = split_cache_path(cfg.feature_cache, split_name)
        if cfg.mode == "sgdet":
            # sgdet: the trunk lives inside the frozen detector variables
            # (the rel model is initialized fmap-first, without a trunk)
            src_params = self.det_variables["params"]["trunk"]
            src_bs = (self.det_variables.get("batch_stats")
                      or {}).get("trunk")
        else:
            src_params = self.state.params["trunk"]
            src_bs = (self.state.batch_stats or {}).get("trunk")
        fp_tree = {"params": src_params}
        if src_bs is not None:  # resnet50 BN statistics shape the output
            fp_tree["batch_stats"] = src_bs
        fp = params_fingerprint(jax.tree_util.tree_map(np.asarray, fp_tree))
        # storage budget: train splits store cfg.cache_orientations (1 =
        # half the disk, flip augmentation off); eval splits never flip.
        # An existing cache with MORE orientations is a valid superset.
        want_orient = (cfg.cache_orientations if dataset.is_train else 1)
        if os.path.exists(path):
            try:
                cache = FeatureCache(path)
                if cache.complete() and cache.fingerprint == fp \
                        and cache.n_orient >= want_orient:
                    self._feature_caches[split_name] = cache
                    return cache
                print(f"[feature_cache] {path} stale "
                      f"(incomplete or trunk weights changed) — "
                      f"re-extracting")
                cache.close()
            except Exception as e:  # corrupt/old-version file
                print(f"[feature_cache] {path} unreadable ({e}) — "
                      f"re-extracting")
        if jax.process_count() > 1 and jax.process_index() != 0:
            # multi-host: only process 0 extracts (the cache dir is
            # shared); the rest poll for completion
            deadline = time.time() + 3600
            while time.time() < deadline:
                try:
                    cache = FeatureCache(path)
                    if cache.complete() and cache.fingerprint == fp \
                            and cache.n_orient >= want_orient:
                        self._feature_caches[split_name] = cache
                        return cache
                    cache.close()
                except Exception:
                    pass
                time.sleep(5.0)
            raise TimeoutError(
                f"process {jax.process_index()}: feature cache {path} "
                f"not produced by process 0 within 1h")
        import jax.numpy as jnp
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" \
            else jnp.float32
        tvars = {"params": jax.tree_util.tree_map(np.asarray, src_params)}
        if cfg.backbone == "resnet50":
            # the relation head pools from the stride-64 FPN 'pool' level
            # only (reference rel_model_base.py:239) — cache exactly that
            from sgg_tpu.models.resnet import ResNet50FPN
            trunk = ResNet50FPN(dtype=dtype)
            if src_bs is not None:
                tvars["batch_stats"] = jax.tree_util.tree_map(np.asarray,
                                                              src_bs)
            trunk_fn = jax.jit(
                lambda x: trunk.apply(tvars, x, train=False)["pool"])
            stride = 64
        else:
            from sgg_tpu.models.backbone import VGG16Trunk
            trunk = VGG16Trunk(dtype=dtype)
            trunk_fn = jax.jit(lambda x: trunk.apply(tvars, x))
            stride = 16
        t0 = time.time()
        extract_trunk_cache(
            path, dataset, trunk_fn, stride=stride,
            batch_size=min(8, max(len(dataset), 1)),
            image_format=cfg.image_format, fingerprint=fp,
            with_images=self.with_images, n_orient=want_orient)
        print(f"[feature_cache] extracted {split_name} "
              f"({len(dataset)} images) in {time.time() - t0:.1f}s")
        cache = FeatureCache(path)
        self._feature_caches[split_name] = cache
        return cache

    # ------------------------------------------------------------------
    def train_epoch(self, epoch: int) -> Dict[str, float]:
        """One epoch (reference train_epoch, main.py:196-236)."""
        cfg = self.config
        # multi-host: each process decodes only its slice of every batch
        # (identical global order; see BatchLoader.shard) and the global
        # sharded batch is assembled below — the pod never loads an image
        # twice (reference analogue: DistributedSampler in
        # detector/utils.py; the SGG trainer itself is single-GPU there)
        shard = (jax.process_index(), jax.process_count()) \
            if self.multihost else None
        loader = BatchLoader(self.train_data, batch_size=cfg.batch_size,
                             max_nodes=cfg.max_nodes,
                             max_edges=cfg.max_edges, seed=cfg.seed,
                             num_workers=cfg.num_workers,
                             with_images=self.with_images,
                             image_format=cfg.image_format,
                             feature_cache=self._feature_cache_for(
                                 "train", self.train_data),
                             cache_orientations=cfg.cache_orientations,
                             shard=shard)
        loader._epoch = epoch
        # align the pod before the first collective dispatch of the epoch:
        # process 0 may have just spent minutes extracting the feature
        # cache, and XLA:CPU's lazy gloo contexts die if peers arrive >30 s
        # apart (see parallel.distributed.sync_processes)
        self._sync(f"epoch{epoch}")
        from sgg_tpu.data.pipeline import device_prefetch, to_image_dtype
        sharding = None
        source = (to_image_dtype(b, cfg.compute_dtype) for b in loader)
        gan_mode = self.gan_state is not None
        if gan_mode:
            # perturb + feature-bank sampling happen on the process-LOCAL
            # batch, BEFORE global assembly: a process-spanning array
            # cannot be pulled back to the host, and this ordering is what
            # makes -gan work multi-host (the reference is single-GPU;
            # multi-host GAN is beyond-reference capability)
            source = (self._gan_host_inputs(b, epoch) for b in source)
        if self.multihost:
            from sgg_tpu.parallel import distributed as dist
            source = (dist.global_batch(b, self.mesh, cfg.dp_axis)
                      for b in source)
        elif self.mesh is not None:
            from sgg_tpu.parallel import batch_sharding
            sharding = batch_sharding(self.mesh, cfg.dp_axis)
        batches = device_prefetch(source, sharding=sharding)
        accum = defaultdict(list)
        epoch_means = defaultdict(list)
        t0 = time.time()
        key = jax.random.key(cfg.seed * 100003 + epoch)
        for b_i, item in enumerate(batches):
            key, sub = jax.random.split(key)
            if gan_mode:
                batch, fake, vis = item
                self.gan_state, metrics = self.gan_step(
                    self.gan_state, batch, fake, vis, sub)
                self.state = self.gan_state.sgg
            else:
                batch = item
                self.state, metrics = self.train_step(self.state, batch, sub)
            self.global_iter += 1
            for k, v in metrics.items():
                accum[k].append(v)
            if (b_i + 1) % cfg.print_interval == 0:
                # force host sync once per interval, not per step
                means = {k: float(np.mean([float(x) for x in v]))
                         for k, v in accum.items()}
                if not np.isfinite(means.get("total", 0.0)):
                    # unconditional NaN guard (reference detector/
                    # engine.py:41-44 kills the run on non-finite loss;
                    # a silent NaN would burn the remaining epochs)
                    raise FloatingPointError(
                        f"non-finite loss at epoch {epoch} batch {b_i}: "
                        f"{means}")
                for k, v in means.items():
                    epoch_means[k].append(v)
                dt = (time.time() - t0) / cfg.print_interval
                print(f"e{epoch} b{b_i + 1} "
                      + " ".join(f"{k}={v:.4f}" for k, v in means.items()
                                 if not k.startswith("grad/"))
                      + f" {dt:.3f}s/batch")
                self.log_fn({f"loss/{k}": v for k, v in means.items()},
                            step=self.global_iter)
                accum.clear()
                t0 = time.time()
        if accum:
            for k, v in accum.items():
                epoch_means[k].append(float(np.mean([float(x) for x in v])))
        return {k: float(np.mean(v)) for k, v in epoch_means.items()}

    # ------------------------------------------------------------------
    def _gan_host_inputs(self, batch, epoch: int):
        """(batch, fake_classes, vis_features) for the GAN step, computed
        host-side on the process-LOCAL batch.

        Perturbation draws come from a per-image rng seeded by the image
        CONTENT (classes + boxes bytes) mixed with the epoch and run seed
        — so which process holds an image, the sharding layout, and the
        prefetch depth all leave the perturbation unchanged. A 2-process
        run therefore perturbs exactly like the single-process run
        (asserted in tests/test_distributed.py), while the same image
        still redraws across epochs like the reference's global-rng
        ``sgp.perturb`` (main.py:130-133).
        """
        fake = np.asarray(batch.classes)
        vis = None
        if self.perturber is not None:
            import zlib
            boxes = np.asarray(batch.boxes)
            seeds = [
                (zlib.crc32(fake[i].tobytes() + boxes[i].tobytes())
                 ^ (epoch * 0x9E3779B1)
                 ^ (self.config.seed * 0x85EBCA6B)) & 0xFFFFFFFF
                for i in range(fake.shape[0])]
            fake = self.perturber.perturb_batch(
                fake, np.asarray(batch.rels), np.asarray(batch.node_mask),
                np.asarray(batch.rel_mask), seeds=seeds)
        if self.feature_bank is not None:
            vis = self.feature_bank.sample(fake, np.asarray(batch.node_mask))
        return batch, fake, vis

    # ------------------------------------------------------------------
    def _sync(self, tag: str) -> None:
        """Cross-process alignment barrier (no-op single-process)."""
        if not self.multihost:
            return
        from sgg_tpu.parallel import distributed as dist
        dist.sync_processes(tag)

    # ------------------------------------------------------------------
    def evaluate(self, split_names, n_batches: int = -1,
                 verbose: bool = True,
                 collect_entries: bool = False) -> Dict[str, float]:
        results = {}
        for name in split_names:
            ds = self.splits.get(name)
            if ds is None or len(ds) == 0:
                continue
            self._sync(f"eval_{name}")
            res = val_epoch(
                self.model, self.variables, ds, self.config, name,
                train=self.train_data, n_batches=n_batches,
                with_images=self.with_images, verbose=verbose,
                collect_entries=collect_entries,
                feature_cache=self._feature_cache_for(name, ds),
                detector=self.detector, det_variables=self.det_variables,
                # DP eval over the pod (single-host meshes keep the
                # compiled single-device eval steps warm across epochs)
                mesh=self.mesh if self.multihost else None,
                # eval results go to W&B as summaries, repeated at test time
                # to survive the trailing-sync loss (reference lib/eval.py:
                # 108-110, log_repeats=5 if is_test)
                log_fn=lambda d, test=name.startswith("test"): self.log_fn(
                    d, step=self.global_iter, is_summary=True,
                    log_repeats=5 if test else 1))
            if collect_entries and "_entries" in res:
                results.setdefault("_entries", {})[name] = res.pop("_entries")
            if "_counters" in res:  # exactness-cap instrumentation per split
                results.setdefault("_counters", {})[name] = res.pop(
                    "_counters")
            results.update(res)
        return results

    # ------------------------------------------------------------------
    def fit(self, val_names=("val_zs", "val_alls"),
            test_names=("test_zs", "test_10s", "test_100s", "test_alls"),
            val_batches: int = -1, val_every: int = 5) -> Dict[str, float]:
        """Full run: epochs + periodic val + final test (main.py:244-288).

        Validation runs after the first epoch and then every ``val_every``
        epochs (the reference evaluates every 5 epochs because evaluation
        is slow and noisy, main.py:258-259)."""
        cfg = self.config
        for epoch in range(self.start_epoch, cfg.num_epochs):
            losses = self.train_epoch(epoch)
            print(f"epoch {epoch}: " +
                  " ".join(f"{k}={v:.4f}" for k, v in losses.items()))
            if cfg.save_dir:
                self._save(epoch)
            run_val = (epoch == self.start_epoch
                       or (epoch % val_every == 0
                           and epoch < cfg.num_epochs - 1))
            if cfg.val_size != 0 and run_val:
                self.evaluate(val_names, n_batches=val_batches,
                              verbose=False)
        results = {}
        if not cfg.notest:
            results = self.evaluate(test_names,
                                    collect_entries=cfg.save_scores)
            if jax.process_count() > 1 and jax.process_index() != 0:
                # metrics are identical on every host (gathered eval);
                # only process 0 writes the shared artifacts
                return results
            if cfg.save_dir and results:
                with open(os.path.join(cfg.save_dir, "test_results.json"),
                          "w") as f:
                    json.dump({k: v for k, v in results.items()
                               if not k.startswith("_")}, f, indent=2)
            if cfg.save_scores and cfg.save_dir and "_entries" in results:
                # pickle test prediction entries (reference main.py:284-288)
                import pickle
                with open(os.path.join(cfg.save_dir,
                                       "test_predictions.pkl"), "wb") as f:
                    pickle.dump(results.pop("_entries"), f)
        return results
