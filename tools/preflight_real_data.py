"""Real-data preflight: one command that prints ``READY`` or exact blockers.

The 60 GB VG/GQA datasets have never been reachable in the build
environment (every differential runs on schema-exact fixtures), so the
first real-data day would otherwise burn hours on preventable surprises.
This tool checks everything that can be checked without the data being
"right", in order:

1. on-disk tree + h5/json schema (file presence, dataset shapes,
   cross-references, vocab sizes) against the reference layout
   (``/root/reference/config.py:104-105``, ``dataloaders/visual_genome.py``
   h5 fields) and the hardcoded full-VG split sizes
   (``sgg_tpu/data/visual_genome.py EXPECTED``);
2. image decode sampling (first N split images through PIL);
3. disk budget + IO: measured read bandwidth -> feature-cache
   disk/epoch-time decision (reuses the entry-size math of
   ``tools/bench_cache_io.py``), against the committed BENCH numbers;
4. dry-run: ``splits()`` -> BatchLoader -> ONE train step + ONE eval
   batch of the real model on the current backend;
5. egress probe: resolve the Yandex public link through the REST API
   (``sgg_tpu/data/download.py``; reference ``lib/download.py:49``) —
   resolution succeeding means ``download_all_data`` would work here.
   ``--download`` additionally performs the real multi-GB fetch.

Usage:
  python tools/preflight_real_data.py -data /path/to/data [-split stanford]
      [--dryrun-images 50] [--download] [--skip-dryrun]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

BLOCKERS = []
INFO = {}


def blocker(msg: str):
    BLOCKERS.append(msg)
    print(f"  BLOCKER: {msg}")


def ok(msg: str):
    print(f"  ok: {msg}")


# ---------------------------------------------------------------------------
# 1. tree + schema


def check_vg_tree(data_dir: str):
    print("[1/5] VG tree + schema")
    base = os.path.join(data_dir, "VG", "stanford_filtered")
    images = os.path.join(data_dir, "VG", "VG_100K")
    needed = [os.path.join(base, f) for f in
              ("VG-SGG.h5", "VG-SGG-dicts.json", "image_data.json")]
    missing = [p for p in needed if not os.path.isfile(p)]
    if not os.path.isdir(images):
        missing.append(images)
    if missing:
        blocker(f"missing files/dirs: {missing} — run "
                "sgg_tpu.data.download.download_all_data or place the "
                "extracted VG.tar under the data dir")
        return None
    import h5py
    with open(needed[1]) as f:
        dicts = json.load(f)
    n_cls = len(dicts["label_to_idx"]) + 1
    n_pred = len(dicts["predicate_to_idx"]) + 1
    INFO["vg_classes"] = n_cls
    INFO["vg_predicates"] = n_pred
    if (n_cls, n_pred) == (151, 51):
        ok("vocab 150 classes + 50 predicates (full VG)")
    else:
        ok(f"vocab {n_cls - 1} classes + {n_pred - 1} predicates "
           "(NON-standard — custom subset?)")
    with open(needed[2]) as f:
        image_data = json.load(f)
    with h5py.File(needed[0], "r") as h5:
        need_ds = ["split", "img_to_first_box", "img_to_last_box",
                   "img_to_first_rel", "img_to_last_rel", "labels",
                   "boxes_1024", "relationships", "predicates"]
        absent = [d for d in need_ds if d not in h5]
        if absent:
            blocker(f"VG-SGG.h5 missing datasets: {absent}")
            return None
        n_img = h5["split"].shape[0]
        if n_img != len(image_data):
            blocker(f"split length {n_img} != image_data.json entries "
                    f"{len(image_data)}")
        n_box = h5["labels"].shape[0]
        if h5["boxes_1024"].shape != (n_box, 4):
            blocker(f"boxes_1024 shape {h5['boxes_1024'].shape} != "
                    f"({n_box}, 4)")
        if int(h5["labels"][:].max()) >= n_cls:
            blocker("labels exceed the dicts vocab")
        n_rel = h5["relationships"].shape[0]
        if h5["predicates"].shape[0] != n_rel:
            blocker("relationships/predicates length mismatch")
        split = h5["split"][:]
        INFO["images"] = int(n_img)
        INFO["boxes"] = int(n_box)
        INFO["rels"] = int(n_rel)
        INFO["train_images"] = int((split == 0).sum())
        INFO["test_images"] = int((split == 2).sum())
    from sgg_tpu.data.visual_genome import EXPECTED
    full = len(image_data) == EXPECTED["filenames"]
    INFO["full_vg"] = bool(full)
    ok(f"{INFO['images']} images ({INFO['train_images']} train / "
       f"{INFO['test_images']} test), {INFO['boxes']} boxes, "
       f"{INFO['rels']} rels "
       + ("— matches full VG" if full else
          f"— NOT full VG ({EXPECTED['filenames']} expected); "
          "check_sizes will be relaxed"))
    return image_data


def check_images(data_dir: str, image_data, n: int = 50):
    print(f"[2/5] image decode sample (first {n})")
    if image_data is None:
        blocker("skipped (tree check failed)")
        return
    from PIL import Image
    images = os.path.join(data_dir, "VG", "VG_100K")
    missing, bad, t0, nbytes = [], [], time.time(), 0
    for entry in image_data[:n]:
        p = os.path.join(images, os.path.basename(entry["url"]))
        if not os.path.isfile(p):
            missing.append(os.path.basename(p))
            continue
        try:
            with Image.open(p) as im:
                im.convert("RGB")
            nbytes += os.path.getsize(p)
        except Exception as e:
            bad.append((os.path.basename(p), repr(e)[:60]))
    dt = time.time() - t0
    if missing:
        blocker(f"{len(missing)}/{n} images missing (first: {missing[:5]})")
    if bad:
        blocker(f"{len(bad)} images fail to decode (first: {bad[:3]})")
    if not missing and not bad:
        INFO["decode_mb_s"] = round(nbytes / 2**20 / max(dt, 1e-9), 1)
        ok(f"{n} images decode at {INFO['decode_mb_s']} MB/s")


# ---------------------------------------------------------------------------
# 3. disk budget + cache decision


def check_disk(data_dir: str):
    print("[3/5] disk budget + feature-cache decision")
    usage = shutil.disk_usage(data_dir)
    free_gb = usage.free / 2**30
    INFO["disk_free_gb"] = round(free_gb, 1)
    # 592px VGG16 fmap entry: 37x37x512 bf16 (data/feature_cache.py)
    entry = 37 * 37 * 512 * 2
    train = INFO.get("train_images", 57723)
    for orient in (1, 2):
        INFO[f"cache_gb_{orient}orient"] = round(
            train * entry * orient / 2**30, 1)
    ok(f"free {free_gb:.0f} GB; train-split trunk cache needs "
       f"{INFO['cache_gb_1orient']} GB (1 orientation, hflip pinned off) / "
       f"{INFO['cache_gb_2orient']} GB (2)")
    if free_gb < INFO["cache_gb_1orient"]:
        ok("NOT enough disk for any feature cache — run without "
           "-feature_cache (informational, not a blocker)")
        INFO["cache_decision"] = "no_disk"
        return
    # quick sequential-read measurement on this filesystem
    probe = os.path.join(data_dir, ".preflight_io_probe")
    try:
        blk = os.urandom(1 << 20)
        with open(probe, "wb") as f:
            for _ in range(256):
                f.write(blk)
        os.sync()
        t0 = time.time()
        with open(probe, "rb") as f:
            while f.read(1 << 22):
                pass
        mb_s = 256 / max(time.time() - t0, 1e-9)
        INFO["disk_read_mb_s"] = round(mb_s, 0)
        cache_img_s = mb_s * 2**20 / entry
        # 400 img/s = measured chip trunk rate (tools/bench_cache_io.py)
        INFO["cache_read_img_s_est"] = round(cache_img_s, 0)
        INFO["cache_decision"] = ("cache" if cache_img_s > 400
                                  else "recompute")
        ok(f"disk reads {mb_s:.0f} MB/s -> est. {cache_img_s:.0f} cached "
           f"img/s vs ~400 img/s trunk recompute -> "
           f"{INFO['cache_decision']} wins (warm-cache reads are faster; "
           f"run tools/bench_cache_io.py for the full verdict)")
    finally:
        if os.path.exists(probe):
            os.remove(probe)


# ---------------------------------------------------------------------------
# 4. dry-run


def dryrun(data_dir: str, n_images: int):
    print(f"[4/5] dry-run: splits() -> BatchLoader -> 1 train + 1 eval step")
    try:
        import jax
        from sgg_tpu.config import Config
        from sgg_tpu.data import visual_genome as vg
        from sgg_tpu.data.pipeline import BatchLoader
        from sgg_tpu.models.relhead import RelModelIMP
        from sgg_tpu.train.state import create_train_state
        from sgg_tpu.train.step import make_train_step
        from sgg_tpu.eval.driver import val_epoch

        check = INFO.get("full_vg", False)
        # full VG uses the reference's 5000-image val carve; a smaller
        # (custom-subset) tree gets a proportional carve so train never
        # comes back empty
        n_val = 5000 if check else max(INFO.get("train_images", 8) // 8, 1)
        t0 = time.time()
        train = vg.load_split(data_dir, "train", check_sizes=check,
                              num_val_im=n_val)
        test = vg.load_split(data_dir, "test", check_sizes=check,
                             num_val_im=n_val)
        INFO["splits_s"] = round(time.time() - t0, 1)
        ok(f"splits parsed in {INFO['splits_s']}s "
           f"({len(train)} train / {len(test)} test)")

        import dataclasses as dc

        def head(ds, n):
            return dc.replace(ds, filenames=ds.filenames[:n],
                              gt_boxes=ds.gt_boxes[:n],
                              gt_classes=ds.gt_classes[:n],
                              relationships=ds.relationships[:n])

        train = head(train, n_images)
        test = head(test, max(n_images // 5, 2))

        cfg = Config(batch_size=2, mode="sgcls", compute_dtype="float32",
                     data=data_dir)
        model = RelModelIMP(num_classes=train.num_classes,
                            num_predicates=train.num_predicates,
                            mode="sgcls")
        loader = BatchLoader(train, batch_size=2, max_nodes=cfg.max_nodes,
                             max_edges=cfg.max_edges, num_workers=1)
        batch = next(iter(loader))
        from sgg_tpu.train.assign import sample_edges
        sampled, pm = sample_edges(jax.random.key(0), batch.rels,
                                   batch.rel_mask, batch.node_mask,
                                   max_out=cfg.max_edges)
        variables = model.init(jax.random.key(0), batch.images, batch.boxes,
                               batch.classes, sampled[..., :2], pm,
                               train=False)
        # eval BEFORE the train step: the train step donates the state
        # (whose leaves alias ``variables``), deleting the eval's buffers
        t0 = time.time()
        res = val_epoch(model, variables, test, cfg, "test",
                        eval_batch_size=2, n_batches=1, verbose=False)
        ok(f"eval batch: R@100 {res.get('avg/test_R', float('nan')):.4f} "
           f"({time.time() - t0:.1f}s incl. compile)")
        state = create_train_state(cfg, variables)
        step = make_train_step(model, cfg)
        t0 = time.time()
        state, metrics = step(state, batch, jax.random.key(1))
        loss = float(metrics["total"])
        assert (loss == loss), "train-step loss is NaN"
        ok(f"train step: loss {loss:.3f} "
           f"({time.time() - t0:.1f}s incl. compile)")
    except Exception as e:
        blocker(f"dry-run failed: {type(e).__name__}: {e}")


# ---------------------------------------------------------------------------
# 5. egress


def check_egress(data_dir: str, do_download: bool):
    print("[5/5] egress probe (Yandex REST link resolution)")
    import urllib.parse
    import urllib.request
    from sgg_tpu.data import download as dl
    api = dl._API.format(urllib.parse.quote(dl.VG_LINK[0]))
    try:
        with urllib.request.urlopen(api, timeout=20) as resp:
            info = json.loads(resp.read())
        if "href" in info:
            INFO["egress"] = "yes"
            ok("egress works — download_all_data(data_dir) would fetch "
               "the 60 GB archives here")
            if do_download:
                dl.download_all_data(data_dir, gqa=False)
        else:
            INFO["egress"] = f"api_error: {info.get('error')}"
            ok(f"API reachable but refused: {info.get('error')} "
               "(try later or download manually)")
    except Exception as e:
        INFO["egress"] = f"no ({type(e).__name__})"
        ok(f"no egress ({type(e).__name__}: {str(e)[:80]}) — download the "
           "archives on a connected machine (see MIGRATION.md)")


def _guarded(fn, *args, what: str):
    """A check that crashes (unreadable h5, permission error, …) is itself
    a blocker with the exception as the message — never a traceback."""
    try:
        return fn(*args)
    except Exception as e:
        blocker(f"{what} crashed: {type(e).__name__}: {str(e)[:120]}")
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-data", required=True)
    ap.add_argument("-split", default="stanford",
                    choices=["stanford"])  # GQA tree check: TODO on demand
    ap.add_argument("--dryrun-images", type=int, default=50)
    ap.add_argument("--skip-dryrun", action="store_true")
    ap.add_argument("--download", action="store_true",
                    help="actually fetch VG.tar when egress works")
    args = ap.parse_args()

    image_data = _guarded(check_vg_tree, args.data, what="tree check")
    _guarded(check_images, args.data, image_data, args.dryrun_images,
             what="image decode check")
    _guarded(check_disk, args.data, what="disk check")
    if args.skip_dryrun:
        print("[4/5] dry-run skipped (--skip-dryrun)")
    elif image_data is not None:
        dryrun(args.data, args.dryrun_images)
    else:
        print("[4/5] dry-run skipped (tree check failed)")
    _guarded(check_egress, args.data, args.download, what="egress probe")

    print()
    print(json.dumps(INFO))
    if BLOCKERS:
        print(f"BLOCKED ({len(BLOCKERS)}):")
        for b in BLOCKERS:
            print(f"  - {b}")
        sys.exit(1)
    print("READY")


if __name__ == "__main__":
    main()
