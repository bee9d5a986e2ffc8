"""Feature-cache IO economics at real-data scale (VERDICT r3 item 8).

The frozen-trunk cache (sgg_tpu/data/feature_cache.py) trades disk reads for
trunk recompute: it only pays off when random chunk reads out of a VG-scale
HDF5 file (57k entries, ~160 GB at 2 orientations) beat the trunk's img/s.
This tool measures that directly: it creates a 57k-entry cache file with the
REAL chunk shape ((1, 1, 37, 37, 512) bf16 = 1.4 MB), writes a scattered
subset of entries (HDF5 chunked storage allocates per chunk, so the file
layout — B-tree depth, chunk addresses spread over the full index range —
matches the full-size file), then times random reads in shuffled order,
both warm (page cache) and cold (drop_caches, root only).

Output: one JSON line with write/read throughput and the break-even verdict
against a given trunk recompute rate (default: the 400 img/s single-chip
VGG16 extraction rate recorded in STATUS.md round 3).

Usage: python tools/bench_cache_io.py [--entries 8000] [--gb-cap 25] ...
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def drop_page_cache() -> bool:
    """Best-effort page-cache drop (root). Returns True on success."""
    try:
        os.sync()
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3\n")
        return True
    except (PermissionError, FileNotFoundError, OSError):
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", default="/tmp/cache_io_bench.h5")
    ap.add_argument("--total", type=int, default=57723,
                    help="index space of the file (VG train size)")
    ap.add_argument("--entries", type=int, default=8000,
                    help="entries actually written (scattered)")
    ap.add_argument("--gb-cap", type=float, default=30.0,
                    help="hard cap on bytes written")
    ap.add_argument("--shape", type=int, nargs=3, default=[37, 37, 512],
                    help="fmap (h, w, C) — 592px VGG16 default")
    ap.add_argument("--n-orient", type=int, default=2)
    ap.add_argument("--reads", type=int, default=3000)
    ap.add_argument("--trunk-img-s", type=float, default=400.0,
                    help="measured trunk recompute rate to compare against")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    from sgg_tpu.data.feature_cache import FeatureCache

    h, w, c = args.shape
    entry_bytes = args.n_orient * h * w * c * 2
    n_entries = min(args.entries,
                    int(args.gb_cap * 2**30 / max(entry_bytes, 1)))
    rng = np.random.RandomState(0)
    written = np.sort(rng.choice(args.total, size=n_entries, replace=False))

    cache = FeatureCache.create(args.path, args.total, (h, w), c,
                                n_orient=args.n_orient, fingerprint="iobench")
    # one random payload reused (dirty pages dominate write cost, not RNG)
    payload = rng.randn(args.n_orient, h, w, c).astype(np.float32)
    t0 = time.time()
    for i in written:
        cache.write(int(i), payload, (600, 800))
    cache.flush()
    os.sync()
    write_s = time.time() - t0
    file_gb = os.path.getsize(args.path) / 2**30
    cache.close()

    def read_pass(label):
        cache = FeatureCache(args.path)
        order = written[rng.permutation(n_entries)][:args.reads]
        flips = rng.randint(0, args.n_orient, size=len(order))
        t0 = time.time()
        nbytes = 0
        for idx, fl in zip(order, flips):
            fm = cache.read(int(idx), bool(fl))
            nbytes += fm.nbytes
        dt = time.time() - t0
        cache.close()
        return {f"read_{label}_img_s": len(order) / dt,
                f"read_{label}_mb_s": nbytes / dt / 2**20}

    res = {
        "entry_mb": entry_bytes / 2**20,
        "entries_written": int(n_entries),
        "file_gb": round(file_gb, 2),
        "full_vg_gb": round(args.total * entry_bytes / 2**30, 1),
        "write_img_s": n_entries / write_s,
        "write_mb_s": n_entries * entry_bytes / write_s / 2**20,
    }
    res.update(read_pass("warm"))
    cold_ok = drop_page_cache()
    res["cold_cache_dropped"] = cold_ok
    res.update(read_pass("cold" if cold_ok else "warm2"))
    read_rate = res.get("read_cold_img_s", res["read_warm_img_s"])
    res["trunk_img_s"] = args.trunk_img_s
    # the cache reads ONE orientation per image per epoch; recompute runs
    # the trunk once per image per epoch — same unit, direct comparison
    res["cache_speedup_vs_recompute"] = read_rate / args.trunk_img_s
    res["verdict"] = ("cache wins" if read_rate > args.trunk_img_s
                      else "recompute wins on this disk")
    print(json.dumps(res))
    if not args.keep:
        os.remove(args.path)


if __name__ == "__main__":
    main()
