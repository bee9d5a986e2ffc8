#!/bin/bash
# Round-4 chip dress rehearsal (VERDICT r3 items 1 + 2): the full CLI on a
# schema-exact on-disk fixture, on the real TPU, via argparse — no test
# harness shortcuts. Mirrors tests/test_cli_e2e.py but at the real 592 px
# scale on the chip. Usage:
#   bash tools/chip_dress_rehearsal.sh /tmp/fixdata /tmp/chipruns
# Prereq: python tools/make_fixture_dataset.py /tmp/fixdata all 1.0
set -x
DATA=${1:-/tmp/fixdata}
OUT=${2:-/tmp/chipruns}
mkdir -p "$OUT"
export SGG_CHECK_SIZES=0
cd "$(dirname "$0")/.."

run() { timeout 2300 python "$@" || { echo "FAILED: $*"; exit 1; }; }

# 1. stanford sgcls: train 1 epoch -> dual eval -> ckpt
run main.py -m sgcls -split stanford -data "$DATA" -val_size 2 -b 8 \
    -nepoch 1 -p 5 -use_bias -save_dir "$OUT/sgcls"
# 2. resume (epoch-0 ckpt picked up) + -save_scores
run main.py -m sgcls -split stanford -data "$DATA" -val_size 2 -b 8 \
    -nepoch 2 -p 5 -use_bias -save_dir "$OUT/sgcls" -save_scores
# 3. -feature_cache through the CLI (extraction + cached train/eval)
run main.py -m sgcls -split stanford -data "$DATA" -val_size 2 -b 8 \
    -nepoch 1 -p 5 -save_dir "$OUT/sgcls_fc" -feature_cache "$OUT/fcache"
# 4. detector pretrain (vg) -> sgdet handoff
run pretrain_detector.py vg "$DATA" "$OUT/det_vg" 1 2 2
run main.py -m sgdet -split stanford -data "$DATA" -val_size 2 -b 4 \
    -nepoch 1 -p 5 -backbone resnet50 -ckpt "$OUT/det_vg" \
    -save_dir "$OUT/sgdet"
# 5. GQA chain: detector fine-tune -> SGCls -> SGGen (README.md:227-243)
run pretrain_detector.py gqa "$DATA" "$OUT/det_gqa" 1 2 2
run main.py -m sgcls -split gqa -data "$DATA" -val_size 2 -b 8 \
    -nepoch 1 -p 5 -backbone resnet50 -exclude_left_right \
    -save_dir "$OUT/gqa"
run main.py -m sgdet -split gqa -data "$DATA" -val_size 2 -b 4 \
    -nepoch 1 -p 5 -backbone resnet50 -ckpt "$OUT/det_gqa" \
    -save_dir "$OUT/gqa"
# 6. VTE smoke
run main.py -m predcls -split vte -data "$DATA" -val_size 2 -b 8 \
    -nepoch 1 -p 5 -backbone resnet50 -save_dir "$OUT/vte"

echo "=== artifacts ==="
find "$OUT" -maxdepth 2 -name '*.json' -o -maxdepth 2 -name '*.pkl' | sort
for f in "$OUT"/*/test_results.json; do echo "--- $f"; cat "$f"; echo; done
echo "CHIP DRESS REHEARSAL: ALL GREEN"
