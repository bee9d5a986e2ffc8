"""Generate a miniature schema-exact on-disk dataset for CLI dress
rehearsals.

    python tools/make_fixture_dataset.py DATA_DIR [vg|gqa|vte|all] [SCALE]

Writes real JPEGs plus the exact file layout the real datasets use (see
``sgg_tpu/data/fixtures.py``). SCALE multiplies the default image counts
(default 1.0: 120 VG / 55 GQA / 42 VTE images). Run the CLI against it with
``SGG_CHECK_SIZES=0`` so the full-dataset integrity asserts are relaxed:

    SGG_CHECK_SIZES=0 python main.py -m sgcls -split stanford \
        -data DATA_DIR -val_size 2 -nepoch 2 -save_dir /tmp/run
"""

import sys

from sgg_tpu.data import fixtures


def main():
    data_dir = sys.argv[1]
    which = sys.argv[2] if len(sys.argv) > 2 else "all"
    scale = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    s = lambda n: max(int(n * scale), 4)
    if which in ("vg", "all"):
        fixtures.write_vg_fixture(data_dir, n_train=s(90), n_test=s(30))
        print(f"VG fixture -> {data_dir}/VG")
    if which in ("gqa", "all"):
        fixtures.write_gqa_fixture(data_dir, n_train=s(40), n_val=s(15))
        print(f"GQA fixture -> {data_dir}/GQA")
    if which in ("vte", "all"):
        fixtures.write_vte_fixture(data_dir, n_train=s(30), n_test=s(12))
        print(f"VTE fixture -> {data_dir}/VG/vtranse")


if __name__ == "__main__":
    main()
