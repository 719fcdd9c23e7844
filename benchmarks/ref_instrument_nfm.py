"""Build an instrumented copy of the reference NFM binary for the
train-loss-gap forensics (PARITY_CURVES.md r4 section).

The r4 matched-optimizer head-to-head DISPROVED the r3 attribution
(Adam-vs-Adagrad tower: both land at ~51 vs the reference's 42-45).
The remaining candidate regime differences live in the reference's FC
layer (fullyconnLayer.h): per-UNIT dropout masks at keep-rate
__global_sparse_rate=0.8 resampled per batch (and applied to the
PRE-activation, so a "dropped" hidden unit emits sigmoid(0)=0.5 —
not 0), uniform(-0.5,0.5) weight init, delta clip +-15, and the
sequential unshuffled batch order of train_nfm_algo.cpp:40-48.

This probe isolates the dropout knob A/B on the binary itself:

    python benchmarks/ref_instrument_nfm.py      # build /tmp/refprobe_nfm
    cd /tmp/refprobe_nfm && PROBE_SEED=7 CURVE_EPOCHS=30 PROBE_KEEP=1.0 \
        ./refprobe_nfm       # dropout OFF
    ... PROBE_KEEP=0.8 ./refprobe_nfm            # reference default

Patches (applied to a COPY; /root/reference is never touched):
  - srand from $PROBE_SEED (default: time(NULL), reference behaviour)
  - __global_sparse_rate from $PROBE_KEEP (default 0.8, main.cpp:67)
  - Train_NFM_Algo(epoch=1) + `while (T--) Train();` outer loop run
    $CURVE_EPOCHS times, so per-epoch losses print with persistent
    Adagrad state (identical regime: Train() re-zeros sumVX per epoch
    anyway — train_nfm_algo.cpp:38)
  - the g++-12 compatibility patches from ref_instrument.py

Reference lineage: main.cpp:156-162, train_nfm_algo.cpp,
train/layer/fullyconnLayer.h:48-51,96-101,199-201.
"""

import shutil
import subprocess
import sys
from pathlib import Path

REF = Path("/root/reference")
DST = Path("/tmp/refprobe_nfm")


def patch(path: Path, old: str, new: str):
    text = path.read_text()
    assert old in text, f"patch anchor not found in {path}: {old[:60]!r}"
    path.write_text(text.replace(old, new, 1))


def main():
    if DST.exists():
        shutil.rmtree(DST)
    shutil.copytree(REF, DST)

    main_cpp = DST / "main.cpp"
    patch(
        main_cpp,
        "srand((uint32_t)time(NULL));",
        "srand(getenv(\"PROBE_SEED\") ? (uint32_t)atoi(getenv(\"PROBE_SEED\"))"
        " : (uint32_t)time(NULL));",
    )
    patch(
        main_cpp,
        "int T = 200;",
        "int T = getenv(\"CURVE_EPOCHS\") ? atoi(getenv(\"CURVE_EPOCHS\")) : 200;",
    )
    # dropout keep-rate knob (reference default 0.8)
    patch(
        main_cpp,
        "float GradientUpdater::__global_sparse_rate(0.8);",
        "float GradientUpdater::__global_sparse_rate(\n"
        "    getenv(\"PROBE_KEEP\") ? (float)atof(getenv(\"PROBE_KEEP\")) : 0.8f);",
    )
    patch(
        main_cpp,
        "#include <iostream>",
        "#include <iostream>\n#include <cstdlib>",
    )
    # epoch=1 per Train(), outer loop prints a loss line per epoch
    patch(
        main_cpp,
        "    FM_Algo_Abst *train = new Train_NFM_Algo(\n"
        "                                             \"./data/ad_data.csv\",\n"
        "                                             /*epoch*/5,",
        "    FM_Algo_Abst *train = new Train_NFM_Algo(\n"
        "                                             \"./data/ad_data.csv\",\n"
        "                                             /*epoch*/1,",
    )

    # g++-12 compatibility (semantics-neutral; same as ref_instrument.py)
    patch(
        DST / "LightCTR/common/memory_pool.h",
        "    template <typename U>\n    struct rebind {\n"
        "        typedef std::allocator<U> other;\n    };",
        "    ArrayAllocator() = default;\n"
        "    template <typename U>\n"
        "    ArrayAllocator(const ArrayAllocator<U>&) {}\n"
        "    template <typename U>\n    struct rebind {\n"
        "        typedef ArrayAllocator<U> other;\n    };",
    )
    patch(
        DST / "LightCTR/gbm_algo_abst.h",
        "#include <thread>",
        "#include <thread>\n#include <memory>",
    )

    shutil.copy(DST / "data/train_sparse.csv", DST / "data/ad_data.csv")
    shutil.copy(DST / "data/test_sparse.csv", DST / "data/ad_test.csv")
    (DST / "output").mkdir(exist_ok=True)

    cmd = (
        "g++ -std=c++11 -O3 -D__AVX__ -mavx -mssse3 -Wno-unknown-pragmas "
        "-Wno-reorder -Wno-sign-compare -DTEST_NFM -o refprobe_nfm main.cpp "
        "LightCTR/train/train_fm_algo.cpp LightCTR/train/train_ffm_algo.cpp "
        "LightCTR/train/train_nfm_algo.cpp LightCTR/train/train_gbm_algo.cpp "
        "LightCTR/train/train_gmm_algo.cpp LightCTR/train/train_tm_algo.cpp "
        "LightCTR/train/train_embed_algo.cpp LightCTR/predict/fm_predict.cpp "
        "LightCTR/predict/gbm_predict.cpp -pthread -lm -ldl"
    )
    subprocess.run(cmd, shell=True, cwd=DST, check=True)
    print(f"built {DST}/refprobe_nfm", file=sys.stderr)


if __name__ == "__main__":
    main()
