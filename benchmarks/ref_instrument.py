"""Build an instrumented copy of the reference FM binary for curve/init
forensics (PARITY_CURVES.md). The patch, applied to a COPY under
/tmp/refprobe (the read-only reference tree is never touched):

  - srand from $PROBE_SEED (default: time(NULL), the reference behaviour)
  - epochs: Train_FM_Algo constructed with epoch_cnt=1 and the outer
    `while (T--) { Train(); Predict(); }` loop run $CURVE_EPOCHS times,
    so the existing FM_Predict evaluates TEST AUC after every epoch
    (reference regression standard: benchmark/*.png curve overlap)
  - saveModel(1000) right after construction — the INIT dump (W all
    zeros, V the N(0, 1/sqrt(k)) Gauss draws) — and saveModel(1..3)
    after each of the first three epochs, for feature-by-feature update
    diffs against the NumPy replica (benchmarks/fm_reference_replica.py)

    python benchmarks/ref_instrument.py        # build /tmp/refprobe/refprobe_fm
    cd /tmp/refprobe && PROBE_SEED=7 CURVE_EPOCHS=30 ./refprobe_fm

Reference lineage: main.cpp:75-78,141-148,226-253, fm_algo_abst.h:109-135
(saveModel), train_fm_algo.cpp (the trainer being probed).
"""

import shutil
import subprocess
import sys
from pathlib import Path

REF = Path("/root/reference")
DST = Path("/tmp/refprobe")


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
    patch(
        main_cpp,
        "\"./data/ad_data.csv\",\n                        /*epoch*/5,",
        "\"./data/ad_data.csv\",\n                        /*epoch*/1,",
    )
    patch(
        main_cpp,
        "    clock_start();\n    while (T--) {\n        train->Train();",
        "    clock_start();\n    train->saveModel(1000); // init dump\n"
        "    int probe_epoch = 0;\n    while (T--) {\n        train->Train();\n"
        "        ++probe_epoch;\n"
        "        if (probe_epoch <= 3) train->saveModel(probe_epoch);",
    )

    # $PROBE_THREADS overrides the worker count (1 = deterministic: the
    # reference accumulates grads into shared update_g unsynchronised, so
    # multithreaded runs race — train_fm_algo.cpp:109-116)
    patch(
        DST / "LightCTR/fm_algo_abst.h",
        "        proc_cnt = thread::hardware_concurrency();",
        "        proc_cnt = getenv(\"PROBE_THREADS\") ?"
        " (size_t)atoi(getenv(\"PROBE_THREADS\"))"
        " : thread::hardware_concurrency();",
    )
    patch(
        DST / "LightCTR/fm_algo_abst.h",
        "#include <fstream>",
        "#include <fstream>\n#include <cstdlib>",
    )

    # g++-12 compatibility (semantics-neutral): ArrayAllocator rebinds to
    # std::allocator<U>, which gcc12's vector internals cannot convert
    # back from — rebind to ArrayAllocator<U> with a converting ctor; and
    # gbm_algo_abst.h uses shared_ptr without <memory>.
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

    # the bundled sparse data under the names main.cpp expects
    shutil.copy(DST / "data/train_sparse.csv", DST / "data/ad_data.csv")
    shutil.copy(DST / "data/test_sparse.csv", DST / "data/ad_test.csv")
    (DST / "output").mkdir(exist_ok=True)

    cmd = (
        "g++ -std=c++11 -O3 -D__AVX__ -mavx -mssse3 -Wno-unknown-pragmas "
        "-Wno-reorder -Wno-sign-compare -DTEST_FM -o refprobe_fm main.cpp "
        "LightCTR/train/train_fm_algo.cpp LightCTR/train/train_ffm_algo.cpp "
        "LightCTR/train/train_nfm_algo.cpp LightCTR/train/train_gbm_algo.cpp "
        "LightCTR/train/train_gmm_algo.cpp LightCTR/train/train_tm_algo.cpp "
        "LightCTR/train/train_embed_algo.cpp LightCTR/predict/fm_predict.cpp "
        "LightCTR/predict/gbm_predict.cpp -pthread -lm -ldl"
    )
    subprocess.run(cmd, shell=True, cwd=DST, check=True)
    print(f"built {DST}/refprobe_fm", file=sys.stderr)


if __name__ == "__main__":
    main()
