"""CLI smoke tests — run main() in-process on tiny data (CPU)."""

import numpy as np
import pytest

from lightctr_tpu.cli import main


@pytest.fixture(scope="module")
def tiny_libffm(tmp_path_factory):
    p = tmp_path_factory.mktemp("cli") / "train.csv"
    rng = np.random.default_rng(0)
    lines = []
    for _ in range(200):
        feats = rng.choice(50, size=8, replace=False)
        label = int((feats < 10).sum() >= 2)
        toks = " ".join(f"{f % 5}:{f}:1" for f in feats)
        lines.append(f"{label} {toks}")
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_cli_train_and_score(tiny_libffm, tmp_path, capsys):
    ckpt = str(tmp_path / "m")
    main([
        "train", "--model", "fm", "--factor", "4", "--train", tiny_libffm,
        "--epochs", "6", "--optimizer", "adagrad", "--lr", "0.2",
        "--batch-size", "64", "--ckpt", ckpt,
    ])
    out = capsys.readouterr().out
    assert "train:" in out and "auc" in out
    assert "saved checkpoint" in out

    main([
        "score", "--model", "fm", "--factor", "4", "--test", tiny_libffm,
        "--ckpt", ckpt, "--n-features", "50", "--n-fields", "5",
        "--dump", str(tmp_path / "preds.txt"),
    ])
    out = capsys.readouterr().out
    assert "auc" in out
    assert len(open(tmp_path / "preds.txt").readlines()) == 200

    # --scan K: stacked-dispatch dataset scoring, same metrics + dump
    main([
        "score", "--model", "fm", "--factor", "4", "--test", tiny_libffm,
        "--ckpt", ckpt, "--n-features", "50", "--n-fields", "5",
        "--scan", "3", "--dump", str(tmp_path / "preds_scan.txt"),
    ])
    out_scan = capsys.readouterr().out
    assert out_scan == out
    assert (open(tmp_path / "preds_scan.txt").read()
            == open(tmp_path / "preds.txt").read())


def test_cli_train_kernel_engine(tiny_libffm, tmp_path, capsys):
    """--engine kernel: the fused Pallas trainers as the product path
    (VERDICT r1 #2), exporting into the standard checkpoint/score flow."""
    ckpt = str(tmp_path / "mk")
    main([
        "train", "--model", "fm", "--factor", "4", "--train", tiny_libffm,
        "--engine", "kernel", "--epochs", "6", "--lr", "0.2",
        "--batch-size", "64", "--ckpt", ckpt,
    ])
    out = capsys.readouterr().out
    assert "train:" in out and "auc" in out
    assert "saved checkpoint" in out
    import json

    auc = json.loads(out.split("train:")[1].splitlines()[0])["auc"]
    assert auc > 0.8

    main([
        "score", "--model", "fm", "--factor", "4", "--test", tiny_libffm,
        "--ckpt", ckpt, "--dump", str(tmp_path / "predk.txt"),
    ])
    out = capsys.readouterr().out
    assert "auc" in out
    assert len(open(tmp_path / "predk.txt").readlines()) == 200


def test_cli_train_kernel_engine_ffm(tiny_libffm, capsys):
    main([
        "train", "--model", "ffm", "--factor", "2", "--train", tiny_libffm,
        "--engine", "kernel", "--epochs", "4", "--lr", "0.2",
    ])
    out = capsys.readouterr().out
    assert "train:" in out and "auc" in out


def test_cli_train_mesh(tiny_libffm, capsys):
    main([
        "train", "--model", "widedeep", "--train", tiny_libffm,
        "--epochs", "2", "--optimizer", "adam", "--lr", "0.01",
        "--batch-size", "40", "--mesh", "4x2", "--cpu-devices", "8",
    ])
    out = capsys.readouterr().out
    assert "epoch 1" in out and "train:" in out


def test_cli_gbm_libffm(tiny_libffm, capsys):
    main(["gbm", "--train", tiny_libffm, "--libffm", "--rounds", "4",
          "--max-depth", "3", "--n-bins", "8", "--test", tiny_libffm])
    out = capsys.readouterr().out
    assert "train:" in out and "test:" in out
    import json

    m = json.loads(out.split("train:")[1].splitlines()[0])
    assert m["auc"] > 0.8


def test_cli_gbm_dense(tmp_path, capsys):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(120, 10))
    y = (x[:, 0] > 0).astype(int)
    p = tmp_path / "dense.csv"
    with open(p, "w") as f:
        for yy, row in zip(y, x):
            f.write(str(yy) + "," + ",".join(f"{v:.4f}" for v in row) + "\n")
    main(["gbm", "--train", str(p), "--rounds", "5", "--max-depth", "3",
          "--n-classes", "2"])
    out = capsys.readouterr().out
    assert "final train accuracy" in out


def test_cli_train_kernel_engine_mesh_fm(tiny_libffm, tmp_path, capsys):
    """--engine kernel --mesh: the sharded streaming kernel trainers are
    the CLI product path for pod-scale vocabularies (2-D data x model
    mesh routes to make_dp_sharded_streaming_step)."""
    ckpt = str(tmp_path / "m8")
    main([
        "train", "--model", "fm", "--factor", "4", "--train", tiny_libffm,
        "--engine", "kernel", "--epochs", "4", "--lr", "0.2",
        "--batch-size", "64", "--mesh", "2x4", "--ckpt", ckpt,
    ])
    out = capsys.readouterr().out
    assert "train:" in out and "auc" in out
    assert "saved checkpoint" in out

    # mesh-trained kernel checkpoints reload from their own metadata
    main([
        "score", "--model", "fm", "--factor", "4", "--test", tiny_libffm,
        "--ckpt", ckpt,
    ])
    out = capsys.readouterr().out
    assert "auc" in out


def test_cli_train_kernel_engine_mesh_ffm(tiny_libffm, capsys):
    main([
        "train", "--model", "ffm", "--factor", "2", "--train", tiny_libffm,
        "--engine", "kernel", "--epochs", "4", "--lr", "0.2",
        "--mesh", "1x8",
    ])
    out = capsys.readouterr().out
    assert "train:" in out and "auc" in out


def test_cli_train_kernel_engine_data_mesh(tiny_libffm, tmp_path, capsys):
    """--engine kernel --mesh Nx1 + full batch: the data-sharded
    full-batch fast paths (xmat FM / grouped FFM) as CLI product paths."""
    ckpt = str(tmp_path / "dm")
    main([
        "train", "--model", "fm", "--factor", "4", "--train", tiny_libffm,
        "--engine", "kernel", "--epochs", "4", "--lr", "0.2",
        "--batch-size", "200", "--mesh", "8x1", "--ckpt", ckpt,
    ])
    out = capsys.readouterr().out
    assert "train:" in out and "auc" in out
    main([
        "train", "--model", "ffm", "--factor", "2", "--train", tiny_libffm,
        "--engine", "kernel", "--epochs", "4", "--lr", "0.2",
        "--mesh", "8x1",
    ])
    out = capsys.readouterr().out
    assert "train:" in out and "auc" in out


def test_cli_ann(tmp_path, capsys):
    """`ann` completes the main.cpp dispatch surface (TEST_ANN): nearest
    neighbors over a saved embedding file via exact MIPS top-k."""
    emb_file = tmp_path / "emb.txt"
    rng = np.random.default_rng(0)
    base = rng.normal(size=(3, 8)).astype(np.float32)
    lines = []
    words = []
    for c in range(3):
        for j in range(4):
            w = f"w{c}_{j}"
            words.append(w)
            vec = base[c] + 0.05 * rng.normal(size=8)
            lines.append(w + " " + " ".join(f"{v:.6f}" for v in vec))
    emb_file.write_text("\n".join(lines) + "\n")

    dump = tmp_path / "nn.txt"
    main([
        "ann", "--embeddings", str(emb_file), "--query", "w1_0,w2_3",
        "--k", "3", "--metric", "cos", "--dump", str(dump),
    ])
    out = capsys.readouterr().out
    # same-cluster words dominate the top-3, the query itself is excluded
    first = out.splitlines()[0]
    assert first.startswith("w1_0:") and "w1_0(" not in first
    assert first.split(":", 1)[1].count("w1_") == 3
    dumped = dump.read_text().strip().splitlines()
    assert len(dumped) == 6 and dumped[0].split()[0] == "w1_0"


def test_cli_ann_ivf(tmp_path, capsys):
    """`ann --ivf N` routes through the two-tier IVF shortlist + exact
    rerank (the reference forest's sublinear capability) and finds the
    same same-cluster neighbors as the exact scan on separable data."""
    emb_file = tmp_path / "emb.txt"
    rng = np.random.default_rng(3)
    base = rng.normal(size=(4, 8)).astype(np.float32) * 4.0
    lines = []
    for c in range(4):
        for j in range(16):
            vec = base[c] + 0.05 * rng.normal(size=8)
            lines.append(f"w{c}_{j} " + " ".join(f"{v:.6f}" for v in vec))
    emb_file.write_text("\n".join(lines) + "\n")

    main([
        "ann", "--embeddings", str(emb_file), "--query", "w1_0",
        "--k", "3", "--metric", "cos", "--ivf", "4", "--nprobe", "2",
    ])
    first = capsys.readouterr().out.splitlines()[0]
    assert first.startswith("w1_0:") and "w1_0(" not in first
    assert first.split(":", 1)[1].count("w1_") == 3


def test_cli_ann_unknown_word(tmp_path):
    emb_file = tmp_path / "e.txt"
    emb_file.write_text("a 1 0\nb 0 1\n")
    with pytest.raises(SystemExit, match="not in the embedding"):
        main(["ann", "--embeddings", str(emb_file), "--query", "zzz"])


def test_cli_train_kernel_engine_ffm_stream(tiny_libffm, capsys):
    """--stream routes kernel FFM to the fused one-dispatch streaming
    trainer (vocab-space master table, minibatches)."""
    main([
        "train", "--model", "ffm", "--factor", "2", "--train", tiny_libffm,
        "--engine", "kernel", "--stream", "--batch-size", "64",
        "--epochs", "4", "--lr", "0.2",
    ])
    out = capsys.readouterr().out
    assert "train:" in out and "auc" in out


def test_cli_stream_rejects_unsupported_combinations(tiny_libffm):
    """--stream must never be silently ignored (advisor r2): it errors
    with --mesh, with the dense engine, and with non-FFM models."""
    base = ["train", "--train", tiny_libffm, "--stream",
            "--batch-size", "64", "--epochs", "1"]
    with pytest.raises(SystemExit, match="--stream requires"):
        main(base + ["--model", "ffm"])  # default dense engine
    with pytest.raises(SystemExit, match="--stream requires"):
        main(base + ["--model", "fm", "--engine", "kernel"])
    with pytest.raises(SystemExit, match="single-device"):
        main(base + ["--model", "ffm", "--engine", "kernel",
                     "--mesh", "2x1"])


def test_cli_train_widedeep_kernel_engine(tiny_libffm, tmp_path, capsys):
    """--engine kernel --model widedeep: the streaming vocab-master W&D
    trainer through the CLI (+ --partitioned layout)."""
    main([
        "train", "--model", "widedeep", "--engine", "kernel",
        "--factor", "4", "--hidden", "8", "--train", tiny_libffm,
        "--epochs", "3", "--lr", "0.1", "--batch-size", "64",
        "--ckpt", str(tmp_path / "wd"),
    ])
    out = capsys.readouterr().out
    assert "train:" in out and "auc" in out

    # the kernel-trained checkpoint scores through the standard path
    main([
        "score", "--model", "widedeep", "--factor", "4", "--hidden", "8",
        "--test", tiny_libffm, "--ckpt", str(tmp_path / "wd"),
    ])
    out = capsys.readouterr().out
    assert "auc" in out

    main([
        "train", "--model", "widedeep", "--engine", "kernel",
        "--partitioned", "--factor", "4", "--hidden", "8",
        "--train", tiny_libffm, "--epochs", "3", "--lr", "0.1",
        "--batch-size", "64",
    ])
    out = capsys.readouterr().out
    assert "train:" in out and "auc" in out
