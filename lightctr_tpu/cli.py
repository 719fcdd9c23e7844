"""Single CLI entry — the TPU replacement of the reference's compile-time
role/model selection (main.cpp:80-282 `#ifdef` dispatch + Makefile -D
flags): one binary-equivalent, runtime flags, no recompilation.

    python -m lightctr_tpu.cli train --model fm --train data.csv --epochs 5
    python -m lightctr_tpu.cli score --model fm --ckpt ckpt --test t.csv
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_model(args, n_features: int, n_fields: int):
    from .models import MODEL_REGISTRY, ffm, fm, lr, nfm, widedeep

    name = args.model
    model = MODEL_REGISTRY[name]
    hidden = tuple(int(h) for h in args.hidden.split(",") if h)
    if name == "lr":
        cfg = lr.LRConfig(n_features=n_features, l2=args.l2)
    elif name == "fm":
        cfg = fm.FMConfig(n_features=n_features, factor=args.factor, l2=args.l2)
    elif name == "ffm":
        cfg = ffm.FFMConfig(
            n_features=n_features, n_fields=n_fields, factor=args.factor, l2=args.l2
        )
    elif name == "nfm":
        cfg = nfm.NFMConfig(
            n_features=n_features,
            factor=args.factor,
            hidden=hidden,
            dropout=args.dropout,
            l2=args.l2,
        )
    elif name == "widedeep":
        cfg = widedeep.WideDeepConfig(
            n_features=n_features,
            n_fields=n_fields,
            embed_dim=args.factor,
            hidden=hidden,
            dropout=args.dropout,
            l2=args.l2,
        )
    else:
        raise SystemExit(f"unknown model {name}")
    return model, cfg


def _build_optimizer(args):
    from . import optim

    table = {
        "sgd": lambda: optim.sgd(args.lr),
        "momentum": lambda: optim.momentum(args.lr),
        "adagrad": lambda: optim.adagrad(args.lr),
        "rmsprop": lambda: optim.rmsprop(args.lr),
        "adadelta": lambda: optim.adadelta(),
        "adam": lambda: optim.adam(args.lr),
        "ftrl": lambda: optim.ftrl(alpha=args.lr),
    }
    tx = table[args.optimizer]()
    if args.grad_clip > 0:
        from . import optim as _o

        tx = _o.chain(_o.clip_by_value(args.grad_clip), tx)
    return tx


def main(argv=None):
    p = argparse.ArgumentParser(prog="lightctr_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--model", default="fm",
                        choices=["lr", "fm", "ffm", "nfm", "widedeep"])
    common.add_argument("--factor", type=int, default=8)
    common.add_argument("--hidden", default="64")
    common.add_argument("--dropout", type=float, default=0.0)
    common.add_argument("--l2", type=float, default=0.0)
    common.add_argument("--batch-size", type=int, default=256)

    t = sub.add_parser("train", parents=[common])
    t.add_argument("--train", required=True)
    t.add_argument("--test", default=None)
    t.add_argument("--engine", default="dense", choices=["dense", "kernel"],
                   help="dense = autodiff XLA step; kernel = fused Pallas "
                        "trainers (fm/nfm/widedeep streaming, ffm "
                        "full-batch) — the fast path bench.py measures")
    t.add_argument("--partitioned", action="store_true",
                   help="kernel FM/NFM/W&D streaming: store the vocab master "
                        "as id-range PARTITIONS so skewed traffic's hot "
                        "head pays small-table scatter rates (PARITY.md "
                        "partitioned-master row); uniform traffic gains "
                        "nothing — off by default")
    t.add_argument("--stream", action="store_true",
                   help="kernel FFM: minibatch-stream --batch-size rows "
                        "against the vocab-space master table (fused "
                        "one-dispatch step) instead of the full-batch "
                        "count-matrix engine — the PS-scale regime")
    t.add_argument("--kernel-precision", default="exact",
                   choices=["exact", "bf16"],
                   help="kernel engine one-hot matmul precision")
    t.add_argument("--epochs", type=int, default=5)
    t.add_argument("--optimizer", default="adagrad",
                   choices=["sgd", "momentum", "adagrad", "rmsprop", "adadelta", "adam", "ftrl"])
    t.add_argument("--lr", type=float, default=0.05,
                   help="default matches the reference's global "
                        "__global_learning_rate (main.cpp:65). Full-batch "
                        "Adagrad moves every touched weight ~±lr on step "
                        "one, so FFM (thousands of pairwise terms per "
                        "logit) takes a long loss excursion at 0.1 on the "
                        "bundled data; 0.05 and below recover quickly")
    t.add_argument("--grad-clip", type=float, default=0.0)
    t.add_argument("--ckpt", default=None, help="checkpoint output path")
    t.add_argument("--mesh", default=None,
                   help="DATAxMODEL, e.g. 4x2; default single-device jit")
    t.add_argument("--wire", default="f32",
                   choices=["f32", "bf16", "fp16", "int8"],
                   help="gradient/pull exchange precision on the mesh "
                        "wire (parallel.collectives.wire_psum — the "
                        "reference PS ran fp16 on every pull/push; int8 "
                        "exchanges a per-shard fp32 scale alongside). "
                        "Requires --mesh.")
    t.add_argument("--cpu-devices", type=int, default=0,
                   help="force N virtual CPU devices (mesh testing without a pod)")
    t.add_argument("--seed", type=int, default=0)

    s = sub.add_parser("score", parents=[common])
    s.add_argument("--test", required=True)
    s.add_argument("--ckpt", required=True)
    s.add_argument("--engine", default="dense",
                   choices=["dense", "kernel", "grouped"],
                   help="kernel (ffm only): the count-matrix "
                        "formulation for extreme-dedup traffic "
                        "(R << L*K); grouped (ffm only): the grouped "
                        "active-width engine forward-only (PARITY.md "
                        "serving section has the measured trade-offs)")
    s.add_argument("--scan", type=int, default=None,
                   help="stack K batches per device dispatch — the "
                        "dataset-scoring throughput path (2-3x at "
                        "B=4096, PARITY.md serving table)")
    s.add_argument("--n-features", type=int, default=None,
                   help="param-shape vocab; defaults to checkpoint metadata")
    s.add_argument("--n-fields", type=int, default=0)
    s.add_argument("--dump", default=None)

    # dense NN models over label,pixels CSV (reference TEST_CNN/RNN/VAE)
    d = sub.add_parser("train-dense")
    d.add_argument("--model", required=True, choices=["cnn", "rnn", "vae"])
    d.add_argument("--train", required=True)
    d.add_argument("--epochs", type=int, default=10)
    d.add_argument("--batch-size", type=int, default=100)
    d.add_argument("--lr", type=float, default=1e-3)
    d.add_argument("--max-rows", type=int, default=None)
    d.add_argument("--seed", type=int, default=0)

    g = sub.add_parser("gbm")
    g.add_argument("--train", required=True)
    g.add_argument("--rounds", type=int, default=10)
    g.add_argument("--max-depth", type=int, default=6)
    g.add_argument("--n-classes", type=int, default=10)
    g.add_argument("--max-rows", type=int, default=None)
    g.add_argument("--libffm", action="store_true",
                   help="sparse libffm input (missing = absent feature, "
                        "learned default directions) instead of dense CSV")
    g.add_argument("--n-bins", type=int, default=32)
    g.add_argument("--grow-policy", choices=["depthwise", "lossguide"],
                   default="depthwise",
                   help="lossguide = leaf-wise best-gain-first growth")
    g.add_argument("--max-leaves", type=int, default=0,
                   help="lossguide leaf budget (0 = 2**max_depth)")
    g.add_argument("--test", default=None)

    c = sub.add_parser("gmm")
    c.add_argument("--train", required=True)
    c.add_argument("--clusters", type=int, default=100)
    c.add_argument("--dim", type=int, default=10)
    c.add_argument("--epochs", type=int, default=50)
    c.add_argument("--dump", default=None)

    t2 = sub.add_parser("plsa")
    t2.add_argument("--docs", required=True, help="one document per line")
    t2.add_argument("--topics", type=int, default=24)
    t2.add_argument("--vocab-size", type=int, default=5000)
    t2.add_argument("--epochs", type=int, default=200)
    t2.add_argument("--top-words", type=int, default=10)

    # nearest-neighbor retrieval over saved embeddings (reference TEST_ANN:
    # predict/ann_index.h forest query, replaced by exact on-TPU MIPS top-k)
    a = sub.add_parser("ann")
    a.add_argument("--embeddings", required=True,
                   help="`word v0 v1 ...` per line (the `embed --out` format)")
    a.add_argument("--query", default=None,
                   help="comma-separated words to look up")
    a.add_argument("--query-file", default=None,
                   help="file of query words, one per line")
    a.add_argument("--k", type=int, default=10)
    a.add_argument("--metric", default="cos", choices=["ip", "cos", "l2"])
    a.add_argument("--dump", default=None,
                   help="write `query neighbor score` lines")
    a.add_argument("--ivf", type=int, default=0, metavar="N_CLUSTERS",
                   help="two-tier sublinear retrieval: IVF shortlist of "
                        "N_CLUSTERS k-means cells + exact rerank (the "
                        "reference forest's sublinear capability, "
                        "ann_index.h:110-268); 0 = exact scan (default, "
                        "exact recall)")
    a.add_argument("--nprobe", type=int, default=8,
                   help="IVF cells probed per query (--ivf only)")

    e = sub.add_parser("embed")
    e.add_argument("--text", required=True)
    e.add_argument("--vocab", required=True, help="reference vocab format: id word count")
    e.add_argument("--dim", type=int, default=100)
    e.add_argument("--window", type=int, default=6)
    e.add_argument("--epochs", type=int, default=5)
    e.add_argument("--mode", default="negative", choices=["negative", "hsoftmax"])
    e.add_argument("--stream", action="store_true",
                   help="stream the corpus in chunks (larger-than-memory "
                        "corpora; windows do not span chunk boundaries)")
    e.add_argument("--chunk-tokens", type=int, default=1 << 20)
    e.add_argument("--out", default=None)

    args = p.parse_args(argv)

    if getattr(args, "cpu_devices", 0):
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu_devices)

    if args.cmd in ("train-dense", "gbm", "gmm", "plsa", "embed", "ann"):
        return _run_aux_command(args)

    from .data import load_libffm

    if args.cmd == "train":
        from .train.loop import evaluate, train_model

        train_ds = load_libffm(args.train)
        n_features = train_ds.n_features
        if args.mesh:
            from .parallel.sharding import round_up_vocab

            n_features = round_up_vocab(n_features)
        model, cfg = _build_model(args, n_features, train_ds.n_fields)

        if args.wire != "f32" and not args.mesh:
            raise SystemExit("--wire compresses the mesh exchange; it "
                             "requires --mesh")
        if getattr(args, "stream", False):
            # --stream only gates the single-device kernel-FFM branch; in
            # every other combination it would be silently ignored and a
            # user asking for the PS-scale streaming regime would get a
            # different engine (advisor r2) — refuse loudly instead.
            if args.engine != "kernel" or args.model != "ffm":
                raise SystemExit(
                    "--stream requires --engine kernel --model ffm "
                    f"(got engine={args.engine}, model={args.model})")
            if args.mesh:
                raise SystemExit(
                    "--stream is single-device (the sharded kernel "
                    "trainers stream by their own batch planner); drop "
                    "--mesh or drop --stream")
        if args.engine == "kernel":
            if args.model not in ("fm", "nfm", "ffm", "widedeep"):
                raise SystemExit(f"--engine kernel supports fm/nfm/ffm/"
                                 f"widedeep, not {args.model}")
            if args.partitioned and (
                    args.model not in ("fm", "nfm", "widedeep")
                    or args.mesh):
                raise SystemExit(
                    "--partitioned is the single-chip kernel FM/NFM/W&D "
                    "streaming master layout (use --model fm|nfm|"
                    "widedeep without --mesh)")
            if args.model == "widedeep" and args.mesh:
                raise SystemExit(
                    "kernel W&D shards via parallel.sharded_kernel."
                    "make_sharded_streaming_wd_step (library API); the "
                    "CLI engine is single-chip — drop --mesh or use the "
                    "dense trainer")
            from .train.kernel_engine import KERNEL_ENGINES
            from .train.loop import evaluate

            exact = args.kernel_precision == "exact"
            kw = dict(factor=args.factor, learning_rate=args.lr, l2=args.l2,
                      epochs=args.epochs, seed=args.seed, exact=exact)
            if args.mesh:
                # sharded streaming kernel trainers: master tables
                # row-sharded over `model`, positions over `data` (FM)
                from .parallel import make_mesh

                d, m = (int(x) for x in args.mesh.split("x"))
                kw["mesh"] = make_mesh(data=d, model=m)
                kw["wire"] = args.wire
            if args.model == "fm":
                kw.update(batch_size=args.batch_size,
                          partitioned=args.partitioned,
                          wide_optimizer=("ftrl" if args.optimizer == "ftrl"
                                          else "adagrad"))
            elif args.model == "nfm":
                if args.optimizer != "adagrad":
                    raise SystemExit(
                        "kernel NFM fixes the wide/embedding optimizer "
                        "to Adagrad (reference tower semantics, "
                        "PARITY.md); --optimizer has no effect here — "
                        "drop it or use --engine dense")
                hidden = tuple(int(h) for h in args.hidden.split(",") if h)
                kw.update(batch_size=args.batch_size, hidden=hidden,
                          partitioned=args.partitioned)
            elif args.model == "widedeep":
                if args.optimizer != "adagrad":
                    raise SystemExit(
                        "kernel W&D fixes the wide/embedding optimizer "
                        "to Adagrad (server-side-update semantics); "
                        "--optimizer has no effect here — drop it or "
                        "use --engine dense")
                hidden = tuple(int(h) for h in args.hidden.split(",") if h)
                kw.pop("factor", None)
                kw.update(batch_size=args.batch_size, hidden=hidden,
                          embed_dim=args.factor,
                          partitioned=args.partitioned)
            elif args.model == "ffm" and args.stream:
                kw.update(batch_size=args.batch_size)
            params, _ = KERNEL_ENGINES[args.model](train_ds, **kw)

            print("train:", json.dumps(
                evaluate(model, cfg, params, train_ds, args.batch_size)))
            if args.test:
                test_ds = load_libffm(
                    args.test, n_features=train_ds.n_features,
                    n_fields=train_ds.n_fields)
                print("test:", json.dumps(
                    evaluate(model, cfg, params, test_ds, args.batch_size)))
            if args.ckpt:
                from .train.checkpoint import save_checkpoint

                save_checkpoint(args.ckpt, params, {
                    "model": args.model,
                    "n_features": cfg.n_features,
                    "n_features_data": train_ds.n_features,
                    "n_fields": train_ds.n_fields,
                    "engine": "kernel",
                })
                print(f"saved checkpoint to {args.ckpt}.npz")
            return

        tx = _build_optimizer(args)

        if args.mesh:
            from .parallel import make_mesh, make_sharded_train_step, partition_batch
            from .parallel.sharding import init_sharded_state
            from .data.batching import sparse_batches

            d, m = (int(x) for x in args.mesh.split("x"))
            mesh = make_mesh(data=d, model=m)
            state = init_sharded_state(model, cfg, tx, mesh, seed=args.seed)
            if args.wire != "f32":
                # explicit shard_map step with the gradient exchange at
                # wire precision (the reference PS's fp16-on-every-
                # pull/push, buffer.h:141-173, as a user-facing flag).
                # Data-parallel: params replicate, so the model axis
                # must be 1.
                if m != 1:
                    raise SystemExit(
                        "--wire on the dense engine is data-parallel "
                        f"(params replicated); use --mesh {d * m}x1 or "
                        "--engine kernel for sharded tables + wire")
                from .parallel.collectives import (
                    WIRE_DTYPES,
                    make_compressed_train_step,
                )

                step = make_compressed_train_step(
                    model, cfg, tx, mesh, wire_dtype=WIRE_DTYPES[args.wire])
            else:
                step = make_sharded_train_step(model, cfg, tx, mesh)
            import numpy as np

            rng = np.random.default_rng(args.seed)
            for epoch in range(args.epochs):
                losses = []
                for b in sparse_batches(train_ds, args.batch_size, rng=rng):
                    state, loss = step(state, partition_batch(b, mesh))
                    losses.append(float(loss))
                print(f"epoch {epoch}: loss={sum(losses)/len(losses):.5f}")
        else:
            state = train_model(
                model, cfg, train_ds, tx,
                epochs=args.epochs, batch_size=args.batch_size, seed=args.seed,
            )

        metrics = evaluate(model, cfg, state.params, train_ds, args.batch_size)
        print("train:", json.dumps(metrics))
        if args.test:
            test_ds = load_libffm(
                args.test, n_features=train_ds.n_features, n_fields=train_ds.n_fields
            )
            print("test:", json.dumps(
                evaluate(model, cfg, state.params, test_ds, args.batch_size)))
        if args.ckpt:
            from .train.checkpoint import save_checkpoint

            # n_features records the PARAM-shape vocabulary (rounded up
            # under --mesh) so `score` can rebuild matching shapes;
            # n_features_data keeps the raw dataset vocab.
            save_checkpoint(args.ckpt, state.params, {
                "model": args.model,
                "n_features": cfg.n_features,
                "n_features_data": train_ds.n_features,
                "n_fields": train_ds.n_fields,
            })
            print(f"saved checkpoint to {args.ckpt}.npz")

    elif args.cmd == "score":
        import jax

        from .serve.scorer import batch_score
        from .train.checkpoint import checkpoint_metadata, load_checkpoint

        n_features, n_fields = args.n_features, args.n_fields
        if n_features is None or not n_fields:
            try:
                meta = checkpoint_metadata(args.ckpt)
            except FileNotFoundError:
                meta = {}
            if n_features is None:
                n_features = meta.get("n_features")
            n_fields = n_fields or meta.get("n_fields", 0)
        if n_features is None:
            raise SystemExit("--n-features required (no checkpoint metadata found)")
        model, cfg = _build_model(args, n_features, n_fields)
        template = model.init(jax.random.PRNGKey(0), cfg)
        params = load_checkpoint(args.ckpt, template)
        test_ds = load_libffm(args.test, n_features=n_features, n_fields=max(n_fields, 1))
        if args.engine in ("kernel", "grouped") and args.model != "ffm":
            raise SystemExit(f"score --engine {args.engine} supports ffm only")
        if args.scan and args.engine != "dense":
            raise SystemExit("score --scan uses the dense forward "
                             "(--engine dense)")
        metrics = batch_score(model, cfg, params, test_ds,
                              batch_size=args.batch_size,
                              dump_path=args.dump, engine=args.engine,
                              scan=args.scan)
        print(json.dumps(metrics))


def _run_aux_command(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cmd == "train-dense":
        from . import optim
        from .data import dense_batches, load_dense_csv
        from .models import cnn, rnn, vae

        x, y, k = load_dense_csv(args.train, max_rows=args.max_rows)
        module = {"cnn": cnn, "rnn": rnn, "vae": vae}[args.model]
        if args.model == "cnn":
            cfg = cnn.CNNConfig(n_classes=k)
        elif args.model == "rnn":
            cfg = rnn.RNNConfig(n_classes=k)
        else:
            cfg = vae.VAEConfig(input_dim=x.shape[1])
        rng = jax.random.PRNGKey(args.seed)
        rng, ir = jax.random.split(rng)
        params = module.init(ir, cfg)
        tx = optim.adam(args.lr)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, rng, batch):
            rng, sub = jax.random.split(rng)
            loss, grads = jax.value_and_grad(module.loss)(params, batch, cfg, sub)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optim.apply_updates(params, updates), opt_state, rng, loss

        np_rng = np.random.default_rng(args.seed)
        for epoch in range(args.epochs):
            losses = []
            for b in dense_batches(x, y, args.batch_size, rng=np_rng):
                b = {kk: jnp.asarray(v) for kk, v in b.items()}
                params, opt_state, rng, loss = step(params, opt_state, rng, b)
                losses.append(float(loss))
            msg = f"epoch {epoch}: loss={np.mean(losses):.5f}"
            if hasattr(module, "accuracy"):
                acc = float(module.accuracy(
                    params, {"x": jnp.asarray(x), "y": jnp.asarray(y)}, cfg))
                msg += f" acc={acc:.4f}"
            print(msg)

    elif args.cmd == "gbm":
        from .models.gbm import GBM, GBMConfig, SparseGBM

        if args.libffm:
            import json as _json

            from .data import load_libffm
            from .utils.metrics import accuracy, auc, logloss

            def _metrics(p, labels):
                return {"auc": float(auc(p, labels)),
                        "logloss": float(logloss(p, labels)),
                        "accuracy": float(accuracy(p, labels))}

            ds = load_libffm(args.train)
            cfg = GBMConfig(n_rounds=args.rounds, max_depth=args.max_depth,
                            n_bins=args.n_bins, n_classes=2,
                            grow_policy=args.grow_policy,
                            max_leaves=args.max_leaves)
            model = SparseGBM(cfg).fit(ds, ds.labels, log=print)
            p = model.predict_proba(ds)[:, 1]
            print("train:", _json.dumps(_metrics(p, ds.labels)))
            if args.test:
                test = load_libffm(args.test, n_features=ds.n_features,
                                   n_fields=ds.n_fields)
                pt = model.predict_proba(test)[:, 1]
                print("test:", _json.dumps(_metrics(pt, test.labels)))
        else:
            from .data import load_dense_csv

            x, y, k = load_dense_csv(args.train, max_rows=args.max_rows)
            n_classes = max(args.n_classes, k)
            cfg = GBMConfig(n_rounds=args.rounds, max_depth=args.max_depth,
                            n_classes=n_classes,
                            grow_policy=args.grow_policy,
                            max_leaves=args.max_leaves)
            model = GBM(cfg).fit(x, y, log=print)
            acc = (model.predict(x) == y).mean()
            print(f"final train accuracy: {acc:.4f}")

    elif args.cmd == "gmm":
        from .data.dense import load_cluster_data
        from .models import gmm

        x = load_cluster_data(args.train, args.dim)
        cfg = gmm.GMMConfig(n_clusters=args.clusters, dim=args.dim)
        state, ll = gmm.fit(x, cfg, epochs=args.epochs, log=print)
        labels = np.asarray(gmm.predict(state, x))
        print(f"loglik={ll:.4f}, clusters used={len(np.unique(labels))}")
        if args.dump:
            np.savetxt(args.dump, labels, fmt="%d")
            print(f"assignments -> {args.dump}")

    elif args.cmd == "plsa":
        from .data.prep import text_to_bow
        from .models import plsa

        docs = [line for line in open(args.docs) if line.strip()]
        counts, vocab = text_to_bow(docs, max_vocab=args.vocab_size)
        cfg = plsa.PLSAConfig(n_topics=args.topics, n_words=len(vocab))
        state, ll = plsa.fit(counts, cfg, epochs=args.epochs)
        print(f"loglik={ll:.2f}")
        tw = np.asarray(plsa.top_words(state, k=args.top_words))
        for t in range(args.topics):
            print(f"topic {t}: " + " ".join(vocab[i] for i in tw[t]))

    elif args.cmd == "embed":
        from .data.prep import tokens_from_text
        from .models import embedding as emb

        words, counts = emb.load_vocab(args.vocab)
        cfg = emb.CBOWConfig(vocab_size=len(words), dim=args.dim,
                             window=args.window, mode=args.mode)
        if args.stream:
            from .data.prep import token_chunks_from_text

            params = emb.train_cbow_streaming(
                lambda ep: token_chunks_from_text(
                    args.text, words, args.chunk_tokens),
                counts, cfg, epochs=args.epochs, log=print)
        else:
            tokens = tokens_from_text(args.text, words)
            params = emb.train_cbow(tokens, counts, cfg, epochs=args.epochs,
                                    log=print)
        if args.out:
            emb.save_embeddings(args.out, params, words)
            print(f"embeddings -> {args.out}")

    elif args.cmd == "ann":
        from .models.embedding import load_embeddings
        from .serve.ann import MIPSIndex

        words, emb_mat = load_embeddings(args.embeddings)
        word_to_row = {w: i for i, w in enumerate(words)}
        queries = []
        if args.query:
            queries += [w for w in args.query.split(",") if w]
        if args.query_file:
            queries += [line.strip() for line in open(args.query_file)
                        if line.strip()]
        if not queries:
            raise SystemExit("ann: provide --query or --query-file")
        unknown = [w for w in queries if w not in word_to_row]
        if unknown:
            raise SystemExit(f"ann: words not in the embedding file: {unknown}")
        rows = np.asarray([word_to_row[w] for w in queries], np.int64)
        # k+1 then drop the query row itself (it is its own best match
        # under ip/cos — the reference forest returns it too, ann_index.h
        # query over the full point set)
        k_q = min(args.k + 1, len(words))
        if args.ivf:
            from .serve.ann import IVFIndex

            index = IVFIndex(emb_mat,
                             n_clusters=min(args.ivf, len(words) // 4 or 1))
            scores, ids = index.query(emb_mat[rows], k=k_q,
                                      nprobe=args.nprobe, metric=args.metric)
        else:
            index = MIPSIndex(emb_mat)
            scores, ids = index.query(emb_mat[rows], k=k_q,
                                      metric=args.metric)
        scores, ids = np.asarray(scores), np.asarray(ids)
        out_lines = []
        for qi, w in enumerate(queries):
            pairs = [(words[j], s) for j, s in zip(ids[qi], scores[qi])
                     if j != rows[qi]][: args.k]
            print(f"{w}: " + " ".join(f"{n}({s:.4f})" for n, s in pairs))
            out_lines += [f"{w} {n} {s:.6f}" for n, s in pairs]
        if args.dump:
            with open(args.dump, "w") as f:
                f.write("\n".join(out_lines) + "\n")
            print(f"neighbors -> {args.dump}")


if __name__ == "__main__":
    main()
