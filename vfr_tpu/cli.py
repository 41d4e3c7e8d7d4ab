"""CLI entry points (SURVEY.md C16/L4): train / eval / corpus.

    python -m vfr_tpu.cli train  --preset didemo_fusion --epochs 20
    python -m vfr_tpu.cli eval   --preset didemo_fusion --protocol didemo_official
    python -m vfr_tpu.cli corpus --preset corpus_didemo --shards 8

Presets are the five driver configs (BASELINE.json:6-12); any flag given on
the command line overrides the preset.  With no real data under --data-dir
the synthetic fixture is used (and says so).
"""

from __future__ import annotations

import argparse
import dataclasses
import sys

import jax

from vfr_tpu.config import PRESETS, get_preset


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="vfr_tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--preset", default="didemo_rgb", choices=sorted(PRESETS))
        sp.add_argument("--data-dir", default=None)
        sp.add_argument("--checkpoint-dir", default=None)
        sp.add_argument("--batch-size", type=int, default=None)
        sp.add_argument("--seed", type=int, default=None)
        sp.add_argument("--metrics-path", default=None)
        sp.add_argument("--bank-dtype", default=None,
                        choices=("float32", "bfloat16"),
                        help="device feature-bank storage dtype; bfloat16 "
                             "halves the one-time bank upload + bank HBM "
                             "(inputs quantized, compute unchanged — "
                             "DESIGN 20)")
        sp.add_argument("--compute-dtype", default=None,
                        choices=["float32", "bfloat16"])

    t = sub.add_parser("train", help="run the training loop")
    common(t)
    t.add_argument("--epochs", type=int, default=None)
    t.add_argument("--lr", type=float, default=None)
    t.add_argument("--margin", type=float, default=None)
    t.add_argument("--loss-type", default=None,
                   choices=["triplet", "infonce"],
                   help="objective: reference-lineage max-margin triplet "
                        "or softmax contrastive (InfoNCE) over the same "
                        "[B,B,P] cross-distance tensor")
    t.add_argument("--temperature", type=float, default=None,
                   help="infonce softmax temperature over -distance/tau")
    t.add_argument("--learn-temperature", action="store_true",
                   help="infonce: train tau as a parameter (CLIP-style "
                        "log-temperature, initialized at --temperature; "
                        "measured: matches fixed tau only when initialized "
                        "at the optimum, docs/DESIGN.md 29)")
    t.add_argument("--temperature-final", type=float, default=None,
                   help="infonce: cosine-anneal tau from --temperature to "
                        "this value over training (soft early / sharp "
                        "late; avoids the low-tau stall, DESIGN 29)")
    t.add_argument("--ema-decay", type=float, default=None,
                   help="Polyak-average the params (ema <- d*ema + "
                        "(1-d)*params each step); eval/serving read the "
                        "average, raw params keep training (0 = off)")
    t.add_argument("--resume", action="store_true")
    t.add_argument("--data-parallel", action="store_true",
                   help="shard the batch over all local devices")
    t.add_argument("--trace-dir", default=None,
                   help="capture a jax.profiler trace of the train loop")
    t.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans (debug-mode sanitizer)")
    t.add_argument("--hard-negatives", type=int, default=None,
                   help="mined hard inter-video negatives per query "
                        "(0 = off; mining re-ranks the corpus index every "
                        "--hard-negative-refresh epochs)")
    t.add_argument("--hard-negative-refresh", type=int, default=None,
                   help="epochs between hard-negative re-mining passes")
    t.add_argument("--best-metric", default=None,
                   help="track the best val checkpoint by this eval metric "
                        "(e.g. R@1_tiou0.5, mIoU): every improving eval "
                        "rolls <checkpoint-dir>/best.msgpack; open it with "
                        "eval/corpus/serve/index --best")
    t.add_argument("--eval-every", type=int, default=None,
                   help="epochs between val-metric evals (last epoch always "
                        "evaluates; at spec scale per-epoch eval is ~29%% "
                        "of train wall — DESIGN 18)")
    t.add_argument("--steps-per-call", type=int, default=None,
                   help="optimizer steps fused per dispatched program "
                        "(0 = log_every_steps); one metrics fetch per call")

    def best_flag(sp):
        sp.add_argument("--best", action="store_true",
                        help="open <checkpoint-dir>/best.msgpack (tracked "
                             "by train --best-metric) instead of the "
                             "latest step checkpoint")

    e = sub.add_parser("eval", help="per-video localization eval")
    common(e)
    best_flag(e)
    e.add_argument("--protocol", default=None,
                   choices=["threshold", "didemo_official"])

    c = sub.add_parser("corpus", help="corpus-level retrieval eval")
    common(c)
    best_flag(c)
    c.add_argument("--shards", type=int, default=None,
                   help="devices to shard the moment index over")
    c.add_argument("--topk", type=int, default=None)
    c.add_argument("--num-videos", type=int, default=None)
    c.add_argument("--topk-method", default=None,
                   choices=["exact", "approx", "fused"])
    c.add_argument("--index-dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="moment-index storage dtype (bf16 halves the HBM "
                        "bytes of the distance stage)")
    c.add_argument("--coarse-dim", type=int, default=None,
                   help="evaluate through the two-stage coarse-to-fine "
                        "retriever at this PCA rank (0/absent = exact "
                        "full scan)")
    c.add_argument("--coarse-candidates", type=int, default=None,
                   help="stage-1 survivors per query for --coarse-dim")
    c.add_argument("--coarse-mode", choices=["blockmax", "centroid"],
                   default=None,
                   help="stage-1 selection: exact per-block maxima "
                        "(blockmax) or IVF-style centroid ranking "
                        "(centroid, ~128x cheaper stage 1)")

    s = sub.add_parser("serve", help="answer free-text queries against the "
                       "cached moment index (one JSON line per query)")
    common(s)
    best_flag(s)
    s.add_argument("--queries", required=True,
                   help="text file with one query per line, or '-' for stdin")
    s.add_argument("--shards", type=int, default=None)
    s.add_argument("--topk", type=int, default=10)
    s.add_argument("--num-videos", type=int, default=None)
    s.add_argument("--topk-method", default=None,
                   choices=["exact", "approx", "fused"])
    s.add_argument("--index-dtype", default=None,
                   choices=["float32", "bfloat16"])
    s.add_argument("--index-path", default=None,
                   help="load a prebuilt moment index (see the `index` "
                        "subcommand) instead of re-embedding the corpus")
    s.add_argument("--coarse-path", default=None,
                   help="load a prebuilt coarse (PCA prefilter) index and "
                        "serve through the two-stage coarse-to-fine "
                        "retriever — OPT-IN recall/bytes trade: up to "
                        "1.86x the exact scan at 2.1M rows but with "
                        "measured recall cost (artifacts/"
                        "coarse_scale.json, DESIGN 21); the exact scan "
                        "is the recommended default at every scale")
    s.add_argument("--coarse-dim", type=int, default=None,
                   help="build the coarse prefilter in-process at this "
                        "rank (alternative to --coarse-path)")
    s.add_argument("--coarse-mode", choices=["blockmax", "centroid"],
                   default="blockmax",
                   help="stage-1 selection for the coarse path")
    s.add_argument("--coarse-candidates", type=int, default=2048,
                   help="stage-1 survivors per query re-scored exactly in "
                        "stage 2 (recall rises with it; stage-2 bytes "
                        "scale linearly)")
    s.add_argument("--follow", action="store_true",
                   help="daemon mode: answer stdin queries line by line "
                        "(one JSON line per query, flushed immediately) "
                        "against the cached index until EOF")
    s.add_argument("--live-arena", default=None,
                   help="--follow only: boot the live index from an arena "
                        "snapshot (written by the '!save <path>' control "
                        "line) instead of embedding the corpus — restart "
                        "keeps every prior !add/!remove")
    s.add_argument("--live-capacity-videos", type=int, default=0,
                   help="--follow only: serve from a capacity-padded LIVE "
                        "index that grows while the daemon runs — control "
                        "lines '!add <delta.npz>' (video_ids + rgb[/flow/"
                        "durations] arrays), '!remove <id> ...', '!save "
                        "<path>', '!compact' (reclaim tombstones + free "
                        "ids), '!grow <capacity_videos>' (one retriever "
                        "recompile). Appends/removes/compaction never "
                        "recompile (eval/live.py). Value = initial max "
                        "corpus size in videos. Composes with --shards "
                        "(row-sharded arena); exact/approx scan (no "
                        "coarse/--index-path).")
    s.add_argument("--micro-batch", type=int, default=8,
                   help="--follow only: max queries packed into one "
                        "dispatch. Per-request cost on this runtime is "
                        "fetch-dominated, so a backlogged daemon's "
                        "throughput scales ~linearly with this (measured "
                        "in artifacts/serve_latency.json); isolated "
                        "latency is unaffected. One program compile per "
                        "distinct value.")
    s.add_argument("--length-buckets", default=None,
                   help="batch mode only: group queries by token length "
                        "and run each group with the sequence axis sliced "
                        "to its bucket — the encode recurrence pays the "
                        "bucket's T, not max_query_len. 'auto' = "
                        "multiples of 8 up to max_query_len, or an "
                        "explicit list '8,16'. Results are bit-identical "
                        "to unbucketed serving (sliced steps are "
                        "frozen-carry no-ops); cost is one compiled "
                        "specialization per distinct (batch-count, T).")

    ix = sub.add_parser("index", help="build and save the cached "
                        "moment-embedding index for fast serving startup")
    common(ix)
    best_flag(ix)
    ix.add_argument("--out", required=True, help="output .npz path")
    ix.add_argument("--num-videos", type=int, default=None)
    ix.add_argument("--index-dtype", default=None,
                    choices=["float32", "bfloat16"])
    ix.add_argument("--coarse-dim", type=int, default=0,
                    help="also build + save a rank-N PCA prefilter next to "
                         "the index (<out>.coarse.npz) for two-stage "
                         "serving (`serve --coarse-path`)")

    k = sub.add_parser("pack", help="convert an .npz feature dump to the "
                       "packed mmap .vfrf format (native fast loader)")
    k.add_argument("--npz", required=True)
    k.add_argument("--out", required=True)
    k.add_argument("--rows", type=int, default=0,
                   help="static row grid (0 = max rows over videos)")
    return p


def apply_overrides(cfg, args):
    data, model, train, ev = cfg.data, cfg.model, cfg.train, cfg.eval
    if args.data_dir is not None:
        data = dataclasses.replace(data, data_dir=args.data_dir)
    if getattr(args, "bank_dtype", None) is not None:
        data = dataclasses.replace(data, bank_dtype=args.bank_dtype)
    if args.compute_dtype is not None:
        model = dataclasses.replace(model, compute_dtype=args.compute_dtype)
    tkw = {}
    if args.checkpoint_dir is not None:
        tkw["checkpoint_dir"] = args.checkpoint_dir
    if args.batch_size is not None:
        tkw["batch_size"] = args.batch_size
    if args.seed is not None:
        tkw["seed"] = args.seed
    if args.metrics_path is not None:
        tkw["metrics_path"] = args.metrics_path
    if getattr(args, "epochs", None) is not None:
        tkw["num_epochs"] = args.epochs
    if getattr(args, "lr", None) is not None:
        tkw["learning_rate"] = args.lr
    if getattr(args, "margin", None) is not None:
        tkw["margin"] = args.margin
    if getattr(args, "loss_type", None) is not None:
        tkw["loss_type"] = args.loss_type
    if getattr(args, "temperature", None) is not None:
        tkw["temperature"] = args.temperature
    if getattr(args, "learn_temperature", False):
        tkw["learn_temperature"] = True
    if getattr(args, "temperature_final", None) is not None:
        tkw["temperature_final"] = args.temperature_final
    if getattr(args, "ema_decay", None) is not None:
        tkw["ema_decay"] = args.ema_decay
    if getattr(args, "hard_negatives", None) is not None:
        tkw["hard_negative_count"] = args.hard_negatives
    if getattr(args, "hard_negative_refresh", None) is not None:
        tkw["hard_negative_refresh_epochs"] = args.hard_negative_refresh
    if getattr(args, "eval_every", None) is not None:
        tkw["eval_every_epochs"] = args.eval_every
    if getattr(args, "steps_per_call", None) is not None:
        tkw["steps_per_call"] = args.steps_per_call
    if getattr(args, "best_metric", None) is not None:
        tkw["best_metric"] = args.best_metric
    if tkw:
        train = dataclasses.replace(train, **tkw)
    ekw = {}
    if getattr(args, "protocol", None) is not None:
        ekw["protocol"] = args.protocol
    if getattr(args, "shards", None) is not None:
        ekw["corpus_shards"] = args.shards
    if getattr(args, "topk", None) is not None:
        ekw["corpus_topk"] = args.topk
    if getattr(args, "num_videos", None) is not None:
        ekw["corpus_num_videos"] = args.num_videos
    if getattr(args, "topk_method", None) is not None:
        ekw["topk_method"] = args.topk_method
    if getattr(args, "index_dtype", None) is not None:
        ekw["index_dtype"] = args.index_dtype
    if args.cmd == "corpus" and getattr(args, "coarse_dim", None) is not None:
        ekw["coarse_dim"] = args.coarse_dim
    if args.cmd == "corpus" and getattr(args, "coarse_candidates",
                                        None) is not None:
        ekw["coarse_candidates"] = args.coarse_candidates
    if args.cmd == "corpus" and getattr(args, "coarse_mode",
                                        None) is not None:
        ekw["coarse_mode"] = args.coarse_mode
    if getattr(args, "bank_dtype", None) is not None:
        ekw["bank_dtype"] = args.bank_dtype
    if ekw:
        ev = dataclasses.replace(ev, **ekw)
    return dataclasses.replace(cfg, data=data, model=model, train=train, eval=ev)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    # one process per CLI invocation: without the persistent cache every
    # run re-pays 40-120 s of remote compile per executable (DESIGN 19)
    from vfr_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    if args.cmd == "pack":
        import numpy as np

        from vfr_tpu.data.packed import pack_features

        try:
            with np.load(args.npz) as z:
                table = {k: z[k] for k in z.files}
        except FileNotFoundError:
            print(f"error: feature archive not found: {args.npz}",
                  file=sys.stderr)
            return 2
        path = pack_features(table, args.out, rows=args.rows or None)
        print(f"packed {len(table)} videos -> {path}")
        return 0

    cfg = apply_overrides(get_preset(args.preset), args)

    if args.cmd == "train":
        from vfr_tpu.parallel.mesh import make_mesh
        from vfr_tpu.train.loop import train
        from vfr_tpu.utils.profiling import maybe_trace

        if args.debug_nans:
            jax.config.update("jax_debug_nans", True)
        mesh = None
        if args.data_parallel:
            if len(jax.devices()) > 1:
                mesh = make_mesh(("data",))
            else:
                print(
                    "[warn] --data-parallel requested but only 1 device is "
                    "visible; running single-chip (no DP mesh)",
                    file=sys.stderr,
                )
        with maybe_trace(args.trace_dir):
            _, metrics = train(cfg, resume=args.resume, mesh=mesh)
        print({k: round(v, 4) for k, v in metrics.items()})
        return 0

    if args.cmd == "eval":
        from vfr_tpu.eval.moment_eval import evaluate
        from vfr_tpu.train.loop import load_for_eval

        params, model, bundle = load_for_eval(cfg, prefer_best=args.best)
        metrics = evaluate(params, model, bundle.val, cfg.eval)
        print({k: round(v, 4) for k, v in metrics.items()})
        return 0

    if args.cmd == "corpus":
        from vfr_tpu.eval.corpus import corpus_evaluate
        from vfr_tpu.parallel.mesh import make_mesh
        from vfr_tpu.train.loop import load_for_eval

        params, model, bundle = load_for_eval(cfg, prefer_best=args.best)
        mesh = None
        shards = cfg.eval.corpus_shards
        if shards > 1 and len(jax.devices()) >= shards:
            mesh = make_mesh(("corpus",), shape=(shards,))
        metrics = corpus_evaluate(params, model, bundle.val, cfg.eval, mesh=mesh)
        print({k: round(v, 4) for k, v in metrics.items()})
        return 0

    if args.cmd == "index":
        from vfr_tpu.eval.corpus import build_moment_index, save_index
        from vfr_tpu.train.loop import load_for_eval

        params, model, bundle = load_for_eval(cfg, prefer_best=args.best)
        index = build_moment_index(
            params, model, bundle.val,
            num_videos=cfg.eval.corpus_num_videos,
            index_dtype=cfg.eval.index_dtype,
        )
        path = save_index(index, args.out)
        print(f"indexed {index.num_videos} videos "
              f"({index.num_rows} moments, {index.m.dtype}) -> {path}")
        if args.coarse_dim > 0:
            from vfr_tpu.eval.coarse import build_coarse_index, save_coarse

            coarse = build_coarse_index(index, d_coarse=args.coarse_dim)
            cpath = save_coarse(
                coarse, path[: -len(".npz")] + ".coarse.npz")
            print(f"coarse prefilter rank {coarse.d_coarse} -> {cpath}")
        return 0

    if args.cmd == "serve":
        import json

        from vfr_tpu.eval.corpus import load_index, serve_queries
        from vfr_tpu.parallel.mesh import make_mesh
        from vfr_tpu.train.loop import load_for_eval

        params, model, bundle = load_for_eval(cfg, prefer_best=args.best)
        index = load_index(args.index_path) if args.index_path else None
        coarse = None
        if args.coarse_path:
            if index is None:
                print("error: --coarse-path needs --index-path (the coarse "
                      "file stores only the prefilter; stage-2 operands "
                      "come from the moment index)", file=sys.stderr)
                return 2
            from vfr_tpu.eval.coarse import load_coarse

            coarse = load_coarse(args.coarse_path, index)
        coarse_kw = dict(coarse=coarse,
                         coarse_dim=args.coarse_dim or 0,
                         coarse_candidates=args.coarse_candidates,
                         coarse_mode=args.coarse_mode)

        if args.follow:
            import contextlib

            from vfr_tpu.eval.corpus import serve_follow
            from vfr_tpu.parallel.mesh import make_mesh

            mesh = None
            shards = cfg.eval.corpus_shards
            if shards > 1 and len(jax.devices()) >= shards:
                mesh = make_mesh(("corpus",), shape=(shards,))

            live = None
            if args.live_capacity_videos > 0 or args.live_arena:
                from vfr_tpu.eval.live import load_arena, make_live_index

                if index is not None or \
                        coarse_kw.get("coarse") is not None:
                    print("error: live serving is exact serving over its "
                          "own arena (no --index-path/--coarse-path)",
                          file=sys.stderr)
                    return 2
                # --shards composes: the arena is built/loaded row-sharded
                # over the corpus mesh and grows there (eval/live.py)
                if args.live_arena:
                    live = load_arena(args.live_arena, params=params,
                                      model=model, mesh=mesh)
                else:
                    live = make_live_index(
                        params, model, bundle.val,
                        capacity_videos=args.live_capacity_videos,
                        num_videos=cfg.eval.corpus_num_videos,
                        index_dtype=cfg.eval.index_dtype,
                        mesh=mesh)
            with contextlib.ExitStack() as stack:
                if args.queries == "-":
                    src = sys.stdin
                else:
                    src = stack.enter_context(
                        open(args.queries, "r", encoding="utf-8"))
                lines = (s for s in (l.strip() for l in src) if s)
                for rec in serve_follow(
                    params, model, bundle.val, bundle.vocab, lines,
                    k=args.topk,
                    max_query_len=cfg.data.max_query_len,
                    num_videos=cfg.eval.corpus_num_videos,
                    topk_method=cfg.eval.topk_method,
                    approx_recall=cfg.eval.approx_recall,
                    index_dtype=cfg.eval.index_dtype,
                    index=index,
                    micro_batch=max(args.micro_batch, 1),
                    mesh=mesh,
                    live=live,
                    **coarse_kw,
                ):
                    print(json.dumps(rec), flush=True)
            return 0

        if args.queries == "-":
            queries = [l.strip() for l in sys.stdin if l.strip()]
        else:
            with open(args.queries, "r", encoding="utf-8") as f:
                queries = [l.strip() for l in f if l.strip()]
        mesh = None
        shards = cfg.eval.corpus_shards
        if shards > 1 and len(jax.devices()) >= shards:
            mesh = make_mesh(("corpus",), shape=(shards,))
        for rec in serve_queries(
            params, model, bundle.val, bundle.vocab, queries,
            k=args.topk, mesh=mesh,
            batch_size=cfg.eval.corpus_query_batch,
            max_query_len=cfg.data.max_query_len,
            num_videos=cfg.eval.corpus_num_videos,
            topk_method=cfg.eval.topk_method,
            approx_recall=cfg.eval.approx_recall,
            index_dtype=cfg.eval.index_dtype,
            index=index,
            length_buckets=args.length_buckets,
            **coarse_kw,
        ):
            print(json.dumps(rec))
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
