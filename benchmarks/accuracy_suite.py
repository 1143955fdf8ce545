"""Multi-object synthetic accuracy table — the framework's stand-in for
the reference's YCB result tables (reference README.md:53,89) in an
environment without YCB data.

For each object: on-device DR training -> hard-video tracking (textured
valid-depth background, sweeping partial occluder, depth dropout) ->
ADD / ADD-S VOCap AUC. Writes a JSON table + a markdown summary.

Run (TPU, ~17 min/object at default steps — batch 200 x 5k steps
= 1M DR pairs/object, the measured convergence scale for hard videos):
    python benchmarks/accuracy_suite.py --steps 5000 --frames 120 \
        --out benchmarks/accuracy_suite_results.json
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--objects", default="cube,box,lshape,icosahedron")
    p.add_argument("--steps", type=int, default=5_000)
    p.add_argument("--frames", type=int, default=120)
    p.add_argument("--batch", type=int, default=200)
    p.add_argument("--res", type=int, default=176)
    p.add_argument("--clean", action="store_true",
                   help="clean test videos (no background/occluder)")
    p.add_argument("--ensemble", action="store_true",
                   help="train all objects simultaneously in ONE program "
                        "per step (same recipe per object; one compile + "
                        "one stats pass + a single resumable run — on one "
                        "chip per-object throughput matches sequential "
                        "via lax.map; true object-parallelism needs a "
                        "multi-chip ('obj','dp') mesh)")
    p.add_argument("--ensemble_ckpt_dir", default=None,
                   help="with --ensemble: checkpoint the full ensemble "
                        "train state here every 1000 steps so an "
                        "interrupted multi-hour run resumes instead of "
                        "restarting (multi-GB for big ensembles)")
    p.add_argument("--domain_shift", action="store_true",
                   help="also evaluate on domain-SHIFTED videos: "
                        "different lighting than the tracker's render, "
                        "photometric drift, sensor-model depth, motion "
                        "blur, PoseCNN-grade noisy init "
                        "(eval/domain_shift.py)")
    p.add_argument("--long_horizon", type=int, default=0,
                   help="also run the closed-loop long-horizon protocol "
                        "(ReinitPolicy + noisy external re-init) over "
                        "this many frames on EVERY object")
    p.add_argument("--shift_sweep", default="",
                   help="comma-separated severities (e.g. 0.5,1,2,4) for "
                        "the AUC-vs-severity domain-shift sweep on the "
                        "--sweep_objects (textured objects add a "
                        "texture-hostile row)")
    p.add_argument("--sweep_objects", default="cube,lshape,textured_box",
                   help="objects the severity sweep runs on")
    p.add_argument("--recovery", default="",
                   help="comma-separated objects that also run the "
                        "long-horizon protocol with a FORCED 15-frame "
                        "full-occlusion burst: detection latency + "
                        "post-recovery AUC (needs --long_horizon)")
    p.add_argument("--live_recovery", default="",
                   help="comma-separated objects that run the forced "
                        "burst through the LIVE path (StreamTracker + "
                        "background-fetch ReinitPolicy + on_track_lost) "
                        "— latency quantized by patience x refetch_every "
                        "(needs --long_horizon)")
    p.add_argument("--ablation", default="",
                   help="comma-separated objects that run the x2 "
                        "single-axis domain-shift ablation (which axis "
                        "— lighting/photometric/blur/depth/init — kills "
                        "tracking)")
    p.add_argument("--out", default="benchmarks/accuracy_suite_results.json")
    p.add_argument("--stall_timeout_s", type=float, default=2700.0,
                   help="exit 3 if no progress line for this long (lost "
                        "tunnel RPC); rerun resumes from checkpoints. "
                        "Generous because a degraded-device eval phase "
                        "can legitimately go ~30 min between lines.")
    args = p.parse_args()

    from iros20_6d_pose_tracking_tpu.eval import synthetic_benchmark as SB

    def checkpoint_results(partial):
        # persist after every object: a crash or typo late in a multi-hour
        # run must not discard finished rows
        with open(args.out + ".partial", "w") as f:
            json.dump(partial, f, indent=2)

    import threading
    import time as _time

    # Stall watchdog: the axon tunnel loses in-flight RPCs (a 2026-08-19
    # run froze in futex_wait for 4 h mid-training with the device
    # healthy for new processes; no Python exception ever fires). Every
    # progress line refreshes a timestamp; if nothing logs for
    # --stall_timeout_s the process exits 3 with a clear message — a
    # rerun with the same --ensemble_ckpt_dir resumes from the last
    # checkpoint, so the restart costs at most ckpt_every steps.
    last = [_time.time()]

    def log(*a):
        last[0] = _time.time()
        print(*a, flush=True)

    def watchdog():
        while True:
            _time.sleep(30)
            idle = _time.time() - last[0]
            if idle > args.stall_timeout_s:
                print(f"WATCHDOG: no progress for {idle:.0f}s "
                      f"(> --stall_timeout_s {args.stall_timeout_s}) — "
                      f"likely a lost tunnel RPC; exiting. Rerun with the "
                      f"same --ensemble_ckpt_dir to resume.", flush=True)
                os._exit(3)

    threading.Thread(target=watchdog, daemon=True).start()

    t0 = _time.time()
    results = SB.run_suite(
        tuple(args.objects.split(",")),
        steps=args.steps, frames=args.frames, batch=args.batch,
        res=args.res, hard=not args.clean, on_result=checkpoint_results,
        ensemble=args.ensemble, ensemble_ckpt_dir=args.ensemble_ckpt_dir,
        domain_shift=args.domain_shift,
        long_horizon_frames=args.long_horizon,
        shift_sweep=tuple(float(s) for s in args.shift_sweep.split(",")
                          if s),
        sweep_objects=tuple(args.sweep_objects.split(",")),
        recovery_objects=tuple(s for s in args.recovery.split(",") if s),
        live_recovery_objects=tuple(
            s for s in args.live_recovery.split(",") if s),
        ablation_objects=tuple(s for s in args.ablation.split(",") if s),
        log=log,
    )
    # mean AUCs over ASYMMETRIC objects (ADD well-posed); symmetric rows
    # are scored by ADD-S and reported separately
    asym = [r for r in results if not r.get("symmetric")]
    sym = [r for r in results if r.get("symmetric")]
    payload = {
        "protocol": "VOCap AUC @0.1m (reference eval_ycb.py:45-64), "
                    "synthetic hard videos" if not args.clean else
                    "VOCap AUC @0.1m, synthetic clean videos",
        "steps": args.steps,
        "frames": args.frames,
        "ensemble_training": bool(args.ensemble),
        "suite_wall_secs": round(_time.time() - t0, 1),
        "results": results,
        "mean_add_auc": float(
            sum(r["add_auc"] for r in asym) / max(len(asym), 1)),
        "mean_adi_auc": float(
            sum(r["adi_auc"] for r in asym) / max(len(asym), 1)),
    }
    if sym:
        payload["mean_adi_auc_symmetric"] = float(
            sum(r["adi_auc"] for r in sym) / len(sym))
    if args.domain_shift:
        payload["mean_add_auc_domain_shifted"] = float(
            sum(r["domain_shifted"]["add_auc"] for r in asym)
            / max(len(asym), 1))
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)

    hdr = "| object | ADD AUC | ADD-S AUC | mean err | hold-init err |"
    cols = 5
    if args.domain_shift:
        hdr = hdr + " shifted ADD | shifted ADD-S |"
        cols += 2
    print("\n" + hdr)
    print("|" + "---|" * cols)
    for r in results:
        sym_tag = " (sym)" if r.get("symmetric") else ""
        line = (f"| {r['name']}{sym_tag} | {r['add_auc']:.2f} "
                f"| {r['adi_auc']:.2f} | {r['add_mean_mm']:.1f} mm "
                f"| {r['baseline_add_mean_mm']:.1f} mm |")
        if args.domain_shift:
            ds = r["domain_shifted"]
            line += f" {ds['add_auc']:.2f} | {ds['adi_auc']:.2f} |"
        print(line)
    print(f"| **mean (asym)** | **{payload['mean_add_auc']:.2f}** "
          f"| **{payload['mean_adi_auc']:.2f}** |" + " |" * (cols - 3))
    if any(r.get("long_horizon") for r in results):
        print("\nlong-horizon (per object):")
        for r in results:
            lh = r.get("long_horizon")
            if lh:
                print(f"  {r['name']}: {lh['frames']} frames, ADD AUC "
                      f"{lh['add_auc']:.2f} ADD-S {lh['adi_auc']:.2f}, "
                      f"{lh['reinit_count']} reinits at "
                      f"{lh['reinit_frames']}")
    for r in results:
        rc = r.get("recovery")
        if rc:
            print(f"\nrecovery [{r['name']}]: occlusion burst @"
                  f"{rc['fail_at']}+{rc['fail_len']} -> detected in "
                  f"{rc['detection_latency']} frames, recovered at "
                  f"{rc['recovered_at']}, post-recovery ADD AUC "
                  f"{rc.get('post_recovery_add_auc', float('nan')):.2f} "
                  f"(whole-run {rc['add_auc']:.2f}), reinits "
                  f"{rc['reinit_frames']}")
    for r in results:
        lv = r.get("live_recovery")
        if lv:
            print(f"\nLIVE recovery [{r['name']}]: burst @{lv['fail_at']}"
                  f"+{lv['fail_len']} -> detected in "
                  f"{lv['detection_latency']} frames (policy sees 1 "
                  f"health sample per {lv['refetch_every']}-frame "
                  f"refetch, patience {lv['patience']}), reinit applied "
                  f"at {lv['reinit_applied_at']}, post-recovery ADD AUC "
                  f"{lv.get('post_recovery_add_auc', float('nan')):.2f}")
    for r in results:
        sw = r.get("shift_sweep")
        if sw:
            pts = ", ".join(f"x{p['severity']}={p['add_auc']:.1f}"
                            for p in sw)
            print(f"shift sweep [{r['name']}] ADD AUC: {pts}")
    for r in results:
        ab = r.get("shift_ablation")
        if ab:
            pts = ", ".join(f"{p['axis']}={p['add_auc']:.1f}"
                            for p in ab)
            print(f"shift ablation x2 [{r['name']}] ADD AUC: {pts}")
    print(f"\nwrote {args.out} ({payload['suite_wall_secs']:.0f}s)")


if __name__ == "__main__":
    main()
