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
    p.add_argument("--out", default="benchmarks/accuracy_suite_results.json")
    args = p.parse_args()

    from iros20_6d_pose_tracking_tpu.eval import synthetic_benchmark as SB

    def checkpoint_results(partial):
        # persist after every object: a crash or typo late in a multi-hour
        # run must not discard finished rows
        with open(args.out + ".partial", "w") as f:
            json.dump(partial, f, indent=2)

    results = SB.run_suite(
        tuple(args.objects.split(",")),
        steps=args.steps, frames=args.frames, batch=args.batch,
        res=args.res, hard=not args.clean, on_result=checkpoint_results,
    )
    payload = {
        "protocol": "VOCap AUC @0.1m (reference eval_ycb.py:45-64), "
                    "synthetic hard videos" if not args.clean else
                    "VOCap AUC @0.1m, synthetic clean videos",
        "steps": args.steps,
        "frames": args.frames,
        "results": results,
        "mean_add_auc": float(
            sum(r["add_auc"] for r in results) / len(results)),
        "mean_adi_auc": float(
            sum(r["adi_auc"] for r in results) / len(results)),
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)

    print("\n| object | ADD AUC | ADD-S AUC | mean err | hold-init err |")
    print("|---|---|---|---|---|")
    for r in results:
        print(f"| {r['name']} | {r['add_auc']:.2f} | {r['adi_auc']:.2f} "
              f"| {r['add_mean_mm']:.1f} mm "
              f"| {r['baseline_add_mean_mm']:.1f} mm |")
    print(f"| **mean** | **{payload['mean_add_auc']:.2f}** "
          f"| **{payload['mean_adi_auc']:.2f}** | | |")
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
