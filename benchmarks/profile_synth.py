"""Profile the on-device synthetic training pipeline (VERDICT r4 #5).

BENCH_r04 recorded train 3198.8 samples/s file-fed vs 1025.8 with the
zero-disk-IO synthetic sampler — a 3.1x tax. This breaks the tax down:

  - train step alone (fixed raw batch)       — the 62 ms floor
  - sampler alone (renders + DR composite)   — the program the tax buys
  - sampler w/o DR, renders-only, DR-only    — which half dominates
  - FUSED sampler+step (train_step_synth)    — one program, no HBM
    round-trip of the ~125 MB f32 raw batch between dispatches
  - sampler with uint8/uint16 quantized handoff + separate step — the
    ensemble path's trick applied to the single-object path

Writes benchmarks/degradation_runs/synth_profile_<stamp>.json.
Matches bench.bench_train_synth's exact shapes (batch 200, res 176,
cube mesh, DRComposite) so rows are comparable with the record.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def timed(label, fn, iters=10):
    t0 = time.perf_counter()
    np.asarray(fn())
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    bench.log(f"{label}: {ms:.1f} ms/iter (compile {compile_s:.1f}s)")
    return round(ms, 2)


def _dump(out):
    # Incremental dump after every row: the axon tunnel can hang a
    # cold compile for >20 min (it did on 2026-08-20 08:03), and an
    # external `timeout` kill must not erase the rows already measured.
    d = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "degradation_runs")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"synth_profile_{out['stamp']}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    return path


def main(batch=200, res=176):
    import jax
    import jax.numpy as jnp

    from iros20_6d_pose_tracking_tpu.data.dataset import (
        DRComposite, SyntheticPairs, _synth_batch_impl)
    from iros20_6d_pose_tracking_tpu.models import tracknet
    from iros20_6d_pose_tracking_tpu.render import mesh as M
    from iros20_6d_pose_tracking_tpu.render import rasterizer as rz
    from iros20_6d_pose_tracking_tpu.train import trainer as tr
    from iros20_6d_pose_tracking_tpu.utils.cache import (
        enable_persistent_cache)

    enable_persistent_cache()
    out = {"stamp": time.strftime("%Y%m%d_%H%M%S"), "batch": batch}
    probe_ms, probe_tf = bench.device_probe()
    out["probe_ms"] = probe_ms

    K = np.array([[1066.778, 0, 312.9869], [0, 1067.487, 241.3109],
                  [0, 0, 1]], np.float32)
    tm = M.make_cube(0.08)
    mesh = rz.upload(tm)
    dr = DRComposite()
    width = tm.diameter * 1000 * 1.1
    xyz = ((-0.12, 0.12), (-0.09, 0.09), (0.45, 0.85))
    synth = SyntheticPairs(mesh, K, resolution=res, object_width_mm=width,
                           max_trans=0.02, max_rot_deg=15.0,
                           xyz_range=xyz, dr=dr)
    cfg = tr.TrainConfig(resolution=res, batch_size=batch)
    model = tracknet.Se3TrackNet(image_size=res)
    tx, _ = tr.make_optimizer(cfg, steps_per_epoch=1000)
    state = tr.create_train_state(model, cfg, tx, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    mean = np.zeros(8, np.float32)
    std = np.full(8, 100.0, np.float32)

    # sampler variants
    out["sampler_dr_ms"] = timed(
        "sampler (DR)", lambda: synth.sample_batch(key, batch)["rgbB"])
    synth_nodr = SyntheticPairs(mesh, K, resolution=res,
                                object_width_mm=width, max_trans=0.02,
                                max_rot_deg=15.0, xyz_range=xyz, dr=None)
    out["sampler_nodr_ms"] = timed(
        "sampler (no DR)",
        lambda: synth_nodr.sample_batch(key, batch)["rgbB"])
    _dump(out)

    # pallas batched render at current shapes (r2 measured XLA 2.25x
    # better at batch; re-check per VERDICT #5c)
    synth_pl = SyntheticPairs(mesh, K, resolution=res,
                              object_width_mm=width, max_trans=0.02,
                              max_rot_deg=15.0, xyz_range=xyz, dr=dr,
                              render_impl="pallas")
    try:
        out["sampler_dr_pallas_ms"] = timed(
            "sampler (DR, pallas)",
            lambda: synth_pl.sample_batch(key, batch)["rgbB"])
    except Exception as e:
        bench.log(f"pallas sampler failed: {e!r}")
    _dump(out)

    # train step alone on a FIXED raw batch (sampler cost excluded)
    raw_fixed = jax.tree.map(jnp.asarray, synth.sample_batch(key, batch))
    state_box = [state]

    def step_only():
        s, m = tr.train_step(model, tx, cfg, state_box[0], key,
                             raw_fixed, mean, std)
        state_box[0] = s
        return m["loss"]

    out["train_step_ms"] = timed("train step (fixed raw)", step_only)
    _dump(out)

    # unfused pipeline (what bench_train_synth measured): sample + step
    def unfused():
        raw = synth.sample_batch(key, batch)
        s, m = tr.train_step(model, tx, cfg, state_box[0], key, raw,
                             mean, std)
        state_box[0] = s
        return m["loss"]

    out["unfused_ms"] = timed("sampler + step (2 programs)", unfused)
    _dump(out)

    # FUSED single program
    def fused():
        s, m = synth.fused_train_step(model, tx, cfg, state_box[0], key,
                                      key, mean, std)
        state_box[0] = s
        return m["loss"]

    out["fused_ms"] = timed("sampler + step (FUSED)", fused)
    _dump(out)

    # uint8/uint16 handoff between sampler and step (ensemble trick):
    # quantization happens INSIDE the sampler program so the inter-
    # program HBM traffic drops 4x (125 -> 31 MB at batch 200)
    Kj = jnp.asarray(K, jnp.float32)
    xyz_t = tuple(map(tuple, xyz))

    @jax.jit
    def sample_u8(k):
        raw = _synth_batch_impl(mesh, Kj, k, batch, res, width, 0.02,
                                15.0, xyz_t, dr, "xla")
        return {
            "rgbA": jnp.clip(jnp.round(raw["rgbA"]), 0, 255).astype(
                jnp.uint8),
            "depthA": jnp.clip(jnp.round(raw["depthA"]), 0, 65535).astype(
                jnp.uint16),
            "rgbB": jnp.clip(jnp.round(raw["rgbB"]), 0, 255).astype(
                jnp.uint8),
            "depthB": jnp.clip(jnp.round(raw["depthB"]), 0, 65535).astype(
                jnp.uint16),
            "maskB": raw["maskB"],
            "A_in_cam": raw["A_in_cam"],
            "B_in_cam": raw["B_in_cam"],
        }

    def unfused_u8():
        raw = sample_u8(key)
        s, m = tr.train_step(model, tx, cfg, state_box[0], key, raw,
                             mean, std)
        state_box[0] = s
        return m["loss"]

    out["unfused_uint8_ms"] = timed("sampler(u8 handoff) + step",
                                    unfused_u8)

    for k in ("unfused", "fused", "unfused_uint8"):
        out[k + "_samples_per_sec"] = round(batch / out[k + "_ms"] * 1e3, 1)
    probe_ms2, _ = bench.device_probe()
    out["probe_end_ms"] = probe_ms2
    path = _dump(out)
    bench.log(f"wrote {path}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
