"""TPU-native 6D pose tracking framework (se(3)-TrackNet capabilities).

A ground-up JAX/XLA/Pallas re-design of the capabilities of
wenbowen123/iros20-6d-pose-tracking (IROS 2020, arXiv 2007.13866):
render-in-the-loop 6D pose tracking of a known CAD model through RGB-D
video, trained purely on synthetic data.

Design principles (TPU-first, not a port):
  - The per-frame track step (render prev-pose ROI -> crop current frame ->
    normalize -> two-branch CNN -> se(3) pose compose) is ONE jitted program
    with static shapes; video loops run under ``jax.lax.scan``.
  - Rendering is a matmul-formulated triangle rasterizer (edge functions and
    interpolants evaluated as pixels x triangle-coefficients contractions on
    the MXU) instead of an OpenGL context + readback.
  - Training is ``pjit`` over a ``jax.sharding.Mesh`` (data parallel x
    per-object "expert" parallel); augmentations are jittable RNG ops.
  - Host<->device traffic per frame is one small frame upload + one 4x4 pose
    readback (the reference crosses GL/CUDA boundaries 3x per frame,
    reference predict.py:217-296).

Subpackages mirror the reference's logical layers (SURVEY.md section 1):
  core      se(3)/so(3) math, pose codec, camera models
  ops       ROI ops, image ops (cv2-compatible resize/blur/HSV), depth ops
  render    mesh IO + TPU rasterizer (jnp reference impl + Pallas kernel)
  models    Se3TrackNet in Flax + PyTorch checkpoint import/export
  tracking  fused jitted tracker (reference predict.py Tracker parity API),
            pipelined live StreamTracker (windowed uint8 uploads,
            device-resident pose), chunked bounded-memory video scan,
            multi-hypothesis + track-health
  data      pair dataset IO + augmentation pipeline + on-device
            synthetic pairs with DR compositing (DRComposite)
  train     trainer (Adam + MultiStep schedule), checkpoint/resume
  eval      ADD/ADD-S/VOCap metrics + YCB/YCBInEOAT drivers +
            closed-loop synthetic accuracy harness (synthetic_benchmark)
  datagen   synthetic pair production (reference produce_train_pair_data.py)
  parallel  device-mesh helpers, sharded train/track steps (dp x obj
            ensembles; SP face-sharded low-latency render)
  apps      CLI entry points (predict / eval / train)
  native    C++ data-loading runtime (libpng decode pool, ctypes-bound)
"""

__version__ = "0.1.0"
