"""Adaptive execution-mode selection for whole-video tracking.

The round-4 record (BENCH_r04.json + benchmarks/bench_runs/) exposed a
failure mode the fused-scan architecture alone cannot absorb: on
degraded shared-device hours the 100-frame tracking scan collapsed ~7x
(727.9 -> 95.5 Hz, in-record device_probe_ms 23.58 vs healthy <8) while
PER-FRAME dispatch of the very same step was barely touched (the live
host loop held 240 Hz through that hour). The degradation taxes
long-RUNNING programs, not dispatches (measured program-length curve:
docs/KERNEL.md "Dispatch-length sensitivity") — so the fastest way to
track depends on the hour, and a product that hard-codes one
granularity loses to its own fallback whenever the device is contended.

``AdaptiveVideoTracker`` makes the choice at runtime, on the actual
video being tracked:

  - **Candidates** are frames-per-dispatched-program: the full fused
    scan (e.g. 100), a short scan (e.g. 10), and per-frame dispatch (1,
    a single jitted step indexed into the device-resident chunk — the
    same program shape as the live StreamTracker path, minus H2D since
    frames arrive chunked).
  - **Probe segments are real work**: every mode computes bit-identical
    poses (the same ``track_step`` at different dispatch granularities),
    so probing candidate modes on the video's first segments wastes
    nothing — the poses are kept.
  - **Steady state re-checks itself**: each post-decision segment is
    timed; if the chosen mode's rate collapses by ``reprobe_factor``
    vs its probed rate (the device degraded mid-video), the dispatcher
    re-probes and switches.

Multi-hypothesis tracking (``samples > 1``) rides the same dispatcher
(scan mode = hypotheses.track_video_multi, per-frame mode =
hypotheses.track_step_multi). The hypothesis perturbations are drawn
from differently-split RNG streams in the two modes, so MH outputs are
statistically — not bitwise — equivalent across granularities.

Consumers: ``Tracker.track_video_adaptive`` (the product API),
bench.py's flagship row (VERDICT r4 #1/#2: the record number must
survive a degraded hour), and apps/predict.py ``--track_mode adaptive``.
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from . import tracker as trk


@jax.jit
def _write_back(buf, poses, a):
    """Write a host-computed segment's poses into the chunk output
    buffer at traced offset ``a`` (one tiny compile per segment
    length)."""
    return jax.lax.dynamic_update_slice_in_dim(buf, poses, a, axis=0)


@jax.jit
def _write_back1(sbuf, scores, a):
    return jax.lax.dynamic_update_slice_in_dim(sbuf, scores, a, axis=0)


# Per-dispatch host overhead is a FIRST-ORDER cost here: at tunnel
# dispatch rates, flattening the full weight pytree and re-uploading
# host-numpy constants on EVERY call (what a module-level jit with
# (variables, mesh, K, ...) args does) costs more than the device
# compute of a single step — the r5 degradation probe measured a T=1
# scan dispatched that way at ~1 s/frame on a congested hour while the
# closure-jitted StreamTracker step sustained hundreds of Hz through
# the same class of hour (BENCH_r04 host loop). So every candidate
# granularity below is a CLOSURE-jitted program: weights, mesh, and
# camera constants are lifted into the executable once, calls pass only
# (pose, out-buffers, chunk, index).


class AdaptiveVideoTracker:
    """Runtime dispatch-granularity selection around a ``Tracker``.

    Args:
      tracker: a tracking.tracker.Tracker (or from_parts equivalent).
      candidates: frames-per-dispatch to consider. 1 means per-frame
        indexed dispatch; 0 means the WINDOWED STREAM path (a
        StreamTracker driven over the host chunk: packed uint8
        sub-window uploads, no large resident buffers in any program —
        the one mode that has never collapsed in any recorded
        degradation hour, r4 + r5); every other value c runs
        ``track_video`` scans of length c. chunk_size must be a
        multiple of every c >= 1; 0 requires host-side sources (it
        needs numpy frames to window from).
      probe_frames: minimum frames to spend probing each candidate
        (a candidate with c > probe_frames probes on one full program).
      reprobe_factor: a steady-state segment slower than
        probed_rate * factor triggers a fresh probe (device changed).
      samples: hypotheses per frame (1 = single-hypothesis flagship).
    """

    STREAM = 0

    def __init__(self, tracker, candidates=(100, 10, 1, 0),
                 probe_frames: int = 20, reprobe_factor: float = 2.0,
                 samples: int = 1, seed: int = 0):
        self.t = tracker
        self.candidates = tuple(int(c) for c in candidates)
        assert all(c >= 0 for c in self.candidates) and \
            len(set(self.candidates)) == len(self.candidates)
        self._stream = None
        self.probe_frames = int(probe_frames)
        self.reprobe_factor = float(reprobe_factor)
        self.samples = int(samples)
        self.key = jax.random.PRNGKey(seed)
        self._fns: dict = {}       # candidate c -> closure-jitted program
        self._warmed_shapes: set = set()
        # telemetry of the last track() call
        self.mode = None
        self.settled = None   # False: video ended mid-probe, mode is a
        #                       projection from the probe table
        self.probe_ms_per_frame: dict = {}
        self._probe1: dict = {}    # mode -> single-dispatch ms estimate
        self.reprobes = 0
        self.segments: list = []   # (mode, frames, ms_per_frame, phase)

    def _get_fn(self, c: int):
        """Closure-jitted program for candidate ``c``: weights/mesh/
        camera constants lifted into the executable; a call passes only
        (pose, out-buffers, device chunk, start index [, key]). c > 1
        tracks c frames under the nested scan and writes the poses into
        the chunk output buffer; c == 1 steps one frame (the program
        shape the degraded-hour record showed immune to the scan
        collapse)."""
        fn = self._fns.get(c)
        if fn is not None:
            return fn
        t = self.t
        model, cfg = t.model, t.cfg
        variables, mesh = t.variables, t.mesh
        K = jnp.asarray(t.K, jnp.float32)
        mean, std = jnp.asarray(t.mean), jnp.asarray(t.std)
        samples = self.samples

        if samples > 1:
            from . import hypotheses as hy

            if c == 1:
                base_key = self.key  # fold happens IN-program: a host
                # fold_in per frame would itself be one tiny dispatch

                @jax.jit
                def fn(pose, buf, sbuf, rgb_chunk, dep_chunk, i, gidx):
                    rgb = jax.lax.dynamic_index_in_dim(
                        rgb_chunk, i, 0, keepdims=False)
                    dep = jax.lax.dynamic_index_in_dim(
                        dep_chunk, i, 0, keepdims=False)
                    new_pose, score, _ = hy.track_step_multi(
                        model, cfg, variables, mesh, K, mean, std,
                        pose, rgb, dep,
                        jax.random.fold_in(base_key, gidx),
                        samples=samples)
                    return (new_pose, buf.at[i].set(new_pose),
                            sbuf.at[i].set(score))
            else:
                @jax.jit
                def fn(pose, buf, sbuf, rgb_chunk, dep_chunk, a, key):
                    seg_rgb = jax.lax.dynamic_slice_in_dim(
                        rgb_chunk, a, c, axis=0)
                    seg_dep = jax.lax.dynamic_slice_in_dim(
                        dep_chunk, a, c, axis=0)
                    poses, scores = hy.track_video_multi(
                        model, cfg, variables, mesh, K, mean, std,
                        pose, seg_rgb, seg_dep, key, samples=samples)
                    buf = jax.lax.dynamic_update_slice_in_dim(
                        buf, poses, a, axis=0)
                    sbuf = jax.lax.dynamic_update_slice_in_dim(
                        sbuf, scores, a, axis=0)
                    return poses[c - 1], buf, sbuf
        else:
            if c == 1:
                @jax.jit
                def fn(pose, buf, rgb_chunk, dep_chunk, i):
                    rgb = jax.lax.dynamic_index_in_dim(
                        rgb_chunk, i, 0, keepdims=False)
                    dep = jax.lax.dynamic_index_in_dim(
                        dep_chunk, i, 0, keepdims=False)
                    new_pose, _ = trk.track_step(
                        model, cfg, variables, mesh, K, mean, std,
                        pose, rgb, dep)
                    return new_pose, buf.at[i].set(new_pose)
            else:
                @jax.jit
                def fn(pose, buf, rgb_chunk, dep_chunk, a):
                    seg_rgb = jax.lax.dynamic_slice_in_dim(
                        rgb_chunk, a, c, axis=0)
                    seg_dep = jax.lax.dynamic_slice_in_dim(
                        dep_chunk, a, c, axis=0)
                    poses = trk.track_video(
                        model, cfg, variables, mesh, K, mean, std,
                        pose, seg_rgb, seg_dep)
                    buf = jax.lax.dynamic_update_slice_in_dim(
                        buf, poses, a, axis=0)
                    return poses[c - 1], buf
        self._fns[c] = fn
        return fn

    def _get_stream(self):
        """Lazy StreamTracker for candidate 0 (windowed stream mode):
        packed uint8 sub-window uploads, pose carried on device, no
        large resident buffer referenced by any of its programs."""
        if self._stream is None:
            from .stream import StreamTracker

            self._stream = StreamTracker(self.t, window=True,
                                         samples=self.samples)
        return self._stream

    def _run_stream(self, pose_dev, buf, sbuf, rgb_np, dep_np, a, b):
        """Frames [a, b) through the windowed StreamTracker (host-side
        numpy chunk). Results are written back into the device output
        buffer so chunk assembly stays uniform across modes."""
        s = self._get_stream()
        if rgb_np.dtype != np.uint8:
            rgb_np = np.clip(np.round(rgb_np), 0, 255).astype(np.uint8)
        if dep_np.dtype != np.uint16:
            dep_np = np.clip(np.round(dep_np), 0, 65535).astype(np.uint16)
        s.begin(np.asarray(pose_dev), image_hw=rgb_np.shape[1:3])
        for i in range(a, b):
            s.push(np.ascontiguousarray(rgb_np[i]),
                   np.ascontiguousarray(dep_np[i]))
        poses = s.poses()                      # blocks the pipeline
        buf = _write_back(buf, jnp.asarray(poses), np.int32(a))
        if sbuf is not None:
            sc = s.scores()
            sbuf = _write_back1(sbuf, jnp.asarray(sc), np.int32(a))
        return s._pose_dev, buf, sbuf

    # -- segment runners (device-side; block only at segment end) --

    def _run_scan(self, pose_dev, buf, sbuf, rgb_dev, dep_dev, a, b, c):
        """Frames [a, b) as back-to-back length-c programs (b-a a
        multiple of c by construction)."""
        fn = self._get_fn(c)
        for s in range(a, b, c):
            if self.samples > 1:
                self.key, sub = jax.random.split(self.key)
                pose_dev, buf, sbuf = fn(pose_dev, buf, sbuf, rgb_dev,
                                         dep_dev, np.int32(s), sub)
            else:
                pose_dev, buf = fn(pose_dev, buf, rgb_dev, dep_dev,
                                   np.int32(s))
        return pose_dev, buf, sbuf

    def _run_per_frame(self, pose_dev, buf, sbuf, rgb_dev, dep_dev,
                       a, b, g0):
        """Frames [a, b) as one dispatch per frame. ``g0``: global index
        of chunk frame 0 (multi-hypothesis RNG keying)."""
        fn = self._get_fn(1)
        for i in range(a, b):
            if self.samples > 1:
                pose_dev, buf, sbuf = fn(pose_dev, buf, sbuf, rgb_dev,
                                         dep_dev, np.int32(i),
                                         np.int32(g0 + i))
            else:
                pose_dev, buf = fn(pose_dev, buf, rgb_dev, dep_dev,
                                   np.int32(i))
        return pose_dev, buf, sbuf

    def _run_segment(self, mode, phase, pose_dev, buf, sbuf, rgb_dev,
                     dep_dev, a, b, g0, rgb_np=None, dep_np=None):
        """Run + time frames [a, b) in ``mode``. Blocks on the final
        pose — every frame's work is sequentially dependent on it, so
        the wall covers all dispatch + compute of the segment."""
        t0 = time.perf_counter()
        if mode == self.STREAM:
            pose_dev, buf, sbuf = self._run_stream(
                pose_dev, buf, sbuf, rgb_np, dep_np, a, b)
        elif mode == 1:
            pose_dev, buf, sbuf = self._run_per_frame(
                pose_dev, buf, sbuf, rgb_dev, dep_dev, a, b, g0)
        else:
            pose_dev, buf, sbuf = self._run_scan(
                pose_dev, buf, sbuf, rgb_dev, dep_dev, a, b, mode)
        np.asarray(pose_dev)
        ms = (time.perf_counter() - t0) / max(b - a, 1) * 1e3
        self.segments.append((mode, b - a, round(ms, 3), phase))
        return pose_dev, buf, sbuf, ms

    def _ensure_warm(self, pose_dev, rgb_dev, dep_dev, rgb_np=None,
                     dep_np=None):
        """Compile + first-run every candidate's program for this chunk
        shape. MUST happen before probing: a probe segment that includes
        XLA compilation would be compile-dominated and the mode choice
        garbage (a cold compile is seconds; the segments are
        milliseconds). Outputs go to scratch buffers and are discarded.
        Runs once per (chunk shape, dtype) per dispatcher."""
        shape_key = (rgb_dev.shape, rgb_dev.dtype.name, dep_dev.dtype.name)
        if shape_key in self._warmed_shapes:
            return
        L = rgb_dev.shape[0]
        buf = jnp.zeros((L, 4, 4), jnp.float32)
        sbuf = jnp.zeros((L,), jnp.float32) if self.samples > 1 else None
        for c in self.candidates:
            if c == self.STREAM:
                if rgb_np is not None:
                    p, _, _ = self._run_stream(pose_dev, buf, sbuf,
                                               rgb_np, dep_np, 0, 1)
                    np.asarray(p)
                continue
            if c == 1:
                p, _, _ = self._run_per_frame(pose_dev, buf, sbuf,
                                              rgb_dev, dep_dev, 0, 1, 0)
            else:
                p, _, _ = self._run_scan(pose_dev, buf, sbuf, rgb_dev,
                                         dep_dev, 0, c, c)
            np.asarray(p)
        self._warmed_shapes.add(shape_key)

    def warmup(self, rgb_u8: np.ndarray, depth_u16: np.ndarray,
               init_pose: np.ndarray, chunk_size: int = 100):
        """Compile every candidate's program on one repeated frame so
        the first real track() measures execution, not compilation.
        ``chunk_size`` must match the later track() call (programs are
        shape-specialized to the chunk)."""
        rgb = jnp.asarray(np.broadcast_to(rgb_u8,
                                          (chunk_size,) + rgb_u8.shape))
        dep = jnp.asarray(np.broadcast_to(depth_u16,
                                          (chunk_size,) + depth_u16.shape))
        pose = jnp.asarray(np.asarray(init_pose), jnp.float32)
        self._ensure_warm(pose, rgb, dep)
        self.segments = []

    def track(self, init_pose, rgb_source, depth_source,
              n_frames: int | None = None, chunk_size: int = 100):
        """Track a video, choosing the dispatch granularity at runtime.

        Sources follow ``Tracker.track_video_chunked``: arrays or
        callables ``f(start, stop) -> np.ndarray``; host chunks prefetch
        on a background thread while the device works. DEVICE-RESIDENT
        fast path: pass jax arrays (already on device) and the whole
        video is tracked as one chunk with zero H2D — this also permits
        long-program candidates (e.g. 400 frames/dispatch), which win
        on dispatch-queue-congested hours where every program execution
        pays a ~1 s fixed wait regardless of length (measured r5;
        docs/KERNEL.md).

        Probing is TIME-bounded, not just frame-bounded: each candidate
        first runs ONE dispatch; if that alone shows it >= 3x slower
        per frame than the best mode measured so far, the candidate is
        recorded from the single dispatch and skipped (on a congested
        hour a full per-frame probe would cost 20+ seconds of 1 s
        dispatches — the r5 run that motivated this burned 31 s there).

        Returns (poses (T,4,4) float32, scores (T,) float32 or None) —
        scores only when samples > 1. Telemetry lands on self
        (mode, probe_ms_per_frame, reprobes, segments).
        """
        import concurrent.futures as cf

        if n_frames is None:
            assert not callable(rgb_source), "n_frames required w/callables"
            n_frames = len(rgb_source)
        if n_frames == 0:
            return np.zeros((0, 4, 4), np.float32), None
        resident = (not callable(rgb_source)
                    and isinstance(rgb_source, jax.Array))
        if resident:
            chunk_size = n_frames
            assert self.STREAM not in self.candidates, \
                "stream candidate needs host-side sources"
            for c in self.candidates:
                assert c <= n_frames, \
                    f"candidate {c} longer than the resident video"
        else:
            for c in self.candidates:
                assert c == self.STREAM or chunk_size % c == 0, (
                    f"chunk_size {chunk_size} not a multiple of {c}")

        self.mode = None
        self.probe_ms_per_frame = {}
        self._probe1 = {}
        self.reprobes = 0
        self.segments = []
        pending = list(self.candidates)      # modes still to probe
        chosen = None
        pose_dev = jnp.asarray(np.asarray(init_pose), jnp.float32)
        out_chunks: list = []
        score_chunks: list = []
        multi = self.samples > 1

        def run_chunk(ci, a0, b0, rgb_dev, dep_dev, rgb_np=None,
                      dep_np=None):
            nonlocal pending, chosen, pose_dev
            L = rgb_dev.shape[0]
            if ci == 0:
                self._ensure_warm(pose_dev, rgb_dev, dep_dev, rgb_np,
                                  dep_np)
            buf = jnp.zeros((L, 4, 4), jnp.float32)
            sbuf = jnp.zeros((L,), jnp.float32) if multi else None
            a = 0
            while a < L:
                phase = "steady"
                if pending:
                    mode = pending[0]
                    # stream's stage-1 probes 8 frames: a single push
                    # measures begin()'s round-trip, not the pipelined
                    # rate, and would false-trigger the hopeless cutoff
                    step1 = 8 if mode == self.STREAM else mode
                    if L - a >= step1:
                        if mode not in self._probe1:
                            b = a + step1        # stage 1: one dispatch
                            phase = "probe1"     # (8 pushes for stream)
                        else:
                            g = max(mode, 1)
                            n = max(g, -(-self.probe_frames // g) * g)
                            b = a + min(n, ((L - a) // g) * g)
                            phase = "probe"
                    else:   # chunk tail can't fit one program of this
                        mode, b = 1, L      # mode: fill per-frame and
                        phase = "fill"      # probe it next chunk
                else:
                    mode = chosen
                    if mode == self.STREAM:
                        b = L
                    elif L - a >= mode:
                        b = a + ((L - a) // mode) * mode
                    else:
                        mode, b = 1, L
                        phase = "fill"
                pose_dev2, buf, sbuf, ms = self._run_segment(
                    mode, phase, pose_dev, buf, sbuf, rgb_dev, dep_dev,
                    a, b, a0, rgb_np, dep_np)
                pose_dev = pose_dev2
                if phase == "probe1":
                    self._probe1[mode] = ms
                    best = min(self.probe_ms_per_frame.values(),
                               default=None)
                    hopeless = best is not None and ms > 3.0 * best
                    # provisional entry: if the video ends before the
                    # stage-2 refinement, the table still has a sample
                    self.probe_ms_per_frame[mode] = round(ms, 3)
                    if hopeless or (mode != self.STREAM
                                    and mode >= self.probe_frames):
                        # one full program is an adequate sample for a
                        # long mode; for a hopeless mode, more probing
                        # only burns time at the bad rate
                        pending.pop(0)
                elif phase == "probe":
                    self.probe_ms_per_frame[mode] = round(ms, 3)
                    pending.pop(0)
                if pending == [] and chosen is None:
                    chosen = min(self.probe_ms_per_frame,
                                 key=self.probe_ms_per_frame.get)
                    self.mode = chosen
                if phase == "steady" and ms > self.reprobe_factor \
                        * self.probe_ms_per_frame[chosen]:
                    # device behavior changed mid-video: re-measure
                    # everything (this segment stands as the new sample
                    # for the current mode).
                    self.reprobes += 1
                    self.probe_ms_per_frame = {chosen: round(ms, 3)}
                    self._probe1 = {chosen: ms}
                    pending = [c for c in self.candidates if c != chosen]
                    chosen, self.mode = None, None
                a = b
            out_chunks.append(np.asarray(buf)[: b0 - a0])
            if multi:
                score_chunks.append(np.asarray(sbuf)[: b0 - a0])
            if b0 - a0 < L:
                # the device pose carried out of a padded chunk tracked
                # the repeated pad frames; re-anchor on the last REAL
                # frame (only the final chunk pads: one 64 B upload).
                pose_dev = jnp.asarray(out_chunks[-1][-1])

        if resident:
            run_chunk(0, 0, n_frames, rgb_source,
                      depth_source if isinstance(depth_source, jax.Array)
                      else jnp.asarray(depth_source))
        else:
            get_rgb = rgb_source if callable(rgb_source) else \
                (lambda a, b: rgb_source[a:b])
            get_dep = depth_source if callable(depth_source) else \
                (lambda a, b: depth_source[a:b])

            def load(a, b):
                rgb = np.ascontiguousarray(get_rgb(a, b))
                dep = np.ascontiguousarray(get_dep(a, b))
                pad = chunk_size - (b - a)
                if pad:  # repeat last frame: one compiled shape/program
                    rgb = np.concatenate([rgb, np.repeat(rgb[-1:], pad, 0)])
                    dep = np.concatenate([dep, np.repeat(dep[-1:], pad, 0)])
                return rgb, dep

            starts = list(range(0, n_frames, chunk_size))
            with cf.ThreadPoolExecutor(1) as ex:
                fut = ex.submit(load, 0, min(chunk_size, n_frames))
                for ci, a0 in enumerate(starts):
                    b0 = min(a0 + chunk_size, n_frames)
                    rgb_np, dep_np = fut.result()
                    if ci + 1 < len(starts):
                        a2 = starts[ci + 1]
                        fut = ex.submit(load, a2,
                                        min(a2 + chunk_size, n_frames))
                    run_chunk(ci, a0, b0, jax.device_put(rgb_np),
                              jax.device_put(dep_np), rgb_np, dep_np)
        poses = np.concatenate(out_chunks, axis=0)
        scores = (np.concatenate(score_chunks, axis=0) if multi else None)
        self.settled = chosen is not None
        if chosen is None and self.probe_ms_per_frame:
            # The video ended mid-(re)probe. Report the mode the
            # dispatcher WOULD settle to (best probed rate so far) so
            # telemetry rows self-describe instead of printing None;
            # ``settled=False`` marks it as a projection.
            self.mode = min(self.probe_ms_per_frame,
                            key=self.probe_ms_per_frame.get)
        return poses, scores

    def telemetry(self) -> dict:
        return {
            "mode": self.mode,
            "settled": getattr(self, "settled", None),
            "probe_ms_per_frame": dict(self.probe_ms_per_frame),
            "reprobes": self.reprobes,
            "n_segments": len(self.segments),
        }

    def steady_ms_per_frame(self) -> float | None:
        """Best post-decision segment in the chosen mode — the rate the
        dispatcher actually delivers once settled. If the video ended
        mid-(re)probe (mode undecided), fall back to the best segment
        observed at all: the rate the dispatcher WOULD settle to."""
        post = [ms for m, n, ms, ph in self.segments
                if ph == "steady" and m == self.mode]
        if not post and self.mode is not None:
            post = [ms for m, n, ms, ph in self.segments
                    if m == self.mode]
        if not post:
            post = [ms for m, n, ms, ph in self.segments]
        return min(post) if post else None
