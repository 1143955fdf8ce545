# Training throughput on TPU: f32 vs bf16, file-free synthetic pipeline.
import time, sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, __import__('os').path.join(__import__('os').path.dirname(__import__('os').path.abspath(__file__)), '..'))
from iros20_6d_pose_tracking_tpu.data import augment as A
from iros20_6d_pose_tracking_tpu.data.dataset import SyntheticPairs
from iros20_6d_pose_tracking_tpu.models import tracknet
from iros20_6d_pose_tracking_tpu.render import mesh as M, rasterizer as rz
from iros20_6d_pose_tracking_tpu.train import trainer as tr
import sys as _s
logf=_s.stderr
def w(s): print(s, file=logf, flush=True)
res=176
tm = M.make_cube(0.08)
mesh = rz.upload(tm)
K = np.array([[1066.778,0,312.9869],[0,1067.487,241.3109],[0,0,1]],np.float32)
for dtype, name in ((jnp.float32,'f32'), (jnp.bfloat16,'bf16')):
    for batch in (32, 128):
        cfg = tr.TrainConfig(resolution=res, batch_size=batch)
        synth = SyntheticPairs(mesh, K, resolution=res, object_width_mm=tm.diameter*1000*1.1)
        model = tracknet.Se3TrackNet(image_size=res, dtype=dtype)
        tx,_ = tr.make_optimizer(cfg, 10000)
        state = tr.create_train_state(model, cfg, tx, jax.random.PRNGKey(0))
        mean=jnp.zeros(8); std=jnp.full(8,100.0)
        key=jax.random.PRNGKey(1)
        raw = synth.sample_batch(key, batch)
        state, m = tr.train_step(model, tx, cfg, state, key, raw, mean, std)
        np.asarray(m['loss'])
        t0=time.perf_counter(); n=20
        for i in range(n):
            raw = synth.sample_batch(jax.random.fold_in(key,i), batch)
            state, m = tr.train_step(model, tx, cfg, state, jax.random.fold_in(key,99+i), raw, mean, std)
        np.asarray(m['loss'])
        dt=(time.perf_counter()-t0)/n
        w(f'{name} batch={batch}: {dt*1e3:.1f} ms/step = {batch/dt:.0f} samples/s (incl on-device pair rendering)')
w('done')
