import time, sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, __import__('os').path.join(__import__('os').path.dirname(__import__('os').path.abspath(__file__)), '..'))
from iros20_6d_pose_tracking_tpu.render import mesh as M, rasterizer as rz, pallas_raster as pr
import sys as _s
logf=_s.stderr
def w(s): print(s, file=logf, flush=True)
res=176
tm = M.make_icosphere(subdiv=4, radius=0.05)
mesh = rz.upload(tm)
K = jnp.array([[1066.778,0,312.9869],[0,1067.487,241.3109],[0,0,1]],jnp.float32)
pose = jnp.eye(4).at[2,3].set(0.6)
window = (250., 380., 180., 310.)
T=256
fx, fy, fiz, fvalid, R, t = rz._project(mesh, pose, K, window, (res,res), 0.1)
coef, _ = pr.build_face_coefficients(fx, fy, fiz, fvalid)
def run(name, fb, pt):
    bbox = pr.build_block_bboxes(fx, fy, fvalid, fb)
    f = jax.jit(lambda c0: jax.lax.scan(lambda c,i: (c + pr.pallas_pass1(coef + c*1e-20, bbox, (res,res), face_block=fb, pix_tile=pt)[0][0,0]*1e-20, None), c0, jnp.arange(T))[0])
    o=f(jnp.float32(0)); np.asarray(o)
    t0=time.perf_counter()
    for _ in range(3): o=f(jnp.float32(0)); np.asarray(o)
    w(f'{name}: {(time.perf_counter()-t0)/3/T*1e3:.3f} ms')
run('fb1024 pt512 (current)', 1024, 512)
run('fb1024 pt1024', 1024, 1024)
run('fb1024 pt2048', 1024, 2048)
run('fb512 pt2048', 512, 2048)
run('fb2560 pt2048', 2560, 2048)
w('done')
