import numpy as np, jax, jax.numpy as jnp
from colmap_tpu.estimators import global_positioning as gp

rng = np.random.default_rng(2)
n_cams, n_pts = 8, 150
centers_gt = 5.0 * rng.standard_normal((n_cams, 3))
points_gt = rng.standard_normal((n_pts, 3))
obs_cam, obs_point, dirs = [], [], []
for p in range(n_pts):
    for c in range(n_cams):
        d = points_gt[p] - centers_gt[c]
        dirs.append(d / np.linalg.norm(d)); obs_cam.append(c); obs_point.append(p)
obs_cam=np.asarray(obs_cam); obs_point=np.asarray(obs_point); dirs=np.asarray(dirs)

opts = gp.GlobalPositioningOptions()
# manual loop with per-iteration diagnostics in f32
dtype = jnp.float32
rng2 = np.random.default_rng(opts.seed)
init_centers = rng2.standard_normal((n_cams,3)); init_points = rng2.standard_normal((n_pts,3))
obs_w = np.ones(len(obs_cam))
d = dirs / np.linalg.norm(dirs,axis=1,keepdims=True)
state = (jnp.asarray(init_centers,dtype=dtype), jnp.asarray(init_points,dtype=dtype))
dd = jnp.asarray(d,dtype=dtype)
oc = jnp.asarray(obs_cam.astype(np.int32)); op=jnp.asarray(obs_point.astype(np.int32))
ow = jnp.asarray(obs_w,dtype=dtype)
counts = np.bincount(obs_cam,minlength=n_cams); best=int(np.argmax(counts))
aobs = int(np.nonzero(obs_cam==best)[0][0])
anchor = (jnp.asarray(int(obs_cam[aobs])), jnp.asarray(int(obs_point[aobs])), dd[aobs])
for it in range(30):
    state, cost = gp._irls_solve(dd, oc, op, ow, state, anchor, n_cams, n_pts, opts)
    print(it, float(cost), bool(jnp.isfinite(state[0]).all()), bool(jnp.isfinite(state[1]).all()))
    if not bool(jnp.isfinite(cost)): break
