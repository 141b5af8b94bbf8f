import numpy as np, jax, jax.numpy as jnp
exec(open('/root/repo/_debug/diag5.py').read().split("for it in range")[0])
from colmap_tpu.estimators.global_positioning import GlobalPositioningOptions
options = opts
centers, points = state
d_ = dd; obs_w_=ow
a_cam, a_pt, a_dir = anchor
mu = options.anchor_weight * jnp.sum(ow)
print("mu =", float(mu))
def proj_apply(v): return v - d_ * jnp.sum(d_ * v, axis=-1, keepdims=True)
diff = points[op] - centers[oc]
r = proj_apply(diff)
rn2 = jnp.sum(r*r, axis=-1)
a2 = options.huber_scale**2
w = jnp.where(rn2 <= a2, 1.0, jnp.sqrt(a2/jnp.maximum(rn2,1e-30))) * ow
eye = jnp.eye(3, dtype=d_.dtype)
P_blocks = eye[None] - jnp.einsum("oi,oj->oij", d_, d_)
Hpp = jax.ops.segment_sum(w[:,None,None]*P_blocks, op, num_segments=n_pts)
Q = mu * jnp.einsum("i,j->ij", a_dir, a_dir)
Hpp = Hpp.at[a_pt].add(Q)
Hpp = Hpp + 1e-10*eye[None]
Hpp_inv = jnp.linalg.inv(Hpp)
print("Hpp finite:", bool(jnp.isfinite(Hpp).all()), "inv finite:", bool(jnp.isfinite(Hpp_inv).all()))
evs = np.linalg.eigvalsh(np.asarray(Hpp, dtype=np.float64))
print("Hpp min eig:", evs.min(), "max eig:", evs.max())
# check inv quality
I_err = np.abs(np.einsum('pij,pjk->pik', np.asarray(Hpp_inv,np.float64), np.asarray(Hpp,np.float64)) - np.eye(3)).max()
print("inv err:", I_err)
