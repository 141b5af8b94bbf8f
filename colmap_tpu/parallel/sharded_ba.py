"""Multi-chip sharded bundle adjustment.

reference behavior: replaces the solver-internal parallelism of Ceres
multi-threading / Caspar CUDA (SURVEY §2.9 P4). Design: observation-parallel
SPMD — the observation arrays are sharded across the device mesh while the
(much smaller) pose/camera/point parameter blocks stay replicated; every
segment-sum in the LM/Schur/PCG pipeline then becomes a local partial sum
followed by an XLA all-reduce over ICI. We express this with
`jax.sharding.NamedSharding` annotations and let the XLA SPMD partitioner
insert the collectives (the "annotate shardings, let XLA insert
collectives" recipe), rather than hand-writing NCCL-style exchanges.

For point-heavy problems a second mesh axis can shard the point blocks
(H_pp inverses) as well; observation sharding alone already distributes the
dominant Jacobian/segment-sum work.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from colmap_tpu.estimators import bundle_adjustment as ba


def make_mesh(devices=None, axis_name: str = "obs") -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def pad_observations(problem: ba.BAProblem, multiple: int) -> ba.BAProblem:
    """Pad observation arrays to a multiple of the mesh size; padded rows
    carry weight 0 and index 0 (safe: zero-weight rows contribute nothing)."""
    O = problem.obs_xy.shape[0]
    target = ((O + multiple - 1) // multiple) * multiple
    if target == O:
        return problem
    pad = target - O

    def pad0(x):
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)

    return problem._replace(
        obs_frame=pad0(problem.obs_frame),
        obs_cam=pad0(problem.obs_cam),
        obs_point=pad0(problem.obs_point),
        obs_xy=pad0(problem.obs_xy),
        obs_w=pad0(problem.obs_w),
    )


def shard_problem(problem: ba.BAProblem, mesh: Mesh, axis_name: str = "obs") -> ba.BAProblem:
    """Place observation arrays sharded over the mesh, parameters replicated."""
    sharded = NamedSharding(mesh, P(axis_name))
    replicated = NamedSharding(mesh, P())
    put = jax.device_put
    return ba.BAProblem(
        quat=put(problem.quat, replicated),
        t=put(problem.t, replicated),
        cam_params=put(problem.cam_params, replicated),
        points=put(problem.points, replicated),
        obs_frame=put(problem.obs_frame, sharded),
        obs_cam=put(problem.obs_cam, sharded),
        obs_point=put(problem.obs_point, sharded),
        obs_xy=put(problem.obs_xy, sharded),
        obs_w=put(problem.obs_w, sharded),
    )


def sharded_lm_step(mesh: Mesh, model_id: int, options: ba.BAOptions,
                    axis_name: str = "obs"):
    """Compile lm_step with sharding constraints over the mesh.

    Returns a jitted function (problem, masks, lam, nu) ->
    (problem, lam, nu, cost, new_cost, accepted) whose observation-space
    intermediates are partitioned across devices.
    """
    sharded = NamedSharding(mesh, P(axis_name))
    replicated = NamedSharding(mesh, P())

    problem_shardings = ba.BAProblem(
        quat=replicated, t=replicated, cam_params=replicated, points=replicated,
        obs_frame=sharded, obs_cam=sharded, obs_point=sharded,
        obs_xy=sharded, obs_w=sharded,
    )
    mask_shardings = ba.BAMasks(
        frame_mask=replicated, frame_trans_mask=replicated,
        cam_mask=replicated, point_mask=replicated,
    )

    def step(problem, masks, lam, nu):
        return ba.lm_step(problem, model_id, options, masks, lam, nu)

    return jax.jit(
        step,
        in_shardings=(problem_shardings, mask_shardings, replicated, replicated),
        out_shardings=(problem_shardings, replicated, replicated, replicated,
                       replicated, replicated),
    )


# ---------------------------------------------------------------------------
# Sharded PACKED solver — the fast path on a mesh.
#
# Layout: points are range-partitioned across devices and each device holds
# ALL observations of its points in its own dual frame-/point-major packed
# layout (estimators/bundle_adjustment.pack_problem with capacities forced
# uniform across shards). Consequences:
#   * both cross-layout permutations in the Schur matvec are LOCAL;
#   * point-side state (Hpp blocks, gx, dx) never leaves its shard;
#   * the only collectives are psums of camera-system-sized arrays
#     (6F + C*P floats — a few KB) — one per PCG matvec plus a handful per
#     LM iteration (gradients, damping diagonals, cost scalars).
# This is the multi-chip analogue of the reference's Caspar GPU LM+PCG
# (bundle_adjustment_caspar.h:107-120), with ICI psums instead of one GPU's
# shared memory. Multi-host: the same shard_map program runs unchanged over
# a (hosts*chips,) mesh via jax.distributed (see colmap_tpu.parallel.multihost).


def pack_problem_sharded(problem: ba.BAProblem, n_dev: int, align: int = 2):
    """Partition points (and their observations) into n_dev shards, each
    packed with pack_problem at globally uniform capacities.

    Returns (stacked_packed BAProblem with leading device axis on points/obs,
    stacked PackedMaps, info dict). Parameters quat/t/cam_params stay
    unstacked (replicated). Points are padded to a multiple of n_dev with
    dummy (zero-observation) points.
    """
    F = int(problem.quat.shape[0])
    N = int(problem.points.shape[0])
    n_loc = -(-N // n_dev)
    N_pad = n_loc * n_dev

    points = np.asarray(problem.points)
    if N_pad != N:
        points = np.concatenate(
            [points, np.zeros((N_pad - N, 3), points.dtype)], axis=0
        )
    obs_point = np.asarray(problem.obs_point)
    obs_frame = np.asarray(problem.obs_frame)
    obs_cam = np.asarray(problem.obs_cam)
    obs_xy = np.asarray(problem.obs_xy)
    obs_w = np.asarray(problem.obs_w)

    # Global capacities: max over shards so packed shapes are uniform.
    shard_of_obs = obs_point // n_loc
    capf = 1
    capp = 1
    for d in range(n_dev):
        sel = shard_of_obs == d
        if not sel.any():
            continue
        cf = np.bincount(obs_frame[sel], minlength=F).max()
        cp = np.bincount(obs_point[sel] - d * n_loc, minlength=n_loc).max()
        capf = max(capf, int(cf))
        capp = max(capp, int(cp))
    capf = -(-capf // align) * align
    capp = -(-capp // align) * align

    packed_shards, map_shards = [], []
    for d in range(n_dev):
        sel = shard_of_obs == d
        local = ba.BAProblem(
            quat=problem.quat, t=problem.t, cam_params=problem.cam_params,
            points=jnp.asarray(points[d * n_loc:(d + 1) * n_loc]),
            obs_frame=jnp.asarray(obs_frame[sel]),
            obs_cam=jnp.asarray(obs_cam[sel]),
            obs_point=jnp.asarray(obs_point[sel] - d * n_loc),
            obs_xy=jnp.asarray(obs_xy[sel]),
            obs_w=jnp.asarray(obs_w[sel]),
        )
        pk, mp, _ = ba.pack_problem(local, align=align, capf=capf, capp=capp)
        packed_shards.append(pk)
        map_shards.append(mp)

    stacked_packed = jax.tree.map(
        lambda *xs: jnp.stack(xs), *packed_shards
    )
    # Parameters replicated, not stacked.
    stacked_packed = stacked_packed._replace(
        quat=problem.quat, t=problem.t, cam_params=problem.cam_params,
    )
    stacked_maps = jax.tree.map(lambda *xs: jnp.stack(xs), *map_shards)
    return stacked_packed, stacked_maps, {
        "capf": capf, "capp": capp, "n_loc": n_loc, "N": N,
    }


def _shard_map(fn, mesh, in_specs, out_specs):
    try:
        return jax.shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    except (AttributeError, TypeError):
        from jax.experimental.shard_map import shard_map as _sm

        return _sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=False)


def make_sharded_packed_solver(mesh: Mesh, model_id: int,
                               options: ba.BAOptions,
                               axis_name: str = "d"):
    """Build the jitted shard_map fused packed LM solver over `mesh`.

    Returns fn(stacked_packed, stacked_maps, masks_with_sharded_point_mask)
    -> (quat, t, cam_params, points_stacked, final_cost, n_iters).
    """
    from jax.sharding import PartitionSpec as PS

    dev = PS(axis_name)
    rep = PS()
    problem_specs = ba.BAProblem(
        quat=rep, t=rep, cam_params=rep, points=dev,
        obs_frame=dev, obs_cam=dev, obs_point=dev, obs_xy=dev, obs_w=dev,
    )
    maps_specs = jax.tree.map(lambda _: dev, ba.PackedMaps(
        frame_pm=0, cam_pm=0,
    ))
    masks_specs = ba.BAMasks(
        frame_mask=rep, frame_trans_mask=rep, cam_mask=rep, point_mask=dev,
    )

    def local_solve(packed, maps, masks):
        # Strip the per-shard leading axis of size 1.
        sq = lambda x: x.reshape(x.shape[1:])
        packed = packed._replace(
            points=sq(packed.points), obs_frame=sq(packed.obs_frame),
            obs_cam=sq(packed.obs_cam), obs_point=sq(packed.obs_point),
            obs_xy=sq(packed.obs_xy), obs_w=sq(packed.obs_w),
        )
        maps = jax.tree.map(sq, maps)
        masks = masks._replace(point_mask=sq(masks.point_mask))
        solved, final_cost, n_iters = ba._lm_solve_fused_packed(
            packed, maps, model_id, options, masks, axis_name
        )
        return (
            solved.quat, solved.t, solved.cam_params,
            solved.points[None], final_cost, n_iters,
        )

    fn = _shard_map(
        local_solve, mesh,
        in_specs=(problem_specs, maps_specs, masks_specs),
        out_specs=(rep, rep, rep, dev, rep, rep),
    )
    return jax.jit(fn)


def solve_sharded_packed(problem: ba.BAProblem, model_id: int,
                         options: Optional[ba.BAOptions] = None,
                         masks: Optional[ba.BAMasks] = None,
                         mesh: Optional[Mesh] = None,
                         axis_name: str = "d"):
    """Distributed fused packed LM solve (the fast path on a mesh).

    Same semantics as ba.solve_packed; parameters return in their original
    layout.
    """
    if options is None:
        options = ba.BAOptions()
    if mesh is None:
        mesh = make_mesh(axis_name=axis_name)
    if masks is None:
        masks = ba.default_masks(problem, model_id, options)
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))

    stacked_packed, stacked_maps, info = pack_problem_sharded(problem, n_dev)
    n_loc, N = info["n_loc"], info["N"]
    pm = np.zeros(n_loc * n_dev, dtype=np.asarray(masks.point_mask).dtype)
    pm[:N] = np.asarray(masks.point_mask)
    masks_sh = masks._replace(
        point_mask=jnp.asarray(pm.reshape(n_dev, n_loc))
    )

    initial_cost = float(ba.compute_cost(problem, model_id, options))
    solver = make_sharded_packed_solver(mesh, model_id, options, axis_name)
    quat, t, cam_params, points_st, final_cost, n_iters = solver(
        stacked_packed, stacked_maps, masks_sh
    )
    out = problem._replace(
        quat=quat, t=t, cam_params=cam_params,
        points=points_st.reshape(n_dev * n_loc, 3)[:N],
    )
    return out, {
        "initial_cost": initial_cost,
        "final_cost": float(final_cost),
        "num_iterations": int(n_iters),
        "num_devices": n_dev,
    }


def solve_sharded(problem: ba.BAProblem, model_id: int,
                  options: Optional[ba.BAOptions] = None,
                  masks: Optional[ba.BAMasks] = None,
                  mesh: Optional[Mesh] = None,
                  verbose: bool = False):
    """Distributed LM solve: same semantics as ba.solve on a device mesh."""
    if options is None:
        options = ba.BAOptions()
    if mesh is None:
        mesh = make_mesh()
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    problem = pad_observations(problem, n_dev)
    if masks is None:
        masks = ba.default_masks(problem, model_id, options)
    problem = shard_problem(problem, mesh)
    step = sharded_lm_step(mesh, model_id, options)
    lam = jnp.asarray(options.initial_lambda, dtype=problem.points.dtype)
    nu = jnp.asarray(2.0, dtype=problem.points.dtype)
    initial_cost = float(ba.compute_cost(problem, model_id, options))
    cost_prev = initial_cost
    n_iters = 0
    for it in range(options.max_iterations):
        problem, lam, nu, cost, new_cost, accepted = step(problem, masks, lam, nu)
        n_iters += 1
        if verbose:
            print(f"  sharded LM it {it}: {float(cost):.4e} -> {float(new_cost):.4e}")
        if bool(accepted):
            rel = abs(cost_prev - float(new_cost)) / max(float(new_cost), 1e-30)
            cost_prev = float(new_cost)
            if rel < options.function_tolerance:
                break
    final_cost = float(ba.compute_cost(problem, model_id, options))
    return problem, {
        "initial_cost": initial_cost,
        "final_cost": final_cost,
        "num_iterations": n_iters,
        "num_devices": n_dev,
    }
