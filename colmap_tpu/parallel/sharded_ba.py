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
