"""Multi-host plumbing smoke tests (process_count == 1 here).

VERDICT r1 item 9: the multi-host path must run unchanged on the virtual
8-device mesh with one process; true multi-process execution needs real
pod hardware and is env-untestable (see parallel/multihost.py docstring).
"""

import jax
import jax.numpy as jnp
import numpy as np

from colmap_tpu.estimators import bundle_adjustment as ba
from colmap_tpu.parallel import multihost, sharded_ba
from colmap_tpu.scene.synthetic_ba import synthetic_ba_problem


def test_initialize_noop_single_process():
    multihost.initialize()
    assert multihost.process_count() == 1
    assert multihost.process_index() == 0


def test_global_mesh_shapes():
    mesh = multihost.global_mesh(axis_name="obs")
    assert mesh.devices.size == len(jax.devices())
    mesh2d = multihost.global_mesh_2d()
    assert mesh2d.devices.shape == (1, len(jax.devices()))
    assert mesh2d.axis_names == ("frame", "point")


def test_local_work_slice():
    items = list(range(10))
    assert multihost.local_work_slice(items) == items
    # Simulated 3-process split: strided, disjoint, complete.
    parts = [
        multihost.local_work_slice(items, process_id=p, n_processes=3)
        for p in range(3)
    ]
    assert sorted(sum(parts, [])) == items
    assert parts[0] == [0, 3, 6, 9]


def test_all_gather_host_objects_single():
    out = multihost.all_gather_host_objects({"a": np.ones(3)})
    assert len(out) == 1 and out[0]["a"].shape == (3,)


def test_sharded_packed_ba_on_global_mesh():
    """The packed sharded solver must accept a multihost-constructed mesh
    (the exact object a pod run would build)."""
    mesh = multihost.global_mesh(axis_name="d")
    problem, gt, model_id = synthetic_ba_problem(
        num_frames=8, num_points=120, obs_per_point=4, dtype=jnp.float64,
        pixel_noise=0.3, pose_noise=0.01, point_noise=0.01, seed=3,
    )
    options = ba.BAOptions(
        max_iterations=4, pcg_iterations=20, function_tolerance=0.0,
        solver_type="pcg",
    )
    masks = ba.default_masks(problem, model_id, options)
    masks = ba.fix_gauge_two_frames(masks, 0, 1)
    out, summary = sharded_ba.solve_sharded_packed(
        problem, model_id, options, masks, mesh=mesh, axis_name="d"
    )
    assert summary["num_devices"] == len(jax.devices())
    assert summary["final_cost"] <= summary["initial_cost"]
