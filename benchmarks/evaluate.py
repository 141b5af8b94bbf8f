"""Multi-seed reconstruction evaluation: pose-error recall curves + AUC.

reference behavior: benchmark/reconstruction/evaluate.py:30-57 runs the
pipeline num_seeds times per scene and reports pose-accuracy AUC at error
thresholds via evaluation/utils.py:144-177 (recall curve integration);
compare.py diffs two report files.

TPU-native difference: scenes are synthesized (scene/synthetic.py — the
reference's own test cornerstone, scene/synthetic.h:41) so the harness runs
hermetically without dataset egress; with real data on disk the same
entrypoint accepts a COLMAP database path.

Usage:
  python -m benchmarks.evaluate --num_frames 50 --num_seeds 3
  python -m benchmarks.evaluate --compare report_a.json report_b.json
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time
from typing import Dict, List, Optional, Sequence

import numpy as np

# Error thresholds for the recall curve (reference evaluation/utils.py:
# rotation degrees / projection-center distance in GT units).
ROT_THRESHOLDS_DEG = (0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0)
CENTER_THRESHOLDS = (0.001, 0.0025, 0.005, 0.01, 0.025, 0.05, 0.1)


def auc_from_errors(errors: np.ndarray, thresholds: Sequence[float],
                    num_total: int) -> Dict[str, float]:
    """Recall@threshold and the normalized area under the recall curve
    (reference: evaluation/utils.py:144-177 — errors of unregistered images
    count as infinite)."""
    errors = np.sort(np.asarray(errors, dtype=np.float64))
    out = {}
    aucs = []
    for t in thresholds:
        # Piecewise-linear integration of recall(e) for e in [0, t].
        e = errors[errors <= t]
        recall = np.arange(1, len(e) + 1) / max(num_total, 1)
        if len(e) == 0:
            auc = 0.0
        else:
            # trapezoid over [0, t] with recall step function
            xs = np.concatenate([[0.0], e, [t]])
            ys = np.concatenate([[0.0], recall, [recall[-1]]])
            auc = float(np.trapezoid(ys, xs) / t)
        out[f"recall@{t}"] = float(len(e) / max(num_total, 1))
        out[f"auc@{t}"] = auc
        aucs.append(auc)
    out["mean_auc"] = float(np.mean(aucs))
    return out


def evaluate_reconstruction(recon, gt) -> Dict:
    """Per-image rotation/center errors after Sim3 alignment onto GT;
    unregistered GT images count as infinite error."""
    from colmap_tpu.estimators.alignment import compare_reconstructions

    stats = compare_reconstructions(recon, gt)
    n_gt = len(gt.reg_image_ids())
    if stats.get("num_common_images", 0) < 3:
        rot = np.full(0, np.inf)
        ctr = np.full(0, np.inf)
    else:
        rot = stats["rotation_errors_deg"]
        ctr = stats["center_errors"]
    return {
        "num_registered": int(stats.get("num_common_images", 0)),
        "num_gt": n_gt,
        "rotation": auc_from_errors(rot, ROT_THRESHOLDS_DEG, n_gt),
        "center": auc_from_errors(ctr, CENTER_THRESHOLDS, n_gt),
        "max_rotation_error_deg": float(stats.get(
            "max_rotation_error_deg", np.inf)),
        "max_center_error": float(stats.get("max_center_error", np.inf)),
    }


def run_scene(num_frames: int, num_points: int, seed: int,
              mapper: str = "incremental",
              match_config: Optional[str] = None,
              inlier_match_ratio: float = 1.0,
              point2D_stddev: float = 0.0) -> Dict:
    """Synthesize one scene and reconstruct it with the requested mapper."""
    from colmap_tpu.scene.database import Database
    from colmap_tpu.scene.synthetic import (
        MatchConfig, SyntheticDatasetOptions, synthesize_dataset,
    )

    db = Database(":memory:")
    options = SyntheticDatasetOptions(
        num_rigs=1, num_cameras_per_rig=1, num_frames_per_rig=num_frames,
        num_points3D=num_points, seed=seed,
        inlier_match_ratio=inlier_match_ratio,
        point2D_stddev=point2D_stddev,
    )
    if match_config is not None:
        options = dataclasses.replace(
            options, match_config=MatchConfig[match_config.upper()]
        )
    gt = synthesize_dataset(options, db)

    start = time.perf_counter()
    if mapper == "incremental":
        from colmap_tpu.sfm.incremental_pipeline import (
            IncrementalPipeline, IncrementalPipelineOptions,
        )

        recons = IncrementalPipeline(IncrementalPipelineOptions(), db).run()
    elif mapper == "global":
        from colmap_tpu.sfm.global_pipeline import (
            GlobalPipeline, GlobalPipelineOptions,
        )

        recon = GlobalPipeline(GlobalPipelineOptions(), db).run()
        recons = [recon] if recon is not None else []
    else:
        raise ValueError(f"unknown mapper {mapper!r}")
    elapsed = time.perf_counter() - start

    result = {"seed": seed, "wall_s": round(elapsed, 2),
              "frames_per_s": round(num_frames / elapsed, 3)}
    if recons:
        best = max(recons, key=lambda r: r.num_reg_frames())
        result.update(evaluate_reconstruction(best, gt))
    else:
        result.update({"num_registered": 0, "num_gt": num_frames})
    return result


def evaluate(num_frames: int = 50, num_points: int = 300,
             num_seeds: int = 3, mapper: str = "incremental",
             inlier_match_ratio: float = 1.0,
             point2D_stddev: float = 0.0) -> Dict:
    runs = [
        run_scene(num_frames, num_points, seed, mapper,
                  inlier_match_ratio=inlier_match_ratio,
                  point2D_stddev=point2D_stddev)
        for seed in range(num_seeds)
    ]
    mean_rot_auc = float(np.mean(
        [r.get("rotation", {}).get("mean_auc", 0.0) for r in runs]))
    mean_ctr_auc = float(np.mean(
        [r.get("center", {}).get("mean_auc", 0.0) for r in runs]))
    return {
        "config": {
            "num_frames": num_frames, "num_points": num_points,
            "num_seeds": num_seeds, "mapper": mapper,
            "inlier_match_ratio": inlier_match_ratio,
            "point2D_stddev": point2D_stddev,
        },
        "mean_rotation_auc": mean_rot_auc,
        "mean_center_auc": mean_ctr_auc,
        "mean_frames_per_s": float(np.mean(
            [r["frames_per_s"] for r in runs])),
        "registration_rate": float(np.mean(
            [r["num_registered"] / max(r["num_gt"], 1) for r in runs])),
        "runs": runs,
    }


def compare_reports(path_a: str, path_b: str) -> Dict:
    """Diff two report files (reference: benchmark/reconstruction/compare.py)."""
    with open(path_a) as f:
        a = json.load(f)
    with open(path_b) as f:
        b = json.load(f)
    keys = ("mean_rotation_auc", "mean_center_auc", "mean_frames_per_s",
            "registration_rate")
    return {k: {"a": a.get(k), "b": b.get(k),
                "delta": (b.get(k, 0) or 0) - (a.get(k, 0) or 0)}
            for k in keys}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_frames", type=int, default=50)
    ap.add_argument("--num_points", type=int, default=300)
    ap.add_argument("--num_seeds", type=int, default=3)
    ap.add_argument("--mapper", default="incremental",
                    choices=["incremental", "global"])
    ap.add_argument("--inlier_match_ratio", type=float, default=1.0)
    ap.add_argument("--point2D_stddev", type=float, default=0.0)
    ap.add_argument("--output", default="")
    ap.add_argument("--compare", nargs=2, metavar=("A", "B"))
    args = ap.parse_args()
    if args.compare:
        print(json.dumps(compare_reports(*args.compare), indent=2))
        return
    report = evaluate(args.num_frames, args.num_points, args.num_seeds,
                      args.mapper, args.inlier_match_ratio,
                      args.point2D_stddev)
    text = json.dumps(report, indent=2)
    if args.output:
        with open(args.output, "w") as f:
            f.write(text)
    print(text)


if __name__ == "__main__":
    main()
