"""Plot KITTI-devkit evaluation outputs: the analogue of the reference's
MATLAB analysis tooling (matlab/m/eval_kitti_seq.m, matlab/eval/*.m — the
plotting drivers around the devkit error files; VERDICT r4 missing item 3).

Consumes what `bpvo_tpu/eval/kitti_eval.py` already writes:
  <prefix>_kitti.txt  estimated poses (3x4 rows)     [required]
  <gt>                ground-truth poses             [required]
  <prefix>_tl/_rl.txt mean t/r error per segment length   (written on demand)
  <prefix>_ts/_rs.txt mean t/r error per speed bin        (written on demand)

Produces <prefix>_traj.png (top-down x-z trajectory, GT vs estimate) and
<prefix>_errors.png (2x2: t/r error vs path length and vs speed — the four
panels the devkit's plotPathPlot/plotErrorPlots emit).

Usage: python scripts/plot_kitti_eval.py <gt_poses.txt> <prefix>
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from bpvo_tpu.eval import kitti_eval  # noqa: E402

# fixed 2-entry categorical assignment (identity follows the entity):
# ground truth is the recessive dark gray, the estimate the single hue
C_GT = "#4b5563"
C_EST = "#2563eb"
GRID = dict(color="#e5e7eb", linewidth=0.8)


def _style(ax):
    ax.grid(True, **GRID)
    ax.set_axisbelow(True)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)


def plot_trajectory(gt, est, out_png: str):
    g = np.array([[T[0, 3], T[2, 3]] for T in gt])
    e = np.array([[T[0, 3], T[2, 3]] for T in est])
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.plot(g[:, 0], g[:, 1], color=C_GT, linewidth=2, label="ground truth")
    ax.plot(e[:, 0], e[:, 1], color=C_EST, linewidth=2, label="estimate")
    ax.scatter([g[0, 0]], [g[0, 1]], s=40, color=C_GT, zorder=3,
               label="start")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_aspect("equal", adjustable="datalim")
    ax.legend(frameon=False)
    _style(ax)
    fig.tight_layout()
    fig.savefig(out_png, dpi=150)
    plt.close(fig)


def _load_pairs(path: str):
    if not os.path.exists(path):
        return None
    a = np.loadtxt(path)
    return a.reshape(-1, 2) if a.size else None


def plot_errors(prefix: str, out_png: str):
    panels = [
        ("_tl", "path length [m]", "translation error [%]", 100.0),
        ("_rl", "path length [m]", "rotation error [deg/m]",
         180.0 / np.pi),
        ("_ts", "speed [m/s]", "translation error [%]", 100.0),
        ("_rs", "speed [m/s]", "rotation error [deg/m]", 180.0 / np.pi),
    ]
    fig, axes = plt.subplots(2, 2, figsize=(9, 7))
    for (suffix, xl, yl, scale), ax in zip(panels, axes.ravel()):
        d = _load_pairs(prefix + suffix + ".txt")
        if d is None:
            ax.set_visible(False)
            continue
        ax.plot(d[:, 0], d[:, 1] * scale, color=C_EST, linewidth=2,
                marker="o", markersize=5)
        ax.set_xlabel(xl)
        ax.set_ylabel(yl)
        ax.set_ylim(bottom=0)
        _style(ax)
    fig.tight_layout()
    fig.savefig(out_png, dpi=150)
    plt.close(fig)


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    gt_file, prefix = sys.argv[1], sys.argv[2]
    est_file = (prefix if prefix.endswith(".txt")
                else prefix + "_kitti.txt")
    prefix = est_file[:-len("_kitti.txt")] if est_file.endswith(
        "_kitti.txt") else os.path.splitext(est_file)[0]
    gt = kitti_eval.load_poses(gt_file)
    est = kitti_eval.load_poses(est_file)
    n = min(len(gt), len(est))
    gt, est = gt[:n], est[:n]

    # ensure the devkit error files exist (write them like run_kitti_eval)
    if not os.path.exists(prefix + "_tl.txt"):
        errors = kitti_eval.calc_sequence_errors(gt, est)
        if errors:
            kitti_eval.save_error_plot_data(errors, prefix)

    plot_trajectory(gt, est, prefix + "_traj.png")
    plot_errors(prefix, prefix + "_errors.png")
    stats = kitti_eval.evaluate_sequence(gt_file, est_file)
    print(f"t_err {stats.t_err_percent:.3f}%  "
          f"r_err {stats.r_err_deg_per_m:.5f} deg/m  "
          f"ate_rmse {kitti_eval.ate_rmse(gt, est):.4f} m")
    print(f"wrote {prefix}_traj.png, {prefix}_errors.png")


if __name__ == "__main__":
    main()
