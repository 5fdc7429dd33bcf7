"""Generate docs/DESCRIPTOR_EVAL.md: every descriptor (incl. learned-triplet
LATCH) + a GN-vs-LM solver column, over the synthetic corridor with exact
ground truth (VERDICT r2 item 8; reference apps/eval_descriptors.cc)."""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from bpvo_tpu.apps import eval_descriptors as ed  # noqa: E402
from bpvo_tpu.types import DescriptorType  # noqa: E402

CONF = str(Path(__file__).resolve().parents[1] / "conf" / "eval_corridor.cfg")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    # all descriptors under GN
    res = ed.run(CONF, num_frames=n)
    # solver ablation on the two flagship descriptors
    res_lm = ed.run(CONF, num_frames=n,
                    descriptors=[DescriptorType.INTENSITY,
                                 DescriptorType.BITPLANES],
                    solvers=("GaussNewton", "LevenbergMarquardt"))

    lines = [
        "# Descriptor / solver ablation (round 3)",
        "",
        f"Synthetic corridor, {n} frames, exact ground truth "
        "(`conf/eval_corridor.cfg`, `scripts/run_descriptor_eval.py`; "
        "reference analogue apps/eval_descriptors.cc over Tsukuba — no real "
        "datasets exist in this container).  LATCH uses the OpenCV learned "
        "triplet table (`bpvo_tpu/ops/latch_table.py`).  Timing is host CPU "
        "(relative cost only; device rates live in BENCH_*.json).",
        "",
        "## All descriptors (Gauss-Newton)",
        "",
        "| descriptor | ATE RMSE (m) | mean iters | ms/frame (CPU) |",
        "|---|---|---|---|",
    ]
    for tag, r in res.items():
        ate = f"{r.get('ate_rmse_m', float('nan')):.4f}"
        lines.append(f"| {tag} | {ate} | {r['mean_iters']:.1f} | "
                     f"{r['mean_ms']:.1f} |")
    lines += [
        "",
        "## GN vs LM (pose_estimator_lm.h peer-solver comparison)",
        "",
        "| descriptor | solver | ATE RMSE (m) | mean iters | ms/frame (CPU) |",
        "|---|---|---|---|---|",
    ]
    for tag, r in res_lm.items():
        desc, solver = tag.rsplit("+", 1)
        ate = f"{r.get('ate_rmse_m', float('nan')):.4f}"
        lines.append(f"| {desc} | {solver} | {ate} | {r['mean_iters']:.1f} | "
                     f"{r['mean_ms']:.1f} |")
    lines.append("")
    lines.append(
        "Notes: `Latch` runs the reference's own default `latchNumBytes = 1` "
        "(types.cc:38) = only the first 8 of 512 learned triplets; see the "
        "committed table for the full-run interpretation notes.")
    out = Path(__file__).resolve().parents[1] / "docs" / "DESCRIPTOR_EVAL.md"
    out.write_text("\n".join(lines))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
