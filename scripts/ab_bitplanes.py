"""BitPlanes linearize-backend A/B on device: accuracy (vs exact synthetic
ground truth) + throughput, for the jnp gather path vs the stacked fused
kernel (f32 and bf16 column mix).  VERDICT r3 item 1's gate: the winner
becomes the production default only with BOTH Hz and accuracy measured.

Usage:
  python scripts/ab_bitplanes.py            # driver: runs all 3 backends
  python scripts/ab_bitplanes.py one <tag>  # single backend (env pre-set)
"""
import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

CONFIGS = {
    "jnp": {"BPVO_LINEARIZE": "jnp"},
    "fused_f32": {"BPVO_LINEARIZE": "fused", "BPVO_FUSED_BF16": "0"},
    "fused_bf16": {"BPVO_LINEARIZE": "fused", "BPVO_FUSED_BF16": "1"},
}


def run_one(tag: str):
    import numpy as np
    import jax
    import jax.numpy as jnp
    import bench as bench_mod
    from bpvo_tpu.core import se3
    from bpvo_tpu.vo.device_vo import DeviceVO

    n = 1 + 4 * bench_mod.CHUNK
    K, baseline, frames = bench_mod.synthesize_sequence(n)
    images = jax.device_put(jnp.asarray(
        np.stack([f[0] for f in frames]), jnp.float32))
    disps = jax.device_put(jnp.asarray(
        np.stack([f[1] for f in frames]), jnp.float32))
    step = np.asarray(se3.exp(jnp.asarray(
        [0.0005, 0.001, 0.0008, 0.006, 0.002, 0.03], jnp.float32)))

    vo = DeviceVO(K, baseline, (bench_mod.ROWS, bench_mod.COLS),
                  bench_mod._make_params("BitPlanes"))
    c = bench_mod.CHUNK
    # bench-grade warmup: chunk 1 pays the XLA compile, chunk 2 settles
    # donated-buffer aliasing (the first donated call can relayout)
    outs = vo.add_frames(images[:c + 1], disps[:c + 1])
    np.asarray(outs.pose)
    outs = vo.add_frames(images[c + 1:2 * c + 1], disps[c + 1:2 * c + 1])
    np.asarray(outs.pose)
    hz_chunks = []
    all_poses = []
    for k in (2, 3):
        t0 = time.perf_counter()
        outs = vo.add_frames(images[k * c + 1:(k + 1) * c + 1],
                             disps[k * c + 1:(k + 1) * c + 1])
        poses = np.asarray(outs.pose)
        dt = time.perf_counter() - t0
        hz_chunks.append(c / dt)
        all_poses.append(poses)
    hz = float(np.median(hz_chunks))
    poses = np.concatenate(all_poses)

    # every frame's relative pose must equal the constant GT step
    errs = []
    for P in poses:
        E = P @ np.linalg.inv(step)
        errs.append(np.abs(np.asarray(se3.log(jnp.asarray(
            E, jnp.float32)))).max())
    errs = np.asarray(errs)
    kf = int(np.asarray(outs.is_keyframe).sum())
    iters = float(np.asarray(outs.iters).sum(1).mean())
    print(json.dumps({
        "tag": tag, "hz": round(hz, 1),
        "pose_err_mean": float(errs.mean()), "pose_err_max": float(errs.max()),
        "keyframes": kf, "mean_iters": round(iters, 1)}), flush=True)


def main():
    results = {}
    for tag, env in CONFIGS.items():
        e = dict(os.environ)
        e.update(env)
        print(f"=== {tag} {env}", flush=True)
        out = subprocess.run(
            [sys.executable, __file__, "one", tag], env=e, cwd=str(ROOT),
            capture_output=True, text=True)
        print(out.stdout, out.stderr[-2000:] if out.returncode else "",
              flush=True)
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                results[tag] = json.loads(line)
    path = ROOT / "docs" / "PALLAS_TPU.json"
    existing = json.loads(path.read_text()) if path.exists() else {}
    existing["bitplanes_backend_ab"] = results
    path.write_text(json.dumps(existing, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        run_one(sys.argv[2])
    else:
        main()
