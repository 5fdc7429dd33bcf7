"""End-to-end VO benchmark on the target device (TPU under the driver).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Headline metric: effective VO frame rate (Hz) on a synthetic 376x1241
KITTI-sized sequence with the intensity descriptor — directly comparable to
the reference's ``vo_perf`` 100+ Hz claim on a 2011 dual-core i7 (reference
README.md:72, apps/vo_perf.cc).  vs_baseline = achieved_hz / 100.

Extra keys (same JSON object) record the 8-channel Bit-Planes descriptor rate
(the reference's namesake mode, bitplanes_descriptor.cc:84-91) and the spread
of the measurement (median of N_TIMED chunks + IQR), per VERDICT.md items 2/4.
A full breakdown is persisted to BENCH_DETAIL.json next to this script.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_HZ = 100.0  # reference vo_perf claim (README.md:72)

# KITTI image size (seq 00)
ROWS, COLS = 376, 1241
CHUNK = 60          # scan-mode chunk: amortizes the ~40 ms per-call tunnel RTT
N_WARMUP_CHUNKS = 2  # 1st pays XLA compile, 2nd settles donated-buffer aliasing
N_TIMED = 3          # timed chunks; report median + IQR
N_FRAMES = 1 + (N_WARMUP_CHUNKS + N_TIMED) * CHUNK
N_WARMUP = 5        # online-mode warmup frames


def synthesize_sequence(n_frames, rows=ROWS, cols=COLS):
    """Plane scene with non-periodic value-noise texture, constant
    forward+lateral motion.

    Round 3: the previous analytic sinusoid texture (7-13 px periods) was
    globally self-similar — the tracker alias-locked onto a wrong motion one
    texture period away and collapsed into keyframing every frame, which was
    the entire round-2 within-run decay (docs/PERFORMANCE.md).  Value noise
    has no translation symmetry, like real imagery.
    """
    import jax.numpy as jnp
    from bpvo_tpu.core import se3
    from bpvo_tpu.data.synthetic import value_noise_texture as texture

    fx = 718.856
    K = np.array([[fx, 0, cols / 2.0], [0, fx, rows / 2.0], [0, 0, 1]],
                 np.float64)
    baseline = 0.537
    n_pl = np.array([0.12, 0.22, 1.0])
    n_pl /= np.linalg.norm(n_pl)
    z0 = 8.0
    d_pl = z0 * n_pl[2]

    step = np.asarray(se3.exp(jnp.asarray(
        [0.0005, 0.001, 0.0008, 0.006, 0.002, 0.03], jnp.float32)),
        dtype=np.float64)

    uu, vv = np.meshgrid(np.arange(cols, dtype=np.float64),
                         np.arange(rows, dtype=np.float64))
    rays = np.stack([(uu - K[0, 2]) / K[0, 0], (vv - K[1, 2]) / K[1, 1],
                     np.ones_like(uu)], -1)

    frames = []
    T = np.eye(4)
    for _ in range(n_frames):
        R, t = T[:3, :3], T[:3, 3]
        Hm = K @ (R + np.outer(t, n_pl) / d_pl) @ np.linalg.inv(K)
        Hinv = np.linalg.inv(Hm)
        w = Hinv[2, 0] * uu + Hinv[2, 1] * vv + Hinv[2, 2]
        x0 = (Hinv[0, 0] * uu + Hinv[0, 1] * vv + Hinv[0, 2]) / w
        y0 = (Hinv[1, 0] * uu + Hinv[1, 1] * vv + Hinv[1, 2]) / w
        I = texture(x0, y0).astype(np.float32)
        n1 = R @ n_pl
        d1 = d_pl + n1 @ t
        Z = d1 / (rays @ n1)
        D = (fx * baseline / Z).astype(np.float32)
        frames.append((I, D))
        T = step @ T
    return K.astype(np.float32), baseline, frames


def _make_params(descriptor: str):
    from bpvo_tpu import AlgorithmParameters
    from bpvo_tpu.types import DescriptorType
    desc = (DescriptorType.BITPLANES if descriptor == "BitPlanes"
            else DescriptorType.INTENSITY)
    return AlgorithmParameters(
        minSaliency=2.0, numPyramidLevels=4, descriptor=desc,
        functionTolerance=1e-4, parameterTolerance=1e-6, maxIterations=50)


def run_scan(K, baseline, images, disps, descriptor: str):
    """Timed scan-mode run: N_WARMUP_CHUNKS warmups + N_TIMED timed chunks.

    Returns (median_hz, per-chunk Hz list).  The timed region excludes host
    upload — the sequence is staged in HBM up front; see main() for why.
    """
    from bpvo_tpu.vo.device_vo import DeviceVO

    vo = DeviceVO(K, baseline, (ROWS, COLS), _make_params(descriptor))
    c = CHUNK
    # warmup chunks of the SAME length as the timed chunk: the first pays the
    # XLA compile, the second settles donated-buffer aliasing (the first
    # donated call can trigger a one-off ~0.5 s relayout).
    vo.add_frames(images[:c + 1], disps[:c + 1])       # init + c steps
    np.asarray(vo.state.pose_world)
    for k in range(1, N_WARMUP_CHUNKS):
        vo.add_frames(images[k * c + 1:(k + 1) * c + 1],
                      disps[k * c + 1:(k + 1) * c + 1])
        np.asarray(vo.state.pose_world)

    hz_chunks = []
    poses = None
    for k in range(N_WARMUP_CHUNKS, N_WARMUP_CHUNKS + N_TIMED):
        lo, hi = k * c + 1, (k + 1) * c + 1
        t0 = time.perf_counter()
        outs = vo.add_frames(images[lo:hi], disps[lo:hi])
        poses = np.asarray(outs.pose_world)   # forces device sync (fetch)
        dt = time.perf_counter() - t0
        hz_chunks.append(c / dt)
    assert np.all(np.isfinite(poses)), "non-finite trajectory"
    del vo
    return float(np.median(hz_chunks)), [round(h, 2) for h in hz_chunks]


def measure_dispatch_rtt():
    """ms per round-trip of a trivial jitted op + fetch — quantifies the
    tunnel/dispatch overhead that bounds online (per-frame) mode on this
    backend (VERDICT item 6: report the RTT contribution next to online Hz)."""
    import jax
    import jax.numpy as jnp
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.asarray(0.0, jnp.float32)
    np.asarray(f(x))
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        np.asarray(f(x))
    return (time.perf_counter() - t0) / reps * 1e3


def run_online(K, baseline, images, disps, per_frame: bool = False):
    """Online mode: one jitted step per frame (latency-oriented deployment);
    on the tunneled backend this is dispatch-RTT-bound, not compute-bound.

    ``per_frame`` additionally measures the HOST-OBSERVED per-frame latency
    (dispatch + device step + fetch of the pose each frame — the number an
    online consumer of the pose actually waits; the reference's vo_perf
    dumps exactly this stream to _time.txt, apps/vo_perf.cc:100-139) and
    returns (pipelined_hz, latencies_ms list)."""
    import jax
    from bpvo_tpu.vo.device_vo import DeviceVO

    n_frames = min(30, images.shape[0])
    vo = DeviceVO(K, baseline, (ROWS, COLS), _make_params("Intensity"))
    # Per-frame device arrays: indexing the stacked array inside the loop
    # would launch one extra slice dispatch per frame.
    frame_list = [(jax.device_put(images[i]), jax.device_put(disps[i]))
                  for i in range(n_frames)]
    out = None
    for i in range(N_WARMUP):
        out = vo.add_frame(*frame_list[i])
    if out is not None:
        np.asarray(out.pose)
    t0 = time.perf_counter()
    n = 0
    for i in range(N_WARMUP, n_frames):
        out = vo.add_frame(*frame_list[i])
        n += 1
    poses = np.asarray(out.pose_world)
    dt = time.perf_counter() - t0
    assert np.all(np.isfinite(poses))
    hz = n / dt
    if not per_frame:
        return hz
    # latency pass: fetch the pose EVERY frame (no pipelining) — each sample
    # is one full submit->compute->fetch round trip
    lat_ms = []
    for i in range(N_WARMUP, n_frames):
        t1 = time.perf_counter()
        out = vo.add_frame(*frame_list[i])
        np.asarray(out.pose)
        lat_ms.append((time.perf_counter() - t1) * 1e3)
    return hz, lat_ms


def main():
    # BPVO_BENCH_MODE: "scan" (default, device-throughput) | "online"
    # BPVO_BENCH_DESCRIPTORS: comma list, default "Intensity,BitPlanes"
    mode = os.environ.get("BPVO_BENCH_MODE", "scan")
    descs = os.environ.get("BPVO_BENCH_DESCRIPTORS",
                           "Intensity,BitPlanes").split(",")

    K, baseline, frames = synthesize_sequence(N_FRAMES)

    # Stage the sequence in HBM before the timed region.  The driver's
    # host<->device link is a ~50 MB/s relay tunnel (measured; a real v5e
    # host's PCIe is ~2 orders of magnitude faster), so per-frame uploads
    # would measure the tunnel, not the VO.  In deployment the loader thread
    # (data/loader.py device_prefetch) overlaps this copy with compute,
    # exactly like the reference's DatasetLoaderThread overlaps disk IO
    # (reference apps/vo_app.cc:213-247).
    import jax
    import jax.numpy as jnp
    images = jax.device_put(jnp.asarray(
        np.stack([f[0] for f in frames]), jnp.float32))
    disps = jax.device_put(jnp.asarray(
        np.stack([f[1] for f in frames]), jnp.float32))
    del frames

    detail = {"mode": mode, "chunk": CHUNK, "n_timed": N_TIMED}
    if mode == "online":
        hz = run_online(K, baseline, images, disps)
        result = {
            "metric": "vo_frame_rate_synth_kitti_intensity_online",
            "value": round(hz, 2), "unit": "Hz",
            "vs_baseline": round(hz / BASELINE_HZ, 3),
        }
    else:
        hz_by_desc = {}
        for d in descs:
            d = d.strip()
            med, chunks = run_scan(K, baseline, images, disps, d)
            hz_by_desc[d] = med
            q1, q3 = np.percentile(chunks, [25, 75])
            detail[d] = {"median_hz": round(med, 2), "chunks_hz": chunks,
                         "iqr_hz": round(float(q3 - q1), 2)}
        hz = hz_by_desc.get("Intensity", next(iter(hz_by_desc.values())))
        result = {
            "metric": "vo_frame_rate_synth_kitti_intensity",
            "value": round(hz, 2), "unit": "Hz",
            "vs_baseline": round(hz / BASELINE_HZ, 3),
        }
        if "Intensity" in detail:
            result["intensity_chunks_hz"] = detail["Intensity"]["chunks_hz"]
            result["intensity_iqr_hz"] = detail["Intensity"]["iqr_hz"]
        if "BitPlanes" in hz_by_desc:
            result["bitplanes_hz"] = round(hz_by_desc["BitPlanes"], 2)
            result["bitplanes_vs_baseline"] = round(
                hz_by_desc["BitPlanes"] / BASELINE_HZ, 3)
        # deployable-path (streaming) figure: one dispatch per frame.  On
        # this relay-tunneled backend each dispatch pays a measured RTT that
        # a real v5e host does not; report both so the number is honest.
        if os.environ.get("BPVO_BENCH_ONLINE", "1") != "0":
            try:
                rtt_ms = measure_dispatch_rtt()
                online_hz, lat_ms = run_online(K, baseline, images, disps,
                                               per_frame=True)
                result["online_hz"] = round(online_hz, 2)
                result["online_vs_baseline"] = round(
                    online_hz / BASELINE_HZ, 3)
                result["dispatch_rtt_ms"] = round(rtt_ms, 2)
                # per-frame pose latency distribution (host-observed: one
                # submit->compute->fetch round trip per sample), raw and net
                # of the tunnel RTT a real PCIe host would not pay — the
                # honest headline for the online use case (VERDICT r4
                # item 5); Hz alone hides the latency path entirely
                p50 = float(np.percentile(lat_ms, 50))
                p99 = float(np.percentile(lat_ms, 99))
                result["online_p50_ms"] = round(p50, 2)
                result["online_p99_ms"] = round(p99, 2)
                result["online_p50_ms_rtt_corrected"] = round(
                    max(p50 - rtt_ms, 0.0), 2)
                # Dispatches pipeline (add_frame does not fetch), so a frame
                # time below the RTT means the tunnel latency is fully hidden
                # and no correction applies; only when the loop is slower
                # than one RTT per frame does the serialized-RTT share get
                # reported net of the tunnel.
                frame_ms = 1e3 / online_hz
                # only meaningful when the frame time clearly exceeds the
                # RTT — near frame_ms ~ rtt_ms the subtraction is noise and
                # reports an arbitrarily inflated Hz (ADVICE round 3)
                if frame_ms > 1.2 * rtt_ms:
                    result["online_hz_rtt_corrected"] = round(
                        1e3 / (frame_ms - rtt_ms), 2)
                elif frame_ms > rtt_ms:
                    result["online_rtt_dominated"] = True
                detail["online"] = {
                    "hz": result["online_hz"], "rtt_ms": result[
                        "dispatch_rtt_ms"],
                    "rtt_hidden_by_pipelining": frame_ms <= rtt_ms,
                    "p50_ms": result["online_p50_ms"],
                    "p99_ms": result["online_p99_ms"],
                    "latencies_ms": [round(t, 2) for t in lat_ms]}
            except Exception as e:  # online must not sink the headline
                result["online_error"] = f"{type(e).__name__}: {e}"

    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json"), "w") as f:
            json.dump(detail, f, indent=1)
    except OSError:
        pass
    print(json.dumps(result))


if __name__ == "__main__":
    main()
