"""Auxiliary subsystems: checkpointing, profiling harness, multihost mesh,
viz, timers."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from bpvo_tpu.utils import checkpoint, profiling, timer, viz


class TestCheckpoint:
    def test_vo_state_roundtrip(self, tmp_path):
        from bpvo_tpu.vo.device_vo import DeviceVO
        from bpvo_tpu.vo.trajectory import Trajectory
        from test_gn import H_IMG, W_IMG, make_cam
        from test_odometry import make_sequence
        from bpvo_tpu import AlgorithmParameters

        frames = make_sequence([0, 0, 0, 0.004, 0, 0.008], 3)
        cam = make_cam()
        p = AlgorithmParameters(minSaliency=2.0, numPyramidLevels=2,
                                functionTolerance=1e-4,
                                parameterTolerance=1e-6)
        vo = DeviceVO(np.asarray(cam.K()), float(cam.baseline),
                      (H_IMG, W_IMG), p)
        for I, D in frames[:2]:
            vo.add_frame(I, D)

        tr = Trajectory()
        tr.push(np.eye(4))
        path = str(tmp_path / "ckpt.npz")
        checkpoint.save_vo_state(path, vo.state, tr, {"frame": 2})

        state2, traj, meta = checkpoint.load_vo_state(path, vo.state)
        assert meta["frame"] == 2
        assert traj.shape == (1, 4, 4)
        # resuming from the restored state gives identical next-frame output
        out_a = vo._step_jit(vo.state, jnp.asarray(frames[2][0]),
                             jnp.asarray(frames[2][1]))[1]
        out_b = vo._step_jit(state2, jnp.asarray(frames[2][0]),
                             jnp.asarray(frames[2][1]))[1]
        np.testing.assert_array_equal(np.asarray(out_a.pose),
                                      np.asarray(out_b.pose))


class TestProfiling:
    def test_timed_and_force_sync(self):
        f = jax.jit(lambda x: x * 2 + 1)
        x = jnp.ones((64, 64))
        ms = profiling.timed(f, x, n_rep=3)
        assert ms >= 0.0

    def test_trace_writes(self, tmp_path):
        d = str(tmp_path / "trace")
        with profiling.trace(d):
            jax.jit(lambda x: x + 1)(jnp.ones(8)).block_until_ready()
        assert os.path.isdir(d)


class TestMultihost:
    def test_global_mesh_axes(self):
        from bpvo_tpu.parallel import multihost
        n = len(jax.devices())
        mesh = multihost.global_mesh()
        assert mesh.shape[multihost.KEYFRAME_AXIS] == 1
        assert mesh.shape["points"] == n
        if n % 2 == 0 and n > 1:
            mesh2 = multihost.global_mesh(kf_axis_size=2)
            assert mesh2.shape[multihost.KEYFRAME_AXIS] == 2
            assert mesh2.shape["points"] == n // 2

    def test_initialize_noop_single_process(self):
        from bpvo_tpu.parallel import multihost
        multihost.initialize()  # must not raise
        info = multihost.process_info()
        assert info["process_count"] >= 1


class TestViz:
    def test_colorize(self):
        D = np.zeros((20, 30), np.float32)
        D[5:15, 5:25] = 10.0
        c = viz.colorize_disparity(D)
        assert c.shape == (20, 30, 3)
        assert c[0, 0].sum() == 0  # invalid is black
        assert c[10, 10].sum() > 0

    def test_overlay(self):
        img = np.full((20, 30), 128, np.uint8)
        D = np.full((20, 30), 5.0, np.float32)
        out = viz.overlay_disparity(img, D)
        assert out.shape == (20, 30, 3)


class TestTimer:
    def test_stage_timer(self):
        st = timer.StageTimer()
        with st.stage("a"):
            pass
        st.add("b", 2.0)
        s = st.summary()
        assert "a" in s and s["b"] == 2.0
        assert "a" in st.report()


class TestHostVOCheckpoint:
    def test_save_load_resume(self, tmp_path):
        from bpvo_tpu import AlgorithmParameters, VisualOdometry
        from test_gn import H_IMG, W_IMG, make_cam
        from test_odometry import make_sequence

        frames = make_sequence([0, 0, 0, 0.004, 0, 0.008], 4)
        cam = make_cam()
        p = AlgorithmParameters(minSaliency=2.0, numPyramidLevels=2,
                                functionTolerance=1e-4,
                                parameterTolerance=1e-6)
        vo = VisualOdometry(np.asarray(cam.K()), float(cam.baseline),
                            (H_IMG, W_IMG), p)
        for I, D in frames[:3]:
            vo.add_frame(I, D)
        ckpt = str(tmp_path / "vo_state")
        vo.save(ckpt)
        res_a = vo.add_frame(*frames[3])

        vo2 = VisualOdometry(np.asarray(cam.K()), float(cam.baseline),
                             (H_IMG, W_IMG), p)
        vo2.load(ckpt)
        assert len(vo2.trajectory) == 3
        res_b = vo2.add_frame(*frames[3])
        np.testing.assert_allclose(res_a.pose, res_b.pose, atol=1e-5)
        np.testing.assert_allclose(vo.trajectory.back(),
                                   vo2.trajectory.back(), atol=1e-5)
