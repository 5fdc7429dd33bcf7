"""The example scripts must run end-to-end."""
import subprocess
import sys


def test_synthetic_vo_example():
    out = subprocess.run(
        [sys.executable, "examples/synthetic_vo.py", "4"],
        capture_output=True, text=True, timeout=300,
        env={"PATH": "/usr/bin:/bin:/opt/venv/bin",
             "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "/root/repo"},
        cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "final position error" in out.stdout
