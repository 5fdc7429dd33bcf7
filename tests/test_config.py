import os

from bpvo_tpu import AlgorithmParameters, ConfigFile
from bpvo_tpu.types import DescriptorType, LossFunctionType


def test_defaults():
    p = AlgorithmParameters()
    assert p.numPyramidLevels == -1
    assert p.maxIterations == 50
    assert p.lossFunction == LossFunctionType.TUKEY
    assert p.descriptor == DescriptorType.INTENSITY
    assert p.withNormalization


def test_config_file_roundtrip(tmp_path):
    f = tmp_path / "test.cfg"
    f.write_text(
        """
        # a comment
        numPyramidLevels = 4   % trailing comment
        descriptor = BitPlanes
        lossFunction = Huber
        minSaliency = 2.5
        withNormalization = 1
        """
    )
    p = AlgorithmParameters.from_config_file(str(f))
    assert p.numPyramidLevels == 4
    assert p.descriptor == DescriptorType.BITPLANES
    assert p.lossFunction == LossFunctionType.HUBER
    assert abs(p.minSaliency - 2.5) < 1e-9
    assert p.withNormalization


def test_config_case_insensitive(tmp_path):
    f = tmp_path / "case.cfg"
    f.write_text("MAXITERATIONS = 7\n")
    cf = ConfigFile(str(f))
    assert cf.get("maxIterations", 50, int) == 7


def test_config_save(tmp_path):
    cf = ConfigFile()
    cf.set("Alpha", 1).set("Beta", "two")
    out = tmp_path / "saved.cfg"
    cf.save(str(out))
    cf2 = ConfigFile(str(out))
    assert cf2.get("alpha", 0, int) == 1
    assert cf2.get("BETA", "", str) == "two"


def test_reference_configs_parse():
    """All reference conf/*.cfg files must parse through our config system."""
    ref_conf = "/root/reference/conf"
    if not os.path.isdir(ref_conf):
        return
    n = 0
    for name in os.listdir(ref_conf):
        if name.endswith(".cfg"):
            AlgorithmParameters.from_config_file(os.path.join(ref_conf, name))
            n += 1
    assert n > 0


def test_repo_configs_parse():
    """Every shipped conf/*.cfg parses and names a known dataset type."""
    conf_dir = os.path.join(os.path.dirname(__file__), "..", "conf")
    known = {"kitti", "tsukuba_synthetic", "tsukuba_stereo", "tunnel",
             "synthetic", "synthetic_corridor", "synthetic_occluder",
             "disparity"}
    n = 0
    for name in sorted(os.listdir(conf_dir)):
        if name.endswith(".cfg"):
            path = os.path.join(conf_dir, name)
            AlgorithmParameters.from_config_file(path)
            assert ConfigFile(path).get("Dataset", "", str).lower() in known
            n += 1
    assert n >= 9


def test_auto_pyramid_levels():
    p = AlgorithmParameters()
    # 480x640: 1 + round(log2(480/40)) = 1 + round(3.58) = 5
    assert p.num_pyramid_levels_for(480, 640) == 5
    assert p.replace(numPyramidLevels=3).num_pyramid_levels_for(480, 640) == 3


def test_frozen_hashable():
    p = AlgorithmParameters()
    hash(p)  # usable as a jit static arg
