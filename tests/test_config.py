"""Config loading: the reference's own YAML files must load unchanged."""

import numpy as np
import pytest

from ergo_uvo_tpu.config import (
    LMEDS,
    PNP_EPNP,
    MonoVOConfig,
    StereoVOConfig,
    load_mono_intrinsics,
    load_stereo_intrinsics,
    load_vo_params,
)

REF = "/root/reference/uvo/config"


def _have_reference():
    import os

    return os.path.isdir(REF)


pytestmark = [
    pytest.mark.skipif(not _have_reference(), reason="reference configs not mounted"),
    pytest.mark.fast,  # smoke tier: pure YAML loading, no compiles
]


def test_mono_params_load():
    cfg = load_vo_params(f"{REF}/mono_VO_parameters.yaml")
    assert isinstance(cfg, MonoVOConfig)
    assert cfg.feature_detector == "SURF"
    assert cfg.lowe_ratio_test == 0.7
    assert cfg.essential.outlier_method == LMEDS
    assert cfg.essential.max_iters == 2000
    assert cfg.essential.threshold == 0.1
    assert cfg.homography_distance == 50.0
    assert cfg.valid_point_fraction == 0.4
    assert cfg.min_num_features == 20  # float in YAML, coerced like ROS
    assert cfg.min_num_inliers == 10
    assert cfg.min_num_3d_points == 5
    assert cfg.preprocessing.desired_width == 640
    assert cfg.preprocessing.clahe is True
    assert cfg.preprocessing.clip_limit == 3.0
    assert cfg.surf.min_hessian == 50.0
    assert cfg.surf.upright is True
    assert cfg.surf.extended is False


def test_stereo_params_load():
    cfg = load_vo_params(f"{REF}/stereo_VO_parameters.yaml", stereo=True)
    assert isinstance(cfg, StereoVOConfig)
    assert cfg.lowe_ratio_test == 0.8
    assert cfg.min_num_features == 5
    assert cfg.reprojection_threshold == 3.0
    assert cfg.iterations_count == 1000
    assert cfg.reprojection_error == 1.0
    assert cfg.pnp_method_flag == PNP_EPNP
    assert cfg.preprocessing.clip_limit == 8.0
    assert cfg.surf.min_hessian == 1500.0


def test_mono_intrinsics_load():
    intr = load_mono_intrinsics(f"{REF}/mono_VO_intrinsics.yaml", "downward_camera")
    assert intr.fx == pytest.approx(2305.660253962050)
    assert intr.k1 == pytest.approx(0.08)
    K = intr.K()
    assert K[0, 2] == pytest.approx(1281.944364189583)
    assert K[2, 2] == 1.0
    frontal = load_mono_intrinsics(f"{REF}/mono_VO_intrinsics.yaml", "frontal_camera")
    assert frontal.fx == pytest.approx(1335.036735254999)


def test_stereo_intrinsics_load():
    rig = load_stereo_intrinsics(f"{REF}/stereo_VO_intrinsics.yaml", "frontal_camera")
    assert rig.left.fx == pytest.approx(1335.036735254999)
    assert rig.right.fx == pytest.approx(1330.461901943011)
    np.testing.assert_allclose(np.array(rig.R_left), np.eye(3))
    np.testing.assert_allclose(np.array(rig.t_right), [-0.33, 0.0, 0.0])


def test_configs_hashable_for_jit_static():
    cfg = MonoVOConfig()
    assert hash(cfg) == hash(MonoVOConfig())
    assert cfg == MonoVOConfig()
