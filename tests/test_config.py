import numpy as np

from clid_slam_tpu.config import Config


def test_shipped_configs_load():
    for name in ("run_ncd128", "run_SubT_MRS", "run_quad"):
        c = Config.load(f"configs/{name}.yaml")
        assert c.deskew is True
        assert c.track_on is True
        assert c.bs == 16384
        assert c.sdf_scale == c.logistic_gaussian_ratio * c.sigma_sigmoid_m
        # derived values (reference utils/config.py:902-910)
        assert c.window_radius == max(c.max_range, 6.0)
        assert c.local_map_radius == c.max_range + 2.0


def test_ncd128_values():
    c = Config.load("configs/run_ncd128.yaml")
    assert c.voxel_size_m == 0.4
    assert c.search_alpha == 0.5
    assert c.surface_sample_n == 4
    assert c.free_sample_begin_ratio == 0.5
    assert c.free_sample_end_dist_m == 1.2
    assert c.source_vox_down_m == 0.6
    assert c.iters == 10
    assert c.adaptive_iters is True
    assert c.loss_weight_on is True
    np.testing.assert_allclose(c.T_imu_lidar[0, 3], 0.014)
    # tpu capacities rounded to pow2
    assert c.map_capacity == 1 << 22
    assert c.max_scan_points == 1 << 16


def test_quad_values():
    c = Config.load("configs/run_quad.yaml")
    assert c.dynamic_filter_on is True
    assert c.adaptive_range_on is True
    assert c.begin_frame == 500 and c.end_frame == 1800
    assert c.voxel_size_m == 0.2
    assert c.sigma_sigmoid_m == 0.05
    assert c.free_front_n == 6
    assert c.iters == 20
    assert c.T_imu_lidar[0, 0] == -1.0


def test_reference_yaml_without_tpu_section(tmp_path):
    # a reference-format YAML with no tpu section must load with defaults
    p = tmp_path / "min.yaml"
    p.write_text(
        "setting:\n  name: x\nprocess:\n  max_range_m: 30.0\n"
        "tracker:\n  iter_n: 20\n"
    )
    c = Config.load(str(p))
    assert c.max_range == 30.0
    assert c.reg_iter_n == 20
    assert c.map_capacity == 1 << 20  # default


def test_dup_independent_auto_by_loss_type(tmp_path):
    # advisor r4: the expanded-duplicates approximation is only
    # A/B-validated for bce — auto-resolve OFF for the other loss types
    p = tmp_path / "z.yaml"
    p.write_text(
        "setting:\n  name: x\nloss:\n  main_loss_type: zhong\n"
    )
    c = Config.load(str(p))
    assert c.map_dup_independent is False
    p2 = tmp_path / "b.yaml"
    p2.write_text("setting:\n  name: x\nloss:\n  main_loss_type: bce\n")
    c2 = Config.load(str(p2))
    assert c2.map_dup_independent is True
    # explicit force wins over auto
    c3 = Config()
    c3.main_loss_type = "zhong"
    c3.map_dup_independent = True
    c3._derive()
    assert c3.map_dup_independent is True
