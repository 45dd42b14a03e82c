"""IO + dataset loader tests: TUM trajectory roundtrip, PLY roundtrip,
snapshot roundtrip, TUM directory loader on a generated mini-dataset."""

import os

import jax
import numpy as np
import pytest

from monocular_slam_tpu.datasets import synthetic, tum
from monocular_slam_tpu.eval import ate
from monocular_slam_tpu.io import ply, snapshot, trajectory
from monocular_slam_tpu.slam import state as state_mod
from monocular_slam_tpu.slam.config import SlamConfig, FrontendConfig


class TestTrajectoryIO:
    def test_roundtrip(self, tmp_path):
        poses = np.asarray(synthetic.arc_trajectory(12), np.float64)
        ts = np.arange(12) * 0.1
        p = str(tmp_path / "traj.txt")
        trajectory.write_tum(p, poses, ts)
        ts2, poses2 = trajectory.read_tum(p)
        np.testing.assert_allclose(ts2, ts, atol=1e-6)
        np.testing.assert_allclose(poses2, poses, atol=1e-7)

    def test_valid_mask_skips(self, tmp_path):
        poses = np.asarray(synthetic.arc_trajectory(5), np.float64)
        ts = np.arange(5.0)
        valid = np.array([True, False, True, True, False])
        p = str(tmp_path / "traj.txt")
        trajectory.write_tum(p, poses, ts, valid)
        ts2, poses2 = trajectory.read_tum(p)
        assert len(ts2) == 3


class TestPlyIO:
    def test_points_roundtrip(self, tmp_path):
        rng = np.random.RandomState(0)
        xyz = rng.randn(100, 3)
        p = str(tmp_path / "cloud.ply")
        ply.write_ply_points(p, xyz)
        xyz2 = ply.read_ply_points(p)
        np.testing.assert_allclose(xyz2, xyz, atol=1e-5)

    def test_mesh_writes(self, tmp_path):
        xyz = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], float)
        faces = np.array([[0, 1, 2]])
        p = str(tmp_path / "mesh.ply")
        ply.write_ply_mesh(p, xyz, faces)
        assert "element face 1" in open(p).read()


class TestSnapshot:
    def test_state_roundtrip(self, tmp_path):
        cfg = SlamConfig(max_frames=4, max_points=100, frontend=FrontendConfig(n_features=50))
        st = state_mod.empty_state(cfg)
        st = st._replace(n_points=st.n_points + 7)
        p = str(tmp_path / "state.npz")
        snapshot.save_state(p, st)
        st2 = snapshot.load_state(p)
        for f in st._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(st, f)), np.asarray(getattr(st2, f)), err_msg=f
            )


def make_mini_tum(root, n=6):
    """Generate a tiny TUM-format dataset on disk with images + gt."""
    from PIL import Image

    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    rng = np.random.RandomState(0)
    poses = np.asarray(synthetic.arc_trajectory(n), np.float64)
    with open(os.path.join(root, "rgb.txt"), "w") as frgb, open(
        os.path.join(root, "groundtruth.txt"), "w"
    ) as fgt:
        fgt.write("# gt\n")
        for i in range(n):
            ts = 1000.0 + i * 0.1
            name = f"rgb/{ts:.6f}.png"
            img = (rng.rand(48, 64) * 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(root, name))
            frgb.write(f"{ts:.6f} {name}\n")
            # camera-to-world for gt file
            R_wc = poses[i, :3, :3]
            t_wc = poses[i, :3, 3]
            R_cw = R_wc.T
            C = -R_cw @ t_wc
            from scipy.spatial.transform import Rotation

            q = Rotation.from_matrix(R_cw).as_quat()
            # gt written at slightly offset timestamps (association test)
            fgt.write(
                f"{ts + 0.005:.6f} {C[0]} {C[1]} {C[2]} {q[0]} {q[1]} {q[2]} {q[3]}\n"
            )
    return poses


class TestTumLoader:
    def test_load_and_associate(self, tmp_path):
        root = str(tmp_path / "rgbd_dataset_freiburg1_test")
        poses = make_mini_tum(root)
        seq = tum.load(root)
        assert len(seq.frames) == 6
        assert seq.k[0] == pytest.approx(517.306408)
        for i, fr in enumerate(seq.frames):
            assert fr.pose_gt is not None  # 5 ms offset < 20 ms bound
            np.testing.assert_allclose(fr.pose_gt, poses[i], atol=1e-6)
        img = seq.load_image(0)
        assert img.shape == (48, 64)

    def test_frame_window(self, tmp_path):
        root = str(tmp_path / "rgbd_dataset_freiburg1_test2")
        make_mini_tum(root)
        seq = tum.load(root, start=0, end=6, step=2)
        assert len(seq.frames) == 3

    def test_gt_out_of_tolerance_skipped(self, tmp_path):
        root = str(tmp_path / "rgbd_dataset_freiburg1_test3")
        make_mini_tum(root)
        # shift all gt timestamps by 50 ms > 20 ms bound
        gt = os.path.join(root, "groundtruth.txt")
        lines = open(gt).readlines()
        with open(gt, "w") as f:
            for line in lines:
                if line.startswith("#"):
                    f.write(line)
                else:
                    vals = line.split()
                    f.write(f"{float(vals[0]) + 0.05:.6f} " + " ".join(vals[1:]) + "\n")
        seq = tum.load(root)
        # last frame's gt is 55 ms away -> dropped; others may associate to
        # the next gt line (100 ms spacing - 45 ms...) check at least one None
        assert any(fr.pose_gt is None for fr in seq.frames)
