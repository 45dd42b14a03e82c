"""Depth back-projection, mesh reconstruction, and trajectory-comparison tests."""

import jax
import jax.numpy as jnp
import numpy as np

from monocular_slam_tpu.datasets import synthetic
from monocular_slam_tpu.eval import compare
from monocular_slam_tpu.geometry import camera, se3, so3
from monocular_slam_tpu.io import trajectory as traj_io
from monocular_slam_tpu.slam import depth as depth_mod
from monocular_slam_tpu.viz import mesh as mesh_mod

K = jnp.array([525.0, 525.0, 319.5, 239.5])


class TestDepth:
    def test_backprojection_roundtrip(self):
        # Render a synthetic depth image of a slanted plane, back-project,
        # re-project: identity.
        H, W = 120, 160
        k = jnp.array([130.0, 130.0, 80.0, 60.0])
        ys, xs = jnp.mgrid[0:H, 0:W]
        depth = 2.0 + 0.002 * xs + 0.001 * ys
        X, valid = depth_mod.depth_to_cloud(depth, k, stride=2)
        assert bool(valid.all())
        uv = camera.project(k, X)
        ys2, xs2 = jnp.mgrid[0:H:2, 0:W:2]
        expect = jnp.stack([xs2, ys2], axis=-1).reshape(-1, 2)
        np.testing.assert_allclose(np.asarray(uv), np.asarray(expect), atol=1e-4)

    def test_world_frame_transform(self):
        H, W = 40, 60
        k = jnp.array([50.0, 50.0, 30.0, 20.0])
        depth = jnp.full((H, W), 3.0)
        T = se3.from_Rt(so3.exp(jnp.array([0.1, 0.2, 0.0])), jnp.array([1.0, 0.0, -0.5]))
        Xw, valid = depth_mod.depth_to_cloud(depth, k, T_wc=T, stride=4)
        Xc, _ = depth_mod.depth_to_cloud(depth, k, stride=4)
        np.testing.assert_allclose(
            np.asarray(se3.apply(T, Xw)), np.asarray(Xc), atol=1e-5
        )

    def test_invalid_depths_masked(self):
        depth = jnp.zeros((16, 16)).at[0, 0].set(jnp.nan).at[1, 1].set(100.0)
        X, valid = depth_mod.depth_to_cloud(depth, K, stride=1, max_depth=10.0)
        assert not bool(valid.any())


class TestMesh:
    def make_surface(self, n=400):
        rng = np.random.RandomState(0)
        xy = rng.uniform(-1, 1, (n, 2))
        z = 0.2 * np.sin(2 * xy[:, 0]) + 0.1 * xy[:, 1] ** 2
        return np.column_stack([xy, z])

    def test_normals_of_plane(self):
        rng = np.random.RandomState(1)
        pts = np.column_stack([rng.uniform(-1, 1, (200, 2)), np.zeros(200)])
        n = mesh_mod.estimate_normals(pts, k=8)
        # all normals close to +-z
        assert (np.abs(n[:, 2]) > 0.99).mean() > 0.95

    def test_outlier_removal(self):
        pts = self.make_surface()
        bad = np.array([[0.0, 0.0, 5.0], [1.0, 1.0, -7.0]])
        allp = np.vstack([pts, bad])
        kept, keep = mesh_mod.remove_outliers(allp, k=8, std_ratio=2.0)
        assert not keep[-1] and not keep[-2]
        assert keep[:-2].mean() > 0.95

    def test_voxel_downsample(self):
        pts = self.make_surface(1000)
        down = mesh_mod.voxel_downsample(pts, 0.2)
        assert 10 < len(down) < len(pts)

    def test_greedy_mesh(self, tmp_path):
        pts = self.make_surface()
        verts, faces = mesh_mod.greedy_projection_mesh(pts)
        assert len(faces) > 300
        assert faces.max() < len(verts)
        # triangles connect nearby points only
        L = np.linalg.norm(verts[faces[:, 0]] - verts[faces[:, 1]], axis=1)
        assert np.median(L) < 0.4
        from monocular_slam_tpu.io import ply

        ply.write_ply_mesh(str(tmp_path / "m.ply"), verts, faces)


class TestCompare:
    def test_identical_trajectories(self, tmp_path):
        poses = np.asarray(synthetic.arc_trajectory(20), np.float64)
        ts = np.arange(20) * 0.1
        a = str(tmp_path / "a.txt")
        b = str(tmp_path / "b.txt")
        traj_io.write_tum(a, poses, ts)
        traj_io.write_tum(b, poses, ts)
        r = compare.compare(a, b)
        assert r["n_associated"] == 20
        assert r["ate_rmse"] < 1e-9

    def test_scaled_trajectory_aligns(self, tmp_path):
        poses = np.asarray(synthetic.arc_trajectory(20), np.float64)
        ts = np.arange(20) * 0.1
        # scale the world by 3 (monocular scale ambiguity)
        poses_s = poses.copy()
        poses_s[:, :, 3] *= 3.0
        a, b = str(tmp_path / "a.txt"), str(tmp_path / "b.txt")
        traj_io.write_tum(a, poses_s, ts)
        traj_io.write_tum(b, poses, ts)
        r = compare.compare(a, b)
        assert abs(r["scale"] - 1 / 3.0) < 1e-6
        assert r["ate_rmse"] < 1e-9

    def test_timestamp_offset_association(self, tmp_path):
        poses = np.asarray(synthetic.arc_trajectory(20), np.float64)
        a, b = str(tmp_path / "a.txt"), str(tmp_path / "b.txt")
        traj_io.write_tum(a, poses, np.arange(20) * 0.1)
        traj_io.write_tum(b, poses, np.arange(20) * 0.1 + 0.005)  # 5 ms offset
        r = compare.compare(a, b)
        assert r["n_associated"] == 20


class TestPoisson:
    """Poisson surface reconstruction — the watertight-mesh capability of
    `pcl::Poisson` in the reference (`src/PointCloudVisualizer.cpp:533-605`),
    as a grid Poisson solve + marching tetrahedra."""

    def test_sphere_watertight(self):
        rng = np.random.RandomState(0)
        d = rng.normal(size=(4000, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        v, t = mesh_mod.poisson_mesh(d, normals=d, depth=5)
        assert len(t) > 1000
        # watertight: every edge shared by an even number of triangles
        assert mesh_mod.mesh_boundary_edges(t) == 0
        r = np.linalg.norm(v - d.mean(0), axis=1)
        assert abs(r.mean() - 1.0) < 0.05
        assert r.std() < 0.05

    def test_estimated_normals_box(self, tmp_path):
        """Reconstruct a box from positions only (normals estimated), then
        round-trip the mesh through PLY (the reference's export path)."""
        rng = np.random.RandomState(1)
        n = 1500
        # points on the surface of a unit box
        face = rng.randint(0, 6, n)
        uv = rng.uniform(-1, 1, (n, 2))
        pts = np.zeros((n, 3))
        ax = face % 3
        sign = np.where(face < 3, 1.0, -1.0)
        for i in range(n):
            others = [a for a in range(3) if a != ax[i]]
            pts[i, ax[i]] = sign[i]
            pts[i, others[0]] = uv[i, 0]
            pts[i, others[1]] = uv[i, 1]
        v, t = mesh_mod.poisson_mesh(pts, depth=5)
        assert len(t) > 500
        assert mesh_mod.mesh_boundary_edges(t) == 0
        # verts lie near the box surface (sup-norm ~1)
        sup = np.abs(v).max(axis=1)
        assert np.median(np.abs(sup - 1.0)) < 0.15
        from monocular_slam_tpu.io import ply

        path = str(tmp_path / "box.ply")
        ply.write_ply_mesh(path, v, t)
        v2, t2 = ply.read_ply_mesh(path)
        np.testing.assert_allclose(v2, v, atol=1e-4)
        np.testing.assert_array_equal(t2, t)
