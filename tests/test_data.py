"""Data layer tests: PLY roundtrip, COLMAP binary roundtrip, view selection,
nerf++ norm, resolution policy."""

import os

import numpy as np
import pytest

from binocular3dgs_tpu.data import colmap, ply
from binocular3dgs_tpu.data.readers import (
    CameraInfo,
    compute_resolution,
    get_nerfpp_norm,
    read_colmap_cameras,
    select_few_views,
)


def _cam_info(i, n=20):
    rng = np.random.default_rng(i)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    R = colmap.qvec2rotmat(q).T
    return CameraInfo(
        uid=i, R=R, T=rng.normal(size=3), fovy=0.7, fovx=0.9,
        image_path=None, image_name=f"img_{i:03d}", width=640, height=480,
    )


class TestPly:
    def test_point_cloud_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        xyz = rng.normal(size=(100, 3))
        rgb = rng.integers(0, 256, size=(100, 3))
        p = str(tmp_path / "pc.ply")
        ply.store_point_cloud(p, xyz, rgb)
        pc = ply.fetch_point_cloud(p)
        np.testing.assert_allclose(pc.points, xyz, atol=1e-5)
        np.testing.assert_allclose(pc.colors * 255, rgb, atol=0.5)
        assert pc.normals is not None

    def test_gaussian_ply_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        P, deg = 50, 1
        K = (deg + 1) ** 2
        data = {
            "xyz": rng.normal(size=(P, 3)).astype(np.float32),
            "f_dc": rng.normal(size=(P, 1, 3)).astype(np.float32),
            "f_rest": rng.normal(size=(P, K - 1, 3)).astype(np.float32),
            "opacity": rng.normal(size=(P, 1)).astype(np.float32),
            "scaling": rng.normal(size=(P, 3)).astype(np.float32),
            "rotation": rng.normal(size=(P, 4)).astype(np.float32),
        }
        p = str(tmp_path / "model.ply")
        ply.save_gaussian_ply(
            p, data["xyz"], data["f_dc"], data["f_rest"],
            data["opacity"], data["scaling"], data["rotation"],
        )
        loaded = ply.load_gaussian_ply(p, max_sh_degree=deg)
        for k in data:
            np.testing.assert_allclose(loaded[k], data[k], atol=1e-6, err_msg=k)

    def test_gaussian_ply_attribute_order(self, tmp_path):
        # byte-layout compat: field order must be x,y,z,nx,ny,nz,f_dc_*,f_rest_*,
        # opacity,scale_*,rot_* (reference gaussian_model.py:177-189)
        P, K = 3, 4
        p = str(tmp_path / "m.ply")
        ply.save_gaussian_ply(
            p,
            np.zeros((P, 3), np.float32),
            np.zeros((P, 1, 3), np.float32),
            np.zeros((P, K - 1, 3), np.float32),
            np.zeros((P, 1), np.float32),
            np.zeros((P, 3), np.float32),
            np.zeros((P, 4), np.float32),
        )
        rec = ply.read_ply(p)["vertex"]
        names = list(rec.dtype.names)
        expected = (
            ["x", "y", "z", "nx", "ny", "nz"]
            + [f"f_dc_{i}" for i in range(3)]
            + [f"f_rest_{i}" for i in range(9)]
            + ["opacity"]
            + [f"scale_{i}" for i in range(3)]
            + [f"rot_{i}" for i in range(4)]
        )
        assert names == expected

    def test_f_rest_channel_major_flattening(self, tmp_path):
        # reference flattens (P, K-1, 3) via transpose(1,2) -> channel-major
        P, K = 1, 4
        f_rest = np.arange(P * (K - 1) * 3, dtype=np.float32).reshape(P, K - 1, 3)
        p = str(tmp_path / "m.ply")
        ply.save_gaussian_ply(
            p,
            np.zeros((P, 3), np.float32),
            np.zeros((P, 1, 3), np.float32),
            f_rest,
            np.zeros((P, 1), np.float32),
            np.zeros((P, 3), np.float32),
            np.zeros((P, 4), np.float32),
        )
        rec = ply.read_ply(p)["vertex"]
        # channel-major: f_rest_0..2 are channel 0 coeffs 1..3 = values 0,3,6
        assert [float(rec[f"f_rest_{i}"][0]) for i in range(3)] == [0.0, 3.0, 6.0]


class TestColmap:
    def test_qvec_rotmat_roundtrip(self):
        rng = np.random.default_rng(0)
        for _ in range(10):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            if q[0] < 0:
                q = -q
            R = colmap.qvec2rotmat(q)
            np.testing.assert_allclose(colmap.rotmat2qvec(R), q, atol=1e-6)

    def test_binary_roundtrip(self, tmp_path):
        rng = np.random.default_rng(3)
        cams = {
            1: colmap.ColmapCamera(1, "PINHOLE", 640, 480, np.array([500.0, 510.0, 320.0, 240.0]))
        }
        images = {}
        for i in range(1, 4):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            images[i] = colmap.ColmapImage(
                i, q, rng.normal(size=3), 1, f"im_{i}.png",
                rng.normal(size=(5, 2)), np.arange(5, dtype=np.int64),
            )
        xyz = rng.normal(size=(10, 3))
        rgb = rng.integers(0, 255, size=(10, 3))
        err = rng.random((10, 1))

        colmap.write_cameras_binary(str(tmp_path / "cameras.bin"), cams)
        colmap.write_images_binary(str(tmp_path / "images.bin"), images)
        colmap.write_points3d_binary(str(tmp_path / "points3D.bin"), xyz, rgb, err)

        cams2 = colmap.read_cameras_binary(str(tmp_path / "cameras.bin"))
        assert cams2[1].model == "PINHOLE" and cams2[1].width == 640
        np.testing.assert_allclose(cams2[1].params, cams[1].params)

        images2 = colmap.read_images_binary(str(tmp_path / "images.bin"))
        for i in images:
            np.testing.assert_allclose(images2[i].qvec, images[i].qvec)
            np.testing.assert_allclose(images2[i].tvec, images[i].tvec)
            assert images2[i].name == images[i].name
            np.testing.assert_allclose(images2[i].xys, images[i].xys)

        xyz2, rgb2, err2 = colmap.read_points3d_binary(str(tmp_path / "points3D.bin"))
        np.testing.assert_allclose(xyz2, xyz)
        np.testing.assert_allclose(rgb2, rgb)
        np.testing.assert_allclose(err2, err, atol=1e-12)


class TestViewSelection:
    def test_llff_holdout(self):
        cams = [_cam_info(i) for i in range(20)]
        train, test = select_few_views(cams, "LLFF", 3)
        assert [c.uid for c in test] == [0, 8, 16]
        # train = linspace over the 17 non-holdout views at indices {0, 8, 16}
        non_hold = [c for i, c in enumerate(cams) if i % 8 != 0]
        expect = [non_hold[round(i)].uid for i in np.linspace(0, len(non_hold) - 1, 3)]
        assert [c.uid for c in train] == expect

    def test_dtu_indices(self):
        cams = [_cam_info(i, 49) for i in range(49)]
        train, test = select_few_views(cams, "DTU", 3)
        assert [c.uid for c in train] == [25, 22, 28]
        assert len(test) == 25

    def test_nerfpp_norm_radius(self):
        cams = [_cam_info(i) for i in range(8)]
        norm = get_nerfpp_norm(cams)
        centers = []
        for c in cams:
            centers.append(-c.R @ c.T)
        centers = np.stack(centers)
        avg = centers.mean(axis=0)
        expected = 1.1 * np.max(np.linalg.norm(centers - avg, axis=1))
        np.testing.assert_allclose(norm["radius"], expected, rtol=1e-6)


class TestResolutionPolicy:
    def test_divisors(self):
        assert compute_resolution(1000, 800, 2) == (500, 400)
        assert compute_resolution(1001, 801, 4) == (250, 200)

    def test_default_caps_1600(self):
        w, h = compute_resolution(3200, 2400, -1)
        assert w == 1600 and h == 1200

    def test_default_small_passthrough(self):
        assert compute_resolution(800, 600, -1) == (800, 600)

    def test_target_width(self):
        assert compute_resolution(1000, 800, 500) == (500, 400)
