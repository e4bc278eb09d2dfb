"""Multi-device SPMD tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from clean_pvnet_tpu.config import MeshConfig
from clean_pvnet_tpu.geometry import compute_vertex_field_np
from clean_pvnet_tpu.parallel import make_mesh
from clean_pvnet_tpu.parallel.voting_sharded import make_sharded_vote


def make_scene(rng, h=64, w=64, vn=9, blob=28):
    mask = np.zeros((h, w), np.uint8)
    mask[10 : 10 + blob, 14 : 14 + blob] = 1
    kpt = np.stack(
        [rng.rand(vn) * w * 0.8 + w * 0.1, rng.rand(vn) * h * 0.8 + h * 0.1], -1
    ).astype(np.float32)
    vertex = compute_vertex_field_np(mask, kpt).reshape(h, w, vn, 2)
    return mask, vertex, kpt


class TestShardedVoting:
    def test_recovers_keypoints_8way(self, rng):
        mesh = make_mesh(MeshConfig(hyp_shards=8), num_devices=8)
        vote = make_sharded_vote(mesh, num_hypotheses=512, max_pixels=512)
        mask, vertex, kpt = make_scene(rng)
        kpt_pred, ratio = vote(
            jnp.asarray(mask), jnp.asarray(vertex), jax.random.PRNGKey(0)
        )
        err = np.linalg.norm(np.asarray(kpt_pred) - kpt, axis=-1)
        assert err.max() < 0.5, err
        assert (np.asarray(ratio) > 0.5).all()

    def test_matches_single_shard_quality_with_noise(self, rng):
        mask, vertex, kpt = make_scene(rng, vn=4)
        noisy = vertex + rng.randn(*vertex.shape).astype(np.float32) * 0.05
        noisy /= np.linalg.norm(noisy, axis=-1, keepdims=True) + 1e-9
        noisy *= mask[..., None, None]

        mesh8 = make_mesh(MeshConfig(hyp_shards=8), num_devices=8)
        vote8 = make_sharded_vote(mesh8, num_hypotheses=512, max_pixels=256)
        k8, _ = vote8(jnp.asarray(mask), jnp.asarray(noisy), jax.random.PRNGKey(1))

        mesh1 = make_mesh(MeshConfig(hyp_shards=1), num_devices=1)
        # hyp axis of size 1 → same code path, single shard
        from clean_pvnet_tpu.ops.voting import ransac_vote

        r1 = ransac_vote(
            jnp.asarray(mask), jnp.asarray(noisy), jax.random.PRNGKey(1),
            num_hypotheses=512, max_pixels=256,
        )
        e8 = np.linalg.norm(np.asarray(k8) - kpt, axis=-1)
        e1 = np.linalg.norm(np.asarray(r1.kpt_2d) - kpt, axis=-1)
        # sharded population ≥ as good as single-device on median error
        assert np.median(e8) < max(np.median(e1) * 2.0, 2.5), (e8, e1)

    def test_empty_mask(self, rng):
        mesh = make_mesh(MeshConfig(hyp_shards=8), num_devices=8)
        vote = make_sharded_vote(mesh, num_hypotheses=256, max_pixels=128)
        mask = np.zeros((32, 32), np.uint8)
        vertex = np.zeros((32, 32, 9, 2), np.float32)
        kpt_pred, ratio = vote(
            jnp.asarray(mask), jnp.asarray(vertex), jax.random.PRNGKey(0)
        )
        np.testing.assert_allclose(np.asarray(kpt_pred), 0.0)


class TestGraftEntry:
    def test_dryrun_multichip(self):
        import __graft_entry__ as g

        g.dryrun_multichip(8)

    def test_entry_compiles(self):
        import __graft_entry__ as g

        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        assert out["seg"].shape == (1, 480, 640, 2)
        assert out["vertex"].shape == (1, 480, 640, 18)
