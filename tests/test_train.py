import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clean_pvnet_tpu.config import Config
from clean_pvnet_tpu.geometry import compute_vertex_field_np
from clean_pvnet_tpu.models import PVNet
from clean_pvnet_tpu.parallel import make_mesh, shard_batch
from clean_pvnet_tpu.train import (
    CheckpointIO,
    Trainer,
    create_train_state,
    make_optimizer,
    multistep_schedule,
    pvnet_loss,
    smooth_l1,
)


def tiny_model():
    return PVNet(ver_dim=6, seg_dim=2, fc_dim=32, s8_dim=16, s4_dim=8,
                 s2_dim=8, raw_dim=8)


def tiny_batch(rng, b=8, h=32, w=32, vn=3):
    inps, masks, verts = [], [], []
    for i in range(b):
        mask = np.zeros((h, w), np.uint8)
        mask[6 + i % 3 : 26, 8 : 28] = 1
        kpt = (rng.rand(vn, 2) * [w * 0.8, h * 0.8] + [2, 2]).astype(np.float32)
        vert = compute_vertex_field_np(mask, kpt)
        inp = rng.rand(h, w, 3).astype(np.float32)
        inp[..., 0] += mask  # learnable signal
        inps.append(inp)
        masks.append(mask)
        verts.append(vert)
    return {
        "inp": jnp.asarray(np.stack(inps)),
        "mask": jnp.asarray(np.stack(masks).astype(np.int32)),
        "vertex": jnp.asarray(np.stack(verts)),
    }


class TestLoss:
    def test_smooth_l1_matches_torch_semantics(self):
        x = jnp.asarray([-2.0, -0.5, 0.0, 0.5, 2.0])
        got = smooth_l1(x, jnp.zeros_like(x))
        expect = jnp.asarray([1.5, 0.125, 0.0, 0.125, 1.5])
        np.testing.assert_allclose(got, expect, atol=1e-6)

    def test_vote_loss_normalization(self, rng):
        # doubling background pixels must not change the vote loss
        b, h, w = 1, 8, 8
        mask = np.zeros((h, w), np.int32)
        mask[2:4, 2:4] = 1
        vert_gt = rng.randn(b, h, w, 6).astype(np.float32)
        vert_pred = vert_gt + 0.5
        seg = np.zeros((b, h, w, 2), np.float32)
        _, stats1 = pvnet_loss(
            jnp.asarray(seg), jnp.asarray(vert_pred), jnp.asarray(mask[None]),
            jnp.asarray(vert_gt),
        )
        big = np.zeros((b, h, w * 2, 2), np.float32)
        mask2 = np.concatenate([mask, np.zeros_like(mask)], -1)
        vg2 = np.concatenate([vert_gt, np.zeros_like(vert_gt)], 2)
        vp2 = np.concatenate([vert_pred, np.zeros_like(vert_pred)], 2)
        _, stats2 = pvnet_loss(
            jnp.asarray(big), jnp.asarray(vp2), jnp.asarray(mask2[None]),
            jnp.asarray(vg2),
        )
        np.testing.assert_allclose(
            float(stats1["vote_loss"]), float(stats2["vote_loss"]), rtol=1e-5
        )

    def test_masked_region_only(self, rng):
        # corrupting predictions outside the mask must not change vote loss
        b, h, w = 1, 8, 8
        mask = np.zeros((h, w), np.int32)
        mask[2:6, 2:6] = 1
        vert_gt = rng.randn(b, h, w, 6).astype(np.float32)
        pred1 = vert_gt + 0.3
        pred2 = pred1.copy()
        pred2[0, mask == 0] += 100.0
        seg = np.zeros((b, h, w, 2), np.float32)
        _, s1 = pvnet_loss(jnp.asarray(seg), jnp.asarray(pred1), jnp.asarray(mask[None]), jnp.asarray(vert_gt))
        _, s2 = pvnet_loss(jnp.asarray(seg), jnp.asarray(pred2), jnp.asarray(mask[None]), jnp.asarray(vert_gt))
        np.testing.assert_allclose(float(s1["vote_loss"]), float(s2["vote_loss"]), rtol=1e-5)


class TestSchedule:
    def test_multistep_decay(self):
        cfg = Config().train
        cfg = cfg.__class__(**{**cfg.__dict__, "milestones": (2, 4), "gamma": 0.5,
                               "lr": 1e-3, "warmup": False})
        sched = multistep_schedule(cfg, steps_per_epoch=10)
        assert float(sched(0)) == pytest.approx(1e-3)
        assert float(sched(25)) == pytest.approx(5e-4)
        assert float(sched(45)) == pytest.approx(2.5e-4)

    def test_warmup(self):
        cfg = Config().train
        cfg = cfg.__class__(**{**cfg.__dict__, "warmup": True, "warmup_epochs": 2,
                               "milestones": (100,), "lr": 3e-4})
        sched = multistep_schedule(cfg, steps_per_epoch=10)
        assert float(sched(0)) == pytest.approx(1e-4, rel=1e-3)
        assert float(sched(20)) == pytest.approx(3e-4, rel=1e-3)


class TestTrainStep:
    def test_overfit_one_batch(self, rng):
        """End-to-end slice: data → model → loss → optimizer must overfit."""
        cfg = Config().with_overrides({"task": "pvnet", "train.lr": 3e-3})
        model = tiny_model()
        mesh = make_mesh(num_devices=1)
        trainer = Trainer(cfg, model, steps_per_epoch=10, mesh=mesh)
        state = trainer.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3))
        batch = tiny_batch(rng)
        losses = []
        for i in range(120):
            state, stats = trainer._train_step(state, batch)
            losses.append(float(stats["loss"]))
        assert losses[-1] < losses[0] * 0.25, losses[::20]
        assert losses[-1] < 0.35, losses[-1]

    def test_sharded_step_matches_single_device(self, rng):
        """The 8-device data-parallel step must match 1-device numerics."""
        cfg = Config()
        model = tiny_model()
        batch = tiny_batch(rng, b=8)

        mesh1 = make_mesh(num_devices=1)
        t1 = Trainer(cfg, model, steps_per_epoch=10, mesh=mesh1)
        s1 = t1.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3))
        s1, st1 = t1._train_step(s1, shard_batch(batch, mesh1))

        mesh8 = make_mesh(num_devices=8)
        t8 = Trainer(cfg, model, steps_per_epoch=10, mesh=mesh8)
        s8 = t8.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3))
        s8, st8 = t8._train_step(s8, shard_batch(batch, mesh8))

        np.testing.assert_allclose(
            float(st1["loss"]), float(st8["loss"]), rtol=1e-5
        )
        l1 = jax.tree_util.tree_leaves(s1.params)
        l8 = jax.tree_util.tree_leaves(s8.params)
        # grad psum reduction order differs across layouts; Adam's rsqrt
        # amplifies tiny diffs, so compare with a loose absolute tolerance
        for a, b in zip(l1, l8):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-2)


class TestCheckpoint:
    def test_save_restore_round_trip(self, rng, tmp_path):
        cfg = Config()
        model = tiny_model()
        tx = make_optimizer(cfg.train, 10)
        state = create_train_state(model, tx, jax.random.PRNGKey(0), (1, 32, 32, 3))
        batch = tiny_batch(rng, b=2)
        from clean_pvnet_tpu.train.trainer import pvnet_step_fns

        train_step, _ = pvnet_step_fns(cfg)
        train_step = jax.jit(train_step)
        for _ in range(3):
            state, _ = train_step(state, batch)

        io = CheckpointIO(str(tmp_path / "ckpt"))
        io.save(state, epoch=3, wait=True)

        fresh = create_train_state(model, tx, jax.random.PRNGKey(1), (1, 32, 32, 3))
        restored, epoch = io.restore(fresh)
        assert epoch == 3
        assert int(restored.step) == 3
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(restored.params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        io.close()

    def test_cold_start(self, tmp_path):
        cfg = Config()
        model = tiny_model()
        tx = make_optimizer(cfg.train, 10)
        state = create_train_state(model, tx, jax.random.PRNGKey(0), (1, 32, 32, 3))
        io = CheckpointIO(str(tmp_path / "empty"))
        _, epoch = io.restore(state)
        assert epoch == -1
        io.close()


class TestDeviceAugmentStep:
    def test_train_step_on_raw_batch(self, rng):
        """device_augment path: raw uint8 frames + mask + kpts go in, the
        jitted step augments on-device and trains (data/augment_device.py)."""
        import jax
        import jax.numpy as jnp
        from clean_pvnet_tpu.config import Config
        from clean_pvnet_tpu.models import make_network
        from clean_pvnet_tpu.parallel import make_mesh, shard_batch
        from clean_pvnet_tpu.train import Trainer

        cfg = Config().with_overrides(
            {"network.use_bfloat16": False, "train.device_augment": True}
        )
        model = make_network(cfg)
        mesh = make_mesh(num_devices=1)
        trainer = Trainer(cfg, model, steps_per_epoch=1, mesh=mesh)
        state = trainer.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3))

        b = 2
        masks = np.zeros((b, 32, 32), np.uint8)
        masks[:, 8:24, 10:26] = 1
        batch = {
            "inp_u8": (rng.rand(b, 32, 32, 3) * 255).astype(np.uint8),
            "mask": masks,
            "kpt_2d": (rng.rand(b, 9, 2) * 12 + 10).astype(np.float32),
        }
        batch = shard_batch(batch, mesh)
        step0 = int(state.step)
        state, stats = trainer._train_step(state, batch)
        assert int(state.step) == step0 + 1
        assert np.isfinite(float(stats["loss"]))
        # a second step re-draws the augmentation (keyed on state.step)
        state, stats2 = trainer._train_step(state, batch)
        assert np.isfinite(float(stats2["loss"]))

    def test_scan_step_matches_sequential(self, rng):
        """Trainer.make_scan_step (multi-step fused dispatch for device-
        resident datasets) is semantically identical to the per-step loop:
        the augmentation RNG folds in state.step, which advances inside
        the lax.scan exactly as between dispatches (the augmented batches
        are bit-identical). SGD here rather than Adam: the two compiled
        programs reassociate conv reductions differently (ULP-level), and
        Adam's sign-normalized update amplifies that noise on near-zero
        gradients to O(lr); SGD keeps the trajectories tight so the
        equivalence is actually assertable."""
        import jax
        import jax.numpy as jnp
        from clean_pvnet_tpu.config import Config
        from clean_pvnet_tpu.models import make_network
        from clean_pvnet_tpu.parallel import make_mesh
        from clean_pvnet_tpu.train import Trainer

        cfg = Config().with_overrides(
            {"network.use_bfloat16": False, "train.device_augment": True,
             "train.optimizer": "sgd"}
        )
        model = make_network(cfg)
        mesh = make_mesh(num_devices=1)
        trainer = Trainer(cfg, model, steps_per_epoch=4, mesh=mesh)

        n, b = 6, 2
        masks = np.zeros((n, 32, 32), np.uint8)
        masks[:, 8:24, 10:26] = 1
        frames = jnp.asarray((rng.rand(n, 32, 32, 3) * 255).astype(np.uint8))
        masks = jnp.asarray(masks)
        kpts = jnp.asarray((rng.rand(n, 9, 2) * 12 + 10).astype(np.float32))
        idx = np.asarray([[0, 3], [1, 4], [2, 5], [5, 0]], np.int32)

        def gather(data, i):
            return {
                "inp_u8": jnp.take(data[0], i, axis=0),
                "mask": jnp.take(data[1], i, axis=0).astype(jnp.int32),
                "kpt_2d": jnp.take(data[2], i, axis=0),
            }

        state_a = trainer.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3))
        for s in range(idx.shape[0]):
            state_a, stats_a = trainer._train_step(
                state_a, gather((frames, masks, kpts), jnp.asarray(idx[s])))

        state_b = trainer.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3))
        chunk = trainer.make_scan_step(gather)
        state_b, stats_b = chunk(state_b, (frames, masks, kpts),
                                 jnp.asarray(idx))

        assert int(state_b.step) == int(state_a.step)
        np.testing.assert_allclose(
            float(stats_b["loss"]), float(stats_a["loss"]), rtol=1e-5)
        la = jax.tree_util.tree_leaves(state_a.params)
        lb = jax.tree_util.tree_leaves(state_b.params)
        for xa, xb in zip(la, lb):
            np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                       rtol=1e-5, atol=1e-6)
