"""Checkpoint round-trip: save mid-train, restore, continue, compare to an
uninterrupted run (SURVEY.md §4)."""

import jax
import jax.random as jr
import numpy as np

from stego_tpu.train.checkpoint import CheckpointManager, load_config
from stego_tpu.train.segmenter import make_train_step

from tests.test_train_step import synthetic_batch, tiny_setup


def test_checkpoint_roundtrip_resume(tmp_path):
    cfg, seg, backbone, state = tiny_setup()
    step_fn = jax.jit(make_train_step(seg))
    batch = synthetic_batch(jr.PRNGKey(2))

    # uninterrupted: 6 steps
    s_ref = state
    for i in range(6):
        s_ref, _ = step_fn(backbone, s_ref, batch, jr.PRNGKey(50 + i))

    # interrupted: 3 steps, save, restore, 3 more
    s = state
    for i in range(3):
        s, _ = step_fn(backbone, s, batch, jr.PRNGKey(50 + i))
    mgr = CheckpointManager(str(tmp_path / "ckpt"), cfg, save_top_k=2)
    mgr.save_backbone(backbone)
    mgr.save(3, s, metrics={"test/cluster/mIoU": 1.0})

    restored_step, s2 = mgr.restore(template=s)
    assert restored_step == 3
    for i in range(3, 6):
        s2, _ = step_fn(backbone, s2, batch, jr.PRNGKey(50 + i))

    ref_leaves = jax.tree.leaves(s_ref["params"])
    got_leaves = jax.tree.leaves(s2["params"])
    for a, b in zip(ref_leaves, got_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-7)

    b2 = mgr.restore_backbone(template=backbone)
    np.testing.assert_array_equal(
        np.asarray(backbone["cls_token"]), np.asarray(b2["cls_token"])
    )
    cfg2 = load_config(str(tmp_path / "ckpt"))
    assert cfg2.dim == cfg.dim
    mgr.close()


def test_topk_retention(tmp_path):
    cfg, seg, backbone, state = tiny_setup()
    mgr = CheckpointManager(str(tmp_path / "ckpt"), cfg, save_top_k=2)
    for step, miou in [(1, 10.0), (2, 30.0), (3, 20.0), (4, 5.0)]:
        mgr.save(step, state, metrics={"test/cluster/mIoU": miou})
    kept = sorted(mgr.all_steps())
    assert mgr.best_step() == 2
    assert len(kept) == 2
    assert 2 in kept  # the best is retained
    mgr.close()


def test_orbax_race_recovery(tmp_path):
    """The known orbax 0.11 async race (FileNotFoundError / TimeoutError on
    the metrics item commit — CLAUDE.md "known flake") must be recovered by
    replaying the last enqueued save, not crash the run."""
    cfg, seg, backbone, state = tiny_setup()
    mgr = CheckpointManager(str(tmp_path / "ckpt"), cfg, save_top_k=2)
    mgr.save(1, state, metrics={"test/cluster/mIoU": 10.0})

    # inject the race at the next save: first _mgr.save call raises as if a
    # previous async commit died, subsequent calls go through
    real_save = mgr._mgr.save
    calls = {"n": 0}

    def flaky_save(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise FileNotFoundError(
                "metrics.orbax-checkpoint-tmp/metrics (injected)")
        return real_save(*a, **k)

    mgr._mgr.save = flaky_save
    mgr.save(2, state, metrics={"test/cluster/mIoU": 20.0})
    mgr._mgr.save = real_save
    # step 1 replayed (force) + step 2 enqueued
    assert calls["n"] == 3
    mgr.wait_until_finished()
    assert sorted(mgr.all_steps()) == [1, 2]
    assert mgr.best_step() == 2

    # a race surfacing at wait_until_finished is also recovered
    real_wait = mgr._mgr.wait_until_finished
    waits = {"n": 0}

    def flaky_wait(*a, **k):
        waits["n"] += 1
        if waits["n"] == 1:
            raise TimeoutError("awaitable_signals_contract (injected)")
        return real_wait(*a, **k)

    mgr.save(3, state, metrics={"test/cluster/mIoU": 30.0})
    mgr._mgr.wait_until_finished = flaky_wait
    mgr.wait_until_finished()  # replays step 3 synchronously
    mgr._mgr.wait_until_finished = real_wait
    assert 3 in mgr.all_steps()
    assert mgr.best_step() == 3
    mgr.close()
