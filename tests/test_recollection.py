"""Teacher-recollection (off-policy IL) trainer tests."""

import numpy as np

from tests.test_nav import nav_world  # fixture reuse  # noqa: F401
from vln_bevbert_tpu.nav.recollection import TeacherRecollectionStore


def test_collect_train_save_load(nav_world, tmp_path):  # noqa: F811
    env, agent = nav_world
    store = TeacherRecollectionStore(agent, capacity=8)
    n = store.collect(2)
    assert n == 2 and len(store.bundles) == 2
    for b in store.bundles:
        assert b["targets"].shape[0] == agent.cfg.max_action_len
        assert (b["targets"] != -100).any()

    losses = store.train_epochs(2)
    assert len(losses) == 4
    assert all(np.isfinite(l) for l in losses)

    store.save(str(tmp_path / "lmdb_equiv"))
    store2 = TeacherRecollectionStore(agent, capacity=8)
    assert store2.load(str(tmp_path / "lmdb_equiv")) == 2
    np.testing.assert_array_equal(
        store.bundles[0]["targets"], store2.bundles[0]["targets"]
    )
    # training from reloaded bundles works too
    assert np.isfinite(store2.train_epochs(1)[0])


def test_spill_load_preserves_archive(nav_world, tmp_path):  # noqa: F811
    """load() into a spilled store must COPY shards in, never register the
    archive's own files (eviction would silently delete the saved dataset)."""
    import os

    env, agent = nav_world
    store = TeacherRecollectionStore(agent, capacity=8)
    store.collect(3)
    arch = str(tmp_path / "arch")
    store.save(arch)
    n_arch = len([f for f in os.listdir(arch) if f.endswith(".npz")])
    assert n_arch == 3

    spilled = TeacherRecollectionStore(
        agent, capacity=2, spill_dir=str(tmp_path / "spill")
    )
    assert spilled.load(arch) == 2  # evicted down to capacity
    # the archive is untouched
    assert len([f for f in os.listdir(arch) if f.endswith(".npz")]) == n_arch
    # and further appends don't collide with the imported ids
    assert spilled.collect(1) == 1
    assert len(spilled) == 2
