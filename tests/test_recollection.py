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
