"""DeviceBagStore parity: training/eval through the HBM-resident store must
match the list-of-bags path bag-for-bag."""

import numpy as np
import jax

from tpumil.data.device_store import DeviceBagStore
from tpumil.models.dsmil import DSMILConfig
from tpumil.train.trainer import BagTrainer

from synth import make_separable_bags


def test_store_predict_matches_list(rng):
    bags = make_separable_bags(rng, num_bags=13, feats=16)
    trainer = BagTrainer(DSMILConfig(feats_size=16, num_classes=1))
    params, _ = trainer.init(jax.random.PRNGKey(0))
    store = DeviceBagStore(bags)
    s_list, l_list = trainer.predict(params, bags)
    s_store, l_store = trainer.predict(params, store)
    np.testing.assert_allclose(s_store, s_list, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(l_store, l_list, rtol=1e-4, atol=1e-5)


def test_store_training_converges(rng):
    bags = make_separable_bags(rng, num_bags=16, feats=16, signal=5.0,
                               pos_inst_frac=0.4)
    trainer = BagTrainer(DSMILConfig(feats_size=16, num_classes=1))
    params, opt_state = trainer.init(jax.random.PRNGKey(0))
    store = DeviceBagStore(bags)
    losses = []
    for _ in range(6):
        params, opt_state, loss = trainer.train_epoch(params, opt_state, store, 1e-3, rng)
        losses.append(loss)
    assert losses[-1] < losses[0]


def test_store_bookkeeping(rng):
    bags = make_separable_bags(rng, num_bags=9, feats=8, mean_instances=30)
    store = DeviceBagStore(bags)
    assert store.num_bags == 9
    assert sorted(np.concatenate(list(store.index.values()))) == list(range(9))
    np.testing.assert_array_equal(
        store.labels[:, 0], [float(b.label[0]) for b in bags])
    assert store.nbytes() > 0
