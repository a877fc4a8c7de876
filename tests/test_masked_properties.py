"""Property tests for the masked reductions — the invariants every padded
computation in the framework relies on."""

import numpy as np
import pytest
import jax.numpy as jnp

from tpumil.ops.masked import masked_argmax, masked_max, masked_softmax


@pytest.mark.parametrize("seed", range(5))
def test_masked_ops_invariants(seed):
    rng = np.random.default_rng(seed)
    n, c = int(rng.integers(4, 64)), int(rng.integers(1, 5))
    x = rng.standard_normal((n, c)).astype(np.float32) * rng.uniform(0.1, 100)
    n_valid = int(rng.integers(1, n + 1))
    mask = np.zeros(n, bool)
    mask[rng.choice(n, n_valid, replace=False)] = True

    xm = jnp.asarray(x)
    mk = jnp.asarray(mask)

    # masked softmax: sums to 1 over valid rows, exactly 0 on padding
    sm = np.asarray(masked_softmax(xm, mk, axis=0))
    np.testing.assert_allclose(sm.sum(axis=0), np.ones(c), atol=1e-5)
    assert np.all(sm[~mask] == 0.0)
    assert np.all(sm >= 0.0)

    # masked max/argmax agree with numpy over the valid subset
    want_max = x[mask].max(axis=0)
    np.testing.assert_allclose(np.asarray(masked_max(xm, mk, axis=0)),
                               want_max, atol=1e-6)
    am = np.asarray(masked_argmax(xm, mk, axis=0))
    for j in range(c):
        assert mask[am[j]]
        assert x[am[j], j] == pytest.approx(want_max[j])

    # invariance: scrambling padded rows changes nothing
    x2 = x.copy()
    x2[~mask] = rng.standard_normal(((~mask).sum(), c)) * 1e6
    np.testing.assert_allclose(
        np.asarray(masked_softmax(jnp.asarray(x2), mk, axis=0))[mask],
        sm[mask], atol=1e-5)


def test_masked_softmax_extreme_values():
    # huge logits must not overflow; uniform logits give uniform weights
    x = jnp.asarray([[1e4], [1e4], [-1e4], [0.0]])
    mask = jnp.asarray([True, True, True, False])
    sm = np.asarray(masked_softmax(x, mask, axis=0))
    assert np.all(np.isfinite(sm))
    np.testing.assert_allclose(sm[:2, 0], [0.5, 0.5], atol=1e-6)
    assert sm[3, 0] == 0.0
