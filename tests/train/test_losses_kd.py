"""Loss and KD criterion tests (oracle: reference tests + hand math)."""

import jax
import jax.numpy as jnp
import numpy as np

from quant_tpu.train.kd import kd_criterion
from quant_tpu.train.losses import cross_entropy, get_loss_fn, nll_loss


def test_cross_entropy_matches_manual():
    logits = jnp.array([[2.0, 1.0, 0.0], [0.0, 0.0, 3.0]])
    target = jnp.array([0, 2])
    logp = jax.nn.log_softmax(logits)
    expected = -(logp[0, 0] + logp[1, 2]) / 2
    np.testing.assert_allclose(float(cross_entropy(logits, target)),
                               float(expected), rtol=1e-6)


def test_nll_loss_on_log_probs():
    logp = jnp.log(jnp.array([[0.7, 0.2, 0.1], [0.1, 0.8, 0.1]]))
    target = jnp.array([0, 1])
    expected = -(np.log(0.7) + np.log(0.8)) / 2
    np.testing.assert_allclose(float(nll_loss(logp, target)), expected,
                               rtol=1e-6)


def test_get_loss_fn_unknown_raises():
    import pytest
    with pytest.raises(ValueError):
        get_loss_fn('bogus')


def test_kd_matches_manual_kl():
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.standard_normal((4, 5)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((4, 5)), jnp.float32)
    target = jnp.asarray(rng.integers(0, 5, 4))
    temp = 5.0
    loss = kd_criterion(s, t, target, temperature=temp)
    ps = jax.nn.log_softmax(s / temp, axis=1)
    pt = jax.nn.softmax(t / temp, axis=1)
    manual = jnp.mean(jnp.sum(pt * (jnp.log(pt) - ps), axis=1)) * temp ** 2
    np.testing.assert_allclose(float(loss), float(manual), rtol=1e-5)


def test_kd_reference_bug_reproduced_by_default():
    """teacher_correction=True is a no-op in the reference
    (kd_criterion.py:46); default behavior must match."""
    rng = np.random.default_rng(1)
    s = jnp.asarray(rng.standard_normal((8, 3)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((8, 3)), jnp.float32)
    target = jnp.asarray(rng.integers(0, 3, 8))
    with_corr = kd_criterion(s, t, target, 2.0, teacher_correction=True)
    without = kd_criterion(s, t, target, 2.0, teacher_correction=False)
    np.testing.assert_allclose(float(with_corr), float(without), rtol=1e-6)


def test_kd_fixed_correction_uses_ce_for_wrong_teacher():
    # Teacher always predicts class 0; targets are class 1 -> with the fix
    # every example uses CE, so loss == CE.
    s = jnp.asarray(np.random.default_rng(2).standard_normal((4, 3)),
                    jnp.float32)
    t = jnp.tile(jnp.array([[5.0, 0.0, 0.0]]), (4, 1))
    target = jnp.ones((4,), jnp.int32)
    fixed = kd_criterion(s, t, target, 2.0, teacher_correction=True,
                         fixed_teacher_correction=True)
    from quant_tpu.train.losses import cross_entropy
    np.testing.assert_allclose(float(fixed),
                               float(cross_entropy(s, target)), rtol=1e-5)


def test_kd_gradient_flows_to_student_only():
    s = jnp.ones((2, 3))
    t = jnp.ones((2, 3))
    target = jnp.zeros((2,), jnp.int32)

    g_s = jax.grad(lambda a: kd_criterion(a, t, target, 1.0))(s)
    g_t = jax.grad(lambda b: kd_criterion(s, b, target, 1.0,
                                          freeze_teacher=True))(t)
    assert float(jnp.sum(jnp.abs(g_t))) == 0.0
    assert g_s.shape == s.shape


def test_per_sample_forms_mean_to_the_reduced_loss():
    """Every built-in loss carries a .per_sample form whose mean equals
    the reduced loss — the contract the masked eval path relies on."""
    import numpy as np

    from quant_tpu.train.losses import cross_entropy, kl_div, nll_loss

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((6, 5)), jnp.float32)
    logp = jax.nn.log_softmax(logits)
    target = jnp.asarray(rng.integers(0, 5, 6))
    probs = jax.nn.softmax(jnp.asarray(
        rng.standard_normal((6, 5)), jnp.float32))

    for fn, out, tgt in ((cross_entropy, logits, target),
                         (nll_loss, logp, target),
                         (kl_div, logp, probs)):
        ps = fn.per_sample(out, tgt)
        assert ps.shape == (6,)
        np.testing.assert_allclose(float(jnp.mean(ps)),
                                   float(fn(out, tgt)), rtol=1e-6)


def test_masked_eval_step_ignores_sentinel_rows():
    """make_eval_step with a built-in loss excludes target=-1 rows from
    every accumulator (loss, top-1, top-k, count)."""
    import numpy as np
    import optax

    from quant_tpu.train.engine import make_eval_step
    from quant_tpu.train.losses import get_loss_fn
    from quant_tpu.train.metrics import init_metric_state
    from quant_tpu.train.state import TrainState

    def apply_fn(variables, data, train):
        return data

    state = TrainState.create(apply_fn, {'params': {}}, optax.identity())
    step = make_eval_step(get_loss_fn('cross_entropy'))
    logits = jnp.asarray(np.eye(4, 3, dtype=np.float32) * 3)
    target = jnp.asarray([0, 1, -1, -1])  # 2 real rows, 2 padded
    ms, _ = step(state, logits, target, init_metric_state())
    assert float(ms['count']) == 2.0
    assert float(ms['top1']) == 2.0
    # Loss sum covers only the 2 real rows.
    expected = -2 * float(jax.nn.log_softmax(logits[0])[0])
    np.testing.assert_allclose(float(ms['loss_sum']), expected, rtol=1e-5)
