"""Custom-VJP fused jet: gradients vs autodiff (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinn_elastodynamics_tpu.kernels.fused_jet_vjp import fused_jet_vjp
from pinn_elastodynamics_tpu.models.mlp import init_mlp, mlp_jet


def _loss_pair(params, x, order, norm=None):
    kw = dict(lb=norm[0], ub=norm[1]) if norm else {}
    key = jax.random.PRNGKey(7)
    wf = jax.random.normal(key, (x.shape[0], 5), jnp.float32)
    wd = jax.random.normal(key, (x.shape[1], x.shape[0], 5), jnp.float32)
    wtt = jax.random.normal(key, (x.shape[0], 5), jnp.float32)

    def weighted(jet):
        l = jnp.sum(wf * jet.f) + jnp.sum(wd * jet.d)
        if order >= 2:
            l = l + jnp.sum(wtt * jet.dtt)
        return l

    def l_ref(p, xx):
        return weighted(mlp_jet(p, xx, order=order, **kw))

    def l_ker(p, xx):
        return weighted(fused_jet_vjp(
            p, xx, order, 128, True,
            norm[0] if norm else None, norm[1] if norm else None,
        ))

    return l_ref, l_ker


@pytest.mark.parametrize("order", [1, 2])
def test_vjp_matches_autodiff(order):
    params = init_mlp(jax.random.PRNGKey(0), [3, 40, 40, 5], jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (300, 3), jnp.float32)
    l_ref, l_ker = _loss_pair(params, x, order)
    vr, (gr, gxr) = jax.value_and_grad(l_ref, argnums=(0, 1))(params, x)
    vk, (gk, gxk) = jax.value_and_grad(l_ker, argnums=(0, 1))(params, x)
    assert float(abs(vr - vk)) < 1e-3 * max(1.0, abs(float(vr)))
    scale = max(float(jnp.abs(g["W"]).max()) for g in gr)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(a["W"], b["W"], atol=2e-4 * max(1, scale))
        np.testing.assert_allclose(a["b"], b["b"], atol=2e-4 * max(1, scale))
    np.testing.assert_allclose(gxk, gxr, atol=2e-4 * max(1, scale))


def test_vjp_normalization_path():
    params = init_mlp(jax.random.PRNGKey(2), [3, 30, 30, 5], jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(3), (150, 3), jnp.float32) * 10
    norm = ((0.0, 0.0, 0.0), (10.0, 10.0, 10.0))
    l_ref, l_ker = _loss_pair(params, x, 2, norm)
    _, gr = jax.value_and_grad(l_ref)(params, x)
    _, gk = jax.value_and_grad(l_ker)(params, x)
    scale = max(float(jnp.abs(g["W"]).max()) for g in gr)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(a["W"], b["W"], atol=2e-4 * max(1, scale))


def test_vjp_forward_value_matches():
    params = init_mlp(jax.random.PRNGKey(4), [3, 20, 7], jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(5), (90, 3), jnp.float32)
    a = fused_jet_vjp(params, x, 1, 128, True)
    b = mlp_jet(params, x, order=1)
    np.testing.assert_allclose(a.f, b.f, atol=2e-6)
    np.testing.assert_allclose(a.d, b.d, atol=2e-6)


@pytest.mark.parametrize("order", [1, 2])
def test_composite_vjp_matches_autodiff(order):
    """One-launch composite custom-VJP == autodiff through the XLA jets
    (grads to all three nets' params and to x)."""
    from pinn_elastodynamics_tpu.kernels.fused_jet_vjp import (
        fused_composite_jet_vjp,
    )
    from pinn_elastodynamics_tpu.models.fields import (
        FIRST_ORDER,
        SECOND_ORDER,
        CompositeFieldModel,
        FieldSpec,
    )

    form = SECOND_ORDER if order >= 2 else FIRST_ORDER
    model = CompositeFieldModel(
        spec=FieldSpec(ndim=2, formulation=form),
        uv_hidden=(40,) * 2,
        dist_hidden=(16,) * 2,
        part_hidden=(16,) * 2,
        normalize=True,
        lb=(0.0, 0.0, 0.0),
        ub=(2.0, 2.0, 3.0),
    )
    params = model.init(jax.random.PRNGKey(12))
    n, c = 200, model.spec.n_outputs
    x = jax.random.uniform(jax.random.PRNGKey(13), (n, 3), jnp.float32) * 2

    key = jax.random.PRNGKey(14)
    wf = jax.random.normal(key, (n, c), jnp.float32)
    wd = jax.random.normal(key, (3, n, c), jnp.float32)
    wtt = jax.random.normal(key, (n, c), jnp.float32)

    def weighted(jet):
        l = jnp.sum(wf * jet.f) + jnp.sum(wd * jet.d)
        if order >= 2:
            l = l + jnp.sum(wtt * jet.dtt)
        return l

    def l_ref(p, xx):
        return weighted(model.jet(p, xx, order=order))

    def l_ker(p, xx):
        # Production contract: composite sub-nets always see raw
        # coordinates (normalize only affects the Fourier uv net), so the
        # kernel is called without lb/ub even though the model sets
        # normalize=True above — this also pins the no-op semantics.
        return weighted(fused_composite_jet_vjp(
            p, xx, order, 64, True, None, None))

    vr, (gr, gxr) = jax.value_and_grad(l_ref, argnums=(0, 1))(params, x)
    vk, (gk, gxk) = jax.value_and_grad(l_ker, argnums=(0, 1))(params, x)
    assert float(abs(vr - vk)) < 1e-3 * max(1.0, abs(float(vr)))
    scale = max(
        float(jnp.abs(l["W"]).max()) for net in gr.values() for l in net)
    for k in ("uv", "dist", "part"):
        for a, b in zip(gk[k], gr[k]):
            np.testing.assert_allclose(
                a["W"], b["W"], atol=3e-4 * max(1, scale), err_msg=k)
            np.testing.assert_allclose(
                a["b"], b["b"], atol=3e-4 * max(1, scale), err_msg=k)
    np.testing.assert_allclose(gxk, gxr, atol=3e-4 * max(1, scale))


def test_composite_kernel_lb_ub_matches_normalized_reference():
    """The kernel's own lb/ub (input normalization) path still works: it
    must equal the XLA jet of per-net normalized MLPs."""
    from pinn_elastodynamics_tpu.kernels.fused_jet_vjp import (
        fused_composite_jet_vjp,
    )
    from pinn_elastodynamics_tpu.models.fields import (
        FIRST_ORDER,
        FieldSpec,
        MLPFieldModel,
    )

    spec = FieldSpec(ndim=2, formulation=FIRST_ORDER)
    lb, ub = (0.0, 0.0, 0.0), (2.0, 2.0, 3.0)
    nets = {
        "uv": MLPFieldModel(spec=spec, hidden=(40,) * 2, normalize=True,
                            lb=lb, ub=ub),
        "dist": MLPFieldModel(spec=spec, hidden=(16,) * 2, normalize=True,
                              lb=lb, ub=ub),
        "part": MLPFieldModel(spec=spec, hidden=(16,) * 2, normalize=True,
                              lb=lb, ub=ub),
    }
    key = jax.random.PRNGKey(21)
    params = {k: m.init(k2) for (k, m), k2 in
              zip(nets.items(), jax.random.split(key, 3))}
    x = jax.random.uniform(jax.random.PRNGKey(22), (120, 3), jnp.float32) * 2

    ref = (nets["part"].jet(params["part"], x, order=1)
           + nets["dist"].jet(params["dist"], x, order=1)
           * nets["uv"].jet(params["uv"], x, order=1))
    ker = fused_composite_jet_vjp(params, x, 1, 64, True, lb, ub)
    np.testing.assert_allclose(np.asarray(ker.f), np.asarray(ref.f),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ker.d), np.asarray(ref.d),
                               atol=1e-5)


@pytest.mark.parametrize("order", [1, 2])
def test_seed_vjp_fourier_matches_xla(order):
    """Fourier net: Pallas seed-jet path == XLA path, value AND grads
    (incl. through the embedding to B)."""
    from pinn_elastodynamics_tpu.models.fields import SECOND_ORDER, FieldSpec
    from pinn_elastodynamics_tpu.models.fourier import FourierMLPFieldModel

    spec = FieldSpec(ndim=2, formulation=SECOND_ORDER)
    kw = dict(
        spec=spec, hidden=(40, 40), n_features=16, feature_scale=1.3,
        normalize=True, lb=(0.0, 0.0, 0.0), ub=(2.0, 2.0, 3.0),
    )
    m_xla = FourierMLPFieldModel(**kw, jet_impl="xla")
    m_pal = FourierMLPFieldModel(**kw, jet_impl="pallas")
    params = m_xla.init(jax.random.PRNGKey(3))
    x = jax.random.uniform(jax.random.PRNGKey(4), (200, 3), jnp.float32) * 2

    key = jax.random.PRNGKey(11)
    c = spec.n_outputs
    wf = jax.random.normal(key, (200, c), jnp.float32)
    wd = jax.random.normal(key, (3, 200, c), jnp.float32)
    wtt = jax.random.normal(key, (200, c), jnp.float32)

    def weighted(jet):
        l = jnp.sum(wf * jet.f) + jnp.sum(wd * jet.d)
        if order >= 2:
            l = l + jnp.sum(wtt * jet.dtt)
        return l

    jr = m_xla.jet(params, x, order=order)
    jk = m_pal.jet(params, x, order=order)
    np.testing.assert_allclose(jk.f, jr.f, atol=3e-6)
    np.testing.assert_allclose(jk.d, jr.d, atol=3e-5)
    if order >= 2:
        np.testing.assert_allclose(jk.dtt, jr.dtt, atol=2e-4)

    vr, gr = jax.value_and_grad(
        lambda p: weighted(m_xla.jet(p, x, order=order)))(params)
    vk, gk = jax.value_and_grad(
        lambda p: weighted(m_pal.jet(p, x, order=order)))(params)
    assert float(abs(vr - vk)) < 1e-3 * max(1.0, abs(float(vr)))
    scale = max(float(jnp.abs(l["W"]).max()) for l in gr["mlp"])
    scale = max(scale, float(jnp.abs(gr["B"]).max()))
    np.testing.assert_allclose(gk["B"], gr["B"], atol=3e-4 * max(1, scale))
    for a, b in zip(gk["mlp"], gr["mlp"]):
        np.testing.assert_allclose(a["W"], b["W"], atol=3e-4 * max(1, scale))
        np.testing.assert_allclose(a["b"], b["b"], atol=3e-4 * max(1, scale))
