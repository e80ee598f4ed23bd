"""Multi-device data parallelism on the 8-device virtual CPU mesh.

The reference has no distributed execution (SURVEY.md §2.3); these tests pin
the TPU-native contract: sharding point banks across a mesh changes nothing —
losses and gradients match the single-device values — and the full jitted
train step executes under GSPMD.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pinn_elastodynamics_tpu.cases import plate_hole, wave_confined
from pinn_elastodynamics_tpu.parallel import mesh as pmesh
from pinn_elastodynamics_tpu.train.step import (
    make_grad_step,
    make_loss_fn,
    make_microbatched_loss_fn,
)

SCALE = 0.002


@pytest.fixture(scope="module")
def mesh8(cpu_devices=None):
    return pmesh.make_mesh(jax.devices())


def test_mesh_construction(mesh8):
    assert mesh8.devices.size == 8
    assert mesh8.axis_names == ("points",)


def test_indivisible_bank_rejected(mesh8):
    from pinn_elastodynamics_tpu.banks import make_bank

    b = make_bank(np.zeros((10, 3)))
    with pytest.raises(ValueError, match="not divisible"):
        pmesh.shard_bank(b, mesh8)


@pytest.mark.parametrize("mod", [plate_hole, wave_confined])
def test_sharded_loss_equals_single_device(mod, mesh8):
    case = mod.build(scale=SCALE, pad_to_multiple_of=8)
    params = case.init_params(seed=5, dtype=jnp.float64)
    loss_fn = make_loss_fn(case.model, case.loss, case.material)

    def scalar(p, b):
        t, _ = loss_fn(p, b)
        return t

    l_single = float(jax.jit(scalar)(params, case.banks))
    banks_sh = pmesh.shard_banks(case.banks, mesh8)
    params_r = pmesh.replicate(params, mesh8)
    l_shard = float(jax.jit(scalar)(params_r, banks_sh))
    assert l_single == pytest.approx(l_shard, rel=1e-12)


def test_sharded_grads_equal_single_device(mesh8):
    case = wave_confined.build(scale=SCALE, pad_to_multiple_of=8)
    params = case.init_params(seed=6, dtype=jnp.float64)
    loss_fn = make_loss_fn(case.model, case.loss, case.material)

    def scalar(p, b):
        t, _ = loss_fn(p, b)
        return t

    g_single = jax.jit(jax.grad(scalar))(params, case.banks)
    banks_sh = pmesh.shard_banks(case.banks, mesh8)
    params_r = pmesh.replicate(params, mesh8)
    g_shard = jax.jit(jax.grad(scalar))(params_r, banks_sh)
    flat_s, _ = jax.flatten_util.ravel_pytree(g_single)
    flat_m, _ = jax.flatten_util.ravel_pytree(g_shard)
    np.testing.assert_allclose(flat_s, flat_m, rtol=1e-10, atol=1e-12)


def test_sharded_train_step_runs(mesh8):
    case = plate_hole.build(scale=SCALE, pad_to_multiple_of=8)
    params = pmesh.replicate(case.init_params(seed=0), mesh8)
    banks = pmesh.shard_banks(case.banks, mesh8)
    opt = optax.adam(1e-3)
    opt_state = pmesh.replicate(opt.init(params), mesh8)
    step = make_grad_step(case.model, case.loss, case.material, opt)
    p1, s1, loss1, comps1 = step(params, opt_state, banks)
    p2, s2, loss2, comps2 = step(p1, s1, banks)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    assert set(comps1) == {"f_uv", "f_s", "HOLE"}


def test_sharded_value_and_grad_hlo_has_no_all_gather(mesh8):
    """Pin the r3 work-replication fix (models/mlp.py::_stacked_matmul).

    Loss/grad *equality* tests cannot distinguish sharded from replicated
    execution: GSPMD all-gathering the banks and redoing the full
    computation on every device yields identical numbers (the r3 n²
    weak-scaling bug rooted at a K-major reshape).  This asserts the
    compiled artifact itself: the optimized HLO of the sharded value+grad
    must contain zero all-gathers, and the per-device FLOP count must be a
    fraction of the single-device compile's (work actually partitioned).
    """
    case = wave_confined.build(scale=SCALE, pad_to_multiple_of=8)
    params = case.init_params(seed=7)
    loss_fn = make_loss_fn(case.model, case.loss, case.material)

    def scalar(p, b):
        t, _ = loss_fn(p, b)
        return t

    vg = jax.jit(jax.value_and_grad(scalar))
    single = vg.lower(params, case.banks).compile()
    banks_sh = pmesh.shard_banks(case.banks, mesh8)
    params_r = pmesh.replicate(params, mesh8)
    sharded = vg.lower(params_r, banks_sh).compile()

    hlo = sharded.as_text()
    n_all_gather = hlo.count("all-gather")
    assert n_all_gather == 0, (
        f"{n_all_gather} all-gather op(s) in the sharded value+grad HLO — "
        "the K-major reshape work-replication bug is back"
    )
    # Collectives should be reductions only (psum of masked sums / grads).
    assert "all-reduce" in hlo

    cost_s = single.cost_analysis()
    cost_m = sharded.cost_analysis()
    if cost_s and cost_m and cost_s.get("flops") and cost_m.get("flops"):
        # Per-device work must shrink roughly ∝ 1/n_devices; anything above
        # half the single-device FLOPs means replicated execution.
        assert cost_m["flops"] < 0.5 * cost_s["flops"], (
            f"sharded per-device flops {cost_m['flops']:.3g} vs single "
            f"{cost_s['flops']:.3g}: work not partitioned"
        )


def test_microbatched_loss_matches_full(mesh8):
    """Gradient-accumulation loss == full-batch loss (1M+ point path)."""
    case = wave_confined.build(scale=SCALE, pad_to_multiple_of=8)
    params = case.init_params(seed=8, dtype=jnp.float64)
    full = make_loss_fn(case.model, case.loss, case.material)
    micro = make_microbatched_loss_fn(
        case.model, case.loss, case.material, num_microbatches=4
    )
    lf, cf = jax.jit(full)(params, case.banks)
    lm, cm = jax.jit(micro)(params, case.banks)
    assert float(lf) == pytest.approx(float(lm), rel=1e-10)
    for k in cf:
        assert float(cf[k]) == pytest.approx(float(cm[k]), rel=1e-9), k

    # Gradients agree too.
    gf = jax.jit(jax.grad(lambda p, b: full(p, b)[0]))(params, case.banks)
    gm = jax.jit(jax.grad(lambda p, b: micro(p, b)[0]))(params, case.banks)
    ff, _ = jax.flatten_util.ravel_pytree(gf)
    fm, _ = jax.flatten_util.ravel_pytree(gm)
    np.testing.assert_allclose(ff, fm, rtol=1e-8, atol=1e-12)
