"""Optimizer-state checkpoint/resume: a killed run continues where it
stopped, keeping Adam moments and L-BFGS curvature/line-search state.

The reference cannot do this: its pickles hold [weights, biases] only
(/root/reference/PlateHoleQuarter/train/train.py:276-306), scipy's L-BFGS
history lives in Fortran workspace and restarts cold on every call, and
Adam moments die with the session.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pinn_elastodynamics_tpu.train import checkpoint as ckpt
from pinn_elastodynamics_tpu.train.adam import run_adam
from pinn_elastodynamics_tpu.train.lbfgs import minimize


def rosen(p):
    x = p["x"]
    return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2)


def test_lbfgs_resume_matches_uninterrupted(tmp_path):
    """50 iters + checkpoint + 50 resumed == 100 uninterrupted."""
    p0 = {"x": jnp.zeros(10, jnp.float64)}
    full = minimize(rosen, p0, maxiter=100, segment=25)

    part1 = minimize(rosen, p0, maxiter=50, segment=25)
    path = str(tmp_path / "mid.ckpt")
    ckpt.save_checkpoint(path, {"lbfgs_carry": part1.carry})
    restored = tuple(ckpt.load_checkpoint(path, jnp.float64)["lbfgs_carry"])
    part2 = minimize(rosen, p0, maxiter=50, segment=25, init_carry=restored)

    # Both runs drive rosen to its optimum; the resumed run may stop early
    # on the patience rule once converged.
    np.testing.assert_allclose(
        np.asarray(part2.params["x"]), np.asarray(full.params["x"]),
        rtol=1e-12, atol=1e-12,
    )
    np.testing.assert_allclose(
        float(part2.final_loss), float(full.final_loss), rtol=1e-12
    )


def test_lbfgs_resume_keeps_curvature_history(tmp_path):
    """A resumed run must descend immediately (warm Hessian approx), unlike a
    cold restart which relearns curvature."""
    p0 = {"x": jnp.zeros(20, jnp.float64)}
    part1 = minimize(rosen, p0, maxiter=60, segment=20)
    resumed = minimize(
        rosen, p0, maxiter=20, segment=20, init_carry=part1.carry
    )
    cold = minimize(rosen, part1.params, maxiter=20, segment=20)
    # Both descend, but warm-resume must not be worse than cold restart.
    assert float(resumed.final_loss) <= float(part1.final_loss)
    assert float(resumed.final_loss) <= float(cold.final_loss) * 1.001


def test_adam_resume_bit_compatible(tmp_path):
    """Adam continuation through a pickle roundtrip is bit-identical."""
    def loss_aux(p):
        return rosen(p), {}

    p0 = {"x": jnp.linspace(-1.0, 1.0, 8, dtype=jnp.float64)}
    full = run_adam(loss_aux, p0, 0.05, iters=60, segment=20)

    saves = []
    r1 = run_adam(
        loss_aux, p0, 0.05, iters=40, segment=20,
        on_segment=lambda done, p, s, h: saves.append((done, p, s)),
    )
    assert [d for d, _, _ in saves] == [20, 40]
    path = str(tmp_path / "adam.ckpt")
    ckpt.save_checkpoint(path, {"params": r1.params, "opt_state": r1.opt_state})
    state = ckpt.load_checkpoint(path, jnp.float64)
    r2 = run_adam(
        loss_aux, state["params"], 0.05, iters=20, segment=20,
        opt_state=state["opt_state"],
    )
    np.testing.assert_array_equal(
        np.asarray(r2.params["x"]), np.asarray(full.params["x"])
    )


def test_pipeline_mid_phase_resume(tmp_path):
    """run_pipeline(resume=True) continues an interrupted phase from the live
    checkpoint (optimizer carry included) with the remaining budget."""
    from pinn_elastodynamics_tpu.cases import wave_infinite
    from pinn_elastodynamics_tpu.cases.base import run_pipeline

    case = wave_infinite.build(scale=0.002, pad_to_multiple_of=1)
    live = str(tmp_path / "live.ckpt")

    # "Crash" after 4 iterations: checkpoint every segment, budget 4.
    params1, res1 = run_pipeline(
        case, maxiter_override={"uv": 4}, segment=2,
        checkpoint_path=live, checkpoint_every_segments=1, seed=0,
    )
    saved = ckpt.load_checkpoint(live, jnp.float32)
    assert saved["phase"] == "uv" and int(saved["iters"]) == 4
    assert saved["lbfgs_carry"] is not None

    # Resume with a larger budget: runs only the remaining 4 iterations.
    params2, res2 = run_pipeline(
        case, maxiter_override={"uv": 8}, segment=2,
        checkpoint_path=live, checkpoint_every_segments=1, seed=0,
        resume=True,
    )
    assert res2["uv"].n_iters <= 4
    assert float(res2["uv"].final_loss) <= float(res1["uv"].final_loss) * 1.001
