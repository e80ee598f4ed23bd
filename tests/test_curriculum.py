"""Time-horizon curriculum with warm-start + crash resume."""

import os

import numpy as np
import pytest

from pinn_elastodynamics_tpu.cases import wave_confined
from pinn_elastodynamics_tpu.train.curriculum import Stage, run_time_curriculum


def _builder(**kw):
    kw.setdefault("scale", 0.002)
    return wave_confined.build(**kw)


def test_curriculum_stages_extend_horizon(tmp_path):
    stages = [Stage(max_t=7.0, maxiter=10), Stage(max_t=14.0, maxiter=10)]
    params, summaries = run_time_curriculum(
        _builder, stages, seed=3, checkpoint_dir=str(tmp_path),
    )
    assert [s["max_t"] for s in summaries] == [7.0, 14.0]
    assert all(np.isfinite(s["final_loss"]) for s in summaries)
    # Stage checkpoints written.
    assert os.path.exists(tmp_path / "stage_0_T7.ckpt")
    assert os.path.exists(tmp_path / "stage_1_T14.ckpt")
    # Warm start actually helps: the T=14 loss starting from the T=7 params
    # is below a cold T=14 init's loss.
    case14 = _builder(max_t=14.0)
    cold = float(case14.loss_fn(case14.loss)(case14.init_params(seed=3)))
    warm = summaries[1]["final_loss"]
    assert warm < cold


def test_curriculum_resume_skips_completed(tmp_path):
    stages = [Stage(max_t=7.0, maxiter=5), Stage(max_t=14.0, maxiter=5)]
    p1, s1 = run_time_curriculum(
        _builder, stages, seed=3, checkpoint_dir=str(tmp_path),
    )
    # Second run resumes from the checkpoints without re-optimizing.
    p2, s2 = run_time_curriculum(
        _builder, stages, seed=3, checkpoint_dir=str(tmp_path),
    )
    assert all(s.get("resumed") for s in s2)
    f1, _ = __import__("jax").flatten_util.ravel_pytree(p1)
    f2, _ = __import__("jax").flatten_util.ravel_pytree(p2)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2))
