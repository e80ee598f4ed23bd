"""3D elastodynamics (BASELINE.json config #4).

Extends the reference's 2D pattern to vector displacement + 6-component
stress in a cube: a spherical-cavity radial source (the 3D analog of the wave
cases' circular source), soft IC + SRC losses, first-order (12-output)
formulation so only first derivatives are needed — the same TPU-friendly
structure as ElasticWaveConfined (ElasticWave.py:282-348) lifted to 3D.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..banks import PointBank, make_bank
from ..geometry import sampling as smp
from ..geometry.sources import gaussian_pulse
from ..losses.terms import FieldTarget, LossSpec, PDEResidual
from ..models.fields import FieldSpec, FIRST_ORDER, MLPFieldModel
from ..ops.elasticity import ISOTROPIC_3D, Material
from .base import Case, Phase

SRC_R = 2.0
HALF = 15.0


def build_model(max_t: float = 10.0) -> MLPFieldModel:
    return MLPFieldModel(
        spec=FieldSpec(ndim=3, formulation=FIRST_ORDER),
        hidden=(100,) * 6,
        normalize=True,
        lb=(-HALF, -HALF, -HALF, 0.0),
        ub=(HALF, HALF, HALF, max_t),
    )


def _sphere_points(n: int, rng) -> np.ndarray:
    """Uniform points on the unit sphere (Gaussian normalization)."""
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def build_banks(
    *, max_t: float = 10.0, seed: int = 1111, scale: float = 1.0,
    dtype=np.float32, pad_to_multiple_of: int = 1,
) -> Dict[str, PointBank]:
    rng = np.random.default_rng(seed)
    s = lambda n: max(8, int(round(n * scale)))
    lb = (-HALF, -HALF, -HALF, 0.0)
    ub = (HALF, HALF, HALF, max_t)

    # Collocation: bulk + source refinement − cavity.
    col = smp.lhs_box(lb, ub, s(200000), rng)
    ref_box = smp.edge_lhs(
        (-SRC_R - 1, -SRC_R - 1, -SRC_R - 1, 0.0),
        (2 * (SRC_R + 1),) * 3 + (max_t,), s(30000), rng,
    )
    col = np.concatenate([col, ref_box], axis=0)
    rad = np.linalg.norm(col[:, :3], axis=1)
    col = col[rad > SRC_R]

    # IC at t=0 minus cavity.
    ic = smp.edge_lhs(lb, (2 * HALF,) * 3 + (0.0,), s(20000), rng)
    ic = ic[np.linalg.norm(ic[:, :3], axis=1) > SRC_R]

    # Spherical source: radial displacement with a Gaussian pulse.
    sph = _sphere_points(s(500), rng) * SRC_R
    tt = np.linspace(0, max_t, s(101))[1:]
    src = smp.cross_time(sph, tt)
    amp = gaussian_pulse(src[:, 3:4])
    uvw = amp * src[:, 0:3] / SRC_R

    mk = lambda pts, vals=None: make_bank(
        pts, vals, dtype=dtype, pad_to_multiple_of=pad_to_multiple_of
    )
    return {
        "collocation": mk(col),
        "src": mk(src, {"uvw": uvw}),
        "ic": mk(ic),
    }


def main_loss() -> LossSpec:
    return LossSpec(
        terms=(
            ("collocation", PDEResidual(plane=ISOTROPIC_3D)),
            ("src", FieldTarget(
                name="SRC", channels=("u", "v", "w"), target_key="uvw"
            )),
            ("ic", FieldTarget(
                name="IC", channels=("u", "v", "w", "ut", "vt", "wt")
            )),
        ),
        weights=(("f_uv", 5.0), ("f_s", 5.0), ("SRC", 1.0), ("IC", 1.0)),
    )


def build(
    *, max_t: float = 10.0, seed: int = 1111, scale: float = 1.0,
    dtype=np.float32, pad_to_multiple_of: int = 1, maxiter: int = 50000,
) -> Case:
    return Case(
        name="elastic_wave_3d",
        model=build_model(max_t),
        material=Material(E=2.5, mu=0.25, rho=1.0),
        plane=ISOTROPIC_3D,
        loss=main_loss(),
        banks=build_banks(
            max_t=max_t, seed=seed, scale=scale, dtype=dtype,
            pad_to_multiple_of=pad_to_multiple_of,
        ),
        phases=(Phase("uv", main_loss(), maxiter=maxiter),),
        lb=(-HALF, -HALF, -HALF, 0.0),
        ub=(HALF, HALF, HALF, max_t),
    )
