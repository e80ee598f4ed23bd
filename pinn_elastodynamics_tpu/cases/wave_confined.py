"""Elastic wave in a confined plate: all four edges fixed (u = v = 0).

Reproduces /root/reference/ElasticWaveConfined/ElasticWave.py:881-1026:
plane strain, first-order (7-output) formulation, Gaussian-pulse source on a
r=2 circle, soft IC + SRC + FIX losses; loss = 5·f_uv + 5·f_s + SRC + IC + FIX
(:139-156).  Domain [-15, 15]², T = 14 (curriculum: pretrain at 7 s, extend).
Material: E=2.5, μ=0.25, ρ=1 (:33-35).

The reference constructs dist/part networks for this case but never uses them
in the loss (defect noted in SURVEY.md §2.4); they are omitted here.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..banks import PointBank, make_bank
from ..geometry import sampling as smp
from ..geometry.sources import gaussian_pulse
from ..losses.terms import FieldTarget, LossSpec, PDEResidual
from ..models.fields import FieldSpec, FIRST_ORDER, MLPFieldModel
from ..ops.elasticity import Material, PLANE_STRAIN
from .base import Case, Phase
from .wave_common import collocation_with_refinement, source_bank_points

SRC_C = (0.0, 0.0)
SRC_R = 2.0
FEM_DIR = "/root/reference/ElasticWaveConfined/FEM_result/30x30_gauss_fine"


def build_model(max_t: float = 14.0, precision=None, jet_impl="auto") -> MLPFieldModel:
    # [3] + 6*[140] + [7] (:891); no input normalization (:235).
    return MLPFieldModel(
        spec=FieldSpec(ndim=2, formulation=FIRST_ORDER),
        hidden=(140,) * 6,
        precision=precision,
        jet_impl=jet_impl,
    )


def build_banks(
    *, max_t: float = 14.0, seed: int = 1111, scale: float = 1.0,
    dtype=np.float32, pad_to_multiple_of: int = 1,
) -> Dict[str, PointBank]:
    rng = np.random.default_rng(seed)
    s = lambda n: max(8, int(round(n * scale)))
    lb = (-15.0, -15.0, 0.0)
    ub = (15.0, 15.0, max_t)

    # IC points minus the source cavity (:926-928).
    ic = smp.edge_lhs(lb, (30.0, 30.0, 0.0), s(6000), rng)
    ic = smp.exclude_disk(ic, xc=SRC_C[0], yc=SRC_C[1], r=SRC_R, strict=True)

    # Four fixed edges, 7000 each (:930-938).
    edges = [
        smp.edge_lhs((-15.0, -15.0, 0.0), (0.0, 30.0, max_t), s(7000), rng),  # LF
        smp.edge_lhs((15.0, -15.0, 0.0), (0.0, 30.0, max_t), s(7000), rng),   # RT
        smp.edge_lhs((-15.0, -15.0, 0.0), (30.0, 0.0, max_t), s(7000), rng),  # LW
        smp.edge_lhs((-15.0, 15.0, 0.0), (30.0, 0.0, max_t), s(7000), rng),   # UP
    ]
    fixed = np.concatenate(edges, axis=0)

    # Collocation: bulk + source refinement + near-boundary refinement
    # (|x|>12 or |y|>12 filter) − source disk (:940-947).
    near_b = smp.lhs_box(lb, ub, s(50000), rng)
    flag = (np.abs(near_b[:, 0]) > 12) | (np.abs(near_b[:, 1]) > 12)
    near_b = near_b[flag]
    col = collocation_with_refinement(
        rng, lb=lb, ub=ub, n_bulk=s(120000),
        refine_boxes=[(
            (SRC_C[0] - SRC_R - 1, SRC_C[1] - SRC_R - 1, 0.0),
            (2 * (SRC_R + 1), 2 * (SRC_R + 1), max_t),
            s(15000),
        )],
        exclude=None,
    )
    col = np.concatenate([col, near_b], axis=0)
    col = smp.exclude_disk(col, xc=SRC_C[0], yc=SRC_C[1], r=SRC_R, strict=True)

    # Gaussian-pulse source on the r=2 circle; time stations dense near the
    # pulse (:952-968).
    tt = np.concatenate(
        [np.linspace(0, 4, s(141)), np.linspace(4, max_t, s(141))]
    )[1:]
    src_pts, src_uv = source_bank_points(
        xc=SRC_C[0], yc=SRC_C[1], r=SRC_R, n_circle=s(200), tt=tt,
        amplitude_fn=gaussian_pulse,
    )

    mk = lambda pts, vals=None: make_bank(
        pts, vals, dtype=dtype, pad_to_multiple_of=pad_to_multiple_of
    )
    return {
        "collocation": mk(col),
        "src": mk(src_pts, {"uv": src_uv}),
        "ic": mk(ic),
        "fixed": mk(fixed),
    }


def main_loss() -> LossSpec:
    """loss = 5·f_uv + 5·f_s + SRC + IC + FIX (:156)."""
    return LossSpec(
        terms=(
            ("collocation", PDEResidual(plane=PLANE_STRAIN)),
            ("src", FieldTarget(name="SRC", channels=("u", "v"), target_key="uv")),
            ("ic", FieldTarget(name="IC", channels=("u", "v", "ut", "vt"))),
            ("fixed", FieldTarget(name="FIX", channels=("u", "v"))),
        ),
        weights=(
            ("f_uv", 5.0), ("f_s", 5.0), ("SRC", 1.0), ("IC", 1.0), ("FIX", 1.0),
        ),
    )


def eval_grid(num: int = 201) -> np.ndarray:
    """201×201 grid minus the source disk (:1029-1038)."""
    return smp.grid_disk_complement(
        -15, 15, -15, 15, num, xc=SRC_C[0], yc=SRC_C[1], r=SRC_R
    )


def build(
    *, max_t: float = 14.0, seed: int = 1111, scale: float = 1.0,
    dtype=np.float32, pad_to_multiple_of: int = 1, maxiter: int = 100000, precision="highest", jet_impl="auto",
) -> Case:
    ftol = float(np.finfo(np.float64).eps)  # ftol = 1·eps (:166)
    return Case(
        name="elastic_wave_confined",
        model=build_model(max_t, precision=precision, jet_impl=jet_impl),
        material=Material(E=2.5, mu=0.25, rho=1.0),
        plane=PLANE_STRAIN,
        loss=main_loss(),
        banks=build_banks(
            max_t=max_t, seed=seed, scale=scale, dtype=dtype,
            pad_to_multiple_of=pad_to_multiple_of,
        ),
        phases=(Phase("uv", main_loss(), maxiter=maxiter, ftol=ftol),),
        lb=(-15.0, -15.0, 0.0),
        ub=(15.0, 15.0, max_t),
        n_frames=int(max_t * 4 + 1),
        fem_dir=FEM_DIR,
        fem_offset=(-15.0, -15.0),
        eval_grid=eval_grid(),
    )
