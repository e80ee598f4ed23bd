"""Elastic wave in a semi-infinite domain: traction-free top surface.

Reproduces /root/reference/ElasticWaveSemiInfinite/ElasticWave.py:667-790:
plane strain, first-order (7-output) formulation, Ricker-wavelet source on a
r=2 circle at the origin, soft IC + SRC + free-surface (NB) losses;
loss = 5·f_uv + 5·f_s + 2·IC + 2·SRC + 2·NB (:112-127).
Domain [-15, 15]², T = 16 (curriculum: pretrain at 8 s, extend to 16 s).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..banks import PointBank, make_bank
from ..geometry import sampling as smp
from ..geometry.sources import ricker_wavelet
from ..losses.terms import FieldTarget, LossSpec, PDEResidual
from ..models.fields import FieldSpec, FIRST_ORDER, MLPFieldModel
from ..ops.elasticity import Material, PLANE_STRAIN
from .base import Case, Phase
from .wave_common import collocation_with_refinement, source_bank_points

SRC_C = (0.0, 0.0)
SRC_R = 2.0
FEM_DIR = "/root/reference/ElasticWaveSemiInfinite/FEM_result"


def analytic_dist(p):
    """Closed-form distance factors for hard IC + free-surface enforcement.

    Channels [u, v, ut, vt, s11, s22, s12]: u/v get tanh²(t) (zero value
    AND rate at t=0 — there are no displacement BCs on a truncated
    semi-infinite domain), ut/vt/s11 get tanh(t), and the traction-free
    surface σ22 = σ12 = 0 on y = 15 (:697-700) multiplies those two
    channels by a surface-vanishing envelope.  The Ricker source stays a
    soft term (prescribed nonzero displacement on the circle).
    """
    import jax.numpy as jnp

    y, t = p[1], p[2]
    e_up = jnp.tanh((15.0 - y) / 5.0)
    tv = jnp.tanh(t) ** 2
    ts = jnp.tanh(t)
    return jnp.stack([tv, tv, ts, ts, ts, ts * e_up, ts * e_up])


def analytic_part(p):
    """P = 0: every hard-enforced boundary/initial value is zero here."""
    import jax.numpy as jnp

    return jnp.zeros((7,), p.dtype)


def build_model(max_t: float = 16.0, precision=None, jet_impl="auto",
                fourier: int = 0, fourier_scale: float = 1.0,
                bc: str = "soft", max_t_norm: float = 16.0):
    # [3] + 8*[100] + [7] (:679); no input normalization (:198).
    # ``fourier`` > 0 swaps in the random-Fourier-feature embedding
    # (models/fourier.py) — the spectral-bias remedy for wave problems;
    # normalized inputs so the feature frequencies are domain-relative.
    # Normalization is pinned to max_t_norm (the FINAL curriculum horizon)
    # so the embedding is identical across stages and warm-started params
    # keep their meaning.
    spec = FieldSpec(ndim=2, formulation=FIRST_ORDER)
    if fourier:
        from ..models.fourier import FourierMLPFieldModel

        net = FourierMLPFieldModel(
            spec=spec, hidden=(100,) * 8, n_features=fourier,
            feature_scale=fourier_scale, normalize=True,
            lb=(-15.0, -15.0, 0.0), ub=(15.0, 15.0, max_t_norm),
            precision=precision,
        )
    else:
        net = MLPFieldModel(
            spec=spec,
            hidden=(100,) * 8,
            precision=precision,
            jet_impl=jet_impl,
        )
    if bc == "hard":
        from ..models.analytic_bc import AnalyticCompositeFieldModel

        return AnalyticCompositeFieldModel(
            spec=spec, uv_model=net,
            dist_fn=analytic_dist, part_fn=analytic_part,
        )
    return net


def build_banks(
    *, max_t: float = 16.0, seed: int = 1111, scale: float = 1.0,
    dtype=np.float32, pad_to_multiple_of: int = 1,
) -> Dict[str, PointBank]:
    rng = np.random.default_rng(seed)
    s = lambda n: max(8, int(round(n * scale)))
    lb = (-15.0, -15.0, 0.0)
    ub = (15.0, 15.0, max_t)

    # IC: 12k LHS over the square at t=0 (:692-694).
    xy_ic = smp.edge_lhs((-15.0, -15.0), (30.0, 30.0), s(12000), rng)
    ic = np.concatenate([xy_ic, np.zeros((xy_ic.shape[0], 1))], axis=1)

    # Free surface y=15: 15k LHS over (x, t) (:697-700).
    xt_up = smp.edge_lhs((-15.0, 0.0), (30.0, max_t), s(15000), rng)
    up = np.stack(
        [xt_up[:, 0], np.full(xt_up.shape[0], 15.0), xt_up[:, 1]], axis=1
    )

    # Collocation: 120k bulk + source refinement + near-surface refinement
    # − source disk (:702-707).
    col = collocation_with_refinement(
        rng, lb=lb, ub=ub, n_bulk=s(120000),
        refine_boxes=[
            (
                (SRC_C[0] - SRC_R - 2, SRC_C[1] - SRC_R - 2, 0.0),
                (2 * (SRC_R + 2), 2 * (SRC_R + 2), max_t),
                s(15000),
            ),
            ((-15.0, 15.0 - 6.0, 0.0), (30.0, 6.0, max_t), s(20000)),
        ],
        exclude=(SRC_C[0], SRC_C[1], SRC_R),
    )

    # Ricker source, 150 circle points; time dense over the pulse (:725-739).
    tt = np.concatenate(
        [np.linspace(0, 6, s(153)), np.linspace(6, max_t, s(63))]
    )[1:]
    src_pts, src_uv = source_bank_points(
        xc=SRC_C[0], yc=SRC_C[1], r=SRC_R, n_circle=s(150), tt=tt,
        amplitude_fn=ricker_wavelet,
    )

    # Independent row shuffles (:660-664,768).
    col, src_all, ic, up = smp.shuffled(
        rng, col, np.concatenate([src_pts, src_uv], axis=1), ic, up
    )
    src_pts, src_uv = src_all[:, :3], src_all[:, 3:]

    mk = lambda pts, vals=None: make_bank(
        pts, vals, dtype=dtype, pad_to_multiple_of=pad_to_multiple_of
    )
    return {
        "collocation": mk(col),
        "src": mk(src_pts, {"uv": src_uv}),
        "ic": mk(ic),
        "up": mk(up),
    }


def main_loss(bc: str = "soft") -> LossSpec:
    """loss = 5·f_uv + 5·f_s + 2·IC + 2·SRC + 2·NB (:127).

    With ``bc="hard"`` the IC and NB terms are exactly zero by construction
    (analytic_dist) and drop from the spec; the remaining value stays
    directly comparable to the soft-spec loss of any model.
    """
    terms = [
        ("collocation", PDEResidual(plane=PLANE_STRAIN)),
        ("src", FieldTarget(name="SRC", channels=("u", "v"), target_key="uv")),
    ]
    weights = [("f_uv", 5.0), ("f_s", 5.0), ("SRC", 2.0)]
    if bc != "hard":
        terms += [
            ("ic", FieldTarget(name="IC", channels=("u", "v", "ut", "vt"))),
            ("up", FieldTarget(name="NB", channels=("s22", "s12"))),
        ]
        weights += [("IC", 2.0), ("NB", 2.0)]
    return LossSpec(terms=tuple(terms), weights=tuple(weights))


def eval_grid(num: int = 201) -> np.ndarray:
    return smp.grid_disk_complement(
        -15, 15, -15, 15, num, xc=SRC_C[0], yc=SRC_C[1], r=SRC_R
    )


def build(
    *, max_t: float = 16.0, seed: int = 1111, scale: float = 1.0,
    dtype=np.float32, pad_to_multiple_of: int = 1, maxiter: int = 1000,
    precision="highest", jet_impl="auto",
    fourier: int = 0, fourier_scale: float = 1.0, bc: str = "soft",
) -> Case:
    ftol = 1e-3 * float(np.finfo(np.float64).eps)  # :136
    return Case(
        name="elastic_wave_semi_infinite",
        model=build_model(max_t, precision=precision, jet_impl=jet_impl,
                          fourier=fourier, fourier_scale=fourier_scale,
                          bc=bc, max_t_norm=16.0),
        material=Material(E=2.5, mu=0.25, rho=1.0),
        plane=PLANE_STRAIN,
        loss=main_loss(bc),
        banks=build_banks(
            max_t=max_t, seed=seed, scale=scale, dtype=dtype,
            pad_to_multiple_of=pad_to_multiple_of,
        ),
        phases=(Phase("uv", main_loss(bc), maxiter=maxiter, ftol=ftol),),
        lb=(-15.0, -15.0, 0.0),
        ub=(15.0, 15.0, max_t),
        n_frames=int(max_t * 4 + 1),
        fem_dir=FEM_DIR,
        fem_offset=(-45.0, -45.0),
        eval_grid=eval_grid(),
    )
