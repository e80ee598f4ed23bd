"""Case abstraction: a declarative experiment = model + material + banks +
loss spec + training pipeline.

The reference hard-codes each case as a standalone script with constants in
``__main__`` (SURVEY.md §5 "Config/flag system: None").  Here the §2.2 case
matrix is literally the config schema: every case builds a :class:`Case`
from a :func:`build`-style function, and a generic runner executes the
(pretraining-phase → main-phase) pipeline with frozen sub-networks, matching
train.py:958-968's dist → part → uv curriculum.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..banks import PointBank
from ..losses.terms import LossSpec
from ..ops.elasticity import Material
from ..train import lbfgs as lbfgs_mod
from ..train.adam import run_adam


@dataclasses.dataclass(frozen=True)
class Phase:
    """One optimization phase of a case's pipeline.

    ``trainable``: None = all params; else the composite sub-network key
    ('uv' | 'dist' | 'part') to train while the rest stay frozen
    (the reference's var_list mechanism, train.py:220-250).
    ``loss``: the phase's LossSpec (pretraining phases use their own).
    ``scale``: loss multiplier (the reference's 1000x for dist/part).
    """

    name: str
    loss: LossSpec
    trainable: Optional[str] = None
    scale: float = 1.0
    maxiter: int = 1000
    ftol: float = 0.0


@dataclasses.dataclass
class Case:
    name: str
    model: object  # MLPFieldModel | CompositeFieldModel
    material: Material
    plane: str
    loss: LossSpec                      # main loss
    banks: Dict[str, PointBank]
    phases: Tuple[Phase, ...]           # full pipeline incl. main phase
    lb: Tuple[float, ...]
    ub: Tuple[float, ...]
    n_frames: int = 0                   # FEM comparison frames
    fem_dir: Optional[str] = None
    # FEM .mat files may store coordinates in a translated frame (the wave
    # cases' probe data lives in [0,30]²/[30,60]² while the PINN domain is
    # centered); add this offset to FEM (x, y) to get PINN coordinates.
    fem_offset: Tuple[float, float] = (0.0, 0.0)
    eval_grid: Optional[np.ndarray] = None  # (N, ndim) spatial eval points
    adam_iters: int = 0                 # optional Adam warmup before L-BFGS
    adam_lr: float = 1e-3

    @property
    def max_t(self) -> float:
        return float(self.ub[-1])

    def frame_time(self, frame: int) -> float:
        """Time of FEM frame i: t = i · T / (n_frames - 1) (train.py:993-994)."""
        return frame * self.max_t / (self.n_frames - 1)

    def init_params(self, seed: int = 1111, dtype=jnp.float32):
        return self.model.init(jax.random.PRNGKey(seed), dtype)

    def loss_fn(self, spec: LossSpec, scale: float = 1.0) -> Callable:
        """Pure scalar loss over full params (for L-BFGS)."""

        def fn(params):
            total, _ = spec.evaluate(self.model, params, self.material, self.banks)
            return scale * total

        return fn

    def loss_and_aux_fn(self, spec: Optional[LossSpec] = None) -> Callable:
        spec = spec or self.loss

        def fn(params):
            total, comps = spec.evaluate(self.model, params, self.material, self.banks)
            return total, comps

        return fn

    def components(self, params) -> Dict[str, float]:
        """The reference's ``getloss`` (train.py:588-612): every component."""
        _, comps = jax.jit(
            lambda p: self.loss.evaluate(self.model, p, self.material, self.banks)
        )(params)
        return {k: float(v) for k, v in comps.items()}


def _phase_loss_fn(case: Case, phase: Phase, params):
    """Build a loss over the phase's trainable subtree with the rest frozen.

    ``phase.trainable`` may be a dotted path ("uv.mlp"): everything outside
    the path stays frozen — e.g. the Fourier frequency matrix ``uv.B``
    (utils/treepath.py rationale).
    """
    if phase.trainable is None:
        return case.loss_fn(phase.loss, phase.scale), params, lambda p, sub: sub

    from ..utils.treepath import path_get, path_set

    frozen = params
    key = phase.trainable
    full_fn = case.loss_fn(phase.loss, phase.scale)

    def sub_fn(sub):
        return full_fn(path_set(frozen, key, sub))

    def merge(p, sub):
        return path_set(p, key, sub)

    return sub_fn, path_get(params, key), merge


def mixed_precision_phase_fn(case: Case, phase: Phase, params64):
    """Extended-precision phase loss: f64 parameter/optimizer space over the
    f32 compute path.

    The f32 plate-hole endgame wedges because near the optimum the
    per-iteration loss decrease and the curvature pairs y = g_{k+1} - g_k
    fall below f32 resolution (docs/STATUS_r2.md); the reference sidesteps
    this by training entirely in f64 on CPU (train.py:115).  Here the
    network forward/backward stays f32 (Pallas kernels, full MXU speed) —
    parameters are cast f64→f32 at the model boundary — while the
    square-and-reduce loss tail (LossSpec.accum_dtype) and every L-BFGS
    internal (two-loop recursion, curvature memory, zoom line search) run
    in f64.  Requires ``jax.config.update('jax_enable_x64', True)``.

    Returns (sub_fn, sub0, merge) like :func:`_phase_loss_fn`, operating on
    f64 trees.
    """
    spec64 = dataclasses.replace(phase.loss, accum_dtype="float64")
    to32 = lambda tree: jax.tree.map(
        lambda a: a.astype(jnp.float32), tree
    )
    if phase.trainable is None:
        def sub_fn(p64):
            total, _ = spec64.evaluate(
                case.model, to32(p64), case.material, case.banks
            )
            return phase.scale * total

        return sub_fn, params64, lambda p, sub: sub

    from ..utils.treepath import path_get, path_set

    key = phase.trainable
    frozen32 = to32(params64)

    def sub_fn(sub64):
        total, _ = spec64.evaluate(
            case.model, path_set(frozen32, key, to32(sub64)),
            case.material, case.banks,
        )
        return phase.scale * total

    def merge(p, sub):
        return path_set(p, key, sub)

    return sub_fn, path_get(params64, key), merge


def run_pipeline(
    case: Case,
    params=None,
    *,
    seed: int = 1111,
    dtype=jnp.float32,
    log_every: int = 0,
    maxiter_override: Optional[Dict[str, int]] = None,
    on_phase_end: Optional[Callable] = None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every_segments: int = 10,
    segment: int = 100,
    resume: bool = False,
):
    """Run every phase of the case's pipeline; returns (params, phase_results).

    With ``checkpoint_path`` set, parameters AND full optimizer state
    (L-BFGS curvature memory, line-search state, iteration counter) are
    checkpointed atomically every ``checkpoint_every_segments`` L-BFGS
    segments — the crash-recovery story the reference lacks (SURVEY.md §5:
    a crash loses everything since the last manual pickle save, and scipy's
    L-BFGS history is never persisted at all).  With ``resume`` set and a
    live checkpoint present, completed phases are skipped and the
    interrupted phase continues from its saved optimizer carry with the
    remaining iteration budget.
    """
    resume_state = None
    if resume and checkpoint_path:
        import os

        from ..train.checkpoint import load_checkpoint

        if os.path.exists(checkpoint_path):
            resume_state = load_checkpoint(checkpoint_path, dtype)
            if "params" in resume_state:
                params = resume_state["params"]

    if params is None:
        params = case.init_params(seed, dtype)
    results = {}
    phase_names = [p.name for p in case.phases]
    skip_until = None
    if resume_state is not None and resume_state.get("phase") in phase_names:
        skip_until = resume_state["phase"]

    for phase in case.phases:
        if skip_until is not None and phase.name != skip_until:
            continue  # phase completed before the checkpoint was taken
        maxiter = (maxiter_override or {}).get(phase.name, phase.maxiter)
        init_carry = None
        base_iters = 0  # cumulative phase iterations completed before this call
        if skip_until is not None and phase.name == skip_until:
            skip_until = None
            if resume_state.get("lbfgs_carry") is not None:
                init_carry = tuple(resume_state["lbfgs_carry"])
                base_iters = int(resume_state.get("iters", 0))
                maxiter = max(0, maxiter - base_iters)
                if maxiter == 0:
                    params = _merge_resumed(case, phase, params, init_carry[0])
                    continue
        if (phase.name == case.phases[-1].name and case.adam_iters
                and init_carry is None):
            fn_aux = case.loss_and_aux_fn(phase.loss)
            ar = run_adam(
                fn_aux, params, case.adam_lr, iters=case.adam_iters,
                log_every=log_every,
            )
            params = ar.params
        sub_fn, sub0, merge = _phase_loss_fn(case, phase, params)

        on_segment = None
        if checkpoint_path:
            from ..train.checkpoint import save_checkpoint

            seg_count = [0]

            def on_segment(k, sub_params, hist, *, carry=None, _phase=phase,
                           _merge=merge, _params=params, _count=seg_count,
                           _base=base_iters):
                _count[0] += 1
                if _count[0] % checkpoint_every_segments == 0:
                    save_checkpoint(checkpoint_path, {
                        "params": _merge(_params, sub_params),
                        "phase": _phase.name,
                        # cumulative across resumes so a second crash+resume
                        # subtracts the right base (mirrors curriculum.py).
                        "iters": _base + k,
                        "lbfgs_carry": carry,
                    })

        res = lbfgs_mod.minimize(
            sub_fn,
            sub0,
            maxiter=maxiter,
            ftol=phase.ftol,
            log_every=log_every,
            on_segment=on_segment,
            segment=segment,
            init_carry=init_carry,
        )
        params = merge(params, res.params)
        results[phase.name] = res
        if on_phase_end is not None:
            on_phase_end(phase, params, res)
    return params, results


def _merge_resumed(case: Case, phase: Phase, params, sub_params):
    """Merge a checkpointed sub-tree back when a resumed phase has no budget
    left (the checkpoint was taken at or past the phase's maxiter)."""
    if phase.trainable is None:
        return sub_params
    from ..utils.treepath import path_set

    return path_set(params, phase.trainable, sub_params)
