"""Surface traction ops t = sigma · n.

Mirrors ``net_surf_var``/``net_t`` in the reference
(/root/reference/PlateHoleQuarter/train/train.py:441-461), including the
circular-hole normal convention n = (-x/r, -y/r) for a hole centered at the
origin (an inward normal as used by the reference's traction-free hole loss).
"""

from __future__ import annotations

import jax

from ..models.fields import FieldSpec


def traction_2d(fields: jax.Array, spec: FieldSpec, nx, ny):
    """tx = s11·nx + s12·ny, ty = s12·nx + s22·ny (train.py:447-448)."""
    s11 = fields[:, spec.index("s11")]
    s22 = fields[:, spec.index("s22")]
    s12 = fields[:, spec.index("s12")]
    tx = s11 * nx + s12 * ny
    ty = s12 * nx + s22 * ny
    return tx, ty


def circle_normals(x, y, *, xc=0.0, yc=0.0, r=0.1):
    """Reference hole normal n = (-(x-xc)/r, -(y-yc)/r) (train.py:457-458)."""
    return -(x - xc) / r, -(y - yc) / r


def traction_3d(fields: jax.Array, spec: FieldSpec, nx, ny, nz):
    s = {n: fields[:, spec.index(n)] for n in
         ("s11", "s22", "s33", "s12", "s13", "s23")}
    tx = s["s11"] * nx + s["s12"] * ny + s["s13"] * nz
    ty = s["s12"] * nx + s["s22"] * ny + s["s23"] * nz
    tz = s["s13"] * nx + s["s23"] * ny + s["s33"] * nz
    return tx, ty, tz
