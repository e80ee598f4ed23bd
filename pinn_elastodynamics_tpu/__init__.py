"""TPU-native mixed-variable PINN framework for computational elastodynamics.

A ground-up JAX/XLA/pjit/Pallas rebuild of the capabilities of
Raocp/PINN-elastodynamics (see SURVEY.md): tanh-MLP field models predicting
displacement AND stress, PDE residuals (momentum balance + constitutive law)
assembled from a fused derivative-jet forward pass, hard-BC composition
u = P + D·ũ, declarative IC/BC/source losses, device-resident Adam → L-BFGS
training, collocation banks sharded across a TPU mesh, and quantitative
validation against the reference's shipped FEM ground truth.
"""

from . import banks, ops
from .banks import PointBank, make_bank
from .models.fields import (
    CompositeFieldModel,
    FieldSpec,
    FIRST_ORDER,
    MLPFieldModel,
    SECOND_ORDER,
)
from .ops.elasticity import ISOTROPIC_3D, Material, PLANE_STRAIN, PLANE_STRESS
from .ops.jet import Jet

__version__ = "0.1.0"

__all__ = [
    "CompositeFieldModel",
    "FieldSpec",
    "FIRST_ORDER",
    "ISOTROPIC_3D",
    "Jet",
    "Material",
    "MLPFieldModel",
    "PLANE_STRAIN",
    "PLANE_STRESS",
    "PointBank",
    "SECOND_ORDER",
    "banks",
    "make_bank",
    "ops",
]
