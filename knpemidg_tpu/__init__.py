"""knpemidg_tpu -- TPU-native KNP-EMI discontinuous-Galerkin framework.

Public API (parity with src/knpemidg/__init__.py:1-17 plus the TPU-native
additions)."""

import jax as _jax

# TPU f32 matmuls default to bf16-pass MXU arithmetic; the Krylov
# orthogonalization and coarse-inverse GEMVs need true f32 (iteration counts
# roughly double otherwise).  Our matmuls are small/bandwidth-bound, so
# 'highest' costs nothing.
_jax.config.update("jax_default_matmul_precision", "highest")

from .config import Ion, PhysicalParams, SolverParams, StimParams, ion_from_dict
from .solver import Solver, StandardSolver, Traces
from .solver_emi import SolverEMI, StandardSolverEMI
from .membrane.engine import (
    MembraneState,
    get_param,
    make_membrane,
    ode_run,
    ode_step,
    set_param,
)
from .mesh.core import Mesh, build_mesh, morton_order
from .ops.assembly import (
    eliminated_concentration,
    jump_phi_M,
    membrane_avg,
    nernst_potential,
)

__all__ = [
    "Ion", "PhysicalParams", "SolverParams", "StimParams", "ion_from_dict",
    "Solver", "StandardSolver", "SolverEMI", "StandardSolverEMI", "Traces",
    "MembraneState", "make_membrane", "ode_step", "ode_run",
    "set_param", "get_param",
    "Mesh", "build_mesh", "morton_order",
    "membrane_avg", "nernst_potential", "jump_phi_M",
    "eliminated_concentration",
]

__version__ = "0.1.0"
