"""ngsxfem_tpu — a TPU-native unfitted finite element framework.

A from-scratch JAX/XLA re-design with the capabilities of ngsxfem
(ChrLackner/ngsxfem): level-set geometry, cut quadrature, unfitted FE spaces,
cut symbolic assembly, ghost penalty, isoparametric level-set curving,
space-time unfitted FEM, and CutFEM multigrid — built on batched fixed-shape
tensor kernels, jit compilation, and SPMD sharding instead of per-element
C++ virtual dispatch.
"""
from .config import config, set_default_dtype  # noqa: F401  (enables x64)

from .domaintype import (  # noqa: F401
    DOMAIN_TYPE,
    COMBINED_DOMAIN_TYPE,
    NEG,
    POS,
    IF,
    CDOM_NEG,
    CDOM_POS,
    UNCUT,
    HASNEG,
    HASPOS,
    ANY,
    all_domain_types,
    all_combined_domain_types,
    TO_CDT,
    INVERT,
)

from .cf.coefficient import (  # noqa: F401
    CF,
    CoefficientFunction,
    Parameter,
    x,
    y,
    z,
    sin,
    cos,
    tan,
    exp,
    log,
    sqrt,
    atan,
    sinh,
    cosh,
    fabs,
    floor,
    ceil,
    IfPos,
    Norm,
    InnerProduct,
    specialcf,
)

from .mesh.mesh import Mesh  # noqa: F401
from .mesh.structured import (  # noqa: F401
    Make1DMesh,
    MakeStructured2DMesh,
    MakeStructured3DMesh,
)
from .mesh.io import (  # noqa: F401
    MeshFromArrays,
    ReadGmsh,
    WriteGmsh,
    MakeUnstructuredMesh,
)
from .mesh.splinegeom import (  # noqa: F401
    SplineGeometry,
    MakeCircle,
    MakeRectangle,
)
from .mesh.composite import (  # noqa: F401
    CompositeMesh,
    MakeQuadDominated2DMesh,
    CompositeGridFunction,
    CompositeCutInfo,
    CompositeBilinearForm,
    CompositeLinearForm,
    IntegrateC,
)

from .fem.space import (  # noqa: F401
    FESpace,
    H1,
    L2,
    VectorH1,
    VectorL2,
    BitArray,
    CompoundBitArray,
    Compress,
    GetDofsOfElements,
    FESpaceFactory,
)
from .fem.facetspace import FacetFESpace  # noqa: F401
from .fem.hdiv import HDiv  # noqa: F401
from .fem.gridfunction import (  # noqa: F401
    GridFunction,
    grad,
    InterpolateToP1,
)

from .integrate import Integrate, Integrate_X_special_args  # noqa: F401

from .geom.cutinfo import (  # noqa: F401
    CutInfo,
    GetFacetsWithNeighborTypes,
    GetElementsWithNeighborFacets,
    GetDofsOfFacets,
    IndicatorCF,
    CutRatioGF,
    BitArrayCF,
    VOL,
    BND,
)

from .forms.assemble import (  # noqa: F401
    BilinearForm,
    LinearForm,
    RestrictedBilinearForm,
    SymbolicBFI,
    SymbolicLFI,
    SymbolicFacetPatchBFI,
)
from .forms.proxies import dn, dnjump, div  # noqa: F401
from .solvers.sparse import SparseMatrix  # noqa: F401
from .solvers.krylov import CGSolver, MinResSolver  # noqa: F401
from .lsetcurv import (  # noqa: F401
    LevelSetMeshAdaptation,
    LevelSetMeshAdaptation_Spacetime,
    shifted_eval,
    ProjectShift,
    CalcMaxDistance,
    CalcDistances,
)
from .solvers.mg import (  # noqa: F401
    MultiGridCL,
    CutFemSmoother,
    LinearMGIterator,
    CompoundProlongation,
    P1Prolongation,
    P2Prolongation,
    P2CutProlongation,
    P2TwoGridCL,
    VertPatches,
    ElemPatches,
    EdgePatches,
)
from .utils.utils import (  # noqa: F401
    LevelsetExamples,
    BoundingBoxes,
    StatisticContainer,
    PrintConvergenceTable,
    SpaceTimeWeakSet,
    kappa,
    IsCut,
)
from .utils.vtkout import Draw, VTKOutput  # noqa: F401
from .utils.globals import ngsglobals  # noqa: F401
from .utils.timing import Timer, PrintTimers, jax_trace  # noqa: F401
from .lsetcurv.lsetcurv import RefineAtLevelSet  # noqa: F401

from .ops.straightcut import cut_rule_element as CreateCutIntegrationRule  # noqa: F401

# QUAD_DIRECTION_POLICY values (reference python_ngsxfem.cpp:33-36): the axis
# selection policy of the multilinear QUAD/HEX iterated-integral cut rule.
FIRST = "FIRST"
OPTIMAL = "OPTIMAL"
FALLBACK = "FALLBACK"


from .fem.sfespace import SFESpace  # noqa: F401
from .fem.space import NumberSpace, Periodic  # noqa: F401
# legacy/compat aliases of the reference's binding-level names
# (python_cutint.cpp:20 IntegrateX; python_xfem.cpp SymbolicCutBFI/LFI;
# spacetime/python_spacetime.cpp:271 TimeVariableCoefficientFunction)
from .spacetime import (  # noqa: F401
    ScalarTimeFE,
    SpaceTimeFESpace,
    SpaceTimeFESpace as CSpaceTimeFESpace,  # reference C++ class name alias
    ReferenceTimeVariable,
    tref,
    dt,
    fix_t,
    CreateTimeRestrictedGF,
    RestrictGFInTime,
    SpaceTimeInterpolateToP1,
)
from .fem.xfespace import (  # noqa: F401
    XFESpace,
    XFESpace as CXFESpace,  # reference C++ class name alias
    XToNegPos,
    neg,
    pos,
    extend,
    neg_grad,
    pos_grad,
    extend_grad,
)

# NGSolve-style: FESpace([V1, V2]) builds a compound product space.
from .fem import space as _space_mod


def FESpace(arg, dgjumps=False, **kw):  # noqa: F811  (shadow the class export)
    """`FESpace([V1, V2, ...])` builds a compound space (NGSolve-style)."""
    if isinstance(arg, (list, tuple)):
        return _space_mod.CompoundFESpace(arg, dgjumps=dgjumps)
    raise TypeError("FESpace(...) expects a list of component spaces; "
                    "use H1/L2/VectorH1 for scalar spaces")


# Binding-level compat aliases (reference python_cutint.cpp:20 IntegrateX,
# python_xfem.cpp SymbolicCutBFI/SymbolicCutLFI, python_spacetime.cpp:271
# TimeVariableCoefficientFunction; python/__init__.py keeps the overridden
# NGSolve originals around as *_old)
def IntegrateX(lset=None, mesh=None, cf=None, order=5, domain_type=None,
               subdivlvl=0, time_order=-1, quad_dir_policy=None, **kw):
    """Low-level Integrate entry (reference python_cutint.cpp:20-122)."""
    ld = {"levelset": lset, "domain_type": domain_type, "subdivlvl": subdivlvl}
    if quad_dir_policy is not None:
        ld["quad_dir_policy"] = quad_dir_policy
    return Integrate(levelset_domain=ld, cf=cf, mesh=mesh, order=order,
                     time_order=time_order)


SymbolicCutBFI = SymbolicBFI
SymbolicCutLFI = SymbolicLFI
TimeVariableCoefficientFunction = type(tref)
from .spacetime.space import dt_vec  # noqa: F401,E402
