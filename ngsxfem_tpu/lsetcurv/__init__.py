from .lsetcurv import (  # noqa: F401
    LevelSetMeshAdaptation,
    ProjectShift,
    CalcMaxDistance,
    CalcDistances,
)
from .lset_spacetime import LevelSetMeshAdaptation_Spacetime  # noqa: F401
from .shifted import shifted_eval  # noqa: F401
