from .lsetcurv import LevelSetMeshAdaptation  # noqa: F401
from .lset_spacetime import LevelSetMeshAdaptation_Spacetime  # noqa: F401
from .shifted import shifted_eval  # noqa: F401
