'''
zephyr_tpu middleware: inverse-problem layer.

Public surface mirrors the reference's zephyr/middleware/__init__.py:8-15,
plus the natively-implemented inversion machinery (the reference defers
these to SimPEG).
'''

from .problem import (HelmBaseProblem, Helm2DProblem, Helm2DViscoProblem,
                      Helm2DViscoMultiGridProblem, Helm25DProblem,
                      Helm25DViscoProblem)
from .survey import (HelmBaseSurvey, Helm2DSurvey, Helm2DMultiGridSurvey,
                     Helm25DSurvey, Helm25DMultiGridSurvey, HelmSrc,
                     HelmRx, HelmMultiGridSurvey)
from .fields import HelmFields
from .maps import IdentityMap, NodalIdentityMap, SquaredSlownessMap
from .regularization import (BaseRegularization, HelmBaseRegularization,
                             SmoothRegularization)
from .optimization import (Minimize, GradientDescent, ProjectedGradient,
                           LBFGS)
from .inversion import (l2_DataMisfit, BaseInvProblem, BaseInversion,
                        FrequencyContinuation)
from .mesh import TensorMesh2D
from .time import (dwavelet, dftreal, idftreal, BaseTimeSensitive,
                   TimeMachine)
from .util import readini, str2bool, compileDict
from .segy import SEGYFile, writeSEGY
from .db import (UtoutWriter, utoutRead, BaseDatastore, FullwvDatastore,
                 FlatDatastore, PickleDatastore, HDF5Datastore, ftypeRegex)
