'''
zephyr_tpu backend: forward-modelling layer.

Public surface mirrors the reference's zephyr/backend/__init__.py:8-15.
'''

from .base import BaseModelDependent, BaseAnisotropic
from .discretization import BaseDiscretization, DiscretizationWrapper
from .minizephyr import MiniZephyr, MiniZephyrHD, MiniZephyr25D
from .eurus import Eurus, EurusHD
from .distributors import (BaseDist, BaseMPDist, BaseIPYDist, MultiFreq,
                           ViscoMultiFreq, SerialMultiFreq,
                           MultiGridMultiFreq, ViscoMultiGridMultiFreq,
                           MultiGridHelper)
from .source import (BaseSource, FakeSource, SimpleSource,
                     StackedSimpleSource, SparseKaiserSource, KaiserSource,
                     AnisotropicKaiserSource)
from .analytical import AnalyticalHelmholtz
from .interpolation import (BaseGridInterpolator, SplineGridInterpolator,
                            resample_field)
