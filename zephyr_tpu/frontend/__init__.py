'''
zephyr_tpu frontend: CLI and job composition.
'''

from . import jobs
from .jobs import (Job, ForwardModelingJob, InversionJob, Visco2DJob,
                   IsotropicVisco2DJob, AnisotropicVisco2DJob, IniInputJob,
                   PythonInputJob, PickleInputJob, UtoutOutputJob,
                   PickleOutputJob, OmegaIOJob, OmegaJob, PythonUtoutJob,
                   AnisoOmegaJob, AnisoPythonUtoutJob, OmegaInversionJob,
                   MigrationJob, OmegaMigrationJob)
