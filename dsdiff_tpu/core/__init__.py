from . import (
    composite_loss, dpm_solver, losses, palette, patching, process, sampling,
    schedules,
)
from .schedules import DiffusionSchedule, make_beta_schedule, respace, space_timesteps
