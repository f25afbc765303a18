from .schedules import DiffusionSchedule  # noqa: F401
from .samplers import ddim_plan, plms_plan, sampler_step, SamplerState  # noqa: F401
