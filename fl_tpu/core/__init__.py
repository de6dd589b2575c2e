"""Core foundation: config/data-model dataclasses, pytree weight utilities,
mesh construction, PRNG discipline, and dtype policy.

Reference parity: src/shared/models.py (dataclasses), src/shared/interfaces.py
(service contracts — here expressed as typing.Protocols since the compute path
is functional rather than ABC-driven).
"""

from fl_tpu.core.types import (  # noqa: F401
    ClientCapabilities,
    ComputePowerLevel,
    CompressedUpdate,
    GlobalModel,
    ModelUpdate,
    PrivacyConfig,
    RoundConfig,
    TrainingMetrics,
    TrainingStatus,
)
from fl_tpu.core import pytree  # noqa: F401
from fl_tpu.core import prng  # noqa: F401
from fl_tpu.core.mesh import make_mesh, client_sharding, replicated  # noqa: F401
