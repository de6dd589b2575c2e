"""Round orchestration: the jitted FedAvg superstep, simulation harness,
metrics, failure handling, checkpoint/resume.

Parity targets: src/coordinator/round_manager.py + grpc_server.py round
logic, src/simulation/federated_simulation.py, src/coordinator/
metrics_tracker.py, failure_handler.py.
"""

from fl_tpu.orchestration.round_engine import (  # noqa: F401
    FederatedRoundEngine,
    RoundEngineConfig,
    RoundResult,
)
from fl_tpu.orchestration.selection import OortSelector  # noqa: F401
