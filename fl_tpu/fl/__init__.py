"""Federated-learning core: partitioning, vmapped local training, FedAvg
aggregation, convergence detection, differential privacy, compression.

Parity targets: src/aggregation/ (fedavg.py, convergence.py) and
src/shared/ (privacy.py, privacy_config.py, compression.py, training.py,
data_loader.py partitioning).
"""

from fl_tpu.fl.partition import DataPartitioner, partition_indices  # noqa: F401
